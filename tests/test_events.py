"""Windowed/streaming events operators: hand-checked semantics on a tiny
stream + SQL-oracle parity on a bigger synthetic one (driver data at sf0.01
exercises scale, not edge cases like exact-gap boundaries and ts ties)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops import contract as ops_contract
from splade_ray.ops import events

US = 1_000_000
T0 = 1_700_000_000 * US  # arbitrary epoch base


def _tbl(rows):
    df = pd.DataFrame(rows, columns=["event_id", "us", "user_id",
                                     "event_type", "value"])
    return pa.table(
        {
            "event_id": pa.array(df.event_id, type=pa.int64()),
            "ts": pa.array(df.us, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(df.user_id, type=pa.int64()),
            "event_type": pa.array(df.event_type, type=pa.string()),
            "value": pa.array(df.value, type=pa.float64()),
        }
    )


@pytest.fixture(scope="module")
def tiny(ray_session):
    gap = events.SESSION_GAP_US
    rows = [
        # user 1: two sessions (second starts gap+1 after event 1)
        (0, T0, 1, "view", 1.0),
        (1, T0 + 10 * US, 1, "error", 2.0),
        (2, T0 + 10 * US + gap, 1, "click", 3.0),      # exactly gap: SAME session
        (3, T0 + 10 * US + 2 * gap + 1, 1, "view", 4.0),  # gap+1: NEW session
        # user 2: single event, no error ever
        (4, T0, 2, "click", 5.0),
        # user 3: two errors with IDENTICAL ts (tie -> max event_id wins)
        (5, T0, 3, "error", 6.0),
        (6, T0, 3, "error", 7.0),
        (7, T0 + US, 3, "view", 8.0),
    ]
    return rd.from_arrow(_tbl(rows)).repartition(3)


def test_sessionize_tiny(tiny):
    df = events.sessionize(tiny).to_pandas().sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    u1 = df[df.user_id == 1]
    assert list(u1.session_id) == [0, 1]
    assert list(u1.n_events) == [3, 1]  # exact-gap event stays in session 0
    assert u1.iloc[0].sum_value == 6.0
    assert len(df[df.user_id == 2]) == 1
    assert list(df[df.user_id == 3].n_events) == [3]


def test_asof_tiny(tiny):
    df = events.asof_join(tiny).to_pandas().set_index("event_id")
    assert 4 not in df.index  # user 2 has no error -> dropped (inner)
    assert df.loc[0].isna().all() if 0 in df.index else 0 not in df.index
    assert df.loc[1].match_event_id == 1  # error matches itself
    assert df.loc[2].match_event_id == 1
    assert df.loc[7].match_event_id == 6  # ts tie -> max event_id
    assert df.loc[5].match_event_id == 6  # even at its own ts


def test_rolling_tiny(tiny):
    df = events.rolling_sum(tiny).to_pandas().set_index("event_id")
    assert df.loc[0].rolling_sum == 1.0
    assert df.loc[1].rolling_sum == 3.0
    assert df.loc[2].rolling_sum == 6.0
    assert df.loc[3].rolling_sum == 9.0  # rows-based: sessions don't reset it
    assert df.loc[4].rolling_sum == 5.0


def test_events_sql_parity_synthetic(ray_session):
    """All four operators vs their DuckDB oracles on a denser synthetic
    stream with ts ties and multi-session users."""
    rng = np.random.default_rng(17)
    n = 3000
    us = T0 + np.sort(rng.integers(0, 5 * 24 * 3600 * US, n))
    us[100] = us[101] = us[102]  # planted ties
    rows = list(zip(
        range(n), us.tolist(), rng.integers(0, 40, n).tolist(),
        rng.choice(["view", "click", "error"], n, p=[0.5, 0.3, 0.2]).tolist(),
        np.round(rng.uniform(0, 50, n), 2).tolist(),
    ))
    tbl = _tbl(rows)
    ds = rd.from_arrow(tbl).repartition(5)
    con = duckdb.connect()
    con.register("events", tbl)
    checks = {
        "events_hourly_window": (events.hourly_window(ds),
                                 ops_contract.events_hourly_sql()),
        "events_sessions": (events.sessionize(ds),
                            ops_contract.events_sessions_sql()),
        "events_rolling_sum": (events.rolling_sum(ds),
                               ops_contract.events_rolling_sql()),
        "events_asof_join": (events.asof_join(ds),
                             ops_contract.events_asof_sql()),
    }
    for name, (got_ds, sql) in checks.items():
        got = got_ds.to_pandas()
        want = con.execute(sql).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False), name
