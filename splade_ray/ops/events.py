"""Windowed / streaming-style operators over the ``events`` stream table.

The reference has no stream processing; these cover the custom-operator
classes a training-data pipeline needs that Ray Data lacks natively
(windowed aggregate, sessionization, rolling window, AS-OF join), each
expressed Ray-Data-first:

  * tumbling window — pure partial-aggregation: the window key is a COLUMN
    (floor of the timestamp), so the "window" is one combiner map_batches +
    a tiny groupby.  No ordering requirement at all.
  * sessionization / rolling / as-of — need per-key time order.  Pattern:
    ONE shuffle on a coarse group key (user_id mod n_groups, so task count
    is bounded and independent of user cardinality — map_groups runs one
    Python task PER GROUP), then a vectorized sort + segment-reduce inside
    each partition.  At 10^12 events this is the standard "partition by
    key-hash, sort within partition" stream-window dance; n_groups scales
    with the cluster, the inner numpy stays the same.

Timestamps are converted to int64 epoch-MICROSECONDS at the boundary
(``epoch_us`` in DuckDB): integer window math is exact and
oracle-comparison-safe, where timestamp round-tripping is not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HOUR_US = 3_600_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
ROLLING_ROWS = 3  # current row + 2 preceding
N_GROUPS = 32  # coarse shuffle partitions for per-user operators


def _us(t: pa.Table, col: str = "ts") -> np.ndarray:
    ts = t[col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    # unit-safe: a bare int64 cast yields the column's NATIVE unit, so an
    # events table stored as timestamp[ns]/[ms] would silently break the
    # microsecond window constants — normalize to us first
    if pa.types.is_timestamp(ts.type):
        ts = ts.cast(pa.timestamp("us"))
    return ts.cast(pa.int64()).to_numpy(zero_copy_only=False)


# ------------------------------------------------------- tumbling window ---

def _hourly_partial_batch(t: pa.Table) -> pa.Table:
    """Per-batch combiner: (window_start_us, event_type) partial count/sum —
    the shuffle moves one row per (window, type) per batch, never events."""
    us = _us(t)
    win = us - us % HOUR_US
    etype = t["event_type"]
    if isinstance(etype, pa.ChunkedArray):
        etype = etype.combine_chunks()
    enc = pc.dictionary_encode(etype)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # composite key: (window bucket index, type code)
    wenc, winv = np.unique(win, return_inverse=True)
    key = winv * (len(enc.dictionary) + 1) + codes
    uniq, inv = np.unique(key, return_inverse=True)
    n = np.bincount(inv)
    val = t["value"].to_numpy(zero_copy_only=False)
    vsum = np.bincount(inv, weights=val)
    u_w = wenc[(uniq // (len(enc.dictionary) + 1)).astype(np.int64)]
    u_c = (uniq % (len(enc.dictionary) + 1)).astype(np.int64)
    return pa.table(
        {
            "window_start_us": pa.array(u_w, type=pa.int64()),
            "event_type": enc.dictionary.take(pa.array(u_c)),
            "n_events": pa.array(n.astype(np.int64)),
            "sum_value": pa.array(vsum, type=pa.float64()),
        }
    )


def hourly_window(ds):
    """Tumbling 1-hour windows per event_type:
    (window_start_us, event_type, n_events, sum_value rounded to 6 dp)."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(_hourly_partial_batch, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )

    def _round(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value",
            pa.array(np.round(t["sum_value"].to_numpy(zero_copy_only=False), 6),
                     type=pa.float64()),
        )

    return agg.map_batches(_round, batch_format="pyarrow")


# --------------------------------------------------------- sessionization ---

def _add_gkey_batch(t: pa.Table, *, n_groups: int) -> pa.Table:
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    return t.append_column("gkey",
                           pa.array((uid % n_groups).astype(np.int64)))


def _user_sorted(group: pa.Table):
    """Sort one coarse partition by (user_id, ts_us, event_id); returns
    (uid, us, order, user-change boolean array)."""
    uid = group["user_id"].to_numpy(zero_copy_only=False)
    us = _us(group)
    eid = group["event_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, us, uid))
    uid, us = uid[order], us[order]
    new_user = np.empty(len(uid), dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    return uid, us, order, new_user


def _sessions_group(group: pa.Table, *, gap_us: int) -> pa.Table:
    """Coarse partition -> per-user sessions (vectorized segment reduce)."""
    if group.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], type=pa.int64()),
             "session_id": pa.array([], type=pa.int64()),
             "session_start_us": pa.array([], type=pa.int64()),
             "session_end_us": pa.array([], type=pa.int64()),
             "n_events": pa.array([], type=pa.int64()),
             "sum_value": pa.array([], type=pa.float64())}
        )
    uid, us, order, new_user = _user_sorted(group)
    val = group["value"].to_numpy(zero_copy_only=False)[order]
    gap = np.empty(len(uid), dtype=bool)
    gap[0] = True
    gap[1:] = (us[1:] - us[:-1]) > gap_us
    new_sess = new_user | gap
    sess_idx = np.cumsum(new_sess) - 1  # global session index
    # session_id = per-user 0-based: subtract the user's first session index
    first_sess_of_user = sess_idx[new_user]
    sid = sess_idx - np.repeat(first_sess_of_user, np.diff(
        np.r_[np.flatnonzero(new_user), len(uid)]))
    starts = np.flatnonzero(new_sess)
    ends = np.r_[starts[1:], len(uid)] - 1
    return pa.table(
        {
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "session_id": pa.array(sid[starts], type=pa.int64()),
            "session_start_us": pa.array(us[starts], type=pa.int64()),
            "session_end_us": pa.array(us[ends], type=pa.int64()),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "sum_value": pa.array(
                np.round(np.add.reduceat(val, starts), 6), type=pa.float64()),
        }
    )


def sessionize(ds, gap_us: int = SESSION_GAP_US, n_groups: int = N_GROUPS):
    """Gap-based session windows per user (30-min inactivity closes one)."""
    return (
        ds.map_batches(_add_gkey_batch, batch_format="pyarrow",
                       fn_kwargs={"n_groups": n_groups})
        .groupby("gkey")
        .map_groups(_sessions_group, batch_format="pyarrow",
                    fn_kwargs={"gap_us": gap_us})
    )


# --------------------------------------------------------- rolling window ---

def _rolling_group(group: pa.Table, *, w: int) -> pa.Table:
    """Per-user rolling sum of ``value`` over the last ``w`` events
    (inclusive), time-ordered; exact windowed prefix-sum difference."""
    if group.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], type=pa.int64()),
             "user_id": pa.array([], type=pa.int64()),
             "rolling_sum": pa.array([], type=pa.float64())}
        )
    uid, us, order, new_user = _user_sorted(group)
    eid = group["event_id"].to_numpy(zero_copy_only=False)[order]
    val = group["value"].to_numpy(zero_copy_only=False)[order]
    pos_in_user = np.arange(len(uid)) - np.repeat(
        np.flatnonzero(new_user),
        np.diff(np.r_[np.flatnonzero(new_user), len(uid)]))
    # windowed sum via per-row loop-free shifted adds (w is tiny)
    out = val.copy()
    for sh in range(1, w):
        contrib = np.zeros(len(val))
        contrib[sh:] = val[:-sh]
        contrib[pos_in_user < sh] = 0.0  # don't reach across users
        out += contrib
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "user_id": pa.array(uid, type=pa.int64()),
            "rolling_sum": pa.array(np.round(out, 6), type=pa.float64()),
        }
    )


def rolling_sum(ds, w: int = ROLLING_ROWS, n_groups: int = N_GROUPS):
    return (
        ds.map_batches(_add_gkey_batch, batch_format="pyarrow",
                       fn_kwargs={"n_groups": n_groups})
        .groupby("gkey")
        .map_groups(_rolling_group, batch_format="pyarrow",
                    fn_kwargs={"w": w})
    )


# -------------------------------------------------------------- as-of join --

def _asof_group(group: pa.Table, *, right_type: str) -> pa.Table:
    """Within one coarse partition: each event joined to the user's LATEST
    event of ``right_type`` at-or-before it (inner semantics: unmatched rows
    drop).  Identical-(user, ts) errors keep the max event_id (both sides).

    FULLY vectorized — no per-user Python loop (a partition with millions of
    users pays O(rows) numpy, not O(users) iterations):

      1. rows sorted (user, ts, event_id); equal-(user, ts) runs found once;
         each row's horizon = the LAST index of its run (so an equal-ts
         right-side row sorting AFTER the left row still matches, with max
         event_id winning ties — same as searchsorted side='right').
      2. per-user segmented cummax of "last right-side index so far",
         realized as ONE global np.maximum.accumulate over values offset by
         user_index * (n+1): consecutive users' ranges are disjoint and
         ascending, so the accumulate can never carry a match across a user
         boundary (the standard offset-shift segmented-scan trick).
      3. answer for row i = cummax at its horizon, decoded back to a
         position; rows whose user has no right event yet drop.
    """
    if group.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], type=pa.int64()),
             "user_id": pa.array([], type=pa.int64()),
             "match_event_id": pa.array([], type=pa.int64()),
             "match_value": pa.array([], type=pa.float64())}
        )
    uid, us, order, new_user = _user_sorted(group)
    n = len(uid)
    eid = group["event_id"].to_numpy(zero_copy_only=False)[order]
    val = group["value"].to_numpy(zero_copy_only=False)[order]
    etype = group["event_type"]
    if isinstance(etype, pa.ChunkedArray):
        etype = etype.combine_chunks()
    is_r = pc.equal(etype, right_type).to_numpy(zero_copy_only=False)[order]

    # (user, ts) run ends: horizon[i] = last row of i's equal-(user, ts) run
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = new_user[1:] | (us[1:] != us[:-1])
    run_id = np.cumsum(run_start) - 1
    run_last = np.zeros(int(run_id[-1]) + 1, dtype=np.int64)
    run_last[run_id] = np.arange(n, dtype=np.int64)  # last write wins
    horizon = run_last[run_id]

    # segmented cummax via offset shift: base = user_index * (n + 1)
    uidx = np.cumsum(new_user) - 1
    base = uidx * np.int64(n + 1)
    tagged = np.where(is_r, base + np.arange(n, dtype=np.int64) + 1, base)
    m = np.maximum.accumulate(tagged)[horizon]
    rel = m - base  # > 0 iff this user has a right event at-or-before
    ok = rel > 0
    sel = rel[ok] - 1  # global row index of the matched right event
    return pa.table(
        {
            "event_id": pa.array(eid[ok], type=pa.int64()),
            "user_id": pa.array(uid[ok], type=pa.int64()),
            "match_event_id": pa.array(eid[sel], type=pa.int64()),
            "match_value": pa.array(val[sel], type=pa.float64()),
        }
    )


def asof_join(ds, right_type: str = "error", n_groups: int = N_GROUPS):
    """AS-OF join of the event stream against its own ``right_type`` subset,
    per user: for every event, the latest error at-or-before its timestamp.
    One coarse-key shuffle co-locates both sides (the right side IS a filter
    of the left), then vectorized searchsorted per user."""
    return (
        ds.map_batches(_add_gkey_batch, batch_format="pyarrow",
                       fn_kwargs={"n_groups": n_groups})
        .groupby("gkey")
        .map_groups(_asof_group, batch_format="pyarrow",
                    fn_kwargs={"right_type": right_type})
    )
