"""Property tests for the round-5 kernels (pure functions, no Ray).

The contract sweep proves oracle parity on the fixed query set; these
drive the same kernels across the input space — mad_from_hist against a
brute-force expansion, lev_dist against an uncapped reference DP, and
the ext_stats float derivation against numpy.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_ray.query import (QueryEngine, disc_percentiles, h63, lev_dist,
                              mad_from_hist)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcde", max_size=8),
       st.text(alphabet="abcde", max_size=8),
       st.integers(min_value=1, max_value=4))
def test_lev_dist_matches_reference_dp_up_to_cap(a, b, cap):
    ref = _ref_lev(a, b)
    got = lev_dist(a, b, cap=cap)
    assert got == min(ref, cap)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=200),
                          st.integers(min_value=1, max_value=5)),
                min_size=1, max_size=30))
def test_mad_from_hist_matches_bruteforce(pairs):
    # build a sorted value histogram and the expanded multiset
    hist: dict[int, int] = {}
    for v, c in pairs:
        hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    counts = np.array([hist[v] for v in sorted(hist)], dtype=np.int64)
    expanded = np.repeat(vals, counts)

    def disc_q50(x: np.ndarray) -> int:
        # DuckDB quantile_disc(0.5): element at ceil(0.5*n)-1 of sorted x
        x = np.sort(x)
        return int(x[max(0, math.ceil(0.5 * len(x)) - 1)])

    n, med, mad = mad_from_hist(vals, counts)
    assert n == len(expanded)
    assert med == disc_q50(expanded)
    assert mad == disc_q50(np.abs(expanded - med))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                max_size=50))
def test_ext_stats_floats_matches_direct_float_ops(dls):
    n, s, ss = len(dls), sum(dls), sum(d * d for d in dls)
    avg, var, std = QueryEngine.ext_stats_floats(n, s, ss)
    assert avg == s / n
    raw = ss / n - avg * avg
    assert var == (raw if raw > 0.0 else 0.0)
    assert math.copysign(1.0, var) == 1.0  # never -0.0
    assert std == math.sqrt(var)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=100),
                          st.integers(min_value=1, max_value=4)),
                min_size=1, max_size=20),
       st.integers(min_value=2, max_value=4))
def test_mad_hist_merge_invariance(pairs, n_shards):
    # splitting a histogram into shard partials and re-summing (the
    # sharded-merge path) must reproduce the single-pool answer
    hist: dict[int, int] = {}
    for v, c in pairs:
        hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    counts = np.array([hist[v] for v in sorted(hist)], dtype=np.int64)
    base = mad_from_hist(vals, counts)

    # scatter each value's count across shards deterministically
    shard_hists = [dict() for _ in range(n_shards)]
    for i, (v, c) in enumerate(zip(vals, counts)):
        for j in range(int(c)):
            d = shard_hists[(i + j) % n_shards]
            d[int(v)] = d.get(int(v), 0) + 1
    merged: dict[int, int] = {}
    for d in shard_hists:
        for v, c in d.items():
            merged[v] = merged.get(v, 0) + c
    mvals = np.array(sorted(merged), dtype=np.int64)
    mcounts = np.array([merged[v] for v in sorted(merged)], dtype=np.int64)
    assert mad_from_hist(mvals, mcounts) == base


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=30))
def test_h63_is_63_bit_and_deterministic(s):
    v = h63(s)
    assert 0 <= v < (1 << 63)
    assert v == h63(s)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=1, max_value=50),
                          st.integers(min_value=1, max_value=5)),
                min_size=1, max_size=20),
       st.floats(min_value=0.01, max_value=1.0))
def test_disc_percentiles_matches_numpy_expansion(pairs, q):
    hist: dict[int, int] = {}
    for v, c in pairs:
        hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    counts = np.array([hist[v] for v in sorted(hist)], dtype=np.int64)
    expanded = np.sort(np.repeat(vals, counts))
    n, (p,) = disc_percentiles(vals, counts, (q,))
    assert n == len(expanded)
    assert p == int(expanded[max(0, math.ceil(q * n) - 1)])
