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

from splade_ray.query import (QueryEngine, boxplot_from_hist,
                              disc_percentiles, h63, lev_dist,
                              mad_from_hist, welch_t_floats)


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


def _hist(pairs):
    hist: dict[int, int] = {}
    for v, c in pairs:
        hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    counts = np.array([hist[v] for v in sorted(hist)], dtype=np.int64)
    return vals, counts


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=200),
                          st.integers(min_value=1, max_value=5)),
                min_size=1, max_size=30))
def test_boxplot_from_hist_matches_bruteforce(pairs):
    vals, counts = _hist(pairs)
    expanded = np.sort(np.repeat(vals, counts))

    def disc(x, q):
        return int(x[max(0, math.ceil(q * len(x)) - 1)])

    n, lo, q1, med, q3, hi = boxplot_from_hist(vals, counts)
    assert n == len(expanded)
    assert lo == int(expanded[0]) and hi == int(expanded[-1])
    assert (q1, med, q3) == tuple(disc(expanded, q)
                                  for q in (0.25, 0.5, 0.75))
    assert lo <= q1 <= med <= q3 <= hi


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=200),
                          st.integers(min_value=1, max_value=5)),
                min_size=1, max_size=30),
       st.integers(min_value=2, max_value=5))
def test_boxplot_hist_shard_split_merge_invariance(pairs, n_shards):
    # splitting the histogram into arbitrary per-shard partials and
    # re-summing must reproduce the single-pass boxplot exactly (the
    # run_queries_sharded percentiles-partial merge)
    vals, counts = _hist(pairs)
    whole = boxplot_from_hist(vals, counts)
    acc: dict[int, int] = {}
    for i, (v, c) in enumerate(zip(vals, counts)):
        c = int(c)
        lo_c = c // n_shards
        parts = [lo_c] * n_shards
        parts[i % n_shards] += c - lo_c * n_shards
        for p in parts:
            if p:
                acc[int(v)] = acc.get(int(v), 0) + p
    mvals = np.array(sorted(acc), dtype=np.int64)
    mcounts = np.array([acc[v] for v in sorted(acc)], dtype=np.int64)
    assert boxplot_from_hist(mvals, mcounts) == whole


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500), min_size=2,
                max_size=40),
       st.lists(st.integers(min_value=0, max_value=500), min_size=2,
                max_size=40))
def test_welch_t_floats_matches_direct_derivation(xs, ys):
    n1, s1, ss1 = len(xs), sum(xs), sum(v * v for v in xs)
    n2, s2, ss2 = len(ys), sum(ys), sum(v * v for v in ys)
    m1, m2, t = welch_t_floats(n1, s1, ss1, n2, s2, ss2)
    assert m1 == s1 / n1 and m2 == s2 / n2
    v1 = (float(ss1) - float(s1) * float(s1) / n1) / (n1 - 1)
    v2 = (float(ss2) - float(s2) * float(s2) / n2) / (n2 - 1)
    v1 = 0.0 if v1 <= 0.0 else v1
    v2 = 0.0 if v2 <= 0.0 else v2
    denom = math.sqrt(v1 / n1 + v2 / n2)
    want = (m1 - m2) / denom if denom > 0.0 else 0.0
    assert t == want  # bit-identical, not approx — the oracle contract


def test_welch_t_constant_sides_yield_zero_t():
    # both populations constant -> both variances clamp to +0.0 ->
    # denom 0 -> t defined as 0 (the SQL CASE twin)
    m1, m2, t = welch_t_floats(3, 30, 300, 4, 8, 16)
    assert (m1, m2) == (10.0, 2.0)
    assert t == 0.0 and math.copysign(1.0, t) == 1.0
