"""Serving-side N->4N scaling: batch query throughput at 8 vs 32 CPUs.

The north rule's scaling criterion covers the whole metric — build
throughput AND query serving.  The build side is bounded by the sandbox's
single-socket staging bandwidth (BASELINE.md); the serving side is an
actor pool over an immutable mmapped index and should scale near-linearly.
This harness measures it: ONE index built once, then query batches
answered through `run_queries` in fresh processes at 8 and 32 CPUs
(actor pool = cpus/2 at both levels, so the actor ratio equals the CPU
ratio), interleaved best-of-3 per level.

Throughput is MARGINAL (steady-state): each child times a batch of B
queries and a batch of 2B queries through identical fresh pools and
reports B / (wall_2B - wall_B) — pool startup (actor creation + per-actor
index open, paid once per DEPLOYMENT on a real serving cluster, not per
batch) cancels exactly.  The batch walls are reported alongside so the
fixed cost is visible, not hidden.

Usage: python tools/serve_scaling.py            # parent: prints one JSON line
       SERVE_SCALING_CPUS=8 python tools/serve_scaling.py --child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# runnable from any cwd: the repo root (parent of tools/) owns splade_ray
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)  # Ray workers + child processes

INDEX = "/tmp/splade_ray_serve_scaling_idx"
N_FILES = 200_000
N_QUERY_COPIES = 150  # B ~ 4,650 queries (x2 for the 2B batch)


def _query_batch(copies: int):
    import pyarrow as pa

    from splade_ray.corpus import generate_queries

    qtbl = generate_queries()
    qs = qtbl["query"].to_pylist()
    lgs = qtbl["lang"].to_pylist()
    out_q, out_l = [], []
    for _ in range(copies):
        out_q.extend(qs)
        out_l.extend(lgs)
    return pa.table({
        "query_id": pa.array(range(len(out_q)), type=pa.int64()),
        "query": pa.array(out_q, type=pa.string()),
        "lang": pa.array(out_l, type=pa.string()),
    })


def child() -> None:
    ncpu = int(os.environ["SERVE_SCALING_CPUS"])
    import ray
    import ray.data as rd
    from ray.data import DataContext

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    from splade_ray.query import run_queries

    conc = max(2, ncpu // 2)

    def wall(copies: int) -> float:
        qt = _query_batch(copies)
        t0 = time.perf_counter()
        run_queries(rd.from_arrow(qt), INDEX, k=10, scorer="taat",
                    concurrency=conc).count()
        return time.perf_counter() - t0

    n_b = _query_batch(N_QUERY_COPIES).num_rows
    best = None
    for _ in range(2):  # best-of-2 (by marginal qps) inside the process
        w1 = wall(N_QUERY_COPIES)
        w2 = wall(2 * N_QUERY_COPIES)
        delta = max(w2 - w1, 1e-9)
        if best is None or n_b / delta > best["qps_marginal"]:
            best = {"wall_b_sec": round(w1, 3), "wall_2b_sec": round(w2, 3),
                    "qps_marginal": round(n_b / delta, 1)}
    print(json.dumps({"ncpu": ncpu, "n_queries_b": n_b, **best}))
    ray.shutdown()


def parent() -> None:
    import ray
    import ray.data as rd

    # build ONCE (full width); every level reuses the identical index
    if not os.path.exists(os.path.join(INDEX, "MANIFEST.json")):
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from splade_ray.build import build_index
        from splade_ray.corpus import corpus_parquet

        build_index(rd.read_parquet(corpus_parquet(N_FILES, seed=7)),
                    INDEX, lang_tagged=True, n_shards=64)
        ray.shutdown()

    def run(ncpu: int) -> dict:
        env = dict(os.environ, SERVE_SCALING_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    runs_lo, runs_hi = [], []
    for _ in range(3):  # interleaved so noise cannot hit one level only
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    best_lo = max(runs_lo, key=lambda r: r["qps_marginal"])
    best_hi = max(runs_hi, key=lambda r: r["qps_marginal"])
    eff = (best_hi["qps_marginal"] / best_lo["qps_marginal"]) / (hi / lo)
    print(json.dumps({
        "metric": "steady-state query throughput scaling, N=8 vs 4N=32 cpus"
                  " (one immutable index, actor pool = cpus/2, marginal"
                  " wall(2B)-wall(B) so per-deployment pool startup cancels)",
        "qps_8": best_lo["qps_marginal"], "qps_32": best_hi["qps_marginal"],
        "walls_8_sec": [best_lo["wall_b_sec"], best_lo["wall_2b_sec"]],
        "walls_32_sec": [best_hi["wall_b_sec"], best_hi["wall_2b_sec"]],
        "runs_qps_8": [r["qps_marginal"] for r in runs_lo],
        "runs_qps_32": [r["qps_marginal"] for r in runs_hi],
        "n_queries_b": best_lo["n_queries_b"],
        "scaling_efficiency": round(eff, 3),
        "n_files": N_FILES,
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        parent()
