"""Interleaved A/B of the headline build between two git revisions.

VERDICT r3 #2 asked for clean bench evidence: an interleaved HEAD-vs-r3 A/B
at 200k files / 32 cpus, so that a co-tenant noise window (the sandbox sees
bursts that inflate wall-time 2-8x) cannot hit only one side.  Each side runs
in a fresh process via its own checkout's bench.py in build-only mode;
rounds alternate A,B,A,B,...; best-of-N per side is the measurement.

Usage: python tools/ab_bench.py <rev_b> [--rounds 3] [--files 200000]
(side A is the current working tree; side B is a detached worktree of rev_b
under /tmp/splade_ray_ab_<rev>.)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_side(bench_dir: str, ncpu: int, files: int, shm_tag: str) -> float:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_BENCH_BUILD_ONLY="1",
        GRAFT_BENCH_FILES=str(files),
        GRAFT_BENCH_SHARDS="64",
        GRAFT_BENCH_ROOT=f"/dev/shm/splade_ray_ab_{shm_tag}",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(bench_dir, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=bench_dir,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])["queries"]["build_index_sec"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("rev_b")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--files", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    rev = subprocess.run(["git", "rev-parse", "--short", args.rev_b],
                         capture_output=True, text=True, check=True,
                         cwd=REPO).stdout.strip()
    wt = f"/tmp/splade_ray_ab_{rev}"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, rev],
                       check=True, cwd=REPO)

    runs_a, runs_b = [], []
    for i in range(args.rounds):
        runs_a.append(run_side(REPO, args.cpus, args.files, "head"))
        runs_b.append(run_side(wt, args.cpus, args.files, rev))
        print(f"round {i}: head={runs_a[-1]:.3f}s  {rev}={runs_b[-1]:.3f}s",
              file=sys.stderr)

    print(json.dumps({
        "metric": f"interleaved A/B build wall, HEAD vs {rev} "
                  f"({args.files} files, {args.cpus} cpus, best of {args.rounds})",
        "head_runs_sec": [round(x, 3) for x in runs_a],
        "rev_runs_sec": [round(x, 3) for x in runs_b],
        "head_best_sec": round(min(runs_a), 3),
        "rev_best_sec": round(min(runs_b), 3),
        "ratio_head_over_rev": round(min(runs_a) / min(runs_b), 3),
    }))


if __name__ == "__main__":
    main()
