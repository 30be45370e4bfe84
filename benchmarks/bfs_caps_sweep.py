"""BFS sparse-path cap sweep on the real chip (VERDICT r3 #9).

Grid over (cap_e, cap_v) for the direction-optimizing hybrid's sparse
push (algos/traversal.py): each pair is a static retrace of
_bfs_pallas_jit via bfs(..., sparse_caps=...), so one process covers the
whole grid (compiles cache across pairs). Records the chosen defaults in
docs/PERFORMANCE.md by hand after the run.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bfs_caps_sweep.py --scale 23
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=23)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--caps",
        default="17:15,18:16,19:17,20:17,21:18",
        help="comma list of log2(cap_e):log2(cap_v) pairs; 0:0 = dense only",
    )
    args = ap.parse_args()

    import jax

    import bench
    import cugraph_tpu as cg

    g, num_edges = bench.build_graph(args.scale, args.edgefactor)
    results = []
    pairs = [
        tuple(int(x) for x in p.split(":")) for p in args.caps.split(",")
    ]
    for le, lv in pairs:
        caps = None if le == 0 else (1 << le, 1 << lv)

        def run():
            d, p = cg.bfs(g, 0, sparse_caps=caps)
            # full-tuple block + host pull: see bench.bench_bfs (the
            # async runtime under-measures single-element blocks)
            jax.block_until_ready((d, p))
            np.asarray(d[:64])

        run()  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        rec = {
            "cap_e": 0 if caps is None else caps[0],
            "cap_v": 0 if caps is None else caps[1],
            "seconds": round(best, 4),
            "edges_per_s": int(num_edges / best),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    best = min(results, key=lambda r: r["seconds"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
