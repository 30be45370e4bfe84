"""Scale sweep on the real chip: PageRank + BFS at RMAT scale 23/24.

Run AFTER /tmp-style layout prebuilds (bench.py builds scale 21 itself);
emits one JSON line per metric, mirroring bench.py's contract, and
writes BENCH_scale{N}.json artifacts at the repo root.

Usage: python benchmarks/bench_scales.py [--scales 23,24] [--iters 50]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BASELINE_EDGES_PER_S = 134_217_728 / 0.569  # ref BFS scale23/ef16, 2xA100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="23,24")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-bfs", action="store_true")
    args = ap.parse_args()

    import bench  # repo-root bench.py: graph cache + pagerank/bfs drivers

    results = {}
    for scale in [int(s) for s in args.scales.split(",")]:
        g, num_edges = bench.build_graph(scale, 16)
        eps, secs = bench.bench_pagerank(g, num_edges, args.iters, args.reps)
        rec = {
            "metric": f"pagerank_traversed_edges_per_s_rmat{scale}_ef16",
            "value": int(eps),
            "unit": "edges/s",
            "vs_baseline": round(eps / BASELINE_EDGES_PER_S, 3),
            "seconds_per_50_iters": round(secs * 50 / args.iters, 3),
        }
        print(json.dumps(rec), flush=True)
        results[f"pagerank_s{scale}"] = rec
        if not args.skip_bfs:
            beps, bsecs = bench.bench_bfs(g, num_edges, args.reps)
            rec = {
                "metric": f"bfs_edges_per_s_rmat{scale}_ef16",
                "value": int(beps),
                "unit": "edges/s",
                "vs_baseline": round(beps / BASELINE_EDGES_PER_S, 3),
                "seconds": round(bsecs, 3),
            }
            print(json.dumps(rec), flush=True)
            results[f"bfs_s{scale}"] = rec
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, f"BENCH_scale{scale}.json"), "w") as f:
            json.dump(
                {
                    "ts": time.time(),
                    **{
                        k: v
                        for k, v in results.items()
                        if k.endswith(f"s{scale}")
                    },
                },
                f,
                indent=1,
            )
        del g


if __name__ == "__main__":
    main()
