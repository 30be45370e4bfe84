"""Benchmark sweep driver — the analog of the reference's
benchmarks/python_e2e/main.py (RMAT scale/edgefactor sweeps, JSON results).

Usage:
    python benchmarks/sweep.py --scales 18 20 21 --edgefactor 16 \
        --algos pagerank bfs spmm --out results.json
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[18, 20])
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument(
        "--algos",
        nargs="+",
        default=["pagerank", "bfs", "spmm"],
        choices=["pagerank", "bfs", "sssp", "wcc", "spmm", "sample"],
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    import bench as b

    results = []
    for scale in args.scales:
        g, num_edges = b.build_graph(scale, args.edgefactor)
        row = {"scale": scale, "edgefactor": args.edgefactor, "edges": num_edges}
        if "pagerank" in args.algos:
            eps, t = b.bench_pagerank(g, num_edges)
            row["pagerank_edges_per_s"] = eps
            row["pagerank_seconds_20it"] = t
        if "bfs" in args.algos:
            eps, t = b.bench_bfs(g, num_edges)
            row["bfs_edges_per_s"] = eps
            row["bfs_seconds"] = t
        if "spmm" in args.algos:
            eps, t = b.bench_spmm(g, num_edges)
            row["spmm_edges_per_s"] = eps
            row["spmm_seconds"] = t
        if "sssp" in args.algos:
            import cugraph_tpu as cg

            src, dst, _ = (None, None, None)
            t0 = time.perf_counter()
            d, _ = cg.sssp(g, 0)
            jax.block_until_ready(d)
            row["sssp_seconds"] = time.perf_counter() - t0
        if "wcc" in args.algos:
            import cugraph_tpu as cg

            t0 = time.perf_counter()
            l = cg.weakly_connected_components(g)
            jax.block_until_ready(l)
            row["wcc_seconds"] = time.perf_counter() - t0
        if "sample" in args.algos:
            import cugraph_tpu as cg

            seeds = np.arange(1024, dtype=np.int32)
            t0 = time.perf_counter()
            cg.uniform_neighbor_sample(g, seeds, [10, 10])
            row["sample_seconds"] = time.perf_counter() - t0
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
