"""Benchmark: PageRank traversed-edges/s on an RMAT graph, single chip.

Mirrors the reference's e2e benchmark driver (benchmarks/python_e2e/main.py:
RMAT scale/edgefactor sweeps). Headline metric: PageRank traversed edges
per second = E * iterations / wall_time for the jitted power iteration
(graph resident in HBM, convergence on-device).

vs_baseline anchor: the reference publishes no PageRank tables
(BASELINE.json published={}); the only concrete in-tree throughput is BFS
on RMAT scale 23/ef 16 finishing in 0.569 s on 2 A100s
(benchmarks/python_e2e/README.md:50-54) = 2.36e8 traversed edges/s, which
we use as the baseline denominator. Run `python bench.py --full` for a
multi-metric report (pagerank, bfs, spmm).
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_EDGES_PER_S = 134_217_728 / 0.569  # ref BFS scale23/ef16, 2xA100


def build_graph(scale: int, edgefactor: int):
    import os

    import cugraph_tpu as cg
    from cugraph_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from cugraph_tpu.core import serialize as ser

    num_edges = (2**scale) * edgefactor
    cdir = os.environ.get(
        "CUGRAPH_TPU_CACHE_DIR", os.path.expanduser("~/.cache/cugraph_tpu")
    )
    cpath = (
        os.path.join(cdir, f"rmat_s{scale}_ef{edgefactor}.npz") if cdir else None
    )
    if cpath and os.path.exists(cpath):
        return ser.load_graph(cpath), num_edges
    if num_edges > (1 << 26):
        # chunked generation: one 268M-edge jit keeps ~24 unrolled level
        # buffers live (~78 GB observed at scale 24); 16M-edge chunks cap
        # the working set
        import jax

        chunk = 1 << 24
        srcs, dsts = [], []
        for i in range(0, num_edges, chunk):
            s, d = cg.rmat_edgelist(
                scale=scale,
                num_edges=min(chunk, num_edges - i),
                scramble=True,
                rng_key=jax.random.PRNGKey(1 + i),
            )
            srcs.append(np.asarray(s))
            dsts.append(np.asarray(d))
        src, dst = np.concatenate(srcs), np.concatenate(dsts)
        del srcs, dsts
    else:
        src, dst = cg.rmat_edgelist(
            scale=scale, num_edges=num_edges, scramble=True
        )
        src, dst = np.asarray(src), np.asarray(dst)
    from cugraph_tpu.core import renumber as rn

    new_to_old = rn.compute_renumber_map(src, dst, 2**scale)
    src, dst = rn.apply_renumber_map(new_to_old, src, dst)
    g = cg.from_edgelist(src, dst, num_vertices=2**scale)
    if cpath:
        os.makedirs(cdir, exist_ok=True)
        ser.save_graph(g, cpath)
    return g, num_edges


def free_engine_caches():
    """Drop layout references between bench phases so each phase's
    layouts can leave HBM (sum + min + row layouts at scale 23 total
    ~12 GB and co-residency OOMs the 16 GB chip; each phase reloads
    from the disk cache)."""
    import gc

    from cugraph_tpu.prims.pallas import spmm_row, spmv2, spmv3

    spmv2._SORTED_CACHE.clear()
    spmv3._KEYED_CACHE.clear()
    spmm_row._ROW_CACHE.clear()
    gc.collect()


def bench_pagerank(g, num_edges, iters: int = 50, reps: int = 3):
    import jax

    import cugraph_tpu as cg

    # fixed-iteration run: tol=0 prevents early exit so edges/s is exact
    def run():
        pr, it = cg.pagerank(g, tol=0.0, max_iterations=iters)
        # block on EVERY output AND pull a tiny slice to host: under the
        # axon async runtime, waiting on a single tuple element has been
        # observed to return before the computation drains (scale-23 BFS
        # read 0.003 s vs a real 0.73 s). The host pull costs ~25 ms —
        # noise at these magnitudes, and honest (pessimistic) timing.
        jax.block_until_ready((pr, it))
        np.asarray(pr[:64])
        return it

    run()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        it = run()
        best = min(best, time.perf_counter() - t0)
    # tol=0 normally runs all `iters` iterations, but the keyed engine's
    # bf16 hi/lo aggregation can reach an EXACT fixpoint early (measured
    # it=46 at scale 21); traversed edges honestly count the iterations
    # that actually ran.
    assert it > iters // 2, f"suspicious early exit: {it}"
    return num_edges * int(it) / best, best


def bench_bfs(g, num_edges, reps: int = 3):
    import jax

    import cugraph_tpu as cg

    def run():
        dist, pred = cg.bfs(g, 0)
        # see bench_pagerank: full-tuple block + host pull for honest
        # timing on the async runtime
        jax.block_until_ready((dist, pred))
        np.asarray(dist[:64])
        return dist

    run()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return num_edges / best, best


def bench_spmm(g, num_edges, feat_dim: int = 128, reps: int = 3):
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.gnn import spmm_aggregate

    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_vertices, feat_dim)).astype(np.float32)
    )
    # NO outer jit wrapper: it would bake the graph + sorted layout in as
    # compile-payload constants (the inner paths jit with them as args)
    fn = lambda f: spmm_aggregate(g, f, op="mean")
    jax.block_until_ready(fn(feats))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(feats)
        jax.block_until_ready(out)
        np.asarray(out[:8, :8])  # host pull: see bench_pagerank
        best = min(best, time.perf_counter() - t0)
    return num_edges / best, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=21)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--full", action="store_true")
    ap.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="capture a jax.profiler trace of one timed pagerank run",
    )
    args = ap.parse_args()

    g, num_edges = build_graph(args.scale, args.edgefactor)
    eps, t = bench_pagerank(g, num_edges, iters=args.iters)
    print(json.dumps({"phase": "pagerank", "seconds": t}), file=sys.stderr)
    if args.profile:
        from cugraph_tpu.utils.timer import profiler_trace

        with profiler_trace(args.profile):
            bench_pagerank(g, num_edges, iters=args.iters, reps=1)
    # BASELINE.md names a metric TRIPLE (PageRank, BFS, GraphSAGE
    # aggregate edges/s); run all three so every round's driver-captured
    # artifact carries the full picture. Headline stays pagerank.
    free_engine_caches()
    bfs_eps, bfs_t = bench_bfs(g, num_edges)
    print(json.dumps({"phase": "bfs", "seconds": bfs_t}), file=sys.stderr)
    free_engine_caches()
    try:
        spmm_eps, spmm_t = bench_spmm(g, num_edges)
    except Exception as exc:  # scale 24: (V,128) f32 x + out alone are
        # 17 GB — past the 16 GB chip. Report the phase as absent
        # rather than losing the pagerank/bfs artifacts.
        print(
            json.dumps({"phase": "spmm", "error": str(exc)[:200]}),
            file=sys.stderr,
        )
        spmm_eps, spmm_t = 0.0, float("nan")
    full = {
        "bfs_edges_per_s": bfs_eps,
        "bfs_seconds": bfs_t,
        "bfs_vs_baseline": bfs_eps / BASELINE_EDGES_PER_S,
        "spmm_edges_per_s": spmm_eps,
        "spmm_seconds": spmm_t,
        "pagerank_seconds": t,
        "scale": args.scale,
        "edgefactor": args.edgefactor,
    }
    if args.full:
        print(json.dumps(full), file=sys.stderr)
        with open("bench_full.json", "w") as f:
            json.dump(full, f)
    print(
        json.dumps(
            {
                "metric": f"pagerank_traversed_edges_per_s_rmat{args.scale}_ef{args.edgefactor}",
                "value": round(eps),
                "unit": "edges/s",
                "vs_baseline": round(eps / BASELINE_EDGES_PER_S, 3),
                "bfs_edges_per_s": round(bfs_eps),
                "bfs_seconds": round(bfs_t, 4),
                "bfs_vs_baseline": round(bfs_eps / BASELINE_EDGES_PER_S, 3),
                "spmm_edges_per_s": round(spmm_eps),
                "spmm_seconds": round(spmm_t, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
