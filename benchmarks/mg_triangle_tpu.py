"""On-chip timing of the distributed triangle count (VERDICT r4 #6).

Runs mg_triangle_count on a real-chip (1,1) mesh at RMAT scale 16-18
and compares wall time + equality against the SG path on the same
graph. The interesting quantities are the member-buffer height k
(max local degree — O(max degree) on a power-law graph) and the
sequential round count (slots / batch); both are printed so the
PERFORMANCE.md entry can state the bound.

Usage: python benchmarks/mg_triangle_tpu.py --scale 18
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--sg", action="store_true", help="also time SG")
    args = ap.parse_args()

    import jax
    import numpy as np

    from cugraph_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import bench
    import cugraph_tpu as cg
    from cugraph_tpu.dist import distribute_graph, make_mesh
    from cugraph_tpu.dist.mg_similarity import (
        _max_local_degree,
        mg_triangle_count,
    )

    src, dst = cg.rmat_edgelist(
        scale=args.scale, num_edges=(2**args.scale) * args.edgefactor,
        scramble=True,
    )
    src, dst = np.asarray(src), np.asarray(dst)
    from cugraph_tpu.core import renumber as rn

    new_to_old = rn.compute_renumber_map(src, dst, 2**args.scale)
    src, dst = rn.apply_renumber_map(new_to_old, src, dst)
    g = cg.from_edgelist(src, dst, num_vertices=2**args.scale,
                         symmetrize=True)
    mesh = make_mesh((1, 1), jax.devices()[:1])
    mgg = distribute_graph(mesh, g)
    k = _max_local_degree(mgg)
    slots = mgg.rows * mgg.cols * mgg.g_pad
    rounds = -(-slots // max(args.batch, 1))
    print(
        f"scale {args.scale}: V={g.num_vertices} E={g.num_edges} "
        f"max_local_degree k={k} slots={slots} rounds~{rounds} "
        f"member buffer {args.batch}x{k} = "
        f"{args.batch * k * 4 / 1e6:.0f} MB/round",
        flush=True,
    )
    t0 = time.perf_counter()
    counts = mg_triangle_count(mesh, mgg, batch_size=args.batch)
    t_mg = time.perf_counter() - t0
    total = int(counts.sum()) // 3
    print(f"mg_triangle_count: {t_mg:.1f}s (first call, incl. compile); "
          f"triangles={total}", flush=True)
    t0 = time.perf_counter()
    counts2 = mg_triangle_count(mesh, mgg, batch_size=args.batch)
    t_mg2 = time.perf_counter() - t0
    print(f"mg_triangle_count warm: {t_mg2:.1f}s", flush=True)
    assert np.array_equal(counts, counts2)

    if args.sg:
        t0 = time.perf_counter()
        sg_counts = np.asarray(cg.triangle_count(g))
        t_sg = time.perf_counter() - t0
        print(f"SG triangle_count: {t_sg:.1f}s; equal={np.array_equal(sg_counts, counts)}",
              flush=True)


if __name__ == "__main__":
    main()
