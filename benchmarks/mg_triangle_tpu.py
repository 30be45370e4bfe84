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
    ap.add_argument("--batch", type=int, default=None)
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
        _oriented_dcsr,
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
    *_o, k = _oriented_dcsr(mesh, mgg)
    slots = mgg.rows * mgg.cols * mgg.g_pad
    batch = args.batch or min(max(((1 << 26) // max(k, 1)) // 128 * 128, 128), 8192)
    rounds = -(-slots // max(batch, 1))
    print(
        f"scale {args.scale}: V={g.num_vertices} E={g.num_edges} "
        f"oriented k={k} (<= sqrt(2E)={int((2*g.num_edges)**0.5)}) "
        f"slots={slots} batch={batch} rounds~{rounds} "
        f"member tile {batch}x{k} = {batch * k * 4 / 1e6:.0f} MB",
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
        # host scipy oracle (the on-chip SG path is its own benchmark;
        # running it after the MG run has crashed the TPU worker)
        import scipy.sparse as sp

        adj = g.csr()
        ee = adj.num_edges
        s_ = np.asarray(adj.majors)[:ee]
        d_ = np.asarray(adj.minors)[:ee]
        A = sp.csr_matrix(
            (np.ones(ee), (s_, d_)), shape=(g.num_vertices,) * 2
        )
        A.setdiag(0)
        A.eliminate_zeros()
        A = ((A + A.T) > 0).astype(np.int64)
        oracle_total = int((A @ A).multiply(A).sum()) // 6
        print(
            f"scipy oracle total={oracle_total} equal="
            f"{oracle_total == total}",
            flush=True,
        )


if __name__ == "__main__":
    main()
