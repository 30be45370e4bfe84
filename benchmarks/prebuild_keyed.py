"""Host-side prebuild of keyed-engine (spmv3) layouts for bench scales.

Runs on the CPU backend; layouts land in the shared disk cache with the
keys keyed_layout_for computes at bench time on the TPU backend. The
sum variant is the keyed engine's default route for pagerank / katz /
eigenvector / WCC-sum sweeps; min stays on v2 unless
CUGRAPH_TPU_MIN_ENGINE=v3 (pass --min to prebuild it anyway).

Usage: python benchmarks/prebuild_keyed.py --scale 21 23
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CUGRAPH_TPU_FORCE_SORTED", "1")
os.environ.setdefault("CUGRAPH_TPU_CACHE_BUDGET", str(80 * 1024**3))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, nargs="+", default=[21])
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--min", action="store_true", dest="also_min")
    args = ap.parse_args()

    import bench

    from cugraph_tpu.prims.pallas.spmv3 import keyed_layout_for

    for scale in args.scale:
        t0 = time.time()
        g, num_edges = bench.build_graph(scale, args.edgefactor)
        print(
            f"scale {scale}: graph ready ({num_edges} edges) "
            f"in {time.time()-t0:.0f}s",
            flush=True,
        )
        t0 = time.time()
        lay = keyed_layout_for(g, use_weights=True, variant="sum")
        assert lay is not None
        fill = lay.num_edges / (
            lay.n_parts * lay.cfg.part_rows * 128
        )
        print(
            f"scale {scale}: keyed sum layout in {time.time()-t0:.0f}s — "
            f"parts {lay.n_parts} (PR {lay.cfg.part_rows}) slabs "
            f"{lay.n_slabs} steps {lay.n_steps} heavy "
            f"{lay.heavy_dsts.shape[0]} fill {fill:.2f}",
            flush=True,
        )
        if args.also_min:
            t0 = time.time()
            lm = keyed_layout_for(g, use_weights=False, variant="min")
            assert lm is not None
            print(
                f"scale {scale}: keyed min layout in {time.time()-t0:.0f}s "
                f"— parts {lm.n_parts} (PR {lm.cfg.part_rows})",
                flush=True,
            )


if __name__ == "__main__":
    main()
