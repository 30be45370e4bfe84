"""Host-side prebuild of the sorted-pipeline layouts for a bench scale.

Runs on the CPU backend (the build is numpy + native C++ anyway) so the
TPU stays free; layouts land in the shared disk cache with byte-identical
keys (CUGRAPH_TPU_FORCE_SORTED bypasses the backend gate), so a later
`python bench.py --scale N` / benchmarks/bench_scales.py run on the TPU
backend hits the cache and skips the minutes-long host pass.

Builds the bench trio's variants from ONE host pass per source range
(sorted_layouts_prebuild): sum (pagerank + GNN spmm share a key on
unweighted graphs) and unweighted min (BFS).

Usage: python benchmarks/prebuild_layouts.py --scale 23
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
    ap.add_argument("--scale", type=int, default=23)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument(
        "--row",
        action="store_true",
        help="also prebuild the row-SpMM layout (bench.py's spmm metric)",
    )
    args = ap.parse_args()

    import bench  # repo-root: graph generation + .npz cache

    t0 = time.time()
    g, num_edges = bench.build_graph(args.scale, args.edgefactor)
    print(f"graph ready ({num_edges} edges) in {time.time()-t0:.0f}s", flush=True)

    from cugraph_tpu.prims.pallas.spmv2 import sorted_layouts_prebuild

    t0 = time.time()
    # materialize=False: multi-range prebuilds free each range after its
    # disk-cache save (the scale-24 accumulation OOM-killed a 125 GB host)
    lays = sorted_layouts_prebuild(
        g, [(True, "sum"), (False, "min")], materialize=False
    )
    assert lays is not None
    print(f"layouts built+cached in {time.time()-t0:.0f}s", flush=True)

    if args.row:
        from cugraph_tpu.prims.pallas.spmm_row import row_spmm_layout_for

        t0 = time.time()
        rlay = row_spmm_layout_for(g, use_weights=False)
        assert rlay is not None
        print(f"row layout built+cached in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
