"""Weak-scaling harness: MG PageRank edges/s as the mesh grows with the
problem (BASELINE.md target: >=80% efficiency 1 host -> N hosts).

Mirrors the reference's multi-GPU e2e sweep driver
(/root/reference/benchmarks/python_e2e/main.py: --ngpus sweeps with RMAT
scale growing alongside). Per mesh shape (r, c) the RMAT scale is
base_scale + log2(r*c) so edges-per-device stays constant; efficiency =
(edges/s per device at shape) / (edges/s at 1 device).

Degenerate single-host mode (default): an 8-virtual-device CPU mesh —
numbers are NOT TPU rates, only the scaling ratio is meaningful. On a
real multi-host slice, run one process per host with --distributed
(dist.mesh.initialize_distributed handles the jax.distributed bootstrap) and
the same command line on every host.

Usage:
    python benchmarks/weak_scaling.py --cpu --base-scale 14 --iters 10
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-scale", type=int, default=14)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="degenerate single-host mode: 8 virtual CPU devices",
    )
    ap.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: init jax.distributed before building the mesh",
    )
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import os

    import jax

    if args.distributed:
        from cugraph_tpu.dist.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    elif args.cpu or "cpu" in (os.environ.get("JAX_PLATFORMS") or ""):
        # degenerate single-host mode: force the CPU backend and widen it
        # BEFORE any device query initializes backends (env vars are too
        # late under the axon sitecustomize; the config route works)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import numpy as np

    import cugraph_tpu as cg
    from cugraph_tpu.dist import make_mesh, mesh_shape_for
    from cugraph_tpu.dist.mg_algos import mg_pagerank
    from cugraph_tpu.dist.mg_graph import distribute_graph

    n_dev = len(jax.devices())
    shapes = []
    d = 1
    while d <= n_dev:
        shapes.append(mesh_shape_for(d))
        d *= 2

    rows = []
    base_rate = None
    for r, c in shapes:
        n = r * c
        scale = args.base_scale + int(np.log2(n))
        e = (2**scale) * args.edgefactor
        src, dst = cg.rmat_edgelist(scale=scale, num_edges=e)
        g = cg.from_edgelist(
            np.asarray(src), np.asarray(dst), num_vertices=2**scale
        )
        mesh = make_mesh((r, c), jax.devices()[:n])
        mgg = distribute_graph(mesh, g)

        def run():
            pr, _ = mg_pagerank(
                mesh, mgg, tol=0.0, max_iterations=args.iters
            )
            jax.block_until_ready(pr)

        run()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        rate = e * args.iters / best
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        rows.append(
            {
                "mesh": [r, c],
                "scale": scale,
                "edges_per_s": rate,
                "per_device": per_dev,
                "efficiency": per_dev / base_rate,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(
        json.dumps(
            {
                "metric": "weak_scaling_efficiency",
                "value": round(rows[-1]["efficiency"], 3),
                "unit": "ratio",
                "shapes": [row["mesh"] for row in rows],
            }
        )
    )


if __name__ == "__main__":
    main()
