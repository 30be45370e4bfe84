"""Per-kernel breakdown of the keyed (v3) SpMV pass on the real chip.

Slope method per stage (chained in-jit iterations with a data
dependency, cost = (t(K) - t(1)) / (K-1)), device-resident inputs.

Usage: python benchmarks/kernel_breakdown3_tpu.py --scale 21
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=21)
    ap.add_argument("--k", type=int, default=9)
    args = ap.parse_args()

    from cugraph_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from cugraph_tpu.prims.pallas import spmv2, spmv3

    g, _e = bench.build_graph(args.scale, 16)
    lay = spmv3.keyed_layout_for(g, use_weights=True, variant="sum")
    assert lay is not None
    print(
        f"parts {lay.n_parts} PR {lay.cfg.part_rows} slabs {lay.n_slabs} "
        f"steps {lay.n_steps} fill "
        f"{lay.num_edges / (lay.n_parts * lay.cfg.part_rows * 128):.2f}",
        flush=True,
    )
    xr = lay.x_rows
    n_hub = lay.hub_ids.shape[0]
    trows = -(-(xr + n_hub) // 8) * 8
    slot_rows = lay.idx.shape[0]

    import functools

    @functools.partial(jax.jit, static_argnames=("stage", "k"))
    def chain(lay, seed, stage, k):
        key = jax.random.PRNGKey(seed)
        if stage == "expand":
            x0 = jax.random.normal(key, (trows, 128), jnp.float32)

            def body(c, _):
                o = spmv2._expand_call(lay, c, False, "sum")
                # data dependency: fold output back into a table-shaped arr
                return x0 + jnp.sum(o[:1, :1]), None

            c, _ = jax.lax.scan(body, x0, None, length=k)
        elif stage == "slab":
            v0 = jax.random.normal(key, (slot_rows, 128), jnp.float32)

            def body(c, _):
                o = spmv2._slab_benes_call(lay, c, False)
                return o, None

            c, _ = jax.lax.scan(body, v0, None, length=k)
        elif stage == "reduce":
            v0 = jax.random.normal(key, (slot_rows, 128), jnp.float32)

            def body(c, _):
                o = spmv3._keyed_reduce_call(lay, c, False)
                return c + jnp.sum(o[:1, :1]), None

            c, _ = jax.lax.scan(body, v0, None, length=k)
        else:  # full
            x0 = jax.random.normal(key, (g.num_vertices,), jnp.float32)

            def body(c, _):
                return spmv3.keyed_spmv_jit(lay, c), None

            c, _ = jax.lax.scan(body, x0, None, length=k)
        return jnp.sum(jnp.abs(c[:64]))

    for stage in ("expand", "slab", "reduce", "full"):
        ts = {}
        for k in (1, args.k):
            r = chain(lay, 0, stage, k)
            jax.block_until_ready(r)
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                r = chain(lay, rep + 1, stage, k)
                jax.block_until_ready(r)
                np.asarray(r)
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per = (ts[args.k] - ts[1]) / (args.k - 1)
        print(f"{stage}: {per * 1e3:.2f} ms/pass "
              f"(t1 {ts[1]*1e3:.1f} tK {ts[args.k]*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
