"""Per-kernel slope timing of the sorted pipeline at a given scale.

Times each of the 4 kernels independently (device-resident inputs,
chained in-jit iterations with a data dependency, slope method) to show
where a pass's time goes. Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/kernel_breakdown_tpu.py --scale 21
"""

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=21)
    ap.add_argument("--edgefactor", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cugraph_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from cugraph_tpu.prims.pallas import spmv2 as S
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_graph

    g, _ = build_graph(args.scale, args.edgefactor)
    lay = S.sorted_layout_for(g)
    if isinstance(lay, S.MultiSortedLayout):
        print(f"multi-range layout ({len(lay.parts)} ranges); timing range 0")
        lay = lay.parts[0]
    print(f"slabs={lay.n_slabs} parts={lay.n_parts} bins={lay.n_bins} "
          f"steps={lay.n_steps} slot_rows={lay.idx.shape[0]}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=g.num_vertices).astype(np.float32))

    @jax.jit
    def stages(lay, x):
        xr = lay.x_rows
        n_hub = lay.hub_ids.shape[0]
        trows = -(-(xr + n_hub) // 8) * 8
        xpad = jnp.zeros(xr * 128, jnp.float32).at[: lay.num_vertices].set(x)
        hub_vals = jnp.take(xpad, lay.hub_ids)
        table = jnp.zeros((trows, 128), jnp.float32)
        table = table.at[:xr].set(xpad.reshape(xr, 128))
        table = table.at[xr : xr + n_hub].set(
            jnp.broadcast_to(hub_vals[:, None], (n_hub, 128))
        )
        vals = S._expand_call(lay, table, False, "sum")
        binned = S._slab_benes_call(lay, vals, False)
        y = S._sort_reduce_call(lay, binned, False, "sum")
        return table, vals, binned, y

    table, vals, binned, y = jax.block_until_ready(stages(lay, x))

    def slope(fn, a):
        @partial(jax.jit, static_argnames=("iters",))
        def chain(lay, a, iters):
            def body(i, s):
                r = fn(lay, s)
                # data dependency; result may differ in shape -> fold a
                # scalar back into the input
                return s * 0.5 + jnp.sum(r) * 1e-12
            return jnp.sum(jax.lax.fori_loop(0, iters, body, a))

        jax.block_until_ready(chain(lay, a, 1))
        jax.block_until_ready(chain(lay, a, 9))
        t1 = t9 = float("inf")
        for _ in range(3):
            s = time.perf_counter(); jax.block_until_ready(chain(lay, a, 1))
            t1 = min(t1, time.perf_counter() - s)
            s = time.perf_counter(); jax.block_until_ready(chain(lay, a, 9))
            t9 = min(t9, time.perf_counter() - s)
        return (t9 - t1) / 8

    rows = [
        ("expand", lambda l, t: S._expand_call(l, t, False, "sum"), table),
        ("slab_benes", lambda l, v: S._slab_benes_call(l, v, False), vals),
        ("sort_reduce+asm", lambda l, b: S._sort_reduce_call(l, b, False, "sum"), binned),
    ]
    total = 0.0
    for name, fn, a in rows:
        t = slope(fn, a)
        total += t
        print(f"{name:12s} {t*1e3:7.2f} ms", flush=True)
    print(f"{'total':12s} {total*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
