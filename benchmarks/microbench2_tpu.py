"""Second TPU sweep: isolate the uniform ~0.5 Gelem/s bottleneck seen in
microbench_tpu.py. Each kernel varies exactly one suspect:

  t1  copy at (512,128) blocks              [block size?]
  t2  copy + 64 chained mul/add             [pure VPU rate]
  t3  16x lane roll (axis=1, d=1)           [lane-roll cost]
  t4  16x sublane roll (axis=0, d=1)        [sublane-roll cost]
  t5  16x sublane roll (axis=0, d=64)       [big-shift cost]
  t6  64 dynamic (8,128) VMEM reads/block   [dynamic-slice cost]
  t7  same but static offsets               [loop itself]
  t8  64x take_along_axis on static pages   [gather-op cost]
  t9  16x full-block select                 [select cost]
  t10 4x (128,128) matmul per block         [MXU sanity]
  t11 fori_loop(64) trivial body            [loop overhead]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
TR = 512


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, float(jnp.sum(out))


def make(kern_body, n_rows, interpret, extra_inputs=(), prefetch=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_in = 1 + len(extra_inputs)
    if prefetch is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows // TR,),
            in_specs=[
                pl.BlockSpec((TR, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
            ]
            * n_in,
            out_specs=pl.BlockSpec(
                (TR, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        )

        @jax.jit
        def run(pf, x, *extras):
            return pl.pallas_call(
                kern_body,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
                interpret=interpret,
            )(pf, x, *extras)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
        return run, (prefetch, x) + extra_inputs

    @jax.jit
    def run(x, *extras):
        return pl.pallas_call(
            kern_body,
            grid=(n_rows // TR,),
            in_specs=[
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ]
            * n_in,
            out_specs=pl.BlockSpec(
                (TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(x, *extras)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
    return run, (x,) + extra_inputs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--rows", type=int, default=131072)
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    n_rows = args.rows
    n = n_rows * LANES
    print(f"backend={jax.default_backend()} n={n/1e6:.1f}M", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    tests = {}

    def t1(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    tests["t1_copy512"] = (t1, (), None)

    def t2(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(32):
            x = x * 1.0001 + 0.001
        o_ref[:] = x

    tests["t2_vpu64ops"] = (t2, (), None)

    def t3(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(16):
            x = pltpu.roll(x, 1, axis=1)
        o_ref[:] = x

    tests["t3_laneroll16"] = (t3, (), None)

    def t4(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(16):
            x = pltpu.roll(x, 1, axis=0)
        o_ref[:] = x

    tests["t4_subroll16_d1"] = (t4, (), None)

    def t5(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(16):
            x = pltpu.roll(x, 64, axis=0)
        o_ref[:] = x

    tests["t5_subroll16_d64"] = (t5, (), None)

    prow = jnp.asarray(
        (rng.integers(0, TR // 8, size=(n_rows // TR) * 64) * 8).astype(np.int32)
    )

    def t6(pf_ref, x_ref, o_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((8, LANES), jnp.float32)
        for v in range(64):
            acc = acc + x_ref[pl.ds(pf_ref[i * 64 + v], 8), :]
        o_ref[:] = jnp.broadcast_to(acc, (TR // 8, 8, LANES)).reshape(TR, LANES)

    tests["t6_dynread64"] = (t6, (), prow)

    def t7(x_ref, o_ref):
        acc = jnp.zeros((8, LANES), jnp.float32)
        for v in range(64):
            acc = acc + x_ref[pl.ds((v % (TR // 8)) * 8, 8), :]
        o_ref[:] = jnp.broadcast_to(acc, (TR // 8, 8, LANES)).reshape(TR, LANES)

    tests["t7_statread64"] = (t7, (), None)

    idx8 = jnp.asarray(rng.integers(0, 8, size=(n_rows, LANES)).astype(np.int32))

    def t8(x_ref, idx_ref, o_ref):
        for v in range(64):
            page = x_ref[pl.ds((v % 8) * 8, 8), :]
            o_ref[pl.ds(v * 8, 8), :] = jnp.take_along_axis(
                page, idx_ref[pl.ds(v * 8, 8), :], axis=0
            )

    tests["t8_gather64"] = (t8, (idx8,), None)

    def t9(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        m = idx_ref[:]
        for k in range(16):
            x = jnp.where(m == k, x * 2.0, x)
        o_ref[:] = x

    tests["t9_select16"] = (t9, (idx8,), None)

    def t10(x_ref, o_ref):
        for b in range(4):
            blk = x_ref[pl.ds(b * 128, 128), :]
            o_ref[pl.ds(b * 128, 128), :] = jnp.dot(
                blk, blk, preferred_element_type=jnp.float32
            )

    tests["t10_mxu4"] = (t10, (), None)

    def t11(x_ref, o_ref):
        def body(v, acc):
            return acc + 1.0

        s = jax.lax.fori_loop(0, 64, body, 0.0)
        o_ref[:] = x_ref[:] + s

    tests["t11_fori64"] = (t11, (), None)

    for name, (kern, extras, prefetch) in tests.items():
        try:
            fn, inputs = make(kern, n_rows, args.interpret, extras, prefetch)
            secs, chk = timeit(fn, *inputs)
            us_per_step = secs / (n_rows // TR) * 1e6
            print(
                f"{name:18s} {secs*1e3:9.3f} ms  {n/secs/1e9:8.2f} Gelem/s"
                f"  {us_per_step:8.2f} us/step  chk={chk:.4g}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
