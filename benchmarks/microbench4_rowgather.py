"""Probe: per-edge cost of the row-gather SpMM design (VERDICT r4 #2).

The dst-sorted row-scan SpMM replaces ALL Benes routing with:
  per tile of T edges: T dynamic-offset row reads from a VMEM-resident
  src-range feature table -> scratch (T, 128) -> one-hot (W, T) matmul
  on the MXU accumulating into the dst-window output block.

This measures the critical unknown — the unrolled dynamic-row gather
loop (Mosaic 2D refs with dynamic ROW slices, the known-good form) —
and the full tile body with the one-hot matmul, on device-resident
inputs with the slope method (see microbench3; eager/host-transfer
timings are invalid on this runtime).

SMEM note: scalar-prefetch args live in SMEM (1 MB cap) — per-tile
src indices are streamed as (1, T) SMEM BLOCKS instead; only the
tile->window map rides scalar prefetch.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/microbench4_rowgather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.utils.compile_cache import enable_compilation_cache

LANES = 128
TR = 1 << 15  # table rows (32K x 128 f32 = 16 MB)
T = 128  # edges per tile
W = 512  # dst window width
N_TILES = 2048  # edges per pass = 262144


def _vmem_params(limit=100 * 1024 * 1024):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def gather_only_call(table, srcs):
    """Pure gather+store loop; srcs streamed as (1, T) SMEM blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(srcs_ref, x_ref, o_ref):
        t = pl.program_id(0)
        r = t % 8
        for i in range(T):
            o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(srcs_ref[r, i], 1), :]

    return pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec(
                (8, T), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((TR, LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_TILES * T, LANES), jnp.float32),
        compiler_params=_vmem_params(),
    )(srcs, table)


def gather_matmul_call(table, srcs, dstl, winof):
    """Full tile body: gather + one-hot (W, T) matmul accumulated into the
    window output block (out revisit pattern via index_map on winof)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_win = N_TILES // 4  # 4 tiles per window in this synthetic stream

    def kern(winof_ref, srcs_ref, dstl_ref, x_ref, o_ref, acc_ref, g_ref):
        t = pl.program_id(0)
        r = t % 8
        for i in range(T):
            g_ref[pl.ds(i, 1), :] = x_ref[pl.ds(srcs_ref[r, i], 1), :]
        scratch = g_ref[:]  # (T, 128)
        dl = dstl_ref[pl.ds(r, 1), :]  # (1, T) i32
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
        onehot = (iota == dl).astype(jnp.bfloat16)
        part = jnp.dot(
            onehot,
            scratch.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        first = (t % 4) == 0

        @pl.when(first)
        def _():
            acc_ref[:] = part

        @pl.when(~first)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(t % 4 == 3)
        def _():
            o_ref[:] = acc_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec(
                (8, T), lambda i, *_: (i // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((8, T), lambda i, *_: (i // 8, 0)),
            pl.BlockSpec((TR, LANES), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((W, LANES), lambda i, wf: (wf[i], 0)),
        scratch_shapes=[
            pltpu.VMEM((W, LANES), jnp.float32),
            pltpu.VMEM((T, LANES), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win * W, LANES), jnp.float32),
        compiler_params=_vmem_params(),
    )(winof, srcs, dstl, table)


def slope_time(fn, *args, reps=3):
    """Cost of ONE chained application via (t(9) - t(1)) / 8."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(k, *a):
        out = fn(*a)
        for _ in range(k - 1):
            # data dependency: fold the checksum back into the table
            a = (a[0] + out[:TR] * 1e-30,) + a[1:]
            out = fn(*a)
        return jnp.sum(out)

    def run(k):
        r = chain(k, *args)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t9 = run(1), run(9)
    return (t9 - t1) / 8


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        table = jax.random.normal(k1, (TR, LANES), jnp.float32)
        srcs = jax.random.randint(k2, (N_TILES, T), 0, TR, jnp.int32)
        dstl = jax.random.randint(k2, (N_TILES, T), 0, W, jnp.int32)
        winof = jnp.arange(N_TILES, dtype=jnp.int32) // 4
        return table, srcs, dstl, winof

    table, srcs, dstl, winof = jax.block_until_ready(make_inputs(key))
    e = N_TILES * T

    t = slope_time(lambda tb, s: gather_only_call(tb, s), table, srcs)
    print(
        f"gather-only: {t*1e3:.3f} ms/pass, {e/t/1e9:.2f} Gedge-rows/s, "
        f"{e*LANES*4*2/t/1e9:.0f} GB/s eff",
        flush=True,
    )

    t = slope_time(
        lambda tb, s, d, w: gather_matmul_call(tb, s, d, w),
        table, srcs, dstl, winof,
    )
    print(
        f"gather+onehot-matmul: {t*1e3:.3f} ms/pass, "
        f"{e/t/1e9:.2f} Gedge-rows/s "
        f"(scale-21 E=33.5M F=128 would take {33.5e6/ (e/t):.3f} s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
