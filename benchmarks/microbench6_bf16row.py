"""bf16 row-gather probe: can Mosaic do single-row dynamic reads from a
bf16 (rows, 128) VMEM table, and at what rate vs f32?

bf16 arrays tile as (16, 128) sublanes (2 logical rows per sublane), so a
1-row dynamic slice is sub-sublane — this probe answers whether the
lowering exists and whether the halved bytes actually halve the pass
time. Decides the bf16-table variant of prims/pallas/spmm_row.py
(halved VMEM lets ranges double -> halved window-flush traffic).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/microbench6_bf16row.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.utils.compile_cache import enable_compilation_cache

LANES = 128
TR = 1 << 15
T = 128
N_TILES = 2048


def gather_call(table, srcs, dtype):
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
        out_shape=jax.ShapeDtypeStruct((N_TILES * T, LANES), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(srcs, table)


def bench(dtype, table, srcs):
    @jax.jit
    def chain(k, table, srcs):
        def body(_, tb):
            out = gather_call(tb, srcs, dtype)
            return tb + (out[:TR] * jnp.asarray(1e-2, dtype)).astype(dtype)

        return jnp.sum(jax.lax.fori_loop(0, k, body, table).astype(jnp.float32))

    out = jax.block_until_ready(gather_call(table, srcs, dtype))
    ok = np.array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(srcs).reshape(-1)]
    )

    def timed(k):
        jax.block_until_ready(chain(k, table, srcs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(k, table, srcs))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t33 = timed(1), timed(33)
    per = (t33 - t1) / 32
    e = N_TILES * T
    nb = jnp.dtype(dtype).itemsize
    print(
        f"{np.dtype(dtype).name}: correct={ok} {per*1e3:.3f} ms/pass "
        f"{e/per/1e9:.2f} Grow/s {e*LANES*nb*2/per/1e9:.0f} GB/s",
        flush=True,
    )


def main():
    enable_compilation_cache()

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        table = jax.random.normal(k1, (TR, LANES), jnp.float32)
        srcs = jax.random.randint(k2, (N_TILES, T), 0, TR, jnp.int32)
        return table, srcs

    table, srcs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(0)))
    bench(jnp.float32, table, srcs)
    bench(jnp.bfloat16, table.astype(jnp.bfloat16), srcs)


if __name__ == "__main__":
    main()
