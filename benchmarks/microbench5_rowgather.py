"""Row-gather probe v2: ONE compiled kernel, fori_loop-chained timing.

The v1 slope harness (microbench4) compiled each chain length as a
separate program (10+ min through the remote-compile tunnel) and its
1e-30 feedback rounded away in f32, letting the runtime collapse the
chain. Here the chain is a lax.fori_loop with a RUNTIME trip count and a
value-changing feedback (one compile, k varies free), and correctness is
checked against numpy with the same compiled kernel first.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/microbench5_rowgather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.utils.compile_cache import enable_compilation_cache

LANES = 128
TR = 1 << 15  # table rows (32K x 128 f32 = 16 MB)
T = 128  # edges per tile
N_TILES = 2048  # edges per pass = 262144


def gather_only_call(table, srcs):
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(srcs, table)


@jax.jit
def chain(k, table, srcs):
    def body(_, tb):
        out = gather_only_call(tb, srcs)
        # value-changing feedback: representable perturbation (~1e-3)
        return tb + out[:TR] * 1e-3

    tb = jax.lax.fori_loop(0, k, body, table)
    return jnp.sum(tb)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        table = jax.random.normal(k1, (TR, LANES), jnp.float32)
        srcs = jax.random.randint(k2, (N_TILES, T), 0, TR, jnp.int32)
        return table, srcs

    table, srcs = jax.block_until_ready(make_inputs(key))

    t0 = time.time()
    out = jax.block_until_ready(gather_only_call(table, srcs))
    print(f"first gather (compile+run): {time.time()-t0:.1f}s", flush=True)
    ok = np.array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(srcs).reshape(-1)]
    )
    print(f"gather correct: {ok}", flush=True)

    def timed(k):
        r = chain(k, table, srcs)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(k, table, srcs))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t33 = timed(1), timed(33)
    per = (t33 - t1) / 32
    e = N_TILES * T
    print(
        f"t(1)={t1*1e3:.2f} ms t(33)={t33*1e3:.2f} ms -> "
        f"{per*1e3:.3f} ms/pass, {e/per/1e9:.2f} Gedge-rows/s, "
        f"{e*LANES*4*2/per/1e9:.0f} GB/s eff "
        f"(scale-21 E=33.5M gather would take {33.5e6/(e/per):.3f} s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
