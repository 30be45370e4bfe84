"""TPU primitive microbenchmarks for the SpMV v2 pipeline design.

Measures the building blocks of the static-routed sorted pipeline
(docs/PERFORMANCE.md round-2 plan) on real hardware:

  K1  HBM copy bandwidth ceiling (pallas grid copy)
  K2a paged expand via tpu.dynamic_gather (take_along_axis on (8,128))
  K2b paged expand via 8-way compare-select (no gather op)
  K3  k-gather column permute (within-tile, across 64 rows)
  K4  Benes butterfly lane permute (13 stages, roll+select)
  K4r Benes butterfly row permute (17 stages for 512 rows, roll axis=0)
  K5  (128,128) transpose throughput
  K6  multi-window one-hot reduce (16 windows per grid step)
  K7  XLA sort_key_val / cumsum / gather reference points

Run: timeout 3000 env PYTHONPATH=/root/.axon_site:/root/repo \
       python -u benchmarks/microbench_tpu.py [--interpret]
Each kernel is wrapped in try/except so one Mosaic rejection doesn't kill
the batch. All outputs are checksum-consumed (axon defers unconsumed work).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    # consume
    chk = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return best, chk


def report(name, secs, n_elems, chk):
    print(
        f"{name:24s} {secs*1e3:9.3f} ms   {n_elems/secs/1e9:8.3f} Gelem/s"
        f"   chk={chk:.4g}",
        flush=True,
    )


# ---------------------------------------------------------------------------
def k1_copy(n_rows, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 1024

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(n_rows // T,),
            in_specs=[pl.BlockSpec((T, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(x)

    x = jnp.ones((n_rows, LANES), jnp.float32)
    return run, (x,)


# ---------------------------------------------------------------------------
def _expand_inputs(x_rows, n_rows, seed=0):
    rng = np.random.default_rng(seed)
    n_vregs = n_rows // 8
    prow = rng.integers(0, x_rows // 8, size=n_vregs).astype(np.int32) * 8
    idx = rng.integers(0, 8, size=(n_rows, LANES)).astype(np.int32)
    w = rng.random((n_rows, LANES)).astype(np.float32)
    x = rng.random((x_rows, LANES)).astype(np.float32)
    return jnp.asarray(prow), jnp.asarray(idx), jnp.asarray(w), jnp.asarray(x)


def k2_paged_expand(n_rows, x_rows, interpret, use_gather):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TV = 128  # vregs per grid step
    T = TV * 8

    def kern(prow_ref, x_ref, idx_ref, w_ref, o_ref):
        i = pl.program_id(0)

        def body(v, _):
            pr = prow_ref[i * TV + v]
            page = x_ref[pl.ds(pr, 8), :]
            idxv = idx_ref[pl.ds(v * 8, 8), :]
            if use_gather:
                vals = jnp.take_along_axis(page, idxv, axis=0)
            else:
                vals = jnp.zeros((8, LANES), jnp.float32)
                for r in range(8):
                    vals = vals + jnp.where(idxv == r, page[r][None, :], 0.0)
            o_ref[pl.ds(v * 8, 8), :] = vals * w_ref[pl.ds(v * 8, 8), :]
            return 0

        jax.lax.fori_loop(0, TV, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
            pl.BlockSpec((T, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(prow, x, idx, w):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(prow, x, idx, w)

    prow, idx, w, x = _expand_inputs(x_rows, n_rows)
    return run, (prow, x, idx, w)


# ---------------------------------------------------------------------------
def k3_kgather_colperm(n_rows, interpret):
    """Within-tile column permute: (512,128) tile, each target vreg gathers
    from all 64 source vregs (source-major loop, targets accumulated in a
    VMEM scratch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 512  # tile rows
    NV = TR // 8

    def kern(v_ref, idx_ref, o_ref):
        # idx: source row within tile for each target slot
        sub = idx_ref[:] & 7
        srcv = idx_ref[:] >> 3
        for tv in range(NV):
            sl = slice(tv * 8, tv * 8 + 8)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for u in range(NV):
                page = v_ref[pl.ds(u * 8, 8), :]
                g = jnp.take_along_axis(page, sub[sl], axis=0)
                acc = acc + jnp.where(srcv[sl] == u, g, 0.0)
            o_ref[pl.ds(tv * 8, 8), :] = acc

    @jax.jit
    def run(v, idx):
        return pl.pallas_call(
            kern,
            grid=(n_rows // TR,),
            in_specs=[
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(v, idx)

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
    # per-lane random permutation of rows within each tile
    idx = np.argsort(rng.random((n_rows // TR, TR, LANES)), axis=1)
    idx = jnp.asarray(idx.reshape(n_rows, LANES).astype(np.int32))
    return run, (v, idx)


# ---------------------------------------------------------------------------
def k4_benes_lanes(n_rows, interpret):
    """13-stage butterfly over lanes with packed route bits."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 512
    stages = [1, 2, 4, 8, 16, 32, 64, 32, 16, 8, 4, 2, 1]

    def kern(v_ref, route_ref, o_ref):
        x = v_ref[:]
        route = route_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1)
        for k, d in enumerate(stages):
            hi = (lane & d) != 0
            z = jnp.where(hi, pltpu.roll(x, d, axis=1), pltpu.roll(x, LANES - d, axis=1))
            swap = ((route >> k) & 1) != 0
            x = jnp.where(swap, z, x)
        o_ref[:] = x

    @jax.jit
    def run(v, route):
        return pl.pallas_call(
            kern,
            grid=(n_rows // TR,),
            in_specs=[
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(v, route)

    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
    route = jnp.asarray(rng.integers(0, 1 << 13, size=(n_rows, LANES)).astype(np.int32))
    return run, (v, route)


def k4r_benes_rows(n_rows, interpret):
    """Butterfly over 512 rows (axis 0): 17 stages."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 512
    ds = [1, 2, 4, 8, 16, 32, 64, 128, 256, 128, 64, 32, 16, 8, 4, 2, 1]

    def kern(v_ref, route_ref, o_ref):
        x = v_ref[:]
        route = route_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0)
        for k, d in enumerate(ds):
            hi = (row & d) != 0
            z = jnp.where(hi, pltpu.roll(x, d, axis=0), pltpu.roll(x, TR - d, axis=0))
            swap = ((route >> k) & 1) != 0
            x = jnp.where(swap, z, x)
        o_ref[:] = x

    @jax.jit
    def run(v, route):
        return pl.pallas_call(
            kern,
            grid=(n_rows // TR,),
            in_specs=[
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(v, route)

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
    route = jnp.asarray(
        rng.integers(0, 1 << 17, size=(n_rows, LANES)).astype(np.int32)
    )
    return run, (v, route)


# ---------------------------------------------------------------------------
def k5_transpose(n_rows, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 512

    def kern(v_ref, o_ref):
        for b in range(TR // 128):
            o_ref[pl.ds(b * 128, 128), :] = v_ref[pl.ds(b * 128, 128), :].T

    @jax.jit
    def run(v):
        return pl.pallas_call(
            kern,
            grid=(n_rows // TR,),
            in_specs=[pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(v)

    v = jnp.asarray(np.random.default_rng(4).random((n_rows, LANES)).astype(np.float32))
    return run, (v,)


# ---------------------------------------------------------------------------
def k6_multiwin_reduce(n_rows, out_rows, interpret):
    """Windowed one-hot reduce, 16 windows of (8,128) edges per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LW, CAP_V, WPG = 8, 256, 16
    T = LW * WPG
    cap_rows = CAP_V // LANES

    def kern(wstart_ref, vals_ref, gdl_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (CAP_V, LANES), 0)
        for wloc in range(WPG):
            vals = vals_ref[pl.ds(wloc * LW, LW), :]
            gdl = gdl_ref[pl.ds(wloc * LW, LW), :]
            acc = jnp.zeros((CAP_V, LANES), jnp.float32)
            for l in range(LW):
                acc = acc + jnp.where(gdl[l][None, :] == iota, vals[l][None, :], 0.0)
            win_out = jnp.sum(acc, axis=1).reshape(cap_rows, LANES)
            row0 = pl.multiple_of(wstart_ref[i * WPG + wloc] // LANES, cap_rows)
            cur = o_ref[pl.ds(row0, cap_rows), :]
            o_ref[pl.ds(row0, cap_rows), :] = cur + win_out

    n_win = n_rows // LW
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_win // WPG,),
        in_specs=[
            pl.BlockSpec((T, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, LANES), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(wstart, vals, gdl):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32),
            interpret=interpret,
        )(wstart, vals, gdl)

    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
    gdl = jnp.asarray(rng.integers(0, CAP_V, size=(n_rows, LANES)).astype(np.int32))
    wstart = jnp.asarray(
        (rng.integers(0, (out_rows - cap_rows) // cap_rows, size=n_win) * CAP_V).astype(
            np.int32
        )
    )
    return run, (wstart, vals, gdl)


# ---------------------------------------------------------------------------
def k8_seg_scan_reduce(n_rows, interpret):
    """Sorted segmented reduce: within-tile log-step scan along rows with
    segment resets (per lane), the sorted-pipeline final stage shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 512

    def kern(v_ref, flag_ref, o_ref):
        x = v_ref[:]
        f = flag_ref[:].astype(jnp.float32)  # 1 = segment start
        # segmented inclusive scan along axis 0 (rows), per lane
        d = 1
        while d < TR:
            xs = pltpu.roll(x, d, axis=0)
            fs = pltpu.roll(f, d, axis=0)
            row = jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0)
            ok = (row >= d) & (f == 0.0)
            x = x + jnp.where(ok, xs, 0.0)
            f = jnp.maximum(f, jnp.where(row >= d, fs, 1.0))
            d *= 2
        o_ref[:] = x

    @jax.jit
    def run(v, flags):
        return pl.pallas_call(
            kern,
            grid=(n_rows // TR,),
            in_specs=[
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            interpret=interpret,
        )(v, flags)

    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.random((n_rows, LANES)).astype(np.float32))
    flags = jnp.asarray((rng.random((n_rows, LANES)) < 0.1).astype(np.float32))
    return run, (v, flags)


# ---------------------------------------------------------------------------
def xla_refs(n):
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 1 << 30, size=n).astype(np.int32))
    vals = jnp.asarray(rng.random(n).astype(np.float32))

    @jax.jit
    def sortkv(k, v):
        return jax.lax.sort_key_val(k, v)

    @jax.jit
    def gath(x, i):
        return jnp.sum(jnp.take(x, i))

    idx = jnp.asarray(rng.integers(0, n, size=n).astype(np.int32))
    return sortkv, (keys, vals), gath, (vals, idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--rows", type=int, default=131072)  # 16.7M elements
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    n_rows = args.rows
    n = n_rows * LANES
    print(f"backend={jax.default_backend()} n={n/1e6:.1f}M elements", flush=True)

    benches = []
    benches.append(("k1_copy", k1_copy(n_rows, args.interpret)))
    benches.append(
        ("k2a_gather_expand", k2_paged_expand(n_rows, 8192, args.interpret, True))
    )
    benches.append(
        ("k2b_select_expand", k2_paged_expand(n_rows, 8192, args.interpret, False))
    )
    benches.append(("k3_kgather_colperm", k3_kgather_colperm(n_rows, args.interpret)))
    benches.append(("k4_benes_lanes", k4_benes_lanes(n_rows, args.interpret)))
    benches.append(("k4r_benes_rows", k4r_benes_rows(n_rows, args.interpret)))
    benches.append(("k5_transpose", k5_transpose(n_rows, args.interpret)))
    benches.append(("k6_multiwin_reduce", k6_multiwin_reduce(n_rows, 8192 + 2, args.interpret)))
    benches.append(("k8_seg_scan_reduce", k8_seg_scan_reduce(n_rows, args.interpret)))

    for name, (fn, inputs) in benches:
        try:
            t0 = time.perf_counter()
            secs, chk = timeit(fn, *inputs)
            compile_s = time.perf_counter() - t0 - secs * 5
            report(name, secs, n, chk)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    if not args.interpret:
        sortkv, skv_in, gath, g_in = xla_refs(n)
        try:
            secs, chk = timeit(sortkv, *skv_in)
            report("x7_xla_sort_key_val", secs, n, chk)
        except Exception as e:
            print(f"x7_xla_sort FAILED: {str(e)[:200]}", flush=True)
        try:
            secs, chk = timeit(gath, *g_in)
            report("x7_xla_gather", secs, n, chk)
        except Exception as e:
            print(f"x7_xla_gather FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
