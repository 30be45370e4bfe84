"""Validate + time the sorted SpMV pipeline on the real TPU chip.

Builds an RMAT graph at --scale, builds the SortedLayout (host), checks
sorted_spmv against a float64 numpy oracle, then slope-times the jitted
pipeline (device-resident input, chained in-jit iterations).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo SPMV2_TIMERS=1 \
        python benchmarks/validate_spmv2_tpu.py --scale 18
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cugraph_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from cugraph_tpu.prims.pallas.spmv2 import (
        _sorted_spmv_jit,
        sorted_layout_for,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    scale, ef = args.scale, args.edgefactor
    t0 = time.perf_counter()
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_graph

    g, num_edges = build_graph(scale, ef)
    print(f"graph built: {time.perf_counter()-t0:.1f}s  V={g.num_vertices} "
          f"E={g.num_edges}", flush=True)

    t0 = time.perf_counter()
    lay = sorted_layout_for(g)
    assert lay is not None, "sorted layout unavailable at this scale"
    build_s = time.perf_counter() - t0
    print(f"layout built: {build_s:.1f}s  slabs={lay.n_slabs} parts={lay.n_parts} "
          f"bins={lay.n_bins} steps={lay.n_steps}", flush=True)

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=g.num_vertices).astype(np.float32)
    x = jnp.asarray(x_np)

    t0 = time.perf_counter()
    y = _sorted_spmv_jit(lay, x)
    jax.block_until_ready(y)
    print(f"first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)

    if not args.skip_check:
        adj = g.csc()
        e = adj.num_edges
        d = np.asarray(adj.majors)[:e]
        s = np.asarray(adj.minors)[:e]
        w = np.ones(e) if adj.weights is None else np.asarray(adj.weights)[:e]
        oracle = np.zeros(g.num_vertices, dtype=np.float64)
        np.add.at(oracle, d, w * x_np[s].astype(np.float64))
        got = np.asarray(y, dtype=np.float64)
        denom = np.maximum(np.abs(oracle), 1.0)
        rel = np.abs(got - oracle) / denom
        print(f"max rel err: {rel.max():.3g}  (bad={int((rel > 1e-4).sum())})",
              flush=True)

    # slope timing: chained in-jit iterations. Layout arrays must be jit
    # ARGUMENTS (closed-over constants get baked into the remote-compile
    # payload -> HTTP 413; see CLAUDE.md).
    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def chain(lay, x0, iters):
        def body(i, s):
            y = _sorted_spmv_jit(lay, s)
            return s * 0.5 + y * 1e-6
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))

    jax.block_until_ready(chain(lay, x, 1))
    jax.block_until_ready(chain(lay, x, 9))
    t1 = t9 = float("inf")
    for _ in range(4):
        a = time.perf_counter()
        jax.block_until_ready(chain(lay, x, 1))
        t1 = min(t1, time.perf_counter() - a)
        a = time.perf_counter()
        jax.block_until_ready(chain(lay, x, 9))
        t9 = min(t9, time.perf_counter() - a)
    per = (t9 - t1) / 8
    print(f"per-pass {per*1e3:.2f} ms  {g.num_edges/per/1e9:.3f} Gedge/s "
          f"(t1={t1*1e3:.1f} t9={t9*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
