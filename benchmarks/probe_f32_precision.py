"""On-chip probe: row_spmm precision="f32" must be EXACT (vs float64).

CPU-mesh CI cannot catch the TPU default-precision trap: in-kernel f32
jnp.dot lowers to single-pass bf16 MXU products unless
Precision.HIGHEST is requested (measured ~3e-2 rel err, PERFORMANCE.md
round 4), while CPU dots are exact either way. This probe runs on the
real chip and asserts the contract both ways:

  - precision="f32"  -> rel err vs float64 oracle < 5e-5 (measured
    1.6e-5 on v5e: Mosaic lowers HIGHEST in-kernel dots to the 2-pass
    bf16 hi/lo decomposition, ~16 effective mantissa bits — vs 3e-2
    before the fix)
  - precision="bf16" -> rel err in the bf16 band (sanity: the fix did
    not silently slow/upcast the mixed-precision path)

Usage: python benchmarks/probe_f32_precision.py  (on the TPU backend)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from cugraph_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import cugraph_tpu as cg
    from cugraph_tpu.prims.pallas import spmm_row

    rng = np.random.default_rng(7)
    scale, ef, f = 16, 16, 128
    src, dst = cg.rmat_edgelist(scale=scale, num_edges=(2**scale) * ef,
                                scramble=True)
    src, dst = np.asarray(src), np.asarray(dst)
    g = cg.from_edgelist(src, dst, num_vertices=2**scale)
    lay = spmm_row.row_spmm_layout_for(g, use_weights=False)
    assert lay is not None, "row engine unavailable on this backend"
    x = rng.normal(size=(g.num_vertices, f)).astype(np.float32)

    # float64 oracle on host (unweighted in-adjacency sum)
    adj = g.csc()
    e = adj.num_edges
    d64 = np.asarray(adj.majors)[:e]
    s64 = np.asarray(adj.minors)[:e]
    oracle = np.zeros((g.num_vertices, f), np.float64)
    np.add.at(oracle, d64, x[s64].astype(np.float64))
    denom = np.maximum(np.abs(oracle), 1.0)

    xj = jax.numpy.asarray(x)
    for prec, bound in (("f32", 5e-5), ("bf16", 3e-2)):
        t0 = time.perf_counter()
        y = spmm_row.row_spmm(lay, xj, precision=prec)
        jax.block_until_ready(y)
        np.asarray(y[:8, :8])
        dt = time.perf_counter() - t0
        rel = float(np.max(np.abs(np.asarray(y, np.float64) - oracle) / denom))
        status = "OK" if rel < bound else "FAIL"
        print(f"precision={prec}: max rel err {rel:.2e} (bound {bound:g}) "
              f"[{status}] first-call {dt:.2f}s", flush=True)
        if rel >= bound:
            raise SystemExit(1)
    print("f32 exactness contract holds on this backend", flush=True)


if __name__ == "__main__":
    main()
