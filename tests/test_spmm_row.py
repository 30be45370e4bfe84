"""Row-gather SpMM engine (prims/pallas/spmm_row.py) vs scipy oracles.

Interpret-mode kernel checks on the CPU backend (conftest forces it);
the real-chip validation runs in bench.py / benchmarks sweeps.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cugraph_tpu.prims.pallas import spmm_row as R


def _oracle(dsts, srcs, w, v, x):
    import scipy.sparse as sp

    a = sp.coo_matrix(
        (w, (dsts, srcs)), shape=(v, x.shape[0])
    ).tocsr()
    return a @ x


@pytest.mark.parametrize("seed,v,e", [(0, 700, 4000), (1, 1500, 20000)])
def test_row_spmm_matches_scipy(seed, v, e):
    rng = np.random.default_rng(seed)
    dsts = rng.integers(0, v, e)
    srcs = rng.integers(0, v, e)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(v, 128)).astype(np.float32)
    lay = R.build_row_spmm_layout(dsts, srcs, w, v, range_rows=512)
    assert lay.n_ranges > 1  # exercise multi-range + spacer tiles
    y = np.asarray(R.row_spmm(lay, jnp.asarray(x), interpret=True,
                              precision="f32"))
    ref = _oracle(dsts, srcs, w, v, x)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_row_spmm_unweighted_and_f_not_128():
    rng = np.random.default_rng(7)
    v, e, f = 900, 6000, 200  # f spans 2 lane chunks, second partial
    dsts = rng.integers(0, v, e)
    srcs = rng.integers(0, v, e)
    x = rng.normal(size=(v, f)).astype(np.float32)
    lay = R.build_row_spmm_layout(dsts, srcs, None, v, range_rows=512)
    y = np.asarray(R.row_spmm(lay, jnp.asarray(x), interpret=True,
                              precision="f32"))
    ref = _oracle(dsts, srcs, np.ones(e, np.float32), v, x)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_row_spmm_bf16_precision_contract():
    rng = np.random.default_rng(3)
    v, e = 600, 5000
    dsts = rng.integers(0, v, e)
    srcs = rng.integers(0, v, e)
    x = rng.normal(size=(v, 128)).astype(np.float32)
    lay = R.build_row_spmm_layout(dsts, srcs, None, v, range_rows=512)
    y = np.asarray(R.row_spmm(lay, jnp.asarray(x), interpret=True,
                              precision="bf16"))
    ref = _oracle(dsts, srcs, np.ones(e, np.float32), v, x)
    # bf16 products, f32 accumulation: ~1e-2 relative
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert err < 3e-2, err


def test_row_spmm_empty_windows_stay_zero():
    # dsts concentrated in one window: others must remain exactly 0
    rng = np.random.default_rng(9)
    v, e = 2000, 900
    dsts = rng.integers(0, 300, e)  # first window only (W=512)
    srcs = rng.integers(0, v, e)
    x = rng.normal(size=(v, 128)).astype(np.float32)
    lay = R.build_row_spmm_layout(dsts, srcs, None, v, range_rows=512)
    y = np.asarray(R.row_spmm(lay, jnp.asarray(x), interpret=True,
                              precision="f32"))
    assert np.all(y[512:] == 0.0)
    ref = _oracle(dsts, srcs, np.ones(e, np.float32), v, x)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)
