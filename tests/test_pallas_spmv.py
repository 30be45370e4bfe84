"""Pallas SpMV layout + kernel (interpret mode on CPU; real on TPU)."""

import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.prims.pallas.spmv import (
    CAP_V,
    LW,
    build_pull_layout,
    pull_spmv,
)
from cugraph_tpu.testing import karate_edgelist


def _ref_spmv(dsts, srcs, w, v, x):
    out = np.zeros(v, dtype=np.float64)
    np.add.at(out, dsts, x[srcs] * (w if w is not None else 1.0))
    return out.astype(np.float32)


def _check(dsts, srcs, w, v, seed=0):
    import jax.numpy as jnp

    layout = build_pull_layout(dsts, srcs, w, v)
    x = np.random.default_rng(seed).random(v).astype(np.float32)
    got = np.asarray(pull_spmv(layout, jnp.asarray(x), interpret=True))
    exp = _ref_spmv(dsts, srcs, w, v, x)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_layout_small_random():
    rng = np.random.default_rng(0)
    v, e = 500, 3000
    srcs = rng.integers(0, v, e).astype(np.int32)
    dsts = np.sort(rng.integers(0, v, e)).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    _check(dsts, srcs, w, v)


def test_layout_hub():
    # one destination with a huge in-degree (forces sub-window splits)
    rng = np.random.default_rng(1)
    v = 300
    e_hub = 5000
    srcs = rng.integers(0, v, e_hub + 200).astype(np.int32)
    dsts = np.concatenate(
        [np.zeros(e_hub, np.int32), np.sort(rng.integers(0, v, 200)).astype(np.int32)]
    )
    order = np.argsort(dsts, kind="stable")
    _check(dsts[order], srcs[order], None, v)


def test_layout_single_src_lane_skew():
    # all edges share one source -> one lane gets everything
    v = 200
    e = 1000
    srcs = np.full(e, 7, np.int32)
    dsts = np.sort(np.random.default_rng(2).integers(0, v, e)).astype(np.int32)
    _check(dsts, srcs, None, v)


def test_karate_spmv_matches_prim():
    import jax.numpy as jnp

    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    adj = g.csc()
    e = adj.num_edges
    dsts = np.asarray(adj.majors)[:e]
    srcs = np.asarray(adj.minors)[:e]
    ww = np.asarray(adj.weights)[:e]
    layout = build_pull_layout(dsts, srcs, ww, g.num_vertices)
    x = np.random.default_rng(3).random(g.num_vertices).astype(np.float32)
    got = np.asarray(pull_spmv(layout, jnp.asarray(x), interpret=True))

    from cugraph_tpu.prims.per_v import per_v_transform_reduce_incoming_e

    exp = np.asarray(
        per_v_transform_reduce_incoming_e(
            g,
            lambda s, d, sv, dv, wt: sv * wt,
            src_values=jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_empty_rows_and_isolated_vertices():
    # vertices with no incoming edges must read 0
    srcs = np.array([1, 2], np.int32)
    dsts = np.array([0, 0], np.int32)
    _check(dsts, srcs, None, 10)
