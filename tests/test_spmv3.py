"""Keyed-row engine (spmv3) oracles: interpret-mode equality vs numpy.

Covers both reduce directions, weighted/unweighted, hub sources, heavy
destinations, multi-part / multi-slab / multi-output-window layouts,
and the Graph-level keyed_layout_for contract. All runs use TINY3 (or
small real configs) in Pallas interpret mode on the CPU backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cugraph_tpu.prims.pallas import spmv3
from cugraph_tpu.prims.pallas.spmv3 import (
    TINY3,
    build_keyed_layout,
    keyed_spmv_jit,
)


def _rand_graph(rng, v, e, skew=False):
    if skew:
        srcs = (rng.zipf(1.5, e) % v).astype(np.int64)
        dsts = (rng.zipf(1.3, e) % v).astype(np.int64)
    else:
        srcs = rng.integers(0, v, e).astype(np.int64)
        dsts = rng.integers(0, v, e).astype(np.int64)
    return srcs, dsts


def _oracle_sum(dsts, srcs, wts, x, v):
    y = np.zeros(v, np.float64)
    w = np.ones(len(dsts)) if wts is None else wts.astype(np.float64)
    np.add.at(y, dsts, w * x[srcs].astype(np.float64))
    return y


def _oracle_min(dsts, srcs, wts, x, v):
    y = np.full(v, np.inf)
    w = np.zeros(len(dsts)) if wts is None else wts
    np.minimum.at(y, dsts, w + x[srcs])
    return y


@pytest.mark.parametrize(
    "v,e,skew,weighted",
    [
        (500, 4000, False, True),
        (300, 9000, True, True),  # heavy dsts + hub srcs
        (1000, 3000, False, False),
        (64, 200, False, True),  # single part
        (2500, 8000, False, True),  # multiple output windows
    ],
)
def test_keyed_sum_matches_oracle(rng, v, e, skew, weighted):
    srcs, dsts = _rand_graph(rng, v, e, skew)
    wts = rng.normal(size=e).astype(np.float32) if weighted else None
    x = rng.normal(size=v).astype(np.float32)
    lay = build_keyed_layout(dsts, srcs, wts, v, TINY3)
    y = np.asarray(keyed_spmv_jit(lay, jnp.asarray(x), interpret=True))
    oracle = _oracle_sum(dsts, srcs, wts, x, v)
    err = np.max(np.abs(y - oracle) / np.maximum(np.abs(oracle), 1.0))
    # hi/lo bf16 split: ~2^-16 relative
    assert err < 2e-4, err


@pytest.mark.parametrize(
    "v,e,skew",
    [(500, 4000, False), (300, 9000, True), (2500, 8000, False)],
)
def test_keyed_min_exact(rng, v, e, skew):
    srcs, dsts = _rand_graph(rng, v, e, skew)
    wts = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=v).astype(np.float32)
    lay = build_keyed_layout(
        dsts, srcs, wts, v, TINY3, pad_weight=float("inf"), reduce="min"
    )
    y = np.asarray(keyed_spmv_jit(lay, jnp.asarray(x), interpret=True))
    oracle = _oracle_min(dsts, srcs, wts, x, v)
    finite = np.isfinite(oracle)
    # exact: the min path never rounds through bf16
    assert np.array_equal(np.isinf(y), ~finite)
    np.testing.assert_array_equal(y[finite], oracle[finite].astype(np.float32))


def test_keyed_min_unweighted_bfs_semantics(rng):
    """x = (id if in frontier else inf); y = min in-frontier in-neighbor
    id per dst — the BFS dense-sweep contract."""
    v, e = 400, 3000
    srcs, dsts = _rand_graph(rng, v, e)
    lay = build_keyed_layout(
        dsts, srcs, np.zeros(e, np.float32), v, TINY3,
        pad_weight=float("inf"), reduce="min",
    )
    frontier = rng.random(v) < 0.1
    x = np.where(frontier, np.arange(v, dtype=np.float32), np.inf)
    y = np.asarray(keyed_spmv_jit(lay, jnp.asarray(x), interpret=True))
    oracle = _oracle_min(dsts, srcs, None, x, v)
    finite = np.isfinite(oracle)
    assert np.array_equal(np.isinf(y), ~finite)
    np.testing.assert_array_equal(y[finite], oracle[finite].astype(np.float32))


def test_keyed_weight_variants_share_pass(rng):
    v, e = 600, 5000
    srcs, dsts = _rand_graph(rng, v, e)
    w1 = rng.normal(size=e).astype(np.float32)
    w2 = rng.normal(size=e).astype(np.float32)
    lay, sibs = build_keyed_layout(
        dsts, srcs, w1, v, TINY3, weight_variants=[(w2, 0.0), (None, 0.0)]
    )
    import dataclasses

    x = rng.normal(size=v).astype(np.float32)
    for wts, wa in [(w1, lay.w), (w2, sibs[0]), (None, sibs[1])]:
        lk = dataclasses.replace(lay, w=wa)
        y = np.asarray(keyed_spmv_jit(lk, jnp.asarray(x), interpret=True))
        oracle = _oracle_sum(dsts, srcs, wts, x, v)
        err = np.max(np.abs(y - oracle) / np.maximum(np.abs(oracle), 1.0))
        assert err < 2e-4, err


def test_keyed_empty_dst_rows_zero_and_inf(rng):
    """Vertices with no in-edges: 0 under sum, +inf under min."""
    v = 700
    srcs = rng.integers(0, v, 2000).astype(np.int64)
    dsts = rng.integers(0, v // 2, 2000).astype(np.int64)  # top half empty
    x = rng.normal(size=v).astype(np.float32)
    lay = build_keyed_layout(dsts, srcs, None, v, TINY3)
    y = np.asarray(keyed_spmv_jit(lay, jnp.asarray(x), interpret=True))
    has_in = np.zeros(v, bool)
    has_in[dsts] = True
    assert np.all(y[~has_in] == 0.0)
    lay_m = build_keyed_layout(
        dsts, srcs, np.zeros(2000, np.float32), v, TINY3,
        pad_weight=float("inf"), reduce="min",
    )
    ym = np.asarray(keyed_spmv_jit(lay_m, jnp.asarray(x), interpret=True))
    assert np.all(np.isinf(ym[~has_in]))


def test_keyed_layout_for_graph_api(rng, monkeypatch):
    monkeypatch.setenv("CUGRAPH_TPU_FORCE_SORTED", "1")
    monkeypatch.setenv("CUGRAPH_TPU_CACHE_DIR", "")
    import cugraph_tpu as cg

    v, e = 800, 6000
    srcs, dsts = _rand_graph(rng, v, e)
    g = cg.from_edgelist(srcs, dsts, num_vertices=v)
    lay = spmv3.keyed_layout_for(g, cfg=TINY3, use_weights=False)
    assert lay is not None and lay.reduce == "sum"
    x = rng.normal(size=v).astype(np.float32)
    y = np.asarray(keyed_spmv_jit(lay, jnp.asarray(x), interpret=True))
    adj = g.csc()
    ee = adj.num_edges
    oracle = _oracle_sum(
        np.asarray(adj.majors)[:ee], np.asarray(adj.minors)[:ee], None, x, v
    )
    err = np.max(np.abs(y - oracle) / np.maximum(np.abs(oracle), 1.0))
    assert err < 2e-4, err


def test_keyed_disk_cache_roundtrip(rng, tmp_path, monkeypatch):
    monkeypatch.setenv("CUGRAPH_TPU_CACHE_DIR", str(tmp_path))
    v, e = 500, 4000
    srcs, dsts = _rand_graph(rng, v, e)
    l1 = spmv3.build_keyed_layout_cached(dsts, srcs, None, v, TINY3)
    l2 = spmv3.build_keyed_layout_cached(dsts, srcs, None, v, TINY3)
    x = rng.normal(size=v).astype(np.float32)
    y1 = np.asarray(keyed_spmv_jit(l1, jnp.asarray(x), interpret=True))
    y2 = np.asarray(keyed_spmv_jit(l2, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y1, y2)
    assert l2.cfg == l1.cfg and l2.n_parts == l1.n_parts


def test_keyed_empty_tail_windows_written(rng):
    """Degree-sorted graphs leave trailing output windows with no
    edges; every out block must still be written (zero / +inf), not
    left as uninitialized garbage (found at RMAT scale 18: NaN y)."""
    v = 5000  # several WO=16 output blocks under TINY3
    e = 3000
    srcs = rng.integers(0, v, e).astype(np.int64)
    dsts = rng.integers(0, 300, e).astype(np.int64)  # low ids only
    x = rng.normal(size=v).astype(np.float32)
    lay = build_keyed_layout(dsts, srcs, None, v, TINY3)
    y = np.asarray(keyed_spmv_jit(lay, jnp.asarray(x), interpret=True))
    oracle = _oracle_sum(dsts, srcs, None, x, v)
    assert np.all(np.isfinite(y))
    err = np.max(np.abs(y - oracle) / np.maximum(np.abs(oracle), 1.0))
    assert err < 2e-4, err
    assert np.all(y[1000:] == 0.0)
    lay_m = build_keyed_layout(
        dsts, srcs, np.zeros(e, np.float32), v, TINY3,
        pad_weight=float("inf"), reduce="min",
    )
    ym = np.asarray(keyed_spmv_jit(lay_m, jnp.asarray(x), interpret=True))
    assert np.all(np.isinf(ym[1000:]))
