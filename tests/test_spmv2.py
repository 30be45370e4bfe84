"""SpMV v2 sorted pipeline: builder + Benes routing + kernels (interpret).

The pipeline realizes a static permutation of edge values (expand ->
slab Benes -> assemble -> part Benes -> segmented scan -> extract); each
trial checks the end-to-end result against a dense numpy oracle.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cugraph_tpu.prims.pallas.benes import (
    apply_benes_np,
    route_benes,
    route_benes_py,
    stage_distances,
)
from cugraph_tpu.prims.pallas.spmv2 import (
    TINY,
    Spmv2Config,
    build_sorted_layout,
    sorted_spmv,
)


def test_benes_routing_py_and_cpp():
    rng = np.random.default_rng(0)
    for n in [2, 8, 128, 1024, 4096]:
        perm = rng.permutation(n)
        bits = route_benes_py(perm)
        y = apply_benes_np(np.arange(n), bits)
        assert (y[perm] == np.arange(n)).all()
        bits_c = route_benes(perm)
        yc = apply_benes_np(np.arange(n), bits_c)
        assert (yc[perm] == np.arange(n)).all()
    assert len(stage_distances(1024)) == 19


def _random_graph(rng, v, e, hubby):
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    if hubby:
        m = rng.random(e) < 0.5
        src[m] = rng.integers(0, max(v // 50, 1), m.sum())
        dst[m] = rng.integers(0, max(v // 50, 1), m.sum())
    w = rng.random(e).astype(np.float32)
    return src, dst, w


@pytest.mark.parametrize(
    "v,e,hubby",
    [(50, 200, False), (300, 2000, True), (2500, 9000, True), (4000, 6000, False)],
)
def test_sorted_spmv_matches_oracle(v, e, hubby):
    rng = np.random.default_rng(v + e)
    src, dst, w = _random_graph(rng, v, e, hubby)
    x = rng.random(v).astype(np.float32)
    oracle = np.zeros(v, np.float64)
    np.add.at(oracle, dst, w.astype(np.float64) * x[src])
    layout = build_sorted_layout(dst, src, w, v, TINY)
    y = np.asarray(sorted_spmv(layout, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=1e-4)


def test_sorted_spmv_unweighted_and_empty_dsts():
    rng = np.random.default_rng(7)
    v, e = 600, 1500
    src = rng.integers(0, v // 2, e)  # upper half of dsts stays empty
    dst = rng.integers(0, v // 2, e)
    oracle = np.zeros(v, np.float64)
    x = rng.random(v).astype(np.float32)
    np.add.at(oracle, dst, x[src].astype(np.float64))
    layout = build_sorted_layout(dst, src, None, v, TINY)
    y = np.asarray(sorted_spmv(layout, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=1e-4)
    assert (y[v // 2 :] == 0).all()


def test_layout_disk_cache_roundtrip(tmp_path, monkeypatch):
    """save/load round-trips the layout and build_sorted_layout_auto
    serves the second build from the cache file."""
    import dataclasses as dc

    from cugraph_tpu.prims.pallas import spmv2 as s2

    rng = np.random.default_rng(11)
    src, dst, w = _random_graph(rng, 300, 2000, True)
    x = rng.random(300).astype(np.float32)
    monkeypatch.setenv("CUGRAPH_TPU_CACHE_DIR", str(tmp_path))
    lay1 = s2.build_sorted_layout_auto(dst, src, w, 300, TINY)
    files = list(tmp_path.glob("spmv2_layout_*.npz"))
    assert len(files) == 1
    lay2 = s2.build_sorted_layout_auto(dst, src, w, 300, TINY)
    for f in dc.fields(lay1):
        a, b = getattr(lay1, f.name), getattr(lay2, f.name)
        if f.name == "cfg":
            assert a == b
        elif f.name in s2._STATIC_FIELDS:
            assert a == b, f.name
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), f.name)
    y1 = np.asarray(sorted_spmv(lay1, jnp.asarray(x), interpret=True))
    y2 = np.asarray(sorted_spmv(lay2, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y1, y2)


def test_bfs_level_or_semantics():
    """BFS-by-pipeline semantics: sum > 0 over the unweighted layout equals
    the frontier OR, and the predecessor post-pass yields a valid BFS tree
    (what _bfs_pallas_jit runs on TPU)."""
    import cugraph_tpu as cg

    rng = np.random.default_rng(3)
    v, e = 800, 4000
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    g = cg.from_edgelist(src, dst, num_vertices=v, symmetrize=True)
    d_ref, p_ref = cg.bfs(g, 0)
    d_ref = np.asarray(d_ref)
    adj = g.csc()
    ee = adj.num_edges
    layout = build_sorted_layout(
        np.asarray(adj.majors)[:ee].astype(np.int64),
        np.asarray(adj.minors)[:ee].astype(np.int64),
        None,
        v,
        TINY,
    )
    INVALID = np.iinfo(np.int32).max
    dist = np.full(v, INVALID, np.int64)
    dist[0] = 0
    frontier = np.zeros(v, np.float32)
    frontier[0] = 1
    visited = frontier > 0
    depth = 0
    while frontier.any():
        y = np.asarray(sorted_spmv(layout, jnp.asarray(frontier), interpret=True))
        new = (y > 0) & ~visited
        dist[new] = depth + 1
        visited |= new
        frontier = new.astype(np.float32)
        depth += 1
    np.testing.assert_array_equal(dist, d_ref.astype(np.int64))
