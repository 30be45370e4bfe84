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


@pytest.mark.parametrize("use_w", [True, False])
def test_sorted_spmv_min_plus(use_w):
    """min-plus sweep: y[dst] = min over in-edges of (x[src] + w); +inf
    for in-degree-0 dsts. The SSSP relaxation / BFS-predecessor kernel."""
    rng = np.random.default_rng(42)
    v, e = 900, 5000
    src, dst, w = _random_graph(rng, v, e, True)
    dst[dst >= v - 10] = 0  # leave some dsts with no in-edges
    x = rng.random(v).astype(np.float32) * 10
    wts = w if use_w else np.zeros(e, np.float32)
    oracle = np.full(v, np.inf)
    np.minimum.at(oracle, dst, x[src].astype(np.float64) + wts)
    layout = build_sorted_layout(
        dst, src, wts, v, TINY, pad_weight=float(np.inf)
    )
    y = np.asarray(
        sorted_spmv(layout, jnp.asarray(x), interpret=True, reduce="min")
    )
    fin = np.isfinite(oracle)
    assert (np.isfinite(y) == fin).all()
    np.testing.assert_allclose(y[fin], oracle[fin], rtol=1e-5, atol=1e-5)


def test_sorted_spmv_min_heavy_dst():
    """min path through the simple-part (heavy destination) code."""
    rng = np.random.default_rng(1)
    v, e = 400, 4000
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    dst[: e // 2] = 3  # one very heavy destination -> simple parts
    w = rng.random(e).astype(np.float32)
    x = rng.random(v).astype(np.float32)
    oracle = np.full(v, np.inf)
    np.minimum.at(oracle, dst, x[src].astype(np.float64) + w)
    layout = build_sorted_layout(dst, src, w, v, TINY, pad_weight=float(np.inf))
    y = np.asarray(
        sorted_spmv(layout, jnp.asarray(x), interpret=True, reduce="min")
    )
    fin = np.isfinite(oracle)
    np.testing.assert_allclose(y[fin], oracle[fin], rtol=1e-5, atol=1e-5)
    assert not np.isfinite(y[~fin]).any()


def test_bfs_min_level_semantics():
    """What _bfs_pallas_jit runs per level: one min-plus sweep over
    x = (id if in frontier else inf) gives expansion AND a valid
    predecessor simultaneously."""
    import cugraph_tpu as cg

    rng = np.random.default_rng(5)
    v, e = 700, 3500
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    g = cg.from_edgelist(src, dst, num_vertices=v, symmetrize=True)
    d_ref, _ = cg.bfs(g, 2)
    d_ref = np.asarray(d_ref)
    adj = g.csc()
    ee = adj.num_edges
    layout = build_sorted_layout(
        np.asarray(adj.majors)[:ee].astype(np.int64),
        np.asarray(adj.minors)[:ee].astype(np.int64),
        np.zeros(ee, np.float32),
        v,
        TINY,
        pad_weight=float(np.inf),
    )
    INVALID = np.iinfo(np.int32).max
    ids = np.arange(v, dtype=np.float32)
    dist = np.full(v, INVALID, np.int64)
    pred = np.full(v, -1, np.int64)
    dist[2] = 0
    visited = np.zeros(v, bool)
    visited[2] = True
    frontier = visited.copy()
    depth = 0
    while frontier.any():
        x = np.where(frontier, ids, np.inf).astype(np.float32)
        y = np.asarray(
            sorted_spmv(layout, jnp.asarray(x), interpret=True, reduce="min")
        )
        new = np.isfinite(y) & ~visited
        dist[new] = depth + 1
        pred[new] = y[new].astype(np.int64)
        visited |= new
        frontier = new
        depth += 1
    np.testing.assert_array_equal(dist, d_ref.astype(np.int64))
    # every predecessor is an in-neighbor one level up
    edges = set(zip(src.tolist() + dst.tolist(), dst.tolist() + src.tolist()))
    for vv in range(v):
        if pred[vv] >= 0:
            assert dist[pred[vv]] == dist[vv] - 1
            assert (int(pred[vv]), vv) in edges


def test_sssp_min_plus_sweeps_match_scipy():
    """Full Bellman-Ford min-plus sweeps (what _sssp_pallas_jit iterates)
    converge to scipy shortest paths."""
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    rng = np.random.default_rng(9)
    v, e = 500, 3000
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    w = (rng.random(e) * 3 + 0.1).astype(np.float32)
    # dedupe parallel edges: scipy's coo->csr sums their weights, min-plus
    # takes their min — keep one edge per (src, dst)
    _, keep = np.unique(src.astype(np.int64) * v + dst, return_index=True)
    src, dst, w = src[keep], dst[keep], w[keep]
    layout = build_sorted_layout(
        dst.astype(np.int64), src.astype(np.int64), w, v, TINY,
        pad_weight=float(np.inf),
    )
    dist = np.full(v, np.inf, np.float32)
    dist[0] = 0.0
    for _ in range(v):
        relax = np.asarray(
            sorted_spmv(layout, jnp.asarray(dist), interpret=True, reduce="min")
        )
        nd = np.minimum(dist, relax)
        if (nd == dist).all():
            break
        dist = nd
    a = sp.coo_matrix((w, (src, dst)), shape=(v, v)).tocsr()
    ref = csg.dijkstra(a, directed=True, indices=0)
    np.testing.assert_allclose(dist, ref.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_sorted_spmv_mid_heavy_multichunk():
    """dsts with in-degree between PR and 4*PR per lane column ride the
    sorted path as multiple chunk_id groups (own extract rounds)."""
    rng = np.random.default_rng(21)
    v, e = 256, 6000
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    # a band of mid-heavy dsts: ~20-60 in-edges each (TINY PR column = 16)
    for k, d in enumerate(range(10, 40)):
        n = 20 + k
        dst[rng.choice(e, n, replace=False)] = d
    w = rng.random(e).astype(np.float32)
    x = rng.random(v).astype(np.float32)
    oracle = np.zeros(v, np.float64)
    np.add.at(oracle, dst, w.astype(np.float64) * x[src])
    layout = build_sorted_layout(dst, src, w, v, TINY)
    y = np.asarray(sorted_spmv(layout, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("f", [1, 2, 7, 8])
def test_sorted_spmm_pairs_matches_oracle(f):
    """Paired-bf16 SpMM: two columns per pass through shared routing;
    bf16-rounded at expand and total placement, f32 segmented adds."""
    from cugraph_tpu.prims.pallas.spmv2 import sorted_spmm

    rng = np.random.default_rng(100 + f)
    v, e = 700, 4000
    src, dst, w = _random_graph(rng, v, e, hubby=True)
    feats = rng.random((v, f)).astype(np.float32)
    oracle = np.zeros((v, f), np.float64)
    np.add.at(oracle, dst, w[:, None].astype(np.float64) * feats[src])
    layout = build_sorted_layout(dst, src, w, v, TINY)
    out = np.asarray(
        sorted_spmm(layout, jnp.asarray(feats), interpret=True)
    )
    # bf16 rounding at two points: inputs and group totals
    np.testing.assert_allclose(out, oracle, rtol=2e-2, atol=2e-2)
    exact = np.asarray(
        sorted_spmm(layout, jnp.asarray(feats), precision="f32", interpret=True)
    )
    np.testing.assert_allclose(exact, oracle, rtol=1e-4, atol=1e-4)


def test_pack_unpack_pair_roundtrip():
    from cugraph_tpu.prims.pallas.spmv2 import _pack_pair, _unpack_pair

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=256).astype(np.float32) * 100)
    b = jnp.asarray(rng.normal(size=256).astype(np.float32) * 1e-3)
    pa, pb = _unpack_pair(_pack_pair(a, b))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(a), rtol=4e-3)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(b), rtol=4e-3)
    # zero stays exactly zero (sum identity for padding slots)
    z = _pack_pair(jnp.zeros(8), jnp.zeros(8))
    assert (np.asarray(z) == 0).all()


@pytest.mark.parametrize("reduce", ["sum", "min"])
def test_multi_range_sorted_spmv(reduce):
    """Multi-range pipeline: sources split into 1024-wide ranges, one
    sub-layout each, dense outputs combined (sum/min) — the path for V
    past the single-VMEM-table budget."""
    from cugraph_tpu.prims.pallas.spmv2 import (
        build_multi_sorted_layout,
        sorted_spmv,
    )

    rng = np.random.default_rng(42)
    v, e = 4000, 9000
    src, dst, w = _random_graph(rng, v, e, hubby=True)
    x = rng.random(v).astype(np.float32)
    pad = float(np.inf) if reduce == "min" else 0.0
    mlay = build_multi_sorted_layout(dst, src, w, v, TINY, pad_weight=pad, span=1024)
    assert len(mlay.parts) > 1
    y = np.asarray(sorted_spmv(mlay, jnp.asarray(x), interpret=True, reduce=reduce))
    if reduce == "sum":
        oracle = np.zeros(v, np.float64)
        np.add.at(oracle, dst, w.astype(np.float64) * x[src])
    else:
        oracle = np.full(v, np.inf)
        np.minimum.at(oracle, dst, (x[src] + w).astype(np.float64))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=1e-4)


def test_multi_range_sorted_spmm_pairs():
    from cugraph_tpu.prims.pallas.spmv2 import (
        build_multi_sorted_layout,
        sorted_spmm,
    )

    rng = np.random.default_rng(43)
    v, e, f = 3000, 6000, 4
    src, dst, w = _random_graph(rng, v, e, hubby=False)
    feats = rng.random((v, f)).astype(np.float32)
    mlay = build_multi_sorted_layout(dst, src, w, v, TINY, span=1024)
    out = np.asarray(sorted_spmm(mlay, jnp.asarray(feats), interpret=True))
    oracle = np.zeros((v, f), np.float64)
    np.add.at(oracle, dst, w[:, None].astype(np.float64) * feats[src])
    np.testing.assert_allclose(out, oracle, rtol=2e-2, atol=2e-2)


def test_multi_range_with_empty_range_and_mega_hub():
    """A src range with no edges is skipped; a destination whose in-degree
    exceeds the per-part cap splits across hub parts whose partial totals
    scatter-add correctly."""
    from cugraph_tpu.prims.pallas.spmv2 import (
        build_multi_sorted_layout,
        sorted_spmv,
    )

    rng = np.random.default_rng(77)
    v = 4096
    # all sources in ranges 0 and 2 (range 1 = [1024, 2048) empty)
    src = np.concatenate([
        rng.integers(0, 1024, 3000),
        rng.integers(2048, 3072, 3000),
    ])
    # mega hub: half of all edges point at vertex 7
    dst = rng.integers(0, v, 6000)
    dst[::2] = 7
    w = rng.random(6000).astype(np.float32)
    x = rng.random(v).astype(np.float32)
    mlay = build_multi_sorted_layout(dst, src, w, v, TINY, span=1024)
    assert 1 not in mlay.range_of
    y = np.asarray(sorted_spmv(mlay, jnp.asarray(x), interpret=True))
    oracle = np.zeros(v, np.float64)
    np.add.at(oracle, dst, w.astype(np.float64) * x[src])
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=1e-4)


def test_spmm_slab_chunked_streams(monkeypatch):
    """At slab_rows 4096 the multi-stream SpMM must split the slab Benes
    into 2-stream calls (k=4 at that block size overflows the VMEM limit
    with register spills on real hardware); the chunked path must match
    the oracle."""
    from cugraph_tpu.prims.pallas.spmv2 import (
        build_sorted_layout_auto,
        sorted_spmm,
    )

    monkeypatch.setenv("CUGRAPH_TPU_CACHE_DIR", "")
    rng = np.random.default_rng(11)
    v, e, f = 1200, 5000, 16
    src, dst, w = _random_graph(rng, v, e, hubby=True)
    cfg = dataclasses.replace(TINY, slab_rows=4096, chunk_rows=16)
    lay = build_sorted_layout_auto(dst, src, w, v, cfg)
    assert lay.cfg.slab_rows == 4096  # k=4 > kc=2 -> chunked slab calls
    feats = rng.random((v, f)).astype(np.float32)
    out = np.asarray(sorted_spmm(lay, jnp.asarray(feats), interpret=True))
    oracle = np.zeros((v, f), np.float64)
    np.add.at(oracle, dst, w[:, None].astype(np.float64) * feats[src])
    np.testing.assert_allclose(out, oracle, rtol=2e-2, atol=2e-2)


def test_weight_variants_shared_build(tmp_path, monkeypatch):
    """One host pass emits sibling layouts differing only in the w slot
    array (routing depends on edge positions only): the min sibling must
    be field-identical to a direct min build, land in the disk-cache slot
    a direct build would use, and produce the min-plus oracle result."""
    from cugraph_tpu.prims.pallas.spmv2 import (
        build_sorted_layout_auto,
        sorted_spmv,
    )

    monkeypatch.setenv("CUGRAPH_TPU_CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(7)
    v, e = 900, 4000
    src, dst, w = _random_graph(rng, v, e, hubby=True)
    zeros = np.zeros(e, np.float32)
    sum_lay, min_lay = build_sorted_layout_auto(
        dst, src, w, v, TINY,
        weight_variants=[(zeros, float(np.inf))],
    )
    direct = build_sorted_layout_auto(
        dst, src, zeros, v, TINY, pad_weight=float(np.inf)
    )  # disk-cache hit from the joint build (same key)
    for f in dataclasses.fields(direct):
        a, b = getattr(direct, f.name), getattr(min_lay, f.name)
        if f.name == "cfg":
            assert a == b
        elif f.name in (
            "n_slabs", "n_parts", "n_bins", "n_steps", "x_rows",
            "num_vertices", "num_edges", "num_src", "n_out_blocks",
        ):
            assert a == b, f.name
        else:
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f.name
            )
    x = rng.random(v).astype(np.float32)
    y = np.asarray(sorted_spmv(min_lay, jnp.asarray(x), interpret=True,
                               reduce="min"))
    oracle = np.full(v, np.inf)
    np.minimum.at(oracle, dst, x[src].astype(np.float64))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=1e-4)
    ysum = np.asarray(sorted_spmv(sum_lay, jnp.asarray(x), interpret=True))
    osum = np.zeros(v, np.float64)
    np.add.at(osum, dst, w.astype(np.float64) * x[src])
    np.testing.assert_allclose(ysum, osum, rtol=1e-4, atol=1e-4)


def test_default_config_scaling():
    from cugraph_tpu.prims.pallas.spmv2 import default_config_for

    assert default_config_for(1 << 21).bin_rows == 512  # scale-21 cache key stable
    c23 = default_config_for(1 << 23)
    assert c23.bin_rows == 1024 and c23.part_rows % c23.bin_rows == 0
    # capped at 1024 so the end-at-target placement keeps LAYERS >= 2
    assert default_config_for(1 << 25).bin_rows == 1024
