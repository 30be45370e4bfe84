"""MG tests on a virtual 8-device CPU mesh; oracle = SG result (the
reference's MG-vs-SG equality strategy, SURVEY.md §4.1)."""

import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.dist import (
    MGGraph,
    Partition2D,
    distribute_graph,
    make_mesh,
    mg_algos,
)
from cugraph_tpu.dist.mg_graph import shard_vertex_values, unshard_vertex_values
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module", params=[(2, 4), (4, 2), (8, 1), (1, 1)])
def mesh(request):
    import jax

    r, c = request.param
    if r * c > len(jax.devices()):
        pytest.skip("not enough devices")
    return make_mesh((r, c))


@pytest.fixture(scope="module")
def karate_sg():
    src, dst, w = karate_edgelist()
    return cg.from_edgelist(src, dst, w, symmetrize=True)


@pytest.fixture(scope="module")
def karate_mg(mesh, karate_sg):
    return distribute_graph(mesh, karate_sg)


def test_partition_math():
    p = Partition2D.create(2, 4, 100)
    assert p.vp == 13  # ceil(100/8)
    assert p.v_padded == 104
    # every vertex belongs to exactly one range; ranges tile the span
    seen = set()
    for j in range(4):
        for i in range(2):
            lo, hi = p.range_of(i, j)
            assert hi - lo == p.vp
            seen |= set(range(lo, hi))
    assert seen == set(range(104))
    # edge routing consistent with ownership
    i, j, b = p.edge_block(np.array([50]), np.array([99]))
    lo, hi = p.dst_range_of_block(int(i[0]), int(b[0]))
    assert lo <= 99 < hi
    lo, hi = p.col_span(int(j[0]))
    assert lo <= 50 < hi


def test_distribute_roundtrip(mesh, karate_sg, karate_mg):
    mgg = karate_mg
    assert mgg.num_edges == karate_sg.num_edges
    assert mgg.num_vertices == karate_sg.num_vertices
    # total block counts match edge count
    assert int(np.asarray(mgg.block_counts).sum()) == karate_sg.num_edges


def test_shard_unshard(mesh, karate_mg):
    vals = np.arange(karate_mg.num_vertices, dtype=np.float32)
    sharded = shard_vertex_values(mesh, karate_mg, vals)
    back = unshard_vertex_values(karate_mg, sharded)
    np.testing.assert_array_equal(back, vals)


def test_mg_degrees(mesh, karate_sg, karate_mg):
    got = unshard_vertex_values(
        karate_mg, mg_algos.mg_out_weight_sums(mesh, karate_mg)
    )
    np.testing.assert_allclose(got, np.asarray(karate_sg.out_weight_sums()), rtol=1e-6)
    got_in = unshard_vertex_values(karate_mg, mg_algos.mg_in_degrees(mesh, karate_mg))
    np.testing.assert_array_equal(got_in, np.asarray(karate_sg.in_degrees()))


def test_mg_pagerank_matches_sg(mesh, karate_sg, karate_mg):
    pr_sg, _ = cg.pagerank(karate_sg, tol=1e-8)
    pr_mg, iters = mg_algos.mg_pagerank(mesh, karate_mg, tol=1e-8)
    got = unshard_vertex_values(karate_mg, pr_mg)
    np.testing.assert_allclose(got, np.asarray(pr_sg), rtol=1e-4, atol=1e-7)


def test_mg_bfs_matches_sg(mesh, karate_sg, karate_mg):
    dist_sg, _ = cg.bfs(karate_sg, 0)
    dist_mg, pred_mg = mg_algos.mg_bfs(mesh, karate_mg, 0)
    got = unshard_vertex_values(karate_mg, dist_mg)
    np.testing.assert_array_equal(got, np.asarray(dist_sg))
    # predecessor validity (global ids)
    pred = unshard_vertex_values(karate_mg, pred_mg)
    dist = got
    for v in range(karate_mg.num_vertices):
        if dist[v] > 0 and dist[v] < 10**9:
            assert dist[pred[v]] == dist[v] - 1


def test_mg_sssp_matches_sg(mesh, karate_sg, karate_mg):
    dist_sg, _ = cg.sssp(karate_sg, 0)
    dist_mg, _ = mg_algos.mg_sssp(mesh, karate_mg, 0)
    got = unshard_vertex_values(karate_mg, dist_mg)
    np.testing.assert_allclose(got, np.asarray(dist_sg), rtol=1e-5)


def test_mg_wcc_matches_sg(mesh):
    src = np.array([0, 1, 3, 4, 7], dtype=np.int32)
    dst = np.array([1, 2, 4, 5, 8], dtype=np.int32)
    sg = cg.from_edgelist(src, dst, num_vertices=9, symmetrize=True)
    mgg = distribute_graph(mesh, sg)
    labels_sg = np.asarray(cg.weakly_connected_components(sg))
    labels_mg = unshard_vertex_values(mgg, mg_algos.mg_wcc(mesh, mgg))
    np.testing.assert_array_equal(labels_mg, labels_sg)


def test_mg_katz_matches_sg(mesh, karate_sg, karate_mg):
    x_sg, _ = cg.katz_centrality(karate_sg, alpha=0.005, tol=1e-8)
    x_mg = mg_algos.mg_katz_centrality(mesh, karate_mg, alpha=0.005, tol=1e-8)
    got = unshard_vertex_values(karate_mg, x_mg)
    np.testing.assert_allclose(got, np.asarray(x_sg), rtol=1e-3, atol=1e-6)


def test_mg_spmm_matches_sg(mesh, karate_sg, karate_mg):
    from cugraph_tpu.gnn import spmm_aggregate

    v = karate_sg.num_vertices
    feats = np.random.default_rng(0).normal(size=(v, 16)).astype(np.float32)
    sg_out = np.asarray(spmm_aggregate(karate_sg, feats, op="mean"))
    sharded = shard_vertex_values(mesh, karate_mg, feats)
    mg_out = unshard_vertex_values(
        karate_mg, mg_algos.mg_spmm_aggregate(mesh, karate_mg, sharded, op="mean")
    )
    np.testing.assert_allclose(mg_out, sg_out, rtol=1e-4, atol=1e-5)
