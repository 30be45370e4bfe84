"""Sampling tests: structural/distributional properties (RNG parity with the
reference is impossible; this mirrors the reference's own MG sampling test
strategy — valid edges, fanout bounds, unbiasedness)."""

import jax
import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.prims.random_select import per_v_random_select_outgoing_e
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module")
def karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    edges = set(zip(np.asarray(g.csr().majors)[: g.csr().num_edges].tolist(),
                    np.asarray(g.csr().minors)[: g.csr().num_edges].tolist()))
    return g, edges


def test_random_select_valid_edges(karate):
    g, edges = karate
    verts = np.arange(g.num_vertices, dtype=np.int32)
    srcs, dsts, w, valid = per_v_random_select_outgoing_e(
        g, jax.random.PRNGKey(0), verts, 5
    )
    srcs, dsts, valid = map(np.asarray, (srcs, dsts, valid))
    deg = np.asarray(g.out_degrees())
    for i, v in enumerate(verts):
        k_valid = valid[i].sum()
        assert k_valid == min(deg[v], 5)
        sel = dsts[i][valid[i]]
        # all sampled edges exist, and no duplicates (without replacement)
        assert len(set(sel.tolist())) == len(sel)
        for d in sel:
            assert (int(v), int(d)) in edges


def test_random_select_uniformity(karate):
    g, edges = karate
    # vertex 33 has degree 17; sample k=2 many times, each neighbor should
    # appear with probability 2/17
    v = np.array([33], dtype=np.int32)
    counts = {}
    n_trials = 400
    for t in range(n_trials):
        _, dsts, _, valid = per_v_random_select_outgoing_e(
            g, jax.random.PRNGKey(t), v, 2
        )
        for d in np.asarray(dsts)[0][np.asarray(valid)[0]]:
            counts[int(d)] = counts.get(int(d), 0) + 1
    deg = int(np.asarray(g.out_degrees())[33])
    exp = 2 / deg * n_trials
    for d, c in counts.items():
        assert abs(c - exp) < 6 * np.sqrt(exp), (d, c, exp)


def test_uniform_neighbor_sample(karate):
    g, edges = karate
    res = cg.uniform_neighbor_sample(g, [0, 33], [3, 2])
    assert set(res.keys()) >= {"sources", "destinations", "hop"}
    for s, d in zip(res["sources"], res["destinations"]):
        assert (int(s), int(d)) in edges
    # hop 0: at most 2*3 edges; hop 1: at most 6*2
    assert (res["hop"] == 0).sum() <= 6
    assert (res["hop"] == 1).sum() <= 12


def test_uniform_neighbor_sample_all_neighbors(karate):
    g, edges = karate
    res = cg.uniform_neighbor_sample(g, [0], [-1])
    deg0 = int(np.asarray(g.out_degrees())[0])
    assert (res["hop"] == 0).sum() == deg0


def test_random_walks(karate):
    g, edges = karate
    walks, ws = cg.random_walks(g, [0, 1, 2], max_depth=4)
    walks = np.asarray(walks)
    assert walks.shape == (3, 5)
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in edges


def test_random_walks_sink_termination():
    src = np.array([0], dtype=np.int32)
    dst = np.array([1], dtype=np.int32)
    g = cg.from_edgelist(src, dst)  # 1 is a sink
    walks, _ = cg.random_walks(g, [0], max_depth=3)
    assert np.asarray(walks)[0].tolist() == [0, 1, -1, -1]


def test_node2vec(karate):
    g, edges = karate
    walks, ws = cg.node2vec(g, [0, 5], max_depth=5, p=2.0, q=0.5)
    walks = np.asarray(walks)
    assert walks.shape == (2, 6)
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in edges


def test_biased_random_walks():
    # edge weights heavily favor one branch
    src = np.array([0, 0], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    w = np.array([100.0, 0.001], dtype=np.float32)
    g = cg.from_edgelist(src, dst, w)
    hits_1 = 0
    for t in range(50):
        walks, _ = cg.random_walks(
            g, [0], max_depth=1, biased=True, rng_key=jax.random.PRNGKey(t)
        )
        if np.asarray(walks)[0, 1] == 1:
            hits_1 += 1
    assert hits_1 >= 48
