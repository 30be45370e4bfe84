"""PageRank vs NetworkX oracle (ref test strategy:
cpp/tests/link_analysis/pagerank_test.cpp + python tests/test_pagerank.py)."""

import networkx as nx
import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module")
def karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    G = nx.Graph()
    for s, d in zip(src, dst):
        G.add_edge(int(s), int(d), weight=1.0)
    return g, G


def test_pagerank_karate(karate):
    g, G = karate
    pr, iters = cg.pagerank(g, alpha=0.85, tol=1e-8)
    expected = nx.pagerank(G, alpha=0.85, tol=1e-10)
    got = np.asarray(pr)
    for v, val in expected.items():
        np.testing.assert_allclose(got[v], val, rtol=1e-4)
    assert abs(float(got.sum()) - 1.0) < 1e-5
    assert 0 < iters <= 100


def test_pagerank_directed():
    src = np.array([0, 1, 2, 3, 3], dtype=np.int32)
    dst = np.array([1, 2, 0, 0, 1], dtype=np.int32)
    g = cg.from_edgelist(src, dst)
    G = nx.DiGraph(list(zip(src.tolist(), dst.tolist())))
    pr, _ = cg.pagerank(g, tol=1e-10)
    expected = nx.pagerank(G, tol=1e-12, max_iter=1000)
    for v, val in expected.items():
        np.testing.assert_allclose(np.asarray(pr)[v], val, rtol=1e-4)


def test_pagerank_dangling():
    # vertex 2 has no outgoing edges
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    g = cg.from_edgelist(src, dst, num_vertices=3)
    G = nx.DiGraph([(0, 1), (1, 2)])
    pr, _ = cg.pagerank(g, tol=1e-10)
    expected = nx.pagerank(G, tol=1e-12, max_iter=1000)
    for v, val in expected.items():
        np.testing.assert_allclose(np.asarray(pr)[v], val, rtol=1e-4)


def test_personalized_pagerank(karate):
    g, G = karate
    ids = np.array([0, 33], dtype=np.int32)
    vals = np.array([0.5, 0.5], dtype=np.float32)
    pr, _ = cg.pagerank(g, personalization=(ids, vals), tol=1e-10)
    expected = nx.pagerank(G, personalization={0: 0.5, 33: 0.5}, tol=1e-12, max_iter=1000)
    for v, val in expected.items():
        np.testing.assert_allclose(np.asarray(pr)[v], val, rtol=1e-4)


def test_pagerank_nstart(karate):
    g, G = karate
    nstart = np.ones(g.num_vertices, dtype=np.float32)
    pr, _ = cg.pagerank(g, nstart=nstart, tol=1e-10)
    pr2, _ = cg.pagerank(g, tol=1e-10)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pr2), atol=1e-6)


def test_hits_karate(karate):
    g, G = karate
    hubs, auths, _ = cg.hits(g, tol=1e-8, max_iterations=200)
    nh, na = nx.hits(G, tol=1e-10, max_iter=500)
    got_h = np.asarray(hubs)
    for v, val in nh.items():
        np.testing.assert_allclose(got_h[v], val, rtol=1e-3, atol=1e-6)
