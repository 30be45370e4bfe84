"""Katz / eigenvector / betweenness / degree centrality vs NetworkX."""

import networkx as nx
import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module")
def karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    G = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    return g, G


def test_katz(karate):
    g, G = karate
    alpha = 0.005
    x, _ = cg.katz_centrality(g, alpha=alpha, tol=1e-10, max_iterations=2000)
    expected = nx.katz_centrality(G, alpha=alpha, tol=1e-12, max_iter=5000)
    got = np.asarray(x)
    for v, val in expected.items():
        np.testing.assert_allclose(got[v], val, rtol=1e-3)


def test_eigenvector(karate):
    g, G = karate
    x, _ = cg.eigenvector_centrality(g, tol=1e-8, max_iterations=2000)
    expected = nx.eigenvector_centrality(G, tol=1e-10, max_iter=5000)
    got = np.asarray(x)
    for v, val in expected.items():
        np.testing.assert_allclose(got[v], val, rtol=1e-3, atol=1e-6)


def test_degree_centrality(karate):
    g, G = karate
    got = np.asarray(cg.degree_centrality(g))
    expected = nx.degree_centrality(G)
    for v, val in expected.items():
        np.testing.assert_allclose(got[v], val, rtol=1e-6)


def test_betweenness_exact(karate):
    g, G = karate
    got = np.asarray(cg.betweenness_centrality(g, normalized=True))
    expected = nx.betweenness_centrality(G, normalized=True)
    for v, val in expected.items():
        np.testing.assert_allclose(got[v], val, rtol=1e-4, atol=1e-6)


def test_betweenness_sampled(karate):
    g, G = karate
    got = np.asarray(cg.betweenness_centrality(g, k=16, seed=1))
    expected = nx.betweenness_centrality(G, normalized=True)
    exp = np.array([expected[v] for v in range(g.num_vertices)])
    # sampled estimate: rank correlation of top vertices, not exact values
    top_true = set(np.argsort(-exp)[:5].tolist())
    top_got = set(np.argsort(-got)[:8].tolist())
    assert len(top_true & top_got) >= 3


def test_edge_betweenness(karate):
    g, G = karate
    ebc = np.asarray(cg.edge_betweenness_centrality(g, normalized=True))
    expected = nx.edge_betweenness_centrality(G, normalized=True)
    adj = g.csr()
    majors = np.asarray(adj.majors)[: adj.num_edges]
    minors = np.asarray(adj.minors)[: adj.num_edges]
    for (u, v), val in expected.items():
        slots = np.nonzero(
            ((majors == u) & (minors == v)) | ((majors == v) & (minors == u))
        )[0]
        # the two directed slots of an undirected edge together carry the
        # full (source-bidirectional) betweenness, matching nx's value
        got_val = ebc[slots].sum()
        np.testing.assert_allclose(got_val, val, rtol=1e-4, atol=1e-6)


def test_betweenness_endpoints(karate):
    g, G = karate
    got = np.asarray(cg.betweenness_centrality(g, normalized=True, endpoints=True))
    expected = nx.betweenness_centrality(G, normalized=True, endpoints=True)
    for v, val in expected.items():
        np.testing.assert_allclose(got[v], val, rtol=1e-4, atol=1e-6)
