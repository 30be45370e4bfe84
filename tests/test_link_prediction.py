"""Jaccard / Sorensen / overlap vs NetworkX."""

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


def test_jaccard(karate):
    g, G = karate
    v1, v2, coeff = cg.jaccard(g)
    pairs = list(zip(np.asarray(v1).tolist(), np.asarray(v2).tolist()))
    expected = dict(
        ((u, v), c) for u, v, c in nx.jaccard_coefficient(G, pairs)
    )
    got = np.asarray(coeff)
    for (u, v), c in zip(pairs, got):
        np.testing.assert_allclose(c, expected[(u, v)], rtol=1e-5)


def test_sorensen(karate):
    g, G = karate
    v1, v2, coeff = cg.sorensen(g)
    # sorensen = 2*|∩| / (|N(u)|+|N(v)|); derive from nx jaccard: j = i/(a+b-i)
    deg = dict(G.degree())
    pairs = list(zip(np.asarray(v1).tolist(), np.asarray(v2).tolist()))
    for (u, v), c in zip(pairs, np.asarray(coeff)):
        inter = len(set(G[u]) & set(G[v]))
        exp = 2 * inter / (deg[u] + deg[v])
        np.testing.assert_allclose(c, exp, rtol=1e-5)


def test_overlap(karate):
    g, G = karate
    v1, v2, coeff = cg.overlap(g)
    deg = dict(G.degree())
    pairs = list(zip(np.asarray(v1).tolist(), np.asarray(v2).tolist()))
    for (u, v), c in zip(pairs, np.asarray(coeff)):
        inter = len(set(G[u]) & set(G[v]))
        exp = inter / min(deg[u], deg[v])
        np.testing.assert_allclose(c, exp, rtol=1e-5)


def test_jaccard_explicit_pairs(karate):
    g, G = karate
    pairs = (np.array([0, 0], dtype=np.int32), np.array([1, 33], dtype=np.int32))
    _, _, coeff = cg.jaccard(g, pairs=pairs)
    expected = dict(
        ((u, v), c)
        for u, v, c in nx.jaccard_coefficient(G, [(0, 1), (0, 33)])
    )
    np.testing.assert_allclose(
        np.asarray(coeff), [expected[(0, 1)], expected[(0, 33)]], rtol=1e-5
    )


def test_weighted_jaccard(karate):
    g, G = karate
    v1, v2, coeff = cg.jaccard(g, use_weight=True)
    got = np.asarray(coeff)
    assert np.isfinite(got).all()
    assert ((got >= 0) & (got <= 1)).all()
