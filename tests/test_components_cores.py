"""WCC / SCC / core number / k-core vs NetworkX."""

import networkx as nx
import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.testing import karate_edgelist


def test_wcc_two_components():
    src = np.array([0, 1, 3, 4], dtype=np.int32)
    dst = np.array([1, 2, 4, 5], dtype=np.int32)
    g = cg.from_edgelist(src, dst, symmetrize=True)
    labels = np.asarray(cg.weakly_connected_components(g))
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    # label = min vertex id of the component
    assert labels[0] == 0 and labels[3] == 3


def test_wcc_directed_weak():
    # directed chain is weakly connected
    src = np.array([0, 2], dtype=np.int32)
    dst = np.array([1, 1], dtype=np.int32)
    g = cg.from_edgelist(src, dst)
    labels = np.asarray(cg.weakly_connected_components(g))
    assert len(set(labels.tolist())) == 1


def test_wcc_karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    labels = np.asarray(cg.weakly_connected_components(g))
    assert (labels == 0).all()


def test_scc():
    src = np.array([0, 1, 2, 3], dtype=np.int32)
    dst = np.array([1, 0, 3, 2], dtype=np.int32)
    g = cg.from_edgelist(src, dst, num_vertices=5)
    labels = np.asarray(cg.strongly_connected_components(g))
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]
    assert labels[4] not in (labels[0], labels[2])


def test_core_number_karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    core = np.asarray(cg.core_number(g))
    G = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    expected = nx.core_number(G)
    # cuGraph incoming_outgoing on symmetric graphs doubles the undirected
    # core number (in+out degrees)
    for v, c in expected.items():
        assert core[v] == 2 * c


def test_core_number_outgoing_matches_nx():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    core = np.asarray(cg.core_number(g, degree_type="outgoing"))
    G = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    expected = nx.core_number(G)
    for v, c in expected.items():
        assert core[v] == c


def test_k_core():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    sub, vmap = cg.k_core(g, 4, degree_type="outgoing")
    G = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    expected = nx.k_core(G, 4)
    assert set(vmap.tolist()) == set(expected.nodes)
