"""BFS / SSSP / path extraction vs NetworkX (ref: tests/test_bfs.py,
test_sssp.py pattern: compare vs nx on bundled datasets)."""

import networkx as nx
import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.algos.traversal import INVALID_DISTANCE, two_hop_neighbors
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module")
def karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    G = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    return g, G


def test_bfs_karate(karate):
    g, G = karate
    dist, pred = cg.bfs(g, 0)
    expected = nx.single_source_shortest_path_length(G, 0)
    dist = np.asarray(dist)
    for v, d in expected.items():
        assert dist[v] == d
    # predecessor validity: pred[v] is a neighbor at distance d-1
    pred = np.asarray(pred)
    for v in range(g.num_vertices):
        if dist[v] > 0 and dist[v] != INVALID_DISTANCE:
            assert pred[v] >= 0
            assert dist[pred[v]] == dist[v] - 1
            assert G.has_edge(int(pred[v]), v)


def test_bfs_unreachable():
    src = np.array([0, 2], dtype=np.int32)
    dst = np.array([1, 3], dtype=np.int32)
    g = cg.from_edgelist(src, dst, num_vertices=4, symmetrize=True)
    dist, pred = cg.bfs(g, 0)
    assert np.asarray(dist)[2] == INVALID_DISTANCE
    assert np.asarray(pred)[2] == -1


def test_bfs_depth_limit(karate):
    g, G = karate
    dist, _ = cg.bfs(g, 0, depth_limit=1)
    d = np.asarray(dist)
    assert set(np.unique(d[d != INVALID_DISTANCE]).tolist()) <= {0, 1}


def test_bfs_multisource(karate):
    g, G = karate
    dist, _ = cg.bfs(g, np.array([0, 33]))
    d0 = nx.single_source_shortest_path_length(G, 0)
    d33 = nx.single_source_shortest_path_length(G, 33)
    dist = np.asarray(dist)
    for v in G.nodes:
        assert dist[v] == min(d0.get(v, 10**9), d33.get(v, 10**9))


def test_sssp_karate_weighted(karate):
    g, G = karate
    # give deterministic pseudo-weights
    src, dst, _ = karate_edgelist()
    w = ((src * 7 + dst * 3) % 5 + 1).astype(np.float32)
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    Gw = nx.Graph()
    for s, d, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        Gw.add_edge(s, d, weight=min(ww, Gw.get_edge_data(s, d, {"weight": 1e9})["weight"]) if Gw.has_edge(s, d) else ww)
    dist, pred = cg.sssp(g, 0)
    expected = nx.single_source_dijkstra_path_length(Gw, 0)
    dist = np.asarray(dist)
    for v, d in expected.items():
        np.testing.assert_allclose(dist[v], d, rtol=1e-5)


def test_sssp_cutoff(karate):
    g, _ = karate
    dist, _ = cg.sssp(g, 0, cutoff=2.0)
    d = np.asarray(dist)
    assert (d[np.isfinite(d)] <= 2.0).all()


def test_extract_bfs_paths(karate):
    g, G = karate
    dist, pred = cg.bfs(g, 0)
    paths, maxlen = cg.extract_bfs_paths(g, dist, pred, np.array([33, 16]))
    paths = np.asarray(paths)
    d = np.asarray(dist)
    for row, dest in zip(paths, [33, 16]):
        row = row[row >= 0]
        assert row[0] == 0 and row[-1] == dest
        assert len(row) == d[dest] + 1
        for a, b in zip(row[:-1], row[1:]):
            assert G.has_edge(int(a), int(b))


def test_two_hop_neighbors():
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    g = cg.from_edgelist(src, dst)
    s, d = two_hop_neighbors(g)
    assert list(zip(s.tolist(), d.tolist())) == [(0, 2)]


def test_sparse_bfs_level_matches_oracle():
    """Compacted sparse push level == dense-oracle expansion + min-pred."""
    import numpy as np
    import jax.numpy as jnp

    import cugraph_tpu as cg
    from cugraph_tpu.algos.traversal import _sparse_bfs_level

    rng = np.random.default_rng(11)
    v, e = 500, 3000
    src = rng.integers(0, v, e)
    dst = rng.integers(0, v, e)
    g = cg.from_edgelist(src, dst, num_vertices=v)
    csr = g.csr()
    frontier = np.zeros(v, bool)
    frontier[rng.choice(v, 17, replace=False)] = True
    visited = np.zeros(v, bool)
    visited[rng.choice(v, 60, replace=False)] = True

    touched, pred = _sparse_bfs_level(
        csr.offsets, csr.minors, jnp.asarray(frontier), jnp.asarray(visited),
        cap_v=64, cap_e=1 << 12,
    )
    oracle_t = np.zeros(v, bool)
    oracle_p = np.full(v, np.iinfo(np.int32).max)
    for s, d in zip(src, dst):
        if frontier[s] and not visited[d]:
            oracle_t[d] = True
            oracle_p[d] = min(oracle_p[d], s)
    np.testing.assert_array_equal(np.asarray(touched), oracle_t)
    np.testing.assert_array_equal(np.asarray(pred)[oracle_t], oracle_p[oracle_t])
