"""API layer: Graph classes, dataframe I/O, nx compat, PropertyGraph."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from cugraph_tpu.api import Graph, PropertyGraph, algorithms as capi, from_networkx
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module")
def karate_api():
    src, dst, w = karate_edgelist()
    g = Graph()
    g.from_numpy_edgelist(src, dst, w)
    return g


def test_graph_basics(karate_api):
    g = karate_api
    assert g.number_of_vertices() == 34
    assert g.number_of_edges() == 78
    assert not g.is_directed()
    assert g.is_weighted()
    deg = g.degree()
    assert set(deg.columns) == {"vertex", "degree"}
    assert deg["degree"].sum() == 2 * 78


def test_string_vertex_ids():
    df = pd.DataFrame(
        {
            "source": ["alice", "bob", "carol"],
            "destination": ["bob", "carol", "alice"],
        }
    )
    g = Graph()
    g.from_pandas_edgelist(df)
    assert g.number_of_vertices() == 3
    res = capi.pagerank(g)
    assert set(res["vertex"]) == {"alice", "bob", "carol"}
    np.testing.assert_allclose(res["pagerank"].sum(), 1.0, rtol=1e-5)


def test_pagerank_df(karate_api):
    res = capi.pagerank(karate_api, tol=1e-8)
    assert list(res.columns) == ["vertex", "pagerank"]
    np.testing.assert_allclose(res["pagerank"].sum(), 1.0, rtol=1e-5)


def test_nx_input_returns_dict():
    src, dst, w = karate_edgelist()
    G = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    res = capi.pagerank(G, tol=1e-8)
    assert isinstance(res, dict)
    expected = nx.pagerank(G, tol=1e-10)
    for v, val in expected.items():
        np.testing.assert_allclose(res[v], val, rtol=1e-4)


def test_bfs_df(karate_api):
    res = capi.bfs(karate_api, 0)
    assert set(res.columns) == {"vertex", "distance", "predecessor"}
    assert res.loc[res["vertex"] == 0, "distance"].iloc[0] == 0


def test_louvain_df(karate_api):
    df, q = capi.louvain(karate_api)
    assert q > 0.35
    assert "partition" in df.columns


def test_jaccard_df(karate_api):
    df = capi.jaccard(karate_api)
    assert set(df.columns) == {"first", "second", "jaccard_coeff"}
    assert len(df) == 78


def test_to_from_networkx(karate_api):
    G = nx.karate_club_graph()
    g = from_networkx(G)
    assert g.number_of_vertices() == 34
    from cugraph_tpu.api.nx_compat import to_networkx

    G2 = to_networkx(g)
    assert set(G2.edges) == set(G.edges) or set(
        (min(u, v), max(u, v)) for u, v in G2.edges
    ) == set((min(u, v), max(u, v)) for u, v in G.edges)


def test_k_core_api(karate_api):
    sub = capi.k_core(karate_api, 4)
    assert sub.number_of_vertices() < 34


def test_uniform_neighbor_sample_api(karate_api):
    df = capi.uniform_neighbor_sample(karate_api, [0, 1], [2, 2])
    assert set(df.columns) >= {"sources", "destinations", "hop_id"}


def test_property_graph():
    pg = PropertyGraph()
    v_df = pd.DataFrame(
        {"id": [0, 1, 2, 3], "age": [25, 30, 35, 40], "score": [1.0, 2.0, 3.0, 4.0]}
    )
    pg.add_vertex_data(v_df, "id", type_name="person")
    e_df = pd.DataFrame(
        {"src": [0, 1, 2], "dst": [1, 2, 3], "amount": [10.0, 20.0, 30.0]}
    )
    pg.add_edge_data(e_df, ("src", "dst"), type_name="pays")
    assert pg.get_num_vertices() == 4
    assert pg.get_num_edges() == 3
    assert pg.vertex_types == ["person"]
    assert pg.edge_types == ["pays"]
    got = pg.get_vertex_data(vertex_ids=[1, 2])
    assert got["age"].tolist() == [30, 35]
    g = pg.extract_subgraph(edge_weight_property="amount")
    assert g.number_of_vertices() == 4
    sel = pg.select_edges("amount > 15")
    g2 = pg.extract_subgraph(selection=sel)
    assert g2.core.num_edges == 2


def test_graph_conversions(karate_api):
    gd = karate_api.to_directed()
    assert gd.is_directed()
    assert gd.number_of_edges() == 156
    gu = gd.to_undirected()
    assert not gu.is_directed()


def test_from_numpy_array():
    a = np.array([[0, 1, 0], [0, 0, 2], [3, 0, 0]], dtype=np.float32)
    g = Graph(directed=True)
    g.from_numpy_array(a)
    assert g.number_of_vertices() == 3
    assert g.number_of_edges() == 3


def test_from_scipy_sparse():
    import scipy.sparse as sp

    m = sp.coo_matrix(([1.0, 2.0], ([0, 1], [1, 2])), shape=(3, 3))
    g = Graph(directed=True)
    g.from_scipy_sparse(m)
    assert g.number_of_edges() == 2


def test_hungarian_matches_scipy():
    import numpy as np
    import scipy.optimize as spo
    import cugraph_tpu as cg

    rng = np.random.default_rng(0)
    nw, nt = 5, 5
    workers = np.arange(nw, dtype=np.int32)
    tasks = np.arange(nw, nw + nt, dtype=np.int32)
    cost = rng.random((nw, nt)).astype(np.float32)
    src = np.repeat(workers, nt)
    dst = np.tile(tasks, nw)
    w = cost.reshape(-1)
    g = cg.from_edgelist(src, dst, w, num_vertices=nw + nt)
    total, assign = cg.hungarian(g, workers)
    rows, cols = spo.linear_sum_assignment(cost)
    np.testing.assert_allclose(total, cost[rows, cols].sum(), rtol=1e-5)
    # assignment is a permutation of tasks achieving the same cost
    got = cost[np.arange(nw), np.searchsorted(tasks, assign)].sum()
    np.testing.assert_allclose(got, total, rtol=1e-5)


def test_property_graph_selections_and_types():
    """PropertySelection composition, typed counts, property names, by-type
    renumbering, multigraph checks (ref property_graph.py:28,238,780,1168)."""
    from cugraph_tpu.api import PropertySelection

    pg = PropertyGraph()
    people = pd.DataFrame({"id": [0, 1, 2], "age": [25, 30, 35]})
    shops = pd.DataFrame({"id": [10, 11], "rating": [4.5, 3.0]})
    pg.add_vertex_data(people, "id", type_name="person")
    pg.add_vertex_data(shops, "id", type_name="shop")
    pays = pd.DataFrame({"s": [0, 1, 2], "d": [10, 11, 10], "amount": [5.0, 9.0, 2.0]})
    knows = pd.DataFrame({"s": [0, 1], "d": [1, 2]})
    pg.add_edge_data(pays, ("s", "d"), type_name="pays")
    pg.add_edge_data(knows, ("s", "d"), type_name="knows")

    assert pg.get_num_vertices() == 5
    assert pg.get_num_vertices("person") == 3
    assert pg.get_num_edges("pays") == 3 and pg.get_num_edges("knows") == 2
    assert pg.vertex_property_names == ["age", "rating"]
    assert "amount" in pg.edge_property_names
    assert len(pg.get_vertices()) == 5

    # vertex selection restricts edges to both-endpoint matches
    vsel = pg.select_vertices("_TYPE_ == 'person'")
    esel = pg.select_edges("_TYPE_ == 'knows'")
    combined = vsel + esel
    assert isinstance(combined, PropertySelection)
    g = pg.extract_subgraph(selection=combined, check_multi_edges=False)
    assert g.core.num_edges == 2  # only knows-edges between persons

    # default_edge_weight fills for edges lacking the property
    gw = pg.extract_subgraph(
        edge_weight_property="amount", default_edge_weight=1.0,
        check_multi_edges=False,
    )
    assert gw.core.weighted

    # edge_data annotation attached for annotate_dataframe
    assert hasattr(gw, "edge_data") and len(gw.edge_data) == 5

    # renumber by type -> contiguous typed ranges
    spans = pg.renumber_vertices_by_type()
    assert spans.loc["person", "stop"] - spans.loc["person", "start"] == 2
    espans = pg.renumber_edges_by_type()
    assert espans.loc["knows", "start"] == 0  # sorted type order
    # duplicate-edge (multigraph) detection
    dup = pd.DataFrame({"s": [5, 5], "d": [6, 6]})
    pg2 = PropertyGraph()
    pg2.add_edge_data(dup, ("s", "d"))
    assert PropertyGraph.has_duplicate_edges(pg2._edge_df)
    with pytest.raises(Exception):
        pg2.extract_subgraph()  # check_multi_edges=True on non-multigraph


def test_multigraph_preserves_parallel_edges():
    """MultiGraph symmetrize keeps parallel edges (ref symmetrize multi
    flag); plain Graph coalesces them."""
    import pandas as pd

    from cugraph_tpu.api.graph import Graph, MultiGraph

    df = pd.DataFrame({"src": [0, 0, 0, 1], "dst": [1, 1, 2, 0], "w": [1.0, 2.0, 3.0, 4.0]})
    mg = MultiGraph()
    mg.from_pandas_edgelist(df, source="src", destination="dst", edge_attr="w")
    assert mg.number_of_edges() == 4  # 0-1 x3 (two + reciprocal pair), 0-2
    g = Graph()
    g.from_pandas_edgelist(df, source="src", destination="dst", edge_attr="w")
    assert g.number_of_edges() == 2
