"""GNN: SpMM aggregation vs dense oracle, GraphSAGE/GCN forward, GraphStore."""

import jax
import numpy as np
import pandas as pd
import pytest

import cugraph_tpu as cg
from cugraph_tpu.gnn import (
    GCN,
    GraphSAGE,
    GraphStore,
    gcn_aggregate,
    sage_aggregate,
    spmm_aggregate,
)
from cugraph_tpu.testing import karate_edgelist


@pytest.fixture(scope="module")
def karate():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    v = g.num_vertices
    a = np.zeros((v, v), dtype=np.float32)
    a[src, dst] = 1.0
    a[dst, src] = 1.0
    feats = np.random.default_rng(0).normal(size=(v, 8)).astype(np.float32)
    return g, a, feats


def test_spmm_sum_matches_dense(karate):
    g, a, feats = karate
    got = np.asarray(spmm_aggregate(g, feats, op="sum"))
    expected = a.T @ feats  # incoming aggregation
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_spmm_mean_matches_dense(karate):
    g, a, feats = karate
    got = np.asarray(spmm_aggregate(g, feats, op="mean"))
    deg = a.T.sum(1, keepdims=True)
    expected = a.T @ feats / np.maximum(deg, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_spmm_dense_and_sparse_paths_agree(karate, monkeypatch):
    """Karate rides the dense MXU path; forcing it off must not change
    the result (per_v fallback oracle)."""
    import cugraph_tpu.prims.dense_spmm as dsp

    g, a, feats = karate
    dense = np.asarray(spmm_aggregate(g, feats, op="sum"))
    monkeypatch.setattr(dsp, "DENSE_MAX_VERTICES", 0)
    sparse = np.asarray(spmm_aggregate(g, feats, op="sum"))
    np.testing.assert_allclose(dense, sparse, rtol=1e-4, atol=1e-5)


def test_spmm_dense_weighted(karate):
    g, a, feats = karate
    got = np.asarray(spmm_aggregate(g, feats, op="sum", use_weights=True))
    e = g.csc().num_edges
    d = np.asarray(g.csc().majors)[:e]
    s = np.asarray(g.csc().minors)[:e]
    w = np.asarray(g.csc().weights)[:e]
    expected = np.zeros_like(feats)
    np.add.at(expected, d, w[:, None] * feats[s])
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_spmm_max(karate):
    g, a, feats = karate
    got = np.asarray(spmm_aggregate(g, feats, op="max"))
    expected = np.where(
        a.T[:, :, None] > 0, feats[None, :, :], -np.inf
    ).max(axis=1)
    expected = np.where(np.isfinite(expected), expected, 0.0)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_gcn_aggregate_matches_dense(karate):
    g, a, feats = karate
    got = np.asarray(gcn_aggregate(g, feats))
    a_hat = a + np.eye(len(a), dtype=np.float32)
    d = a_hat.sum(1)
    dinv = 1.0 / np.sqrt(d)
    expected = (a_hat * dinv[:, None] * dinv[None, :]).T @ feats
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_graphsage_forward(karate):
    g, a, feats = karate
    model = GraphSAGE(hidden_features=16, out_features=8)
    params = model.init(jax.random.PRNGKey(0), g, feats)
    out = model.apply(params, g, feats)
    assert out.shape == (g.num_vertices, 8)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_gcn_forward_and_grad(karate):
    g, a, feats = karate
    model = GCN(hidden_features=16, out_features=4)
    params = model.init(jax.random.PRNGKey(0), g, feats)

    def loss(p):
        return (model.apply(p, g, feats) ** 2).mean()

    grads = jax.grad(loss)(params)
    leaf_norms = [float(np.abs(x).sum()) for x in jax.tree.leaves(grads)]
    assert all(np.isfinite(leaf_norms))
    assert sum(leaf_norms) > 0


def test_graph_store(karate):
    src, dst, w = karate_edgelist()
    store = GraphStore()
    e_df = pd.DataFrame({"src": src, "dst": dst, "w": w})
    store.add_edge_data(e_df, ("src", "dst"))
    v_ids = np.arange(34)
    v_df = pd.DataFrame(
        {"id": v_ids, "f0": v_ids * 1.0, "f1": v_ids * 2.0}
    )
    store.add_node_data(v_df, "id")
    assert store.num_edges == len(src)
    samp = store.sample_neighbors([0, 1], fanout=3)
    assert len(samp) <= 6
    feats = store.get_node_storage(["f0", "f1"], "").fetch([5, 7])
    np.testing.assert_allclose(np.asarray(feats), [[5.0, 10.0], [7.0, 14.0]])
    sub, vmap = store.egonet(0, k=1)
    assert len(vmap) >= 2


def test_neighbor_loader(karate):
    from cugraph_tpu.gnn import NeighborLoader

    g, a, feats = karate
    seeds = np.arange(20, dtype=np.int32)
    loader = NeighborLoader(g, seeds, [4, 3], batch_size=8, seed=1)
    assert len(loader) == 3
    total_seeds = 0
    for block in loader:
        total_seeds += block.num_seeds
        # seeds occupy compact ids [0, num_seeds)
        np.testing.assert_array_equal(
            block.n_ids[: block.num_seeds], block.seed_ids
        )
        # block edges are real graph edges under the id map
        from cugraph_tpu.core.convert import decompress_to_edgelist

        s, d, _ = decompress_to_edgelist(block.graph)
        gs, gd = block.n_ids[s], block.n_ids[d]
        real = set(
            zip(
                np.asarray(g.csr().majors)[: g.num_edges].tolist(),
                np.asarray(g.csr().minors)[: g.num_edges].tolist(),
            )
        )
        for u, v in zip(gs, gd):
            assert (int(u), int(v)) in real
        # forward pass over the block works
        import jax

        from cugraph_tpu.gnn import GraphSAGE

        x = np.random.default_rng(0).normal(
            size=(block.graph.num_vertices, 4)
        ).astype(np.float32)
        model = GraphSAGE(hidden_features=8, out_features=4)
        params = model.init(jax.random.PRNGKey(0), block.graph, x)
        out = model.apply(params, block.graph, x)
        assert out.shape == (block.graph.num_vertices, 4)
    assert total_seeds == 20


def test_graph_store_dgl_surface(karate):
    """Typed counts, edge storage, find_edges — the CuGraphStore surface
    (ref gnn/graph_store.py:125-148,346,402)."""
    src, dst, w = karate_edgelist()
    store = GraphStore()
    store.add_edge_data(
        pd.DataFrame({"src": src, "dst": dst, "w": w}), ("src", "dst"),
        edge_type="knows",
    )
    v_ids = np.arange(34)
    store.add_node_data(
        pd.DataFrame({"id": v_ids, "f0": v_ids * 1.0}), "id", node_type="person"
    )
    assert store.ntypes == ["person"] and store.etypes == ["knows"]
    assert not store.has_multiple_etypes
    assert store.num_nodes("person") == 34
    assert store.num_edges_dict == {"knows": len(src)}
    assert len(store.get_vertex_ids()) == 34
    s_, d_ = store.find_edges([0, 2], etype="knows")
    assert s_.tolist() == [src[0], src[2]] and d_.tolist() == [dst[0], dst[2]]
    ef = store.get_edge_storage(["w"], "knows").fetch([1, 3])
    np.testing.assert_allclose(np.asarray(ef)[:, 0], [w[1], w[3]], rtol=1e-6)


def test_graph_store_edge_dir_sampling():
    """edge_dir="in" samples edges INTO the seeds (DGL semantics, via the
    reverse adjacency); "out" samples outgoing edges."""
    import pandas as pd

    store = GraphStore()
    df = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [9, 9, 9, 0]})
    store.add_edge_data(df, ["src", "dst"])
    res_in = store.sample_neighbors([9], fanout=-1, edge_dir="in")
    assert set(res_in["sources"]) == {0, 1, 2}
    assert set(res_in["destinations"]) == {9}
    res_out = store.sample_neighbors([3], fanout=-1, edge_dir="out")
    assert set(res_out["sources"]) == {3}
    assert set(res_out["destinations"]) == {0}
    assert store.is_mg is False
    assert store.gdata is store.pg


def test_pyg_store_protocol():
    """PyG remote-backend protocol: edge groups, named tensors, local-id
    neighbor_sample (ref pyg_extensions/data/cugraph_store.py)."""
    import numpy as np

    from cugraph_tpu.gnn import EdgeAttr, PyGStore, TensorAttr, to_pyg

    store = PyGStore()
    src = np.array([0, 1, 2, 3, 0])
    dst = np.array([1, 2, 3, 0, 2])
    assert store.put_edge_index((src, dst), EdgeAttr(edge_type="knows"))
    attrs = store.get_all_edge_attrs()
    assert attrs[0].edge_type == "knows"
    r, c = store.get_edge_index(EdgeAttr(edge_type="knows"))
    assert set(zip(r, c)) == set(zip(src, dst))

    feats = np.arange(8, dtype=np.float32).reshape(4, 2)
    store.put_tensor(feats, TensorAttr(group_name="", attr_name="x"))
    got = np.asarray(store.get_tensor(TensorAttr(group_name="", attr_name="x", index=[2, 0])))
    np.testing.assert_allclose(got, feats[[2, 0]])
    names = {a.attr_name for a in store.get_all_tensor_attrs()}
    assert "x" in names

    row, col, nodes, hop = store.neighbor_sample([0], [2], replace=False)
    assert len(row) == len(col) == len(hop)
    assert row.max(initial=0) < len(nodes) and col.max(initial=0) < len(nodes)

    fs, gs = to_pyg(store.pg)
    assert fs is gs


def test_property_graph_typed_schema_and_vectors():
    """Typed schemas survive concat NaN-promotion; vector properties pack
    columns into one array-valued property (ref __vertex_prop_dtypes,
    vector_properties)."""
    import pandas as pd

    from cugraph_tpu.api.property_graph import PropertyGraph

    pg = PropertyGraph()
    df1 = pd.DataFrame(
        {"v": [0, 1], "age": np.array([3, 4], np.int32),
         "x0": [1.0, 2.0], "x1": [3.0, 4.0]}
    )
    pg.add_vertex_data(
        df1, "v", type_name="person", vector_properties={"emb": ["x0", "x1"]}
    )
    df2 = pd.DataFrame({"v": [2, 3], "score": [0.5, 0.25]})
    pg.add_vertex_data(df2, "v", type_name="item")
    assert pg.vertex_property_dtypes["age"] == np.dtype(np.int32)
    # rows of the other type leave age NaN -> promoted; declared dtype kept
    got = pg.get_vertex_data(types=["person"])
    emb = PropertyGraph.vertex_vector_property_to_array(got, "emb")
    np.testing.assert_allclose(emb, [[1.0, 3.0], [2.0, 4.0]])
    assert "x0" not in pg.vertex_property_names


def test_feature_storage_backends():
    import pandas as pd

    from cugraph_tpu.gnn import GraphStore

    store = GraphStore()
    store.add_node_data(
        pd.DataFrame({"v": [0, 1, 2], "f0": [1.0, 2.0, 3.0],
                      "f1": [4.0, 5.0, 6.0]}),
        "v",
    )
    fs_t = store.get_node_storage(["f0", "f1"], backend_lib="torch")
    t = fs_t.fetch([2, 0])
    import torch

    assert isinstance(t, torch.Tensor)
    np.testing.assert_allclose(t.numpy(), [[3.0, 6.0], [1.0, 4.0]])
    fs_n = store.get_node_storage(["f0"], backend_lib="numpy")
    assert isinstance(fs_n.fetch([1]), np.ndarray)


def test_mg_property_graph_store():
    """MGPropertyGraph extract_subgraph distributes onto the mesh; the
    GNN store samples through the mesh sampler (ref MGPropertyGraph +
    CuGraphStore dask path)."""
    import pandas as pd

    from cugraph_tpu.dist.mg_graph import MGGraph
    from cugraph_tpu.dist.mg_property_graph import MGPropertyGraph
    from cugraph_tpu.gnn import GraphStore

    from cugraph_tpu.dist.mesh import make_mesh

    mesh = make_mesh((2, 2))
    rng = np.random.default_rng(3)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    pg = MGPropertyGraph(mesh)
    pg.add_edge_data(
        pd.DataFrame({"s": src, "d": dst, "w": rng.random(300).astype(np.float32)}),
        ("s", "d"),
    )
    mgg = pg.extract_subgraph(
        check_multi_edges=False, edge_weight_property="w"
    )
    assert isinstance(mgg, MGGraph)
    store = GraphStore(property_graph=pg)
    assert store.is_mg
    out = store.sample_neighbors([0, 1], fanout=3, edge_dir="out")
    edges = set(zip(src.tolist(), dst.tolist()))
    for s_, d_ in zip(out["sources"], out["destinations"]):
        assert (int(s_), int(d_)) in edges
    out_in = store.sample_neighbors([int(dst[0])], fanout=3, edge_dir="in")
    for s_, d_ in zip(out_in["sources"], out_in["destinations"]):
        assert (int(s_), int(d_)) in edges
