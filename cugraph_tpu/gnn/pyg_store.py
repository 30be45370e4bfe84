"""PyG remote-backend protocol over PropertyGraph (framework-neutral).

ref: python/cugraph/cugraph/gnn/pyg_extensions/data/cugraph_store.py —
CuGraphEdgeAttr (:36), CuGraphTensorAttr (:96), EXPERIMENTAL__CuGraphStore
(:165: get/put_edge_index, get_all_edge_attrs, neighbor_sample :432,
put_tensor/create_named_tensor :590-605, get_tensor/_get_tensor :678,
get_all_tensor_attrs :650, multi_get_tensor, to_pyg :73).

TPU-native: the same protocol shape (PyG's FeatureStore/GraphStore remote
backend) backed by PropertyGraph + the JAX sampling substrate; tensors
come back as jax Arrays instead of torch tensors — wrap in
dlpack/torch at the framework boundary if needed. No torch_geometric
dependency is required to use it.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..api.property_graph import DST_COL, SRC_COL, PropertyGraph

_UNSET = object()


class EdgeLayout(Enum):
    COO = "coo"
    CSC = "csc"
    CSR = "csr"


@dataclasses.dataclass
class EdgeAttr:
    """GraphStore edge-group descriptor (ref CuGraphEdgeAttr :36)."""

    edge_type: Optional[Any]
    layout: EdgeLayout = EdgeLayout.COO
    is_sorted: bool = False
    size: Optional[Tuple[int, int]] = None

    def __post_init__(self):
        self.layout = EdgeLayout(self.layout)

    @classmethod
    def cast(cls, *args, **kwargs):
        if len(args) == 1 and not kwargs:
            elem = args[0]
            if elem is None or isinstance(elem, cls):
                return elem
            if isinstance(elem, (tuple, list)):
                return cls(*elem)
            if isinstance(elem, dict):
                return cls(**elem)
        return cls(*args, **kwargs)


@dataclasses.dataclass
class TensorAttr:
    """FeatureStore tensor descriptor (ref CuGraphTensorAttr :96)."""

    group_name: Any = _UNSET
    attr_name: Any = _UNSET
    index: Any = _UNSET
    properties: Any = _UNSET
    dtype: Any = _UNSET

    def is_set(self, key) -> bool:
        if key not in self.__dataclass_fields__:
            raise KeyError(key)
        return getattr(self, key) is not _UNSET

    def is_fully_specified(self) -> bool:
        return all(self.is_set(k) for k in self.__dataclass_fields__)

    def fully_specify(self):
        for k in self.__dataclass_fields__:
            if not self.is_set(k):
                setattr(self, k, None)
        return self

    def update(self, attr: "TensorAttr"):
        for k in self.__dataclass_fields__:
            if attr.is_set(k):
                setattr(self, k, getattr(attr, k))

    @classmethod
    def cast(cls, *args, **kwargs):
        if len(args) == 1 and not kwargs:
            elem = args[0]
            if elem is None or isinstance(elem, cls):
                return elem
            if isinstance(elem, (tuple, list)):
                return cls(*elem)
            if isinstance(elem, dict):
                return cls(**elem)
        return cls(*args, **kwargs)


class PyGStore:
    """FeatureStore + GraphStore protocol over one PropertyGraph
    (ref EXPERIMENTAL__CuGraphStore :165).

    backend_lib selects the tensor type get_tensor delivers: "jax"
    (device arrays, default), "torch" (zero-copy via dlpack where
    possible — what a torch_geometric loader consumes), or "numpy"."""

    def __init__(
        self, pg: Optional[PropertyGraph] = None, backend_lib: str = "jax"
    ):
        self.pg = pg if pg is not None else PropertyGraph()
        self.backend_lib = backend_lib
        self._tensor_attrs: Dict[Tuple[str, str], TensorAttr] = {}
        self._graph_cache = None

    def _deliver(self, arr):
        if self.backend_lib == "jax":
            return arr
        if self.backend_lib == "numpy":
            return np.asarray(arr)
        if self.backend_lib == "torch":
            import torch

            try:
                return torch.utils.dlpack.from_dlpack(arr.__dlpack__())
            except Exception:
                return torch.from_numpy(np.asarray(arr))
        raise ValueError(f"unknown backend_lib {self.backend_lib!r}")

    # ---- GraphStore side --------------------------------------------------
    def put_edge_index(self, edge_index, edge_attr) -> bool:
        """Register a COO edge group (ref :266 raises — we accept COO)."""
        attr = EdgeAttr.cast(edge_attr)
        if attr.layout != EdgeLayout.COO:
            raise ValueError("only COO layout is supported for ingestion")
        src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
        df = pd.DataFrame({"src": src, "dst": dst})
        self.pg.add_edge_data(
            df, ("src", "dst"), type_name=attr.edge_type or ""
        )
        self._graph_cache = None
        return True

    def get_edge_index(self, *args, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
        """COO (row, col) arrays of an edge group (ref :275/:366)."""
        attr = EdgeAttr.cast(*args, **kwargs)
        types = [attr.edge_type] if attr.edge_type else None
        df = self.pg.get_edge_data(types=types)
        if df is None or not len(df):
            raise KeyError(f"no edges of type {attr.edge_type!r}")
        return df[SRC_COL].to_numpy(), df[DST_COL].to_numpy()

    def get_all_edge_attrs(self) -> List[EdgeAttr]:
        out = []
        for t in self.pg.edge_types or [""]:
            n = self.pg.get_num_edges(t) if t else self.pg.get_num_edges()
            if n:
                v = self.pg.get_num_vertices()
                out.append(
                    EdgeAttr(edge_type=t or None, layout=EdgeLayout.COO, size=(v, v))
                )
        return out

    # ---- FeatureStore side ------------------------------------------------
    def put_tensor(self, tensor, attr) -> bool:
        """Store vertex features as PropertyGraph columns (ref :590)."""
        attr = TensorAttr.cast(attr)
        arr = np.asarray(tensor)
        idx = (
            np.asarray(attr.index)
            if attr.is_set("index") and attr.index is not None
            else np.arange(arr.shape[0])
        )
        cols = (
            list(attr.properties)
            if attr.is_set("properties") and attr.properties
            else [f"{attr.attr_name}_{i}" for i in range(arr.shape[1])]
        )
        df = pd.DataFrame({c: arr[:, i] for i, c in enumerate(cols)})
        df["__vid"] = idx
        self.pg.add_vertex_data(df, "__vid", type_name=attr.group_name or "")
        self.create_named_tensor(
            attr.attr_name, cols, attr.group_name or "", arr.dtype
        )
        return True

    def create_named_tensor(
        self, attr_name: str, properties: Sequence[str], vertex_type: str, dtype
    ) -> None:
        """Name a group of property columns as one tensor (ref :593)."""
        self._tensor_attrs[(vertex_type, attr_name)] = TensorAttr(
            group_name=vertex_type,
            attr_name=attr_name,
            properties=list(properties),
            dtype=dtype,
        )

    def get_all_tensor_attrs(self) -> List[TensorAttr]:
        return [dataclasses.replace(a) for a in self._tensor_attrs.values()]

    def get_tensor(self, *args, **kwargs):
        attr = TensorAttr.cast(*args, **kwargs)
        named = self._tensor_attrs.get((attr.group_name or "", attr.attr_name))
        props = (
            attr.properties
            if attr.is_set("properties") and attr.properties
            else (named.properties if named else None)
        )
        if props is None:
            raise KeyError(f"unknown tensor {attr.attr_name!r}")
        types = [attr.group_name] if attr.group_name else None
        df = self.pg.get_vertex_data(
            vertex_ids=(
                np.asarray(attr.index)
                if attr.is_set("index") and attr.index is not None
                else None
            ),
            types=types,
        )
        from ..api.property_graph import VERTEX_COL

        if attr.is_set("index") and attr.index is not None:
            df = df.set_index(VERTEX_COL).loc[np.asarray(attr.index)]
        dtype = (
            attr.dtype
            if attr.is_set("dtype") and attr.dtype is not None
            else (named.dtype if named and named.dtype is not None else np.float32)
        )
        return self._deliver(jnp.asarray(df[list(props)].to_numpy(dtype=dtype)))

    def multi_get_tensor(self, attrs):
        return [self.get_tensor(a) for a in attrs]

    def remove_tensor(self, attr) -> bool:
        attr = TensorAttr.cast(attr)
        return (
            self._tensor_attrs.pop((attr.group_name or "", attr.attr_name), None)
            is not None
        )

    # ---- sampling (ref neighbor_sample :432) --------------------------------
    def neighbor_sample(
        self,
        index,
        num_neighbors: Sequence[int],
        replace: bool = False,
        directed: bool = True,
        rng_key=None,
    ):
        """Returns (row, col, node_ids, hop) in LOCAL ids over the sampled
        node set, PyG remote-backend style (ref :432-490's noi/row/col
        renumbering)."""
        from ..api.graph import Graph
        from ..sampling.uniform_neighbor_sample import uniform_neighbor_sample

        if self._graph_cache is None:
            self._graph_cache = self.pg.extract_subgraph(
                create_using=Graph(directed=True)
            )
        g = self._graph_cache
        res = uniform_neighbor_sample(
            g.core,
            g.to_internal(np.atleast_1d(index)),
            list(num_neighbors),
            with_replacement=replace,
            rng_key=rng_key,
        )
        srcs = np.asarray(res["sources"])
        dsts = np.asarray(res["destinations"])
        seeds = np.asarray(g.to_internal(np.atleast_1d(index)))
        # seeds with no sampled edges must still be in the node set (the
        # loader fetches features for every input seed)
        nodes = np.unique(np.concatenate([seeds, srcs, dsts]))
        local = {int(v): i for i, v in enumerate(nodes)}
        row = np.array([local[int(v)] for v in srcs], dtype=np.int64)
        col = np.array([local[int(v)] for v in dsts], dtype=np.int64)
        return row, col, g.to_external(nodes), np.asarray(res["hop"])


def to_pyg(G, backend_lib: str = "jax") -> Tuple[PyGStore, PyGStore]:
    """(feature_store, graph_store) pair for PyG remote-backend loaders —
    the same object serves both protocols (ref EXPERIMENTAL__to_pyg :73).
    backend_lib="torch" delivers torch tensors from the feature side."""
    store = PyGStore(
        G if isinstance(G, PropertyGraph) else None, backend_lib=backend_lib
    )
    return store, store
