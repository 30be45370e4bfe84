"""GNN graph/feature store over PropertyGraph + the sampling substrate.

ref: python/cugraph/cugraph/gnn/graph_store.py (CuGraphStore :30 —
node/edge feature storage over PropertyGraph, sample_neighbors :155 via
uniform_neighbor_sample, CuFeatureStorage :402 dlpack->torch/tf) and the
PyG remote-backend protocols (gnn/pyg_extensions/data/cugraph_store.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..api.property_graph import (
    DST_COL,
    SRC_COL,
    TYPE_COL,
    VERTEX_COL,
    PropertyGraph,
)
from ..sampling.uniform_neighbor_sample import uniform_neighbor_sample
from ..utils.error import expects


class FeatureStorage:
    """Feature fetch wrapper (ref CuFeatureStorage, gnn/graph_store.py:402):
    returns framework tensors per backend_lib.

    storage_type "node": indices are vertex ids; "edge": edge ids.
    backend_lib: "jax" (device arrays, default), "torch" (zero-copy via
    dlpack, the reference's DGL/PyG delivery path), or "numpy"."""

    def __init__(
        self,
        pg: PropertyGraph,
        columns: Sequence[str],
        type_name: str,
        storage_type: str = "node",
        backend_lib: str = "jax",
    ):
        self.pg = pg
        self.columns = list(columns)
        self.type_name = type_name
        self.storage_type = storage_type
        self.backend_lib = backend_lib

    def _deliver(self, arr: jax.Array):
        if self.backend_lib == "jax":
            return arr
        if self.backend_lib == "numpy":
            return np.asarray(arr)
        if self.backend_lib == "torch":
            import torch

            try:  # zero-copy when the consumer shares the device space
                return torch.utils.dlpack.from_dlpack(arr.__dlpack__())
            except Exception:
                return torch.from_numpy(np.asarray(arr))
        raise ValueError(f"unknown backend_lib {self.backend_lib!r}")

    def fetch(self, indices) -> jax.Array:
        types = [self.type_name] if self.type_name else None
        idx = np.asarray(indices)
        if self.storage_type == "edge":
            from ..api.property_graph import EDGE_ID_COL

            df = self.pg.get_edge_data(edge_ids=idx, types=types)
            df = df.set_index(EDGE_ID_COL).loc[idx]
        else:
            df = self.pg.get_vertex_data(vertex_ids=idx, types=types)
            df = df.set_index(VERTEX_COL).loc[idx]
        if len(self.columns) == 1 and df[self.columns[0]].dtype == object:
            # vector property: stack the packed rows
            mat = PropertyGraph._vector_to_array(df, self.columns[0])
            return self._deliver(jnp.asarray(mat.astype(np.float32)))
        return self._deliver(
            jnp.asarray(df[self.columns].to_numpy(dtype=np.float32))
        )


class GraphStore:
    """Node/edge feature store + neighbor sampler (ref CuGraphStore)."""

    def __init__(self, property_graph: Optional[PropertyGraph] = None):
        self.pg = property_graph if property_graph is not None else PropertyGraph()
        self._graph_cache = None

    # ---- data ingestion (ref CuGraphStore.add_node_data/add_edge_data) ---
    def add_node_data(self, df: pd.DataFrame, node_col_name: str, node_type: str = ""):
        self.pg.add_vertex_data(df, node_col_name, type_name=node_type)
        self._graph_cache = None
        self._rev_core = None
        self._mgg_fwd = self._mgg_rev = None

    def add_edge_data(self, df: pd.DataFrame, vertex_col_names, edge_type: str = ""):
        self.pg.add_edge_data(df, vertex_col_names, type_name=edge_type)
        self._graph_cache = None
        self._rev_core = None
        self._mgg_fwd = self._mgg_rev = None

    # ---- graph views (ref CuGraphStore :125-148, :320-326) -----------------
    @property
    def num_vertices(self) -> int:
        return self.pg.get_num_vertices()

    @property
    def num_edges(self) -> int:
        return self.pg.get_num_edges()

    def num_nodes(self, ntype: Optional[str] = None) -> int:
        return self.pg.get_num_vertices(ntype)

    def num_edges_of(self, etype: Optional[str] = None) -> int:
        return self.pg.get_num_edges(etype)

    @property
    def ntypes(self):
        return self.pg.vertex_types

    @property
    def etypes(self):
        return self.pg.edge_types

    @property
    def has_multiple_etypes(self) -> bool:
        return len(self.pg.edge_types) > 1

    @property
    def num_nodes_dict(self) -> Dict[str, int]:
        return {t: self.pg.get_num_vertices(t) for t in self.pg.vertex_types}

    @property
    def num_edges_dict(self) -> Dict[str, int]:
        return {t: self.pg.get_num_edges(t) for t in self.pg.edge_types}

    def get_vertex_ids(self) -> np.ndarray:
        return np.asarray(self.pg.get_vertices())

    def find_edges(self, edge_ids, etype: Optional[str] = None):
        """(src, dst) endpoint arrays for the given edge ids
        (ref CuGraphStore.find_edges :346)."""
        from ..api.property_graph import EDGE_ID_COL

        df = self.pg.get_edge_data(
            edge_ids=np.asarray(edge_ids),
            types=[etype] if etype else None,
        )
        df = df.set_index(EDGE_ID_COL).loc[np.asarray(edge_ids)]
        return df[SRC_COL].to_numpy(), df[DST_COL].to_numpy()

    def _algo_graph(self):
        if self._graph_cache is None:
            from ..api.graph import Graph

            self._graph_cache = self.pg.extract_subgraph(
                create_using=Graph(directed=True)
            )
        return self._graph_cache

    @property
    def is_mg(self) -> bool:
        """True when the backing tables are an MGPropertyGraph — sampling
        then runs on the mesh (ref CuGraphStore.is_mg)."""
        return bool(getattr(self.pg, "is_mg", lambda: False)())

    @property
    def gdata(self):
        """The backing PropertyGraph (ref CuGraphStore.gdata :148)."""
        return self.pg

    # ---- sampling (ref CuGraphStore.sample_neighbors :155) ---------------
    def sample_neighbors(
        self,
        nodes,
        fanout: int = -1,
        with_replacement: bool = False,
        num_hops: int = 1,
        edge_dir: str = "in",
        rng_key: Optional[jax.Array] = None,
    ) -> pd.DataFrame:
        """edge_dir "in": sample edges INTO the seed nodes (DGL default,
        via the reverse adjacency — ref extracted_reverse_subgraph :287);
        "out": sample outgoing edges. MG-backed stores route to the
        mesh sampler (ref CuGraphStore's dask path)."""
        if self.is_mg:
            return self._sample_neighbors_mg(
                nodes, fanout, with_replacement, num_hops, edge_dir, rng_key
            )
        g = self._algo_graph()
        sample_g = g.core
        if edge_dir == "in":
            from ..core.convert import transpose

            if getattr(self, "_rev_core", None) is None:
                self._rev_core = transpose(g.core)
            sample_g = self._rev_core
        res = uniform_neighbor_sample(
            sample_g,
            g.to_internal(np.atleast_1d(nodes)),
            [fanout] * num_hops,
            with_replacement=with_replacement,
            rng_key=rng_key,
        )
        if edge_dir == "in":  # un-reverse the reported edges
            res = dict(
                res,
                sources=res["destinations"],
                destinations=res["sources"],
            )
        return pd.DataFrame(
            {
                "sources": g.to_external(res["sources"]),
                "destinations": g.to_external(res["destinations"]),
                "hop": res["hop"],
            }
        )

    def _sample_neighbors_mg(
        self, nodes, fanout, with_replacement, num_hops, edge_dir, rng_key
    ) -> pd.DataFrame:
        from ..utils.error import expects
        from ..dist import mg_sampling

        expects(fanout > 0, "MG sampling needs fanout > 0")
        rev = edge_dir == "in"
        cache = "_mgg_rev" if rev else "_mgg_fwd"
        mgg = getattr(self, cache, None)
        if mgg is None:
            mgg = self.pg.extract_subgraph(
                check_multi_edges=False, reverse=rev
            )
            setattr(self, cache, mgg)
        res = mg_sampling.mg_uniform_neighbor_sample(
            self.pg.mesh,
            mgg,
            np.atleast_1d(nodes),
            [fanout] * num_hops,
            with_replacement=with_replacement,
            rng_key=rng_key,
        )
        s, d = res["sources"], res["destinations"]
        if rev:
            s, d = d, s
        return pd.DataFrame(
            {"sources": s, "destinations": d, "hop": res["hop"]}
        )

    def get_node_storage(
        self, columns, node_type: str = "", backend_lib: str = "jax"
    ) -> FeatureStorage:
        return FeatureStorage(
            self.pg, columns, node_type, storage_type="node",
            backend_lib=backend_lib,
        )

    def get_edge_storage(
        self, columns, edge_type: str = "", backend_lib: str = "jax"
    ) -> FeatureStorage:
        """Edge-feature fetch by edge id (ref CuGraphStore.get_edge_storage)."""
        return FeatureStorage(
            self.pg, columns, edge_type, storage_type="edge",
            backend_lib=backend_lib,
        )

    def node_subgraph(self, nodes):
        """Induced subgraph over a node subset (ref CuGraphStore helpers)."""
        from ..core.convert import induced_subgraph

        g = self._algo_graph()
        sub, vmap = induced_subgraph(g.core, g.to_internal(np.asarray(nodes)))
        return sub, g.to_external(vmap)

    def egonet(self, node, k: int = 1):
        from ..algos.community import ego_graph

        g = self._algo_graph()
        sub, vmap = ego_graph(g.core, int(g.to_internal(np.atleast_1d(node))[0]), k)
        return sub, g.to_external(vmap)
