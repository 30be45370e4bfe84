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
    """Feature fetch wrapper (ref CuFeatureStorage): returns device arrays."""

    def __init__(self, pg: PropertyGraph, columns: Sequence[str], type_name: str):
        self.pg = pg
        self.columns = list(columns)
        self.type_name = type_name

    def fetch(self, indices) -> jax.Array:
        df = self.pg.get_vertex_data(
            vertex_ids=np.asarray(indices),
            types=[self.type_name] if self.type_name else None,
        )
        df = df.set_index(VERTEX_COL).loc[np.asarray(indices)]
        return jnp.asarray(df[self.columns].to_numpy(dtype=np.float32))


class GraphStore:
    """Node/edge feature store + neighbor sampler (ref CuGraphStore)."""

    def __init__(self, property_graph: Optional[PropertyGraph] = None):
        self.pg = property_graph if property_graph is not None else PropertyGraph()
        self._graph_cache = None

    # ---- data ingestion (ref CuGraphStore.add_node_data/add_edge_data) ---
    def add_node_data(self, df: pd.DataFrame, node_col_name: str, node_type: str = ""):
        self.pg.add_vertex_data(df, node_col_name, type_name=node_type)
        self._graph_cache = None

    def add_edge_data(self, df: pd.DataFrame, vertex_col_names, edge_type: str = ""):
        self.pg.add_edge_data(df, vertex_col_names, type_name=edge_type)
        self._graph_cache = None

    # ---- graph views -----------------------------------------------------
    @property
    def num_vertices(self) -> int:
        return self.pg.get_num_vertices()

    @property
    def num_edges(self) -> int:
        return self.pg.get_num_edges()

    def _algo_graph(self):
        if self._graph_cache is None:
            from ..api.graph import Graph

            self._graph_cache = self.pg.extract_subgraph(
                create_using=Graph(directed=True)
            )
        return self._graph_cache

    # ---- sampling (ref CuGraphStore.sample_neighbors :155) ---------------
    def sample_neighbors(
        self,
        nodes,
        fanout: int = -1,
        with_replacement: bool = False,
        num_hops: int = 1,
        rng_key: Optional[jax.Array] = None,
    ) -> pd.DataFrame:
        g = self._algo_graph()
        res = uniform_neighbor_sample(
            g.core,
            g.to_internal(np.atleast_1d(nodes)),
            [fanout] * num_hops,
            with_replacement=with_replacement,
            rng_key=rng_key,
        )
        return pd.DataFrame(
            {
                "sources": g.to_external(res["sources"]),
                "destinations": g.to_external(res["destinations"]),
                "hop": res["hop"],
            }
        )

    def get_node_storage(self, columns, node_type: str = "") -> FeatureStorage:
        return FeatureStorage(self.pg, columns, node_type)

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
