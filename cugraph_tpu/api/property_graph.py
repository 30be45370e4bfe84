"""PropertyGraph: typed vertex/edge property tables over pandas, feeding
algorithm graphs and GNN feature stores.

ref: python/cugraph/cugraph/structure/property_graph.py (1,383 LoC:
add_vertex_data, add_edge_data, get_vertex_data, get_edge_data,
extract_subgraph, select_vertices/edges).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from ..utils.error import expects
from .graph import Graph

TYPE_COL = "_TYPE_"
VERTEX_COL = "_VERTEX_"
SRC_COL = "_SRC_"
DST_COL = "_DST_"
EDGE_ID_COL = "_EDGE_ID_"


class PropertyGraph:
    def __init__(self):
        self._vertex_df: Optional[pd.DataFrame] = None
        self._edge_df: Optional[pd.DataFrame] = None
        self._next_edge_id = 0

    # ---- ingestion -------------------------------------------------------
    def add_vertex_data(
        self,
        df: pd.DataFrame,
        vertex_col_name: str,
        type_name: str = "",
        property_columns: Optional[List[str]] = None,
    ) -> None:
        cols = property_columns or [
            c for c in df.columns if c != vertex_col_name
        ]
        chunk = df[[vertex_col_name] + cols].rename(
            columns={vertex_col_name: VERTEX_COL}
        )
        chunk[TYPE_COL] = type_name
        self._vertex_df = (
            chunk
            if self._vertex_df is None
            else pd.concat([self._vertex_df, chunk], ignore_index=True)
        )

    def add_edge_data(
        self,
        df: pd.DataFrame,
        vertex_col_names,
        type_name: str = "",
        property_columns: Optional[List[str]] = None,
    ) -> None:
        s, d = vertex_col_names
        cols = property_columns or [c for c in df.columns if c not in (s, d)]
        chunk = df[[s, d] + cols].rename(columns={s: SRC_COL, d: DST_COL})
        chunk[TYPE_COL] = type_name
        chunk[EDGE_ID_COL] = np.arange(
            self._next_edge_id, self._next_edge_id + len(chunk)
        )
        self._next_edge_id += len(chunk)
        self._edge_df = (
            chunk
            if self._edge_df is None
            else pd.concat([self._edge_df, chunk], ignore_index=True)
        )

    # ---- introspection ---------------------------------------------------
    @property
    def vertex_types(self) -> List[str]:
        if self._vertex_df is None:
            return []
        return sorted(self._vertex_df[TYPE_COL].unique().tolist())

    @property
    def edge_types(self) -> List[str]:
        if self._edge_df is None:
            return []
        return sorted(self._edge_df[TYPE_COL].unique().tolist())

    def get_num_vertices(self) -> int:
        ids = set()
        if self._vertex_df is not None:
            ids |= set(self._vertex_df[VERTEX_COL])
        if self._edge_df is not None:
            ids |= set(self._edge_df[SRC_COL]) | set(self._edge_df[DST_COL])
        return len(ids)

    def get_num_edges(self) -> int:
        return 0 if self._edge_df is None else len(self._edge_df)

    def get_vertex_data(
        self, vertex_ids=None, types=None, columns=None
    ) -> pd.DataFrame:
        expects(self._vertex_df is not None, "no vertex data")
        df = self._vertex_df
        if vertex_ids is not None:
            df = df[df[VERTEX_COL].isin(list(np.asarray(vertex_ids)))]
        if types is not None:
            df = df[df[TYPE_COL].isin(types)]
        if columns is not None:
            df = df[[VERTEX_COL, TYPE_COL] + list(columns)]
        return df.reset_index(drop=True)

    def get_edge_data(self, edge_ids=None, types=None, columns=None) -> pd.DataFrame:
        expects(self._edge_df is not None, "no edge data")
        df = self._edge_df
        if edge_ids is not None:
            df = df[df[EDGE_ID_COL].isin(list(np.asarray(edge_ids)))]
        if types is not None:
            df = df[df[TYPE_COL].isin(types)]
        if columns is not None:
            df = df[[SRC_COL, DST_COL, EDGE_ID_COL, TYPE_COL] + list(columns)]
        return df.reset_index(drop=True)

    # ---- graph extraction ------------------------------------------------
    def extract_subgraph(
        self,
        create_using: Optional[Graph] = None,
        edge_types=None,
        edge_weight_property: Optional[str] = None,
        selection: Optional[pd.Series] = None,
    ) -> Graph:
        """Build an algorithm Graph from (a selection of) the edge table
        (ref: PropertyGraph.extract_subgraph)."""
        expects(self._edge_df is not None, "no edge data")
        df = self._edge_df
        if edge_types is not None:
            df = df[df[TYPE_COL].isin(edge_types)]
        if selection is not None:
            df = df[selection]
        g = create_using if create_using is not None else Graph(directed=True)
        edgelist = pd.DataFrame(
            {"source": df[SRC_COL], "destination": df[DST_COL]}
        )
        attr = None
        if edge_weight_property is not None:
            edgelist["weight"] = df[edge_weight_property].to_numpy()
            attr = "weight"
        g.from_pandas_edgelist(edgelist, edge_attr=attr)
        return g

    def select_edges(self, expr: str) -> pd.Series:
        """Boolean mask over the edge table via DataFrame.eval."""
        return self._edge_df.eval(expr)

    def select_vertices(self, expr: str) -> pd.Series:
        return self._vertex_df.eval(expr)

    def annotate_dataframe(self, df, G, edge_vertex_col_names=(SRC_COL, DST_COL)):
        """Join edge properties back onto an edge dataframe."""
        s, d = edge_vertex_col_names
        return df.merge(
            self._edge_df,
            left_on=[s, d],
            right_on=[SRC_COL, DST_COL],
            how="left",
        )
