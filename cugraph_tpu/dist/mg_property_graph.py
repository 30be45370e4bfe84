"""MGPropertyGraph: property tables whose extracted subgraphs are
mesh-backed (2D-partitioned MGGraph).

ref: python/cugraph/cugraph/dask/structure/mg_property_graph.py
(EXPERIMENTAL__MGPropertyGraph :52 — the dask_cudf twin of PropertyGraph
whose extract_subgraph builds a distributed graph). Single-controller
redesign: the long-format pandas tables are identical to the SG
PropertyGraph (they are metadata-sized); only the EDGE STORAGE of an
extracted subgraph is distributed — extract_subgraph shuffles the selected
edge list onto the mesh via the chunked two-pass ingest, so the graph
payload never has to fit a single device.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..api.property_graph import (
    DST_COL,
    EDGE_ID_COL,
    SRC_COL,
    TYPE_COL,
    PropertyGraph,
    PropertySelection,
)
from ..utils.error import expects
from .mg_graph import MGGraph, distribute_edgelist_chunks


class MGPropertyGraph(PropertyGraph):
    """PropertyGraph whose extract_subgraph returns an MGGraph on `mesh`.

    Property-table verbs (add_vertex_data/add_edge_data/get_*/select_*)
    are inherited unchanged — the reference's MGPropertyGraph mirrors the
    SG surface exactly (mg_property_graph.py:146-1182)."""

    def __init__(self, mesh, chunk_edges: int = 1 << 20):
        super().__init__()
        self.mesh = mesh
        self.chunk_edges = int(chunk_edges)

    def is_mg(self) -> bool:  # parity hook for the GNN stores
        return True

    def extract_subgraph(
        self,
        create_using=None,
        selection=None,
        edge_weight_property: Optional[str] = None,
        default_edge_weight: Optional[float] = None,
        check_multi_edges: bool = True,
        renumber_graph: bool = True,
        add_edge_data: bool = True,
        edge_types=None,
        reverse: bool = False,
    ) -> MGGraph:
        """Selected edges -> mesh-distributed MGGraph (chunk-streamed
        ingest; peak host memory ∝ one chunk + this host's slabs). Vertex
        ids must already be integers (use renumber_vertices_by_type or an
        external NumberMap for arbitrary ids). The renumber map and the
        annotated edge data are exposed as mgg.edge_data when
        add_edge_data=True."""
        expects(self._edge_df is not None, "no edge data")
        df = self._edge_df
        if edge_types is not None:
            df = df[df[TYPE_COL].isin(edge_types)]
        if selection is not None and not isinstance(
            selection, PropertySelection
        ):
            selection = PropertySelection(edge_selection=selection)
        if selection is not None:
            if selection.edge_selections is not None:
                df = df[
                    selection.edge_selections.reindex(
                        df.index, fill_value=False
                    )
                ]
            if selection.vertex_selections is not None:
                from ..api.property_graph import VERTEX_COL

                chosen = set(
                    self._vertex_df.loc[
                        selection.vertex_selections, VERTEX_COL
                    ]
                )
                df = df[df[SRC_COL].isin(chosen) & df[DST_COL].isin(chosen)]
        if check_multi_edges:
            expects(
                not self.has_duplicate_edges(df),
                "selection yields a multigraph; pass check_multi_edges=False",
            )
        src = df[SRC_COL].to_numpy()
        dst = df[DST_COL].to_numpy()
        expects(
            np.issubdtype(src.dtype, np.integer)
            and np.issubdtype(dst.dtype, np.integer),
            "MGPropertyGraph.extract_subgraph needs integer vertex ids",
        )
        w = None
        if edge_weight_property is not None:
            expects(
                edge_weight_property in df.columns,
                f"graph has no edge property {edge_weight_property!r}",
            )
            wcol = df[edge_weight_property]
            if default_edge_weight is not None:
                wcol = wcol.fillna(default_edge_weight)
            w = wcol.to_numpy().astype(np.float32)
        elif default_edge_weight is not None:
            w = np.full(len(src), default_edge_weight, np.float32)
        num_vertices = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
        step = self.chunk_edges

        if reverse:  # transposed storage (edge_dir="in" sampling)
            src, dst = dst, src

        def chunks():
            for o in range(0, len(src), step):
                yield (
                    src[o : o + step],
                    dst[o : o + step],
                    None if w is None else w[o : o + step],
                )

        mgg = distribute_edgelist_chunks(
            self.mesh, chunks, num_vertices=num_vertices
        )
        if add_edge_data:
            object.__setattr__(
                mgg,
                "edge_data",
                df[[SRC_COL, DST_COL, EDGE_ID_COL, TYPE_COL]].reset_index(
                    drop=True
                ),
            )
        return mgg
