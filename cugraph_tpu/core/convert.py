"""Structure transforms: decompress, transpose, relabel, induced subgraph.

ref: cpp/src/structure/{decompress_to_edgelist, transpose_graph*,
relabel_impl.cuh, induced_subgraph_impl.cuh} and graph_functions.hpp:430,474.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..utils.dtypes import NP_VERTEX_DTYPE
from .csr import CompressedAdj, Graph, from_edgelist


def decompress_to_edgelist(
    g: Graph,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """CSR -> COO (src, dst, weight) on host.

    ref: graph_view.hpp:778-782 decompress_to_edgelist."""
    adj = g.out_adj if g.out_adj is not None else g.in_adj
    e = adj.num_edges
    majors = np.asarray(adj.majors[:e])
    minors = np.asarray(adj.minors[:e])
    w = None if adj.weights is None else np.asarray(adj.weights[:e])
    if adj is g.out_adj:
        return majors, minors, w
    return minors, majors, w


def transpose(g: Graph) -> Graph:
    """Reverse every edge. ref: transpose_graph_impl."""
    src, dst, w = decompress_to_edgelist(g)
    return from_edgelist(
        dst, src, w, num_vertices=g.num_vertices, is_symmetric=g.is_symmetric
    )


def relabel(g: Graph, old_to_new: np.ndarray) -> Graph:
    """Relabel vertex ids by a permutation map. ref: relabel_impl.cuh."""
    src, dst, w = decompress_to_edgelist(g)
    old_to_new = np.asarray(old_to_new, dtype=NP_VERTEX_DTYPE)
    return from_edgelist(
        old_to_new[src],
        old_to_new[dst],
        w,
        num_vertices=g.num_vertices,
        is_symmetric=g.is_symmetric,
    )


def induced_subgraph(
    g: Graph, vertices: np.ndarray, relabel_result: bool = True
) -> Tuple[Graph, np.ndarray]:
    """Subgraph induced by a vertex subset.

    Returns (subgraph, vertex_map) where vertex_map[i] is the original id of
    subgraph vertex i (when relabel_result) — analog of
    extract_induced_subgraphs (graph_functions.hpp:474) for one subgraph.
    """
    vertices = np.unique(np.asarray(vertices, dtype=NP_VERTEX_DTYPE))
    member = np.zeros(g.num_vertices, dtype=bool)
    member[vertices] = True
    src, dst, w = decompress_to_edgelist(g)
    keep = member[src] & member[dst]
    src, dst = src[keep], dst[keep]
    if w is not None:
        w = w[keep]
    if relabel_result:
        old_to_new = np.full(g.num_vertices, -1, dtype=NP_VERTEX_DTYPE)
        old_to_new[vertices] = np.arange(len(vertices), dtype=NP_VERTEX_DTYPE)
        src, dst = old_to_new[src], old_to_new[dst]
        nv = len(vertices)
    else:
        nv = g.num_vertices
    sub = from_edgelist(
        src, dst, w, num_vertices=nv, is_symmetric=g.is_symmetric
    )
    return sub, vertices
