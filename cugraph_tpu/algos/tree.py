"""Minimum/maximum spanning tree.

ref: cpp/src/tree/mst.cu (81 LoC — delegates to raft's MST solver; a thin
side path in the reference). Host path via scipy's C implementation,
returning the tree as an edgelist like the reference's Python wrapper.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp

from ..core.csr import Graph
from ..core.convert import decompress_to_edgelist
from ..utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE
from ..utils.error import expects


def _spanning_tree(g: Graph, maximum: bool) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    expects(g.is_symmetric, "spanning tree requires a symmetric graph")
    src, dst, w = decompress_to_edgelist(g)
    if w is None:
        w = np.ones(len(src), dtype=NP_WEIGHT_DTYPE)
    sign = -1.0 if maximum else 1.0
    v = g.num_vertices
    m = sp.coo_matrix((sign * w.astype(np.float64), (src, dst)), shape=(v, v)).tocsr()
    t = sp.csgraph.minimum_spanning_tree(m).tocoo()
    return (
        t.row.astype(NP_VERTEX_DTYPE),
        t.col.astype(NP_VERTEX_DTYPE),
        (sign * t.data).astype(NP_WEIGHT_DTYPE),
    )


def minimum_spanning_tree(g: Graph):
    """Returns (src, dst, weight) arrays of the MST/forest edges.

    HOST FALLBACK: scipy's MST on host, not the TPU (the reference
    delegates to raft::mst the same way)."""
    return _spanning_tree(g, maximum=False)


def maximum_spanning_tree(g: Graph):
    return _spanning_tree(g, maximum=True)
