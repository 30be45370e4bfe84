"""Graph coarsening/contraction: relabel vertices by cluster, merge edges.

ref: cpp/src/structure/coarsen_graph_impl.cuh (653 LoC), used by Louvain
(louvain_impl.cuh:224 via graph_contraction, common_methods.hpp:85).

Host-side numpy: Louvain's outer dendrogram loop changes the graph size per
level, which is inherently dynamic-shape — the reference also re-allocates a
new graph per level. The per-level inner sweeps run on device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE
from .csr import Graph, from_edgelist
from .convert import decompress_to_edgelist
from .symmetrize import coalesce_edgelist_np


def coarsen_graph(g: Graph, labels: np.ndarray) -> Tuple[Graph, np.ndarray]:
    """Contract g by vertex labels; parallel edges merge with summed weights.

    Returns (coarse_graph, cluster_ids) where cluster_ids[i] is the original
    label of coarse vertex i. Self-loops (intra-cluster edges) are kept —
    Louvain's modularity needs them.
    """
    labels = np.asarray(labels)
    uniq, compact = np.unique(labels, return_inverse=True)
    compact = compact.astype(NP_VERTEX_DTYPE)
    src, dst, w = decompress_to_edgelist(g)
    if w is None:
        w = np.ones(len(src), dtype=NP_WEIGHT_DTYPE)
    csrc, cdst = compact[src], compact[dst]
    csrc, cdst, cw = coalesce_edgelist_np(csrc, cdst, w, reduce="sum")
    coarse = from_edgelist(
        csrc, cdst, cw, num_vertices=len(uniq), is_symmetric=g.is_symmetric
    )
    return coarse, uniq.astype(NP_VERTEX_DTYPE)
