"""Edgelist symmetrization / de-duplication.

ref: cpp/src/structure/symmetrize_edgelist_impl.cuh (557 LoC) and the Python
``structure/symmetrize.py``. Host-side numpy — this is ingest ETL.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE


def coalesce_edgelist_np(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    reduce: str = "sum",
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Merge parallel (src,dst) duplicates, reducing weights (sum/min/max)."""
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if weight is not None:
        weight = weight[order]
    keep = np.ones(len(src), dtype=bool)
    keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    group = np.cumsum(keep) - 1
    usrc, udst = src[keep], dst[keep]
    if weight is None:
        return usrc.astype(NP_VERTEX_DTYPE), udst.astype(NP_VERTEX_DTYPE), None
    n = int(group[-1]) + 1 if len(group) else 0
    if reduce == "sum":
        w = np.zeros(n, dtype=NP_WEIGHT_DTYPE)
        np.add.at(w, group, weight)
    elif reduce == "min":
        w = np.full(n, np.inf, dtype=NP_WEIGHT_DTYPE)
        np.minimum.at(w, group, weight)
    elif reduce == "max":
        w = np.full(n, -np.inf, dtype=NP_WEIGHT_DTYPE)
        np.maximum.at(w, group, weight)
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    return usrc.astype(NP_VERTEX_DTYPE), udst.astype(NP_VERTEX_DTYPE), w


def symmetrize_edgelist_np(
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    multi: bool = False,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Union each edge with its reciprocal; coalesce duplicates unless multi.

    Matches the reference's symmetrize-by-union semantics
    (symmetrize_edgelist_impl.cuh); self-loops are not duplicated.
    """
    loops = src == dst
    s2 = np.concatenate([src, dst[~loops]])
    d2 = np.concatenate([dst, src[~loops]])
    w2 = None if weight is None else np.concatenate([weight, weight[~loops]])
    if multi:
        return (
            s2.astype(NP_VERTEX_DTYPE),
            d2.astype(NP_VERTEX_DTYPE),
            None if w2 is None else w2.astype(NP_WEIGHT_DTYPE),
        )
    # reciprocal duplicates keep one copy (min-weight, matching the default
    # reciprocal-edge resolution); unique edges keep their weight.
    return coalesce_edgelist_np(s2, d2, w2, reduce="min")
