"""Link prediction: Jaccard / Sorensen / Overlap (+ weighted variants, + cosine).

ref: cpp/src/link_prediction/similarity_impl.cuh (unified similarity_t
functor :72) and jaccard/sorensen/overlap_impl.cuh; legacy pair-list
variants in python wrappers.

Pairs default to the endpoints of every edge (the reference's default
"one-hop" pair set). All coefficients derive from one intersection pass
(prims/intersection.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.csr import Graph
from ..core.convert import decompress_to_edgelist
from ..prims.intersection import per_v_pair_dst_nbr_intersection
from ..utils.dtypes import WEIGHT_DTYPE
from ..utils.error import expects


def _default_pairs(g: Graph) -> Tuple[jax.Array, jax.Array]:
    src, dst, _ = decompress_to_edgelist(g)
    if g.is_symmetric:
        keep = src < dst
        src, dst = src[keep], dst[keep]
    return jnp.asarray(src), jnp.asarray(dst)


def _similarity(
    g: Graph,
    pairs: Optional[Tuple[jax.Array, jax.Array]],
    kind: str,
    use_weight: bool,
):
    expects(g.is_symmetric, f"{kind} requires a symmetric graph")
    if pairs is None:
        v1, v2 = _default_pairs(g)
    else:
        v1 = jnp.asarray(pairs[0], jnp.int32)
        v2 = jnp.asarray(pairs[1], jnp.int32)
    max_deg = int(jnp.max(g.out_degrees())) if g.num_edges else 1
    if use_weight:
        expects(g.weighted, "weighted similarity requires edge weights")
        # weighted variants (ref similarity_impl.cuh weighted path):
        # vertex weight w_x = sum of x's incident edge weights; a pair's
        # intersection weight = sum of w_x over common neighbors, and each
        # endpoint's "size" = sum of w_x over its own neighborhood — so the
        # union in the denominator is size(u) + size(v) - intersection.
        vw = g.out_weight_sums()
        inter, wsum = per_v_pair_dst_nbr_intersection(
            g, v1, v2, max_degree=max(max_deg, 1), vertex_weights=vw
        )
        from ..prims.per_v import per_v_transform_reduce_outgoing_e

        nbr_wsum = per_v_transform_reduce_outgoing_e(
            g, lambda s, d, sv, dv, w: dv, dst_values=vw
        )
        a = jnp.take(nbr_wsum, v1)
        b = jnp.take(nbr_wsum, v2)
        inter_f = wsum
    else:
        inter, _ = per_v_pair_dst_nbr_intersection(
            g, v1, v2, max_degree=max(max_deg, 1)
        )
        deg = g.out_degrees().astype(WEIGHT_DTYPE)
        a = jnp.take(deg, v1)
        b = jnp.take(deg, v2)
        inter_f = inter.astype(WEIGHT_DTYPE)

    if kind == "jaccard":
        denom = a + b - inter_f
    elif kind == "sorensen":
        denom = a + b
        inter_f = 2.0 * inter_f
    elif kind == "overlap":
        denom = jnp.minimum(a, b)
    elif kind == "cosine":
        denom = jnp.sqrt(a * b)
    else:
        raise ValueError(kind)
    coeff = jnp.where(denom > 0, inter_f / jnp.maximum(denom, 1e-30), 0.0)
    return v1, v2, coeff


def jaccard(g: Graph, pairs=None, use_weight: bool = False):
    """Jaccard coefficients. Returns (v1, v2, coeff)."""
    return _similarity(g, pairs, "jaccard", use_weight)


def sorensen(g: Graph, pairs=None, use_weight: bool = False):
    return _similarity(g, pairs, "sorensen", use_weight)


def overlap(g: Graph, pairs=None, use_weight: bool = False):
    return _similarity(g, pairs, "overlap", use_weight)


def cosine(g: Graph, pairs=None, use_weight: bool = False):
    return _similarity(g, pairs, "cosine", use_weight)


def all_pairs_similarity(
    g: Graph, kind: str = "jaccard", topk: Optional[int] = None
):
    """Similarity over all two-hop pairs (legacy all-pairs API).

    Host-enumerates the two-hop pair set then runs the device kernel."""
    from .traversal import two_hop_neighbors

    v1, v2 = two_hop_neighbors(g)
    if g.is_symmetric:
        keep = v1 < v2
        v1, v2 = v1[keep], v2[keep]
    v1j, v2j, coeff = _similarity(g, (jnp.asarray(v1), jnp.asarray(v2)), kind, False)
    if topk is not None:
        idx = jnp.argsort(-coeff)[: int(topk)]
        return v1j[idx], v2j[idx], coeff[idx]
    return v1j, v2j, coeff
