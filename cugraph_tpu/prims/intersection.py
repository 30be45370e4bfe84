"""Neighbor-list intersection prims — Jaccard/Sorensen/overlap + triangles.

ref: cpp/src/prims/per_v_pair_transform_dst_nbr_intersection.cuh (+
detail/nbr_intersection.cuh, 1,352 LoC) and
transform_reduce_dst_nbr_intersection_of_e_endpoints_by_v.cuh.

TPU-native formulation: adjacency lists are sorted (construction sorts by
(major, minor)), so "x in N(v)" is a vectorized binary search over the
minor array restricted to v's offset range. Pair intersection materializes
a (num_pairs, max_degree) candidate tile from the first endpoint and probes
the second — flat, mask-padded, MXU/VPU-friendly. Triangle counting probes
from a degree-oriented DAG so the tile width is the oriented max degree
(O(sqrt(E))-ish), the standard work bound.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import CompressedAdj, Graph


def _contains_sorted(
    minors: jax.Array, lo: jax.Array, hi: jax.Array, query: jax.Array
) -> jax.Array:
    """Vectorized binary search: is query present in minors[lo:hi]?

    minors is sorted within each [lo, hi) segment. All args broadcastable.
    """
    import math

    n_steps = max(math.ceil(math.log2(max(int(minors.shape[0]), 2))) + 1, 1)
    shape = jnp.broadcast_shapes(lo.shape, hi.shape, query.shape)
    lo = jnp.broadcast_to(lo, shape).astype(jnp.int32)
    hi0 = jnp.broadcast_to(hi, shape).astype(jnp.int32)

    def body(_, state):
        lo_, hi_ = state  # invariant: answer in [lo_, hi_)
        mid = (lo_ + hi_) // 2
        mid_val = jnp.take(minors, jnp.clip(mid, 0, minors.shape[0] - 1))
        go_right = mid_val < query
        active = lo_ < hi_
        lo_ = jnp.where(go_right & active, mid + 1, lo_)
        hi_ = jnp.where(~go_right & active, mid, hi_)
        return lo_, hi_

    lo_f, _ = jax.lax.fori_loop(0, n_steps, body, (lo, hi0))
    found_val = jnp.take(minors, jnp.clip(lo_f, 0, minors.shape[0] - 1))
    return (lo_f < hi0) & (found_val == query)


def _candidate_tile(
    adj: CompressedAdj, verts: jax.Array, width: int
) -> Tuple[jax.Array, jax.Array]:
    """(N, width) tile of the first `width` neighbors of each vertex + mask."""
    starts = jnp.take(adj.offsets, verts)
    degs = jnp.take(adj.offsets, verts + 1) - starts
    slot = jnp.arange(width, dtype=jnp.int32)[None, :]
    mask = slot < degs[:, None]
    eidx = jnp.clip(starts[:, None] + slot, 0, adj.e_pad - 1)
    cand = jnp.take(adj.minors, eidx)
    return cand, mask


def per_v_pair_dst_nbr_intersection(
    g: Graph,
    v1: jax.Array,
    v2: jax.Array,
    *,
    max_degree: int,
    vertex_weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """|N(v1) ∩ N(v2)| per pair; optionally sum of vertex_weights over it.

    max_degree must be >= the true max out-degree (static tile width).
    Returns (counts (P,), weight_sums (P,)|None).
    """
    adj = g.csr()
    cand, mask = _candidate_tile(adj, v1, max_degree)
    lo2 = jnp.take(adj.offsets, v2)[:, None]
    hi2 = jnp.take(adj.offsets, v2 + 1)[:, None]
    member = _contains_sorted(adj.minors, lo2, hi2, cand) & mask
    counts = jnp.sum(member, axis=1).astype(jnp.int32)
    wsums = None
    if vertex_weights is not None:
        wv = jnp.take(vertex_weights, jnp.clip(cand, 0, g.num_vertices - 1))
        wsums = jnp.sum(jnp.where(member, wv, 0.0), axis=1)
    return counts, wsums


def triangle_counts_per_vertex(
    oriented: CompressedAdj,
    num_vertices: int,
    *,
    max_oriented_degree: int,
) -> jax.Array:
    """Per-vertex triangle counts from a degree-oriented DAG adjacency.

    For each oriented edge (u -> v), common out-neighbors x of u and v close
    a triangle {u, v, x}; each of u, v, x gets +1. The orientation guarantees
    each triangle is found exactly once
    (ref semantics: transform_reduce_dst_nbr_intersection_of_e_endpoints_by_v).
    """
    srcs = oriented.majors  # (e_pad,)
    dsts = oriented.minors
    valid = oriented.valid()
    cand, mask = _candidate_tile(oriented, jnp.minimum(srcs, num_vertices - 1), max_oriented_degree)
    lo2 = jnp.take(oriented.offsets, jnp.minimum(dsts, num_vertices - 1))[:, None]
    hi2 = jnp.take(oriented.offsets, jnp.minimum(dsts, num_vertices - 1) + 1)[:, None]
    member = _contains_sorted(oriented.minors, lo2, hi2, cand) & mask & valid[:, None]
    tri_per_edge = jnp.sum(member, axis=1).astype(jnp.int32)
    nseg = num_vertices + 1
    counts = jax.ops.segment_sum(
        tri_per_edge, jnp.where(valid, srcs, num_vertices), num_segments=nseg
    )
    counts = counts + jax.ops.segment_sum(
        tri_per_edge, jnp.where(valid, dsts, num_vertices), num_segments=nseg
    )
    # the third corner: scatter one per matched candidate
    x_ids = jnp.where(member, cand, num_vertices)
    counts = counts + jax.ops.segment_sum(
        member.astype(jnp.int32).ravel(), x_ids.ravel(), num_segments=nseg
    )
    return counts[:num_vertices]
