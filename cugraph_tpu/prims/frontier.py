"""Frontier push prim — the BFS/SSSP/WCC/core-number workhorse.

ref: cpp/src/prims/transform_reduce_v_frontier_outgoing_e_by_dst.cuh (:337
public API; sort_and_reduce :143-196) +
detail/extract_transform_v_frontier_e.cuh + update_v_frontier.cuh +
vertex_frontier.cuh.

TPU-native formulation: the reference keeps ragged frontier buffers and
sorts/reduces emitted (dst, payload) pairs. Under XLA everything must be
static-shape, so the frontier is a dense boolean mask over vertices and the
"emit + reduce by dst" becomes a masked edge-centric segment reduction —
dst vertex ids ARE dense in [0, V), so reduce-by-key needs no sort at all
(SURVEY.md §7 "consider reduce-by-scatter-add ... instead of sort"). Each
push costs O(E) gather/segment-reduce work rather than O(frontier edges); on TPU
the flat, perfectly-vectorizable O(E) pass at full HBM bandwidth beats a
ragged work-efficient pass for the low-diameter graphs this framework
targets, and the whole traversal loop stays inside one lax.while_loop with
no host round trips (the reference pays a host allreduce per level,
vertex_frontier.cuh aggregate_size).

The e_op returns (keep, payload): keep is a per-edge bool, payload the
pushed value.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from .per_v import _gather
from .reduce_ops import ReduceOp


def transform_reduce_v_frontier_outgoing_e_by_dst(
    g: Graph,
    frontier_mask: jax.Array,
    e_op: Callable,
    *,
    reduce_op: ReduceOp,
    src_values: Any = None,
    dst_values: Any = None,
) -> Tuple[jax.Array, jax.Array]:
    """Push along outgoing edges of frontier vertices; reduce payloads by dst.

    Returns (touched, reduced):
      touched: (V,) bool — dst received at least one payload
      reduced: (V, ...) — reduce_op over payloads (identity where untouched)
    """
    adj = g.csr()
    src_ids, dst_ids = adj.majors, adj.minors
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    keep, payload = e_op(src_ids, dst_ids, sv, dv, adj.weights)
    active = jnp.take(frontier_mask, jnp.minimum(src_ids, g.num_vertices - 1))
    keep = keep & active & adj.valid()

    num_seg = g.num_vertices + 1
    seg_ids = jnp.where(keep, dst_ids, g.num_vertices)
    ident = reduce_op.identity(payload.dtype)
    if payload.ndim > 1:
        keep_b = keep.reshape((-1,) + (1,) * (payload.ndim - 1))
    else:
        keep_b = keep
    payload = jnp.where(keep_b, payload, ident)
    reduced = reduce_op.segment(payload, seg_ids, num_segments=num_seg)[
        : g.num_vertices
    ]
    touched = (
        jax.ops.segment_max(
            keep.astype(jnp.int32), seg_ids, num_segments=num_seg
        )[: g.num_vertices]
        > 0
    )
    return touched, reduced


def update_v_frontier(
    touched: jax.Array,
    reduced: jax.Array,
    values: Any,
    v_op: Callable,
) -> Tuple[jax.Array, Any]:
    """Apply pushed payloads to vertex state; compute the next frontier.

    ref: update_v_frontier.cuh. v_op(touched, reduced, values) ->
    (next_frontier_mask, new_values). Provided as a naming shim so algorithm
    code mirrors the reference's structure; it is pure elementwise.
    """
    return v_op(touched, reduced, values)
