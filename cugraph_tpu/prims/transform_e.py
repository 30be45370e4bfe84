"""Whole-edge-set prims: transform_reduce_e, count_if_e, transform_e, extract_if_e.

ref: cpp/src/prims/transform_reduce_e.cuh (616 LoC),
count_if_e.cuh, extract_if_e.cuh. The MG versions end in a host scalar
allreduce; here the scalar stays on device (psum inside the distributed
wrapper) — no host round trip.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from .per_v import _gather
from .reduce_ops import PLUS, ReduceOp


def _edge_args(g: Graph):
    # Prefer the out-adjacency; fall back to in-adjacency.
    adj = g.out_adj if g.out_adj is not None else g.in_adj
    if adj is g.out_adj:
        src_ids, dst_ids = adj.majors, adj.minors
    else:
        src_ids, dst_ids = adj.minors, adj.majors
    return adj, src_ids, dst_ids


def transform_e(
    g: Graph,
    e_op: Callable,
    *,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """Per-edge transform -> (E_pad, ...) array aligned with the edge slots."""
    adj, src_ids, dst_ids = _edge_args(g)
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    return e_op(src_ids, dst_ids, sv, dv, adj.weights)


def transform_reduce_e(
    g: Graph,
    e_op: Callable,
    *,
    reduce_op: ReduceOp = PLUS,
    init: Any = None,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """Reduce e_op over ALL edges -> scalar (ref transform_reduce_e.cuh).

    Used for modularity (common_methods.cuh), dangling sums, etc."""
    adj, src_ids, dst_ids = _edge_args(g)
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    e_vals = e_op(src_ids, dst_ids, sv, dv, adj.weights)
    ident = reduce_op.identity(e_vals.dtype)
    valid = adj.valid()
    if e_vals.ndim > 1:
        valid = valid.reshape((-1,) + (1,) * (e_vals.ndim - 1))
    e_vals = jnp.where(valid, e_vals, ident)
    axes = 0  # reduce the edge axis only; feature axes survive
    if reduce_op is PLUS:
        out = jnp.sum(e_vals, axis=axes)
    else:
        out = jax.lax.reduce(
            e_vals, ident, reduce_op.combine, dimensions=(0,)
        )
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out


def count_if_e(
    g: Graph,
    pred_op: Callable,
    *,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """Count edges satisfying a predicate (ref count_if_e.cuh)."""

    def e_op(s, d, sv, dv, w):
        return pred_op(s, d, sv, dv, w).astype(jnp.int32)

    return transform_reduce_e(
        g, e_op, reduce_op=PLUS, src_values=src_values, dst_values=dst_values
    )


def extract_if_e(
    g: Graph,
    pred_op: Callable,
    *,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """Boolean keep-mask over edge slots (ref extract_if_e.cuh).

    TPU formulation: the ragged extracted edge list becomes a fixed-shape
    mask over the padded edge array; consumers compose masks instead of
    compacting buffers.
    """
    adj, src_ids, dst_ids = _edge_args(g)
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    keep = pred_op(src_ids, dst_ids, sv, dv, adj.weights)
    return keep & adj.valid()
