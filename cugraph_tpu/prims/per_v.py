"""per_v_transform_reduce_{incoming,outgoing}_e — the SpMV/SpMM generalized prim.

For every vertex, reduce an edge operator over its incoming (or outgoing)
edges. PageRank, Katz, HITS, eigenvector and GNN mean-aggregation all reduce
to this (ref: cpp/src/prims/per_v_transform_reduce_incoming_outgoing_e.cuh,
public API :1082,:1144).

TPU-native formulation: instead of the reference's four degree-segment
kernels (hypersparse/low/mid/high, :84-560), we run edge-centric
gather -> e_op -> sorted segment-reduce. XLA lowers a sorted segment_sum to
a vectorized scan-scatter; the degree-sorted renumbering (renumber.py)
keeps segments contiguous and heavy rows together. A Pallas CSR kernel can
replace the segment reduce for the hot f32 SpMV path without changing this
API (see prims/pallas/).

The e_op is a vectorized function of per-edge arrays:
    e_op(src_ids, dst_ids, src_value, dst_value, weight) -> per-edge value
where src_value/dst_value are the gathered per-vertex inputs (pytrees
allowed; None if not supplied) and weight is None for unweighted graphs.
Values may be (E,) or (E, F) — feature matrices ride the same path (SpMM).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..core.csr import CompressedAdj, Graph
from .reduce_ops import PLUS, ReduceOp


def _gather(values: Any, ids: jax.Array) -> Any:
    if values is None:
        return None
    return jax.tree.map(lambda a: jnp.take(a, ids, axis=0), values)


def _reduce_by_major(
    adj: CompressedAdj,
    e_values: jax.Array,
    reduce_op: ReduceOp,
    init: Any,
) -> jax.Array:
    num_seg = adj.num_majors + 1  # extra bucket swallows padding slots
    out = reduce_op.segment(
        e_values, adj.majors, num_segments=num_seg, indices_are_sorted=True
    )[: adj.num_majors]
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out


def _per_v_transform_reduce(
    adj: CompressedAdj,
    majors_are_dst: bool,
    e_op: Callable,
    reduce_op: ReduceOp,
    init: Any,
    src_values: Any,
    dst_values: Any,
) -> jax.Array:
    majors, minors = adj.majors, adj.minors
    if majors_are_dst:
        src_ids, dst_ids = minors, majors
    else:
        src_ids, dst_ids = majors, minors
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    e_vals = e_op(src_ids, dst_ids, sv, dv, adj.weights)
    # Mask padding slots to the identity so non-finite e_op outputs on the
    # (arbitrary-valued) padding can never leak NaNs into XLA reductions.
    ident = reduce_op.identity(e_vals.dtype)
    valid = adj.valid()
    if e_vals.ndim > 1:
        valid = valid.reshape((-1,) + (1,) * (e_vals.ndim - 1))
    e_vals = jnp.where(valid, e_vals, ident)
    return _reduce_by_major(adj, e_vals, reduce_op, init)


def per_v_transform_reduce_incoming_e(
    g: Graph,
    e_op: Callable,
    *,
    reduce_op: ReduceOp = PLUS,
    init: Any = None,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """out[v] = reduce_op(init, e_op over incoming edges of v).

    The pull primitive (ref :1082); PageRank's hot loop
    (pagerank_impl.cuh:248)."""
    return _per_v_transform_reduce(
        g.csc(), True, e_op, reduce_op, init, src_values, dst_values
    )


def per_v_transform_reduce_outgoing_e(
    g: Graph,
    e_op: Callable,
    *,
    reduce_op: ReduceOp = PLUS,
    init: Any = None,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """out[v] = reduce_op(init, e_op over outgoing edges of v) (ref :1144)."""
    return _per_v_transform_reduce(
        g.csr(), False, e_op, reduce_op, init, src_values, dst_values
    )
