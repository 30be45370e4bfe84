"""Keyed-aggregation prims — the Louvain substrate.

ref: cpp/src/prims/transform_reduce_e_by_src_dst_key.cuh (keyed segment
reduce -> cluster weight sums) and
per_v_transform_reduce_dst_key_aggregated_outgoing_e.cuh (per-vertex
aggregation of outgoing edges by the *destination's* key — per-neighbor-
cluster weight sums feeding delta-modularity; the reference uses cuco hash
maps + shuffles).

TPU-native formulation: keys are dense ids in [0, num_keys), so
"reduce by key" is a segment reduction — no hash map. For the per-vertex
by-dst-key aggregation we sort edge slots by a fused (src, dst_key) key and
reduce adjacent runs; the sorted-run trick replaces cuco. One
device sort per call (keys change every iteration) — O(E log E) flat XLA
sort, fully vectorized.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from .per_v import _gather
from .reduce_ops import PLUS, ReduceOp
from .transform_e import _edge_args


def _keyed_reduce(
    g: Graph,
    keys_of_edge: jax.Array,
    e_vals: jax.Array,
    num_keys: int,
    valid: jax.Array,
    reduce_op: ReduceOp,
) -> jax.Array:
    seg = jnp.where(valid, keys_of_edge, num_keys)
    ident = reduce_op.identity(e_vals.dtype)
    if e_vals.ndim > 1:
        valid = valid.reshape((-1,) + (1,) * (e_vals.ndim - 1))
    e_vals = jnp.where(valid, e_vals, ident)
    return reduce_op.segment(e_vals, seg, num_segments=num_keys + 1)[:num_keys]


def transform_reduce_e_by_src_key(
    g: Graph,
    src_keys: jax.Array,
    e_op: Callable,
    *,
    num_keys: int,
    reduce_op: ReduceOp = PLUS,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """Reduce e_op per key[src] -> dense (num_keys, ...) array."""
    adj, src_ids, dst_ids = _edge_args(g)
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    e_vals = e_op(src_ids, dst_ids, sv, dv, adj.weights)
    keys = jnp.take(src_keys, src_ids)
    return _keyed_reduce(g, keys, e_vals, num_keys, adj.valid(), reduce_op)


def transform_reduce_e_by_dst_key(
    g: Graph,
    dst_keys: jax.Array,
    e_op: Callable,
    *,
    num_keys: int,
    reduce_op: ReduceOp = PLUS,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """Reduce e_op per key[dst] -> dense (num_keys, ...) array."""
    adj, src_ids, dst_ids = _edge_args(g)
    sv = _gather(src_values, src_ids)
    dv = _gather(dst_values, dst_ids)
    e_vals = e_op(src_ids, dst_ids, sv, dv, adj.weights)
    keys = jnp.take(dst_keys, dst_ids)
    return _keyed_reduce(g, keys, e_vals, num_keys, adj.valid(), reduce_op)


def aggregate_outgoing_e_by_dst_key(
    g: Graph, dst_keys: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Aggregate outgoing edge weights by (src, key[dst]) runs.

    Returns (srcs, keys, agg_weight, run_valid), all shaped (e_pad,):
    slots where run_valid is True are the unique (src, dst_key) pairs with
    their total edge weight; other slots are don't-care. This is the dense
    replacement for the reference's cuco-hash-map keyed aggregation; the
    run layout supports multi-pass reductions (e.g. Louvain's argmax over
    delta-modularity).
    """
    adj = g.csr()
    e_pad = adj.e_pad
    src_ids = adj.majors
    key_ids = jnp.take(dst_keys, jnp.minimum(adj.minors, dst_keys.shape[0] - 1))
    valid = adj.valid()
    w = adj.edge_weights_or_ones()
    # Sort by dst_key (stable), then stable sort by src restores grouping
    # (src asc, key asc within src). Padding (src == V) lands at the tail.
    order1 = jnp.argsort(key_ids, stable=True)
    s1, k1, w1, v1 = (
        src_ids[order1],
        key_ids[order1],
        w[order1],
        valid[order1],
    )
    order2 = jnp.argsort(s1, stable=True)
    s2, k2, w2, v2 = s1[order2], k1[order2], w1[order2], v1[order2]
    # run boundaries over (src, key)
    first = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (s2[1:] != s2[:-1]) | (k2[1:] != k2[:-1]),
        ]
    )
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    agg = jax.ops.segment_sum(
        jnp.where(v2, w2, 0.0), run_id, num_segments=e_pad, indices_are_sorted=True
    )
    run_valid = first & v2
    slot_agg = jnp.take(agg, run_id)
    return s2, k2, slot_agg, run_valid


def per_v_transform_reduce_dst_key_aggregated_outgoing_e(
    g: Graph,
    dst_keys: jax.Array,
    kv_op: Callable,
    *,
    reduce_op: ReduceOp,
    init: Any = None,
) -> jax.Array:
    """For each vertex: aggregate outgoing edge weights by dst's key, then
    transform each (vertex, key, aggregated_weight) triple with kv_op and
    reduce per vertex (ref prim of the same name).

    kv_op(src_ids, key_ids, agg_weight, run_valid) -> per-run value.
    """
    s2, k2, slot_agg, run_valid = aggregate_outgoing_e_by_dst_key(g, dst_keys)
    vals = kv_op(s2, k2, slot_agg, run_valid)
    ident = reduce_op.identity(vals.dtype)
    vals = jnp.where(run_valid, vals, ident)
    seg = jnp.where(run_valid, s2, g.num_vertices)
    out = reduce_op.segment(vals, seg, num_segments=g.num_vertices + 1)[
        : g.num_vertices
    ]
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out
