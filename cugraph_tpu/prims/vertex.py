"""Vertex-array prims: transform_reduce_v, reduce_v, count_if_v.

ref: cpp/src/prims/{transform_reduce_v.cuh, reduce_v.cuh, count_if_v.cuh}.
Thin wrappers over jnp reductions so algorithm code reads like the
reference's and the distributed versions can swap in psum-merged variants.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from .reduce_ops import PLUS, ReduceOp


def transform_reduce_v(
    g: Graph,
    v_op: Callable[[jax.Array, Any], jax.Array],
    values: Any = None,
    *,
    reduce_op: ReduceOp = PLUS,
    init: Any = None,
) -> jax.Array:
    """reduce(v_op(vertex_ids, values)) over all vertices."""
    ids = jnp.arange(g.num_vertices, dtype=jnp.int32)
    vals = v_op(ids, values)
    if reduce_op is PLUS:
        out = jnp.sum(vals, axis=0)
    else:
        out = jax.lax.reduce(
            vals, reduce_op.identity(vals.dtype), reduce_op.combine, dimensions=(0,)
        )
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out


def reduce_v(
    g: Graph, values: jax.Array, *, reduce_op: ReduceOp = PLUS, init: Any = None
) -> jax.Array:
    return transform_reduce_v(
        g, lambda ids, v: v, values, reduce_op=reduce_op, init=init
    )


def count_if_v(g: Graph, pred_op: Callable, values: Any = None) -> jax.Array:
    return transform_reduce_v(
        g, lambda ids, v: pred_op(ids, v).astype(jnp.int32), values
    )
