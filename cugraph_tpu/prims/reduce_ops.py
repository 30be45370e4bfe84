"""Reduction monoids for the prims layer.

Analog of the reference's reduce_op library (ref: cpp/src/prims/reduce_op.cuh
— plus/minimum/maximum/any with identity_element and the
compatible_raft_comms_op -> NCCL mapping). Here each op carries its segment
reduction (XLA segment_* lowers to sorted-scatter on TPU) and, for the
distributed path, the name of the matching jax.lax collective.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ReduceOp:
    name: str
    # identity element for a given dtype
    identity: Callable[[jnp.dtype], jax.Array]
    # pairwise combine
    combine: Callable[[jax.Array, jax.Array], jax.Array]
    # segment reduction: (data, segment_ids, num_segments, indices_are_sorted)
    segment: Callable[..., jax.Array]
    # jax.lax collective used to merge partial results across mesh axes
    collective: str  # "psum" | "pmin" | "pmax"


def _ident(value):
    def f(dtype):
        return jnp.asarray(value, dtype=dtype)

    return f


def _ident_min(dtype):
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf, dtype=dtype)
    return jnp.asarray(jnp.iinfo(dtype).max, dtype=dtype)


def _ident_max(dtype):
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(-jnp.inf, dtype=dtype)
    return jnp.asarray(jnp.iinfo(dtype).min, dtype=dtype)


PLUS = ReduceOp(
    name="plus",
    identity=_ident(0),
    combine=lambda a, b: a + b,
    segment=jax.ops.segment_sum,
    collective="psum",
)

MINIMUM = ReduceOp(
    name="minimum",
    identity=_ident_min,
    combine=jnp.minimum,
    segment=jax.ops.segment_min,
    collective="pmin",
)

MAXIMUM = ReduceOp(
    name="maximum",
    identity=_ident_max,
    combine=jnp.maximum,
    segment=jax.ops.segment_max,
    collective="pmax",
)

# "any": return an arbitrary contributing value (ref reduce_op::any, used by
# BFS for predecessors). We pick the minimum for determinism — a strictly
# stronger guarantee than the reference's.
ANY = dataclasses.replace(MINIMUM, name="any")

LOGICAL_OR = ReduceOp(
    name="logical_or",
    identity=_ident(False),
    combine=jnp.logical_or,
    segment=lambda d, s, num_segments, indices_are_sorted=False: jax.ops.segment_max(
        d.astype(jnp.int32), s, num_segments, indices_are_sorted=indices_are_sorted
    ).astype(jnp.bool_),
    collective="pmax",
)
