"""Core number + k-core.

ref: cpp/src/cores/core_number_impl.cuh (frontier peeling :227-235) and
k_core_impl.cuh.

TPU-native: dense parallel peeling inside lax.while_loop — at level k,
repeatedly drop alive vertices whose residual degree <= k until stable,
assigning them core number k. The doubly-nested ragged frontier of the
reference collapses to two nested while_loops over dense masks.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from ..prims.per_v import per_v_transform_reduce_outgoing_e
from ..utils.error import expects


@partial(jax.jit, static_argnames=("degree_type",))
def _core_number_jit(g: Graph, degree_type: str):
    v = g.num_vertices

    def residual_degree(alive):
        def e_op(s, d, sv, dv, w):
            return dv.astype(jnp.int32)  # count alive dst endpoints

        out = jnp.zeros(v, dtype=jnp.int32)
        if degree_type in ("outgoing", "incoming_outgoing"):
            out = out + per_v_transform_reduce_outgoing_e(
                g, e_op, dst_values=alive
            )
        if degree_type in ("incoming", "incoming_outgoing"):
            from ..prims.per_v import per_v_transform_reduce_incoming_e

            def e_in(s, d, sv, dv, w):
                return sv.astype(jnp.int32)

            out = out + per_v_transform_reduce_incoming_e(
                g, e_in, src_values=alive
            )
        return out

    def outer_cond(state):
        alive, core, k = state
        return jnp.any(alive)

    def outer_body(state):
        alive, core, k = state

        def inner_cond(s):
            alive_i, _, changed = s
            return changed

        def inner_body(s):
            alive_i, core_i, _ = s
            deg = residual_degree(alive_i)
            drop = alive_i & (deg <= k)
            core_i = jnp.where(drop, k, core_i)
            return alive_i & ~drop, core_i, jnp.any(drop)

        alive, core, _ = jax.lax.while_loop(
            inner_cond, inner_body, (alive, core, jnp.bool_(True))
        )
        return alive, core, k + 1

    alive0 = jnp.ones(v, dtype=bool)
    core0 = jnp.zeros(v, dtype=jnp.int32)
    _, core, _ = jax.lax.while_loop(
        outer_cond, outer_body, (alive0, core0, jnp.int32(0))
    )
    return core


def core_number(g: Graph, degree_type: str = "incoming_outgoing") -> jax.Array:
    """Core number per vertex (ref core_number_impl.cuh; degree_type as in
    the C API: incoming / outgoing / incoming_outgoing).

    Note the reference requires a symmetric graph; on symmetric graphs
    incoming_outgoing counts each undirected edge twice, matching cuGraph
    (whose default k-core uses in+out degrees)."""
    expects(
        degree_type in ("incoming", "outgoing", "incoming_outgoing"),
        f"invalid degree_type {degree_type!r}",
    )
    return _core_number_jit(g, degree_type)


def k_core(g: Graph, k: int, core_numbers=None, degree_type: str = "incoming_outgoing"):
    """Extract the k-core subgraph. Returns (subgraph, vertex_map).

    ref: k_core_impl.cuh (core_number + extract)."""
    import numpy as np

    from ..core.convert import induced_subgraph

    if core_numbers is None:
        core_numbers = core_number(g, degree_type)
    keep = np.nonzero(np.asarray(core_numbers) >= k)[0]
    return induced_subgraph(g, keep)
