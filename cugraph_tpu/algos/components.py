"""Connected components: WCC (prims-based) and SCC (host path).

ref: cpp/src/components/weakly_connected_components_impl.cuh (frontier-push
label hooking) and components/legacy/scc_matrix.cuh.

TPU-native WCC: min-label propagation with pointer jumping. Labels are
candidate component ids (vertex ids); each round pushes min labels across
edges (both directions for directed graphs) and then short-circuits chains
with label[v] <- label[label[v]], giving near-logarithmic convergence —
the shortcut plays the role of the reference's hooking grandparent jumps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.csr import Graph
from ..prims.per_v import per_v_transform_reduce_incoming_e, per_v_transform_reduce_outgoing_e
from ..prims.reduce_ops import MINIMUM


@partial(jax.jit, static_argnames=())
def _wcc_jit(g: Graph):
    v = g.num_vertices
    labels0 = jnp.arange(v, dtype=jnp.int32)

    def min_nbr_label(labels):
        def e_src(s, d, sv, dv, w):
            return sv  # push src label to dst

        out = per_v_transform_reduce_incoming_e(
            g, e_src, reduce_op=MINIMUM, src_values=labels
        )
        def e_dst(s, d, sv, dv, w):
            return dv  # pull dst label to src

        out2 = per_v_transform_reduce_outgoing_e(
            g, e_dst, reduce_op=MINIMUM, dst_values=labels
        )
        return jnp.minimum(out, out2)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = jnp.minimum(labels, min_nbr_label(labels))
        # pointer jumping: labels are vertex ids, chase two levels
        new = jnp.take(new, new)
        new = jnp.take(new, new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def weakly_connected_components(g: Graph) -> jax.Array:
    """Component label per vertex (the min vertex id in the component).

    ref: weakly_connected_components_impl.cuh."""
    return _wcc_jit(g)


def strongly_connected_components(g: Graph) -> jax.Array:
    """SCC labels.

    HOST FALLBACK: scipy's Tarjan on host, not the TPU (the reference's
    SCC is likewise a legacy single-GPU side path,
    components/legacy/scc_matrix.cuh); O(V+E) host memory/time."""
    import scipy.sparse as sp

    from ..core.convert import decompress_to_edgelist

    src, dst, _ = decompress_to_edgelist(g)
    v = g.num_vertices
    m = sp.coo_matrix(
        (np.ones(len(src), dtype=np.int8), (src, dst)), shape=(v, v)
    ).tocsr()
    _, raw = sp.csgraph.connected_components(m, directed=True, connection="strong")
    # normalize: label = min vertex id in the component (matches WCC contract)
    first = np.full(raw.max() + 1, v, dtype=np.int32)
    np.minimum.at(first, raw, np.arange(v, dtype=np.int32))
    return jnp.asarray(first[raw])
