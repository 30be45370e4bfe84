"""Dense-adjacency SpMM for small vertex sets — the MXU fast path.

For V up to a few thousand (the regime of GNN minibatch blocks produced by
neighbor sampling: batch x fanout^hops vertices), materializing the dense
(V, V) adjacency once per graph and aggregating with a single MXU matmul
beats every sparse formulation by orders of magnitude: the matmul runs at
MXU speed (~100 T MAC/s) while any sparse path pays per-edge data-movement
at VPU/HBM rates. Crossover analysis in docs/PERFORMANCE.md.

Role parity: this is the TPU answer to the low-degree/full-block tier of
the reference's degree-segmented dispatch
(cpp/src/prims/per_v_transform_reduce_incoming_outgoing_e.cuh:84-560) for
the GNN consumers (reference delegates those to DGL/PyG block kernels).

The dense adjacency is built host-side once per (graph, direction,
weighting) and cached, mirroring prims/pallas/spmv2.sorted_layout_for.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# V threshold: (V, V) f32 = 64 MB at 4096; MACs V^2*F stay microseconds.
DENSE_MAX_VERTICES = 8192

_DENSE_CACHE: dict = {}


def dense_adj_for(
    graph,
    *,
    use_weights: bool = False,
    direction: str = "in",
    max_vertices: Optional[int] = None,
) -> Optional[jax.Array]:
    """Dense (V, V) adjacency for MXU aggregation, or None if too large.

    direction "in": A[dst, src] = w so that A @ X sums incoming neighbor
    rows into each destination (multi-edges accumulate, matching the
    segment-sum semantics of per_v_transform_reduce_incoming_e)."""
    if max_vertices is None:
        max_vertices = DENSE_MAX_VERTICES
    v = graph.num_vertices
    if v == 0 or v > max_vertices:
        return None
    adj = graph.csc() if direction == "in" else graph.csr()
    if isinstance(adj.majors, jax.core.Tracer):
        return None
    key = (id(adj.majors), direction, use_weights)
    hit = _DENSE_CACHE.get(key)
    if hit is not None and hit[0] is adj.majors:
        return hit[1]
    e = adj.num_edges
    majors = np.asarray(adj.majors)[:e]
    minors = np.asarray(adj.minors)[:e]
    w = (
        np.ones(e, dtype=np.float32)
        if (adj.weights is None or not use_weights)
        else np.asarray(adj.weights)[:e].astype(np.float32)
    )
    a = np.zeros((v, v), dtype=np.float32)
    np.add.at(a, (majors, minors), w)
    out = jnp.asarray(a)
    if len(_DENSE_CACHE) > 4:
        _DENSE_CACHE.clear()
    _DENSE_CACHE[key] = (adj.majors, out)
    return out


def dense_spmm(a: jax.Array, features: jax.Array) -> jax.Array:
    """out[v, :] = sum over u of A[v, u] * features[u, :] on the MXU."""
    return jnp.dot(
        a, features.astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(features.dtype)
