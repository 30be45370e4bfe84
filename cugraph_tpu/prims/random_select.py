"""per_v_random_select_outgoing_e — the neighbor-sampling primitive.

For each frontier vertex, uniformly select K outgoing edges with or without
replacement (ref: cpp/src/prims/per_v_random_select_transform_outgoing_e.cuh,
which delegates index generation to closed-source cugraph-ops
``get_sampling_index`` — reimplemented here from scratch).

TPU-native formulation: counter-based threefry keys drive a fully
vectorized (N, K) index draw; without-replacement uses Floyd's algorithm
unrolled over the K static slots (K is a compile-time fanout, typically
10-30), giving exact uniform sampling for any degree with O(N*K^2)
elementwise work and no rejection loops. RNG parity with the reference is
impossible (different generators); tests assert structural/distributional
properties instead (SURVEY.md §7 "RNG parity").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph


def per_v_random_select_outgoing_e(
    g: Graph,
    rng_key: jax.Array,
    vertices: jax.Array,
    fanout: int,
    *,
    with_replacement: bool = False,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array], jax.Array]:
    """Sample up to ``fanout`` outgoing edges per vertex.

    vertices: (N,) int32, entries < 0 are padding.
    Returns (srcs, dsts, weights|None, valid), all (N, fanout).
    Vertices with degree < fanout (without replacement) yield all their
    edges, remaining slots invalid — matching the reference semantics.
    """
    adj = g.csr()
    n = vertices.shape[0]
    k = int(fanout)
    v_safe = jnp.maximum(vertices, 0)
    starts = jnp.take(adj.offsets, v_safe)
    degs = jnp.take(adj.offsets, v_safe + 1) - starts
    v_ok = vertices >= 0

    if with_replacement:
        u = jax.random.uniform(rng_key, (n, k))
        sel = jnp.minimum(
            (u * degs[:, None].astype(u.dtype)).astype(jnp.int32),
            jnp.maximum(degs[:, None] - 1, 0),
        )
        valid = v_ok[:, None] & (degs[:, None] > 0)
    else:
        # Floyd's algorithm, unrolled over the K slots. For vertex degree d:
        #   for i in 0..K-1: j = d-K+i; t = uniform int in [0, j]; pick t
        #   unless already picked, else pick j. Exact uniform K-subsets.
        keys = jax.random.split(rng_key, k)
        sel = jnp.full((n, k), -1, dtype=jnp.int32)
        for i in range(k):
            j = degs - k + i  # (n,), may be negative when d < K
            jpos = jnp.maximum(j, 0)
            u = jax.random.uniform(keys[i], (n,))
            t = jnp.minimum((u * (jpos + 1).astype(u.dtype)).astype(jnp.int32), jpos)
            dup = jnp.any(sel[:, :i] == t[:, None], axis=1) if i > 0 else jnp.zeros(
                (n,), dtype=bool
            )
            pick = jnp.where(dup, jpos, t)
            sel = sel.at[:, i].set(pick)
        # degree <= K: deterministic take-all (slot i -> edge i)
        slot = jnp.arange(k, dtype=jnp.int32)[None, :]
        sel = jnp.where(degs[:, None] <= k, slot, sel)
        valid = v_ok[:, None] & (slot < jnp.minimum(degs, k)[:, None])

    eidx = jnp.minimum(starts[:, None] + sel, adj.e_pad - 1)
    eidx = jnp.maximum(eidx, 0)
    dsts = jnp.take(adj.minors, eidx)
    srcs = jnp.broadcast_to(v_safe[:, None], (n, k))
    weights = None if adj.weights is None else jnp.take(adj.weights, eidx)
    return srcs, dsts, weights, valid
