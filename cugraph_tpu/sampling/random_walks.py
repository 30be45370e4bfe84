"""Random walks: uniform, biased (edge-weight), node2vec.

ref: cpp/src/sampling/random_walks.cuh (legacy coalesced implementation,
1,312 LoC: uniform + biased + node2vec with p/q at :274-280) and the new
prims path random_walks_impl.cuh (:65 uniform_selector; biased/node2vec are
CUGRAPH_FAIL stubs there — the legacy path is the semantic reference).

TPU-native: one lax.scan over walk steps; each step picks the next vertex
for all walkers at once. Uniform uses a single random index into the CSR
row; biased/node2vec build a (walkers, max_degree) candidate tile, weight
it, and inverse-CDF sample — flat vectorized work, no rejection loops.
Output is the padded/coalesced matrix form the reference returns (walks
padded with -1 after termination at a sink).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from ..prims.intersection import _candidate_tile, _contains_sorted
from ..utils.dtypes import WEIGHT_DTYPE


@partial(jax.jit, static_argnames=("max_depth",))
def _uniform_walk_jit(g: Graph, starts: jax.Array, rng_key, max_depth: int):
    adj = g.csr()
    v = g.num_vertices

    def step(carry, key):
        cur = carry  # (N,) current vertex or -1 (terminated)
        safe = jnp.maximum(cur, 0)
        lo = jnp.take(adj.offsets, safe)
        deg = jnp.take(adj.offsets, safe + 1) - lo
        u = jax.random.uniform(key, cur.shape)
        pick = jnp.minimum((u * deg.astype(u.dtype)).astype(jnp.int32), deg - 1)
        eidx = jnp.clip(lo + pick, 0, adj.e_pad - 1)
        nxt = jnp.take(adj.minors, eidx)
        w = (
            jnp.take(adj.weights, eidx)
            if adj.weights is not None
            else jnp.ones(cur.shape, WEIGHT_DTYPE)
        )
        alive = (cur >= 0) & (deg > 0)
        nxt = jnp.where(alive, nxt, -1)
        w = jnp.where(alive, w, 0.0)
        return nxt, (nxt, w)

    keys = jax.random.split(rng_key, max_depth)
    _, (steps, ws) = jax.lax.scan(step, starts, keys)
    walks = jnp.concatenate([starts[None, :], steps], axis=0).T  # (N, depth+1)
    return walks, ws.T


def _tile_weighted_step(g: Graph, cur, prev, key, p, q, max_degree, biased):
    """One step for biased / node2vec walks via a candidate tile."""
    adj = g.csr()
    safe = jnp.maximum(cur, 0)
    cand, mask = _candidate_tile(adj, safe, max_degree)
    lo = jnp.take(adj.offsets, safe)
    slot = jnp.arange(max_degree, dtype=jnp.int32)[None, :]
    eidx = jnp.clip(lo[:, None] + slot, 0, adj.e_pad - 1)
    w = (
        jnp.take(adj.weights, eidx)
        if adj.weights is not None
        else jnp.ones(cand.shape, WEIGHT_DTYPE)
    )
    if not biased:
        w = jnp.ones_like(w)
    if p is not None:
        # node2vec factors: back to prev -> 1/p; neighbor of prev -> 1;
        # else -> 1/q  (ref random_walks.cuh:274-280)
        prev_safe = jnp.maximum(prev, 0)
        lo2 = jnp.take(adj.offsets, prev_safe)[:, None]
        hi2 = jnp.take(adj.offsets, prev_safe + 1)[:, None]
        is_prev = cand == prev[:, None]
        is_nbr = _contains_sorted(adj.minors, lo2, hi2, cand)
        factor = jnp.where(
            is_prev, 1.0 / p, jnp.where(is_nbr, 1.0, 1.0 / q)
        )
        factor = jnp.where(prev[:, None] >= 0, factor, 1.0)
        w = w * factor
    w = jnp.where(mask, w, 0.0)
    csum = jnp.cumsum(w, axis=1)
    total = csum[:, -1:]
    u = jax.random.uniform(key, (cur.shape[0], 1)) * total
    pick = jnp.sum((csum < u).astype(jnp.int32), axis=1)
    pick = jnp.minimum(pick, max_degree - 1)
    nxt = jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]
    ew = jnp.take_along_axis(
        jnp.take(adj.weights, eidx) if adj.weights is not None else jnp.ones_like(w),
        pick[:, None],
        axis=1,
    )[:, 0]
    alive = (cur >= 0) & (total[:, 0] > 0)
    return jnp.where(alive, nxt, -1), jnp.where(alive, ew, 0.0)


def random_walks(
    g: Graph,
    start_vertices,
    max_depth: int,
    *,
    use_padding: bool = True,
    rng_key: Optional[jax.Array] = None,
    biased: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Uniform (or weight-biased) random walks.

    Returns (walks (N, max_depth+1) int32 padded with -1, edge_weights
    (N, max_depth)). ref: cugraph.random_walks."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    starts = jnp.atleast_1d(jnp.asarray(start_vertices, jnp.int32))
    if not biased:
        return _uniform_walk_jit(g, starts, rng_key, int(max_depth))
    return _walk_scan(g, starts, rng_key, int(max_depth), None, None, True)


@partial(jax.jit, static_argnames=("max_depth", "biased", "max_degree"))
def _walk_scan_jit(g, starts, rng_key, max_depth, p, q, biased, max_degree):
    def step(carry, key):
        cur, prev = carry
        nxt, w = _tile_weighted_step(g, cur, prev, key, p, q, max_degree, biased)
        return (nxt, cur), (nxt, w)

    keys = jax.random.split(rng_key, max_depth)
    _, (steps, ws) = jax.lax.scan(
        step, (starts, jnp.full_like(starts, -1)), keys
    )
    walks = jnp.concatenate([starts[None, :], steps], axis=0).T
    return walks, ws.T


def _walk_scan(g, starts, rng_key, max_depth, p, q, biased):
    max_deg = int(jnp.max(g.out_degrees())) if g.num_edges else 1
    return _walk_scan_jit(
        g,
        starts,
        rng_key,
        max_depth,
        None if p is None else jnp.asarray(p, WEIGHT_DTYPE),
        None if q is None else jnp.asarray(q, WEIGHT_DTYPE),
        biased,
        max(max_deg, 1),
    )


def node2vec(
    g: Graph,
    start_vertices,
    max_depth: int,
    p: float = 1.0,
    q: float = 1.0,
    *,
    rng_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """node2vec second-order biased walks (return parameter p, in-out q).

    ref: sampling/random_walks.cuh node2vec_selector + python
    cugraph/sampling/node2vec.py."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    starts = jnp.atleast_1d(jnp.asarray(start_vertices, jnp.int32))
    return _walk_scan(g, starts, rng_key, int(max_depth), p, q, True)
