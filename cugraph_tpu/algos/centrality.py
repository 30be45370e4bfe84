"""Centrality: Katz, eigenvector, degree, betweenness (+ edge betweenness).

ref: cpp/src/centrality/{katz_centrality_impl.cuh (:110,:78),
eigenvector_centrality_impl.cuh, betweenness_centrality*.cu/.cuh}.

Betweenness is Brandes' algorithm formulated TPU-natively: batched over
sources (the reference parallelizes per-source too, legacy kernels), with
the forward BFS and the backward dependency sweep both edge-centric over
dense (num_sources, V) state — the per-depth ragged successor lists of
Brandes become masked segment reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from ..prims.per_v import (
    per_v_transform_reduce_incoming_e,
    per_v_transform_reduce_outgoing_e,
)
from ..utils.dtypes import WEIGHT_DTYPE


@partial(jax.jit, static_argnames=("max_iterations", "normalized", "lkind"))
def _katz_jit(
    g: Graph, alpha, beta, tol, x0, max_iterations: int, normalized: bool,
    lkind=None, layout=None,
):
    v = g.num_vertices

    def pull(values):
        from ..prims.pallas import pull_aggregate

        return pull_aggregate(lkind, layout, g, values)

    def cond(state):
        x, diff, it = state
        return (diff > v * tol) & (it < max_iterations)

    def body(state):
        x, _, it = state
        new = alpha * pull(x) + beta
        diff = jnp.sum(jnp.abs(new - x))
        return new, diff, it + 1

    x, _, iters = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
    )
    if normalized:
        x = x / jnp.maximum(jnp.linalg.norm(x), 1e-30)
    return x, iters


def katz_centrality(
    g: Graph,
    alpha: Optional[float] = None,
    beta: float = 1.0,
    max_iterations: int = 1000,
    tol: float = 1.0e-6,
    nstart: Optional[jax.Array] = None,
    normalized: bool = True,
) -> Tuple[jax.Array, int]:
    """Katz centrality x = alpha * A^T x + beta (ref katz_centrality_impl.cuh).

    alpha defaults to 1/(1+max_degree) as in the reference Python wrapper."""
    v = g.num_vertices
    if alpha is None:
        max_deg = int(jnp.max(g.out_degrees()))
        alpha = 1.0 / (max_deg + 1)
    x0 = (
        jnp.asarray(nstart, WEIGHT_DTYPE)
        if nstart is not None
        else jnp.zeros(v, dtype=WEIGHT_DTYPE)
    )
    from ..prims.pallas import pull_layout_auto

    lkind, layout = pull_layout_auto(g)
    x, iters = _katz_jit(
        g,
        jnp.asarray(alpha, WEIGHT_DTYPE),
        jnp.asarray(beta, WEIGHT_DTYPE),
        jnp.asarray(tol, WEIGHT_DTYPE),
        x0,
        max_iterations,
        normalized,
        lkind,
        layout,
    )
    return x, int(iters)


@partial(jax.jit, static_argnames=("max_iterations", "lkind"))
def _eigenvector_jit(g: Graph, tol, x0, max_iterations: int, lkind=None, layout=None):
    v = g.num_vertices

    def pull(values):
        from ..prims.pallas import pull_aggregate

        return pull_aggregate(lkind, layout, g, values)

    def cond(state):
        x, diff, it = state
        return (diff > v * tol) & (it < max_iterations)

    def body(state):
        x, _, it = state
        new = pull(x) + x  # +x: standard shift, matches nx implementation
        new = new / jnp.maximum(jnp.linalg.norm(new), 1e-30)
        diff = jnp.sum(jnp.abs(new - x))
        return new, diff, it + 1

    x, _, iters = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
    )
    return x, iters


def eigenvector_centrality(
    g: Graph,
    max_iterations: int = 1000,
    tol: float = 1.0e-6,
    nstart: Optional[jax.Array] = None,
) -> Tuple[jax.Array, int]:
    """Eigenvector centrality via normalized power iteration
    (ref eigenvector_centrality_impl.cuh). L2-normalized output."""
    v = g.num_vertices
    x0 = (
        jnp.asarray(nstart, WEIGHT_DTYPE)
        if nstart is not None
        else jnp.full(v, 1.0 / v, dtype=WEIGHT_DTYPE)
    )
    from ..prims.pallas import pull_layout_auto

    lkind, layout = pull_layout_auto(g)
    x, iters = _eigenvector_jit(
        g, jnp.asarray(tol, WEIGHT_DTYPE), x0, max_iterations, lkind, layout
    )
    return x, int(iters)


def degree_centrality(g: Graph, normalized: bool = True) -> jax.Array:
    """(in+out) degree centrality (ref: dask/centrality/degree_centrality)."""
    deg = g.out_degrees() + g.in_degrees()
    if g.is_symmetric:
        deg = deg // 2
    deg = deg.astype(WEIGHT_DTYPE)
    if normalized:
        deg = deg / max(g.num_vertices - 1, 1)
    return deg


# ---------------------------------------------------------------------------
# Betweenness (Brandes), batched over sources.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("vary_axes",))
def _brandes_batch(g: Graph, sources: jax.Array, vary_axes: tuple = ()):
    """Vertex + edge dependency accumulation for a batch of sources.

    Returns (delta (S, V), edge_delta (S, e_pad)) of dependency scores.
    vary_axes: mesh axes to mark loop carries as varying over when called
    inside shard_map (the MG batch-replication path, dist/mg_centrality)."""
    v = g.num_vertices

    def _pv(x):
        # mark loop-carry inits varying over exactly the missing axes
        if not vary_axes:
            return x
        have = getattr(jax.typeof(x), "vma", frozenset())
        need = tuple(a for a in vary_axes if a not in have)
        return jax.lax.pcast(x, need, to="varying") if need else x
    adj = g.csr()
    src_ids, dst_ids = adj.majors, adj.minors
    valid = adj.valid()

    def one_source(s):
        dist0 = jnp.full(v, jnp.iinfo(jnp.int32).max, jnp.int32).at[s].set(0)
        sigma0 = jnp.zeros(v, WEIGHT_DTYPE).at[s].set(1.0)
        frontier0 = jnp.zeros(v, bool).at[s].set(True)

        def fcond(st):
            dist, sigma, frontier, depth = st
            return jnp.any(frontier)

        def fbody(st):
            dist, sigma, frontier, depth = st
            active = jnp.take(frontier, src_ids) & valid
            unvisited = jnp.take(dist, dst_ids) == jnp.iinfo(jnp.int32).max
            con = active & unvisited
            seg = jnp.where(con, dst_ids, v)
            touched = (
                jax.ops.segment_max(con.astype(jnp.int32), seg, v + 1)[:v] > 0
            )
            sig_add = jax.ops.segment_sum(
                jnp.where(con, jnp.take(sigma, src_ids), 0.0), seg, v + 1
            )[:v]
            dist = jnp.where(touched, depth + 1, dist)
            sigma = sigma + jnp.where(touched, sig_add, 0.0)
            return dist, sigma, touched, depth + 1

        dist, sigma, _, max_depth = jax.lax.while_loop(
            fcond, fbody, (_pv(dist0), _pv(sigma0), _pv(frontier0), jnp.int32(0))
        )

        # backward sweep: for depth d from max_depth-1 down to 0, accumulate
        # delta[u] += sigma[u]/sigma[w] * (1 + delta[w]) over edges u->w on
        # shortest paths (dist[w] == dist[u]+1).
        delta0 = jnp.zeros(v, WEIGHT_DTYPE)
        edge_delta0 = jnp.zeros(adj.e_pad, WEIGHT_DTYPE)

        def bcond(st):
            delta, edge_delta, d = st
            return d >= 0

        def bbody(st):
            delta, edge_delta, d = st
            du = jnp.take(dist, src_ids)
            dw = jnp.take(dist, dst_ids)
            on_path = valid & (du == d) & (dw == d + 1)
            sig_u = jnp.take(sigma, src_ids)
            sig_w = jnp.maximum(jnp.take(sigma, dst_ids), 1e-30)
            contrib = jnp.where(
                on_path, sig_u / sig_w * (1.0 + jnp.take(delta, dst_ids)), 0.0
            )
            edge_delta = jnp.where(on_path, contrib, edge_delta)
            seg = jnp.where(on_path, src_ids, v)
            add = jax.ops.segment_sum(contrib, seg, v + 1)[:v]
            return delta + add, edge_delta, d - 1

        delta, edge_delta, _ = jax.lax.while_loop(
            bcond, bbody, (_pv(delta0), _pv(edge_delta0), max_depth - 1)
        )
        delta = delta.at[s].set(0.0)
        reach = (dist != jnp.iinfo(jnp.int32).max).at[s].set(False)
        return delta, edge_delta, reach

    return jax.vmap(one_source)(sources)


def betweenness_centrality(
    g: Graph,
    k: Optional[int] = None,
    normalized: bool = True,
    endpoints: bool = False,
    seed: int = 0,
) -> jax.Array:
    """Vertex betweenness (Brandes; unweighted shortest paths, matching the
    reference's legacy SG implementation, betweenness_centrality.cu).
    k: sample k sources uniformly (None = exact, all sources)."""
    v = g.num_vertices
    if k is None:
        sources = jnp.arange(v, dtype=jnp.int32)
    else:
        sources = jax.random.choice(
            jax.random.PRNGKey(seed), v, shape=(int(k),), replace=False
        ).astype(jnp.int32)
    delta, _, reach = _brandes_batch(g, sources)
    bc = jnp.sum(delta, axis=0)
    if endpoints:
        # each (s, t) reachable pair adds 1 to both endpoints
        # (nx _accumulate_endpoints semantics)
        bc = bc + jnp.sum(reach, axis=0)  # +1 per source reaching v
        bc = bc.at[sources].add(jnp.sum(reach, axis=1))  # source side
    if k is not None:
        bc = bc * (v / max(int(k), 1))
    if g.is_symmetric:
        bc = bc / 2.0
    if normalized and v > 2:
        if endpoints:
            denom = v * (v - 1)
        else:
            denom = (v - 1) * (v - 2)
        if g.is_symmetric:
            denom = denom / 2.0  # undirected pairs
        bc = bc / denom
    return bc


def edge_betweenness_centrality(
    g: Graph, k: Optional[int] = None, normalized: bool = True, seed: int = 0
) -> jax.Array:
    """Edge betweenness over the padded edge slots of g.csr()
    (ref: edge betweenness path of betweenness_centrality.cu)."""
    v = g.num_vertices
    if k is None:
        sources = jnp.arange(v, dtype=jnp.int32)
    else:
        sources = jax.random.choice(
            jax.random.PRNGKey(seed), v, shape=(int(k),), replace=False
        ).astype(jnp.int32)
    _, edge_delta, _ = _brandes_batch(g, sources)
    ebc = jnp.sum(edge_delta, axis=0)
    if k is not None:
        ebc = ebc * (v / max(int(k), 1))
    if g.is_symmetric:
        ebc = ebc / 2.0
    if normalized:
        denom = v * (v - 1)
        if g.is_symmetric:
            denom = denom / 2.0
        ebc = ebc / max(denom, 1)
    return ebc
