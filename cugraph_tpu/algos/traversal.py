"""Traversal: BFS, SSSP, BFS path extraction, two-hop neighbors.

ref: cpp/src/traversal/bfs_impl.cuh (depth loop :205-283),
sssp_impl.cuh (near/far delta-stepping), extract_bfs_paths_impl.cuh.

TPU-native: dense-mask frontiers inside a single lax.while_loop (see
prims/frontier.py for the rationale); the reference pays a host allreduce
per level (vertex_frontier.cuh aggregate_size), we pay none. SSSP uses
frontier-driven Bellman-Ford relaxation rather than delta-stepping: the
near/far bucket split exists to bound ragged frontier sizes on GPUs, while
the dense-mask formulation already touches all edges per round, so the
bucket machinery would add nothing on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from ..prims.frontier import transform_reduce_v_frontier_outgoing_e_by_dst
from ..prims.reduce_ops import ANY, MINIMUM
from ..utils.dtypes import WEIGHT_DTYPE

INVALID_DISTANCE = jnp.iinfo(jnp.int32).max  # ref: unreachable = INT_MAX
INVALID_VERTEX = -1  # ref: no predecessor = invalid vertex id


def _as_source_mask(g: Graph, sources) -> jax.Array:
    sources = jnp.atleast_1d(jnp.asarray(sources, dtype=jnp.int32))
    return jnp.zeros(g.num_vertices, dtype=bool).at[sources].set(True)


def _sparse_bfs_level(
    offsets, minors, frontier, visited, cap_v: int, cap_e: int
):
    """One BFS level over a COMPACTED frontier (<= cap_v vertices whose
    total out-degree is <= cap_e): gather the frontier's adjacency ranges
    and scatter reached vertices. O(cap_e) instead of O(E) — the small
    early/late levels of the direction-optimizing split
    (ref bfs_impl.cuh's top-down phase; the dense min-plus sweep is the
    bottom-up phase). Returns (touched_mask, pred_candidate)."""
    v = visited.shape[0]
    fids = jnp.nonzero(frontier, size=cap_v, fill_value=v)[0]
    safe = jnp.minimum(fids, v - 1)
    offs = offsets[safe]
    degs = jnp.where(fids < v, offsets[safe + 1] - offs, 0)
    cum = jnp.cumsum(degs)
    total = cum[-1]
    j = jnp.arange(cap_e, dtype=jnp.int32)
    starts = cum - degs

    # Broadcast per-frontier-vertex values to their edge slots WITHOUT
    # per-slot gathers (XLA gather runs ~0.1 Gelem/s on TPU): scatter the
    # per-vertex value DELTAS at each range start and prefix-sum. Empty
    # ranges share a start with their successor; the co-located deltas
    # telescope, so the cumsum is correct for any degree pattern.
    s_idx = jnp.minimum(starts, cap_e)

    def fill(vals):
        delta = vals - jnp.concatenate([vals[:1] * 0, vals[:-1]])
        acc = (
            jnp.zeros(cap_e + 1, vals.dtype).at[s_idx].add(delta)[:cap_e]
        )
        return jnp.cumsum(acc)

    epos = j + fill(offs - starts)
    valid_e = j < total
    nbr = minors[jnp.where(valid_e, epos, 0)]
    src = fill(fids.astype(jnp.int32))
    keep = valid_e & ~visited[nbr]
    nbr_or_v = jnp.where(keep, nbr, v)
    touched = (
        jnp.zeros(v + 1, dtype=bool).at[nbr_or_v].set(True, mode="drop")[:v]
    )
    pred_cand = (
        jnp.full(v + 1, jnp.int32(jnp.iinfo(jnp.int32).max))
        .at[nbr_or_v]
        .min(src.astype(jnp.int32), mode="drop")[:v]
    )
    return touched, pred_cand


@partial(jax.jit, static_argnames=("depth_limit", "sparse_caps"))
def _bfs_pallas_jit(g: Graph, src_mask, depth_limit: int, lay, sparse_caps=None):
    """Direction-optimizing BFS on the sorted pipeline.

    Small levels (frontier out-degree <= cap_e) run a compacted sparse
    push (_sparse_bfs_level, O(cap_e)); saturated levels run the dense
    MIN-variant sweep — one min-plus pass over x[u] = (u if u in frontier
    else +inf) yields BOTH the expansion (y < inf == frontier OR) and the
    predecessor (y = min in-frontier neighbor id). Vertex ids ride f32
    exactly (V <= 2^24 enforced by the caller). The realized form of the
    reference's direction-optimizing intent (bfs_impl.cuh:206,
    unimplemented there)."""
    from ..prims.pallas.spmv2 import sorted_spmv_dispatch

    v = g.num_vertices
    csr = g.csr()
    out_deg = (csr.offsets[1:] - csr.offsets[:-1]).astype(jnp.int32)
    INF = jnp.float32(jnp.inf)
    ids = jnp.arange(v, dtype=jnp.int32).astype(jnp.float32)
    dist0 = jnp.where(src_mask, 0, INVALID_DISTANCE).astype(jnp.int32)
    pred0 = jnp.full(v, INVALID_VERTEX, dtype=jnp.int32)
    # Sparse-push caps. The push's fixed cost is the V-sized nonzero
    # compaction (~15-25 ms); its variable cost is the cap_e-sized
    # minors gather + reach scatter (~0.1 Gelem/s XLA ops, ~10 ms at
    # 2^19), so levels up to ~half a million frontier out-edges still
    # beat a ~90 ms dense multi-range min-plus sweep. sparse_caps =
    # (cap_e, cap_v) overrides per call (static: retraces per pair —
    # benchmarks/bfs_caps_sweep.py); env vars set the process default.
    import os

    if sparse_caps is not None:
        cap_e, cap_v = int(sparse_caps[0]), min(v, int(sparse_caps[1]))
    else:
        cap_e = int(os.environ.get("CUGRAPH_TPU_BFS_CAP_E", 1 << 19))
        cap_v = min(v, int(os.environ.get("CUGRAPH_TPU_BFS_CAP_V", 1 << 17)))
    # the sparse push only beats the dense sweep once the sweep itself is
    # expensive (multi-range graphs past ~4M vertices)
    use_sparse = v >= (1 << 22)

    def cond(state):
        visited, dist, pred, frontier, depth = state
        return jnp.any(frontier) & (depth < depth_limit)

    def dense_level(visited, frontier):
        x = jnp.where(frontier, ids, INF)
        y = sorted_spmv_dispatch(lay, x, reduce="min")
        return jnp.isfinite(y) & ~visited, y.astype(jnp.int32)

    def sparse_level(visited, frontier):
        touched, pred_cand = _sparse_bfs_level(
            csr.offsets, csr.minors, frontier, visited, cap_v, cap_e
        )
        return touched & ~visited, pred_cand

    def body(state):
        visited, dist, pred, frontier, depth = state
        if use_sparse:
            f_edges = jnp.sum(jnp.where(frontier, out_deg, 0))
            f_count = jnp.sum(frontier.astype(jnp.int32))
            new, pred_cand = jax.lax.cond(
                (f_edges <= cap_e) & (f_count <= cap_v),
                sparse_level,
                dense_level,
                visited,
                frontier,
            )
        else:
            new, pred_cand = dense_level(visited, frontier)
        dist = jnp.where(new, depth + 1, dist)
        pred = jnp.where(new, pred_cand, pred)
        return visited | new, dist, pred, new, depth + 1

    visited, dist, pred, _, _ = jax.lax.while_loop(
        cond, body, (src_mask, dist0, pred0, src_mask, jnp.int32(0))
    )
    return dist, pred


@partial(jax.jit, static_argnames=("depth_limit",))
def _bfs_jit(g: Graph, src_mask: jax.Array, depth_limit: int):
    v = g.num_vertices
    dist0 = jnp.where(src_mask, 0, INVALID_DISTANCE).astype(jnp.int32)
    pred0 = jnp.full(v, INVALID_VERTEX, dtype=jnp.int32)

    def e_op(s, d, sv, dv, w):
        # sv = visited flag of src is implicit (frontier mask); dv = visited[dst]
        keep = ~dv
        return keep, s  # payload: predecessor candidate (ANY -> min src)

    def cond(state):
        visited, dist, pred, frontier, depth = state
        return jnp.any(frontier) & (depth < depth_limit)

    def body(state):
        visited, dist, pred, frontier, depth = state
        touched, pred_cand = transform_reduce_v_frontier_outgoing_e_by_dst(
            g, frontier, e_op, reduce_op=ANY, dst_values=visited
        )
        new = touched & ~visited
        dist = jnp.where(new, depth + 1, dist)
        pred = jnp.where(new, pred_cand, pred)
        visited = visited | new
        return visited, dist, pred, new, depth + 1

    visited, dist, pred, _, _ = jax.lax.while_loop(
        cond, body, (src_mask, dist0, pred0, src_mask, jnp.int32(0))
    )
    return dist, pred


def bfs(
    g: Graph,
    sources,
    depth_limit: Optional[int] = None,
    direction_optimizing: bool = False,
    sparse_caps: Optional[Tuple[int, int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-source BFS. Returns (distances, predecessors); unreachable
    vertices get INVALID_DISTANCE / predecessor -1 (ref bfs_impl.cuh).

    direction_optimizing is accepted for API parity; the dense-mask push is
    already edge-complete per level so the pull switch is a no-op here (the
    reference's flag is unimplemented too, bfs_impl.cuh:206).

    sparse_caps: optional (cap_e, cap_v) pair for the direction-optimizing
    sparse-push thresholds (default: CUGRAPH_TPU_BFS_CAP_E/V env or
    2^19 / 2^17; measured sweep in docs/PERFORMANCE.md).
    """
    del direction_optimizing
    src_mask = _as_source_mask(g, sources)
    limit = int(depth_limit) if depth_limit is not None else g.num_vertices
    lay = _min_layout(g)
    if lay is not None:
        return _bfs_pallas_jit(
            g, src_mask, limit, lay,
            None if sparse_caps is None else tuple(sparse_caps),
        )
    return _bfs_jit(g, src_mask, limit)


def _min_layout(g: Graph, use_weights: bool = False):
    """Layout for the min-plus pipeline, or None (non-TPU backend, graph
    too small/large, traced graph, or V > 2^24 — vertex ids must be
    f32-exact)."""
    if g.num_edges < 1 << 18 or g.num_vertices > 1 << 24:
        return None
    if isinstance(g.csc().majors, jax.core.Tracer):
        return None
    from ..prims.pallas.spmv2 import sorted_layout_for

    return sorted_layout_for(g, use_weights=use_weights, variant="min")


@partial(jax.jit, static_argnames=())
def _sssp_jit(g: Graph, src_mask: jax.Array, cutoff):
    v = g.num_vertices
    inf = jnp.asarray(jnp.inf, WEIGHT_DTYPE)
    dist0 = jnp.where(src_mask, 0.0, inf).astype(WEIGHT_DTYPE)
    pred0 = jnp.full(v, INVALID_VERTEX, dtype=jnp.int32)

    def relax_op(s, d, sv, dv, w):
        wval = w if w is not None else jnp.ones_like(sv)
        cand = sv + wval
        keep = (cand < dv) & (cand <= cutoff)
        return keep, cand

    def cond(state):
        dist, pred, frontier, it = state
        return jnp.any(frontier) & (it < v)

    def body(state):
        dist, pred, frontier, it = state
        touched, cand = transform_reduce_v_frontier_outgoing_e_by_dst(
            g, frontier, relax_op, reduce_op=MINIMUM, src_values=dist, dst_values=dist
        )
        improved = touched & (cand < dist)
        new_dist = jnp.where(improved, cand, dist)
        # second pass: predecessor = min src among edges achieving the new dist
        def pred_op(s, d, sv, dv, w):
            wval = w if w is not None else jnp.ones_like(sv)
            keep = improved_d(d) & (sv + wval == dv)
            return keep, s

        def improved_d(d):
            return jnp.take(improved, d)

        _, pred_cand = transform_reduce_v_frontier_outgoing_e_by_dst(
            g, frontier, pred_op, reduce_op=ANY, src_values=dist, dst_values=new_dist
        )
        pred = jnp.where(improved, pred_cand, pred)
        return new_dist, pred, improved, it + 1

    dist, pred, _, _ = jax.lax.while_loop(
        cond, body, (dist0, pred0, src_mask, jnp.int32(0))
    )
    return dist, pred


@jax.jit
def _sssp_pallas_jit(g: Graph, src_mask, cutoff, lay):
    """SSSP distances via min-plus pipeline sweeps (Bellman-Ford over full
    relaxations; converges in hop-diameter rounds), then one edge post-pass
    for predecessors. The pipeline and the post-pass round identically in
    f32, so the tree predicate dist[u] + w == dist[v] is exact."""
    from ..prims.pallas.spmv2 import sorted_spmv_dispatch

    v = g.num_vertices
    inf = jnp.float32(jnp.inf)
    dist0 = jnp.where(src_mask, 0.0, inf).astype(jnp.float32)

    def cond(state):
        dist, changed, it = state
        return changed & (it < v)

    def body(state):
        dist, _, it = state
        relax = sorted_spmv_dispatch(lay, dist, reduce="min")
        relax = jnp.where(relax <= cutoff, relax, inf)
        nd = jnp.minimum(dist, relax)
        return nd, jnp.any(nd < dist), it + 1

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, jnp.bool_(True), jnp.int32(0))
    )
    # predecessor post-pass: one edge sweep over the csc adjacency
    adj = g.csc()
    srcs, dsts = adj.minors, adj.majors
    w = adj.weights if adj.weights is not None else jnp.ones_like(srcs, jnp.float32)
    ds = jnp.take(dist, srcs)
    dd = jnp.take(dist, dsts)
    on_tree = (
        adj.valid()
        & jnp.isfinite(dd)
        & (ds + w == dd)
        & ~jnp.take(src_mask, dsts)
    )
    seg = jnp.where(on_tree, dsts, v)
    pred = jax.ops.segment_min(
        jnp.where(on_tree, srcs, v), seg, num_segments=v + 1,
        indices_are_sorted=True,
    )[:v]
    pred = jnp.where(pred < v, pred, INVALID_VERTEX)
    return dist.astype(WEIGHT_DTYPE), pred


def sssp(
    g: Graph, source, cutoff: Optional[float] = None
) -> Tuple[jax.Array, jax.Array]:
    """Single-source shortest paths (non-negative weights).

    Returns (distances, predecessors); unreachable = +inf / -1.
    ref: sssp_impl.cuh (cutoff supported)."""
    src_mask = _as_source_mask(g, source)
    c = jnp.asarray(cutoff if cutoff is not None else jnp.inf, WEIGHT_DTYPE)
    if g.weighted:
        lay = _min_layout(g, use_weights=True)
        if lay is not None:
            return _sssp_pallas_jit(g, src_mask, c.astype(jnp.float32), lay)
    return _sssp_jit(g, src_mask, c)


@partial(jax.jit, static_argnames=("max_path_length",))
def _extract_paths_jit(predecessors, distances, destinations, max_path_length: int):
    n = destinations.shape[0]

    def step(carry, _):
        cur = carry
        nxt = jnp.where(
            cur >= 0, jnp.take(predecessors, jnp.maximum(cur, 0)), INVALID_VERTEX
        )
        return nxt, cur

    _, path_rev = jax.lax.scan(
        step, destinations.astype(jnp.int32), None, length=max_path_length
    )
    # path_rev[i] = vertex i hops back from destination; flip to source-first
    paths = jnp.flip(path_rev.T, axis=1)  # (n, max_path_length)
    return paths


def extract_bfs_paths(
    g: Graph, distances: jax.Array, predecessors: jax.Array, destinations
) -> Tuple[jax.Array, int]:
    """Reconstruct source->destination paths from a BFS/SSSP result.

    Returns (paths (n, max_path_length) int32 padded with -1 at the front,
    max_path_length). ref: extract_bfs_paths_impl.cuh."""
    destinations = jnp.atleast_1d(jnp.asarray(destinations, dtype=jnp.int32))
    d = jnp.take(distances, destinations)
    finite = (d != INVALID_DISTANCE) & jnp.isfinite(d.astype(jnp.float32))
    max_len = int(jnp.max(jnp.where(finite, d, 0))) + 1
    paths = _extract_paths_jit(predecessors, distances, destinations, max_len)
    return paths, max_len


def two_hop_neighbors(g: Graph) -> Tuple[jax.Array, jax.Array]:
    """All (v, w) pairs with a path of exactly two hops (legacy API,
    ref: traversal/two_hop_neighbors.cu). Host-side; returns sorted unique
    pairs."""
    import numpy as np

    from ..core.convert import decompress_to_edgelist

    src, dst, _ = decompress_to_edgelist(g)
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, []).append(d)
    pairs = set()
    for s, mids in adj.items():
        for m in mids:
            for d in adj.get(m, ()):
                if d != s:
                    pairs.add((s, d))
    if not pairs:
        return np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32)
    arr = np.array(sorted(pairs), dtype=np.int32)
    return arr[:, 0], arr[:, 1]
