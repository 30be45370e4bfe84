"""Community detection: Louvain, Leiden, modularity, triangle count, ECG,
k-truss, ego graph, spectral clustering.

ref: cpp/src/community/louvain_impl.cuh (dendrogram loop :71, inner sweep
:156, contraction :224), community/detail/common_methods.cuh
(compute_modularity, update_clustering_by_delta_modularity),
leiden_impl.cuh, triangle_count_impl.cuh, legacy/{ecg.cu, ktruss.cu,
egonet.cu, spectral_clustering.cu}.

TPU-native Louvain: the delta-modularity sweep runs fully on device —
per-(vertex, neighbor-cluster) aggregated weights come from the sorted-run
keyed prim (prims/keyed.py, replacing the reference's cuco hash maps), the
best-move argmax is a two-pass segment reduction, and oscillations are
prevented with the reference's alternating up/down move constraint
(common_methods.cuh update_clustering_by_delta_modularity). The
level-to-level contraction is host-side (graph shapes change per level, as
in the reference which reallocates per level).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coarsen import coarsen_graph
from ..core.csr import CompressedAdj, Graph, from_edgelist
from ..core.convert import decompress_to_edgelist, induced_subgraph
from ..prims.keyed import aggregate_outgoing_e_by_dst_key
from ..prims.transform_e import transform_reduce_e
from ..prims.intersection import triangle_counts_per_vertex
from ..utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE, WEIGHT_DTYPE
from ..utils.error import expects


# ---------------------------------------------------------------------------
# Modularity
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=())
def _modularity_jit(g: Graph, labels: jax.Array, resolution):
    # Q = intra/m2 - r * sum_c (Sigma_c/m2)^2, m2 = total directed weight
    k = g.out_weight_sums()
    m2 = jnp.maximum(jnp.sum(k), 1e-30)

    def intra_op(s, d, sv, dv, w):
        same = (sv == dv).astype(WEIGHT_DTYPE)
        return same if w is None else same * w

    intra = transform_reduce_e(g, intra_op, src_values=labels, dst_values=labels)
    sigma = jax.ops.segment_sum(k, labels, num_segments=g.num_vertices)
    return intra / m2 - resolution * jnp.sum((sigma / m2) ** 2)


def modularity(g: Graph, labels, resolution: float = 1.0) -> float:
    """Modularity of a clustering (ref: common_methods.cuh
    compute_modularity). Graph must be symmetric (each undirected edge
    stored in both directions)."""
    expects(g.is_symmetric, "modularity requires a symmetric graph")
    return float(
        _modularity_jit(
            g, jnp.asarray(labels, jnp.int32), jnp.asarray(resolution, WEIGHT_DTYPE)
        )
    )


# ---------------------------------------------------------------------------
# Louvain
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_sweeps",))
def _louvain_one_level(
    g: Graph, resolution, max_sweeps: int, labels0=None, constraint=None
):
    """Local-moving phase: returns (labels, num_moves_total).

    Candidate score for vertex v and cluster c (constants in v dropped):
        f(v, c) = w_{v->c\\{v}} - resolution * k_v * Sigma_{c\\{v}} / m2
    move to argmax_c f if it strictly beats staying (f_own), with the
    up/down alternation (even sweeps: only moves to larger labels; odd:
    smaller) preventing two-cycle oscillation of the synchronous update.

    labels0: initial assignment (default singletons). constraint: a (V,)
    community array restricting moves to clusters whose members share the
    vertex's constraint community — the Leiden refinement phase
    (ref: leiden_impl.cuh refine step).
    """
    v = g.num_vertices
    k = g.out_weight_sums()
    m2 = jnp.maximum(jnp.sum(k), 1e-30)

    # self-loop weight per vertex (w_vc to own cluster includes it; exclude)
    adj = g.csr()
    self_mask = (adj.majors == adj.minors) & adj.valid()
    w_all = adj.edge_weights_or_ones()
    self_w = jax.ops.segment_sum(
        jnp.where(self_mask, w_all, 0.0), adj.majors, num_segments=v + 1
    )[:v]

    def sweep(state):
        labels, total_moves, it = state
        sigma = jax.ops.segment_sum(k, labels, num_segments=v)
        srcs, keys, w_vc, run_valid = aggregate_outgoing_e_by_dst_key(g, labels)
        s_safe = jnp.minimum(srcs, v - 1)
        lv = jnp.take(labels, s_safe)
        kv = jnp.take(k, s_safe)
        own = keys == lv
        sig_c = jnp.take(sigma, jnp.minimum(keys, v - 1)) - jnp.where(own, kv, 0.0)
        w_adj = w_vc - jnp.where(own, jnp.take(self_w, s_safe), 0.0)
        score = w_adj - resolution * kv * sig_c / m2
        # up/down constraint (ref: common_methods.cuh up_down flag)
        up = (it % 2) == 0
        allowed = run_valid & (~own) & jnp.where(up, keys > lv, keys < lv)
        if constraint is not None:
            # refinement: moves stay within the vertex's parent community
            # (labels are vertex ids, so constraint[key] is the candidate
            # cluster's parent community)
            c_k = jnp.take(constraint, jnp.minimum(keys, v - 1))
            c_v = jnp.take(constraint, s_safe)
            allowed = allowed & (c_k == c_v)
        neg_inf = jnp.asarray(-jnp.inf, WEIGHT_DTYPE)
        seg = jnp.where(run_valid, srcs, v)
        best = jax.ops.segment_max(
            jnp.where(allowed, score, neg_inf), seg, num_segments=v + 1
        )[:v]
        # tie-break: smallest key among runs achieving the max
        at_best = allowed & (score >= jnp.take(best, s_safe) - 0.0)
        best_key = jax.ops.segment_min(
            jnp.where(at_best, keys, v), seg, num_segments=v + 1
        )[:v]
        # score of staying
        own_w = jax.ops.segment_sum(
            jnp.where(run_valid & own, w_adj, 0.0), seg, num_segments=v + 1
        )[:v]
        score_own = own_w - resolution * k * (jnp.take(sigma, labels) - k) / m2
        do_move = (best > score_own + 1e-9) & (best_key < v)
        new_labels = jnp.where(do_move, best_key, labels).astype(jnp.int32)
        moves = jnp.sum(do_move.astype(jnp.int32))
        return new_labels, total_moves + moves, it + 1

    # run sweeps until a full up+down pair makes no move
    def pair_cond(state):
        labels, moves_last_pair, total, it = state
        return (moves_last_pair > 0) & (it < max_sweeps)

    def pair_body(state):
        labels, _, total, it = state
        l1, m1, it1 = sweep((labels, jnp.int32(0), it))
        l2, m_pair, it2 = sweep((l1, m1, it1))
        return l2, m_pair, total + m_pair, it2

    init = (
        jnp.arange(v, dtype=jnp.int32)
        if labels0 is None
        else jnp.asarray(labels0, jnp.int32)
    )
    labels, _, total_moves, _ = jax.lax.while_loop(
        pair_cond, pair_body, (init, jnp.int32(1), jnp.int32(0), jnp.int32(0))
    )
    return labels, total_moves


def louvain(
    g: Graph,
    max_level: int = 100,
    resolution: float = 1.0,
    threshold: float = 1e-7,
) -> Tuple[jax.Array, float]:
    """Louvain clustering. Returns (labels (V,), final modularity).

    ref: louvain_impl.cuh — outer dendrogram loop (:71) with inner
    delta-modularity sweeps and graph contraction per level (:224)."""
    expects(g.is_symmetric, "louvain requires a symmetric graph")
    cur = g
    mapping = np.arange(g.num_vertices, dtype=NP_VERTEX_DTYPE)
    res = jnp.asarray(resolution, WEIGHT_DTYPE)
    best_q = modularity(g, jnp.asarray(mapping), resolution)  # singletons
    labels_full = mapping.copy()
    for _level in range(max_level):
        labels, moves = _louvain_one_level(cur, res, max_sweeps=64)
        if int(moves) == 0:
            break
        labels_np = np.asarray(labels)
        coarse, cluster_ids = coarsen_graph(cur, labels_np)
        # compact labels: vertex -> index of its cluster in coarse graph
        compact = np.searchsorted(cluster_ids, labels_np).astype(NP_VERTEX_DTYPE)
        # evaluate the level on a candidate copy; only commit if it improves
        # (else the returned labels would belong to the rejected level while
        # best_q reports the previous one — an inconsistent pair)
        cand_full = compact[labels_full]
        q = modularity(g, jnp.asarray(cand_full), resolution)
        if q <= best_q + threshold:
            break
        labels_full = cand_full
        best_q = q
        cur = coarse
        if coarse.num_vertices == cur.num_vertices and coarse.num_vertices <= 1:
            break
    return jnp.asarray(labels_full), float(best_q)


def leiden(
    g: Graph,
    max_level: int = 100,
    resolution: float = 1.0,
    threshold: float = 1e-7,
) -> Tuple[jax.Array, float]:
    """Leiden clustering (Traag et al. 2019; ref: leiden_impl.cuh).

    Each level: (1) Louvain local moving produces partition P (seeded by
    the previous level's projected communities); (2) a REFINEMENT pass
    restarts from singletons and moves vertices only within their P
    community — splitting badly-connected communities; (3) the graph is
    aggregated on the REFINED partition while P seeds the next level.
    Communities in the returned clustering are internally connected (the
    Leiden guarantee Louvain lacks)."""
    expects(g.is_symmetric, "leiden requires a symmetric graph")
    cur = g
    refc = np.arange(g.num_vertices, dtype=NP_VERTEX_DTYPE)  # orig -> cur id
    res = jnp.asarray(resolution, WEIGHT_DTYPE)
    best_labels = refc.copy()
    best_q = modularity(g, jnp.asarray(refc), resolution)
    labels0 = None  # level 0 starts from singletons
    for _level in range(max_level):
        p_lab, moves = _louvain_one_level(cur, res, 64, labels0=labels0)
        if int(moves) == 0 and _level > 0:
            break
        r_lab, _ = _louvain_one_level(cur, res, 32, constraint=p_lab)
        p_np = np.asarray(p_lab)
        r_np = np.asarray(r_lab)
        cand = p_np[refc]  # reported partition = move phase, flattened
        q = modularity(g, jnp.asarray(cand), resolution)
        if q <= best_q + threshold:
            break
        best_q = q
        best_labels = cand
        coarse, cluster_ids = coarsen_graph(cur, r_np)
        compact_r = np.searchsorted(cluster_ids, r_np).astype(NP_VERTEX_DTYPE)
        refc = compact_r[refc]
        # seed next level with P projected onto the refined clusters
        _, labels0 = np.unique(p_np[cluster_ids], return_inverse=True)
        labels0 = jnp.asarray(labels0.astype(NP_VERTEX_DTYPE))
        cur = coarse
        if coarse.num_vertices <= 1:
            break
    # canonicalize labels to [0, n_communities)
    _, out = np.unique(best_labels, return_inverse=True)
    return jnp.asarray(out.astype(NP_VERTEX_DTYPE)), float(best_q)


# ---------------------------------------------------------------------------
# Triangle counting / k-truss
# ---------------------------------------------------------------------------


def _oriented_adj(g: Graph) -> Tuple[CompressedAdj, int]:
    """Degree-ordered DAG orientation: keep edges src < dst (internal ids are
    degree-descending, so src < dst orients low-id/high-degree -> high-id)."""
    src, dst, _ = decompress_to_edgelist(g)
    keep = src < dst
    from ..core.csr import _build_adj_np

    adj = _build_adj_np(src[keep], dst[keep], None, g.num_vertices, g.num_vertices)
    max_deg = int(np.max(np.diff(np.asarray(adj.offsets)))) if adj.num_edges else 1
    return adj, max(max_deg, 1)


def triangle_count(g: Graph) -> jax.Array:
    """Per-vertex triangle counts (ref: triangle_count_impl.cuh).

    Requires a symmetric graph; multi-edges/self-loops are ignored by the
    orientation."""
    expects(g.is_symmetric, "triangle_count requires a symmetric graph")
    oriented, max_deg = _oriented_adj(g)
    return triangle_counts_per_vertex(
        oriented, g.num_vertices, max_oriented_degree=max_deg
    )


def ktruss(g: Graph, k: int) -> Graph:
    """Maximal k-truss subgraph (ref: community/legacy/ktruss.cu).

    Host peeling loop: per-edge triangle support via the intersection prim,
    drop edges with support < k-2 until stable."""
    expects(g.is_symmetric, "ktruss requires a symmetric graph")
    src, dst, w = decompress_to_edgelist(g)
    keep = src < dst
    src, dst = src[keep], dst[keep]
    wk = w[keep] if w is not None else None
    while len(src):
        und = from_edgelist(
            src, dst, wk, num_vertices=g.num_vertices, symmetrize=True
        )
        oriented, max_deg = _oriented_adj(und)
        # support per oriented edge = common neighbors in the full graph
        from ..prims.intersection import _candidate_tile, _contains_sorted

        adj = und.csr()
        o_src, o_dst = oriented.majors, oriented.minors
        valid = oriented.valid()
        cand, mask = _candidate_tile(
            adj, np.minimum(np.asarray(o_src), g.num_vertices - 1), int(np.max(und.out_degrees()))
        )
        lo = jnp.take(adj.offsets, jnp.minimum(o_dst, g.num_vertices - 1))[:, None]
        hi = jnp.take(adj.offsets, jnp.minimum(o_dst, g.num_vertices - 1) + 1)[:, None]
        member = _contains_sorted(adj.minors, lo, hi, cand) & mask & valid[:, None]
        support = np.asarray(jnp.sum(member, axis=1))[: oriented.num_edges]
        osrc = np.asarray(o_src[: oriented.num_edges])
        odst = np.asarray(o_dst[: oriented.num_edges])
        strong = support >= (k - 2)
        if strong.all():
            break
        # keep surviving edges: vectorized membership via sorted keys
        vkey = np.int64(g.num_vertices) + 1
        skeys = np.sort(osrc[strong].astype(np.int64) * vkey + odst[strong])
        ekeys = src.astype(np.int64) * vkey + dst
        pos = np.searchsorted(skeys, ekeys)
        pos = np.minimum(pos, max(len(skeys) - 1, 0))
        sel = len(skeys) > 0 and (skeys[pos] == ekeys)
        sel = sel if isinstance(sel, np.ndarray) else np.zeros(len(src), bool)
        src, dst = src[sel], dst[sel]
        if wk is not None:
            wk = wk[sel]
    return from_edgelist(
        src, dst, wk, num_vertices=g.num_vertices, symmetrize=True
    )


# ---------------------------------------------------------------------------
# ECG / ego graph
# ---------------------------------------------------------------------------


def ecg(
    g: Graph,
    min_weight: float = 0.05,
    ensemble_size: int = 16,
    seed: int = 0,
    resolution: float = 1.0,
) -> Tuple[jax.Array, float]:
    """Ensemble clustering for graphs (ref: community/legacy/ecg.cu):
    run Louvain's first level on ``ensemble_size`` randomly perturbed
    weightings, reweight edges by co-cluster frequency, final full Louvain."""
    expects(g.is_symmetric, "ecg requires a symmetric graph")
    src, dst, w = decompress_to_edgelist(g)
    if w is None:
        w = np.ones(len(src), dtype=NP_WEIGHT_DTYPE)
    rng = np.random.default_rng(seed)
    co = np.zeros(len(src), dtype=NP_WEIGHT_DTYPE)
    res = jnp.asarray(resolution, WEIGHT_DTYPE)
    for _ in range(ensemble_size):
        perturbed = w * rng.uniform(0.5, 1.5, size=len(w)).astype(NP_WEIGHT_DTYPE)
        gp = from_edgelist(
            src, dst, perturbed, num_vertices=g.num_vertices, is_symmetric=True
        )
        labels, _ = _louvain_one_level(gp, res, max_sweeps=16)
        labels_np = np.asarray(labels)
        co += (labels_np[src] == labels_np[dst]).astype(NP_WEIGHT_DTYPE)
    new_w = (min_weight + (1.0 - min_weight) * co / ensemble_size).astype(
        NP_WEIGHT_DTYPE
    )
    gw = from_edgelist(src, dst, new_w, num_vertices=g.num_vertices, is_symmetric=True)
    return louvain(gw, resolution=resolution)


def ego_graph(g: Graph, seed_vertex: int, radius: int = 1) -> Tuple[Graph, np.ndarray]:
    """Induced subgraph of vertices within ``radius`` hops of the seed
    (ref: community/legacy/egonet.cu; batched variant in the service API)."""
    from .traversal import INVALID_DISTANCE, bfs

    dist, _ = bfs(g, seed_vertex, depth_limit=radius)
    inside = np.nonzero(
        (np.asarray(dist) != INVALID_DISTANCE) & (np.asarray(dist) <= radius)
    )[0]
    return induced_subgraph(g, inside)


# ---------------------------------------------------------------------------
# Spectral clustering + clustering quality metrics
# ---------------------------------------------------------------------------


def _kmeans(x: np.ndarray, k: int, seed: int = 0, iters: int = 50) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            pts = x[assign == c]
            if len(pts):
                centers[c] = pts.mean(0)
    return assign.astype(NP_VERTEX_DTYPE)


def spectral_balanced_cut_clustering(
    g: Graph, num_clusters: int, num_eigenvectors: int = 2, seed: int = 0
) -> jax.Array:
    """Balanced-cut spectral clustering via normalized-Laplacian eigenvectors
    + k-means (ref: community/legacy/spectral_clustering.cu, which uses
    raft's Lanczos; dense eigh here — the legacy API targets small graphs).

    HOST FALLBACK: eigensolver + k-means run on host scipy, not the TPU;
    O(V^2)-ish time at scale. Use the prims-backed community algorithms
    (louvain/leiden) for large graphs."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    src, dst, w = decompress_to_edgelist(g)
    if w is None:
        w = np.ones(len(src), dtype=np.float64)
    v = g.num_vertices
    a = sp.coo_matrix((w, (src, dst)), shape=(v, v)).tocsr()
    deg = np.asarray(a.sum(axis=1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    lap = sp.eye(v) - sp.diags(dinv) @ a @ sp.diags(dinv)
    k = min(num_eigenvectors + 1, v - 1)
    _, vecs = spla.eigsh(lap, k=k, which="SM")
    emb = vecs[:, 1 : num_eigenvectors + 1]
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    return jnp.asarray(_kmeans(emb, num_clusters, seed))


def spectral_modularity_maximization_clustering(
    g: Graph, num_clusters: int, num_eigenvectors: int = 2, seed: int = 0
) -> jax.Array:
    """Modularity-maximization spectral clustering (ref: same file, using the
    modularity matrix B = A - k k^T / 2m)."""
    src, dst, w = decompress_to_edgelist(g)
    if w is None:
        w = np.ones(len(src), dtype=np.float64)
    v = g.num_vertices
    a = np.zeros((v, v))
    a[src, dst] = w
    deg = a.sum(1)
    m2 = max(deg.sum(), 1e-12)
    b = a - np.outer(deg, deg) / m2
    vals, vecs = np.linalg.eigh((b + b.T) / 2)
    emb = vecs[:, -num_eigenvectors:]
    return jnp.asarray(_kmeans(emb, num_clusters, seed))


def analyze_clustering_modularity(g: Graph, labels) -> float:
    """ref: algorithms.hpp:818-919 analyze_clustering family."""
    return modularity(g, labels)


def analyze_clustering_edge_cut(g: Graph, labels) -> float:
    labels = jnp.asarray(labels, jnp.int32)

    def cut_op(s, d, sv, dv, w):
        diff = (sv != dv).astype(WEIGHT_DTYPE)
        return diff if w is None else diff * w

    cut = transform_reduce_e(g, cut_op, src_values=labels, dst_values=labels)
    return float(cut) / (2.0 if g.is_symmetric else 1.0)


def analyze_clustering_ratio_cut(g: Graph, labels) -> float:
    labels_np = np.asarray(labels)
    n_clusters = int(labels_np.max()) + 1 if len(labels_np) else 0
    sizes = np.bincount(labels_np, minlength=n_clusters)
    # per-cluster cut weight
    src, dst, w = decompress_to_edgelist(g)
    if w is None:
        w = np.ones(len(src), dtype=NP_WEIGHT_DTYPE)
    cross = labels_np[src] != labels_np[dst]
    cut_per = np.zeros(n_clusters, dtype=np.float64)
    np.add.at(cut_per, labels_np[src[cross]], w[cross])
    if g.is_symmetric:
        cut_per = cut_per  # each cross edge contributes once per endpoint side
    return float(np.sum(cut_per / np.maximum(sizes, 1)))
