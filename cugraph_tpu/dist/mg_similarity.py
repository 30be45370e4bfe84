"""Distributed similarity (Jaccard / Sorensen / overlap).

ref: the MG instantiation of cpp/src/link_prediction/similarity_impl.cuh,
whose nbr_intersection gathers remote adjacency lists via device_gatherv
(prims/detail/nbr_intersection.cuh).

TPU-native: for a replicated pair list, each device contributes its local
slice of N(v1) as a fixed-width candidate tile; tiles are all_gathered
over both mesh axes (the gatherv analog), then every device tests the
full candidate set against its LOCAL slice of N(v2) by binary search over
its src-side CSR (dsts sorted within each source row). Because each
(v2, x) edge lives on exactly one device, a two-axis psum of local hit
counts yields the exact intersection size — no dedup pass needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.dtypes import WEIGHT_DTYPE
from ..utils.error import expects
from . import mg_algos
from .mg_graph import MGGraph, unshard_vertex_values

BLK3 = P("row", "col", None)


def _max_local_degree(mgg: MGGraph) -> int:
    off = np.asarray(mgg.src_nzd_offsets)  # (R, C, nz_pad+1) DCSR
    d = np.diff(off, axis=-1)
    return max(int(d.max(initial=0)), 1)


def _mg_intersection(mesh: Mesh, mgg: MGGraph, v1: jax.Array, v2: jax.Array, k: int):
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp
    n_dev = r * c

    @partial(jax.jit, static_argnames=("k",))
    def run_jit(v1, v2, k, nzd, nzd_off, csr_dsts):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), BLK3, BLK3, BLK3),
            out_specs=P(),
        )
        def run(v1, v2, nzd, nzd_off, csr_dsts):
            from . import mg_prims

            nzd = nzd[0, 0]
            nzd_off = nzd_off[0, 0]
            csr_dsts = csr_dsts[0, 0]
            j = jax.lax.axis_index("col")
            n = v1.shape[0]

            def local_slice(verts):
                local = verts - j * span
                mine = (local >= 0) & (local < span)
                safe = jnp.clip(local, 0, span - 1)
                lo, deg0 = mg_prims.dcsr_lookup(nzd, nzd_off, safe)
                deg = jnp.where(mine, deg0, 0)
                return lo, deg, mine

            lo1, deg1, mine1 = local_slice(v1)
            slot = jnp.arange(k, dtype=jnp.int32)[None, :]
            mask = slot < deg1[:, None]
            eidx = jnp.clip(lo1[:, None] + slot, 0, csr_dsts.shape[0] - 1)
            cand = jnp.where(mask, jnp.take(csr_dsts, eidx), -1)  # (n, k)
            # gatherv analog: full candidate set on every device
            cand_all = jax.lax.all_gather(cand, "row", axis=1, tiled=True)
            cand_all = jax.lax.all_gather(cand_all, "col", axis=1, tiled=True)
            # membership in local slice of N(v2): binary search in the
            # sorted dst run [lo2, lo2+deg2) of this device's src-CSR
            lo2, deg2, mine2 = local_slice(v2)
            import math

            steps = max(
                math.ceil(math.log2(max(int(csr_dsts.shape[0]), 2))) + 1, 1
            )
            q = cand_all  # (n, n_dev * k)
            lo_b = jnp.broadcast_to(lo2[:, None], q.shape)
            hi_b = jnp.broadcast_to((lo2 + deg2)[:, None], q.shape)

            def body(_, st):
                lo_, hi_ = st
                mid = (lo_ + hi_) // 2
                mv = jnp.take(csr_dsts, jnp.clip(mid, 0, csr_dsts.shape[0] - 1))
                go = mv < q
                act = lo_ < hi_
                return (
                    jnp.where(go & act, mid + 1, lo_),
                    jnp.where(~go & act, mid, hi_),
                )

            lo_f, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
            found = (lo_f < hi_b) & (
                jnp.take(csr_dsts, jnp.clip(lo_f, 0, csr_dsts.shape[0] - 1)) == q
            )
            found = found & (q >= 0) & mine2[:, None]
            inter_local = jnp.sum(found, axis=1).astype(jnp.int32)
            return jax.lax.psum(jax.lax.psum(inter_local, "row"), "col")[None]

        return run(v1, v2, nzd, nzd_off, csr_dsts)[0]

    return run_jit(v1, v2, k, mgg.src_nzd, mgg.src_nzd_offsets, mgg.src_csr_dsts)


def _mg_nbr_vertex_weight_sums(mesh: Mesh, mgg: MGGraph, vw_sharded) -> jax.Array:
    """Per-vertex sum of neighbor VERTEX weights: out[u] = sum_{(u,x)} vw[x].

    The weighted-similarity "neighborhood size" (ref similarity_impl.cuh
    weighted path sums vertex weights over each neighborhood)."""
    graph_args = mg_algos._graph_args(mgg)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple([mg_algos.BLOCK] * len(graph_args)) + (mg_algos.VERT,),
        out_specs=mg_algos.VERT,
    )
    def run(*args):
        *gargs, vw = args
        srcs, dsts, w, _ = mg_algos._split_args(tuple(gargs), mgg.weighted)
        srcs, dsts, w = mg_algos._edge_args(mgg, srcs, dsts, w)

        from . import mg_prims

        def e_op(s, d, sv, dv, ww):
            return dv

        out = mg_prims.per_v_transform_reduce_outgoing_e(
            srcs, dsts, None, mgg.vp, e_op, dst_values=vw[0, 0]
        )
        return mg_algos._wrap(out)

    return run(*graph_args, vw_sharded)


def mg_similarity(
    mesh: Mesh,
    mgg: MGGraph,
    pairs: Tuple,
    kind: str = "jaccard",
    use_weight: bool = False,
) -> jax.Array:
    """Similarity coefficients for replicated (v1, v2) pair arrays.

    use_weight=True uses the reference's weighted semantics (matches the
    SG path in algos/link_prediction.py): vertex weight w_x = sum of x's
    incident edge weights; intersection weight = sum of w_x over common
    neighbors; each endpoint's set size = sum of w_x over its own
    neighborhood."""
    expects(mgg.is_symmetric, f"{kind} requires a symmetric graph")
    v1 = jnp.atleast_1d(jnp.asarray(pairs[0], jnp.int32))
    v2 = jnp.atleast_1d(jnp.asarray(pairs[1], jnp.int32))
    k = _max_local_degree(mgg)
    vw_sharded = mg_algos.mg_out_weight_sums(mesh, mgg)
    if use_weight:
        expects(mgg.weighted, "weighted similarity requires edge weights")
        vw = np.asarray(unshard_vertex_values(mgg, vw_sharded), dtype=np.float64)
        _, members = _mg_intersection_members(mesh, mgg, v1, v2, k)
        mem = np.asarray(members)
        hit = mem >= 0
        inter = jnp.asarray(
            np.where(hit, vw[np.clip(mem, 0, mgg.num_vertices - 1)], 0.0).sum(
                axis=1
            ),
            WEIGHT_DTYPE,
        )
        nbr = np.asarray(
            unshard_vertex_values(
                mgg, _mg_nbr_vertex_weight_sums(mesh, mgg, vw_sharded)
            )
        )
        a = jnp.asarray(nbr)[v1]
        b = jnp.asarray(nbr)[v2]
    else:
        inter = _mg_intersection(mesh, mgg, v1, v2, k).astype(WEIGHT_DTYPE)
        deg = unshard_vertex_values(mgg, vw_sharded)  # unweighted: degrees
        if mgg.weighted:
            # degrees (counts), not weight sums, define set sizes
            ind = unshard_vertex_values(mgg, mg_algos.mg_in_degrees(mesh, mgg))
            deg = ind.astype(np.float32)
        a = jnp.asarray(deg)[v1]
        b = jnp.asarray(deg)[v2]
    if kind == "jaccard":
        denom = a + b - inter
    elif kind == "sorensen":
        denom = a + b
        inter = 2.0 * inter
    elif kind == "overlap":
        denom = jnp.minimum(a, b)
    else:
        raise ValueError(kind)
    return jnp.where(denom > 0, inter / jnp.maximum(denom, 1e-30), 0.0)


def mg_jaccard(mesh, mgg, pairs, use_weight: bool = False):
    return mg_similarity(mesh, mgg, pairs, "jaccard", use_weight=use_weight)


def mg_sorensen(mesh, mgg, pairs, use_weight: bool = False):
    return mg_similarity(mesh, mgg, pairs, "sorensen", use_weight=use_weight)


def mg_overlap(mesh, mgg, pairs, use_weight: bool = False):
    return mg_similarity(mesh, mgg, pairs, "overlap", use_weight=use_weight)


def mg_triangle_count(
    mesh: Mesh, mgg: MGGraph, batch_size: int = 4096
) -> np.ndarray:
    """Distributed per-vertex triangle counts.

    Degree-oriented edges (src < dst on degree-sorted ids) are enumerated
    host-side and processed in replicated batches against the DISTRIBUTED
    adjacency via the same candidate-gather intersection as similarity —
    the batching mirrors the reference's batched MG side paths
    (tests/mg/test_mg_batch_betweenness_centrality.py pattern). Returns a
    host (V,) array.
    """
    expects(mgg.is_symmetric, "triangle_count requires a symmetric graph")
    from .mg_community import mg_decompress_to_edgelist

    src, dst, _ = mg_decompress_to_edgelist(mgg)
    keep = src < dst  # orientation: each triangle edge-pair counted once
    src, dst = src[keep], dst[keep]
    k = _max_local_degree(mgg)
    counts = np.zeros(mgg.num_vertices, dtype=np.int64)
    for lo in range(0, len(src), batch_size):
        v1 = jnp.asarray(src[lo : lo + batch_size], jnp.int32)
        v2 = jnp.asarray(dst[lo : lo + batch_size], jnp.int32)
        inter, members = _mg_intersection_members(mesh, mgg, v1, v2, k)
        inter = np.asarray(inter)
        # each common neighbor x of edge (u,v) closes one triangle {u,v,x}:
        # +1 to u, +1 to v, +1 to x
        np.add.at(counts, src[lo : lo + batch_size], inter)
        np.add.at(counts, dst[lo : lo + batch_size], inter)
        mem = np.asarray(members)
        hit = mem >= 0
        np.add.at(counts, mem[hit], 1)
    # every triangle {a,b,c} is found via each of its 3 unordered edges;
    # each finding increments all 3 corners once (endpoints + third), so
    # every vertex of every triangle accumulates exactly 3.
    return (counts // 3).astype(np.int64)


def _mg_intersection_members(
    mesh: Mesh, mgg: MGGraph, v1: jax.Array, v2: jax.Array, k: int
):
    """Like _mg_intersection but also returns the matched common-neighbor
    ids, shape (n, n_dev * k), -1 where unmatched (for triangle corners)."""
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp

    @partial(jax.jit, static_argnames=("k",))
    def run_jit(v1, v2, k, nzd, nzd_off, csr_dsts):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), BLK3, BLK3, BLK3),
            out_specs=(P(), P()),
        )
        def run(v1, v2, nzd, nzd_off, csr_dsts):
            from . import mg_prims

            nzd = nzd[0, 0]
            nzd_off = nzd_off[0, 0]
            csr_dsts = csr_dsts[0, 0]
            j = jax.lax.axis_index("col")

            def local_slice(verts):
                local = verts - j * span
                mine = (local >= 0) & (local < span)
                safe = jnp.clip(local, 0, span - 1)
                lo, deg0 = mg_prims.dcsr_lookup(nzd, nzd_off, safe)
                deg = jnp.where(mine, deg0, 0)
                return lo, deg, mine

            lo1, deg1, _ = local_slice(v1)
            slot = jnp.arange(k, dtype=jnp.int32)[None, :]
            mask = slot < deg1[:, None]
            eidx = jnp.clip(lo1[:, None] + slot, 0, csr_dsts.shape[0] - 1)
            cand = jnp.where(mask, jnp.take(csr_dsts, eidx), -1)
            cand_all = jax.lax.all_gather(cand, "row", axis=1, tiled=True)
            cand_all = jax.lax.all_gather(cand_all, "col", axis=1, tiled=True)
            lo2, deg2, mine2 = local_slice(v2)
            import math

            steps = max(
                math.ceil(math.log2(max(int(csr_dsts.shape[0]), 2))) + 1, 1
            )
            q = cand_all
            lo_b = jnp.broadcast_to(lo2[:, None], q.shape)
            hi_b = jnp.broadcast_to((lo2 + deg2)[:, None], q.shape)

            def body(_, st):
                lo_, hi_ = st
                mid = (lo_ + hi_) // 2
                mv = jnp.take(csr_dsts, jnp.clip(mid, 0, csr_dsts.shape[0] - 1))
                go = mv < q
                act = lo_ < hi_
                return (
                    jnp.where(go & act, mid + 1, lo_),
                    jnp.where(~go & act, mid, hi_),
                )

            lo_f, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
            found = (lo_f < hi_b) & (
                jnp.take(csr_dsts, jnp.clip(lo_f, 0, csr_dsts.shape[0] - 1)) == q
            )
            found = found & (q >= 0) & mine2[:, None]
            inter_local = jnp.sum(found, axis=1).astype(jnp.int32)
            inter = jax.lax.psum(jax.lax.psum(inter_local, "row"), "col")
            # matched member ids: each (v2,x) edge exists on one device, so
            # max-combining (-1 elsewhere) recovers the member id
            members_local = jnp.where(found, q, -1)
            members = jax.lax.pmax(jax.lax.pmax(members_local, "row"), "col")
            return inter[None], members[None]

        i, m = run(v1, v2, nzd, nzd_off, csr_dsts)
        return i[0], m[0]

    return run_jit(v1, v2, k, mgg.src_nzd, mgg.src_nzd_offsets, mgg.src_csr_dsts)
