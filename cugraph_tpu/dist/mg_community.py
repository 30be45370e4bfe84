"""Distributed Louvain + modularity.

ref: the MG instantiation of cpp/src/community/louvain_impl.cuh — the
reference's delta-modularity sweep runs the keyed-aggregate prims under
MG comms (per_v_transform_reduce_dst_key_aggregated_outgoing_e with cuco +
shuffles); contraction reallocates a smaller graph per level.

TPU-native design:
- The level-1 local-moving sweep (the dominant cost — it runs on the full
  graph) is fully distributed: each device aggregates its own edges into
  (src, dst-cluster) runs, the runs for a column span are combined with an
  all_gather over "row" (the devices of one column jointly own all edges
  whose src lies in that span), and the re-reduced runs drive the same
  argmax/up-down move logic as the SG sweep. Cluster degree sums live as
  a (V,)-dense replicated vector (psum-merged) — the dense analog of the
  reference's distributed cluster key/value store; hypersparse compression
  of it is future work (SURVEY.md §7 "Hypersparse regime").
- Coarsening is distributed: each device relabels ITS OWN edge blocks to
  compact cluster ids on device (mg_coarsen_edge_chunks), and the chunks
  stream — one device shard at a time — through the chunked two-pass 2D
  shuffle (distribute_edgelist_chunks). The full dendrogram loop therefore
  runs on the mesh at every level; no host COO is ever materialized
  (ref: louvain_impl.cuh's per-level coarsen_graph under MG comms).
  Parallel coarse edges are kept un-coalesced — every weight path in the
  sweep (k_op, run aggregation, modularity) sums them, so coalescing is
  only a bandwidth optimization, matching the multigraph ingest contract.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE, WEIGHT_DTYPE
from ..utils.error import expects
from . import mg_prims
from .mg_algos import (
    BLK3,
    BLOCK,
    VERT,
    _edge_args,
    _graph_args,
    _local_ids,
    _pvary,
    _split_args,
    _wrap,
)
from .mg_graph import MGGraph, unshard_vertex_values


def mg_decompress_to_edgelist(mgg: MGGraph):
    """Sharded blocks -> host COO (src, dst, weight) with global ids.

    Vectorized mask-based extraction (padding slots carry dst == vp)."""
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    srcs = np.asarray(mgg.srcs)  # (R, C, C, R, g_pad)
    dsts = np.asarray(mgg.dsts)
    w = None if mgg.weights is None else np.asarray(mgg.weights)
    i_ix, j_ix, b_ix, _, _ = np.indices(srcs.shape, sparse=True)
    valid = dsts < vp
    src = (srcs + j_ix * r * vp)[valid]
    dst = (dsts + (b_ix * r + i_ix) * vp)[valid]
    ww = w[valid] if w is not None else None
    return src.astype(NP_VERTEX_DTYPE), dst.astype(NP_VERTEX_DTYPE), ww


def mg_modularity(mesh: Mesh, mgg: MGGraph, labels_sharded, resolution: float = 1.0):
    """Distributed modularity of a sharded labeling."""
    v = mgg.num_vertices

    @jax.jit
    def run_jit(res, labels, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(VERT,) + tuple([BLOCK] * len(args)),
            out_specs=P(),
        )
        def run(labels_l, *gargs):
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            lab = labels_l[0, 0]

            def k_op(s, d, sv, dv, ww):
                return ww if ww is not None else jnp.ones(s.shape, WEIGHT_DTYPE)

            k = mg_prims.per_v_transform_reduce_outgoing_e(
                srcs, dsts, w, mgg.vp, k_op
            )
            m2 = jnp.maximum(mg_prims.transform_reduce_v(k), 1e-30)

            def intra_op(s, d, sv, dv, ww):
                same = (sv == dv).astype(WEIGHT_DTYPE)
                return same if ww is None else same * ww

            e_same = mg_prims._edge_values(
                srcs, dsts, w, mgg.vp, intra_op, lab, lab
            )
            valid = dsts < mgg.vp
            intra_local = jnp.sum(jnp.where(valid, e_same, 0.0))
            intra = jax.lax.psum(jax.lax.psum(intra_local, "row"), "col")
            # Sigma over dense cluster space, replicated via psum
            vtot = mgg.rows * mgg.cols * mgg.vp
            sig_local = jax.ops.segment_sum(k, lab, num_segments=vtot)
            sigma = jax.lax.psum(jax.lax.psum(sig_local, "row"), "col")
            return intra / m2 - res * jnp.sum((sigma / m2) ** 2)

        return run(labels, *args)

    return float(
        run_jit(jnp.asarray(resolution, WEIGHT_DTYPE), labels_sharded, *_graph_args(mgg))
    )


def _mg_louvain_one_level(
    mesh: Mesh,
    mgg: MGGraph,
    resolution: float,
    max_sweeps: int,
    cluster_state: str = "auto",
    state_capacity: int = 0,
    labels0_sharded=None,
    constraint_sharded=None,
):
    """Distributed local-moving phase. Returns (labels (R,C,vp) sharded
    with GLOBAL cluster ids, total moves).

    cluster_state: "dense" keeps the (vtot,)-replicated sigma vector
    (psum per sweep — O(V) memory/allreduce per device, fine to ~2^22);
    "hypersparse" holds sigma with each cluster id's OWNER device and
    fetches the values actually touched via the keyed shuffles
    (cluster_weight_sums + collect_values_for_keys) — per-device memory
    ∝ vp, the reference's cuco kv-store scheme
    (per_v_transform_reduce_dst_key_aggregated_outgoing_e.cuh).
    "auto" picks hypersparse past 2^22 total vertex slots.
    state_capacity: per-bucket shuffle capacity (0 = vp).

    labels0_sharded: sharded (R,C,vp) initial assignment (default
    singletons = global vertex ids). constraint_sharded: sharded (R,C,vp)
    parent partition restricting moves to clusters whose root vertex
    shares the mover's constraint community — the Leiden refinement phase
    (ref leiden_impl.cuh refine step). The constraint lookup replicates a
    (vtot,) community vector per sweep (same O(V) class as dense sigma)."""
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp
    vtot = r * c * vp
    if cluster_state == "auto":
        cluster_state = "hypersparse" if vtot > (1 << 22) else "dense"
    hyper = cluster_state == "hypersparse"
    # capacity floor: coarse dendrogram levels have tiny vp but still
    # route up to one aggregated entry per device per popular cluster
    cap = int(state_capacity) or max(vp, 8 * r * c, 256)
    use_l0 = labels0_sharded is not None
    use_con = constraint_sharded is not None
    extra = []
    if use_l0:
        extra.append(labels0_sharded)
    if use_con:
        extra.append(constraint_sharded)
    n_extra = len(extra)

    @partial(jax.jit, static_argnames=("max_sweeps",))
    def run_jit(res, max_sweeps, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple([VERT] * n_extra)
            + tuple([BLOCK] * (len(args) - n_extra)),
            out_specs=(VERT, P(), P()),
        )
        def run(*gargs):
            vert_in = gargs[:n_extra]
            gargs = gargs[n_extra:]
            k_extra = 0
            l0_l = con_l = None
            if use_l0:
                l0_l = vert_in[k_extra][0, 0]
                k_extra += 1
            if use_con:
                con_l = vert_in[k_extra][0, 0]
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)
            i_ax = jax.lax.axis_index("row")
            valid = (dsts < vp).reshape(-1)
            flat_src = srcs.reshape(-1)  # colspan-local ids
            ew = (
                w.reshape(-1)
                if w is not None
                else valid.astype(WEIGHT_DTYPE)
            )
            ew = jnp.where(valid, ew, 0.0)

            def k_op(s, d, sv, dv, ww):
                return ww if ww is not None else jnp.ones(s.shape, WEIGHT_DTYPE)

            k_local = mg_prims.per_v_transform_reduce_outgoing_e(
                srcs, dsts, w, vp, k_op
            )
            m2 = jnp.maximum(mg_prims.transform_reduce_v(k_local), 1e-30)
            k_span = mg_prims.gather_src_values(k_local)  # (span,)

            # self-loop weight per colspan vertex
            src_g, dst_g = mg_prims._global_edge_ids(srcs, dsts, vp)
            is_self = (src_g.reshape(-1) == dst_g.reshape(-1)) & valid
            selfw_local = jax.ops.segment_sum(
                jnp.where(is_self, ew, 0.0), flat_src, num_segments=span + 1
            )[:span]
            selfw_span = jax.lax.psum(selfw_local, "row")

            def sweep(state):
                labels, total_moves, ovf, it = state
                dst_idx = jnp.minimum(dsts.reshape(c, -1), vp - 1)
                lab_blocks = mg_prims.gather_dst_values(labels)
                key = jnp.take_along_axis(
                    lab_blocks, dst_idx, axis=1
                ).reshape(-1)
                key = jnp.where(valid, key, vtot)
                if hyper:
                    # sigma with each cluster's owner; fetch the values
                    # this device touches: per-vertex sigma[label[u]]
                    # (one vp-sized collect), then the standard block /
                    # span gathers align them with edges
                    sigma_own, ov1 = mg_prims.cluster_weight_sums(
                        labels, k_local, vmask, vp, cap
                    )
                    sig_mine, _found, ov2 = (
                        mg_prims.collect_values_for_unique_keys(
                            labels, vmask, sigma_own, vp, cap
                        )
                    )
                    ovf = ovf + ov1 + ov2
                    sig_blocks = mg_prims.gather_dst_values(sig_mine)
                    sig_e = jnp.take_along_axis(
                        sig_blocks, dst_idx, axis=1
                    ).reshape(-1)
                    sig_span = mg_prims.gather_src_values(sig_mine)
                else:
                    # Sigma replicated over dense cluster space
                    sig_local = jax.ops.segment_sum(
                        k_local, labels, num_segments=vtot
                    )
                    sigma = jax.lax.psum(
                        jax.lax.psum(sig_local, "row"), "col"
                    )
                    sig_e = jnp.zeros_like(ew)  # threaded but unused
                # local (src, key) run aggregation via two stable sorts
                o1 = jnp.argsort(key, stable=True)
                s1, k1, w1, g1 = flat_src[o1], key[o1], ew[o1], sig_e[o1]
                o2 = jnp.argsort(s1, stable=True)
                s2, k2, w2, g2 = s1[o2], k1[o2], w1[o2], g1[o2]
                # gather runs of the whole column (axis "row")
                sg = jax.lax.all_gather(s2, "row", axis=0, tiled=True)
                kg = jax.lax.all_gather(k2, "row", axis=0, tiled=True)
                wg = jax.lax.all_gather(w2, "row", axis=0, tiled=True)
                gg = jax.lax.all_gather(g2, "row", axis=0, tiled=True)
                vg = kg < vtot
                # re-sort combined runs by (src, key)
                o3 = jnp.argsort(kg, stable=True)
                s3, k3, w3, g3 = sg[o3], kg[o3], wg[o3], gg[o3]
                o4 = jnp.argsort(s3, stable=True)
                s4, k4, w4, g4 = s3[o4], k3[o4], w3[o4], g3[o4]
                v4 = k4 < vtot
                first = jnp.concatenate(
                    [jnp.ones((1,), bool), (s4[1:] != s4[:-1]) | (k4[1:] != k4[:-1])]
                )
                run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
                n_slots = s4.shape[0]
                agg = jax.ops.segment_sum(
                    jnp.where(v4, w4, 0.0), run_id, num_segments=n_slots,
                    indices_are_sorted=True,
                )
                run_valid = first & v4
                slot_agg = jnp.take(agg, run_id)
                # labels over the colspan
                lab_span = mg_prims.gather_src_values(labels)
                s_safe = jnp.minimum(s4, span - 1)
                lv = jnp.take(lab_span, s_safe)
                kv = jnp.take(k_span, s_safe)
                own = k4 == lv
                sig_k4 = (
                    g4
                    if hyper
                    else jnp.take(sigma, jnp.minimum(k4, vtot - 1))
                )
                sig_c = sig_k4 - jnp.where(own, kv, 0.0)
                w_adj = slot_agg - jnp.where(own, jnp.take(selfw_span, s_safe), 0.0)
                score = w_adj - res * kv * sig_c / m2
                up = (it % 2) == 0
                allowed = run_valid & (~own) & jnp.where(up, k4 > lv, k4 < lv)
                if use_con:
                    # Leiden refinement: candidate cluster ids are global
                    # vertex ids, so constraint[k4] is the candidate's
                    # parent community. Replicate the (vtot,) community
                    # vector: colspan gather over "row" (global order
                    # within the span), then "col" (spans concatenate in
                    # global id order).
                    con_span = mg_prims.gather_src_values(con_l)
                    con_full = jax.lax.all_gather(
                        con_span, "col", axis=0, tiled=True
                    )
                    c_k = jnp.take(con_full, jnp.minimum(k4, vtot - 1))
                    c_v = jnp.take(con_span, s_safe)
                    allowed = allowed & (c_k == c_v)
                neg_inf = jnp.asarray(-jnp.inf, WEIGHT_DTYPE)
                seg = jnp.where(run_valid, s4, span)
                best = jax.ops.segment_max(
                    jnp.where(allowed, score, neg_inf), seg, num_segments=span + 1
                )[:span]
                at_best = allowed & (score >= jnp.take(best, s_safe))
                best_key = jax.ops.segment_min(
                    jnp.where(at_best, k4, vtot), seg, num_segments=span + 1
                )[:span]
                own_w = jax.ops.segment_sum(
                    jnp.where(run_valid & own, w_adj, 0.0), seg,
                    num_segments=span + 1,
                )[:span]
                sig_lab_span = (
                    sig_span
                    if hyper
                    else jnp.take(sigma, jnp.minimum(lab_span, vtot - 1))
                )
                score_own = own_w - res * k_span * (
                    sig_lab_span - k_span
                ) / m2
                do_move = (best > score_own + 1e-9) & (best_key < vtot)
                new_span = jnp.where(do_move, best_key, lab_span).astype(jnp.int32)
                # my own range sits at offset i*vp within the column span
                new_local = jax.lax.dynamic_slice_in_dim(
                    new_span, i_ax * vp, vp, axis=0
                )
                moved = mg_prims.transform_reduce_v(
                    (new_local != labels).astype(jnp.int32)
                )
                return new_local, total_moves + moved, ovf, it + 1

            def pair_cond(state):
                labels, last_pair, total, ovf, it = state
                return (last_pair > 0) & (it < max_sweeps)

            def pair_body(state):
                labels, _, total, ovf, it = state
                l1, m1, ov1, it1 = sweep((labels, jnp.int32(0), ovf, it))
                l2, m_pair, ov2, it2 = sweep((l1, m1, ov1, it1))
                return l2, m_pair, total + m_pair, ov2, it2

            labels0 = l0_l if use_l0 else gid  # default: singletons
            labels, _, total, ovf, _ = jax.lax.while_loop(
                pair_cond,
                pair_body,
                (labels0, jnp.int32(1), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            )
            return _wrap(labels), total, ovf

        return run(*args)

    return run_jit(
        jnp.asarray(resolution, WEIGHT_DTYPE), max_sweeps,
        *extra, *_graph_args(mgg),
    )


def mg_coarsen_edge_chunks(mesh: Mesh, mgg: MGGraph, labels_sharded, old_to_new):
    """Device-side edge relabeling for contraction.

    Each device maps its edge blocks (u, v, w) -> (c(u), c(v), w) with the
    compact cluster map old_to_new ((vtot,) int32, -1 for unused) and the
    already-sharded labels; invalid/padding slots come back as cu = -1.
    Returns a zero-arg callable yielding one (cu, cv, w) numpy chunk per
    device — the ChunkSource for distribute_edgelist_chunks. Only one
    device shard is host-resident at a time (ref: coarsen_graph under MG
    comms, coarsen_graph_impl.cuh)."""
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp

    @jax.jit
    def relabel_jit(o2n, labels, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), VERT) + tuple([BLOCK] * len(args)),
            out_specs=(BLK3, BLK3, BLK3),
        )
        def run(o2n_r, labels_l, *gargs):
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            labels_l = labels_l[0, 0]
            lab_span = mg_prims.gather_src_values(labels_l)  # (span,)
            lab_blocks = mg_prims.gather_dst_values(labels_l)  # (C, vp)
            valid = (dsts < vp).reshape(-1)
            flat_src = srcs.reshape(-1)
            cu_g = jnp.take(lab_span, jnp.minimum(flat_src, span - 1))
            cv_g = jnp.take_along_axis(
                lab_blocks, jnp.minimum(dsts.reshape(c, -1), vp - 1), axis=1
            ).reshape(-1)
            cu = jnp.take(o2n_r, cu_g)
            cv = jnp.take(o2n_r, cv_g)
            cu = jnp.where(valid, cu, -1)
            cv = jnp.where(valid, cv, -1)
            ew = (
                w.reshape(-1)
                if w is not None
                else jnp.ones_like(cu, WEIGHT_DTYPE)
            )
            return _wrap(cu), _wrap(cv), _wrap(ew.astype(WEIGHT_DTYPE))

        return run(o2n, labels, *args)

    cu_all, cv_all, w_all = relabel_jit(
        jnp.asarray(old_to_new, jnp.int32), labels_sharded, *_graph_args(mgg)
    )

    def chunks():
        for i in range(r):
            for j in range(c):
                cu = np.asarray(cu_all[i, j])
                cv = np.asarray(cv_all[i, j])
                ww = np.asarray(w_all[i, j])
                keep = cu >= 0
                yield cu[keep], cv[keep], ww[keep]

    return chunks


def mg_louvain(
    mesh: Mesh,
    mgg: MGGraph,
    max_level: int = 100,
    resolution: float = 1.0,
    threshold: float = 1e-7,
    cluster_state: str = "auto",
    state_capacity: int = 0,
) -> Tuple[np.ndarray, float]:
    """Distributed Louvain: the FULL dendrogram runs on the mesh — each
    level is a distributed local-moving phase followed by a distributed
    contraction (device relabel -> chunked 2D shuffle). Only O(V)-sized
    label vectors touch the host between levels. Returns
    (labels (V,) numpy, modularity)."""
    from .mg_graph import distribute_edgelist_chunks, shard_vertex_values

    expects(mgg.is_symmetric, "louvain requires a symmetric graph")
    cur = mgg
    labels_global: np.ndarray = np.arange(mgg.num_vertices, dtype=NP_VERTEX_DTYPE)
    best_labels = labels_global
    best_q = mg_modularity(
        mesh, mgg, shard_vertex_values(mesh, mgg, labels_global), resolution
    )
    level = 0
    while level < max_level:
        labels_sh, moves, ovf = _mg_louvain_one_level(
            mesh, cur, resolution, max_sweeps=64,
            cluster_state=cluster_state, state_capacity=state_capacity,
        )
        expects(
            int(ovf) == 0,
            "mg_louvain hypersparse shuffle overflow: raise state_capacity",
        )
        if int(moves) == 0:
            break
        lab = unshard_vertex_values(cur, labels_sh)
        uniq = np.unique(lab)
        compact = np.searchsorted(uniq, lab).astype(NP_VERTEX_DTYPE)
        cand = compact[labels_global]
        q = mg_modularity(
            mesh, mgg, shard_vertex_values(mesh, mgg, cand), resolution
        )
        if q <= best_q + threshold:
            break
        best_q, best_labels, labels_global = q, cand, cand
        if len(uniq) == cur.num_vertices:
            break  # no contraction progress
        old_to_new = np.full(
            cur.rows * cur.cols * cur.vp, -1, dtype=NP_VERTEX_DTYPE
        )
        old_to_new[uniq] = np.arange(len(uniq), dtype=NP_VERTEX_DTYPE)
        chunks = mg_coarsen_edge_chunks(mesh, cur, labels_sh, old_to_new)
        cur = distribute_edgelist_chunks(
            mesh, chunks, num_vertices=len(uniq), is_symmetric=True
        )
        level += 1
    return best_labels.astype(NP_VERTEX_DTYPE), float(best_q)


def mg_leiden(
    mesh: Mesh,
    mgg: MGGraph,
    max_level: int = 100,
    resolution: float = 1.0,
    threshold: float = 1e-7,
    cluster_state: str = "auto",
    state_capacity: int = 0,
) -> Tuple[np.ndarray, float]:
    """Distributed Leiden (Traag et al. 2019; ref leiden_impl.cuh — a
    thin wrapper over the Louvain machinery there too). Same level
    structure as the SG algos/community.leiden: (1) distributed local
    moving produces partition P (seeded by the previous level's projected
    communities), (2) a constrained re-move restarts from singletons and
    moves vertices only within their P community (the refinement that
    guarantees internally-connected communities), (3) the graph is
    contracted on the REFINED partition while P seeds the next level.
    All phases are the mesh Louvain sweeps (keyed shuffles / dense sigma
    per cluster_state); only O(V) label vectors touch the host between
    levels. Returns (labels (V,) numpy, modularity)."""
    from .mg_graph import distribute_edgelist_chunks, shard_vertex_values

    expects(mgg.is_symmetric, "leiden requires a symmetric graph")
    cur = mgg
    refc = np.arange(mgg.num_vertices, dtype=NP_VERTEX_DTYPE)  # orig -> cur
    best_labels = refc.copy()
    best_q = mg_modularity(
        mesh, mgg, shard_vertex_values(mesh, mgg, refc), resolution
    )
    labels0_np = None
    for level in range(max_level):
        l0_sh = (
            shard_vertex_values(mesh, cur, labels0_np)
            if labels0_np is not None
            else None
        )
        p_sh, moves, ovf = _mg_louvain_one_level(
            mesh, cur, resolution, max_sweeps=64,
            cluster_state=cluster_state, state_capacity=state_capacity,
            labels0_sharded=l0_sh,
        )
        expects(
            int(ovf) == 0,
            "mg_leiden hypersparse shuffle overflow: raise state_capacity",
        )
        if int(moves) == 0 and level > 0:
            break
        r_sh, _, ovf2 = _mg_louvain_one_level(
            mesh, cur, resolution, max_sweeps=32,
            cluster_state=cluster_state, state_capacity=state_capacity,
            constraint_sharded=p_sh,
        )
        expects(int(ovf2) == 0, "mg_leiden refinement shuffle overflow")
        p_np = np.asarray(unshard_vertex_values(cur, p_sh))
        r_np = np.asarray(unshard_vertex_values(cur, r_sh))
        cand = p_np[refc]  # reported partition = move phase, flattened
        q = mg_modularity(
            mesh, mgg, shard_vertex_values(mesh, mgg, cand), resolution
        )
        if q <= best_q + threshold:
            break
        best_q, best_labels = q, cand
        uniq = np.unique(r_np)
        old_to_new = np.full(
            cur.rows * cur.cols * cur.vp, -1, dtype=NP_VERTEX_DTYPE
        )
        old_to_new[uniq] = np.arange(len(uniq), dtype=NP_VERTEX_DTYPE)
        chunks = mg_coarsen_edge_chunks(mesh, cur, r_sh, old_to_new)
        new_cur = distribute_edgelist_chunks(
            mesh, chunks, num_vertices=len(uniq), is_symmetric=True
        )
        refc = np.searchsorted(uniq, r_np).astype(NP_VERTEX_DTYPE)[refc]
        # seed next level with P projected onto the refined clusters
        _, labels0_np = np.unique(p_np[uniq], return_inverse=True)
        labels0_np = labels0_np.astype(NP_VERTEX_DTYPE)
        cur = new_cur
        if cur.num_vertices <= 1:
            break
    _, out = np.unique(best_labels, return_inverse=True)
    return out.astype(NP_VERTEX_DTYPE), float(best_q)
