"""Distributed algorithms over the 2D-partitioned MGGraph.

Each is the SAME loop as its SG counterpart (algos/*), with prims swapped
for the shard_map versions (dist/mg_prims.py) — preserving the reference's
invariant that algorithm code is identical for SG and MG (SURVEY.md §1:
pagerank_impl.cuh is one code path, only the multi_gpu bool changes).

The whole iteration runs inside one jit(shard_map(...)): convergence
scalars are replicated device values (psum), never host round trips.
Results come back as (R, C, vp) sharded vertex arrays; use
mg_graph.unshard_vertex_values for a host copy.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..prims.reduce_ops import ANY, MAXIMUM, MINIMUM, PLUS
from ..utils.dtypes import WEIGHT_DTYPE
from . import mg_prims
from .mg_graph import MGGraph, shard_vertex_values, unshard_vertex_values

BLOCK = P("row", "col", None, None)
BLK3 = P("row", "col", None)
VERT = P("row", "col", None)


def _pvary(x):
    """Mark a device-constant array as mesh-varying so while_loop carries
    match (shard_map varying-manual-axes tracking)."""
    return jax.lax.pcast(x, ("row", "col"), to="varying")


def _local_ids(mgg: MGGraph):
    """Global vertex ids + validity mask for this device's range."""
    r = mgg.rows
    i = jax.lax.axis_index("row")
    j = jax.lax.axis_index("col")
    gid = (j * r + i) * mgg.vp + jnp.arange(mgg.vp, dtype=jnp.int32)
    return gid, gid < mgg.num_vertices


def _edge_args(mgg: MGGraph, srcs, dsts, w):
    """Strip the (1, 1) shard_map leading dims."""
    srcs = srcs[0, 0]
    dsts = dsts[0, 0]
    w = None if w is None else w[0, 0]
    return srcs, dsts, w


def _wrap(x):
    return x[None, None]


def _graph_args(mgg: MGGraph):
    if mgg.weights is not None:
        return (mgg.srcs, mgg.dsts, mgg.weights)
    return (mgg.srcs, mgg.dsts)


def _split_args(args, weighted: bool):
    if weighted:
        return args[0], args[1], args[2], args[3:]
    return args[0], args[1], None, args[2:]


def _sorted_args(sorted_layouts):
    """(extra shard_map args, their specs, count) for per-device sorted
    layouts (dist/mg_sorted.py); empty when not provided."""
    if sorted_layouts is None:
        return (), (), 0
    from .mg_sorted import layout_args, layout_specs

    la = layout_args(sorted_layouts)
    return la, layout_specs(sorted_layouts), len(la)


def _sorted_local(sorted_layouts, n_lay, gargs):
    """Split the layout arg slices off gargs and rebuild the local layout."""
    if not n_lay:
        return None, gargs
    from .mg_sorted import local_layout

    return local_layout(sorted_layouts, gargs[-n_lay:]), gargs[:-n_lay]


def mg_out_weight_sums(mesh: Mesh, mgg: MGGraph) -> jax.Array:
    """Per-vertex out weight sums (degrees if unweighted), sharded."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple([BLOCK] * len(_graph_args(mgg))),
        out_specs=VERT,
    )
    def run(*args):
        srcs, dsts, w, _ = _split_args(args, mgg.weighted)
        srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)

        def e_op(s, d, sv, dv, ww):
            return ww if ww is not None else jnp.ones(s.shape, WEIGHT_DTYPE)

        out = mg_prims.per_v_transform_reduce_outgoing_e(
            srcs, dsts, w, mgg.vp, e_op
        )
        return _wrap(out)

    return run(*_graph_args(mgg))


def mg_in_degrees(mesh: Mesh, mgg: MGGraph) -> jax.Array:
    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple([BLOCK] * len(_graph_args(mgg))),
        out_specs=VERT,
    )
    def run(*args):
        srcs, dsts, w, _ = _split_args(args, mgg.weighted)
        srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)

        def e_op(s, d, sv, dv, ww):
            return jnp.ones(s.shape, jnp.int32)

        return _wrap(
            mg_prims.per_v_transform_reduce_incoming_e(srcs, dsts, None, mgg.vp, e_op)
        )

    return run(*_graph_args(mgg))


# ---------------------------------------------------------------------------
# PageRank — same loop as algos/link_analysis.py (ref pagerank_impl.cuh:209)
# ---------------------------------------------------------------------------


def mg_pagerank(
    mesh: Mesh,
    mgg: MGGraph,
    alpha: float = 0.85,
    max_iterations: int = 100,
    tol: float = 1.0e-6,
    personalization: Optional[Tuple] = None,
    nstart=None,
    fail_on_nonconvergence: bool = False,
    gather_mode: str = "all_gather",
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (pageranks (R, C, vp) sharded, iterations).

    Full SG API parity (ref pagerank_impl.cuh personalization path):
    personalization is a replicated (vertex_ids, values) pair; nstart a
    global (V,) start vector. gather_mode="ring" uses the bounded-memory
    ppermute ring (peak src-value temp ∝ vp, not R*vp).

    sorted_layouts (mg_sorted.build_device_layouts): per-device sorted
    Benes pipelines replace the XLA segment reduce in the power iteration
    (TPU backends; sorted_interpret=True runs them in Pallas interpret
    mode for CPU testing)."""
    v = mgg.num_vertices
    has_pers = personalization is not None
    if has_pers:
        p_ids = jnp.atleast_1d(jnp.asarray(personalization[0], jnp.int32))
        p_vals = jnp.atleast_1d(jnp.asarray(personalization[1], WEIGHT_DTYPE))
    else:
        p_ids = jnp.zeros(1, jnp.int32)
        p_vals = jnp.zeros(1, WEIGHT_DTYPE)
    if nstart is not None:
        pr_start = shard_vertex_values(
            mesh, mgg, np.asarray(nstart, dtype=np.float32)
        )
    else:
        pr_start = shard_vertex_values(
            mesh, mgg, np.zeros(v, dtype=np.float32)
        )

    if sorted_layouts is not None:
        from .mg_sorted import layout_args, layout_specs

        lay_args = layout_args(sorted_layouts)
        lay_specs = layout_specs(sorted_layouts)
    else:
        lay_args, lay_specs = (), ()
    n_lay = len(lay_args)

    @partial(jax.jit, static_argnames=("max_iterations", "use_pers", "use_nstart"))
    def run_jit(alpha_, tol_, max_iterations, use_pers, use_nstart, pid, pval, pr_in, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), VERT)
            + tuple([BLOCK] * (len(args) - n_lay))
            + lay_specs,
            out_specs=(VERT, P(), P()),
            # pallas grid loops carry mixed varying/invariant buffers that
            # trip the vma checker (jax-ml/jax: "Scan carry ... mismatched
            # varying manual axes"); semantics are unaffected
            check_vma=not n_lay,
        )
        def run(pid, pval, pr_in, *gargs):
            if n_lay:
                from .mg_sorted import local_layout

                lay_local = local_layout(sorted_layouts, gargs[-n_lay:])
                gargs = gargs[:-n_lay]
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)

            def w_op(s, d, sv, dv, ww):
                return ww if ww is not None else jnp.ones(s.shape, WEIGHT_DTYPE)

            out_wsum = mg_prims.per_v_transform_reduce_outgoing_e(
                srcs, dsts, w, mgg.vp, w_op
            )
            dangling = vmask & (out_wsum <= 0)
            inv_out = jnp.where(out_wsum > 0, 1.0 / jnp.maximum(out_wsum, 1e-30), 0.0)
            if use_pers:
                # replicated (ids, values) -> this device's local reset slice
                local = jnp.sum(
                    jnp.where(pid[None, :] == gid[:, None], pval[None, :], 0.0),
                    axis=1,
                )
                total = mg_prims.transform_reduce_v(local)
                reset = (local / jnp.maximum(total, 1e-30)).astype(WEIGHT_DTYPE)
            else:
                reset = jnp.where(vmask, 1.0 / v, 0.0).astype(WEIGHT_DTYPE)
            if use_nstart:
                p0 = pr_in[0, 0]
                tot0 = mg_prims.transform_reduce_v(jnp.where(vmask, p0, 0.0))
                pr0 = jnp.where(
                    vmask, p0 / jnp.maximum(tot0, 1e-30), 0.0
                ).astype(WEIGHT_DTYPE)
            else:
                pr0 = jnp.where(vmask, 1.0 / v, 0.0).astype(WEIGHT_DTYPE)

            def e_op(s, d, sv, dv, ww):
                return sv if ww is None else sv * ww

            def cond(state):
                pr, diff, it = state
                return (diff > v * tol_) & (it < max_iterations)

            def body(state):
                pr, _, it = state
                msg = pr * inv_out
                if n_lay:
                    agg = mg_prims.per_v_incoming_sorted(
                        lay_local, msg, mgg.vp, interpret=sorted_interpret
                    )
                else:
                    agg = mg_prims.per_v_transform_reduce_incoming_e(
                        srcs, dsts, w, mgg.vp, e_op, src_values=msg,
                        mode=gather_mode,
                    )
                d_sum = mg_prims.transform_reduce_v(jnp.where(dangling, pr, 0.0))
                new = alpha_ * (agg + d_sum * reset) + (1.0 - alpha_) * reset
                new = jnp.where(vmask, new, 0.0)
                diff = mg_prims.transform_reduce_v(jnp.abs(new - pr))
                return new, diff, it + 1

            pr, diff, iters = jax.lax.while_loop(
                cond, body, (pr0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
            )
            return _wrap(pr), iters, diff

        return run(pid, pval, pr_in, *args)

    pr, iters, diff = run_jit(
        jnp.asarray(alpha, WEIGHT_DTYPE),
        jnp.asarray(tol, WEIGHT_DTYPE),
        max_iterations,
        has_pers,
        nstart is not None,
        p_ids,
        p_vals,
        pr_start,
        *_graph_args(mgg),
        *lay_args,
    )
    if fail_on_nonconvergence:
        from ..utils.error import expects

        expects(bool(diff <= v * tol), "MG PageRank failed to converge")
    return pr, iters


# ---------------------------------------------------------------------------
# BFS — same loop as algos/traversal.py (ref bfs_impl.cuh:205-283)
# ---------------------------------------------------------------------------


def mg_bfs(
    mesh: Mesh,
    mgg: MGGraph,
    sources,
    depth_limit: Optional[int] = None,
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns sharded (distances, predecessors), each (R, C, vp).

    sorted_layouts (mg_sorted.build_device_layouts(variant="min",
    use_weights=False)): per-device min-plus Benes layouts — each level is
    one dense sweep y[dst] = min(frontier ids) at multi-Gelem/s instead of
    the XLA segment path (requires num_vertices <= 2^24: ids ride f32).
    The SG direction-optimizing analog: the dense sweep IS the pull form;
    ref bfs_impl.cuh:205-283."""
    from ..algos.traversal import INVALID_DISTANCE

    src_mask_np = np.zeros(mgg.num_vertices, dtype=bool)
    src_mask_np[np.atleast_1d(np.asarray(sources))] = True
    src_mask = shard_vertex_values(mesh, mgg, src_mask_np)
    limit = int(depth_limit) if depth_limit is not None else mgg.num_vertices
    if sorted_layouts is not None and mgg.num_vertices > (1 << 24):
        sorted_layouts = None
    lay_args, lay_specs, n_lay = _sorted_args(sorted_layouts)

    @partial(jax.jit, static_argnames=("limit",))
    def run_jit(limit, mask, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(VERT,) + tuple([BLOCK] * (len(args) - n_lay))
            + lay_specs,
            out_specs=(VERT, VERT),
            check_vma=not n_lay,
        )
        def run(mask_l, *gargs):
            lay_local = None
            if n_lay:
                lay_local, gargs = _sorted_local(
                    sorted_layouts, n_lay, gargs
                )
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            m0 = mask_l[0, 0]
            gid, vmask = _local_ids(mgg)
            dist0 = jnp.where(m0, 0, INVALID_DISTANCE).astype(jnp.int32)
            pred0 = _pvary(jnp.full(mgg.vp, -1, jnp.int32))
            gidf = gid.astype(jnp.float32)
            inf = jnp.float32(jnp.inf)

            def e_op(s, d, sv, dv, ww):
                return ~dv, s  # dv = visited[dst]; payload = global src id

            def cond(state):
                visited, dist, pred, frontier, n_frontier, depth = state
                return (n_frontier > 0) & (depth < limit)

            def body(state):
                visited, dist, pred, frontier, _, depth = state
                if lay_local is not None:
                    # dense min-plus sweep: y = min over in-neighbors of
                    # the frontier ids; finite -> touched, value -> pred
                    x = jnp.where(frontier, gidf, inf)
                    y = mg_prims.per_v_incoming_sorted_min(
                        lay_local, x, mgg.vp, interpret=sorted_interpret
                    )
                    touched = jnp.isfinite(y)
                    pred_cand = jnp.where(touched, y, -1).astype(jnp.int32)
                else:
                    touched, pred_cand = mg_prims.frontier_push_by_dst(
                        srcs,
                        dsts,
                        w,
                        mgg.vp,
                        frontier,
                        e_op,
                        reduce_op=ANY,
                        dst_values=visited,
                    )
                new = touched & ~visited & vmask
                dist = jnp.where(new, depth + 1, dist)
                pred = jnp.where(new, pred_cand, pred)
                n_frontier = mg_prims.transform_reduce_v(new.astype(jnp.int32))
                return visited | new, dist, pred, new, n_frontier, depth + 1

            n0 = mg_prims.transform_reduce_v(m0.astype(jnp.int32))
            visited, dist, pred, _, _, _ = jax.lax.while_loop(
                cond, body, (m0, dist0, pred0, m0, n0, jnp.int32(0))
            )
            return _wrap(dist), _wrap(pred)

        return run(mask, *args)

    return run_jit(limit, src_mask, *_graph_args(mgg), *lay_args)


# ---------------------------------------------------------------------------
# SSSP — same frontier relaxation as algos/traversal.py
# ---------------------------------------------------------------------------


def mg_sssp(
    mesh: Mesh,
    mgg: MGGraph,
    source,
    cutoff: Optional[float] = None,
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """sorted_layouts (mg_sorted.build_device_layouts(variant="min",
    use_weights=True)): Bellman-Ford relaxations ride the per-device
    min-plus pipeline — one dense sweep per round and a SINGLE
    predecessor post-pass at the end (the XLA path pays two frontier
    pushes per level). ref sssp_impl.cuh."""
    src_mask_np = np.zeros(mgg.num_vertices, dtype=bool)
    src_mask_np[np.atleast_1d(np.asarray(source))] = True
    src_mask = shard_vertex_values(mesh, mgg, src_mask_np)
    c = jnp.asarray(cutoff if cutoff is not None else jnp.inf, WEIGHT_DTYPE)
    lay_args, lay_specs, n_lay = _sorted_args(sorted_layouts)
    if n_lay:
        return _mg_sssp_sorted(
            mesh, mgg, src_mask, c, sorted_layouts, lay_args, lay_specs,
            n_lay, sorted_interpret,
        )

    @jax.jit
    def run_jit(cutoff_, mask, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(VERT,) + tuple([BLOCK] * len(args)),
            out_specs=(VERT, VERT),
        )
        def run(mask_l, *gargs):
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            m0 = mask_l[0, 0]
            inf = jnp.asarray(jnp.inf, WEIGHT_DTYPE)
            dist0 = jnp.where(m0, 0.0, inf).astype(WEIGHT_DTYPE)
            pred0 = _pvary(jnp.full(mgg.vp, -1, jnp.int32))

            def relax_op(s, d, sv, dv, ww):
                wval = ww if ww is not None else jnp.ones_like(sv)
                cand = sv + wval
                return (cand < dv) & (cand <= cutoff_), cand

            def cond(state):
                dist, pred, frontier, n_frontier, it = state
                return (n_frontier > 0) & (it < mgg.num_vertices)

            def body(state):
                dist, pred, frontier, _, it = state
                touched, cand = mg_prims.frontier_push_by_dst(
                    srcs, dsts, w, mgg.vp, frontier, relax_op,
                    reduce_op=MINIMUM, src_values=dist, dst_values=dist,
                )
                improved = touched & (cand < dist)
                new_dist = jnp.where(improved, cand, dist)

                def pred_op(s, d, sv, dv, ww):
                    wval = ww if ww is not None else jnp.ones_like(sv)
                    return (sv + wval == dv), s

                _, pred_cand = mg_prims.frontier_push_by_dst(
                    srcs, dsts, w, mgg.vp, frontier, pred_op,
                    reduce_op=ANY, src_values=dist, dst_values=new_dist,
                )
                pred = jnp.where(improved, pred_cand, pred)
                n_frontier = mg_prims.transform_reduce_v(improved.astype(jnp.int32))
                return new_dist, pred, improved, n_frontier, it + 1

            n0 = mg_prims.transform_reduce_v(m0.astype(jnp.int32))
            dist, pred, _, _, _ = jax.lax.while_loop(
                cond, body, (dist0, pred0, m0, n0, jnp.int32(0))
            )
            return _wrap(dist), _wrap(pred)

        return run(mask, *args)

    return run_jit(c, src_mask, *_graph_args(mgg))


def _mg_sssp_sorted(
    mesh, mgg, src_mask, cutoff, sorted_layouts, lay_args, lay_specs,
    n_lay, interpret,
):
    """Bellman-Ford on the per-device min-plus pipeline, predecessors by
    one tree-edge post-pass (dist[src] + w == dist[dst]); mirrors the SG
    _sssp_pallas_jit — the pipeline and post-pass round identically in
    f32, so the tree predicate is exact."""

    @jax.jit
    def run_jit(cutoff_, mask, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(VERT,)
            + tuple([BLOCK] * (len(args) - n_lay))
            + lay_specs,
            out_specs=(VERT, VERT),
            check_vma=False,
        )
        def run(mask_l, *gargs):
            lay_local, gargs = _sorted_local(sorted_layouts, n_lay, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            m0 = mask_l[0, 0]
            gid, vmask = _local_ids(mgg)
            inf = jnp.float32(jnp.inf)
            dist0 = jnp.where(m0, 0.0, inf).astype(jnp.float32)

            def cond(state):
                dist, changed, it = state
                return (changed > 0) & (it < mgg.num_vertices)

            def body(state):
                dist, _, it = state
                relax = mg_prims.per_v_incoming_sorted_min(
                    lay_local, dist, mgg.vp, interpret=interpret
                )
                relax = jnp.where(relax <= cutoff_, relax, inf)
                nd = jnp.minimum(dist, relax)
                changed = mg_prims.transform_reduce_v(
                    (nd < dist).astype(jnp.int32)
                )
                return nd, changed, it + 1

            dist, _, _ = jax.lax.while_loop(
                cond, body, (dist0, jnp.int32(1), jnp.int32(0))
            )

            # predecessor post-pass: one full-edge push over the blocks
            def pred_op(s, d, sv, dv, ww):
                wval = ww if ww is not None else jnp.ones_like(sv)
                return jnp.isfinite(dv) & (sv + wval == dv), s

            frontier_all = jnp.isfinite(dist) & vmask
            _, pred_cand = mg_prims.frontier_push_by_dst(
                srcs, dsts, w, mgg.vp, frontier_all, pred_op,
                reduce_op=ANY, src_values=dist, dst_values=dist,
            )
            pred = jnp.where(
                jnp.isfinite(dist) & ~m0 & vmask, pred_cand, -1
            ).astype(jnp.int32)
            return _wrap(dist.astype(WEIGHT_DTYPE)), _wrap(pred)

        return run(mask, *args)

    return run_jit(
        cutoff.astype(jnp.float32), src_mask, *_graph_args(mgg), *lay_args
    )


# ---------------------------------------------------------------------------
# WCC — min-label propagation (same as algos/components.py)
# ---------------------------------------------------------------------------


def mg_wcc(
    mesh: Mesh,
    mgg: MGGraph,
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> jax.Array:
    """Weakly connected components by min-label propagation (same loop as
    algos/components.py; ref weakly_connected_components_impl.cuh:516's
    label frontier).

    sorted_layouts: (in_stacked, out_stacked) pair from
    mg_sorted.build_device_layouts(variant="min", use_weights=False,
    direction="in"/"out") — both propagation directions ride the
    per-device min-plus Benes pipeline (labels are vertex ids riding f32
    exactly; requires num_vertices <= 2^24, else the pair is ignored)."""
    if sorted_layouts is not None and mgg.num_vertices > (1 << 24):
        sorted_layouts = None
    if sorted_layouts is not None:
        st_in, st_out = sorted_layouts
        ain, sin_, nin = _sorted_args(st_in)
        aout, sout, nout = _sorted_args(st_out)
    else:
        st_in = st_out = None
        ain = aout = ()
        sin_ = sout = ()
        nin = nout = 0

    @jax.jit
    def run_jit(*args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple([BLOCK] * (len(args) - nin - nout))
            + sin_
            + sout,
            out_specs=VERT,
            check_vma=not (nin or nout),
        )
        def run(*gargs):
            lay_in = lay_out = None
            if nout:
                lay_out, gargs = _sorted_local(st_out, nout, gargs)
            if nin:
                lay_in, gargs = _sorted_local(st_in, nin, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)
            labels0 = gid

            def push_op(s, d, sv, dv, ww):
                return sv

            def pull_op(s, d, sv, dv, ww):
                return dv

            def cond(state):
                labels, changed = state
                return changed > 0

            def body(state):
                labels, _ = state
                if lay_in is not None:
                    lf = labels.astype(jnp.float32)
                    down = mg_prims.per_v_incoming_sorted_min(
                        lay_in, lf, mgg.vp, interpret=sorted_interpret
                    )
                    up = mg_prims.per_v_outgoing_sorted_min(
                        lay_out, lf, mgg.vp, interpret=sorted_interpret
                    )
                    cand = jnp.minimum(down, up)  # +inf if isolated
                    new = jnp.where(
                        jnp.isfinite(cand),
                        jnp.minimum(labels, cand.astype(jnp.int32)),
                        labels,
                    )
                else:
                    down = mg_prims.per_v_transform_reduce_incoming_e(
                        srcs, dsts, None, mgg.vp, push_op,
                        reduce_op=MINIMUM, src_values=labels,
                    )
                    up = mg_prims.per_v_transform_reduce_outgoing_e(
                        srcs, dsts, None, mgg.vp, pull_op,
                        reduce_op=MINIMUM, dst_values=labels,
                    )
                    new = jnp.minimum(labels, jnp.minimum(down, up))
                changed = mg_prims.transform_reduce_v(
                    (new != labels).astype(jnp.int32)
                )
                return new, changed

            labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.int32(1)))
            return _wrap(labels)

        return run(*args)

    return run_jit(*_graph_args(mgg), *ain, *aout)


# ---------------------------------------------------------------------------
# Katz — same loop as algos/centrality.py
# ---------------------------------------------------------------------------


def mg_katz_centrality(
    mesh: Mesh,
    mgg: MGGraph,
    alpha: float,
    beta: float = 1.0,
    max_iterations: int = 1000,
    tol: float = 1.0e-6,
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> jax.Array:
    v = mgg.num_vertices
    lay_args, lay_specs, n_lay = _sorted_args(sorted_layouts)

    @partial(jax.jit, static_argnames=("max_iterations",))
    def run_jit(alpha_, beta_, tol_, max_iterations, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple([BLOCK] * (len(args) - n_lay)) + lay_specs,
            out_specs=VERT,
            check_vma=not n_lay,
        )
        def run(*gargs):
            lay_local, gargs = _sorted_local(sorted_layouts, n_lay, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)

            def e_op(s, d, sv, dv, ww):
                return sv if ww is None else sv * ww

            def cond(state):
                x, diff, it = state
                return (diff > v * tol_) & (it < max_iterations)

            def body(state):
                x, _, it = state
                if n_lay:
                    agg = mg_prims.per_v_incoming_sorted(
                        lay_local, x, mgg.vp, interpret=sorted_interpret
                    )
                else:
                    agg = mg_prims.per_v_transform_reduce_incoming_e(
                        srcs, dsts, w, mgg.vp, e_op, src_values=x
                    )
                new = alpha_ * agg + beta_
                new = jnp.where(vmask, new, 0.0)
                diff = mg_prims.transform_reduce_v(jnp.abs(new - x))
                return new, diff, it + 1

            x0 = _pvary(jnp.zeros(mgg.vp, WEIGHT_DTYPE))
            x, _, _ = jax.lax.while_loop(
                cond, body, (x0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
            )
            norm2 = mg_prims.transform_reduce_v(x * x)
            return _wrap(x / jnp.maximum(jnp.sqrt(norm2), 1e-30))

        return run(*args)

    return run_jit(
        jnp.asarray(alpha, WEIGHT_DTYPE),
        jnp.asarray(beta, WEIGHT_DTYPE),
        jnp.asarray(tol, WEIGHT_DTYPE),
        max_iterations,
        *_graph_args(mgg),
        *lay_args,
    )


# ---------------------------------------------------------------------------
# Eigenvector centrality — same loop as algos/centrality.py
# ---------------------------------------------------------------------------


def mg_eigenvector_centrality(
    mesh: Mesh,
    mgg: MGGraph,
    max_iterations: int = 1000,
    tol: float = 1.0e-6,
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> jax.Array:
    v = mgg.num_vertices
    lay_args, lay_specs, n_lay = _sorted_args(sorted_layouts)

    @partial(jax.jit, static_argnames=("max_iterations",))
    def run_jit(tol_, max_iterations, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple([BLOCK] * (len(args) - n_lay)) + lay_specs,
            out_specs=VERT,
            check_vma=not n_lay,
        )
        def run(*gargs):
            lay_local, gargs = _sorted_local(sorted_layouts, n_lay, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)

            def e_op(s, d, sv, dv, ww):
                return sv if ww is None else sv * ww

            def cond(state):
                x, diff, it = state
                return (diff > v * tol_) & (it < max_iterations)

            def body(state):
                x, _, it = state
                if n_lay:
                    agg = mg_prims.per_v_incoming_sorted(
                        lay_local, x, mgg.vp, interpret=sorted_interpret
                    )
                else:
                    agg = mg_prims.per_v_transform_reduce_incoming_e(
                        srcs, dsts, w, mgg.vp, e_op, src_values=x
                    )
                new = agg + x
                new = jnp.where(vmask, new, 0.0)
                norm2 = mg_prims.transform_reduce_v(new * new)
                new = new / jnp.maximum(jnp.sqrt(norm2), 1e-30)
                diff = mg_prims.transform_reduce_v(jnp.abs(new - x))
                return new, diff, it + 1

            x0 = jnp.where(vmask, 1.0 / v, 0.0).astype(WEIGHT_DTYPE)
            x, _, _ = jax.lax.while_loop(
                cond, body, (x0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
            )
            return _wrap(x)

        return run(*args)

    return run_jit(
        jnp.asarray(tol, WEIGHT_DTYPE), max_iterations, *_graph_args(mgg), *lay_args
    )


# ---------------------------------------------------------------------------
# HITS — same loop as algos/link_analysis.py (ref hits_impl.cuh)
# ---------------------------------------------------------------------------


def mg_hits(
    mesh: Mesh,
    mgg: MGGraph,
    max_iterations: int = 100,
    tol: float = 1.0e-5,
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """sorted_layouts: (pull_stacked, push_stacked) — the pull side from
    build_device_layouts(direction="in"), the push side from
    direction="out" (transposed per-device layouts), so both halves of
    the hub/authority iteration ride the Benes pipeline."""
    if sorted_layouts is not None:
        st_in, st_out = sorted_layouts
        ain, sin_, nin = _sorted_args(st_in)
        aout, sout, nout = _sorted_args(st_out)
    else:
        st_in = st_out = None
        ain = aout = ()
        sin_ = sout = ()
        nin = nout = 0

    @partial(jax.jit, static_argnames=("max_iterations",))
    def run_jit(tol_, max_iterations, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple([BLOCK] * (len(args) - nin - nout))
            + sin_
            + sout,
            out_specs=(VERT, VERT),
            check_vma=not (nin or nout),
        )
        def run(*gargs):
            lay_in = lay_out = None
            if nout:
                lay_out, gargs = _sorted_local(st_out, nout, gargs)
            if nin:
                lay_in, gargs = _sorted_local(st_in, nin, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)

            def pull_op(s, d, sv, dv, ww):
                return sv if ww is None else sv * ww

            def push_op(s, d, sv, dv, ww):
                return dv if ww is None else dv * ww

            def gmax(x):
                local = jnp.max(x)
                return jax.lax.pmax(jax.lax.pmax(local, "row"), "col")

            def cond(state):
                h, a, diff, it = state
                return (diff > tol_) & (it < max_iterations)

            def body(state):
                h, a, _, it = state
                if lay_in is not None:
                    a_new = mg_prims.per_v_incoming_sorted(
                        lay_in, h, mgg.vp, interpret=sorted_interpret
                    )
                else:
                    a_new = mg_prims.per_v_transform_reduce_incoming_e(
                        srcs, dsts, w, mgg.vp, pull_op, src_values=h
                    )
                a_new = a_new / jnp.maximum(gmax(a_new), 1e-30)
                if lay_out is not None:
                    h_new = mg_prims.per_v_outgoing_sorted(
                        lay_out, a_new, mgg.vp, interpret=sorted_interpret
                    )
                else:
                    h_new = mg_prims.per_v_transform_reduce_outgoing_e(
                        srcs, dsts, w, mgg.vp, push_op, dst_values=a_new
                    )
                h_new = h_new / jnp.maximum(gmax(h_new), 1e-30)
                diff = mg_prims.transform_reduce_v(jnp.abs(h_new - h))
                return h_new, a_new, diff, it + 1

            v = mgg.num_vertices
            h0 = jnp.where(vmask, 1.0 / v, 0.0).astype(WEIGHT_DTYPE)
            a0 = _pvary(jnp.zeros(mgg.vp, WEIGHT_DTYPE))
            h, a, _, _ = jax.lax.while_loop(
                cond, body, (h0, a0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
            )
            hs = mg_prims.transform_reduce_v(h)
            as_ = mg_prims.transform_reduce_v(a)
            return _wrap(h / jnp.maximum(hs, 1e-30)), _wrap(a / jnp.maximum(as_, 1e-30))

        return run(*args)

    return run_jit(
        jnp.asarray(tol, WEIGHT_DTYPE), max_iterations, *_graph_args(mgg),
        *ain, *aout,
    )


# ---------------------------------------------------------------------------
# Core number — same peeling as algos/cores.py (ref core_number_impl.cuh)
# ---------------------------------------------------------------------------


def mg_core_number(
    mesh: Mesh,
    mgg: MGGraph,
    degree_type: str = "incoming_outgoing",
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> jax.Array:
    """sorted_layouts: (in_stacked, out_stacked) pair from
    mg_sorted.build_device_layouts(use_weights=False, direction="in"/
    "out") — unweighted SUM layouts (w=1 per edge), so the residual
    degree of the peeling loop is one sorted sweep over the 0/1 alive
    mask per direction instead of the XLA segment reduce (exact while
    degrees < 2^24 ride f32)."""
    assert degree_type in ("incoming", "outgoing", "incoming_outgoing")
    if sorted_layouts is not None:
        st_in, st_out = sorted_layouts
        ain, sin_, nin = _sorted_args(st_in)
        aout, sout, nout = _sorted_args(st_out)
    else:
        st_in = st_out = None
        ain = aout = ()
        sin_ = sout = ()
        nin = nout = 0

    @partial(jax.jit, static_argnames=("degree_type",))
    def run_jit(degree_type, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=tuple([BLOCK] * (len(args) - nin - nout))
            + sin_
            + sout,
            out_specs=VERT,
            check_vma=not (nin or nout),
        )
        def run(*gargs):
            lay_in = lay_out = None
            if nout:
                lay_out, gargs = _sorted_local(st_out, nout, gargs)
            if nin:
                lay_in, gargs = _sorted_local(st_in, nin, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            gid, vmask = _local_ids(mgg)

            def residual_degree(alive):
                out = _pvary(jnp.zeros(mgg.vp, jnp.int32))
                if lay_in is not None:
                    af = alive.astype(jnp.float32)
                    if degree_type in ("outgoing", "incoming_outgoing"):
                        d_out = mg_prims.per_v_outgoing_sorted(
                            lay_out, af, mgg.vp, interpret=sorted_interpret
                        )
                        out = out + jnp.round(d_out).astype(jnp.int32)
                    if degree_type in ("incoming", "incoming_outgoing"):
                        d_in = mg_prims.per_v_incoming_sorted(
                            lay_in, af, mgg.vp, interpret=sorted_interpret
                        )
                        out = out + jnp.round(d_in).astype(jnp.int32)
                    return out
                if degree_type in ("outgoing", "incoming_outgoing"):
                    out = out + mg_prims.per_v_transform_reduce_outgoing_e(
                        srcs, dsts, None, mgg.vp,
                        lambda s, d, sv, dv, ww: dv.astype(jnp.int32),
                        dst_values=alive,
                    )
                if degree_type in ("incoming", "incoming_outgoing"):
                    out = out + mg_prims.per_v_transform_reduce_incoming_e(
                        srcs, dsts, None, mgg.vp,
                        lambda s, d, sv, dv, ww: sv.astype(jnp.int32),
                        src_values=alive,
                    )
                return out

            def outer_cond(state):
                alive, core, k, n_alive = state
                return n_alive > 0

            def outer_body(state):
                alive, core, k, _ = state

                def inner_cond(s):
                    a, c_, changed = s
                    return changed > 0

                def inner_body(s):
                    a, c_, _ = s
                    deg = residual_degree(a)
                    drop = a & (deg <= k)
                    c_ = jnp.where(drop, k, c_)
                    changed = mg_prims.transform_reduce_v(drop.astype(jnp.int32))
                    return a & ~drop, c_, changed

                alive, core, _ = jax.lax.while_loop(
                    inner_cond, inner_body, (alive, core, jnp.int32(1))
                )
                n_alive = mg_prims.transform_reduce_v(alive.astype(jnp.int32))
                return alive, core, k + 1, n_alive

            alive0 = vmask
            core0 = _pvary(jnp.zeros(mgg.vp, jnp.int32))
            n0 = mg_prims.transform_reduce_v(alive0.astype(jnp.int32))
            _, core, _, _ = jax.lax.while_loop(
                outer_cond, outer_body, (alive0, core0, jnp.int32(0), n0)
            )
            return _wrap(core)

        return run(*args)

    return run_jit(degree_type, *_graph_args(mgg), *ain, *aout)


# ---------------------------------------------------------------------------
# GNN aggregation (SpMM) — the GraphSAGE substrate, distributed
# ---------------------------------------------------------------------------


def mg_spmm_aggregate(
    mesh: Mesh,
    mgg: MGGraph,
    features: jax.Array,
    op: str = "mean",
    sorted_layouts=None,
    sorted_interpret: bool = False,
) -> jax.Array:
    """features: (R, C, vp, F) sharded -> aggregated (R, C, vp, F).

    The distributed SpMM of the BASELINE GraphSAGE config: feature rows
    gathered along "row" (column span), partial products reduced to the
    dst owner along "col". sorted_layouts (mg_sorted, sum/mean only):
    per-device paired-bf16 sorted pipeline instead of the XLA reduce."""
    assert op in ("sum", "mean", "max")
    lay_args, lay_specs, n_lay = _sorted_args(
        sorted_layouts if op != "max" else None
    )

    @partial(jax.jit, static_argnames=("op",))
    def run_jit(op, feats, *args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("row", "col", None, None),)
            + tuple([BLOCK] * (len(args) - n_lay))
            + lay_specs,
            out_specs=P("row", "col", None, None),
            check_vma=not n_lay,
        )
        def run(feats_l, *gargs):
            lay_local, gargs = _sorted_local(sorted_layouts, n_lay, gargs)
            srcs, dsts, w, _ = _split_args(gargs, mgg.weighted)
            srcs, dsts, w = _edge_args(mgg, srcs, dsts, w)
            x = feats_l[0, 0]  # (vp, F)

            def e_op(s, d, sv, dv, ww):
                return sv

            red = MAXIMUM if op == "max" else PLUS
            if n_lay:
                agg = mg_prims.per_v_incoming_sorted_spmm(
                    lay_local, x, mgg.vp, interpret=sorted_interpret
                )
            else:
                agg = mg_prims.per_v_transform_reduce_incoming_e(
                    srcs, dsts, w, mgg.vp, e_op, reduce_op=red, src_values=x
                )
            if op == "mean":
                def one_op(s, d, sv, dv, ww):
                    return jnp.ones(s.shape, WEIGHT_DTYPE)

                deg = mg_prims.per_v_transform_reduce_incoming_e(
                    srcs, dsts, None, mgg.vp, one_op
                )
                agg = agg / jnp.maximum(deg, 1.0)[:, None]
            if op == "max":
                agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
            return _wrap(agg)

        return run(feats, *args)

    return run_jit(op, features, *_graph_args(mgg), *lay_args)


# ---------------------------------------------------------------------------
# Path extraction — on-device MG (ref: extract_bfs_paths_impl.cuh)
# ---------------------------------------------------------------------------


def _replicated_lookup(mgg: MGGraph, vals_l, keys, fill):
    """values at global-vertex `keys` (replicated (n,)) from the sharded
    per-owner array vals_l (vp,): one-hot owner contribution + psum over
    both mesh axes. Keys outside [0, V) return `fill`."""
    r = mgg.rows
    i = jax.lax.axis_index("row")
    j = jax.lax.axis_index("col")
    base = (j * r + i) * mgg.vp
    loc = keys - base
    ok = (loc >= 0) & (loc < mgg.vp) & (keys < mgg.num_vertices)
    safe = jnp.clip(loc, 0, mgg.vp - 1)
    contrib = jnp.where(ok, jnp.take(vals_l, safe), 0)
    tot = jax.lax.psum(contrib, ("row", "col"))
    found = jax.lax.psum(ok.astype(jnp.int32), ("row", "col"))
    return jnp.where(found > 0, tot, fill)


def mg_extract_bfs_paths(
    mesh: Mesh, mgg: MGGraph, distances, predecessors, destinations
) -> Tuple[np.ndarray, int]:
    """Reconstruct source->destination paths from sharded mg_bfs/mg_sssp
    results, entirely on device: each predecessor hop is a distributed
    one-hot lookup + psum (no host unshard of the (V,) arrays).

    Returns (paths (n, max_len) numpy int32 padded with -1 at the front,
    max_len) — same contract as the SG extract_bfs_paths."""
    from ..algos.traversal import INVALID_DISTANCE, INVALID_VERTEX

    dest = jnp.atleast_1d(jnp.asarray(destinations, dtype=jnp.int32))

    @jax.jit
    def dist_at_jit(dist_sh, dest):
        @partial(shard_map, mesh=mesh, in_specs=(VERT, P()), out_specs=P())
        def run(dist_l, dest_r):
            return _replicated_lookup(
                mgg, dist_l[0, 0], dest_r, INVALID_DISTANCE
            )

        return run(dist_sh, dest)

    d = np.asarray(dist_at_jit(distances, dest))
    finite = d != INVALID_DISTANCE
    max_len = int(np.max(np.where(finite, d, 0))) + 1

    @partial(jax.jit, static_argnames=("max_len",))
    def paths_jit(pred_sh, dest, max_len):
        # the scan carry is psum-replicated each step but the static
        # varying-axes tracker can't see that through the while/scan carry
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(VERT, P()),
            out_specs=P(),
            check_vma=False,
        )
        def run(pred_l, dest_r):
            pred_l2 = pred_l[0, 0]

            def step(cur, _):
                hop = _replicated_lookup(
                    mgg, pred_l2, jnp.maximum(cur, 0), INVALID_VERTEX
                )
                nxt = jnp.where(cur >= 0, hop, INVALID_VERTEX)
                return nxt, cur

            cur0 = _pvary(dest_r)
            _, path_rev = jax.lax.scan(step, cur0, None, length=max_len)
            return jnp.flip(path_rev.T, axis=1)

        return run(pred_sh, dest)

    return np.asarray(paths_jit(predecessors, dest, max_len)), max_len
