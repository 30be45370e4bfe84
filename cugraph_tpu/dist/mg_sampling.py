"""Distributed uniform neighbor sampling.

ref: cpp/src/sampling/uniform_neighbor_sampling_impl.hpp (per-level
shuffle + per_v_random_select, SURVEY.md §3.4; returns (srcs, dsts,
weights, ...) per level :69-115).

TPU-native scheme (fixed shapes, no ragged shuffles): the whole multi-hop
loop runs in ONE jitted shard_map program — frontiers stay on device
between hops (the reference round-trips a device vector per level; the
round-2 version of this file round-tripped to host numpy per hop). Per
level:
  1. every device computes, for each frontier vertex in its column span,
     its LOCAL out-degree from the DCSR src adjacency;
  2. all_gather over "row" -> per-device degree prefix across the column
     (the column's devices jointly own all out-edges of the span);
  3. identical draws (same key everywhere) pick global edge slots in
     [0, total_degree); the device whose prefix range contains a slot
     emits that edge's (dst, weight, edge id), everyone else emits 0 — a
     two-axis psum assembles the replicated result (exactly one owner per
     slot).

Two frontier strategies (method= on mg_uniform_neighbor_sample):

- "replicate" (default for minibatch): the frontier is replicated and
  every device does O(n) masked work — the psum assembly IS the
  shuffle, with capacity = frontier size. Right for n in the 1e3..1e6
  range the reference's minibatch path serves (no all_to_all capacity
  to provision).
- "shuffle" (auto past 2^20 seeds): per-device frontier SHARDS; each
  level routes (seed, uniforms, return address) to the seed's owner
  via the capacity-bounded two-stage all_to_all
  (mg_prims.shuffle_to_vertex_owners), the owner column draws on its
  O(n/C) batch, and answers route back by (device, slot) — the
  reference's per-level shuffle-to-owner scheme
  (uniform_neighbor_sampling_impl.hpp:72). Overflowed capacities
  retry doubled (the reference's count-then-exchange two-pass). Both
  methods draw identical edges for the same rng_key.

Without-replacement draws use Floyd's K-subset on the replicated global
degree (exact distinct slots, same algorithm as the SG prim
prims/random_select.py); with-replacement is the plain uniform draw.

Edge ids index the distributed DCSR storage (device_flat * d_pad +
local position) — unique and stable for a given graph distribution.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mg_graph import MGGraph

BLOCK3 = P("row", "col", None)


def _sample_args(mgg: MGGraph):
    args = [mgg.src_nzd, mgg.src_nzd_offsets, mgg.src_csr_dsts]
    if mgg.src_csr_weights is not None:
        args.append(mgg.src_csr_weights)
    return args


def _level_draw(mgg, frontier, u, nzd, nzd_off, csr_dsts, csr_w,
                with_replacement):
    """One sampling level inside shard_map: replicated frontier (n,) ->
    replicated (dst, weight, edge_id, valid), each (n, k). frontier < 0 =
    dead slot (emits valid=False)."""
    from . import mg_prims

    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp
    j = jax.lax.axis_index("col")
    i = jax.lax.axis_index("row")
    local = frontier - j * span
    mine = (local >= 0) & (local < span) & (frontier >= 0)
    safe = jnp.clip(local, 0, span - 1)
    lo, deg0 = mg_prims.dcsr_lookup(nzd, nzd_off, safe)
    deg_local = jnp.where(mine, deg0, 0)
    degs_all = jax.lax.all_gather(deg_local, "row", axis=0)  # (R, n)
    prefix = jnp.cumsum(degs_all, axis=0) - degs_all  # exclusive
    my_prefix = prefix[i]  # (n,)
    d_total = jnp.sum(degs_all, axis=0)  # (n,) replicated over row
    k_fan = u.shape[1]
    if with_replacement:
        slot = jnp.minimum(
            (u * d_total[:, None].astype(u.dtype)).astype(jnp.int32),
            jnp.maximum(d_total[:, None] - 1, 0),
        )
    else:
        # Floyd's K-subset over the replicated global degree
        sel = jnp.full(u.shape, -1, dtype=jnp.int32)
        for fi in range(k_fan):
            jd = d_total - k_fan + fi
            jpos = jnp.maximum(jd, 0)
            t = jnp.minimum(
                (u[:, fi] * (jpos + 1).astype(u.dtype)).astype(jnp.int32),
                jpos,
            )
            dup = (
                jnp.any(sel[:, :fi] == t[:, None], axis=1)
                if fi > 0
                else jnp.zeros(t.shape, bool)
            )
            sel = sel.at[:, fi].set(jnp.where(dup, jpos, t))
        arange_k = jnp.arange(k_fan, dtype=jnp.int32)[None, :]
        slot = jnp.where(d_total[:, None] <= k_fan, arange_k, sel)
        slot = jnp.minimum(slot, jnp.maximum(d_total[:, None] - 1, 0))
    in_me = (
        mine[:, None]
        & (slot >= my_prefix[:, None])
        & (slot < (my_prefix + deg_local)[:, None])
    )
    d_pad = csr_dsts.shape[0]
    local_idx = jnp.clip(
        lo[:, None] + slot - my_prefix[:, None], 0, d_pad - 1
    )
    dst = jnp.where(in_me, jnp.take(csr_dsts, local_idx), 0)
    dst = jax.lax.psum(jax.lax.psum(dst, "row"), "col")
    eid = jnp.where(in_me, (i * c + j) * d_pad + local_idx, 0)
    eid = jax.lax.psum(jax.lax.psum(eid, "row"), "col")
    if csr_w is not None:
        wv = jnp.where(in_me, jnp.take(csr_w, local_idx), 0.0)
        wv = jax.lax.psum(jax.lax.psum(wv, "row"), "col")
    else:
        wv = None
    valid1 = jnp.where(mine, (d_total > 0).astype(jnp.int32), 0)
    valid1 = jax.lax.psum(jax.lax.psum(valid1, "col"), "row") > 0
    valid = jnp.broadcast_to(valid1[:, None], dst.shape)
    if not with_replacement:
        # degree < fanout: only the first d_total slots are real
        d_rep = (
            jax.lax.psum(
                jax.lax.psum(jnp.where(mine, d_total, 0), "col"), "row"
            )
            // r
        )
        arange_k = jnp.arange(u.shape[1], dtype=jnp.int32)[None, :]
        valid = valid & (arange_k < d_rep[:, None])
    return dst, wv, eid, valid


def _col_draw(mgg, seeds_global, valid, u, nzd, nzd_off, csr_dsts, csr_w,
              with_replacement):
    """Column-batch draw for the owner-shuffle path: seeds_global (m,)
    already live on THEIR OWNER COLUMN (every row device of the column
    sees the same batch); returns replicated-in-column (dst, wv, eid,
    valid_out), each (m, k). Identical draw math to _level_draw so the
    two methods emit identical edges for the same rng stream."""
    from . import mg_prims

    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp
    j = jax.lax.axis_index("col")
    i = jax.lax.axis_index("row")
    local = seeds_global - j * span
    ok = valid & (local >= 0) & (local < span)
    safe = jnp.clip(local, 0, span - 1)
    lo, deg0 = mg_prims.dcsr_lookup(nzd, nzd_off, safe)
    deg_local = jnp.where(ok, deg0, 0)
    degs_all = jax.lax.all_gather(deg_local, "row", axis=0)  # (R, m)
    prefix = jnp.cumsum(degs_all, axis=0) - degs_all
    my_prefix = prefix[i]
    d_total = jnp.sum(degs_all, axis=0)
    k_fan = u.shape[1]
    if with_replacement:
        slot = jnp.minimum(
            (u * d_total[:, None].astype(u.dtype)).astype(jnp.int32),
            jnp.maximum(d_total[:, None] - 1, 0),
        )
    else:
        sel = jnp.full(u.shape, -1, dtype=jnp.int32)
        for fi in range(k_fan):
            jd = d_total - k_fan + fi
            jpos = jnp.maximum(jd, 0)
            t = jnp.minimum(
                (u[:, fi] * (jpos + 1).astype(u.dtype)).astype(jnp.int32),
                jpos,
            )
            dup = (
                jnp.any(sel[:, :fi] == t[:, None], axis=1)
                if fi > 0
                else jnp.zeros(t.shape, bool)
            )
            sel = sel.at[:, fi].set(jnp.where(dup, jpos, t))
        arange_k = jnp.arange(k_fan, dtype=jnp.int32)[None, :]
        slot = jnp.where(d_total[:, None] <= k_fan, arange_k, sel)
        slot = jnp.minimum(slot, jnp.maximum(d_total[:, None] - 1, 0))
    in_me = (
        ok[:, None]
        & (slot >= my_prefix[:, None])
        & (slot < (my_prefix + deg_local)[:, None])
    )
    d_pad = csr_dsts.shape[0]
    local_idx = jnp.clip(
        lo[:, None] + slot - my_prefix[:, None], 0, d_pad - 1
    )
    dst = jnp.where(in_me, jnp.take(csr_dsts, local_idx), 0)
    dst = jax.lax.psum(dst, "row")  # column-local assembly
    eid = jnp.where(in_me, (i * c + j) * d_pad + local_idx, 0)
    eid = jax.lax.psum(eid, "row")
    if csr_w is not None:
        wv = jnp.where(in_me, jnp.take(csr_w, local_idx), 0.0)
        wv = jax.lax.psum(wv, "row")
    else:
        wv = None
    valid_out = jnp.broadcast_to(
        (ok & (d_total > 0))[:, None], dst.shape
    )
    if not with_replacement:
        arange_k = jnp.arange(k_fan, dtype=jnp.int32)[None, :]
        valid_out = valid_out & (arange_k < d_total[:, None])
    return dst, wv, eid, valid_out


def _level_draw_shuffled(mgg, frontier_loc, u_loc, nzd, nzd_off,
                         csr_dsts, csr_w, with_replacement, capacity):
    """One level with per-device frontier shards (n_loc,): requests
    shuffle to seed owners (two-stage bucketed all_to_all), the owner
    COLUMN draws on its O(n/C) batch, and answers shuffle back by
    (device, slot) return address — the reference's per-level
    shuffle-to-owner scheme (uniform_neighbor_sampling_impl.hpp:72)
    instead of O(n) replicated masked work per device.

    Returns ((dst, wv, eid, valid) each (n_loc, k), overflow)."""
    from . import mg_prims

    r, c = mgg.rows, mgg.cols
    i = jax.lax.axis_index("row")
    j = jax.lax.axis_index("col")
    n_loc = frontier_loc.shape[0]
    k_fan = u_loc.shape[1]
    me = j * r + i
    valid0 = frontier_loc >= 0
    safe_seed = jnp.maximum(frontier_loc, 0)
    items = {
        "u": u_loc,
        "addr": jnp.full(n_loc, me, jnp.int32),
        "slot": jnp.arange(n_loc, dtype=jnp.int32),
    }
    k_rx, pack, v_rx, ov1 = mg_prims.shuffle_to_vertex_owners(
        safe_seed, items, valid0, mgg.vp, capacity
    )
    # column batch: every row device of the column processes the whole
    # column's received requests (gathered over "row")
    m_loc = k_rx.shape[0]
    seeds_col = jax.lax.all_gather(k_rx, "row", axis=0).reshape(-1)
    u_col = jax.lax.all_gather(pack["u"], "row", axis=0).reshape(
        -1, k_fan
    )
    v_col = jax.lax.all_gather(v_rx, "row", axis=0).reshape(-1)
    dst, wv, eid, valid = _col_draw(
        mgg, seeds_col, v_col, u_col, nzd, nzd_off, csr_dsts, csr_w,
        with_replacement,
    )
    # each row device answers only the requests IT received
    start = i * m_loc
    dst_m = jax.lax.dynamic_slice_in_dim(dst, start, m_loc, axis=0)
    eid_m = jax.lax.dynamic_slice_in_dim(eid, start, m_loc, axis=0)
    val_m = jax.lax.dynamic_slice_in_dim(valid, start, m_loc, axis=0)
    back = {
        "dst": dst_m,
        "eid": eid_m,
        "val": val_m,
        "slot": pack["slot"],
        "addr": pack["addr"],
    }
    if wv is not None:
        back["wv"] = jax.lax.dynamic_slice_in_dim(wv, start, m_loc, axis=0)
    from .mg_prims import _shuffle_axis

    dest_col2 = pack["addr"] // r
    b1, bv1, ov2 = _shuffle_axis(back, dest_col2, v_rx, "col", capacity)
    dest_row2 = b1["addr"] % r
    b2, bv2, ov3 = _shuffle_axis(b1, dest_row2, bv1, "row", capacity)
    # scatter answers to the requesting slots
    slot2 = jnp.where(bv2, b2["slot"], n_loc)

    def put(a, fill=0):
        shp = (n_loc + 1,) + a.shape[1:]
        return (
            jnp.full(shp, fill, a.dtype).at[slot2].set(a, mode="drop")[
                :n_loc
            ]
        )

    dst_o = put(b2["dst"])
    eid_o = put(b2["eid"])
    val_o = put(b2["val"]) & valid0[:, None]
    wv_o = put(b2["wv"]) if wv is not None else None
    return (dst_o, wv_o, eid_o, val_o), ov1 + ov2 + ov3


def mg_uniform_neighbor_sample(
    mesh: Mesh,
    mgg: MGGraph,
    start_vertices,
    fanout_vals: Sequence[int],
    *,
    rng_key: Optional[jax.Array] = None,
    with_replacement: bool = False,
    method: str = "auto",
    shuffle_capacity: Optional[int] = None,
):
    """Multi-hop distributed sampling, device-resident across hops.

    Returns the reference contract (uniform_neighbor_sampling_impl.hpp):
    dict of numpy arrays {'sources', 'destinations', 'weights' (or None),
    'edge_ids', 'hop'}. One jitted program runs every hop; the only host
    transfer is the final compaction.

    method: "replicate" (default for minibatch frontiers) keeps the
    frontier replicated and every device does O(n) masked work — right
    for n up to ~1e6 (module docstring). "shuffle" keeps per-device
    frontier SHARDS and routes each seed to its owner column per level
    (the reference's shuffle_int_vertices_to_local_gpu_by_vertex_
    partitioning step, uniform_neighbor_sampling_impl.hpp:72) — O(n/C)
    per-device work, for huge frontiers. "auto" switches to shuffle
    past 2^20 seeds. Both methods draw identical edges for the same
    rng_key (tested on every mesh shape).

    shuffle_capacity: per-bucket all_to_all capacity for the shuffle
    method (default 4x the even split + 64); raised automatically (one
    retrace each doubling) when skewed destinations overflow."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    seeds_raw = np.atleast_1d(np.asarray(start_vertices)).astype(np.int32)
    fanouts = [int(k) for k in fanout_vals]
    n_dev = int(np.prod([mesh.shape[a] for a in ("row", "col")]))
    n_pad = max(-(-len(seeds_raw) // n_dev) * n_dev, n_dev)
    seeds0 = np.full(n_pad, -1, np.int32)
    seeds0[: len(seeds_raw)] = seeds_raw
    if method == "auto":
        method = "shuffle" if len(seeds_raw) >= (1 << 20) else "replicate"
    sizes = [n_pad]
    for k in fanouts:
        sizes.append(sizes[-1] * k)
    us = []
    for h, k in enumerate(fanouts):
        rng_key, sub = jax.random.split(rng_key)
        us.append(jax.random.uniform(sub, (sizes[h], k)))
    args = _sample_args(mgg)
    weighted = mgg.src_csr_weights is not None
    n_us = len(us)

    @partial(jax.jit, static_argnames=("with_replacement",))
    def run_jit(seeds, *all_args, with_replacement=False):
        us_, gargs = all_args[:n_us], all_args[n_us:]

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(),) + tuple([P()] * n_us)
            + tuple([BLOCK3] * len(gargs)),
            out_specs=P(),
        )
        def run(seeds, *rest):
            us_l, gargs_l = rest[:n_us], rest[n_us:]
            nzd = gargs_l[0][0, 0]
            nzd_off = gargs_l[1][0, 0]
            csr_dsts = gargs_l[2][0, 0]
            csr_w = gargs_l[3][0, 0] if weighted else None
            frontier = seeds
            outs = []
            for h in range(n_us):
                src_h = frontier
                dst, wv, eid, valid = _level_draw(
                    mgg, frontier, us_l[h], nzd, nzd_off, csr_dsts,
                    csr_w, with_replacement,
                )
                outs.append(
                    (
                        jnp.broadcast_to(src_h[:, None], dst.shape),
                        dst,
                        wv if wv is not None else jnp.zeros_like(dst, jnp.float32),
                        eid,
                        valid,
                    )
                )
                frontier = jnp.where(valid, dst, -1).reshape(-1)
            # flatten per-hop tuples into one tuple of arrays
            flat = tuple(a for tup in outs for a in tup)
            return flat

        return run(seeds, *all_args)

    @partial(jax.jit, static_argnames=("with_replacement", "capacity"))
    def run_shuffled_jit(seeds, *all_args, with_replacement=False,
                         capacity=64):
        us_, gargs = all_args[:n_us], all_args[n_us:]
        sharded = P(("row", "col"))

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(sharded,) + tuple([sharded] * n_us)
            + tuple([BLOCK3] * len(gargs)),
            out_specs=tuple(
                [sharded] * (5 * n_us)
            )
            + (P(),),
        )
        def run(seeds, *rest):
            us_l, gargs_l = rest[:n_us], rest[n_us:]
            nzd = gargs_l[0][0, 0]
            nzd_off = gargs_l[1][0, 0]
            csr_dsts = gargs_l[2][0, 0]
            csr_w = gargs_l[3][0, 0] if weighted else None
            frontier = seeds
            outs = []
            overflow = jnp.int32(0)
            for h in range(n_us):
                src_h = frontier
                (dst, wv, eid, valid), ov = _level_draw_shuffled(
                    mgg, frontier, us_l[h], nzd, nzd_off, csr_dsts,
                    csr_w, with_replacement, capacity,
                )
                overflow = overflow + ov
                outs.append(
                    (
                        jnp.broadcast_to(src_h[:, None], dst.shape),
                        dst,
                        wv
                        if wv is not None
                        else jnp.zeros_like(dst, jnp.float32),
                        eid,
                        valid,
                    )
                )
                frontier = jnp.where(valid, dst, -1).reshape(-1)
            flat = tuple(a for tup in outs for a in tup)
            return flat + (overflow,)

        return run(seeds, *all_args)

    if method == "shuffle":
        cap = shuffle_capacity or max(
            4 * (sizes[-2] // n_dev) // max(mesh.shape["col"], 1), 64
        )
        while True:
            out = run_shuffled_jit(
                jnp.asarray(seeds0), *us, *args,
                with_replacement=with_replacement, capacity=int(cap),
            )
            flat, overflow = out[:-1], int(out[-1])
            if overflow == 0:
                break
            cap *= 2  # reference two-pass: count, then re-exchange
    else:
        flat = run_jit(
            jnp.asarray(seeds0), *us, *args,
            with_replacement=with_replacement,
        )
    out_s: List[np.ndarray] = []
    out_d: List[np.ndarray] = []
    out_w: List[np.ndarray] = []
    out_e: List[np.ndarray] = []
    out_h: List[np.ndarray] = []
    for h in range(n_us):
        src, dst, wv, eid, valid = (np.asarray(a) for a in flat[5 * h : 5 * h + 5])
        m = valid.reshape(-1)
        out_s.append(src.reshape(-1)[m])
        out_d.append(dst.reshape(-1)[m])
        out_w.append(wv.reshape(-1)[m])
        out_e.append(eid.reshape(-1)[m])
        out_h.append(np.full(int(m.sum()), h, np.int32))
    cat = lambda xs, dt: (  # noqa: E731
        np.concatenate(xs) if xs else np.zeros(0, dt)
    )
    return {
        "sources": cat(out_s, np.int32),
        "destinations": cat(out_d, np.int32),
        "weights": cat(out_w, np.float32) if weighted else None,
        "edge_ids": cat(out_e, np.int32),
        "hop": cat(out_h, np.int32),
    }


def mg_random_walks(
    mesh: Mesh,
    mgg: MGGraph,
    start_vertices,
    max_depth: int,
    *,
    rng_key: Optional[jax.Array] = None,
) -> np.ndarray:
    """Distributed uniform random walks: each step is a fanout-1 draw via
    the column-span ownership scheme (ref: the random-walk path of
    sampling/random_walks.cuh), device-resident across steps. Returns
    (N, max_depth+1) numpy walks padded with -1 after hitting a sink."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    cur0 = np.atleast_1d(np.asarray(start_vertices)).astype(np.int32)
    n = len(cur0)
    depth = int(max_depth)
    us = []
    for _ in range(depth):
        rng_key, sub = jax.random.split(rng_key)
        us.append(jax.random.uniform(sub, (n, 1)))
    args = _sample_args(mgg)
    weighted = mgg.src_csr_weights is not None
    n_us = depth

    @jax.jit
    def run_jit(cur, *all_args):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(),) + tuple([P()] * n_us)
            + tuple([BLOCK3] * (len(all_args) - n_us)),
            out_specs=P(),
        )
        def run(cur, *rest):
            us_l, gargs_l = rest[:n_us], rest[n_us:]
            nzd = gargs_l[0][0, 0]
            nzd_off = gargs_l[1][0, 0]
            csr_dsts = gargs_l[2][0, 0]
            csr_w = gargs_l[3][0, 0] if weighted else None
            steps = [cur]
            for h in range(n_us):
                dst, _w, _e, valid = _level_draw(
                    mgg, steps[-1], us_l[h], nzd, nzd_off, csr_dsts,
                    csr_w, True,
                )
                steps.append(
                    jnp.where(valid[:, 0] & (steps[-1] >= 0), dst[:, 0], -1)
                )
            return jnp.stack(steps, axis=1)

        return run(cur, *all_args)

    return np.asarray(run_jit(jnp.asarray(cur0), *us, *args))
