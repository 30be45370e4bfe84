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

Frontier replication instead of an owner shuffle is deliberate: GNN
minibatch frontiers are tiny relative to the graph, SPMD needs fixed
shapes, and a capacity-bounded all_to_all would have to provision the
worst case (all seeds in one column) anyway — the psum assembly IS the
shuffle, with capacity = frontier size. Per-device lookup work is O(n)
masked instead of O(n / C) — acceptable for n in the 1e3..1e6 range the
reference's minibatch path serves.

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


def mg_uniform_neighbor_sample(
    mesh: Mesh,
    mgg: MGGraph,
    start_vertices,
    fanout_vals: Sequence[int],
    *,
    rng_key: Optional[jax.Array] = None,
    with_replacement: bool = False,
):
    """Multi-hop distributed sampling, device-resident across hops.

    Returns the reference contract (uniform_neighbor_sampling_impl.hpp):
    dict of numpy arrays {'sources', 'destinations', 'weights' (or None),
    'edge_ids', 'hop'}. One jitted program runs every hop; the only host
    transfer is the final compaction."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    seeds0 = np.atleast_1d(np.asarray(start_vertices)).astype(np.int32)
    fanouts = [int(k) for k in fanout_vals]
    sizes = [len(seeds0)]
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

    flat = run_jit(
        jnp.asarray(seeds0), *us, *args, with_replacement=with_replacement
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
