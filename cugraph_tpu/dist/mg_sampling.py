"""Distributed uniform neighbor sampling.

ref: cpp/src/sampling/uniform_neighbor_sampling_impl.hpp (per-level shuffle
+ per_v_random_select, SURVEY.md §3.4).

TPU-native scheme (fixed shapes, no ragged shuffles): seeds are replicated
(GNN minibatches are small relative to the graph). Per level:
  1. every device computes, for each seed in its column span, its LOCAL
     out-degree from the DCSR src adjacency;
  2. all_gather over "row" -> per-device degree prefix across the column
     (the column's devices jointly own all out-edges of the span);
  3. identical draws (same key everywhere) pick global edge slots in
     [0, total_degree); the device whose prefix range contains a slot
     emits that edge's dst, everyone else emits 0 — a two-axis psum
     assembles the replicated result (exactly one owner per slot).
Without-replacement draws use Floyd's K-subset on the replicated global
degree (exact distinct slots, same algorithm as the SG prim
prims/random_select.py); with-replacement is the plain uniform draw.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..utils.dtypes import WEIGHT_DTYPE
from .mg_graph import MGGraph

BLOCK3 = P("row", "col", None)


def mg_uniform_neighbor_sample(
    mesh: Mesh,
    mgg: MGGraph,
    start_vertices,
    fanout_vals: Sequence[int],
    *,
    rng_key: Optional[jax.Array] = None,
    with_replacement: bool = False,
):
    """Multi-hop distributed sampling. Returns dict of numpy arrays
    {'sources', 'destinations', 'hop'} like the SG version (weights join
    in a later round). with_replacement=False draws exact distinct edges
    per seed (Floyd's K-subset over the replicated global degree)."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    seeds = jnp.atleast_1d(jnp.asarray(start_vertices, jnp.int32))
    out_s: List[np.ndarray] = []
    out_d: List[np.ndarray] = []
    out_h: List[np.ndarray] = []
    for hop, k in enumerate(fanout_vals):
        k = int(k)
        rng_key, sub = jax.random.split(rng_key)
        n = int(seeds.shape[0])
        u = jax.random.uniform(sub, (n, k))
        dsts, valid = _mg_sample_level(
            mesh, mgg, seeds, u, with_replacement=with_replacement
        )
        dsts_np = np.asarray(dsts)
        valid_np = np.asarray(valid)
        seeds_np = np.asarray(seeds)
        srcs_np = np.broadcast_to(seeds_np[:, None], dsts_np.shape)
        m = valid_np.reshape(-1)
        out_s.append(srcs_np.reshape(-1)[m])
        out_d.append(dsts_np.reshape(-1)[m])
        out_h.append(np.full(int(m.sum()), hop, np.int32))
        nxt = dsts_np.reshape(-1)[m]
        seeds = jnp.asarray(
            nxt if len(nxt) else np.zeros(1, np.int32), dtype=jnp.int32
        )
        if not len(nxt):
            break
    return {
        "sources": np.concatenate(out_s) if out_s else np.zeros(0, np.int32),
        "destinations": np.concatenate(out_d) if out_d else np.zeros(0, np.int32),
        "hop": np.concatenate(out_h) if out_h else np.zeros(0, np.int32),
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
    the same column-span ownership scheme (ref: the MG random-walk path of
    sampling/random_walks.cuh). Returns (N, max_depth+1) numpy walks
    padded with -1 after hitting a sink."""
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    cur = jnp.atleast_1d(jnp.asarray(start_vertices, jnp.int32))
    n = int(cur.shape[0])
    walks = [np.asarray(cur)]
    alive = np.ones(n, dtype=bool)
    for _ in range(int(max_depth)):
        rng_key, sub = jax.random.split(rng_key)
        u = jax.random.uniform(sub, (n, 1))
        nxt, valid = _mg_sample_level(mesh, mgg, jnp.maximum(cur, 0), u)
        nxt_np = np.asarray(nxt)[:, 0]
        valid_np = np.asarray(valid)[:, 0] & alive & (np.asarray(cur) >= 0)
        step = np.where(valid_np, nxt_np, -1).astype(np.int32)
        walks.append(step)
        alive = valid_np
        cur = jnp.asarray(np.where(valid_np, nxt_np, 0).astype(np.int32))
    return np.stack(walks, axis=1)


def _mg_sample_level(
    mesh: Mesh,
    mgg: MGGraph,
    seeds: jax.Array,
    u: jax.Array,
    with_replacement: bool = True,
):
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    span = r * vp

    args = [mgg.src_nzd, mgg.src_nzd_offsets, mgg.src_csr_dsts]

    @partial(jax.jit, static_argnames=("with_replacement",))
    def run_jit(seeds, u, *gargs, with_replacement=True):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P()) + tuple([BLOCK3] * len(gargs)),
            out_specs=(P(), P()),
        )
        def run(seeds, u, nzd, nzd_off, csr_dsts):
            from . import mg_prims

            nzd = nzd[0, 0]  # (nz_pad,) DCSR non-zero-degree sources
            nzd_off = nzd_off[0, 0]
            csr_dsts = csr_dsts[0, 0]  # (d_pad,)
            j = jax.lax.axis_index("col")
            # seeds in my column span -> local index; else clamp with mask
            local = seeds - j * span
            mine = (local >= 0) & (local < span)
            safe = jnp.clip(local, 0, span - 1)
            lo, deg0 = mg_prims.dcsr_lookup(nzd, nzd_off, safe)
            deg_local = jnp.where(mine, deg0, 0)
            # degree prefix across the column (devices i = 0..R-1)
            degs_all = jax.lax.all_gather(deg_local, "row", axis=0)  # (R, n)
            i = jax.lax.axis_index("row")
            prefix = jnp.cumsum(degs_all, axis=0) - degs_all  # exclusive
            my_prefix = prefix[i]  # (n,)
            d_total = jnp.sum(degs_all, axis=0)  # (n,) replicated over row
            k_fan = u.shape[1]
            if with_replacement:
                # identical draws everywhere: global slot per (seed, k)
                slot = jnp.minimum(
                    (u * d_total[:, None].astype(u.dtype)).astype(jnp.int32),
                    jnp.maximum(d_total[:, None] - 1, 0),
                )
            else:
                # Floyd's K-subset over the replicated global degree: exact
                # distinct slots (same algorithm as prims/random_select.py)
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
            local_idx = jnp.clip(
                lo[:, None] + slot - my_prefix[:, None], 0, csr_dsts.shape[0] - 1
            )
            dst = jnp.where(in_me, jnp.take(csr_dsts, local_idx), 0)
            # exactly one device owns each slot -> two-axis psum assembles
            dst = jax.lax.psum(jax.lax.psum(dst, "row"), "col")
            # validity: seed owned by some column AND has degree > 0
            valid1 = jnp.where(mine, (d_total > 0).astype(jnp.int32), 0)
            valid1 = jax.lax.psum(jax.lax.psum(valid1, "col"), "row") > 0
            valid = jnp.broadcast_to(valid1[:, None], dst.shape)
            if not with_replacement:
                # degree < fanout: only the first d_total slots are real.
                # d_total is nonzero only in the seed-owning column; psum
                # replicates it so the mask is mesh-invariant.
                d_rep = (
                    jax.lax.psum(
                        jax.lax.psum(jnp.where(mine, d_total, 0), "col"), "row"
                    )
                    // r
                )
                arange_k = jnp.arange(u.shape[1], dtype=jnp.int32)[None, :]
                valid = valid & (arange_k < d_rep[:, None])
            return dst, valid

        return run(seeds, u, *gargs)

    return run_jit(seeds, u, *args, with_replacement=with_replacement)
