"""Uniform neighbor sampling — the GNN minibatch path.

ref: cpp/src/sampling/uniform_neighbor_sampling_impl.hpp (per-level loop
:69-115; fanout < 0 = gather all one-hop neighbors, sampling_utils_impl.cuh
:96; dedup :44-80).

TPU-native: each level is a fixed-shape (frontier, fanout) draw from the
Floyd-sampling prim (prims/random_select.py); "all neighbors" uses a
max-degree candidate tile with a validity mask. Results stay padded with
masks; ``compress=True`` compacts on the host for dataframe-style output
like the reference's.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.csr import Graph
from ..prims.random_select import per_v_random_select_outgoing_e
from ..prims.intersection import _candidate_tile


def _gather_one_hop(g: Graph, vertices: jax.Array, max_degree: int):
    """fanout < 0: all outgoing edges of the frontier (ref :96)."""
    adj = g.csr()
    v_safe = jnp.maximum(vertices, 0)
    cand, mask = _candidate_tile(adj, v_safe, max_degree)
    mask = mask & (vertices >= 0)[:, None]
    srcs = jnp.broadcast_to(v_safe[:, None], cand.shape)
    if adj.weights is not None:
        starts = jnp.take(adj.offsets, v_safe)
        slot = jnp.arange(max_degree, dtype=jnp.int32)[None, :]
        eidx = jnp.clip(starts[:, None] + slot, 0, adj.e_pad - 1)
        w = jnp.take(adj.weights, eidx)
    else:
        w = None
    return srcs, cand, w, mask


def uniform_neighbor_sample(
    g: Graph,
    start_vertices,
    fanout_vals: Sequence[int],
    *,
    with_replacement: bool = False,
    rng_key: Optional[jax.Array] = None,
    compress: bool = True,
):
    """Multi-hop uniform neighbor sampling.

    Returns, when compress=True (host output like the reference's cudf
    result): dict with 'sources', 'destinations', 'weights' (or None),
    'hop' numpy arrays of sampled edges. When compress=False: a list of
    per-hop (srcs, dsts, weights, valid) padded device arrays.
    """
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    frontier = jnp.atleast_1d(jnp.asarray(start_vertices, dtype=jnp.int32))
    max_deg = int(jnp.max(g.out_degrees())) if g.num_edges else 1
    per_hop = []
    for hop, k in enumerate(fanout_vals):
        rng_key, sub = jax.random.split(rng_key)
        if k < 0:
            srcs, dsts, w, valid = _gather_one_hop(g, frontier, max(max_deg, 1))
        else:
            srcs, dsts, w, valid = per_v_random_select_outgoing_e(
                g, sub, frontier, int(k), with_replacement=with_replacement
            )
        per_hop.append((srcs, dsts, w, valid))
        # next frontier: sampled destinations (padding -> -1)
        frontier = jnp.where(valid, dsts, -1).reshape(-1)
    if not compress:
        return per_hop
    out_s: List[np.ndarray] = []
    out_d: List[np.ndarray] = []
    out_w: List[np.ndarray] = []
    out_h: List[np.ndarray] = []
    for hop, (srcs, dsts, w, valid) in enumerate(per_hop):
        m = np.asarray(valid).reshape(-1)
        out_s.append(np.asarray(srcs).reshape(-1)[m])
        out_d.append(np.asarray(dsts).reshape(-1)[m])
        if w is not None:
            out_w.append(np.asarray(w).reshape(-1)[m])
        out_h.append(np.full(int(m.sum()), hop, dtype=np.int32))
    return {
        "sources": np.concatenate(out_s) if out_s else np.zeros(0, np.int32),
        "destinations": np.concatenate(out_d) if out_d else np.zeros(0, np.int32),
        "weights": np.concatenate(out_w) if out_w else None,
        "hop": np.concatenate(out_h) if out_h else np.zeros(0, np.int32),
    }
