"""Distributed GraphSAGE training step — the multi-chip GNN path.

Composition pattern: the sparse neighborhood aggregation runs in shard_map
(explicit all_gather over "row" + psum_scatter over "col",
dist/mg_prims.py), while the dense layers ride GSPMD auto-sharding —
parameters replicated, activations sharded over the vertex dimension, XLA
inserting the parameter-gradient psum. jax.grad differentiates straight
through the shard_map collectives (all_gather^T = psum_scatter and vice
versa), so one jit covers forward + backward + SGD update end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.dtypes import WEIGHT_DTYPE
from . import mg_algos
from .mg_graph import MGGraph


def init_sage_params(
    rng_key, in_features: int, hidden: int, out_features: int
) -> Dict[str, jax.Array]:
    k1, k2, k3, k4 = jax.random.split(rng_key, 4)
    s1 = 1.0 / np.sqrt(2 * in_features)
    s2 = 1.0 / np.sqrt(2 * hidden)
    return {
        "w_self1": jax.random.normal(k1, (in_features, hidden), WEIGHT_DTYPE) * s1,
        "w_nbr1": jax.random.normal(k2, (in_features, hidden), WEIGHT_DTYPE) * s1,
        "w_self2": jax.random.normal(k3, (hidden, out_features), WEIGHT_DTYPE) * s2,
        "w_nbr2": jax.random.normal(k4, (hidden, out_features), WEIGHT_DTYPE) * s2,
    }


def mg_sage_forward(mesh: Mesh, mgg: MGGraph, params, feats) -> jax.Array:
    """2-layer mean-aggregate GraphSAGE on (R, C, vp, F) sharded features."""
    h = feats
    agg = mg_algos.mg_spmm_aggregate(mesh, mgg, h, op="mean")
    h = jax.nn.relu(
        jnp.einsum("rcvf,fh->rcvh", h, params["w_self1"])
        + jnp.einsum("rcvf,fh->rcvh", agg, params["w_nbr1"])
    )
    agg2 = mg_algos.mg_spmm_aggregate(mesh, mgg, h, op="mean")
    out = jnp.einsum("rcvh,ho->rcvo", h, params["w_self2"]) + jnp.einsum(
        "rcvh,ho->rcvo", agg2, params["w_nbr2"]
    )
    return out


def make_sage_train_step(mesh: Mesh, mgg: MGGraph, lr: float = 1e-2):
    """Returns jitted train_step(params, feats, targets) -> (params, loss).

    feats/targets: (R, C, vp, F) sharded over ("row", "col"); params
    replicated. This is the FULL training step the driver dry-runs
    multi-chip (forward + collectives + backward + update in one jit).
    """

    def loss_fn(params, feats, targets):
        out = mg_sage_forward(mesh, mgg, params, feats)
        # mask the padded vertex tail out of the loss
        r, c, vp = mgg.rows, mgg.cols, mgg.vp
        i = jnp.arange(r)[:, None, None]
        j = jnp.arange(c)[None, :, None]
        k = jnp.arange(vp)[None, None, :]
        gid = (j * r + i) * vp + k
        mask = (gid < mgg.num_vertices).astype(WEIGHT_DTYPE)[..., None]
        err = (out - targets) ** 2 * mask
        return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def train_step(params, feats, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, targets)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return train_step
