"""Distributed betweenness centrality via batch replication.

ref: the reference computes MG betweenness by replicating the graph to
every worker and splitting the SOURCE batch across them
(python/cugraph/cugraph/tests/mg/test_mg_batch_betweenness_centrality.py,
the dask batch path of python/cugraph/cugraph/centrality/
betweenness_centrality.py) — Brandes is embarrassingly parallel over
sources, so this beats 2D-partitioned traversal for exact/sampled BC.

TPU-native: the Graph pytree is passed replicated (in_specs=P()) into a
shard_map whose SOURCE axis is sharded over the whole ("row","col") mesh;
each device runs the same vmapped Brandes as SG (algos/centrality.py) on
its source slice and the per-vertex dependencies merge with a two-axis
psum.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algos.centrality import _brandes_batch
from ..core.csr import Graph
from ..utils.dtypes import WEIGHT_DTYPE


def _sources_grid(mesh: Mesh, v: int, k: Optional[int], seed: int):
    r, c = mesh.devices.shape
    n_dev = r * c
    if k is None:
        sources = np.arange(v, dtype=np.int32)
    else:
        sources = np.asarray(
            jax.random.choice(
                jax.random.PRNGKey(seed), v, shape=(int(k),), replace=False
            ),
            dtype=np.int32,
        )
    n = len(sources)
    per_dev = -(-n // n_dev)
    pad = np.full(n_dev * per_dev, -1, np.int32)
    pad[:n] = sources
    grid = pad.reshape(r, c, per_dev)
    return (
        jax.device_put(grid, NamedSharding(mesh, P("row", "col"))),
        sources,
        n,
    )


def _mg_brandes_total(mesh: Mesh, g: Graph, src_grid, endpoints: bool):
    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("row", "col", None)),
        out_specs=(P(), P()),
    )
    def run(g_rep, src_l):
        s = src_l[0, 0]
        ok = s >= 0
        delta, edge_delta, reach = _brandes_batch(
            g_rep, jnp.maximum(s, 0), vary_axes=("row", "col")
        )
        okf = ok[:, None].astype(WEIGHT_DTYPE)
        bc = jnp.sum(delta * okf, axis=0)
        ebc = jnp.sum(edge_delta * okf, axis=0)
        if endpoints:
            bc = bc + jnp.sum(reach & ok[:, None], axis=0).astype(WEIGHT_DTYPE)
            per_src = jnp.sum(reach, axis=1).astype(WEIGHT_DTYPE)
            bc = bc.at[jnp.where(ok, s, g_rep.num_vertices)].add(
                jnp.where(ok, per_src, 0.0), mode="drop"
            )
        bc = jax.lax.psum(jax.lax.psum(bc, "row"), "col")
        ebc = jax.lax.psum(jax.lax.psum(ebc, "row"), "col")
        return bc, ebc

    return run(g, src_grid)


def mg_betweenness_centrality(
    mesh: Mesh,
    g: Graph,
    k: Optional[int] = None,
    normalized: bool = True,
    endpoints: bool = False,
    seed: int = 0,
) -> jax.Array:
    """Batch-replicated MG betweenness. Returns a replicated (V,) array
    identical to algos.centrality.betweenness_centrality."""
    v = g.num_vertices
    src_grid, _, n = _sources_grid(mesh, v, k, seed)
    bc, _ = _mg_brandes_total(mesh, g, src_grid, endpoints)
    if k is not None:
        bc = bc * (v / max(int(k), 1))
    if g.is_symmetric:
        bc = bc / 2.0
    if normalized and v > 2:
        denom = v * (v - 1) if endpoints else (v - 1) * (v - 2)
        if g.is_symmetric:
            denom = denom / 2.0
        bc = bc / denom
    return bc


def mg_edge_betweenness_centrality(
    mesh: Mesh,
    g: Graph,
    k: Optional[int] = None,
    normalized: bool = True,
    seed: int = 0,
) -> jax.Array:
    """Batch-replicated MG edge betweenness over g.csr() padded slots."""
    v = g.num_vertices
    src_grid, _, n = _sources_grid(mesh, v, k, seed)
    _, ebc = _mg_brandes_total(mesh, g, src_grid, endpoints=False)
    if k is not None:
        ebc = ebc * (v / max(int(k), 1))
    if g.is_symmetric:
        ebc = ebc / 2.0
    if normalized:
        denom = v * (v - 1)
        if g.is_symmetric:
            denom = denom / 2.0
        ebc = ebc / max(denom, 1)
    return ebc
