"""GraphSAGE and GCN models (flax) over the SpMM aggregation substrate.

The flagship compute path for the driver's entry() check and the GraphSAGE
benchmark config (BASELINE.json config #4). Weights use bfloat16-friendly
initializers; matmuls run on the MXU with f32 accumulation.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.csr import Graph
from .aggregators import gcn_aggregate, spmm_aggregate


class SAGEConv(nn.Module):
    out_features: int
    aggregate: str = "mean"

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        nbr = spmm_aggregate(g, x, op=self.aggregate)
        h_self = nn.Dense(self.out_features, name="self")(x)
        h_nbr = nn.Dense(self.out_features, name="nbr")(nbr)
        return h_self + h_nbr


class GraphSAGE(nn.Module):
    """N-layer GraphSAGE (mean aggregator) node classifier/embedder."""

    hidden_features: int = 128
    out_features: int = 64
    num_layers: int = 2
    aggregate: str = "mean"

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = SAGEConv(self.hidden_features, self.aggregate, name=f"conv{i}")(g, x)
            x = nn.relu(x)
        x = SAGEConv(
            self.out_features, self.aggregate, name=f"conv{self.num_layers - 1}"
        )(g, x)
        # L2-normalized embeddings (standard GraphSAGE output)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class GCN(nn.Module):
    """Kipf-Welling GCN with symmetric normalization."""

    hidden_features: int = 128
    out_features: int = 64
    num_layers: int = 2

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = gcn_aggregate(g, x)
            x = nn.Dense(self.hidden_features, name=f"dense{i}")(x)
            x = nn.relu(x)
        x = gcn_aggregate(g, x)
        return nn.Dense(self.out_features, name=f"dense{self.num_layers - 1}")(x)
