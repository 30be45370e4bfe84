"""GNN neighborhood aggregation = SpMM on the same CSR substrate.

The BASELINE.json north star: "GNN aggregation (GraphSAGE/GCN mean/max) are
expressed on the same neighborhood-aggregate substrate" as the analytics.
These are feature-matrix (V, F) versions of per_v_transform_reduce —
gather rows, segment-reduce by destination. XLA fuses the gather into the
segment-sum scatter; F rides the TPU lane dimension (pad F to 128 for best
MXU/VPU utilization).

ref counterpart: cugraph's GNN consumers delegate aggregation to
DGL/PyG kernels over sampled blocks (gnn/graph_store.py:155); here
aggregation is first-class.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from ..prims.per_v import per_v_transform_reduce_incoming_e
from ..prims.reduce_ops import MAXIMUM, PLUS


def spmm_aggregate(
    g: Graph,
    features: jax.Array,
    *,
    op: str = "mean",
    use_weights: bool = False,
    precision: str = "bf16_pair",
) -> jax.Array:
    """out[v] = op over incoming neighbors' feature rows. op: sum|mean|max.

    precision (sorted-pipeline path only): "bf16_pair" (default) rounds
    inputs/group totals to bf16 with f32 accumulation — the usual GNN
    mixed-precision contract, ~2x faster; "f32" is exact."""

    def e_op(s, d, sv, dv, w):
        if use_weights and w is not None:
            return sv * w[:, None]
        return sv

    if op in ("sum", "mean"):
        # Small V (GNN minibatch blocks): dense adjacency on the MXU —
        # one matmul at ~100 T MAC/s (prims/dense_spmm.py).
        from ..prims.dense_spmm import dense_adj_for, dense_spmm

        a = dense_adj_for(g, use_weights=use_weights)
        if a is not None:
            agg = dense_spmm(a, features)
            if op == "mean":
                deg = g.in_degrees().astype(features.dtype)
                agg = agg / jnp.maximum(deg, 1)[:, None]
            return agg

        # Large V on TPU: the row-gather engine (feature ROWS move as
        # units through VMEM-resident src-range tables + MXU one-hot
        # window reduce — prims/pallas/spmm_row.py; ~5x the element-level
        # multi-stream pipeline at F=128). CUGRAPH_TPU_SPMM_ENGINE=benes
        # forces the old path (comparison/bench).
        import os

        lay = rlay = None
        # layout build is host-side: only when the graph is concrete
        # (closed over / outside jit), not a traced argument
        concrete = g.num_edges >= 1 << 18 and not isinstance(
            g.csc().majors, jax.core.Tracer
        )
        engine = os.environ.get("CUGRAPH_TPU_SPMM_ENGINE", "row")
        row_prec = "f32" if precision == "f32" else "bf16"
        if concrete and engine == "row":
            from ..prims.pallas.spmm_row import row_spmm_layout_for

            rlay = row_spmm_layout_for(g, use_weights=use_weights)
        if concrete and rlay is None:
            from ..prims.pallas.spmv2 import sorted_layout_for

            lay = sorted_layout_for(g, use_weights=use_weights)
        if rlay is not None:
            from ..prims.pallas.spmm_row import row_spmm

            agg = row_spmm(
                rlay, features.astype(jnp.float32), precision=row_prec
            ).astype(features.dtype)
        elif lay is not None:
            from ..prims.pallas.spmv2 import sorted_spmm

            agg = sorted_spmm(
                lay, features.astype(jnp.float32), precision=precision
            ).astype(features.dtype)
        else:
            agg = per_v_transform_reduce_incoming_e(
                g, e_op, reduce_op=PLUS, src_values=features
            )
        if op == "mean":
            deg = g.in_degrees().astype(features.dtype)
            agg = agg / jnp.maximum(deg, 1)[:, None]
        return agg
    if op == "max":
        agg = per_v_transform_reduce_incoming_e(
            g, e_op, reduce_op=MAXIMUM, src_values=features
        )
        # isolated vertices: -inf -> 0
        return jnp.where(jnp.isfinite(agg), agg, 0.0)
    raise ValueError(f"unknown op {op!r}")


def gcn_aggregate(g: Graph, features: jax.Array) -> jax.Array:
    """Symmetric-normalized aggregation: D^-1/2 (A+I) D^-1/2 X (Kipf-Welling)."""
    deg = g.in_degrees().astype(features.dtype) + 1.0
    dinv = jax.lax.rsqrt(deg)
    scaled = features * dinv[:, None]
    agg = spmm_aggregate(g, scaled, op="sum") + scaled  # +I self edge
    return agg * dinv[:, None]


def sage_aggregate(
    g: Graph, features: jax.Array, *, op: str = "mean"
) -> jax.Array:
    """GraphSAGE: concat(self, neighbor-agg)."""
    nbr = spmm_aggregate(g, features, op=op)
    return jnp.concatenate([features, nbr], axis=-1)
