"""Graph containers: COO ingest -> (renumber) -> padded CSR/CSC.

TPU-native analog of the reference's owning ``graph_t`` / non-owning
``graph_view_t`` pair (ref: cpp/include/cugraph/graph.hpp,
cpp/include/cugraph/graph_view.hpp:320-1088) and of
``create_graph_from_edgelist`` (ref:
cpp/src/structure/create_graph_from_edgelist_impl.cuh).

Design notes (TPU-first, not a port):

- XLA needs static shapes: the edge arrays are padded to a multiple of the
  VPU lane width (128).  Padding slots carry ``major == num_majors`` (an
  out-of-range segment id that reduces into a discarded extra bucket),
  ``minor == 0`` and ``weight == 0``; because edges are sorted by major the
  padding is contiguous at the tail, so validity is simply
  ``slot_id < num_edges``.
- Instead of the reference's single ``store_transposed`` bool (which forces
  a transpose pass when an algorithm needs the other orientation, ref:
  cpp/src/c_api/pagerank.cpp:105-107), a ``Graph`` may carry both the
  out-adjacency (CSR by src — push algorithms) and the in-adjacency (CSC by
  dst — pull algorithms); each is built lazily on the host and cached.
  For symmetric graphs one structure is shared.
- Edge-centric prims want the expanded major per edge slot
  (``majors``) for segment reductions; keeping it materialized costs E*4
  bytes and saves a searchsorted per prim call.
- Degree-based segmentation (the reference buckets rows into
  high/mid/low/hypersparse for per-segment kernels,
  graph_view.hpp:258-263) is deferred to the Pallas kernel layer; the
  degree-sorted renumbering performed at ingest (renumber.py) already
  places heavy rows first, which is what the bucketed kernels need.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import LANE, NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE, round_up
from ..utils.error import expects


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompressedAdj:
    """One compressed adjacency structure (CSR if major==src, CSC if major==dst).

    Analog of the per-edge-partition CSR view
    (ref: cpp/include/cugraph/edge_partition_device_view.cuh:44-79) for the
    single-device case: offsets/minors plus the expanded major id per edge.
    """

    offsets: jax.Array  # (num_majors + 1,) int32
    minors: jax.Array  # (e_pad,) int32, sorted by major; tail padding
    majors: jax.Array  # (e_pad,) int32 expanded major per slot; padding -> num_majors
    weights: Optional[jax.Array]  # (e_pad,) float32 or None
    num_majors: int = dataclasses.field(metadata=dict(static=True))
    num_minors: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def e_pad(self) -> int:
        return int(self.minors.shape[0])

    def degrees(self) -> jax.Array:
        return self.offsets[1:] - self.offsets[:-1]

    def valid(self) -> jax.Array:
        """Boolean mask over edge slots (True = real edge)."""
        return jnp.arange(self.e_pad, dtype=jnp.int32) < self.num_edges

    def edge_weights_or_ones(self) -> jax.Array:
        if self.weights is not None:
            return self.weights
        return self.valid().astype(NP_WEIGHT_DTYPE)


def _build_adj_np(
    majors: np.ndarray,
    minors: np.ndarray,
    weights: Optional[np.ndarray],
    num_majors: int,
    num_minors: int,
) -> CompressedAdj:
    """Host-side compression: sort edges by (major, minor), pad, build offsets.

    Dispatches to the native C++ builder (cugraph_tpu/native) when present;
    numpy otherwise."""
    from .. import native

    e = int(majors.shape[0])
    e_pad = round_up(max(e, 1), LANE)
    if weights is not None:
        weights = np.asarray(weights, dtype=NP_WEIGHT_DTYPE)
    offsets, majors_p, minors_p, weights_p = native.build_csr(
        np.asarray(majors), np.asarray(minors), weights, num_majors, e_pad
    )
    return CompressedAdj(
        offsets=jnp.asarray(offsets),
        minors=jnp.asarray(minors_p),
        majors=jnp.asarray(majors_p),
        weights=None if weights_p is None else jnp.asarray(weights_p),
        num_majors=int(num_majors),
        num_minors=int(num_minors),
        num_edges=e,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """Single-device graph. Immutable pytree; safe to close over under jit.

    ``out_adj``: compressed by src (edges of a vertex = its outgoing edges).
    ``in_adj``:  compressed by dst (edges of a vertex = its incoming edges).
    Symmetric graphs share one structure for both.
    """

    out_adj: Optional[CompressedAdj]
    in_adj: Optional[CompressedAdj]
    num_vertices: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    is_symmetric: bool = dataclasses.field(default=False, metadata=dict(static=True))
    is_multigraph: bool = dataclasses.field(default=False, metadata=dict(static=True))

    # ---- orientation accessors -------------------------------------------
    @property
    def weighted(self) -> bool:
        adj = self.out_adj if self.out_adj is not None else self.in_adj
        return adj is not None and adj.weights is not None

    def csr(self) -> CompressedAdj:
        """Out-adjacency (major = src)."""
        expects(self.out_adj is not None, "graph stored without out-adjacency")
        return self.out_adj

    def csc(self) -> CompressedAdj:
        """In-adjacency (major = dst)."""
        if self.in_adj is not None:
            return self.in_adj
        expects(
            self.is_symmetric and self.out_adj is not None,
            "graph stored without in-adjacency; rebuild with store='both'",
        )
        return self.out_adj

    # ---- degree / weight reductions --------------------------------------
    # ref: graph_view_t::compute_in_degrees/out_degrees/..., graph_view.hpp:671-686
    def out_degrees(self) -> jax.Array:
        return self.csr().degrees()

    def in_degrees(self) -> jax.Array:
        return self.csc().degrees()

    def out_weight_sums(self) -> jax.Array:
        adj = self.csr()
        if adj.weights is None:
            # unweighted: weight sum == degree, an O(V) offsets diff (the
            # O(E) XLA segment_sum costs ~370 ms at 33M edges on TPU)
            return adj.degrees().astype(NP_WEIGHT_DTYPE)
        return _segment_sum_by_major(adj)

    def in_weight_sums(self) -> jax.Array:
        adj = self.csc()
        if adj.weights is None:
            return adj.degrees().astype(NP_WEIGHT_DTYPE)
        return _segment_sum_by_major(adj)

    def has_self_loops(self) -> bool:
        adj = self.out_adj if self.out_adj is not None else self.in_adj
        loops = jnp.sum((adj.majors == adj.minors) & adj.valid())
        return bool(loops > 0)


def _segment_sum_by_major(adj: CompressedAdj) -> jax.Array:
    w = adj.edge_weights_or_ones()
    return jax.ops.segment_sum(
        w, adj.majors, num_segments=adj.num_majors + 1, indices_are_sorted=True
    )[: adj.num_majors]


def from_edgelist(
    src,
    dst,
    weight=None,
    *,
    num_vertices: Optional[int] = None,
    symmetrize: bool = False,
    store: str = "both",
    is_symmetric: Optional[bool] = None,
    multi: bool = False,
) -> Graph:
    """Build a Graph from a COO edgelist of already-contiguous int vertex ids.

    External/arbitrary vertex ids go through ``renumber.NumberMap`` first
    (analog of cugraph's auto-renumbering,
    ref: python/cugraph/cugraph/structure/number_map.py:500).

    symmetrize=True unions each edge with its reciprocal; multi=True skips
    the duplicate coalescing so parallel edges survive (the reference's
    symmetrize multi flag, symmetrize_edgelist_impl.cuh).
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    expects(src.shape == dst.shape, "src/dst length mismatch")
    if weight is not None:
        weight = np.asarray(weight, dtype=NP_WEIGHT_DTYPE)
        expects(weight.shape == src.shape, "weight length mismatch")
    if num_vertices is None:
        num_vertices = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    # O(E) validation behind the expensive-check flag (the reference's
    # do_expensive_check analog, utils/validation.py)
    from ..utils import validation

    validation.check_edgelist(src, dst, weight, num_vertices)
    if symmetrize:
        from .symmetrize import symmetrize_edgelist_np

        src, dst, weight = symmetrize_edgelist_np(src, dst, weight, multi=multi)
        sym = True
    else:
        sym = bool(is_symmetric) if is_symmetric is not None else False

    out_adj = in_adj = None
    if store in ("both", "out"):
        out_adj = _build_adj_np(src, dst, weight, num_vertices, num_vertices)
    if store in ("both", "in"):
        if sym and out_adj is not None:
            in_adj = out_adj
        else:
            in_adj = _build_adj_np(dst, src, weight, num_vertices, num_vertices)
    return Graph(
        out_adj=out_adj,
        in_adj=in_adj,
        num_vertices=int(num_vertices),
        num_edges=int(src.shape[0]),
        is_symmetric=sym,
    )
