"""Distributed (multi-chip) graph container + construction.

ref: cpp/src/structure/create_graph_from_edgelist_impl.cuh (edge shuffle by
2D block -> renumber -> per-block compression) and graph_mg.cpp.

TPU-native: construction is a host-side numpy shuffle (ingest ETL, exactly
once per graph), producing fixed-shape per-device block arrays that are
device_put with a NamedSharding over the ("row", "col") mesh. Every block
is padded to the global max block size so shard_map sees uniform shapes —
the price of XLA static shapes, bounded by the RMAT/power-law imbalance and
mitigated by the degree-scrambling renumber (hash-uniform dst ranges).

Edges in each block are sorted by local dst so per-block reductions are
sorted segment sums. Local src ids index the device's column span
(gathered over the "row" axis); local dst ids index the block's dst range
(vp wide); padding slots carry dst = vp (discard bucket).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.dtypes import LANE, NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE, round_up
from ..utils.error import expects
from .partition import Partition2D


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGGraph:
    """Sharded 2D-partitioned graph.

    Global array shapes (R, C, C, b_pad), sharded so device (i, j) holds
    its [i, j] slice: C edge blocks of b_pad edge slots each.
    """

    srcs: jax.Array  # local src in [0, R*vp) — column-span index
    dsts: jax.Array  # local dst in [0, vp); padding = vp
    weights: Optional[jax.Array]
    block_counts: jax.Array  # (R, C, C) int32 valid edges per block
    # src-side CSR over this device's edges (sampling / push-by-row):
    # offsets over the column span, dst ids GLOBAL (they cross blocks)
    src_csr_offsets: Optional[jax.Array]  # (R, C, R*vp + 1) int32
    src_csr_dsts: Optional[jax.Array]  # (R, C, d_pad) int32 global dst
    src_csr_weights: Optional[jax.Array]  # (R, C, d_pad) f32 | None
    rows: int = dataclasses.field(metadata=dict(static=True))
    cols: int = dataclasses.field(metadata=dict(static=True))
    vp: int = dataclasses.field(metadata=dict(static=True))
    num_vertices: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    is_symmetric: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def partition(self) -> Partition2D:
        return Partition2D(
            rows=self.rows,
            cols=self.cols,
            num_vertices=self.num_vertices,
            vp=self.vp,
        )

    @property
    def b_pad(self) -> int:
        return int(self.srcs.shape[-1])

    @property
    def weighted(self) -> bool:
        return self.weights is not None


def distribute_edgelist(
    mesh: Mesh,
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray] = None,
    *,
    num_vertices: Optional[int] = None,
    symmetrize: bool = False,
    is_symmetric: bool = False,
) -> MGGraph:
    """Host-side 2D shuffle + per-block compression + device_put.

    The edge-to-(device, block) routing implements the reference's
    shuffle_edgelist_by_gpu_id + groupby_and_count_edgelist_by_local_
    partition_id (detail/shuffle_wrappers.hpp:42,:126) as one vectorized
    numpy pass.
    """
    expects(
        tuple(mesh.axis_names) == ("row", "col"),
        "mesh must have axes ('row', 'col')",
    )
    r, c = mesh.devices.shape
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if symmetrize:
        from ..core.symmetrize import symmetrize_edgelist_np

        src, dst, weight = symmetrize_edgelist_np(
            src.astype(NP_VERTEX_DTYPE), dst.astype(NP_VERTEX_DTYPE), weight
        )
        src = src.astype(np.int64)
        dst = dst.astype(np.int64)
        is_symmetric = True
    if weight is not None:
        weight = np.asarray(weight, dtype=NP_WEIGHT_DTYPE)
    if num_vertices is None:
        num_vertices = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    part = Partition2D.create(r, c, num_vertices)
    vp = part.vp

    i_arr, j_arr, b_arr = part.edge_block(src, dst)
    flat = ((i_arr * c + j_arr) * c + b_arr).astype(np.int64)
    # group edges by (device, block), then by local dst within the block
    local_dst = (dst % vp).astype(NP_VERTEX_DTYPE)
    local_src = (src - j_arr * r * vp).astype(NP_VERTEX_DTYPE)
    order = np.lexsort((local_src, local_dst, flat))
    flat, local_src, local_dst = flat[order], local_src[order], local_dst[order]
    if weight is not None:
        weight = weight[order]

    n_blocks = r * c * c
    counts = np.bincount(flat, minlength=n_blocks)
    b_pad = round_up(max(int(counts.max(initial=0)), 1), LANE)
    srcs_np = np.zeros((n_blocks, b_pad), dtype=NP_VERTEX_DTYPE)
    dsts_np = np.full((n_blocks, b_pad), vp, dtype=NP_VERTEX_DTYPE)
    w_np = (
        np.zeros((n_blocks, b_pad), dtype=NP_WEIGHT_DTYPE)
        if weight is not None
        else None
    )
    starts = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    for blk in range(n_blocks):
        lo, hi = starts[blk], starts[blk + 1]
        n = hi - lo
        if n:
            srcs_np[blk, :n] = local_src[lo:hi]
            dsts_np[blk, :n] = local_dst[lo:hi]
            if w_np is not None:
                w_np[blk, :n] = weight[lo:hi]

    # --- src-side CSR per device (for sampling / push-by-row prims) -------
    dev = (i_arr * c + j_arr).astype(np.int64)  # device of each edge (orig order)
    span = r * vp
    order2 = np.lexsort((dst, src, dev))
    dev2, src2, dst2 = dev[order2], src[order2], dst[order2]
    w2 = weight[order2] if weight is not None else None
    dev_counts = np.bincount(dev2, minlength=r * c)
    d_pad = round_up(max(int(dev_counts.max(initial=0)), 1), LANE)
    so_np = np.zeros((r * c, span + 1), dtype=NP_VERTEX_DTYPE)
    sd_np = np.full((r * c, d_pad), -1, dtype=NP_VERTEX_DTYPE)
    sw_np = (
        np.zeros((r * c, d_pad), dtype=NP_WEIGHT_DTYPE)
        if weight is not None
        else None
    )
    dstarts = np.zeros(r * c + 1, dtype=np.int64)
    np.cumsum(dev_counts, out=dstarts[1:])
    for d_id in range(r * c):
        lo, hi = dstarts[d_id], dstarts[d_id + 1]
        n = hi - lo
        j_of = d_id % c
        if n:
            local_s = (src2[lo:hi] - j_of * span).astype(np.int64)
            np.cumsum(
                np.bincount(local_s, minlength=span), out=so_np[d_id, 1:]
            )
            sd_np[d_id, :n] = dst2[lo:hi]
            if sw_np is not None:
                sw_np[d_id, :n] = w2[lo:hi]

    shard = NamedSharding(mesh, P("row", "col"))
    srcs = jax.device_put(srcs_np.reshape(r, c, c, b_pad), shard)
    dsts = jax.device_put(dsts_np.reshape(r, c, c, b_pad), shard)
    w = (
        jax.device_put(w_np.reshape(r, c, c, b_pad), shard)
        if w_np is not None
        else None
    )
    bc = jax.device_put(
        counts.reshape(r, c, c).astype(np.int32), shard
    )
    return MGGraph(
        srcs=srcs,
        dsts=dsts,
        weights=w,
        block_counts=bc,
        src_csr_offsets=jax.device_put(so_np.reshape(r, c, span + 1), shard),
        src_csr_dsts=jax.device_put(sd_np.reshape(r, c, d_pad), shard),
        src_csr_weights=(
            jax.device_put(sw_np.reshape(r, c, d_pad), shard)
            if sw_np is not None
            else None
        ),
        rows=r,
        cols=c,
        vp=vp,
        num_vertices=int(num_vertices),
        num_edges=int(len(src)),
        is_symmetric=bool(is_symmetric),
    )


def distribute_graph(mesh: Mesh, g) -> MGGraph:
    """Shard an existing single-device Graph (the reference's graph_bcast /
    serializer analog for tests: SG graph -> MG graph, SURVEY.md §5)."""
    from ..core.convert import decompress_to_edgelist

    src, dst, w = decompress_to_edgelist(g)
    return distribute_edgelist(
        mesh,
        src,
        dst,
        w,
        num_vertices=g.num_vertices,
        is_symmetric=g.is_symmetric,
    )


def shard_vertex_values(mesh: Mesh, mgg: MGGraph, values: np.ndarray) -> jax.Array:
    """Shard a global (V,) vertex array to (R, C, vp) locals: device (i, j)
    gets range q = j*R + i (column-major, matching Partition2D)."""
    part = mgg.partition
    v_pad = part.v_padded
    padded = np.zeros((v_pad,) + values.shape[1:], dtype=values.dtype)
    padded[: len(values)] = np.asarray(values)
    # range q = j*R + i  ->  arr[i, j] = padded[q]
    chunks = padded.reshape(part.cols, part.rows, part.vp, *values.shape[1:])
    arr = np.swapaxes(chunks, 0, 1)  # (R, C, vp, ...)
    return jax.device_put(
        arr, NamedSharding(mesh, P("row", "col"))
    )


def unshard_vertex_values(mgg: MGGraph, arr) -> np.ndarray:
    """Inverse of shard_vertex_values: (R, C, vp, ...) -> global (V, ...)."""
    a = np.asarray(arr)
    chunks = np.swapaxes(a, 0, 1)  # (C, R, vp, ...)
    flat = chunks.reshape(-1, *a.shape[3:])
    return flat[: mgg.num_vertices]
