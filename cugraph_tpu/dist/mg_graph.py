"""Distributed (multi-chip) graph container + scalable construction.

ref: cpp/src/structure/create_graph_from_edgelist_impl.cuh (edge shuffle by
2D block -> renumber -> per-block compression), renumber_edgelist_impl.cuh:96
(degree-ordered distributed renumber map) and graph_view.hpp:588-594 (DCSR
hypersparse storage).

TPU-native: construction is a host-side CHUNKED two-pass streaming shuffle
(ingest ETL, exactly once per graph) — the analog of the reference's
mem-frugal count-then-exchange (shuffle_comm.cuh:367). Pass 1 streams edge
chunks and counts per (device, block, src-row) group; pass 2 streams again
and scatters each chunk directly into the final padded group slots with one
vectorized fancy-index per chunk (no per-block Python loops, and the full
COO is never materialized twice — peak host memory = final padded arrays +
one chunk). A per-device slab sort then orders each group by local dst.

Edge layout: device (i, j) holds (C blocks) x (R src-row groups) x g_pad
slots. Group k of a block holds the edges whose src is owned by mesh row k
(src in [k*vp, (k+1)*vp) of the column span) — the unit of the ppermute
ring in mg_prims (bounded-memory gather: the reference's stream-pool
edge-partition loop, per_v_transform_reduce_incoming_outgoing_e.cuh:578-625).
Within a group, edges are sorted by local dst so per-(block, group)
reductions are sorted segment sums. Padding slots carry dst = vp (discard).

The src-side adjacency is stored HYPERSPARSE (DCSR): only sources with at
least one local edge appear (src_nzd + offsets over them), so per-device
index memory scales with local edges, not with the R*vp column span —
the reference's use_dcs() path (graph_view.hpp:588, dcs_nzd_vertices in
edge_partition_device_view.cuh:44-79).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Sequence, Tuple, Union

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

    Edge arrays have global shape (R, C, C, R, g_pad), sharded so device
    (i, j) holds its [i, j] slice: C blocks x R src-row groups x g_pad
    edge slots.
    """

    srcs: jax.Array  # local src in [0, R*vp) — column-span index
    dsts: jax.Array  # local dst in [0, vp); padding = vp
    weights: Optional[jax.Array]
    block_counts: jax.Array  # (R, C, C) int32 valid edges per block
    # DCSR src-side adjacency (sampling / similarity / push-by-row):
    # only non-zero-local-degree sources stored; dst ids GLOBAL
    src_nzd: Optional[jax.Array]  # (R, C, nz_pad) int32 sorted colspan-local
    #   src ids with >=1 local edge; padding = R*vp (span)
    src_nzd_offsets: Optional[jax.Array]  # (R, C, nz_pad + 1) int32
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
    def g_pad(self) -> int:
        return int(self.srcs.shape[-1])

    @property
    def b_pad(self) -> int:
        """Edge slots per block (= R groups x g_pad)."""
        return int(self.srcs.shape[-2] * self.srcs.shape[-1])

    @property
    def weighted(self) -> bool:
        return self.weights is not None


ChunkSource = Union[
    Sequence[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]],
    Callable[[], Iterable[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]],
]


def _chunk_iter(chunks: ChunkSource):
    if callable(chunks):
        return chunks()
    return iter(chunks)


def mg_renumber_map(chunks: ChunkSource, num_vertices: int) -> np.ndarray:
    """Degree-descending renumber map from streamed edge chunks.

    The chunked analog of the reference's distributed compute_renumber_map
    (renumber_edgelist_impl.cuh:96): one streaming pass accumulates total
    degrees; ids are then ordered degree-descending (stable). Returns
    new_to_old; peak memory = O(V) regardless of E."""
    degrees = np.zeros(num_vertices, dtype=np.int64)
    for chunk in _chunk_iter(chunks):
        src, dst = chunk[0], chunk[1]
        degrees += np.bincount(src, minlength=num_vertices)
        degrees += np.bincount(dst, minlength=num_vertices)
    return np.argsort(-degrees, kind="stable").astype(NP_VERTEX_DTYPE)


def distribute_edgelist_chunks(
    mesh: Mesh,
    chunks: ChunkSource,
    *,
    num_vertices: int,
    symmetrize: bool = False,
    is_symmetric: bool = False,
    renumber: bool = False,
    build_src_csr: bool = True,
) -> Union[MGGraph, Tuple[MGGraph, np.ndarray]]:
    """Chunked two-pass 2D shuffle: the scalable MG ingest path.

    chunks: a sequence (re-iterable) or zero-arg callable returning an
    iterator of (src, dst, weight|None) numpy chunks with int ids in
    [0, num_vertices). The full COO is never materialized: pass 1 counts
    per (device, block, src-row) group, pass 2 scatters each chunk into
    its final padded slots. symmetrize=True emits both directions per
    chunk (no cross-chunk coalescing — parallel edges are kept, as in the
    reference's multigraph ingest).

    renumber=True prepends a degree-counting pass (mg_renumber_map) and
    returns (graph, new_to_old).

    ref: create_graph_from_edgelist_impl.cuh; the count-then-exchange
    structure is shuffle_comm.cuh:367 (mem_frugal_partition).
    """
    expects(
        tuple(mesh.axis_names) == ("row", "col"),
        "mesh must have axes ('row', 'col')",
    )
    r, c = mesh.devices.shape
    part = Partition2D.create(r, c, num_vertices)
    vp = part.vp
    span = r * vp

    old_to_new = None
    if renumber:
        new_to_old = mg_renumber_map(chunks, num_vertices)
        old_to_new = np.empty_like(new_to_old)
        old_to_new[new_to_old] = np.arange(len(new_to_old), dtype=NP_VERTEX_DTYPE)

    def prep(chunk):
        src = np.asarray(chunk[0])
        dst = np.asarray(chunk[1])
        w = chunk[2] if len(chunk) > 2 else None
        if old_to_new is not None:
            src = old_to_new[src]
            dst = old_to_new[dst]
        if symmetrize:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            if w is not None:
                w = np.concatenate([w, w])
        if w is not None:
            w = np.asarray(w, dtype=NP_WEIGHT_DTYPE)
        return src, dst, w

    def group_ids(src, dst):
        # device (i, j), block b, src-row group k; see partition.py
        q_d = dst // vp
        i = q_d % r
        b = q_d // r
        q_s = src // vp
        j = q_s // r
        k = q_s % r
        return (((i * c + j) * c + b) * r + k).astype(np.int64)

    # Per-process construction: this host only ever MATERIALIZES the slabs
    # of its OWN addressable devices (peak host RAM ∝ E / num_hosts + one
    # chunk), then assembles the global sharded arrays from the
    # single-device blocks — the reference's rank-local shuffle+build
    # (create_graph_from_edgelist_impl.cuh, shuffle_wrappers.hpp:42,126).
    # Multi-host contract: every process streams the SAME chunk source
    # (same files / same deterministic generator, e.g. rmat_edgelist with a
    # fixed seed) and keeps only its devices' edges — counts and slot
    # cursors then agree across hosts without any exchange. Memory scales
    # with E / num_hosts; the stream is re-read per host.
    proc = jax.process_index()
    dev_of = {}  # (i, j) -> jax device, addressable only
    for i in range(r):
        for j in range(c):
            d = mesh.devices[i, j]
            if d.process_index == proc:
                dev_of[(i, j)] = d

    # ---- pass 1: group counts (global; O(n_groups) memory) --------------
    n_groups = r * c * c * r
    gpd = c * r  # groups per device (C blocks x R src-row groups)
    counts = np.zeros(n_groups, dtype=np.int64)
    weighted = False
    num_edges = 0
    for chunk in _chunk_iter(chunks):
        src, dst, w = prep(chunk)
        weighted = weighted or (w is not None)
        num_edges += len(src)
        counts += np.bincount(group_ids(src, dst), minlength=n_groups)

    g_pad = round_up(max(int(counts.max(initial=0)), 1), LANE)
    # local slabs only: (i, j) -> flat (gpd * g_pad) arrays
    srcs_loc = {
        ij: np.zeros(gpd * g_pad, dtype=NP_VERTEX_DTYPE) for ij in dev_of
    }
    dsts_loc = {
        ij: np.full(gpd * g_pad, vp, dtype=NP_VERTEX_DTYPE) for ij in dev_of
    }
    w_loc = (
        {ij: np.zeros(gpd * g_pad, dtype=NP_WEIGHT_DTYPE) for ij in dev_of}
        if weighted
        else None
    )

    # ---- pass 2: vectorized scatter into final local slots --------------
    cursors = np.zeros(n_groups, dtype=np.int64)
    for chunk in _chunk_iter(chunks):
        src, dst, w = prep(chunk)
        gid = group_ids(src, dst)
        order = np.argsort(gid, kind="stable")
        gs = gid[order]
        n = len(gs)
        new_counts = np.bincount(gid, minlength=n_groups)
        if not n:
            continue
        first = np.ones(n, dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        ar = np.arange(n, dtype=np.int64)
        start_at = np.maximum.accumulate(np.where(first, ar, 0))
        rank = ar - start_at
        slots = (gs % gpd) * g_pad + cursors[gs] + rank
        src_o = src[order]
        dst_o = dst[order]
        w_o = None
        if w_loc is not None:
            w_o = (
                np.ones(n, dtype=NP_WEIGHT_DTYPE) if w is None else w[order]
            )
        dev_id = gs // gpd
        j_of = (src_o // span).astype(np.int64)
        src_l = (src_o - j_of * span).astype(NP_VERTEX_DTYPE)
        dst_l = (dst_o % vp).astype(NP_VERTEX_DTYPE)
        for ij in dev_of:
            did = ij[0] * c + ij[1]
            m = dev_id == did
            if not m.any():
                continue
            srcs_loc[ij][slots[m]] = src_l[m]
            dsts_loc[ij][slots[m]] = dst_l[m]
            if w_loc is not None:
                w_loc[ij][slots[m]] = w_o[m]
        cursors += new_counts

    block_counts = counts.reshape(r, c, c, r).sum(axis=-1).astype(np.int32)

    # ---- per-device slab sort + DCSR, then device_put and free ----------
    group_of = np.repeat(np.arange(c * r, dtype=np.int64), g_pad)
    shard = NamedSharding(mesh, P("row", "col"))
    blk_shape = (c, r, g_pad)
    src_shards, dst_shards, w_shards = [], [], []
    dcsr_loc = {}  # (i, j) -> (nzd, off, dsts, w) unpadded
    for ij, dev in dev_of.items():
        i, j = ij
        key = group_of * (vp + 2) + dsts_loc[ij]
        order = np.argsort(key, kind="stable")
        ls = srcs_loc[ij] = srcs_loc[ij][order]
        ld = dsts_loc[ij] = dsts_loc[ij][order]
        if w_loc is not None:
            w_loc[ij] = w_loc[ij][order]
        if build_src_csr:
            valid = ld < vp
            b_of = np.repeat(np.arange(c, dtype=np.int64), r * g_pad)
            gdst = ld.astype(np.int64) + (b_of * r + i) * vp
            s_v = ls[valid].astype(np.int64)
            d_v = gdst[valid]
            w_v = w_loc[ij][valid] if w_loc is not None else None
            order2 = np.lexsort((d_v, s_v))
            s_v, d_v = s_v[order2], d_v[order2]
            if w_v is not None:
                w_v = w_v[order2]
            nzd, cnt = np.unique(s_v, return_counts=True)
            off = np.zeros(len(nzd) + 1, dtype=np.int64)
            np.cumsum(cnt, out=off[1:])
            dcsr_loc[ij] = (nzd, off, d_v, w_v)
        src_shards.append(
            jax.device_put(ls.reshape((1, 1) + blk_shape), dev)
        )
        dst_shards.append(
            jax.device_put(ld.reshape((1, 1) + blk_shape), dev)
        )
        srcs_loc[ij] = dsts_loc[ij] = None  # free host copies as we go
        if w_loc is not None:
            w_shards.append(
                jax.device_put(w_loc[ij].reshape((1, 1) + blk_shape), dev)
            )
            w_loc[ij] = None

    def _global_max(x: int) -> int:
        if jax.process_count() == 1:
            return x
        from jax.experimental import multihost_utils

        return int(
            np.max(multihost_utils.process_allgather(jnp.asarray(x)))
        )

    def assemble(shards, tail_shape):
        return jax.make_array_from_single_device_arrays(
            (r, c) + tail_shape, shard, shards
        )

    srcs = assemble(src_shards, blk_shape)
    dsts = assemble(dst_shards, blk_shape)
    wts = assemble(w_shards, blk_shape) if weighted else None
    bc = jax.device_put(block_counts, shard)

    src_nzd = src_off = src_dsts = src_w = None
    if build_src_csr:
        max_nz = _global_max(
            max((len(t[0]) for t in dcsr_loc.values()), default=1)
        )
        max_d = _global_max(
            max((len(t[2]) for t in dcsr_loc.values()), default=1)
        )
        nz_pad = round_up(max(max_nz, 1), LANE)
        d_pad = round_up(max(max_d, 1), LANE)
        nzd_shards, off_shards, sd_shards, sw_shards = [], [], [], []
        for ij, dev in dev_of.items():
            nzd, off, d_v, w_v = dcsr_loc[ij]
            nzd_np = np.full(nz_pad, span, dtype=NP_VERTEX_DTYPE)
            nzd_np[: len(nzd)] = nzd
            off_np = np.full(nz_pad + 1, off[-1], dtype=NP_VERTEX_DTYPE)
            off_np[: len(off)] = off
            sd_np = np.full(d_pad, -1, dtype=NP_VERTEX_DTYPE)
            sd_np[: len(d_v)] = d_v
            nzd_shards.append(jax.device_put(nzd_np.reshape(1, 1, -1), dev))
            off_shards.append(jax.device_put(off_np.reshape(1, 1, -1), dev))
            sd_shards.append(jax.device_put(sd_np.reshape(1, 1, -1), dev))
            if weighted:
                sw_np = np.zeros(d_pad, dtype=NP_WEIGHT_DTYPE)
                if w_v is not None:
                    sw_np[: len(d_v)] = w_v
                sw_shards.append(jax.device_put(sw_np.reshape(1, 1, -1), dev))
        src_nzd = assemble(nzd_shards, (nz_pad,))
        src_off = assemble(off_shards, (nz_pad + 1,))
        src_dsts = assemble(sd_shards, (d_pad,))
        src_w = assemble(sw_shards, (d_pad,)) if weighted else None

    mgg = MGGraph(
        srcs=srcs,
        dsts=dsts,
        weights=wts,
        block_counts=bc,
        src_nzd=src_nzd,
        src_nzd_offsets=src_off,
        src_csr_dsts=src_dsts,
        src_csr_weights=src_w,
        rows=r,
        cols=c,
        vp=vp,
        num_vertices=int(num_vertices),
        num_edges=int(num_edges),
        is_symmetric=bool(is_symmetric or symmetrize),
    )
    if renumber:
        return mgg, new_to_old
    return mgg


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
    """Single-shot ingest: one-chunk wrapper over the chunked builder.

    The edge-to-(device, block) routing implements the reference's
    shuffle_edgelist_by_gpu_id + groupby_and_count_edgelist_by_local_
    partition_id (detail/shuffle_wrappers.hpp:42,:126)."""
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
    return distribute_edgelist_chunks(
        mesh,
        [(src, dst, weight)],
        num_vertices=int(num_vertices),
        is_symmetric=is_symmetric,
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
    values = np.asarray(values)
    padded = np.zeros((v_pad,) + values.shape[1:], dtype=values.dtype)
    padded[: len(values)] = values
    # range q = j*R + i  ->  arr[i, j] = padded[q]
    chunks = padded.reshape(part.cols, part.rows, part.vp, *values.shape[1:])
    arr = np.swapaxes(chunks, 0, 1)  # (R, C, vp, ...)
    return jax.device_put(arr, NamedSharding(mesh, P("row", "col")))


def unshard_vertex_values(mgg: MGGraph, arr) -> np.ndarray:
    """Inverse of shard_vertex_values: (R, C, vp, ...) -> global (V, ...)."""
    a = np.asarray(arr)
    chunks = np.swapaxes(a, 0, 1)  # (C, R, vp, ...)
    flat = chunks.reshape(-1, *a.shape[3:])
    return flat[: mgg.num_vertices]
