"""Per-device sorted-pipeline layouts for MG pull-reduces.

The MG prims' per-block segment reduce rides XLA segment ops (~0.09
Gelem/s on TPU); this module builds one SortedLayout per device over its
local edge blocks — dst space C*vp (the device's C dst blocks stacked),
src space R*vp (the gathered column span; the multi-range machinery's
num_src split) — so each device's reduce runs the same multi-Gelem/s
Benes pipeline as the single-chip path. SPMD requires identical array
shapes on every device, so layouts are padded to common static shapes:

- slot padding: idx 0 / weight 0 slots expand to zeros and contribute
  the sum identity; all-zero Benes words are the identity permutation.
- part padding: "trash" mode-1 parts with an all-zero mask sum nothing;
  every device gets one dedicated trash OUT block (first_flag=1 zeroes
  it) so padded assembly steps and padded hub slots target memory that
  is always written and always zero.
- hub padding: extra hub_pos entries point into the trash block;
  y[0] += 0.

Role parity: the reference's per-GPU kernel dispatch inside each MG rank
(per_v_transform_reduce_incoming_outgoing_e.cuh update_major path).
Three reduce families are served: sum (pagerank/katz/eigenvector —
build_mg_sorted), min-plus (mg_bfs/mg_sssp/mg_wcc — the min variant
layouts, weights carrying the relax distances), and the push-transposed
out direction (mg_hits' hub update, per_v_outgoing_sorted). Sum and min
sibling layouts share one host pass (routing depends on edge positions
only); the transposed variant is its own pass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..prims.pallas.spmv2 import (
    SortedLayout,
    Spmv2Config,
    build_sorted_layout_auto,
    default_config_for,
)

_STATIC = (
    "cfg", "n_slabs", "n_parts", "n_bins", "n_steps", "x_rows",
    "num_vertices", "num_edges", "num_src", "n_out_blocks",
)
_ARRAYS = [
    f.name for f in dataclasses.fields(SortedLayout) if f.name not in _STATIC
]


@dataclasses.dataclass(frozen=True)
class StackedLayouts:
    """(R, C)-stacked, shape-padded per-device SortedLayouts."""

    arrays: dict  # field name -> (R, C, ...) jnp array
    statics: dict  # shared static fields (incl. cfg)

    def local(self, sliced: dict) -> SortedLayout:
        return SortedLayout(**sliced, **self.statics)


def _pad_to(a: np.ndarray, n: int, axis: int = 0, fill=0) -> np.ndarray:
    if a.shape[axis] == n:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n - a.shape[axis])
    return np.pad(a, pad, constant_values=fill)


def _local_shard_blocks(mgg, use_weights: bool):
    """Yield ((i, j), device, srcs, dsts, w) for every ADDRESSABLE shard —
    each host touches only its own devices' edge blocks (never
    np.asarray(mgg.srcs) of the whole mesh), so layout-build host memory
    scales with E / num_hosts. ref: rank-local graph compression,
    graph_impl.cuh."""
    w_shards = {}
    if mgg.weights is not None and use_weights:
        for sh in mgg.weights.addressable_shards:
            w_shards[(sh.index[0].start or 0, sh.index[1].start or 0)] = sh
    d_shards = {}
    for sh in mgg.dsts.addressable_shards:
        d_shards[(sh.index[0].start or 0, sh.index[1].start or 0)] = sh
    for sh in mgg.srcs.addressable_shards:
        ij = (sh.index[0].start or 0, sh.index[1].start or 0)
        s = np.asarray(sh.data)[0, 0]
        d = np.asarray(d_shards[ij].data)[0, 0]
        w = (
            np.asarray(w_shards[ij].data)[0, 0]
            if ij in w_shards
            else None
        )
        yield ij, sh.device, s, d, w


def _allgather_max(vals: np.ndarray) -> np.ndarray:
    """Element-wise max of a small int vector across processes (identity
    in single-process runs)."""
    import jax

    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils

    return np.max(
        np.asarray(multihost_utils.process_allgather(jnp.asarray(vals))),
        axis=0,
    )


def build_device_layouts(
    mesh,
    mgg,
    *,
    use_weights: bool = True,
    cfg: Optional[Spmv2Config] = None,
    variant: str = "sum",
    direction: str = "in",
    extra_variants: Optional[list] = None,
):
    """Host-side: one layout per ADDRESSABLE device over its local edge
    blocks, padded to (globally agreed) common shapes and assembled into
    (R, C, ...) sharded arrays.

    variant "sum" (pagerank/katz/eigenvector/GNN) or "min" (pad_weight
    +inf; the min-plus sweeps of mg_bfs/mg_sssp — unweighted min stores
    w=0 so the sweep returns min over in-neighbors of x[src]).
    direction "in" (pull: x = column span (R*vp), y = C dst blocks) or
    "out" (push-transpose for HITS: x = the C gathered dst ranges (C*vp),
    y = column-span (R*vp) partials merged with psum_scatter over "row";
    see mg_prims.per_v_outgoing_sorted).

    extra_variants: optional [(use_weights, variant), ...] — sibling
    StackedLayouts built from the SAME per-device host pass (the sorted
    layout's routing depends only on edge positions; siblings differ only
    in the w slot array). Returns [main, *siblings] when given."""
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    cfg = cfg or default_config_for(c * vp if direction == "in" else r * vp)

    def _wts_pad(uw, va, w_flat, n_e):
        ww = w_flat if uw else None
        pad = 0.0
        if va == "min":
            pad = float(np.inf)
            if ww is None:
                ww = np.zeros(n_e, np.float32)  # x + 0 under min
        return ww, pad

    n_sib = len(extra_variants or ())
    any_weights = use_weights or any(
        uw for uw, _ in (extra_variants or ())
    )

    def _build_one(item):
        ij, dev, s5, d5, w5 = item
        s = s5.reshape(c, -1)  # (C, R*g_pad)
        d = d5.reshape(c, -1)
        keep = d < vp
        blk = np.broadcast_to(np.arange(c)[:, None], d.shape)
        dst_flat = (blk * vp + d)[keep].astype(np.int64)
        src_flat = s[keep].astype(np.int64)
        w_flat = None if w5 is None else w5.reshape(c, -1)[keep]
        n_e = len(src_flat)
        ww, pad = _wts_pad(use_weights, variant, w_flat, n_e)
        wv = (
            [
                _wts_pad(uw, va, w_flat, n_e)
                for uw, va in extra_variants
            ]
            if extra_variants is not None
            else None
        )
        if direction == "out":
            # push-transpose: reduce BY SRC over the column span; the
            # "x table" side indexes the device's C dst ranges
            out = build_sorted_layout_auto(
                src_flat, dst_flat, ww, r * vp, cfg,
                pad_weight=pad, num_src_vertices=c * vp,
                weight_variants=wv, allow_geometry_fallback=False,
            )
        else:
            out = build_sorted_layout_auto(
                dst_flat, src_flat, ww, c * vp, cfg,
                pad_weight=pad, num_src_vertices=r * vp,
                weight_variants=wv, allow_geometry_fallback=False,
            )
        return (ij, dev), out

    # Per-device builds run on a thread pool: the build is numpy + the
    # C++ routing lib (GIL released in the hot parts), so wall time for a
    # whole variant SET scales with host cores instead of device count.
    # Pool kept small — ct_benes_route is internally multi-threaded too.
    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(4, os.cpu_count() or 1))
    results = []
    it = _local_shard_blocks(mgg, any_weights)
    if workers > 1:
        # chunked submission keeps at most `workers` devices' edge blocks
        # materialized at once (the per-process ingest memory bound)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            chunk = []
            for item in it:
                chunk.append(item)
                if len(chunk) == workers:
                    results.extend(pool.map(_build_one, chunk))
                    chunk = []
            if chunk:
                results.extend(pool.map(_build_one, chunk))
    else:
        results = [_build_one(item) for item in it]

    lays = []
    sib_w = [[] for _ in range(n_sib)]  # per extra variant, per device
    devs = []
    for dev_key, out in results:
        devs.append(dev_key)
        if extra_variants is not None:
            lays.append(out[0])
            for k in range(n_sib):
                sib_w[k].append(np.asarray(out[1 + k].w))
        else:
            lays.append(out)

    SR, PR, BR, CH = cfg.slab_rows, cfg.part_rows, cfg.bin_rows, cfg.chunk_rows
    n_bins = lays[0].n_bins
    # x_rows is device-invariant BY CONSTRUCTION: every layout above is
    # built with num_src_vertices = r * vp, and build_sorted_layout sets
    # x_rows = max(ceil(num_src_vertices / 128), 8) from that alone. Hub
    # ROW counts differ per device, but those rows are appended PAST
    # x_rows (table rows [x_rows, x_rows + n_hub)); padding hub_ids to
    # hub_max below makes the runtime table extent (trows in
    # _sorted_spmv_jit, computed from the PADDED hub_ids length) identical
    # on every device too. Exercised by
    # test_dist_extra.py::test_uneven_hub_rows_across_devices.
    assert all(l.x_rows == lays[0].x_rows for l in lays)
    # pad shapes must agree across ALL devices (SPMD): take process-local
    # maxima, then an all-process max for multi-host meshes
    gmax = _allgather_max(
        np.asarray(
            [
                -(-max(l.idx.shape[0] for l in lays) // SR) * SR,
                max(max(l.hub_ids.shape[0] for l in lays), 1),
                max(l.out_blocks for l in lays),
                -min(l.out_blocks for l in lays),
                max(l.n_parts for l in lays),
                max(l.n_steps for l in lays),
                max(l.route2_lo.shape[0] // PR for l in lays),
                max(l.route3_lo.shape[0] // PR for l in lays),
                max(l.hub_dsts.shape[0] for l in lays),
                max(l.num_edges for l in lays),
            ],
            dtype=np.int64,
        )
    )
    slot_max, hub_max = int(gmax[0]), int(gmax[1])
    # every device gets one dedicated trash out block (always written,
    # always zero) + enough trash parts to reach the common part count
    out_max = int(gmax[2]) + 1
    parts_max = int(gmax[4]) + (out_max - (-int(gmax[3])))
    steps_max = int(gmax[5])
    rblocks_max = int(gmax[6])
    rblocks3_max = int(gmax[7])
    hubslots_max = int(gmax[8])
    num_edges_max = int(gmax[9])

    padded = {name: [] for name in _ARRAYS}
    for lay in lays:
        f = {name: np.asarray(getattr(lay, name)) for name in _ARRAYS}
        n_slabs = slot_max // SR
        f["idx"] = _pad_to(f["idx"], slot_max)
        f["w"] = _pad_to(f["w"], slot_max)  # sum identity
        f["prow"] = _pad_to(f["prow"], slot_max // 8)
        f["route1_lo"] = _pad_to(f["route1_lo"], slot_max)
        f["route1_hi"] = _pad_to(f["route1_hi"], slot_max)
        f["hub_ids"] = _pad_to(f["hub_ids"], hub_max)
        f["route2_lo"] = _pad_to(f["route2_lo"], rblocks_max * PR)
        f["route2_hi"] = _pad_to(f["route2_hi"], rblocks_max * PR)
        f["route3_lo"] = _pad_to(f["route3_lo"], rblocks3_max * PR)
        f["route3_hi"] = _pad_to(f["route3_hi"], rblocks3_max * PR)
        # trash parts: the first claims this device's trash out block
        # (zeroing it); the rest revisit it consecutively
        n_extra = parts_max - lay.n_parts
        trash_block = lay.out_blocks  # one past this device's last block
        f["route_blk"] = _pad_to(f["route_blk"], parts_max)
        f["route3_blk"] = _pad_to(f["route3_blk"], parts_max)
        f["bin_of_part"] = np.concatenate(
            [f["bin_of_part"], np.full(n_extra, trash_block, np.int32)]
        )
        f["first_flag"] = np.concatenate(
            [f["first_flag"], np.zeros(n_extra, np.int32)]
        )
        if n_extra:
            f["first_flag"][lay.n_parts] = 1
        f["mode"] = np.concatenate([f["mode"], np.ones(n_extra, np.int32)])
        f["simple_pos"] = _pad_to(f["simple_pos"], parts_max)
        # padded out blocks beyond trash_block + 1 are never read; pad
        # bin_of_part targets stay at trash_block (consecutive revisits)
        # padded assembly steps copy slab chunk 0 into the first trash
        # part's block
        n_spad = steps_max - lay.n_steps
        if n_spad:
            tpid = lay.n_parts  # first trash part
            f["chunk_src"] = np.concatenate(
                [f["chunk_src"], np.zeros(n_spad, np.int32)]
            )
            f["chunk_dst"] = np.concatenate(
                [f["chunk_dst"], np.full(n_spad, tpid * (PR // CH), np.int32)]
            )
        # trash parts issue no DMAs: chunk_off stays at its final value
        f["chunk_off"] = np.concatenate(
            [
                f["chunk_off"],
                np.full(
                    parts_max - lay.n_parts, f["chunk_off"][-1], np.int32
                ),
            ]
        )
        # padded hub slots read the (zeroed) trash block
        n_hpad = hubslots_max - f["hub_dsts"].shape[0]
        if n_hpad:
            tpos = (trash_block - n_bins) * (BR * 128)
            tpos = max(tpos, 0)  # trash block is always >= n_bins here
            f["hub_dsts"] = np.concatenate(
                [f["hub_dsts"], np.zeros(n_hpad, np.int32)]
            )
            f["hub_pos"] = np.concatenate(
                [f["hub_pos"], np.full(n_hpad, tpos, np.int32)]
            )
        for name in _ARRAYS:
            padded[name].append(f[name])

    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("row", "col"))

    def _stack(vals):
        shards = [
            jax.device_put(v[None, None], dev)
            for v, (_ij, dev) in zip(vals, devs)
        ]
        return jax.make_array_from_single_device_arrays(
            (r, c) + vals[0].shape, shard, shards
        )

    arrays = {name: _stack(vals) for name, vals in padded.items()}
    statics = dict(
        cfg=cfg,
        n_slabs=slot_max // SR,
        n_parts=parts_max,
        n_bins=n_bins,
        n_steps=steps_max,
        x_rows=lays[0].x_rows,
        num_vertices=(c * vp) if direction == "in" else (r * vp),
        num_edges=num_edges_max,
        num_src=(r * vp) if direction == "in" else (c * vp),
        n_out_blocks=out_max,
    )
    main = StackedLayouts(arrays=arrays, statics=statics)
    if extra_variants is None:
        return main
    sibs = []
    for k in range(n_sib):
        # siblings share every routing array; only the w slot stream
        # differs (padding fill is never read by a real part — padded
        # slabs are unreferenced and trash parts mask to the identity)
        arr_k = dict(arrays)
        arr_k["w"] = _stack([_pad_to(wv, slot_max) for wv in sib_w[k]])
        sibs.append(StackedLayouts(arrays=arr_k, statics=statics))
    return [main] + sibs


def layout_args(stacked: StackedLayouts):
    """Deterministically-ordered array tuple for shard_map *args."""
    return tuple(stacked.arrays[name] for name in _ARRAYS)


def layout_specs(stacked: StackedLayouts):
    from jax.sharding import PartitionSpec as P

    return tuple(
        P("row", "col", *([None] * (stacked.arrays[name].ndim - 2)))
        for name in _ARRAYS
    )


def local_layout(stacked: StackedLayouts, sliced_args) -> SortedLayout:
    """Rebuild this device's SortedLayout inside shard_map from the (1, 1,
    ...) arg slices."""
    fields = {
        name: arr[0, 0] for name, arr in zip(_ARRAYS, sliced_args)
    }
    return stacked.local(fields)
