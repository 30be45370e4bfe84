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
Sum-reduce only (the pagerank/katz/eigenvector family); min/max MG paths
stay on the XLA reduce.
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


def build_device_layouts(
    mesh,
    mgg,
    *,
    use_weights: bool = True,
    cfg: Optional[Spmv2Config] = None,
) -> StackedLayouts:
    """Host-side: one sum-variant layout per device over its local edge
    blocks, padded to common shapes and stacked (R, C, ...)."""
    r, c, vp = mgg.rows, mgg.cols, mgg.vp
    cfg = cfg or default_config_for(c * vp)
    srcs_h = np.asarray(mgg.srcs)  # (R, C, C, R, g_pad)
    dsts_h = np.asarray(mgg.dsts)
    w_h = None if (mgg.weights is None or not use_weights) else np.asarray(mgg.weights)

    lays = []
    for i in range(r):
        for j in range(c):
            s = srcs_h[i, j].reshape(c, -1)  # (C, R*g_pad)
            d = dsts_h[i, j].reshape(c, -1)
            keep = d < vp
            blk = np.broadcast_to(np.arange(c)[:, None], d.shape)
            dst_flat = (blk * vp + d)[keep].astype(np.int64)
            src_flat = s[keep].astype(np.int64)
            ww = None if w_h is None else w_h[i, j].reshape(c, -1)[keep]
            lays.append(
                build_sorted_layout_auto(
                    dst_flat, src_flat, ww, c * vp, cfg,
                    num_src_vertices=r * vp,
                )
            )

    SR, PR, BR, CH = cfg.slab_rows, cfg.part_rows, cfg.bin_rows, cfg.chunk_rows
    n_bins = lays[0].n_bins
    slot_max = max(l.idx.shape[0] for l in lays)
    slot_max = -(-slot_max // SR) * SR
    # x_rows is device-invariant BY CONSTRUCTION: every layout above is
    # built with num_src_vertices = r * vp, and build_sorted_layout sets
    # x_rows = max(ceil(num_src_vertices / 128), 8) from that alone. Hub
    # ROW counts differ per device, but those rows are appended PAST
    # x_rows (table rows [x_rows, x_rows + n_hub)); padding hub_ids to
    # hub_max below makes the runtime table extent (trows in
    # _sorted_spmv_jit, computed from the PADDED hub_ids length) identical
    # on every device too. Exercised by
    # test_mg_sorted_extra.py::test_uneven_hub_rows_across_devices.
    assert all(l.x_rows == lays[0].x_rows for l in lays)
    hub_max = max(l.hub_ids.shape[0] for l in lays)
    hub_max = max(hub_max, 1)
    # every device gets one dedicated trash out block (always written,
    # always zero) + enough trash parts to reach the common part count
    out_max = max(l.out_blocks for l in lays) + 1
    parts_max = max(l.n_parts for l in lays) + (out_max - min(l.out_blocks for l in lays))
    steps_max = max(l.n_steps for l in lays)
    rblocks_max = max(l.route2_lo.shape[0] // PR for l in lays)
    hubslots_max = max(l.hub_dsts.shape[0] for l in lays)

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
        f["route3_lo"] = _pad_to(f["route3_lo"], rblocks_max * PR)
        f["route3_hi"] = _pad_to(f["route3_hi"], rblocks_max * PR)
        # trash parts: the first claims this device's trash out block
        # (zeroing it); the rest revisit it consecutively
        n_extra = parts_max - lay.n_parts
        trash_block = lay.out_blocks  # one past this device's last block
        f["route_blk"] = _pad_to(f["route_blk"], parts_max)
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

    arrays = {
        name: jnp.asarray(
            np.stack(vals).reshape((r, c) + vals[0].shape)
        )
        for name, vals in padded.items()
    }
    statics = dict(
        cfg=cfg,
        n_slabs=slot_max // SR,
        n_parts=parts_max,
        n_bins=n_bins,
        n_steps=steps_max,
        x_rows=lays[0].x_rows,
        num_vertices=c * vp,
        num_edges=max(l.num_edges for l in lays),
        num_src=r * vp,
        n_out_blocks=out_max,
    )
    return StackedLayouts(arrays=arrays, statics=statics)


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
