"""Keyed-row SpMV engine (v3): static routing + MXU one-hot reduce.

y[dst] (+)= w * x[src] as three static-routed kernels:

  K-A expand  (kernel shared with spmv2): paged 8-way selects read the
              VMEM-resident x table; slot (row, lane) holds w * x[src]
              (lane = src % 128, vreg = one x-table page).
  K-B slab    (kernel shared with spmv2): one full Benes per slab
              routes every element to its target CHUNK and exact
              within-chunk position.
  K-C keyed   (new): per part, chunks DMA-stream into VMEM (double
              buffered), a full part Benes places each element at its
              KEYED ROW (all real elements of a row share one output
              row of the (V/128, 128)-shaped result; an element's lane
              is its dst % 128), and the segment reduce is a one-hot
              matmul on the MXU: out[w, :] += sum_r [key(r) == w] *
              part[r, :]. f32 exactness via a hi/lo bf16 split (two
              MXU passes; the one-hot operand is exact in bf16).

Versus the v2 sorted pipeline (spmv2.py) this deletes the segmented
scan, the placement Benes / end-at-target modes, and with them the
whole packing-feasibility LADDER: a keyed row is feasible by
construction (rows are allocated per dst window at build time), so the
host build is single-pass and deterministic — the property the
scale-23/24 builds need (docs/PERFORMANCE.md round 4). Per-part VPU
work drops from ~59 roll/select stages to the one part Benes; the
reduce itself rides the MXU for ~free.

reduce="min" (min-plus sweeps for BFS/SSSP) replaces the matmul with a
segmented min scan over the key-sorted rows plus an exact
2*log2(PR)-1-stage ROW Benes that moves each group-end row to its
output row (a matmul mover would round f32 through bf16). More VPU
stages than the sum path, but ladder-free and with the same
single-pass host build — the property scale 24 needs (the v2 min
build OOMs its host pass there).

Degree tiers (the TPU answer to the reference's hypersparse/low/mid/
high kernel dispatch, per_v_transform_reduce_incoming_outgoing_e.cuh:
84-560):
  - hub SOURCES (out-degree >= hub_deg): broadcast rows appended to
    the x table (identical to v2);
  - heavy DESTINATIONS (in-degree >= heavy_dst): dedicated full input
    rows (any lanes) keyed to ONE appended output row each; the matmul
    sums lane collisions for free and a final lane reduce + tiny
    scatter folds them into y;
  - everything else: window rows. Window g = 128 consecutive dst ids;
    rows_g = max in-degree within the window. Degree-sorted
    renumbering keeps neighbor degrees near-equal, so mean/max fill
    stays high.

Keys/masks ride the SPARE BITS of the route2 hi words (bits 0..10 =
route stages 32.. — the part Benes needs <= 43 stages at part_rows
16384 — bit 12 = real element, bits 13..27 = the row's output row
within the part's output window, sentinel w_out = none), so the sum
reduce adds ZERO extra HBM streams. The min variant additionally
streams one (part_rows, 128) i32 `minw` block per part: bit 0 =
segment start, bit 1 = output row received a group end, bits 2..28 =
the row-Benes switch words (27 stages = 16384 rows).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .benes import route_benes, pack_bits, stage_distances
from .spmv2 import (
    LANES,
    _argsort_u64,
    _group_ranks,
    _group_max,
    _apply_benes_block,
    _dma_gather_chunks,
    _out_struct,
    _cache_dir,
)


@dataclasses.dataclass(frozen=True)
class Spmv3Config:
    # 8192 rows = 4 MB f32 blocks: the slab/part kernels hold 4 blocks
    # double-buffered PLUS the unrolled Benes stage temporaries; 16384
    # rows measured 127.68 MB scoped VMEM on v5e (limit 126) — OOM.
    slab_rows: int = 8192  # 2^20 elements per slab
    part_rows: int = 4096  # elements per part block / part_rows * 128
    # fine chunks cost nothing since DMAs are per-RUN descriptors; they
    # buy chunk-slot headroom (the packer's fill ceiling) and smaller
    # boundary dupes. 4x128 f32 = 2 KB minimum copy.
    chunk_rows: int = 4
    # output BLOCK rows (coarse: fewer part-at-boundary breaks) vs the
    # one-hot width a part serves (a part's key span; its (w_part, 128)
    # result writes at an 8-aligned row offset inside the block).
    # Decoupling these removed a 28.8%-of-slots boundary padding at
    # RMAT scale 21 while keeping the MXU cost prop. to w_part.
    w_out: int = 4096
    w_part: int = 1024
    heavy_dst: int = 512  # dst in-count threshold for dedicated rows
    hub_deg: int = 1024  # src out-count threshold for broadcast rows


TINY3 = Spmv3Config(
    slab_rows=64, part_rows=32, chunk_rows=2, w_out=16, w_part=8,
    heavy_dst=16, hub_deg=8,
)

LAST_STATS: dict = {}  # fill diagnostics of the most recent build


def default_config3_for(num_vertices: int, num_edges: int,
                        reduce: str = "sum") -> Spmv3Config:
    """Part size scales with E so per-part runs stay much longer than a
    chunk (the DMA-issue count is ~n_parts * n_slabs boundary chunks +
    E/chunk real chunks; both shrink with bigger parts)."""
    e = max(num_edges, 1)
    pr = 2048
    while pr < 8192 and e > pr * LANES * 120:
        pr *= 2
    if reduce == "min":
        # the min kernel unrolls ~75 roll/select stages (part Benes +
        # seg scan + row Benes) over FOUR (PR,128) block streams: PR
        # 8192 measured 206 MB of the 128 MB VMEM on v5e
        pr = min(pr, 4096)
    return Spmv3Config(part_rows=pr)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KeyedLayout:
    # K-A expand (identical contract to spmv2.SortedLayout)
    prow: jax.Array  # (n_vregs,) i32 x-table row of each slot vreg
    idx: jax.Array  # (slot_rows, 128) i32 sublane in page [0, 8)
    w: jax.Array  # (slot_rows, 128) f32 edge weight (pad_weight = pad)
    hub_ids: jax.Array  # (n_hub_rows,) i32 hub source vertex per row
    # K-B slab Benes to chunk-exact positions
    route1_lo: jax.Array  # (slot_rows, 128) i32 stages 0..31
    route1_hi: jax.Array  # (slot_rows, 128) i32 stages 32..
    # K-C chunk gather + keyed reduce. chunk_src entries are coalesced
    # run descriptors: src chunk (bits 0..27) | log2 chunk count
    # (28..30); the dst chunk slot is the running size cursor
    chunk_src: jax.Array  # (n_parts + 1, DMAX) i32 DMA descriptors
    chunk_off: jax.Array  # (n_parts + 1,) i32 descriptors per part
    route2_lo: jax.Array  # (n_parts*part_rows, 128) i32 stages 0..31
    route2_hi: jax.Array  # (n_parts*part_rows, 128) i32 + spare bits
    winof: jax.Array  # (n_parts,) i32 output window block per part
    partoff: jax.Array  # (n_parts,) i32 8-aligned write row in the block
    first_flag: jax.Array  # (n_parts,) i32 1 = window's first part
    heavy_dsts: jax.Array  # (n_heavy,) i32 dst ids of appended rows
    # min only: (n_parts*part_rows, 128) i32 — bit 0 segment start,
    # bit 1 valid output row, bits 2..28 row-Benes switch words.
    # (8, 128) dummy for sum layouts.
    minw: jax.Array
    cfg: Spmv3Config = dataclasses.field(metadata=dict(static=True))
    n_slabs: int = dataclasses.field(metadata=dict(static=True))
    n_parts: int = dataclasses.field(metadata=dict(static=True))
    n_steps: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    n_out_blocks: int = dataclasses.field(metadata=dict(static=True))
    num_vertices: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    num_src: int = dataclasses.field(default=0, metadata=dict(static=True))
    reduce: str = dataclasses.field(
        default="sum", metadata=dict(static=True)
    )

    @property
    def src_count(self) -> int:
        return self.num_src or self.num_vertices


def build_keyed_layout(
    dsts: np.ndarray,
    srcs: np.ndarray,
    weights: Optional[np.ndarray],
    num_vertices: int,
    cfg: Optional[Spmv3Config] = None,
    pad_weight: float = 0.0,
    num_src_vertices: Optional[int] = None,
    reduce: str = "sum",
    weight_variants: Optional[list] = None,
):
    """Single-pass host build (no retry ladder: keyed rows are feasible
    by construction). weight_variants: [(weights_or_None, pad_weight),
    ...] sibling w arrays from the same pass — returns (layout, [w_k])
    when given; siblings must share the reduce direction's bit packing
    (sum siblings of a sum layout, min of min)."""
    from concurrent.futures import ThreadPoolExecutor

    e = len(dsts)
    dsts = np.asarray(dsts, dtype=np.int64)
    srcs = np.asarray(srcs, dtype=np.int64)
    w = (
        np.ones(e, dtype=np.float32)
        if weights is None
        else np.asarray(weights, dtype=np.float32)
    )
    v = int(num_vertices)
    vs = int(num_src_vertices) if num_src_vertices is not None else v
    if cfg is None:
        cfg = default_config3_for(v, e, reduce)
    SR, PR, CH, WO = cfg.slab_rows, cfg.part_rows, cfg.chunk_rows, cfg.w_out
    WP = cfg.w_part
    assert PR % CH == 0 and PR % 8 == 0 and WO % 8 == 0
    assert WP % 8 == 0 and WP <= WO and WP <= PR
    assert PR <= 16384, "row-Benes bits cap part_rows at 16384"
    slab_e, part_e, chunk_e = SR * LANES, PR * LANES, CH * LANES
    x_rows = max(-(-vs // LANES), 8)

    # ---- K-A slot assignment (as spmv2 stages 0-2) ----------------------
    out_cnt = np.bincount(srcs, minlength=vs)
    hub_mask_v = out_cnt >= cfg.hub_deg
    hub_ids = np.nonzero(hub_mask_v)[0].astype(np.int64)
    n_hub_rows = len(hub_ids)
    is_hub_e = hub_mask_v[srcs]

    order_nh = np.nonzero(~is_hub_e)[0]
    q_nh = srcs[order_nh] // (8 * LANES)
    lane_nh = srcs[order_nh] % LANES
    o2 = _argsort_u64(q_nh * LANES + lane_nh)
    order_nh = order_nh[o2]
    q_nh, lane_nh = q_nh[o2], lane_nh[o2]
    key = q_nh * LANES + lane_nh
    pos_in = _group_ranks(key)
    if len(key):
        page_ids = np.unique(q_nh)
        heights = np.zeros(len(page_ids), dtype=np.int64)
        grp_max = _group_max(key, pos_in + 1)
        lane_first = np.ones(len(key), dtype=bool)
        lane_first[1:] = key[1:] != key[:-1]
        pg_of_grp = q_nh[lane_first]
        np.maximum.at(
            heights,
            np.searchsorted(page_ids, pg_of_grp),
            grp_max[lane_first],
        )
        page_rows = -(-heights // 8) * 8
    else:
        page_ids = np.zeros(0, np.int64)
        page_rows = np.zeros(0, np.int64)
    page_row0 = np.zeros(len(page_ids) + 1, dtype=np.int64)
    np.cumsum(page_rows, out=page_row0[1:])
    nh_total_rows = int(page_row0[-1])

    order_h = np.nonzero(is_hub_e)[0]
    hs = srcs[order_h]
    o3 = _argsort_u64(hs)
    order_h = order_h[o3]
    hs = hs[o3]
    h_rank = _group_ranks(hs)
    hub_counts = out_cnt[hub_ids]
    hub_rows_each = -(-hub_counts // LANES)
    page_of_hub = (x_rows + np.arange(max(n_hub_rows, 1))) // 8
    hub_row0 = np.zeros(n_hub_rows + 1, dtype=np.int64)
    cur = 0
    for i in range(n_hub_rows):
        if i > 0 and page_of_hub[i] != page_of_hub[i - 1]:
            cur = -(-cur // 8) * 8
        hub_row0[i] = cur
        cur += int(hub_rows_each[i])
    hub_row0[n_hub_rows] = -(-cur // 8) * 8
    h_total_rows = int(hub_row0[-1])

    slot_rows_raw = nh_total_rows + h_total_rows
    dense_rows = max(-(-slot_rows_raw // 8) * 8, 8)
    dense_vregs = dense_rows // 8
    row_of_edge = np.zeros(e, dtype=np.int64)
    lane_of_edge = np.zeros(e, dtype=np.int64)
    idx_of_edge = np.zeros(e, dtype=np.int32)
    dense_prow = np.zeros(dense_vregs, dtype=np.int32)
    if len(order_nh):
        base = page_row0[np.searchsorted(page_ids, q_nh)]
        row = base + pos_in
        row_of_edge[order_nh] = row
        lane_of_edge[order_nh] = lane_nh
        idx_of_edge[order_nh] = (
            (srcs[order_nh] // LANES) % 8
        ).astype(np.int32)
        dense_prow[row // 8] = (q_nh * 8).astype(np.int32)
    if len(order_h):
        hub_idx_of = np.searchsorted(hub_ids, hs)
        row = nh_total_rows + hub_row0[hub_idx_of] + h_rank // LANES
        row_of_edge[order_h] = row
        lane_of_edge[order_h] = h_rank % LANES
        idx_of_edge[order_h] = ((x_rows + hub_idx_of) % 8).astype(np.int32)
        dense_prow[row // 8] = (
            (x_rows + hub_idx_of) // 8 * 8
        ).astype(np.int32)

    pad_vregs = min(8, max(SR // 64, 1))
    k_real = SR // 8 - pad_vregs
    vr_idx = np.arange(dense_vregs, dtype=np.int64)
    new_vreg = vr_idx + (vr_idx // k_real) * pad_vregs
    n_slabs = (
        max(int(new_vreg[-1]) // (SR // 8) + 1, 1) if dense_vregs else 1
    )
    slot_rows = n_slabs * SR
    n_vregs = slot_rows // 8
    idx_np = np.zeros((slot_rows, LANES), dtype=np.int32)
    w_np = np.full((slot_rows, LANES), pad_weight, dtype=np.float32)
    prow_np = np.zeros(n_vregs, dtype=np.int32)
    prow_np[new_vreg] = dense_prow
    final_row = new_vreg[row_of_edge // 8] * 8 + (row_of_edge % 8)
    slot_of_edge = final_row * LANES + lane_of_edge
    idx_np[final_row, lane_of_edge] = idx_of_edge
    w_np[final_row, lane_of_edge] = w
    w_sibs = []
    for wts_k, pad_k in weight_variants or ():
        wk = (
            np.ones(e, dtype=np.float32)
            if wts_k is None
            else np.asarray(wts_k, dtype=np.float32)
        )
        a = np.full((slot_rows, LANES), pad_k, dtype=np.float32)
        a[final_row, lane_of_edge] = wk
        w_sibs.append(a)
    slab_of_edge = slot_of_edge // slab_e

    # ---- dst side: keyed target rows ------------------------------------
    in_cnt = np.bincount(dsts, minlength=v)
    heavy_v = in_cnt >= cfg.heavy_dst
    heavy_ids = np.nonzero(heavy_v)[0].astype(np.int64)
    n_heavy = len(heavy_ids)
    v2_rows = max(-(-v // LANES), 1)
    cpad = np.zeros(v2_rows * LANES, dtype=np.int64)
    cpad[:v] = np.where(heavy_v, 0, in_cnt)
    r_g = cpad.reshape(v2_rows, LANES).max(axis=1)
    heavy_rows_each = -(-in_cnt[heavy_ids] // LANES)
    win_base = np.zeros(v2_rows + 1, dtype=np.int64)
    np.cumsum(r_g, out=win_base[1:])
    heavy_base = np.zeros(n_heavy + 1, dtype=np.int64)
    np.cumsum(heavy_rows_each, out=heavy_base[1:])
    n_win_rows = int(win_base[-1])
    total_rows = int(n_win_rows + heavy_base[-1])
    out_rows = v2_rows + n_heavy
    n_out_blocks = max(-(-out_rows // WO), 1)

    is_heavy_e = heavy_v[dsts]
    grow = np.zeros(e, dtype=np.int64)
    glane = np.zeros(e, dtype=np.int64)
    nh = np.nonzero(~is_heavy_e)[0]
    if len(nh):
        od = _argsort_u64(dsts[nh])
        nh = nh[od]
        rank = _group_ranks(dsts[nh])
        grow[nh] = win_base[dsts[nh] // LANES] + rank
        glane[nh] = dsts[nh] % LANES
    hv = np.nonzero(is_heavy_e)[0]
    if len(hv):
        od = _argsort_u64(dsts[hv])
        hv = hv[od]
        rank = _group_ranks(dsts[hv])
        hidx = np.searchsorted(heavy_ids, dsts[hv])
        grow[hv] = n_win_rows + heavy_base[hidx] + rank // LANES
        glane[hv] = rank % LANES
    row_key = (
        np.concatenate(
            [
                np.repeat(np.arange(v2_rows, dtype=np.int64), r_g),
                np.repeat(
                    v2_rows + np.arange(n_heavy, dtype=np.int64),
                    heavy_rows_each,
                ),
            ]
        )
        if total_rows
        else np.zeros(0, np.int64)
    )

    # ---- part packing ----------------------------------------------------
    # constraints per part: keyed rows <= PR, chunk windows (conservative
    # bound: ceil(sz_s/chunk) + 1 per touched slab) <= PR // CH, and no
    # output-window-block crossing. Greedy with multiplicative back-off.
    edge_by_row = (
        _argsort_u64(
            ((grow * LANES + glane)).astype(np.uint64)
        )
        if e
        else np.zeros(0, np.int64)
    )
    row_cnt = np.bincount(grow, minlength=max(total_rows, 1)) if e else (
        np.zeros(max(total_rows, 1), np.int64)
    )
    row_cum = np.zeros(max(total_rows, 1) + 1, dtype=np.int64)
    np.cumsum(row_cnt, out=row_cum[1:])
    block_of_key = (
        row_key // WO if total_rows else np.zeros(0, np.int64)
    )
    parts = []  # (row0, row1, out_block, key_offset_in_block)
    r0 = 0
    max_chunks = PR // CH
    while r0 < total_rows:
        b = int(block_of_key[r0])
        # part write offset: first key rounded down to 8 rows, clamped
        # so the (w_part, 128) slice stays inside the (w_out, 128) block
        off = min(int(row_key[r0] - b * WO) & ~7, WO - WP)
        r_blk = int(
            np.searchsorted(block_of_key, b, side="right")
        )
        # key-span cap: keys served by this part live in
        # [b*WO + off, b*WO + off + WP)
        r_span = int(np.searchsorted(row_key, b * WO + off + WP))
        r1 = min(r0 + PR, r_blk, r_span)
        while True:
            sl = slab_of_edge[edge_by_row[row_cum[r0] : row_cum[r1]]]
            sz = np.bincount(sl, minlength=n_slabs)
            nz = sz[sz > 0]
            chunks_bound = int(np.sum(-(-nz // chunk_e)) + len(nz))
            if chunks_bound <= max_chunks or r1 <= r0 + 1:
                break
            r1 = r0 + max(((r1 - r0) * 3) // 4, 1)
        parts.append((r0, r1, b, off))
        r0 = r1
    # every output block needs >= 1 part: unwritten out blocks hold
    # uninitialized garbage (empty tail windows are common — degree
    # sorting concentrates in-edges at low dst ids). An empty part
    # costs one grid step: first_flag zeroes the block, adds nothing.
    have = {b for (_a, _bnd, b, _o) in parts}
    for b in range(n_out_blocks):
        if b not in have:
            parts.append((total_rows, total_rows, b, 0))
    parts.sort(key=lambda t: t[2])
    n_parts = len(parts)

    # ---- slab-side packing: group each slab's elements by part ----------
    part_of_row = np.zeros(max(total_rows, 1), dtype=np.int64)
    for pi, (a, bnd, _b, _o) in enumerate(parts):
        part_of_row[a:bnd] = pi
    part_of_edge = part_of_row[np.minimum(grow, max(total_rows - 1, 0))]
    comp = slab_of_edge * (n_parts + 1) + part_of_edge
    so = _argsort_u64(comp.astype(np.uint64)) if e else np.zeros(0, np.int64)
    comp_s = comp[so]
    rank_in_run = _group_ranks(comp_s)
    run_first = np.ones(e, dtype=bool)
    if e:
        run_first[1:] = comp_s[1:] != comp_s[:-1]
    run_starts = np.nonzero(run_first)[0]
    run_lens = np.diff(np.append(run_starts, e))
    run_slab = (comp_s[run_starts] // (n_parts + 1)).astype(np.int64)
    run_part = (comp_s[run_starts] % (n_parts + 1)).astype(np.int64)
    slab_first = np.ones(len(run_starts), dtype=bool)
    if len(run_starts):
        slab_first[1:] = run_slab[1:] != run_slab[:-1]
    csum = (
        np.concatenate([[0], np.cumsum(run_lens)[:-1]])
        if len(run_lens)
        else np.zeros(0, np.int64)
    )
    slab_b = np.zeros(len(run_lens), dtype=np.int64)
    if len(run_lens):
        slab_b[slab_first] = csum[slab_first]
        slab_b = np.maximum.accumulate(slab_b)
    run_pos0 = csum - slab_b
    if len(run_lens) and (run_pos0 + run_lens > slab_e).any():
        raise ValueError("spmv3: slab overflow")
    run_id_of = np.cumsum(run_first) - 1 if e else np.zeros(0, np.int64)
    pos_in_slab = (
        run_pos0[run_id_of] + rank_in_run if e else np.zeros(0, np.int64)
    )
    assert slot_rows * LANES < (1 << 31) and e < (1 << 31)
    pi1 = np.full(slot_rows * LANES, -1, dtype=np.int32)
    if e:
        pi1[slot_of_edge[so]] = (
            run_slab[run_id_of] * slab_e + pos_in_slab
        ).astype(np.int32)
    neg = pi1 < 0
    used = np.zeros(slot_rows * LANES, dtype=bool)
    used[pi1[~neg]] = True
    free_slots = np.nonzero(neg)[0]
    empty_pos = np.nonzero(~used)[0]
    pi1[free_slots] = empty_pos[: len(free_slots)].astype(np.int32)
    del neg, used, free_slots, empty_pos
    pos_edge = np.full(slot_rows * LANES, -1, dtype=np.int32)
    if e:
        pos_edge[pi1[slot_of_edge]] = np.arange(e, dtype=np.int32)
    # big edge-order temporaries are done (scale 24 holds ~2.1 GB each)
    del so, comp, comp_s, rank_in_run, run_first, run_id_of, pos_in_slab

    # ---- chunk lists + per-part permutations + spare-bit words ----------
    po = (
        _argsort_u64((run_part * (n_slabs + 1) + run_slab).astype(np.uint64))
        if len(run_lens)
        else np.zeros(0, np.int64)
    )
    runs_sorted_part = run_part[po] if len(run_lens) else np.zeros(0)
    desc_lists: list = []  # per-part descriptor lists
    route_jobs = []
    hi_extra = np.zeros((n_parts * PR, LANES), dtype=np.uint32)
    minw_np = (
        np.zeros((n_parts * PR, LANES), dtype=np.uint32)
        if reduce == "min"
        else np.zeros((8, LANES), dtype=np.uint32)
    )
    ri = 0
    for pi, (a, bnd, b, off) in enumerate(parts):
        rlist = []
        while ri < len(po) and runs_sorted_part[ri] == pi:
            rlist.append(po[ri])
            ri += 1
        cks: list = []
        for rj in rlist:
            s = run_slab[rj]
            p0 = run_pos0[rj]
            p1 = p0 + run_lens[rj]
            base = s * (slab_e // chunk_e)
            cks.extend(range(base + p0 // chunk_e, base + int(-(-p1 // chunk_e))))
        if len(cks) > max_chunks:
            info = [
                (int(run_slab[rj]), int(run_pos0[rj]), int(run_lens[rj]))
                for rj in rlist
            ]
            raise ValueError(
                f"spmv3: part {pi} chunk overflow ({len(cks)} > "
                f"{max_chunks}); rows [{a},{bnd}); runs (slab,pos,len): "
                f"{info}"
            )
        # DMA descriptors: runs are CONTIGUOUS chunk spans in both slab
        # space and the part input, so one descriptor covers 2^k chunks
        # (src chunk 18b | dst slot 9b << 18 | k 3b << 27) — ~2 issues
        # per run instead of one per chunk.
        descs: list = []
        for rj in rlist:
            s = run_slab[rj]
            p0 = run_pos0[rj]
            p1 = p0 + run_lens[rj]
            base = s * (slab_e // chunk_e)
            c0 = int(base + p0 // chunk_e)
            c1 = int(base + -(-p1 // chunk_e))
            left = c1 - c0
            cur = c0
            while left:
                k = min(left.bit_length() - 1, 7)
                assert cur < (1 << 28)
                descs.append(cur | (k << 28))
                cur += 1 << k
                left -= 1 << k
        desc_lists.append(descs)
        cks_a = np.asarray(cks, dtype=np.int64)
        n_in = len(cks_a) * chunk_e
        if n_in:
            cov = (
                cks_a[:, None] * chunk_e
                + np.arange(chunk_e, dtype=np.int64)[None, :]
            ).reshape(-1)
            eid = pos_edge[cov]
            own = (eid >= 0) & (part_of_edge[np.maximum(eid, 0)] == pi)
        else:
            eid = np.zeros(0, np.int64)
            own = np.zeros(0, bool)
        perm = np.full(part_e, -1, dtype=np.int64)
        tgt = np.full(n_in, -1, dtype=np.int64)
        real_pos = np.zeros(part_e, dtype=bool)
        if n_in:
            t_own = (grow[eid[own]] - a) * LANES + glane[eid[own]]
            tgt[own] = t_own
            real_pos[t_own] = True
        # everything else (dupes, pads, garbage tail) -> unused targets
        used_t = real_pos.copy()
        left_in = np.nonzero(tgt < 0)[0]
        free_t = np.nonzero(~used_t)[0]
        tgt[left_in] = free_t[: len(left_in)]
        perm[:n_in] = tgt
        perm[n_in:] = free_t[len(left_in) :]
        keyed_rows = bnd - a
        keys_loc = np.full(PR, WP, dtype=np.uint32)  # WP = trash key
        keys_loc[:keyed_rows] = (
            row_key[a:bnd] - b * WO - off
        ).astype(np.uint32)
        assert keyed_rows == 0 or keys_loc[:keyed_rows].max() < WP
        real_rows = real_pos.reshape(PR, LANES)
        hi_extra[pi * PR : (pi + 1) * PR] = (
            real_rows.astype(np.uint32) << 12
        ) | (keys_loc[:, None].astype(np.uint32) << 13)
        if reduce == "min":
            flags = np.zeros(PR, dtype=np.uint32)
            flags[0] = 1
            if keyed_rows > 1:
                flags[1:keyed_rows] = (
                    row_key[a + 1 : bnd] != row_key[a : bnd - 1]
                ).astype(np.uint32)
            flags[keyed_rows:] = 1
            ends = np.zeros(PR, dtype=bool)
            if keyed_rows:
                ends[: keyed_rows - 1] = (
                    row_key[a + 1 : bnd] != row_key[a : bnd - 1]
                )
                ends[keyed_rows - 1] = True
            rperm = np.full(PR, -1, dtype=np.int64)
            end_rows = np.nonzero(ends)[0]
            rperm[end_rows] = keys_loc[end_rows]
            used_r = np.zeros(PR, dtype=bool)
            used_r[keys_loc[end_rows]] = True
            rperm[rperm < 0] = np.nonzero(~used_r)[0]
            rbits = pack_bits(route_benes(rperm))  # <= 27 stages (PR 16K)
            valid = np.zeros(PR, dtype=np.uint32)
            valid[keys_loc[end_rows]] = 1
            minw_np[pi * PR : (pi + 1) * PR] = (
                flags[:, None]
                | (valid[:, None] << 1)
                | ((rbits[0].astype(np.uint32) & 0x7FFFFFF) << 2)[:, None]
            )
        route_jobs.append((pi, perm))
    # descriptors as a (n_parts + 1, DMAX) row-blocked array: rows
    # stream to SMEM per grid step (no scalar-prefetch capacity limit —
    # flat arrays hit the ~1 MB SMEM wall at scale 24's ~200K runs);
    # +1 pad row so the next-part prefetch stream stays in bounds.
    n_desc = sum(len(d) for d in desc_lists)
    # Mosaic: block last dim must be a multiple of 128 (SMEM too)
    dmax = max(
        -(-max((len(d) for d in desc_lists), default=1) // 128) * 128,
        128,
    )
    drows = -(-(n_parts + 8) // 8) * 8
    desc2d = np.zeros((drows, dmax), dtype=np.int32)
    dcount = np.zeros(n_parts + 1, dtype=np.int32)
    for pi, dl in enumerate(desc_lists):
        desc2d[pi, : len(dl)] = dl
        dcount[pi] = len(dl)
    n_steps = max(n_desc, 1)

    # ---- Benes route words (C++ routing, thread pool) -------------------
    r2_lo = np.zeros((n_parts * PR, LANES), np.int32)
    r2_hi = np.zeros((n_parts * PR, LANES), np.int32)

    def _route2(job):
        pi, perm = job
        return pi, pack_bits(route_benes(perm))

    with ThreadPoolExecutor(max_workers=8) as tp:
        for pi, packed in tp.map(_route2, route_jobs):
            r2_lo[pi * PR : (pi + 1) * PR] = packed[0].reshape(PR, LANES)
            if packed.shape[0] > 1:
                r2_hi[pi * PR : (pi + 1) * PR] = packed[1].reshape(
                    PR, LANES
                )
    assert not (r2_hi & ~0x7FF).any(), "route bits exceed hi 0..10"
    r2_hi = (r2_hi.astype(np.uint32) | hi_extra).astype(np.int32)

    r1_lo = np.zeros((slot_rows, LANES), np.int32)
    r1_hi = np.zeros((slot_rows, LANES), np.int32)

    def _route1(s):
        lo, hi = s * slab_e, (s + 1) * slab_e
        return s, pack_bits(route_benes(pi1[lo:hi] - lo))

    with ThreadPoolExecutor(max_workers=8) as tp:
        for s, packed in tp.map(_route1, range(n_slabs)):
            r1_lo[s * SR : (s + 1) * SR] = packed[0].reshape(SR, LANES)
            if packed.shape[0] > 1:
                r1_hi[s * SR : (s + 1) * SR] = packed[1].reshape(SR, LANES)

    del pos_edge, edge_by_row, grow, glane, part_of_edge, slab_of_edge
    del slot_of_edge, row_of_edge, lane_of_edge, idx_of_edge, final_row
    winof = np.asarray([b for (_a, _bnd, b, _o) in parts], dtype=np.int32)
    partoff = np.asarray([o for (_a, _bnd, _b, o) in parts], dtype=np.int32)
    first_flag = np.ones(n_parts, dtype=np.int32)
    first_flag[1:] = (winof[1:] != winof[:-1]).astype(np.int32)

    # fill diagnostics (module global, read by benchmarks/tests):
    # where the slot budget goes — window-max column inflation, heavy
    # rows, part-boundary padding (block crossings + chunk-budget
    # shrink), and chunk-boundary dupes.
    LAST_STATS.clear()
    LAST_STATS.update(
        n_parts=n_parts,
        slots=n_parts * part_e,
        edges=e,
        win_rows=n_win_rows,
        heavy_rows=int(heavy_base[-1]),
        total_rows=total_rows,
        part_pad_rows=n_parts * PR - total_rows,
        chunks=n_desc,
        runs=int(len(run_lens)),
        slabs=n_slabs,
    )

    # Convert-and-free: each multi-GB host array is handed to the device
    # (or the CPU backend) and its numpy buffer dropped BEFORE the next
    # conversion — holding numpy + jnp copies of every array
    # simultaneously peaked the scale-24 sum+min build at 82 GB RSS
    # (docs/PERFORMANCE.md round 5 wall #6; target <= 64 GB).
    prow_j = jnp.asarray(prow_np)
    del prow_np
    idx_j = jnp.asarray(idx_np)
    del idx_np
    w_j = jnp.asarray(w_np)
    del w_np
    r1_lo_j = jnp.asarray(r1_lo)
    del r1_lo
    r1_hi_j = jnp.asarray(r1_hi)
    del r1_hi
    r2_lo_j = jnp.asarray(r2_lo)
    del r2_lo
    r2_hi_j = jnp.asarray(r2_hi)
    del r2_hi
    desc2d_j = jnp.asarray(desc2d)
    del desc2d
    minw_j = jnp.asarray(minw_np.astype(np.int32))
    del minw_np
    lay = KeyedLayout(
        prow=prow_j,
        idx=idx_j,
        w=w_j,
        hub_ids=jnp.asarray(
            hub_ids.astype(np.int32)
            if n_hub_rows
            else np.zeros(1, np.int32)
        ),
        route1_lo=r1_lo_j,
        route1_hi=r1_hi_j,
        chunk_src=desc2d_j,
        chunk_off=jnp.asarray(dcount),
        route2_lo=r2_lo_j,
        route2_hi=r2_hi_j,
        winof=jnp.asarray(winof),
        partoff=jnp.asarray(partoff),
        first_flag=jnp.asarray(first_flag),
        heavy_dsts=jnp.asarray(heavy_ids.astype(np.int32)),
        minw=minw_j,
        cfg=cfg,
        n_slabs=n_slabs,
        n_parts=n_parts,
        n_steps=n_steps,
        x_rows=x_rows,
        n_out_blocks=n_out_blocks,
        num_vertices=v,
        num_edges=e,
        num_src=vs if num_src_vertices is not None else 0,
        reduce=reduce,
    )
    if weight_variants is not None:
        sibs = []
        while w_sibs:  # convert-and-free each sibling weight stream
            sibs.append(jnp.asarray(w_sibs.pop(0)))
        return lay, sibs
    return lay


# ===========================================================================
# Kernels
# ===========================================================================


def _apply_row_benes(x, words, shift, rows):
    """Rows-only Benes: full 128-lane rows move as units. Switch bits
    ride `words` bits [shift, shift+2*log2(rows)-1) — every lane of a
    row carries the same bit (arithmetic >> of bit 31 still yields the
    correct bit after & 1)."""
    from jax.experimental.pallas import tpu as pltpu

    row_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    for s, d in enumerate(stage_distances(rows)):
        bit = ((words >> (shift + s)) & 1) != 0
        hi_m = (row_iota & d) != 0
        z = jnp.where(
            hi_m,
            pltpu.roll(x, d, axis=0),
            pltpu.roll(x, rows - d, axis=0),
        )
        x = jnp.where(bit, z, x)
    return x


def _dma_gather_runs(b_ref, vbuf, sems, CH, kmax):
    """Issue/wait for coalesced run descriptors read from a per-part
    (1, DMAX) SMEM row: descriptor d copies 2^k chunks (k = bits
    28..30) from slab-space chunk (bits 0..27); the destination chunk
    slot is the running size cursor. kmax bounds the size-class branch
    set (a 2^k-chunk copy must fit the part block)."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def issue(dref, row, n, slot):
        def body(i, dst):
            d = dref[row, i]
            src = d & 0xFFFFFFF
            k = (d >> 28) & 0x7

            def mk(kk):
                def f(_x):
                    pltpu.make_async_copy(
                        b_ref.at[pl.ds(src * CH, CH << kk), :],
                        vbuf.at[slot, pl.ds(dst * CH, CH << kk), :],
                        sems.at[slot],
                    ).start()
                    return 0

                return f

            lax.switch(k, [mk(kk) for kk in range(kmax + 1)], 0)
            return dst + (1 << k)

        lax.fori_loop(0, n, body, 0)

    def wait(dref, row, n, slot):
        def body(i, _):
            d = dref[row, i]
            k = (d >> 28) & 0x7

            def mk(kk):
                def f(_x):
                    pltpu.make_async_copy(
                        b_ref.at[pl.ds(0, CH << kk), :],
                        vbuf.at[slot, pl.ds(0, CH << kk), :],
                        sems.at[slot],
                    ).wait()
                    return 0

                return f

            lax.switch(k, [mk(kk) for kk in range(kmax + 1)], 0)
            return 0

        lax.fori_loop(0, n, body, 0)

    return issue, wait


def _keyed_grid_spec(layout, pl, pltpu, extra_vmem_blocks=0):
    """Shared grid spec of the K-C kernels: scalar prefetch (dcount,
    winof, partoff, first_flag), SMEM descriptor rows for part t and
    t+1, VMEM route blocks (+ optional extra (PR,128) streams), the
    (w_out, 128) output block by part window."""
    PR = layout.cfg.part_rows
    WO = layout.cfg.w_out
    dmax = layout.chunk_src.shape[1]
    blk = pl.BlockSpec(
        (PR, LANES), lambda t, *p: (t, 0), memory_space=pltpu.VMEM
    )
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(layout.n_parts,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # binned (DMA source)
            # (8, dmax) rows: Mosaic needs 8-divisible sublane blocks;
            # the kernel picks row t % 8 / (t+1) % 8
            pl.BlockSpec(
                (8, dmax), lambda t, *p: (t // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, dmax), lambda t, *p: ((t + 1) // 8, 0),
                memory_space=pltpu.SMEM,
            ),
        ]
        + [blk] * (2 + extra_vmem_blocks),
        out_specs=pl.BlockSpec(
            (WO, LANES), lambda t, *p: (p[1][t], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def _keyed_reduce_call(layout, binned, interpret):
    """K-C sum: fused run DMA + part Benes + one-hot MXU reduce."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PR = layout.cfg.part_rows
    CH = layout.cfg.chunk_rows
    WO = layout.cfg.w_out
    WP = layout.cfg.w_part
    n_parts = layout.n_parts
    KMAX = min(7, (PR // CH).bit_length() - 1)
    TR = min(PR, 1024)  # row tile of the one-hot matmul

    def kern(cnt_ref, wf_ref, po_ref, ff_ref, b_ref, dc_ref, dn_ref,
             lo_ref, hi_ref, o_ref, vbuf, sems):
        t = pl.program_id(0)
        issue, wait = _dma_gather_runs(b_ref, vbuf, sems, CH, KMAX)

        @pl.when(t == 0)
        def _():
            issue(dc_ref, 0, cnt_ref[0], 0)

        @pl.when(t + 1 < n_parts)
        def _():
            issue(dn_ref, (t + 1) % 8, cnt_ref[t + 1], (t + 1) % 2)

        wait(dc_ref, t % 8, cnt_ref[t], t % 2)
        v = vbuf[t % 2]
        x = _apply_benes_block(v, lo_ref[:], hi_ref[:], PR)
        real = ((hi_ref[:] >> 12) & 1) > 0
        # where, not multiply: garbage input slots may hold non-finite
        xm = jnp.where(real, x, 0.0)
        hi16 = xm.astype(jnp.bfloat16)
        lo16 = (xm - hi16.astype(jnp.float32)).astype(jnp.bfloat16)
        keyw = (hi_ref[:, 0:1] >> 13) & 0x7FFF  # (PR, 1) output row

        @pl.when(ff_ref[t] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        acc = jnp.zeros((WP, LANES), jnp.float32)
        for r0 in range(0, PR, TR):
            kw = keyw[r0 : r0 + TR]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (TR, WP), 1)
            oh = (kw == iota_w).astype(jnp.bfloat16)  # (TR, WP)
            dn = (((0,), (0,)), ((), ()))
            acc = acc + jax.lax.dot_general(
                oh, hi16[r0 : r0 + TR], dn,
                preferred_element_type=jnp.float32,
            )
            acc = acc + jax.lax.dot_general(
                oh, lo16[r0 : r0 + TR], dn,
                preferred_element_type=jnp.float32,
            )
        off = po_ref[t]
        cur = o_ref[pl.ds(off, WP), :]
        o_ref[pl.ds(off, WP), :] = cur + acc

    return pl.pallas_call(
        kern,
        grid_spec=_keyed_grid_spec(layout, pl, pltpu),
        out_shape=_out_struct(
            (layout.n_out_blocks * WO, LANES), jnp.float32, binned,
            layout.winof,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(
        layout.chunk_off,
        layout.winof,
        layout.partoff,
        layout.first_flag,
        binned,
        layout.chunk_src,
        layout.chunk_src,
        layout.route2_lo,
        layout.route2_hi,
    )


def _keyed_min_call(layout, binned, interpret):
    """K-C min: part Benes + segmented min scan + exact row-Benes mover
    (group-end rows land at their output rows; minw bit 1 marks rows
    that received one)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .spmv2 import _seg_scan_rows

    PR = layout.cfg.part_rows
    CH = layout.cfg.chunk_rows
    WO = layout.cfg.w_out
    WP = layout.cfg.w_part
    n_parts = layout.n_parts
    KMAX = min(7, (PR // CH).bit_length() - 1)
    INF = float(np.inf)

    def kern(cnt_ref, wf_ref, po_ref, ff_ref, b_ref, dc_ref, dn_ref,
             lo_ref, hi_ref, mw_ref, o_ref, vbuf, sems):
        t = pl.program_id(0)
        issue, wait = _dma_gather_runs(b_ref, vbuf, sems, CH, KMAX)

        @pl.when(t == 0)
        def _():
            issue(dc_ref, 0, cnt_ref[0], 0)

        @pl.when(t + 1 < n_parts)
        def _():
            issue(dn_ref, (t + 1) % 8, cnt_ref[t + 1], (t + 1) % 2)

        wait(dc_ref, t % 8, cnt_ref[t], t % 2)
        v = vbuf[t % 2]
        x = _apply_benes_block(v, lo_ref[:], hi_ref[:], PR)
        real = ((hi_ref[:] >> 12) & 1) > 0
        xm = jnp.where(real, x, INF)
        flags = (mw_ref[:] & 1).astype(jnp.float32)
        scan = _seg_scan_rows(xm, flags, PR, "min")
        placed = _apply_row_benes(scan, mw_ref[:], 2, PR)
        valid = ((mw_ref[:] >> 1) & 1) > 0
        placed = jnp.where(valid, placed, INF)

        @pl.when(ff_ref[t] == 1)
        def _():
            o_ref[:] = jnp.full_like(o_ref, INF)

        off = po_ref[t]
        cur = o_ref[pl.ds(off, WP), :]
        o_ref[pl.ds(off, WP), :] = jnp.minimum(cur, placed[:WP, :])

    return pl.pallas_call(
        kern,
        grid_spec=_keyed_grid_spec(layout, pl, pltpu, extra_vmem_blocks=1),
        out_shape=_out_struct(
            (layout.n_out_blocks * WO, LANES), jnp.float32, binned,
            layout.winof,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(
        layout.chunk_off,
        layout.winof,
        layout.partoff,
        layout.first_flag,
        binned,
        layout.chunk_src,
        layout.chunk_src,
        layout.route2_lo,
        layout.route2_hi,
        layout.minw,
    )


@partial(jax.jit, static_argnames=("interpret",))
def keyed_spmv_jit(layout: KeyedLayout, x: jax.Array, interpret=False):
    """y = keyed-engine SpMV. reduce direction is baked into the layout
    (layout.reduce): "sum" -> y[dst] = sum w*x[src]; "min" -> min-plus
    sweep y[dst] = min(x[src] + w), +inf where dst has no in-edge."""
    from .spmv2 import _expand_call, _slab_benes_call

    xr = layout.x_rows
    n_hub = layout.hub_ids.shape[0]
    trows = -(-(xr + n_hub) // 8) * 8
    xpad = jnp.zeros(xr * LANES, jnp.float32).at[: layout.src_count].set(x)
    hub_vals = jnp.take(xpad, layout.hub_ids)
    table = jnp.zeros((trows, LANES), jnp.float32)
    table = table.at[:xr].set(xpad.reshape(xr, LANES))
    table = table.at[xr : xr + n_hub].set(
        jnp.broadcast_to(hub_vals[:, None], (n_hub, LANES))
    )
    vals = _expand_call(layout, table, interpret, layout.reduce)
    binned = _slab_benes_call(layout, vals, interpret)
    if layout.reduce == "sum":
        out = _keyed_reduce_call(layout, binned, interpret)
    else:
        out = _keyed_min_call(layout, binned, interpret)
    v = layout.num_vertices
    v2_rows = max(-(-v // LANES), 1)
    y = out[:v2_rows].reshape(-1)[:v]
    n_heavy = layout.heavy_dsts.shape[0]
    if n_heavy:
        hv = out[v2_rows : v2_rows + n_heavy]
        if layout.reduce == "sum":
            y = y.at[layout.heavy_dsts].add(jnp.sum(hv, axis=1))
        else:
            y = y.at[layout.heavy_dsts].min(jnp.min(hv, axis=1))
    return y


# ===========================================================================
# Disk cache + Graph-level API (mirrors spmv2.sorted_layout_for)
# ===========================================================================

_KEYED_CACHE: dict = {}
_KEYED_STATIC = (
    "n_slabs", "n_parts", "n_steps", "x_rows", "n_out_blocks",
    "num_vertices", "num_edges", "num_src", "reduce",
)


def _keyed_cache_key(dsts, srcs, weights, num_vertices, cfg, pad_weight,
                     num_src_vertices, reduce) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(b"keyed-v7")  # v7: (8, DMAX) SMEM descriptor blocks
    h.update(np.int64(num_vertices).tobytes())
    if num_src_vertices is not None:
        h.update(np.int64(num_src_vertices).tobytes())
    h.update(np.float32(pad_weight).tobytes())
    h.update(repr(dataclasses.astuple(cfg)).encode())
    h.update(reduce.encode())
    h.update(np.ascontiguousarray(dsts, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(srcs, dtype=np.int64).tobytes())
    if weights is not None:
        h.update(np.ascontiguousarray(weights, dtype=np.float32).tobytes())
    return h.hexdigest()


def save_keyed_layout(path: str, layout: KeyedLayout) -> None:
    import os
    import threading

    arrays = {
        f.name: np.asarray(getattr(layout, f.name))
        for f in dataclasses.fields(layout)
        if f.name not in _KEYED_STATIC and f.name != "cfg"
    }
    meta = dict(
        cfg=dataclasses.astuple(layout.cfg),
        **{k: getattr(layout, k) for k in _KEYED_STATIC},
    )
    tmp = f"{path}.{os.getpid()}.{threading.get_native_id()}.tmp.npz"
    np.savez(
        tmp, __meta__=np.frombuffer(repr(meta).encode(), np.uint8), **arrays
    )
    os.replace(tmp, path)
    from .spmv2 import _evict_layout_cache

    _evict_layout_cache(os.path.dirname(path), keep=path)


def load_keyed_layout(path: str) -> KeyedLayout:
    import ast

    with np.load(path) as z:
        meta = ast.literal_eval(bytes(z["__meta__"]).decode())
        arrays = {k: jnp.asarray(z[k]) for k in z.files if k != "__meta__"}
    cfg = Spmv3Config(*meta.pop("cfg"))
    return KeyedLayout(cfg=cfg, **meta, **arrays)


def build_keyed_layout_cached(
    dsts, srcs, weights, num_vertices,
    cfg: Optional[Spmv3Config] = None,
    pad_weight: float = 0.0,
    num_src_vertices: Optional[int] = None,
    reduce: str = "sum",
    weight_variants: Optional[list] = None,
):
    """build_keyed_layout with the spmv2-style disk cache (cache file
    names start spmv2_layout_ so the shared LRU eviction covers both
    engines)."""
    import os

    cfg = cfg or default_config3_for(
        int(num_vertices), len(dsts), reduce
    )
    cdir = _cache_dir()
    all_specs = [(weights, pad_weight)] + list(weight_variants or ())
    cpaths = [None] * len(all_specs)
    if cdir is not None:
        for i, (wts_k, pad_k) in enumerate(all_specs):
            key = _keyed_cache_key(
                dsts, srcs, wts_k, num_vertices, cfg, pad_k,
                num_src_vertices, reduce,
            )
            cpaths[i] = os.path.join(cdir, f"spmv2_layout_k{key}.npz")
        cached = []
        for p in cpaths:
            try:
                cached.append(load_keyed_layout(p))
            except Exception:
                cached = None
                break
        if cached is not None:
            return cached if weight_variants is not None else cached[0]
    out = build_keyed_layout(
        dsts, srcs, weights, num_vertices, cfg,
        pad_weight=pad_weight, num_src_vertices=num_src_vertices,
        reduce=reduce, weight_variants=weight_variants,
    )
    if weight_variants is not None:
        lay, sibs = out
        lays = [lay] + [dataclasses.replace(lay, w=wk) for wk in sibs]
    else:
        lays = [out]
    for p, lk in zip(cpaths, lays):
        if p is not None:
            save_keyed_layout(p, lk)
    return lays if weight_variants is not None else lays[0]


def keyed_available(num_vertices: int) -> bool:
    """The keyed engine serves V <= 2^24 (x table <= 64 MB VMEM) on TPU
    backends; CUGRAPH_TPU_FORCE_SORTED lifts the backend gate (host
    prebuilds), CUGRAPH_TPU_ENGINE=v2 disables it."""
    import os

    if os.environ.get("CUGRAPH_TPU_ENGINE", "").lower() == "v2":
        return False
    if jax.default_backend() not in ("tpu", "axon") and not os.environ.get(
        "CUGRAPH_TPU_FORCE_SORTED"
    ):
        return False
    return num_vertices <= 1 << 24


def keyed_layout_for(
    graph,
    direction: str = "in",
    use_weights: bool = True,
    variant: str = "sum",
    cfg: Optional[Spmv3Config] = None,
):
    """Build (and cache) the keyed-engine layout for a Graph. Contract
    matches spmv2.sorted_layout_for; returns None when unavailable."""
    if not keyed_available(graph.num_vertices):
        return None
    adj = graph.csc() if direction == "in" else graph.csr()
    key = (id(adj.majors), direction, use_weights, variant, "k")
    hit = _KEYED_CACHE.get(key)
    if hit is not None and hit[0] is adj.majors:
        return hit[1]
    e = adj.num_edges
    d = np.asarray(adj.majors)[:e].astype(np.int64)
    s = np.asarray(adj.minors)[:e].astype(np.int64)
    wts = (
        None
        if (adj.weights is None or not use_weights)
        else np.asarray(adj.weights)[:e]
    )
    pad = 0.0
    if variant == "min":
        pad = float(np.inf)
        if wts is None:
            wts = np.zeros(e, np.float32)
    layout = build_keyed_layout_cached(
        d, s, wts, graph.num_vertices, cfg, pad_weight=pad, reduce=variant
    )
    if len(_KEYED_CACHE) > 4:
        _KEYED_CACHE.clear()
    _KEYED_CACHE[key] = (adj.majors, layout)
    return layout
