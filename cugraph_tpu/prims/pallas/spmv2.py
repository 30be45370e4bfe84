"""SpMV v2 — the gather-free sorted pipeline (static-routed, Benes-based).

Computes y[dst] = sum over edges (src -> dst) of w * x[src] at multi-GB/s
on TPU, replacing both XLA sparse halves (gather ~0.1 Gelem/s, scatter
~0.09 — docs/PERFORMANCE.md) with three Pallas kernels whose data
movement is STATIC (precomputed per graph):

  K-A  expand   x[src] for every edge via paged 8-way select from a
                VMEM-resident x table (lane = src%128, sublane idx
                precomputed; hub sources get broadcast rows appended to
                the table so single-source runs fill whole vregs).
  K-B  slab     within each 2^19-element slab, a 37-stage Benes butterfly
                (roll+select, switch bits precomputed by
                native ct_benes_route) groups values by destination BIN,
                runs padded to chunk-row boundaries.
  K-C1 assemble chunk-granular static row gather: every part's runs are
                copied into a contiguous part block (prefetched index
                maps, pure streaming).
  K-C2 sort+reduce  per part: Benes to exact dst-sorted order (dst d's
                elements stacked in lane (d + chunk)%128), segmented scan
                along rows, then a windowed within-lane extract gathers
                each dst's total into the dense y slice of the part's
                bin; parts of a bin accumulate into the same out block.
                "Simple" parts (a single heavy destination) skip the sort
                and reduce to one scalar.

Role parity: this pipeline IS the TPU redesign of the reference's
degree-segmented per_v_transform_reduce_incoming_e CUDA kernels
(cpp/src/prims/per_v_transform_reduce_incoming_outgoing_e.cuh:84-560):
where CUDA picks thread/warp/block per vertex, the TPU picks hub
broadcast rows / lane-stacked selects / Benes-sorted segments.

All shapes static; the layout (SortedLayout) is built host-side once per
graph (numpy + C++ Benes routing) and cached.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .benes import route_benes, pack_bits, stage_distances

LANES = 128


@dataclasses.dataclass(frozen=True)
class Spmv2Config:
    slab_rows: int = 2048  # 2^18 elements per slab (VMEM: 3 blocks + d.b.)
    part_rows: int = 2048  # 2^18 elements per part block
    bin_rows: int = 512  # dsts per bin = bin_rows * 128; layers = PR // BR
    chunk_rows: int = 16  # assembly copy granularity (16x128 f32 = 8 KB DMA)
    hub_deg: int = 1024  # src out-count threshold for broadcast rows
    heavy_dst: int = 8192  # dst in-count threshold for simple parts
    max_rounds: int = 8  # unused (kept for config/cache-key stability)


TINY = Spmv2Config(
    slab_rows=16, part_rows=16, bin_rows=8, chunk_rows=2, hub_deg=8,
    heavy_dst=64, max_rounds=16,
)


def default_config_for(num_vertices: int) -> Spmv2Config:
    """Scale the dst-bin width with V (target <= 64 bins) so per-slab runs
    stay chunk-dense: with bin count ~ V the runs shrink below one
    assembly chunk and part fill collapses (measured: the scale-23 range
    layout grew 4.4x vs scale 21 at fixed bin_rows). part_rows stays 2048
    (kernel VMEM unchanged); layers = PR//BR shrinks accordingly, lowering
    the effective heavy threshold — heavy traffic rides the dense hub
    path anyway."""
    need = -(-num_vertices // (LANES * 64))
    # bin_rows must divide part_rows (2048): round UP to the next divisor.
    # Capped at 1024 so LAYERS = part_rows // bin_rows stays >= 2 — the
    # end-at-target placement needs at least two layers (scale 24+ takes
    # more bins instead; runs stay chunk-dense down to ~1.5k elems/run)
    for br in (512, 1024):
        if br >= need:
            break
    # slab_rows 4096 halves the per-bin run count (fewer piece boundaries
    # -> fewer duplicated boundary chunks AND denser part packing):
    # measured at RMAT scale 21, parts 183 -> 168 and real/copied cells
    # 85.4% -> 92.1% for +2 route1 stages. 8192 would block the k=8
    # multi-stream SpMM on VMEM (slab blocks grow past the 110 MB limit).
    return Spmv2Config(bin_rows=br, slab_rows=4096)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedLayout:
    # K-A expand
    prow: jax.Array  # (n_vregs,) i32 x-table row of each slot vreg
    idx: jax.Array  # (slot_rows, 128) i32 sublane in page [0, 8)
    w: jax.Array  # (slot_rows, 128) f32 edge weight (0 = padding)
    hub_ids: jax.Array  # (n_hub_rows * 128,) i32 hub src per table lane? no:
    #   (n_hub_rows,) i32 hub source vertex of each appended table row
    # K-B slab benes
    route1_lo: jax.Array  # (slot_rows, 128) i32 stages 0..31
    route1_hi: jax.Array  # (slot_rows, 128) i32 stages 32..36
    # K-C1 assembly: fused into K-C2 as double-buffered in-kernel DMAs
    # (chunk i of part p copies binned chunk chunk_src[chunk_off[p]+i] to
    # part-block rows [i*CH, (i+1)*CH)); chunk_dst retained for the
    # standalone _assemble_call (breakdown benchmarks, MG shape padding)
    chunk_src: jax.Array  # (n_steps,) i32 source block (chunk units)
    chunk_dst: jax.Array  # (n_steps,) i32 dest block (chunk units)
    chunk_off: jax.Array  # (n_parts + 1,) i32 per-part chunk range
    # K-C2 sort + reduce: route2 = benes to grouped order (+flag bit5 =
    # segment start, bit6 = real element); route3 = benes routing masked
    # group-end totals to layered dst positions (layer k = chunk_id,
    # kernel merges PR//BR layers into the bin block)
    route2_lo: jax.Array  # (n_route_blocks*part_rows, 128) i32
    route2_hi: jax.Array  # (n_route_blocks*part_rows, 128) i32; bits 0..4 =
    #   benes stages 32+, bit 5 = segment start, bit 6 = real element,
    #   bits 8..20 = 13-stage lane-fix benes of the eat mode (mode 2)
    route3_lo: jax.Array  # (n_route3_blocks*part_rows, 128) i32 (mode-0 only)
    route3_hi: jax.Array  # (n_route3_blocks*part_rows, 128) i32
    route_blk: jax.Array  # (n_parts,) i32 route2 block of part (0 = dummy)
    route3_blk: jax.Array  # (n_parts,) i32 route3 block (0 for modes 1/2)
    bin_of_part: jax.Array  # (n_parts,) i32
    first_flag: jax.Array  # (n_parts,) i32 1 = first part of its bin
    mode: jax.Array  # (n_parts,) i32 0 = sorted (two benes), 1 = simple,
    #   2 = end-at-target (group ends land AT their layered positions; the
    #   placement benes collapses to a 13-stage in-row lane fix)
    simple_pos: jax.Array  # (n_parts,) i32 packed r*128+l dst slot (simple)
    # hub scatter map: totals of heavy dsts land in compact per-part slots
    # of out blocks n_bins..n_out_blocks; y[hub_dsts] (+)= hub_region[hub_pos]
    hub_dsts: jax.Array  # (n_hub_slots,) i32 global dst ids
    hub_pos: jax.Array  # (n_hub_slots,) i32 flat pos within the hub region
    cfg: Spmv2Config = dataclasses.field(metadata=dict(static=True))
    n_slabs: int = dataclasses.field(metadata=dict(static=True))
    n_parts: int = dataclasses.field(metadata=dict(static=True))
    n_bins: int = dataclasses.field(metadata=dict(static=True))
    n_steps: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))  # src table rows
    num_vertices: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    # src-range width when this layout covers only a slice of the sources
    # (multi-range pipelines for V past the VMEM table budget); 0 = all V
    num_src: int = dataclasses.field(default=0, metadata=dict(static=True))
    # out blocks = n_bins dense bins + one compact block per hub part;
    # 0 = legacy layout (no hub region, n_bins blocks)
    n_out_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def out_blocks(self) -> int:
        return self.n_out_blocks or self.n_bins

    @property
    def src_count(self) -> int:
        return self.num_src or self.num_vertices


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiSortedLayout:
    """Column-split pipeline: sources partitioned into `span`-wide ranges,
    one SortedLayout per non-empty range; y = combine_k pipeline_k(x_k).
    Each range's x table fits the VMEM budget, so the pipeline serves
    graphs far past the single-table vertex cap (e.g. RMAT scale 23-24).
    The TPU analog of the reference's multi-partition edge storage on one
    rank (graph_view edge partitions, graph_view.hpp:588)."""

    parts: tuple  # of SortedLayout (pytree children)
    range_of: tuple = dataclasses.field(metadata=dict(static=True))  # int per part
    span: int = dataclasses.field(metadata=dict(static=True))
    num_vertices: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))


# ===========================================================================
# Host-side layout build
# ===========================================================================


import time as _time
_T0 = [None]
def _T(tag):
    import os
    if os.environ.get("SPMV2_TIMERS"):
        now = _time.perf_counter()
        if _T0[0] is not None:
            print(f"  {tag}: {now - _T0[0]:.1f}s", flush=True)
        _T0[0] = now


def build_sorted_layout(
    dsts: np.ndarray,
    srcs: np.ndarray,
    weights: Optional[np.ndarray],
    num_vertices: int,
    cfg: Spmv2Config = Spmv2Config(),
    pad_weight: float = 0.0,
    num_src_vertices: Optional[int] = None,
    budget_num: int = 15,
    split_pieces: bool = True,
    weight_variants: Optional[list] = None,
) -> SortedLayout:
    """pad_weight: weight stored in padding slots. 0 for the sum pipeline
    (identity through vals*w); +inf for the min-plus pipeline (identity
    through vals+w under min). num_src_vertices: width of the source id
    space when this layout covers one src range of a multi-range pipeline
    (x table sized by it; dst bins still span num_vertices).

    weight_variants: optional [(weights_or_None, pad_weight), ...] —
    every routing/packing/placement field depends only on the edge
    POSITIONS, so sibling layouts differing only in the w slot array
    come for free from the same host pass. When given, the return value
    is (layout, [w_arrays]); construct each sibling via
    dataclasses.replace(layout, w=wk)."""
    e = len(dsts)
    if len(_FILL_STATS) > (1 << 16):  # diagnostics only; bound the growth
        _FILL_STATS.clear()
    dsts = np.asarray(dsts, dtype=np.int64)
    srcs = np.asarray(srcs, dtype=np.int64)
    w = (
        np.ones(e, dtype=np.float32)
        if weights is None
        else np.asarray(weights, dtype=np.float32)
    )
    v = int(num_vertices)
    vs = int(num_src_vertices) if num_src_vertices is not None else v
    SR, PR, BR, CH = cfg.slab_rows, cfg.part_rows, cfg.bin_rows, cfg.chunk_rows
    assert BR % 8 == 0, "bin_rows must be a multiple of 8 (out vregs)"
    slab_e = SR * LANES
    part_e = PR * LANES
    bin_dsts = BR * LANES
    x_rows = max(-(-vs // LANES), 8)

    _T("stage0")
    # ---- K-A: slot assignment -------------------------------------------
    out_cnt = np.bincount(srcs, minlength=vs)
    hub_mask_v = out_cnt >= cfg.hub_deg
    hub_ids = np.nonzero(hub_mask_v)[0].astype(np.int64)
    hub_row_of = {int(s): x_rows + i for i, s in enumerate(hub_ids)}
    n_hub_rows = len(hub_ids)

    is_hub_e = hub_mask_v[srcs]
    # non-hub edges: page q = src // 1024, lane = src % 128
    # order: page-major, then lane, then arbitrary -> stack down lane
    order_nh = np.nonzero(~is_hub_e)[0]
    q_nh = srcs[order_nh] // (8 * LANES)
    lane_nh = srcs[order_nh] % LANES
    o2 = _argsort_u64(q_nh * LANES + lane_nh)
    order_nh = order_nh[o2]
    q_nh, lane_nh = q_nh[o2], lane_nh[o2]
    # per (page, lane): position in stack
    key = q_nh * LANES + lane_nh
    pos_in = _group_ranks(key)
    # rows per page = max stack height rounded to 8
    if len(key):
        page_ids, page_start = np.unique(q_nh, return_index=True)
        heights = np.zeros(len(page_ids), dtype=np.int64)
        grp_max = _group_max(key, pos_in + 1)
        # per-page max over lanes
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

    # hub edges: hub h fills whole rows after the non-hub region
    order_h = np.nonzero(is_hub_e)[0]
    hs = srcs[order_h]
    o3 = _argsort_u64(hs)
    order_h = order_h[o3]
    hs = hs[o3]
    h_first = np.ones(len(hs), dtype=bool)
    h_first[1:] = hs[1:] != hs[:-1]
    h_rank = _group_ranks(hs)
    hub_counts = out_cnt[hub_ids]
    hub_rows_each = -(-hub_counts // LANES)
    # Pack hub slot-row ranges grouped by x-table PAGE: hubs sharing a
    # table page may share slot vregs (same prow, per-slot idx differs);
    # align at page-group boundaries so no vreg mixes two pages.
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

    _T("stage1")
    # ---- dense (pre-slab) placement -------------------------------------
    n_bins = max(-(-v // bin_dsts), 1)
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
        idx_of_edge[order_nh] = ((srcs[order_nh] // LANES) % 8).astype(np.int32)
        dense_prow[row // 8] = (q_nh * 8).astype(np.int32)
    if len(order_h):
        hub_idx_of = np.searchsorted(hub_ids, hs)
        row = nh_total_rows + hub_row0[hub_idx_of] + h_rank // LANES
        row_of_edge[order_h] = row
        lane_of_edge[order_h] = h_rank % LANES
        idx_of_edge[order_h] = ((x_rows + hub_idx_of) % 8).astype(np.int32)
        dense_prow[row // 8] = ((x_rows + hub_idx_of) // 8 * 8).astype(np.int32)

    _T("stage2")
    # ---- slab-capacity-aware vreg packing --------------------------------
    # Each slab must keep slack for the per-run row alignment of the bin
    # grouping (<= n_bins rows per slab + 1 spare vreg).
    # closed form: every slab reserves pad_vregs trailing vregs, so real
    # elements per slab <= slab_e - reserve regardless of fill pattern
    reserve = (n_bins + 1 + 8) * LANES  # +1: the virtual hub bin's run
    pad_vregs = min(-(-reserve // (8 * LANES)), SR // 16)
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

    _T("stage3")
    # ---- bins + heavy (hub) classification ------------------------------
    in_cnt = np.bincount(dsts, minlength=v)
    assert PR % BR == 0, "part_rows must be a multiple of bin_rows"
    layers = PR // BR
    # heavy threshold: with >= 2 layers, cap non-hub dsts at (layers-1)*BR
    # elements so the end-at-target placement is always per-dst feasible
    # (chunks fill layers top-down and the partial chunk never reaches
    # layer 0); everything bigger rides the dense hub path.
    heavy_eff = min(
        cfg.heavy_dst, (layers - 1) * BR if layers >= 2 else layers * PR
    )

    # slab of each edge + within-slab bin grouping (pi1)
    slab_of_edge = slot_of_edge // slab_e
    # per-slab order: sort slots by (bin, dst). Heavy destinations go to a
    # VIRTUAL HUB BIN (bin == n_bins) that sorts after all real bins: each
    # slab packs its hub elements dst-sorted at the slab end, so assembly
    # copies DENSE hub chunks instead of one ~2%-fill window per (dst,
    # slab). Hub parts reduce like sorted parts but write compact per-part
    # dst slots; a final O(n_hub) scatter-add folds them into y. This is
    # the TPU analog of the reference's high-degree kernel tier
    # (per_v_transform_reduce_incoming_outgoing_e.cuh:84-560).
    bin_of_edge = np.where(
        in_cnt[dsts] >= heavy_eff, n_bins, dsts // bin_dsts
    )

    _T("stage4")
    # build per-slab permutations + run table (one vectorized global sort:
    # edges ordered by (slab, bin, dst); runs start at row boundaries)
    pi1 = np.full(n_slabs * slab_e, -1, dtype=np.int64)  # slot -> new pos
    gorder = _argsort_u64(
        (
            (slab_of_edge * (n_bins + 1) + bin_of_edge).astype(np.uint64)
            << np.uint64(26)
        )
        + dsts.astype(np.uint64)
    )
    sb_key = slab_of_edge[gorder] * (n_bins + 1) + bin_of_edge[gorder]
    rank_in_run = _group_ranks(sb_key)
    run_first = np.ones(len(sb_key), dtype=bool)
    run_first[1:] = sb_key[1:] != sb_key[:-1]
    run_starts_idx = np.nonzero(run_first)[0]
    run_lens = np.diff(np.append(run_starts_idx, len(sb_key)))
    run_slab = slab_of_edge[gorder][run_starts_idx]
    run_bin = bin_of_edge[gorder][run_starts_idx]
    # aligned element cursor per run, reset per slab
    aligned = -(-run_lens // LANES) * LANES
    run_cur = np.zeros(len(run_lens), dtype=np.int64)
    sfirst = np.ones(len(run_lens), dtype=bool)
    sfirst[1:] = run_slab[1:] != run_slab[:-1]
    csum = np.concatenate([[0], np.cumsum(aligned)[:-1]])
    slab_base = np.zeros(len(run_lens), dtype=np.int64)
    slab_base[sfirst] = csum[sfirst]
    slab_base = np.maximum.accumulate(slab_base)
    run_cur = csum - slab_base
    if len(run_cur) and (run_cur + run_lens > slab_e).any():
        raise ValueError("slab overflow (padding too tight)")
    run_id_of = np.cumsum(run_first) - 1
    pos_in_slab = run_cur[run_id_of] + rank_in_run
    pi1[slot_of_edge[gorder]] = slab_of_edge[gorder] * slab_e + pos_in_slab
    run_info = [
        (int(run_slab[i]), int(run_bin[i]), int(run_cur[i] // LANES), int(run_lens[i]))
        for i in range(len(run_lens))
    ]
    run_elems = np.split(gorder, run_starts_idx[1:])
    # park padding slots in the remaining positions (vectorized per slab)
    neg = pi1 < 0
    used = np.zeros(n_slabs * slab_e, dtype=bool)
    used[pi1[~neg]] = True
    free_slots = np.nonzero(neg)[0]
    empty_pos = np.nonzero(~used)[0]
    # both lists are slab-ordered and have equal per-slab counts
    pi1[free_slots] = empty_pos[: len(free_slots)]

    _T("stage5")
    # ---- parts ----------------------------------------------------------
    # real bins -> sorted parts; the hub bin -> hub parts (sorted-mode
    # reduction into compact per-part dst slots)
    parts = []  # dicts
    runs_by_bin = {}
    for ridx, (s, bi, r0, n_el) in enumerate(run_info):
        runs_by_bin.setdefault(bi, []).append(ridx)

    def piece_rows(sel, r0):
        """Chunk-row extent a piece occupies in the part block."""
        if not len(sel):
            return 0
        pos = sel + r0 * LANES
        c0 = pos.min() // (CH * LANES)
        c1 = pos.max() // (CH * LANES) + 1
        return int(c1 - c0) * CH

    def pack_parts(pieces_list, mode, bi, d=None, row_budget=None):
        """Greedy row-budgeted packing. Pieces split at CHUNK boundaries
        to fill every part to the budget: skewed bins (degree-descending
        renumbering concentrates in-degree in the low-id bins) produce
        ~500-row runs that would otherwise strand ~20% of every part's
        rows (the kernel pays full PR rows of VPU work per part, so part
        fill IS the cost model). split_pieces=False (the auto ladder's
        last rung) restores the pre-split close-early behavior — its
        accidental slack is what the mode-0 lane balance needs on graphs
        where dense packing overflows it."""
        out = []
        budget = row_budget if row_budget is not None else PR
        cur_pieces, cur_rows = [], 0
        for ridx, sel in pieces_list:
            s_, _, r0, _ = run_info[ridx]
            sl = sel
            need = piece_rows(sl, r0)
            while cur_rows + need > budget:
                room = budget - cur_rows
                if (
                    (split_pieces or need > budget)
                    and room >= CH
                    and len(sl)
                ):
                    # chunk-aligned prefix fills the current part
                    pos = sl + r0 * LANES
                    c0 = pos.min() // (CH * LANES)
                    cut = c0 + room // CH
                    in_pre = pos // (CH * LANES) < cut
                    pre = sl[in_pre]
                    if len(pre):
                        cur_pieces.append((ridx, pre))
                        cur_rows += piece_rows(pre, r0)
                    sl = sl[~in_pre]
                    need = piece_rows(sl, r0)
                if cur_pieces:
                    out.append(
                        dict(mode=mode, dst=d, pieces=cur_pieces, bin=bi)
                    )
                    cur_pieces, cur_rows = [], 0
                elif need > budget:  # single chunk span beyond budget
                    raise ValueError("piece chunk exceeds part budget")
            if len(sl):
                cur_pieces.append((ridx, sl))
                cur_rows += need
        if cur_pieces:
            out.append(dict(mode=mode, dst=d, pieces=cur_pieces, bin=bi))
        return out

    # fill margin: the end-at-target band packing (and the mode-0
    # first-fit fallback) needs some per-lane slack; bin bands are tiny
    # (degree-decorrelating transposed slot map), so 15/16 holds
    sorted_budget = max((PR * budget_num) // 16, CH)
    for bi in range(n_bins):
        ridxs = runs_by_bin.get(bi, [])
        norm_chunks = [
            (ridx, np.arange(run_info[ridx][3], dtype=np.int64))
            for ridx in ridxs
        ]
        bin_parts = pack_parts(norm_chunks, 0, bi, row_budget=sorted_budget)
        if not bin_parts:
            bin_parts.append(dict(mode=1, dst=bi * bin_dsts, pieces=[], bin=bi))
        parts.extend(bin_parts)

    # hub parts: pack the per-slab hub runs densely under the row budget.
    # A dst whose elements in one part exceed one pseudo-slot's capacity
    # gets MULTIPLE compact pseudo-slots (stage 7): the final scatter-add
    # merges duplicates, so no per-dst part splitting is needed and hub
    # parts stay dense. Capping slots at BR elements keeps every hub band
    # a single chunk (<= one layer tall) — always placeable end-at-target.
    dst_cap = BR if layers >= 2 else layers * PR
    hub_pieces = []
    for ridx in runs_by_bin.get(n_bins, []):
        n_el = int(run_info[ridx][3])
        hub_pieces.append((ridx, np.arange(n_el, dtype=np.int64)))
    # hub parts pack to the FULL block: free-target placement stacks
    # bands contiguously (splitting on lane overflow), so any element
    # count <= PR*128 places
    hub_parts = pack_parts(hub_pieces, 0, None, row_budget=PR)
    for j, prt in enumerate(hub_parts):
        prt["hub"] = True
        prt["bin"] = n_bins + j  # its own out block
    parts.extend(hub_parts)
    n_out_blocks = n_bins + len(hub_parts)

    n_parts = len(parts)

    _T("stage6")
    # ---- assembly chunks + per-part blocks ------------------------------
    # NOTE a sorted/simple part copies WHOLE chunk-aligned windows of its
    # runs; elements of the other class inside the window are routed to
    # trash (sorted parts) or masked (simple parts) via a weight... simple
    # parts SUM the block, so foreign elements must be zeroed -> simple
    # parts get a mask block encoded in ext space. To keep v1 simple,
    # assembly copies per-part PIECES at chunk granularity where pieces of
    # different parts never share a chunk: we re-pack runs so that heavy
    # dst elements occupy their own chunk-aligned ranges inside the run.
    # This is guaranteed by the within-run (bin, dst) sort: a heavy dst's
    # elements are contiguous inside the run; chunk sharing happens only at
    # the two boundary chunks, handled by trash routing / masking below.
    chunk_src, chunk_dst = [], []
    part_meta = []
    route_jobs = []  # (part_id, perm, perm2) for sorted parts
    for pid, prt in enumerate(parts):
        my_chunks = []
        # element -> (part position) map
        elem_ids = []
        pos_in_part = []
        cur_row = 0
        for ridx, sel in prt["pieces"]:
            s, bi, r0, n_el = run_info[ridx]
            eids = run_elems[ridx]
            # positions of selected elements within the run
            el0 = r0 * LANES  # run start element within slab
            pos = sel + el0  # element pos within slab
            c0 = (pos.min() // (CH * LANES)) if len(pos) else 0
            c1 = (pos.max() // (CH * LANES) + 1) if len(pos) else 0
            for c in range(int(c0), int(c1)):
                src_blk = s * (SR // CH) + c
                my_chunks.append(src_blk)
            # positions within the part block
            base_el = pos - c0 * CH * LANES
            pos_in_part.append(base_el + cur_row * LANES)
            elem_ids.append(eids[sel])
            cur_row += int(c1 - c0) * CH
        if cur_row > PR:
            raise ValueError("part overflow")
        _FILL_STATS.append(
            (cur_row, sum(len(x) for x in elem_ids), len(prt["pieces"]))
        )
        chunk_src.extend(my_chunks)
        part_meta.append(
            dict(
                prt=prt,
                n_chunks=len(my_chunks),
                elem=np.concatenate(elem_ids) if elem_ids else np.zeros(0, np.int64),
                pos=np.concatenate(pos_in_part) if pos_in_part else np.zeros(0, np.int64),
            )
        )

    # fix chunk_dst: consecutive chunks land consecutively in each part blk
    chunk_dst = []
    for pid, pm in enumerate(part_meta):
        for c in range(pm["n_chunks"]):
            chunk_dst.append(pid * (PR // CH) + c)
    n_steps = len(chunk_src)
    chunk_off = np.zeros(len(part_meta) + 1, np.int32)
    np.cumsum([pm["n_chunks"] for pm in part_meta], out=chunk_off[1:])

    _T("stage7")
    # ---- per-part routing (pi2), flags, layered output routing ----------
    route_lo_list = [np.zeros((PR, LANES), np.int32)]  # dummy block 0
    route_hi_list = [np.zeros((PR, LANES), np.int32)]
    route3_lo_list = [np.zeros((PR, LANES), np.int32)]  # mode-0 parts only
    route3_hi_list = [np.zeros((PR, LANES), np.int32)]
    route_blk = np.zeros(n_parts, np.int32)
    route3_blk = np.zeros(n_parts, np.int32)
    mode_np = np.zeros(n_parts, np.int32)
    simple_pos = np.zeros(n_parts, np.int32)
    bin_of_part = np.zeros(n_parts, np.int32)
    first_flag = np.zeros(n_parts, np.int32)
    seen_bins = set()
    hub_dst_list = []  # global dst id per hub slot
    hub_pos_list = []  # flat slot position within the hub out region

    for pid, pm in enumerate(part_meta):
        prt = pm["prt"]
        bi = prt["bin"]
        bin_of_part[pid] = bi
        if bi not in seen_bins:
            first_flag[pid] = 1
            seen_bins.add(bi)
        if prt["mode"] == 1:
            mode_np[pid] = 1
            d_loc = int(prt["dst"]) - bi * bin_dsts
            simple_pos[pid] = (d_loc % BR) * LANES + d_loc // BR
            # simple parts: sum of w-expanded values of OWN elements; but
            # the block may contain foreign elements at boundary chunks.
            # Mask via route2: simple parts use a MASK block stored in the
            # route arrays (route_lo as 0/1 mask) — reuse route_blk slot.
            mask = np.zeros((PR, LANES), np.float32)
            pp = pm["pos"]
            mask[pp // LANES, pp % LANES] = 1.0
            route_blk[pid] = len(route_lo_list)
            route_lo_list.append(mask.view(np.int32).copy())
            route_hi_list.append(np.zeros((PR, LANES), np.int32))
            continue
        # sorted part: first try the end-at-target placement (mode 2 —
        # group ends land at their layered slots; 13-stage lane fix), then
        # fall back to first-fit lane balancing + placement Benes (mode 0).
        eids = pm["elem"]
        pos = pm["pos"]  # input positions in part block
        d = dsts[eids]
        eat = None
        if prt.get("hub"):
            # free-target placement first: bands stack contiguously (no
            # fragmentation), out cells chosen after placement
            free = _hub_free_placement(d, pos, PR, BR)
            if free is not None:
                pos_ord, tgt, first_mask, lanefix, seg_dst, seg_cell = free
                hub_dst_list.append(seg_dst)
                hub_pos_list.append((bi - n_bins) * (BR * LANES) + seg_cell)
                eat = (pos_ord, tgt, first_mask, lanefix)
        if eat is None and prt.get("hub"):
            # fixed-slot fallback: compact per-part dst slots; the final
            # scatter-add maps them back to global y positions. A dst with
            # more than dst_cap elements here spans several pseudo-slots
            # (scatter-add merges the duplicate hub_dsts entries) so one
            # mega-hub never forces a part split and the layer capacity
            # holds per slot.
            od0 = np.argsort(d, kind="stable")
            rank0 = _group_ranks(d[od0])
            pseudo = np.zeros(len(d), np.int64)
            pseudo[od0] = rank0 // dst_cap
            assert pseudo.max(initial=0) < 512
            key = d * 512 + pseudo
            uniq, inv = np.unique(key, return_inverse=True)
            if len(uniq) > BR * LANES:
                raise ValueError("hub part has too many distinct dsts")
            # spread the compact slots across rows (r_d = slot % BR): with
            # slot = index the end-at-target rows would all collapse to
            # r_d 0..n/128, stranding every row past n//128 (see the bin
            # transpose note above)
            ar = np.arange(len(uniq), dtype=np.int64)
            slot = (ar % BR) * LANES + ar // BR
            d_loc = slot[inv]
            hub_dst_list.append((uniq // 512).astype(np.int64))
            hub_pos_list.append((bi - n_bins) * (BR * LANES) + slot)
        elif not prt.get("hub"):
            # TRANSPOSED within-bin slot map: dst d sits at (row d_loc %
            # BR, lane d_loc // BR). Degree-descending renumbering makes
            # in-degree fall with id, so the natural map (row = d_loc //
            # 128) concentrates the heavy dsts' end slots in a few rows
            # and starves the end-at-target packing; the transpose spreads
            # every 512th id across each row, decorrelating degree from
            # row. The kernel is unchanged — sorted_spmv un-transposes the
            # dense bins with one XLA reshape+swapaxes per pass.
            d_loc = d - bi * bin_dsts
            d_loc = (d_loc % BR) * LANES + d_loc // BR
        if eat is None:
            assert (
                int(d_loc.max(initial=0)) < (1 << 26)
                and PR * LANES <= (1 << 20)
            )
            eat = _try_eat_placement(d_loc, pos, PR, BR)
        if eat is not None:
            pos_ord, tgt, first_mask, lanefix = eat
            mode_np[pid] = 2
            perm = np.arange(PR * LANES, dtype=np.int64)
            used_t = np.zeros(PR * LANES, dtype=bool)
            used_t[tgt] = True
            used_i = np.zeros(PR * LANES, dtype=bool)
            used_i[pos_ord] = True
            perm[pos_ord] = tgt
            perm[np.nonzero(~used_i)[0]] = np.nonzero(~used_t)[0]
            flags = np.ones(PR * LANES, dtype=bool)
            flags[tgt] = False
            flags[tgt[first_mask]] = True
            real = np.zeros(PR * LANES, dtype=bool)
            real[tgt] = True
            pm["flags"] = flags
            pm["real"] = real
            pm["lanefix"] = lanefix
            route_jobs.append((pid, perm, None))
            route_blk[pid] = len(route_lo_list)
            route_lo_list.append(None)  # filled after routing
            route_hi_list.append(None)
            continue
        od = _argsort_u64((d_loc.astype(np.uint64) << np.uint64(20)) + pos)
        d_ord, pos_ord = d_loc[od], pos[od]
        rank = _group_ranks(d_ord)
        chunk_id = rank // PR
        gkey = d_ord * 512 + chunk_id
        guniq, gstart, gcount = np.unique(
            gkey, return_index=True, return_counts=True
        )
        # first-fit-decreasing, vectorized by delta round: at round delta
        # every still-unplaced group tries lane (base + delta) % 128; the
        # groups that fit under the per-lane capacity (prefix-cumsum per
        # lane, big groups first) are placed together.
        n_grp = len(guniq)
        grp_lane = np.zeros(n_grp, dtype=np.int64)
        grp_delta = np.zeros(n_grp, dtype=np.int64)
        grp_row0 = np.zeros(n_grp, dtype=np.int64)
        lane_load = np.zeros(LANES, dtype=np.int64)
        base_all = (guniq // 512) % LANES
        remaining = np.argsort(-gcount, kind="stable")
        # big groups (> PR/4, incl. full-lane chunks of heavy dsts) go
        # LPT-first onto the emptiest lane — the hashed first-fit below
        # cannot place a full-lane group once every lane is partly loaded
        import heapq

        big = remaining[gcount[remaining] > PR // 4]
        if len(big):
            heap = [(0, l) for l in range(LANES)]
            heapq.heapify(heap)
            for gi in big:
                c = int(gcount[gi])
                load, l = heapq.heappop(heap)
                if load + c > PR:
                    raise ValueError(
                        "sorted part cannot be lane-balanced: big group "
                        f"c={c} load={load} PR={PR} n_big={len(big)} "
                        f"n_grp={n_grp} elems={int(gcount.sum())}"
                    )
                grp_lane[gi] = l
                grp_row0[gi] = load
                heapq.heappush(heap, (load + c, l))
            while heap:
                load, l = heapq.heappop(heap)
                lane_load[l] = load
            remaining = remaining[gcount[remaining] <= PR // 4]
        for delta in range(LANES):
            if not len(remaining):
                break
            ln = (base_all[remaining] + delta) % LANES
            o_ = np.argsort(ln, kind="stable")  # keeps size-desc within lane
            rs, lns = remaining[o_], ln[o_]
            csum = np.cumsum(gcount[rs]) - gcount[rs]
            lfirst = np.ones(len(rs), dtype=bool)
            lfirst[1:] = lns[1:] != lns[:-1]
            lbase = np.where(lfirst, csum, 0)
            lbase = np.maximum.accumulate(lbase)
            off = csum - lbase + lane_load[lns]
            fits = off + gcount[rs] <= PR
            # only a PREFIX per lane may place (holes break the cumsum);
            # mask everything after the first non-fit in each lane
            bad = ~fits
            # prefix-valid: fits AND no earlier non-fit in same lane
            run_bad = np.maximum.accumulate(
                np.where(bad, np.arange(1, len(rs) + 1), 0)
            )
            lane_start = np.maximum.accumulate(
                np.where(lfirst, np.arange(len(rs)), 0)
            )
            ok = fits & (run_bad <= lane_start)
            placed = rs[ok]
            grp_lane[placed] = lns[ok]
            grp_delta[placed] = delta
            grp_row0[placed] = off[ok]
            np.add.at(lane_load, lns[ok], gcount[placed])
            remaining = rs[~ok]
        if len(remaining):
            # exact tail pass: the vectorized delta rounds only place a
            # PREFIX per lane per round, so on ~100%-full parts (hub
            # parts pack dense; budgets never applied to them) a blocked
            # big group can shadow small ones for all 128 rounds. Place
            # the leftovers one-by-one, largest first, into the emptiest
            # lane — this rescued every observed scale-23 mode-0 failure
            # (92 groups <= 39 elems each; docs/PERFORMANCE.md round 4).
            for gi in remaining[np.argsort(-gcount[remaining])]:
                c = int(gcount[gi])
                l = int(np.argmin(lane_load))
                if lane_load[l] + c > PR:
                    raise ValueError(
                        "sorted part cannot be lane-balanced: tail group "
                        f"c={c} min lane_load={int(lane_load[l])} PR={PR} "
                        f"n_grp={n_grp} elems={int(gcount.sum())}"
                    )
                grp_lane[gi] = l
                grp_row0[gi] = lane_load[l]
                lane_load[l] += c
        # per-element targets
        ggid = np.searchsorted(guniq, gkey)
        within = _group_ranks(gkey)  # rank within (dst, chunk) group
        lane_e = grp_lane[ggid]
        row_e = grp_row0[ggid] + within
        tgt = row_e * LANES + lane_e
        perm = np.arange(PR * LANES, dtype=np.int64)
        inpos = pos_ord
        used_t = np.zeros(PR * LANES, dtype=bool)
        used_t[tgt] = True
        used_i = np.zeros(PR * LANES, dtype=bool)
        used_i[inpos] = True
        free_t = np.nonzero(~used_t)[0]
        free_i = np.nonzero(~used_i)[0]
        perm[inpos] = tgt
        perm[free_i] = free_t
        # segment flags (bit5): first element of each group; trash
        # positions are their own segments. real mask (bit6): group
        # elements only — the kernel keeps group-END totals where
        # real & end, everything else becomes the reduce identity before
        # the route3 benes, so unused layer slots contribute nothing.
        flags = np.ones(PR * LANES, dtype=bool)
        flags[tgt] = False
        flags[tgt[within == 0]] = True
        real = np.zeros(PR * LANES, dtype=bool)
        real[tgt] = True
        pm["flags"] = flags
        pm["real"] = real
        # route3: group-end totals -> layered dst positions
        # (flat target = chunk_id * BR*128 + d_loc; layers merge in-kernel)
        end_flat = (grp_row0 + gcount - 1) * LANES + grp_lane
        k_of = guniq % 512
        d_of = guniq // 512
        if (k_of >= layers).any():
            raise ValueError("chunk_id exceeds layer capacity")
        tgt2 = k_of * (BR * LANES) + d_of
        perm2 = np.arange(PR * LANES, dtype=np.int64)
        used_t2 = np.zeros(PR * LANES, dtype=bool)
        used_t2[tgt2] = True
        used_i2 = np.zeros(PR * LANES, dtype=bool)
        used_i2[end_flat] = True
        perm2[end_flat] = tgt2
        perm2[np.nonzero(~used_i2)[0]] = np.nonzero(~used_t2)[0]
        route_jobs.append((pid, perm, perm2))
        route_blk[pid] = len(route_lo_list)
        route_lo_list.append(None)  # filled after routing
        route_hi_list.append(None)
        route3_blk[pid] = len(route3_lo_list)
        route3_lo_list.append(None)
        route3_hi_list.append(None)

    _T("stage8")
    # run benes routing (parallel, C++ releases the GIL)
    def _route(job):
        pid, perm, perm2 = job
        packed = pack_bits(route_benes(perm))  # (1 or 2, n)
        # eat mode reserves hi bits 8..20 for the lane fix: route stages
        # past 32 may only use hi bits 0..7
        assert _n_stages(PR * LANES) <= 40, "part too large for 2 route words"
        flags = part_meta[pid]["flags"]
        real = part_meta[pid]["real"]
        lanefix = part_meta[pid].get("lanefix")
        lo = packed[0].reshape(PR, LANES)
        hi = packed[1] if packed.shape[0] > 1 else np.zeros_like(packed[0])
        hi = (
            hi.astype(np.uint32)
            | (flags.astype(np.uint32) << 5)
            | (real.astype(np.uint32) << 6)
        ).astype(np.int32)
        hi = hi.reshape(PR, LANES)
        if perm2 is None:  # mode 2: lane-fix bits ride hi[8:21]
            hi = (hi.astype(np.uint32) | (lanefix.astype(np.uint32) << 8)).astype(
                np.int32
            )
            return pid, lo, hi, None, None
        packed2 = pack_bits(route_benes(perm2))
        lo3 = packed2[0].reshape(PR, LANES)
        hi3 = (
            packed2[1].reshape(PR, LANES)
            if packed2.shape[0] > 1
            else np.zeros((PR, LANES), np.int32)
        )
        return pid, lo, hi, lo3, hi3

    with ThreadPoolExecutor(max_workers=8) as tp:
        for pid, lo, hi, lo3, hi3 in tp.map(_route, route_jobs):
            route_lo_list[route_blk[pid]] = lo
            route_hi_list[route_blk[pid]] = hi
            if lo3 is not None:
                route3_lo_list[route3_blk[pid]] = lo3
                route3_hi_list[route3_blk[pid]] = hi3

    route_lo_np = np.concatenate(
        [b.reshape(PR, LANES) for b in route_lo_list], axis=0
    )
    route_hi_np = np.concatenate(
        [b.reshape(PR, LANES) for b in route_hi_list], axis=0
    )
    route3_lo_np = np.concatenate(
        [b.reshape(PR, LANES) for b in route3_lo_list], axis=0
    )
    route3_hi_np = np.concatenate(
        [b.reshape(PR, LANES) for b in route3_hi_list], axis=0
    )

    _T("stage9")
    # K-B routing per slab
    r1_lo = np.zeros((slot_rows, LANES), np.int32)
    r1_hi = np.zeros((slot_rows, LANES), np.int32)

    def _route1(s):
        lo, hi = s * slab_e, (s + 1) * slab_e
        perm = pi1[lo:hi] - lo
        packed = pack_bits(route_benes(perm))
        return s, packed

    with ThreadPoolExecutor(max_workers=8) as tp:
        for s, packed in tp.map(_route1, range(n_slabs)):
            r1_lo[s * SR : (s + 1) * SR] = packed[0].reshape(SR, LANES)
            if packed.shape[0] > 1:
                r1_hi[s * SR : (s + 1) * SR] = packed[1].reshape(SR, LANES)

    _T("stage10")
    lay = SortedLayout(
        prow=jnp.asarray(prow_np),
        idx=jnp.asarray(idx_np),
        w=jnp.asarray(w_np),
        hub_ids=jnp.asarray(
            hub_ids.astype(np.int32)
            if n_hub_rows
            else np.zeros(1, np.int32)
        ),
        route1_lo=jnp.asarray(r1_lo),
        route1_hi=jnp.asarray(r1_hi),
        chunk_src=jnp.asarray(np.asarray(chunk_src, np.int32)),
        chunk_dst=jnp.asarray(np.asarray(chunk_dst, np.int32)),
        chunk_off=jnp.asarray(chunk_off),
        route2_lo=jnp.asarray(route_lo_np),
        route2_hi=jnp.asarray(route_hi_np),
        route3_lo=jnp.asarray(route3_lo_np),
        route3_hi=jnp.asarray(route3_hi_np),
        route_blk=jnp.asarray(route_blk),
        route3_blk=jnp.asarray(route3_blk),
        bin_of_part=jnp.asarray(bin_of_part),
        first_flag=jnp.asarray(first_flag),
        mode=jnp.asarray(mode_np),
        simple_pos=jnp.asarray(simple_pos),
        hub_dsts=jnp.asarray(
            np.concatenate(hub_dst_list).astype(np.int32)
            if hub_dst_list
            else np.zeros(0, np.int32)
        ),
        hub_pos=jnp.asarray(
            np.concatenate(hub_pos_list).astype(np.int32)
            if hub_pos_list
            else np.zeros(0, np.int32)
        ),
        cfg=cfg,
        n_slabs=n_slabs,
        n_parts=n_parts,
        n_bins=n_bins,
        n_steps=n_steps,
        x_rows=x_rows,
        num_vertices=v,
        num_edges=e,
        num_src=vs,
        n_out_blocks=n_out_blocks,
    )
    if weight_variants is not None:
        return lay, [jnp.asarray(a) for a in w_sibs]
    return lay


def _n_stages(n):
    k = n.bit_length() - 1
    return 2 * k - 1


def _argsort_u64(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of nonnegative composite keys: native LSD radix
    (graph_build.cpp ct_radix_argsort_u64) with a numpy fallback. The
    builder's np.lexsort calls collapse into these single-key sorts."""
    from ... import native

    keys = np.asarray(keys)
    out = native.radix_argsort(keys.astype(np.uint64, copy=False))
    if out is not None:
        return out
    return np.argsort(keys, kind="stable")


def _group_ranks(sorted_keys: np.ndarray) -> np.ndarray:
    """Rank within each group of equal consecutive keys."""
    n = len(sorted_keys)
    if not n:
        return np.zeros(0, np.int64)
    first = np.ones(n, dtype=bool)
    first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    ar = np.arange(n, dtype=np.int64)
    start = np.maximum.accumulate(np.where(first, ar, 0))
    return ar - start


def _group_max(sorted_keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Max of vals per group, broadcast back (keys sorted)."""
    n = len(sorted_keys)
    out = np.zeros(n, dtype=vals.dtype)
    if not n:
        return out
    first = np.ones(n, dtype=bool)
    first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    gid = np.cumsum(first) - 1
    gmax = np.zeros(gid[-1] + 1, dtype=vals.dtype)
    np.maximum.at(gmax, gid, vals)
    return gmax[gid]


_EAT_STATS = {
    "no_layers": 0, "chunk_overflow": 0, "layer0_underflow": 0,
    "lane_exhausted": 0, "ok": 0,
}
_FILL_STATS: list = []  # (rows_copied, real_elems, n_pieces) per part


def _hub_free_placement(d_of_elem, pos, PR, BR):
    """Free-target end-at-target placement for hub parts.

    Hub parts reduce into COMPACT per-part out slots (the final scatter-add
    maps them to global dsts), so the out cell of each group is free — the
    dual of the bin parts' fixed (dst % BR, dst // BR) cells. Bands
    therefore stack contiguously in lanes (LPT tallest-first, splitting a
    band across lanes on overflow), packing to ~100% with zero
    fragmentation; each segment's total is extracted at its end row e and
    lane-fixed to a free cell (e % BR, lane') of the out block.

    Returns (pos_ord, tgt, first_mask, lanefix, seg_dst, seg_cell) or None
    when a row-class runs out of lanes (pathological equal-height stacks;
    caller falls back to the fixed-slot path)."""
    import heapq

    n = len(d_of_elem)
    if n == 0 or n > PR * LANES:
        return None
    od = _argsort_u64((d_of_elem.astype(np.uint64) << np.uint64(24)) + pos)
    d_ord, pos_ord = d_of_elem[od], pos[od]
    uniq, count = np.unique(d_ord, return_counts=True)
    starts = np.searchsorted(d_ord, uniq)
    order = np.argsort(-count, kind="stable")
    heap = [(0, l) for l in range(LANES)]
    heapq.heapify(heap)
    seg_lists = [[] for _ in range(len(uniq))]  # (row0, height, lane)
    for ui in order.tolist():
        m = int(count[ui])
        while m > 0:
            load, l = heapq.heappop(heap)
            free = PR - load
            if free <= 0:
                return None  # capacity exceeded (caller packed too much)
            take = min(m, free)
            seg_lists[ui].append((load, take, l))
            heapq.heappush(heap, (load + take, l))
            m -= take
    tgt = np.empty(n, np.int64)
    first_mask = np.zeros(n, bool)
    seg_dst, seg_end_row, seg_lane = [], [], []
    for ui in range(len(uniq)):
        r = int(starts[ui])
        for row0, h, l in seg_lists[ui]:
            rows = row0 + np.arange(h, dtype=np.int64)
            tgt[r : r + h] = rows * LANES + l
            first_mask[r] = True
            seg_dst.append(int(uniq[ui]))
            seg_end_row.append(row0 + h - 1)
            seg_lane.append(l)
            r += h
    # out cells: row-class e % BR forced by the layer merge; lane free.
    seg_end_row = np.asarray(seg_end_row, np.int64)
    seg_lane = np.asarray(seg_lane, np.int64)
    rc = seg_end_row % BR
    used = np.zeros((BR, LANES), bool)
    cell_lane = np.full(len(rc), -1, np.int64)
    # first pass: keep own lane when free (lane fix near-identity)
    for i in range(len(rc)):
        if not used[rc[i], seg_lane[i]]:
            used[rc[i], seg_lane[i]] = True
            cell_lane[i] = seg_lane[i]
    for i in np.nonzero(cell_lane < 0)[0]:
        free = np.nonzero(~used[rc[i]])[0]
        if not len(free):
            return None  # row-class exhausted -> fixed-slot fallback
        used[rc[i], free[0]] = True
        cell_lane[i] = free[0]
    # per-row lane fix: at row e move lane seg_lane -> cell_lane
    urows, row_gid = np.unique(seg_end_row, return_inverse=True)
    n_rows = len(urows)
    perms = np.full((n_rows, LANES), -1, np.int64)
    perms[row_gid, seg_lane] = cell_lane
    usedp = np.zeros((n_rows, LANES), bool)
    usedp[row_gid, cell_lane] = True
    neg = perms < 0
    n_free = neg.sum(axis=1)
    free_src = np.argsort(~neg, axis=1, kind="stable")
    free_tgt = np.argsort(usedp, axis=1, kind="stable")
    mfill = np.arange(LANES)[None, :] < n_free[:, None]
    rows_idx = np.nonzero(mfill)[0]
    perms[rows_idx, free_src[mfill]] = free_tgt[mfill]
    lanefix = np.zeros((PR, LANES), np.int32)
    nonid = np.nonzero((perms != np.arange(LANES)[None, :]).any(axis=1))[0]
    if len(nonid):
        from ... import native

        words = native.lane_fix_words(perms[nonid])
        if words is None:
            words = np.zeros((len(nonid), LANES), np.int32)
            for j, ri in enumerate(nonid):
                bits = route_benes(perms[ri])
                acc = np.zeros(LANES, np.uint32)
                for s in range(bits.shape[0]):
                    acc |= bits[s].astype(np.uint32) << s
                words[j] = acc.astype(np.int32)
        lanefix[urows[nonid]] = words
    seg_cell = rc * LANES + cell_lane
    _EAT_STATS["hub_free_ok"] = _EAT_STATS.get("hub_free_ok", 0) + 1
    return (
        pos_ord,
        tgt,
        first_mask,
        lanefix,
        np.asarray(seg_dst, np.int64),
        seg_cell,
    )


def _try_eat_placement(d_loc, pos, PR, BR):
    """End-at-target placement for one sorted part.

    Places each (dst, chunk) group so that its LAST element sits exactly at
    row (layer * BR + d_loc // 128) — the layered output slot the old path
    reached through a second full Benes (route3). The group's lane is free:
    a 13-stage per-row lane Benes (over the 128 lanes, bits packed at
    route2_hi[8:21]) fixes lanes after the segmented scan, so the 35-stage
    placement Benes and its two (PR,128) i32 streams disappear.

    Chunks are BR-sized (one layer gap each), assigned to layers from the
    top down so partial chunks never land at layer 0 with too few rows
    below them. Greedy lane choice: the target lane when free (keeps the
    lane fix near-identity), else the emptiest lane (max floor).

    Returns (pos_sorted, tgt, first_mask, lanefix_words) or None when the
    part cannot be packed this way (caller falls back to the route3 path).
    """
    L = PR // BR
    n = len(d_loc)
    if L < 2 or n == 0:
        _EAT_STATS["no_layers"] += 1
        return None
    od = _argsort_u64((d_loc.astype(np.uint64) << np.uint64(20)) + pos)
    d_ord, pos_ord = d_loc[od], pos[od]
    rank = _group_ranks(d_ord)
    # per-dst bands: a dst's m elements form ONE contiguous m-row run in a
    # lane, topped by full BR-sized chunks ending exactly at layer slots
    # k*BR + r_d and a partial chunk at the bottom layer
    uniq, ucount = np.unique(d_ord, return_counts=True)
    m_tot = ucount.astype(np.int64)
    n_c = -(-m_tot // BR)
    if (n_c > L).any():
        _EAT_STATS["chunk_overflow"] += 1
        return None
    m_p = m_tot - (n_c - 1) * BR  # bottom (partial) chunk size
    r_d = (uniq // LANES).astype(np.int64)
    tl = (uniq % LANES).astype(np.int64)
    n_dst = len(uniq)

    # lane-by-lane best-fit: at floor f, want a band ending at the layer
    # slot closest below (r_want = (f-1) mod BR); buckets keyed by r_d,
    # tallest-first within a bucket; a 512-bit mask finds the nearest
    # nonempty bucket in O(1) big-int ops.
    order = _argsort_u64(r_d * (1 << 20) + ((1 << 19) - m_tot))
    order_l = order.tolist()
    rd_l = r_d.tolist()
    mt_l = m_tot.tolist()
    nc_l = n_c.tolist()
    mp_l = m_p.tolist()

    def _attempt(n_greedy):
        """Greedy pack into lanes [0, n_greedy), then split leftovers over
        every lane's remaining floor. Reserved lanes (>= n_greedy) keep
        floor PR, so each offers L fresh slots per row class — the retry
        ladder reserves lanes when dense packing strands row classes whose
        layer slots sit above every packed floor."""
        buckets = [[] for _ in range(BR)]
        for di in order_l:
            buckets[rd_l[di]].append(di)
        bmask = 0
        for b in range(BR):
            if buckets[b]:
                bmask |= 1 << b
        heads = [0] * BR  # pop pointer per bucket (tallest first)
        lane_of = np.zeros(n_dst, np.int64)
        e_top_of = np.zeros(n_dst, np.int64)
        placed_mask = np.zeros(n_dst, bool)
        lane_floor = np.full(LANES, PR, np.int64)
        remaining = n_dst
        for l in range(n_greedy):
            if not remaining:
                break
            floor = PR
            while remaining and floor > 0:
                r_want = (floor - 1) % BR
                below = bmask & ((1 << (r_want + 1)) - 1)
                b = (
                    (below.bit_length() - 1)
                    if below
                    else (bmask.bit_length() - 1)
                )
                placed = False
                while b >= 0:
                    k_max = (floor - 1 - b) // BR
                    if k_max < 0:
                        break  # floor below every slot of any bucket <= b
                    if k_max > L - 1:
                        k_max = L - 1
                    lst = buckets[b]
                    hd = heads[b]
                    pick = -1
                    for i in range(hd, len(lst)):
                        di = lst[i]
                        k_min = k_max - nc_l[di] + 1
                        if k_min < 0:
                            continue  # too many chunks for the layers left
                        if k_min == 0 and mp_l[di] > b + 1:
                            continue  # bottom chunk under-rowed at layer 0
                        pick = i
                        break
                    if pick >= 0:
                        di = lst[pick]
                        # swap-pop keeps tallest-first ordering
                        # approximately; exactness does not matter
                        lst[hd], lst[pick] = lst[pick], lst[hd]
                        heads[b] = hd + 1
                        if heads[b] == len(lst):
                            bmask &= ~(1 << b)
                        e_top = k_max * BR + b
                        lane_of[di] = l
                        e_top_of[di] = e_top
                        placed_mask[di] = True
                        floor = e_top - mt_l[di] + 1
                        remaining -= 1
                        placed = True
                        break
                    # nothing fits in this bucket: walk to the next lower
                    nb = bmask & ((1 << b) - 1)
                    b = nb.bit_length() - 1 if nb else -1
                if not placed:
                    break  # lane done; leftovers try the next lane
            lane_floor[l] = floor
        frags: list = []  # (di, end_row, height, lane) leftover splits
        if not remaining:
            return lane_of, e_top_of, placed_mask, frags
        # split pass: a leftover band may split into <= L fragments, one
        # per layer slot of its row class (each ends at a DISTINCT row
        # e ≡ r_d (mod BR); the layer merge sums/mins the partial
        # extractions, exactly like a tall band's chunks)
        import heapq

        fheap = [(-int(lane_floor[l]), l) for l in range(LANES)]
        heapq.heapify(fheap)
        leftovers = np.nonzero(~placed_mask)[0]
        leftovers = leftovers[np.argsort(-m_tot[leftovers], kind="stable")]
        for di in leftovers.tolist():
            m = mt_l[di]
            b = rd_l[di]
            used_e: set = set()
            tried: list = []
            while m > 0:
                if not fheap:
                    return None
                negfl, l = heapq.heappop(fheap)
                fl = -negfl
                # largest unused e ≡ b (mod BR) strictly below the floor
                e = ((fl - 1 - b) // BR) * BR + b if fl - 1 >= b else -1
                while e >= 0 and e in used_e:
                    e -= BR
                if e < 0:
                    tried.append((negfl, l))  # lane useless for this dst
                    continue
                take = min(m, e + 1)
                frags.append((di, e, take, l))
                used_e.add(e)
                heapq.heappush(fheap, (-(e - take + 1), l))
                m -= take
            for item in tried:
                heapq.heappush(fheap, item)
        return lane_of, e_top_of, placed_mask, frags

    # No reserve-lane retries: measured on RMAT scale 21, the failing
    # parts have arc DENSITY above the lane-layer ring count (each dst is
    # a fixed circular arc (b-m, b] mod BR; max density 510-532 vs 512
    # rings), so they are structurally mode-0 — reserving lanes only
    # shrinks greedy capacity and the per-fragment class-alignment waste
    # (~BR/2 rows) makes the split pass strictly worse.
    result = _attempt(LANES)
    if result is None:
        _EAT_STATS["lane_exhausted"] += 1
        import os

        if os.environ.get("SPMV2_TIMERS"):
            print(
                f"  eat fail: n_dst={n_dst} "
                f"elems={int(m_tot.sum())} cap={PR * LANES} "
                f"n_c_max={int(n_c.max())}",
                flush=True,
            )
        dump = os.environ.get("SPMV2_EAT_DUMP")
        if dump:
            k = _EAT_STATS["lane_exhausted"]
            np.savez(f"{dump}/eat_fail_{k}.npz", d_loc=d_loc, pos=pos,
                     PR=PR, BR=BR)
        return None
    lane_of, e_top_of, placed_mask, frags = result
    if frags:
        _EAT_STATS["split_placed"] = _EAT_STATS.get("split_placed", 0) + 1
        leftovers = np.nonzero(~placed_mask)[0]
        leftovers = leftovers[np.argsort(-m_tot[leftovers], kind="stable")]

    # per-element targets: dst band rows (e_top - m + 1 .. e_top)
    did = np.searchsorted(uniq, d_ord)
    row_e = (e_top_of - m_tot + 1)[did] + rank
    lane_e = lane_of[did]
    # chunk starts: the partial bottom chunk then full chunks of BR
    mp_e = m_p[did]
    first_mask = (rank == 0) | ((rank >= mp_e) & ((rank - mp_e) % BR == 0))
    if frags:
        # overwrite leftover dsts' element targets fragment by fragment
        starts_u = np.searchsorted(d_ord, uniq)
        cursor = {int(di): int(starts_u[di]) for di in leftovers.tolist()}
        for di, e, take, l in frags:
            r0 = cursor[di]
            rows = e - take + 1 + np.arange(take)
            row_e[r0 : r0 + take] = rows
            lane_e[r0 : r0 + take] = l
            first_mask[r0 : r0 + take] = False
            first_mask[r0] = True
            cursor[di] = r0 + take
    tgt = row_e * LANES + lane_e

    # per-row lane fix: every chunk end (k*BR + r_d, lane_of) -> lane tl.
    # Vectorized per-row perm assembly + batched native routing
    # (ct_lane_fix_words); per-row python fallback for tiny tests.
    lanefix = np.zeros((PR, LANES), np.int32)
    n_c_eff = np.where(placed_mask, n_c, 0)
    k_min_of = (e_top_of // BR) - n_c + 1
    tot = int(n_c_eff.sum())
    dst_rep = np.repeat(np.arange(n_dst), n_c_eff)
    within_k = np.arange(tot) - np.repeat(
        np.cumsum(n_c_eff) - n_c_eff, n_c_eff
    )
    end_rows = (k_min_of[dst_rep] + within_k) * BR + r_d[dst_rep]
    end_src = lane_of[dst_rep]
    end_tgt = tl[dst_rep]
    if frags:
        f_di = np.asarray([f[0] for f in frags], np.int64)
        end_rows = np.concatenate(
            [end_rows, np.asarray([f[1] for f in frags], np.int64)]
        )
        end_src = np.concatenate(
            [end_src, np.asarray([f[3] for f in frags], np.int64)]
        )
        end_tgt = np.concatenate([end_tgt, tl[f_di]])
    urows, row_gid = np.unique(end_rows, return_inverse=True)
    n_rows = len(urows)
    perms = np.full((n_rows, LANES), -1, np.int64)
    perms[row_gid, end_src] = end_tgt
    used = np.zeros((n_rows, LANES), bool)
    used[row_gid, end_tgt] = True
    neg = perms < 0
    n_free = neg.sum(axis=1)
    # ascending free-source and free-target lanes per row; equal counts
    free_src = np.argsort(~neg, axis=1, kind="stable")
    free_tgt = np.argsort(used, axis=1, kind="stable")
    mfill = np.arange(LANES)[None, :] < n_free[:, None]
    rows_idx = np.nonzero(mfill)[0]
    perms[rows_idx, free_src[mfill]] = free_tgt[mfill]
    nonid = np.nonzero((perms != np.arange(LANES)[None, :]).any(axis=1))[0]
    if len(nonid):
        from ... import native

        words = native.lane_fix_words(perms[nonid])
        if words is None:
            words = np.zeros((len(nonid), LANES), np.int32)
            for j, ri in enumerate(nonid):
                bits = route_benes(perms[ri])
                acc = np.zeros(LANES, np.uint32)
                for s in range(bits.shape[0]):
                    acc |= bits[s].astype(np.uint32) << s
                words[j] = acc.astype(np.int32)
        lanefix[urows[nonid]] = words
    _EAT_STATS["ok"] += 1
    return pos_ord, tgt, first_mask, lanefix


# ===========================================================================
# Pallas kernels
# ===========================================================================


def _out_struct(shape, dtype, *ops):
    """ShapeDtypeStruct whose varying-mesh-axes (shard_map vma) are the
    union of the operands' — required when the pipeline runs per-device
    inside shard_map (dist/mg_sorted.py)."""
    vma = frozenset()
    for o in ops:
        vma = vma | (getattr(jax.typeof(o), "vma", None) or frozenset())
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _apply_benes_block(x, lo, hi, rows, lanes=LANES):
    """Apply packed Benes switch bits to a (rows, lanes) f32 block.

    Flat position = row*lanes + lane; stage s distance d: lane butterfly
    for d < lanes, row butterfly (d // lanes) otherwise. An arithmetic
    shift of the sign bit still yields the correct bit after & 1."""
    from jax.experimental.pallas import tpu as pltpu

    n = rows * lanes
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    for s, d in enumerate(stage_distances(n)):
        word = lo if s < 32 else hi
        bit = ((word >> (s % 32)) & 1) != 0
        if d < lanes:
            hi_m = (lane_iota & d) != 0
            z = jnp.where(
                hi_m,
                pltpu.roll(x, d, axis=1),
                pltpu.roll(x, lanes - d, axis=1),
            )
        else:
            rd = d // lanes
            hi_m = (row_iota & rd) != 0
            z = jnp.where(
                hi_m,
                pltpu.roll(x, rd, axis=0),
                pltpu.roll(x, rows - rd, axis=0),
            )
        x = jnp.where(bit, z, x)
    return x


def _apply_lane_benes(x, words, shift, lanes=LANES):
    """13-stage per-row lane Benes: each row's 128 lanes are permuted by
    the switch bits packed at words[shift : shift+13] (the eat mode's lane
    fix; all-zero words = identity)."""
    from jax.experimental.pallas import tpu as pltpu

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s, d in enumerate(stage_distances(lanes)):
        bit = ((words >> (shift + s)) & 1) != 0
        hi_m = (lane_iota & d) != 0
        z = jnp.where(
            hi_m,
            pltpu.roll(x, d, axis=1),
            pltpu.roll(x, lanes - d, axis=1),
        )
        x = jnp.where(bit, z, x)
    return x


def _seg_scan_rows(x, flags, rows, reduce="sum"):
    """Segmented inclusive scan along axis 0 per lane; flags=1 starts a
    segment. reduce: "sum" or "min"."""
    from jax.experimental.pallas import tpu as pltpu

    ident = 0.0 if reduce == "sum" else jnp.float32(jnp.inf)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    f = flags.astype(jnp.float32)
    d = 1
    while d < rows:
        xs = pltpu.roll(x, d, axis=0)
        fs = pltpu.roll(f, d, axis=0)
        ok = (row >= d) & (f == 0.0)
        contrib = jnp.where(ok, xs, ident)
        x = x + contrib if reduce == "sum" else jnp.minimum(x, contrib)
        f = jnp.maximum(f, jnp.where(row >= d, fs, 1.0))
        d *= 2
    return x


def _expand_call(layout, table, interpret, reduce="sum"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # TA must divide slot_rows (= n_slabs * slab_rows): use a divisor of
    # slab_rows so no tail rows are dropped
    TA = min(512, layout.cfg.slab_rows)
    TV = TA // 8
    slot_rows = layout.idx.shape[0]
    n_vregs = layout.prow.shape[0]
    # prow rides SMEM BLOCKS, not scalar prefetch: a flat prefetch is
    # n_vregs*4 bytes and exceeds the 1 MB SMEM at scale 24 (2.31M slot
    # rows = 288K vregs = 1.15 MB, observed compile failure). Rows of
    # 128 vregs, (8, 128) blocks; step i reads its TV vregs at
    # row ((i*TV)//128) % 8, lane offset (i*TV) % 128.
    pr_rows = -(-n_vregs // 128) + 1
    pr_blocks = -(-pr_rows // 8)
    prow2d = jnp.zeros(pr_blocks * 8 * 128, layout.prow.dtype)
    prow2d = prow2d.at[:n_vregs].set(layout.prow).reshape(-1, 128)

    def kern(x_ref, prow_ref, idx_ref, w_ref, o_ref):
        i = pl.program_id(0)
        row = ((i * TV) // 128) % 8
        base = (i * TV) % 128

        def body(v, _):
            pr = prow_ref[row, base + v]
            page = x_ref[pl.ds(pr, 8), :]
            idxv = idx_ref[pl.ds(v * 8, 8), :]
            vals = jnp.zeros((8, LANES), jnp.float32)
            for r in range(8):
                vals = vals + jnp.where(idxv == r, page[r][None, :], 0.0)
            wv = w_ref[pl.ds(v * 8, 8), :]
            # sum: y = x*w with pad w=0; min: y = x+w with pad w=+inf
            o_ref[pl.ds(v * 8, 8), :] = (
                vals * wv if reduce == "sum" else vals + wv
            )
            return 0

        jax.lax.fori_loop(0, TV, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(slot_rows // TA,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x table resident
            pl.BlockSpec(
                (8, 128),
                lambda i: ((i * TV) // 1024, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((TA, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TA, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TA, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    from jax.experimental.pallas import tpu as _pltpu

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=_out_struct(
            (slot_rows, LANES), jnp.float32, table, layout.idx, layout.w
        ),
        # the resident x table alone is 91 MB at scale 24 (131K+hub
        # rows); the default 16 MB scoped limit rejects it
        compiler_params=None
        if interpret
        else _pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(table, prow2d, layout.idx, layout.w)


def _slab_benes_call(layout, vals, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SR = layout.cfg.slab_rows

    def kern(v_ref, lo_ref, hi_ref, o_ref):
        o_ref[:] = _apply_benes_block(v_ref[:], lo_ref[:], hi_ref[:], SR)

    spec = pl.BlockSpec((SR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(layout.n_slabs,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=_out_struct(
            vals.shape, jnp.float32, vals, layout.route1_lo
        ),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(vals, layout.route1_lo, layout.route1_hi)


def _assemble_call(layout, binned, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CH = layout.cfg.chunk_rows
    PR = layout.cfg.part_rows

    def kern(cs_ref, cd_ref, v_ref, o_ref):
        o_ref[:] = v_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(layout.n_steps,),
        in_specs=[
            pl.BlockSpec(
                (CH, LANES), lambda i, cs, cd: (cs[i], 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (CH, LANES), lambda i, cs, cd: (cd[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=_out_struct(
            (layout.n_parts * PR, LANES), jnp.float32, binned, layout.chunk_src
        ),
        interpret=interpret,
    )(layout.chunk_src, layout.chunk_dst, binned)


def _dma_gather_chunks(cs_ref, co_ref, b_ref, vbuf, sems, CH, stream=0,
                       n_streams=1):
    """Issue/wait helpers for the fused K-C1: part p's chunks are copied
    binned[chunk_src[chunk_off[p]+i]*CH : +CH] -> vbuf[slot*n_streams +
    stream] rows [i*CH, (i+1)*CH). One DMA semaphore per slot counts all
    of a part's chunk copies."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def issue(p, slot):
        base = co_ref[p]

        def body(i, _):
            src = cs_ref[base + i]
            pltpu.make_async_copy(
                b_ref.at[pl.ds(src * CH, CH), :],
                vbuf.at[slot * n_streams + stream, pl.ds(i * CH, CH), :],
                sems.at[slot],
            ).start()
            return 0

        lax.fori_loop(0, co_ref[p + 1] - base, body, 0)

    def wait(p, slot):
        def body(i, _):
            pltpu.make_async_copy(
                b_ref.at[pl.ds(0, CH), :],
                vbuf.at[slot * n_streams + stream, pl.ds(0, CH), :],
                sems.at[slot],
            ).wait()
            return 0

        lax.fori_loop(0, co_ref[p + 1] - co_ref[p], body, 0)

    return issue, wait


def _sort_reduce_call(layout, binned, interpret, reduce="sum"):
    """K-C2 with the assembly fused in: each part's chunks are DMA-gathered
    from the binned array into a double-buffered VMEM scratch while the
    previous part computes (replaces the standalone chunk-copy kernel and
    its HBM round trip)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PR = layout.cfg.part_rows
    BR = layout.cfg.bin_rows
    CH = layout.cfg.chunk_rows
    LAYERS = PR // BR
    n_parts = layout.n_parts
    is_sum = reduce == "sum"
    IDENT = 0.0 if is_sum else float(np.inf)

    def merge(a, b):
        return a + b if is_sum else jnp.minimum(a, b)

    def kern(
        cs_ref, co_ref, rb_ref, bp_ref, ff_ref, md_ref, sp_ref, rb3_ref,
        b_ref, lo_ref, hi_ref, lo3_ref, hi3_ref, o_ref, vbuf, sems,
    ):
        t = pl.program_id(0)
        issue, wait = _dma_gather_chunks(cs_ref, co_ref, b_ref, vbuf, sems, CH)

        @pl.when(t == 0)
        def _():
            issue(0, 0)

        @pl.when(t + 1 < n_parts)
        def _():
            issue(t + 1, (t + 1) % 2)

        wait(t, t % 2)
        v = vbuf[t % 2]

        @pl.when(ff_ref[t] == 1)
        def _():
            o_ref[:] = jnp.full_like(o_ref, IDENT)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        @pl.when(md_ref[t] == 1)
        def _():
            # simple part: masked reduce -> one dst slot (where, not
            # multiply: unwritten assembly rows may hold non-finite garbage)
            mask = pltpu.bitcast(lo_ref[:], jnp.float32)
            masked = jnp.where(mask > 0, v, IDENT)
            total = jnp.sum(masked) if is_sum else jnp.min(masked)
            spos = sp_ref[t]
            r = spos // LANES
            sub = r % 8
            row_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            upd = jnp.where(
                (lane_iota == spos % LANES) & (row_iota8 == sub), total, IDENT
            )
            base = pl.multiple_of((r // 8) * 8, 8)
            cur = o_ref[pl.ds(base, 8), :]
            o_ref[pl.ds(base, 8), :] = merge(cur, upd)

        @pl.when(md_ref[t] != 1)
        def _():
            x = _apply_benes_block(v, lo_ref[:], hi_ref[:], PR)
            flags = ((hi_ref[:] >> 5) & 1).astype(jnp.float32)
            scan = _seg_scan_rows(x, flags, PR, reduce)
            # keep group-END totals only: a group's last row is followed
            # (in its lane) by the next segment's start flag; the last row
            # of the block always ends a segment. Trash/interior slots
            # become the identity so unused layer slots add nothing.
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (PR, LANES), 0)
            nxt = pltpu.roll(flags, PR - 1, axis=0)  # flags[r+1]
            is_end = jnp.where(row_iota == PR - 1, 1.0, nxt)
            real = ((hi_ref[:] >> 6) & 1).astype(jnp.float32)
            masked = jnp.where((is_end > 0) & (real > 0), scan, IDENT)

            # placement: mode 0 = full benes to layered slots; mode 2 =
            # ends already AT their layered slots, 13-stage lane fix only
            def finish(z):
                acc = z[0:BR, :]
                for k in range(1, LAYERS):
                    acc = merge(acc, z[k * BR : (k + 1) * BR, :])
                o_ref[:] = merge(o_ref[:], acc)

            @pl.when(md_ref[t] == 0)
            def _():
                finish(_apply_benes_block(masked, lo3_ref[:], hi3_ref[:], PR))

            @pl.when(md_ref[t] == 2)
            def _():
                finish(_apply_lane_benes(masked, hi_ref[:], 8))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(layout.n_parts,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # binned (DMA-gathered)
        ]
        + [
            pl.BlockSpec(
                (PR, LANES), lambda t, *p: (p[2][t], 0), memory_space=pltpu.VMEM
            )
        ]
        * 2
        + [
            pl.BlockSpec(
                (PR, LANES), lambda t, *p: (p[7][t], 0), memory_space=pltpu.VMEM
            )
        ]
        * 2,
        out_specs=pl.BlockSpec(
            (BR, LANES), lambda t, *p: (p[3][t], 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=_out_struct(
            (layout.out_blocks * BR, LANES), jnp.float32, binned, layout.mode
        ),
        compiler_params=None
        if interpret
        else __import__(
            "jax.experimental.pallas.tpu", fromlist=["x"]
        ).CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        layout.chunk_src,
        layout.chunk_off,
        layout.route_blk,
        layout.bin_of_part,
        layout.first_flag,
        layout.mode,
        layout.simple_pos,
        layout.route3_blk,
        binned,
        layout.route2_lo,
        layout.route2_hi,
        layout.route3_lo,
        layout.route3_hi,
    )


# ---------------------------------------------------------------------------
# Paired-bf16 variants: two feature columns packed into one f32 word ride
# the SAME Benes routing — per-stage roll/select moves both features at
# once, halving the per-feature VPU cost of the (VPU-bound) pipeline. The
# values are bf16-rounded at expand and again when the group totals are
# re-packed for the placement Benes; segmented scans run unpacked in f32.
# ---------------------------------------------------------------------------


def _pack_pair(a, b):
    """Round-to-nearest-bf16 both halves, pack as (a_hi16 | b_hi16>>16)."""
    ua = jax.lax.bitcast_convert_type(a, jnp.uint32)
    ub = jax.lax.bitcast_convert_type(b, jnp.uint32)
    ua = (ua + 0x8000) & jnp.uint32(0xFFFF0000)
    ub = (ub + 0x8000) >> 16
    return jax.lax.bitcast_convert_type(ua | ub, jnp.float32)


def _unpack_pair(p):
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    b = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return a, b


# ---------------------------------------------------------------------------
# Multi-stream variants: k packed bf16-pair streams (2k feature columns)
# ride ONE routing pass. The pipeline is VPU-bound on Benes roll/selects;
# sharing the switch-bit extraction, the scan-flag recurrence, the route
# streams and the per-step grid/DMA overheads across k data blocks cuts the
# per-feature cost to a fraction of the sequential pair path (the SpMM MXU
# gap called out in round 2: mg_prims.py lax.map was one pass per pair).
# All stream blocks stay 2D (tuples, python-unrolled) so every Mosaic op is
# the known-good (rows, 128) roll/select form.
# ---------------------------------------------------------------------------


def _apply_benes_block_shared(xs, lo, hi, rows, lanes=LANES):
    """_apply_benes_block over a list of (rows, lanes) blocks sharing one
    set of switch words: masks extracted once per stage."""
    from jax.experimental.pallas import tpu as pltpu

    n = rows * lanes
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    xs = list(xs)
    for s, d in enumerate(stage_distances(n)):
        word = lo if s < 32 else hi
        bit = ((word >> (s % 32)) & 1) != 0
        if d < lanes:
            hi_m = (lane_iota & d) != 0
            zs = [
                jnp.where(
                    hi_m,
                    pltpu.roll(x, d, axis=1),
                    pltpu.roll(x, lanes - d, axis=1),
                )
                for x in xs
            ]
        else:
            rd = d // lanes
            hi_m = (row_iota & rd) != 0
            zs = [
                jnp.where(
                    hi_m,
                    pltpu.roll(x, rd, axis=0),
                    pltpu.roll(x, rows - rd, axis=0),
                )
                for x in xs
            ]
        xs = [jnp.where(bit, z, x) for z, x in zip(zs, xs)]
    return xs


def _apply_lane_benes_shared(xs, words, shift, lanes=LANES):
    from jax.experimental.pallas import tpu as pltpu

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, xs[0].shape, 1)
    xs = list(xs)
    for s, d in enumerate(stage_distances(lanes)):
        bit = ((words >> (shift + s)) & 1) != 0
        hi_m = (lane_iota & d) != 0
        zs = [
            jnp.where(
                hi_m,
                pltpu.roll(x, d, axis=1),
                pltpu.roll(x, lanes - d, axis=1),
            )
            for x in xs
        ]
        xs = [jnp.where(bit, z, x) for z, x in zip(zs, xs)]
    return xs


def _seg_scan_rows_shared(xs, flags, rows):
    """Segmented inclusive sum scan per lane over a list of blocks sharing
    one flag set: the flag recurrence runs once."""
    from jax.experimental.pallas import tpu as pltpu

    row = jax.lax.broadcasted_iota(jnp.int32, xs[0].shape, 0)
    f = flags.astype(jnp.float32)
    xs = list(xs)
    d = 1
    while d < rows:
        ok = (row >= d) & (f == 0.0)
        xs = [x + jnp.where(ok, pltpu.roll(x, d, axis=0), 0.0) for x in xs]
        fs = pltpu.roll(f, d, axis=0)
        f = jnp.maximum(f, jnp.where(row >= d, fs, 1.0))
        d *= 2
    return xs


def _expand_multi_call(layout, tables, k, interpret):
    """K-A over k packed tables stacked as (k*trows, LANES): the idx/w
    streams and the 8-way select masks are shared; each stream reads its
    own table page."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TA = min(512, layout.cfg.slab_rows)
    TV = TA // 8
    slot_rows = layout.idx.shape[0]
    trows = tables.shape[0] // k

    def kern(prow_ref, x_ref, idx_ref, w_ref, *o_refs):
        i = pl.program_id(0)

        def body(v, _):
            pr = prow_ref[i * TV + v]
            idxv = idx_ref[pl.ds(v * 8, 8), :]
            wv = w_ref[pl.ds(v * 8, 8), :]
            masks = [idxv == r for r in range(8)]
            for s in range(k):
                page = x_ref[pl.ds(s * trows + pr, 8), :]
                vals = jnp.zeros((8, LANES), jnp.float32)
                for r in range(8):
                    vals = vals + jnp.where(masks[r], page[r][None, :], 0.0)
                a, b = _unpack_pair(vals)
                o_refs[s][pl.ds(v * 8, 8), :] = _pack_pair(a * wv, b * wv)
            return 0

        jax.lax.fori_loop(0, TV, body, 0)

    blk = lambda i, *_: (i, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(slot_rows // TA,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((TA, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TA, LANES), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((TA, LANES), blk, memory_space=pltpu.VMEM)
            for _ in range(k)
        ),
    )
    shp = jax.ShapeDtypeStruct((slot_rows, LANES), jnp.float32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(shp for _ in range(k)),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(layout.prow, tables, layout.idx, layout.w)


def _slab_benes_multi_call(layout, vals_k, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SR = layout.cfg.slab_rows
    k = len(vals_k)

    def kern(*refs):
        v_refs, (lo_ref, hi_ref), o_refs = refs[:k], refs[k : k + 2], refs[k + 2 :]
        outs = _apply_benes_block_shared(
            [r[:] for r in v_refs], lo_ref[:], hi_ref[:], SR
        )
        for o, z in zip(o_refs, outs):
            o[:] = z

    spec = pl.BlockSpec((SR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct(vals_k[0].shape, jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(layout.n_slabs,),
        in_specs=[spec] * (k + 2),
        out_specs=tuple(spec for _ in range(k)),
        out_shape=tuple(shp for _ in range(k)),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(*vals_k, layout.route1_lo, layout.route1_hi)


def _sort_reduce_multi_call(layout, binned_k, interpret):
    """K-C2 over k packed streams with the assembly fused in (per-stream
    DMA gathers share the slot semaphore); returns 2k f32 outputs
    (a0..ak-1, b0..bk-1 order)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PR = layout.cfg.part_rows
    BR = layout.cfg.bin_rows
    CH = layout.cfg.chunk_rows
    LAYERS = PR // BR
    n_parts = layout.n_parts
    k = len(binned_k)

    def kern(cs_ref, co_ref, rb_ref, bp_ref, ff_ref, md_ref, sp_ref,
             rb3_ref, *refs):
        b_refs = refs[:k]
        lo_ref, hi_ref, lo3_ref, hi3_ref = refs[k : k + 4]
        o_refs = refs[k + 4 : k + 4 + 2 * k]  # 2k: a-streams then b-streams
        vbuf, sems = refs[k + 4 + 2 * k :]
        t = pl.program_id(0)
        dmas = [
            _dma_gather_chunks(
                cs_ref, co_ref, b_refs[s], vbuf, sems, CH, stream=s,
                n_streams=k,
            )
            for s in range(k)
        ]

        @pl.when(t == 0)
        def _():
            for issue, _w in dmas:
                issue(0, 0)

        @pl.when(t + 1 < n_parts)
        def _():
            for issue, _w in dmas:
                issue(t + 1, (t + 1) % 2)

        for _i, wait in dmas:
            wait(t, t % 2)
        slot = t % 2
        v_blocks = [vbuf[slot * k + s] for s in range(k)]

        @pl.when(ff_ref[t] == 1)
        def _():
            for o in o_refs:
                o[:] = jnp.zeros_like(o)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        @pl.when(md_ref[t] == 1)
        def _():
            mask = pltpu.bitcast(lo_ref[:], jnp.float32) > 0
            spos = sp_ref[t]
            r = spos // LANES
            sub = r % 8
            row_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            sel = (lane_iota == spos % LANES) & (row_iota8 == sub)
            base = pl.multiple_of((r // 8) * 8, 8)
            for s in range(k):
                a, b = _unpack_pair(v_blocks[s])
                ta = jnp.sum(jnp.where(mask, a, 0.0))
                tb = jnp.sum(jnp.where(mask, b, 0.0))
                o_refs[s][pl.ds(base, 8), :] = o_refs[s][
                    pl.ds(base, 8), :
                ] + jnp.where(sel, ta, 0.0)
                o_refs[k + s][pl.ds(base, 8), :] = o_refs[k + s][
                    pl.ds(base, 8), :
                ] + jnp.where(sel, tb, 0.0)

        @pl.when(md_ref[t] != 1)
        def _():
            xs = _apply_benes_block_shared(
                v_blocks, lo_ref[:], hi_ref[:], PR
            )
            flags = ((hi_ref[:] >> 5) & 1).astype(jnp.float32)
            planes = []
            for x in xs:
                a, b = _unpack_pair(x)
                planes.extend((a, b))
            scans = _seg_scan_rows_shared(planes, flags, PR)
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (PR, LANES), 0)
            nxt = pltpu.roll(flags, PR - 1, axis=0)
            is_end = jnp.where(row_iota == PR - 1, 1.0, nxt)
            real = ((hi_ref[:] >> 6) & 1).astype(jnp.float32)
            keep = (is_end > 0) & (real > 0)
            packed = [
                _pack_pair(
                    jnp.where(keep, scans[2 * s], 0.0),
                    jnp.where(keep, scans[2 * s + 1], 0.0),
                )
                for s in range(k)
            ]

            def finish(zs):
                for s, z in enumerate(zs):
                    za, zb = _unpack_pair(z)
                    acc_a = za[0:BR, :]
                    acc_b = zb[0:BR, :]
                    for l in range(1, LAYERS):
                        acc_a = acc_a + za[l * BR : (l + 1) * BR, :]
                        acc_b = acc_b + zb[l * BR : (l + 1) * BR, :]
                    o_refs[s][:] = o_refs[s][:] + acc_a
                    o_refs[k + s][:] = o_refs[k + s][:] + acc_b

            @pl.when(md_ref[t] == 0)
            def _():
                finish(
                    _apply_benes_block_shared(
                        packed, lo3_ref[:], hi3_ref[:], PR
                    )
                )

            @pl.when(md_ref[t] == 2)
            def _():
                finish(_apply_lane_benes_shared(packed, hi_ref[:], 8))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(layout.n_parts,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * k
        + [
            pl.BlockSpec(
                (PR, LANES), lambda t, *p: (p[2][t], 0), memory_space=pltpu.VMEM
            )
        ]
        * 2
        + [
            pl.BlockSpec(
                (PR, LANES), lambda t, *p: (p[7][t], 0), memory_space=pltpu.VMEM
            )
        ]
        * 2,
        out_specs=tuple(
            pl.BlockSpec(
                (BR, LANES), lambda t, *p: (p[3][t], 0), memory_space=pltpu.VMEM
            )
            for _ in range(2 * k)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * k, PR, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = _out_struct(
        (layout.out_blocks * BR, LANES), jnp.float32, binned_k[0], layout.mode
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(out for _ in range(2 * k)),
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(
        layout.chunk_src,
        layout.chunk_off,
        layout.route_blk,
        layout.bin_of_part,
        layout.first_flag,
        layout.mode,
        layout.simple_pos,
        layout.route3_blk,
        *binned_k,
        layout.route2_lo,
        layout.route2_hi,
        layout.route3_lo,
        layout.route3_hi,
    )


def _vmem_params(interpret):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _pack_tables_multi(layout, cols):
    """cols (2k, span) f32 -> stacked packed tables (k*trows, LANES);
    features 2s and 2s+1 share stream s."""
    xr = layout.x_rows
    n_hub = layout.hub_ids.shape[0]
    trows = -(-(xr + n_hub) // 8) * 8
    k = cols.shape[0] // 2
    ns = layout.src_count
    pads = jnp.zeros((k, 2, xr * LANES), jnp.float32)
    pads = pads.at[:, :, :ns].set(cols.reshape(k, 2, -1))
    packed = jax.vmap(_pack_pair)(pads[:, 0], pads[:, 1])  # (k, xr*128)
    hub_vals = packed[:, layout.hub_ids] if n_hub else packed[:, :0]
    tables = jnp.zeros((k, trows, LANES), jnp.float32)
    tables = tables.at[:, :xr].set(packed.reshape(k, xr, LANES))
    if n_hub:
        tables = tables.at[:, xr : xr + n_hub].set(
            jnp.broadcast_to(hub_vals[:, :, None], (k, n_hub, LANES))
        )
    return tables.reshape(k * trows, LANES)


@partial(jax.jit, static_argnames=("interpret",))
def _sorted_spmm_pass_jit(layout, cols, interpret=False):
    """One multi-stream pass: cols (2k, span) -> ys (2k, num_vertices).
    k = cols.shape[0] // 2 packed pair streams share the routing."""
    k = cols.shape[0] // 2
    tables = _pack_tables_multi(layout, cols)
    vals = _expand_multi_call(layout, tables, k, interpret)
    # slab Benes VMEM: live streams cost ~2x their block bytes (windows +
    # register spills), so cap streams per call such that
    # (2*kc + 2) blocks * 2 (buffering) * ~1.5 stays under the 110 MB
    # limit — 4 streams at slab_rows 2048 (1 MB blocks), 2 at 4096
    kc = max(1, (4 * 2048) // layout.cfg.slab_rows)
    if k <= kc:
        binned = _slab_benes_multi_call(layout, vals, interpret)
    else:
        binned = []
        for i in range(0, k, kc):
            binned.extend(
                _slab_benes_multi_call(layout, vals[i : i + kc], interpret)
            )
        binned = tuple(binned)
    outs = _sort_reduce_multi_call(layout, binned, interpret)
    # outs order: a0..ak-1, b0..bk-1 -> interleave back to feature order
    outs = [outs[s % 2 * k + s // 2] for s in range(2 * k)]
    nb = layout.n_bins * layout.cfg.bin_rows

    def fin(o):
        y = _untranspose_bins(layout, o)
        if layout.hub_dsts.shape[0]:
            y = y.at[layout.hub_dsts].add(o[nb:].reshape(-1)[layout.hub_pos])
        return y

    return jnp.stack([fin(o) for o in outs])


@partial(jax.jit, static_argnames=("interpret",))
def _sorted_spmm_pass_multi_jit(mlay, cols, interpret=False):
    """Multi-range variant of one multi-stream pass: cols (2k, V)."""
    span = mlay.span
    k_tot = -(-mlay.num_vertices // span)
    pad = jnp.zeros((cols.shape[0], k_tot * span), jnp.float32)
    pad = pad.at[:, : mlay.num_vertices].set(cols)
    y = None
    for lay, r in zip(mlay.parts, mlay.range_of):
        ck = jax.lax.dynamic_slice_in_dim(pad, r * span, span, axis=1)
        yk = _sorted_spmm_pass_jit(lay, ck, interpret)
        y = yk if y is None else y + yk
    return y


@partial(jax.jit, static_argnames=("interpret",))
def _sorted_spmv_pair_jit(
    layout: SortedLayout,
    xa: jax.Array,
    xb: jax.Array,
    interpret: bool = False,
):
    """Two columns through one pipeline pass (packed bf16 pair) — the
    k=1 case of the multi-stream pass."""
    ys = _sorted_spmm_pass_jit(layout, jnp.stack([xa, xb]), interpret)
    return ys[0], ys[1]


@partial(jax.jit, static_argnames=("interpret", "reduce"))
def _sorted_spmv_multi_jit(
    mlay: "MultiSortedLayout",
    x: jax.Array,
    interpret: bool = False,
    reduce: str = "sum",
):
    """Multi-range pipeline: x split into span-wide slices, one pipeline
    pass per non-empty range, dense outputs combined (sum / min)."""
    span = mlay.span
    k_tot = -(-mlay.num_vertices // span)
    xpad = jnp.zeros(k_tot * span, x.dtype).at[: mlay.num_vertices].set(x)
    y = None
    for lay, k in zip(mlay.parts, mlay.range_of):
        xk = jax.lax.dynamic_slice_in_dim(xpad, k * span, span)
        yk = _sorted_spmv_jit(lay, xk, interpret, reduce)
        if y is None:
            y = yk
        else:
            y = y + yk if reduce == "sum" else jnp.minimum(y, yk)
    return y


@partial(jax.jit, static_argnames=("interpret",))
def _sorted_spmv_pair_multi_jit(
    mlay: "MultiSortedLayout",
    xa: jax.Array,
    xb: jax.Array,
    interpret: bool = False,
):
    span = mlay.span
    k_tot = -(-mlay.num_vertices // span)
    pa = jnp.zeros(k_tot * span, xa.dtype).at[: mlay.num_vertices].set(xa)
    pb = jnp.zeros(k_tot * span, xb.dtype).at[: mlay.num_vertices].set(xb)
    ya = yb = None
    for lay, k in zip(mlay.parts, mlay.range_of):
        ak = jax.lax.dynamic_slice_in_dim(pa, k * span, span)
        bk = jax.lax.dynamic_slice_in_dim(pb, k * span, span)
        ra, rb = _sorted_spmv_pair_jit(lay, ak, bk, interpret)
        ya = ra if ya is None else ya + ra
        yb = rb if yb is None else yb + rb
    return ya, yb


def sorted_spmv(
    layout: SortedLayout,
    x: jax.Array,
    *,
    interpret: bool = False,
    reduce: str = "sum",
):
    """reduce="sum": y[dst] = sum over edges (src -> dst) of w * x[src].
    reduce="min":  y[dst] = min over edges of (x[src] + w), +inf where the
    dst has no in-edges — the min-plus (tropical) sweep of SSSP relaxation;
    requires a layout built with pad_weight=+inf (variant="min").
    x: (num_vertices,) f32. Accepts SortedLayout or MultiSortedLayout."""
    return sorted_spmv_dispatch(layout, x, interpret, reduce)


def sorted_spmv_dispatch(layout, x, interpret=False, reduce="sum"):
    """Route to the single- or multi-range jit by layout type (pytree
    structure differs, so enclosing jits retrace per engine). Keyed
    (v3) layouts carry their reduce direction; it must match."""
    from .spmv3 import KeyedLayout, keyed_spmv_jit

    if isinstance(layout, KeyedLayout):
        assert layout.reduce == reduce, (
            f"keyed layout built for {layout.reduce!r}, asked {reduce!r}"
        )
        return keyed_spmv_jit(layout, x, interpret=interpret)
    if isinstance(layout, MultiSortedLayout):
        return _sorted_spmv_multi_jit(layout, x, interpret, reduce)
    return _sorted_spmv_jit(layout, x, interpret, reduce)


@partial(jax.jit, static_argnames=("interpret", "reduce"))
def _sorted_spmv_jit(
    layout: SortedLayout,
    x: jax.Array,
    interpret: bool = False,
    reduce: str = "sum",
):
    xr = layout.x_rows
    n_hub = layout.hub_ids.shape[0]
    trows = -(-(xr + n_hub) // 8) * 8
    xpad = jnp.zeros(xr * LANES, jnp.float32).at[: layout.src_count].set(x)
    hub_vals = jnp.take(xpad, layout.hub_ids)  # small XLA gather
    table = jnp.zeros((trows, LANES), jnp.float32)
    table = table.at[:xr].set(xpad.reshape(xr, LANES))
    table = table.at[xr : xr + n_hub].set(
        jnp.broadcast_to(hub_vals[:, None], (n_hub, LANES))
    )
    vals = _expand_call(layout, table, interpret, reduce)
    binned = _slab_benes_call(layout, vals, interpret)
    out = _sort_reduce_call(layout, binned, interpret, reduce)
    y = _untranspose_bins(layout, out)
    nb = layout.n_bins * layout.cfg.bin_rows
    if layout.hub_dsts.shape[0]:
        hub_vals = out[nb:].reshape(-1)[layout.hub_pos]
        upd = y.at[layout.hub_dsts]
        y = upd.add(hub_vals) if reduce == "sum" else upd.min(hub_vals)
    return y


def _untranspose_bins(layout, out):
    """Dense-bin blocks store dst d at (row d%BR, lane d//BR) within its
    bin (the transposed slot map that decorrelates degree from rows); one
    reshape + swapaxes restores natural vertex order."""
    BR = layout.cfg.bin_rows
    dense = out[: layout.n_bins * BR].reshape(layout.n_bins, BR, LANES)
    return jnp.swapaxes(dense, 1, 2).reshape(-1)[: layout.num_vertices]



@partial(jax.jit, static_argnames=("precision", "interpret"))
def sorted_spmm(
    layout: SortedLayout,
    feats: jax.Array,
    *,
    precision: str = "bf16_pair",
    interpret: bool = False,
) -> jax.Array:
    """Feature-matrix aggregation: out[dst, :] = sum_e w * feats[src, :].

    precision="bf16_pair" (default): two columns packed per f32 word ride
    one pipeline pass (ceil(F/2) passes, ~2x the f32 path); inputs and the
    per-group totals are bf16-rounded, the segmented adds are f32 — the
    usual mixed-precision aggregation contract of GNN training.
    precision="f32": one exact pass per column (F passes via lax.map).
    The pipeline is VPU-bound (Benes roll/select stages), so pass count is
    the cost model; both are orders of magnitude ahead of the XLA
    row-gather/segment path (0.009 Grow/s measured). Small graphs take the
    dense MXU path instead (prims/dense_spmm.py)."""
    from .spmv3 import KeyedLayout

    f = feats.shape[1]
    cols = jnp.swapaxes(feats, 0, 1)  # (F, V)
    # keyed (v3) layouts have no multi-stream pass; per-column f32
    # sweeps (the GNN hot path rides spmm_row, not this)
    if precision == "f32" or f == 1 or isinstance(layout, KeyedLayout):

        def one(col):
            return sorted_spmv_dispatch(layout, col, interpret)

        out = jax.lax.map(one, cols)
        return jnp.swapaxes(out, 0, 1)

    # multi-stream passes: 2k feature columns per routing pass; k bounded
    # by the VMEM room for the k resident packed tables in the expand
    # kernel. k is capped at 4: measured on v5e, k=8 OOMs the shared slab
    # Benes (register-allocator spills ~= one extra block per live stream:
    # 77.6 MB of spill slots on top of 72 MB of block windows), and the
    # cost model says high k is ~12% anyway — per-stream roll/selects
    # dominate once the route decode is amortized over 4 streams.
    first = layout.parts[0] if isinstance(layout, MultiSortedLayout) else layout
    n_hub = first.hub_ids.shape[0]
    tbytes = max((first.x_rows + n_hub) * LANES * 4, 1)
    k = max(1, min(4, _SPMM_TABLE_VMEM // tbytes, (f + 1) // 2))
    group = 2 * k
    npass = -(-f // group)
    if f % group:
        pad = jnp.zeros((npass * group - f, cols.shape[1]), cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=0)
    groups = cols.reshape(npass, group, -1)

    def one_group(g):
        if isinstance(layout, MultiSortedLayout):
            return _sorted_spmm_pass_multi_jit(layout, g, interpret)
        return _sorted_spmm_pass_jit(layout, g, interpret)

    out = jax.lax.map(one_group, groups)  # (npass, group, V)
    out = out.reshape(npass * group, -1)[:f]
    return jnp.swapaxes(out, 0, 1)


_SORTED_CACHE: dict = {}
# single-chip VMEM budget for the resident x table (f32)
_SORTED_VMEM_BUDGET = 10 * 1024 * 1024
# VMEM pool for the k stacked packed tables of the multi-stream SpMM pass
_SPMM_TABLE_VMEM = 92 * 1024 * 1024

# ---------------------------------------------------------------------------
# Disk cache: layout builds are host-bound (minutes at RMAT scale 20+ on a
# small host); persist them keyed by a content hash of the edge list.
# ---------------------------------------------------------------------------

_STATIC_FIELDS = (
    "n_slabs", "n_parts", "n_bins", "n_steps", "x_rows",
    "num_vertices", "num_edges", "num_src", "n_out_blocks",
)


def _cache_dir():
    import os

    d = os.environ.get("CUGRAPH_TPU_CACHE_DIR")
    if d == "":
        return None  # explicitly disabled
    if d is None:
        d = os.path.expanduser("~/.cache/cugraph_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _layout_cache_key(
    dsts, srcs, weights, num_vertices, cfg, pad_weight=0.0,
    num_src_vertices=None,
) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(b"layout-v9")  # builder version: bump to invalidate the cache
    h.update(np.int64(num_vertices).tobytes())
    if num_src_vertices is not None:
        h.update(np.int64(num_src_vertices).tobytes())
    h.update(np.float32(pad_weight).tobytes())
    h.update(repr(dataclasses.astuple(cfg)).encode())
    h.update(np.ascontiguousarray(dsts, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(srcs, dtype=np.int64).tobytes())
    if weights is not None:
        h.update(np.ascontiguousarray(weights, dtype=np.float32).tobytes())
    return h.hexdigest()


def save_sorted_layout(path: str, layout: SortedLayout) -> None:
    arrays = {
        f.name: np.asarray(getattr(layout, f.name))
        for f in dataclasses.fields(layout)
        if f.name not in _STATIC_FIELDS and f.name != "cfg"
    }
    meta = dict(
        cfg=dataclasses.astuple(layout.cfg),
        **{k: getattr(layout, k) for k in _STATIC_FIELDS},
    )
    import os

    import threading

    # unique tmp: concurrent builders (thread-pooled MG device builds)
    # may save the same content key; .npz suffix so savez keeps the name
    tmp = f"{path}.{os.getpid()}.{threading.get_native_id()}.tmp.npz"
    np.savez(tmp, __meta__=np.frombuffer(repr(meta).encode(), np.uint8), **arrays)
    os.replace(tmp, path)
    _evict_layout_cache(os.path.dirname(path), keep=path)


def _evict_layout_cache(cdir: str, keep: str = "") -> None:
    """LRU-evict layout cache files past the byte budget
    (CUGRAPH_TPU_CACHE_BUDGET, default 80 GB). The old 24 GB default
    silently evicted the round's working set — a full scale-21/23/24
    keyed sum+min sweep is ~35 GB — forcing multi-minute rebuilds that
    looked like cache misses."""
    import os

    budget = int(
        os.environ.get("CUGRAPH_TPU_CACHE_BUDGET", 80 * 1024**3)
    )
    try:
        files = [
            os.path.join(cdir, f)
            for f in os.listdir(cdir)
            if f.startswith("spmv2_layout_") and f.endswith(".npz")
        ]
        stats = [(p, os.stat(p)) for p in files]
    except OSError:
        return
    total = sum(st.st_size for _, st in stats)
    if total <= budget:
        return
    # oldest access first; never evict the file just written
    stats.sort(key=lambda ps: ps[1].st_atime)
    for p, st in stats:
        if total <= budget:
            break
        if os.path.abspath(p) == os.path.abspath(keep):
            continue
        try:
            os.remove(p)
            total -= st.st_size
        except OSError:
            pass


def load_sorted_layout(path: str) -> SortedLayout:
    import ast

    with np.load(path) as z:
        meta = ast.literal_eval(bytes(z["__meta__"]).decode())
        arrays = {k: jnp.asarray(z[k]) for k in z.files if k != "__meta__"}
    cfg = Spmv2Config(*meta.pop("cfg"))
    meta.setdefault("num_src", 0)  # pre-multi-range cache files
    meta.setdefault("n_out_blocks", 0)
    if "hub_dsts" not in arrays:
        arrays["hub_dsts"] = jnp.zeros(0, jnp.int32)
        arrays["hub_pos"] = jnp.zeros(0, jnp.int32)
    if "route3_blk" not in arrays:  # pre-eat cache files: shared block ids
        arrays["route3_blk"] = arrays["route_blk"]
    return SortedLayout(cfg=cfg, **meta, **arrays)


# source ids past the single-table budget split into ranges of this width
# (multiple of 8*LANES so page/lane mapping stays aligned)
_SRC_RANGE_SPAN = (_SORTED_VMEM_BUDGET // (4 * LANES * 8)) * (LANES * 8)
# hard vertex cap for the multi-range path (bounds host build time/memory)
_SORTED_MAX_VERTICES = 1 << 25


def sorted_layout_available(num_vertices: int) -> bool:
    """True when the sorted pipeline serves this graph on this backend.
    CUGRAPH_TPU_FORCE_SORTED=1 bypasses the backend gate so a CPU host
    can pre-build/warm the disk layout cache with byte-identical cache
    keys for a later TPU run."""
    import os

    if jax.default_backend() not in ("tpu", "axon") and not os.environ.get(
        "CUGRAPH_TPU_FORCE_SORTED"
    ):
        return False
    return num_vertices <= _SORTED_MAX_VERTICES


def _needs_src_ranges(num_vertices: int) -> bool:
    r = -(-num_vertices // LANES)
    return r * LANES * 4 > _SORTED_VMEM_BUDGET


def build_multi_sorted_layout(
    dsts, srcs, weights, num_vertices,
    cfg: Optional[Spmv2Config] = None,
    pad_weight: float = 0.0,
    span: Optional[int] = None,
    weight_variants: Optional[list] = None,
    materialize: bool = True,
):
    """Split sources into span-wide ranges and build one sub-layout per
    non-empty range (each range's x table fits the VMEM budget). Empty
    ranges are skipped; sub-layouts share the disk cache individually.
    weight_variants: as in build_sorted_layout_auto — returns a list of
    MultiSortedLayouts ([main, *siblings]) from one host pass per range.

    materialize=False: prebuild mode — each range's layouts land in the
    disk cache and are FREED immediately instead of accumulating (a
    scale-24 sum+min set holds ~20 GB of layouts on top of the giant
    range's build temporaries; the accumulation OOM-killed a 125 GB
    host). Returns the number of built ranges."""
    import gc

    span = span or _SRC_RANGE_SPAN
    cfg = cfg or default_config_for(int(num_vertices))
    srcs = np.asarray(srcs, dtype=np.int64)
    dsts = np.asarray(dsts, dtype=np.int64)
    k_tot = max(-(-int(num_vertices) // span), 1)
    n_var = 1 + len(weight_variants or ())
    parts = [[] for _ in range(n_var)]
    range_of = []
    for k in range(k_tot):
        m = (srcs >= k * span) & (srcs < (k + 1) * span)
        if not m.any():
            continue
        wk = None if weights is None else np.asarray(weights)[m]
        if weight_variants is not None:
            wv = [
                (None if w_ is None else np.asarray(w_)[m], p_)
                for w_, p_ in weight_variants
            ]
            lays = build_sorted_layout_auto(
                dsts[m], srcs[m] - k * span, wk, num_vertices, cfg,
                pad_weight=pad_weight, num_src_vertices=span,
                weight_variants=wv,
            )
        else:
            lays = [
                build_sorted_layout_auto(
                    dsts[m], srcs[m] - k * span, wk, num_vertices, cfg,
                    pad_weight=pad_weight, num_src_vertices=span,
                )
            ]
        if materialize:
            for i, lk in enumerate(lays):
                parts[i].append(lk)
        del lays
        range_of.append(k)
        if not materialize:
            gc.collect()  # drop this range's jnp buffers before the next
    if not materialize:
        return len(range_of)
    outs = [
        MultiSortedLayout(
            parts=tuple(p),
            range_of=tuple(range_of),
            span=span,
            num_vertices=int(num_vertices),
            num_edges=int(len(dsts)),
        )
        for p in parts
    ]
    return outs if weight_variants is not None else outs[0]


def build_sorted_layout_auto(
    dsts, srcs, weights, num_vertices, cfg: Optional[Spmv2Config] = None,
    pad_weight: float = 0.0,
    num_src_vertices: Optional[int] = None,
    weight_variants: Optional[list] = None,
    allow_geometry_fallback: bool = True,
) -> SortedLayout:
    """build_sorted_layout with an auto-retry ladder: on round/balance
    overflow, halve the heavy-dst threshold (more simple parts). Built
    layouts are persisted to a disk cache (host builds cost minutes at
    RMAT scale 20+); set CUGRAPH_TPU_CACHE_DIR="" to disable.

    weight_variants: optional extra (weights, pad_weight) pairs built and
    cached from the SAME host pass (routing depends on positions only).
    Returns [main, *siblings] when given."""
    import os

    cfg = cfg or Spmv2Config()
    cdir = _cache_dir()
    cpath = None
    all_specs = [(weights, pad_weight)] + list(weight_variants or ())
    cpaths = [None] * len(all_specs)
    if cdir is not None:
        for i, (wts_k, pad_k) in enumerate(all_specs):
            key = _layout_cache_key(
                dsts, srcs, wts_k, num_vertices, cfg, pad_k,
                num_src_vertices,
            )
            cpaths[i] = os.path.join(cdir, f"spmv2_layout_{key}.npz")
        cpath = cpaths[0]
        cached = []
        for p in cpaths:
            try:
                cached.append(load_sorted_layout(p))
            except Exception:
                cached = None  # missing/corrupt: rebuild the set
                break
        if cached is not None:
            return cached if weight_variants is not None else cached[0]
    floor = min(128, cfg.heavy_dst)  # tiny test configs start below 128
    last = None
    # ladder: dense packing first, then relax the row budget (the mode-0
    # fallback's lane balance needs headroom), then halve the heavy-dst
    # threshold at the relaxed budget — each failed attempt costs a full
    # host build pass, so the budget drops BEFORE the heavy sweep
    attempts = [
        (15, cfg.heavy_dst, True, cfg),
        (14, cfg.heavy_dst, True, cfg),
    ]
    heavy = cfg.heavy_dst
    while heavy >= floor:
        attempts.append((14, heavy, False, cfg))
        heavy //= 2
    # terminal rungs: the conservative round-2 geometry (slab 2048, bin
    # 512, 4 layers) — the scale-23 default geometry (bin_rows 1024,
    # LAYERS=2) can defeat the mode-0 lane balance at EVERY budget/heavy
    # rung (measured round 4; round 2 shipped scale 23 on this geometry).
    # Disabled for MG per-device builds (SPMD needs one cfg mesh-wide).
    if allow_geometry_fallback and (
        cfg.bin_rows != 512 or cfg.slab_rows != 2048
    ) and cfg.part_rows == 2048:
        g2 = dataclasses.replace(cfg, slab_rows=2048, bin_rows=512)
        attempts.append((14, cfg.heavy_dst, True, g2))
        attempts.append((14, floor, False, g2))
    # Rung memo: the succeeding ladder rung depends only on edge POSITIONS
    # (weights never affect packing), so weight variants / out-direction
    # rebuilds / cache-evicted re-builds skip the failed full passes —
    # the measured scale-23 cost multiplier (docs/PERFORMANCE.md r4 stage
    # profile). Keyed position-only; overridable via
    # CUGRAPH_TPU_LADDER_START for fresh builds at known-dense scales.
    rung_path = None
    start = int(os.environ.get("CUGRAPH_TPU_LADDER_START", 0))
    if cdir is not None:
        poskey = _layout_cache_key(
            dsts, srcs, None, num_vertices, cfg, 0.0, num_src_vertices
        )
        rung_path = os.path.join(cdir, f"spmv2_rung_{poskey}.json")
        if not start:
            try:
                with open(rung_path) as f:
                    start = int(f.read().strip())
            except (OSError, ValueError):
                pass
    start = min(max(start, 0), len(attempts) - 1)

    def _note_rung(ai):
        if rung_path is not None:
            try:
                with open(rung_path, "w") as f:
                    f.write(str(ai))
            except OSError:
                pass

    for ai, (bnum, heavy, split, cfg_a) in enumerate(attempts):
        if ai < start:
            continue
        # persist progress BEFORE the attempt: a crashed/killed build (or
        # a failing rung) resumes here instead of re-burning the failed
        # full passes (each is minutes at scale 23+)
        _note_rung(ai)
        try:
            out = build_sorted_layout(
                dsts, srcs, weights, num_vertices,
                dataclasses.replace(cfg_a, heavy_dst=heavy),
                pad_weight=pad_weight,
                num_src_vertices=num_src_vertices,
                budget_num=bnum,
                split_pieces=split,
                weight_variants=(
                    list(weight_variants)
                    if weight_variants is not None
                    else None
                ),
            )
            if weight_variants is not None:
                lay, w_sibs = out
                lays = [lay] + [
                    dataclasses.replace(lay, w=wk) for wk in w_sibs
                ]
            else:
                lays = [out]
            for p, lk in zip(cpaths, lays):
                if p is not None:
                    save_sorted_layout(p, lk)
            _note_rung(ai)  # future rebuilds jump straight here
            return lays if weight_variants is not None else lays[0]
        except ValueError as exc:
            last = exc
    raise last


def sorted_layout_for(
    graph,
    cfg: Optional[Spmv2Config] = None,
    direction: str = "in",
    use_weights: bool = True,
    variant: str = "sum",
):
    """Build (and cache) the sorted-pipeline layout for a Graph.

    direction "in": y[dst] += w*x[src] (pull over the in-adjacency);
    direction "out": y[src] += w*x[dst] (push-transpose, for HITS).
    use_weights=False ignores edge weights (GNN mean/sum semantics).
    variant "sum": pad_weight 0, edge value x*w.
    variant "min": pad_weight +inf, edge value x+w (min-plus sweep for
    SSSP / BFS-predecessor; use_weights=False stores w=0 so the sweep
    returns min(x[src]) per dst).
    None when unavailable (non-TPU backend / too large).

    Engine selection: sum layouts default to the keyed (v3) engine
    (spmv3.py — fewer VPU stages, MXU reduce, ladder-free build);
    CUGRAPH_TPU_ENGINE=v2 restores the sorted pipeline. min layouts
    default to v2 (its scan+placement path has fewer stages when the
    placement succeeds); CUGRAPH_TPU_MIN_ENGINE=v3 opts into the keyed
    min path (ladder-free build — required where v2's host pass cannot
    build, e.g. the scale-24 giant range)."""
    import os as _os

    want_v3 = variant == "sum" or (
        variant == "min"
        and _os.environ.get("CUGRAPH_TPU_MIN_ENGINE", "").lower() == "v3"
    )
    if want_v3 and cfg is None:
        from .spmv3 import keyed_layout_for

        lay3 = keyed_layout_for(
            graph, direction=direction, use_weights=use_weights,
            variant=variant,
        )
        if lay3 is not None:
            return lay3
    if not sorted_layout_available(graph.num_vertices):
        return None
    adj = graph.csc() if direction == "in" else graph.csr()
    key = (id(adj.majors), direction, use_weights, variant)
    hit = _SORTED_CACHE.get(key)
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
            wts = np.zeros(e, np.float32)  # x + 0 under min
    cfg = cfg or default_config_for(graph.num_vertices)
    if _needs_src_ranges(graph.num_vertices):
        layout = build_multi_sorted_layout(
            d, s, wts, graph.num_vertices, cfg, pad_weight=pad
        )
    else:
        layout = build_sorted_layout_auto(
            d, s, wts, graph.num_vertices, cfg, pad_weight=pad
        )
    if len(_SORTED_CACHE) > 4:
        _SORTED_CACHE.clear()
    _SORTED_CACHE[key] = (adj.majors, layout)
    return layout


def sorted_layouts_prebuild(graph, specs, cfg: Optional[Spmv2Config] = None,
                            materialize: bool = True):
    """Build several weight variants of the pull layout from ONE host pass
    (routing depends only on edge positions): specs is a list of
    (use_weights, variant) pairs as accepted by sorted_layout_for. Each
    result lands in the same disk-cache slot sorted_layout_for would use,
    so later calls (possibly in another process / on the TPU backend) hit
    the cache. Returns the list of layouts (or, with materialize=False on
    a multi-range graph, the number of built ranges — the memory-bounded
    prebuild mode).

    Specs whose runtime path resolves to the keyed (v3) engine — sum
    variants by default — are prebuilt through keyed_layout_for so the
    cache keys match what sorted_layout_for will look up."""
    import os as _os

    keyed_specs = []
    v2_specs = []
    for uw, va in specs:
        want_v3 = cfg is None and (
            va == "sum"
            or (
                va == "min"
                and _os.environ.get("CUGRAPH_TPU_MIN_ENGINE", "").lower()
                == "v3"
            )
        )
        (keyed_specs if want_v3 else v2_specs).append((uw, va))
    keyed_built = []
    if keyed_specs:
        from .spmv3 import keyed_available, keyed_layout_for

        if keyed_available(graph.num_vertices):
            for uw, va in keyed_specs:
                keyed_built.append(
                    keyed_layout_for(graph, use_weights=uw, variant=va)
                )
            specs = v2_specs
            if not specs:
                return keyed_built
        # else: fall through, build everything on v2
    if not sorted_layout_available(graph.num_vertices):
        return None
    adj = graph.csc()
    e = adj.num_edges
    d = np.asarray(adj.majors)[:e].astype(np.int64)
    s = np.asarray(adj.minors)[:e].astype(np.int64)

    def wts_pad(use_weights, variant):
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
        return wts, pad

    pairs = [wts_pad(uw, va) for uw, va in specs]
    cfg = cfg or default_config_for(graph.num_vertices)
    build = (
        build_multi_sorted_layout
        if _needs_src_ranges(graph.num_vertices)
        else build_sorted_layout_auto
    )
    kw = {}
    if build is build_multi_sorted_layout and not materialize:
        kw["materialize"] = False
    out = build(
        d, s, pairs[0][0], graph.num_vertices, cfg,
        pad_weight=pairs[0][1], weight_variants=pairs[1:], **kw,
    )
    if keyed_built and isinstance(out, list):
        return keyed_built + out
    return out
