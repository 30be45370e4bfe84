"""Pallas SpMV: the hot pull-aggregate (PageRank/Katz/eigenvector) kernel.

Why: XLA-TPU lowers both 1D gather and segment-sum to near-scalar loops
(~0.1 Gedge/s measured on v5e — see bench notes in the repo log). This
kernel reformulates pull-SpMV around the two TPU-fast sparse primitives:

1. **Per-lane dynamic gather** (`tpu.dynamic_gather`): out[i,l] =
   x[idx[i,l], l]. The vertex vector is laid out as a (R, 128) table
   (vertex v at [v//128, v%128]) and every edge is placed in the VREG lane
   of its *source* vertex (lane = src % 128), so the hardware gather
   fetches one source value per lane per cycle.
2. **Windowed one-hot reduce**: edges are grouped by destination windows
   (<= CAP_V consecutive dst ids, <= LW rows x 128 lanes edge slots); a
   window's contributions reduce onto its dst range with dense VPU
   compare-select-accumulate — a bounded-size dense reduction instead of a
   serialized scatter. Window partials accumulate into the VMEM-resident
   output over the sequential grid.

This mirrors the role of the reference's degree-segmented CUDA kernels
(per_v_transform_reduce_incoming_outgoing_e.cuh:84-560): where CUDA picks
thread/warp/block-per-vertex, the TPU picks lane-bucketed gather +
windowed dense reduce.

The layout (PullLayout) is built host-side once per graph (vectorized
numpy; the native C++ builder can take over if it shows up in profiles)
and cached on the adjacency.

Current limits: single-chip V <= ~1.3M (x-table + index tile + output must
co-reside in VMEM; the 2D edge partition covers larger graphs by
construction — each device's column span is what must fit).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE

LANES = 128
LW = 8  # rows per window (window edge capacity = LW * 128)
CAP_V = 256  # max dst ids per window
# VMEM budget: x table + idx tile + out vector, f32/i32
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PullLayout:
    grow: jax.Array  # (l_tot, 128) int32: src // 128 (gather row)
    gwt: jax.Array  # (l_tot, 128) f32: edge weight (0 for padding)
    gdl: jax.Array  # (l_tot, 128) int32: dst - window_start in [0, CAP_V)
    wstart: jax.Array  # (num_windows,) int32: dst offset per window
    num_windows: int = dataclasses.field(metadata=dict(static=True))
    r_rows: int = dataclasses.field(metadata=dict(static=True))  # x table rows
    v_pad: int = dataclasses.field(metadata=dict(static=True))  # r_rows * 128
    num_vertices: int = dataclasses.field(metadata=dict(static=True))


def pallas_spmv_available(num_vertices: int) -> bool:
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # the reduce kernel keeps the whole output vector VMEM-resident
    # (the gather phase runs in XLA for now and needs no VMEM residency)
    r = -(-num_vertices // LANES)
    return r * LANES * 4 <= _VMEM_BUDGET_BYTES


_LAYOUT_CACHE: dict = {}


def pull_layout_for(graph) -> Optional["PullLayout"]:
    """Build (and cache) the pull layout for a Graph's in-adjacency.

    Returns None when the kernel path doesn't apply (non-TPU backend or
    vertex count beyond the single-chip VMEM budget)."""
    if not pallas_spmv_available(graph.num_vertices):
        return None
    adj = graph.csc()
    # Key on identity of the majors array, but keep a strong reference in
    # the entry: CPython reuses addresses after GC, so a bare id() key can
    # alias a dead graph's layout onto a new one. Holding the array pins
    # the id for the life of the cache entry; the `is` check makes a stale
    # hit impossible even across cache clears.
    key = id(adj.majors)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None and hit[0] is adj.majors:
        return hit[1]
    e = adj.num_edges
    dsts = np.asarray(adj.majors)[:e]
    srcs = np.asarray(adj.minors)[:e]
    w = None if adj.weights is None else np.asarray(adj.weights)[:e]
    layout = build_pull_layout(dsts, srcs, w, graph.num_vertices)
    if len(_LAYOUT_CACHE) > 8:
        _LAYOUT_CACHE.clear()
    _LAYOUT_CACHE[key] = (adj.majors, layout)
    return layout


def build_pull_layout(
    dsts: np.ndarray,
    srcs: np.ndarray,
    weights: Optional[np.ndarray],
    num_vertices: int,
) -> PullLayout:
    """Build the lane-bucketed windowed layout from dst-sorted COO edges."""
    e = len(dsts)
    # int32 throughout — the (2-core) ingest host pays ~4x for int64 passes
    dsts = np.asarray(dsts, dtype=np.int32)
    srcs = np.asarray(srcs, dtype=np.int32)
    w = (
        np.ones(e, dtype=NP_WEIGHT_DTYPE)
        if weights is None
        else np.asarray(weights, dtype=NP_WEIGHT_DTYPE)
    )
    # --- fixed dst windows of CAP_V ids; edge overflow -> subwindows ------
    n_base = -(-num_vertices // CAP_V)
    base_starts = np.arange(0, (n_base + 1) * CAP_V, CAP_V, dtype=np.int32)

    # --- assign each edge (base window, lane, position-in-lane) ----------
    cap_shift = CAP_V.bit_length() - 1
    lane_shift = LANES.bit_length() - 1
    wid = dsts >> cap_shift
    lane = srcs & (LANES - 1)
    key = (wid << lane_shift) | lane
    order = np.argsort(key, kind="stable")  # dst order preserved per key
    key_s = key[order]
    # position within each (window, lane) group via running group start
    first = np.ones(e, dtype=bool)
    first[1:] = key_s[1:] != key_s[:-1]
    arange_e = np.arange(e, dtype=np.int32)
    group_start_at = np.maximum.accumulate(np.where(first, arange_e, 0))
    pos = arange_e - group_start_at
    sub = pos >> (LW.bit_length() - 1)
    row = pos & (LW - 1)
    # subwindows per base window = max(sub)+1 over the window's groups;
    # the last slot of each group carries the group's max pos
    last = np.ones(e, dtype=bool)
    last[:-1] = first[1:]
    nsub = np.ones(n_base, dtype=np.int64)
    if e:
        g_sub = sub[last]  # per-group max position (groups in key order)
        g_wid = key_s[last] >> lane_shift  # non-decreasing
        wid_first = np.ones(len(g_wid), dtype=bool)
        wid_first[1:] = g_wid[1:] != g_wid[:-1]
        starts = np.nonzero(wid_first)[0]
        nsub[g_wid[starts]] = np.maximum.reduceat(g_sub, starts) + 1
    sub_off = np.zeros(n_base + 1, dtype=np.int64)
    np.cumsum(nsub, out=sub_off[1:])
    nw = int(sub_off[-1])

    win = sub_off[key_s >> lane_shift] + sub  # final window per (sorted) edge
    slot_row = win * LW + row
    l_tot = nw * LW
    # pad rows to a multiple of the gather tile (r_rows)
    r_rows = max(-(-num_vertices // LANES), 8)
    l_pad = -(-l_tot // r_rows) * r_rows

    grow = np.zeros((l_pad, LANES), dtype=NP_VERTEX_DTYPE)
    gwt = np.zeros((l_pad, LANES), dtype=NP_WEIGHT_DTYPE)
    gdl = np.zeros((l_pad, LANES), dtype=NP_VERTEX_DTYPE)
    lane_s = lane[order]
    grow[slot_row, lane_s] = (srcs[order] >> 7).astype(NP_VERTEX_DTYPE)
    gwt[slot_row, lane_s] = w[order]
    gdl[slot_row, lane_s] = (
        dsts[order] - base_starts[key_s >> lane_shift]
    ).astype(NP_VERTEX_DTYPE)

    wstart = np.repeat(base_starts[:-1], nsub).astype(NP_VERTEX_DTYPE)
    return PullLayout(
        grow=jnp.asarray(grow),
        gwt=jnp.asarray(gwt),
        gdl=jnp.asarray(gdl),
        wstart=jnp.asarray(wstart),
        num_windows=nw,
        r_rows=int(r_rows),
        v_pad=int(r_rows * LANES),
        num_vertices=int(num_vertices),
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _make_reduce_kernel():
    from jax.experimental import pallas as pl

    cap_rows = CAP_V // LANES

    def kernel(wstart_ref, vals_ref, gdl_ref, out_ref):
        w = pl.program_id(0)

        @pl.when(w == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        vals = vals_ref[:]  # (LW, 128)
        gdl = gdl_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CAP_V, LANES), 0)
        acc = jnp.zeros((CAP_V, LANES), jnp.float32)
        for l in range(LW):
            acc = acc + jnp.where(gdl[l][None, :] == iota, vals[l][None, :], 0.0)
        # (CAP_V,) window result laid out as cap_rows x 128 output rows:
        # vertex (start + i) lives at out[(start + i) // 128, (start+i) % 128]
        # and start is CAP_V-aligned, so the window is a whole-row slice.
        win_out = jnp.sum(acc, axis=1).reshape(cap_rows, LANES)
        row0 = pl.multiple_of(wstart_ref[w] // LANES, cap_rows)
        cur = out_ref[pl.ds(row0, cap_rows), :]
        out_ref[pl.ds(row0, cap_rows), :] = cur + win_out

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def pull_spmv(layout: PullLayout, x: jax.Array, *, interpret: bool = False):
    """out[v] = sum over incoming edges (u -> v) of w_uv * x[u].

    x: (num_vertices,) f32. Returns (num_vertices,) f32.

    Phase 1 (gather x[src] into the lane-slot layout) currently runs as an
    XLA gather: Mosaic's tpu.dynamic_gather is single-vreg-only today
    ("Multiple source vregs along gather dimension"), so the in-kernel
    per-lane table gather waits on a paged implementation. Phase 2 (the
    windowed reduce — the serialized-scatter half of the XLA lowering) is
    the Pallas kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = layout.r_rows
    v_pad = layout.v_pad
    x_pad = jnp.zeros(v_pad, x.dtype).at[: layout.num_vertices].set(x)

    lane = jax.lax.broadcasted_iota(jnp.int32, layout.grow.shape, 1)
    flat_idx = layout.grow * LANES + lane
    vals = jnp.take(x_pad, flat_idx) * layout.gwt

    # windowed reduce with scalar-prefetched window starts
    out_rows = v_pad // LANES + CAP_V // LANES  # slack rows for last window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(layout.num_windows,),
        in_specs=[
            pl.BlockSpec((LW, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LW, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, LANES), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _make_reduce_kernel(),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32),
        interpret=interpret,
    )(
        layout.wstart,
        vals[: layout.num_windows * LW],
        layout.gdl[: layout.num_windows * LW],
    )
    return out.reshape(-1)[: layout.num_vertices]
