"""Row-gather SpMM: the dst-sorted row-scan engine for feature aggregation.

y[dst, :] += w * x[src, :] with F feature lanes moving as UNITS — the
GraphSAGE aggregate substrate (ref: the GNN minibatch path, SURVEY §3.4;
cuGraph delegates to cugraph-ops CUDA SpMM kernels).

Design (replaces ALL Benes routing of the element-level spmv2 pipeline
for the SpMM case):

- sources split into RANGES of `range_rows` (the range's (range_rows,
  128) f32 feature table is VMEM-resident during its call);
- within a range, edges sorted by dst-WINDOW (W consecutive vertex ids)
  and packed into TILES of T slots, each tile inside one window;
- per tile: T dynamic-offset ROW reads from the table (measured 491 GB/s
  effective on v5e — benchmarks/microbench5_rowgather.py) scaled by the
  slot weight, then a one-hot (W, T) matmul on the MXU accumulates the
  tile into the window's running value (VMEM scratch while the window's
  tiles stream; the out block is overwritten every tile so the write-back
  on window change carries the final value);
- cross-range accumulation is a chain of per-range pallas_calls with
  input/output aliasing: each call's first tile per window reads the
  running value (the previous call's write-back — a window never recurs
  WITHIN a call, so the pre-call snapshot read is exact in both the
  interpret and the in-place TPU semantics), and unwritten window blocks
  are preserved by the aliasing. Per-range tile counts pad to power-of-2
  buckets so only a handful of grid shapes compile.

Per-pass cost at scale 21 / F=128: gather (~70 ms) + window block
traffic (~80 ms) + MXU one-hot matmuls (~15 ms) — vs 0.85 s for the
k=4 multi-stream element pipeline (docs/PERFORMANCE.md round 4).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
T_SLOTS = 256  # edges per tile (unrolled gather loop length). Grid
#   sequencing costs ~0.3 us/step on this runtime (measured: the 281K
#   tiles of the T=128 scale-21 layout carried ~80 ms of overhead), so
#   fewer, fatter tiles win as long as group padding stays small.
W_WIN = 512  # dst ids per output window
RANGE_ROWS = 1 << 17  # src rows per VMEM-resident table block (64 MB f32;
#   the block index only moves with the OUTER feature-chunk grid dim, so
#   Mosaic keeps ONE buffer and 64 MB fits the 110 MB limit). Doubling
#   from 2^16 HALVES n_ranges and with it the dominant window-flush
#   traffic (~80 ms of the 227 ms pass at scale 21). bf16 tables would
#   halve it again but Mosaic cannot lower single-row dynamic reads from
#   (16,128)-tiled bf16 ("index in dim 0 must be a multiple of 8" —
#   benchmarks/microbench6_bf16row.py).
SEG_CAP = 1 << 15  # max tiles per pallas_call (scalar prefetch <= 128 KB
#   of the 1 MB SMEM; a range splits into several calls past this)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RowSpmmLayout:
    srcs: jax.Array  # (tiles8, T) i32 range-local src row per slot
    wts: jax.Array  # (tiles8, T) f32 slot weight (0 for padding)
    dstl: jax.Array  # (tiles8, T) i32 dst - window*W in [0, W)
    winof: jax.Array  # (n_tiles,) i32 out window block per tile
    first: jax.Array  # (n_tiles,) i32 1 = window's first tile in its range
    seg_tiles: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )  # tile count per SEGMENT (quantized to 3 sizes, <= SEG_CAP)
    seg_range: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )  # source range of each segment
    n_windows: int = dataclasses.field(metadata=dict(static=True))
    n_ranges: int = dataclasses.field(metadata=dict(static=True))
    range_rows: int = dataclasses.field(metadata=dict(static=True))
    num_vertices: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return sum(self.seg_tiles)


def build_row_spmm_layout(
    dsts: np.ndarray,
    srcs: np.ndarray,
    weights: Optional[np.ndarray],
    num_vertices: int,
    num_src_vertices: Optional[int] = None,
    range_rows: int = RANGE_ROWS,
    as_numpy: bool = False,
) -> RowSpmmLayout:
    """Host pass: a few vectorized numpy sorts/scans over E (seconds at
    scale 21, vs minutes for the Benes layout build). Empty ranges get a
    minimal all-dummy segment (shapes stay static per graph)."""
    e = len(dsts)
    dsts = np.asarray(dsts, dtype=np.int64)
    srcs = np.asarray(srcs, dtype=np.int64)
    w = (
        np.ones(e, dtype=np.float32)
        if weights is None
        else np.asarray(weights, dtype=np.float32)
    )
    v = int(num_vertices)
    vs = int(num_src_vertices if num_src_vertices is not None else v)
    n_ranges = max(-(-vs // range_rows), 1)
    n_windows = max(-(-v // W_WIN), 1)

    rng_of = srcs // range_rows
    win_of = dsts // W_WIN
    group = rng_of * n_windows + win_of
    order = np.argsort(group, kind="stable")
    g_s = group[order]
    first = np.ones(e, dtype=bool)
    first[1:] = g_s[1:] != g_s[:-1]
    ar = np.arange(e, dtype=np.int64)
    start_at = np.maximum.accumulate(np.where(first, ar, 0))
    pos = ar - start_at
    tile_in_group = pos // T_SLOTS
    slot = pos % T_SLOTS

    gstarts = np.nonzero(first)[0]
    gids = g_s[gstarts]
    counts = np.diff(np.append(gstarts, e))
    ntiles_g = -(-counts // T_SLOTS)
    grange = (gids // n_windows).astype(np.int64)
    # real tiles per range; ranges split into <= SEG_CAP segments (only
    # the LAST segment of a range is bucket-padded, so within-range tiles
    # stay contiguous and only the tail carries dummies)
    real_tiles_r = np.zeros(n_ranges, dtype=np.int64)
    np.add.at(real_tiles_r, grange, ntiles_g)
    # segments quantized to THREE sizes (SEG_CAP / SEG_CAP/8 / 512) so at
    # most 3 distinct kernel shapes compile (each distinct grid is a
    # minutes-long remote compile on this runtime); <= 511 dummy tiles
    # per range
    seg_tiles: list = []
    seg_range: list = []
    padded_r = np.zeros(n_ranges, dtype=np.int64)
    mid = max(SEG_CAP // 8, 512)
    for k in range(n_ranges):
        t = int(real_tiles_r[k])
        if t == 0:
            continue  # empty range: no segments at all
        pk = 0
        while t >= SEG_CAP:
            seg_tiles.append(SEG_CAP)
            seg_range.append(k)
            t -= SEG_CAP
            pk += SEG_CAP
        while t >= mid:
            seg_tiles.append(mid)
            seg_range.append(k)
            t -= mid
            pk += mid
        while t > 0:
            seg_tiles.append(512)
            seg_range.append(k)
            t -= min(t, 512)
            pk += 512
        padded_r[k] = pk
    seg_off = np.zeros(n_ranges + 1, dtype=np.int64)
    np.cumsum(padded_r, out=seg_off[1:])
    n_tiles = int(seg_off[-1])
    # within-range tile offset per group
    goff = np.zeros(len(gids) + 1, dtype=np.int64)
    np.cumsum(ntiles_g, out=goff[1:])
    range_first_gidx = np.zeros(len(gids), dtype=np.int64)
    if len(gids):
        rf = np.ones(len(gids), dtype=bool)
        rf[1:] = grange[1:] != grange[:-1]
        range_first_gidx = np.maximum.accumulate(
            np.where(rf, np.arange(len(gids)), 0)
        )
    tile0_g = seg_off[grange] + (goff[:-1] - goff[range_first_gidx])
    gidx = np.cumsum(first) - 1  # group index per sorted edge
    gtile = tile0_g[gidx] + tile_in_group

    tiles8 = -(-max(n_tiles, 1) // 8) * 8
    srcs_a = np.zeros((tiles8, T_SLOTS), dtype=np.int32)
    wts_a = np.zeros((tiles8, T_SLOTS), dtype=np.float32)
    dstl_a = np.zeros((tiles8, T_SLOTS), dtype=np.int32)
    srcs_a[gtile, slot] = (srcs[order] - rng_of[order] * range_rows).astype(
        np.int32
    )
    wts_a[gtile, slot] = w[order]
    dstl_a[gtile, slot] = (dsts[order] - win_of[order] * W_WIN).astype(
        np.int32
    )

    # per-tile window id + group-first flag; padding tiles -> trash
    # window (index n_windows) with first=1 (w=0 slots add nothing)
    winof = np.full(n_tiles, n_windows, dtype=np.int32)
    first_t = np.ones(n_tiles, dtype=np.int32)
    for_g = np.repeat(np.arange(len(gids)), ntiles_g)
    k_in_g = np.arange(len(for_g)) - np.repeat(goff[:-1], ntiles_g)
    tvals = tile0_g[for_g] + k_in_g
    winof[tvals] = (gids[for_g] % n_windows).astype(np.int32)
    first_t[tvals] = (k_in_g == 0).astype(np.int32)
    # a window run spanning a segment boundary re-reads the running value
    # (the previous segment's write-back) at the new call's first tile
    off = 0
    for s_t in seg_tiles:
        first_t[off] = 1
        off += s_t

    conv = (lambda a: a) if as_numpy else jnp.asarray
    return RowSpmmLayout(
        srcs=conv(srcs_a),
        wts=conv(wts_a),
        dstl=conv(dstl_a),
        winof=conv(winof),
        first=conv(first_t),
        seg_tiles=tuple(int(t) for t in seg_tiles),
        seg_range=tuple(int(r_) for r_ in seg_range),
        n_windows=n_windows,
        n_ranges=n_ranges,
        range_rows=int(range_rows),
        num_vertices=v,
        num_edges=e,
    )


def _range_call(
    seg, rk, winof_seg, first_seg, srcs_seg, wts_seg, dstl_seg,
    table, prev, n_chunks, interpret, precision,
):
    """One range's tiles: grid (n_chunks, seg); prev aliased to out."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del rk  # range id is baked into the table slice

    def kern(winof_ref, first_ref, srcs_ref, wts_ref, dstl_ref,
             x_ref, prev_ref, o_ref, g_ref, acc_ref):
        t = pl.program_id(1)
        r = t % 8
        # pure row moves: the slot weight is folded into the one-hot
        # matrix below, so gathered rows go to scratch untouched (and the
        # bf16 table path never upconverts)
        for i in range(T_SLOTS):
            g_ref[pl.ds(i, 1), :] = x_ref[pl.ds(srcs_ref[r, i], 1), :]
        dl = dstl_ref[pl.ds(r, 1), :]  # (1, T) i32
        wv = wts_ref[pl.ds(r, 1), :]  # (1, T) f32
        iota = jax.lax.broadcasted_iota(jnp.int32, (W_WIN, T_SLOTS), 0)
        ohw = jnp.where(iota == dl, wv, 0.0)  # weighted one-hot
        scratch = g_ref[:]
        if precision == "bf16":
            part = jnp.dot(
                ohw.astype(jnp.bfloat16),
                scratch.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            # In-kernel f32 jnp.dot defaults to single-pass bf16 MXU
            # products on TPU (~3e-2 rel err measured, PERFORMANCE.md
            # round 4); HIGHEST forces the 3-pass exact decomposition.
            # CPU/interpret dots are exact either way, so CI can't see
            # the difference — the on-chip probe in
            # benchmarks/probe_f32_precision.py verifies it.
            part = jnp.dot(
                ohw, scratch.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        first = first_ref[t] == 1

        # accumulate in SCRATCH (persists across grid steps by contract);
        # the out block is overwritten every tile, so the write-back on
        # window change carries the window's final running value. A
        # window never recurs within a call, so prev's pre-call snapshot
        # is the exact running value at each group start.
        @pl.when(first)
        def _():
            acc_ref[:] = prev_ref[:] + part

        @pl.when(~first)
        def _():
            acc_ref[:] = acc_ref[:] + part

        o_ref[:] = acc_ref[:]

    rr = table.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, seg),
        in_specs=[
            pl.BlockSpec(
                (8, T_SLOTS),
                lambda c, i, *_: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            # wts rides VMEM: read as a (1, T) vector into the weighted
            # one-hot (folding the scale into the MXU operand)
            pl.BlockSpec((8, T_SLOTS), lambda c, i, *_: (i // 8, 0)),
            pl.BlockSpec((8, T_SLOTS), lambda c, i, *_: (i // 8, 0)),
            pl.BlockSpec((rr, LANES), lambda c, i, *_: (0, c)),
            pl.BlockSpec(
                (W_WIN, LANES), lambda c, i, wf, _f: (wf[i], c)
            ),
        ],
        out_specs=pl.BlockSpec(
            (W_WIN, LANES), lambda c, i, wf, _f: (wf[i], c)
        ),
        scratch_shapes=[
            pltpu.VMEM((T_SLOTS, LANES), table.dtype),
            pltpu.VMEM((W_WIN, LANES), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(prev.shape, jnp.float32),
        input_output_aliases={6: 0},  # prev (2 scalars + 4 ins) -> out
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(winof_seg, first_seg, srcs_seg, wts_seg, dstl_seg, table, prev)


_ROW_CACHE: dict = {}


def row_spmm_available(num_vertices: int) -> bool:
    import os

    if jax.default_backend() not in ("tpu", "axon") and not os.environ.get(
        "CUGRAPH_TPU_FORCE_SORTED"
    ):
        return False
    return num_vertices <= 1 << 25


def row_spmm_layout_for(graph, use_weights: bool = True):
    """Build (and cache) the row-SpMM layout for a Graph's in-adjacency.

    None when unavailable (non-TPU backend / graph too large). The host
    build is a few numpy passes (seconds at scale 21) and additionally
    persists to the spmv2 disk cache directory keyed by content hash."""
    if not row_spmm_available(graph.num_vertices):
        return None
    rr = RANGE_ROWS
    adj = graph.csc()
    key = (id(adj.majors), use_weights, rr)
    hit = _ROW_CACHE.get(key)
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
    layout = _cached_build(d, s, wts, graph.num_vertices, rr)
    if len(_ROW_CACHE) > 4:
        _ROW_CACHE.clear()
    _ROW_CACHE[key] = (adj.majors, layout)
    return layout


_STATIC_META = (
    "seg_tiles", "seg_range", "n_windows", "n_ranges", "range_rows",
    "num_vertices", "num_edges",
)


def _cached_build(d, s, wts, num_vertices, range_rows=RANGE_ROWS):
    import os

    from .spmv2 import _cache_dir

    cdir = _cache_dir()
    path = None
    if cdir is not None:
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        h.update(b"rowspmm-v4")  # layout depends on T_SLOTS/W_WIN too
        h.update(np.int64(num_vertices).tobytes())
        h.update(np.int64(range_rows).tobytes())
        h.update(d.tobytes())
        h.update(s.tobytes())
        if wts is not None:
            h.update(np.asarray(wts, np.float32).tobytes())
        path = os.path.join(cdir, f"spmm_row_{h.hexdigest()}.npz")
        try:
            with np.load(path) as z:
                import ast

                meta = ast.literal_eval(bytes(z["__meta__"]).decode())
                meta["seg_tiles"] = tuple(meta["seg_tiles"])
                meta["seg_range"] = tuple(meta["seg_range"])
                return RowSpmmLayout(
                    **{k: jnp.asarray(z[k]) for k in z.files if k != "__meta__"},
                    **meta,
                )
        except (OSError, KeyError, ValueError):
            pass
    layout = build_row_spmm_layout(d, s, wts, num_vertices,
                                   range_rows=range_rows,
                                   as_numpy=path is not None)
    if path is not None:
        # save from the HOST copies before any device transfer: pulling
        # a device-resident layout back with np.asarray doubles the HBM
        # footprint at the worst moment (observed RESOURCE_EXHAUSTED at
        # scale 23 with other engine layouts resident)
        arrays = {
            f.name: np.asarray(getattr(layout, f.name))
            for f in dataclasses.fields(layout)
            if f.name not in _STATIC_META
        }
        meta = {k: getattr(layout, k) for k in _STATIC_META}
        tmp = path + ".tmp.npz"
        np.savez(
            tmp,
            __meta__=np.frombuffer(repr(meta).encode(), np.uint8),
            **arrays,
        )
        os.replace(tmp, path)
        layout = dataclasses.replace(
            layout, **{k: jnp.asarray(arrays[k]) for k in arrays}
        )
    return layout


@partial(jax.jit, static_argnames=("interpret", "precision"))
def row_spmm(
    layout: RowSpmmLayout,
    x: jax.Array,
    *,
    interpret: bool = False,
    precision: str = "bf16",
):
    """y[dst, :] = sum over in-edges of w * x[src, :].

    x: (num_src, F) f32. Returns (num_vertices, F) f32. precision "bf16"
    rounds the one-hot products to bf16 with f32 accumulation (the GNN
    mixed-precision contract); "f32" requests Precision.HIGHEST, which
    Mosaic lowers to the multi-pass bf16 decomposition: ~1.6e-5 max rel
    error measured on v5e (benchmarks/probe_f32_precision.py) vs ~3e-2
    without it. Exact on CPU/interpret. The engine is gather-bound, so
    the extra MXU passes cost ~nil wall-clock."""
    n, f = x.shape
    n_chunks = max(-(-f // LANES), 1)
    RR = layout.range_rows
    xf = x if x.dtype == jnp.float32 else x.astype(jnp.float32)

    def range_table(k):
        # per-range table sliced on the fly: a full range-padded copy of
        # x doubles the (V, F) footprint (4.3 GB at scale 23 F=128 —
        # observed HBM OOM with the out buffer and layout resident)
        lo = k * RR
        take = min(RR, max(n - lo, 0))
        cols = n_chunks * LANES
        if take == RR and f == cols:
            return jax.lax.slice_in_dim(xf, lo, lo + RR)
        blk = jnp.zeros((RR, cols), jnp.float32)
        if take:
            blk = blk.at[:take, :f].set(
                jax.lax.slice_in_dim(xf, lo, lo + take)
            )
        return blk

    out = jnp.zeros(
        ((layout.n_windows + 1) * W_WIN, n_chunks * LANES), jnp.float32
    )
    off = 0
    for seg, k in zip(layout.seg_tiles, layout.seg_range):
        out = _range_call(
            seg,
            k,
            jax.lax.slice_in_dim(layout.winof, off, off + seg),
            jax.lax.slice_in_dim(layout.first, off, off + seg),
            jax.lax.slice_in_dim(layout.srcs, off, off + seg),
            jax.lax.slice_in_dim(layout.wts, off, off + seg),
            jax.lax.slice_in_dim(layout.dstl, off, off + seg),
            range_table(k),
            out,
            n_chunks,
            interpret,
            precision,
        )
        off += seg
    return out[: layout.num_vertices, :f]
