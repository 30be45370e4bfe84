"""Distributed prims: the shard_map bodies that give MG algorithms the same
shape as SG ones.

ref comm mapping (SURVEY.md §2.3): the reference's device_bcast over
col_comm -> all_gather over mesh axis "row" (src-side values for a device's
column span); device_reduce to the owner rank -> psum_scatter over axis
"col" (each device keeps its own range's reduced values); host scalar
allreduce -> scalar psum over both axes, folded into the jitted loop.

All functions here run INSIDE shard_map over a ("row", "col") mesh. Local
array shapes: vertex state (vp,), edge blocks (C, R, g_pad) — C blocks,
each split into R src-row groups (group k holds the edges whose src lives
in [k*vp, (k+1)*vp) of the column span, dst-sorted within the group; see
mg_graph.py). The e_op signature matches the SG prims (global src/dst ids,
gathered values, weights) so algorithm bodies stay identical — the
reference's key invariant ("algorithms never talk to the communicator",
SURVEY.md §1).

Two gather modes for the src side:

- "all_gather": materialize the (R*vp,) column span per step (the
  reference's update_edge_src_property bcast over col_comm). Peak temp
  memory per device grows with R.
- "ring": a ppermute ring over the "row" axis — R steps, each holding ONE
  (vp,) chunk while reducing the matching src-row group, then rotating the
  chunk to the next row. Peak temp ∝ vp, independent of R: the TPU analog
  of the reference's bounded-memory stream-pool edge-partition loop
  (per_v_transform_reduce_incoming_outgoing_e.cuh:578-625 — "peak memory
  requirement per loop is V/comm_size"). XLA overlaps the collective
  permute with the current group's reduction.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..prims.reduce_ops import MINIMUM, PLUS, ReduceOp

ROW, COL = "row", "col"


def _axis_sizes():
    return jax.lax.axis_size(ROW), jax.lax.axis_size(COL)


def _my_coords():
    return jax.lax.axis_index(ROW), jax.lax.axis_index(COL)


def _global_edge_ids(srcs, dsts, vp):
    """Reconstruct global src/dst ids for e_op parity with SG prims.

    srcs/dsts: (C, R, g_pad) block-grouped local ids."""
    r, c = _axis_sizes()
    i, j = _my_coords()
    src_g = srcs + j * r * vp  # column-span offset
    b = jax.lax.broadcasted_iota(jnp.int32, srcs.shape, 0)  # block index
    dst_g = dsts + (b * r + i) * vp  # block dst-range offset
    return src_g, dst_g


def _block_reduce_by_dst(
    e_vals: jax.Array,
    dsts: jax.Array,
    vp: int,
    reduce_op: ReduceOp,
    valid: jax.Array,
) -> jax.Array:
    """(C, R, g_pad) edge values -> (C, vp) per-block dst partials.

    dsts are sorted within each (block, group), so segment ids keyed by
    (block, group, dst) are globally sorted — the hint stays truthful."""
    c, r, _ = e_vals.shape[:3]
    ident = reduce_op.identity(e_vals.dtype)
    if e_vals.ndim > 3:
        mask = valid.reshape(valid.shape + (1,) * (e_vals.ndim - 3))
    else:
        mask = valid
    e_vals = jnp.where(mask, e_vals, ident)
    b = jax.lax.broadcasted_iota(jnp.int32, dsts.shape, 0)
    k = jax.lax.broadcasted_iota(jnp.int32, dsts.shape, 1)
    seg = (b * r + k) * (vp + 1) + dsts  # padding dst == vp -> discard bucket
    flat = reduce_op.segment(
        e_vals.reshape((-1,) + e_vals.shape[3:]),
        seg.reshape(-1),
        num_segments=c * r * (vp + 1),
        indices_are_sorted=True,
    )
    grouped = flat.reshape((c, r, vp + 1) + flat.shape[1:])[:, :, :vp]
    # fold the R groups of each block together
    out = grouped[:, 0]
    for kk in range(1, r):
        out = reduce_op.combine(out, grouped[:, kk])
    return out


def _merge_dst_partials(partials: jax.Array, reduce_op: ReduceOp) -> jax.Array:
    """(C, vp) partials -> (vp,) reduced values for this device's own range.

    PLUS rides the reduce-scatter fast path; min/max fall back to
    allreduce + slice (no pmin_scatter collective exists)."""
    c = partials.shape[0]
    if reduce_op.collective == "psum":
        flat = partials.reshape((-1,) + partials.shape[2:])
        return jax.lax.psum_scatter(flat, COL, scatter_dimension=0, tiled=True)
    if reduce_op.collective == "pmin":
        merged = jax.lax.pmin(partials, COL)
    else:
        merged = jax.lax.pmax(partials, COL)
    j = jax.lax.axis_index(COL)
    return jax.lax.dynamic_index_in_dim(merged, j, axis=0, keepdims=False)


def _bucket_by(dest: jax.Array, valid: jax.Array, n_buckets: int, capacity: int):
    """Group items into fixed-capacity buckets by destination id.

    Returns (slot_of_item (n,), kept (n,), counts (n_buckets,)) where
    slot = dest * capacity + within-bucket rank; items past capacity are
    dropped (kept=False) and reported via counts for overflow checks."""
    n = dest.shape[0]
    d = jnp.where(valid, dest, n_buckets)  # invalid -> discard bucket
    order = jnp.argsort(d, stable=True)
    d_sorted = jnp.take(d, order)
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), d_sorted[1:] != d_sorted[:-1]]
    )
    start_at = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, 0)
    )
    rank_sorted = pos - start_at
    # scatter rank back to item order
    rank = jnp.zeros(n, jnp.int32).at[order].set(rank_sorted)
    kept = valid & (rank < capacity)
    slot = jnp.where(kept, jnp.minimum(dest, n_buckets - 1) * capacity + rank, 0)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), jnp.minimum(d, n_buckets), num_segments=n_buckets + 1
    )[:n_buckets]
    return slot, kept, counts


def _shuffle_axis(items: Any, dest: jax.Array, valid: jax.Array, axis: str, capacity: int):
    """One-axis bucketed all_to_all (the reference's shuffle_values,
    shuffle_comm.cuh:679): route (dest, item) pairs to device `dest` along
    a mesh axis with fixed per-bucket capacity.

    items: pytree of (n, ...) arrays. Returns (items_rx pytree of
    (P*capacity, ...), valid_rx (P*capacity,), overflow (scalar int))."""
    p = jax.lax.axis_size(axis)
    slot, kept, counts = _bucket_by(dest, valid, p, capacity)

    oob = p * capacity  # out-of-bounds index -> dropped by mode="drop"
    put = jnp.where(kept, slot, oob)

    def place(a):
        buf_shape = (p * capacity,) + a.shape[1:]
        return (
            jnp.zeros(buf_shape, a.dtype)
            .at[put]
            .set(a, mode="drop")
            .reshape((p, capacity) + a.shape[1:])
        )

    sent = jax.tree.map(place, items)
    vbuf = (
        jnp.zeros(p * capacity, jnp.bool_)
        .at[put]
        .set(kept, mode="drop")
        .reshape(p, capacity)
    )
    rx = jax.tree.map(
        lambda a: jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=0),
        sent,
    )
    v_rx = jax.lax.all_to_all(vbuf, axis, split_axis=0, concat_axis=0)
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0))
    overflow = jax.lax.psum(jax.lax.psum(overflow, ROW), COL)
    flat = jax.tree.map(lambda a: a.reshape((p * capacity,) + a.shape[2:]), rx)
    return flat, v_rx.reshape(-1), overflow


def shuffle_to_vertex_owners(
    keys: jax.Array,
    items: Any,
    valid: jax.Array,
    vp: int,
    capacity: int,
):
    """Route (global vertex key, item) pairs to the key owner device via
    two bucketed all_to_all stages (column first, then row) — the runtime
    analog of groupby_gpu_id_and_shuffle_values (shuffle_comm.cuh:729).

    capacity is PER BUCKET per stage. Returns (keys_rx, items_rx,
    valid_rx, overflow): arrays of C*capacity... then R*capacity items
    after the second stage; overflow counts items dropped anywhere
    (globally psummed — callers re-run with a larger capacity when > 0,
    the reference's count-then-exchange two-pass, mem_frugal_partition
    shuffle_comm.cuh:367)."""
    r, c = _axis_sizes()
    # owner of vertex v: q = v // vp; i = q % R, j = q // R
    q = keys // vp
    dest_col = q // r
    pack = dict(items)
    pack["__key"] = keys
    pack1, valid1, ov1 = _shuffle_axis(pack, dest_col, valid, COL, capacity)
    keys1 = pack1["__key"]
    dest_row = (keys1 // vp) % r
    pack2, valid2, ov2 = _shuffle_axis(pack1, dest_row, valid1, ROW, capacity)
    keys2 = pack2.pop("__key")
    return keys2, pack2, valid2, ov1 + ov2


def collect_values_for_keys(
    keys: jax.Array,
    valid: jax.Array,
    values_local: jax.Array,
    vp: int,
    capacity: int,
):
    """Distributed kv gather: fetch values_local[key] from each key's owner
    for arbitrary global keys (the reference's collect_values_for_keys,
    collect_comm.cuh:57, minus the cuco hash map — ownership is range
    math here).

    Returns (values (n, ...), found (n,), overflow). Requests route to
    owners via the bucketed shuffle, answers route back to the requester
    by (device, slot) return address."""
    r, c = _axis_sizes()
    i, j = _my_coords()
    n = keys.shape[0]
    me = j * r + i  # flat device id (column-major like vertex ranges)
    ret_addr = jnp.full(n, me, jnp.int32)
    ret_slot = jnp.arange(n, dtype=jnp.int32)
    k_rx, pack, v_rx, ov = shuffle_to_vertex_owners(
        keys,
        {"addr": ret_addr, "slot": ret_slot},
        valid,
        vp,
        capacity,
    )
    # owner lookup
    local = k_rx - (j * r + i) * vp
    safe = jnp.clip(local, 0, values_local.shape[0] - 1)
    ans = jnp.take(values_local, safe, axis=0)
    ok = v_rx & (local >= 0) & (local < vp)
    # route answers back: two-stage shuffle keyed by the return address
    back = {"val": ans, "slot": pack["slot"], "addr": pack["addr"]}
    dest_col2 = pack["addr"] // r
    b1, bv1, ov3 = _shuffle_axis(back, dest_col2, ok, COL, capacity)
    dest_row2 = b1["addr"] % r
    b2, bv2, ov4 = _shuffle_axis(b1, dest_row2, bv1, ROW, capacity)
    out_shape = (n,) + values_local.shape[1:]
    out = jnp.zeros(out_shape, values_local.dtype)
    slot2 = jnp.where(bv2, b2["slot"], n)
    out = out.at[slot2].set(
        jnp.where(
            bv2.reshape((-1,) + (1,) * (len(out_shape) - 1)), b2["val"], 0
        ),
        mode="drop",
    )
    found = jnp.zeros(n, jnp.bool_).at[slot2].set(bv2, mode="drop")
    return out, found, ov + ov3 + ov4


def collect_values_for_unique_keys(
    keys: jax.Array,
    valid: jax.Array,
    values_local: jax.Array,
    vp: int,
    capacity: int,
):
    """collect_values_for_keys with local key dedup first (the
    reference's collect_values_for_unique_keys, collect_comm.cuh:187):
    each distinct key is requested once per device, so a popular key's
    owner receives at most one request per device instead of one per
    local occurrence — the bound that keeps fixed shuffle capacities
    honest under skew (e.g. Louvain labels concentrating)."""
    n = keys.shape[0]
    big = jnp.int32(1 << 30)
    k = jnp.where(valid, keys, big)
    order = jnp.argsort(k)
    k_s = jnp.take(k, order)
    first = jnp.concatenate([jnp.ones((1,), bool), k_s[1:] != k_s[:-1]])
    req = jnp.where(first, k_s, 0)
    req_valid = first & (k_s < big)
    vals_u, found_u, ov = collect_values_for_keys(
        req, req_valid, values_local, vp, capacity
    )
    # answers land at the request SLOT (= sorted position of each run's
    # first element); broadcast down the run
    pos = jnp.arange(n, dtype=jnp.int32)
    first_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, 0)
    )
    vals_sorted = jnp.take(vals_u, first_pos, axis=0)
    found_sorted = jnp.take(found_u, first_pos)
    out_shape = (n,) + values_local.shape[1:]
    out = jnp.zeros(out_shape, values_local.dtype).at[order].set(vals_sorted)
    found = jnp.zeros(n, jnp.bool_).at[order].set(found_sorted)
    return out, found & valid, ov


def cluster_weight_sums(
    labels: jax.Array,
    k_local: jax.Array,
    vmask: jax.Array,
    vp: int,
    capacity: int,
):
    """Hypersparse distributed cluster-weight store: sigma[c] = sum of
    k over vertices labeled c, held by c's OWNER device (cluster ids are
    vertex ids, so ownership is range math). Local (label, k)
    contributions are run-aggregated (sort + segment sum) before the
    owner shuffle, so each device sends at most its distinct-label count.

    Returns (sigma_own (vp,), overflow). The keyed replacement for the
    dense (vtot,) replicated sigma (ref: the cuco static_map inside
    per_v_transform_reduce_dst_key_aggregated_outgoing_e.cuh)."""
    n = labels.shape[0]
    big = jnp.int32(1 << 30)
    lab = jnp.where(vmask, labels, big)
    order = jnp.argsort(lab)
    l_s = jnp.take(lab, order)
    k_s = jnp.take(jnp.where(vmask, k_local, 0.0), order)
    first = jnp.concatenate([jnp.ones((1,), bool), l_s[1:] != l_s[:-1]])
    rid = jnp.cumsum(first.astype(jnp.int32)) - 1
    agg = jax.ops.segment_sum(
        k_s, rid, num_segments=n, indices_are_sorted=True
    )
    run_valid = first & (l_s < big)
    run_k = jnp.take(agg, rid) * first  # value at run starts only
    keys_rx, pack, v_rx, ov = shuffle_to_vertex_owners(
        l_s, {"k": run_k}, run_valid, vp, capacity
    )
    r, c = _axis_sizes()
    i, j = _my_coords()
    local = keys_rx - (j * r + i) * vp
    ok = v_rx & (local >= 0) & (local < vp)
    slot = jnp.where(ok, local, vp)
    sigma_own = (
        jnp.zeros(vp + 1, k_local.dtype)
        .at[slot]
        .add(jnp.where(ok, pack["k"], 0.0))[:vp]
    )
    return sigma_own, ov


def dcsr_lookup(nzd: jax.Array, nzd_offsets: jax.Array, local_ids: jax.Array):
    """Hypersparse (DCSR) adjacency lookup: (lo, deg) for colspan-local
    src ids. nzd is the sorted list of sources with >=1 local edge
    (padding = span sorts last); absent sources get deg 0.

    ref: the use_dcs() path — major_hypersparse_idx_from_major binary
    search (edge_partition_device_view.cuh:44-79)."""
    pos = jnp.searchsorted(nzd, local_ids)
    safe = jnp.minimum(pos, nzd.shape[0] - 1)
    found = jnp.take(nzd, safe) == local_ids
    lo = jnp.take(nzd_offsets, safe)
    hi = jnp.take(nzd_offsets, safe + 1)
    deg = jnp.where(found, hi - lo, 0)
    return lo, deg


def gather_src_values(values_local: Any) -> Any:
    """Local (vp, ...) vertex values -> column-span (R*vp, ...) values.

    The reference's update_edge_src_property bcast over col_comm."""
    if values_local is None:
        return None
    return jax.tree.map(
        lambda a: jax.lax.all_gather(a, ROW, axis=0, tiled=True), values_local
    )


def gather_dst_values(values_local: Any) -> Any:
    """Local (vp, ...) -> (C, vp, ...): dst-range values for each block.

    Block b's dst range (q = b*R + i) is owned by device (i, b), so an
    all_gather over "col" delivers exactly the C block ranges.
    The reference's update_edge_dst_property over row_comm."""
    if values_local is None:
        return None
    return jax.tree.map(
        lambda a: jax.lax.all_gather(a, COL, axis=0, tiled=False), values_local
    )


def _take_dst_blocks(blocks: Any, dsts: jax.Array, vp: int) -> Any:
    """Per-edge dst values from (C, vp, ...) block ranges; dsts (C, R, g)."""
    c = dsts.shape[0]
    flat = dsts.reshape(c, -1)
    safe = jnp.minimum(flat, vp - 1)

    def take_block(a):
        out = jnp.take_along_axis(
            a, safe.reshape(safe.shape + (1,) * (a.ndim - 2)), axis=1
        )
        return out.reshape(dsts.shape + a.shape[2:])

    return jax.tree.map(take_block, blocks)


def _edge_values(
    srcs,
    dsts,
    weights,
    vp: int,
    e_op: Callable,
    src_values_local: Any,
    dst_values_local: Any,
):
    src_g, dst_g = _global_edge_ids(srcs, dsts, vp)
    sv = dv = None
    if src_values_local is not None:
        span = gather_src_values(src_values_local)
        sv = jax.tree.map(lambda a: jnp.take(a, srcs, axis=0), span)
    if dst_values_local is not None:
        blocks = gather_dst_values(dst_values_local)  # (C, vp, ...)
        dv = _take_dst_blocks(blocks, dsts, vp)
    return e_op(src_g, dst_g, sv, dv, weights)


def per_v_transform_reduce_incoming_e(
    srcs,
    dsts,
    weights,
    vp: int,
    e_op: Callable,
    *,
    reduce_op: ReduceOp = PLUS,
    init: Any = None,
    src_values: Any = None,
    dst_values: Any = None,
    mode: str = "all_gather",
) -> jax.Array:
    """MG pull-reduce: returns (vp, ...) values for this device's own range.

    ref: per_v_transform_reduce_incoming_outgoing_e.cuh update_major path
    (:915-966): local per-block segment reduce + reduce to owner.
    mode="ring" bounds peak src-value temp memory to one (vp,) chunk."""
    if mode == "ring" and src_values is not None:
        return _incoming_e_ring(
            srcs, dsts, weights, vp, e_op, reduce_op, init, src_values, dst_values
        )
    e_vals = _edge_values(srcs, dsts, weights, vp, e_op, src_values, dst_values)
    valid = dsts < vp
    partials = _block_reduce_by_dst(e_vals, dsts, vp, reduce_op, valid)
    out = _merge_dst_partials(partials, reduce_op)
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out


def _incoming_e_ring(
    srcs, dsts, weights, vp, e_op, reduce_op, init, src_values, dst_values
):
    """Bounded-memory pull-reduce: R ppermute steps over the "row" axis.

    Step t holds the (vp,) src-value chunk of mesh row k = (i + t) mod R
    and reduces exactly group k of every block (group k's srcs live in
    [k*vp, (k+1)*vp)), then forwards the chunk to the previous row — so
    the chunk from row k reaches row i at step t = (k - i) mod R. Peak
    src-side temp = one chunk, vs the R*vp column span of all_gather."""
    r, c = _axis_sizes()
    i, j = _my_coords()
    g_pad = srcs.shape[-1]
    dv_blocks = gather_dst_values(dst_values) if dst_values is not None else None
    # ring: send to previous row; after t steps we hold row (i + t)'s chunk
    perm = [(p, (p - 1) % r) for p in range(r)]
    ident = None

    def one_group(k, chunk, acc):
        """Reduce src-row group k of every block with chunk = row k's
        (vp, ...) src values; accumulate (C, vp) partials."""
        s_k = jax.lax.dynamic_index_in_dim(srcs, k, axis=1, keepdims=False)
        d_k = jax.lax.dynamic_index_in_dim(dsts, k, axis=1, keepdims=False)
        w_k = (
            None
            if weights is None
            else jax.lax.dynamic_index_in_dim(weights, k, axis=1, keepdims=False)
        )
        src_g = s_k + j * r * vp
        b = jax.lax.broadcasted_iota(jnp.int32, s_k.shape, 0)
        dst_g = d_k + (b * r + i) * vp
        s_local = jnp.clip(s_k - k * vp, 0, vp - 1)  # padding slots clamp
        sv = jax.tree.map(lambda a: jnp.take(a, s_local, axis=0), chunk)
        dv = (
            None
            if dv_blocks is None
            else _take_dst_blocks(dv_blocks, d_k[:, None, :], vp)
        )
        dv = None if dv is None else jax.tree.map(lambda a: a[:, 0], dv)
        e_vals = e_op(src_g, dst_g, sv, dv, w_k)
        idn = reduce_op.identity(e_vals.dtype)
        valid = d_k < vp
        if e_vals.ndim > 2:
            valid = valid.reshape(valid.shape + (1,) * (e_vals.ndim - 2))
        e_vals = jnp.where(valid, e_vals, idn)
        bb = jax.lax.broadcasted_iota(jnp.int32, d_k.shape, 0)
        seg = bb * (vp + 1) + d_k
        part = reduce_op.segment(
            e_vals.reshape((-1,) + e_vals.shape[2:]),
            seg.reshape(-1),
            num_segments=c * (vp + 1),
            indices_are_sorted=True,
        ).reshape((c, vp + 1) + e_vals.shape[2:])[:, :vp]
        return reduce_op.combine(acc, part) if acc is not None else part

    # step 0 processes my own row's chunk (no communication)
    chunk = src_values
    acc = one_group(i, chunk, None)
    for t in range(1, r):
        chunk = jax.tree.map(lambda a: jax.lax.ppermute(a, ROW, perm), chunk)
        k = (i + t) % r
        acc = one_group(k, chunk, acc)
    out = _merge_dst_partials(acc, reduce_op)
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out


def per_v_transform_reduce_outgoing_e(
    srcs,
    dsts,
    weights,
    vp: int,
    e_op: Callable,
    *,
    reduce_op: ReduceOp = PLUS,
    init: Any = None,
    src_values: Any = None,
    dst_values: Any = None,
) -> jax.Array:
    """MG push-reduce (reduce by src): partials over the column span merge
    with psum_scatter over "row" (the update_minor path, :972-1037)."""
    r, c = _axis_sizes()
    e_vals = _edge_values(srcs, dsts, weights, vp, e_op, src_values, dst_values)
    valid = dsts < vp
    ident = reduce_op.identity(e_vals.dtype)
    if e_vals.ndim > 3:
        mask = valid.reshape(valid.shape + (1,) * (e_vals.ndim - 3))
    else:
        mask = valid
    e_vals = jnp.where(mask, e_vals, ident)
    span = r * vp
    seg = jnp.where(valid, srcs, span)
    partial = reduce_op.segment(
        e_vals.reshape((-1,) + e_vals.shape[3:]),
        seg.reshape(-1),
        num_segments=span + 1,
    )[:span]
    if reduce_op.collective == "psum":
        out = jax.lax.psum_scatter(partial, ROW, scatter_dimension=0, tiled=True)
    else:
        merged = (
            jax.lax.pmin(partial, ROW)
            if reduce_op.collective == "pmin"
            else jax.lax.pmax(partial, ROW)
        )
        i = jax.lax.axis_index(ROW)
        out = jax.lax.dynamic_slice_in_dim(merged, i * vp, vp, axis=0)
    if init is not None:
        out = reduce_op.combine(out, jnp.asarray(init, dtype=out.dtype))
    return out


def transform_reduce_v(values_local: jax.Array, v_op: Callable = None) -> jax.Array:
    """Global scalar reduction of per-vertex values (PLUS); stays on device.

    The reference pays a host allreduce here (host_scalar_comm.hpp); we
    fold a two-axis psum into the jitted loop."""
    vals = values_local if v_op is None else v_op(values_local)
    local = jnp.sum(vals, axis=0)
    return jax.lax.psum(jax.lax.psum(local, ROW), COL)


def frontier_push_by_dst(
    srcs,
    dsts,
    weights,
    vp: int,
    frontier_local: jax.Array,
    e_op: Callable,
    *,
    reduce_op: ReduceOp,
    src_values: Any = None,
    dst_values: Any = None,
) -> Tuple[jax.Array, jax.Array]:
    """MG frontier push (ref transform_reduce_v_frontier_outgoing_e_by_dst:
    frontier bcast over col_comm :254, local extract, shuffle to dst owner
    :437-449 — here: all_gather "row" + masked block reduce + merge "col").

    Returns (touched_local (vp,) bool, reduced_local (vp, ...))."""
    span_mask = gather_src_values(frontier_local)  # (R*vp,)
    active = jnp.take(span_mask, srcs) & (dsts < vp)

    src_g, dst_g = _global_edge_ids(srcs, dsts, vp)
    sv = dv = None
    if src_values is not None:
        span = gather_src_values(src_values)
        sv = jax.tree.map(lambda a: jnp.take(a, srcs, axis=0), span)
    if dst_values is not None:
        blocks = gather_dst_values(dst_values)
        dv = _take_dst_blocks(blocks, dsts, vp)
    keep, payload = e_op(src_g, dst_g, sv, dv, weights)
    keep = keep & active
    # Keep the ORIGINAL (per-group dst-sorted) dsts so the sorted-scatter
    # hint inside _block_reduce_by_dst stays truthful; non-kept edges are
    # masked to the reduce identity (and to 0 for the touched count), so
    # they contribute nothing.
    partials = _block_reduce_by_dst(payload, dsts, vp, reduce_op, keep)
    reduced = _merge_dst_partials(partials, reduce_op)
    touched_part = _block_reduce_by_dst(
        keep.astype(jnp.int32), dsts, vp, PLUS, keep
    )
    touched = (
        jax.lax.psum_scatter(
            touched_part.reshape(-1), COL, scatter_dimension=0, tiled=True
        )
        > 0
    )
    return touched, reduced


def per_v_incoming_sorted(layout_local, msg, vp: int, interpret: bool = False):
    """Pull-reduce over this device's edge blocks through the sorted Benes
    pipeline (sum only): x = gathered column span, y = C stacked per-block
    dst partials, merged to the owner range. The per-device analog of the
    single-chip sorted SpMV (dist/mg_sorted.py builds the layouts)."""
    from ..prims.pallas.spmv2 import _sorted_spmv_jit

    x_span = gather_src_values(msg)  # (R*vp,)
    y = _sorted_spmv_jit(layout_local, x_span, interpret)
    partials = y.reshape(-1, vp)  # (C, vp)
    return _merge_dst_partials(partials, PLUS)


def per_v_incoming_sorted_min(
    layout_local, msg, vp: int, interpret: bool = False
):
    """Min-plus pull-reduce on per-device layouts built with
    variant="min": y[dst] = min over local in-edges of (x[src] + w), +inf
    where no in-edge improves. Serves mg_bfs level sweeps (unweighted,
    w=0: min of frontier ids) and mg_sssp Bellman-Ford relaxations."""
    from ..prims.pallas.spmv2 import _sorted_spmv_jit

    x_span = gather_src_values(msg)  # (R*vp,)
    y = _sorted_spmv_jit(layout_local, x_span, interpret, reduce="min")
    partials = y.reshape(-1, vp)  # (C, vp)
    return _merge_dst_partials(partials, MINIMUM)


def per_v_outgoing_sorted_min(
    layout_local, msg, vp: int, interpret: bool = False
):
    """Min-plus push-reduce on transposed per-device layouts
    (build_device_layouts(direction="out", variant="min")):
    y[src] = min over local out-edges of (x[dst] + w), +inf where no
    out-edge exists. The (R*vp,) column-span partials merge with pmin
    over "row" + slice (no pmin_scatter collective exists). Serves the
    mg_wcc "up" sweep (min over out-neighbor labels, w=0)."""
    from ..prims.pallas.spmv2 import _sorted_spmv_jit

    x_blocks = gather_dst_values(msg)  # (C, vp)
    y = _sorted_spmv_jit(
        layout_local, x_blocks.reshape(-1), interpret, reduce="min"
    )
    merged = jax.lax.pmin(y, ROW)
    i = jax.lax.axis_index(ROW)
    return jax.lax.dynamic_slice_in_dim(merged, i * vp, vp, axis=0)


def frontier_push_by_dst_sorted(
    layout_local,
    frontier_local: jax.Array,
    values_local: jax.Array,
    vp: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Sorted-engine fast path of frontier_push_by_dst for the common
    contract keep = "src in frontier", payload = f32 src values reduced
    by MIN (BFS pred = min frontier id with the unweighted min layout,
    w=0; SSSP relax = min(dist[src]+w) with the weighted min layout).

    x[src] = value if src in frontier else +inf, one min-plus sweep over
    the per-device blocks; touched = the reduce found ANY frontier
    in-edge (y finite). Multi-Gelem/s vs the XLA segment path's ~0.09.
    ref: extract_transform_v_frontier_e.cuh / the by-dst shuffle of
    transform_reduce_v_frontier_outgoing_e_by_dst.cuh — here the frontier
    mask is folded into the value stream, so no extract/shuffle exists.

    Returns (touched_local (vp,) bool, reduced_local (vp,) f32)."""
    from ..prims.pallas.spmv2 import _sorted_spmv_jit

    x = jnp.where(
        frontier_local,
        values_local.astype(jnp.float32),
        jnp.float32(jnp.inf),
    )
    x_span = gather_src_values(x)  # (R*vp,)
    y = _sorted_spmv_jit(layout_local, x_span, interpret, reduce="min")
    partials = y.reshape(-1, vp)  # (C, vp)
    reduced = _merge_dst_partials(partials, MINIMUM)
    return jnp.isfinite(reduced), reduced


def per_v_outgoing_sorted(layout_local, msg, vp: int, interpret: bool = False):
    """Push-reduce (sum) on the transposed per-device layouts
    (build_device_layouts direction="out"): y[src] += w * x[dst] over
    local blocks. x = the C gathered dst ranges; the (R*vp,) column-span
    partials merge with psum_scatter over "row" (the reference's
    update_minor path, per_v_transform_reduce_incoming_outgoing_e.cuh:
    972-1037). Serves mg_hits' hub update."""
    from ..prims.pallas.spmv2 import _sorted_spmv_jit

    x_blocks = gather_dst_values(msg)  # (C, vp)
    y = _sorted_spmv_jit(layout_local, x_blocks.reshape(-1), interpret)
    return jax.lax.psum_scatter(y, ROW, scatter_dimension=0, tiled=True)


def per_v_incoming_sorted_spmm(
    layout_local, feats, vp: int, interpret: bool = False
):
    """(vp, F) feature aggregation on the per-device sorted pipeline:
    multi-stream passes — k paired-bf16 columns share each routing pass's
    switch-mask extraction and route streams (sum reduce; see
    gnn/aggregators.spmm_aggregate for the precision contract)."""
    from ..prims.pallas.spmv2 import (
        LANES,
        _SORTED_VMEM_BUDGET,
        _sorted_spmm_pass_jit,
    )

    x_span = gather_src_values(feats)  # (R*vp, F)
    f = feats.shape[1]
    cols = jnp.swapaxes(x_span, 0, 1).astype(jnp.float32)  # (F, R*vp)
    tbytes = max(layout_local.x_rows * LANES * 4, 1)
    k = max(1, min(4, _SORTED_VMEM_BUDGET * 4 // tbytes, (f + 1) // 2))
    group = 2 * k
    npass = -(-f // group)
    if f % group:
        pad = jnp.zeros((npass * group - f, cols.shape[1]), cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=0)
    groups = cols.reshape(npass, group, -1)

    def one_group(g):
        return _sorted_spmm_pass_jit(layout_local, g, interpret)

    out = jax.lax.map(one_group, groups)  # (npass, group, C*vp)
    out = out.reshape(npass * group, -1)[:f]
    partials = jnp.swapaxes(out, 0, 1).reshape(-1, vp, f)  # (C, vp, F)
    return _merge_dst_partials(partials, PLUS).astype(feats.dtype)
