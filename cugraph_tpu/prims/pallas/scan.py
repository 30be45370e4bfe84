"""Pallas two-level prefix sum (cumsum) over flat f32 arrays.

Building block for the gather-free SpMV pipeline (docs/PERFORMANCE.md
"Round-2 kernel plan"): the expand step turns x[src] for src-sorted edges
into diff-scatter + THIS cumsum. XLA's TPU cumsum measured 0.45 Gelem/s;
a two-level scan (within-row lane prefix + per-row offsets + a scalar
carry across sequential grid steps) should be bandwidth-shaped.

Layout convention: the flat array is viewed row-major as (rows, 128); the
prefix order is row-major flattened order (element (r, l) has rank
r*128 + l), matching `arr.reshape(-1)`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
TILE_ROWS = 1536  # ~0.75 MB f32 per tile (VMEM-bounded; fewer grid steps)


def _log_step_cumsum(x: jax.Array, axis: int) -> jax.Array:
    """Inclusive prefix sum along an axis via log-step shifted adds
    (Mosaic has no cumsum primitive; roll + iota mask is all vreg ops)."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    shift = 1
    while shift < n:
        shifted = pltpu.roll(x, shift, axis=axis)
        x = x + jnp.where(idx >= shift, shifted, 0.0)
        shift *= 2
    return x


def _scan_kernel(x_ref, out_ref, carry_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = jnp.float32(0.0)

    x = x_ref[:]  # (T, 128)
    lane_cum = _log_step_cumsum(x, axis=1)  # within-row inclusive prefix
    row_tot = lane_cum[:, -1:]  # (T, 1)
    row_off = _log_step_cumsum(row_tot, axis=0) - row_tot  # exclusive
    out_ref[:] = lane_cum + row_off + carry_ref[0]
    carry_ref[0] = carry_ref[0] + jnp.sum(row_tot)


@partial(jax.jit, static_argnames=("interpret",))
def cumsum_flat(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Inclusive prefix sum of a flat f32 array (any length; padded
    internally to TILE_ROWS*128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    chunk = TILE_ROWS * LANES
    n_pad = -(-max(n, 1) // chunk) * chunk
    xp = jnp.zeros(n_pad, jnp.float32).at[:n].set(x.astype(jnp.float32))
    x2 = xp.reshape(-1, LANES)
    n_tiles = x2.shape[0] // TILE_ROWS
    out = pl.pallas_call(
        _scan_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n]


def segment_sums_from_cumsum(
    cum: jax.Array, offsets: jax.Array, num_segments: int
) -> jax.Array:
    """Per-segment sums of contiguous sorted segments via offset diffs of
    the inclusive cumsum (the sorted-segment-sum alternative)."""
    z = jnp.concatenate([jnp.zeros(1, cum.dtype), cum])
    lo = jnp.take(z, offsets[:num_segments])
    hi = jnp.take(z, offsets[1 : num_segments + 1])
    return hi - lo
