"""Canonical dtypes.

The reference compiles every algorithm for {int32,int64 vertex} x {int32,int64
edge} x {float,double} (SURVEY.md §2.4). On TPU, int32 / float32 are the native
widths; int64/float64 work on the CPU backend (used in tests) and are supported
as opt-in. Weights accumulate in float32 by default to match the reference's
weight_t accumulation (SURVEY.md §7 "Numerical parity").
"""

import jax.numpy as jnp
import numpy as np

VERTEX_DTYPE = jnp.int32
EDGE_DTYPE = jnp.int32
WEIGHT_DTYPE = jnp.float32

NP_VERTEX_DTYPE = np.int32
NP_WEIGHT_DTYPE = np.float32

# Alignment for padded edge arrays: last-dim lane width of the TPU VPU/MXU.
LANE = 128
SUBLANE_F32 = 8


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
