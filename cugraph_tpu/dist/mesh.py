"""Device mesh helpers.

ref: the reference's subcomm_factory_t builds one global comm + row/col
subcomms (partition_manager.hpp:68-105); here a 2D jax mesh with axes
("row", "col") provides both for free — collectives name the axis.
Multi-host slices extend the same axes across DCN (SURVEY.md §2.3).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int) -> Tuple[int, int]:
    """Near-square (rows, cols) factorization, rows >= cols — mirroring the
    reference's default prows = sqrt(P) policy (dask/comms/comms.py
    subcomm_init)."""
    c = int(math.isqrt(n_devices))
    while n_devices % c:
        c -= 1
    return n_devices // c, c


def make_mesh(
    shape: Optional[Tuple[int, int]] = None, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = mesh_shape_for(len(devices))
    r, c = shape
    dev = np.asarray(devices[: r * c]).reshape(r, c)
    return Mesh(dev, axis_names=("row", "col"))
