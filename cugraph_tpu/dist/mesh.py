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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Multi-host bootstrap: initialize the jax distributed runtime so
    jax.devices() spans every host of the slice (DCN-connected v5p pods).

    The analog of the reference's comms bootstrap (MPI for C++ tests,
    mg_utilities.cpp:29-69; Dask+raft for Python, dask/comms/comms.py:82
    initialize). After this, make_mesh() lays the ("row", "col") axes
    across all processes' devices; XLA routes intra-slice collectives over
    ICI and cross-host ones over DCN — no code changes in prims.

    All arguments default to cluster-environment auto-detection
    (jax.distributed.initialize semantics); a no-op if already initialized
    or running single-process.
    """
    # NOTE: do not probe jax.process_count() here — it initializes the
    # (single-process) backend, after which distributed.initialize raises
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except (RuntimeError, ValueError):
        # single-process / no cluster env: run on local devices only
        pass


def make_global_mesh(shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Mesh over ALL processes' devices (call initialize_distributed
    first on every host). Lays "row" within a host where possible so the
    row-axis all_gather/ppermute of mg_prims rides ICI and only the
    column-merge crosses DCN."""
    devs = jax.devices()
    if shape is None:
        n_local = max(len(jax.local_devices()), 1)
        n = len(devs)
        if jax.process_count() > 1 and n % n_local == 0 and n_local > 1:
            shape = (n_local, n // n_local)  # rows within a host -> ICI
        else:
            shape = mesh_shape_for(n)
    return make_mesh(shape, devices=devs)
