"""Test configuration: force the CPU backend with 8 virtual devices.

MG-without-a-cluster mirrors the reference's MPI-on-one-node strategy
(cpp/tests/CMakeLists.txt:82-114): our analog is an 8-device virtual CPU
mesh (SURVEY.md §4.2 "TPU translation").

The axon sitecustomize imports jax at interpreter start, so env vars are
too late here — use jax.config (valid until the first backend
initialization, which pytest hasn't triggered yet).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
