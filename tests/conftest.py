"""Test configuration: force the CPU backend with 8 virtual devices.

MG-without-a-cluster mirrors the reference's MPI-on-one-node strategy
(cpp/tests/CMakeLists.txt:82-114): our analog is an 8-device virtual CPU
mesh (SURVEY.md §4.2 "TPU translation"). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
