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

# Long-running tests (>= ~14 s on a 2-vCPU host, measured full-suite
# durations round 5). Deselected by default via addopts = -m "not slow"
# (pyproject.toml) so the local suite stays under ~5 min; CI overrides
# with -o addopts= and runs everything (ci.yml).
SLOW_TESTS = {
    "test_mg_louvain_hypersparse_cluster_state",
    "test_mg_leiden_random_quality",
    "test_row_spmm_empty_windows_stay_zero",
    "test_mg_sample_distribution",
    "test_row_spmm_matches_scipy",
    "test_row_spmm_unweighted_and_f_not_128",
    "test_row_spmm_bf16_precision_contract",
    "test_mg_louvain_full_dendrogram_on_mesh",
    "test_sorted_spmm_pairs_matches_oracle",
    "test_spmm_slab_chunked_streams",
    "test_multi_range_sorted_spmm_pairs",
    "test_mg_core_number_sorted_engine",
    "test_two_process_mesh_ingest_layouts_pagerank",
    "test_bfs_level_or_semantics",
    "test_multi_range_sorted_spmv",
    "test_mg_traversal_sorted_engine",
    "test_neighbor_loader",
    "test_mg_katz_eigenvector_sorted_engine",
    "test_mg_spmm_sorted_engine",
    "test_mg_wcc_sorted_engine",
    "test_mg_hits_sorted_engine",
    "test_frontier_push_by_dst_sorted_prim",
    "test_mg_pagerank_sorted_engine",
    "test_handler_mg_routing_full_surface",
    "test_sorted_spmv_matches_oracle",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.originalname in SLOW_TESTS or item.name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
