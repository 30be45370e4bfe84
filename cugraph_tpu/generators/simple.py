"""Simple deterministic generators + Erdos-Renyi.

ref: cpp/src/generators/simple_generators.cu (path/2D mesh/3D mesh/complete
graph, graph_generators.hpp:150-301), erdos_renyi_generator.cu,
generator_tools.cu (combine/symmetrize helpers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..utils.dtypes import NP_VERTEX_DTYPE


def path_graph_edgelist(num_vertices: int) -> Tuple[np.ndarray, np.ndarray]:
    src = np.arange(num_vertices - 1, dtype=NP_VERTEX_DTYPE)
    return src, src + 1


def complete_graph_edgelist(num_vertices: int) -> Tuple[np.ndarray, np.ndarray]:
    src, dst = np.meshgrid(
        np.arange(num_vertices, dtype=NP_VERTEX_DTYPE),
        np.arange(num_vertices, dtype=NP_VERTEX_DTYPE),
        indexing="ij",
    )
    keep = src != dst
    return src[keep], dst[keep]


def mesh_2d_edgelist(x: int, y: int) -> Tuple[np.ndarray, np.ndarray]:
    """2D grid: each vertex connects to +x and +y neighbors."""
    ids = np.arange(x * y, dtype=NP_VERTEX_DTYPE).reshape(y, x)
    s_h, d_h = ids[:, :-1].ravel(), ids[:, 1:].ravel()
    s_v, d_v = ids[:-1, :].ravel(), ids[1:, :].ravel()
    return np.concatenate([s_h, s_v]), np.concatenate([d_h, d_v])


def mesh_3d_edgelist(x: int, y: int, z: int) -> Tuple[np.ndarray, np.ndarray]:
    ids = np.arange(x * y * z, dtype=NP_VERTEX_DTYPE).reshape(z, y, x)
    pairs = [
        (ids[:, :, :-1], ids[:, :, 1:]),
        (ids[:, :-1, :], ids[:, 1:, :]),
        (ids[:-1, :, :], ids[1:, :, :]),
    ]
    src = np.concatenate([p[0].ravel() for p in pairs])
    dst = np.concatenate([p[1].ravel() for p in pairs])
    return src, dst


def erdos_renyi_gnp_edgelist(
    num_vertices: int, p: float, seed: int = 0, directed: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """G(n, p) via per-pair Bernoulli (host; small-graph test generator like
    the reference's erdos_renyi_generator.cu)."""
    rng = np.random.default_rng(seed)
    m = rng.random((num_vertices, num_vertices)) < p
    np.fill_diagonal(m, False)
    if not directed:
        m = np.triu(m)
    src, dst = np.nonzero(m)
    return src.astype(NP_VERTEX_DTYPE), dst.astype(NP_VERTEX_DTYPE)
