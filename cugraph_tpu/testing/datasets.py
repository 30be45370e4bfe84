"""Test datasets.

The reference bundles small classic graphs (karate, dolphins, netscience,
email-Eu-core — ref: datasets/, SURVEY.md §4.1). We load the same public
datasets from ``CUGRAPH_TPU_DATASET_DIR`` (defaulting to the reference's
read-only datasets directory when present) and fall back to generating
karate from networkx's built-in copy so CI works standalone.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..utils.dtypes import NP_VERTEX_DTYPE, NP_WEIGHT_DTYPE

DATASET_DIR = os.environ.get("CUGRAPH_TPU_DATASET_DIR") or (
    "/root/reference/datasets"
    if os.path.isdir("/root/reference/datasets")
    else None
)


def load_csv_edgelist(
    path: str, delimiter: str = " "
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    data = np.loadtxt(path, delimiter=delimiter)
    if data.ndim == 1:
        data = data[None, :]
    src = data[:, 0].astype(NP_VERTEX_DTYPE)
    dst = data[:, 1].astype(NP_VERTEX_DTYPE)
    w = data[:, 2].astype(NP_WEIGHT_DTYPE) if data.shape[1] > 2 else None
    return src, dst, w


def _load_or_none(name: str):
    if DATASET_DIR is None:
        return None
    path = os.path.join(DATASET_DIR, name)
    if not os.path.exists(path):
        return None
    return load_csv_edgelist(path)


def karate_edgelist() -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Zachary's karate club (directed single-direction edges, as the
    reference's karate.csv stores them)."""
    got = _load_or_none("karate.csv")
    if got is not None:
        return got
    import networkx as nx

    G = nx.karate_club_graph()
    e = np.array(G.edges(), dtype=NP_VERTEX_DTYPE)
    return e[:, 0], e[:, 1], np.ones(len(e), dtype=NP_WEIGHT_DTYPE)


def dolphins_edgelist():
    got = _load_or_none("dolphins.csv")
    if got is None:
        import pytest

        pytest.skip("dolphins.csv not available")
    return got


def email_eu_core_edgelist():
    got = _load_or_none("email-Eu-core.csv")
    if got is None:
        import pytest

        pytest.skip("email-Eu-core.csv not available")
    return got


def netscience_edgelist():
    got = _load_or_none("netscience.csv")
    if got is None:
        import pytest

        pytest.skip("netscience.csv not available")
    return got
