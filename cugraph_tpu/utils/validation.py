"""Expensive input validation behind a debug flag.

ref: every public reference function takes ``do_expensive_check`` gating
O(V+E) validation (e.g. per_v_transform_reduce_incoming_outgoing_e.cuh:1087)
— the de-facto sanitizer (SURVEY.md §5). Enable globally with
``cugraph_tpu.utils.validation.set_expensive_checks(True)`` or the
CUGRAPH_TPU_EXPENSIVE_CHECKS=1 env var.
"""

from __future__ import annotations

import os

import numpy as np

from .error import expects

_ENABLED = os.environ.get("CUGRAPH_TPU_EXPENSIVE_CHECKS", "0") == "1"


def expensive_checks_enabled() -> bool:
    return _ENABLED


def set_expensive_checks(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = bool(enabled)


def check_edgelist(src, dst, weight, num_vertices: int) -> None:
    """O(E) range/NaN validation (ref: create_graph_from_edgelist checks)."""
    if not _ENABLED:
        return
    src = np.asarray(src)
    dst = np.asarray(dst)
    expects(src.min(initial=0) >= 0, "negative src vertex id")
    expects(dst.min(initial=0) >= 0, "negative dst vertex id")
    expects(
        src.max(initial=-1) < num_vertices, "src vertex id out of range"
    )
    expects(
        dst.max(initial=-1) < num_vertices, "dst vertex id out of range"
    )
    if weight is not None:
        w = np.asarray(weight)
        expects(bool(np.isfinite(w).all()), "non-finite edge weight")


def check_vertex_values(values, num_vertices: int, name: str = "values") -> None:
    if not _ENABLED:
        return
    v = np.asarray(values)
    expects(
        v.shape[0] == num_vertices,
        f"{name}: expected leading dim {num_vertices}, got {v.shape[0]}",
    )
    if np.issubdtype(v.dtype, np.floating):
        expects(bool(np.isfinite(v).all()), f"{name}: non-finite entries")
