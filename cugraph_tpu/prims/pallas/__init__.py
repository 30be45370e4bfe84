"""Pallas TPU kernels: the hot compute paths.

- spmv2: the sorted pipeline (Benes static routing) — the primary SpMV/
  SpMM engine, multi-Gelem/s per pass (see docs/PERFORMANCE.md).
- spmv: the v1 windowed one-hot kernel (XLA-gather bound; fallback).
- scan: two-level prefix sum building block.
- benes: Benes network routing for static on-chip permutations.
"""

from typing import Optional, Tuple

import jax


def pull_layout_auto(g, *, min_edges: int = 1 << 18):
    """Best available pull-aggregation layout for this backend/graph:
    ("sorted", SortedLayout) > ("v1", PullLayout) > (None, None).

    The returned pair can be passed into jitted algorithm bodies; the jit
    retraces per layout TYPE (pytree structure), so the selected engine is
    compile-time static."""
    if g.num_edges >= min_edges:
        from .spmv2 import sorted_layout_for

        lay = sorted_layout_for(g)
        if lay is not None:
            return "sorted", lay
        from .spmv import pull_layout_for

        l1 = pull_layout_for(g)
        if l1 is not None:
            return "v1", l1
    return None, None


def pull_aggregate(kind: Optional[str], layout, g, msg):
    """out[v] = sum over incoming edges (u -> v) of w_uv * msg[u], routed
    through the chosen engine (call inside jit; kind is trace-static)."""
    if kind == "sorted":
        from .spmv2 import sorted_spmv_dispatch

        return sorted_spmv_dispatch(layout, msg)
    if kind == "v1":
        from .spmv import pull_spmv

        return pull_spmv(layout, msg)
    from ..per_v import per_v_transform_reduce_incoming_e

    return per_v_transform_reduce_incoming_e(
        g,
        lambda s, d, sv, dv, w: sv if w is None else sv * w,
        src_values=msg,
    )
