"""Hungarian linear assignment.

ref: cpp/src/linear_assignment/hungarian.cu (406 LoC — Date/Nagi via
raft::lap). Host path via scipy's C implementation of the same problem,
taking a bipartite graph expressed as (workers, tasks) edge weights like
the reference's API (algorithms.hpp hungarian)."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.optimize as spo

from ..core.csr import Graph
from ..core.convert import decompress_to_edgelist
from ..utils.dtypes import NP_VERTEX_DTYPE
from ..utils.error import expects


def hungarian(g: Graph, workers: np.ndarray) -> Tuple[float, np.ndarray]:
    """Optimal assignment of ``workers`` (vertex subset) to the remaining
    task vertices, minimizing total edge weight. Returns (cost,
    assignments) where assignments[i] is the task vertex assigned to
    workers[i].

    HOST FALLBACK: scipy's LAP solver on host, not the TPU (the
    reference delegates to raft::lap the same way)."""
    expects(g.weighted, "hungarian requires edge weights")
    workers = np.asarray(workers, dtype=NP_VERTEX_DTYPE)
    src, dst, w = decompress_to_edgelist(g)
    tasks = np.setdiff1d(np.unique(dst), workers)
    big = 1e9
    cost = np.full((len(workers), len(tasks)), big)
    # vectorized (worker, task) matrix fill (dense cost is inherent to the
    # LAP formulation — bounded by len(workers)*len(tasks), same as the
    # reference's raft::lap dense solver)
    ws = np.sort(workers)
    ts = np.sort(tasks)
    wi = np.searchsorted(ws, np.clip(src, ws.min(initial=0), ws.max(initial=0)))
    ti = np.searchsorted(ts, np.clip(dst, ts.min(initial=0), ts.max(initial=0)))
    wi = np.minimum(wi, len(ws) - 1)
    ti = np.minimum(ti, len(ts) - 1)
    ok = (ws[wi] == src) & (ts[ti] == dst)
    w_order = np.argsort(np.argsort(workers))  # map sorted pos -> original
    t_order = np.argsort(np.argsort(tasks))
    cost[w_order[wi[ok]], t_order[ti[ok]]] = w[ok]
    rows, cols = spo.linear_sum_assignment(cost)
    total = float(cost[rows, cols].sum())
    assignment = tasks[cols].astype(NP_VERTEX_DTYPE)
    return total, assignment
