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
    workers[i]."""
    expects(g.weighted, "hungarian requires edge weights")
    workers = np.asarray(workers, dtype=NP_VERTEX_DTYPE)
    src, dst, w = decompress_to_edgelist(g)
    tasks = np.setdiff1d(np.unique(dst), workers)
    w_index = {int(x): i for i, x in enumerate(workers)}
    t_index = {int(x): i for i, x in enumerate(tasks)}
    big = 1e9
    cost = np.full((len(workers), len(tasks)), big)
    for s, d, ww in zip(src, dst, w):
        if int(s) in w_index and int(d) in t_index:
            cost[w_index[int(s)], t_index[int(d)]] = ww
    rows, cols = spo.linear_sum_assignment(cost)
    total = float(cost[rows, cols].sum())
    assignment = tasks[cols].astype(NP_VERTEX_DTYPE)
    return total, assignment
