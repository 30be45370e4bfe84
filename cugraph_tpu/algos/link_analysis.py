"""Link analysis: PageRank (+ personalized) and HITS.

ref: cpp/src/link_analysis/pagerank_impl.cuh (power iteration :209-295,
dangling handling :218, convergence :287) and hits_impl.cuh (:18-23,:86,:106).

TPU-native: the entire power iteration runs inside one lax.while_loop —
convergence checks are device scalars, not the reference's per-iteration
host allreduces (SURVEY.md §7 "Host-free iteration"). Semantics match
NetworkX/cuGraph: L1 convergence `diff < V * tol`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.csr import Graph
from ..prims.per_v import per_v_transform_reduce_incoming_e
from ..utils.dtypes import WEIGHT_DTYPE
from ..utils.error import expects


@partial(jax.jit, static_argnames=("max_iterations", "lkind"))
def _pagerank_jit(
    g: Graph,
    alpha,
    tol,
    reset,
    pr0,
    max_iterations: int,
    lkind=None,
    pull_layout=None,
):
    v = g.num_vertices
    # uniform defaults built IN-JIT: eager jnp.full dispatches cost ~25 ms
    # each through the axon runtime (345 ms fixed per call measured)
    if reset is None:
        reset = jnp.full(v, 1.0 / v, dtype=WEIGHT_DTYPE)
    if pr0 is None:
        pr0 = jnp.full(v, 1.0 / v, dtype=WEIGHT_DTYPE)
    out_wsum = g.out_weight_sums()
    dangling = out_wsum <= 0
    inv_out = jnp.where(dangling, 0.0, 1.0 / jnp.where(dangling, 1.0, out_wsum))

    def e_op(s, d, sv, dv, w):
        # sv already carries pr/out_weight_sum; multiply by edge weight
        return sv if w is None else sv * w

    def aggregate(msg):
        from ..prims.pallas import pull_aggregate

        return pull_aggregate(lkind, pull_layout, g, msg)

    def cond(state):
        pr, diff, it = state
        return (diff > v * tol) & (it < max_iterations)

    def body(state):
        pr, _, it = state
        msg = pr * inv_out
        agg = aggregate(msg)
        # dangling mass redistributed by the reset vector (ref :218 dangling_sum)
        dangling_sum = jnp.sum(jnp.where(dangling, pr, 0.0))
        new = alpha * (agg + dangling_sum * reset) + (1.0 - alpha) * reset
        diff = jnp.sum(jnp.abs(new - pr))  # ref :278 L1 diff
        return new, diff, it + 1

    pr, diff, iters = jax.lax.while_loop(
        cond, body, (pr0, jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0))
    )
    return pr, diff, iters


def pagerank(
    g: Graph,
    alpha: float = 0.85,
    personalization: Optional[Tuple[jax.Array, jax.Array]] = None,
    max_iterations: int = 100,
    tol: float = 1.0e-6,
    nstart: Optional[jax.Array] = None,
    fail_on_nonconvergence: bool = False,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, int]:
    """PageRank scores (sum to 1). Returns (scores (V,), iterations).

    personalization: (vertex_ids, values) pair restricting the reset vector
    (ref: personalized path of cugraph::pagerank, pagerank_impl.cuh).

    use_pallas: route the aggregation through the windowed Pallas SpMV
    kernel (prims/pallas/spmv.py). Default: auto — on for TPU backends
    with large-enough graphs within the kernel's VMEM budget.
    """
    v = g.num_vertices
    expects(v > 0, "empty graph")
    lkind, layout = None, None
    # explicit use_pallas=True bypasses the edge-count heuristic (build the
    # layout or raise); the heuristic only gates the auto path
    if use_pallas or use_pallas is not False:
        from ..prims.pallas import pull_layout_auto

        lkind, layout = pull_layout_auto(
            g, min_edges=0 if use_pallas else 1 << 18
        )
        if use_pallas and lkind is None:
            raise RuntimeError("pallas SpMV unavailable for this graph/backend")
    if personalization is not None:
        ids, vals = personalization
        ids = jnp.asarray(ids, dtype=jnp.int32)
        vals = jnp.asarray(vals, dtype=WEIGHT_DTYPE)
        reset = jnp.zeros(v, dtype=WEIGHT_DTYPE).at[ids].add(vals)
        total = jnp.sum(reset)
        reset = reset / jnp.where(total > 0, total, 1.0)
    else:
        reset = None  # uniform, built in-jit
    if nstart is not None:
        pr0 = jnp.asarray(nstart, dtype=WEIGHT_DTYPE)
        pr0 = pr0 / jnp.sum(pr0)
    else:
        pr0 = None  # uniform, built in-jit
    pr, diff, iters = _pagerank_jit(
        g,
        float(alpha),
        float(tol),
        reset,
        pr0,
        max_iterations,
        lkind,
        layout,
    )
    if fail_on_nonconvergence:
        expects(bool(diff <= v * tol), "PageRank failed to converge")
    return pr, int(iters)


@partial(jax.jit, static_argnames=("max_iterations", "normalized", "lkind"))
def _hits_jit(
    g: Graph, tol, h0, max_iterations: int, normalized: bool,
    lkind=None, lay_in=None, lay_out=None,
):
    v = g.num_vertices

    def pull_in(values):  # sum over incoming edges of src value
        if lkind == "sorted":
            from ..prims.pallas import pull_aggregate

            return pull_aggregate(lkind, lay_in, g, values)
        return per_v_transform_reduce_incoming_e(
            g, lambda s, d, sv, dv, w: sv if w is None else sv * w, src_values=values
        )

    def push_out(values):  # sum over outgoing edges of dst value
        if lkind == "sorted":
            from ..prims.pallas import pull_aggregate

            return pull_aggregate(lkind, lay_out, g, values)
        from ..prims.per_v import per_v_transform_reduce_outgoing_e

        return per_v_transform_reduce_outgoing_e(
            g, lambda s, d, sv, dv, w: dv if w is None else dv * w, dst_values=values
        )

    def cond(state):
        h, a, diff, it = state
        return (diff > tol) & (it < max_iterations)

    def body(state):
        h, a, _, it = state
        # ref hits_impl.cuh: alternate authority = A^T hub, hub = A authority
        a_new = pull_in(h)
        a_new = a_new / jnp.maximum(jnp.max(a_new), 1e-30)
        h_new = push_out(a_new)
        h_new = h_new / jnp.maximum(jnp.max(h_new), 1e-30)
        diff = jnp.sum(jnp.abs(h_new - h))
        return h_new, a_new, diff, it + 1

    h, a, diff, iters = jax.lax.while_loop(
        cond,
        body,
        (h0, jnp.zeros(v, WEIGHT_DTYPE), jnp.asarray(jnp.inf, WEIGHT_DTYPE), jnp.int32(0)),
    )
    if normalized:
        h = h / jnp.maximum(jnp.sum(h), 1e-30)
        a = a / jnp.maximum(jnp.sum(a), 1e-30)
    return h, a, iters


def hits(
    g: Graph,
    max_iterations: int = 100,
    tol: float = 1.0e-5,
    nstart: Optional[jax.Array] = None,
    normalized: bool = True,
) -> Tuple[jax.Array, jax.Array, int]:
    """HITS hubs/authorities. Returns (hubs, authorities, iterations)."""
    v = g.num_vertices
    h0 = (
        jnp.asarray(nstart, WEIGHT_DTYPE)
        if nstart is not None
        else jnp.full(v, 1.0 / v, dtype=WEIGHT_DTYPE)
    )
    lkind, lay_in, lay_out = None, None, None
    if g.num_edges >= 1 << 18:
        from ..prims.pallas.spmv2 import sorted_layout_for

        li = sorted_layout_for(g, direction="in")
        lo = sorted_layout_for(g, direction="out")
        if li is not None and lo is not None:
            lay_in, lay_out, lkind = li, lo, "sorted"
    h, a, iters = _hits_jit(
        g, jnp.asarray(tol, WEIGHT_DTYPE), h0, max_iterations, normalized,
        lkind, lay_in, lay_out,
    )
    return h, a, int(iters)
