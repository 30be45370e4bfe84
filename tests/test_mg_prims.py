"""Prim-level MG tests with synthetic vertex properties — the reference's
key test practice (cpp/tests/prims/mg_*.cu with property_generator.cuh):
each distributed primitive is verified against a host numpy oracle on a
random graph, independently of any algorithm, on several mesh shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

import cugraph_tpu as cg
from cugraph_tpu.dist import distribute_graph, make_mesh, mg_prims
from cugraph_tpu.dist.mg_algos import (
    BLOCK,
    VERT,
    _edge_args,
    _graph_args,
    _split_args,
    _wrap,
)
from cugraph_tpu.dist.mg_graph import shard_vertex_values, unshard_vertex_values
from cugraph_tpu.prims.reduce_ops import MINIMUM, PLUS

V, E = 120, 700


@pytest.fixture(scope="module", params=[(2, 4), (4, 2), (2, 2)])
def mesh(request):
    r, c = request.param
    if r * c > len(jax.devices()):
        pytest.skip("not enough devices")
    return make_mesh(request.param)


@pytest.fixture(scope="module")
def edges():
    rng = np.random.default_rng(42)
    src = rng.integers(0, V, E).astype(np.int32)
    dst = rng.integers(0, V, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    return src, dst, w


@pytest.fixture(scope="module")
def sg(edges):
    return cg.from_edgelist(*edges, num_vertices=V)


@pytest.fixture(scope="module")
def mg(mesh, sg):
    return distribute_graph(mesh, sg)


@pytest.fixture(scope="module")
def props():
    rng = np.random.default_rng(7)
    return rng.random(V).astype(np.float32), rng.random(V).astype(np.float32)


def _run_prim(mesh, mg, fn, n_vert_inputs, *vert_arrays):
    """Drive a prim body under shard_map with sharded vertex properties."""
    gargs = _graph_args(mg)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple([VERT] * n_vert_inputs) + tuple([BLOCK] * len(gargs)),
        out_specs=VERT,
    )
    def run(*args):
        verts = [a[0, 0] for a in args[:n_vert_inputs]]
        srcs, dsts, w, _ = _split_args(args[n_vert_inputs:], mg.weighted)
        srcs, dsts, w = _edge_args(mg, srcs, dsts, w)
        return _wrap(fn(srcs, dsts, w, verts))

    shards = [shard_vertex_values(mesh, mg, a) for a in vert_arrays]
    return unshard_vertex_values(mg, run(*shards, *gargs))


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_per_v_incoming_plus(mesh, mg, edges, props, mode):
    src, dst, w = edges
    xv, _ = props
    oracle = np.zeros(V, np.float32)
    np.add.at(oracle, dst, xv[src] * w)

    def body(srcs, dsts, ww, verts):
        return mg_prims.per_v_transform_reduce_incoming_e(
            srcs, dsts, ww, mg.vp,
            lambda s, d, sv, dv, e_w: sv * e_w,
            src_values=verts[0], mode=mode,
        )

    got = _run_prim(mesh, mg, body, 1, xv)
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["all_gather", "ring"])
def test_per_v_incoming_min_with_dst_values(mesh, mg, edges, props, mode):
    src, dst, w = edges
    xv, yv = props
    oracle = np.full(V, np.inf, np.float32)
    np.minimum.at(oracle, dst, xv[src] + yv[dst])

    def body(srcs, dsts, ww, verts):
        return mg_prims.per_v_transform_reduce_incoming_e(
            srcs, dsts, ww, mg.vp,
            lambda s, d, sv, dv, e_w: sv + dv,
            src_values=verts[0], dst_values=verts[1],
            reduce_op=MINIMUM, mode=mode,
        )

    got = _run_prim(mesh, mg, body, 2, xv, yv)
    np.testing.assert_allclose(got, oracle, rtol=1e-5)


def test_per_v_outgoing_plus(mesh, mg, edges, props):
    src, dst, w = edges
    _, yv = props
    oracle = np.zeros(V, np.float32)
    np.add.at(oracle, src, yv[dst] * w)

    def body(srcs, dsts, ww, verts):
        return mg_prims.per_v_transform_reduce_outgoing_e(
            srcs, dsts, ww, mg.vp,
            lambda s, d, sv, dv, e_w: dv * e_w,
            dst_values=verts[0],
        )

    got = _run_prim(mesh, mg, body, 1, yv)
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6)


def test_per_v_incoming_feature_matrix(mesh, mg, edges):
    """(V, F) features ride the same prim (the SpMM path)."""
    src, dst, w = edges
    rng = np.random.default_rng(5)
    F = 4
    feats = rng.random((V, F)).astype(np.float32)
    oracle = np.zeros((V, F), np.float32)
    np.add.at(oracle, dst, feats[src] * w[:, None])

    def body(srcs, dsts, ww, verts):
        return mg_prims.per_v_transform_reduce_incoming_e(
            srcs, dsts, ww, mg.vp,
            lambda s, d, sv, dv, e_w: sv * e_w[..., None],
            src_values=verts[0],
        )

    got = _run_prim(mesh, mg, body, 1, feats)
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-5)


def test_frontier_push_min(mesh, mg, edges, props):
    src, dst, w = edges
    xv, _ = props
    frontier = np.zeros(V, bool)
    frontier[[1, 5, 17, 40]] = True
    oracle = np.full(V, np.inf, np.float32)
    sel = frontier[src]
    np.minimum.at(oracle, dst[sel], (xv[src] + w)[sel])
    touched_oracle = np.zeros(V, bool)
    touched_oracle[dst[sel]] = True

    gargs = _graph_args(mg)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(VERT, VERT) + tuple([BLOCK] * len(gargs)),
        out_specs=(VERT, VERT),
    )
    def run(fr, xs, *args):
        srcs, dsts, w_, _ = _split_args(args, mg.weighted)
        srcs, dsts, w_ = _edge_args(mg, srcs, dsts, w_)

        def e_op(s, d, sv, dv, e_w):
            return jnp.ones(s.shape, bool), sv + e_w

        touched, red = mg_prims.frontier_push_by_dst(
            srcs, dsts, w_, mg.vp, fr[0, 0], e_op,
            reduce_op=MINIMUM, src_values=xs[0, 0],
        )
        return _wrap(touched), _wrap(red)

    fr_sh = shard_vertex_values(mesh, mg, frontier)
    xs_sh = shard_vertex_values(mesh, mg, xv)
    touched, red = run(fr_sh, xs_sh, *gargs)
    np.testing.assert_array_equal(
        unshard_vertex_values(mg, touched), touched_oracle
    )
    got = unshard_vertex_values(mg, red)
    np.testing.assert_allclose(got[touched_oracle], oracle[touched_oracle], rtol=1e-5)


def test_transform_reduce_v(mesh, mg, props):
    xv, _ = props

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(VERT,), out_specs=P())
    def run(xs):
        return mg_prims.transform_reduce_v(xs[0, 0])

    # padding slots are zero-filled by shard_vertex_values
    got = float(run(shard_vertex_values(mesh, mg, xv)))
    np.testing.assert_allclose(got, float(xv.sum()), rtol=1e-5)


def test_dcsr_lookup_matches_degrees(mesh, mg, edges):
    """DCSR lookup returns each source's local degree on every device,
    summing to the global out-degree."""
    src, dst, _ = edges
    out_deg = np.bincount(src, minlength=V)
    span = mg.rows * mg.vp

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("row", "col", None), P("row", "col", None)),
        out_specs=P(),
    )
    def run(nzd, nzd_off):
        j = jax.lax.axis_index("col")
        gids = jnp.arange(V, dtype=jnp.int32)
        local = gids - j * span
        mine = (local >= 0) & (local < span)
        _, deg = mg_prims.dcsr_lookup(
            nzd[0, 0], nzd_off[0, 0], jnp.clip(local, 0, span - 1)
        )
        deg = jnp.where(mine, deg, 0)
        return jax.lax.psum(jax.lax.psum(deg, "row"), "col")

    got = np.asarray(run(mg.src_nzd, mg.src_nzd_offsets))
    np.testing.assert_array_equal(got, out_deg)
