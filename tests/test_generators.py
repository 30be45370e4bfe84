"""Generators: RMAT distribution shape, scramble bijectivity, simple graphs."""

import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.generators import simple


def test_rmat_shapes_and_range():
    src, dst = cg.rmat_edgelist(scale=10, num_edges=2000)
    src, dst = np.asarray(src), np.asarray(dst)
    assert len(src) == 2000
    assert src.min() >= 0 and src.max() < 1024
    assert dst.min() >= 0 and dst.max() < 1024


def test_rmat_skew():
    # a=0.57 concentrates mass in the low-id quadrant: low ids must have
    # far more edges than high ids
    src, dst = cg.rmat_edgelist(scale=12, num_edges=20000)
    src = np.asarray(src)
    low = (src < 1024).sum()
    high = (src >= 4096 - 1024).sum()
    assert low > 3 * high


def test_rmat_clip_and_flip():
    src, dst = cg.rmat_edgelist(scale=8, num_edges=1000, clip_and_flip=True)
    assert (np.asarray(src) >= np.asarray(dst)).all()


def test_scramble_bijective():
    ids = np.arange(1 << 10, dtype=np.int32)
    out = np.asarray(cg.scramble_vertex_ids(ids, 10))
    assert len(set(out.tolist())) == len(ids)
    assert out.min() >= 0 and out.max() < (1 << 10)


def test_path_graph():
    s, d = simple.path_graph_edgelist(5)
    assert list(zip(s, d)) == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_complete_graph():
    s, d = simple.complete_graph_edgelist(4)
    assert len(s) == 12


def test_mesh_2d():
    s, d = simple.mesh_2d_edgelist(3, 3)
    assert len(s) == 12  # 2*3 horizontal + 3*2 vertical


def test_mesh_3d():
    s, d = simple.mesh_3d_edgelist(2, 2, 2)
    assert len(s) == 12


def test_erdos_renyi():
    s, d = simple.erdos_renyi_gnp_edgelist(50, 0.1, seed=1)
    assert len(s) > 0
    assert (s != d).all()


def test_mg_rmat_per_device_generation():
    """Per-device RMAT: shards are device-generated with folded keys,
    deterministic, in-range, and feed the chunked MG ingest end-to-end."""
    from cugraph_tpu.dist import make_mesh, mg_algos
    from cugraph_tpu.dist.mg_graph import (
        distribute_edgelist_chunks,
        unshard_vertex_values,
    )

    mesh = make_mesh((2, 4))
    scale, e = 8, 2048
    s1, d1 = cg.mg_rmat_edgelist(mesh, scale, e, scramble=True)
    s2, d2 = cg.mg_rmat_edgelist(mesh, scale, e, scramble=True)
    assert s1.shape[:2] == mesh.devices.shape
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    sn = np.asarray(s1).ravel()
    dn = np.asarray(d1).ravel()
    assert sn.min() >= 0 and sn.max() < 2**scale
    assert dn.min() >= 0 and dn.max() < 2**scale
    # device shards differ (keys folded per device)
    flat = np.asarray(s1).reshape(8, -1)
    assert not np.array_equal(flat[0], flat[1])

    # chunked ingest -> MG pagerank == SG pagerank on the same edges
    chunks = cg.rmat_chunk_source(s1, d1)
    mgg = distribute_edgelist_chunks(mesh, chunks, num_vertices=2**scale)
    pr_mg = unshard_vertex_values(mgg, mg_algos.mg_pagerank(mesh, mgg)[0])
    g = cg.from_edgelist(sn, dn, num_vertices=2**scale)
    pr_sg = np.asarray(cg.pagerank(g)[0])
    np.testing.assert_allclose(pr_mg, pr_sg, rtol=1e-4, atol=1e-6)
