"""Core container tests: COO->CSR, renumbering, symmetrize, transforms."""

import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.core import renumber
from cugraph_tpu.core.convert import decompress_to_edgelist, induced_subgraph, transpose
from cugraph_tpu.core.coarsen import coarsen_graph
from cugraph_tpu.testing import karate_edgelist


def small_graph():
    src = np.array([0, 0, 1, 2, 3], dtype=np.int32)
    dst = np.array([1, 2, 2, 3, 0], dtype=np.int32)
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0], dtype=np.float32)
    return src, dst, w


def test_csr_roundtrip():
    src, dst, w = small_graph()
    g = cg.from_edgelist(src, dst, w)
    assert g.num_vertices == 4
    assert g.num_edges == 5
    s2, d2, w2 = decompress_to_edgelist(g)
    orig = set(zip(src.tolist(), dst.tolist(), w.tolist()))
    got = set(zip(s2.tolist(), d2.tolist(), w2.tolist()))
    assert orig == got


def test_degrees():
    src, dst, w = small_graph()
    g = cg.from_edgelist(src, dst, w)
    assert np.asarray(g.out_degrees()).tolist() == [2, 1, 1, 1]
    assert np.asarray(g.in_degrees()).tolist() == [1, 1, 2, 1]
    np.testing.assert_allclose(
        np.asarray(g.out_weight_sums()), [3.0, 3.0, 4.0, 5.0]
    )


def test_padding_alignment():
    src, dst, w = small_graph()
    g = cg.from_edgelist(src, dst, w)
    assert g.csr().e_pad % 128 == 0
    # padding slots must reduce into the discarded bucket
    majors = np.asarray(g.csr().majors)
    assert (majors[g.num_edges :] == g.num_vertices).all()


def test_symmetrize():
    src, dst, w = small_graph()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    assert g.is_symmetric
    s2, d2, _ = decompress_to_edgelist(g)
    edges = set(zip(s2.tolist(), d2.tolist()))
    for s, d in zip(src, dst):
        assert (int(s), int(d)) in edges and (int(d), int(s)) in edges


def test_renumber_degree_order():
    src, dst, _ = karate_edgelist()
    new_to_old = renumber.compute_renumber_map(src, dst)
    deg = np.bincount(src, minlength=35) + np.bincount(dst, minlength=35)
    deg_new = deg[new_to_old]
    assert (np.diff(deg_new) <= 0).all()  # descending
    s2, d2 = renumber.apply_renumber_map(new_to_old, src, dst)
    # mapped edges reproduce original degree structure
    assert sorted(np.bincount(s2).tolist()) == sorted(
        np.bincount(src, minlength=int(s2.max()) + 1).tolist()
    )


def test_number_map_multi_dtype():
    import pandas as pd

    df = pd.DataFrame(
        {"s": ["a", "b", "c", "a"], "d": ["b", "c", "a", "c"]}
    )
    s, d, nm = renumber.NumberMap.renumber(df, "s", "d")
    assert nm.num_vertices == 3
    back_s = nm.to_external(s)
    assert back_s.tolist() == df["s"].tolist()
    again = nm.to_internal(df["s"].to_numpy())
    assert (again == s).all()


def test_transpose():
    src, dst, w = small_graph()
    g = cg.from_edgelist(src, dst, w)
    gt = transpose(g)
    s2, d2, _ = decompress_to_edgelist(gt)
    assert set(zip(s2.tolist(), d2.tolist())) == set(zip(dst.tolist(), src.tolist()))


def test_induced_subgraph():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    sub, vmap = induced_subgraph(g, np.array([0, 1, 2, 3]))
    assert sub.num_vertices == 4
    s2, d2, _ = decompress_to_edgelist(sub)
    # every subgraph edge maps to an original edge
    orig = set()
    os, od, _ = decompress_to_edgelist(g)
    orig = set(zip(os.tolist(), od.tolist()))
    for s, d in zip(s2, d2):
        assert (int(vmap[s]), int(vmap[d])) in orig


def test_coarsen():
    src, dst, w = small_graph()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    labels = np.array([0, 0, 1, 1], dtype=np.int32)
    coarse, ids = coarsen_graph(g, labels)
    assert coarse.num_vertices == 2
    # total weight preserved
    _, _, w0 = decompress_to_edgelist(g)
    _, _, w1 = decompress_to_edgelist(coarse)
    np.testing.assert_allclose(w0.sum(), w1.sum())
