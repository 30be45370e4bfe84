"""Aux subsystems: timer, expensive checks, serialization (SURVEY.md §5)."""

import io

import numpy as np
import pytest

import cugraph_tpu as cg
from cugraph_tpu.core.serialize import (
    deserialize_graph,
    load_graph,
    save_graph,
    serialize_graph,
)
from cugraph_tpu.utils.timer import HighResTimer
from cugraph_tpu.utils import validation
from cugraph_tpu.utils.error import GraphError
from cugraph_tpu.testing import karate_edgelist


def test_timer():
    t = HighResTimer()
    t.start("phase1")
    _ = sum(range(1000))
    dt = t.stop("phase1")
    assert dt >= 0
    with t.range("phase2"):
        pass
    out = t.display()
    assert "phase1" in out and "phase2" in out
    t.reset()
    assert t.display() == ""


def test_expensive_checks():
    validation.set_expensive_checks(True)
    try:
        with pytest.raises(GraphError):
            validation.check_edgelist(
                np.array([0, 5]), np.array([1, 2]), None, num_vertices=3
            )
        with pytest.raises(GraphError):
            validation.check_edgelist(
                np.array([0]), np.array([1]), np.array([np.nan]), num_vertices=2
            )
        validation.check_edgelist(
            np.array([0]), np.array([1]), np.array([1.0]), num_vertices=2
        )
        with pytest.raises(GraphError):
            validation.check_vertex_values(np.zeros(3), 4)
    finally:
        validation.set_expensive_checks(False)
    # disabled: no raise
    validation.check_edgelist(np.array([0, 99]), np.array([1, 2]), None, 3)


def test_serialize_roundtrip():
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w, symmetrize=True)
    blob = serialize_graph(g)
    g2 = deserialize_graph(blob)
    assert g2.num_vertices == g.num_vertices
    assert g2.num_edges == g.num_edges
    assert g2.is_symmetric == g.is_symmetric
    pr1, _ = cg.pagerank(g, tol=1e-8)
    pr2, _ = cg.pagerank(g2, tol=1e-8)
    np.testing.assert_allclose(np.asarray(pr1), np.asarray(pr2), atol=1e-7)


def test_serialize_file(tmp_path):
    src, dst, w = karate_edgelist()
    g = cg.from_edgelist(src, dst, w)
    path = str(tmp_path / "g.cgt")
    save_graph(g, path)
    g2 = load_graph(path)
    assert g2.num_edges == g.num_edges


def test_serialize_rejects_garbage():
    with pytest.raises(Exception):
        deserialize_graph(b"not a graph")


def test_expensive_checks_wired_into_ingest():
    validation.set_expensive_checks(True)
    try:
        with pytest.raises(GraphError):
            cg.from_edgelist(
                np.array([0, 9]), np.array([1, 2]), num_vertices=3
            )
    finally:
        validation.set_expensive_checks(False)
