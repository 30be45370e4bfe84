"""README / docs example code must run (the reference runs doctest sweeps,
tests/test_doctests.py)."""

import numpy as np
import pandas as pd


def test_readme_quickstart():
    from cugraph_tpu.api import Graph, algorithms as cga

    df = pd.DataFrame(
        {"source": ["a", "b", "c"], "destination": ["b", "c", "a"]}
    )
    G = Graph().from_pandas_edgelist(df)
    res = cga.pagerank(G)
    assert set(res.columns) == {"vertex", "pagerank"}

    import cugraph_tpu as cg

    g = cg.from_edgelist(np.array([0, 1, 2]), np.array([1, 2, 0]))
    scores, iters = cg.pagerank(g)
    np.testing.assert_allclose(float(np.asarray(scores).sum()), 1.0, rtol=1e-5)

    from cugraph_tpu.dist import make_mesh, distribute_graph, mg_algos

    mesh = make_mesh()
    mgg = distribute_graph(mesh, g)
    pr, it = mg_algos.mg_pagerank(mesh, mgg)


def test_experimental_compat_nx():
    import networkx as nx

    from cugraph_tpu.experimental import compat_nx as cnx

    G = nx.karate_club_graph()
    pr = cnx.pagerank(G)
    assert isinstance(pr, dict)
    assert cnx.number_connected_components(G) == 1


def test_experimental_datasets():
    from cugraph_tpu.experimental import karate

    g = karate.get_graph()
    assert g.number_of_vertices() == 34
