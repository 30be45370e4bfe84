"""Dataframe-typed algorithm wrappers over api.Graph — the cugraph-Python UX.

Every function accepts an api.Graph OR a networkx Graph (converted on the
fly, results returned as dicts, mirroring the reference's nx compatibility:
utilities/nx_factory.py ensure_cugraph_obj_for_nx + df_score_to_dictionary).
ref: python/cugraph/cugraph/{link_analysis/pagerank.py:61,
traversal/bfs.py, community/louvain.py, ...}.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from .. import algos as _algos
from ..algos import community as _community
from ..algos import link_prediction as _lp
from .graph import Graph
from .nx_compat import ensure_graph, maybe_dict


def pagerank(
    G,
    alpha: float = 0.85,
    personalization: Optional[pd.DataFrame] = None,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    nstart: Optional[pd.DataFrame] = None,
):
    """Returns DataFrame['vertex', 'pagerank'] (or dict for nx input).

    Examples
    --------
    >>> import pandas as pd
    >>> from cugraph_tpu.api import Graph, algorithms
    >>> G = Graph()
    >>> _ = G.from_pandas_edgelist(pd.DataFrame(
    ...     {"source": [0, 1, 2], "destination": [1, 2, 0]}))
    >>> df = algorithms.pagerank(G, tol=1e-10)
    >>> [round(x, 4) for x in df["pagerank"]]
    [0.3333, 0.3333, 0.3333]
    """
    g, is_nx = ensure_graph(G)
    pers = None
    if personalization is not None:
        ids = g.to_internal(personalization["vertex"].to_numpy())
        pers = (ids, personalization["values"].to_numpy())
    ns = None
    if nstart is not None:
        order = np.argsort(g.to_internal(nstart["vertex"].to_numpy()))
        ns = nstart["values"].to_numpy()[order]
    scores, _ = _algos.link_analysis.pagerank(
        g.core,
        alpha=alpha,
        personalization=pers,
        max_iterations=max_iter,
        tol=tol,
        nstart=ns,
    )
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "pagerank": np.asarray(scores)}
    )
    return maybe_dict(df, "pagerank", is_nx)


def hits(G, max_iter: int = 100, tol: float = 1.0e-5):
    g, is_nx = ensure_graph(G)
    h, a, _ = _algos.link_analysis.hits(g.core, max_iterations=max_iter, tol=tol)
    df = pd.DataFrame(
        {
            "vertex": g.vertex_ids_external(),
            "hubs": np.asarray(h),
            "authorities": np.asarray(a),
        }
    )
    if is_nx:
        return (
            dict(zip(df["vertex"], df["hubs"])),
            dict(zip(df["vertex"], df["authorities"])),
        )
    return df


def katz_centrality(G, alpha=None, beta=1.0, max_iter=1000, tol=1.0e-6):
    g, is_nx = ensure_graph(G)
    x, _ = _algos.centrality.katz_centrality(
        g.core, alpha=alpha, beta=beta, max_iterations=max_iter, tol=tol
    )
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "katz_centrality": np.asarray(x)}
    )
    return maybe_dict(df, "katz_centrality", is_nx)


def eigenvector_centrality(G, max_iter=1000, tol=1.0e-6):
    g, is_nx = ensure_graph(G)
    x, _ = _algos.centrality.eigenvector_centrality(
        g.core, max_iterations=max_iter, tol=tol
    )
    df = pd.DataFrame(
        {
            "vertex": g.vertex_ids_external(),
            "eigenvector_centrality": np.asarray(x),
        }
    )
    return maybe_dict(df, "eigenvector_centrality", is_nx)


def betweenness_centrality(G, k=None, normalized=True, seed=0):
    g, is_nx = ensure_graph(G)
    x = _algos.centrality.betweenness_centrality(
        g.core, k=k, normalized=normalized, seed=seed
    )
    df = pd.DataFrame(
        {
            "vertex": g.vertex_ids_external(),
            "betweenness_centrality": np.asarray(x),
        }
    )
    return maybe_dict(df, "betweenness_centrality", is_nx)


def degree_centrality(G, normalized=True):
    g, is_nx = ensure_graph(G)
    x = _algos.centrality.degree_centrality(g.core, normalized=normalized)
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "degree_centrality": np.asarray(x)}
    )
    return maybe_dict(df, "degree_centrality", is_nx)


def bfs(G, start, depth_limit=None):
    """Returns DataFrame['vertex', 'distance', 'predecessor'].

    Examples
    --------
    >>> import pandas as pd
    >>> from cugraph_tpu.api import Graph, algorithms
    >>> G = Graph(directed=True)
    >>> _ = G.from_pandas_edgelist(pd.DataFrame(
    ...     {"source": [0, 1], "destination": [1, 2]}))
    >>> df = algorithms.bfs(G, 0).sort_values("vertex")
    >>> df["distance"].tolist()
    [0, 1, 2]
    """
    g, is_nx = ensure_graph(G)
    start_int = g.to_internal(np.atleast_1d(start))
    dist, pred = _algos.traversal.bfs(g.core, start_int, depth_limit=depth_limit)
    pred = np.asarray(pred)
    ext_pred = np.where(pred >= 0, g.to_external(np.maximum(pred, 0)), -1)
    df = pd.DataFrame(
        {
            "vertex": g.vertex_ids_external(),
            "distance": np.asarray(dist),
            "predecessor": ext_pred,
        }
    )
    return df


def sssp(G, source, cutoff=None):
    g, is_nx = ensure_graph(G)
    src_int = g.to_internal(np.atleast_1d(source))
    dist, pred = _algos.traversal.sssp(g.core, src_int, cutoff=cutoff)
    pred = np.asarray(pred)
    ext_pred = np.where(pred >= 0, g.to_external(np.maximum(pred, 0)), -1)
    df = pd.DataFrame(
        {
            "vertex": g.vertex_ids_external(),
            "distance": np.asarray(dist),
            "predecessor": ext_pred,
        }
    )
    return df


shortest_path = sssp  # reference alias (traversal/sssp.py shortest_path)


def connected_components(G):
    g, is_nx = ensure_graph(G)
    labels = _algos.components.weakly_connected_components(g.core)
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "labels": np.asarray(labels)}
    )
    return maybe_dict(df, "labels", is_nx)


weakly_connected_components = connected_components


def strongly_connected_components(G):
    g, is_nx = ensure_graph(G)
    labels = _algos.components.strongly_connected_components(g.core)
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "labels": np.asarray(labels)}
    )
    return maybe_dict(df, "labels", is_nx)


def core_number(G, degree_type: str = "incoming_outgoing"):
    g, is_nx = ensure_graph(G)
    core = _algos.cores.core_number(g.core, degree_type=degree_type)
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "core_number": np.asarray(core)}
    )
    return maybe_dict(df, "core_number", is_nx)


def k_core(G, k: int, degree_type: str = "outgoing"):
    g, is_nx = ensure_graph(G)
    sub, vmap = _algos.cores.k_core(g.core, k, degree_type=degree_type)
    out = Graph(directed=g.directed)
    from ..core.convert import decompress_to_edgelist

    s, d, w = decompress_to_edgelist(sub)
    ext = g.to_external(vmap)
    out.from_numpy_edgelist(np.asarray(ext)[s], np.asarray(ext)[d], w)
    return out


def louvain(G, max_level: int = 100, resolution: float = 1.0):
    """Returns (DataFrame['vertex','partition'], modularity)."""
    g, is_nx = ensure_graph(G)
    labels, q = _algos.community.louvain(
        g.core, max_level=max_level, resolution=resolution
    )
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "partition": np.asarray(labels)}
    )
    if is_nx:
        return dict(zip(df["vertex"], df["partition"])), q
    return df, q


def leiden(G, max_level: int = 100, resolution: float = 1.0):
    g, is_nx = ensure_graph(G)
    labels, q = _algos.community.leiden(
        g.core, max_level=max_level, resolution=resolution
    )
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "partition": np.asarray(labels)}
    )
    if is_nx:
        return dict(zip(df["vertex"], df["partition"])), q
    return df, q


def triangle_count(G):
    g, is_nx = ensure_graph(G)
    counts = _algos.community.triangle_count(g.core)
    df = pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "counts": np.asarray(counts)}
    )
    return maybe_dict(df, "counts", is_nx)


triangles = triangle_count


def _similarity_df(g, kind, pairs=None, use_weight=False):
    fn = getattr(_lp, kind)
    if pairs is not None:
        pairs = (g.to_internal(pairs[0]), g.to_internal(pairs[1]))
    v1, v2, coeff = fn(g.core, pairs=pairs, use_weight=use_weight)
    return pd.DataFrame(
        {
            "first": g.to_external(np.asarray(v1)),
            "second": g.to_external(np.asarray(v2)),
            f"{kind}_coeff": np.asarray(coeff),
        }
    )


def jaccard(G, pairs=None, use_weight=False):
    g, _ = ensure_graph(G)
    return _similarity_df(g, "jaccard", pairs, use_weight)


def sorensen(G, pairs=None, use_weight=False):
    g, _ = ensure_graph(G)
    return _similarity_df(g, "sorensen", pairs, use_weight)


def overlap(G, pairs=None, use_weight=False):
    g, _ = ensure_graph(G)
    return _similarity_df(g, "overlap", pairs, use_weight)


def uniform_neighbor_sample(G, start_list, fanout_vals, with_replacement=False):
    from ..sampling.uniform_neighbor_sample import uniform_neighbor_sample as _uns

    g, _ = ensure_graph(G)
    res = _uns(
        g.core,
        g.to_internal(np.atleast_1d(start_list)),
        fanout_vals,
        with_replacement=with_replacement,
    )
    df = pd.DataFrame(
        {
            "sources": g.to_external(res["sources"]),
            "destinations": g.to_external(res["destinations"]),
            "hop_id": res["hop"],
        }
    )
    if res["weights"] is not None:
        df["indices"] = res["weights"]
    return df


def random_walks(G, start_vertices, max_depth):
    from ..sampling.random_walks import random_walks as _rw

    g, _ = ensure_graph(G)
    walks, ws = _rw(
        g.core, g.to_internal(np.atleast_1d(start_vertices)), max_depth
    )
    return np.asarray(walks), np.asarray(ws)


def node2vec(G, start_vertices, max_depth, p=1.0, q=1.0):
    from ..sampling.random_walks import node2vec as _n2v

    g, _ = ensure_graph(G)
    walks, ws = _n2v(
        g.core, g.to_internal(np.atleast_1d(start_vertices)), max_depth, p=p, q=q
    )
    return np.asarray(walks), np.asarray(ws)


def ego_graph(G, n, radius: int = 1):
    g, is_nx = ensure_graph(G)
    sub, vmap = _community.ego_graph(
        g.core, int(g.to_internal(np.atleast_1d(n))[0]), radius=radius
    )
    out = Graph(directed=g.directed)
    from ..core.convert import decompress_to_edgelist

    s, d, w = decompress_to_edgelist(sub)
    ext = g.to_external(vmap)
    out.from_numpy_edgelist(np.asarray(ext)[s], np.asarray(ext)[d], w)
    return out


def force_atlas2(G, max_iter: int = 500, **kwargs):
    g, _ = ensure_graph(G)
    pos = _algos.layout.force_atlas2(g.core, max_iter=max_iter, **kwargs)
    return pd.DataFrame(
        {"vertex": g.vertex_ids_external(), "x": pos[:, 0], "y": pos[:, 1]}
    )


def minimum_spanning_tree(G):
    g, _ = ensure_graph(G)
    s, d, w = _algos.tree.minimum_spanning_tree(g.core)
    return pd.DataFrame(
        {"src": g.to_external(s), "dst": g.to_external(d), "weight": w}
    )
