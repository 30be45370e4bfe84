"""NetworkX drop-in namespace (ref: experimental/compat/nx).

Exposes nx-signature functions backed by the TPU framework:
    from cugraph_tpu.experimental import compat_nx as nx
    nx.pagerank(G)    # G may be an nx.Graph or a cugraph_tpu api.Graph
"""

from ..api.algorithms import (
    betweenness_centrality,
    bfs,
    connected_components,
    core_number,
    degree_centrality,
    eigenvector_centrality,
    hits,
    jaccard,
    k_core,
    katz_centrality,
    louvain,
    pagerank,
    sssp,
    strongly_connected_components,
    triangle_count,
)


def triangles(G):
    return triangle_count(G)


def shortest_path_length(G, source):
    df = sssp(G, source)
    return dict(zip(df["vertex"], df["distance"]))


def number_connected_components(G):
    labels = connected_components(G)
    vals = labels["labels"] if hasattr(labels, "columns") else labels.values()
    return len(set(vals))
