"""cugraph_tpu — a TPU-native graph message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of cuGraph 22.10.00
(reference layer map in SURVEY.md §1). The stack:

- ``core``   — graph containers: COO ingest, renumbering, CSR/CSC compression,
               degree segmentation (ref: cpp/include/cugraph/graph_view.hpp).
- ``prims``  — the neighborhood-aggregate substrate every algorithm is written
               against (ref: cpp/src/prims/).
- ``algos``  — PageRank, BFS, SSSP, Louvain, WCC, core number, Katz, HITS,
               eigenvector, triangle counting, similarity, ... (ref:
               cpp/include/cugraph/algorithms.hpp).
- ``sampling`` — uniform neighbor sampling, random walks, node2vec.
- ``generators`` — RMAT + simple graph generators.
- ``dist``   — 2D edge partitioning over a jax device mesh; shard_map prims
               (ref: cpp/include/cugraph/partition_manager.hpp, graph_view.hpp:50-76).
- ``gnn``    — GraphSAGE/GCN aggregation on the same substrate + graph store.
- ``api``    — NetworkX-style Graph classes and dataframe I/O (ref:
               python/cugraph/cugraph/structure/graph_classes.py).

Algorithms never touch the communicator: all distribution lives inside prims,
mirroring the reference's key architectural invariant (SURVEY.md §1).
"""

from . import utils
from .core.csr import Graph, CompressedAdj, from_edgelist
from .core import renumber
from . import prims
from .algos.link_analysis import pagerank, hits
from .algos.centrality import (
    katz_centrality,
    eigenvector_centrality,
    betweenness_centrality,
    edge_betweenness_centrality,
    degree_centrality,
)
from .algos.traversal import bfs, sssp, extract_bfs_paths
from .algos.components import weakly_connected_components, strongly_connected_components
from .algos.cores import core_number, k_core
from .algos.community import (
    louvain,
    leiden,
    modularity,
    triangle_count,
    ecg,
    ktruss,
    ego_graph,
    spectral_modularity_maximization_clustering,
    spectral_balanced_cut_clustering,
    analyze_clustering_modularity,
    analyze_clustering_edge_cut,
    analyze_clustering_ratio_cut,
)
from .algos.link_prediction import (
    jaccard,
    sorensen,
    overlap,
    cosine,
    all_pairs_similarity,
)
from .algos.tree import minimum_spanning_tree, maximum_spanning_tree
from .algos.linear_assignment import hungarian
from .algos.layout import force_atlas2
from .sampling.uniform_neighbor_sample import uniform_neighbor_sample
from .sampling.random_walks import random_walks, node2vec
from .generators.rmat import (
    mg_rmat_edgelist,
    rmat_chunk_source,
    rmat_edgelist,
    scramble_vertex_ids,
)
from .generators import simple as simple_generators

__version__ = "0.1.0"
