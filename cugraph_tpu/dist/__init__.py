from .partition import Partition2D
from .mesh import initialize_distributed, make_global_mesh, make_mesh, mesh_shape_for
from .mg_graph import MGGraph, distribute_graph, distribute_edgelist
from . import mg_prims, mg_algos, mg_sampling, mg_gnn, mg_community, mg_similarity, mg_centrality
