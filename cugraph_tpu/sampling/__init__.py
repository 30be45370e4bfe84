from .uniform_neighbor_sample import uniform_neighbor_sample
from .random_walks import random_walks, node2vec
