from .csr import CompressedAdj, Graph, from_edgelist
from . import renumber, symmetrize, convert, coarsen
