from .rmat import (
    mg_rmat_edgelist,
    rmat_chunk_source,
    rmat_edgelist,
    scramble_vertex_ids,
)
from . import simple
