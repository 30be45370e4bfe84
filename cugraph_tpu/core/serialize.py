"""Graph serialization + broadcast-style reconstruction.

ref: cpp/include/cugraph/serialization/serializer.hpp:33-136 (serializer_t
to/from device buffers) + cpp/src/utilities/graph_bcast.hpp (MPI-bcast a
graph to workers, tested in cpp/tests/bcast/mg_graph_bcast.cpp).

TPU-native: the wire format is a single .npz (host bytes); "bcast to
workers" is distribute_graph (host -> sharded device_put over the mesh),
which is how data reaches chips on TPU anyway.
"""

from __future__ import annotations

import io
from typing import Union

import numpy as np

from ..utils.error import expects
from .csr import Graph, from_edgelist
from .convert import decompress_to_edgelist

MAGIC = "cugraph_tpu_graph_v1"


def serialize_graph(g: Graph) -> bytes:
    src, dst, w = decompress_to_edgelist(g)
    buf = io.BytesIO()
    arrays = {
        "magic": np.frombuffer(MAGIC.encode(), dtype=np.uint8),
        "src": src,
        "dst": dst,
        "meta": np.array(
            [g.num_vertices, g.num_edges, int(g.is_symmetric)], dtype=np.int64
        ),
    }
    if w is not None:
        arrays["weight"] = w
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def deserialize_graph(data: Union[bytes, io.BytesIO]) -> Graph:
    buf = io.BytesIO(data) if isinstance(data, bytes) else data
    with np.load(buf) as z:
        expects(
            bytes(z["magic"]).decode() == MAGIC, "not a cugraph_tpu graph blob"
        )
        meta = z["meta"]
        w = z["weight"] if "weight" in z.files else None
        return from_edgelist(
            z["src"],
            z["dst"],
            w,
            num_vertices=int(meta[0]),
            is_symmetric=bool(meta[2]),
        )


def save_graph(g: Graph, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialize_graph(g))


def load_graph(path: str) -> Graph:
    with open(path, "rb") as f:
        return deserialize_graph(f.read())


def broadcast_graph(mesh, g: Graph):
    """Graph -> sharded MGGraph on every device of the mesh (the
    graph_bcast analog; see dist.mg_graph.distribute_graph)."""
    from ..dist.mg_graph import distribute_graph

    return distribute_graph(mesh, g)
