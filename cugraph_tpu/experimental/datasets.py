"""Metadata-driven datasets (ref: experimental/datasets/ +
datasets_config.yaml — dataset objects with lazy loading into Graphs)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from ..api.graph import Graph
from .. import testing


@dataclasses.dataclass
class Dataset:
    name: str
    loader: Callable
    directed: bool = False
    description: str = ""
    _graph: Optional[Graph] = None

    def get_edgelist(self):
        return self.loader()

    def get_graph(self, download: bool = False) -> Graph:
        if self._graph is None:
            src, dst, w = self.loader()
            g = Graph(directed=self.directed)
            g.from_numpy_edgelist(src, dst, w)
            self._graph = g
        return self._graph


karate = Dataset(
    "karate", testing.karate_edgelist, description="Zachary's karate club"
)
dolphins = Dataset("dolphins", testing.dolphins_edgelist)
email_eu_core = Dataset(
    "email-Eu-core", testing.email_eu_core_edgelist, directed=True
)
netscience = Dataset("netscience", testing.netscience_edgelist)
