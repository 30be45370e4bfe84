"""Graph service: remote graphs + algorithm RPC.

ref: python/cugraph_service (3,899 LoC) — Thrift IDL at
cugraph_service_client/cugraph_service_thrift.py:41-199 (service
``CugraphService``: create/delete graph, load_csv_as_vertex/edge_data,
get_graph_info, extract_subgraph, call_graph_creation_extension,
uniform_neighbor_sample, node2vec, batched_ego_graphs,
get_graph_vertex/edge_data, get_server_info/uptime); server handler
cugraph_service_server/cugraph_handler.py:107 (extension loading :161).

TPU-native: the Thrift dependency is replaced by a zero-dependency JSON
RPC over stdlib http.server; the handler surface mirrors the IDL method
by method so a reference user finds every call.
"""

from __future__ import annotations

import importlib.util
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

from .. import __version__
from ..api.graph import Graph
from ..api.property_graph import PropertyGraph
from .exceptions import CugraphServiceError

DEFAULT_GRAPH_ID = 0


class CugraphHandler:
    """The RPC method surface (ref CugraphHandler,
    cugraph_handler.py:107). Also usable in-process without a server."""

    def __init__(self):
        self._start_time = time.time()
        self._graphs: Dict[int, PropertyGraph] = {DEFAULT_GRAPH_ID: PropertyGraph()}
        self._next_id = 1
        self._extensions: Dict[str, Any] = {}
        # graph_id -> (mesh, MGGraph, api Graph) for mesh-backed graphs
        self._dist: Dict[int, Any] = {}

    # ---- server info -----------------------------------------------------
    def get_server_info(self) -> Dict[str, Any]:
        import jax

        return {
            "num_gpus": 0,
            "num_devices": len(jax.devices()),
            "device_platform": jax.devices()[0].platform,
            "cugraph_tpu_version": __version__,
        }

    def uptime(self) -> float:
        return time.time() - self._start_time

    # ---- graph lifecycle -------------------------------------------------
    def create_graph(self) -> int:
        gid = self._next_id
        self._next_id += 1
        self._graphs[gid] = PropertyGraph()
        return gid

    def delete_graph(self, graph_id: int) -> None:
        self._pg(graph_id)
        self._dist.pop(graph_id, None)
        if graph_id == DEFAULT_GRAPH_ID:
            self._graphs[DEFAULT_GRAPH_ID] = PropertyGraph()
        else:
            del self._graphs[graph_id]

    def get_graph_ids(self) -> List[int]:
        return sorted(self._graphs)

    def get_graph_info(self, graph_id: int = DEFAULT_GRAPH_ID) -> Dict[str, Any]:
        pg = self._pg(graph_id)
        return {
            "num_vertices": pg.get_num_vertices(),
            "num_edges": pg.get_num_edges(),
            "num_vertex_properties": 0
            if pg._vertex_df is None
            else len(pg._vertex_df.columns) - 2,
            "num_edge_properties": 0
            if pg._edge_df is None
            else len(pg._edge_df.columns) - 4,
        }

    # ---- data loading ----------------------------------------------------
    def load_csv_as_vertex_data(
        self,
        csv_file_name: str,
        *,
        vertex_col_name: str,
        delimiter: str = ",",
        dtypes: Optional[List[str]] = None,
        header: Optional[int] = 0,
        names: Optional[List[str]] = None,
        type_name: str = "",
        graph_id: int = DEFAULT_GRAPH_ID,
    ) -> None:
        df = pd.read_csv(
            csv_file_name, sep=delimiter, header=header, names=names
        )
        self._pg(graph_id).add_vertex_data(df, vertex_col_name, type_name=type_name)
        self._dist.pop(graph_id, None)  # mesh backing is stale after loads

    def load_csv_as_edge_data(
        self,
        csv_file_name: str,
        *,
        vertex_col_names,
        delimiter: str = ",",
        dtypes: Optional[List[str]] = None,
        header: Optional[int] = 0,
        names: Optional[List[str]] = None,
        type_name: str = "",
        graph_id: int = DEFAULT_GRAPH_ID,
    ) -> None:
        df = pd.read_csv(
            csv_file_name, sep=delimiter, header=header, names=names
        )
        self._pg(graph_id).add_edge_data(
            df, tuple(vertex_col_names), type_name=type_name
        )
        self._dist.pop(graph_id, None)  # mesh backing is stale after loads

    def get_graph_vertex_data(
        self, graph_id: int = DEFAULT_GRAPH_ID, vertex_ids=None, types=None
    ):
        df = self._pg(graph_id).get_vertex_data(vertex_ids=vertex_ids, types=types)
        return json.loads(df.to_json(orient="split"))

    def get_graph_edge_data(
        self, graph_id: int = DEFAULT_GRAPH_ID, edge_ids=None, types=None
    ):
        df = self._pg(graph_id).get_edge_data(edge_ids=edge_ids, types=types)
        return json.loads(df.to_json(orient="split"))

    # ---- graph ops -------------------------------------------------------
    def extract_subgraph(
        self,
        graph_id: int = DEFAULT_GRAPH_ID,
        *,
        edge_types=None,
        edge_weight_property: Optional[str] = None,
        selection: Optional[str] = None,
    ) -> int:
        pg = self._pg(graph_id)
        sel = pg.select_edges(selection) if selection else None
        g = pg.extract_subgraph(
            edge_types=edge_types,
            edge_weight_property=edge_weight_property,
            selection=sel,
        )
        # register the extracted graph as a new property graph
        gid = self.create_graph()
        edges = g.edges()
        cols = {"_SRC": edges["src"], "_DST": edges["dst"]}
        if "weight" in edges:
            cols["weight"] = edges["weight"]
        self._graphs[gid].add_edge_data(pd.DataFrame(cols), ("_SRC", "_DST"))
        return gid

    def uniform_neighbor_sample(
        self,
        start_list,
        fanout_vals,
        with_replacement: bool = False,
        graph_id: int = DEFAULT_GRAPH_ID,
    ) -> Dict[str, List]:
        g = self._algo_graph(graph_id)
        if graph_id in self._dist:
            # mesh-backed: the distributed sampler (ref
            # cugraph_handler.py:246 is_multi_gpu sampling path)
            mesh, mgg, g = self._dist[graph_id]
            from ..dist.mg_sampling import mg_uniform_neighbor_sample

            starts = g.to_internal(np.asarray(start_list))
            res = mg_uniform_neighbor_sample(
                mesh, mgg, starts, fanout_vals,
                with_replacement=with_replacement,
            )
            ext = np.asarray(g.vertex_ids_external())
            return {
                "sources": ext[res["sources"]].tolist(),
                "destinations": ext[res["destinations"]].tolist(),
                "indices": None
                if res["weights"] is None
                else res["weights"].tolist(),
            }
        from ..api import algorithms as capi

        df = capi.uniform_neighbor_sample(
            g, start_list, fanout_vals, with_replacement=with_replacement
        )
        return {
            "sources": df["sources"].tolist(),
            "destinations": df["destinations"].tolist(),
            "indices": df["indices"].tolist() if "indices" in df else None,
        }

    def node2vec(
        self,
        start_vertices,
        max_depth: int,
        p: float = 1.0,
        q: float = 1.0,
        graph_id: int = DEFAULT_GRAPH_ID,
    ) -> Dict[str, List]:
        g = self._algo_graph(graph_id)
        from ..api import algorithms as capi

        walks, weights = capi.node2vec(g, start_vertices, max_depth, p=p, q=q)
        return {
            "vertex_paths": np.asarray(walks).ravel().tolist(),
            "edge_weights": np.asarray(weights).ravel().tolist(),
            "path_sizes": [int(max_depth) + 1] * len(np.atleast_1d(start_vertices)),
        }

    def batched_ego_graphs(
        self, seeds, radius: int = 1, graph_id: int = DEFAULT_GRAPH_ID
    ) -> Dict[str, List]:
        g = self._algo_graph(graph_id)
        from ..api import algorithms as capi

        srcs, dsts, offsets = [], [], [0]
        for s in np.atleast_1d(seeds):
            sub = capi.ego_graph(g, int(s), radius=radius)
            e = sub.edges()
            srcs.extend(e["src"].tolist())
            dsts.extend(e["dst"].tolist())
            offsets.append(len(srcs))
        return {"srcs": srcs, "dsts": dsts, "seed_offsets": offsets}

    def distribute_graph(
        self,
        graph_id: int = DEFAULT_GRAPH_ID,
        mesh_shape: Optional[List[int]] = None,
    ) -> Dict[str, Any]:
        """Back graph_id with a 2D device mesh: subsequent algorithm calls
        on it run the distributed (MG) implementations. The TPU analog of
        the reference service's dask/MG-backed property graphs
        (cugraph_handler.py is_multi_gpu paths)."""
        import jax

        from ..dist import make_mesh, mesh_shape_for
        from ..dist.mg_graph import distribute_graph as _dist

        g = self._algo_graph(graph_id)
        shape = (
            tuple(mesh_shape)
            if mesh_shape is not None
            else mesh_shape_for(len(jax.devices()))
        )
        mesh = make_mesh(shape)
        mgg = _dist(mesh, g.core)
        self._dist[graph_id] = (mesh, mgg, g)
        return {"mesh_shape": list(shape), "num_devices": int(np.prod(shape))}

    def pagerank(self, graph_id: int = DEFAULT_GRAPH_ID, **kwargs) -> Dict[str, List]:
        from ..api import algorithms as capi

        if graph_id in self._dist:
            mesh, mgg, g = self._dist[graph_id]
            from ..dist.mg_algos import mg_pagerank
            from ..dist.mg_graph import unshard_vertex_values

            kwargs.setdefault("tol", 1.0e-5)
            if "max_iter" in kwargs:
                kwargs["max_iterations"] = kwargs.pop("max_iter")
            scores_sh, _ = mg_pagerank(mesh, mgg, **kwargs)
            scores = unshard_vertex_values(mgg, scores_sh)
            return {
                "vertex": g.vertex_ids_external().tolist(),
                "pagerank": np.asarray(scores).tolist(),
            }
        df = capi.pagerank(self._algo_graph(graph_id), **kwargs)
        return {
            "vertex": df["vertex"].tolist(),
            "pagerank": df["pagerank"].tolist(),
        }

    def bfs(
        self, start, graph_id: int = DEFAULT_GRAPH_ID, **kwargs
    ) -> Dict[str, List]:
        from ..api import algorithms as capi

        if graph_id in self._dist:
            mesh, mgg, g = self._dist[graph_id]
            from ..dist.mg_algos import mg_bfs
            from ..dist.mg_graph import unshard_vertex_values

            start_i = int(g.to_internal(np.asarray([start]))[0])
            dist_sh, pred_sh = mg_bfs(mesh, mgg, start_i, **kwargs)
            dist = unshard_vertex_values(mgg, dist_sh)
            pred_i = unshard_vertex_values(mgg, pred_sh)
            ext = g.vertex_ids_external()
            pred = np.where(
                pred_i >= 0, np.asarray(ext)[np.maximum(pred_i, 0)], -1
            )
            return {
                "vertex": np.asarray(ext).tolist(),
                "distance": np.asarray(dist).tolist(),
                "predecessor": np.asarray(pred).tolist(),
            }
        df = capi.bfs(self._algo_graph(graph_id), start, **kwargs)
        return {
            "vertex": df["vertex"].tolist(),
            "distance": df["distance"].tolist(),
            "predecessor": df["predecessor"].tolist(),
        }

    def sssp(
        self, start, graph_id: int = DEFAULT_GRAPH_ID, **kwargs
    ) -> Dict[str, List]:
        from ..api import algorithms as capi

        if graph_id in self._dist:
            mesh, mgg, g = self._dist[graph_id]
            from ..dist.mg_algos import mg_sssp
            from ..dist.mg_graph import unshard_vertex_values

            start_i = int(g.to_internal(np.asarray([start]))[0])
            dist_sh, pred_sh = mg_sssp(mesh, mgg, start_i, **kwargs)
            dist = unshard_vertex_values(mgg, dist_sh)
            pred_i = unshard_vertex_values(mgg, pred_sh)
            ext = np.asarray(g.vertex_ids_external())
            pred = np.where(pred_i >= 0, ext[np.maximum(pred_i, 0)], -1)
            return {
                "vertex": ext.tolist(),
                "distance": np.asarray(dist).tolist(),
                "predecessor": pred.tolist(),
            }
        df = capi.sssp(self._algo_graph(graph_id), start, **kwargs)
        return {
            "vertex": df["vertex"].tolist(),
            "distance": df["distance"].tolist(),
            "predecessor": df["predecessor"].tolist(),
        }

    def wcc(self, graph_id: int = DEFAULT_GRAPH_ID, **kwargs) -> Dict[str, List]:
        from ..api import algorithms as capi

        if graph_id in self._dist:
            mesh, mgg, g = self._dist[graph_id]
            from ..dist.mg_algos import mg_wcc
            from ..dist.mg_graph import unshard_vertex_values

            labels_sh = mg_wcc(mesh, mgg, **kwargs)
            labels = unshard_vertex_values(mgg, labels_sh)
            ext = np.asarray(g.vertex_ids_external())
            return {
                "vertex": ext.tolist(),
                "labels": np.asarray(labels).tolist(),
            }
        df = capi.weakly_connected_components(self._algo_graph(graph_id), **kwargs)
        return {
            "vertex": df["vertex"].tolist(),
            "labels": df["labels"].tolist(),
        }

    def katz_centrality(
        self, graph_id: int = DEFAULT_GRAPH_ID, **kwargs
    ) -> Dict[str, List]:
        from ..api import algorithms as capi

        if graph_id in self._dist:
            mesh, mgg, g = self._dist[graph_id]
            from ..dist.mg_algos import mg_katz_centrality
            from ..dist.mg_graph import unshard_vertex_values

            scores_sh = mg_katz_centrality(mesh, mgg, **kwargs)
            if isinstance(scores_sh, tuple):
                scores_sh = scores_sh[0]
            scores = unshard_vertex_values(mgg, scores_sh)
            ext = np.asarray(g.vertex_ids_external())
            return {
                "vertex": ext.tolist(),
                "katz_centrality": np.asarray(scores).tolist(),
            }
        df = capi.katz_centrality(self._algo_graph(graph_id), **kwargs)
        return {
            "vertex": df["vertex"].tolist(),
            "katz_centrality": df["katz_centrality"].tolist(),
        }

    # ---- extensions (ref: cugraph_handler.py:161) ------------------------
    def load_graph_creation_extensions(self, extension_dir_path: str) -> int:
        count = 0
        for fname in sorted(os.listdir(extension_dir_path)):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(extension_dir_path, fname)
            spec = importlib.util.spec_from_file_location(fname[:-3], path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            for name in dir(mod):
                if name.startswith("create_") or name.endswith("_extension"):
                    self._extensions[name] = getattr(mod, name)
                    count += 1
        return count

    def unload_graph_creation_extensions(self) -> None:
        self._extensions.clear()

    def call_graph_creation_extension(
        self, func_name: str, *args, **kwargs
    ) -> int:
        if func_name not in self._extensions:
            raise CugraphServiceError(f"unknown extension {func_name!r}")
        result = self._extensions[func_name](*args, **kwargs)
        gid = self.create_graph()
        if isinstance(result, pd.DataFrame):
            cols = list(result.columns)
            self._graphs[gid].add_edge_data(result, (cols[0], cols[1]))
        elif isinstance(result, PropertyGraph):
            self._graphs[gid] = result
        else:
            raise CugraphServiceError(
                f"extension returned unsupported type {type(result)!r}"
            )
        return gid

    # ---- internals -------------------------------------------------------
    def _pg(self, graph_id: int) -> PropertyGraph:
        if graph_id not in self._graphs:
            raise CugraphServiceError(f"invalid graph id {graph_id}")
        return self._graphs[graph_id]

    def _algo_graph(self, graph_id: int) -> Graph:
        pg = self._pg(graph_id)
        if pg.get_num_edges() == 0:
            raise CugraphServiceError(f"graph {graph_id} has no edges")
        return pg.extract_subgraph(create_using=Graph(directed=True))


class CugraphTpuServer:
    """JSON-RPC HTTP wrapper around CugraphHandler.

    POST / with {"method": name, "args": [...], "kwargs": {...}} ->
    {"result": ...} or {"error": "..."}."""

    def __init__(self, host: str = "127.0.0.1", port: int = 9090):
        self.handler = CugraphHandler()
        handler = self.handler

        class _Req(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    method = payload["method"]
                    if method.startswith("_"):
                        raise CugraphServiceError("forbidden method")
                    fn = getattr(handler, method, None)
                    if fn is None:
                        raise CugraphServiceError(f"unknown method {method!r}")
                    result = fn(*payload.get("args", []), **payload.get("kwargs", {}))
                    body = json.dumps({"result": result}).encode()
                    self.send_response(200)
                except Exception as exc:  # noqa: BLE001 — wrap all (ref behavior)
                    body = json.dumps(
                        {"error": f"{type(exc).__name__}: {exc}"}
                    ).encode()
                    self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence
                pass

        self._httpd = ThreadingHTTPServer((host, port), _Req)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)

    def serve_forever(self) -> None:
        self._httpd.serve_forever()
