"""Renumbering: arbitrary external vertex ids -> contiguous [0, V) internal ids.

Analog of the reference's two renumbering layers:
- C++ ``renumber_edgelist`` orders internal ids by degree (descending) so
  degree segmentation falls out of id ranges
  (ref: cpp/src/structure/renumber_edgelist_impl.cuh:96 compute_renumber_map).
- Python ``NumberMap`` handles multi-column / arbitrary-dtype external ids
  (ref: python/cugraph/cugraph/structure/number_map.py:49,500,693).

Host-side numpy: renumbering is an ingest-time ETL step, not a device hot
loop. (The reference's device-side renumbering exists because its edgelists
already live in GPU memory; on TPU ingest flows host->HBM anyway.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd

from ..utils.dtypes import NP_VERTEX_DTYPE
from ..utils.error import expects


def compute_renumber_map(
    src: np.ndarray, dst: np.ndarray, num_vertices: Optional[int] = None
) -> np.ndarray:
    """Degree-descending renumber map for already-integer ids in [0, V).

    Returns ``new_to_old``: position i holds the old id of new vertex i.
    New id 0 has the highest total degree — mirroring the reference's
    degree-sorted ordering that makes its high/mid/low/hypersparse segments
    contiguous id ranges (renumber_edgelist_impl.cuh:96; thresholds
    graph_view.hpp:258-263). On TPU this ordering keeps heavy rows in the
    leading tiles for bucketed kernels.
    """
    if num_vertices is None:
        num_vertices = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    from .. import native

    # stable sort on descending degree; ties keep original id order
    return native.renumber_map(src, dst, num_vertices).astype(NP_VERTEX_DTYPE)


def apply_renumber_map(
    new_to_old: np.ndarray, *vertex_arrays: np.ndarray
) -> Tuple[np.ndarray, ...]:
    """Map old ids -> new ids in each array (inverse permutation lookup)."""
    old_to_new = np.empty_like(new_to_old)
    old_to_new[new_to_old] = np.arange(len(new_to_old), dtype=NP_VERTEX_DTYPE)
    return tuple(old_to_new[a] for a in vertex_arrays)


class NumberMap:
    """External (any dtype, possibly multi-column) ids <-> internal [0, V).

    ref: python/cugraph/cugraph/structure/number_map.py (SG inner class :49;
    renumber_and_segment :500; unrenumber :693). Internal ids are
    degree-descending like the C++ layer.
    """

    def __init__(self):
        self._ext_values: Optional[pd.DataFrame] = None  # index = internal id
        self.num_vertices = 0
        self.col_names = None

    @classmethod
    def renumber(
        cls, df: pd.DataFrame, src_cols, dst_cols
    ) -> Tuple[np.ndarray, np.ndarray, "NumberMap"]:
        """Renumber a (possibly multi-column-keyed) edge dataframe.

        Returns (src_int, dst_int, number_map); internal ids are
        degree-descending.
        """
        if isinstance(src_cols, str):
            src_cols = [src_cols]
        if isinstance(dst_cols, str):
            dst_cols = [dst_cols]
        expects(len(src_cols) == len(dst_cols), "src/dst column count mismatch")
        nm = cls()
        nm.col_names = [f"v_{i}" for i in range(len(src_cols))]

        src_df = df[src_cols].set_axis(nm.col_names, axis=1)
        dst_df = df[dst_cols].set_axis(nm.col_names, axis=1)
        allv = pd.concat([src_df, dst_df], ignore_index=True)
        if len(nm.col_names) == 1:
            codes, uniques = pd.factorize(allv[nm.col_names[0]], sort=True)
            uniq_df = pd.DataFrame({nm.col_names[0]: uniques})
        else:
            mi = pd.MultiIndex.from_frame(allv)
            codes, uniques = pd.factorize(mi, sort=True)
            uniq_df = pd.DataFrame(
                {c: [u[i] for u in uniques] for i, c in enumerate(nm.col_names)}
            )
        n = len(codes) // 2
        src0 = codes[:n].astype(NP_VERTEX_DTYPE)
        dst0 = codes[n:].astype(NP_VERTEX_DTYPE)
        nv = len(uniq_df)
        # second pass: degree-descending internal order
        new_to_old = compute_renumber_map(src0, dst0, nv)
        src_int, dst_int = apply_renumber_map(new_to_old, src0, dst0)
        nm._ext_values = uniq_df.iloc[new_to_old].reset_index(drop=True)
        nm.num_vertices = nv
        return src_int, dst_int, nm

    def to_internal(self, ext_vals) -> np.ndarray:
        """Map external ids -> internal ids (-1 when absent).

        ref analog: NumberMap.to_internal_vertex_id."""
        if len(self.col_names) == 1:
            ser = pd.Series(
                np.arange(self.num_vertices, dtype=NP_VERTEX_DTYPE),
                index=pd.Index(self._ext_values[self.col_names[0]]),
            )
            out = ser.reindex(pd.Index(np.asarray(ext_vals))).to_numpy()
        else:
            ser = pd.Series(
                np.arange(self.num_vertices, dtype=NP_VERTEX_DTYPE),
                index=pd.MultiIndex.from_frame(self._ext_values),
            )
            out = ser.reindex(pd.MultiIndex.from_tuples(list(ext_vals))).to_numpy()
        expects(not np.any(pd.isna(out)), "unknown external vertex id")
        return out.astype(NP_VERTEX_DTYPE)

    def to_external(self, int_ids: np.ndarray):
        """Map internal ids -> external ids (single col -> ndarray, else DataFrame).

        ref analog: NumberMap.unrenumber / from_internal_vertex_id."""
        rows = self._ext_values.iloc[np.asarray(int_ids)]
        if len(self.col_names) == 1:
            return rows[self.col_names[0]].to_numpy()
        return rows.reset_index(drop=True)
