"""PolygonsAsRings — apply line functions to polygon rings, then rebuild.

Reference: ``polygons_as_rings.py:62-277`` — decompose polygons into
exterior + interior linearrings, run arbitrary LineString functions over
them (``apply_numpy_func`` / ``apply_numpy_func_to_interiors`` /
``apply_gdf_func``), and reassemble polygons with attributes intact.

Spark mapping: ring explosion and reassembly are two Arrow kernels
bracketing the user function; rings live as one DataFrame row each
(``_rkey`` = stable polygon row key, part / ring ordinals, exterior
flag, ring WKB), so the user stage is itself distributed and the
reassembly is a ``groupBy(_rkey)`` with map-side-combinable payloads.
Attributes never ride through the ring frame — they rejoin by ``_rkey``
at the end (column pruning keeps the shuffled payload minimal).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import wkb

_RING_SCHEMA = (
    "_rkey long, _part int, _ring int, is_exterior boolean, geometry binary"
)


class PolygonsAsRings:
    """``PolygonsAsRings(df).apply_numpy_func(fn).to_polygons()``.

    ``fn`` receives a list of closed ``(n, 2)`` float64 ring-coordinate
    arrays (one Arrow batch worth) and returns a same-length list of
    replacement arrays — the vectorized analogue of the reference's
    per-LinearRing numpy functions.  Returned rings are re-closed if the
    function moved an endpoint; a return of ``None`` (or a ring with
    < 4 points) drops that ring (interiors only — dropping an exterior
    drops the whole part, like shapely's empty result).
    """

    def __init__(self, df: DataFrame, geometry_col: str = "geometry",
                 _rings: DataFrame | None = None, _attrs: DataFrame | None = None):
        self.geometry_col = geometry_col
        if _rings is not None:
            self._rings = _rings
            self._attrs = _attrs
            return
        gcol = geometry_col
        keyed = df.withColumn("_rkey", F.monotonically_increasing_id()).localCheckpoint()
        self._attrs = keyed.drop(gcol)

        def explode(it):
            for pdf in it:
                out = {"_rkey": [], "_part": [], "_ring": [], "is_exterior": [], "geometry": []}
                ga = wkb.decode(pdf[gcol].tolist())
                for i in range(len(pdf)):
                    key = int(pdf["_rkey"].iloc[i])
                    for p, rings in enumerate(ga.geom_parts(i)):
                        for r, ring in enumerate(rings):
                            out["_rkey"].append(key)
                            out["_part"].append(p)
                            out["_ring"].append(r)
                            out["is_exterior"].append(r == 0)
                            out["geometry"].append(wkb.encode_linestring(ring))
                yield pd.DataFrame(out)

        self._rings = keyed.select("_rkey", gcol).mapInPandas(explode, schema=_RING_SCHEMA)

    # ------------------------------------------------------------ views
    def get_rings(self) -> DataFrame:
        """One row per ring as LINESTRING WKB with the polygon's
        attributes joined back (reference ``get_rings``)."""
        return self._attrs.join(self._rings, "_rkey").drop(
            "_rkey", "_part", "_ring"
        )

    @property
    def rings(self) -> DataFrame:
        return self._rings

    # ------------------------------------------------------------ apply
    def _apply(self, fn: Callable, where) -> "PolygonsAsRings":
        def kernel(it):
            for pdf in it:
                sel = (
                    np.ones(len(pdf), dtype=bool)
                    if where == "all"
                    else (pdf["is_exterior"].to_numpy() == (where == "exterior"))
                )
                idx = np.flatnonzero(sel)
                if len(idx):
                    ga = wkb.decode(pdf["geometry"].iloc[idx].tolist())
                    coords = [ga.geom_rings(g)[0] for g in range(len(idx))]
                    new = fn(coords)
                    geoms = pdf["geometry"].tolist()
                    keep = np.ones(len(pdf), dtype=bool)
                    for j, arr in zip(idx, new):
                        if arr is None or len(arr) < 4:
                            keep[j] = False
                            continue
                        arr = np.asarray(arr, dtype=np.float64)
                        if not np.array_equal(arr[0], arr[-1]):
                            arr = np.vstack([arr, arr[:1]])
                        geoms[j] = wkb.encode_linestring(arr)
                    pdf = pdf.copy()
                    pdf["geometry"] = geoms
                    pdf = pdf[keep]
                yield pdf

        return PolygonsAsRings(
            None, self.geometry_col,
            _rings=self._rings.mapInPandas(kernel, schema=_RING_SCHEMA),
            _attrs=self._attrs,
        )

    def apply_numpy_func(self, fn: Callable) -> "PolygonsAsRings":
        """Apply to ALL rings (reference ``apply_numpy_func``)."""
        return self._apply(fn, "all")

    def apply_numpy_func_to_interiors(self, fn: Callable) -> "PolygonsAsRings":
        """Apply to interior rings only (reference
        ``apply_numpy_func_to_interiors``)."""
        return self._apply(fn, "interior")

    def apply_numpy_func_to_exteriors(self, fn: Callable) -> "PolygonsAsRings":
        return self._apply(fn, "exterior")

    def apply_df_func(self, fn: Callable[[DataFrame], DataFrame]) -> "PolygonsAsRings":
        """Run an arbitrary DataFrame->DataFrame stage over the ring
        frame (the Spark analogue of ``apply_gdf_func``); the function
        must preserve the ``_rkey/_part/_ring/is_exterior/geometry``
        columns."""
        out = fn(self._rings)
        missing = {"_rkey", "_part", "_ring", "is_exterior", "geometry"} - set(out.columns)
        if missing:
            raise ValueError(f"apply_df_func result lost columns: {sorted(missing)}")
        return PolygonsAsRings(None, self.geometry_col, _rings=out, _attrs=self._attrs)

    # -------------------------------------------------------- assemble
    def to_polygons(self) -> DataFrame:
        """Reassemble (Multi)Polygons and rejoin attributes (reference
        ``to_gdf`` / ``to_numpy``)."""
        gcol = self.geometry_col

        def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["_part", "_ring"])
            ga = wkb.decode(pdf["geometry"].tolist())
            parts: dict[int, list[np.ndarray]] = {}
            for i, (p, r) in enumerate(zip(pdf["_part"], pdf["_ring"])):
                ring = ga.geom_rings(i)[0]
                if r == 0:
                    parts[int(p)] = [ring]
                elif int(p) in parts:  # interior without a surviving exterior drops
                    parts[int(p)].append(ring)
            mp = [rings for _, rings in sorted(parts.items())]
            if not mp:
                return pd.DataFrame({"_rkey": [], gcol: []})
            return pd.DataFrame(
                {"_rkey": [pdf["_rkey"].iloc[0]],
                 gcol: [wkb.encode_geom(mp, wkb.T_POLYGON)]}
            )

        polys = self._rings.groupBy("_rkey").applyInPandas(
            assemble, schema=f"_rkey long, {gcol} binary"
        )
        return self._attrs.join(polys, "_rkey").drop("_rkey")
