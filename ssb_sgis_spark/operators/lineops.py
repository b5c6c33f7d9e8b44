"""Line operators: cutting, construction, endpoint plumbing.

Reference (SURVEY §2.10): ``cut_lines`` / ``cut_lines_once``
(``cutting_lines.py:230-402``), ``make_lines_between_points``
(``general.py:312-341``), ``make_edge_wkt_cols`` (``nodes.py:97-150``).
Per-row geometry kernels over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import wkb


def _line_coords(ga, g):
    rings = ga.geom_rings(g)
    return rings[0] if rings else None


def _cut_line(coords: np.ndarray, max_length: float) -> list[np.ndarray]:
    """Split a polyline into pieces of at most max_length (measured along
    the line), inserting vertices at cut positions — reference
    ``cut_lines`` semantics (``cutting_lines.py:230-297``)."""
    seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
    total = seg.sum()
    if total <= max_length:
        return [coords]
    n_pieces = int(np.ceil(total / max_length))
    piece_len = total / n_pieces
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    pieces = []
    cur = [coords[0]]
    next_cut = piece_len
    for i in range(len(seg)):
        a, b = coords[i], coords[i + 1]
        start, end = cum[i], cum[i + 1]
        while next_cut < end - 1e-12:
            t = (next_cut - start) / (end - start)
            p = a + (b - a) * t
            cur.append(p)
            pieces.append(np.array(cur))
            cur = [p]
            next_cut += piece_len
        cur.append(b)
    if len(cur) > 1:
        pieces.append(np.array(cur))
    return pieces


def cut_lines(df: DataFrame, max_length: float, geometry_col: str = "geometry") -> DataFrame:
    """Explode lines into ≤ max_length pieces; other columns repeat."""
    schema = df.schema

    def kernel(it):
        for pdf in it:
            ga = wkb.decode(pdf[geometry_col].tolist())
            rows, geoms = [], []
            for g in range(len(ga)):
                if ga.types[g] != wkb.T_LINE:
                    rows.append(g)
                    geoms.append(pdf[geometry_col].iloc[g])
                    continue
                for rings in ga.geom_parts(g):
                    for piece in _cut_line(rings[0], max_length):
                        rows.append(g)
                        geoms.append(wkb.encode_linestring(piece))
            out = pdf.iloc[rows].copy() if rows else pdf.iloc[:0].copy()
            out[geometry_col] = geoms
            yield out

    return df.mapInPandas(kernel, schema=schema)


def cut_lines_once(
    df: DataFrame, distance, geometry_col: str = "geometry"
) -> DataFrame:
    """Cut each line at ``distance`` (scalar or column name) from its start
    → two rows (reference ``cutting_lines.py:300-402``; lines shorter than
    the distance pass through uncut)."""
    schema = df.schema
    dist_col = distance if isinstance(distance, str) else None

    def kernel(it):
        for pdf in it:
            ga = wkb.decode(pdf[geometry_col].tolist())
            rows, geoms = [], []
            for g in range(len(ga)):
                if ga.types[g] != wkb.T_LINE:
                    rows.append(g)
                    geoms.append(pdf[geometry_col].iloc[g])
                    continue
                d = float(pdf[dist_col].iloc[g]) if dist_col else float(distance)
                coords = _line_coords(ga, g)
                seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
                total = seg.sum()
                if d <= 0 or d >= total:
                    rows.append(g)
                    geoms.append(pdf[geometry_col].iloc[g])
                    continue
                cum = np.concatenate([[0.0], np.cumsum(seg)])
                i = int(np.searchsorted(cum, d, side="right")) - 1
                t = (d - cum[i]) / (cum[i + 1] - cum[i])
                p = coords[i] + (coords[i + 1] - coords[i]) * t
                first = np.vstack([coords[: i + 1], p])
                second = np.vstack([p, coords[i + 1 :]])
                for piece in (first, second):
                    rows.append(g)
                    geoms.append(wkb.encode_linestring(piece))
            out = pdf.iloc[rows].copy() if rows else pdf.iloc[:0].copy()
            out[geometry_col] = geoms
            yield out

    return df.mapInPandas(kernel, schema=schema)


def make_lines_between_points(
    df: DataFrame,
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    out: str = "geometry",
) -> DataFrame:
    """Two-point rows → LineString WKB (reference ``general.py:312-341``)."""
    fields = df.schema.fields + [T.StructField(out, T.BinaryType())]

    def kernel(it):
        for pdf in it:
            o = pdf.copy()
            o[out] = [
                wkb.encode_linestring(np.array([(a, b), (c, d)]))
                for a, b, c, d in zip(pdf[x1], pdf[y1], pdf[x2], pdf[y2])
            ]
            yield o

    return df.mapInPandas(kernel, schema=T.StructType(fields))


def make_edge_wkt_cols(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """First/last point per line as WKT columns (reference ``nodes.py:
    97-150``)."""
    from .network import make_edge_coords_cols

    e = make_edge_coords_cols(df, geometry_col)
    return e.withColumn(
        "source_wkt", F.format_string("POINT (%s %s)", F.col("x0"), F.col("y0"))
    ).withColumn(
        "target_wkt", F.format_string("POINT (%s %s)", F.col("x1"), F.col("y1"))
    )
