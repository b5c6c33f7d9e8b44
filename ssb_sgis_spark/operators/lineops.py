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
    df: DataFrame, distance, geometry_col: str = "geometry", keep: str | None = None
) -> DataFrame:
    """Cut each line at ``distance`` (scalar or column name) from its start
    → two rows (reference ``cutting_lines.py:300-402``; lines shorter than
    the distance pass through uncut).  ``keep="first"``/``"second"``
    returns only that piece (service-area prefix cuts)."""
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
                pieces = (
                    (first,) if keep == "first"
                    else (second,) if keep == "second"
                    else (first, second)
                )
                for piece in pieces:
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


# --------------------------------------------------- split by nearest point
def _project_onto_line(coords: np.ndarray, px: float, py: float):
    """(min_distance, arc_length_of_projection, total_length) of a point
    vs one polyline — clamped per-segment projection, vectorized."""
    ax, ay = coords[:-1, 0], coords[:-1, 1]
    bx, by = coords[1:, 0], coords[1:, 1]
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(seg2 > 0, ((px - ax) * dx + (py - ay) * dy) / seg2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    i = int(np.argmin(d2))
    seg = np.sqrt(seg2)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    return float(np.sqrt(d2[i])), float(cum[i] + t[i] * seg[i]), float(cum[-1])


def split_lines_by_nearest_point(
    lines: DataFrame,
    points: DataFrame,
    max_distance: float,
    splitted_col: str | None = None,
    line_id: str = "lid",
    point_x: str = "x",
    point_y: str = "y",
    geometry_col: str = "geometry",
) -> DataFrame:
    """Snap each point to its nearest line within ``max_distance`` and
    split that line at the snap position (reference
    ``networkanalysis/cutting_lines.py:33-189``; used by the
    ``split_lines`` NetworkAnalysis rule).  Points whose snap lands on a
    line endpoint split nothing, like the reference.  Where the reference
    splits pointwise (one line in two per point), multiple points
    snapping to the SAME line here cut it at every snap position in one
    pass.

    Physical plan: points gain a Chebyshev-``max_distance`` box and join
    the line bbox cover (the overlay's candidate machinery), the
    projection kernel refines per pair, a window keeps each point's
    nearest line, and one Arrow kernel re-emits the split pieces — the
    line table never broadcasts or collects."""
    from pyspark.sql.window import Window

    from .overlay import candidate_pairs
    from .geomtable import xy_to_point_wkb

    eps = 1e-9
    # point side as degenerate boxes padded by max_distance so the bbox
    # candidate join is a superset of the Euclidean-distance predicate
    pts = points.select(
        F.col(point_x).alias("_px"), F.col(point_y).alias("_py")
    ).withColumn("_pid", F.monotonically_increasing_id()).localCheckpoint()
    boxes = pts.select(
        "_pid", "_px", "_py",
        F.col("_px").alias("x"), F.col("_py").alias("y"),
    )
    boxes = xy_to_point_wkb(boxes, "x", "y", geometry_col)

    # cell-exploded equi-join on the quadtree cell (the overlay's
    # candidate machinery, same as neighbors.get_neighbor_indices) — a
    # raw bbox theta join has no equi-key, so Spark would plan a
    # BroadcastNestedLoopJoin: O(points x lines) comparisons, a
    # scale-killer on real networks
    from .geomtable import with_bounds

    d = float(max_distance)
    p = with_bounds(boxes, geometry_col)
    p = (
        p.withColumn("minx", F.col("minx") - d)
        .withColumn("miny", F.col("miny") - d)
        .withColumn("maxx", F.col("maxx") + d)
        .withColumn("maxy", F.col("maxy") + d)
    )
    cand, _ = candidate_pairs(p, lines.select(line_id, geometry_col), geometry_col)
    pairs = cand.select(
        "_pid", "_px", "_py",
        F.col(line_id + "__r").alias(line_id),
        F.col(geometry_col + "__r").alias("_lgeom"),
    )

    proj_schema = T.StructType(
        [
            T.StructField("_pid", T.LongType()),
            T.StructField(line_id, lines.schema[line_id].dataType),
            T.StructField("_d", T.DoubleType()),
            T.StructField("_s", T.DoubleType()),
            T.StructField("_len", T.DoubleType()),
        ]
    )

    def project(it):
        for pdf in it:
            if not len(pdf):
                continue
            ga = wkb.decode(pdf["_lgeom"].tolist())
            rows = {f.name: [] for f in proj_schema.fields}
            for g in range(len(pdf)):
                if ga.types[g] != wkb.T_LINE:
                    continue
                coords = _line_coords(ga, g)
                dist, s, ln = _project_onto_line(
                    coords, float(pdf["_px"].iloc[g]), float(pdf["_py"].iloc[g])
                )
                rows["_pid"].append(pdf["_pid"].iloc[g])
                rows[line_id].append(pdf[line_id].iloc[g])
                rows["_d"].append(dist)
                rows["_s"].append(s)
                rows["_len"].append(ln)
            yield pd.DataFrame(rows)

    proj = pairs.mapInPandas(project, schema=proj_schema).filter(
        F.col("_d") <= max_distance
    )
    w = Window.partitionBy("_pid").orderBy("_d", line_id)
    nearest = proj.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1)
    # snaps onto endpoints split nothing (reference behavior)
    cuts = (
        nearest.filter((F.col("_s") > eps) & (F.col("_s") < F.col("_len") - eps))
        .groupBy(line_id)
        .agg(F.array_sort(F.collect_set("_s")).alias("_cuts"))
    )

    tagged = lines.join(cuts, line_id, "left")
    out_fields = list(lines.schema.fields)
    if splitted_col:
        out_fields = out_fields + [T.StructField(splitted_col, T.IntegerType())]
    out_schema = T.StructType(out_fields)
    lcols = [c for c in lines.columns]

    def split(it):
        for pdf in it:
            if not len(pdf):
                continue
            ga = wkb.decode(pdf[geometry_col].tolist())
            rows, geoms, flags = [], [], []
            for g in range(len(pdf)):
                cut_list = pdf["_cuts"].iloc[g]
                if (
                    cut_list is None
                    or (isinstance(cut_list, float) and pd.isna(cut_list))
                    or len(cut_list) == 0
                    or ga.types[g] != wkb.T_LINE
                ):
                    rows.append(g)
                    geoms.append(pdf[geometry_col].iloc[g])
                    flags.append(0)
                    continue
                coords = _line_coords(ga, g)
                seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
                cum = np.concatenate([[0.0], np.cumsum(seg)])
                prev = 0.0
                pieces = []
                for s in list(cut_list) + [float(cum[-1])]:
                    if s <= prev + 1e-9:
                        continue
                    i0 = int(np.searchsorted(cum, prev, side="right")) - 1
                    i1 = int(np.searchsorted(cum, s, side="right")) - 1
                    def interp(d):
                        i = min(int(np.searchsorted(cum, d, side="right")) - 1, len(seg) - 1)
                        t = 0.0 if seg[i] == 0 else (d - cum[i]) / seg[i]
                        return coords[i] + (coords[i + 1] - coords[i]) * t
                    mids = coords[i0 + 1 : i1 + 1]
                    piece = np.vstack([interp(prev), *mids, interp(s)])
                    pieces.append(piece)
                    prev = s
                for piece in pieces:
                    rows.append(g)
                    geoms.append(wkb.encode_linestring(piece))
                    flags.append(1)
            out = pdf.iloc[rows][lcols].copy() if rows else pdf.iloc[:0][lcols].copy()
            out[geometry_col] = geoms
            if splitted_col:
                out[splitted_col] = flags
            yield out

    return tagged.mapInPandas(split, schema=out_schema)


def change_line_endpoint(
    lines: DataFrame,
    line_ids: DataFrame,
    new_x: str = "nx",
    new_y: str = "ny",
    change_what: str = "first",
    line_id: str = "lid",
    geometry_col: str = "geometry",
) -> DataFrame:
    """Move the first or last vertex of the selected lines to a new point
    (reference ``networkanalysis/cutting_lines.py:192-228`` — the
    endpoint-rewiring step of the split_lines rule).  ``line_ids`` is a
    small table (line_id, nx, ny) broadcast onto the line scan."""
    if change_what not in ("first", "last", 0, -1):
        raise ValueError(f"change_what should be first/last/0/-1, got {change_what}")
    first = change_what in ("first", 0)
    tagged = lines.join(
        F.broadcast(
            line_ids.select(
                line_id, F.col(new_x).alias("_nx"), F.col(new_y).alias("_ny")
            )
        ),
        line_id,
        "left",
    )
    schema = lines.schema
    lcols = list(lines.columns)

    def kernel(it):
        for pdf in it:
            if not len(pdf):
                continue
            ga = wkb.decode(pdf[geometry_col].tolist())
            geoms = []
            for g in range(len(pdf)):
                nx = pdf["_nx"].iloc[g]
                if pd.isna(nx) or ga.types[g] != wkb.T_LINE:
                    geoms.append(pdf[geometry_col].iloc[g])
                    continue
                coords = _line_coords(ga, g).copy()
                tgt = 0 if first else len(coords) - 1
                coords[tgt] = (float(nx), float(pdf["_ny"].iloc[g]))
                geoms.append(wkb.encode_linestring(coords))
            out = pdf[lcols].copy()
            out[geometry_col] = geoms
            yield out

    return tagged.mapInPandas(kernel, schema=schema)
