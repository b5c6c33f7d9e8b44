"""Point snapping — nearest-join then move (reference
``sgis/geopandas_tools/point_operations.py``).

``snap_all`` (:108-183) moves every point to its nearest target point;
``snap_within_distance`` (:14-105) only within max_distance, keeping a
``snap_distance`` column (NA when not snapped).  Nearest = the engine's
kNN join with k=1 (reference composes sjoin_nearest the same way).
Targets here are point tables (x/y columns) — the 10^12-page layout;
snapping to lines/polygons would add a nearest-point-on-edge kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import get_k_nearest_neighbors


def snap_all(
    points: DataFrame,
    to: DataFrame,
    id_col: str = "uid",
    right_id: str = "vid",
    right_x: str = "px",
    right_y: str = "py",
    distance_col: str | None = None,
) -> DataFrame:
    """Replace each point's (x, y) with its nearest target's coordinates."""
    nn = get_k_nearest_neighbors(
        points, to, k=1, left_id=id_col, right_id=right_id, right_x=right_x, right_y=right_y
    )
    tgt = to.select(
        F.col(right_id).alias("neighbor_id"),
        F.col(right_x).alias("_tx"),
        F.col(right_y).alias("_ty"),
    )
    out = (
        nn.join(F.broadcast(tgt), "neighbor_id")
        .select(
            id_col,
            F.col("_tx").alias("x"),
            F.col("_ty").alias("y"),
            F.col("distance"),
        )
    )
    if distance_col:
        return out.withColumnRenamed("distance", distance_col)
    return out.drop("distance")


def snap_within_distance(
    points: DataFrame,
    to: DataFrame,
    max_distance: float,
    id_col: str = "uid",
    distance_col: str = "snap_distance",
) -> DataFrame:
    """Snap only when nearest target is within max_distance; otherwise the
    original coordinates stay and the distance is null (reference
    ``point_operations.py:14-105``)."""
    orig = points.select(id_col, F.col("x").alias("_ox"), F.col("y").alias("_oy"))
    snapped = snap_all(points, to, id_col, distance_col="_d")

    j = orig.join(snapped.withColumnRenamed("x", "_sx").withColumnRenamed("y", "_sy"), id_col, "left")
    within = F.col("_d") <= max_distance
    return j.select(
        id_col,
        F.when(within, F.col("_sx")).otherwise(F.col("_ox")).alias("x"),
        F.when(within, F.col("_sy")).otherwise(F.col("_oy")).alias("y"),
        F.when(within, F.col("_d")).otherwise(F.lit(None)).alias(distance_col),
    )
