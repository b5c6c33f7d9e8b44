"""Exact haversine kNN at scale: cell-partitioned ring escalation on a
wrap-aware lon/lat grid (closes the scale-path refusal that
``knn.get_k_nearest_neighbors(metric="haversine")`` used to raise for
non-broadcastable right sides).

Why the planar cellwise guarantee breaks on a sphere: "outside the
(2r+1)² ring" separates candidates by ≥ r·cell in LON-INDEX or
LAT-INDEX, but longitude degrees shrink with latitude — near the poles
a huge Δλ is a tiny distance, so ``kth_dist ≤ r·cell`` proves nothing.
The fix is NOT a different grid (exactness never depends on the grid —
any candidate the rings miss is caught by escalation + the brute
fallback); it is a correct per-query-point PROOF bound:

    G(p, r) = min( R·rΔ,                      # |Δφ| ≥ rΔ branch
                   R·asin(cos φ_p · sin rΔ) ) # |Δλ| ≥ rΔ branch

with rΔ = radians(r · cell_deg).  The lat branch is the meridian arc
(great-circle distance ≥ R·|Δφ| always).  The lon branch is the
cross-track distance from p to the boundary meridian of the excluded
lune: the spherical distance from p to the great circle through the
poles at Δλ is asin(|p·n|) = asin(cos φ_p · sin Δλ), a valid lower
bound on the distance to ANY point with |Δλ| ≥ rΔ (for rΔ > 90° the
full-circle distance under-estimates the lune distance — an
under-estimate only delays proof, never falsifies it; for rΔ ≥ 180°
the lune is empty and only the lat branch separates).  A row is proven
when its kth distance ≤ G(p, r); rows near a pole have cos φ → 0, are
never proven by rings, and degrade gracefully into the distributed
brute pass — exactly the behaviour you want: polar data is the skew
case, and it costs a bounded brute stage instead of a wrong answer.

Grid: ilon = ⌊(lon+180)/cell⌋ mod N (N = 360/cell — the halo WRAPS at
the dateline, so ±179.9° are ring-1 neighbours), ilat = ⌊(lat+90)/cell⌋
clamped at the poles; replicas whose lat offset leaves the grid are
dropped (no cell exists there — nothing to probe).  Pair-uniqueness
per cell holds whenever 2r+1 ≤ N; wider rings dedup on (id, cell).

Everything else mirrors ``knn.knn_cellwise`` (reference parity
``neighbors.py:228-382``): round-1 replicates the RIGHT side into 3×3
halos, later rounds replicate the shrinking LEFT violator set with r
doubling, then a brute stage (broadcast violators, per-partition
numpy haversine top-k, one final window).  Distances are great-circle
metres on the R=6371008.8 sphere — the same formula as
``kernels.geom.haversine_m`` and the knn_haversine oracle; cross-engine
comparisons round to whole metres (documented ~1e-9 m libm drift).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

R_EARTH = 6371008.8

__all__ = ["knn_cellwise_haversine"]


def _geo_cell(lon, lat, cell_deg: float, n_lon: int, n_lat: int, ox, oy):
    """Wrapped cell id for a (lon, lat) point shifted by (ox, oy) cells;
    NULL when the lat offset leaves the grid (no such cell)."""
    ilon = F.floor((lon + 180.0) / cell_deg).cast("long")
    ilat = F.least(
        F.floor((lat + 90.0) / cell_deg).cast("long"), F.lit(n_lat - 1)
    )  # lat=90 lands in the top band
    sh_lat = ilat + oy
    sh_lon = F.pmod(ilon + ox, F.lit(n_lon))
    return F.when(
        (sh_lat >= 0) & (sh_lat < n_lat), sh_lat * n_lon + sh_lon
    )


def _geo_halo(df, id_col, lon_col, lat_col, cell_deg, n_lon, n_lat, r: int):
    """Replicate rows into their (2r+1)² ring cells (lon wraps, lat
    drops off-grid replicas).  Distinct cells per row when 2r+1 ≤ n_lon,
    else dedup."""
    offsets = [
        F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
        for ox in range(-r, r + 1)
        for oy in range(-r, r + 1)
    ]
    out = (
        df.withColumn("_o", F.explode(F.array(*offsets)))
        .withColumn(
            "_cell",
            _geo_cell(
                F.col(lon_col),
                F.col(lat_col),
                cell_deg,
                n_lon,
                n_lat,
                F.col("_o.ox"),
                F.col("_o.oy"),
            ),
        )
        .filter(F.col("_cell").isNotNull())
        .drop("_o")
    )
    if 2 * r + 1 > n_lon:
        out = out.dropDuplicates([id_col, "_cell"])
    return out


def _haversine_col(llon, llat, rlon, rlat):
    """Great-circle metres, same formula as kernels.geom.haversine_m."""
    a = F.pow(F.sin(F.radians(rlat - llat) / 2), 2) + F.cos(
        F.radians(llat)
    ) * F.cos(F.radians(rlat)) * F.pow(F.sin(F.radians(rlon - llon) / 2), 2)
    return 2 * R_EARTH * F.asin(F.sqrt(a))


def _proof_bound(lat_col, r: int, cell_deg: float):
    """G(p, r): a lower bound on the distance to anything outside the
    (2r+1)² ring (see module docstring)."""
    rdelta = np.radians(r * cell_deg)
    g_lat = R_EARTH * rdelta
    if r * cell_deg >= 180.0:
        return F.lit(float(g_lat))
    g_lon = R_EARTH * F.asin(
        F.cos(F.radians(lat_col)) * F.lit(float(np.sin(rdelta)))
    )
    return F.least(F.lit(float(g_lat)), g_lon)


def knn_cellwise_haversine(
    left: DataFrame,
    right: DataFrame,
    k: int,
    cell_deg: float = 1.0,
    *,
    left_id: str = "uid",
    left_x: str = "x",
    left_y: str = "y",
    right_id: str = "vid",
    right_x: str = "px",
    right_y: str = "py",
    max_rings: int = 4,
    brute_threshold: int = 100_000,
    brute_work: int = 2_000_000_000,
    n_right: int | None = None,
) -> DataFrame:
    """Exact great-circle kNN without broadcasting the right side.
    Coordinates are degrees (x=lon, y=lat), lon normalized to
    [-180, 180); output ``(left_id, neighbor_id, distance, knn_rank)``
    in metres, ties on (distance, neighbor_id) — the broadcast path's
    and oracle's ordering."""
    from ssb_sgis_spark.operators.knn import _select_topk_tiesafe

    if not (0 < cell_deg <= 90):
        raise ValueError("cell_deg must be in (0, 90]")
    n_lon = int(round(360.0 / cell_deg))
    if abs(n_lon * cell_deg - 360.0) > 1e-9:
        raise ValueError("cell_deg must divide 360 exactly (wrap grid)")
    n_lat = int(np.ceil(180.0 / cell_deg))

    spark = left.sparkSession
    from pyspark.sql.window import Window

    w = Window.partitionBy(left_id).orderBy("distance", "neighbor_id")

    def _topk(scored):
        return (
            scored.withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .withColumn("knn_rank", F.col("knn_rank").cast("int"))
        )

    def _split_proven(ranked, r, current_left):
        # violators from current_left (anti-join), NOT from ranked:
        # candidate-less rows must keep escalating (knn.py's invariant)
        per = ranked.groupBy(left_id).agg(
            F.max("knn_rank").alias("_n"),
            F.max("distance").alias("_kd"),
            F.first(left_y).alias("_lat"),
        )
        proven_ids = per.filter(
            (F.col("_n") >= k)
            & (F.col("_kd") <= _proof_bound(F.col("_lat"), r, cell_deg))
        ).select(left_id)
        proven = ranked.join(proven_ids, on=left_id, how="left_semi")
        remaining = current_left.join(proven_ids, on=left_id, how="left_anti")
        return proven, remaining

    dist = _haversine_col(
        F.col(left_x), F.col(left_y), F.col(right_x), F.col(right_y)
    )

    right_c = right.select(
        right_id,
        F.pmod(F.col(right_x) + 180.0, F.lit(360.0)) - 180.0,
        F.col(right_y),
    ).toDF(right_id, right_x, right_y)
    left_c = left.select(
        left_id,
        F.pmod(F.col(left_x) + 180.0, F.lit(360.0)) - 180.0,
        F.col(left_y),
    ).toDF(left_id, left_x, left_y)

    # round 1: right into 3x3 halos, left joins its own cell
    right_h = _geo_halo(right_c, right_id, right_x, right_y, cell_deg, n_lon, n_lat, 1)
    left_k = left_c.withColumn(
        "_cell",
        _geo_cell(
            F.col(left_x), F.col(left_y), cell_deg, n_lon, n_lat, F.lit(0), F.lit(0)
        ),
    )
    scored1 = left_k.join(right_h, "_cell").select(
        left_id,
        left_x,
        left_y,
        F.col(right_id).alias("neighbor_id"),
        dist.alias("distance"),
    )
    ranked = _topk(scored1).localCheckpoint()
    proven, remaining = _split_proven(ranked, 1, left_k)
    results = [proven.select(left_id, "neighbor_id", "distance", "knn_rank")]
    remaining = remaining.localCheckpoint()

    base_right = right_c.withColumn(
        "_cell",
        _geo_cell(
            F.col(right_x), F.col(right_y), cell_deg, n_lon, n_lat, F.lit(0), F.lit(0)
        ),
    )
    n_rem = remaining.count()
    if n_right is None:
        n_right = right_c.count()
    r = 2
    rounds = 0

    def _go_brute(nr):
        return nr <= brute_threshold and nr * n_right <= brute_work

    while rounds < max_rings and not _go_brute(n_rem) and n_rem > 0:
        cells = _geo_halo(
            remaining.drop("_cell"), left_id, left_x, left_y, cell_deg, n_lon, n_lat, r
        )
        scored = cells.join(base_right, "_cell").select(
            left_id,
            left_x,
            left_y,
            F.col(right_id).alias("neighbor_id"),
            dist.alias("distance"),
        )
        # a (left, right) pair can match on several cells once both
        # sides are replicated? no: only the LEFT is ringed here, the
        # right sits in its home cell — one match per pair, no dedup
        ranked_r = _topk(scored).localCheckpoint()
        proven_r, remaining = _split_proven(ranked_r, r, remaining)
        results.append(proven_r.select(left_id, "neighbor_id", "distance", "knn_rank"))
        remaining = remaining.localCheckpoint()
        n_rem = remaining.count()
        r *= 2
        rounds += 1

    if n_rem:
        from ssb_sgis_spark.kernels.geom import haversine_m

        vrows = remaining.select(left_id, left_x, left_y).collect()
        vid = np.array([row[left_id] for row in vrows])
        vlon = np.array([row[left_x] for row in vrows], dtype=np.float64)
        vlat = np.array([row[left_y] for row in vrows], dtype=np.float64)
        bcv = spark.sparkContext.broadcast((vid, vlon, vlat))
        part_schema = StructType(
            [
                StructField(left_id, left.schema[left_id].dataType),
                StructField("neighbor_id", right.schema[right_id].dataType),
                StructField("distance", DoubleType()),
            ]
        )

        def brute(it):
            vid_, vlon_, vlat_ = bcv.value
            for pdf in it:
                if not len(pdf):
                    continue
                ridv = pdf[right_id].to_numpy()
                order = np.argsort(ridv, kind="stable")
                ridv = ridv[order]
                rlon = pdf[right_x].to_numpy(np.float64)[order]
                rlat = pdf[right_y].to_numpy(np.float64)[order]
                d = haversine_m(
                    vlon_[:, None], vlat_[:, None], rlon[None, :], rlat[None, :]
                )
                kk = min(k, d.shape[1])
                part = _select_topk_tiesafe(d, kk)
                yield pd.DataFrame(
                    {
                        left_id: np.repeat(vid_, kk),
                        "neighbor_id": ridv[part].ravel(),
                        "distance": np.take_along_axis(d, part, axis=1).ravel(),
                    }
                )

        partials = right_c.mapInPandas(brute, schema=part_schema)
        results.append(_topk(partials))

    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out
