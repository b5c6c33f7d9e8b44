"""Spatial autocorrelation statistics over hex-binned page densities.

The classic ESDA pair (reference parity: sgis feeds its grid/hex layers
into exactly these analyses downstream; the reference repo itself stops
at the binning — ``src/sgis/geopandas_tools/bounds.py:262-372`` — so the
statistics are implemented here from the published formulas):

- **LISA quadrants** (Anselin 1995, Local Indicators of Spatial
  Association): per hex cell, the sign of its own deviation vs the sign
  of its neighborhood's deviation → HH (hotspot), LL (coldspot),
  HL / LH (spatial outliers).
- **Global Moran's I** (Moran 1950): one scalar in micro-units,
  ``I = (N / S0) · Σ_ij w_ij z_i z_j / Σ_i z_i²`` with binary rook
  weights on the 6 axial hex neighbors.

Exactness discipline (the engine-wide rule): with z scaled by N —
``z_num_i = N·n_i − S`` (S = total pages, N = occupied cells) — every
per-cell quantity is a 64-bit integer, the global cross/square sums run
in ``decimal(38,0)`` (Spark) / HUGEINT (DuckDB), and the final ratio is
ONE canonical floor division — bit-exact across engines, no float sum
order anywhere.

Universe convention: the lattice is the set of OCCUPIED hexes (≥1 page);
absent neighbors carry weight 0.  This is the standard point-pattern
binning setup and keeps every stage |occupied|-sized.

Scale shape (10^12 pages): pages collapse to the per-hex histogram in
ONE map-side-combined groupBy; everything after is |occupied hexes|
sized — a 6-offset map-only scatter-explode, one gather groupBy, one
co-keyed join.  No pages row ever shuffles twice; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssb_sgis_spark.hexcells import AXIAL_NEIGHBORS, hex_density

_DEC = "decimal(38,0)"


def _densz(df: DataFrame, size: float, x_col: str, y_col: str) -> DataFrame:
    """Per-occupied-hex integer deviations: z_num_i = N·n_i − S.

    The (N, S) scalars ride in on a broadcast one-row cross join (the
    same documented scalar-BNLJ shape as ``dsir_select``), so the plan
    stays fully lazy — no driver round-trip before the action.
    """
    dens = hex_density(df, size, x_col, y_col)
    tot = dens.agg(
        F.count("*").alias("n_cells"), F.sum("n").alias("s_total")
    )
    return dens.crossJoin(F.broadcast(tot)).withColumn(
        "z_num", F.col("n_cells") * F.col("n") - F.col("s_total")
    )


def _lag(densz: DataFrame) -> DataFrame:
    """Neighborhood gather: for every hex, the sum of z_num over its
    occupied axial neighbors plus the directed pair count — via a
    map-only 6-offset scatter-explode and ONE groupBy (no join against
    the neighbor list; scatter ≡ gather because the offsets are
    symmetric)."""
    arr = F.array(
        *[
            F.struct(F.lit(a).alias("dq"), F.lit(b).alias("dr"))
            for a, b in AXIAL_NEIGHBORS
        ]
    )
    return (
        densz.select("hex_q", "hex_r", "z_num", F.explode(arr).alias("o"))
        .groupBy(
            (F.col("hex_q") + F.col("o.dq")).alias("hex_q"),
            (F.col("hex_r") + F.col("o.dr")).alias("hex_r"),
        )
        .agg(
            F.sum("z_num").alias("lag_raw"),
            F.count("*").alias("nbr_pairs_raw"),
        )
    )


def lisa_quadrants(
    df: DataFrame,
    size: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Anselin LISA cluster map over hex-binned counts.

    Returns one row per occupied hex: ``(hex_q, hex_r, n, z_num,
    lag_num, nbr_pairs, quadrant)`` where quadrant is ``HH`` (hotspot:
    above-mean cell in an above-mean neighborhood), ``LL`` (coldspot),
    ``HL``/``LH`` (spatial outliers), or ``NS`` (zero deviation, zero
    neighborhood sum, or no occupied neighbors — sign undefined).

    All columns are exact 64-bit integers (z scaled by N), so the DuckDB
    oracle matches bit-for-bit.
    """
    densz = _densz(df, size, x_col, y_col)
    lag = _lag(densz)
    out = densz.join(lag, ["hex_q", "hex_r"], "left").select(
        "hex_q",
        "hex_r",
        "n",
        "z_num",
        F.coalesce(F.col("lag_raw"), F.lit(0)).alias("lag_num"),
        F.coalesce(F.col("nbr_pairs_raw"), F.lit(0)).alias("nbr_pairs"),
    )
    z, lg, npair = F.col("z_num"), F.col("lag_num"), F.col("nbr_pairs")
    quadrant = (
        F.when((z == 0) | (npair == 0) | (lg == 0), F.lit("NS"))
        .when((z > 0) & (lg > 0), F.lit("HH"))
        .when((z < 0) & (lg < 0), F.lit("LL"))
        .when((z > 0) & (lg < 0), F.lit("HL"))
        .otherwise(F.lit("LH"))
    )
    return out.withColumn("quadrant", quadrant)


def morans_i(
    df: DataFrame,
    size: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Global Moran's I over hex-binned counts, micro-unit exact.

    One row: ``(n_cells, s0_pairs, cross_sum, ssq_sum, i_micro)`` with
    ``i_micro = floor(10^6 · N · cross / (S0 · ssq))`` — cross/ssq are
    ``decimal(38,0)`` sums (per-term products exceed int64 at scale),
    and the single final floor division runs driver-side in Python
    arbitrary-precision ints (one collected row; the DuckDB oracle does
    the identical canonical floor division in HUGEINT).  ``i_micro = 0``
    when the variance is degenerate (all cells equal).
    """
    densz = _densz(df, size, x_col, y_col)
    lag = _lag(densz)
    zdec = F.col("z_num").cast(_DEC)
    agg = (
        densz.join(lag, ["hex_q", "hex_r"], "left")
        .agg(
            F.max("n_cells").alias("n_cells"),
            F.sum(F.coalesce(F.col("nbr_pairs_raw"), F.lit(0))).alias("s0_pairs"),
            F.sum(zdec * F.coalesce(F.col("lag_raw"), F.lit(0)).cast(_DEC)).alias(
                "cross_sum"
            ),
            F.sum(zdec * zdec).alias("ssq_sum"),
        )
        .collect()[0]
    )
    n_cells = int(agg["n_cells"])
    s0 = int(agg["s0_pairs"])
    cross = int(agg["cross_sum"])
    ssq = int(agg["ssq_sum"])
    den = s0 * ssq
    i_micro = (1_000_000 * n_cells * cross) // den if den else 0
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n_cells, s0, str(cross), str(ssq), i_micro)],
        "n_cells bigint, s0_pairs bigint, cross_sum string, ssq_sum string, i_micro bigint",
    )


def lisa_oracle_sql(pages_sql: str, hex_q: str, hex_r: str) -> str:
    """DuckDB mirror of :func:`lisa_quadrants`; ``hex_q``/``hex_r`` are
    the shared axial-bin expressions from ``hexcells.hex_qr_sql``."""
    return f"""
        WITH pages AS ({pages_sql}),
        dens AS (
          SELECT {hex_q} AS hex_q, {hex_r} AS hex_r, count(*) AS n
          FROM pages GROUP BY 1, 2
        ),
        tot AS (SELECT count(*) AS n_cells, sum(n) AS s_total FROM dens),
        densz AS (
          SELECT d.hex_q, d.hex_r, d.n,
                 t.n_cells * d.n - t.s_total AS z_num
          FROM dens d CROSS JOIN tot t
        ),
        offs(dq, dr) AS (
          VALUES (1, 0), (-1, 0), (1, -1), (-1, 1), (0, -1), (0, 1)
        ),
        lag AS (
          SELECT d.hex_q + o.dq AS hex_q, d.hex_r + o.dr AS hex_r,
                 sum(d.z_num) AS lag_raw, count(*) AS nbr_pairs_raw
          FROM densz d CROSS JOIN offs o
          GROUP BY 1, 2
        )
        SELECT d.hex_q, d.hex_r, d.n,
               CAST(d.z_num AS BIGINT) AS z_num,
               CAST(coalesce(l.lag_raw, 0) AS BIGINT) AS lag_num,
               CAST(coalesce(l.nbr_pairs_raw, 0) AS BIGINT) AS nbr_pairs,
               CASE
                 WHEN d.z_num = 0 OR coalesce(l.nbr_pairs_raw, 0) = 0
                      OR coalesce(l.lag_raw, 0) = 0 THEN 'NS'
                 WHEN d.z_num > 0 AND l.lag_raw > 0 THEN 'HH'
                 WHEN d.z_num < 0 AND l.lag_raw < 0 THEN 'LL'
                 WHEN d.z_num > 0 AND l.lag_raw < 0 THEN 'HL'
                 ELSE 'LH'
               END AS quadrant
        FROM densz d LEFT JOIN lag l USING (hex_q, hex_r)
    """


def morans_i_oracle_sql(pages_sql: str, hex_q: str, hex_r: str) -> str:
    """DuckDB mirror of :func:`morans_i` — HUGEINT sums and the same
    canonical floor division ``(num − pmod(num, den)) / den``."""
    return f"""
        WITH pages AS ({pages_sql}),
        dens AS (
          SELECT {hex_q} AS hex_q, {hex_r} AS hex_r, count(*) AS n
          FROM pages GROUP BY 1, 2
        ),
        tot AS (SELECT count(*) AS n_cells, sum(n) AS s_total FROM dens),
        densz AS (
          SELECT d.hex_q, d.hex_r,
                 CAST(t.n_cells * d.n - t.s_total AS HUGEINT) AS z_num,
                 t.n_cells
          FROM dens d CROSS JOIN tot t
        ),
        offs(dq, dr) AS (
          VALUES (1, 0), (-1, 0), (1, -1), (-1, 1), (0, -1), (0, 1)
        ),
        lag AS (
          SELECT d.hex_q + o.dq AS hex_q, d.hex_r + o.dr AS hex_r,
                 sum(d.z_num) AS lag_raw, count(*) AS nbr_pairs_raw
          FROM densz d CROSS JOIN offs o
          GROUP BY 1, 2
        ),
        sums AS (
          SELECT max(d.n_cells) AS n_cells,
                 sum(coalesce(l.nbr_pairs_raw, 0)) AS s0_pairs,
                 sum(d.z_num * coalesce(l.lag_raw, 0)) AS cross_sum,
                 sum(d.z_num * d.z_num) AS ssq_sum
          FROM densz d LEFT JOIN lag l USING (hex_q, hex_r)
        ),
        fin AS (
          SELECT n_cells, s0_pairs, cross_sum, ssq_sum,
                 CAST(1000000 AS HUGEINT) * n_cells * cross_sum AS num,
                 CAST(s0_pairs AS HUGEINT) * ssq_sum AS den
          FROM sums
        )
        SELECT CAST(n_cells AS BIGINT) AS n_cells,
               CAST(s0_pairs AS BIGINT) AS s0_pairs,
               CAST(cross_sum AS VARCHAR) AS cross_sum,
               CAST(ssq_sum AS VARCHAR) AS ssq_sum,
               CAST(CASE WHEN den = 0 THEN 0
                    ELSE (num - ((num % den) + den) % den) // den
               END AS BIGINT) AS i_micro
        FROM fin
    """
