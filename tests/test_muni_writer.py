"""write_municipality_data: PIP-assign + partitionBy writer
(reference io/write_municipality_data.py:14-195)."""

import os

from pyspark.sql import functions as F

from ssb_sgis_spark.sources.municipalities import muni_df
from ssb_sgis_spark.sources.pages import pages_df
from ssb_sgis_spark.operators.sjoin import points_in_polygons_join
from ssb_sgis_spark.sources.muni_writer import (
    fix_missing_muni_numbers,
    neighbor_munis,
    write_municipality_data,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_write_roundtrip(spark, tmp_path):
    out = str(tmp_path / "by_muni")
    pages = pages_df(spark, SF)
    write_municipality_data(
        pages, out, muni_df(spark), muni_number_col="muni_id", id_cols=["uid"]
    )
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    back = spark.read.parquet(out)
    want = points_in_polygons_join(
        pages, muni_df(spark), key_col="muni_id", id_cols=["uid"]
    )
    a = sorted((r["uid"], r["muni_id"]) for r in back.select("uid", "muni_id").collect())
    b = sorted((r["uid"], r["muni_id"]) for r in want.select("uid", "muni_id").collect())
    assert a == b
    # hive layout: one directory per municipality that has rows
    assert any(d.startswith("muni_id=") for d in os.listdir(out))


def test_fix_missing_keeps_existing_numbers(spark):
    pages = pages_df(spark, SF).limit(100)
    # pre-assign a (deliberately wrong) number to half the rows
    tagged = pages.withColumn(
        "muni_id", F.when(F.col("uid") % 2 == 0, F.lit("9999")).otherwise(F.lit(None))
    )
    fixed = fix_missing_muni_numbers(
        tagged, muni_df(spark), muni_number_col="muni_id", id_cols=["uid"]
    )
    rows = {r["uid"]: r["muni_id"] for r in fixed.collect()}
    evens = [v for k, v in rows.items() if k % 2 == 0]
    assert evens and all(v == "9999" for v in evens)  # kept, not overwritten
    odds = [v for k, v in rows.items() if k % 2 == 1]
    assert all(v != "9999" for v in odds)  # filled from the PIP join


def test_neighbor_munis_symmetric_with_self(spark):
    pairs = neighbor_munis(muni_df(spark), muni_number_col="muni_id")
    s = set(pairs)
    munis = {r["muni_id"] for r in muni_df(spark).select("muni_id").collect()}
    assert {(m, m) for m in munis} <= s            # self pairs
    assert all((b, a) in s for a, b in s)          # symmetry
    assert len(s) > len(munis)                     # some real adjacency


def test_with_neighbors_partitions_superset(spark, tmp_path):
    out = str(tmp_path / "by_muni_nbr")
    pages = pages_df(spark, SF)
    write_municipality_data(
        pages, out, muni_df(spark), muni_number_col="muni_id",
        with_neighbors=True, id_cols=["uid"],
    )
    back = spark.read.parquet(out)
    plain = points_in_polygons_join(
        pages, muni_df(spark), key_col="muni_id", id_cols=["uid"]
    )
    # every muni's neighbor partition contains at least its own rows
    assert back.count() >= plain.count()
