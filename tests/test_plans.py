"""gridloop tiled≡global invariant, salted dissolve equivalence, and
checkpoint-resume via the tile manifest."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.kernels.boolean import polygon_area
from ssb_sgis_spark.operators.dissolve import dissexp, dissolve
from ssb_sgis_spark.operators.gridloop import gridloop
from ssb_sgis_spark.plans.manifest import TiledRun, partition_metrics


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.RandomState(9)
    n = 400
    xs = 250000.0 + rng.rand(n) * 30000
    ys = 6600000.0 + rng.rand(n) * 30000
    df = spark.createDataFrame(
        [(int(i), float(xs[i]), float(ys[i])) for i in range(n)],
        "uid long, x double, y double",
    )
    return xs, ys, df


def test_gridloop_with_halo_equals_global(spark, points):
    """Per-point neighbor count within r: cellwise with halo == global —
    the reference's gridloop invariant (tests/test_bounds.py:33-89)."""
    xs, ys, df = points
    r = 900.0

    out_schema = T.StructType(
        [T.StructField("uid", T.LongType()), T.StructField("n_nbr", T.LongType())]
    )

    def func(pdf):
        own = pdf[~pdf["_is_halo"]]
        allp = pdf
        counts = []
        for _, row in own.iterrows():
            d2 = (allp["x"] - row["x"]) ** 2 + (allp["y"] - row["y"]) ** 2
            counts.append(int((d2 < r * r).sum() - 1))
        import pandas as pd

        return pd.DataFrame({"uid": own["uid"].values, "n_nbr": counts})

    got = {
        r_["uid"]: r_["n_nbr"]
        for r_ in gridloop(df, func, out_schema, gridsize=5000.0, halo=r).collect()
    }
    # global oracle
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    exp = ((d2 < r * r).sum(axis=1) - 1).astype(int)
    assert got == {i: int(exp[i]) for i in range(len(xs))}


def test_salted_dissolve_equals_plain(spark):
    """Two-stage salted union ≡ one-stage union (hot-cell skew policy)."""
    rng = np.random.RandomState(4)
    rows = []
    for i in range(60):
        x0 = 250000.0 + rng.rand() * 8000
        y0 = 6600000.0 + rng.rand() * 8000
        ring = np.array(
            [
                (x0, y0),
                (x0 + 500 + rng.rand() * 1500, y0),
                (x0 + 500 + rng.rand() * 1500, y0 + 500 + rng.rand() * 1500),
                (x0, y0 + 500 + rng.rand() * 1500),
                (x0, y0),
            ]
        )
        rows.append((i % 3, bytearray(wkb.encode_polygon([ring]))))
    df = spark.createDataFrame(rows, "grp int, geometry binary")
    plain = {
        r["grp"]: polygon_area(wkb.decode([r["geometry"]]).geom_parts(0))
        for r in dissolve(df, "grp").collect()
    }
    salted = {
        r["grp"]: polygon_area(wkb.decode([r["geometry"]]).geom_parts(0))
        for r in dissolve(df, "grp", salt=4).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-9)


def test_tiled_run_resume(spark, points, tmp_path):
    """Half the batches 'crash'; resume completes only the missing ones and
    the final output equals the one-shot run."""
    _, _, df = points
    df = df.withColumn("tile", (F.col("uid") % 10).cast("long"))
    out1 = str(tmp_path / "run1")

    def job(tiles):
        return (
            df.filter(F.col("tile").isin(tiles))
            .groupBy("tile")
            .agg(F.count("*").alias("n"), F.sum("uid").alias("uid_sum"))
        )

    tiles = list(range(10))
    run = TiledRun(spark, out1)
    # first attempt: process only 2 of 4 batches, then "crash"
    processed = 0
    for b, batch_tiles, done in run.batches(tiles, n_batches=4):
        if processed == 2:
            break
        with run.record(b) as rec:
            rec.write(job(batch_tiles))
        processed += 1
    assert len(run.done_batches()) == 2

    # resume: a fresh TiledRun over the same dir completes the rest
    run2 = TiledRun(spark, out1)
    skipped = 0
    for b, batch_tiles, done in run2.batches(tiles, n_batches=4):
        if done:
            skipped += 1
            continue
        with run2.record(b) as rec:
            rec.write(job(batch_tiles))
    assert skipped == 2

    got = {
        r["tile"]: (r["n"], r["uid_sum"])
        for r in run2.result().select("tile", "n", "uid_sum").collect()
    }
    exp = {
        r["tile"]: (r["n"], r["uid_sum"])
        for r in df.groupBy("tile")
        .agg(F.count("*").alias("n"), F.sum("uid").alias("uid_sum"))
        .collect()
    }
    assert got == exp
    # manifest carries per-batch lineage
    man = spark.read.parquet(run2.manifest_path).collect()
    assert sum(r["n_rows"] for r in man) == 10  # one agg row per tile
    assert all(r["status"] == "done" for r in man)


def test_partition_metrics(spark, points):
    _, _, df = points
    m = partition_metrics(df.repartition(6), key_col="uid").collect()
    assert sum(r["n_rows"] for r in m) == 400
    assert len(m) <= 6


def test_write_geoparquet_metadata_and_roundtrip(spark, tmp_path):
    """write_geoparquet: every file carries GeoParquet 1.0 'geo' footer
    metadata with a correct bbox; rows round-trip through spark.read."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ssb_sgis_spark.kernels import wkb
    from ssb_sgis_spark.sources.io import write_geoparquet

    def box(x0, y0, x1, y1):
        return wkb.encode_polygon(
            [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)]
        )

    rows = [(i, bytearray(box(i * 10.0, 0.0, i * 10.0 + 5, 5.0))) for i in range(20)]
    df = spark.createDataFrame(rows, "gid long, geometry binary").repartition(3)
    out = str(tmp_path / "gpq")
    manifest = write_geoparquet(df, out, crs="EPSG:25833").collect()
    assert sum(r["n_rows"] for r in manifest) == 20
    assert 1 <= len(manifest) <= 3
    for r in manifest:
        md = pq.read_table(r["file"]).schema.metadata
        geo = json.loads(md[b"geo"])
        assert geo["version"] == "1.0.0"
        assert geo["primary_column"] == "geometry"
        col = geo["columns"]["geometry"]
        assert col["encoding"] == "WKB" and col["crs"] == "EPSG:25833"
        assert col["bbox"] == [r["minx"], r["miny"], r["maxx"], r["maxy"]]
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert {row["gid"] for row in back.collect()} == set(range(20))


def test_lake_table_parquet_fallback_roundtrip(spark, tmp_path):
    """read_lake_table/write_lake_table: without the Iceberg runtime the
    same call sites write/read partitioned parquet; partition column
    filters prune at the scan (PartitionFilters, no full read)."""
    from ssb_sgis_spark.sources.io import (
        _iceberg_available,
        read_lake_table,
        write_lake_table,
    )

    assert not _iceberg_available(spark)  # sandbox has no iceberg jars

    df = spark.range(100).selectExpr(
        "id AS uid", "CAST(id % 4 AS INT) AS cell", "CAST(id AS DOUBLE) AS x"
    )
    out = str(tmp_path / "lake")
    write_lake_table(df, out, mode="overwrite", partition_by=["cell"])

    back = read_lake_table(spark, out)
    assert back.count() == 100

    pruned = back.filter("cell = 2")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert pruned.count() == 25


def test_lake_table_time_travel_requires_iceberg(spark, tmp_path):
    """Time-travel on the parquet fallback must raise, not silently read
    HEAD — snapshot semantics only exist with the Iceberg runtime."""
    import pytest as _pytest

    from ssb_sgis_spark.sources.io import read_lake_table, write_lake_table

    out = str(tmp_path / "lake2")
    write_lake_table(spark.range(5).toDF("uid"), out, mode="overwrite")
    with _pytest.raises(ValueError, match="time travel"):
        read_lake_table(spark, out, snapshot_id=123)
