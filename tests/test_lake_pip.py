"""Cell-partitioned lake + partition-pruned PIP join (operators/lake_pip.py).

North-star invariant under test: pruning the lake to the polygons'
coarse cover cells is an execution strategy — the join result is
IDENTICAL to the unpruned PIP join — and the pruning is real partition
pruning (``PartitionFilters`` in the scan), not a post-scan filter.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_lake_pruned_pip_equals_full_join(spark, tmp_path):
    from ssb_sgis_spark.operators.lake_pip import (
        pip_join_lake_pruned,
        write_cell_partitioned_lake,
    )
    from ssb_sgis_spark.operators.sjoin import points_in_polygons_join
    from ssb_sgis_spark.sources.municipalities import muni_df
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).select("uid", "x", "y")
    munis = muni_df(spark)
    lake = str(tmp_path / "lake")
    write_cell_partitioned_lake(pages, lake)

    pruned = pip_join_lake_pruned(spark, lake, munis).select("uid", "muni_id")
    full = points_in_polygons_join(pages, munis).select("uid", "muni_id")

    a = sorted((r.uid, r.muni_id) for r in pruned.collect())
    b = sorted((r.uid, r.muni_id) for r in full.collect())
    assert a == b and len(a) > 0


def test_lake_pruned_scan_has_partition_filters(spark, tmp_path):
    from ssb_sgis_spark.operators.lake_pip import (
        partition_cells_for_polygons,
        write_cell_partitioned_lake,
    )
    from ssb_sgis_spark.sources.io import read_lake_table
    from ssb_sgis_spark.sources.municipalities import muni_df
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).select("uid", "x", "y")
    munis = muni_df(spark)
    lake = str(tmp_path / "lake")
    write_cell_partitioned_lake(pages, lake)

    cells = partition_cells_for_polygons(munis)
    scan = read_lake_table(spark, lake).filter(F.col("cell").isin(cells))
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "cell" in plan

    # pruning is real: pages spill outside the municipality grid, so the
    # lake holds partitions the cover does not touch
    lake_cells = {
        r.cell for r in read_lake_table(spark, lake).select("cell").distinct().collect()
    }
    assert lake_cells - set(cells), "expected prunable partitions outside the cover"
    # and the cover is a superset of every matched page's cell (the
    # correctness-preserving direction)
    assert scan.count() < read_lake_table(spark, lake).count()


def test_ensure_cell_lake_idempotent(spark, tmp_path):
    import os

    from ssb_sgis_spark.operators.lake_pip import ensure_cell_lake
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).select("uid", "x", "y")
    base = str(tmp_path / "lakes")
    p1 = ensure_cell_lake(pages, base=base)
    mtime = os.path.getmtime(os.path.join(p1, "_SUCCESS"))
    p2 = ensure_cell_lake(pages, base=base)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "_SUCCESS")) == mtime


def test_ensure_cell_lake_no_shared_key_when_semantichash_fails(spark, tmp_path, monkeypatch):
    """When semanticHash is unavailable the fallback key must still
    distinguish different input frames — a constant fallback would
    silently serve one frame's lake to a query over another frame."""
    from pyspark.sql import DataFrame

    from ssb_sgis_spark.operators import lake_pip

    monkeypatch.setattr(
        DataFrame, "semanticHash",
        lambda self: (_ for _ in ()).throw(RuntimeError("unavailable")),
    )
    a = spark.range(0, 10).select(
        F.col("id").alias("uid"), F.lit(1.0).alias("x"), F.lit(2.0).alias("y")
    )
    b = spark.range(0, 20).select(
        F.col("id").alias("uid"), F.lit(3.0).alias("x"), F.lit(4.0).alias("y")
    )
    base = str(tmp_path / "lakes")
    pa = lake_pip.ensure_cell_lake(a, base=base)
    pb = lake_pip.ensure_cell_lake(b, base=base)
    assert pa != pb
    assert spark.read.parquet(pa).count() == 10
    assert spark.read.parquet(pb).count() == 20


def test_read_lake_table_parquet_path_not_mistaken_for_iceberg(tmp_path):
    """write_lake_table writes plain parquet partitionBy for filesystem
    paths even in Iceberg sessions; the reader must follow the same
    convention (format('iceberg') on such a directory raises NoSuchTable)."""
    from ssb_sgis_spark.sources.io import _path_is_iceberg_table

    p = tmp_path / "t"
    (p / "cell=1").mkdir(parents=True)
    assert not _path_is_iceberg_table(str(p))       # parquet layout
    (p / "metadata").mkdir()
    assert _path_is_iceberg_table(str(p))           # true Iceberg table dir
