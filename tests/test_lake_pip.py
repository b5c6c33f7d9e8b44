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
