"""Snapshot lake tables (sources/snapshots.py): time travel on plain
parquet — append/overwrite lineage, atomic commit, expiry."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.sources.snapshots import (
    expire_snapshots,
    read_snapshot_table,
    snapshots,
    write_snapshot_table,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def test_append_lineage_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = write_snapshot_table(_mk(spark, 0, 100), t)
    s2 = write_snapshot_table(_mk(spark, 100, 150), t)
    assert (s1, s2) == (1, 2)
    assert read_snapshot_table(spark, t).count() == 150          # HEAD
    assert read_snapshot_table(spark, t, snapshot_id=1).count() == 100
    # a later OVERWRITE must not disturb either historical snapshot
    s3 = write_snapshot_table(_mk(spark, 500, 510), t, mode="overwrite")
    assert read_snapshot_table(spark, t).count() == 10
    assert read_snapshot_table(spark, t, snapshot_id=2).count() == 150
    assert read_snapshot_table(spark, t, snapshot_id=1).count() == 100
    metas = snapshots(t)
    assert [m["snapshot_id"] for m in metas] == [1, 2, 3]
    assert metas[2]["operation"] == "overwrite" and metas[2]["parent_id"] == 2
    assert s3 == 3


def test_as_of_timestamp_resolution(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 10), t)
    ts1 = snapshots(t)[-1]["timestamp_ms"]
    write_snapshot_table(_mk(spark, 10, 30), t)
    assert read_snapshot_table(spark, t, as_of_timestamp_ms=ts1).count() == 10
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_snapshot_table(spark, t, as_of_timestamp_ms=ts1 - 10_000_000)


def test_atomic_commit_orphan_invisible(spark, tmp_path):
    """A data directory without a committed manifest (crashed writer)
    must be invisible to every read."""
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 20), t)
    orphan = os.path.join(t, "data", "s99-deadbeef")
    _mk(spark, 900, 950).write.parquet(orphan)
    assert read_snapshot_table(spark, t).count() == 20
    assert [m["snapshot_id"] for m in snapshots(t)] == [1]


def test_append_schema_mismatch_refused(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 5), t)
    bad = spark.range(5).withColumn("other", F.lit("x"))
    with pytest.raises(ValueError, match="schema mismatch"):
        write_snapshot_table(bad, t)
    # overwrite MAY change schema (a new table generation)
    write_snapshot_table(bad, t, mode="overwrite")
    assert "other" in read_snapshot_table(spark, t).columns


def test_expire_snapshots_keeps_live_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 10), t)
    write_snapshot_table(_mk(spark, 10, 20), t)
    write_snapshot_table(_mk(spark, 20, 30), t)
    expired = expire_snapshots(t, keep_last=1)
    assert expired == [1, 2]
    # HEAD unaffected: its data dirs (incl. ones first written by s1/s2,
    # still referenced through the append lineage) must survive
    assert read_snapshot_table(spark, t).count() == 30
    with pytest.raises(ValueError, match="no snapshot"):
        read_snapshot_table(spark, t, snapshot_id=1)


def test_unreadable_paths_raise(spark, tmp_path):
    with pytest.raises(ValueError, match="not a snapshot table"):
        read_snapshot_table(spark, str(tmp_path / "nope"))
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 5), t)
    with pytest.raises(ValueError, match="no snapshot 7"):
        read_snapshot_table(spark, t, snapshot_id=7)
    with pytest.raises(ValueError, match="append|overwrite"):
        write_snapshot_table(_mk(spark, 0, 5), t, mode="merge")


def test_read_lake_table_routes_time_travel_to_snapshot_tables(spark, tmp_path):
    from ssb_sgis_spark.sources.io import read_lake_table

    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 10), t)
    write_snapshot_table(_mk(spark, 10, 40), t)
    assert read_lake_table(spark, t).count() == 40
    assert read_lake_table(spark, t, snapshot_id=1).count() == 10
    # a plain parquet dir (no manifests) still refuses cleanly
    p = str(tmp_path / "plain")
    _mk(spark, 0, 5).write.parquet(p)
    with pytest.raises(ValueError, match="snapshot"):
        read_lake_table(spark, p, snapshot_id=1)
