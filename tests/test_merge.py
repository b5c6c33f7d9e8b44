"""Copy-on-write MERGE INTO (sources/snapshots.merge_snapshot_table)."""

import os

import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.sources import snapshots as snap
from ssb_sgis_spark.sources.snapshots import (
    merge_snapshot_table,
    read_snapshot_table,
    snapshots,
    write_snapshot_table,
)


def _mk(spark, lo, hi, mult=10):
    return spark.range(lo, hi).withColumn("v", F.col("id") * mult)


def _head_map(spark, t):
    return {r.id: r.v for r in read_snapshot_table(spark, t).collect()}


def test_upsert_semantics_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 100), t)
    updates = _mk(spark, 90, 110, mult=1000)  # 10 updates + 10 inserts
    sid = merge_snapshot_table(spark, t, updates, "id")
    assert sid == 2
    got = _head_map(spark, t)
    assert len(got) == 110
    assert got[5] == 50  # untouched
    assert got[95] == 95_000  # updated
    assert got[105] == 105_000  # inserted
    # pre-merge snapshot unchanged (copy-on-write, nothing mutated)
    old = {r.id: r.v for r in read_snapshot_table(spark, t, snapshot_id=1).collect()}
    assert len(old) == 100 and old[95] == 950
    assert snapshots(t)[-1]["operation"] == "merge"


def test_point_merge_rewrites_one_file_after_clustering(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = _mk(spark, 0, 1000).repartitionByRange(4, "id").sortWithinPartitions("id")
    write_snapshot_table(df, t)
    before = set(snap._snapshot_files(snapshots(t)[-1]))
    assert len(before) == 4
    one = _mk(spark, 7, 8, mult=999)
    merge_snapshot_table(spark, t, one, "id")
    m = snapshots(t)[-1]
    assert m["rewritten_files"] == 1 and m["carried_files"] == 3
    # the three carried files are the SAME physical paths (zero-IO reuse)
    after = set(snap._snapshot_files(m))
    assert len(before & after) == 3
    got = _head_map(spark, t)
    assert len(got) == 1000 and got[7] == 7 * 999 and got[8] == 80


def test_insert_only_touches_nothing(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = _mk(spark, 0, 100).repartitionByRange(2, "id").sortWithinPartitions("id")
    write_snapshot_table(df, t)
    merge_snapshot_table(spark, t, _mk(spark, 5000, 5020), "id")
    m = snapshots(t)[-1]
    assert m["rewritten_files"] == 0 and m["carried_files"] == 2
    assert len(_head_map(spark, t)) == 120


def test_cardinality_and_schema_guards(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 10), t)
    dup = _mk(spark, 0, 2).unionByName(_mk(spark, 0, 1))
    with pytest.raises(ValueError, match="not unique"):
        merge_snapshot_table(spark, t, dup, "id")
    bad = spark.range(0, 2).withColumn("other", F.lit(1))
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_snapshot_table(spark, t, bad, "id")


def test_interval_fallback_same_result(spark, tmp_path, monkeypatch):
    """Above the exact-key cap the footer-interval fallback may rewrite
    more files but must produce the identical table."""
    t1, t2 = str(tmp_path / "a"), str(tmp_path / "b")
    base = _mk(spark, 0, 500).repartitionByRange(4, "id").sortWithinPartitions("id")
    upd = _mk(spark, 100, 140, mult=77)
    for t in (t1, t2):
        write_snapshot_table(base, t)
    merge_snapshot_table(spark, t1, upd, "id")
    monkeypatch.setattr(snap, "MERGE_EXACT_KEY_CAP", 0)
    merge_snapshot_table(spark, t2, upd, "id")
    assert _head_map(spark, t1) == _head_map(spark, t2)
    # fallback still prunes: files whose range misses [100, 140) carry over
    assert snapshots(t2)[-1]["carried_files"] >= 2


def test_delete_keys_cdc(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = _mk(spark, 0, 100).repartitionByRange(4, "id").sortWithinPartitions("id")
    write_snapshot_table(base, t)
    dels = spark.range(10, 20).select(F.col("id"))
    merge_snapshot_table(spark, t, None, "id", delete_keys=dels)
    got = _head_map(spark, t)
    assert len(got) == 90 and 15 not in got and got[5] == 50
    # point delete after clustering rewrites exactly one file
    m = snapshots(t)[-1]
    assert m["rewritten_files"] == 1 and m["carried_files"] == 3


def test_update_and_delete_in_one_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 50), t)
    upd = _mk(spark, 0, 5, mult=777)
    dels = spark.range(40, 50).select(F.col("id"))
    merge_snapshot_table(spark, t, upd, "id", delete_keys=dels)
    got = _head_map(spark, t)
    assert len(got) == 40 and got[0] == 0 and got[3] == 3 * 777 and 45 not in got


def test_conflicting_update_delete_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot_table(_mk(spark, 0, 10), t)
    with pytest.raises(ValueError, match="BOTH updates and delete_keys"):
        merge_snapshot_table(
            spark, t, _mk(spark, 0, 3), "id",
            delete_keys=spark.range(2, 4).select(F.col("id")),
        )
    with pytest.raises(ValueError, match="updates and/or delete_keys"):
        merge_snapshot_table(spark, t, None, "id")
