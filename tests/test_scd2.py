"""SCD Type-2 merge (operators/scd.scd2_apply)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ssb_sgis_spark.operators.scd import scd2_apply

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("a", StringType()),
        StructField("valid_from", LongType()),
        StructField("valid_to", LongType()),
    ]
)
UPD_SCHEMA = StructType(
    [StructField("k", LongType()), StructField("a", StringType())]
)


def _run(spark, dim_rows, upd_rows, ts=100):
    dim = spark.createDataFrame(dim_rows, SCHEMA)
    upd = spark.createDataFrame(upd_rows, UPD_SCHEMA)
    got = scd2_apply(dim, upd, "k", ["a"], ts).collect()
    return {(r.k, r.valid_from, r.valid_to): r.a for r in got}


def test_changed_update_closes_and_reopens(spark):
    got = _run(spark, [(1, "old", 0, None)], [(1, "new")])
    assert got == {(1, 0, 100): "old", (1, 100, None): "new"}


def test_noop_update_creates_no_version(spark):
    got = _run(spark, [(1, "same", 0, None)], [(1, "same")])
    assert got == {(1, 0, None): "same"}


def test_new_key_inserts_open_version(spark):
    got = _run(spark, [(1, "x", 0, None)], [(2, "y")])
    assert got == {(1, 0, None): "x", (2, 100, None): "y"}


def test_closed_history_passes_through_untouched(spark):
    dim = [(1, "v1", 0, 50), (1, "v2", 50, None)]
    got = _run(spark, dim, [(1, "v3")])
    assert got == {
        (1, 0, 50): "v1",
        (1, 50, 100): "v2",
        (1, 100, None): "v3",
    }


def test_null_attributes_compare_null_safe(spark):
    # NULL -> NULL is a no-op; NULL -> value and value -> NULL are changes
    got = _run(
        spark,
        [(1, None, 0, None), (2, None, 0, None), (3, "v", 0, None)],
        [(1, None), (2, "now"), (3, None)],
    )
    assert got == {
        (1, 0, None): None,
        (2, 0, 100): None,
        (2, 100, None): "now",
        (3, 0, 100): "v",
        (3, 100, None): None,
    }
