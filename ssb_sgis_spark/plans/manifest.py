"""Checkpoint-resumable tiled execution with lineage + metrics.

North-rule obligations the reference lacks (its only telemetry is the
NetworkAnalysis run log, ``networkanalysis.py:1259-1330`` — method name,
elapsed minutes, percent_missing, cost stats; our metric schema is
modeled on it):

* **tile assignment manifest** — a little parquet table
  ``(batch_id, status, n_rows, elapsed_s, checksum, finished_ts)`` next
  to the job output.  A job processes tile *batches*; each finished batch
  appends its output partition AND its manifest row.  On restart,
  :class:`TiledRun` skips every batch already marked done — resume is
  idempotent because output is written ``partitionBy(batch_id)`` and a
  re-run of an unfinished batch overwrites only its own partition
  (dynamic partition overwrite).
* **per-partition lineage rows** — :func:`partition_metrics` aggregates
  any DataFrame by ``spark_partition_id()`` into
  ``(partition_id, n_rows, key_min, key_max, value_checksum)`` so every
  shuffle boundary of a 100 TB run leaves an auditable trail.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Lineage row per physical partition of ``df``."""
    base = df.withColumn("_pid", F.spark_partition_id())
    g = base.groupBy("_pid").agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("value_checksum"),
        *(
            [F.min(key_col).alias("key_min"), F.max(key_col).alias("key_max")]
            if key_col
            else []
        ),
    )
    return g.withColumnRenamed("_pid", "partition_id")


class TiledRun:
    """Resumable batched execution over a partition-key column.

    >>> run = TiledRun(spark, out_dir, batch_col="tile")
    >>> for batch_id, is_done in run.batches(all_tile_ids, n_batches=8):
    ...     if is_done: continue     # resume skips finished work
    ...     with run.record(batch_id) as rec:
    ...         out = job(tiles_in_batch)          # any DataFrame
    ...         rec.write(out)                     # partitioned append
    """

    def __init__(self, spark: SparkSession, out_dir: str, batch_col: str = "_batch"):
        self.spark = spark
        self.out_dir = out_dir
        self.batch_col = batch_col
        self.manifest_path = os.path.join(out_dir, "_manifest")
        self.data_path = os.path.join(out_dir, "data")

    # ------------------------------------------------------------- manifest
    def done_batches(self) -> set[int]:
        try:
            rows = (
                self.spark.read.parquet(self.manifest_path)
                .filter(F.col("status") == "done")
                .select("batch_id")
                .collect()
            )
            return {r["batch_id"] for r in rows}
        except Exception:
            return set()

    def _append_manifest(self, row: dict) -> None:
        pdf = self.spark.createDataFrame(
            [
                (
                    int(row["batch_id"]),
                    row["status"],
                    int(row["n_rows"]),
                    float(row["elapsed_s"]),
                    int(row["checksum"]),
                    float(row["finished_ts"]),
                )
            ],
            "batch_id long, status string, n_rows long, elapsed_s double, "
            "checksum long, finished_ts double",
        )
        pdf.write.mode("append").parquet(self.manifest_path)

    # -------------------------------------------------------------- batches
    @staticmethod
    def assign_batches(tile_ids: list, n_batches: int) -> dict:
        """Deterministic tile -> batch assignment (sorted round-robin)."""
        return {t: i % n_batches for i, t in enumerate(sorted(tile_ids))}

    def batches(self, tile_ids: list, n_batches: int):
        done = self.done_batches()
        assign = self.assign_batches(tile_ids, n_batches)
        by_batch: dict[int, list] = {}
        for t, b in assign.items():
            by_batch.setdefault(b, []).append(t)
        for b in sorted(by_batch):
            yield b, by_batch[b], b in done

    # --------------------------------------------------------------- record
    class _Recorder:
        def __init__(self, run: "TiledRun", batch_id: int):
            self.run = run
            self.batch_id = batch_id
            self.n_rows = 0
            self.checksum = 0
            self.t0 = time.time()

        def write(self, df: DataFrame) -> None:
            cols = df.columns
            out = df.withColumn(self.run.batch_col, F.lit(self.batch_id))
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(self.run.batch_col)
                .parquet(self.run.data_path)
            )
            # lineage metrics audit the COMMITTED files, not the plan:
            # accumulator-style metrics riding the write (Observation)
            # double-count under stage retry/speculation, and a separate
            # agg over `df` would re-execute the whole job AND could
            # diverge from what actually landed on disk.  Partition
            # pruning on batch_col keeps this a scan of just this
            # batch's output.
            stats = (
                self.run.spark.read.parquet(self.run.data_path)
                .filter(F.col(self.run.batch_col) == self.batch_id)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(
                        F.bit_xor(F.xxhash64(*[F.col(c) for c in cols])), F.lit(0)
                    ).alias("h"),
                )
                .collect()[0]
            )
            self.n_rows += stats["n"]
            self.checksum ^= int(stats["h"]) & ((1 << 63) - 1)

        def __enter__(self):
            return self

        def __exit__(self, exc_type, exc, tb):
            if exc_type is None:
                self.run._append_manifest(
                    {
                        "batch_id": self.batch_id,
                        "status": "done",
                        "n_rows": self.n_rows,
                        "elapsed_s": time.time() - self.t0,
                        "checksum": self.checksum,
                        "finished_ts": time.time(),
                    }
                )
            return False

    def record(self, batch_id: int) -> "_Recorder":
        return TiledRun._Recorder(self, batch_id)

    # ---------------------------------------------------------------- reads
    def result(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)
