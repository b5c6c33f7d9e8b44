"""Streaming sink into snapshot lake tables with EXACTLY-ONCE commits.

Structured Streaming's ``foreachBatch`` guarantees at-least-once
delivery: after a crash between the sink action and the checkpoint
write, the batch is REPLAYED with the same ``batch_id``.  A naive
append sink would duplicate those rows.  This sink closes the loop the
way Delta/Iceberg streaming writers do — the sink is transactional and
idempotent per ``batch_id``:

* every committed snapshot carries its ``stream_batch_id`` INSIDE the
  manifest, written by the same single atomic ``os.replace`` that makes
  the snapshot visible (``extra_manifest`` plumb-through in
  :mod:`..sources.snapshots`) — there is no window where the data is
  committed but the batch id is not;
* a replayed batch whose id is already in :func:`committed_batch_ids`
  is SKIPPED, so at-least-once delivery + idempotent commit =
  exactly-once table state;
* ``mode="append"`` commits each micro-batch as an append snapshot;
  ``mode="merge"`` routes it through the copy-on-write
  :func:`~ssb_sgis_spark.sources.snapshots.merge_snapshot_table` — the
  streaming-upsert shape for a CDC/recrawl feed keyed by url or doc id.

Resume is two-level: Spark's own ``checkpointLocation`` replays unread
source files, and the manifest batch ids make any replay harmless.  At
cluster scale the sink's non-data work is one manifest read + one
rename per micro-batch; the data write is the ordinary distributed
parquet write (append) or the footer-pruned copy-on-write merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.snapshots import (
    merge_snapshot_table,
    snapshots,
    write_snapshot_table,
)


def committed_batch_ids(path: str) -> set[int]:
    """Stream batch ids already durably committed to the table."""
    return {
        m["stream_batch_id"] for m in snapshots(path) if "stream_batch_id" in m
    }


def commit_stream_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    batch_id: int,
    *,
    mode: str = "append",
    key_col: str | None = None,
) -> int | None:
    """Idempotently commit one micro-batch; returns the new snapshot id,
    or None when this ``batch_id`` is already committed (replay)."""
    if int(batch_id) in committed_batch_ids(path):
        return None
    stamp = {"stream_batch_id": int(batch_id)}
    if mode == "append":
        return write_snapshot_table(
            batch_df, path, mode="append", extra_manifest=stamp
        )
    if mode == "merge":
        if key_col is None:
            raise ValueError("mode='merge' needs key_col")
        if not snapshots(path):
            return write_snapshot_table(batch_df, path, extra_manifest=stamp)
        return merge_snapshot_table(
            spark, path, batch_df, key_col, extra_manifest=stamp
        )
    raise ValueError(f"mode must be append|merge, got {mode!r}")


def stream_to_snapshot_table(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    *,
    mode: str = "append",
    key_col: str | None = None,
    available_now: bool = True,
):
    """Start (and by default drain) a streaming write into a snapshot
    table.  ``available_now=True`` processes the current backlog and
    stops — the incremental-ingest job shape: every run resumes from the
    checkpoint, and each micro-batch becomes exactly one snapshot."""
    spark = stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        commit_stream_batch(
            spark, path, batch_df, batch_id, mode=mode, key_col=key_col
        )

    w = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return w.start()
