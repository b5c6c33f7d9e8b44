"""Streaming exact dedup — custom stateful operator over micro-batches.

Batch dedup (``operators/dedup.dedupe_exact``) sees the whole corpus at
once; an ingestion stream must instead remember what it has already
admitted ACROSS micro-batches.  This is the engine's
``applyInPandasWithState`` stateful operator (SURVEY §2.15 /
input-hint API surface): documents shard by a hash prefix, each shard
group keeps the set of content hashes it has admitted in the state
store, and only first-seen documents are emitted.  The state store
rides the stream checkpoint, so a restart resumes with every
previously-seen hash intact — the streaming twin of the batch tile
manifest's resumability.

Scale stance:

* Sharding by ``pmod(xxhash64(content_hash), n_shards)`` spreads state
  and compute over executors; each shard's state is independent.
* ``exact`` mode stores the admitted hashes themselves (32-byte md5
  strings) — memory grows with distinct documents per shard; right for
  bounded corpora and for correctness tests.
* ``bloom_bits > 0`` switches the state to a fixed-size Bloom bitmap
  (k=4 hashes derived from two md5 halves): memory is constant per
  shard, no duplicate ever passes (no false negatives), but a false
  positive can drop a genuinely-new document with probability
  ~(1-e^{-kn/m})^k — the standard at-scale trade and the reason real
  pipelines run bloom dedup before an exact verify pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    StringType,
    StructField,
    StructType,
)

_BLOOM_K = 4


def _bloom_positions(hashes: pd.Series, bits: int) -> np.ndarray:
    """(n, k) bit positions from the two 64-bit halves of the md5 hex
    (double hashing: pos_i = h1 + i*h2 mod bits)."""
    h1 = np.array([int(h[:16], 16) for h in hashes], dtype=np.uint64)
    h2 = np.array([int(h[16:32], 16) | 1 for h in hashes], dtype=np.uint64)
    i = np.arange(_BLOOM_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(bits)).astype(np.int64)


def dedup_stream(
    stream: DataFrame,
    content_col: str = "text",
    n_shards: int = 32,
    bloom_bits: int = 0,
) -> DataFrame:
    """First-seen rows of ``stream`` across ALL micro-batches.

    Output = input columns + ``content_hash``.  Duplicates inside one
    batch keep the first row in (hash, batch-arrival) order; duplicates
    of anything admitted in ANY earlier batch are dropped via the state
    store."""
    cols = stream.columns
    hashed = stream.withColumn("content_hash", F.md5(F.col(content_col))).withColumn(
        "_shard", F.pmod(F.xxhash64("content_hash"), F.lit(n_shards))
    )
    out_schema = StructType(
        [hashed.schema[c] for c in cols]
        + [StructField("content_hash", StringType())]
    )
    state_schema = (
        StructType([StructField("bloom", BinaryType())])
        if bloom_bits
        else StructType([StructField("seen", ArrayType(StringType()))])
    )

    def fn(key, pdfs, state: GroupState):
        if bloom_bits:
            bitmap = (
                np.frombuffer(state.get[0], dtype=np.uint8).copy()
                if state.exists
                else np.zeros((bloom_bits + 7) // 8, dtype=np.uint8)
            )
        else:
            seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.drop_duplicates("content_hash", keep="first")
            if bloom_bits:
                pos = _bloom_positions(pdf["content_hash"], bloom_bits)
                present = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
                fresh = present.min(axis=1) == 0  # any unset bit -> new
                newpos = pos[fresh].ravel()
                np.bitwise_or.at(
                    bitmap, newpos // 8, (1 << (newpos % 8)).astype(np.uint8)
                )
                keep = pdf[fresh]
            else:
                mask = ~pdf["content_hash"].isin(seen)
                keep = pdf[mask]
                seen.update(keep["content_hash"])
            if len(keep):
                yield keep[cols + ["content_hash"]]
        state.update((bytes(bitmap),) if bloom_bits else (list(seen),))

    return hashed.groupBy("_shard").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
