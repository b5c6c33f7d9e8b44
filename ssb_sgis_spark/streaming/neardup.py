"""Streaming NEAR-duplicate detection — a stateful LSH band registry
across micro-batches.

``streaming/dedup.py`` remembers exact content hashes; an ingestion
pipeline also wants the MinHash-LSH near-dup signal ("have we admitted
something *like* this?") without re-running batch LSH over the whole
corpus per batch.  This operator keeps the canonical streaming-LSH
state: the set of band keys ever seen, sharded by band-key hash.

Per arriving document: its ``bands`` LSH band keys are computed per row
(the ``minhash_array_col`` expression — map-only), exploded, and each
key is looked up in (then registered into) its shard's state.  Output
is one row per (doc, band key) with a ``seen`` flag; the per-document
verdict is the trivial rollup ``any(seen)`` — a doc flagged on ANY band
is an LSH candidate duplicate of something earlier, exactly the batch
banding rule (``operators/dedup.lsh_candidate_pairs``).

Semantics and honesty notes:
* within a micro-batch, rows are processed in ``id`` order per shard,
  so two same-batch near-dups flag the LATER id (deterministic);
* bands register even when the doc is elsewhere flagged dup (shards
  are independent) — conservative: extra registered bands can only
  make future docs MORE likely to flag, never admit a dup;
* the registry state rides the stream checkpoint (restart-resumable),
  like the exact-dedup bloom state;
* at very high rates, compute signatures upstream (the HOF minhash
  expression is per-row interpreted) and feed a pre-banded stream —
  the stateful core is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ssb_sgis_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_N_HASHES,
    DEFAULT_SHINGLE_K,
    minhash_array_col,
)

__all__ = ["band_keys_array_col", "band_registry_stream", "near_dup_stream"]


def band_keys_array_col(
    text,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
):
    """All ``bands`` LSH band keys of one document as ONE array
    expression: key b = ``b|mh[b*rows+1]|...|mh[(b+1)*rows]``."""
    rows = n_hashes // bands
    mh = minhash_array_col(text, n_hashes, k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit("|"),
            F.array_join(F.slice(mh, b * rows + 1, rows), "|"),
        ),
    )


def near_dup_stream(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
    n_shards: int = 32,
) -> DataFrame:
    """Stateful band registry: emits ``(id_col, band_key, seen)`` per
    (document, band); ``seen`` is true iff that band key was registered
    by ANY earlier document (earlier batch, or earlier id in this
    batch).  Roll up ``max(seen)`` per document for the LSH
    candidate-dup verdict."""
    banded = stream.select(
        F.col(id_col),
        F.explode(band_keys_array_col(F.col(text_col), n_hashes, bands, k)).alias(
            "band_key"
        ),
    )
    return band_registry_stream(banded, id_col=id_col, n_shards=n_shards)


def band_registry_stream(
    banded: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """The stateful core over an already-banded stream
    ``(id_col, band_key)`` — use this (with band keys computed
    relationally in the ingest job, ``operators.dedup.band_keys``)
    when rates make the per-row signature expression the bottleneck:
    the registry doesn't care HOW the keys were produced, only that
    equal content yields equal keys."""
    n_shards = int(n_shards)
    banded = banded.withColumn(
        "_shard", F.pmod(F.xxhash64("band_key"), F.lit(n_shards))
    )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("band_key", StringType()),
            StructField("seen", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("keys", ArrayType(StringType()))])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        seen_keys = set(state.get[0]) if state.exists else set()
        # A shard group arrives as MULTIPLE Arrow chunks once the batch is
        # big enough, and cross-chunk order is arbitrary (upstream file /
        # partition order) — sorting each chunk alone breaks the promised
        # id-order determinism for same-batch near-dups (caught by the
        # sf0.1 oracle sweep: the earlier doc flagged instead of the
        # later).  Buffer the group, sort ONCE, then register.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(id_col, kind="mergesort")
            flags = []
            for bk in pdf["band_key"]:
                flags.append(bk in seen_keys)
                seen_keys.add(bk)
            out = pdf[[id_col, "band_key"]].copy()
            out["seen"] = flags
            yield out
        state.update((list(seen_keys),))

    return banded.groupBy("_shard").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
