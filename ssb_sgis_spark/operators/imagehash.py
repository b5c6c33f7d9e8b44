"""Perceptual image hashing + Hamming near-duplicate pairs.

The one dedup modality the engine did not yet cover: IMAGE near-dup for
multimodal training corpora (reference parity: sgis has no image ops —
this is part of the LLM-pipeline layer the brief asks for beyond the
reference).  Two classic perceptual hashes over a fixed 8x8 block-mean
grid, both exact-integer so a DuckDB oracle can recompute them
closed-form from the synthetic pixel law:

* **aHash** (average hash): bit(c) = 1 iff ``cell_sum(c) * 64 >
  total_sum`` — the strict-``>`` integer form of "cell mean above image
  mean" (no division anywhere, so Spark/numpy/DuckDB agree bit-for-bit).
* **dHash** (gradient hash): bit(r*7+c) = 1 iff ``cell(r,c) >
  cell(r,c+1)`` over horizontal neighbors — 8 rows x 7 comparisons = 56
  bits.

Hashes are stored as NON-NEGATIVE bigints (two 32-bit halves for the
64-bit aHash, one 56-bit value for dHash) so there is no two's-complement
sign pitfall between engines.

Scale shape (10^9 images): hashing is map-only Arrow batches (decode +
integer moments, no shuffle).  Near-dup pairing is the banded-LSH
pigeonhole exact match: split the 64-bit aHash into ``bands`` 16-bit
bands; any pair within Hamming radius ``r < bands`` must agree exactly
on at least one band, so an equi-join on (band_idx, band_value) finds
EVERY such pair — only (id, hash) rows shuffle, never pixels.  Verify is
``bit_count(xor)`` on the join output.  Flat/solid images (hash 0 — the
web's tracking pixels) all share every band: the optional ``bucket_cap``
drops such mega-buckets explicitly, same policy as MinHash-LSH
``bucket_cap`` in :mod:`.dedup`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .multimodal import BMP_H, BMP_W, PIX_A, PIX_B, _decode_bmp, encode_bmp

# 8x8 grid over the 24x16 law image: each cell is 3x2 pixels.
GRID = 8
CELL_W = BMP_W // GRID  # 3
CELL_H = BMP_H // GRID  # 2
N_PIX = BMP_W * BMP_H  # 384 pixels, 1152 channel values

# Near-dup variant law: doc d renders the BASE image of group
# b = d // VAR_GROUP with the first VAR_CHANNELS channel values shifted
# by (d % VAR_GROUP) * VAR_STEP (mod 256).  Variants of one base differ
# in ~1 cell (plus the occasional borderline-mean flip).  The per-index
# slope carries a base-dependent term ((b % VAR_SLOPE_MOD) * VAR_SLOPE)
# so different bases are STRUCTURALLY different images, not uniform
# brightness shifts of one another — uniform shifts barely move the
# mean-threshold bits, and without the slope term ~7% of ALL base pairs
# landed within Hamming 3 (62k dense edges at 5k images, deep CC
# chains); with it near-dups are intra-base plus a thin realistic tail.
VAR_GROUP = 4
VAR_STEP = 49
VAR_CHANNELS = 6  # the first two pixels (cell 0,0 only)
VAR_SLOPE = 977
VAR_SLOPE_MOD = 251


def synth_bmp_variants(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) -> (id, payload): REAL 24-bit BMP bytes under the variant
    pixel law — consecutive ids in a group of ``VAR_GROUP`` are
    near-duplicate renders of one base image."""
    schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    npix = N_PIX * 3

    def kernel(it):
        idx = np.arange(npix, dtype=np.int64)
        pert = (idx < VAR_CHANNELS).astype(np.int64)
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for mid in ids:
                d = int(mid)
                b = d // VAR_GROUP
                v = (
                    b * PIX_A
                    + idx * (PIX_B + (b % VAR_SLOPE_MOD) * VAR_SLOPE)
                    + (d % VAR_GROUP) * VAR_STEP * pert
                ) % 256
                payloads.append(
                    encode_bmp(v.astype(np.uint8).reshape(BMP_H, BMP_W, 3))
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return df.select(id_col).mapInPandas(kernel, schema=schema)


def _hash_image(a: np.ndarray) -> tuple[int, int, int]:
    """(h, w, 3) uint8 -> (ahash0, ahash1, dhash0) exact-integer hashes."""
    px = a.astype(np.int64)
    gray = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    cells = gray.reshape(GRID, CELL_H, GRID, CELL_W).sum(axis=(1, 3))
    flat = cells.ravel()  # row-major: cell index cy*8+cx
    total = int(flat.sum())
    bits = (flat * (GRID * GRID) > total).astype(np.int64)
    sh = np.arange(32, dtype=np.int64)
    ahash0 = int((bits[:32] << sh).sum())
    ahash1 = int((bits[32:] << sh).sum())
    dbits = (cells[:, :-1] > cells[:, 1:]).astype(np.int64).ravel()
    dhash0 = int((dbits << np.arange(56, dtype=np.int64)).sum())
    return ahash0, ahash1, dhash0


def image_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode=_decode_bmp,
) -> DataFrame:
    """Map-only Arrow stage: decode each payload with a real codec from
    :mod:`.multimodal` (default BMP; pass ``decode=_decode_png`` etc. for
    other formats) and emit ``(id, ahash0, ahash1, dhash0)``.  No
    shuffle; pixels never leave the Python worker."""
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("ahash0", T.LongType()),
            T.StructField("ahash1", T.LongType()),
            T.StructField("dhash0", T.LongType()),
        ]
    )

    def kernel(it):
        for pdf in it:
            out = {id_col: [], "ahash0": [], "ahash1": [], "dhash0": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frame = decode(bytes(payload))
                img = frame[0] if frame.ndim == 4 else frame
                a0, a1, d0 = _hash_image(img)
                out[id_col].append(mid)
                out["ahash0"].append(a0)
                out["ahash1"].append(a1)
                out["dhash0"].append(d0)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=schema)


def hamming_pairs(
    hashes: DataFrame,
    r: int = 3,
    id_col: str = "doc_id",
    bucket_cap: int | None = None,
) -> DataFrame:
    """All pairs ``id_a < id_b`` whose 64-bit aHashes differ in at most
    ``r`` bits, found EXACTLY via the banded pigeonhole: with 4 disjoint
    16-bit bands and ``r < 4``, a pair within radius r must match at
    least one band verbatim — the equi-join on (band_idx, band_value)
    loses nothing.  Output ``(id_a, id_b, hamming)``.

    ``bucket_cap`` drops band buckets larger than the cap (solid-color
    mega-buckets: the web's 1x1 tracking pixels all hash to 0).  With a
    cap the guarantee becomes "exact outside dropped buckets", same
    contract as LSH ``bucket_cap`` in :mod:`.dedup`.
    """
    if r >= 4:
        raise ValueError(
            f"hamming_pairs is exact only for r < 4 bands (got r={r}); "
            "use more/narrower bands for a larger radius"
        )
    banded = hashes.select(
        F.col(id_col),
        "ahash0",
        "ahash1",
        F.posexplode(
            F.array(
                F.expr("ahash0 & 65535"),
                F.expr("shiftright(ahash0, 16) & 65535"),
                F.expr("ahash1 & 65535"),
                F.expr("shiftright(ahash1, 16) & 65535"),
            )
        ).alias("band_idx", "band_val"),
    )
    if bucket_cap is not None:
        w = Window.partitionBy("band_idx", "band_val")
        banded = (
            banded.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= int(bucket_cap))
            .drop("_n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.ahash0").alias("a0"),
            F.col("a.ahash1").alias("a1"),
            F.col("b.ahash0").alias("b0"),
            F.col("b.ahash1").alias("b1"),
        )
        .distinct()  # a pair can match in several bands
    )
    return cand.select(
        "id_a",
        "id_b",
        (
            F.expr("bit_count(a0 ^ b0)") + F.expr("bit_count(a1 ^ b1)")
        ).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= int(r))


# ------------------------------------------------------------- oracle SQL
def _gray_term(chan_expr: str, id_col: str) -> str:
    """Law value of channel index ``chan_expr`` for doc ``id_col``."""
    base = f"({id_col} // {VAR_GROUP})"
    slope = f"({PIX_B} + ({base} % {VAR_SLOPE_MOD}) * {VAR_SLOPE})"
    return (
        f"(({base} * {PIX_A} + ({chan_expr}) * {slope}"
        f" + CASE WHEN ({chan_expr}) < {VAR_CHANNELS}"
        f" THEN ({id_col} % {VAR_GROUP}) * {VAR_STEP} ELSE 0 END) % 256)"
    )


def ahash_oracle_cte(ids_rel: str, id_col: str = "doc_id") -> str:
    """DuckDB CTE body computing (id, ahash0, ahash1, dhash0) straight
    from the variant pixel law — no decode, no numpy: a hash match
    proves the whole decode -> gray -> block-mean -> threshold pipeline."""
    r = _gray_term("3*p", id_col)
    g = _gray_term("3*p+1", id_col)
    b = _gray_term("3*p+2", id_col)
    return f"""
        g AS (
          SELECT {id_col},
                 ((p // {BMP_W}) // {CELL_H}) * {GRID} + ((p % {BMP_W}) // {CELL_W}) AS cell,
                 (({r}) * 299 + ({g}) * 587 + ({b}) * 114) // 1000 AS gray
          FROM {ids_rel}, unnest(range({N_PIX})) AS rr(p)
        ),
        cells AS (
          SELECT {id_col}, cell, SUM(gray) AS cs
          FROM g GROUP BY {id_col}, cell
        ),
        tot AS (
          SELECT {id_col}, SUM(cs) AS t FROM cells GROUP BY {id_col}
        ),
        abits AS (
          SELECT c.{id_col}, c.cell,
                 CASE WHEN c.cs * {GRID * GRID} > t.t THEN 1 ELSE 0 END AS bit
          FROM cells c JOIN tot t USING ({id_col})
        ),
        dbits AS (
          SELECT a.{id_col},
                 (a.cell // {GRID}) * {GRID - 1} + (a.cell % {GRID}) AS bi,
                 CASE WHEN a.cs > b.cs THEN 1 ELSE 0 END AS bit
          FROM cells a JOIN cells b
            ON a.{id_col} = b.{id_col} AND b.cell = a.cell + 1
          WHERE a.cell % {GRID} < {GRID - 1}
        ),
        hashes AS (
          SELECT a.{id_col},
                 CAST(SUM(CASE WHEN a.cell < 32 THEN a.bit * (CAST(1 AS BIGINT) << a.cell) ELSE 0 END) AS BIGINT) AS ahash0,
                 CAST(SUM(CASE WHEN a.cell >= 32 THEN a.bit * (CAST(1 AS BIGINT) << (a.cell - 32)) ELSE 0 END) AS BIGINT) AS ahash1,
                 (SELECT CAST(SUM(d.bit * (CAST(1 AS BIGINT) << d.bi)) AS BIGINT)
                  FROM dbits d WHERE d.{id_col} = a.{id_col}) AS dhash0
          FROM abits a GROUP BY a.{id_col}
        )
    """


def ahash_oracle_sql(ids_rel: str, id_col: str = "doc_id") -> str:
    return f"""
        WITH {ahash_oracle_cte(ids_rel, id_col)}
        SELECT {id_col}, ahash0, ahash1, dhash0 FROM hashes
    """


def hamming_pairs_oracle_sql(
    ids_rel: str, r: int = 3, id_col: str = "doc_id"
) -> str:
    """Brute-force pair oracle (independent algorithm: NO banding — a
    full self-join over the law hashes), so a match also certifies the
    pigeonhole construction loses no pair."""
    return f"""
        WITH {ahash_oracle_cte(ids_rel, id_col)}
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
               CAST(bit_count(xor(a.ahash0, b.ahash0))
                + bit_count(xor(a.ahash1, b.ahash1)) AS BIGINT) AS hamming
        FROM hashes a JOIN hashes b ON a.{id_col} < b.{id_col}
        WHERE (bit_count(xor(a.ahash0, b.ahash0))
               + bit_count(xor(a.ahash1, b.ahash1))) <= {int(r)}
    """
