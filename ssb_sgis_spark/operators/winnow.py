"""Winnowing document fingerprints — Schleimer, Wilkerson & Aiken 2003
("Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
the MOSS plagiarism detector's selection rule).

Where MinHash summarizes a WHOLE document (global near-dup), winnowing
selects a position-anchored subset of k-gram hashes with a coverage
guarantee: every shared substring of at least ``w + k - 1`` tokens
between two documents shares at least one selected fingerprint.  That
makes it the standard index for local overlap — quotations, partial
plagiarism, licence-block reuse — where whole-doc signatures wash out.

Selection rule (the paper's robust winnowing): slide a window of ``w``
consecutive k-gram hashes; in each window select the MINIMUM hash,
breaking ties by RIGHTMOST position.  Expected density 2/(w+1).

Distribution shape (the whole point at 10^12 docs):
* positional k-gram hashes are map-only (one ``transform`` over the
  token array, exploded to ``(doc, pos, h)`` — gram TEXT never leaves
  the row);
* each gram scatters to the ≤ ``w`` windows that contain it (a
  literal-offset explode, the ``hex_smooth`` trick — NO range join,
  NO per-window regrouping pass), partial trailing windows dropped by
  the closed-form window count ``max(1, n_grams - w + 1)``;
* one ``row_number() OVER (PARTITION BY doc, window ORDER BY h,
  pos DESC) = 1`` picks each window's winner, and a distinct on
  ``(doc, pos)`` collapses adjacent windows that agree — two linear
  equi-key shuffles total, no quadratic term anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_fingerprints_sql"]

DEFAULT_K = 3  # tokens per gram
DEFAULT_W = 4  # hashes per window


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Selected fingerprints ``(id_col, pos, fp)`` — ``pos`` is the
    1-based token position of the selected k-gram, ``fp`` its md5.
    Documents shorter than ``k`` tokens yield no rows; documents with
    fewer than ``w`` grams winnow their single partial window (the
    paper's behavior for short inputs)."""
    k, w = int(k), int(w)
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    # positional shingles from the shared zip_with-chain builder (see
    # shingle_seq_col for why NOT per-shingle slices or element_at
    # lookups inside the lambda); posexplode supplies the 1-based
    # position.  16 hex chars of md5 (64 bits): fingerprints only need
    # equality, and the hash rides the window scatter w times.
    from ssb_sgis_spark.operators.dedup import shingle_seq_col

    g = df.select(
        F.col(id_col),
        (n_tok - (k - 1)).cast("long").alias("_n"),
        F.posexplode(shingle_seq_col(F.col(text_col), k)).alias("_p", "_g"),
    ).select(
        id_col,
        "_n",
        (F.col("_p") + 1).cast("long").alias("pos"),
        F.substring(F.md5("_g"), 1, 16).alias("h"),
    )
    # scatter each gram to the w windows containing it; a window s is
    # real iff 1 <= s <= max(1, n - w + 1)
    s = (F.col("pos") - F.col("_off")).alias("s")
    scattered = (
        g.select(
            id_col,
            "_n",
            "pos",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(w - 1))).alias("_off"),
        )
        .select(id_col, "_n", "pos", "h", s)
        .filter(
            (F.col("s") >= 1)
            & (F.col("s") <= F.greatest(F.lit(1), F.col("_n") - (w - 1)))
        )
    )
    win = Window.partitionBy(id_col, "s").orderBy(F.asc("h"), F.desc("pos"))
    return (
        scattered.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(id_col, "pos", F.col("h").alias("fp"))
        .distinct()
    )


def winnow_fingerprints_sql(
    rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> str:
    """DuckDB mirror: same positional grams, same window scatter, same
    (h, pos DESC) winner rule."""
    k, w = int(k), int(w)
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {rel}
    ),
    g AS (
      SELECT {id_col},
             CAST(len(t) - {k - 1} AS BIGINT) AS n,
             CAST(i AS BIGINT) AS pos,
             substring(md5(array_to_string(list_slice(t, i, i + {k - 1}), ' ')), 1, 16) AS h
      FROM toks, unnest(range(1, len(t) - {k - 2})) r(i)
      WHERE len(t) >= {k}
    ),
    scattered AS (
      SELECT {id_col}, pos, h, pos - off AS s
      FROM g, unnest(range(0, {w})) o(off)
      WHERE pos - off >= 1
        AND pos - off <= greatest(1, n - {w - 1})
    ),
    ranked AS (
      SELECT {id_col}, pos, h,
             row_number() OVER (PARTITION BY {id_col}, s
                                ORDER BY h, pos DESC) AS rn
      FROM scattered
    )
    SELECT DISTINCT {id_col}, pos, h AS fp FROM ranked WHERE rn = 1
    """
