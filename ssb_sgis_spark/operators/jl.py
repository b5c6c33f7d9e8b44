"""Johnson–Lindenstrauss random projection over quantized embeddings —
the dimensionality-reduction stage of an embedding pipeline (dedup /
clustering / ANN get ~d/d' cheaper after it).

Achlioptas 2003 ("Database-friendly random projections"): a ±1 sign
matrix satisfies the JL lemma — pairwise distances are preserved within
(1 ± ε) w.h.p. for d' = O(ln n / ε²) — no Gaussians needed.  That makes
the operator EXACT-testable here: the sign matrix is generated
driver-side by a fixed LCG and embedded as literals in BOTH the Spark
expression and the DuckDB mirror (the engine's shared-generator
discipline), and the input is the int8-quantized codes
(``ann.quantize_int8``), so every projected coordinate is a 64-bit
integer dot product — bit-identical cross-engine, no float order
anywhere.

Scale shape: map-only — one ``transform`` over the d' output dims, each
an integer fold of the code array against a literal sign row; no
shuffle, no UDF.  |y_k| <= d * 127, so any d < 7e16 is overflow-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.ann import quantize_int8

__all__ = ["jl_signs", "jl_project", "jl_project_sql"]

_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2**31


def jl_signs(out_dim: int, in_dim: int, seed: int = 42) -> list[list[int]]:
    """The deterministic ±1 matrix, row k = signs for output dim k.
    One LCG step per entry; bit 16 avoids the LCG's weak low bits."""
    rows = []
    for k in range(out_dim):
        row = []
        for j in range(in_dim):
            s = (_LCG_A * (seed + k * in_dim + j) + _LCG_C) % _LCG_M
            row.append(1 if (s >> 16) & 1 else -1)
        rows.append(row)
    return rows


def jl_project(
    df: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Project each embedding to ``out_dim`` integer coordinates:
    long-format ``(id_col, k, y)`` with
    ``y = Σ_j sign[k][j] * int8_code[j]``."""
    signs = jl_signs(out_dim, in_dim, seed)
    q = quantize_int8(F.col(vec_col))
    dims = []
    for k, row in enumerate(signs):
        srow = F.array(*[F.lit(s).cast("long") for s in row])
        dims.append(
            F.aggregate(
                F.zip_with(q, srow, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"_y{k}")
        )
    wide = df.select(F.col(id_col), *dims)
    pairs = F.array(
        *[
            F.struct(F.lit(k).cast("long").alias("k"), F.col(f"_y{k}").alias("y"))
            for k in range(out_dim)
        ]
    )
    return wide.select(id_col, F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.k").alias("k"), F.col("_p.y").alias("y")
    )


def jl_project_sql(
    rel: str,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> str:
    """DuckDB mirror: the SAME literal sign rows (same generator), the
    same quantization expression, BIGINT dots via list_dot_product."""
    signs = jl_signs(out_dim, in_dim, seed)
    nrm = (
        f"sqrt(list_dot_product(CAST({vec_col} AS DOUBLE[]), "
        f"CAST({vec_col} AS DOUBLE[])))"
    )
    qcodes = (
        f"list_transform(CAST({vec_col} AS DOUBLE[]), "
        f"x -> CASE WHEN {nrm} = 0.0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(round(127.0 * (x / {nrm})) AS BIGINT) END)"
    )
    # one SELECT per output dim, unioned — keeps each dot a flat literal
    selects = "\n    UNION ALL ".join(
        f"SELECT {id_col}, CAST({k} AS BIGINT) AS k, "
        f"CAST(list_dot_product(CAST(q AS BIGINT[]), "
        f"CAST([{', '.join(str(s) for s in row)}] AS BIGINT[])) AS BIGINT) AS y "
        f"FROM qq"
        for k, row in enumerate(signs)
    )
    return f"""
    WITH qq AS (SELECT {id_col}, {qcodes} AS q FROM {rel})
    {selects}
    """
