"""Deterministic hash-based corpus sampling.

Training-data pipelines need reproducible subsetting: the same sample on
every run, every engine, every cluster size — RNG-state samplers
(``df.sample``) give none of that.  Both operators here key the decision
on ``md5`` of a stable row id, so the sample is a pure function of the
data (reference parity note: the reference's only sampler is the
test-data generator ``random_points``, general.py:344-399; corpus
subsetting is engine-new surface).

* :func:`sample_fraction` — Bernoulli-by-hash: keep rows whose
  ``md5(key || ':' || seed)`` 8-hex-char prefix falls below the fraction
  threshold.  Map-only: no shuffle, no RNG state, whole-stage codegen.
  The DuckDB mirror compares the SAME hex strings, so the sampled row
  set is byte-identical across engines.
* :func:`sample_stratified` — exactly ``k`` rows per stratum under hash
  order (a deterministic "reservoir"): skew-safe via the salted
  two-stage top-K window (:func:`..operators.domains.per_key_topk`), so
  a 10^6x hot stratum is hard-bounded to ``k * nsalts`` survivors before
  the exact per-stratum window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .domains import per_key_topk

__all__ = [
    "fraction_threshold_hex",
    "mix_corpora",
    "mix_corpora_pred_sql",
    "sample_fraction",
    "sample_fraction_pred_sql",
    "sample_stratified",
    "sample_stratified_sql",
    "sample_weighted",
    "sample_weighted_sql",
    "weighted_key_col",
    "weighted_key_sql",
    "temperature_fractions",
]

_HEX_SPACE = 16**8  # the md5 prefix is 8 hex chars → uniform over [0, 16^8)


def fraction_threshold_hex(fraction: float) -> str:
    """The threshold string both engines compare the 8-hex-char md5
    prefix against.  Shared by the Spark plan and the SQL mirror so the
    cut point cannot drift.  ``fraction == 1.0`` returns ``"g"`` —
    lexicographically above every hex string — so keep-all really keeps
    ALL rows (a clamped ``"ffffffff"`` would drop the ~2^-32 of rows
    whose prefix is exactly that)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction == 1.0:
        return "g"
    return format(min(int(round(fraction * _HEX_SPACE)), _HEX_SPACE - 1), "08x")


def _hash_key_col(key: Column, seed: str) -> Column:
    return F.md5(F.concat(key.cast("string"), F.lit(":" + seed)))


def sample_fraction(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "0",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by hash of
    ``key_col`` — deterministic, map-only, no shuffle."""
    thr = fraction_threshold_hex(fraction)
    h = _hash_key_col(F.col(key_col), seed)
    return df.filter(F.substring(h, 1, 8) < F.lit(thr))


def sample_fraction_pred_sql(key_expr: str, fraction: float, seed: str = "0") -> str:
    """DuckDB WHERE-clause mirror of :func:`sample_fraction`'s filter."""
    thr = fraction_threshold_hex(fraction)
    return (
        f"substr(md5(concat(CAST({key_expr} AS VARCHAR), ':{seed}')), 1, 8)"
        f" < '{thr}'"
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    k: int,
    tie_id: str,
    seed: str = "0",
    nsalts: int = 32,
) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows per stratum, selected by
    hash order over ``tie_id`` (ties broken by ``tie_id`` itself, so the
    ordering is total and the result unique)."""
    hk = "__samp_hash"
    if hk in df.columns:
        raise ValueError(f"input frame already has a column named {hk!r}")
    out = per_key_topk(
        df.withColumn(hk, _hash_key_col(F.col(tie_id), seed)),
        key=strata_col,
        order_by=[F.col(hk), F.col(tie_id)],
        k=k,
        tie_id=tie_id,
        nsalts=nsalts,
    )
    return out.drop(hk)


def sample_stratified_sql(
    rel: str,
    strata_expr: str,
    k: int,
    tie_id: str = "doc_id",
    seed: str = "0",
    select: str = "*",
) -> str:
    """DuckDB mirror: global window formulation the salted two-stage
    plan must equal exactly."""
    return f"""
    SELECT {select} FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY {strata_expr}
                   ORDER BY md5(concat(CAST({tie_id} AS VARCHAR), ':{seed}')),
                            {tie_id}
               ) AS __rn
        FROM {rel}
    ) WHERE __rn <= {k}
    """


def mix_corpora(
    df: DataFrame,
    source_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "0",
) -> DataFrame:
    """Weighted corpus mixing — the pretraining "data recipe": keep a
    per-source deterministic Bernoulli-by-hash fraction of rows (e.g.
    wiki at 1.0, common-crawl at 0.15).  Map-only: ONE native CASE
    expression over the source column against the row's md5 prefix, no
    shuffle, no RNG state; sources absent from ``fractions`` are
    dropped (fraction 0).  The kept set is a pure function of the data,
    so recipes reproduce across runs, engines, and cluster sizes, and
    upweighting a source strictly grows its subset (nested samples)."""
    h = F.substring(_hash_key_col(F.col(key_col), seed), 1, 8)
    mapping = F.create_map(
        *[x for s, frac in sorted(fractions.items())
          for x in (F.lit(s), F.lit(fraction_threshold_hex(frac)))]
    )
    thr = mapping[F.col(source_col)]
    return df.filter(h < F.coalesce(thr, F.lit("00000000")))


def mix_corpora_pred_sql(
    source_expr: str,
    fractions: dict[str, float],
    key_expr: str,
    seed: str = "0",
) -> str:
    """DuckDB WHERE-clause mirror of :func:`mix_corpora`'s filter."""
    if not fractions:
        return "false"  # the Spark twin drops everything; CASE with no
        # WHEN arm would be a parse error
    cases = " ".join(
        f"WHEN '{s}' THEN '{fraction_threshold_hex(frac)}'"
        for s, frac in sorted(fractions.items())
    )
    return (
        f"substr(md5(concat(CAST({key_expr} AS VARCHAR), ':{seed}')), 1, 8)"
        f" < (CASE {source_expr} {cases} ELSE '00000000' END)"
    )


def temperature_fractions(
    sizes: dict[str, int],
    temperature: float,
    target_total: int | None = None,
) -> dict[str, float]:
    """Per-source keep-fractions that reshape a corpus toward the
    temperature-scaled distribution used in multilingual/multi-source
    pretraining (mT5/XLM-R): sampling mass ``p_i ∝ size_i^(1/T)``.
    ``T = 1`` keeps natural proportions, ``T → ∞`` approaches uniform
    across sources, ``T < 1`` sharpens toward the big sources.

    Returns fractions for :func:`mix_corpora` (clamped to 1.0 — this
    engine subsamples, never duplicates; pick ``target_total`` small
    enough that no source is asked to up-sample, or accept the clamp).
    Driver-side arithmetic over the |sources|-sized histogram — the
    data-sized work stays the one map-only mix filter."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not sizes:
        return {}
    total = sum(sizes.values())
    if target_total is None:
        target_total = total
    masses = {s: float(n) ** (1.0 / temperature) for s, n in sizes.items()}
    z = sum(masses.values())
    out = {}
    for s, n in sizes.items():
        want = target_total * masses[s] / z
        out[s] = min(1.0, want / n) if n else 0.0
    return out


# --------------------------------------------------- weighted exactly-k
_U_DENOM = "4294967297.0"  # 2^32 + 1: u = (hex_int + 1) / (2^32 + 1) in (0, 1)


def _aes_key_tail_sql(hex_int_expr: str, weight_expr: str) -> str:
    """The Efraimidis–Spirakis key ``ln(u) / w`` as SQL text — ONE
    numeric tail shared verbatim by both engines (identical literals and
    operation order); only the hex→int front end differs per engine."""
    return (
        f"ln(({hex_int_expr} + 1.0) / {_U_DENOM})"
        f" / CAST({weight_expr} AS DOUBLE)"
    )


def weighted_key_col(tie_id: str, weight_col: str, seed: str = "0") -> Column:
    """Spark Column for the A-ES key (conv() hex→int front end)."""
    h = (
        f"substring(md5(concat(CAST({tie_id} AS STRING), ':{seed}')), 1, 8)"
    )
    return F.expr(
        _aes_key_tail_sql(f"CAST(conv({h}, 16, 10) AS DOUBLE)", weight_col)
    )


def weighted_key_sql(tie_id: str, weight_expr: str, seed: str = "0") -> str:
    """DuckDB mirror of :func:`weighted_key_col` ('0x' cast front end)."""
    h = f"substr(md5(concat(CAST({tie_id} AS VARCHAR), ':{seed}')), 1, 8)"
    return _aes_key_tail_sql(
        f"CAST(CAST(('0x' || {h}) AS UBIGINT) AS DOUBLE)", weight_expr
    )


def sample_weighted(
    df: DataFrame,
    strata_col: str,
    k: int,
    weight_col: str,
    tie_id: str,
    seed: str = "0",
    nsalts: int = 32,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum WITHOUT
    replacement, inclusion probability ∝ ``weight_col`` — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006) with DETERMINISTIC
    uniforms: ``u = (md5_32(tie_id:seed) + 1) / (2^32 + 1)``, key
    ``ln(u) / w``, keep the per-stratum top-k keys (largest = closest
    to 0).  The quality- or length-proportional corpus draw every
    "sample 10k docs ∝ token count" recipe step needs, reproducible
    across runs and engines because the randomness is a hash, not an
    RNG.

    Rows with ``weight_col <= 0`` are EXCLUDED (zero mass; keeps the
    key finite).  Scale shape: map-only key computation + the salted
    two-stage top-k window (a hot stratum is bounded to k·nsalts rows
    before the exact window) — nothing row-sized shuffles twice.

    Cross-engine note: the only float is one ``ln`` per row of the same
    double in both engines; keys of distinct (u, w) pairs are far
    beyond ulp distance, so the ordering (and therefore the SELECTED
    SET — the operator's output never exposes the key) is stable.
    """
    kc = "__aes_key"
    if kc in df.columns:
        raise ValueError(f"input frame already has a column named {kc!r}")
    out = per_key_topk(
        df.filter(F.col(weight_col) > 0).withColumn(
            kc, weighted_key_col(tie_id, weight_col, seed)
        ),
        key=strata_col,
        order_by=[F.desc(kc), F.col(tie_id)],
        k=k,
        tie_id=tie_id,
        nsalts=nsalts,
    )
    return out.drop(kc)


def sample_weighted_sql(
    rel: str,
    strata_expr: str,
    k: int,
    weight_expr: str,
    tie_id: str = "doc_id",
    seed: str = "0",
    select: str = "*",
) -> str:
    """DuckDB mirror: global window formulation the salted two-stage
    plan must equal exactly."""
    key = weighted_key_sql(tie_id, weight_expr, seed)
    return f"""
    SELECT {select} FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY {strata_expr}
                   ORDER BY ({key}) DESC, {tie_id}
               ) AS __rn
        FROM {rel}
        WHERE {weight_expr} > 0
    ) WHERE __rn <= {k}
    """
