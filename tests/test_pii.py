"""PII redaction column functions (functions/text.py PII section)."""

from pyspark.sql import functions as F


def test_pii_redact_known_values(spark):
    from ssb_sgis_spark.functions.text import (
        PII_EMAIL_TOKEN,
        PII_PHONE_TOKEN,
        pii_count_col,
        pii_redact_col,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@sub.example.no or call +47 12 34 56 78 now"),
            (2, "no pii here at all"),
            (3, "two mails x@y.com and z@w.org"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n, r.clean)
        for r in df.select(
            "doc_id",
            pii_count_col(F.col("text")).alias("n"),
            pii_redact_col(F.col("text")).alias("clean"),
        ).collect()
    }
    assert out[1] == (
        2,
        f"mail me at {PII_EMAIL_TOKEN} or call {PII_PHONE_TOKEN} now",
    )
    assert out[2] == (0, "no pii here at all")
    assert out[3] == (2, f"two mails {PII_EMAIL_TOKEN} and {PII_EMAIL_TOKEN}")


def test_pii_injection_round_trip(spark):
    """Injected PII is found (n_pii = 2 on injected docs, 0 elsewhere) and
    the redacted text contains no '@' from the injection."""
    import __spark_entry__ as entry

    rows = entry.q_pii_redact(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        if r.doc_id % entry.PII_MOD == 0:
            assert r.n_pii == 2
            assert "@example.com" not in r.clean_text
            assert "<EMAIL>" in r.clean_text and "<PHONE>" in r.clean_text
        else:
            assert r.n_pii == 0
