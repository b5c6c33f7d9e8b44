"""Pages source tests: the input_hint invariants — deterministic
coordinates (Spark == numpy bit-for-bit) and byte-identical text
extraction per url (engine parser == pandas oracle parser)."""

import numpy as np
import pandas as pd

from ssb_sgis_spark.sources.pages import (
    extract_text_from_html,
    pages_df,
    pages_np,
)

SF = "/root/testdata/sf0.001"


def test_coordinates_bit_identical(spark):
    pdf = pages_df(spark, SF).toPandas().sort_values("uid").reset_index(drop=True)
    x, y = pages_np(pdf["uid"].to_numpy())
    assert (pdf["x"].to_numpy() == x).all()  # exact, not allclose
    assert (pdf["y"].to_numpy() == y).all()


def test_payload_text_extraction_byte_identical(spark):
    pdf = (
        pages_df(spark, SF, with_payload=True)
        .limit(500)
        .select("uid", "url", "html", "text")
        .toPandas()
    )
    # pandas oracle: run the same parser over raw html bytes
    extracted = pdf["html"].map(lambda b: extract_text_from_html(bytes(b)))
    assert (extracted == pdf["text"]).all()
    # bytes-level identity
    assert all(
        e.encode("utf-8") == t.encode("utf-8") for e, t in zip(extracted, pdf["text"])
    )


def test_payload_schema_matches_input_hint(spark):
    df = pages_df(spark, SF, with_payload=True)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert fields["url"] == "string"
    assert fields["warc_ts"] == "timestamp"
    assert fields["html"] == "binary"
    assert fields["text"] == "string"
    assert fields["lang"] == "string"


def test_hot_spot_skew_exists(spark):
    """40% of pages land in the 16 km Oslo hot spot — the skew the engine's
    salted aggregation is designed for."""
    pdf = pages_df(spark, SF).toPandas()
    hot = (
        (pdf.x >= 254000) & (pdf.x <= 270000) & (pdf.y >= 6642000) & (pdf.y <= 6658000)
    ).mean()
    assert 0.35 < hot < 0.55


def test_urls_unique(spark):
    df = pages_df(spark, SF)
    assert df.count() == df.select("url").distinct().count()
