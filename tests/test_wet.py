"""WET sidecars: determinism, refers-to linkage, text roundtrip."""

import glob
import hashlib
import os

from tests.conftest import SF_SMOKE


def _pipeline(spark, tmp_path, n=200):
    from ssb_sgis_spark.sources.pages import pages_df
    from ssb_sgis_spark.sources.warc import write_warc
    from ssb_sgis_spark.sources.wet import wet_from_warc

    warc_d, wet_d = str(tmp_path / "warc"), str(tmp_path / "wet")
    pages = pages_df(spark, SF_SMOKE, with_payload=True).limit(n).select(
        "url", "warc_ts", "html"
    )
    write_warc(pages, warc_d, n_files=4).collect()
    wet_from_warc(spark, warc_d, wet_d).collect()
    return warc_d, wet_d


def test_wet_text_roundtrip(spark, tmp_path):
    from ssb_sgis_spark.sources.pages import pages_df
    from ssb_sgis_spark.sources.wet import read_wet

    _, wet_d = _pipeline(spark, tmp_path)
    got = {r.url: r.text for r in read_wet(spark, wet_d).collect()}
    exp = {
        r.url: r.text
        for r in pages_df(spark, SF_SMOKE, with_payload=True).limit(200).collect()
    }
    assert got == exp  # byte-identical extracted text per url


def test_wet_refers_to_links_back_to_warc(spark, tmp_path):
    from ssb_sgis_spark.sources.warc import read_warc
    from ssb_sgis_spark.sources.wet import read_wet

    warc_d, wet_d = _pipeline(spark, tmp_path)
    pairs = (
        read_wet(spark, wet_d)
        .selectExpr("refers_to", "url as wet_url")
        .join(
            read_warc(spark, warc_d).selectExpr("record_id as refers_to", "url"),
            "refers_to",
        )
    )
    bad = pairs.filter("wet_url != url").count()
    assert bad == 0 and pairs.count() == 200


def test_wet_bytes_deterministic(spark, tmp_path):
    from ssb_sgis_spark.sources.wet import wet_from_warc

    warc_d, wet_d = _pipeline(spark, tmp_path)
    first = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(wet_d + "/*.warc.wet.gz")
    }
    wet_from_warc(spark, warc_d, str(tmp_path / "wet2")).collect()
    second = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(str(tmp_path / "wet2") + "/*.warc.wet.gz")
    }
    assert first == second and len(first) == 4


def test_wet_sidecar_names_mirror_warc(spark, tmp_path):
    warc_d, wet_d = _pipeline(spark, tmp_path)
    warcs = {os.path.basename(p) for p in glob.glob(warc_d + "/*.warc.gz")}
    wets = {os.path.basename(p) for p in glob.glob(wet_d + "/*.warc.wet.gz")}
    assert wets == {w[: -len(".warc.gz")] + ".warc.wet.gz" for w in warcs}
