"""IO helpers (reference ``sgis/io/dapla_functions.py`` — its GCS/dapla
surface maps to plain file-system + Spark reader calls here).

``read_parquet_url`` (reference ``read_parquet_url`` in
``io/dapla_functions.py`` / ``sgis.read_parquet_url``) fetches an
http(s) parquet to a local cache and reads it with Spark; plain paths
read directly.  ``exists`` / ``check_files`` mirror the reference's
existence checks (``dapla_functions.py`` exists/check_files).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def read_parquet_url(spark: SparkSession, path_or_url: str) -> DataFrame:
    """spark.read.parquet over a local path, or an http(s) URL fetched
    once into a content-addressed temp cache (the reference streams GCS
    objects the same way)."""
    if path_or_url.startswith(("http://", "https://")):
        import urllib.request

        cache = os.path.join(
            tempfile.gettempdir(),
            "sgis_url_cache",
            hashlib.sha256(path_or_url.encode()).hexdigest()[:24] + ".parquet",
        )
        if not os.path.exists(cache):
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            urllib.request.urlretrieve(path_or_url, cache)  # noqa: S310
        return spark.read.parquet(cache)
    return spark.read.parquet(path_or_url)


def exists(path: str) -> bool:
    """File-or-directory existence (reference ``exists``)."""
    return os.path.exists(path)


def check_files(
    folder: str, contains: str | None = None, within_minutes: int | None = None
) -> list[str]:
    """List files under ``folder`` (recursive), optionally filtered by
    substring and recency (reference ``check_files`` returns the same
    listing as a DataFrame; a plain list keeps it dependency-free)."""
    import time

    out = []
    now = time.time()
    for root, _dirs, files in os.walk(folder):
        for f in files:
            p = os.path.join(root, f)
            if contains and contains not in p:
                continue
            if within_minutes is not None:
                if now - os.path.getmtime(p) > within_minutes * 60:
                    continue
            out.append(p)
    return sorted(out)
