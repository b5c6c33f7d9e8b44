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


def _iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session's classpath
    AND a catalog is configured (``spark.sql.catalog.*`` with the Iceberg
    SparkCatalog impl).  The sandbox has neither, so the lake helpers
    fall back to parquet directories there; on a real cluster submitted
    with ``--packages org.apache.iceberg:iceberg-spark-runtime-...`` the
    same call sites read/write true Iceberg tables."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    # SET lists explicitly-configured entries INCLUDING runtime
    # spark.conf.set(...) catalogs, which sparkContext.getConf() misses
    confs = [(r["key"], r["value"]) for r in spark.sql("SET").collect()]
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in confs
    )


def _is_table_ident(ident_or_path: str) -> bool:
    """``db.table`` / ``catalog.db.table`` idents vs filesystem paths."""
    return "/" not in ident_or_path and not os.path.exists(ident_or_path)


def _path_is_iceberg_table(path: str) -> bool:
    """A filesystem path is an Iceberg table iff it has the table-format
    ``metadata/`` directory.  :func:`write_lake_table` only writes true
    Iceberg through catalog idents (``writeTo`` needs a catalog), so a
    path it wrote is plain parquet ``partitionBy`` even in an
    Iceberg-enabled session — reading such a directory with
    ``format("iceberg")`` would raise NoSuchTable.  The check is local-FS
    (the sandbox model); on object stores Iceberg tables are addressed by
    catalog ident, which never reaches this branch."""
    return os.path.isdir(os.path.join(path, "metadata"))


def read_lake_table(
    spark: SparkSession,
    ident_or_path: str,
    *,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """Read a lake table: Iceberg when the runtime+catalog are present
    (with snapshot-id / as-of-timestamp time travel), else a parquet
    directory (time travel unsupported there — raises rather than
    silently reading HEAD).

    This is the 10^12-page ingest point of the north plan: the pages
    table lives in an Iceberg lake; filters on the Morton ``cell``
    column reach Iceberg's partition pruning exactly as they reach
    parquet row-group pruning in the sandbox (both via Spark's
    DataSourceV2 pushdown — the operators never materialize the scan).
    """
    if _iceberg_available(spark) and (
        _is_table_ident(ident_or_path) or _path_is_iceberg_table(ident_or_path)
    ):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
        if _is_table_ident(ident_or_path):
            return spark.table(ident_or_path) if snapshot_id is None and as_of_timestamp_ms is None else reader.load(ident_or_path)
        return reader.load(ident_or_path)
    # plain-parquet world: a snapshot table (sources/snapshots.py) carries
    # its own manifest lineage and supports time travel without Iceberg
    import os as _os

    if not _is_table_ident(ident_or_path) and _os.path.isdir(
        _os.path.join(ident_or_path, "_snapshots")
    ):
        from ssb_sgis_spark.sources.snapshots import read_snapshot_table

        return read_snapshot_table(
            spark,
            ident_or_path,
            snapshot_id=snapshot_id,
            as_of_timestamp_ms=as_of_timestamp_ms,
        )
    if snapshot_id is not None or as_of_timestamp_ms is not None:
        raise ValueError(
            "time travel requires the Iceberg runtime or a snapshot table "
            "(sources/snapshots.py); this path is plain parquet with no "
            "snapshot lineage to travel over"
        )
    if _is_table_ident(ident_or_path):
        return spark.table(ident_or_path)
    return spark.read.parquet(ident_or_path)


def write_lake_table(
    df: DataFrame,
    ident_or_path: str,
    *,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write a lake table: Iceberg v2 (``writeTo`` API — append or
    createOrReplace with identity partitioning) when available, else a
    parquet directory with the same ``partitionBy`` layout.  Either way
    the write is executor-parallel: one task per shuffle partition, no
    driver collect."""
    spark = df.sparkSession
    if _iceberg_available(spark) and _is_table_ident(ident_or_path):
        w = df.writeTo(ident_or_path).using("iceberg")
        if mode == "append":
            try:
                w.append()
                return
            except Exception as e:
                # fall through to create ONLY when the table is absent;
                # any other append failure (schema mismatch, commit
                # conflict, storage error) must surface — createOrReplace
                # here would silently destroy the existing table
                msg = str(e)
                if not any(
                    s in msg
                    for s in ("TABLE_OR_VIEW_NOT_FOUND", "NoSuchTable", "not found")
                ):
                    raise
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    writer = df.write.mode("overwrite" if mode != "append" else "append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ident_or_path)


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


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    crs: str | None = None,
) -> DataFrame:
    """Distributed GeoParquet writer (reference ``write_geopandas``,
    ``io/dapla_functions.py:59-119`` — which delegates to geopandas'
    GeoParquet writer).

    Spark's parquet sink cannot attach custom footer key-value metadata,
    so each EXECUTOR partition writes its own file through pyarrow with
    the GeoParquet 1.0 ``geo`` schema metadata (encoding=WKB, primary
    column, per-file bbox computed from the engine's own bounds kernel)
    — the layout geopandas/GDAL read back as a GeoDataFrame.  Returns
    the write manifest ``(file, n_rows, minx, miny, maxx, maxy)`` — one
    row per written file (the same lineage stance as plans/manifest).
    """
    import json

    import numpy as np
    import pandas as pd

    from ..kernels import wkb as _wkb
    from ..kernels.geom import bounds as _bounds

    os.makedirs(path, exist_ok=True)
    schema_str = "file string, n_rows long, minx double, miny double, maxx double, maxy double"

    def writer(it):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in it:
            if not len(pdf):
                continue
            ga = _wkb.decode(pdf[geometry_col].tolist())
            bb = _bounds(ga)
            fbox = [
                float(np.nanmin(bb[:, 0])), float(np.nanmin(bb[:, 1])),
                float(np.nanmax(bb[:, 2])), float(np.nanmax(bb[:, 3])),
            ]
            geo = {
                "version": "1.0.0",
                "primary_column": geometry_col,
                "columns": {
                    geometry_col: {
                        "encoding": "WKB",
                        "geometry_types": [],
                        "bbox": fbox,
                        **({"crs": crs} if crs else {}),
                    }
                },
            }
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            table = table.replace_schema_metadata(
                {**(table.schema.metadata or {}), b"geo": json.dumps(geo).encode()}
            )
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(table, fname)
            yield pd.DataFrame(
                [(fname, len(pdf), *fbox)],
                columns=["file", "n_rows", "minx", "miny", "maxx", "maxy"],
            )

    return df.mapInPandas(writer, schema=schema_str)
