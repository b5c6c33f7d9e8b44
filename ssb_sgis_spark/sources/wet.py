"""WET sidecar generation + scan — Common Crawl's extracted-text format.

CC ships three artifacts per crawl segment: the WARC itself, a CDX(J)
index (sources/cdx.py), and a **WET** file — a WARC-structured file of
``conversion`` records holding the extracted plain text of each
response, 1:1 with the WARC segment (``part-x.warc.gz`` →
``part-x.warc.wet.gz``).  Most LLM-corpus pipelines start from WET, so
an engine that writes WARC must also emit the sidecar.

* :func:`wet_from_warc` — the generator, FUSED and shuffle-free: one
  ``binaryFile`` task per WARC segment splits gzip members, parses the
  response records, runs the Arrow-batched html→text extractor, and
  writes the segment's ``.warc.wet.gz`` sidecar in the same task —
  records in WARC order, every member ``gzip(mtime=0, level=1)`` so
  the sidecar bytes are a pure function of the WARC bytes (write twice
  → identical md5).  Zero shuffles, zero driver bytes: the exact
  per-segment locality CC's own WET generator exploits, and the reason
  a 64k-segment crawl saturates a 1000-executor cluster with no
  coordination.
* :func:`read_wet` — distributed scan of ``conversion`` records back
  to ``(url, wet_ts, refers_to, text, segment)``; same member-split
  kernel as ``read_warc``, map-only.

Each conversion record carries ``WARC-Refers-To`` = the response
record's ID, so WET rows join back to WARC rows without string-matching
URLs (the public WET contract).

Reference parity: none — container layer (BASELINE input_hint); format
derived from the public ISO 28500 spec + Common Crawl's published WET
layout.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .warc import (
    _CRLF,
    _WARC_VERSION,
    _DATE_FMT,
    _gz_member,
    _parse_date,
    _parse_headers,
    _record_id,
    _split_members,
    parse_warc_member,
)

__all__ = ["wet_from_warc", "read_wet", "default_extractor"]

WET_MANIFEST_SCHEMA = "file string, n_records long, n_bytes long"
WET_RECORD_SCHEMA = (
    "url string, wet_ts timestamp, refers_to string, text string, segment string"
)


def default_extractor(htmls):
    """Arrow-batched html→text for the pages-law template (the same
    regex kernel as operators/textops.extract_text, in series form)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sarr = pa.array(htmls, type=pa.binary()).cast(pa.string())
    ext = pc.extract_regex(sarr, r'class="geo"[^>]*>(?P<t>.*?)</p>')
    return ext.field("t").to_pylist()


def _conversion_record(url: str, ts: datetime, refers_to: str, text: bytes) -> bytes:
    headers = [
        _WARC_VERSION,
        b"WARC-Type: conversion",
        b"WARC-Record-ID: " + _record_id("conversion:" + url).encode(),
        b"WARC-Refers-To: " + refers_to.encode(),
        b"WARC-Date: " + ts.strftime(_DATE_FMT).encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(text)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + text + _CRLF + _CRLF


def _wetinfo_record(segment: str, software: str) -> bytes:
    body = (
        "software: %s\r\nformat: WARC File Format 1.1\r\n"
        "description: conversion sidecar (extracted text)\r\n" % software
    ).encode()
    headers = [
        _WARC_VERSION,
        b"WARC-Type: warcinfo",
        b"WARC-Record-ID: " + _record_id("wetinfo:" + segment).encode(),
        b"WARC-Date: "
        + datetime(2024, 1, 1, tzinfo=timezone.utc).strftime(_DATE_FMT).encode(),
        b"WARC-Filename: " + segment.encode(),
        b"Content-Type: application/warc-fields",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + body + _CRLF + _CRLF


def wet_from_warc(
    spark: SparkSession,
    warc_path: str,
    wet_path: str,
    extractor=default_extractor,
    software: str = "ssb-sgis-spark",
    level: int = 1,
) -> DataFrame:
    """Generate one ``.warc.wet.gz`` sidecar per WARC segment.  Lazy:
    acting on the returned manifest (file, n_records, n_bytes) runs the
    job.  Map-only — each binaryFile task reads its segments, extracts,
    and writes the sidecars; nothing shuffles."""
    os.makedirs(wet_path, exist_ok=True)
    files = spark.read.format("binaryFile").load(os.path.join(warc_path, "*.warc.gz"))

    def kernel(it):
        import io

        import pandas as pd

        for pdf in it:
            names, counts, sizes = [], [], []
            for fname, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(fname)
                wet_name = name[: -len(".warc.gz")] + ".warc.wet.gz"
                urls, tss, rids, bodies = [], [], [], []
                for member in _split_members(bytes(content), name):
                    rec = parse_warc_member(member, name)
                    if rec is None:
                        continue
                    urls.append(rec["url"])
                    tss.append(rec["warc_ts"])
                    rids.append(rec["record_id"])
                    bodies.append(rec["html"])
                texts = extractor(bodies) if urls else []
                buf = io.BytesIO()
                buf.write(_gz_member(_wetinfo_record(wet_name, software), level))
                for url, ts, rid, text in zip(urls, tss, rids, texts):
                    buf.write(
                        _gz_member(
                            _conversion_record(
                                url, ts, rid, ("" if text is None else text).encode()
                            ),
                            level,
                        )
                    )
                data = buf.getvalue()
                final = os.path.join(wet_path, wet_name)
                tmp = final + ".inprogress-%s" % uuid.uuid4().hex
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, final)  # atomic publish (task-retry safe)
                names.append(wet_name)
                counts.append(len(urls))
                sizes.append(len(data))
            if names:
                yield pd.DataFrame(
                    {"file": names, "n_records": counts, "n_bytes": sizes}
                )

    return files.select("path", "content").mapInPandas(
        kernel, schema=WET_MANIFEST_SCHEMA
    )


def _parse_conversion(member: bytes, name: str):
    head, sep, rest = member.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError(f"{name}: record missing header terminator")
    hdr = _parse_headers(head, name)
    if hdr.get("warc-type") != "conversion":
        return None
    try:
        clen = int(hdr["content-length"])
    except KeyError:
        raise ValueError(f"{name}: record missing Content-Length") from None
    payload = rest[:clen]
    if len(payload) < clen:
        raise ValueError(f"{name}: conversion payload truncated")
    return {
        "url": hdr.get("warc-target-uri", ""),
        "wet_ts": _parse_date(hdr["warc-date"]),
        "refers_to": hdr.get("warc-refers-to", ""),
        "text": payload.decode("utf-8"),
    }


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``.warc.wet.gz`` sidecars into ``(url, wet_ts, refers_to,
    text, segment)`` — one task per file, map-only."""
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.warc.wet.gz"))

    def kernel(it):
        import pandas as pd

        for pdf in it:
            for fname, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(fname)
                urls, tss, refs, texts = [], [], [], []
                for member in _split_members(bytes(content), name):
                    rec = _parse_conversion(member, name)
                    if rec is None:
                        continue
                    urls.append(rec["url"])
                    tss.append(rec["wet_ts"])
                    refs.append(rec["refers_to"])
                    texts.append(rec["text"])
                if urls:
                    yield pd.DataFrame(
                        {
                            "url": urls,
                            "wet_ts": tss,
                            "refers_to": refs,
                            "text": texts,
                            "segment": name,
                        }
                    )

    return files.select("path", "content").mapInPandas(
        kernel, schema=WET_RECORD_SCHEMA
    )
