"""WARC/1.1 source + sink — the Common-Crawl container the north-star
input actually arrives in.

BASELINE's input_hint fixes the page shape ``(url, warc_ts, html, text,
lang)``; real Common-Crawl ships those rows as WARC files (ISO 28500):
one ``.warc.gz`` per crawl segment, each record an *independent gzip
member* so readers can split a file without decompressing everything
before it.  This module implements that container from scratch with
stdlib ``gzip``/``zlib`` only — no warcio — both directions:

* :func:`write_warc` — distributed sink.  One shuffle (records hash to
  their target segment file), then each segment is written by exactly
  one task as a standalone multi-member ``.warc.gz``: a ``warcinfo``
  member followed by one ``response`` member per page, records sorted
  by url within the file, every member ``gzip(mtime=0)`` so the file
  bytes are a pure function of its rows (write twice → identical md5).
  Returns the write manifest ``(file, n_records, n_bytes)`` — the same
  lineage stance as ``plans/manifest`` and ``write_geoparquet``.
* :func:`read_warc` — distributed scan.  ``spark.read.format
  ("binaryFile")`` lists the segments (one task per file — the unit of
  parallelism Common Crawl itself chose: ~64k segments/crawl, so a
  1000-executor cluster keeps every core busy with no intra-file
  coordination), then a ``mapInPandas`` kernel splits gzip members with
  ``zlib.decompressobj(wbits=31)`` + ``unused_data`` and parses WARC +
  HTTP headers into the input_hint columns.  Map-only: zero shuffles.

Scale notes: the writer's ``n_files`` is the knob that matches segment
size to executor memory (CC uses ~1 GiB segments); the reader holds one
segment per task, so ``binaryFile``'s whole-file rows are bounded by
that same knob, not by ``maxPartitionBytes``.  Malformed input (bad
magic, truncated member, missing mandatory header) raises ``ValueError``
naming the file — the codec error contract shared with kernels/jpeg.

Reference parity: the reference reads its page inputs with geopandas/
pyarrow (``io/read_parquet.py:23-34``, ``io/dapla_functions.py:15-119``)
— parquet-only; WARC is the piece a Common-Crawl-scale user needs on
top, derived from the public ISO 28500 / IIPC warc-specification text.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.1"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

MANIFEST_SCHEMA = "file string, n_records long, n_bytes long"
RECORD_SCHEMA = (
    "url string, warc_ts timestamp, record_id string, http_status int, "
    "html binary, segment string"
)


def _record_id(url: str) -> str:
    """Deterministic WARC-Record-ID: a UUID derived from md5(url)."""
    return "<urn:uuid:%s>" % uuid.UUID(bytes=hashlib.md5(url.encode()).digest())


def _response_record(url: str, ts: datetime, html: bytes) -> bytes:
    """One WARC response record (uncompressed bytes, incl. trailing CRLFs)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    headers = [
        _WARC_VERSION,
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url).encode(),
        b"WARC-Date: " + ts.strftime(_DATE_FMT).encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF


def _warcinfo_record(segment: str, software: str) -> bytes:
    body = ("software: %s\r\nformat: WARC File Format 1.1\r\n" % software).encode()
    headers = [
        _WARC_VERSION,
        b"WARC-Type: warcinfo",
        b"WARC-Record-ID: " + _record_id("warcinfo:" + segment).encode(),
        b"WARC-Date: " + datetime(2024, 1, 1, tzinfo=timezone.utc).strftime(_DATE_FMT).encode(),
        b"WARC-Filename: " + segment.encode(),
        b"Content-Type: application/warc-fields",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + body + _CRLF + _CRLF


def _gz_member(record: bytes, level: int = 1) -> bytes:
    # mtime=0 keeps the member bytes a pure function of the record; the
    # FIXED level keeps them deterministic.  Default level 1: WARC
    # members are one small html document each, where level 6 costs ~4x
    # the CPU of level 1 for a few percent of size — at crawl scale the
    # writer is compression-bound, so speed wins (Common Crawl itself
    # ships fast-deflate gzip members)
    return gzip.compress(record, compresslevel=level, mtime=0)


def write_warc(
    df: DataFrame,
    path: str,
    n_files: int = 8,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    software: str = "ssb-sgis-spark",
    level: int = 1,
) -> DataFrame:
    """Write pages as multi-member ``.warc.gz`` segment files.

    Lazy like every sink here: the returned manifest DataFrame triggers
    the write when acted on.  Plan shape: one hash shuffle on the
    segment id, then map-only per-segment encode — no driver collect of
    page bytes ever.  ``n_files`` is also the write parallelism (one
    task per segment): size it to cores at bench scale and to the
    ~1 GiB-per-segment target at crawl scale.
    """
    os.makedirs(path, exist_ok=True)

    def writer(key, pdf):
        import pandas as pd

        fid = int(key[0])
        seg = "part-%05d.warc.gz" % fid
        pdf = pdf.sort_values(url_col, kind="mergesort")
        buf = io.BytesIO()
        buf.write(_gz_member(_warcinfo_record(seg, software), level))
        for url, ts, html in zip(pdf[url_col], pdf[ts_col], pdf[html_col]):
            ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            buf.write(_gz_member(_response_record(str(url), ts, bytes(html)), level))
        data = buf.getvalue()
        final = os.path.join(path, seg)
        tmp = final + ".inprogress-%s" % uuid.uuid4().hex
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)  # atomic publish (task-retry safe)
        return pd.DataFrame(
            {"file": [seg], "n_records": [len(pdf)], "n_bytes": [len(data)]}
        )

    keyed = df.select(url_col, ts_col, html_col).withColumn(
        "_seg", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_files)).cast("int")
    )
    return keyed.groupBy("_seg").applyInPandas(writer, schema=MANIFEST_SCHEMA)


def _split_member_spans(buf: bytes, name: str):
    """Yield ``(offset, compressed_length, decompressed_bytes)`` for each
    gzip member of a multi-member file.  Chunk-fed so the input is
    scanned ONCE: handing the whole remaining buffer to each member's
    decompressobj makes ``unused_data`` copy the tail per member —
    O(n²) memcpy on a many-member segment.  The spans are what a CDX
    index records: ``f.seek(offset); gzip.decompress(f.read(length))``
    recovers exactly one record without touching the rest of the file."""
    if not buf.startswith(b"\x1f\x8b"):
        raise ValueError(f"{name}: not a gzip stream (bad magic)")
    mv = memoryview(buf)
    n = len(buf)
    pos = 0
    chunk = 1 << 18
    while pos < n:
        start = pos
        d = zlib.decompressobj(31)
        parts = []
        while not d.eof and pos < n:
            piece = mv[pos : pos + chunk]
            try:
                parts.append(d.decompress(piece))
            except zlib.error as e:  # corrupt deflate data
                raise ValueError(f"{name}: corrupt gzip member: {e}") from None
            pos += len(piece)
        if not d.eof:
            raise ValueError(f"{name}: truncated gzip member")
        pos -= len(d.unused_data)  # rewind unconsumed bytes (< one chunk)
        parts.append(d.flush())
        yield start, pos - start, b"".join(parts)


def _split_members(buf: bytes, name: str):
    """Yield each gzip member's decompressed bytes (span-less wrapper)."""
    for _, _, data in _split_member_spans(buf, name):
        yield data


def _parse_headers(block: bytes, name: str) -> dict:
    lines = block.split(_CRLF)
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError(f"{name}: member does not start with a WARC version line")
    hdr = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        hdr[k.strip().lower().decode()] = v.strip().decode()
    return hdr


def parse_warc_member(member: bytes, name: str = "<warc>"):
    """Parse one uncompressed WARC record.  Returns ``None`` for
    non-response records (warcinfo/request/metadata), else a dict with
    url / warc_ts / record_id / http_status / html."""
    head, sep, rest = member.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError(f"{name}: record missing header terminator")
    hdr = _parse_headers(head, name)
    try:
        clen = int(hdr["content-length"])
    except KeyError:
        raise ValueError(f"{name}: record missing Content-Length") from None
    payload = rest[:clen]
    if len(payload) < clen:
        raise ValueError(f"{name}: record payload truncated")
    if hdr.get("warc-type") != "response":
        return None
    http_head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError(f"{name}: response record has no HTTP header block")
    status_line = http_head.split(_CRLF, 1)[0].split()
    status = int(status_line[1]) if len(status_line) > 1 else -1
    return {
        "url": hdr.get("warc-target-uri", ""),
        "warc_ts": _parse_date(hdr["warc-date"]),
        "record_id": hdr.get("warc-record-id", ""),
        "http_status": status,
        "html": body,
    }


def _parse_date(s: str) -> datetime:
    """Fixed-format WARC-Date parse (strptime costs ~10x on this exact
    ``%Y-%m-%dT%H:%M:%SZ`` shape, and the reader runs it per record)."""
    try:
        return datetime(
            int(s[0:4]), int(s[5:7]), int(s[8:10]),
            int(s[11:13]), int(s[14:16]), int(s[17:19]),
        )
    except (ValueError, IndexError):
        return datetime.strptime(s, _DATE_FMT)  # uncommon shapes


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``.warc.gz`` segments back into the input_hint page shape.

    One ``binaryFile`` row per segment → one parse task per segment;
    the kernel is Arrow-batched and map-only (no shuffle, no driver
    bytes).  Output: ``url, warc_ts, record_id, http_status, html,
    segment``.
    """
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.warc.gz"))

    def kernel(it):
        import pandas as pd

        for pdf in it:
            for fname, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(fname)
                # column accumulators: pd.DataFrame(list-of-dicts) costs
                # more than the parse itself at ~10^4 records/segment
                urls, tss, rids, stats, bodies = [], [], [], [], []
                for member in _split_members(bytes(content), name):
                    rec = parse_warc_member(member, name)
                    if rec is None:
                        continue
                    urls.append(rec["url"])
                    tss.append(rec["warc_ts"])
                    rids.append(rec["record_id"])
                    stats.append(rec["http_status"])
                    bodies.append(rec["html"])
                if urls:
                    yield pd.DataFrame(
                        {
                            "url": urls,
                            "warc_ts": tss,
                            "record_id": rids,
                            "http_status": stats,
                            "html": bodies,
                            "segment": name,
                        }
                    )

    return files.select("path", "content").mapInPandas(kernel, schema=RECORD_SCHEMA)
