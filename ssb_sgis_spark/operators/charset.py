"""Charset sniffing + bytes→UTF-8 transcoding — the true first stage of
a web-crawl pipeline.

Real Common-Crawl HTML arrives as **bytes in mixed encodings**; every
downstream operator (extraction, dedup, tokenization) assumes UTF-8
strings.  This module implements the WHATWG-style decode front-end as an
Arrow-batched kernel (same ``mapInPandas`` codec shape as
:mod:`.textops` / :mod:`.multimodal` — binary column in, typed columns
out, no per-row Python *UDFs*, map-only, zero shuffle):

1. **BOM sniff** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win
   outright (HTML5 §encoding sniffing).
2. **meta prescan** — ``charset=`` declaration in the first 1024 bytes,
   matched on an ASCII-superset view, with the HTML5 alias table
   (``latin1``/``iso-8859-1``/``ascii`` → windows-1252, per spec).
3. **UTF-8 validation** — undeclared payloads that strictly validate as
   UTF-8 are UTF-8.
4. **fallback** — anything else decodes as windows-1252 (the HTML5
   default for the no-information case; a superset of ISO-8859-1).

Since Spark strings are UTF-8, the decoded column IS the transcoded
output — ``detect_decode`` is the ``html: binary`` → ``text: string``
adapter the BASELINE input_hint shape needs when payloads are not
guaranteed UTF-8.

Scale shape at 10^12 pages: map-only (no shuffle, no driver state); the
kernel reads each binary value once; ``keep=`` projects away the raw
payload so it never crosses the Arrow boundary back out (the same
bandwidth rule measured in textops.py).

The synthetic corpus: :func:`charset_captures_df` derives a
mixed-encoding capture log from the pages law with native expressions
only — each page's raw bytes are one of five law-chosen shapes
(BOM+UTF-8, declared UTF-8, undeclared UTF-8, declared windows-1252,
BOM+UTF-16LE, undeclared latin-1 bytes that *fail* UTF-8 validation),
so every sniffing branch is exercised.  The driver oracle reconstructs
the decoded string and the detected charset CLOSED-FORM from the law —
it never sees a byte — which checks the sniffer against an independent
derivation.

Reference parity: none — webtext surface (BASELINE input_hint); the
sniffing order is the public HTML5/WHATWG encoding standard.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["charset_captures_df", "detect_decode", "sniff_charset"]

# HTML5 label → codec normalization (the subset our payloads exercise;
# unknown labels fall through to content sniffing).
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "cp1252": "windows-1252",
    "windows-1252": "windows-1252",
    "utf-16": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16-le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "utf-16-be": "utf-16-be",
}

_META_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I)


def sniff_charset(raw: bytes) -> tuple[str, bool]:
    """(charset, had_bom) for one payload — HTML5 sniffing order:
    BOM > meta prescan (first 1024 bytes) > UTF-8 validation >
    windows-1252 fallback."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8", True
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le", True
    if raw[:2] == b"\xfe\xff":
        return "utf-16-be", True
    head = raw[:1024].decode("iso-8859-1")  # ASCII-superset view
    m = _META_RE.search(head)
    if m:
        name = _ALIASES.get(m.group(1).lower())
        if name is None:
            try:
                name = codecs.lookup(m.group(1)).name
            except LookupError:
                name = None
        if name is not None:
            return name, False
    try:
        raw.decode("utf-8", "strict")
        return "utf-8", False
    except UnicodeDecodeError:
        return "windows-1252", False


_BOM_LEN = {("utf-8", True): 3, ("utf-16-le", True): 2, ("utf-16-be", True): 2}


def detect_decode(
    df: DataFrame,
    raw_col: str = "raw",
    keep: list[str] | None = None,
    charset_col: str = "charset",
    bom_col: str = "bom",
    out_col: str = "decoded",
) -> DataFrame:
    """Sniff each binary payload's charset and decode it to a UTF-8
    Spark string.  Adds ``(charset, bom, decoded)``; map-only.

    ``keep`` projects the carried-through input columns (drop the raw
    payload — returning it doubles the Arrow traffic for nothing).
    """
    if keep is None:
        keep = [f.name for f in df.schema.fields]
    fields = [f for f in df.schema.fields if f.name in keep] + [
        T.StructField(charset_col, T.StringType()),
        T.StructField(bom_col, T.BooleanType()),
        T.StructField(out_col, T.StringType()),
    ]

    def kernel(it):
        for pdf in it:
            out = pdf[keep].copy()
            charsets, boms, texts = [], [], []
            for v in pdf[raw_col]:
                raw = bytes(v)
                cs, bom = sniff_charset(raw)
                charsets.append(cs)
                boms.append(bom)
                texts.append(raw[_BOM_LEN.get((cs, bom), 0):].decode(cs, "replace"))
            out[charset_col] = charsets
            out[bom_col] = boms
            out[out_col] = texts
            yield out

    return df.mapInPandas(kernel, schema=T.StructType(fields))


# --- deterministic mixed-encoding capture synthesis (native exprs) -----

# body text: every char encodable in latin-1 AND multi-byte under UTF-8,
# so the validation branch is meaningful and the 1252 round-trip exact.
def _body(uid_col):
    return F.concat(
        F.lit("Søk på blåbærsyltetøy fra side "),
        uid_col.cast("string"),
        F.lit(" i Ålesund"),
    )


def _html(uid_col, meta_name):
    head = (
        F.concat(F.lit('<html><head><meta charset="'), meta_name, F.lit('"></head>'))
        if meta_name is not None
        else F.lit("<html><head></head>")
    )
    return F.concat(head, F.lit("<body><p>"), _body(uid_col), F.lit("</p></body></html>"))


def charset_captures_df(pages: DataFrame) -> DataFrame:
    """Mixed-encoding raw captures from the pages law.  Law (m8 = uid%8,
    m4 = uid%4; the m8 cases refine their m4 class to drop the meta tag):

    =========  =========================  ==================  =====
    law case   raw bytes                  detected charset    bom
    =========  =========================  ==================  =====
    m4 == 0    BOM + UTF-8, meta utf-8    utf-8               true
    m8 == 5    UTF-8, NO meta             utf-8 (validation)  false
    m4 == 1    UTF-8, meta utf-8          utf-8 (meta)        false
    m8 == 6    latin-1 bytes, NO meta     windows-1252 (fb)   false
    m4 == 2    latin-1 bytes, meta 1252   windows-1252 (meta) false
    m4 == 3    BOM + UTF-16LE             utf-16-le           true
    =========  =========================  ==================  =====
    """
    uid = F.col("uid")
    m4, m8 = uid % 4, uid % 8
    utf8_meta = F.encode(_html(uid, F.lit("utf-8")), "UTF-8")
    utf8_bare = F.encode(_html(uid, None), "UTF-8")
    w1252_meta = F.encode(_html(uid, F.lit("windows-1252")), "ISO-8859-1")
    w1252_bare = F.encode(_html(uid, None), "ISO-8859-1")
    u16 = F.concat(F.lit(b"\xff\xfe"), F.encode(_html(uid, F.lit("utf-16-le")), "UTF-16LE"))
    raw = (
        F.when(m4 == 0, F.concat(F.lit(b"\xef\xbb\xbf"), utf8_meta))
        .when(m8 == 5, utf8_bare)
        .when(m4 == 1, utf8_meta)
        .when(m8 == 6, w1252_bare)
        .when(m4 == 2, w1252_meta)
        .otherwise(u16)
    )
    return pages.select("uid", "url", raw.alias("raw"))
