"""ISO Base Media File Format (MP4 / ISO 14496-12) in pure stdlib+numpy.

Two layers, both real:

1. **Container** — a spec-correct box walker plus a full sample-table
   resolver: ``stsd`` (codec fourcc + visual sample entry), ``stts``
   (decode timestamps), ``stsc`` (sample→chunk map, run-length),
   ``stsz``/``stz2`` (sample sizes), ``stco``/``co64`` (chunk offsets).
   This resolves the exact byte range of every sample for ANY mp4, so
   metadata extraction (duration, timescale, dimensions, codec, sample
   count/bytes) works universally — including files whose codec we
   cannot decode.
2. **Codec** — Motion-JPEG video (sample entry ``jpeg`` / ``mjpa``, the
   QuickTime/ISO Motion-JPEG layout): each sample is one baseline T.81
   JPEG, decoded by ``kernels/jpeg.py``.  Inter-frame codecs (``avc1``,
   ``hev1``, …) raise ``ValueError`` naming the fourcc — an honest
   data-dependent refusal (motion compensation is out of pure-numpy
   scope), not a stub: the container layer still parses those files.

The writer emits ``ftyp`` + ``mdat`` + ``moov`` (mdat first so ``stco``
offsets are known without fixups) with one video track and a
single-chunk sample table — minimal but fully spec-conformant, so the
reader's generic resolver is exercised on real structures.

Reference parity: the reference delegates all raster/media IO to
rasterio/PIL-class libraries (``/root/reference/src/sgis/raster/raster.py``);
this sandbox has none, so the container and codec are from the public
ISO 14496-12 / T.81 specs.

Malformed input contract (mirrors ``kernels/jpeg.py``): structural
damage raises ``ValueError`` (catchable per row), never a bare
struct/index error.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "parse_mp4",
    "decode_mp4",
    "encode_mp4_mjpeg",
    "mp4_metadata_row",
]

_MJPEG_FOURCC = {"jpeg", "mjpa", "mjpb", "MJPG"}


class _Box:
    __slots__ = ("kind", "body_pos", "body_end")

    def __init__(self, kind: str, body_pos: int, body_end: int):
        self.kind = kind
        self.body_pos = body_pos
        self.body_end = body_end


def _walk(buf: bytes, pos: int, end: int):
    """Yield child boxes of [pos, end); handles 64-bit largesize."""
    while pos + 8 <= end:
        size, kind = struct.unpack_from(">I4s", buf, pos)
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the compact header
            if body + 8 > end:
                raise ValueError("mp4: truncated largesize header")
            size = struct.unpack_from(">Q", buf, body)[0]
            body += 8
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("mp4: box overruns its container")
        yield _Box(kind.decode("latin1"), body, pos + size)
        pos += size


def _child(buf: bytes, box: _Box, kind: str) -> _Box | None:
    for c in _walk(buf, box.body_pos, box.body_end):
        if c.kind == kind:
            return c
    return None


def _children(buf: bytes, box: _Box, kind: str) -> list[_Box]:
    return [c for c in _walk(buf, box.body_pos, box.body_end) if c.kind == kind]


def _fullbox(buf: bytes, box: _Box) -> tuple[int, int, int]:
    """-> (version, flags, payload_pos) of a FullBox."""
    v_f = struct.unpack_from(">I", buf, box.body_pos)[0]
    return v_f >> 24, v_f & 0xFFFFFF, box.body_pos + 4


def _parse_stsd(buf: bytes, stsd: _Box) -> dict:
    _, _, p = _fullbox(buf, stsd)
    (entry_count,) = struct.unpack_from(">I", buf, p)
    if entry_count < 1:
        raise ValueError("mp4: empty stsd")
    # first SampleEntry: size(4) fourcc(4) reserved(6) dref_index(2)
    size, fourcc = struct.unpack_from(">I4s", buf, p + 4)
    out = {"codec": fourcc.decode("latin1"), "width": 0, "height": 0}
    # VisualSampleEntry layout: +16 pre_defined/reserved, then width/height
    vpos = p + 4 + 8 + 8 + 16
    if vpos + 4 <= p + 4 + size:
        w, h = struct.unpack_from(">HH", buf, vpos)
        out["width"], out["height"] = int(w), int(h)
    return out


def _parse_table(buf: bytes, box: _Box, fields: int) -> np.ndarray:
    """FullBox with a u32 entry_count then entry_count×fields u32s."""
    _, _, p = _fullbox(buf, box)
    (n,) = struct.unpack_from(">I", buf, p)
    need = p + 4 + 4 * fields * n
    if need > box.body_end:
        raise ValueError(f"mp4: {box.kind} table truncated")
    a = np.frombuffer(buf, dtype=">u4", count=fields * n, offset=p + 4)
    return a.astype(np.int64).reshape(n, fields)


def _sample_ranges(buf: bytes, stbl: _Box) -> tuple[np.ndarray, np.ndarray]:
    """Resolve every sample's (offset, size) from the sample table —
    the full stsc run-length chunk map, not a single-chunk shortcut."""
    stsz = _child(buf, stbl, "stsz")
    stsc = _child(buf, stbl, "stsc")
    stco = _child(buf, stbl, "stco")
    co64 = _child(buf, stbl, "co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("mp4: incomplete sample table (stsz/stsc/stco)")

    _, _, p = _fullbox(buf, stsz)
    const_size, n_samples = struct.unpack_from(">II", buf, p)
    if const_size:
        sizes = np.full(n_samples, const_size, dtype=np.int64)
    else:
        if p + 8 + 4 * n_samples > stsz.body_end:
            raise ValueError("mp4: stsz table truncated")
        sizes = np.frombuffer(buf, dtype=">u4", count=n_samples, offset=p + 8).astype(
            np.int64
        )

    if co64 is not None:
        _, _, cp = _fullbox(buf, co64)
        (n_chunks,) = struct.unpack_from(">I", buf, cp)
        if cp + 4 + 8 * n_chunks > co64.body_end:
            raise ValueError("mp4: co64 table truncated")
        chunk_offsets = np.frombuffer(
            buf, dtype=">u8", count=n_chunks, offset=cp + 4
        ).astype(np.int64)
    else:
        chunk_offsets = _parse_table(buf, stco, 1)[:, 0]
    n_chunks = len(chunk_offsets)

    # stsc rows: (first_chunk, samples_per_chunk, sample_description_index)
    runs = _parse_table(buf, stsc, 3)
    if len(runs) == 0 or runs[0, 0] != 1:
        raise ValueError("mp4: stsc must start at chunk 1")

    offsets = np.empty(n_samples, dtype=np.int64)
    si = 0
    for ri in range(len(runs)):
        first = int(runs[ri, 0])
        per = int(runs[ri, 1])
        last = int(runs[ri + 1, 0]) - 1 if ri + 1 < len(runs) else n_chunks
        for ci in range(first - 1, last):
            pos = int(chunk_offsets[ci])
            for _ in range(per):
                if si >= n_samples:
                    break
                offsets[si] = pos
                pos += int(sizes[si])
                si += 1
    if si != n_samples:
        raise ValueError("mp4: stsc/stsz sample count mismatch")
    if n_samples and int(offsets[-1] + sizes[-1]) > len(buf):
        raise ValueError("mp4: sample data overruns file")
    return offsets, sizes


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO-BMFF file -> metadata + resolved sample ranges.

    Returns ``{codec, width, height, timescale, duration, n_samples,
    sample_bytes, offsets, sizes}`` for the FIRST video (``vide``
    handler) track.  Works for any codec — decoding is a separate step.
    """
    try:
        return _parse_mp4_impl(payload)
    except (struct.error, IndexError) as e:  # damaged structures -> ValueError
        raise ValueError(f"mp4: malformed container ({type(e).__name__})") from e


def _parse_mp4_impl(payload: bytes) -> dict:
    top = list(_walk(payload, 0, len(payload)))
    if not top or top[0].kind != "ftyp":
        raise ValueError("mp4: missing ftyp")
    moov = next((b for b in top if b.kind == "moov"), None)
    if moov is None:
        raise ValueError("mp4: missing moov")

    mvhd = _child(payload, moov, "mvhd")
    if mvhd is None:
        raise ValueError("mp4: missing mvhd")
    ver, _, p = _fullbox(payload, mvhd)
    if ver == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", payload, p)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", payload, p)

    for trak in _children(payload, moov, "trak"):
        mdia = _child(payload, trak, "mdia")
        if mdia is None:
            continue
        hdlr = _child(payload, mdia, "hdlr")
        if hdlr is None:
            continue
        _, _, hp = _fullbox(payload, hdlr)
        handler = payload[hp + 4 : hp + 8]
        if handler != b"vide":
            continue
        minf = _child(payload, mdia, "minf")
        stbl = _child(payload, minf, "stbl") if minf else None
        stsd = _child(payload, stbl, "stsd") if stbl else None
        if stbl is None or stsd is None:
            raise ValueError("mp4: video track lacks a sample table")
        meta = _parse_stsd(payload, stsd)
        offsets, sizes = _sample_ranges(payload, stbl)
        meta.update(
            timescale=int(timescale),
            duration=int(duration),
            n_samples=int(len(sizes)),
            sample_bytes=int(sizes.sum()),
            offsets=offsets,
            sizes=sizes,
        )
        return meta
    raise ValueError("mp4: no video track")


def mp4_metadata_row(payload: bytes) -> dict:
    """Codec-agnostic metadata (the universal path): duration in
    milliseconds, dimensions, codec fourcc, sample count/bytes."""
    m = parse_mp4(payload)
    ts = m["timescale"] or 1
    return {
        "codec": m["codec"],
        "width": m["width"],
        "height": m["height"],
        "duration_ms": m["duration"] * 1000 // ts,
        "n_samples": m["n_samples"],
        "sample_bytes": m["sample_bytes"],
    }


def decode_mp4(payload: bytes) -> np.ndarray:
    """Motion-JPEG mp4 -> (n_frames, h, w, C) uint8.  Non-MJPEG codecs
    raise ValueError naming the fourcc (inter-frame prediction is out of
    pure-numpy scope; the container still parses via :func:`parse_mp4`)."""
    from ssb_sgis_spark.kernels.jpeg import decode_jpeg

    m = parse_mp4(payload)
    if m["codec"] not in _MJPEG_FOURCC:
        raise ValueError(
            f"mp4: codec {m['codec']!r} requires inter-frame prediction; "
            "only Motion-JPEG sample entries are decodable here"
        )
    frames = [
        decode_jpeg(payload[int(o) : int(o + s)])[0]
        for o, s in zip(m["offsets"], m["sizes"])
    ]
    if not frames:
        raise ValueError("mp4: video track has no samples")
    if len({f.shape for f in frames}) != 1:
        raise ValueError("mp4: frames differ in dimensions")
    return np.stack(frames)


# ------------------------------------------------------------- writer

def _box(kind: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), kind) + body


def _full(kind: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(kind, struct.pack(">I", (version << 24) | flags) + body)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(
    frames: np.ndarray,
    fps: int = 25,
    chunk_samples: list[int] | None = None,
    use_co64: bool = False,
    **jpeg_kw,
) -> bytes:
    """(n, h, w) or (n, h, w, 3) uint8 -> Motion-JPEG mp4 bytes.

    Layout: ``ftyp`` + ``mdat`` (samples) + ``moov`` — mdat first so the
    chunk offsets need no fixups.  ``chunk_samples`` partitions the
    samples into chunks (default: one chunk holding all samples) with a
    run-length-compressed ``stsc``; ``use_co64`` writes 64-bit chunk
    offsets.  ``jpeg_kw`` forwards to ``encode_jpeg`` (e.g.
    ``unit_quant=True`` for the block-constant-exact mode used by the
    oracles).
    """
    from ssb_sgis_spark.kernels.jpeg import encode_jpeg

    n = int(frames.shape[0])
    h, w = int(frames.shape[1]), int(frames.shape[2])
    samples = [encode_jpeg(frames[i], **jpeg_kw) for i in range(n)]
    sizes = [len(s) for s in samples]
    if chunk_samples is None:
        chunk_samples = [n]
    if sum(chunk_samples) != n or any(c < 1 for c in chunk_samples):
        raise ValueError("chunk_samples must partition the sample count")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_body = b"".join(samples)
    first_sample_off = len(ftyp) + 8  # ftyp + mdat header

    # chunk offsets: samples are contiguous in mdat, chunks split them
    chunk_offsets, pos, si = [], first_sample_off, 0
    for c in chunk_samples:
        chunk_offsets.append(pos)
        pos += sum(sizes[si : si + c])
        si += c
    # run-length-compress (first_chunk, samples_per_chunk, sdi) rows
    stsc_rows = []
    for ci, c in enumerate(chunk_samples):
        if not stsc_rows or stsc_rows[-1][1] != c:
            stsc_rows.append((ci + 1, c, 1))

    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    stsd_entry = (
        struct.pack(">I4s", 8 + 8 + 70, b"jpeg")
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + struct.pack(">HH", 0, 0)  # pre_defined / reserved
        + b"\x00" * 12  # pre_defined[3]
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_rows))
        + b"".join(struct.pack(">III", *r) for r in stsc_rows),
    )
    stsz = _full(
        b"stsz", 0, 0, struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes)
    )
    nc = len(chunk_offsets)
    if use_co64:
        stco = _full(
            b"co64",
            0,
            0,
            struct.pack(">I", nc) + struct.pack(f">{nc}Q", *chunk_offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            0,
            struct.pack(">I", nc) + struct.pack(f">{nc}I", *chunk_offsets),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(b"dinf", dref)
        + stbl,
    )
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"video\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x0100)
        + b"\x00" * 10
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov
