"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no codec libraries.

Closes the last stubbed decoder in ``operators/multimodal.py``: real web
corpora are overwhelmingly JPEG, and this container has no PIL/libjpeg,
so the codec is implemented from the spec: marker parsing (SOI/APPn/DQT/
SOF0/DHT/DRI/SOS/EOI), canonical Huffman coding with the Annex K default
tables, zigzag run-length entropy coding with byte stuffing and restart
markers, orthonormal 8x8 DCT-II as one matrix sandwich per block, and
BT.601 YCbCr <-> RGB with 4:4:4 or 4:2:0 chroma.

Exactness property used by the DuckDB oracle (``jpeg_stats``): with unit
quantization tables, an image that is CONSTANT within each 8x8 block
round-trips bit-exactly — the DCT of a constant block is DC-only and
integer-valued (DC = 8*(v-128)), AC quantizes to exactly zero, and the
IDCT reconstructs v before clamping.  The Spark side runs the full real
codec (Huffman decode, zigzag, dequantize, IDCT); the SQL side computes
moments from the closed-form block law — a hash match proves every
entropy-coded bit decodes correctly.

Reference parity: ssb-sgis delegates raster/image IO to rasterio/PIL
(raster/raster.py); this engine ships its own codecs because the 100 TB
decode stage must run inside executor Arrow batches, not on the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants

# Zigzag scan: ZIGZAG[k] = row-major index of the k-th zigzag position.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance / chrominance), row-major.
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K default Huffman tables: (bits[1..16] counts, symbol list).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II matrix M: forward F = M @ B @ M.T gives the
# T.81 coefficient scale (DC of a constant block v-128 is exactly
# 8*(v-128)); inverse is M.T @ F @ M.
_x = np.arange(8)
_DCT_M = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_DCT_M[0] /= np.sqrt(2.0)


# ------------------------------------------------------- Huffman tables

def _canonical_codes(bits, symbols):
    """(counts per length 1..16, symbols) -> {symbol: (code, length)}."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, symbols):
    """-> {(length, code): symbol} for bit-serial canonical decode."""
    enc = _canonical_codes(bits, symbols)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


# ----------------------------------------------------------- bit writer

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, length):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            # pad with 1-bits per T.81 F.1.2.3
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """Bit-serial reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _category(v: int) -> int:
    """Bit-length category of a DC diff / AC coefficient."""
    return int(abs(v)).bit_length()


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits back to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -------------------------------------------------------------- encoder

def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(nby*8, nbx*8) int plane (already level-shifted) ->
    (nby*nbx, 64) quantized zigzag coefficients."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
    )
    coefs = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    q = np.round(coefs.reshape(-1, 64) / qt.astype(np.float64))
    return q.astype(np.int64)[:, ZIGZAG]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """BT.601 full-range RGB -> YCbCr, floor(x+0.5) rounding, uint8."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """BT.601 YCbCr -> RGB, floor(x+0.5) rounding, uint8."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int64)


def encode_jpeg(
    img: np.ndarray,
    quality: int | None = None,
    unit_quant: bool = False,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes.

    ``unit_quant=True`` writes all-ones quantization tables (the
    lossless-for-block-constant mode the oracle uses); otherwise Annex K
    tables scaled by ``quality`` (default 75).  ``subsample=True`` emits
    4:2:0 chroma (2x2 Y blocks per MCU); default is 4:4:4.
    """
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("JPEG: 1 (gray) or 3 (RGB) channels only")
    if unit_quant:
        qts = [np.ones(64, np.int64), np.ones(64, np.int64)]
    else:
        q = 75 if quality is None else quality
        qts = [_scale_qt(QT_LUMA, q), _scale_qt(QT_CHROMA, q)]

    if nc == 3:
        ycc = rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    else:
        planes = [img[..., 0]]
        samp = [(1, 1)]
        qsel = [0]
        subsample = False

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # per-component padded planes (chroma box-mean downsampled for 4:2:0)
    comp_planes = []
    for ci, p in enumerate(planes):
        if samp[ci] != (hmax, vmax):  # chroma in 4:2:0
            p2 = _pad_to(p, 2).astype(np.float64)
            p = np.floor(
                p2.reshape(p2.shape[0] // 2, 2, p2.shape[1] // 2, 2).mean(axis=(1, 3))
                + 0.5
            ).astype(np.int64)
        comp_planes.append(p)

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every component to its MCU coverage
    zz_per_comp = []
    for ci, p in enumerate(comp_planes):
        hi, vi = samp[ci]
        p = _pad_to(np.asarray(p, np.int64), 8)
        need_h = mcuy * 8 * vi
        need_w = mcux * 8 * hi
        if p.shape[0] < need_h or p.shape[1] < need_w:
            p = np.pad(
                p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge"
            )
        else:
            p = p[:need_h, :need_w]
        zz = _fdct_quant(p - 128, qts[qsel[ci]])
        zz_per_comp.append((zz, need_w // 8))  # blocks + blocks-per-row

    dc_tabs = [_canonical_codes(*HUFF_DC_LUMA), _canonical_codes(*HUFF_DC_CHROMA)]
    ac_tabs = [_canonical_codes(*HUFF_AC_LUMA), _canonical_codes(*HUFF_AC_CHROMA)]

    bw = _BitWriter()
    preds = [0] * nc
    entropy_parts = []
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy_parts.append(bw.flush())
                entropy_parts.append(
                    bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                )
                bw = _BitWriter()
                preds = [0] * nc
            for ci in range(nc):
                hi, vi = samp[ci]
                zz, bpr = zz_per_comp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bidx = (my * vi + by) * bpr + (mx * hi + bx)
                        preds[ci] = _encode_block(
                            bw, zz[bidx], preds[ci], dc_tabs[qsel[ci]], ac_tabs[qsel[ci]]
                        )
            mcu_count += 1
    entropy_parts.append(bw.flush())
    entropy = b"".join(entropy_parts)

    # ---- marker segments
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for ti, qt in enumerate(qts[: (2 if nc == 3 else 1)]):
        out.append(seg(0xDB, bytes([ti]) + bytes(qt[ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out.append(seg(0xC0, sof))  # SOF0 baseline
    for cls, tabs in ((0, (HUFF_DC_LUMA, HUFF_DC_CHROMA)), (1, (HUFF_AC_LUMA, HUFF_AC_CHROMA))):
        for ti in range(2 if nc == 3 else 1):
            bits, syms = tabs[ti]
            out.append(seg(0xC4, bytes([(cls << 4) | ti]) + bytes(bits) + bytes(syms)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
    sos += b"\x00\x3f\x00"
    out.append(seg(0xDA, sos))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# -------------------------------------------------------------- decoder

def _unstuff(data: bytes):
    """Split the entropy stream at RST markers and remove byte stuffing.
    Returns list of unstuffed intervals."""
    intervals, cur = [], bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # next real marker
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals


def decode_jpeg(payload: bytes, *_) -> np.ndarray:
    """Baseline JFIF bytes -> (1, h, w, channels) uint8 (RGB for 3-comp).

    Supports SOF0 (baseline sequential), 1 or 3 components, sampling
    factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), DRI restart intervals, multiple
    DQT/DHT segments.  Progressive (SOF2) and arithmetic coding raise.
    Any malformed stream raises ValueError (never a raw struct/index
    error — a 100 TB web corpus WILL contain truncated payloads and the
    decode kernel's error contract must be catchable per row).
    """
    try:
        return _decode_jpeg_impl(payload)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"JPEG: malformed stream ({type(e).__name__}: {e})") from e


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    frame = None
    comps = []  # (cid, hi, vi, tq)
    restart = 0
    scan = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables not supported")
                zz = np.frombuffer(body, np.uint8, 64, o + 1).astype(np.int64)
                qts[tq] = zz[UNZIGZAG]
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                cnt = sum(bits)
                syms = list(body[o + 17 : o + 17 + cnt])
                huff[(tc, th)] = _decode_table(bits, syms)
                o += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("JPEG: only baseline (SOF0) supported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for si in range(ns):
                cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                sel[cs] = (tabs >> 4, tabs & 15)
            scan = (sel, pos)
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF0/SOS")
    fh, fw, nc = frame
    sel, entropy_start = scan
    intervals = _unstuff(payload[entropy_start:])

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    planes = []
    for cid, hi, vi, tq in comps:
        planes.append(np.zeros((mcuy * 8 * vi, mcux * 8 * hi), np.float64))

    reader = _BitReader(intervals[0])
    interval_i = 0
    preds = [0] * nc
    zz_buf = np.zeros(64, np.int64)
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart and mcu_i and mcu_i % restart == 0:
                interval_i += 1
                reader = _BitReader(intervals[interval_i])
                preds = [0] * nc
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_tab = huff[(0, sel[cid][0])]
                ac_tab = huff[(1, sel[cid][1])]
                qt = qts[tq]
                for by in range(vi):
                    for bx in range(hi):
                        zz_buf[:] = 0
                        s = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        zz_buf[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 15
                            zz_buf[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = (zz_buf[UNZIGZAG] * qt).reshape(8, 8)
                        block = _DCT_M.T @ coef.astype(np.float64) @ _DCT_M
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    out_planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        p = np.clip(np.floor(planes[ci] + 128.0 + 0.5), 0, 255).astype(np.uint8)
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:fh, :fw])
    if nc == 1:
        return out_planes[0][None, :, :, None]
    ycc = np.stack(out_planes, axis=-1)
    return np.ascontiguousarray(ycbcr_to_rgb(ycc))[None]
