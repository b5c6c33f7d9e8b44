"""ISO-BMFF (MP4) codec (kernels/mp4.py): box grammar, sample-table
resolver, Motion-JPEG decode, universal metadata, refusals, fuzz."""

import struct

import numpy as np
import pytest

from ssb_sgis_spark.kernels.mp4 import (
    decode_mp4,
    encode_mp4_mjpeg,
    mp4_metadata_row,
    parse_mp4,
)
from ssb_sgis_spark.operators.multimodal import DECODERS


def _block_frames(seed, n=4, by=2, bx=3):
    rng = np.random.RandomState(seed)
    bv = rng.randint(0, 256, size=(n, by, bx))
    return np.repeat(np.repeat(bv, 8, axis=1), 8, axis=2).astype(np.uint8)


def test_gray_block_constant_mp4_is_exact():
    frames = _block_frames(3)
    dec = decode_mp4(encode_mp4_mjpeg(frames, unit_quant=True))
    assert dec.shape == (4, 16, 24, 1)
    assert np.array_equal(dec[..., 0], frames)


def test_color_mp4_round_trip_psnr():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 64, size=(3, 24, 24, 3)).astype(np.float64)
    smooth = np.clip(base.cumsum(axis=1).cumsum(axis=2) / 24.0, 0, 255).astype(
        np.uint8
    )
    dec = decode_mp4(encode_mp4_mjpeg(smooth, quality=90))
    assert dec.shape == smooth.shape
    mse = np.mean((dec.astype(float) - smooth.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 30


def test_container_metadata_is_universal():
    frames = _block_frames(5, n=6, by=3, bx=5)
    data = encode_mp4_mjpeg(frames, fps=10, unit_quant=True)
    assert data[4:8] == b"ftyp"
    meta = mp4_metadata_row(data)
    assert meta["codec"] == "jpeg"
    assert (meta["width"], meta["height"]) == (40, 24)
    assert meta["n_samples"] == 6
    assert meta["duration_ms"] == 600  # 6 samples at 10 fps
    # sample_bytes equals the sum of the mdat JPEG samples
    m = parse_mp4(data)
    assert meta["sample_bytes"] == int(m["sizes"].sum())
    # every resolved sample range is a standalone baseline JPEG
    from ssb_sgis_spark.kernels.jpeg import decode_jpeg

    for i, (o, s) in enumerate(zip(m["offsets"], m["sizes"])):
        assert np.array_equal(
            decode_jpeg(data[int(o) : int(o + s)])[0, :, :, 0], frames[i]
        )


def test_foreign_codec_parses_but_refuses_decode():
    """An avc1 file: metadata extraction works, frame decode refuses by
    naming the fourcc — honest data-dependent refusal, not a stub."""
    frames = _block_frames(9, n=2)
    data = bytearray(encode_mp4_mjpeg(frames, unit_quant=True))
    i = data.find(b"stsd")
    j = data.find(b"jpeg", i)
    data[j : j + 4] = b"avc1"
    meta = mp4_metadata_row(bytes(data))
    assert meta["codec"] == "avc1" and meta["n_samples"] == 2
    with pytest.raises(ValueError, match="avc1"):
        decode_mp4(bytes(data))


def test_multi_run_stsc_resolver():
    """Multi-chunk layouts (run-length stsc, several stco offsets) must
    resolve to the same sample byte ranges as the single-chunk file."""
    frames = _block_frames(13, n=5)
    single = encode_mp4_mjpeg(frames, unit_quant=True)
    multi = encode_mp4_mjpeg(frames, chunk_samples=[2, 2, 1], unit_quant=True)
    ms, mm = parse_mp4(single), parse_mp4(multi)
    # two stsc runs: chunks 1-2 hold 2 samples each, chunk 3 holds 1
    assert list(mm["sizes"]) == list(ms["sizes"])
    assert np.array_equal(decode_mp4(multi), decode_mp4(single))
    # per-sample granularity too: each resolved range is a JPEG
    from ssb_sgis_spark.kernels.jpeg import decode_jpeg

    for i, (o, s) in enumerate(zip(mm["offsets"], mm["sizes"])):
        assert np.array_equal(
            decode_jpeg(multi[int(o) : int(o + s)])[0, :, :, 0], frames[i]
        )


def test_co64_offsets():
    frames = _block_frames(17, n=2)
    a = encode_mp4_mjpeg(frames, unit_quant=True)
    b = encode_mp4_mjpeg(frames, use_co64=True, unit_quant=True)
    assert b"co64" in b and b"co64" not in a
    assert np.array_equal(decode_mp4(b), decode_mp4(a))


def test_decoders_registry_has_real_mp4():
    frames = _block_frames(21, n=3)
    out = DECODERS["mp4"](encode_mp4_mjpeg(frames, unit_quant=True))
    assert out.shape[0] == 3 and np.array_equal(out[..., 0], frames)


def test_malformed_containers_raise_valueerror_only():
    frames = _block_frames(29, n=2)
    good = encode_mp4_mjpeg(frames, unit_quant=True)
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)
    for cut in (4, 16, 40, len(good) // 2, len(good) - 8):
        try:
            decode_mp4(good[:cut])
        except ValueError:
            pass
    for seed in range(10):
        r = np.random.RandomState(seed)
        buf = bytearray(good)
        for pos in r.randint(8, len(buf), 8):
            buf[pos] ^= 0xFF
        try:
            decode_mp4(bytes(buf))
        except ValueError:
            pass
