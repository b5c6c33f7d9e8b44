"""MJPEG-AVI video codec (operators/multimodal.py): RIFF container walk,
per-frame T.81 decode, exactness window, refusals."""

import numpy as np
import pytest

from ssb_sgis_spark.operators.multimodal import (
    DECODERS,
    _decode_avi,
    encode_avi_mjpeg,
)


def _block_frames(seed, n=4, by=2, bx=3):
    rng = np.random.RandomState(seed)
    bv = rng.randint(0, 256, size=(n, by, bx))
    return np.repeat(np.repeat(bv, 8, axis=1), 8, axis=2).astype(np.uint8)


def test_gray_block_constant_video_is_exact():
    frames = _block_frames(3)
    dec = _decode_avi(encode_avi_mjpeg(frames, unit_quant=True))
    assert dec.shape == (4, 16, 24, 1)
    assert np.array_equal(dec[..., 0], frames)


def test_color_video_round_trip_psnr():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 64, size=(3, 24, 24, 3)).astype(np.float64)
    smooth = np.clip(
        base.cumsum(axis=1).cumsum(axis=2) / 24.0, 0, 255
    ).astype(np.uint8)
    dec = _decode_avi(encode_avi_mjpeg(smooth, quality=90))
    assert dec.shape == smooth.shape
    mse = np.mean((dec.astype(float) - smooth.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 30


def test_container_structure():
    frames = _block_frames(5, n=2)
    data = encode_avi_mjpeg(frames, fps=10, unit_quant=True)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"MJPG" in data and b"movi" in data
    assert data.count(b"00dc") == 2  # one chunk per frame
    # every frame chunk is itself a standalone baseline JPEG
    from ssb_sgis_spark.kernels.jpeg import decode_jpeg

    i = data.find(b"00dc")
    size = int.from_bytes(data[i + 4 : i + 8], "little")
    frame0 = decode_jpeg(data[i + 8 : i + 8 + size])
    assert np.array_equal(frame0[0, :, :, 0], frames[0])


def test_decoders_registry_has_real_avi():
    frames = _block_frames(9, n=3)
    out = DECODERS["avi"](encode_avi_mjpeg(frames, unit_quant=True))
    assert out.shape[0] == 3 and np.array_equal(out[..., 0], frames)
    assert DECODERS["mp4"] is not None  # ISO-BMFF is real too (test_mp4.py)


def test_refusals():
    with pytest.raises(ValueError, match="AVI"):
        _decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # a structurally-valid AVI with no video chunks
    empty = encode_avi_mjpeg(_block_frames(1, n=1), unit_quant=True)
    broken = empty.replace(b"00dc", b"01wb")
    with pytest.raises(ValueError, match="no MJPEG"):
        _decode_avi(broken)


def test_frame_sampling_math_on_video_array():
    frames = _block_frames(11, n=6)
    dec = _decode_avi(encode_avi_mjpeg(frames, unit_quant=True))
    assert np.array_equal(dec[::2][..., 0], frames[::2])


def test_malformed_containers_raise_valueerror_only():
    frames = _block_frames(29, n=2)
    good = encode_avi_mjpeg(frames, unit_quant=True)
    for cut in (16, 40, len(good) // 2):
        try:
            _decode_avi(good[:cut])
        except ValueError:
            pass
    # bit-flip fuzz inside the movi payload
    for seed in range(10):
        r = np.random.RandomState(seed)
        buf = bytearray(good)
        for pos in r.randint(60, len(buf), 8):
            buf[pos] ^= 0xFF
        try:
            _decode_avi(bytes(buf))
        except ValueError:
            pass
