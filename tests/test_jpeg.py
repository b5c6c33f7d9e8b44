"""Baseline JPEG codec (kernels/jpeg.py): exactness window, lossy PSNR,
chroma subsampling, restart markers, refusals."""

import numpy as np
import pytest

from ssb_sgis_spark.kernels.jpeg import (
    decode_jpeg,
    encode_jpeg,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


def test_block_constant_gray_is_exact():
    rng = np.random.RandomState(3)
    bv = rng.randint(0, 256, size=(4, 6))
    img = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, unit_quant=True))
    assert dec.shape == (1, 32, 48, 1)
    assert np.array_equal(dec[0, :, :, 0], img)


def test_non_multiple_of_8_dims_exact():
    rng = np.random.RandomState(5)
    bv = rng.randint(0, 256, size=(3, 4))
    img = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).astype(np.uint8)
    img = img[:19, :27]  # forces edge-replication padding both axes
    dec = decode_jpeg(encode_jpeg(img, unit_quant=True))
    assert dec.shape == (1, 19, 27, 1)
    assert np.array_equal(dec[0, :, :, 0], img)


def test_restart_markers_exact_and_present():
    rng = np.random.RandomState(9)
    bv = rng.randint(0, 256, size=(3, 5))
    img = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).astype(np.uint8)
    data = encode_jpeg(img, unit_quant=True, restart_interval=2)
    # 15 MCUs / DRI=2 -> RST0..RST6 appear in the entropy stream
    assert sum(data.count(bytes([0xFF, 0xD0 + i])) for i in range(8)) >= 7
    assert np.array_equal(decode_jpeg(data)[0, :, :, 0], img)


def test_unit_quant_noise_within_one_lsb():
    # random image at unit quant: only float DCT/IDCT rounding remains
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, unit_quant=True))[0, :, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_color_444_psnr_and_shape():
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256], -1).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dec.shape == (1, h, w, 3)
    assert _psnr(dec[0], rgb) > 35


def test_color_420_subsampled_psnr():
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack([(x * 2) % 256, (y * 3) % 256, 128 + 0 * x], -1).astype(np.uint8)
    data = encode_jpeg(rgb, quality=90, subsample=True)
    data_444 = encode_jpeg(rgb, quality=90)
    assert len(data) < len(data_444)  # 4:2:0 really drops chroma blocks
    dec = decode_jpeg(data)
    assert dec.shape == (1, h, w, 3)
    assert _psnr(dec[0], rgb) > 28


def test_quality_ladder_monotone_size():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_deterministic_bytes():
    rng = np.random.RandomState(17)
    rgb = rng.randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    assert encode_jpeg(rgb, quality=77) == encode_jpeg(rgb, quality=77)


def test_ycbcr_round_trip_identity_on_gray_axis():
    # pure grays map to Cb=Cr=128 and survive the colorspace round trip
    g = np.arange(256, dtype=np.uint8)
    rgb = np.stack([g, g, g], -1)[None]
    ycc = rgb_to_ycbcr(rgb)
    assert np.array_equal(ycc[..., 1], np.full_like(g, 128)[None])
    assert np.array_equal(ycbcr_to_rgb(ycc), rgb)


def test_refusals():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01")
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))


def test_decoders_registry_has_real_jpeg():
    from ssb_sgis_spark.operators.multimodal import DECODERS

    img = np.full((8, 8), 200, np.uint8)
    out = DECODERS["jpeg"](encode_jpeg(img, unit_quant=True))
    assert np.array_equal(out[0, :, :, 0], img)


def test_malformed_streams_raise_valueerror_only():
    """A 100 TB web corpus WILL contain truncated/corrupt payloads; the
    decode kernel's error contract is ValueError, catchable per row."""
    rng = np.random.RandomState(23)
    img = np.repeat(np.repeat(rng.randint(0, 256, (2, 3)), 8, 0), 8, 1).astype(
        np.uint8
    )
    good = encode_jpeg(img, unit_quant=True)
    for cut in (3, 10, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(good[:cut])
    for seed in range(20):
        r = np.random.RandomState(seed)
        fuzz = b"\xff\xd8" + bytes(r.randint(0, 256, 64, dtype=np.int64).tolist())
        try:
            decode_jpeg(fuzz)
        except ValueError:
            pass  # the only allowed failure mode
