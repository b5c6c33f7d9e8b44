"""Multimodal plumbing: fake-codec decode, resize, frame sampling —
batch shapes and values vs direct numpy."""

import numpy as np
import pytest

from ssb_sgis_spark.operators.multimodal import (
    media_features,
    resize_block_mean,
    sample_frames,
    synth_media_df,
    _decode_raw,
)


def test_media_features_match_numpy(spark):
    df = synth_media_df(spark, n=12)
    got = {r["media_id"]: r for r in media_features(df).collect()}
    for row in df.collect():
        a = _decode_raw(
            bytes(row["payload"]), row["width"], row["height"], row["channels"], row["n_frames"]
        )
        m = a.reshape(-1, 3).mean(axis=0)
        assert got[row["media_id"]]["mean_r_x1000"] == int(m[0] * 1000)
        assert got[row["media_id"]]["std_x1000"] == int(a.std() * 1000)


def test_resize_and_frame_sample(spark):
    df = synth_media_df(spark, n=8)
    small = {r["media_id"]: r for r in resize_block_mean(df, 2).collect()}
    for row in df.collect():
        s = small[row["media_id"]]
        assert s["width"] == (row["width"] // 2)
        assert s["height"] == (row["height"] // 2)
        assert len(s["payload"]) == row["n_frames"] * s["width"] * s["height"] * 3
    sampled = {r["media_id"]: r for r in sample_frames(df, 2).collect()}
    for row in df.collect():
        assert sampled[row["media_id"]]["n_frames"] == int(np.ceil(row["n_frames"] / 2))


def test_unknown_codec_raises(spark):
    import pandas as pd

    from ssb_sgis_spark.operators.multimodal import decode_batch

    # every shipped format is now a REAL codec (mp4 included, via
    # kernels/mp4.py) — only a format with no registered decoder at all
    # still hits the stub path
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "fmt": ["webm"],
            "payload": [b"\x1a\x45\xdf\xa3"],
            "width": [1],
            "height": [1],
            "channels": [3],
            "n_frames": [1],
        }
    )
    with pytest.raises(NotImplementedError):
        decode_batch(pdf)


def test_bmp_roundtrip_including_stride_padding():
    """24-bit BMP with w=5 (row stride padded to 16 bytes) round-trips."""
    import numpy as np

    from ssb_sgis_spark.operators.multimodal import _decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(7, 5, 3)).astype(np.uint8)
    got = _decode_bmp(encode_bmp(img))
    assert got.shape == (1, 7, 5, 3)
    np.testing.assert_array_equal(got[0], img)


def test_wav_roundtrip_8_and_16_bit():
    import numpy as np

    from ssb_sgis_spark.operators.multimodal import _decode_wav, encode_wav

    rng = np.random.RandomState(4)
    stereo16 = rng.randint(-32768, 32767, size=(1001, 2)).astype(np.int16)
    got = _decode_wav(encode_wav(stereo16, rate=8000))
    assert got.shape == (1, 1, 1001, 2) and got.dtype == np.int16
    np.testing.assert_array_equal(got[0, 0], stereo16)
    mono8 = rng.randint(0, 256, size=533).astype(np.uint8)
    got8 = _decode_wav(encode_wav(mono8))
    assert got8.shape == (1, 1, 533, 1)
    np.testing.assert_array_equal(got8[0, 0, :, 0], mono8)


def test_media_features_over_real_codecs(spark):
    """media_features runs over genuinely-encoded BMP and WAV payloads."""
    import numpy as np

    from ssb_sgis_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_wav,
        media_features,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8)
    snd = rng.randint(0, 256, size=(400, 1)).astype(np.uint8)
    rows = [
        (1, "image", "bmp", 6, 8, 3, 1, bytearray(encode_bmp(img))),
        (2, "audio", "wav", 400, 1, 1, 1, bytearray(encode_wav(snd))),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in media_features(df).collect()}
    assert got[1]["mean_r_x1000"] == int(img[:, :, 0].mean() * 1000)
    assert got[1]["mean_b_x1000"] == int(img[:, :, 2].mean() * 1000)
    assert got[2]["mean_r_x1000"] == int(snd.mean() * 1000)
    assert got[2]["std_x1000"] == int(snd.std() * 1000)


def test_bmp_stats_integer_moments_match_numpy(spark):
    """bmp_stats (real encode→decode pipeline) == straight numpy moments
    on the closed-form pixels — the decode stage adds nothing and loses
    nothing."""
    import math

    from ssb_sgis_spark.operators.multimodal import (
        BMP_NPIX,
        PIX_A,
        PIX_B,
        bmp_stats,
        synth_bmp_from_ids,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 1, 7, 12345)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in bmp_stats(synth_bmp_from_ids(ids)).collect()
    }
    idx = np.arange(BMP_NPIX, dtype=np.int64)
    for mid in (0, 1, 7, 12345):
        v = ((mid * PIX_A + idx * PIX_B) % 256).reshape(-1, 3)
        n, nc = BMP_NPIX, BMP_NPIX // 3
        assert got[mid]["mean_r_x1000"] == int(int(v[:, 0].sum()) / nc * 1000)
        assert got[mid]["mean_b_x1000"] == int(int(v[:, 2].sum()) / nc * 1000)
        m = int(v.sum()) / n
        std = math.sqrt(int((v * v).sum()) / n - m * m)
        assert got[mid]["std_x1000"] == int(std * 1000)


def test_png_roundtrip_all_color_types_and_filters():
    """encode_png/_decode_png are inverse for gray/GA/RGB/RGBA, with
    filter 0 rows and with all five filter types cycling."""
    from ssb_sgis_spark.operators.multimodal import _decode_png, encode_png

    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):
        for filters in ("none", "cycle"):
            img = rng.randint(0, 256, size=(13, 19, c)).astype(np.uint8)
            got = _decode_png(encode_png(img, filters=filters))
            assert got.shape == (1, 13, 19, c)
            np.testing.assert_array_equal(got[0], img)
    # 2-D grayscale input path
    gray = rng.randint(0, 256, size=(5, 7)).astype(np.uint8)
    np.testing.assert_array_equal(
        _decode_png(encode_png(gray))[0][..., 0], gray
    )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def test_png_palette_trns_and_multi_idat():
    """Hand-built palette PNGs: PLTE expansion, tRNS -> RGBA, and an IDAT
    stream split across two chunks."""
    import struct
    import zlib

    from ssb_sgis_spark.operators.multimodal import _PNG_SIG, _decode_png

    rng = np.random.RandomState(9)
    w, h = 6, 4
    idx = rng.randint(0, 5, size=(h, w)).astype(np.uint8)
    plte = rng.randint(0, 256, size=(5, 3)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
    comp = zlib.compress(raw)

    png = _PNG_SIG + ihdr + _png_chunk(b"PLTE", plte.tobytes()) + _png_chunk(
        b"IDAT", comp
    ) + _png_chunk(b"IEND", b"")
    out = _decode_png(png)
    assert out.shape == (1, h, w, 3)
    np.testing.assert_array_equal(out[0], plte[idx])

    trns = bytes([10, 20, 30, 40, 50])
    png_a = _PNG_SIG + ihdr + _png_chunk(b"PLTE", plte.tobytes()) + _png_chunk(
        b"tRNS", trns
    ) + _png_chunk(b"IDAT", comp) + _png_chunk(b"IEND", b"")
    out_a = _decode_png(png_a)
    assert out_a.shape == (1, h, w, 4)
    np.testing.assert_array_equal(
        out_a[0, ..., 3], np.frombuffer(trns, np.uint8)[idx]
    )

    png_2 = _PNG_SIG + ihdr + _png_chunk(b"PLTE", plte.tobytes()) + _png_chunk(
        b"IDAT", comp[:10]
    ) + _png_chunk(b"IDAT", comp[10:]) + _png_chunk(b"IEND", b"")
    np.testing.assert_array_equal(_decode_png(png_2)[0], plte[idx])


def test_png_rejects_unsupported():
    import struct
    import zlib

    from ssb_sgis_spark.operators.multimodal import _PNG_SIG, _decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"BM123456")
    # 16-bit depth refused cleanly
    ihdr16 = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
    png16 = _PNG_SIG + ihdr16 + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit"):
        _decode_png(png16)
    # Adam7 interlace refused cleanly
    ihdr_i = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    png_i = _PNG_SIG + ihdr_i + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 14)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        _decode_png(png_i)


def test_png_stats_integer_moments_match_numpy(spark):
    """png_stats (real DEFLATE encode→decode pipeline, cycling filters)
    == straight numpy moments on the closed-form pixels."""
    import math

    from ssb_sgis_spark.operators.multimodal import (
        PNG_NPIX,
        PIX_A,
        PIX_B,
        png_stats,
        synth_png_from_ids,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 3, 11, 54321)], "doc_id long")
    got = {r["doc_id"]: r for r in png_stats(synth_png_from_ids(ids)).collect()}
    idx = np.arange(PNG_NPIX, dtype=np.int64)
    for mid in (0, 3, 11, 54321):
        v = ((mid * PIX_A + idx * PIX_B) % 256).reshape(-1, 3)
        n, nc = PNG_NPIX, PNG_NPIX // 3
        assert got[mid]["mean_r_x1000"] == int(int(v[:, 0].sum()) / nc * 1000)
        assert got[mid]["mean_g_x1000"] == int(int(v[:, 1].sum()) / nc * 1000)
        m = int(v.sum()) / n
        std = math.sqrt(int((v * v).sum()) / n - m * m)
        assert got[mid]["std_x1000"] == int(std * 1000)


def test_png_decoder_registered_in_decoders():
    """PNG is a REAL decoder entry now, no longer a stub."""
    import pandas as pd

    from ssb_sgis_spark.operators.multimodal import DECODERS, decode_batch, encode_png

    assert DECODERS["png"] is not None
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "fmt": ["png"],
            "payload": [encode_png(img)],
            "width": [4],
            "height": [4],
            "channels": [3],
            "n_frames": [1],
        }
    )
    (out,) = decode_batch(pdf)
    np.testing.assert_array_equal(out[0], img)
