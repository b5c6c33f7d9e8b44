"""Audio feature extraction over real WAV payloads: sample-law stats and
rFFT spectral features (pure-tone / Parseval closed forms)."""

import numpy as np

from ssb_sgis_spark.operators.multimodal import (
    WAV_N,
    _decode_wav,
    encode_wav,
)


def test_wav_law_round_trip_matches_numpy_law():
    from ssb_sgis_spark.operators.multimodal import PIX_A, PIX_B

    i = np.arange(WAV_N, dtype=np.int64)
    for mid in (0, 7, 4999):
        x = (((mid * PIX_A + i * PIX_B) % 65536) - 32768).astype(np.int16)
        dec = _decode_wav(encode_wav(x, rate=16000))[0, 0, :, 0]
        assert np.array_equal(dec, x)


def test_zero_crossings_and_rms_closed_form():
    # a square wave of period 8: 512 sign flips over 4096 samples - 1 edge
    x = np.where((np.arange(WAV_N) // 4) % 2 == 0, 1000, -1000).astype(np.int16)
    dec = _decode_wav(encode_wav(x))[0, 0, :, 0].astype(np.int64)
    neg = dec < 0
    assert int((neg[1:] != neg[:-1]).sum()) == WAV_N // 4 - 1
    assert int(np.sqrt((dec * dec).sum() / WAV_N) * 1000) == 1000 * 1000


def test_spectral_pure_tone_dominant_bin(spark):
    from ssb_sgis_spark.operators.multimodal import audio_spectral

    import pandas as pd
    from pyspark.sql import types as T

    n_fft = 512
    rows = []
    for mid, k in ((0, 3), (1, 17), (2, 100)):
        t = np.arange(WAV_N)
        x = (10000 * np.sin(2 * np.pi * k * t / n_fft)).astype(np.int16)
        rows.append((mid, bytearray(encode_wav(x))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["dominant_bin"] for r in audio_spectral(df).collect()}
    assert got == {0: 3, 1: 17, 2: 100}


def test_parseval_identity_on_frame():
    rng = np.random.RandomState(31)
    x = rng.randint(-2000, 2000, 512).astype(np.float64)
    X = np.fft.rfft(x)
    # rfft Parseval: sum|X|^2 counts interior bins twice
    e_freq = (np.abs(X[0]) ** 2 + 2 * (np.abs(X[1:-1]) ** 2).sum() + np.abs(X[-1]) ** 2) / 512
    assert abs(e_freq - (x * x).sum()) / (x * x).sum() < 1e-10
