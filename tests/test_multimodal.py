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

    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "fmt": ["jpeg"],
            "payload": [b"\xff\xd8"],
            "width": [1],
            "height": [1],
            "channels": [3],
            "n_frames": [1],
        }
    )
    with pytest.raises(NotImplementedError):
        decode_batch(pdf)
