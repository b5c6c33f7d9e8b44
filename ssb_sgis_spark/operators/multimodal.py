"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payloads with typed metadata columns — the
lakehouse convention for multimodal training data.  The Spark-side
plumbing (schemas, batching, partitioning, UDF signatures, frame
slicing, block-mean resize) is REAL and tested; only the codec is
stubbed: this container has no image/audio libraries, so ``DECODERS``
maps format → either a deterministic fake (raw uint8 buffers reshaped
per metadata) or ``NotImplementedError`` for real formats (jpeg/png/
mp3/...), clearly marked for the day a codec wheel is present.

All kernels are ``mapInPandas`` over Arrow batches: payload bytes →
numpy (zero-copy frombuffer) → vectorized feature math — the identical
batch shape a PIL/ffmpeg-backed decoder would use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = (
    "media_id long, kind string, fmt string, width int, height int, "
    "channels int, n_frames int, payload binary"
)


def _decode_raw(payload: bytes, width: int, height: int, channels: int, n_frames: int) -> np.ndarray:
    """The deterministic 'fake' codec: payload IS the pixel buffer
    (uint8, frame-major).  Returns (n_frames, height, width, channels)."""
    a = np.frombuffer(payload, dtype=np.uint8)
    return a.reshape(n_frames, height, width, channels)


def _decode_stub(fmt: str):
    raise NotImplementedError(
        f"codec for {fmt!r} requires an image/audio library not present in "
        "this environment; register one in DECODERS"
    )


DECODERS = {
    "raw": _decode_raw,
    # real formats intentionally stubbed:
    "jpeg": None,
    "png": None,
    "wav": None,
    "mp4": None,
}


def decode_batch(pdf: pd.DataFrame) -> list[np.ndarray]:
    out = []
    for _, r in pdf.iterrows():
        dec = DECODERS.get(r["fmt"])
        if dec is None:
            _decode_stub(r["fmt"])
        out.append(
            dec(bytes(r["payload"]), r["width"], r["height"], r["channels"], r["n_frames"])
        )
    return out


def synth_media_df(spark: SparkSession, n: int = 64, seed: int = 11) -> DataFrame:
    """Deterministic fake media table (fmt='raw'): LCG bytes per id."""
    rows = []
    for i in range(n):
        w, h, c = 16 + (i % 3) * 8, 16 + (i % 2) * 8, 3
        frames = 1 if i % 4 else 4
        rng = np.random.RandomState(seed + i)
        payload = rng.randint(0, 256, size=frames * h * w * c, dtype=np.int64).astype(
            np.uint8
        )
        rows.append(
            (
                i,
                "video" if frames > 1 else "image",
                "raw",
                w,
                h,
                c,
                frames,
                bytearray(payload.tobytes()),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_features(df: DataFrame) -> DataFrame:
    """Per-media channel statistics (the 'feature extraction' stage):
    (media_id, mean_x1000 per channel, std_x1000 overall) — integers for
    stable comparison."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mean_r_x1000", T.LongType()),
            T.StructField("mean_g_x1000", T.LongType()),
            T.StructField("mean_b_x1000", T.LongType()),
            T.StructField("std_x1000", T.LongType()),
        ]
    )

    def kernel(it):
        for pdf in it:
            arrs = decode_batch(pdf)
            rows = {k.name: [] for k in schema.fields}
            for mid, a in zip(pdf["media_id"], arrs):
                rows["media_id"].append(int(mid))
                m = a.reshape(-1, a.shape[-1]).mean(axis=0)
                rows["mean_r_x1000"].append(int(m[0] * 1000))
                rows["mean_g_x1000"].append(int(m[1] * 1000))
                rows["mean_b_x1000"].append(int(m[2] * 1000))
                rows["std_x1000"].append(int(a.std() * 1000))
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema=schema)


def resize_block_mean(df: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downsample each frame by ``factor`` — real resize math
    on the decoded array; output payload is again fmt='raw'."""
    schema = df.schema

    def kernel(it):
        for pdf in it:
            arrs = decode_batch(pdf)
            out = pdf.copy()
            payloads, ws, hs = [], [], []
            for a in arrs:
                f, h, w, c = a.shape
                h2, w2 = (h // factor) * factor, (w // factor) * factor
                a = a[:, :h2, :w2, :]
                small = (
                    a.reshape(f, h2 // factor, factor, w2 // factor, factor, c)
                    .mean(axis=(2, 4))
                    .astype(np.uint8)
                )
                payloads.append(small.tobytes())
                hs.append(small.shape[1])
                ws.append(small.shape[2])
            out["payload"] = payloads
            out["width"] = ws
            out["height"] = hs
            yield out

    return df.mapInPandas(kernel, schema=schema)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Keep every ``every_n``-th frame of video payloads (frame-sampling
    stage; images pass through)."""
    schema = df.schema

    def kernel(it):
        for pdf in it:
            arrs = decode_batch(pdf)
            out = pdf.copy()
            payloads, nf = [], []
            for a in arrs:
                s = a[::every_n]
                payloads.append(s.tobytes())
                nf.append(s.shape[0])
            out["payload"] = payloads
            out["n_frames"] = nf
            yield out

    return df.mapInPandas(kernel, schema=schema)
