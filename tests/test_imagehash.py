"""Perceptual image hash + banded Hamming near-dup (operators/imagehash)."""

import numpy as np
import pytest

from ssb_sgis_spark.operators.imagehash import (
    BMP_H,
    BMP_W,
    _hash_image,
    hamming_pairs,
    image_hashes,
    synth_bmp_variants,
)
from ssb_sgis_spark.operators.multimodal import _decode_png, encode_png


def _brute_pairs(rows, r):
    out = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            hd = bin(a[1] ^ b[1]).count("1") + bin(a[2] ^ b[2]).count("1")
            if hd <= r and a[0] != b[0]:
                ia, ib = sorted((a[0], b[0]))
                out.append((ia, ib, hd))
    return sorted(set(out))


def test_solid_image_hashes_zero():
    img = np.full((BMP_H, BMP_W, 3), 77, dtype=np.uint8)
    a0, a1, d0 = _hash_image(img)
    # every cell equals the mean -> strict > never fires; no gradient
    assert (a0, a1, d0) == (0, 0, 0)


def test_half_bright_known_bits():
    img = np.zeros((BMP_H, BMP_W, 3), dtype=np.uint8)
    img[:, BMP_W // 2 :, :] = 255  # right half bright
    a0, a1, d0 = _hash_image(img)
    bits = [(a0 >> c) & 1 for c in range(32)] + [(a1 >> c) & 1 for c in range(32)]
    # cells with cx >= 4 are bright -> above mean
    for cy in range(8):
        for cx in range(8):
            assert bits[cy * 8 + cx] == (1 if cx >= 4 else 0)
    # the only horizontal gradient transitions are bright-over-dark at cx 3->4?
    # dHash bit is cell(c) > cell(c+1): dark->bright is 0, bright->bright 0,
    # so the half-bright image has NO descending transition -> dhash == 0
    assert d0 == 0


def test_banded_join_equals_brute(spark):
    ids = spark.range(0, 96).withColumnRenamed("id", "doc_id")
    hashes = image_hashes(synth_bmp_variants(ids))
    rows = [(r.doc_id, r.ahash0, r.ahash1) for r in hashes.collect()]
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_pairs(image_hashes(synth_bmp_variants(ids)), r=3).collect()
    )
    assert got == _brute_pairs(rows, 3)
    assert len(got) > 0  # the variant law must actually produce near-dups


def test_radius_guard():
    with pytest.raises(ValueError):
        hamming_pairs(None, r=4)


def test_bucket_cap_drops_megabucket(spark):
    import pandas as pd

    # 40 solid images (hash 0 -> one mega bucket in every band) + variants
    pdf = pd.DataFrame({"doc_id": list(range(40))})
    solid = spark.createDataFrame(pdf).selectExpr("doc_id")
    from pyspark.sql import functions as F

    hashes = solid.select(
        "doc_id",
        F.lit(0).cast("long").alias("ahash0"),
        F.lit(0).cast("long").alias("ahash1"),
        F.lit(0).cast("long").alias("dhash0"),
    )
    assert hamming_pairs(hashes, r=1).count() == 40 * 39 // 2
    assert hamming_pairs(hashes, r=1, bucket_cap=10).count() == 0


def test_hash_is_codec_invariant(spark):
    # the SAME pixels through the PNG codec hash identically to BMP
    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    bmp_hashes = {
        r.doc_id: (r.ahash0, r.ahash1, r.dhash0)
        for r in image_hashes(synth_bmp_variants(ids)).collect()
    }
    import pandas as pd
    from pyspark.sql import types as T

    from ssb_sgis_spark.operators.imagehash import (
        N_PIX,
        PIX_A,
        PIX_B,
        VAR_CHANNELS,
        VAR_GROUP,
        VAR_SLOPE,
        VAR_SLOPE_MOD,
        VAR_STEP,
    )

    rows = []
    idx = np.arange(N_PIX * 3, dtype=np.int64)
    pert = (idx < VAR_CHANNELS).astype(np.int64)
    for d in range(8):
        b = d // VAR_GROUP
        v = (
            b * PIX_A
            + idx * (PIX_B + (b % VAR_SLOPE_MOD) * VAR_SLOPE)
            + (d % VAR_GROUP) * VAR_STEP * pert
        ) % 256
        rows.append(
            {
                "doc_id": d,
                "payload": encode_png(v.astype(np.uint8).reshape(BMP_H, BMP_W, 3)),
            }
        )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    png_df = spark.createDataFrame(pd.DataFrame(rows), schema=schema)
    png_hashes = {
        r.doc_id: (r.ahash0, r.ahash1, r.dhash0)
        for r in image_hashes(png_df, decode=_decode_png).collect()
    }
    assert png_hashes == bmp_hashes
