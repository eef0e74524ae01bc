"""Image resize kernel: golden nearest-neighbor picks + round-trip."""

from __future__ import annotations

import numpy as np

from ag_data_ingestion_github_to_snowflake_spark.operators import codecs
from ag_data_ingestion_github_to_snowflake_spark.operators.multimodal import (
    resize_images,
)


def _img4x4() -> np.ndarray:
    """4x4 RGB with a unique value per pixel (value = 16*r + c)."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    for r in range(4):
        for c in range(4):
            img[r, c] = 16 * r + c
    return img


def test_nearest_neighbor_picks_block_centers(spark):
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_ppm(_img4x4())))],
        "doc_id long, payload binary",
    )
    out = resize_images(df, target_w=2, target_h=2).collect()[0]
    assert (out.width, out.height) == (2, 2)
    resized = codecs.decode_image(bytes(out.payload))
    # half-pixel centers of a 2x downscale pick source rows/cols 1 and 3
    expect = _img4x4()[np.ix_([1, 3], [1, 3])]
    assert np.array_equal(resized, expect)
    assert out.mean_luma == round(float(expect.mean()) / 255.0, 6)


def test_upscale_replicates_pixels(spark):
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0], img[0, 1], img[1, 0], img[1, 1] = 10, 20, 30, 40
    df = spark.createDataFrame(
        [(7, bytearray(codecs.encode_ppm(img)))], "doc_id long, payload binary"
    )
    out = resize_images(df, target_w=4, target_h=4).collect()[0]
    resized = codecs.decode_image(bytes(out.payload))
    assert resized.shape == (4, 4, 3)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(resized[:2, :2], np.full((2, 2, 3), 10, np.uint8))
    assert np.array_equal(resized[2:, 2:], np.full((2, 2, 3), 40, np.uint8))


def test_resize_handles_bmp_inputs_too(spark):
    img = _img4x4()
    df = spark.createDataFrame(
        [(3, bytearray(codecs.encode_bmp(img)))], "doc_id long, payload binary"
    )
    out = resize_images(df, target_w=2, target_h=2).collect()[0]
    resized = codecs.decode_image(bytes(out.payload))
    assert np.array_equal(resized, img[np.ix_([1, 3], [1, 3])])
