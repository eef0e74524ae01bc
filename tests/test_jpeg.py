"""Baseline JPEG codec contracts (operators/jpeg.py).

The encoder exists to produce test/fixture payloads, so the tests pin
the DECODER against constructions whose exact output is known:
all-ones quantization makes flat images round-trip exactly, anything
else lands within the quantization error bound.
"""

from __future__ import annotations

import numpy as np
import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators import codecs, jpeg


def test_zigzag_matches_independent_diagonal_walk():
    # Re-derive the zigzag scan from first principles: diagonals d=r+c
    # ascending; odd diagonals walk top-right -> bottom-left, even ones
    # bottom-left -> top-right (JPEG spec figure A.6).
    order = []
    for d in range(15):
        cells = [(r, d - r) for r in range(max(0, d - 7), min(7, d) + 1)]
        if d % 2 == 0:
            cells.reverse()  # even: start at (d, 0) side, move up-right
        order.extend(r * 8 + c for r, c in cells)
    assert jpeg.ZIGZAG.tolist() == order


def test_flat_images_roundtrip_exactly():
    for v, sub in (((200, 40, 90), False), ((7, 7, 7), True), ((255, 255, 255), False)):
        img = np.full((16, 24, 3), v, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsample=sub))
        assert np.array_equal(out, img), (v, sub)


def test_gray_images_roundtrip_within_one():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(17, 21), dtype=np.uint8)
    img = np.stack([g, g, g], axis=2)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_color_images_roundtrip_within_quant_bound():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    # q=1 4:4:4: +/-0.5 per coefficient, amplified <= ~2x by the
    # YCbCr->RGB inverse
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_lossy_quant_still_close_on_smooth_image():
    x = np.linspace(0, 200, 40)
    img = np.stack([np.tile(x, (32, 1))] * 3, axis=2).astype(np.uint8)
    q = np.full(64, 16.0)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=q))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 16


def test_subsampled_dims_not_multiple_of_16():
    img = np.full((19, 13, 3), [120, 60, 30], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsample=True))
    assert out.shape == (19, 13, 3)
    assert np.array_equal(out, img)  # flat survives edge padding exactly


def test_decode_image_dispatch_and_features():
    img = np.full((8, 8, 3), [10, 200, 30], dtype=np.uint8)
    data = jpeg.encode_jpeg(img)
    assert data[:3] == b"\xff\xd8\xff"
    assert np.array_equal(codecs.decode_image(data), img)
    w, h, luma = codecs.image_features(data)
    assert (w, h) == (8, 8)
    assert luma == round((299 * 10 + 587 * 200 + 114 * 30) / 255000.0, 6)


def test_unsupported_jpeg_variants_raise():
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    data = bytearray(jpeg.encode_jpeg(img))
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_byte_stuffing_survives():
    # hunt a payload whose entropy stream contains stuffed FF00 bytes
    rng = np.random.default_rng(5)
    found = False
    for _ in range(40):
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        data = jpeg.encode_jpeg(img)
        scan = data[data.find(b"\xff\xda") + 14 : -2]
        if b"\xff\x00" in scan:
            found = True
            out = jpeg.decode_jpeg(data)
            assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3
    assert found, "no stuffed byte ever produced; weak test inputs"
