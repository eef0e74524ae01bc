"""Golden byte-level tests for the pure-numpy media codecs.

The golden payloads are hand-assembled from the public format specs
(not via the encoders), so an encode/decode bug pair that cancels in
round-trip testing cannot hide here: BGR byte order, bottom-up rows,
4-byte row padding (BMP); header token/comment handling (PPM); RIFF
chunk walking and word alignment (WAV).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators import codecs


def _golden_bmp_2x2() -> bytes:
    """2x2 24-bit BMP: top row [red, green], bottom row [blue, white]."""
    # bottom-up rows, BGR, stride 8 (6 data + 2 pad)
    pixel = bytes(
        [255, 0, 0] + [255, 255, 255] + [0, 0]  # bottom: blue, white
        + [0, 0, 255] + [0, 255, 0] + [0, 0]  # top: red, green
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel), 0, 0, 0, 0)
    return header + dib + pixel


def test_decode_bmp_golden_bytes():
    img = codecs.decode_bmp(_golden_bmp_2x2())
    expected = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(img, expected)


def test_decode_bmp_top_down():
    data = bytearray(_golden_bmp_2x2())
    struct.pack_into("<i", data, 22, -2)  # negative height => top-down
    img = codecs.decode_bmp(bytes(data))
    # file rows now read top-first: [blue, white] then [red, green]
    expected = np.array(
        [[[0, 0, 255], [255, 255, 255]], [[255, 0, 0], [0, 255, 0]]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(img, expected)


def test_decode_ppm_golden_with_comment():
    data = b"P6\n# test comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    img = codecs.decode_ppm(data)
    np.testing.assert_array_equal(
        img, np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    )


def _golden_wav() -> bytes:
    samples = struct.pack("<4h", 1000, -1000, 2000, -2000)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_golden_bytes():
    pcm, rate, channels = codecs.decode_wav(_golden_wav())
    assert rate == 8000 and channels == 1
    np.testing.assert_array_equal(pcm, np.array([1000, -1000, 2000, -2000], dtype=np.int16))


def test_decode_wav_skips_extra_chunk():
    """Chunk walker must skip unknown (odd-sized, word-aligned) chunks."""
    samples = struct.pack("<2h", 32767, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = b"WAVE" + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    body += b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    pcm, rate, _ = codecs.decode_wav(data)
    assert rate == 16000
    np.testing.assert_array_equal(pcm, np.array([32767, -32768], dtype=np.int16))


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 4), (17, 9)])
def test_bmp_roundtrip_padding_widths(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, size=400, dtype=np.int16)
    out, rate, channels = codecs.decode_wav(codecs.encode_wav(pcm, 44100, channels=2))
    assert (rate, channels) == (44100, 2)
    np.testing.assert_array_equal(out, pcm)


def test_image_features_exact_solid_color():
    img = np.full((3, 5, 3), [255, 0, 0], dtype=np.uint8)
    w, h, luma = codecs.image_features(codecs.encode_bmp(img))
    assert (w, h) == (5, 3)
    assert luma == pytest.approx(0.299, abs=0)  # exactly 299*255/255000


def test_audio_features_exact_constant():
    duration, rate, rms = codecs.audio_features(
        codecs.encode_wav(np.full(4000, 16384, dtype=np.int16), 8000)
    )
    assert duration == 0.5 and rate == 8000 and rms == 0.5


def test_compressed_magic_raises():
    # JPEG now routes to the real baseline decoder (operators/jpeg.py):
    # a truncated payload is a ValueError from the parser, not a
    # NotImplementedError from magic detection.
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 20)
    with pytest.raises(NotImplementedError, match="MP3"):
        codecs.audio_features(b"ID3" + b"\x00" * 20)
    with pytest.raises(ValueError, match="magic"):
        codecs.decode_image(b"????????")


def test_unsupported_bmp_depth_raises():
    data = bytearray(codecs.encode_bmp(np.zeros((1, 1, 3), dtype=np.uint8)))
    struct.pack_into("<H", data, 28, 8)  # claim 8-bit
    with pytest.raises(NotImplementedError, match="24-bit"):
        codecs.decode_bmp(bytes(data))


# ---------------------------------------------------------------------------
# PNG (stdlib zlib decode)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    rng = np.random.default_rng(7 + filter_type)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(img, filter_type)) == img).all()


def test_png_golden_bytes():
    """1x2 RGB PNG, filter 0, hand-assembled: pins signature, chunk
    layout, CRC check, and inflate path against fixed bytes."""
    import struct as st
    import zlib

    raw = b"\x00" + bytes([255, 0, 0, 0, 128, 255])  # one row: red, then (0,128,255)
    ihdr = st.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)

    def chunk(t, b):
        return st.pack(">I", len(b)) + t + b + st.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = codecs.decode_png(data)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 128, 255]
    # corrupt the IDAT CRC -> must be detected
    bad = bytearray(data)
    bad[-13] ^= 0xFF  # inside IDAT CRC (IEND is last 12 bytes)
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad))


def test_png_gray_and_rgba_and_palette():
    import struct as st
    import zlib

    def chunk(t, b):
        return st.pack(">I", len(b)) + t + b + st.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    g = np.array([[0, 100], [200, 255]], dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    png = sig + chunk(b"IHDR", st.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    assert (codecs.decode_png(png) == np.repeat(g[:, :, None], 3, axis=2)).all()

    rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    png = sig + chunk(b"IHDR", st.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    assert (codecs.decode_png(png) == rgba[:, :, :3]).all()

    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = sig + chunk(b"IHDR", st.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)) + chunk(b"PLTE", pal.tobytes()) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    assert (codecs.decode_png(png) == pal[idx]).all()


def test_png_unsupported_variants_raise():
    import struct as st
    import zlib

    def chunk(t, b):
        return st.pack(">I", len(b)) + t + b + st.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    png16 = sig + chunk(b"IHDR", st.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)) + chunk(b"IDAT", zlib.compress(b"\x00" * 7)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        codecs.decode_png(png16)
    adam7 = sig + chunk(b"IHDR", st.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)) + chunk(b"IDAT", zlib.compress(b"\x00" * 4)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlaced"):
        codecs.decode_png(adam7)


def test_png_through_decode_image_dispatch():
    img = np.full((2, 3, 3), [1, 2, 3], dtype=np.uint8)
    assert (codecs.decode_image(codecs.encode_png(img)) == img).all()


# ---------------------------------------------------------------------------
# GIF (from-scratch LZW)
# ---------------------------------------------------------------------------


def _golden_gif_2x1() -> bytes:
    """Hand-assembled 2x1 GIF89a: palette [black, white], pixels [0, 1].

    LZW by hand: mcs=2 -> clear=4, eoi=5, 3-bit codes. Stream is
    [clear=4, 0, 1, eoi=5]; LSB-first bit order 100 000 100 101 packs
    to bytes 0x44, 0x0A.
    """
    return (
        b"GIF89a"
        + b"\x02\x00\x01\x00"  # logical screen 2x1
        + b"\x80\x00\x00"      # GCT present, 2 entries; bg 0; aspect 0
        + b"\x00\x00\x00\xff\xff\xff"  # palette: black, white
        + b"\x2c\x00\x00\x00\x00\x02\x00\x01\x00\x00"  # image descriptor
        + b"\x02"              # LZW min code size
        + b"\x02\x44\x0a"      # one 2-byte data sub-block
        + b"\x00\x3b"          # block terminator + trailer
    )


def test_decode_gif_golden_bytes():
    img = codecs.decode_gif(_golden_gif_2x1())
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [0, 0, 0]
    assert img[0, 1].tolist() == [255, 255, 255]


def test_gif_roundtrip_images():
    rng = np.random.default_rng(7)
    # few-color image (dict stays small) and a 200-color image large
    # enough to force LZW code-width growth past 9 bits
    few = rng.integers(0, 4, size=(13, 17, 3), dtype=np.uint8) * 80
    palette = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, size=(40, 60))
    many = palette[idx]
    for img in (few, many, np.full((3, 3, 3), 7, dtype=np.uint8)):
        out = codecs.decode_gif(codecs.encode_gif(img))
        assert np.array_equal(out, img)


def test_gif_roundtrip_through_dispatch_and_features():
    img = np.full((4, 5, 3), [10, 200, 30], dtype=np.uint8)
    data = codecs.encode_gif(img)
    assert data[:6] == b"GIF89a"
    assert np.array_equal(codecs.decode_image(data), img)
    w, h, luma = codecs.image_features(data)
    assert (w, h) == (5, 4)
    assert luma == round((299 * 10 + 587 * 200 + 114 * 30) / 255000.0, 6)


def test_gif_skips_extension_blocks():
    golden = _golden_gif_2x1()
    # splice a graphic-control extension between the GCT and the image
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = golden[:19] + gce + golden[19:]
    img = codecs.decode_gif(spliced)
    assert img[0, 1].tolist() == [255, 255, 255]


def test_gif_unsupported_variants_raise():
    golden = bytearray(_golden_gif_2x1())
    interlaced = bytearray(golden)
    interlaced[27] = 0x40  # image-descriptor packed byte: interlace flag
    with pytest.raises(NotImplementedError):
        codecs.decode_gif(bytes(interlaced))
    local = bytearray(golden)
    local[27] = 0x80  # local color table flag
    with pytest.raises(NotImplementedError):
        codecs.decode_gif(bytes(local))
    i = np.arange(300, dtype=np.int64)
    too_many = np.stack([i % 256, i // 256, np.full(300, 7)], axis=1)
    too_many = too_many.reshape(30, 10, 3).astype(np.uint8)  # 300 colors
    with pytest.raises(ValueError):
        codecs.encode_gif(too_many)


def test_gif_lzw_cscsc_case():
    # 'aaaa...' runs hit the code==next_code branch immediately
    img = np.zeros((1, 50, 3), dtype=np.uint8)
    img[0, 0] = [255, 255, 255]
    assert np.array_equal(codecs.decode_gif(codecs.encode_gif(img)), img)


def test_header_bombs_rejected_before_allocation():
    """Corrupt headers that DECLARE absurd sizes must raise ValueError
    before any allocation: JPEG SOF0 can claim 65535^2 (12 GB RGB),
    a GIF LZW minimum-code-size byte can claim a 2^255-entry table,
    and a crafted LZW stream expands quadratically. Found by fuzzing;
    these are the executor-OOM paths in a quarantine pipeline."""
    import struct as _struct

    import pytest

    from ag_data_ingestion_github_to_snowflake_spark.operators import jpeg

    # JPEG: valid stream with SOF0 dimensions rewritten to 65535x65535
    img = np.full((6, 5, 3), 99, dtype=np.uint8)
    data = bytearray(jpeg.encode_jpeg(img))
    i = bytes(data).find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) height(2) width(2)
    data[i + 5 : i + 9] = _struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="safety cap"):
        jpeg.decode_jpeg(bytes(data))

    # GIF: LZW minimum code size byte out of the 2-8 spec range
    gif = bytearray(codecs.encode_gif(img))
    # min-code-size byte sits right after the image descriptor
    idesc = bytes(gif).find(b"\x2c")
    gif[idesc + 10] = 200
    with pytest.raises(ValueError, match="minimum code size"):
        codecs.decode_gif(bytes(gif))

    # BMP: 1-gigapixel declared dimensions
    bmp = bytearray(codecs.encode_bmp(img))
    bmp[18:26] = _struct.pack("<ii", 40000, 30000)
    with pytest.raises(ValueError, match="safety cap"):
        codecs.decode_bmp(bytes(bmp))

    # PPM: same, via header text
    with pytest.raises(ValueError, match="safety cap"):
        codecs.decode_ppm(b"P6\n99999 99999\n255\n\x00")


def test_decoder_fuzz_only_value_errors():
    """Bit flips / truncations / appends over every format must either
    decode or raise ValueError / NotImplementedError — struct.error,
    IndexError, KeyError or giant allocations would take down a whole
    executor task instead of quarantining one row."""
    import random

    from ag_data_ingestion_github_to_snowflake_spark.operators import flac, jpeg

    rnd = random.Random(7)
    img = np.full((6, 5, 3), 99, dtype=np.uint8)
    seeds = [
        codecs.encode_bmp(img),
        codecs.encode_ppm(img),
        codecs.encode_png(img, filter_type=4),
        codecs.encode_gif(img),
        jpeg.encode_jpeg(img),
        codecs.encode_wav(np.zeros(50, dtype=np.int16), 8000),
        flac.encode_flac(np.full(300, 3, dtype=np.int16), 8000, block_size=256),
    ]
    for _ in range(1500):
        base = bytearray(rnd.choice(seeds))
        op = rnd.randrange(3)
        if op == 0 and base:
            for _ in range(rnd.randrange(1, 6)):
                base[rnd.randrange(len(base))] = rnd.randrange(256)
        elif op == 1:
            base = base[: rnd.randrange(len(base) + 1)]
        else:
            base = base + bytes(rnd.randrange(20))
        for fn in (codecs.image_features, codecs.audio_features):
            try:
                fn(bytes(base))
            except (ValueError, NotImplementedError):
                pass


def test_ahash64_exact_and_guarded():
    """aHash: analytic equality on block-constant images, sub-8x8
    rejection, and Hamming stability under the signed-long cast."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import (
        media_fixtures as mf,
    )

    mats = {d: m for d, _, m in mf._ahash_matrices()}
    for d, payload in mf.ahash_fixture_rows():
        assert codecs.ahash64(payload) == mf.expected_ahash(mats[d])
    # image smaller than 8x8 quarantines as ValueError
    tiny = codecs.encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        codecs.ahash64(tiny)
    # a hash with bit 63 set must come back signed (Spark LongType)
    top = [[255 if r >= 6 else 0 for _ in range(8)] for r in range(8)]
    assert mf.expected_ahash(top) < 0
