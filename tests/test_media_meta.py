"""Container-metadata probe: header parsing pinned against the
generation parameters, corruption paths, and the distributed kernel.

The registry query `audio_container_meta` additionally gets the full
rows+schema+hash DuckDB parity check via tests/test_oracle_parity.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators import (
    codecs,
    flac,
    media_fixtures,
    media_meta as mm,
)


def test_mp3_frame_walk_exact_duration():
    data = mm.encode_mp3_frames(38, 128, 44100, 1)
    m = mm.probe_audio_meta(data)
    assert m["container"] == "mp3"
    assert m["n_units"] == 38
    assert m["duration_s"] == round(38 * 1152 / 44100, 6)
    assert m["sample_rate"] == 44100
    assert m["channels"] == 1
    assert m["bitrate"] == 128000
    assert m["bit_depth"] is None


def test_mp3_id3v2_tag_skipped():
    data = mm.encode_mp3_frames(25, 192, 32000, 2, id3=b"title bytes")
    assert data[:3] == b"ID3"
    m = mm.probe_audio_meta(data)
    assert (m["channels"], m["sample_rate"], m["n_units"]) == (2, 32000, 25)


def test_mp3_corruption_raises():
    data = mm.encode_mp3_frames(5, 128, 44100, 1)
    with pytest.raises(ValueError, match="truncated final frame"):
        mm.probe_mp3(data[:-10])
    with pytest.raises(ValueError, match="no frame sync"):
        mm.probe_mp3(b"\x00\x01\x02\x03garbage")
    # flip a byte inside a later header -> lost sync
    bad = bytearray(data)
    frame_len = 144 * 128000 // 44100
    bad[frame_len] = 0x00
    with pytest.raises(ValueError, match="lost frame sync"):
        mm.probe_mp3(bytes(bad))


def test_ogg_pages_and_ident_header():
    data = mm.encode_ogg_vorbis(44100, 2, 123456)
    m = mm.probe_audio_meta(data)
    assert m["container"] == "ogg"
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["duration_s"] == round(123456 / 44100, 6)
    assert m["n_units"] == 3  # BOS + audio + EOS pages
    assert m["bitrate"] == 112000


def test_ogg_crc_rejects_bitflip():
    data = bytearray(mm.encode_ogg_vorbis(16000, 1, 48000))
    data[40] ^= 0x01  # flip one payload bit on the first page
    with pytest.raises(ValueError, match="CRC mismatch"):
        mm.probe_ogg(bytes(data))


def test_ogg_crc_is_rfc3533_forward_crc32():
    # independent bit-by-bit computation of the table-driven CRC
    def crc_ref(data: bytes) -> int:
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
                crc &= 0xFFFFFFFF
        return crc

    for blob in (b"", b"OggS", bytes(range(200))):
        assert mm._ogg_crc(blob) == crc_ref(blob)


def test_wav_and_flac_probes_match_full_decoders():
    samples = np.full(4000, 16384, dtype=np.int16)
    w = codecs.encode_wav(samples, 8000)
    mw = mm.probe_audio_meta(w)
    decoded, rate, ch = codecs.decode_wav(w)
    assert (mw["sample_rate"], mw["channels"]) == (rate, ch)
    assert mw["duration_s"] == round(len(decoded) / rate, 6)
    assert mw["bit_depth"] == 16

    fb = flac.encode_flac(samples, 8000, block_size=1024)
    mf = mm.probe_audio_meta(fb)
    assert mf["container"] == "flac"
    assert (mf["sample_rate"], mf["channels"], mf["bit_depth"]) == (8000, 1, 16)
    assert mf["duration_s"] == 0.5
    # header-only: probe must not need more than STREAMINFO + headers
    streaminfo_prefix = fb[: 4 + 4 + 34 + 200]
    assert mm.probe_flac(streaminfo_prefix)["duration_s"] == 0.5


def test_expected_audio_meta_covers_all_fixture_rows():
    rows = media_fixtures.audio_meta_fixture_rows()
    expected = {r[0]: r for r in media_fixtures.expected_audio_meta()}
    assert {d for d, _ in rows} == set(expected)
    for doc_id, payload in rows:
        exp = expected[doc_id]
        if exp[1] == "error":
            with pytest.raises(ValueError):
                mm.probe_audio_meta(payload)
            continue
        m = mm.probe_audio_meta(payload)
        assert (
            m["container"], m["sample_rate"], m["channels"],
            m["bit_depth"], m["duration_s"], m["bitrate"],
        ) == exp[1:], doc_id


def test_probe_df_quarantines_corrupt_rows(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        media_fixtures.audio_meta_fixture_rows(), schema
    )
    out = {r["doc_id"]: r for r in mm.probe_audio_meta_df(df).collect()}
    assert out[24]["container"] == "error"
    assert out[24]["sample_rate"] is None
    assert "truncated" in out[24]["probe_error"]
    assert out[20]["container"] == "mp3"
    assert out[22]["duration_s"] == round(123456 / 44100, 6)
    assert out[14]["container"] == "flac"


def test_vorbis_comment_roundtrip_ogg_and_flac():
    tags = {"TITLE": "x y", "ARTIST": "a=b", "LANGUAGE": "de"}  # '=' in value
    ogg = mm.encode_ogg_vorbis(44100, 2, 1000, comments=tags)
    assert mm.probe_audio_tags(ogg) == tags
    fb = flac.encode_flac(np.full(1000, 5, dtype=np.int16), 8000, block_size=512)
    tagged = mm.add_flac_vorbis_comment(fb, tags)
    assert mm.probe_audio_tags(tagged) == tags
    # tag surgery must not break STREAMINFO probing OR full decode
    assert mm.probe_audio_meta(tagged)["duration_s"] == mm.probe_audio_meta(fb)["duration_s"]
    decoded, rate, ch = flac.decode_flac(tagged)
    assert (len(decoded), rate) == (1000, 8000)


def test_ogg_packet_reassembly_handles_255_chunking():
    # a comment long enough that its packet needs 255-byte lacing chains
    tags = {"TITLE": "t" * 700}
    ogg = mm.encode_ogg_vorbis(8000, 1, 500, comments=tags)
    assert mm.probe_audio_tags(ogg) == tags


def test_id3_text_frames_and_untagged_containers():
    mp3 = mm.encode_mp3_frames(3, 128, 44100, 1, id3=b"hello")
    assert mm.probe_audio_tags(mp3) == {"TITLE": "hello"}
    assert mm.probe_audio_tags(mm.encode_mp3_frames(3)) == {}
    assert mm.probe_audio_tags(codecs.encode_wav(np.zeros(10, dtype=np.int16), 8000)) == {}
    assert mm.probe_audio_tags(mm.encode_ogg_vorbis(8000, 1, 100)) == {}


def test_audio_tags_df_rows(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(media_fixtures.audio_tags_fixture_rows(), schema)
    got = {
        (r.doc_id, r.tag_key): r.tag_value
        for r in mm.probe_audio_tags_df(df).collect()
    }
    expected = {
        (d, k): v
        for d, _, tags in media_fixtures.TAG_FIXTURES
        for k, v in tags.items()
    }
    assert got == expected


def test_mp4_box_walk_and_dimensions():
    b = mm.encode_mp4_stub(12.345, video_wh=(640, 360), n_audio_tracks=1)
    m = mm.probe_mp4(b)
    assert m == {
        "container": "mp4", "brand": "isom", "duration_s": 12.345,
        "n_tracks": 2, "width": 640, "height": 360,
    }
    audio_only = mm.probe_mp4(
        mm.encode_mp4_stub(0.5, video_wh=None, n_audio_tracks=2)
    )
    assert audio_only["width"] is None and audio_only["n_tracks"] == 2


def test_mp4_corruption_raises():
    b = mm.encode_mp4_stub(1.0)
    with pytest.raises(ValueError, match="overruns|truncated"):
        mm.probe_mp4(b[:-5])
    with pytest.raises(ValueError, match="missing ftyp or moov"):
        mm.probe_mp4(b"\x00\x00\x00\x10abcd\x00\x00\x00\x00\x00\x00\x00\x00")
    bad = bytearray(b)
    bad[0] = 0xFF  # absurd first box size
    with pytest.raises(ValueError):
        mm.probe_mp4(bytes(bad))


def test_video_fixture_rows_match_expectations(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(media_fixtures.video_meta_fixture_rows(), schema)
    out = {r.doc_id: r for r in mm.probe_video_meta_df(df).collect()}
    assert out[40].duration_s == 12.345 and out[40].width == 640
    assert out[41].n_tracks == 1 and out[41].height == 1080
    assert out[42].container == "mp4" and out[42].width is None
    assert out[43].container == "error" and out[43].probe_error


def test_probes_never_leak_non_value_errors():
    """Deterministic fuzz: bit flips, truncations, and appends over
    every fixture family must either parse or raise ValueError — a
    struct.error/IndexError escaping a parser would fail the whole
    Spark task instead of quarantining the row."""
    import random

    rnd = random.Random(1234)
    seeds = [
        mm.encode_mp3_frames(5, 128, 44100, 1, id3=b"t"),
        mm.encode_ogg_vorbis(44100, 2, 1000, comments={"TITLE": "x"}),
        mm.encode_mp4_stub(1.5),
        flac.encode_flac(np.full(500, 3, dtype=np.int16), 8000, block_size=256),
        codecs.encode_wav(np.zeros(100, dtype=np.int16), 8000),
    ]
    for _ in range(2000):
        base = bytearray(rnd.choice(seeds))
        op = rnd.randrange(3)
        if op == 0 and base:
            for _ in range(rnd.randrange(1, 6)):
                base[rnd.randrange(len(base))] = rnd.randrange(256)
        elif op == 1:
            base = base[: rnd.randrange(len(base) + 1)]
        else:
            base = base + bytes(rnd.randrange(20))
        for fn in (mm.probe_audio_meta, mm.probe_audio_tags, mm.probe_mp4):
            try:
                fn(bytes(base))
            except ValueError:
                pass  # the quarantine contract


def test_zero_sample_rate_quarantines_not_crashes():
    """ADVICE r4: a header-supplied sample_rate of 0 must raise
    ValueError (quarantine), never ZeroDivisionError (task failure)."""
    import struct

    # WAV with sample_rate=0 in fmt
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError):
        mm.probe_wav(wav)
    with pytest.raises(ValueError):
        codecs.audio_features(wav)

    # FLAC STREAMINFO with 20-bit sample_rate field zeroed
    good = flac.encode_flac(np.zeros(64, dtype=np.int16), 8000, block_size=64)
    bad = bytearray(good)
    # STREAMINFO payload starts at offset 8 (4 magic + 4 block header);
    # bytes 10..12 of the payload hold sample_rate(20)|channels(3)|bps(5)-ish bits
    bits = int.from_bytes(bad[8 + 10 : 8 + 18], "big")
    bits &= ~(0xFFFFF << 44)  # zero the sample_rate field
    bad[8 + 10 : 8 + 18] = bits.to_bytes(8, "big")
    with pytest.raises(ValueError):
        mm.probe_flac(bytes(bad))

    # OGG identification header with sample_rate=0
    ogg = bytearray(mm.encode_ogg_vorbis(44100, 2, 1000))
    idx = ogg.find(b"\x01vorbis")
    assert idx > 0
    struct.pack_into("<I", ogg, idx + 12, 0)
    # page CRC now stale -> either bad-CRC ValueError or zero-rate ValueError
    with pytest.raises(ValueError):
        mm.probe_ogg(bytes(ogg))
