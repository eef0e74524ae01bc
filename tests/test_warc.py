"""WARC container: spec framing, gzip members, corruption, kernel.

The registry query `warc_extract_records` adds the full rows+schema+
hash DuckDB parity check via tests/test_oracle_parity.py.
"""

from __future__ import annotations

import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators import warc

RECS = [
    {"uri": "https://example.com/a", "payload": b"hello world",
     "content_type": "text/html"},
    {"uri": "https://example.com/b", "payload": "unicode é中".encode(),
     "warc_type": "resource"},
    {"uri": "https://example.com/info", "payload": b"", "warc_type": "warcinfo"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_gzip_members(gz):
    parsed = warc.parse_warc(warc.encode_warc(RECS, gzip_members=gz))
    assert [r["uri"] for r in parsed] == [r["uri"] for r in RECS]
    assert parsed[0]["payload"] == b"hello world"
    assert parsed[1]["warc_type"] == "resource"
    assert parsed[1]["payload"].decode() == "unicode é中"
    assert parsed[2]["length"] == 0
    assert parsed[0]["headers"]["Content-Type"] == "text/html"


def test_content_length_framing_beats_embedded_separators():
    # a payload that CONTAINS a version line + blank lines must not
    # confuse the walk — framing is Content-Length, not scanning
    tricky = [{"uri": "u", "payload": b"a\r\n\r\nWARC/1.1\r\n\r\nb"}]
    parsed = warc.parse_warc(warc.encode_warc(tricky))
    assert parsed[0]["payload"] == b"a\r\n\r\nWARC/1.1\r\n\r\nb"


def test_corruption_raises_value_error():
    data = warc.encode_warc(RECS)
    with pytest.raises(ValueError, match="not terminated"):
        warc.parse_warc(data[:-4])
    with pytest.raises(ValueError, match="bad version line"):
        warc.parse_warc(b"XARC" + data[4:])
    # drop the Content-Length header of the first record
    broken = data.replace(b"Content-Length: 11\r\n", b"", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(broken)
    with pytest.raises(ValueError, match="sanity cap"):
        warc.parse_warc(
            data.replace(b"Content-Length: 11\r\n",
                         b"Content-Length: 99999999999\r\n", 1)
        )


def test_kernel_explodes_and_quarantines(spark):
    from pyspark.sql import types as T

    good = warc.encode_warc(RECS, gzip_members=True)
    bad = good[:-6]  # truncated mid-terminator inside the gzip tail
    schema = T.StructType(
        [
            T.StructField("file_id", T.LongType()),
            T.StructField("warc", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(0, good), (1, bad)], schema)
    rows = warc.warc_records_df(df).collect()
    by_file: dict[int, list] = {}
    for r in rows:
        by_file.setdefault(r.file_id, []).append(r)
    assert len(by_file[0]) == 3
    assert by_file[0][0].text == "hello world"
    assert by_file[1][0].warc_type == "error"
    assert by_file[1][0].parse_error


def test_gzip_bomb_member_quarantines_before_expansion(monkeypatch):
    """ADVICE r4: a small gzip member that inflates past the record cap
    must raise ValueError during chunked decompression, not expand
    unboundedly in executor memory."""
    import zlib

    # Shrink the cap so the test is cheap: 64 KiB
    monkeypatch.setattr(warc, "MAX_RECORD_BYTES", 1 << 16)
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    bomb = co.compress(b"\x00" * (1 << 22)) + co.flush()  # 4 MiB of zeros
    assert len(bomb) < (1 << 14)  # it is actually small on the wire
    with pytest.raises(ValueError, match="size cap"):
        warc._gunzip_members(bomb)


def test_gunzip_members_chunked_path_roundtrips(monkeypatch):
    """Members legitimately larger than one decompress() budget chunk
    still decompress exactly when under the cap."""
    import zlib

    monkeypatch.setattr(warc, "MAX_RECORD_BYTES", 1 << 20)
    payload = bytes(range(256)) * 2048  # 512 KiB, under the 1 MiB cap
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    gz = co.compress(payload) + co.flush()
    assert warc._gunzip_members(gz) == payload
