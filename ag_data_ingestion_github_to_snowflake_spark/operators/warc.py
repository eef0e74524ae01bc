"""WARC (ISO 28500 / WARC-1.1) record parsing — the Common Crawl path.

Web-scale LLM corpora arrive as WARC files: concatenated records, each
a version line + CRLF-separated named headers + Content-Length-framed
payload + CRLF CRLF terminator, usually with each record its own gzip
member. This module implements the container from the public spec:

- :func:`encode_warc` — spec-true fixture writer (warcinfo + response
  records, mandatory WARC-Record-ID/Date/Type headers, exact
  Content-Length framing, optional per-record gzip members);
- :func:`parse_warc` — strict record walk (version check, header
  parse, length framing, terminator check), transparent multi-member
  gzip via stdlib zlib;
- :func:`warc_records_df` — Arrow-batched mapInPandas explosion of a
  binary WARC column into one row per record (map-only, no shuffle).

At 100 TB the unit of parallelism is the WARC file (or gzip member
range): each executor task parses its own payloads independently —
exactly this kernel's shape. Corrupt records raise ValueError inside
:func:`parse_warc`; the kernel quarantines the whole payload as a
record with warc_type='error' (same contract as the media probes).

Parity target: the reference treats each API payload as an opaque
record with typed envelope metadata (/root/reference/src/
extract_github_data.py:101-143); WARC is the same envelope-and-payload
contract for crawl data.
"""

from __future__ import annotations

import zlib
from typing import Iterator

MAX_RECORD_BYTES = 1 << 30  # framing sanity: 1 GiB per record


def encode_warc(
    records: list[dict],
    gzip_members: bool = False,
) -> bytes:
    """Fixture writer: each dict needs ``uri``, ``payload`` (bytes),
    and optionally ``warc_type`` (default 'response'), ``content_type``
    and ``date``. Deterministic record ids derive from the index."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload: bytes = rec["payload"]
        headers = [
            ("WARC-Type", rec.get("warc_type", "response")),
            ("WARC-Record-ID", f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>"),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
            ("WARC-Target-URI", rec["uri"]),
            ("Content-Type", rec.get("content_type", "text/plain")),
            ("Content-Length", str(len(payload))),
        ]
        block = bytearray(b"WARC/1.1\r\n")
        for k, v in headers:
            block += f"{k}: {v}\r\n".encode("utf-8")
        block += b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(bytes(block)) + co.flush()
        else:
            out += block
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the Common Crawl layout).

    Decompression is chunked with an output cap (MAX_RECORD_BYTES per
    member) so a gzip bomb quarantines as ValueError instead of
    expanding unboundedly in executor memory — the same bomb class
    codecs._lzw_decompress and decode_flac cap explicitly."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        member_out = 0
        buf = data[pos:]
        while True:
            # max_length=0 means "unlimited" to zlib, so budget stays >= 1;
            # the overflow check below fires on the extra byte instead
            budget = MAX_RECORD_BYTES - member_out + 1
            chunk = d.decompress(buf, budget)
            out += chunk
            member_out += len(chunk)
            if member_out > MAX_RECORD_BYTES:
                raise ValueError("WARC: gzip member exceeds size cap")
            if d.eof or not d.unconsumed_tail:
                break
            buf = d.unconsumed_tail
        tail = d.flush()
        out += tail
        member_out += len(tail)
        if member_out > MAX_RECORD_BYTES:
            raise ValueError("WARC: gzip member exceeds size cap")
        if not d.eof:
            # zlib returns partial output silently on a truncated
            # stream; a member must reach its trailer to count
            raise ValueError("WARC: truncated gzip member")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC: gzip member did not advance")
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Strict WARC record walk; returns one dict per record with the
    parsed headers, payload bytes, and derived convenience fields."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except zlib.error as e:  # corrupt deflate stream -> quarantine
            raise ValueError(f"WARC: bad gzip member ({e})") from e
    records: list[dict] = []
    pos = 0
    while pos < len(data):
        nl = data.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("WARC: missing version line terminator")
        version = data[pos:nl]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line {version[:20]!r}")
        head_end = data.find(b"\r\n\r\n", nl)
        if head_end < 0:
            raise ValueError("WARC: unterminated header block")
        headers: dict[str, str] = {}
        for line in data[nl + 2 : head_end].split(b"\r\n"):
            key, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"WARC: malformed header line {line[:40]!r}")
            headers[key.strip().decode("utf-8")] = value.strip().decode("utf-8")
        try:
            length = int(headers["Content-Length"])
        except KeyError:
            raise ValueError("WARC: record missing Content-Length") from None
        if length < 0 or length > MAX_RECORD_BYTES:
            raise ValueError(f"WARC: Content-Length {length} outside sanity cap")
        body_start = head_end + 4
        body_end = body_start + length
        if data[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError("WARC: record not terminated by CRLF CRLF")
        records.append(
            {
                "warc_type": headers.get("WARC-Type", ""),
                "uri": headers.get("WARC-Target-URI"),
                "date": headers.get("WARC-Date"),
                "content_type": headers.get("Content-Type"),
                "length": length,
                "payload": data[body_start:body_end],
                "headers": headers,
            }
        )
        pos = body_end + 4
    return records


def warc_records_df(df, payload_col: str = "warc", id_col: str = "file_id"):
    """Explode binary WARC payloads into one row per record via
    mapInPandas. A corrupt payload yields ONE quarantine row
    (warc_type='error', parse_error set) instead of failing the task."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("record_no", T.LongType()),
            T.StructField("warc_type", T.StringType()),
            T.StructField("uri", T.StringType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("length", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("parse_error", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for n, rec in enumerate(parse_warc(bytes(payload))):
                        rows.append(
                            (fid, n, rec["warc_type"], rec["uri"],
                             rec["content_type"], rec["length"],
                             rec["payload"].decode("utf-8", "replace"), None)
                        )
                except ValueError as e:
                    rows.append((fid, None, "error", None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "record_no", "warc_type", "uri",
                         "content_type", "length", "text", "parse_error"],
            )

    return df.mapInPandas(kernel, schema=out_schema)
