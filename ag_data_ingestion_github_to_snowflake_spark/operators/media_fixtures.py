"""Deterministic multimodal fixtures for the real-decode path.

Seventeen payloads — 24-bit BMPs, binary P6 PPMs, zlib-compressed PNGs,
LZW-compressed GIFs, baseline JPEGs, PCM16 WAVs, Rice-coded FLACs — whose
features are analytically computable from the generation parameters
with exact integer arithmetic. ``expected_features()`` derives the
expected (width, height, mean_luma) / (duration, rate, rms) straight
from the source arrays, NOT by running the decoders, so the registry
query ``multimodal_decode_real`` checks the full encode → Spark →
mapInPandas → decode → feature path against an independent computation.
(The asymmetric-byte-layout details — BGR order, bottom-up rows, row
padding, RIFF chunk walk — are pinned separately by golden byte tests
in tests/test_codecs.py.)
"""

from __future__ import annotations

import numpy as np

from ag_data_ingestion_github_to_snowflake_spark.operators import codecs, flac, jpeg

LUMA_W = (299, 587, 114)  # integer Rec.601, /1000


def _ramp_image(w: int, h: int, scales: tuple[int, int, int]) -> np.ndarray:
    """Linear horizontal ramp; channel c at column x is ``scales[c] * x``."""
    x = np.arange(w, dtype=np.int64)
    img = np.stack([np.tile(s * x, (h, 1)) for s in scales], axis=2)
    if img.max() > 255:
        raise ValueError("ramp overflows uint8")
    return img.astype(np.uint8)


def _images() -> list[tuple[int, str, np.ndarray]]:
    gray_ramp = np.tile((np.arange(17, dtype=np.int64) * 255 // 16), (5, 1))
    return [
        (0, "bmp", np.full((3, 5, 3), [255, 0, 0], dtype=np.uint8)),
        (1, "bmp", np.full((4, 7, 3), 255, dtype=np.uint8)),
        (2, "bmp", np.stack([gray_ramp] * 3, axis=2).astype(np.uint8)),
        (3, "ppm", np.full((4, 4, 3), [10, 20, 30], dtype=np.uint8)),
        (4, "ppm", _ramp_image(8, 2, (10, 5, 2))),
        # PNG (compressed; stdlib-zlib decoder, operators/codecs.py):
        # one flat color (filter-0 writer path) and one ramp that the
        # writer encodes with the Paeth filter, so the decode query
        # exercises real defiltering, not just inflate.
        (8, "png", np.full((5, 6, 3), [0, 128, 255], dtype=np.uint8)),
        (9, "png", _ramp_image(9, 3, (7, 11, 13))),
        # GIF (LZW; operators/codecs.py): one flat color (2-entry
        # palette, immediate cScSc codes) and one 12-color ramp whose
        # code stream grows past the initial LZW width.
        (10, "gif", np.full((6, 4, 3), [200, 40, 90], dtype=np.uint8)),
        (11, "gif", _ramp_image(12, 4, (3, 5, 7))),
        # JPEG (baseline SOF0, operators/jpeg.py): FLAT images only —
        # with all-ones quantization a flat block is a single exactly-
        # quantized DC coefficient, so the decode is pixel-exact and
        # the analytic luma oracle stays valid (ramps would be lossy).
        # One 4:4:4 and one 4:2:0 (flat chroma survives subsampling).
        (12, "jpg", np.full((10, 9, 3), [60, 180, 20], dtype=np.uint8)),
        (13, "jpg444", np.full((7, 11, 3), [240, 10, 130], dtype=np.uint8)),
    ]


def _audios() -> list[tuple[int, str, np.ndarray, int]]:
    square = np.tile(np.array([8192, -8192], dtype=np.int16), 8000)
    # FLAC fixtures (operators/flac.py): a constant tone (CONSTANT
    # subframes), a sawtooth whose fixed-predictor residuals exercise
    # real Rice coding across multiple frames, and a mid/side stereo
    # pair (decorrelated side channel at bps+1). All are lossless, so
    # the analytic oracle from the source arrays stays exact.
    saw = (((np.arange(6000, dtype=np.int64) * 37) % 4096 - 2048) * 8).astype(
        np.int16
    )
    stereo = np.stack([saw[:3000], (saw[:3000] // 3).astype(np.int16)], axis=1)
    return [
        (5, "wav", np.full(4000, 16384, dtype=np.int16), 8000),
        (6, "wav", square, 16000),
        (7, "wav", np.zeros(2205, dtype=np.int16), 22050),
        (14, "flac", np.full(4410, 12288, dtype=np.int16), 44100),
        (15, "flac", saw, 16000),
        (16, "flac_ms", stereo, 22050),
    ]


def media_fixture_rows() -> list[tuple[int, str, bytes]]:
    """(doc_id, modality, payload) rows for the decode query."""
    rows: list[tuple[int, str, bytes]] = []
    encoders = {
        "bmp": codecs.encode_bmp,
        "ppm": codecs.encode_ppm,
        "png": lambda im: codecs.encode_png(im, filter_type=4),
        "gif": codecs.encode_gif,
        "jpg": lambda im: jpeg.encode_jpeg(im, subsample=True),
        "jpg444": jpeg.encode_jpeg,
    }
    audio_encoders = {
        "wav": lambda s, r: codecs.encode_wav(s, r),
        "flac": lambda s, r: flac.encode_flac(s, r, block_size=2048),
        "flac_ms": lambda s, r: flac.encode_flac(
            s, r, block_size=1024, mid_side=True
        ),
    }
    for doc_id, fmt, img in _images():
        rows.append((doc_id, "image", encoders[fmt](img)))
    for doc_id, fmt, samples, rate in _audios():
        rows.append((doc_id, "audio", audio_encoders[fmt](samples, rate)))
    return rows


def expected_features() -> list[tuple[int, str, float, float, float]]:
    """(doc_id, modality, feat_a, feat_b, feat_c) computed from source
    arrays with exact integer sums (images: width/height/mean_luma;
    audio: duration/sample_rate/rms)."""
    out: list[tuple[int, str, float, float, float]] = []
    for doc_id, _, img in _images():
        h, w, _ = img.shape
        px = img.astype(object)  # exact Python-int arithmetic
        luma_sum = sum(
            int(px[:, :, c].sum()) * LUMA_W[c] for c in range(3)
        )
        luma = round(luma_sum / (h * w * 255000.0), 6)
        out.append((doc_id, "image", float(w), float(h), luma))
    for doc_id, _, samples, rate in _audios():
        n_frames = samples.shape[0]
        flat = samples.reshape(-1)
        duration = round(n_frames / float(rate), 6)
        sq_sum = sum(int(s) ** 2 for s in flat.tolist())
        rms = (
            round(float(np.sqrt(sq_sum / len(flat))) / 32768.0, 6)
            if len(flat)
            else 0.0
        )
        out.append((doc_id, "audio", duration, float(rate), rms))
    return out


def audio_meta_fixture_rows() -> list[tuple[int, bytes]]:
    """(doc_id, payload) rows for the container-metadata probe query:
    the WAV/FLAC fixtures above plus spec-true MP3 frame streams and
    Ogg/Vorbis pages (operators/media_meta.py writers), and one
    deliberately corrupt payload for the quarantine path."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import media_meta

    rows: list[tuple[int, bytes]] = []
    audio_encoders = {
        "wav": lambda s, r: codecs.encode_wav(s, r),
        "flac": lambda s, r: flac.encode_flac(s, r, block_size=2048),
        "flac_ms": lambda s, r: flac.encode_flac(
            s, r, block_size=1024, mid_side=True
        ),
    }
    for doc_id, fmt, samples, rate in _audios():
        rows.append((doc_id, audio_encoders[fmt](samples, rate)))
    rows.append((20, media_meta.encode_mp3_frames(38, 128, 44100, 1)))
    rows.append(
        (21, media_meta.encode_mp3_frames(25, 192, 32000, 2, id3=b"fixture"))
    )
    rows.append((22, media_meta.encode_ogg_vorbis(44100, 2, 123456)))
    rows.append(
        (23, media_meta.encode_ogg_vorbis(16000, 1, 48000, nominal_bitrate=64000))
    )
    # corrupt: MP3 stream with the final frame truncated -> quarantined
    rows.append((24, media_meta.encode_mp3_frames(5, 128, 44100, 1)[:-10]))
    return rows


TAG_FIXTURES: list[tuple[int, str, dict[str, str]]] = [
    (30, "ogg", {"TITLE": "sea shanty", "ARTIST": "ag graft", "LANGUAGE": "en"}),
    (31, "flac", {"TITLE": "const tone", "GENRE": "calibration"}),
    (32, "mp3", {"TITLE": "frame walk"}),
    (33, "ogg", {}),   # untagged: no comment packet at all
    (34, "wav", {}),   # container without a tag concept
]


def audio_tags_fixture_rows() -> list[tuple[int, bytes]]:
    """(doc_id, payload) rows for the tag-extraction query: Vorbis
    comments in Ogg pages, a VORBIS_COMMENT block injected into a real
    FLAC stream, an ID3v2.3 TIT2 frame, and untagged controls."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import media_meta

    tone = np.full(2205, 8192, dtype=np.int16)
    rows = []
    for doc_id, kind, tags in TAG_FIXTURES:
        if kind == "ogg":
            payload = media_meta.encode_ogg_vorbis(
                22050, 1, 22050, comments=tags if tags else None
            )
        elif kind == "flac":
            payload = media_meta.add_flac_vorbis_comment(
                flac.encode_flac(tone, 22050, block_size=1024), tags
            )
        elif kind == "mp3":
            payload = media_meta.encode_mp3_frames(
                4, 128, 44100, 1, id3=tags["TITLE"].encode()
            )
        else:
            payload = codecs.encode_wav(tone, 22050)
        rows.append((doc_id, payload))
    return rows


def expected_audio_tags_sql() -> str:
    """DuckDB VALUES oracle: one (doc_id, tag_key, tag_value) row per
    tag, straight from TAG_FIXTURES — untagged rows contribute none."""
    rows = ",\n      ".join(
        f"(CAST({d} AS BIGINT), '{k}', '{v}')"
        for d, _, tags in TAG_FIXTURES
        for k, v in tags.items()
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + "\n    ) AS t(doc_id, tag_key, tag_value) ORDER BY doc_id, tag_key"
    )


def expected_audio_meta() -> list[tuple]:
    """(doc_id, container, sample_rate, channels, bit_depth,
    duration_s, bitrate) derived from the generation parameters —
    NOT by running the probes."""
    out: list[tuple] = []
    for doc_id, fmt, samples, rate in _audios():
        n = samples.shape[0]
        ch = samples.shape[1] if samples.ndim == 2 else 1
        container = "wav" if fmt == "wav" else "flac"
        out.append(
            (doc_id, container, rate, ch, 16, round(n / rate, 6), rate * ch * 16)
        )
    out.append((20, "mp3", 44100, 1, None, round(38 * 1152 / 44100, 6), 128000))
    out.append((21, "mp3", 32000, 2, None, round(25 * 1152 / 32000, 6), 192000))
    out.append((22, "ogg", 44100, 2, None, round(123456 / 44100, 6), 112000))
    out.append((23, "ogg", 16000, 1, None, round(48000 / 16000, 6), 64000))
    out.append((24, "error", None, None, None, None, None))
    return out


def expected_audio_meta_sql() -> str:
    """DuckDB VALUES oracle for the container-metadata expectations."""

    def lit(v, typ):
        return f"CAST({'NULL' if v is None else repr(v)} AS {typ})"

    rows = ",\n      ".join(
        f"(CAST({d} AS BIGINT), '{c}', {lit(sr, 'BIGINT')}, "
        f"{lit(ch, 'BIGINT')}, {lit(bd, 'BIGINT')}, "
        f"{lit(dur, 'DOUBLE')}, {lit(br, 'BIGINT')})"
        for d, c, sr, ch, bd, dur, br in expected_audio_meta()
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + "\n    ) AS t(doc_id, container, sample_rate, channels, bit_depth,"
        " duration_s, bitrate) ORDER BY doc_id"
    )


def expected_features_sql() -> str:
    """DuckDB VALUES oracle over the analytic expectations."""
    rows = ",\n      ".join(
        f"(CAST({d} AS BIGINT), '{m}', CAST({a!r} AS DOUBLE), "
        f"CAST({b!r} AS DOUBLE), CAST({c!r} AS DOUBLE))"
        for d, m, a, b, c in expected_features()
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + "\n    ) AS t(doc_id, modality, feat_a, feat_b, feat_c) ORDER BY doc_id"
    )


VIDEO_FIXTURES: list[tuple[int, dict]] = [
    (40, {"duration_s": 12.345, "video_wh": (640, 360), "n_audio_tracks": 1}),
    (41, {"duration_s": 3.0, "video_wh": (1920, 1080), "n_audio_tracks": 0,
          "timescale": 600}),
    (42, {"duration_s": 0.5, "video_wh": None, "n_audio_tracks": 2}),  # audio-only
    (43, None),  # corrupt: truncated inside moov
]


def video_meta_fixture_rows() -> list[tuple[int, bytes]]:
    """(doc_id, payload) ISO-BMFF rows for the video probe query."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import media_meta

    rows = []
    for doc_id, params in VIDEO_FIXTURES:
        if params is None:
            good = media_meta.encode_mp4_stub(1.0)
            rows.append((doc_id, good[: len(good) - 300]))
        else:
            rows.append((doc_id, media_meta.encode_mp4_stub(**params)))
    return rows


def expected_video_meta_sql() -> str:
    """DuckDB VALUES oracle from the generation parameters."""

    def lit(v, typ):
        return f"CAST({'NULL' if v is None else repr(v)} AS {typ})"

    parts = []
    for doc_id, params in VIDEO_FIXTURES:
        if params is None:
            parts.append(
                f"(CAST({doc_id} AS BIGINT), 'error', CAST(NULL AS VARCHAR),"
                " CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),"
                " CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))"
            )
            continue
        wh = params.get("video_wh", (640, 360))
        n_tracks = (1 if wh else 0) + params.get("n_audio_tracks", 0)
        w, h = wh if wh else (None, None)
        parts.append(
            f"(CAST({doc_id} AS BIGINT), 'mp4', 'isom',"
            f" {lit(params['duration_s'], 'DOUBLE')},"
            f" CAST({n_tracks} AS BIGINT), {lit(w, 'BIGINT')},"
            f" {lit(h, 'BIGINT')})"
        )
    return (
        "SELECT * FROM (VALUES\n      "
        + ",\n      ".join(parts)
        + "\n    ) AS t(doc_id, container, brand, duration_s, n_tracks,"
        " width, height) ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# aHash near-dup fixtures: block-constant images with analytic hashes
# ---------------------------------------------------------------------------
def _ahash_matrices() -> list[tuple[int, str, list[list[int]]]]:
    """(doc_id, fmt, 8x8 gray matrix). Images are the matrices blown up
    2x2 per cell (block-constant), so the decoder-side 8x8 block-mean
    IS the matrix and the expected hash follows from the matrix alone.

    Perturbations are SWAPS of two cells, which keep the global sum
    unchanged — so only the swapped cells' threshold bits can flip and
    the analytic Hamming distances are by construction:
      20 base A | 21 = A with one low/high swap (hamming 2, near-dup)
      22 = A with two swaps (hamming 4 vs A: excluded at threshold 3)
      23 unrelated pattern | 24 = 23 exactly (hamming 0, exact dup)
    """
    base = [[((r * 8 + c) * 3) % 200 for c in range(8)] for r in range(8)]
    a1 = [row[:] for row in base]
    a1[0][0], a1[7][7] = a1[7][7], a1[0][0]  # low <-> high: 2 bits flip
    a2 = [row[:] for row in a1]
    a2[0][1], a2[7][6] = a2[7][6], a2[0][1]  # second swap: 2 more bits
    other = [[(255 - 7 * ((r + c * 8) % 30)) % 256 for c in range(8)] for r in range(8)]
    return [
        (20, "bmp", base),
        (21, "png", a1),
        (22, "bmp", a2),
        (23, "png", other),
        (24, "bmp", other),
    ]


def ahash_fixture_rows() -> list[tuple[int, bytes]]:
    rows = []
    for doc_id, fmt, mat in _ahash_matrices():
        img = np.kron(np.array(mat, dtype=np.uint8), np.ones((2, 2), np.uint8))
        rgb = np.stack([img] * 3, axis=2)
        enc = codecs.encode_bmp if fmt == "bmp" else codecs.encode_png
        rows.append((doc_id, enc(rgb)))
    return rows


def expected_ahash(mat: list[list[int]]) -> int:
    """Analytic aHash from the 8x8 matrix (gray => luma = v * 1000;
    equal block sizes => bit = 64*v > sum(v)), signed like the kernel."""
    flat = [v for row in mat for v in row]
    total = sum(flat)
    out = 0
    for i, v in enumerate(flat):
        if v * 64 > total:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def expected_ahash_pairs(max_hamming: int = 3) -> list[tuple[int, int, int]]:
    """All fixture pairs at Hamming <= max_hamming, computed from the
    matrices (never from the decoder or the Spark pipeline)."""
    hashes = [(d, expected_ahash(m)) for d, _, m in _ahash_matrices()]
    out = []
    for i, (da, ha) in enumerate(hashes):
        for db, hb in hashes[i + 1 :]:
            ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                out.append((min(da, db), max(da, db), ham))
    return sorted(out)


def expected_ahash_pairs_sql() -> str:
    rows = ",\n      ".join(
        f"(CAST({a} AS BIGINT), CAST({b} AS BIGINT), CAST({h} AS INT))"
        for a, b, h in expected_ahash_pairs()
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + "\n    ) AS t(id_a, id_b, hamming)"
    )
