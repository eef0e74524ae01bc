"""Multimodal column support: opaque binary payloads + typed metadata.

Design (north-star "multimodal columns", BASELINE.json): media rides in
a DataFrame as an opaque ``binary`` column plus a typed metadata struct
(modality, byte size, dims, sample rate...). All *decode* work — image
decode/resize, audio feature extraction, video frame sampling — runs as
Arrow-batched pandas functions over ``mapInPandas``: the engine moves
binary blobs in columnar Arrow batches and Python touches them only
inside the batch loop.

The image/audio codec libraries are not available in this container, so
the decode kernels are STUBS: ``decode_image``/``extract_audio_features``
raise NotImplementedError unless ``deterministic_fake=True``, which
produces a seeded, content-derived fake (stable across runs) so the
Spark-side plumbing — schema, batching, partitioning — is real and
tested end-to-end.

Scale notes: binary payloads dominate row size; ``mapInPandas`` with a
bounded ``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps batch
memory flat, and repartitioning by a size-aware key prevents executor
OOM on skewed media sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mime", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def pack_media(
    df: DataFrame,
    payload_col: str,
    modality: str,
    mime: str,
    out: str = "media",
) -> DataFrame:
    """Pack a binary payload column + metadata struct into one column.

    ``payload_col`` must already be BinaryType (e.g. F.encode for text,
    or raw bytes read from files via ``spark.read.format('binaryFile')``).
    """
    return df.withColumn(
        out,
        F.struct(
            F.col(payload_col).alias("payload"),
            F.struct(
                F.lit(modality).alias("modality"),
                F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
                F.lit(mime).alias("mime"),
            ).alias("meta"),
        ),
    )


def _fake_image_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic content-derived fake decode (no codec libs here)."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mean_luma = round(digest[2] / 255.0, 6)
    return width, height, mean_luma


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image decode + feature extraction via mapInPandas.

    Real implementation would open each payload with PIL/OpenCV and
    emit (width, height, mean_luma). Those libs are absent here: with
    ``deterministic_fake`` the kernel derives stable pseudo-features
    from a sha256 of the payload; otherwise it raises
    NotImplementedError. The Spark plumbing (Arrow batches, schema,
    partition preservation) is identical either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "pass deterministic_fake=True for the test path"
                )
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, luma = _fake_image_features(bytes(payload))
                rows.append((int(did), w, h, luma))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mean_luma"])

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms_energy", T.DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Audio feature extraction via mapInPandas (stubbed codecs).

    Real implementation would decode with soundfile/librosa and emit
    (duration, sample_rate, rms). With ``deterministic_fake`` the
    features derive from a sha256 of the payload — stable, testable
    plumbing without audio libraries.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio codecs unavailable in this environment; "
                    "pass deterministic_fake=True for the test path"
                )
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                digest = hashlib.sha256(data).digest()
                duration = round(len(data) / 16000.0, 6)
                sample_rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
                rms = round(digest[1] / 255.0, 6)
                rows.append((int(did), duration, sample_rate, rms))
            yield pd.DataFrame(
                rows, columns=["doc_id", "duration_s", "sample_rate", "rms_energy"]
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    Stubbed like decode_image_features; the fake derives a frame count
    from payload length and emits every ``every_n``-th frame index.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video codecs unavailable; pass deterministic_fake=True"
                )
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                n_frames = max(1, len(data) // 16)
                for idx in range(0, n_frames, every_n):
                    hsh = hashlib.sha256(data + idx.to_bytes(4, "big")).hexdigest()[:16]
                    rows.append((int(did), idx, hsh))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_hash"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
