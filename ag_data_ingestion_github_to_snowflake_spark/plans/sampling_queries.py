"""Deterministic content-hash sampling: the reproducible sample /
train-test-split / stratified-draw primitives of a training-data
pipeline.

``df.sample()`` / ``TABLESAMPLE`` draw from an RNG whose stream depends
on partitioning — rerun the job with different parallelism and the
sample changes, and no external engine can reproduce it. Hash-gating
(`first byte of sha256(key) < threshold`) fixes all of that: the draw
is a pure row-local function of the key, identical on every engine,
every run, every partition layout, and composable (the 80% train split
of a 10% sample is stable under both). This is how production corpus
pipelines pin their held-out sets.

All three queries are map-only until their final small aggregation —
no extra shuffle, no RNG state; the hash byte extraction reuses the
engine-parity trick proven by the multimodal fake-decode oracle
(``plans/llm_ops.py``): Spark ``conv(substring(sha2(x,256),1,2),16,10)``
== DuckDB ``CAST('0x'||substr(sha256(x),1,2) AS INT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t


def hash_bucket(col, modulus: int = 256):
    """Deterministic [0, modulus) bucket from the first sha256 byte."""
    byte = F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 2), 16, 10).cast(
        "int"
    )
    return byte % modulus if modulus != 256 else byte


@register(
    "sample_documents_hash",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 26
    """,
    survey_ids=("B6", "B9"),
    description="Deterministic ~10% sample gated on a content-hash byte",
)
def sample_documents_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible ~10% document sample (hash byte < 26/256).

    Map-only: the gate evaluates per row at the scan, needs no RNG
    state and survives any repartitioning — the property that makes a
    sample auditable months later.
    """
    return (
        t(spark, sf, "documents")
        .filter(hash_bucket(F.col("doc_id")) < 26)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "train_test_split_counts",
    oracle="""
    SELECT lang,
           CASE WHEN CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 204
                THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_chars_total
    FROM documents
    GROUP BY 1, 2
    """,
    survey_ids=("B16", "B19"),
    description="Deterministic 80/20 train-test split, audited per language",
)
def train_test_split_counts(spark: SparkSession, sf: str) -> DataFrame:
    """80/20 train/test assignment from the same hash gate, audited as
    per-(lang, split) document and character counts.

    A document's split is a function of its id alone, so adding new
    documents never reshuffles existing assignments (the leakage
    failure mode of fractional re-sampling); the audit aggregation is
    the query's only shuffle.
    """
    docs = t(spark, sf, "documents").withColumn(
        "split",
        F.when(hash_bucket(F.col("doc_id")) < 204, "train").otherwise("test"),
    )
    return docs.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("n_chars_total"),
    )


@register(
    "stratified_sample_by_lang",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
          < CASE WHEN lang = 'en' THEN 128 ELSE 32 END
    """,
    survey_ids=("B6", "B19"),
    description="Stratified deterministic sample: 50% of 'en', 12.5% of other languages",
)
def stratified_sample_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Per-stratum rates on one hash draw (en 50%, others 12.5%) — the
    deterministic analog of ``sampleBy``, used to rebalance language
    mix when assembling a corpus.

    Still map-only: the stratum only moves the threshold, so a row's
    draw never depends on other rows, and raising a stratum's rate
    keeps every previously sampled row (nested samples).
    """
    threshold = F.when(F.col("lang") == "en", 128).otherwise(32)
    return (
        t(spark, sf, "documents")
        .filter(hash_bucket(F.col("doc_id")) < threshold)
        .select("doc_id", "lang")
    )


@register(
    "kfold_assign_documents",
    oracle="""
    SELECT CAST(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) % 5
             AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_chars_total,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    GROUP BY 1
    """,
    survey_ids=("B16", "B43"),
    description="Deterministic 5-fold cross-validation assignment, audited per fold",
)
def kfold_assign_documents(spark: SparkSession, sf: str) -> DataFrame:
    """5-fold CV assignment from the content-hash byte: fold(doc) =
    sha_byte(doc_id) mod 5, audited as per-fold doc/char counts.

    Same stability property as the 80/20 split — a document's fold is
    a pure function of its id, so folds never reshuffle as the corpus
    grows, and any engine reproduces the identical assignment. One
    5-key aggregation; the assignment itself is map-side.
    """
    docs = t(spark, sf, "documents").withColumn(
        "fold", (hash_bucket(F.col("doc_id")) % 5).cast("long")
    )
    return docs.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("n_chars_total"),
        F.min("doc_id").alias("min_doc_id"),
    )
