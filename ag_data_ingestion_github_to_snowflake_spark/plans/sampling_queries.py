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

from ag_data_ingestion_github_to_snowflake_spark.operators.portable_math import (
    portable_ln_sql,
)
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


@register(
    "mixture_sample_counts",
    oracle="""
    WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total,
                   CAST(COUNT(*) AS BIGINT) AS k FROM n),
    rates AS (
      SELECT source, n_s,
             LEAST(CAST(1.0 AS DOUBLE),
                   (CAST(0.4 AS DOUBLE) * n_total / k) / n_s) AS rate
      FROM n, tot
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE CAST(('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INT)
            < r.rate * 256.0
      GROUP BY d.source
    )
    SELECT r.source, r.n_s,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           ROUND(r.rate, 6) AS rate
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    """,
    survey_ids=("B16", "B11", "B19"),
    description="Equal-domain-mix downsampling: data-driven per-source rates on one hash draw",
)
def mixture_sample_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture rebalancing: draw ~40% of the corpus with every
    source equally represented (budget/k docs per source, capped at a
    source's full size) — the "flatten the domain mix" step of corpus
    assembly (GPT-3/Pile-style mixture reweighting, deterministic).

    Scale shape: the per-source counts are a k-row aggregate (map-side
    partial), broadcast back onto the scan; the accept gate is then a
    row-local hash threshold — no second shuffle over the corpus, rerun-
    and repartition-stable.
    """
    docs = t(spark, sf, "documents")
    n = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    tot = n.agg(
        F.sum("n_s").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    rates = n.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.least(
            F.lit(1.0),
            (F.lit(0.4) * F.col("n_total") / F.col("k")) / F.col("n_s"),
        ).alias("rate"),
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(hash_bucket(F.col("doc_id")) < F.col("rate") * F.lit(256.0))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_s",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


@register(
    "pack_sequences_bins",
    oracle="""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) % 8 AS shard
      FROM documents
    ),
    binned AS (
      SELECT shard, doc_id, n_chars,
             CAST(FLOOR(
               CAST(COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
                 PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               / 50000.0) AS BIGINT) AS bin
      FROM sharded
    )
    SELECT shard, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM binned
    GROUP BY shard, bin
    """,
    survey_ids=("B31", "B16", "B43"),
    description="Sequence packing: shard-local cumulative char-budget bins (50k chars)",
)
def pack_sequences_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Training-batch packing: assign documents to ~50k-char bins by
    running cumulative size, computed independently inside 8
    deterministic hash shards — the distributed form of greedy
    sequence packing (a single global ordered cumsum would serialize
    on one task; shard-local packing is how it runs at 100 TB, with
    the shard count scaled to the cluster).

    One shuffle (repartition by shard for the window), then map-side
    aggregation of the bin audit.
    """
    from pyspark.sql.window import Window

    docs = t(spark, sf, "documents").select(
        "doc_id",
        "n_chars",
        (hash_bucket(F.col("doc_id")) % 8).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = docs.withColumn(
        "bin",
        F.floor(
            F.coalesce(
                F.sum(F.col("n_chars").cast("bigint")).over(w), F.lit(0)
            ).cast("double")
            / F.lit(50000.0)
        ).cast("bigint"),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("chars_total"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement, deterministic (Efraimidis-
# Spirakis A-ES): key_i = ln(u_i)/w_i with u_i a hash-derived uniform,
# take the k largest keys. Char-weighted draws favor long documents —
# the "sample by token budget, not doc count" primitive of corpus
# assembly. The 32-bit uniform comes from the first 8 sha256 hex chars
# (same engine-parity trick as hash_bucket, 4 bytes instead of 1); the
# ln() and division are IEEE doubles on byte-identical inputs both
# sides. The selected SET is ulp-robust (keys of distinct docs differ
# by many orders of magnitude more than 1 ulp); the float key itself is
# excluded from the output so the hash compare sees integers/strings
# only.
# ---------------------------------------------------------------------------
@register(
    "weighted_sample_docs",
    # Hardened r12 (item 5): the A-ES key's ln is the portable
    # sqrt-reduction ln, so the ranked doubles are bit-identical on
    # any engine/libm build (not merely "ulp-robust").
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    ORDER BY {portable_ln_sql(
        "(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS BIGINT) + 0.5) / 4294967296.0", "duckdb")}
             / n_chars DESC,
             doc_id
    LIMIT 25
    """,
    survey_ids=("B24", "B43", "B6"),
    description="Deterministic char-weighted sample w/o replacement (A-ES top-k)",
)
def weighted_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Draw 25 documents with probability proportional to length,
    without replacement, reproducibly (no RNG state).

    A-ES (Efraimidis-Spirakis 2006): item i gets key u_i^(1/w_i); the
    k largest keys ARE a weight-proportional sample without
    replacement. Maximizing u^(1/w) == maximizing ln(u)/w (ln u < 0),
    so the key needs one log and one divide per row — map-side — and
    the draw is a global top-k (Spark TakeOrdered: per-partition heaps,
    no full sort, no single-task shuffle). Rerun-, partition- and
    engine-stable because u_i is minted from sha256(doc_id).
    """
    docs = t(spark, sf, "documents")
    key = F.expr(
        portable_ln_sql(
            "(CAST(conv(substring(sha2(CAST(doc_id AS STRING), 256), 1, 8),"
            " 16, 10) AS DOUBLE) + 0.5) / 4294967296.0",
            "spark",
        )
        + " / n_chars"
    )
    return (
        docs.orderBy(key.desc(), F.col("doc_id"))
        .select("doc_id", "lang", "source", "n_chars")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (alpha = 0.5): per-source accept
# rate proportional to 1/sqrt(n_s), normalized so the SMALLEST source
# keeps everything — the standard low-resource up-weighting used by
# multilingual corpora (mT5/XLM-R style p^alpha re-weighting), applied
# as a deterministic hash gate. alpha = 0.5 keeps the whole pipeline
# bit-exact across engines: sqrt is correctly rounded by IEEE 754 (a
# REQUIRED operation, unlike pow/exp), so rate and the floor'd integer
# threshold are identical in Spark and DuckDB with zero tolerance.
# ---------------------------------------------------------------------------
@register(
    "temperature_mixture_sample",
    oracle="""
    WITH n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
               FROM documents GROUP BY source),
    mn AS (SELECT MIN(n_s) AS n_min FROM n),
    rates AS (
      SELECT source, n_s,
             CAST(FLOOR(256.0 * sqrt(CAST(n_min AS DOUBLE))
                        / sqrt(CAST(n_s AS DOUBLE))) AS INT) AS thr
      FROM n, mn
    ),
    kept AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE CAST(('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR)), 1, 2))
                 AS INT) < r.thr
      GROUP BY d.source
    )
    SELECT r.source, r.n_s, r.thr,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates r LEFT JOIN kept k ON k.source = r.source
    ORDER BY r.source
    """,
    survey_ids=("B16", "B11", "B19"),
    description="Temperature (alpha=0.5) mixture re-weighting via exact-parity hash gates",
)
def temperature_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Flatten the source mix with temperature alpha = 0.5: source s
    keeps a fraction proportional to 1/sqrt(n_s) (kept mass then grows
    as sqrt(n_s) — big sources down-weighted, small ones kept whole).

    Scale shape mirrors ``mixture_sample_counts``: a source-count
    aggregate (k rows) broadcast back onto the scan, then a row-local
    integer hash gate — one corpus pass, one tiny shuffle. The
    threshold is floor'd to an INTEGER byte bound so the accept
    decision is exact (no float boundary), and sqrt keeps cross-engine
    bit parity (IEEE-correctly-rounded, unlike pow).
    """
    docs = t(spark, sf, "documents")
    n = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    mn = n.agg(F.min("n_s").alias("n_min"))
    rates = n.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_s",
        F.floor(
            F.lit(256.0)
            * F.sqrt(F.col("n_min").cast("double"))
            / F.sqrt(F.col("n_s").cast("double"))
        )
        .cast("int")
        .alias("thr"),
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(hash_bucket(F.col("doc_id")) < F.col("thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_s",
            "thr",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Fixed-k per-stratum draw: exactly min(k, n_s) docs from EVERY source,
# chosen by hash rank — the "balanced eval slice" primitive (rate-based
# stratified_sample_by_lang keeps proportions; this one pins counts).
# Deterministic twin of per-group reservoir sampling: rank by a
# content-hash key and keep the k smallest, so membership is stable
# under reruns, repartitioning, and engine choice.
# ---------------------------------------------------------------------------
@register(
    "stratified_topk_sample",
    oracle="""
    SELECT source, doc_id, lang
    FROM (
      SELECT source, doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY substr(sha256(CAST(doc_id AS VARCHAR)), 1, 16), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= 5
    ORDER BY source, doc_id
    """,
    survey_ids=("B32", "B29", "B6"),
    description="Exactly-k-per-source deterministic draw (hash-ranked reservoir twin)",
)
def stratified_topk_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly 5 documents per source, hash-ranked: the balanced
    audit/eval slice every corpus pipeline cuts.

    One hash-partitioned window per stratum (no global sort); the rank
    key is the first 16 sha256 hex chars of the id — an order both
    engines compute bit-identically as a STRING compare, with doc_id
    as total-order tiebreak. Per-group top-k via window filter lets
    Catalyst push the rank limit into the sort (WindowGroupLimit), so
    each stratum keeps a 5-row heap rather than sorting its partition.
    """
    from pyspark.sql.window import Window

    docs = t(spark, sf, "documents")
    key = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 16)
    w = Window.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "lang")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Reproducible epoch shuffle: seeded hash order -> shard + intra-shard
# position. The training-data counterpart of ORDER BY random(): every
# engine, run, and partition layout produces the SAME permutation, and
# changing the seed string re-shuffles. No global sort — one hash
# partition per shard and a partition-local sort, which is how a
# 100 TB corpus gets a fresh epoch order without a terabyte range
# exchange (shard files are then read sequentially by the trainer).
# ---------------------------------------------------------------------------
@register(
    "training_shuffle_shards",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             sha256('42:' || CAST(doc_id AS VARCHAR)) AS skey,
             CAST(('0x' || substr(sha256('42:' || CAST(doc_id AS VARCHAR)), 1, 2))
                  AS INT) % 8 AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id)
                AS BIGINT) AS shard_pos
    FROM keyed
    """,
    survey_ids=("B24", "B29", "B6"),
    description="Seeded deterministic epoch shuffle: shard + intra-shard position",
)
def training_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-epoch shuffle. The permutation key is
    sha256(seed ':' doc_id): uniformly mixing, seed-swappable per
    epoch, and engine-reproducible (vs ``ORDER BY rand()``, whose
    stream depends on partitioning and cannot be replayed). The first
    key byte picks one of 8 shards; ``row_number`` over (shard, key)
    gives the intra-shard read order.

    Plan shape: map-side hashing, ONE shuffle on the 8 shard keys,
    partition-local sort — no global range exchange. At real scale
    shard count = number of trainer data-loader workers (hundreds),
    so each window partition stays bounded and the sort spills at
    most one shard, not the corpus.
    """
    from pyspark.sql.window import Window

    docs = t(spark, sf, "documents").select("doc_id")
    skey = F.sha2(F.concat(F.lit("42:"), F.col("doc_id").cast("string")), 256)
    keyed = docs.select(
        "doc_id",
        skey.alias("skey"),
        (F.conv(F.substring(skey, 1, 2), 16, 10).cast("int") % 8).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
    )


# ---------------------------------------------------------------------------
# Weighted reservoir top-k (Efraimidis-Spirakis A-Res keys)
# ---------------------------------------------------------------------------
@register(
    "weighted_reservoir_topk",
    # Hash contract (hardened r12, item 5): the A-Res key ln(u)/w uses
    # the portable ln over the deterministic u (first 8 sha256 hex
    # chars over 2^32), so the ranked doubles are bit-identical on any
    # engine/libm build; the emitted key is floor(1e9*k) (keys are
    # small negatives, so 1e-9 grains keep ~5 significant digits).
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             {portable_ln_sql(
                 "(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))"
                 " AS BIGINT) + 1.0) / 4294967297.0", "duckdb")}
               / n_chars AS ares_key
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_chars,
           CAST(floor(1000000000.0 * ares_key) AS BIGINT) AS ares_key_e9
    FROM keyed
    ORDER BY ares_key DESC, doc_id
    LIMIT 25
    """,
    survey_ids=("B24", "B43", "B6"),
    description="Weighted sampling without replacement: top-25 by Efraimidis-Spirakis key",
)
def weighted_reservoir_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted random sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each record draws key u^(1/w) — equivalently
    ln(u)/w — from a deterministic uniform u, and the k largest keys
    are the sample. Unlike weighted_sample_docs (with-replacement
    expectation), this yields exactly-k distinct docs with inclusion
    probability proportional to weight (n_chars), and because the keys
    are a simple column expression the 'reservoir' is just a
    distributed top-k: map-side per-partition heads, one tiny shuffle.

    Scale shape: fully map-side key computation (sha256 + ln in
    codegen), then TakeOrderedAndProject — no global sort, no
    data-scale shuffle. The hash-derived u makes the draw reproducible
    across engines and runs (the same audit-over-randomness convention
    as the other sampling queries).
    """
    d = t(spark, sf, "documents").filter(F.col("n_chars") > 0)
    key = F.expr(
        portable_ln_sql(
            "(CAST(conv(substring(sha2(CAST(doc_id AS STRING), 256), 1, 8),"
            " 16, 10) AS BIGINT) + 1.0) / 4294967297.0",
            "spark",
        )
        + " / n_chars"
    )
    keyed = d.select("doc_id", "lang", "n_chars", key.alias("ares_key"))
    return (
        keyed.orderBy(F.desc("ares_key"), "doc_id")
        .limit(25)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.floor(F.lit(1000000000.0) * F.col("ares_key"))
            .cast("bigint")
            .alias("ares_key_e9"),
        )
    )
