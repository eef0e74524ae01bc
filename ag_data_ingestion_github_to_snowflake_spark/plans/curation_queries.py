"""Corpus-curation completions: leakage-safe splits, ranked retrieval,
classifier inference, snapshot diffing.

Four shapes every production training-data pipeline eventually needs,
none present in the reference (a single-pass ETL script — the closest
grounding is its id-idempotent resume loop,
/root/reference/src/extract_github_data.py:452-456, which implies a
versioned corpus):

- ``leakage_safe_split_clusters`` — train/test assignment keyed on the
  near-dup CLUSTER, not the row: near-duplicates of a held-out document
  must not land in train (the classic eval-contamination bug). Split =
  hash of the component label, so cluster membership decides the split
  atomically.
- ``bm25_keyword_search`` — BM25-ranked retrieval over the corpus for a
  keyword query, the lexical-search half of corpus exploration / RAG.
  Pure JVM column ops: two aggregations + a broadcast of per-term
  document frequencies.
- ``quality_classifier_inference`` — hashing-trick linear classifier
  scored distributedly: per-token weights derived by feature hashing
  (Vowpal-Wabbit style), mean-pooled per document through a sigmoid.
  A learned vocab-weight table would broadcast-join into the same plan.
- ``corpus_snapshot_diff`` — content-digest diff of two corpus
  snapshots (added / removed / changed / unchanged), the audit step
  between corpus versions.

All four carry exact DuckDB oracles; ``ln``/``exp`` parity at 6 dp is
already proven by the TF-IDF and quantization oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ag_data_ingestion_github_to_snowflake_spark.operators import graph as G
from ag_data_ingestion_github_to_snowflake_spark.operators import similarity as S
from ag_data_ingestion_github_to_snowflake_spark.operators.portable_math import (
    floor_e6,
    floor_e6_sql,
    ordered_sum,
    ordered_sum_sql,
    portable_exp_sql,
    portable_ln_sql,
)
from ag_data_ingestion_github_to_snowflake_spark.catalog import parallelize_cpu_scan
from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t
from ag_data_ingestion_github_to_snowflake_spark.plans.sampling_queries import (
    hash_bucket,
)


# ---------------------------------------------------------------------------
# Leakage-safe split: near-dup clusters assigned to train/test atomically
# ---------------------------------------------------------------------------
@register(
    "leakage_safe_split_clusters",
    # Same dup-seeded corpus shape as dedup_cluster_canonical (three
    # copies of each vector under shifted ids -> triangle components);
    # the oracle closes the pairs with a recursive CTE, then derives
    # the split from the component minimum — identical hash gate.
    oracle="""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100
      UNION ALL
      SELECT vec_id + 200000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
             * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))))
            >= 0.999
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM corpus
      UNION
      SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
    ),
    labels AS (
      SELECT node AS vec_id, CAST(MIN(r) AS BIGINT) AS comp
      FROM reach GROUP BY node
    )
    SELECT vec_id, comp,
           CASE WHEN CAST(('0x' || substr(sha256(CAST(comp AS VARCHAR)), 1, 2)) AS INT) < 204
                THEN 'train' ELSE 'test' END AS split
    FROM labels
    """,
    survey_ids=("B54", "B55", "B26"),
    description="Cluster-aware train/test split: near-dups never straddle the boundary",
)
def leakage_safe_split_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Train/test split that cannot leak near-duplicates across the
    boundary: the hash gate is applied to the CLUSTER label (component
    minimum), so all members of a duplicate cluster move together.

    Composes the LSH pair stage (bucketed self-join, never all-pairs)
    with min-label-propagation components; the split itself is one
    map-side expression on the label — at 100 TB the added cost over
    clustering is zero, and the assignment is engine-reproducible
    months later (pure function of content ids).
    """
    base = (
        t(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "embedding")
    )
    corpus = base.unionByName(
        base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    ).unionByName(
        base.select((F.col("vec_id") + 200000).alias("vec_id"), "embedding")
    )
    pairs = S.embedding_near_dup_pairs(corpus, threshold=0.999)
    labels = G.connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=corpus,
        node_col="vec_id",
        # few-hundred-node label table: width 8 beats launching 32
        # near-empty tasks per round (see connected_components doc)
        shuffle_partitions=8,
    ).select(F.col("node").alias("vec_id"), "comp")
    return labels.withColumn(
        "split",
        F.when(hash_bucket(F.col("comp")) < 204, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------
BM25_TERMS = ("spark", "join", "hash")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "bm25_keyword_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(CAST(dl AS DOUBLE)) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'join', 'hash')
      GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS dfreq FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             {ordered_sum_sql(
                 portable_ln_sql(
                     "1.0 + (stats.n_docs - dfreq.dfreq + 0.5)"
                     " / (dfreq.dfreq + 0.5)", "duckdb")
                 + f" * (tf.tf * ({BM25_K1} + 1.0))"
                 + f" / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}"
                 + f" + {BM25_B} * dl.dl / stats.avgdl))",
                 "term")} AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, {floor_e6_sql("score")} AS bm25_e6
    FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
    survey_ids=("B56", "B24", "B16", "B11"),
    description="BM25-ranked keyword retrieval (top-20 docs for a 3-term query)",
)
def bm25_keyword_search(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 documents by BM25 for the query {spark, join, hash}.

    Plan shape: one explode+count for document lengths, one for
    query-term frequencies (the IN filter prunes the explode output to
    query terms BEFORE the aggregation — tf state is |terms|·|docs
    containing them|, not the full vocabulary), then per-term document
    frequencies (3 rows — broadcast) and the 1-row corpus stats
    broadcast into a map-side score. At 100 TB the only fact-sized
    shuffles are the two per-doc aggregations; everything the query
    depends on is query-sized.
    """
    docs = t(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", "\\s+")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("dl").cast("double")) / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    # Same expression TEXT as the oracle (portable ln, identical
    # operand order) so the per-term score double is bit-identical.
    term_score = F.expr(
        portable_ln_sql(
            "1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5)", "spark"
        )
        + f" * (tf * ({BM25_K1} + 1.0))"
        + f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
        + f" + {BM25_B} * dl / avgdl))"
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(ordered_sum(term_score, "term").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", floor_e6(F.col("score")).alias("bm25_e6"))
    )


# ---------------------------------------------------------------------------
# Hashing-trick linear classifier inference
# ---------------------------------------------------------------------------
@register(
    "quality_classifier_inference",
    # Hash contract (hardened r12, item 5): per-token weights are
    # exact dyadic rationals (denominator 128) so their sum is exact
    # and order-free; the sigmoid uses the portable exp and lands in
    # floor(1e6*p); the keep flag tests the exact logit sign.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
      FROM documents WHERE doc_id < 500
    ),
    feat AS (
      SELECT doc_id,
             (CAST(('0x' || substr(sha256(term), 1, 2)) AS INT) - 127.5) / 64.0
               AS w
      FROM toks
    ),
    logits AS (
      SELECT doc_id, SUM(w) / COUNT(*) AS logit FROM feat GROUP BY doc_id
    )
    SELECT doc_id,
           {floor_e6_sql(
               "1.0 / (1.0 + " + portable_exp_sql("-logit", "duckdb") + ")")}
             AS prob_e6,
           CASE WHEN logit >= 0.0 THEN 1 ELSE 0 END AS keep
    FROM logits
    """,
    survey_ids=("B56", "B43", "B16"),
    description="Hashing-trick linear classifier: per-doc quality score + keep flag",
)
def quality_classifier_inference(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed inference of a linear text classifier via the
    hashing trick: token weight = affine map of the token's sha256 lead
    byte (a fixed random projection — exactly how Vowpal-Wabbit-style
    models index weights, with the weight VALUE here derived from the
    hash so the model ships as code, not data), mean-pooled per doc,
    squashed through a sigmoid, thresholded at 0.5.

    The plan is explode → map-side weight lookup → one per-doc
    aggregation: classifier inference at corpus scale with zero Python
    and zero model-broadcast cost. A learned vocabulary would replace
    the hash expression with a broadcast join against a weights table —
    same plan shape, same single shuffle.
    """
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    toks = docs.select("doc_id", F.explode(F.split("text", "\\s+")).alias("term"))
    w = (
        F.conv(F.substring(F.sha2(F.col("term"), 256), 1, 2), 16, 10).cast("double")
        - F.lit(127.5)
    ) / F.lit(64.0)
    logits = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        (F.sum("w") / F.count(F.lit(1))).alias("logit")
    )
    prob = F.expr(
        "1.0 / (1.0 + " + portable_exp_sql("-logit", "spark") + ")"
    )
    return logits.select(
        "doc_id",
        floor_e6(prob).alias("prob_e6"),
        F.when(F.col("logit") >= 0.0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff
# ---------------------------------------------------------------------------
@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH prev AS (
      SELECT doc_id, sha256(text) AS digest
      FROM documents WHERE doc_id % 7 != 3
    ),
    cur AS (
      SELECT doc_id,
             sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END)
               AS digest
      FROM documents WHERE doc_id % 11 != 5
    ),
    diff AS (
      SELECT COALESCE(prev.doc_id, cur.doc_id) AS doc_id,
             CASE
               WHEN prev.doc_id IS NULL THEN 'added'
               WHEN cur.doc_id IS NULL THEN 'removed'
               WHEN prev.digest != cur.digest THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n
    FROM diff GROUP BY status
    """,
    survey_ids=("B26", "B19", "B16"),
    description="Content-digest diff of two corpus snapshots: added/removed/changed counts",
)
def corpus_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Audit the delta between two corpus versions by content digest:
    FULL OUTER join of (doc_id → sha256(text)) maps, row status from
    null-side and digest comparison, counts per status.

    The two snapshots are derived from the fixture deterministically
    (distinct modulus gates + a text revision on every 5th doc) so the
    query is self-contained; in production both sides are table scans.
    One join shuffle on doc_id + a 4-group aggregation — the cheapest
    possible shape for a 100 TB version diff, and the digests mean text
    never crosses the shuffle."""
    docs = t(spark, sf, "documents")
    prev = docs.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id", F.sha2("text", 256).alias("digest")
    )
    cur = (
        docs.filter(F.col("doc_id") % 11 != 5)
        .select(
            "doc_id",
            F.sha2(
                F.when(
                    F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" rev2"))
                ).otherwise(F.col("text")),
                256,
            ).alias("digest"),
        )
    )
    p = prev.alias("p")
    c = cur.alias("c")
    diff = p.join(c, F.col("p.doc_id") == F.col("c.doc_id"), "full_outer").select(
        F.when(F.col("p.doc_id").isNull(), F.lit("added"))
        .when(F.col("c.doc_id").isNull(), F.lit("removed"))
        .when(F.col("p.digest") != F.col("c.digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status")
    )
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Unigram-LM cross-entropy (perplexity-proxy quality signal)
# ---------------------------------------------------------------------------
# Shared between doc_perplexity_unigram and ccnet_perplexity_buckets
# (which buckets the same per-doc statistic): hash contract (hardened
# r12, item 5; re-shaped same round after the 100x sweep showed the
# first ordered-fold form 5x slower) — the per-term -ln p is computed
# ONCE on the vocabulary table with the portable ln and quantized to
# the exact integer floor(1e9 * ln p); per-doc sums are then
# order-free BIGINT sums — bit-deterministic with zero collect/fold
# cost, and the plan keeps the single join + one per-doc aggregate
# shape. Extracted (r12 code review) so the next contract migration
# edits ONE fragment, not two per dialect.
_XENT_CTES = f"""toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term
    ),
    total AS (SELECT SUM(cnt) AS tot FROM vocab),
    vterm AS (
      SELECT term,
             CAST(floor(1000000000.0 * {portable_ln_sql(
                 "CAST(cnt AS DOUBLE) / total.tot", "duckdb")})
               AS BIGINT) AS lnq
      FROM vocab, total
    ),
    scored AS (
      SELECT toks.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(lnq) AS BIGINT) AS ssum_e9
      FROM toks JOIN vterm USING (term)
      GROUP BY toks.doc_id
    ),
    xe AS (
      SELECT doc_id,
             CAST(floor(CAST(-ssum_e9 AS DOUBLE) / n_tok / 1000.0) AS BIGINT)
               AS xent_e6
      FROM scored
    )"""


def _xent_per_doc(docs: DataFrame) -> DataFrame:
    """Spark twin of the ``_XENT_CTES`` fragment: (doc_id, xent_e6)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", "\\s+")).alias("term")
    )
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    total = vocab.agg(F.sum("cnt").alias("tot"))
    vterm = vocab.join(F.broadcast(total)).select(
        "term",
        F.expr(
            "CAST(floor(1000000000.0 * "
            + portable_ln_sql("CAST(cnt AS DOUBLE) / tot", "spark")
            + ") AS BIGINT)"
        ).alias("lnq"),
    )
    scored = (
        toks.join(vterm, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("lnq").cast("bigint").alias("ssum_e9"),
        )
    )
    return scored.select(
        "doc_id",
        F.expr(
            "CAST(floor(CAST(-ssum_e9 AS DOUBLE) / n_tok / 1000.0)"
            " AS BIGINT)"
        ).alias("xent_e6"),
    )


@register(
    "doc_perplexity_unigram",
    # See _XENT_CTES for the shared hash contract.
    oracle=f"""
    WITH {_XENT_CTES}
    SELECT doc_id, xent_e6 FROM xe
    """,
    survey_ids=("B56", "B43", "B16"),
    description="Unigram-LM cross-entropy per doc: the perplexity-proxy quality filter",
)
def doc_perplexity_unigram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the classic perplexity-style quality signal (CCNet-shape, with the
    n-gram LM reduced to unigrams so the whole computation is two
    aggregations): p(term) = corpus frequency, doc score = mean
    -ln p(term) over its tokens. Rare-token-heavy (low-quality or
    off-domain) documents score high.

    Plan: one explode feeding BOTH the vocabulary count and the
    per-doc score; the vocabulary (term, count) re-joins the token
    stream by term — vocabulary-sized, so AQE broadcasts it at any
    corpus scale — and the total-token count is a 1-row broadcast.
    Exactly two fact-sized shuffles at 100 TB.
    """
    return _xent_per_doc(t(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Cross-source provenance-priority dedup
# ---------------------------------------------------------------------------
@register(
    "provenance_dedup_priority",
    # The mirror tier re-publishes every primary doc under a shifted id
    # (exact duplicate content, lower-priority provenance); dedup must
    # keep the primary copy, counted per source tier.
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, source, 1 AS tier FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, 'mirror_' || source AS source,
             2 AS tier
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, tier,
             ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                ORDER BY tier ASC, doc_id ASC) AS rn
      FROM corpus
    )
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM ranked WHERE rn = 1 GROUP BY tier
    """,
    survey_ids=("B53", "B29", "B26"),
    description="Cross-source dedup keeping the highest-priority provenance copy",
)
def provenance_dedup_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup across source tiers with a provenance priority: when the
    same content appears in multiple sources (here: a seeded mirror
    tier republishing every primary doc), keep exactly one copy — the
    highest-priority (lowest tier, then lowest id) — and report how
    many survivors each tier contributed. All primaries must win.

    One shuffle on the content digest (row_number window), digest
    computed map-side so text never moves twice. This is the mixture-
    assembly dedup rule: priority encodes source trust, and the window
    tiebreak makes the keep decision total and reproducible.
    """
    docs = t(spark, sf, "documents")
    primary = docs.select("doc_id", "text", "source", F.lit(1).alias("tier"))
    mirror = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        F.concat(F.lit("mirror_"), F.col("source")).alias("source"),
        F.lit(2).alias("tier"),
    )
    corpus = primary.unionByName(mirror).withColumn(
        "digest", F.sha2("text", 256)
    )
    w = Window.partitionBy("digest").orderBy(F.asc("tier"), F.asc("doc_id"))
    kept = corpus.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("tier").agg(F.count(F.lit(1)).alias("n_kept"))


# ---------------------------------------------------------------------------
# Distributed contiguous sequence ids
# ---------------------------------------------------------------------------
@register(
    "assign_sequence_ids",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
    FROM documents
    """,
    survey_ids=("B29", "B24"),
    description="Contiguous 0-based corpus ids via range partition + offset join",
)
def assign_sequence_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Mint dense 0..n-1 sequence ids for the corpus — equal to the
    single-partition ``ROW_NUMBER() OVER (ORDER BY doc_id)`` the oracle
    runs, but computed with the data distributed throughout: range
    exchange, partition-local rank, and a parallelism-sized offset
    table broadcast back (``operators/ids.py``). The shape every
    shard-manifest writer needs at 100 TB, where a global-sort window
    would serialize on one task."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.ids import (
        assign_sequential_ids,
    )

    docs = t(spark, sf, "documents").select("doc_id")
    return assign_sequential_ids(docs, "doc_id")


# ---------------------------------------------------------------------------
# Split-leakage audit: naive vs cluster-aware assignment
# ---------------------------------------------------------------------------
@register(
    "split_leakage_audit",
    oracle="""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100
      UNION ALL
      SELECT vec_id + 200000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
             * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))))
            >= 0.999
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM corpus
      UNION
      SELECT reach.node, e.d FROM reach JOIN edges e ON e.s = reach.r
    ),
    labels AS (
      SELECT node AS vec_id, MIN(r) AS comp FROM reach GROUP BY node
    ),
    assigned AS (
      SELECT l.vec_id,
             CAST(('0x' || substr(sha256(CAST(l.vec_id AS VARCHAR)), 1, 2)) AS INT) < 204
               AS naive_train,
             CAST(('0x' || substr(sha256(CAST(l.comp AS VARCHAR)), 1, 2)) AS INT) < 204
               AS cluster_train
      FROM labels l
    )
    SELECT
      CAST(SUM(CASE WHEN a.naive_train != b.naive_train THEN 1 ELSE 0 END) AS BIGINT)
        AS naive_leaks,
      CAST(SUM(CASE WHEN a.cluster_train != b.cluster_train THEN 1 ELSE 0 END) AS BIGINT)
        AS cluster_leaks,
      CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN assigned a ON a.vec_id = p.id_a
    JOIN assigned b ON b.vec_id = p.id_b
    """,
    survey_ids=("B54", "B19", "B10"),
    description="Eval-leakage audit: near-dup pairs straddling naive vs cluster splits",
)
def split_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Quantify eval contamination: of all near-duplicate pairs, how
    many straddle the train/test boundary under (a) the naive per-row
    hash split and (b) the cluster-aware split. The cluster count is
    zero BY CONSTRUCTION (the gate hashes the component label); the
    naive count is the number of held-out documents whose near-copy
    sits in train — the audit every eval pipeline should run before
    trusting a benchmark number."""
    base = (
        t(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "embedding")
    )
    corpus = base.unionByName(
        base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    ).unionByName(
        base.select((F.col("vec_id") + 200000).alias("vec_id"), "embedding")
    )
    pairs = S.embedding_near_dup_pairs(corpus, threshold=0.999).select(
        "id_a", "id_b"
    ).localCheckpoint(eager=True)  # feeds CC and the audit join
    labels = G.connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=corpus,
        node_col="vec_id",
        shuffle_partitions=8,
    ).select(F.col("node").alias("vec_id"), "comp")
    assigned = labels.select(
        "vec_id",
        (hash_bucket(F.col("vec_id")) < 204).alias("naive_train"),
        (hash_bucket(F.col("comp")) < 204).alias("cluster_train"),
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    audited = (
        pairs.join(a, F.col("a.vec_id") == F.col("id_a"))
        .join(b, F.col("b.vec_id") == F.col("id_b"))
    )
    return audited.agg(
        F.sum(
            F.when(F.col("a.naive_train") != F.col("b.naive_train"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("naive_leaks"),
        F.sum(
            F.when(
                F.col("a.cluster_train") != F.col("b.cluster_train"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("cluster_leaks"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands sessionization (oracle-checked session semantics)
# ---------------------------------------------------------------------------
@register(
    "sessionize_events_gaps",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_us
    FROM sessions
    GROUP BY user_id, session_idx
    """,
    survey_ids=("B48", "B30", "B31"),
    description="Gaps-and-islands sessionization: 30-min inactivity gap, per-session stats",
)
def sessionize_events_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization by inactivity gap via gaps-and-islands
    (lag marks session starts, a running sum numbers them) — the
    oracle-checkable twin of ``F.session_window``: identical session
    semantics, but every step is a plain window function both engines
    execute bit-identically, so B48's session logic gets a hash-checked
    row rather than a rows-only waiver. One shuffle on user_id serves
    both windows and the final per-session aggregation."""
    # All time arithmetic in exact epoch MICROseconds (the ntz unit):
    # interval comparison and duration agree with the oracle to the
    # microsecond, with no second-boundary truncation ambiguity.
    ev = (
        t(spark, sf, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn(
        "session_idx", F.sum("new_session").over(ws).cast("bigint")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# Window-free argmax per group (max_by / arg_max)
# ---------------------------------------------------------------------------
@register(
    "argmax_order_per_segment",
    # The ordering key is a zero-padded composite string (cents, then
    # order key), so the argmax is UNIQUE — engine tie-breaking of
    # max_by/arg_max never gets a vote.
    oracle="""
    SELECT c.c_mktsegment,
           CAST(arg_max(o.o_orderkey,
                        lpad(CAST(CAST(floor(o.o_totalprice * 100) AS BIGINT) AS VARCHAR), 14, '0')
                        || '|' ||
                        lpad(CAST(o.o_orderkey AS VARCHAR), 12, '0')) AS BIGINT)
             AS top_orderkey,
           ROUND(MAX(o.o_totalprice), 2) AS top_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey_ids=("B16", "B24", "B10"),
    description="Argmax without a window: max_by per segment, one aggregation pass",
)
def argmax_order_per_segment(spark: SparkSession, sf: str) -> DataFrame:
    """The most-valuable order per market segment via ``max_by`` — the
    window-free argmax: one partial-aggregating pass instead of a
    per-group sort window, which is the cheaper plan whenever only the
    top-1 row is wanted (dedupe-to-latest, latest-snapshot-per-key).
    The ordering key embeds the tiebreak (price cents, then order key,
    zero-padded so string order == numeric order), making the answer
    total — engine tie policy never matters."""
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.expr(
            "max_by(o_orderkey, concat("
            "lpad(cast(cast(floor(o_totalprice * 100) as bigint) as string), 14, '0'),"
            " '|', lpad(cast(o_orderkey as string), 12, '0')))"
        )
        .cast("bigint")
        .alias("top_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
    )


# ---------------------------------------------------------------------------
# Regression aggregates: least-squares trend over a metric series
# ---------------------------------------------------------------------------
@register(
    "regr_trend_monthly_revenue",
    oracle="""
    WITH monthly AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 12
               + EXTRACT(month FROM o_orderdate) AS month_idx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           ROUND(regr_slope(revenue, month_idx), 2) AS slope,
           ROUND(regr_intercept(revenue, month_idx), 2) AS intercept,
           ROUND(corr(revenue, month_idx), 4) AS r
    FROM monthly
    """,
    survey_ids=("B18", "B23", "B33"),
    description="Least-squares trend of monthly revenue (regr_slope/intercept/corr)",
)
def regr_trend_monthly_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Fit a trend line to the monthly revenue series with the SQL
    regression aggregates — the two-level shape of every metric-trend
    dashboard: an exact-decimal monthly rollup (fact-sized shuffle),
    then regr_slope/intercept/corr over the handful of month points
    (single-partition second aggregate, immaterial at any scale).
    Month index is absolute (year delta × 12 + month) so the series is
    one straight axis."""
    orders = t(spark, sf, "orders")
    monthly = orders.groupBy(
        (
            (F.year("o_orderdate") - F.lit(1992)) * 12 + F.month("o_orderdate")
        ).alias("month_idx")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.round(F.regr_slope("revenue", "month_idx"), 2).alias("slope"),
        F.round(F.regr_intercept("revenue", "month_idx"), 2).alias("intercept"),
        F.round(F.corr("revenue", "month_idx"), 4).alias("r"),
    )


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph
# ---------------------------------------------------------------------------
@register(
    "graph_triangle_count",
    # Same dup-seeded corpus as the clustering queries: three copies of
    # each base vector form one triangle each; extra near-dup edges
    # between distinct base vectors can add more. Ordered-id join
    # counts each triangle exactly once.
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100
      UNION ALL
      SELECT vec_id + 200000 AS vec_id, embedding FROM embeddings WHERE vec_id < 100
    ),
    edges AS (
      SELECT a.vec_id AS s, b.vec_id AS d
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
             * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))))
            >= 0.999
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.s = e1.d
    JOIN edges e3 ON e3.s = e1.s AND e3.d = e2.d
    """,
    survey_ids=("B10", "B18", "B54"),
    description="Triangle count over the near-dup edge set (ordered-id 3-way join)",
)
def graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangles in the near-duplicate graph — the local-clustering
    signal that separates tight duplicate cliques from chains of
    borderline matches (a triangle means three documents all pairwise
    near-identical; a path means pair A-B and B-C matched but A-C did
    not — the transitive-closure false-merge risk).

    The ordered-id convention (every edge stored s < d) makes the
    3-way self-join count each triangle exactly once with no
    post-dedup: wedges (e1: a-b, e2: b-c) close against the sorted
    edge (a, c). Two shuffles over the edge table; at 100 TB the
    standard refinement orients edges by degree so high-degree hubs
    don't dominate the wedge stage."""
    base = (
        t(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "embedding")
    )
    corpus = base.unionByName(
        base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    ).unionByName(
        base.select((F.col("vec_id") + 200000).alias("vec_id"), "embedding")
    )
    edges = (
        S.embedding_near_dup_pairs(corpus, threshold=0.999)
        .select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .localCheckpoint(eager=True)  # three consumers of the LSH pipeline
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e2.s") == F.col("e1.d"))
    tri = wedges.join(
        e3,
        (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.d") == F.col("e2.d")),
    )
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


# ---------------------------------------------------------------------------
# Blocked fuzzy join (entity resolution)
# ---------------------------------------------------------------------------
@register(
    "fuzzy_join_part_names",
    # Same seeded typos, same blocking, same edit-distance filter; the
    # keep rule (best distance, then lowest key) is a window on both
    # sides.
    oracle="""
    WITH dirty AS (
      SELECT p_partkey AS dirty_key,
             substr(p_name, 1, 2) || 'z' || substr(p_name, 4) AS name_dirty,
             string_split(p_name, ' ')[-1] AS block,
             substr(p_name, 1, 2) AS block2
      FROM part WHERE p_partkey < 200 AND len(p_name) >= 4
    ),
    clean AS (
      SELECT p_partkey AS clean_key, p_name,
             string_split(p_name, ' ')[-1] AS block,
             substr(p_name, 1, 2) AS block2
      FROM part
    ),
    cand AS (
      SELECT d.dirty_key, c.clean_key,
             CAST(levenshtein(d.name_dirty, c.p_name) AS BIGINT) AS dist
      FROM dirty d JOIN clean c USING (block, block2)
      WHERE abs(len(d.name_dirty) - len(c.p_name)) <= 2
        AND levenshtein(d.name_dirty, c.p_name) <= 2
    )
    SELECT dirty_key, clean_key, dist
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_key
                                   ORDER BY dist ASC, clean_key ASC) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
    survey_ids=("B10", "B29", "B39"),
    description="Entity resolution: blocked Levenshtein fuzzy join, best match per row",
)
def fuzzy_join_part_names(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy entity matching at scale: a dirty feed (deterministic
    one-character typos seeded into part names) is resolved back to
    the clean catalog. The join key is a COMPOUND BLOCK — the name's
    last token AND its first 2-gram (the seeded typo sits at position
    3, so both keys are typo-invariant), plus a length band — so the
    quadratic Levenshtein work runs only inside the intersection of
    two blocking passes; the all-pairs edit-distance join that
    beginners write is O(n·m) and unrunnable at 100 TB. The r6
    single-key version (last token only) produced 7.8x more candidate
    pairs at sf0.01 (50.1k vs 6.4k, measured) — the second key is the
    standard multi-pass-blocking constant-factor lever when one key's
    blocks are fat. One window keeps the single best match per dirty row
    (distance, then key — total order).
    """
    part = t(spark, sf, "part")
    dirty = part.filter(
        (F.col("p_partkey") < 200) & (F.length("p_name") >= 4)
    ).select(
        F.col("p_partkey").alias("dirty_key"),
        F.concat(
            F.substring("p_name", 1, 2), F.lit("z"), F.expr("substr(p_name, 4)")
        ).alias("name_dirty"),
        F.element_at(F.split("p_name", " "), -1).alias("block"),
        F.substring("p_name", 1, 2).alias("block2"),
    )
    clean = part.select(
        F.col("p_partkey").alias("clean_key"),
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
        F.substring("p_name", 1, 2).alias("block2"),
    )
    cand = (
        dirty.join(clean, ["block", "block2"])
        .filter(
            (
                F.abs(F.length("name_dirty") - F.length("p_name")) <= 2
            )
            & (F.levenshtein("name_dirty", "p_name") <= 2)
        )
        .select(
            "dirty_key",
            "clean_key",
            F.levenshtein("name_dirty", "p_name").cast("bigint").alias("dist"),
        )
    )
    w = Window.partitionBy("dirty_key").orderBy(F.asc("dist"), F.asc("clean_key"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (rows-only: iterative greedy selection has no
# clean ANSI twin; determinism + diversity semantics pinned in
# tests/test_curation.py)
# ---------------------------------------------------------------------------
@register(
    "mmr_rerank_topk",
    # Exact DuckDB replay of the greedy MMR selection (r4: flipped from
    # rows-only): every float entering the greedy step is a rounded(6)
    # cosine computed with the same fold in both engines, the
    # lambda*rel - (1-lambda)*penalty arithmetic is plain IEEE on
    # identical doubles, and a recursive CTE replays the selection loop
    # (list-state row per query: chosen ids + per-candidate penalty;
    # argmax via list_position(scores, list_max(scores)), whose
    # first-occurrence semantics equal np.argmax's lowest-index
    # tie-break). 1e18 is the -inf sentinel for already-chosen slots.
    oracle=r"""
    WITH RECURSIVE
    qv AS (SELECT vec_id AS query_id, embedding AS q_vec
           FROM embeddings WHERE vec_id < 5),
    cv AS (SELECT vec_id AS nid, embedding AS c_vec
           FROM embeddings WHERE vec_id >= 5 AND vec_id < 505),
    scored AS (
      SELECT qv.query_id, cv.nid,
             ROUND(
               list_sum(list_transform(list_zip(qv.q_vec, cv.c_vec),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(qv.q_vec,
                        v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
                * sqrt(list_sum(list_transform(cv.c_vec,
                        v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))),
             6) AS cosine
      FROM qv, cv
    ),
    cand AS (
      SELECT query_id, nid, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, nid ASC) AS rnk
        FROM scored
      ) WHERE rnk <= 30
    ),
    base AS (
      SELECT query_id, list(nid ORDER BY nid) AS ids,
             list(cosine ORDER BY nid) AS rel
      FROM cand GROUP BY query_id
    ),
    pairc AS (
      SELECT a.query_id, a.nid AS ida, b.nid AS idb,
             ROUND(
               list_sum(list_transform(list_zip(va.c_vec, vb.c_vec),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(va.c_vec,
                        v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
                * sqrt(list_sum(list_transform(vb.c_vec,
                        v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))),
             6) AS pc
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id
      JOIN cv va ON va.nid = a.nid
      JOIN cv vb ON vb.nid = b.nid
    ),
    mat AS (
      SELECT query_id, ida, list(pc ORDER BY idb) AS prow
      FROM pairc GROUP BY query_id, ida
    ),
    mats AS (
      SELECT query_id, list(prow ORDER BY ida) AS m
      FROM mat GROUP BY query_id
    ),
    setup AS (
      SELECT b.query_id, b.ids, b.rel, m.m
      FROM base b JOIN mats m ON b.query_id = m.query_id
    ),
    sel AS (
      SELECT query_id, 0 AS rank, CAST([] AS BIGINT[]) AS chosen,
             [0.0::DOUBLE FOR i IN range(1, len(ids)+1)] AS penalty,
             CAST(NULL AS BIGINT) AS picked, CAST(NULL AS DOUBLE) AS score
      FROM setup
      UNION ALL
      SELECT query_id, rank, list_append(chosen, ids[pick]) AS chosen,
             [GREATEST(penalty[i], m[pick][i])
              FOR i IN range(1, len(ids)+1)] AS penalty,
             ids[pick] AS picked, scores[pick] AS score
      FROM (
        SELECT *, list_position(scores, list_max(scores)) AS pick
        FROM (
          SELECT s.query_id, s.rank + 1 AS rank, s.chosen, s.penalty,
                 su.ids, su.rel, su.m,
                 [CASE WHEN list_contains(s.chosen, su.ids[i]) THEN -1e18
                       ELSE 0.7::DOUBLE * su.rel[i]
                            - (1.0::DOUBLE - 0.7::DOUBLE) * s.penalty[i] END
                  FOR i IN range(1, len(su.ids)+1)] AS scores
          FROM sel s JOIN setup su ON s.query_id = su.query_id
          WHERE s.rank < 10
        )
      )
    )
    SELECT query_id, CAST(rank AS INT) AS mmr_rank, picked AS neighbor_id,
           score
    FROM sel WHERE rank >= 1
    """,
    survey_ids=("B55", "B52", "B29"),
    description="Diversity-aware retrieval: MMR greedy re-rank, selection loop replayed by a recursive CTE",
)
def mmr_rerank_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-marginal-relevance top-10 per query over a coarse
    top-30 candidate stage: the dedup-aware retrieval shape (a corpus
    with near-duplicates returns the same passage k times under plain
    top-k; MMR trades relevance against redundancy with what is
    already selected). Distributed candidate retrieval, per-query
    vectorized numpy greedy via applyInPandas — the quadratic step is
    k_coarse², never corpus-sized."""
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 505))
    return S.mmr_rerank(corpus, queries, k_coarse=30, k_final=10, lambda_=0.7)


# ---------------------------------------------------------------------------
# Robust outlier detection: median/MAD z-scores per group
# ---------------------------------------------------------------------------
@register(
    "robust_outlier_trim",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - med.med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 0.6745 * abs(e.value - med.med)
                              > 3.5 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           ROUND(med.med, 6) AS med,
           ROUND(mad.mad, 6) AS mad
    FROM events e
    JOIN med USING (event_type)
    JOIN mad USING (event_type)
    GROUP BY e.event_type, med.med, mad.mad
    """,
    survey_ids=("B23", "B16", "B10"),
    description="Median/MAD robust z-score outlier counts per event type",
)
def robust_outlier_trim(spark: SparkSession, sf: str) -> DataFrame:
    """Outlier screening that survives the outliers themselves: flag
    rows where the modified z-score 0.6745·|x − median|/MAD exceeds
    3.5 (Iglewicz–Hoaglin), per event type. Mean/stddev screens move
    with the contamination; median/MAD do not — this is the trim step
    before any statistics a pipeline trusts.

    Two grouped EXACT percentiles (median of values, then median of
    absolute deviations — the second needs the first, so two passes by
    definition) plus per-type medians re-joined broadcast; the flag
    comparison is rearranged multiplication (no division), so zero-MAD
    groups are well-defined with no epsilon."""
    ev = t(spark, sf, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    withmed = ev.join(F.broadcast(med), "event_type")
    mad = withmed.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    scored = withmed.join(F.broadcast(mad), "event_type")
    return (
        scored.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.lit(0.6745) * F.abs(F.col("value") - F.col("med"))
                    > F.lit(3.5) * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


# ---------------------------------------------------------------------------
# Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin):
# the recall-1.0 sibling of MinHash-LSH. The oracle is the brute-force
# exploded-token Jaccard join — tractable at oracle SF, while the Spark
# side runs the prefix-filtered plan that scales (rare-token candidate
# join + size band + array verify). Prefix filtering is LOSSLESS, so
# the two must agree exactly.
# ---------------------------------------------------------------------------
@register(
    "ssjoin_prefix_jaccard",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, tk AS token
      FROM (SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tk
            FROM documents
            WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2))
                       AS INT) < 26)
      WHERE tk <> ''
    ),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS s FROM tok GROUP BY 1),
    ins AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS INT) AS c
      FROM tok a JOIN tok b ON b.token = a.token AND b.doc_id > a.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(c AS DOUBLE) / (sa.s + sb.s - c), 6) AS jaccard
    FROM ins
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(c AS DOUBLE) / (sa.s + sb.s - c) >= 0.6
    ORDER BY id_a, id_b
    """,
    survey_ids=("B54", "B41", "B10"),
    description="Exact Jaccard>=0.6 pairs via lossless prefix filtering (AllPairs)",
)
def ssjoin_prefix_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-set Jaccard >= 0.6 self-join, prefix-filtered, on
    the deterministic 10% hash sample (the dedup-rate audit shape).

    Recall-1.0 near-dup discovery (vs the probabilistic
    ``dedup_minhash_pairs``): candidates only where two docs share a
    RARE-token prefix, verified on full sorted rank arrays. See
    :func:`...operators.dedup.prefix_filter_similar_pairs` for the
    scale argument (vocabulary-rank pass, prefix-only shuffle, size
    band, no cartesian). The fixture corpus is near-dup SATURATED
    (~11% of ALL doc pairs clear Jaccard 0.6 — 7.1M pairs at sf0.1),
    so the full-corpus exact join is output-bound by construction; the
    carrier therefore audits the hash-gated 10% sample, which scales
    the OUTPUT quadratically down (~1% of pair volume) while still
    exercising the full prefix-filter plan, and is itself the
    production shape: measure the near-dup rate on a reproducible
    sample before paying for the full-corpus dedup.
    """
    from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import (
        prefix_filter_similar_pairs,
    )
    from ag_data_ingestion_github_to_snowflake_spark.plans.sampling_queries import (
        hash_bucket,
    )

    docs = t(spark, sf, "documents").filter(hash_bucket(F.col("doc_id")) < 26)
    # r13: tokenize + rank-sort + prefix extraction are per-row costs
    # and the fixture scan is one task (wp_tail: 7 tasks, 2.5 s exec).
    # Layout-derived repartition — no-op when the source splits.
    docs = parallelize_cpu_scan(docs, spark, sf, "documents")
    # No orderBy: the compare gate is order-insensitive, and a global
    # sort here would range-SAMPLE its input — re-executing the whole
    # candidate+verify pipeline a second time (measured ~2x: 4.6 s ->
    # 2.4 s at sf0.1 from dropping it).
    return prefix_filter_similar_pairs(docs, "text", "doc_id", 0.6)


# ---------------------------------------------------------------------------
# Cross-document repeated-span removal (Lee et al. 2021 shape)
# ---------------------------------------------------------------------------
@register(
    "span_dedup_corpus",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    spans AS (
      SELECT doc_id, pos,
             array_to_string(l[(pos*4+1):(pos*4+4)], ' ') AS span
      FROM (
        SELECT doc_id, l,
               unnest(range(0, CAST(ceil(len(l)/4.0) AS BIGINT))) AS pos
        FROM toks
      )
    ),
    boiler AS (
      SELECT span FROM spans GROUP BY span
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT * FROM spans WHERE span NOT IN (SELECT span FROM boiler)
    )
    SELECT doc_id,
           string_agg(span, ' ' ORDER BY pos) AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_spans_kept
    FROM kept GROUP BY doc_id
    """,
    survey_ids=("B53", "B41", "B16"),
    description="cross-corpus repeated-span removal: drop 4-token spans shared by >=2 docs, reassemble",
)
def span_dedup_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Repeated-substring removal across the corpus (the Lee et al.
    2021 "Deduplicating Training Data" operator, reduced from suffix
    arrays to fixed non-overlapping 4-token spans): any span occurring
    in >= 2 distinct documents is boilerplate; documents are
    reassembled from their surviving spans in order. The reference has
    no corpus ops at all — this is north-star surface (training-data
    curation).

    Plan shape at 100 TB: one narrow explode (spans are derived
    map-side with transform+posexplode — no UDF), ONE shuffle to count
    distinct docs per span, then the boilerplate set (tiny by
    construction: only highly-repeated spans survive the HAVING) comes
    back via a left_anti join that AQE turns into a broadcast, and ONE
    doc-keyed shuffle rebuilds the text. The dominant cost is the two
    fact-sized shuffles; nothing is quadratic because spans never join
    spans. ~11% of span instances are removed on the fixture corpus
    (calibrated so the op is observably lossy but not destructive).
    """
    docs = t(spark, sf, "documents").filter(F.length("text") > 0)
    W = 4
    toks = docs.select("doc_id", F.split("text", " ").alias("l"))
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("l") / F.lit(float(W))).cast("int") - 1,
                ),
                lambda i: F.array_join(F.slice("l", i * W + 1, W), " "),
            )
        ).alias("pos", "span"),
    )
    boiler = (
        spans.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span")
    )
    kept = spans.join(boiler, "span", "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans_kept"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule battery
# ---------------------------------------------------------------------------
@register(
    "gopher_quality_rules",
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             len(w) AS n_words,
             CAST(len(array_to_string(w, '')) AS DOUBLE) / len(w) AS mean_word_len,
             CAST(len(list_filter(w, x -> regexp_matches(x, '^[a-z]+$')))
                  AS DOUBLE) / len(w) AS alpha_frac,
             CAST(len(list_filter(w, x -> x IN ('the','a','of','to','and','in')))
                  AS DOUBLE) / len(w) AS stop_frac
      FROM words WHERE len(w) > 0
    )
    SELECT doc_id, lang,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(alpha_frac, 6) AS alpha_frac,
           ROUND(stop_frac, 6) AS stop_frac,
           (n_words BETWEEN 20 AND 100000
            AND mean_word_len BETWEEN 2 AND 10
            AND alpha_frac >= 0.8) AS passes
    FROM feat
    """,
    survey_ids=("B56", "B41", "B43"),
    description="Gopher-rule quality battery: word count, mean word length, alpha fraction, stopword fraction",
)
def gopher_quality_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher / MassiveText repetition-free quality rules (Rae et
    al. 2021, §A1.1 of the published paper) as one Column-native pass:
    word-count bounds, mean word length in [2,10], fraction of
    alphabetic words >= 0.8, plus the stopword-fraction signal. Every
    feature derives from ONE split() array — no second tokenization,
    no UDF, no shuffle at all (the whole query is map-side; the only
    exchange the driver sees is the result collect).

    ``aggregate``/``filter`` higher-order functions keep the counting
    inside whole-stage codegen; the same rules at 100 TB are a pure
    map over the corpus with predicate-pushdown-friendly output
    (filter on ``passes`` prunes before any downstream shuffle).
    """
    docs = t(spark, sf, "documents")
    w = F.split("text", " ")
    n_words = F.size(w)
    total_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    alpha_cnt = F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$")))
    stop_cnt = F.size(
        F.filter(w, lambda x: x.isin("the", "a", "of", "to", "and", "in"))
    )
    feat = docs.filter(n_words > 0).select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        (total_chars.cast("double") / n_words).alias("mean_word_len"),
        (alpha_cnt.cast("double") / n_words).alias("alpha_frac"),
        (stop_cnt.cast("double") / n_words).alias("stop_frac"),
    )
    return feat.select(
        "doc_id",
        "lang",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("alpha_frac", 6).alias("alpha_frac"),
        F.round("stop_frac", 6).alias("stop_frac"),
        (
            F.col("n_words").between(20, 100000)
            & F.col("mean_word_len").between(2, 10)
            & (F.col("alpha_frac") >= 0.8)
        ).alias("passes"),
    )


@register(
    "ccnet_perplexity_buckets",
    # Per-doc xent_e6 comes from the shared _XENT_CTES fragment (the
    # doc_perplexity_unigram contract); the tercile orders by that
    # integer (doc_id tiebreak) and the bucket average is an exact
    # integer floor-division — nothing in the hash touches libm,
    # engine ROUND, or accumulation order.
    oracle=f"""
    WITH {_XENT_CTES},
    bucketed AS (
      SELECT d.lang, x.xent_e6,
             NTILE(3) OVER (PARTITION BY d.lang ORDER BY x.xent_e6, x.doc_id)
               AS tercile
      FROM xe x JOIN documents d ON x.doc_id = d.doc_id
    )
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(xent_e6) // COUNT(*) AS BIGINT) AS avg_xent_e6
    FROM bucketed
    GROUP BY lang, tercile
    """,
    survey_ids=("B56", "B29", "B16"),
    description="CCNet head/middle/tail perplexity terciles per language",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """The CCNet split (Wenzek et al. 2020): documents bucketed into
    head/middle/tail by LM perplexity WITHIN each language — the
    published recipe for quality-stratifying Common Crawl (train on
    head+middle, drop or downweight tail). Composes the unigram-LM
    cross-entropy (``doc_perplexity_unigram``) with a per-language
    NTILE; the tercile orders by the integer xent_e6 so assignment is
    engine-identical. Two fact shuffles for the LM, one lang-keyed
    window, one group aggregate.

    Scale note: per-language NTILE is a low-cardinality window (the
    wall C90/C114 break); at billions of docs the production form is
    CCNet's own — compute the two tercile CUTOFF scores per language
    (percentile aggregation, no global sort) and assign buckets by
    comparison, which this query's bucket semantics reduce to when
    scores are distinct."""
    from pyspark.sql import Window

    docs = t(spark, sf, "documents")
    scored = _xent_per_doc(docs)
    w = Window.partitionBy("lang").orderBy("xent_e6", "doc_id")
    bucketed = (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("tercile", F.ntile(3).over(w))
    )
    return (
        bucketed.groupBy("lang", "tercile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("xent_e6").alias("sx"),
        )
        .withColumn("avg_xent_e6", F.expr("sx div n_docs"))
        .drop("sx")
        .select(
            "lang",
            F.when(F.col("tercile") == 1, "head")
            .when(F.col("tercile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_docs",
            "avg_xent_e6",
        )
    )


@register(
    "dataset_datasheet",
    oracle="""
    WITH base AS (
      SELECT source, lang, n_chars, text,
             md5(text) AS digest,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> '')) AS n_words
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS pct_en,
           ROUND(CAST(SUM(n_words) AS DOUBLE) / COUNT(*), 6) AS mean_words,
           ROUND(1.0 - CAST(COUNT(DISTINCT digest) AS DOUBLE) / COUNT(*), 6)
             AS exact_dup_rate
    FROM base GROUP BY source
    """,
    survey_ids=("B16", "B20", "B56"),
    description="Per-source dataset datasheet: volume, language mix, dup rate",
)
def dataset_datasheet(spark: SparkSession, sf: str) -> DataFrame:
    """The 'datasheet for datasets' summary a curation pipeline
    publishes with every corpus snapshot (Gebru et al. 2021 shape):
    per-source volume, language mix, mean document length, and exact
    duplicate rate — one aggregation pass plus a distinct-digest
    count, all integer/exact-ratio arithmetic. The consumer-facing
    twin of the engine-facing ``profile_orders_columns``."""
    docs = t(spark, sf, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("digest"),
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("n_words"),
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("pct_en"),
        F.round(F.sum("n_words").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_words"
        ),
        F.round(
            F.lit(1.0)
            - F.countDistinct("digest").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization audit
# ---------------------------------------------------------------------------
@register(
    "unicode_nfc_audit",
    # The fixture corpus is ASCII-clean, so a synthetic NFD tail
    # (combining marks spelled explicitly) rides along to prove the
    # operator actually composes: changed rows emit their normalized
    # text, clean rows pass through with changed=false.
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES
        (9000001, 'café au lait'),
        (9000002, 'école française'),
        (9000003, 'Ångström units'),
        (9000004, 'already composed café'),
        (9000005, 'plain ascii stays put')
      ) AS v(doc_id, text)
    ),
    norm AS (
      SELECT doc_id, text, nfc_normalize(text) AS norm_text FROM corpus
    )
    SELECT doc_id,
           (norm_text <> text) AS changed,
           CAST(length(text) AS BIGINT) AS n_before,
           CAST(length(norm_text) AS BIGINT) AS n_after,
           CASE WHEN norm_text <> text THEN norm_text END AS emitted
    FROM norm
    """,
    survey_ids=("B51", "B56", "B27"),
    description="NFC normalization audit: composed-vs-decomposed detection per doc",
)
def unicode_nfc_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc NFC normalization audit over the corpus plus a
    synthetic NFD tail (operators/unicode_norm.py): flags documents
    whose text changes under NFC, with character counts before/after
    and the normalized text for changed rows. Both engines run the
    same UCD composition (Python unicodedata vs DuckDB
    nfc_normalize), so the differential pins the normalizer itself,
    not just the plumbing. Map-side only (one mapInPandas over the
    union); the synthetic rows are literals, so the plan stays a
    single scan + union."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.unicode_norm import (
        nfc_normalize,
    )

    synth = spark.createDataFrame(
        [
            (9000001, 'café au lait'),
            (9000002, 'école française'),
            (9000003, 'Ångström units'),
            (9000004, 'already composed café'),
            (9000005, 'plain ascii stays put'),
        ],
        "doc_id BIGINT, text STRING",
    )
    corpus = (
        t(spark, sf, "documents").select(F.col("doc_id").cast("bigint"), "text")
        .unionAll(synth)
    )
    out = nfc_normalize(corpus, text_col="text")
    return out.select(
        "doc_id",
        "changed",
        F.length("text").cast("bigint").alias("n_before"),
        F.length("norm_text").cast("bigint").alias("n_after"),
        F.when(F.col("changed"), F.col("norm_text")).alias("emitted"),
    )


# ---------------------------------------------------------------------------
# Domain-mixture reweighting: per-source sampling weights to hit a
# target mixture (the static half of DoReMi-style data mixing)
# ---------------------------------------------------------------------------
@register(
    "domain_mixture_reweight",
    # Shares and weights are ratios of exact integer counts — single
    # double division per cell, identical in both engines.
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS DOUBLE) AS total_docs,
             CAST(COUNT(*) AS DOUBLE) AS n_sources
      FROM per
    )
    SELECT source, n_docs, sum_chars,
           ROUND(n_docs / total_docs, 6) AS actual_share,
           ROUND(1.0 / n_sources, 6) AS target_share,
           ROUND((1.0 / n_sources) / (n_docs / total_docs), 6) AS sample_weight,
           CAST(round(sum_chars * ((1.0 / n_sources) / (n_docs / total_docs)))
                AS BIGINT) AS expected_chars_after
    FROM per, tot
    """,
    survey_ids=("B16", "B18", "B43"),
    description="Per-source sampling weights matching a uniform target mixture",
)
def domain_mixture_reweight(spark: SparkSession, sf: str) -> DataFrame:
    """Static domain reweighting: given the corpus's actual per-source
    share, emit the sampling weight that makes the resampled corpus hit
    a TARGET mixture (uniform here; any target table drops in the same
    way). This is the planning step before weighted_sample_docs /
    temperature_mixture_sample EXECUTE a mixture — those draw rows,
    this decides the rates, including the expected post-resample
    character budget per source.

    Scale shape: one grouped count (map-side combine) to a |sources|-row
    table, a 1-row total broadcast, pure arithmetic after. The cheapest
    possible plan — the corpus is read once.
    """
    per = t(spark, sf, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("total_docs"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    actual = F.col("n_docs") / F.col("total_docs")
    target = F.lit(1.0) / F.col("n_sources")
    weight = target / actual
    return per.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sum_chars",
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(weight, 6).alias("sample_weight"),
        F.round(F.col("sum_chars") * weight, 0)
        .cast("bigint")
        .alias("expected_chars_after"),
    )


# ---------------------------------------------------------------------------
# Naive Bayes language classifier: trained AND evaluated in-engine,
# held-out confusion matrix (pure counting — no ML library)
# ---------------------------------------------------------------------------
@register(
    "naive_bayes_lang_confusion",
    # Hash contract (hardened r12, item 5): the confusion cells are
    # integers, but the ARGMAX behind them compares log-scores — so
    # every ln is the portable sqrt-reduction ln and the per-doc
    # numerator folds in WORD order, making the compared doubles
    # bit-identical on any engine/libm build (no round-9 shim needed).
    oracle=f"""
    WITH split AS (
      SELECT doc_id, lang, text,
             CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 200
               AS is_train
      FROM documents
    ),
    train_tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM split WHERE is_train
    ),
    clw AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c FROM train_tok GROUP BY 1, 2
    ),
    class_tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS t_l FROM clw GROUP BY lang
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM clw),
    prior AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l FROM split WHERE is_train GROUP BY lang
    ),
    dtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM split WHERE is_train),
    test_tok AS (
      SELECT doc_id, lang AS lang_true, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
            FROM split WHERE NOT is_train)
      GROUP BY 1, 2, 3
    ),
    doc_len AS (
      SELECT doc_id, lang_true, CAST(SUM(cnt) AS BIGINT) AS n_tok
      FROM test_tok GROUP BY 1, 2
    ),
    s1 AS (
      SELECT tt.doc_id, clw.lang,
             CAST(SUM(CAST(floor(1000000000.0 * (tt.cnt * {portable_ln_sql(
                 "CAST(clw.c + 1 AS DOUBLE)", "duckdb")}))
               AS BIGINT)) AS BIGINT) AS s_num_e9
      FROM test_tok tt JOIN clw ON tt.word = clw.word
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT dl.doc_id, dl.lang_true, ct.lang AS lang_cand,
             {portable_ln_sql("CAST(p.d_l AS DOUBLE)", "duckdb", "pa")}
             - {portable_ln_sql("CAST(dt.d AS DOUBLE)", "duckdb", "pb")}
             + CAST(COALESCE(s1.s_num_e9, 0) AS DOUBLE) / 1000000000.0
             - dl.n_tok * {portable_ln_sql(
                 "CAST(ct.t_l + vocab.v AS DOUBLE)", "duckdb", "pc")}
               AS score
      FROM doc_len dl
      CROSS JOIN class_tot ct
      JOIN prior p ON p.lang = ct.lang
      LEFT JOIN s1 ON s1.doc_id = dl.doc_id AND s1.lang = ct.lang, dtot dt, vocab
    ),
    pred AS (
      SELECT doc_id, lang_true, lang_cand AS lang_pred,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang_cand ASC) AS rnk
      FROM scored
    )
    SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rnk = 1
    GROUP BY lang_true, lang_pred
    """,
    survey_ids=("B56", "B16", "B10"),
    description="Multinomial Naive Bayes lang classifier: train + held-out confusion, all counting",
)
def naive_bayes_lang_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Train a multinomial Naive Bayes language classifier on a
    deterministic ~78% hash split and evaluate the held-out confusion
    matrix — model fitting as a QUERY. Multinomial NB is pure counting
    (per-class word counts + Laplace smoothing), so the full train/
    predict/evaluate loop expresses as joins and aggregations with no
    ML library and no driver-side state; quality_classifier_inference
    scores with fixed weights, this LEARNS its weights from the corpus.

    Scale shape: training reduces the corpus to a (lang x word) count
    table in one shuffle; scoring joins held-out tokens to it on the
    word key (broadcast here — the fixture vocabulary is tiny; at web
    scale the same plan shuffle-joins on word, still key-bounded).
    The OOV algebra keeps the join INNER: unseen words contribute
    ln(1)=0 to the numerator, so only the shared n_tok * ln(T_l + V)
    normalizer sees them. The candidate fan-out is |langs| per doc via
    a broadcast cross of the 5-row class table.
    """
    docs = t(spark, sf, "documents")
    is_train = (
        F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2), 16, 10)
        .cast("int")
        < 200
    )
    split = docs.select("doc_id", "lang", "text", is_train.alias("is_train"))
    train = split.filter("is_train")
    test = split.filter(~F.col("is_train"))
    train_tok = train.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    )
    clw = train_tok.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    clw = clw.persist()
    class_tot = clw.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t_l"))
    vocab = clw.agg(F.countDistinct("word").cast("bigint").alias("v"))
    prior = train.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("d_l"))
    dtot = train.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    test_tok = (
        test.select(
            "doc_id",
            F.col("lang").alias("lang_true"),
            F.explode(F.split("text", " ")).alias("word"),
        )
        .groupBy("doc_id", "lang_true", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    doc_len = test_tok.groupBy("doc_id", "lang_true").agg(
        F.sum("cnt").cast("bigint").alias("n_tok")
    )
    s1_term = F.expr(
        "CAST(floor(1000000000.0 * (cnt * "
        + portable_ln_sql("CAST(c + 1 AS DOUBLE)", "spark")
        + ")) AS BIGINT)"
    )
    s1 = (
        test_tok.join(F.broadcast(clw), "word")
        .groupBy("doc_id", F.col("lang").alias("lang_cand"))
        .agg(F.sum(s1_term).cast("bigint").alias("s_num_e9"))
    )
    cand = class_tot.join(F.broadcast(prior), "lang").withColumnRenamed(
        "lang", "lang_cand"
    )
    scored = (
        doc_len.join(F.broadcast(cand))
        .join(s1, ["doc_id", "lang_cand"], "left")
        .join(F.broadcast(dtot))
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang_true",
            "lang_cand",
            F.expr(
                portable_ln_sql("CAST(d_l AS DOUBLE)", "spark", "pa")
                + " - "
                + portable_ln_sql("CAST(d AS DOUBLE)", "spark", "pb")
                + " + CAST(COALESCE(s_num_e9, 0) AS DOUBLE) / 1000000000.0"
                + " - n_tok * "
                + portable_ln_sql("CAST(t_l + v AS DOUBLE)", "spark", "pc")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang_cand").asc()
    )
    pred = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    return pred.groupBy(
        "lang_true", F.col("lang_cand").alias("lang_pred")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))


# ---------------------------------------------------------------------------
# Asymmetric containment join: sub-document duplication
# ---------------------------------------------------------------------------
@register(
    "containment_join_docs",
    # Oracle is the brute-force inverted-index join on the same 10%
    # hash sample: intersection counts per ordered pair, divided by the
    # CONTAINEE size. Prefix filtering is lossless, so the plans must
    # agree exactly.
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, tk AS token
      FROM (SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tk
            FROM documents
            WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2))
                       AS INT) < 7)
      WHERE tk <> ''
    ),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS s FROM tok GROUP BY 1),
    ins AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS INT) AS c
      FROM tok a JOIN tok b ON b.token = a.token AND b.doc_id <> a.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(sa.s AS BIGINT) AS size_a,
           CAST(sb.s AS BIGINT) AS size_b,
           ROUND(CAST(c AS DOUBLE) / sa.s, 6) AS containment
    FROM ins
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(c AS DOUBLE) / sa.s >= 0.8
    ORDER BY id_a, id_b
    """,
    survey_ids=("B54", "B41", "B10"),
    description="Exact containment>=0.8 ordered pairs (sub-document duplication), prefix-filtered",
)
def containment_join_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-set containment >= 0.8 join on the deterministic 10%
    hash sample: which documents are mostly CONTAINED in another —
    quotes, excerpts, wrapped reposts — the asymmetric duplication
    that whole-document Jaccard (ssjoin_prefix_jaccard) structurally
    misses.

    See :func:`...operators.dedup.prefix_filter_containment_pairs` for
    the lossless asymmetric prefix lemma and the scale argument
    (A-prefixes are rare tokens, so only rare postings are probed; a
    size band prunes containers too small to qualify; one exact
    intersection per unique candidate pair). Same sample-gating
    rationale as ssjoin_prefix_jaccard, but at a ~2.7% gate instead of
    10%: ordered-pair output at containment 0.8 plus the unfiltered
    postings side make this carrier's per-sample pair volume ~8x the
    Jaccard join's on the near-dup-saturated fixture (measured 141k
    pairs at the 10% gate growing 101x LINEARLY to 14.3M at the 100x
    fixture — output-linear, but the 100x point becomes
    verify-work-dominated and reads +1.41 on the two-decade curve).
    The tighter gate keeps the audit in the shuffle-bound regime the
    other dedup carriers occupy while exercising the identical plan.
    """
    from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import (
        prefix_filter_containment_pairs,
    )
    from ag_data_ingestion_github_to_snowflake_spark.plans.sampling_queries import (
        hash_bucket,
    )

    docs = t(spark, sf, "documents").filter(hash_bucket(F.col("doc_id")) < 7)
    return prefix_filter_containment_pairs(docs, "text", "doc_id", 0.8)


# ---------------------------------------------------------------------------
# Fellegi-Sunter record linkage: incoming batch vs master table
# ---------------------------------------------------------------------------
def _fs_weight(dialect: str, g: str, u: str) -> str:
    """The 3-field Fellegi-Sunter log-weight, portable-ln form; ``g``/
    ``u`` are the column-qualifier prefixes per dialect context."""
    ln = portable_ln_sql
    return (
        f"(CASE WHEN {g}g_seg IS NULL THEN 0.0"
        f" WHEN {g}g_seg = 1 THEN {ln(f'0.95 / {u}u_seg', dialect, 'pa')}"
        f" ELSE {ln(f'0.05 / (1.0 - {u}u_seg)', dialect, 'pb')} END)"
        f" + (CASE WHEN {g}g_bal = 1"
        f" THEN {ln(f'0.90 / {u}u_bal', dialect, 'pc')}"
        f" ELSE {ln(f'0.10 / (1.0 - {u}u_bal)', dialect, 'pd')} END)"
        f" + (CASE WHEN {g}g_sfx = 1"
        f" THEN {ln(f'0.98 / {u}u_sfx', dialect, 'pe')}"
        f" ELSE {ln(f'0.02 / (1.0 - {u}u_sfx)', dialect, 'pf')} END)"
    )


@register(
    "record_linkage_fs",
    # Hash contract (hardened r12, item 5): u-probabilities are exact
    # count ratios; the 3-term log-weight uses the portable ln, so the
    # ranked doubles are bit-identical cross-engine/build; output is
    # floor(1e6*w) with the rank on the raw double.
    oracle=f"""
    WITH batch AS (
      SELECT c_custkey AS a_key, c_nationkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END
               AS a_seg,
             ROUND(c_acctbal / 100.0, 0) * 100.0 AS a_bal,
             substr(c_name, length(c_name) - 2, 3) AS a_sfx
      FROM customer WHERE c_custkey < 300
    ),
    cand AS (
      SELECT b.a_key, m.c_custkey AS b_key,
             CASE WHEN b.a_seg IS NULL THEN NULL
                  WHEN b.a_seg = m.c_mktsegment THEN 1 ELSE 0 END AS g_seg,
             CASE WHEN abs(b.a_bal - m.c_acctbal) <= 50.0 THEN 1 ELSE 0 END
               AS g_bal,
             CASE WHEN b.a_sfx = substr(m.c_name, length(m.c_name) - 2, 3)
                  THEN 1 ELSE 0 END AS g_sfx
      FROM batch b JOIN customer m ON m.c_nationkey = b.c_nationkey
    ),
    u AS (
      SELECT CAST(SUM(g_seg) AS DOUBLE) / COUNT(g_seg) AS u_seg,
             CAST(SUM(g_bal) AS DOUBLE) / COUNT(*) AS u_bal,
             CAST(SUM(g_sfx) AS DOUBLE) / COUNT(*) AS u_sfx
      FROM cand
    ),
    w AS (
      SELECT c.a_key, c.b_key, c.g_seg, c.g_bal, c.g_sfx,
             {_fs_weight("duckdb", "c.", "u.")} AS weight
      FROM cand c, u
    )
    SELECT a_key, b_key, g_seg, g_bal, g_sfx,
           {floor_e6_sql("weight")} AS weight_e6,
           CAST(CASE WHEN a_key = b_key THEN 1 ELSE 0 END AS INTEGER)
             AS is_true_match
    FROM w
    ORDER BY weight DESC, a_key, b_key
    LIMIT 50
    """,
    survey_ids=("B10", "B19", "B43"),
    description="Fellegi-Sunter record linkage: batch-vs-master match weights, top-50 pairs",
)
def record_linkage_fs(spark: SparkSession, sf: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi-Sunter 1969): score
    candidate (incoming, master) pairs by agreement on segment,
    rounded balance, and name suffix — log-likelihood weights with
    m-probabilities fixed and u-probabilities estimated from the
    candidate population (almost all non-matches). True matches
    (same key) should surface at the top; the is_true_match column
    makes the audit self-evaluating.

    Scale shape: the incoming batch is a FIXED-SIZE key slice (300
    keys — the production incremental-linkage shape; a rate-based
    sample would grow with the master and make pair volume quadratic,
    measured +2.83 on the 100x curve before this bound), broadcast
    against the master on the nationkey blocking key — candidate
    volume is |batch| x block size, LINEAR in the master table. Missing fields
    (nulled segment) contribute weight 0, the FS convention. The u
    estimate is one extra aggregate over the candidates (1-row
    broadcast back).
    """
    cust = t(spark, sf, "customer")
    batch = cust.filter(F.col("c_custkey") < 300).select(
        F.col("c_custkey").alias("a_key"),
        "c_nationkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("a_seg"),
        (F.round(F.col("c_acctbal") / 100.0, 0) * 100.0).alias("a_bal"),
        F.substring(F.col("c_name"), -3, 3).alias("a_sfx"),
    )
    master = cust.select(
        F.col("c_custkey").alias("b_key"),
        "c_nationkey",
        F.col("c_mktsegment").alias("b_seg"),
        F.col("c_acctbal").alias("b_bal"),
        F.substring(F.col("c_name"), -3, 3).alias("b_sfx"),
    )
    cand = F.broadcast(batch).join(master, "c_nationkey").select(
        "a_key",
        "b_key",
        F.when(F.col("a_seg").isNull(), F.lit(None).cast("int"))
        .when(F.col("a_seg") == F.col("b_seg"), 1)
        .otherwise(0)
        .alias("g_seg"),
        F.when(F.abs(F.col("a_bal") - F.col("b_bal")) <= 50.0, 1)
        .otherwise(0)
        .alias("g_bal"),
        F.when(F.col("a_sfx") == F.col("b_sfx"), 1).otherwise(0).alias("g_sfx"),
    )
    cand = cand.persist()
    u = cand.agg(
        (F.sum("g_seg").cast("double") / F.count("g_seg")).alias("u_seg"),
        (F.sum("g_bal").cast("double") / F.count(F.lit(1))).alias("u_bal"),
        (F.sum("g_sfx").cast("double") / F.count(F.lit(1))).alias("u_sfx"),
    )
    w = cand.join(F.broadcast(u))
    weight = F.expr(_fs_weight("spark", "", ""))
    return (
        w.select(
            "a_key",
            "b_key",
            "g_seg",
            "g_bal",
            "g_sfx",
            weight.alias("weight"),
            F.when(F.col("a_key") == F.col("b_key"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_true_match"),
        )
        .orderBy(F.desc("weight"), "a_key", "b_key")
        .limit(50)
        .select(
            "a_key",
            "b_key",
            "g_seg",
            "g_bal",
            "g_sfx",
            floor_e6(F.col("weight")).alias("weight_e6"),
            "is_true_match",
        )
    )


# ---------------------------------------------------------------------------
# Fightin' Words: informative-Dirichlet log-odds corpus contrast
# (Monroe, Colaresi & Quinn 2008, Political Analysis 16(4))
# ---------------------------------------------------------------------------
_FW_ALPHA0 = "500.0"  # total Dirichlet prior mass, spread per pooled freq


def _fw_z(dialect: str) -> str:
    """z-scored log-odds-ratio with informative Dirichlet prior, the
    Monroe et al. estimator, in shared portable-ln text. All inputs
    (y1, y2, n1, n2) are exact integer counts in scope."""
    ln = portable_ln_sql
    aw = f"({_FW_ALPHA0} * (CAST(y1 + y2 AS DOUBLE) / (n1 + n2)))"
    d1 = ln(
        f"(CAST(y1 AS DOUBLE) + {aw})"
        f" / ((CAST(n1 AS DOUBLE) + {_FW_ALPHA0})"
        f" - (CAST(y1 AS DOUBLE) + {aw}))",
        dialect,
        "pfa",
    )
    d2 = ln(
        f"(CAST(y2 AS DOUBLE) + {aw})"
        f" / ((CAST(n2 AS DOUBLE) + {_FW_ALPHA0})"
        f" - (CAST(y2 AS DOUBLE) + {aw}))",
        dialect,
        "pfb",
    )
    var = (
        f"(1.0 / (CAST(y1 AS DOUBLE) + {aw})"
        f" + 1.0 / (CAST(y2 AS DOUBLE) + {aw}))"
    )
    return f"(({d1} - {d2}) / sqrt({var}))"


@register(
    "fightin_words_contrast",
    # Hash contract (born hardened, r12 convention): exact integer
    # counts, portable ln (bit-identical on any build), rank on the
    # raw identical double, floor(1e6*z) presentation.
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT tok AS term,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS y1,
             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS y2
      FROM toks WHERE tok <> ''
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(y1) AS BIGINT) AS n1, CAST(SUM(y2) AS BIGINT) AS n2
      FROM tf
    ),
    sc AS (
      SELECT term, y1, y2, {_fw_z("duckdb")} AS z
      FROM tf, tot
      WHERE y1 + y2 >= 20
    )
    SELECT term, y1, y2, {floor_e6_sql("z")} AS z_e6
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY z DESC, term) AS rnk FROM sc
    ) WHERE rnk <= 25
    """,
    survey_ids=("B56", "B16", "B43"),
    description="Fightin' Words: Dirichlet-prior log-odds terms most distinctive of the English slice",
)
def fightin_words_contrast(spark: SparkSession, sf: str) -> DataFrame:
    """Which terms are most DISTINCTIVE of the English sub-corpus?
    The Monroe-Colaresi-Quinn "Fightin' Words" estimator: log-odds
    ratio of per-term rates between two sub-corpora under an
    informative Dirichlet prior (alpha_w proportional to the pooled
    frequency, total mass 500), z-scored by the delta-method variance
    1/(y1+a) + 1/(y2+a). The standard corpus-contrast tool for
    curation audits (what does slice A over-represent?) — raw
    log-odds overweights rare terms; the prior + z-score fix exactly
    that.

    Scale shape: ONE vocabulary-sized conditional-count shuffle
    (map-side combined), a 1-row totals broadcast, map-side z over
    vocabulary rows, TakeOrdered top-25. Nothing past the first
    reduce scales with the corpus. Cites no reference file — this is
    part of the mandated LLM-curation extension surface.
    """
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(F.col("tok").alias("term")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("y1"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("bigint")
        .alias("y2"),
    )
    tot = tf.agg(
        F.sum("y1").cast("bigint").alias("n1"),
        F.sum("y2").cast("bigint").alias("n2"),
    )
    sc = (
        tf.filter(F.col("y1") + F.col("y2") >= 20)
        .join(F.broadcast(tot))
        .withColumn("z", F.expr(_fw_z("spark")))
    )
    return (
        sc.orderBy(F.desc("z"), "term")
        .limit(25)
        .select("term", "y1", "y2", floor_e6(F.col("z")).alias("z_e6"))
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence from the corpus unigram distribution
# ---------------------------------------------------------------------------
@register(
    "kl_divergence_sources",
    # Hash contract (born hardened, r12 convention): per-term KL
    # contributions (p ln(p/q), exact-count ratios through the
    # portable ln) quantize to integer 1e-9 grains on the
    # vocabulary-sized (source, term) table, so the per-source sum is
    # an order-free BIGINT sum; division/floor to the 1e-6 grain is
    # correctly rounded double math on identical inputs.
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    ft AS (SELECT source, tok AS term FROM toks WHERE tok <> ''),
    q AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cq FROM ft GROUP BY term
    ),
    qn AS (SELECT CAST(SUM(cq) AS BIGINT) AS nq FROM q),
    p AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cp
      FROM ft GROUP BY source, term
    ),
    pn AS (
      SELECT source, CAST(SUM(cp) AS BIGINT) AS np FROM p GROUP BY source
    ),
    terms AS (
      SELECT p.source,
             CAST(floor(1000000000.0 *
               ((CAST(cp AS DOUBLE) / np) * {portable_ln_sql(
                   "(CAST(cp AS DOUBLE) / np) / (CAST(cq AS DOUBLE) / nq)",
                   "duckdb")})) AS BIGINT) AS tq
      FROM p JOIN q USING (term) JOIN pn ON p.source = pn.source, qn
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(floor(CAST(SUM(tq) AS DOUBLE) / 1000.0) AS BIGINT) AS kl_e6
    FROM terms
    GROUP BY source
    """,
    survey_ids=("B56", "B16", "B43"),
    description="KL divergence of each source's unigram distribution from the corpus",
)
def kl_divergence_sources(spark: SparkSession, sf: str) -> DataFrame:
    """How far does each source's language drift from the corpus
    average? Plug-in KL divergence D(P_source || P_corpus) over the
    source's observed vocabulary (q > 0 wherever p > 0 because the
    corpus pools every source, so no smoothing is needed on the
    support) — the mixture-monitoring companion of
    domain_mixture_reweight: reweighting changes HOW MUCH of each
    source is sampled, this measures how DIFFERENT each source reads.

    Scale shape: one (source, term) count shuffle and one term count
    shuffle (both vocabulary-sized after map-side combine), a
    vocabulary equi-join, per-term integer quantization, one tiny
    per-source sum. Order-free integer arithmetic end to end past the
    portable ln.
    """
    docs = t(spark, sf, "documents")
    ft = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    q = ft.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("cq"))
    qn = q.agg(F.sum("cq").cast("bigint").alias("nq"))
    p = ft.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cp")
    )
    pn = p.groupBy("source").agg(F.sum("cp").cast("bigint").alias("np"))
    tq = F.expr(
        "CAST(floor(1000000000.0 * ((CAST(cp AS DOUBLE) / np) * "
        + portable_ln_sql(
            "(CAST(cp AS DOUBLE) / np) / (CAST(cq AS DOUBLE) / nq)", "spark"
        )
        + ")) AS BIGINT)"
    )
    terms = (
        p.join(q, "term")
        .join(pn, "source")
        .join(F.broadcast(qn))
        .select("source", tq.alias("tq"))
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.expr("CAST(floor(CAST(SUM(tq) AS DOUBLE) / 1000.0) AS BIGINT)")
        .alias("kl_e6"),
    )


# ---------------------------------------------------------------------------
# Platt scaling by exact grid search (classifier-score calibration)
# ---------------------------------------------------------------------------
_PLATT_S = (
    "((CAST(ka AS DOUBLE) * 0.005) * (xb * 10 + 5)"
    " + CAST(kb AS DOUBLE) * 0.5)"
)


def _platt_term(dialect: str) -> str:
    """Per-(cell, bucket) log-loss contribution as an EXACT integer:
    counts x floor(1e9 * ln(1+exp(±s))) with the portable exp/ln, so
    cross-bucket sums are order-free BIGINT sums and the argmin is an
    exact integer comparison."""
    lpos = portable_ln_sql(
        "1.0 + " + portable_exp_sql(f"-({_PLATT_S})", dialect, "pep"),
        dialect,
        "plp",
    )
    lneg = portable_ln_sql(
        "1.0 + " + portable_exp_sql(f"({_PLATT_S})", dialect, "pen"),
        dialect,
        "plq",
    )
    return (
        f"n_pos * CAST(floor(1000000000.0 * {lpos}) AS BIGINT)"
        f" + n_neg * CAST(floor(1000000000.0 * {lneg}) AS BIGINT)"
    )


@register(
    "platt_scaling_grid",
    # Hash contract (born hardened, r12 convention): the entire fit is
    # exact integer arithmetic past the portable exp/ln — bucket
    # counts are exact, per-cell losses are order-free BIGINT sums of
    # per-term 1e-9 grains, and the (a, b) argmin is an integer
    # comparison with an (ka, kb) tiebreak. No ROUND, no libm, no
    # accumulation-order dependence anywhere.
    oracle=f"""
    WITH counts AS (
      SELECT CAST(floor(value / 10) AS BIGINT) AS xb,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_neg
      FROM events GROUP BY 1
    ),
    cells AS (
      SELECT xb, n_pos, n_neg, ka.ka, kb.kb
      FROM counts,
           LATERAL (SELECT unnest(generate_series(-4, 4)) AS ka) ka,
           LATERAL (SELECT unnest(generate_series(-6, 6)) AS kb) kb
    ),
    losses AS (
      SELECT ka, kb, CAST(SUM({_platt_term("duckdb")}) AS BIGINT) AS loss_e9
      FROM cells GROUP BY ka, kb
    )
    SELECT CAST(ka AS BIGINT) AS ka, CAST(kb AS BIGINT) AS kb, loss_e9
    FROM losses
    ORDER BY loss_e9, ka, kb
    LIMIT 5
    """,
    survey_ids=("B56", "B19", "B43"),
    description="Platt sigmoid calibration: exact-integer log-loss grid, top-5 (a,b) cells",
)
def platt_scaling_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Calibrate a raw score into a probability with Platt scaling
    (sigmoid(a*x+b)), fit by exact grid search over 9x13 (a, b)
    candidates (a = 0.005*ka, b = 0.5*kb) minimizing binomial
    log-loss of 'this event is a purchase' given the event value —
    the post-hoc calibration step every quality-classifier pipeline
    runs before thresholding scores into keep/drop decisions
    (quality_classifier_inference emits the scores; this fits the
    probability map; calibration_ece_bins audits it).

    Scale shape (the quantile_regression_grid recipe): the stream
    reduces to a BOUNDED (score-bucket, label) count histogram in one
    map-side-combined shuffle; the 117-cell grid fans out from that
    tiny table map-side (explode of two literal sequences — no join);
    per-cell losses are integer sums over <=50 buckets; the argmin is
    a 117-row TakeOrdered. Nothing past the first reduce scales with
    the data.
    """
    ev = t(spark, sf, "events")
    counts = ev.groupBy(
        F.floor(F.col("value") / 10).cast("bigint").alias("xb")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("event_type") == "purchase", 0).otherwise(1))
        .cast("bigint")
        .alias("n_neg"),
    )
    cells = counts.select(
        "xb",
        "n_pos",
        "n_neg",
        F.explode(F.sequence(F.lit(-4), F.lit(4))).alias("ka"),
    ).select("*", F.explode(F.sequence(F.lit(-6), F.lit(6))).alias("kb"))
    losses = (
        cells.withColumn("t", F.expr(_platt_term("spark")))
        .groupBy("ka", "kb")
        .agg(F.sum("t").cast("bigint").alias("loss_e9"))
    )
    return (
        losses.orderBy("loss_e9", "ka", "kb")
        .limit(5)
        .select(
            F.col("ka").cast("bigint").alias("ka"),
            F.col("kb").cast("bigint").alias("kb"),
            "loss_e9",
        )
    )


# ---------------------------------------------------------------------------
# Bigram entropy rate: how much does one word of context buy?
# ---------------------------------------------------------------------------
@register(
    "entropy_rate_bigram",
    # Hash contract (born hardened, r12 convention): all probabilities
    # are exact bigram/context count ratios through the portable ln,
    # quantized per bigram type to integer 1e-9 grains, so the two
    # entropy sums are order-free BIGINT sums; the final division and
    # floor are correctly rounded double ops on identical inputs.
    oracle=f"""
    WITH d AS (
      SELECT string_split_regex(lower(text), '\\s+') AS tk FROM documents
    ),
    bi AS (
      SELECT tk[i] AS w1, tk[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) s
      WHERE tk[i] <> '' AND tk[i+1] <> ''
      GROUP BY 1, 2
    ),
    ctx AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bi GROUP BY w1
    ),
    tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM bi),
    tgt AS (
      SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM bi GROUP BY w2
    ),
    cond AS (
      SELECT CAST(SUM(CAST(floor(1000000000.0 *
               ((CAST(c12 AS DOUBLE) / n) * {portable_ln_sql(
                   "CAST(c12 AS DOUBLE) / c1", "duckdb")})) AS BIGINT))
             AS BIGINT) AS hc_e9,
             CAST(COUNT(*) AS BIGINT) AS n_bigram_types
      FROM bi JOIN ctx USING (w1), tot
    ),
    marg AS (
      SELECT CAST(SUM(CAST(floor(1000000000.0 *
               ((CAST(c2 AS DOUBLE) / n) * {portable_ln_sql(
                   "CAST(c2 AS DOUBLE) / n", "duckdb", "pm")})) AS BIGINT))
             AS BIGINT) AS hm_e9
      FROM tgt, tot
    )
    SELECT tot.n AS n_bigrams,
           cond.n_bigram_types,
           CAST(floor(CAST(-hc_e9 AS DOUBLE) / 1000.0) AS BIGINT)
             AS h_cond_e6,
           CAST(floor(CAST(-hm_e9 AS DOUBLE) / 1000.0) AS BIGINT)
             AS h_marg_e6
    FROM cond, marg, tot
    """,
    survey_ids=("B56", "B16", "B43"),
    description="Bigram entropy rate H(w2|w1) vs marginal H(w2): the context-information audit",
)
def entropy_rate_bigram(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus's bigram entropy rate H(w2|w1) = -sum p(w1,w2)
    ln p(w2|w1), next to the context-free marginal H(w2): their gap is
    the mutual information one word of context buys — near zero flags
    shuffled/templated text, a large gap is real language structure.
    The distributional sibling of char_entropy_docs (per-doc,
    characters) at the corpus level (tokens, with context).

    Scale shape: one bigram-count shuffle (map-side combined,
    vocabulary-of-bigrams-sized output); context and target margins
    re-aggregate FROM the bigram table (never a second corpus pass);
    the 1-row total broadcasts; per-type contributions quantize to
    integer 1e-9 grains so both entropy sums are order-free BIGINT
    sums over the type table.
    """
    docs = t(spark, sf, "documents")
    bi = (
        docs.select(F.split(F.lower(F.col("text")), r"\s+").alias("tk"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(tk[i - 1] AS w1, tk[i] AS w2))"
                )
            ).alias("p")
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    bi = bi.persist()
    ctx = bi.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    tgt = bi.groupBy("w2").agg(F.sum("c12").cast("bigint").alias("c2"))
    tot = bi.agg(F.sum("c12").cast("bigint").alias("n"))
    cond = (
        bi.join(ctx, "w1")
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(1000000000.0 * ((CAST(c12 AS DOUBLE) / n) * "
                    + portable_ln_sql("CAST(c12 AS DOUBLE) / c1", "spark")
                    + ")) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("hc_e9"),
            F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"),
        )
    )
    marg = (
        tgt.join(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(1000000000.0 * ((CAST(c2 AS DOUBLE) / n) * "
                    + portable_ln_sql(
                        "CAST(c2 AS DOUBLE) / n", "spark", "pm"
                    )
                    + ")) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("hm_e9")
        )
    )
    return (
        cond.join(F.broadcast(marg))
        .join(F.broadcast(tot))
        .select(
            F.col("n").alias("n_bigrams"),
            "n_bigram_types",
            F.expr("CAST(floor(CAST(-hc_e9 AS DOUBLE) / 1000.0) AS BIGINT)")
            .alias("h_cond_e6"),
            F.expr("CAST(floor(CAST(-hm_e9 AS DOUBLE) / 1000.0) AS BIGINT)")
            .alias("h_marg_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence: each language vs the English slice
# ---------------------------------------------------------------------------
def _js_term(dialect: str) -> str:
    """Per-term JS contribution 0.5*p*ln(p/m) + 0.5*q*ln(q/m) with
    m = (p+q)/2, zero-guarded per side, in shared portable-ln text.
    Scope columns: ce/cl (nullable counts), ne/nl (totals)."""
    ln = portable_ln_sql
    p = "(CAST(COALESCE(ce, 0) AS DOUBLE) / ne)"
    q = "(CAST(COALESCE(cl, 0) AS DOUBLE) / nl)"
    m = f"(0.5 * ({p} + {q}))"
    return (
        f"(CASE WHEN COALESCE(ce, 0) > 0"
        f" THEN 0.5 * {p} * {ln(f'{p} / {m}', dialect, 'pja')}"
        f" ELSE 0.0 END)"
        f" + (CASE WHEN COALESCE(cl, 0) > 0"
        f" THEN 0.5 * {q} * {ln(f'{q} / {m}', dialect, 'pjb')}"
        f" ELSE 0.0 END)"
    )


@register(
    "js_divergence_lang_pairs",
    # Hash contract (born hardened, r12 convention): exact counts,
    # portable ln, per-term integer 1e-9 quantization, order-free
    # BIGINT sums. JS is symmetric and bounded by ln 2, so js_e6 lands
    # in [0, 693147] — a calibrated cross-language distance.
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT lang, tok AS term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    en AS (SELECT term, c AS ce FROM cnt WHERE lang = 'en'),
    ent AS (SELECT CAST(SUM(ce) AS BIGINT) AS ne FROM en),
    oth AS (SELECT lang, term, c AS cl FROM cnt WHERE lang <> 'en'),
    otot AS (
      SELECT lang, CAST(SUM(cl) AS BIGINT) AS nl FROM oth GROUP BY lang
    ),
    langs AS (SELECT DISTINCT lang FROM oth),
    enx AS (SELECT langs.lang, en.term, en.ce FROM langs CROSS JOIN en),
    grid AS (
      SELECT COALESCE(enx.lang, oth.lang) AS lang,
             COALESCE(enx.term, oth.term) AS term,
             enx.ce, oth.cl
      FROM enx FULL OUTER JOIN oth
        ON enx.lang = oth.lang AND enx.term = oth.term
    ),
    terms AS (
      SELECT g.lang,
             CAST(floor(1000000000.0 * ({_js_term("duckdb")})) AS BIGINT)
               AS tq
      FROM grid g JOIN otot ON g.lang = otot.lang, ent
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_union_terms,
           CAST(floor(CAST(SUM(tq) AS DOUBLE) / 1000.0) AS BIGINT) AS js_e6
    FROM terms
    GROUP BY lang
    """,
    survey_ids=("B56", "B12", "B43"),
    description="Jensen-Shannon divergence of each language's unigram distribution vs English",
)
def js_divergence_lang_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric, bounded (ln 2) distributional distance between each
    language's unigram distribution and the English slice — the
    calibrated companion of kl_divergence_sources (KL is asymmetric
    and unbounded; JS is the metric-like one used to order corpus
    slices by drift, e.g. picking transfer-learning sources).

    Scale shape: one (lang, term) count shuffle (vocabulary-sized
    after map-side combine); the union support per pair comes from a
    |langs| x |en-vocab| fan-out FULL OUTER joined to the other-lang
    counts — every table past the first reduce is vocabulary-bounded;
    per-term contributions quantize to integer 1e-9 grains so
    per-language sums are order-free BIGINT sums.
    """
    docs = t(spark, sf, "documents")
    cnt = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cnt = cnt.persist()
    en = cnt.filter(F.col("lang") == "en").select(
        "term", F.col("c").alias("ce")
    )
    ent = en.agg(F.sum("ce").cast("bigint").alias("ne"))
    oth = cnt.filter(F.col("lang") != "en").select(
        "lang", "term", F.col("c").alias("cl")
    )
    otot = oth.groupBy("lang").agg(F.sum("cl").cast("bigint").alias("nl"))
    langs = oth.select("lang").distinct()
    enx = langs.crossJoin(en)
    grid = enx.join(oth, ["lang", "term"], "full_outer")
    terms = (
        grid.join(otot, "lang")
        .join(F.broadcast(ent))
        .select(
            "lang",
            F.expr(
                "CAST(floor(1000000000.0 * ("
                + _js_term("spark")
                + ")) AS BIGINT)"
            ).alias("tq"),
        )
    )
    return terms.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_terms"),
        F.expr("CAST(floor(CAST(SUM(tq) AS DOUBLE) / 1000.0) AS BIGINT)")
        .alias("js_e6"),
    )


# ---------------------------------------------------------------------------
# Dictionary-encoding audit: storage planning for low-cardinality columns
# ---------------------------------------------------------------------------
def _dict_audit_sql(label: str, table: str, col: str) -> str:
    """One column's dictionary-encoding estimate, all exact integers:
    plain bytes = total string bytes; dict bytes = distinct-value
    bytes + n * ceil(log2(d)) bits packed to bytes (ceil(log2 d) via
    the bit-length of d-1 — no floating log anywhere)."""
    return f"""
    SELECT '{label}' AS column_name,
           n_rows, n_distinct, plain_bytes,
           dict_bytes + CAST((n_rows * bits + 7) // 8 AS BIGINT)
             AS dict_est_bytes
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
             CAST(SUM(strlen({col})) AS BIGINT) AS plain_bytes,
             (SELECT CAST(SUM(strlen(v)) AS BIGINT)
              FROM (SELECT DISTINCT {col} AS v FROM {table}))
               AS dict_bytes,
             CASE WHEN COUNT(DISTINCT {col}) <= 1 THEN CAST(1 AS BIGINT)
                  ELSE CAST(length(bin(CAST(COUNT(DISTINCT {col}) - 1
                                            AS BIGINT))) AS BIGINT)
             END AS bits
      FROM {table}
    )
    """


@register(
    "dictionary_encoding_audit",
    # Exact-integer contract end to end: counts, byte totals, and the
    # code bit-width ceil(log2 d) derived from the BINARY STRING
    # length of d-1 — no floating point anywhere, so the hash is
    # trivially build-invariant.
    oracle=" UNION ALL ".join(
        [
            _dict_audit_sql("orders.o_orderpriority", "orders", "o_orderpriority"),
            _dict_audit_sql("orders.o_orderstatus", "orders", "o_orderstatus"),
            _dict_audit_sql("customer.c_mktsegment", "customer", "c_mktsegment"),
            _dict_audit_sql("documents.lang", "documents", "lang"),
            _dict_audit_sql("documents.source", "documents", "source"),
        ]
    ),
    survey_ids=("B16", "B20", "B36"),
    description="Dictionary-encoding benefit estimate for five low-cardinality string columns",
)
def dictionary_encoding_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Storage planning at 100 TB: for each low-cardinality string
    column, the exact bytes it occupies plain vs a dictionary estimate
    (distinct-value bytes + n rows x ceil(log2 d) bits, bit-packed) —
    the audit that decides which columns to dictionary-encode /
    Z-order before the big rewrite. Pure integer counting: one
    map-side-combined aggregate plus a distinct-value byte total per
    column; nothing floats.

    Scale shape: per column, a global aggregate with a distinct-count
    (Spark plans the standard two-phase partial distinct) and a
    distinct-value reduce whose output is dictionary-sized. The five
    audited columns union to a 5-row result.
    """

    def one(label: str, df: DataFrame, col: str) -> DataFrame:
        base = df.select(F.col(col).alias("v"))
        agg = base.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.sum(F.length("v")).cast("bigint").alias("plain_bytes"),
        )
        dictb = (
            base.distinct()
            .agg(F.sum(F.length("v")).cast("bigint").alias("dict_bytes"))
        )
        joined = agg.join(F.broadcast(dictb)).withColumn(
            "bits",
            F.when(F.col("n_distinct") <= 1, F.lit(1).cast("bigint"))
            .otherwise(F.length(F.bin(F.col("n_distinct") - 1)).cast("bigint")),
        )
        return joined.select(
            F.lit(label).alias("column_name"),
            "n_rows",
            "n_distinct",
            "plain_bytes",
            F.expr(
                "dict_bytes + CAST((n_rows * bits + 7) div 8 AS BIGINT)"
            ).alias("dict_est_bytes"),
        )

    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    d = t(spark, sf, "documents")
    return (
        one("orders.o_orderpriority", o, "o_orderpriority")
        .unionAll(one("orders.o_orderstatus", o, "o_orderstatus"))
        .unionAll(one("customer.c_mktsegment", c, "c_mktsegment"))
        .unionAll(one("documents.lang", d, "lang"))
        .unionAll(one("documents.source", d, "source"))
    )
