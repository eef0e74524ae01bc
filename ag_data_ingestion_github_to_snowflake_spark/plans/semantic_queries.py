"""Semantic-curation queries: SemDeDup embedding dedup and BPE
tokenizer-merge training.

Two training-data pipeline stages from the published LLM-curation
literature, expressed Spark-first:

- SemDeDup (Abbas et al. 2023): cluster-pruned cosine dedup —
  ``operators/semdedup.py``. The fixed-centroid variant is fully
  deterministic, so the whole pipeline (assignment, within-cell pairs,
  keep rule) replays in a DuckDB oracle with the centroid float64
  literals inlined.
- BPE merge training (Sennrich et al. 2016): the iterative
  most-frequent-pair loop — ``operators/bpe.py``. Driver-coordinated
  and iterative (one distributed aggregation per merge), hence
  rows-only in the registry; exact-verified against a pure-Python
  reference in ``tests/test_bpe.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators import bpe as B
from ag_data_ingestion_github_to_snowflake_spark.operators import semdedup as SD
from ag_data_ingestion_github_to_snowflake_spark.operators.portable_math import (
    floor_e6,
    floor_e6_sql,
    ordered_sum,
    ordered_sum_sql,
    portable_ln_sql,
    portable_log10_sql,
)
from ag_data_ingestion_github_to_snowflake_spark.plans.pca_literals import (
    PCA_COMPS,
    PCA_MEAN,
)
from ag_data_ingestion_github_to_snowflake_spark.catalog import parallelize_cpu_scan
from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t

_DIM = 64
_N_CELLS = 8
_SEED = 31
_EPS = 0.95
_CENTS = SD.fixed_unit_centroids(_DIM, _N_CELLS, seed=_SEED)

# The fixture has no natural near-dups (max pairwise cosine ~0.47 —
# see embedding_near_dup), so the corpus is seeded with deterministic
# near-copies: shifted ids, first component nudged by +0.05. Both
# engines build the copies with the identical double arithmetic, and
# eps=0.95 cleanly separates seeded pairs (cosine ~0.9999) from the
# natural background.
_CORPUS_CTE = """corpus AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      FROM embeddings WHERE vec_id < 150
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             [CAST(embedding[1] AS DOUBLE) + 0.05]
               || [CAST(x AS DOUBLE) FOR x IN embedding[2:]] AS v
      FROM embeddings WHERE vec_id < 150
    )"""


@register(
    "semdedup_embeddings",
    oracle=SD.semdedup_oracle_sql(_CORPUS_CTE, _CENTS, _EPS),
    survey_ids=("B54", "B55", "B10"),
    description="SemDeDup: cluster-pruned cosine dedup flags over a seeded corpus",
)
def semdedup_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup over embeddings seeded with near-duplicate copies:
    map-side nearest-fixed-centroid assignment, ONE within-cell
    pair shuffle, lower-id keep rule — ``operators/semdedup.py``."""
    base = (
        t(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 150)
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )
    # r13: the per-row centroid-dot folds and the within-cell pair
    # cosines are the cost; a single-row-group fixture scan runs them
    # on one task (wp_tail: 8 tasks, 4.6 s exec). Layout-derived
    # repartition — no-op when the source splits (guide §2.5).
    base = parallelize_cpu_scan(base, spark, sf, "embeddings")
    pert = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at(F.col("embedding"), 1) + F.lit(0.05)),
            F.slice(F.col("embedding"), 2, _DIM - 1),
        ).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    return SD.semdedup(corpus, _CENTS, eps=_EPS)


@register(
    "bpe_train_merges",
    # DECIDED rows-only (final, r10): BPE training is an inherently
    # iterative argmax loop (merge k+1 depends on the corpus rewritten
    # by merge k) — not expressible as one SQL statement in either
    # engine. Correctness evidence: exact-verified against a
    # pure-Python reference in tests/test_bpe.py, and the APPLY side
    # (`bpe_apply_tokenize`-family) is oracle-pinned.
    oracle=None,
    survey_ids=("B56", "B41", "B16"),
    description="BPE tokenizer training: first 6 merge rules over the document corpus",
)
def bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Learn the first 6 BPE merges on documents (doc_id < 200) — one
    pair-count aggregation per merge over the distinct-word table,
    map-side fold rewrite; exact-verified vs a pure-Python reference
    in ``tests/test_bpe.py``."""
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return B.train_bpe_merges(spark, docs, n_merges=6)


# ---------------------------------------------------------------------------
# Product quantization ANN (operators/pq.py)
# ---------------------------------------------------------------------------
_PQ_M = 4
_PQ_K = 8
_PQ_CODEBOOKS = None  # built lazily: import-time cost is 4*8*16 sins


def _pq_books():
    global _PQ_CODEBOOKS
    if _PQ_CODEBOOKS is None:
        from ag_data_ingestion_github_to_snowflake_spark.operators import pq as PQ

        _PQ_CODEBOOKS = PQ.pq_codebooks(_DIM, _PQ_M, _PQ_K, seed=57)
    return _PQ_CODEBOOKS


def _pq_oracle() -> str:
    from ag_data_ingestion_github_to_snowflake_spark.operators import pq as PQ

    return PQ.pq_oracle_sql(
        """corpus AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      FROM embeddings
    )""",
        "vec_id < 10",
        _pq_books(),
        topk=5,
    )


@register(
    "similarity_pq_adc",
    oracle=_pq_oracle(),
    survey_ids=("B55", "B41", "B43"),
    description="Product-quantization ADC top-5 (FAISS PQ shape), codes + tables replayed",
)
def similarity_pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    """PQ-compressed ANN: 64 floats -> 4 codes; per-query ADC distance
    tables built once, candidates pay 4 array lookups each —
    ``operators/pq.py``. Encoding, tables, lookups, and ranking all
    replayed by the DuckDB oracle with codebook literals inlined."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import pq as PQ

    emb = t(spark, sf, "embeddings")
    # r13: PQ encode is 4 codebooks x 8 cells x 16-dim folds PER ROW —
    # parallelize the corpus side when the layout under-splits; the
    # 10-row query side stays on the un-repartitioned scan.
    corpus = parallelize_cpu_scan(emb, spark, sf, "embeddings")
    return PQ.pq_adc_topk(
        corpus, emb.filter(F.col("vec_id") < 10), _pq_books(), topk=5
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (storage-dedup boundary detection)
# ---------------------------------------------------------------------------
@register(
    "cdc_chunk_boundaries",
    oracle="""
    WITH raw AS (
      SELECT doc_id, unnest(sl, recursive := true)
      FROM (
        SELECT doc_id,
               [{'pos': i, 'tok': tk[i]} FOR i IN range(1, len(tk) + 1)] AS sl
        FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
              FROM documents WHERE doc_id < 300)
      )
    ),
    toks AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''),
    flagged AS (
      SELECT doc_id, tok, pos,
             CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 16 = 0
                  THEN 1 ELSE 0 END AS bnd
      FROM toks
    ),
    chunked AS (
      SELECT doc_id, tok, pos,
             COALESCE(SUM(bnd) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM flagged
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
    FROM chunked
    GROUP BY doc_id, chunk_id
    """,
    survey_ids=("B56", "B53", "B29"),
    description="Content-defined chunking: hash-gated boundaries, per-chunk dedup hashes",
)
def cdc_chunk_boundaries(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/dedup-storage trick):
    a chunk boundary falls after any token whose 60-bit hash is 0 mod
    16, so boundaries survive insertions/deletions — unlike fixed-size
    passage chunks (``passage_dedup_chunks``), an edit reflows only
    its own chunk. Per-chunk md5 makes chunks the dedup unit.

    One shuffle keyed by doc_id (the boundary prefix-sum window); the
    chunk reassembly groups on (doc_id, chunk_id) which is a prefix of
    the same key — AQE reuses the exchange. Expected chunk length is
    the gate modulus (16 tokens).
    """
    from pyspark.sql import Window

    from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import (
        md5_hash60,
    )

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("pos0", "tok"),
    ).filter(F.col("tok") != "")
    flagged = toks.select(
        "doc_id",
        "tok",
        (F.col("pos0") + 1).alias("pos"),
        F.when(F.pmod(md5_hash60(F.col("tok")), F.lit(16)) == 0, 1)
        .otherwise(0)
        .alias("bnd"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = flagged.withColumn(
        "chunk_id", F.coalesce(F.sum("bnd").over(w), F.lit(0)).cast("bigint")
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal
# ---------------------------------------------------------------------------
def _entropy_term(dialect: str) -> str:
    p = "(CAST(cnt AS DOUBLE) / n_chars)"
    return f"{p} * {portable_ln_sql(p, dialect)}"


@register(
    "char_entropy_docs",
    # Hash contract (hardened r12, item 5): portable ln over exact
    # count ratios, per-doc sum as a ch-ORDERED fold, floor(1e6*H)
    # presentation — no libm/ROUND/order dependence in the hash.
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, c.ch
      FROM documents,
           LATERAL unnest(string_split(lower(text), '')) AS c(ch)
      WHERE doc_id < 300
    ),
    counts AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS distinct_chars
      FROM counts GROUP BY doc_id
    ),
    terms AS (
      SELECT c.doc_id, t.n_chars, t.distinct_chars, c.ch,
             {_entropy_term("duckdb")} AS term
      FROM counts c JOIN tot t ON c.doc_id = t.doc_id
    )
    SELECT doc_id, n_chars, distinct_chars,
           {floor_e6_sql("-" + ordered_sum_sql("term", "ch"))} AS entropy_e6
    FROM terms GROUP BY doc_id, n_chars, distinct_chars
    """,
    survey_ids=("B56", "B16", "B43"),
    description="Per-doc character entropy (nats): the CCNet-style gibberish signal",
)
def char_entropy_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy of the character distribution per document —
    low entropy flags boilerplate/repetition, high entropy flags
    binary-ish noise (the quality-filter signal family of
    CCNet/RedPajama). One explode + two aggregations on the same
    doc_id key; the per-doc sum folds in ch order over the portable
    ln (bit-identical cross-engine), presented as floor(1e6*H).
    The per-doc distinct-char alphabet is bounded, so the collected
    fold list never scales with corpus size."""
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    counts = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), "")).alias("ch")
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chars"),
    )
    return (
        counts.join(tot, "doc_id")
        .withColumn("term", F.expr(_entropy_term("spark")))
        .groupBy("doc_id", "n_chars", "distinct_chars")
        .agg(
            floor_e6(-ordered_sum(F.col("term"), "ch")).alias("entropy_e6")
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION (the oracle-checked inference-side twin of
# the rows-only training loop)
# ---------------------------------------------------------------------------
_APPLY_MERGES = [("e", "</w>"), ("e", "r"), ("er", "</w>")]


def _bpe_apply_oracle() -> str:
    sym = "string_split(tok, '') || ['</w>']"
    expr = B.bpe_apply_oracle_expr(sym, _APPLY_MERGES)
    return f"""
    WITH words AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents WHERE doc_id < 200
      ) WHERE tok <> ''
    ),
    merged AS (
      SELECT doc_id, {expr} AS sym FROM words
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(sym)) AS BIGINT) AS n_tokens
    FROM merged GROUP BY doc_id
    """


@register(
    "bpe_apply_tokenize",
    oracle=_bpe_apply_oracle(),
    survey_ids=("B56", "B41", "B16"),
    description="BPE merge-table application (cascading fixed merges), fold replayed in SQL",
)
def bpe_apply_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer INFERENCE: apply a fixed merge table (cascading —
    'er' exists only after ('e','r') fires) to every word as a
    composition of map-side array folds, then count tokens per doc.
    The DuckDB oracle replays the exact left-to-right non-overlapping
    fold via list_reduce (``operators/bpe.py:bpe_apply_oracle_expr``),
    so the rows-only training loop's REWRITE primitive is itself
    oracle-pinned. Shuffle-free until the final doc_id aggregation."""
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    sym = F.concat(F.split(F.col("tok"), ""), F.array(F.lit(B.END_OF_WORD)))
    merged = words.select(
        "doc_id", B.apply_bpe_merges_expr(sym, _APPLY_MERGES).alias("sym")
    )
    return merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.size("sym")).cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------
@register(
    "dsir_importance_sample",
    # Hash contract (hardened r12, item 5): portable ln log-ratios,
    # bucket-ORDERED per-doc fold, floor(1e6*w) presentation; the
    # top-50 rank orders by the bit-identical raw double.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 64 AS bucket
      FROM (
        SELECT doc_id, lang, unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents WHERE doc_id < 400
      ) WHERE tok <> ''
    ),
    db AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, bucket
    ),
    tgt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM toks
      WHERE lang = 'en' GROUP BY bucket
    ),
    prop AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cp FROM toks GROUP BY bucket
    ),
    tot AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM toks WHERE lang = 'en') AS nt,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS np
    ),
    ratios AS (
      SELECT p.bucket,
             {portable_ln_sql(
                 "(CAST(COALESCE(t.ct, 0) AS DOUBLE) + 1.0)"
                 " / (CAST(tot.nt AS DOUBLE) + 64.0)", "duckdb", "plt")}
           - {portable_ln_sql(
                 "(CAST(p.cp AS DOUBLE) + 1.0)"
                 " / (CAST(tot.np AS DOUBLE) + 64.0)", "duckdb", "plp")} AS lr
      FROM prop p LEFT JOIN tgt t ON p.bucket = t.bucket, tot
    ),
    w AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             {ordered_sum_sql("CAST(c AS DOUBLE) * lr", "bucket")} AS lw
      FROM (SELECT db.doc_id, db.bucket, db.c, r.lr
            FROM db JOIN ratios r ON db.bucket = r.bucket)
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, {floor_e6_sql("lw")} AS log_weight_e6 FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY lw DESC, doc_id) AS rnk
      FROM w
    ) WHERE rnk <= 50
    """,
    survey_ids=("B56", "B16", "B43"),
    description="DSIR importance weights: hashed-ngram LM ratio, top-50 selection",
)
def dsir_importance_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): importance weight per document = sum over
    hashed token buckets of count * log(p_target/p_proposal), with
    Laplace-smoothed bucket unigram LMs (target = the English slice,
    proposal = the full corpus). The published recipe for selecting
    web data that "looks like" a target domain without training a
    classifier.

    Dataflow: one explode -> (doc, bucket) count shuffle; the 64-row
    bucket ratio table broadcasts onto it; one doc aggregation; top-50
    total-order window. Per-doc sums are count * log-ratio over <= 64
    terms (not per-token adds), so float noise sits far below the
    floor-1e6 quantization grain at any scale."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import (
        md5_hash60,
    )
    from pyspark.sql import Window

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "").select(
        "doc_id", "lang", F.pmod(md5_hash60(F.col("tok")), F.lit(64)).alias("bucket")
    )
    db = toks.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tgt = toks.filter(F.col("lang") == "en").groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    prop = toks.groupBy("bucket").agg(F.count(F.lit(1)).cast("bigint").alias("cp"))
    nt = toks.filter(F.col("lang") == "en").count()
    np_ = toks.count()
    # Mirror the oracle's arithmetic exactly: integer totals cast to
    # double inside the expression (not pre-folded in Python), portable
    # ln so the log-ratio is bit-identical cross-engine.
    lr = F.expr(
        portable_ln_sql(
            "(CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0)"
            f" / (CAST({int(nt)} AS DOUBLE) + 64.0)",
            "spark",
            "plt",
        )
        + " - "
        + portable_ln_sql(
            "(CAST(cp AS DOUBLE) + 1.0)"
            f" / (CAST({int(np_)} AS DOUBLE) + 64.0)",
            "spark",
            "plp",
        )
    )
    ratios = prop.join(tgt, "bucket", "left").select("bucket", lr.alias("lr"))
    w = (
        db.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            ordered_sum(
                F.col("c").cast("double") * F.col("lr"), "bucket"
            ).alias("lw"),
        )
    )
    # Top-50 via orderBy().limit(): Catalyst plans TakeOrderedAndProject
    # (per-partition partial top-k merged on the driver), so no partition
    # ever holds the full per-doc weight table — unlike the previous
    # row_number() over a global-order Window, which funneled every row
    # through ONE task (the r5 100×-scale audit's worst offender).
    return (
        w.orderBy(F.desc("lw"), "doc_id")
        .limit(50)
        .select(
            "doc_id",
            "n_tokens",
            floor_e6(F.col("lw")).alias("log_weight_e6"),
        )
    )


# ---------------------------------------------------------------------------
# IVF recall, oracle-verified END TO END (the approximate path itself)
# ---------------------------------------------------------------------------
def _ivf_recall_oracle() -> str:
    """Replays the ENTIRE approximate path: fixed-centroid assignment,
    top-2 probe-cell selection, candidate generation, approximate
    top-5, exact top-5, recall@5 — so the oracle pins not just scores
    but the approximation's measured quality."""
    lits = ["[" + ", ".join(repr(x) for x in c) + "]" for c in _CENTS]
    dot_cols = ",\n             ".join(
        f"ROUND(list_sum(list_transform(list_zip(v, {lit}), x -> x[1] * x[2])), 6) AS d{j}"
        for j, lit in enumerate(lits)
    )
    best = "GREATEST(" + ", ".join(f"d{j}" for j in range(8)) + ")"
    case = "CASE " + " ".join(f"WHEN d{j} = m THEN {j}" for j in range(8)) + " END"
    cells_union = "\n      UNION ALL ".join(
        f"SELECT query_id, {j} AS cell, d{j} AS d FROM q" for j in range(8)
    )
    cos = (
        "ROUND(list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2]))"
        " / (sqrt(list_sum(list_transform(qv, y -> y * y)))"
        " * sqrt(list_sum(list_transform(cv, y -> y * y)))), 6)"
    )
    return f"""
    WITH corpus AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id, v,
             {dot_cols}
      FROM corpus
    ),
    assigned AS (
      SELECT vec_id, v, CAST({case} AS INT) AS cell
      FROM (SELECT *, {best} AS m FROM dots)
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, * EXCLUDE (vec_id, v)
          FROM dots WHERE vec_id < 10),
    qcells AS (
      SELECT query_id, cell FROM (
        SELECT query_id, cell,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d DESC, cell) AS rn
        FROM ({cells_union})
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT qc.query_id, qq.qv, a.vec_id AS neighbor_id, a.v AS cv
      FROM qcells qc
      JOIN q qq ON qq.query_id = qc.query_id
      JOIN assigned a ON a.cell = qc.cell AND a.vec_id <> qc.query_id
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY {cos} DESC, neighbor_id) AS rn
        FROM cand
      ) WHERE rn <= 5
    ),
    allpairs AS (
      SELECT qq.query_id, qq.qv, c.vec_id AS neighbor_id, c.v AS cv
      FROM q qq JOIN corpus c ON c.vec_id <> qq.query_id
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY {cos} DESC, neighbor_id) AS rn
        FROM allpairs
      ) WHERE rn <= 5
    ),
    inter AS (
      SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS hits
      FROM approx a JOIN exact e
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY a.query_id
    ),
    ncand AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY query_id
    )
    SELECT n.query_id,
           ROUND(CAST(COALESCE(i.hits, 0) AS DOUBLE) / 5.0, 6) AS recall_at_5,
           n.n_candidates
    FROM ncand n LEFT JOIN inter i ON n.query_id = i.query_id
    """


@register(
    "ivf_recall_fixed_cells",
    oracle=_ivf_recall_oracle(),
    survey_ids=("B55", "B29", "B16"),
    description="IVF nprobe=2/8 recall@5 vs exact — the APPROXIMATE path oracle-verified",
)
def ivf_recall_fixed_cells(spark: SparkSession, sf: str) -> DataFrame:
    """The approximate ANN path verified END TO END: fixed-centroid
    IVF cells (replayable assignment, as in ``semdedup_embeddings``),
    top-2-of-8 probe selection per query, candidate-restricted top-5,
    and recall@5 against the exact top-5 — every stage, including the
    measured RECALL of the approximation, hash-matched by the oracle.
    This closes the usual "approximate ops are rows-only" waiver from
    the other side: the approximation is deterministic, so its quality
    is a checkable fact, not a sampled estimate. Assignment and
    scoring are map-side folds; the probe join shuffles on the cell
    id; the exact side is the LIMITed-query broadcast scan."""
    from pyspark.sql import Window

    cents = _CENTS
    emb = t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    assigned = SD.assign_cells(emb, cents)  # vec_id, v, cell
    # per-query cell scores -> top-2 probe cells
    # r13: per-cell dot folds emitted as generated SQL (one F.expr per
    # column) instead of py4j Column assembly — identical expressions,
    # build-time only (the operators/pq.py rewrite, applied here).
    dots = [
        F.expr(
            "round(aggregate(zip_with(v, array("
            + ", ".join(f"{x!r}D" for x in c)
            + "), (a, b) -> a * b), 0.0D, (acc, x) -> acc + x), 6)"
        ).alias(f"d{j}")
        for j, c in enumerate(cents)
    ]
    q = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), *dots
    )
    pairs = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                *[
                    F.struct(F.col(f"d{j}").alias("d"), F.lit(j).alias("cell"))
                    for j in range(len(cents))
                ]
            )
        ).alias("dc"),
    ).select("query_id", "qv", F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
    wq = Window.partitionBy("query_id").orderBy(F.desc("d"), "cell")
    qcells = (
        pairs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("query_id", "qv", "cell")
    )
    cos = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(F.aggregate(F.col("qv"), F.lit(0.0), lambda a, x: a + x * x))
            * F.sqrt(F.aggregate(F.col("cv"), F.lit(0.0), lambda a, x: a + x * x))
        ),
        6,
    )
    cand = qcells.join(
        assigned.select(
            F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
        ),
        "cell",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    approx = (
        cand.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    allp = (
        F.broadcast(q.select("query_id", "qv"))
        .join(
            assigned.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")),
            F.col("neighbor_id") != F.col("query_id"),
        )
    )
    exact = (
        allp.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    inter = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    ncand = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return ncand.join(inter, "query_id", "left").select(
        "query_id",
        F.round(
            F.coalesce(F.col("hits"), F.lit(0)).cast("double") / F.lit(5.0), 6
        ).alias("recall_at_5"),
        "n_candidates",
    )


# ---------------------------------------------------------------------------
# PMI collocation mining (phrase discovery for tokenizer/vocab prep)
# ---------------------------------------------------------------------------
@register(
    "pmi_collocations_topk",
    # Hash contract (hardened r12, item 5): the single ln per bigram
    # is the portable sqrt-reduction ln, so PMI doubles are
    # bit-identical cross-engine/build; the top-30 rank orders by the
    # raw double (identical), presentation is floor(1e6*pmi).
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tk FROM (
        SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
        FROM documents WHERE doc_id < 400
      )
    ),
    uni AS (
      SELECT t.t AS w, CAST(COUNT(*) AS BIGINT) AS c1
      FROM toks, LATERAL unnest(list_filter(tk, x -> x <> '')) AS t(t)
      GROUP BY t.t
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM uni),
    bi AS (
      SELECT g.g.a AS a, g.g.b AS b, CAST(COUNT(*) AS BIGINT) AS c2
      FROM toks, LATERAL unnest(
        [{{'a': tk[i], 'b': tk[i+1]}} FOR i IN range(1, len(tk))]
      ) AS g(g)
      WHERE g.g.a <> '' AND g.g.b <> ''
      GROUP BY g.g.a, g.g.b
    ),
    btot AS (SELECT CAST(SUM(c2) AS BIGINT) AS nb FROM bi),
    pmi AS (
      SELECT bi.a, bi.b, bi.c2,
             {portable_ln_sql(
                 "(CAST(bi.c2 AS DOUBLE) / btot.nb)"
                 " / ((CAST(ua.c1 AS DOUBLE) / tot.n)"
                 " * (CAST(ub.c1 AS DOUBLE) / tot.n))", "duckdb")} AS pmi
      FROM bi
      JOIN uni ua ON bi.a = ua.w
      JOIN uni ub ON bi.b = ub.w
      CROSS JOIN tot CROSS JOIN btot
      WHERE bi.c2 >= 5
    )
    SELECT a, b, c2 AS pair_count, {floor_e6_sql("pmi")} AS pmi_e6 FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rnk FROM pmi
    ) WHERE rnk <= 30
    """,
    survey_ids=("B56", "B16", "B43"),
    description="Top-30 PMI collocations (bigram association mining), exact-count replay",
)
def pmi_collocations_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Pointwise mutual information over corpus bigrams — the classic
    collocation/phrase-mining signal (vocab prep before tokenizer
    training; multi-word-entity discovery). All probabilities derive
    from exact integer counts, so the single ln() per surviving
    bigram is the portable ln (bit-identical cross-engine), emitted
    as floor(1e6*pmi).
    Dataflow: one explode each for unigrams and adjacent bigrams (the
    bigram side derived map-side with transform+posexplode), two
    count shuffles, vocabulary-sized joins AQE auto-broadcasts, a
    min-support filter BEFORE the log, top-30 total-order window."""
    from pyspark.sql import Window

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    tk = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("tk")
    )
    uni = (
        tk.select(F.explode("tk").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("bigint").alias("n"))
    bi = (
        tk.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(tk[i - 1] AS a, tk[i] AS b))"
                )
            ).alias("p")
        )
        .filter((F.col("p.a") != "") & (F.col("p.b") != ""))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    btot = bi.agg(F.sum("c2").cast("bigint").alias("nb"))
    ua = uni.select(F.col("w").alias("a"), F.col("c1").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("c1").alias("cb"))
    pmi = (
        bi.filter(F.col("c2") >= 5)
        .join(ua, "a")
        .join(ub, "b")
        .join(F.broadcast(tot))
        .join(F.broadcast(btot))
        .select(
            "a",
            "b",
            F.col("c2").alias("pair_count"),
            # Mirror the oracle text: ua.c1 -> ca, ub.c1 -> cb
            F.expr(
                portable_ln_sql(
                    "(CAST(c2 AS DOUBLE) / nb)"
                    " / ((CAST(ca AS DOUBLE) / n)"
                    " * (CAST(cb AS DOUBLE) / n))",
                    "spark",
                )
            ).alias("pmi"),
        )
    )
    # Top-30 via orderBy().limit() → TakeOrderedAndProject: partial
    # top-k per partition, merged on the driver. A web-scale vocabulary
    # yields billions of surviving bigrams; the previous global-order
    # row_number() Window pushed them all through one task.
    return (
        pmi.orderBy(F.desc("pmi"), "a", "b")
        .limit(30)
        .select(
            "a", "b", "pair_count", floor_e6(F.col("pmi")).alias("pmi_e6")
        )
    )


# ---------------------------------------------------------------------------
# Distributed PCA (embedding dimensionality reduction)
# ---------------------------------------------------------------------------
@register(
    "embedding_pca_project",
    # DECIDED rows-only (final, r10): eigendecomposition has no SQL
    # twin in DuckDB. Correctness evidence: tests/test_pca.py pins the
    # math contracts (orthonormality, variance ordering, reconstruction
    # error vs numpy full-matrix PCA, sign canonicalization), and the
    # sufficient-statistics pass is the same one `corr_matrix_lineitem`
    # (oracle-green) hash-verifies.
    oracle=None,
    survey_ids=("B51", "B55", "B43"),
    description="Distributed PCA: one stats pass, driver eigh, map-side projection",
)
def embedding_pca_project(spark: SparkSession, sf: str) -> DataFrame:
    """Project embeddings onto their top-4 principal axes —
    ``operators/pca.py``: one sufficient-statistics pass (per-partition
    dim x dim partials, ~33 KB each to the driver), a 64 x 64 driver
    eigh, a broadcast map-side projection. Output rounded to 6 for
    run-to-run stability; sign-canonicalized components make the
    result restart-deterministic.

    Emitted EXPLODED — one ``(vec_id, component_idx, value)`` row per
    component — because the harness canonicalizer hashes scalar
    columns only (an ArrayType column crashed the r6 driver row:
    ``TypeError: unhashable type: 'list'``)."""
    from ag_data_ingestion_github_to_snowflake_spark.operators import pca as P

    emb = t(spark, sf, "embeddings")
    _, comps, mean = P.pca_components(emb, k=4)
    out = P.project(emb, comps, mean)
    return out.select(
        "vec_id", F.posexplode(F.col("pc")).alias("component_idx", "value")
    ).select("vec_id", "component_idx", F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# Oracle-verified PCA projection twin (frozen component literals)
# ---------------------------------------------------------------------------
# projection = (x - mu) . c = x . c - (mu . c); the scalar offsets
# K_j = mu . c_j are computed ONCE here in Python float64 and inlined
# into both engines, so the only runtime arithmetic is the identical
# sequential left-fold dot product on each side.
_PCA_K = [
    sum(m * c for m, c in zip(PCA_MEAN, row)) for row in PCA_COMPS
]


def _pca_verified_oracle() -> str:
    cols = []
    for j, row in enumerate(PCA_COMPS):
        lit = "[" + ", ".join(repr(x) for x in row) + "]"
        cols.append(
            f"ROUND(list_sum(list_transform(list_zip(v, {lit}), "
            f"x -> x[1] * x[2])) - ({_PCA_K[j]!r}), 6) AS pc{j}"
        )
    cols_sql = ",\n             ".join(cols)
    return f"""
    WITH corpus AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      FROM embeddings
    )
    SELECT vec_id,
             {cols_sql}
    FROM corpus
    """


@register(
    "embedding_pca_project_verified",
    oracle=_pca_verified_oracle(),
    survey_ids=("B55", "B43", "B41"),
    description="PCA projection onto frozen top-4 axes, hash-matched vs DuckDB",
)
def embedding_pca_project_verified(spark: SparkSession, sf: str) -> DataFrame:
    """Projection stage of ``embedding_pca_project`` with the top-4
    axes FROZEN as float64 literals (``plans/pca_literals.py``,
    computed once from the sf0.01 reference corpus via the live
    sufficient-stats + driver-eigh pipeline, pinned by
    ``tests/test_pca.py``). Freezing removes the one non-replayable
    step (eigh), so the projection itself hash-matches a DuckDB twin —
    the semdedup/PQ-codebook inline-literals pattern. Both sides
    compute x . c as the identical sequential left fold and subtract
    the same precomputed mu . c offset literal, then round to 6.

    Scale shape: pure map-side whole-stage-codegen fold per row — no
    shuffle, no UDF; at 100 TB this is a projection-pushdown scan plus
    O(k * dim) arithmetic per vector."""
    emb = t(spark, sf, "embeddings")
    # r13: axis folds emitted as generated SQL (identical expressions,
    # build-time only — the operators/pq.py rewrite).
    v = "transform(embedding, x -> CAST(x AS DOUBLE))"
    cols = []
    for j, row in enumerate(PCA_COMPS):
        axis = "array(" + ", ".join(f"{x!r}D" for x in row) + ")"
        cols.append(
            F.expr(
                f"round(aggregate(zip_with({v}, {axis}, (x, c) -> x * c), "
                f"0.0D, (acc, x) -> acc + x) - {_PCA_K[j]!r}D, 6)"
            ).alias(f"pc{j}")
        )
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# Stupid Backoff trigram LM (Brants et al. 2007)
# ---------------------------------------------------------------------------
@register(
    "stupid_backoff_trigram_lm",
    # Hash contract (hardened r12, item 5): portable log10 over exact
    # count ratios, per-doc mean as a trigram-position-ORDERED fold,
    # floor(1e6*mean) presentation.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t,
             CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS hb
      FROM documents
    ),
    c_uni AS (
      SELECT t[i] AS gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
      WHERE hb < 204 GROUP BY 1
    ),
    c_bi AS (
      SELECT array_to_string(t[i:i+1], ' ') AS gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
      WHERE hb < 204 GROUP BY 1
    ),
    c_tri AS (
      SELECT array_to_string(t[i:i+2], ' ') AS gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
      WHERE hb < 204 GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n_tokens,
             CAST(COUNT(*) AS DOUBLE) AS v_size
      FROM c_uni
    ),
    tt AS (
      SELECT doc_id,
             array_to_string(t[i:i+2], ' ') AS k3,
             array_to_string(t[i:i+1], ' ') AS kctx2,
             array_to_string(t[i+1:i+2], ' ') AS k2,
             t[i+1] AS kctx1,
             t[i+2] AS k1
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
      WHERE hb >= 204
    ),
    scored AS (
      SELECT tt.doc_id,
             CASE WHEN t3.cnt IS NOT NULL THEN 3
                  WHEN b2.cnt IS NOT NULL THEN 2 ELSE 1 END AS lvl,
             CASE
               WHEN t3.cnt IS NOT NULL
                 THEN CAST(t3.cnt AS DOUBLE) / bctx.cnt
               WHEN b2.cnt IS NOT NULL
                 THEN 0.4 * CAST(b2.cnt AS DOUBLE) / uctx.cnt
               ELSE 0.4 * 0.4 * (COALESCE(u1.cnt, 0) + 1.0)
                    / (totals.n_tokens + totals.v_size)
             END AS s
      FROM tt
      LEFT JOIN c_tri t3 ON tt.k3 = t3.gram
      LEFT JOIN c_bi bctx ON tt.kctx2 = bctx.gram
      LEFT JOIN c_bi b2 ON tt.k2 = b2.gram
      LEFT JOIN c_uni uctx ON tt.kctx1 = uctx.gram
      LEFT JOIN c_uni u1 ON tt.k1 = u1.gram
      CROSS JOIN totals
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tri,
             CAST(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hit3,
             CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hit2,
             CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hit1,
             CAST(SUM(CAST(floor(1000000000.0 *
                 {portable_log10_sql("s", "duckdb")}) AS BIGINT))
               AS BIGINT) AS ssum_e9
      FROM scored
      GROUP BY doc_id
    )
    SELECT doc_id, n_tri, hit3, hit2, hit1,
           CAST(floor(CAST(ssum_e9 AS DOUBLE) / n_tri / 1000.0) AS BIGINT)
             AS score_e6
    FROM agg
    """,
    survey_ids=("B56", "B16", "B10", "B43"),
    description="Stupid Backoff trigram LM: train on the 80% split, score held-out docs",
)
def stupid_backoff_trigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Stupid Backoff trigram LM (Brants et al. 2007):
    n-gram counts from the deterministic 80% train split (same sha256
    gate as ``train_test_split_counts``), held-out 20% docs scored
    trigram-by-trigram through the 0.4-backoff chain, emitted as
    per-doc backoff-level hit counts (exact integers) plus the mean
    log10 score (floor-1e6 quantized, r12 convention for per-doc float
    aggregates). See ``operators/ngram_lm.py`` for the published-paper
    background and the 100 TB plan shape (one count shuffle; the
    vocabulary-sized count tables broadcast under AQE on real
    clusters; held-out scoring never sees the training corpus itself,
    only its counts).

    Measured at 100x (r9): 11.7 s, alpha +0.70 — down from 25.5 s /
    +1.19 after ngram_counts went single-pass (the counting stage was
    re-tokenizing the corpus once per order; see its docstring). The
    sf0.1 point pays ~+0.8 s of per-row stack/struct overhead for the
    14 s win at 100x — the same small-vs-target trade documented on
    streaming_dedup_events; don't "fix" it backwards."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.ngram_lm import (
        stupid_backoff_scores,
    )
    from ag_data_ingestion_github_to_snowflake_spark.plans.sampling_queries import (
        hash_bucket,
    )

    docs = t(spark, sf, "documents")
    train = docs.filter(hash_bucket(F.col("doc_id")) < 204)
    test = docs.filter(hash_bucket(F.col("doc_id")) >= 204)
    return stupid_backoff_scores(train, test, id_col="doc_id", text_col="text")


# ---------------------------------------------------------------------------
# k-NN majority-vote classification on top of exact cosine top-k
# ---------------------------------------------------------------------------
@register(
    "knn_label_majority",
    # Same determinism chain as similarity_topk_cosine: cosines round
    # to 6dp BEFORE ranking with an id tiebreak, votes are integers,
    # and the winning label breaks vote ties by ascending label.
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
             ROUND(
               list_sum(list_transform(list_zip(q.q_vec, c.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.q_vec,  v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))),
             6) AS cosine
      FROM embeddings c, q
      WHERE q.query_id <> c.vec_id
    ),
    topk AS (
      SELECT query_id, neighbor_id, label, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        FROM scored
      ) WHERE rnk <= 5
    ),
    votes AS (
      SELECT query_id, label,
             CAST(COUNT(*) AS BIGINT) AS votes,
             ROUND(AVG(cosine), 6) AS mean_cos
      FROM topk GROUP BY query_id, label
    )
    SELECT query_id, CAST(label AS BIGINT) AS pred_label, votes, mean_cos
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, label ASC) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
    survey_ids=("B55", "B32", "B16"),
    description="k-NN classification: majority label of exact cosine top-5 neighbors",
)
def knn_label_majority(spark: SparkSession, sf: str) -> DataFrame:
    """Classify query vectors by the MAJORITY LABEL of their exact
    cosine top-5 neighbors — the retrieval family's first predictive
    consumer (similarity_topk_cosine returns neighbors; this votes
    them into a label, with vote-count then ascending-label
    tiebreaks).

    Scale shape: identical to brute_force_topk (bounded query side
    broadcast against the corpus scan, per-query top-k heap via
    window-on-rounded-cosine), plus one broadcast join to recover
    neighbor labels and a |queries x labels|-row vote aggregate —
    nothing new touches data-scale rows. The IVF/PQ variants drop in
    as the candidate generator unchanged.
    """
    from ag_data_ingestion_github_to_snowflake_spark.operators.similarity import (
        brute_force_topk,
    )
    from pyspark.sql.window import Window

    emb = t(spark, sf, "embeddings")
    nbrs = brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)
    labeled = nbrs.join(
        F.broadcast(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label")
        ),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes"),
        F.round(F.avg("cosine"), 6).alias("mean_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("label").cast("bigint").alias("pred_label"),
            "votes",
            "mean_cos",
        )
    )


# ---------------------------------------------------------------------------
# Cluster topic terms: fixed-cell embedding clusters -> distinctive
# vocabulary per cluster (lift over the corpus rate)
# ---------------------------------------------------------------------------
def _cluster_topic_oracle() -> str:
    lits = ["[" + ", ".join(repr(x) for x in c) + "]" for c in _CENTS]
    dot_cols = ",\n             ".join(
        f"ROUND(list_sum(list_transform(list_zip(v, {lit}), x -> x[1] * x[2])), 6) AS d{j}"
        for j, lit in enumerate(lits)
    )
    best = "GREATEST(" + ", ".join(f"d{j}" for j in range(_N_CELLS)) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{j} = m THEN {j}" for j in range(_N_CELLS))
        + " END"
    )
    return f"""
    WITH corpus AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id, v,
             {dot_cols}
      FROM corpus
    ),
    assigned AS (
      SELECT vec_id, CAST({case} AS INT) AS cell
      FROM (SELECT *, {best} AS m FROM dots)
    ),
    doctok AS (
      SELECT DISTINCT a.cell, d.doc_id, tk AS token
      FROM assigned a
      JOIN documents d ON d.doc_id = a.vec_id,
      UNNEST(string_split_regex(d.text, '\\s+')) AS u(tk)
      WHERE tk <> ''
    ),
    ct AS (
      SELECT cell, token, CAST(COUNT(*) AS BIGINT) AS n_ct
      FROM doctok GROUP BY 1, 2
    ),
    tmarg AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM (SELECT DISTINCT doc_id, token FROM doctok) GROUP BY 1
    ),
    cmarg AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_docs
      FROM (SELECT DISTINCT cell, doc_id FROM doctok) GROUP BY cell
    ),
    scored AS (
      SELECT ct.cell, ct.token, ct.n_ct, cm.n_c, tm.n_t,
             ROUND((CAST(ct.n_ct AS DOUBLE) * cm.n_docs)
                   / (CAST(cm.n_c AS DOUBLE) * tm.n_t), 6) AS lift
      FROM ct
      JOIN cmarg cm ON cm.cell = ct.cell
      JOIN tmarg tm ON tm.token = ct.token
      WHERE ct.n_ct >= 3
    )
    SELECT cell, token, n_ct, n_c, n_t, lift
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                                   ORDER BY lift DESC, n_ct DESC, token) AS rn
      FROM scored
    ) WHERE rn <= 5
    """


@register(
    "cluster_topic_terms",
    oracle=_cluster_topic_oracle(),
    survey_ids=("B55", "B56", "B16"),
    description="Top-5 distinctive terms per embedding cluster (lift over corpus rate)",
)
def cluster_topic_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Lightweight topic modeling: assign each document's embedding to
    a fixed IVF cell (the replayable assignment from semdedup/IVF),
    then surface each cluster's most DISTINCTIVE vocabulary — tokens
    whose in-cluster document rate most exceeds their corpus rate
    (lift), the label a curation UI shows next to a cluster.

    Scale shape: assignment is map-side (centroid literals); doc-token
    pairs reduce in ONE shuffle to (cell, token) counts; margins are
    per-token and per-cell aggregates joined back EQUI (the corpus
    total rides the 8-row cell table as a window sum, so no 1-row
    cross join); the final rank partitions by cell. Lift is one double
    expression over exact counts in fixed operand order.
    """
    emb = t(spark, sf, "embeddings")
    assigned = SD.assign_cells(emb, _CENTS).select("vec_id", "cell")
    docs = t(spark, sf, "documents").select("doc_id", "text")
    doctok = (
        docs.join(assigned, docs["doc_id"] == assigned["vec_id"])
        .select(
            "cell",
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(F.split("text", r"\s+"), lambda x: x != "")
                )
            ).alias("token"),
        )
    )
    doctok = doctok.persist()
    ct = doctok.groupBy("cell", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ct")
    )
    tmarg = (
        doctok.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    )
    from pyspark.sql.window import Window as W

    cmarg = (
        doctok.select("cell", "doc_id")
        .distinct()
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
        .withColumn(
            "n_docs", F.sum("n_c").over(W.partitionBy()).cast("bigint")
        )
    )
    scored = (
        ct.join(F.broadcast(cmarg), "cell")
        .join(tmarg, "token")
        .filter(F.col("n_ct") >= 3)
        .select(
            "cell",
            "token",
            "n_ct",
            "n_c",
            "n_t",
            F.round(
                (F.col("n_ct").cast("double") * F.col("n_docs"))
                / (F.col("n_c").cast("double") * F.col("n_t")),
                6,
            ).alias("lift"),
        )
    )
    w = W.partitionBy("cell").orderBy(F.desc("lift"), F.desc("n_ct"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("cell", "token", "n_ct", "n_c", "n_t", "lift")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of lexical and semantic
# rankings for the same query documents
# ---------------------------------------------------------------------------
@register(
    "hybrid_rank_fusion",
    # Both rankings carry full deterministic tie-breaks (overlap/cosine
    # desc, doc_id asc) before row_number; RRF = 1/(60+r_lex) +
    # 1/(60+r_sem) summed in fixed operand order over integer ranks,
    # rounded to 9 before the fused rank.
    oracle="""
    WITH qd AS (SELECT doc_id AS query_id FROM documents WHERE doc_id < 5),
    tok AS (
      SELECT DISTINCT doc_id, tk AS token
      FROM (SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tk
            FROM documents)
      WHERE tk <> ''
    ),
    lex AS (
      SELECT q.doc_id AS query_id, c.doc_id, CAST(COUNT(*) AS BIGINT) AS overlap
      FROM tok q JOIN tok c ON c.token = q.token AND c.doc_id <> q.doc_id
      WHERE q.doc_id < 5
      GROUP BY 1, 2
    ),
    lexr AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY overlap DESC, doc_id) AS BIGINT)
               AS r_lex
      FROM lex
    ),
    corpus AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
    ),
    semr AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, doc_id) AS BIGINT)
               AS r_sem
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               ROUND(list_sum(list_transform(list_zip(q.v, c.v), x -> x[1] * x[2]))
                     / (sqrt(list_sum(list_transform(q.v, y -> y * y)))
                      * sqrt(list_sum(list_transform(c.v, y -> y * y)))), 6)
                 AS cosine
        FROM corpus q JOIN corpus c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      )
    ),
    fused AS (
      SELECT COALESCE(l.query_id, s.query_id) AS query_id,
             COALESCE(l.doc_id, s.doc_id) AS doc_id,
             l.r_lex, s.r_sem,
             ROUND(COALESCE(1.0 / (60 + l.r_lex), 0.0)
                   + COALESCE(1.0 / (60 + s.r_sem), 0.0), 9) AS rrf
      FROM (SELECT * FROM lexr WHERE r_lex <= 20) l
      FULL OUTER JOIN (SELECT * FROM semr WHERE r_sem <= 20) s
        ON s.query_id = l.query_id AND s.doc_id = l.doc_id
    )
    SELECT query_id, doc_id, r_lex, r_sem, rrf
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= 10
    """,
    survey_ids=("B55", "B56", "B12"),
    description="Hybrid search: RRF fusion of lexical-overlap and cosine rankings, top-10/query",
)
def hybrid_rank_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval the way production search does it: rank
    candidates lexically (distinct-token overlap with the query doc)
    AND semantically (embedding cosine), keep each list's top-20, and
    fuse with reciprocal-rank fusion (Cormack et al. 2009) — RRF needs
    no score calibration between the two signals, which is exactly why
    it is the default fusion in hybrid search engines.

    Scale shape: the query set is BOUNDED (5 docs, broadcast on both
    legs — the similarity_topk_cosine convention); the lexical leg
    probes only postings of the query docs' tokens; each leg's
    per-query rank runs over its own candidate set and is cut to 20
    before the full-outer fusion join, so the fused table is
    query-sized. Ranks are integers with full tie-breaks; RRF sums two
    reciprocal terms in fixed order, rounded before the final rank.
    """
    from pyspark.sql.window import Window as W

    docs = t(spark, sf, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            )
        ).alias("token"),
    )
    qtok = tok.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    lex = (
        tok.join(F.broadcast(qtok), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
    )
    wl = W.partitionBy("query_id").orderBy(F.desc("overlap"), "doc_id")
    lexr = lex.select(
        "query_id",
        "doc_id",
        F.row_number().over(wl).cast("bigint").alias("r_lex"),
    ).filter(F.col("r_lex") <= 20)

    emb = t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    qv = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sem = (
        emb.join(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (nrm("qv") * nrm("v")), 6).alias("cosine"),
        )
    )
    ws = W.partitionBy("query_id").orderBy(F.desc("cosine"), "doc_id")
    semr = sem.select(
        "query_id",
        "doc_id",
        F.row_number().over(ws).cast("bigint").alias("r_sem"),
    ).filter(F.col("r_sem") <= 20)

    fused = lexr.join(semr, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "r_lex",
        "r_sem",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_sem")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 10)
        .select("query_id", "doc_id", "r_lex", "r_sem", "rrf")
    )
