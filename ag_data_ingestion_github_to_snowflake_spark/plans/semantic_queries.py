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
    oracle=None,  # iterative, driver-coordinated argmax loop: rows-only
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
