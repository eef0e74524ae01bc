"""Distributed n-gram language model with Stupid Backoff scoring.

Brants et al. 2007 ("Large Language Models in Machine Translation")
trained 2-trillion-token n-gram LMs with exactly this shape on
MapReduce: n-gram counting is a partial-aggregated groupBy, and
"Stupid Backoff" replaces normalized Katz/Kneser-Ney backoff weights
with one fixed multiplier (0.4), which removes the held-out
normalization passes and makes the whole model two join-able count
tables — the published large-scale trade-off this engine exists to
express. (Reference parity note: the reference pipeline
/root/reference/src/extract_github_data.py has no LM surface; this is
part of the mandated training-data-pipeline extension set.)

Scale shape (100 TB corpus):
- counting: ONE corpus scan/tokenize pass emitting all orders' grams
  (r9; the per-order-explode form re-tokenized the corpus max_n
  times), ONE shuffle on (n, gram) with map-side combine — the count
  table is vocabulary-sized (orders of magnitude below corpus size).
- scoring: the test trigram stream joins the count tables BY GRAM
  STRING; the bigram/unigram tables are vocabulary-sized so AQE
  broadcasts them on real clusters, the trigram join is a plain
  shuffle hash join. The total-token count and vocabulary size ride
  one broadcast row. No driver loops, no per-row Python.

Scoring chain for a test trigram (w1 w2 w3), alpha = 0.4:

    S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)        if c(w1 w2 w3) > 0
                  = 0.4 * S(w3 | w2)              otherwise
    S(w3 | w2)    = c(w2 w3) / c(w2)              if c(w2 w3) > 0
                  = 0.4 * S(w3)                   otherwise
    S(w3)         = (c(w3) + 1) / (N + V)         (Laplace at the root
                                                   so OOV words score
                                                   > 0; documented
                                                   deviation from the
                                                   paper, which assumes
                                                   a closed vocabulary)

A trigram hit implies its context bigram was seen (it is a substring
of the same training text), so the denominators of the upper levels
are never NULL on the path that uses them.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.portable_math import (
    portable_log10_sql,
)

ALPHA = 0.4

# Most-recent cached count table (see stupid_backoff_scores): scoping
# the cache to the latest call keeps storage memory O(1) across
# repeated invocations instead of leaking one table per call.
_LIVE_CACHE: list[DataFrame] = []


def _tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization, identical to the unigram-LM and BPE
    convention (and to the DuckDB oracle's string_split_regex)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(col, r"\s+")


def ngram_counts(
    docs: DataFrame, text_col: str = "text", max_n: int = 3
) -> DataFrame:
    """(n, gram, cnt) for every order 1..max_n, single corpus pass.

    Plan shape (r9: was one scan + regex-split + explode PER ORDER —
    Spark does not share the identical split subplan across union
    branches, so max_n=3 tokenized the whole corpus three times; at
    100x the count stage alone measured 15.0 s, the single-pass form
    5.0 s): tokenize once, explode token POSITIONS once, emit every
    order's gram at that position from the already-split array
    (concat of the 1..max_n tokens, NULL where the window overruns),
    stack to (n, gram) rows, then ONE count shuffle with map-side
    combine. Gram volume is unchanged; the corpus scan/split work
    drops by max_n x.

    Guards: ``size(t) >= 1`` filters before ``sequence(1, size(t))``
    because sequence(1, 0) yields a DESCENDING range, and the n>1
    windows NULL out (then drop) instead of shrinking at the tail.
    """
    if not 1 <= max_n <= 3:
        raise ValueError(f"max_n must be 1..3, got {max_n}")
    toks = docs.select(_tokens(text_col).alias("t"))
    gram_exprs = {
        1: "t[i-1]",
        2: "CASE WHEN i + 1 <= size(t) THEN concat(t[i-1], ' ', t[i]) END",
        3: (
            "CASE WHEN i + 2 <= size(t)"
            " THEN concat(t[i-1], ' ', t[i], ' ', t[i+1]) END"
        ),
    }
    struct_fields = ", ".join(
        f"{gram_exprs[n]} AS g{n}" for n in range(1, max_n + 1)
    )
    stack_args = ", ".join(f"{n}, p.g{n}" for n in range(1, max_n + 1))
    return (
        toks.filter(F.size("t") >= 1)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t)), i -> struct({struct_fields}))"
                )
            ).alias("p")
        )
        .select(F.expr(f"stack({max_n}, {stack_args}) AS (n, gram)"))
        .filter(F.col("gram").isNotNull())
        .groupBy("n", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def test_trigrams(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Explode each doc into scoring rows: the trigram string plus the
    four backoff lookup keys (context bigram, backoff bigram, context
    unigram, target unigram)."""
    toks = docs.select(id_col, _tokens(text_col).alias("t"))
    return toks.filter(F.size("t") >= 3).select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2), i -> struct("
                " array_join(slice(t, i, 3), ' ') AS g3,"
                " array_join(slice(t, i, 2), ' ') AS ctx2,"
                " array_join(slice(t, i + 1, 2), ' ') AS g2,"
                # subscript t[k] is 0-based (unlike 1-based slice), so
                # with i at the trigram's 1-based start, t[i] is w2 and
                # t[i+1] is w3 — the two backoff lookup tokens.
                " t[i] AS ctx1,"
                " t[i + 1] AS g1))"
            )
        ).alias("p"),
    ).select(id_col, "p.g3", "p.ctx2", "p.g2", "p.ctx1", "p.g1")


def stupid_backoff_scores(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-test-document Stupid Backoff trigram log-score.

    Returns (id, n_tri, hit3, hit2, hit1, score_e6): how many trigrams
    resolved at each backoff level (integer, hash-exact) and the mean
    log10 Stupid Backoff score quantized by floor(1e6*x). Each
    trigram's log10 score is computed with the portable log10
    (operators/portable_math.py — bit-identical on any engine/libm
    build) and quantized PER ROW to the exact integer floor(1e9*x),
    so the per-doc sum is an order-free BIGINT sum (no collect/fold
    state) and the mean is one correctly-rounded double division +
    floor. Consumers divide score_e6 by 1e6 for the mean log10
    probability.
    """
    # Cache: the count table feeds five joins below, so recomputing the
    # n-gram explosion per consumer would be 5x the work. The returned
    # DataFrame is lazy, so this function cannot unpersist in a finally
    # (the cache would be gone before the caller executes); instead the
    # cache is SCOPED — each call evicts the previous call's table, so
    # repeated invocations (bench reps) hold at most ONE counts table
    # in storage memory. If a caller interleaves two scorings, the
    # older one silently falls back to recompute — never wrong results.
    # Eviction must never fail a FRESH call: if the SparkSession that
    # built the cached table was stopped/recreated between calls
    # (cross-test sessions, bench restarts), unpersist() on the stale
    # handle can raise — the dead session's storage is already gone.
    # Only the dead-session case is skipped (liveness probed via the
    # owning session's stopped flag; a probe that itself fails means
    # the gateway is gone and is debug-logged); a LIVE-session
    # unpersist failure propagates, because silently eating it would
    # hide a genuine storage leak.
    while _LIVE_CACHE:
        prev = _LIVE_CACHE.pop()
        try:
            owner = prev.sparkSession
            dead = owner is None or owner._jsparkSession.sparkContext().isStopped()
        except Exception as exc:  # noqa: BLE001 — gateway itself gone
            logging.getLogger(__name__).debug(
                "stale ngram count-table liveness probe failed "
                "(treating as dead session): %s", exc
            )
            continue
        if dead:
            continue  # dead session: storage already reclaimed
        prev.unpersist()  # live session: a failure here is a real leak
    counts = ngram_counts(train, text_col=text_col).cache()
    _LIVE_CACHE.append(counts)
    uni = counts.filter(F.col("n") == 1).select(
        F.col("gram").alias("u_gram"), F.col("cnt").alias("u_cnt")
    )
    bi = counts.filter(F.col("n") == 2).select(
        F.col("gram").alias("b_gram"), F.col("cnt").alias("b_cnt")
    )
    tri_c = counts.filter(F.col("n") == 3).select(
        F.col("gram").alias("t_gram"), F.col("cnt").alias("t_cnt")
    )
    totals = uni.agg(
        F.sum("u_cnt").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )

    tri = test_trigrams(test, id_col, text_col=text_col)
    j = (
        tri.join(tri_c.withColumnRenamed("t_cnt", "c3"), tri.g3 == tri_c.t_gram, "left")
        .join(
            bi.select(F.col("b_gram").alias("bg_ctx"), F.col("b_cnt").alias("c_ctx2")),
            F.col("ctx2") == F.col("bg_ctx"),
            "left",
        )
        .join(
            bi.select(F.col("b_gram").alias("bg_g2"), F.col("b_cnt").alias("c2")),
            F.col("g2") == F.col("bg_g2"),
            "left",
        )
        .join(
            uni.select(F.col("u_gram").alias("ug_ctx"), F.col("u_cnt").alias("c_ctx1")),
            F.col("ctx1") == F.col("ug_ctx"),
            "left",
        )
        .join(
            uni.select(F.col("u_gram").alias("ug_w"), F.col("u_cnt").alias("c1")),
            F.col("g1") == F.col("ug_w"),
            "left",
        )
        .join(F.broadcast(totals))
    )
    # Root score ASSOCIATION must mirror the oracle text exactly —
    # `0.4 * 0.4 * (c+1) / (n+v)` is left-associative, i.e.
    # ((0.4*0.4)*(c+1)) / (n+v). The previous form multiplied
    # alpha^2 by an ALREADY-DIVIDED ratio, a 1-ulp difference on ~1/3
    # of inputs that the per-row floor(1e9*log10(s)) contract no
    # longer absorbs (r12 code review finding; the r11-red class).
    s1 = (
        F.lit(ALPHA)
        * F.lit(ALPHA)
        * (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(1.0))
    ) / (F.col("n_tokens") + F.col("v_size"))
    score = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c_ctx2").cast("double"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(ALPHA) * F.col("c2").cast("double") / F.col("c_ctx1").cast("double"),
        )
        .otherwise(s1)
    )
    level = (
        F.when(F.col("c3").isNotNull(), F.lit(3))
        .when(F.col("c2").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    term_q = F.expr(
        "CAST(floor(1000000000.0 * "
        + portable_log10_sql("s", "spark")
        + ") AS BIGINT)"
    )
    agg = (
        j.select(id_col, score.alias("s"), level.alias("lvl"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tri"),
            F.sum((F.col("lvl") == 3).cast("bigint")).alias("hit3"),
            F.sum((F.col("lvl") == 2).cast("bigint")).alias("hit2"),
            F.sum((F.col("lvl") == 1).cast("bigint")).alias("hit1"),
            F.sum(term_q).cast("bigint").alias("ssum_e9"),
        )
    )
    return agg.select(
        id_col,
        "n_tri",
        "hit3",
        "hit2",
        "hit1",
        # double division of exact integers + floor: deterministic on
        # any build (integer `div` would differ between engines on
        # negative sums — Spark truncates, DuckDB floors).
        F.expr(
            "CAST(floor(CAST(ssum_e9 AS DOUBLE) / n_tri / 1000.0)"
            " AS BIGINT)"
        ).alias("score_e6"),
    )
