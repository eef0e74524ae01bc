"""Corpus-statistics extensions, round 13: keyness, stylometry,
lexical diversity, OOV audit, and length-distribution fitting over
the ``documents`` table.

These extend the §2.B56 text-analysis family (SURVEY.md) with the
remaining classic corpus-audit measures a training-data curation
pipeline reports next to the r12-born set (Fightin' Words, KL/JS
divergence, entropy rate): Dunning's G2 keyness, Burrows' Delta
stylometric distance, chunked type-token ratio, out-of-vocabulary
rate, and a lognormal fit of the document-length distribution.

Hash-contract conventions (r12 determinism rules, all born hardened):
exact integer counts everywhere; every transcendental is the
portable sqrt-reduction ln (``operators/portable_math.py``, bit
identical on any libm build); data-scale float sums are avoided by
quantizing per-term contributions to integer grains first (order-free
BIGINT/DECIMAL sums); presentation is ``floor(1e6*x)``.

The reference repo (AlexG-Mtl/ag-data-ingestion-github-to-snowflake) has no
corpus layer — this module is part of the mandated LLM-pipeline
extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ag_data_ingestion_github_to_snowflake_spark.operators.portable_math import (
    floor_e6_sql,
    portable_ln_sql,
)
from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t


def _tokens(docs: DataFrame) -> DataFrame:
    """(source, term) token stream, lowercased, empties dropped —
    the shared tokenizer of the corpus-contrast family."""
    return docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")


_TOKS_SQL = """
    toks AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    ft AS (SELECT source, term FROM toks WHERE term <> '')
"""


# ---------------------------------------------------------------------------
# Dunning G2 keyness: terms most characteristic of each source
# (Dunning 1993, "Accurate Methods for the Statistics of Surprise")
# ---------------------------------------------------------------------------
def _g2_expr(dialect: str) -> str:
    """Signed log-likelihood-ratio keyness over exact integer counts
    a (term in source), b (term elsewhere), c (source tokens),
    d (other tokens), n = c + d. Expected counts E1 = c*(a+b)/n and
    E2 = d*(a+b)/n are ratios of exact integers, so every ln argument
    is bit-identical on both engines; the two CASE terms are a fixed
    2-element expression per row (no accumulation order)."""
    ln = portable_ln_sql
    e1 = "(CAST(c AS DOUBLE) * (a + b) / n)"
    e2 = "(CAST(d AS DOUBLE) * (a + b) / n)"
    t1 = (
        "CASE WHEN a > 0 THEN CAST(a AS DOUBLE) * "
        + ln(f"CAST(a AS DOUBLE) / {e1}", dialect, "pga")
        + " ELSE 0.0 END"
    )
    t2 = (
        "CASE WHEN b > 0 THEN CAST(b AS DOUBLE) * "
        + ln(f"CAST(b AS DOUBLE) / {e2}", dialect, "pgb")
        + " ELSE 0.0 END"
    )
    return f"(2.0 * ({t1} + {t2}))"


@register(
    "g2_keyness_by_source",
    # Hash contract (born hardened): exact integer counts; the
    # over-representation filter compares a*d > b*c in 128-bit
    # (HUGEINT / DECIMAL(38,0)) so it cannot wrap at any corpus
    # size; g2 through the portable ln; rank on the raw identical
    # double with a term tiebreak; floor(1e6) presentation.
    oracle=f"""
    WITH {_TOKS_SQL},
    st AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a
      FROM ft GROUP BY source, term
    ),
    tt AS (SELECT term, CAST(SUM(a) AS BIGINT) AS ct FROM st GROUP BY term),
    sn AS (SELECT source, CAST(SUM(a) AS BIGINT) AS c FROM st GROUP BY source),
    g AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM sn),
    cells AS (
      SELECT st.source, st.term, a, ct - a AS b, c, n - c AS d, n
      FROM st JOIN tt USING (term) JOIN sn ON st.source = sn.source, g
      WHERE ct >= 20
        AND CAST(a AS HUGEINT) * CAST(n - c AS HUGEINT)
            > CAST(ct - a AS HUGEINT) * CAST(c AS HUGEINT)
    ),
    scored AS (
      SELECT source, term, a, b, {_g2_expr("duckdb")} AS g2 FROM cells
    )
    SELECT source, term, a, b, {floor_e6_sql("g2")} AS g2_e6
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY g2 DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    survey_ids=("B56", "B16", "B29", "B43"),
    description="Dunning G2 keyness: top-5 most characteristic terms per source",
)
def g2_keyness_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Which terms are most CHARACTERISTIC of each source? Dunning's
    log-likelihood-ratio (G2) keyness — the standard corpus-
    linguistics complement of fightin_words_contrast: where the
    Monroe estimator contrasts two fixed slices under a prior, G2
    ranks each source against the REST of the corpus with a
    likelihood-ratio test, which is the usual per-source "what is
    this source about" audit in curation reports.

    Scale shape: ONE (source, term) count shuffle (map-side
    combined); term totals and source totals re-aggregate from that
    vocabulary-sized table (no second corpus scan); the grand total
    is a 1-row broadcast; G2 is map-side math over vocabulary rows
    and the top-5-per-source window runs on the scored vocabulary
    with a WindowGroupLimit. Nothing past the first reduce scales
    with the corpus.
    """
    docs = t(spark, sf, "documents")
    st = _tokens(docs).groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    # st is vocabulary-sized and feeds three branches (cells, term
    # totals, source totals): persist so the corpus-scale token
    # shuffle above it runs ONCE, not per branch.
    st = st.persist()
    tt = st.groupBy("term").agg(F.sum("a").cast("bigint").alias("ct"))
    sn = st.groupBy("source").agg(F.sum("a").cast("bigint").alias("c"))
    g = sn.agg(F.sum("c").cast("bigint").alias("n"))
    dec = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    cells = (
        st.join(tt, "term")
        .filter(F.col("ct") >= 20)
        .join(F.broadcast(sn), "source")
        .join(F.broadcast(g))
        .select(
            "source", "term", "a",
            (F.col("ct") - F.col("a")).alias("b"),
            "c",
            (F.col("n") - F.col("c")).alias("d"),
            "n",
        )
        .filter(dec("a") * dec("d") > dec("b") * dec("c"))
    )
    scored = cells.withColumn("g2", F.expr(_g2_expr("spark")))
    w = Window.partitionBy("source").orderBy(F.desc("g2"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "source", "term", "a", "b",
            F.expr(floor_e6_sql("g2")).alias("g2_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Burrows' Delta: stylometric distance between sources
# (Burrows 2002, "Delta: a Measure of Stylistic Difference")
# ---------------------------------------------------------------------------
@register(
    "burrows_delta_sources",
    # Hash contract (born hardened): the 30 most-frequent-word
    # relative frequencies quantize per (source, term) to exact 1e-9
    # grains (BIGINT); the cross-source mean/variance per term are
    # then integer sums (squares formed in DECIMAL(38,0) AFTER the
    # cast, never in BIGINT); z-scores are double math over those
    # exact integers; per-pair |z_a - z_b| re-quantizes to 1e-9
    # grains so the 30-term sum is an order-free BIGINT sum.
    oracle=f"""
    WITH {_TOKS_SQL},
    st AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ft GROUP BY source, term
    ),
    sn AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS ns FROM st GROUP BY source),
    mfw AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (
          ORDER BY SUM(cnt) DESC, term) AS rnk
        FROM st GROUP BY term
      ) WHERE rnk <= 30
    ),
    grid AS (
      SELECT sn.source, sn.ns, mfw.term FROM sn, mfw
    ),
    fq AS (
      SELECT g.source, g.term,
             CAST(floor(1000000000.0 * CAST(COALESCE(st.cnt, 0) AS DOUBLE)
                        / g.ns) AS BIGINT) AS f
      FROM grid g LEFT JOIN st
        ON g.source = st.source AND g.term = st.term
    ),
    stats AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(f) AS BIGINT) AS sf,
             CAST(SUM(CAST(f AS DECIMAL(19,0)) * CAST(f AS DECIMAL(19,0)))
                  AS DOUBLE) AS sf2
      FROM fq GROUP BY term
    ),
    z AS (
      SELECT fq.source, fq.term,
             CASE WHEN sf2 / k - (CAST(sf AS DOUBLE) / k)
                                 * (CAST(sf AS DOUBLE) / k) <= 0.0
                  THEN 0.0
                  ELSE (f - CAST(sf AS DOUBLE) / k)
                       / sqrt(sf2 / k - (CAST(sf AS DOUBLE) / k)
                                        * (CAST(sf AS DOUBLE) / k))
             END AS z
      FROM fq JOIN stats USING (term)
    ),
    pairs AS (
      SELECT za.source AS src_a, zb.source AS src_b,
             CAST(floor(1000000000.0 * abs(za.z - zb.z)) AS BIGINT) AS dq
      FROM z za JOIN z zb
        ON za.term = zb.term AND za.source < zb.source
    )
    SELECT src_a, src_b,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(floor(CAST(SUM(dq) AS DOUBLE) / (COUNT(*) * 1000.0))
                AS BIGINT) AS delta_e6
    FROM pairs GROUP BY src_a, src_b
    """,
    survey_ids=("B56", "B16", "B29", "B10", "B43"),
    description="Burrows' Delta stylometric distance over the 30 MFW, all source pairs",
)
def burrows_delta_sources(spark: SparkSession, sf: str) -> DataFrame:
    """How stylistically far apart are the corpus sources? Burrows'
    Delta — the classic stylometric distance: z-score each source's
    relative frequency of the 30 most frequent words against the
    cross-source distribution, then average |z_a - z_b| over the
    word list for every source pair. Curation use: near-identical
    sources (mirrors, scrapes of the same site) show Delta near 0
    and are merge candidates; an outlier source reads stylistically
    unlike the rest and deserves a manual look.

    Scale shape: one (source, term) count shuffle, then EVERYTHING
    downstream runs on a (sources x 30) grid — the MFW list and the
    z table are corpus-size-invariant, the pair join is
    (sources choose 2) x 30 rows. The grid cross join is
    sources x 30 (bounded by the source cardinality, not the data).
    """
    docs = t(spark, sf, "documents")
    st = _tokens(docs).groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    st = st.persist()
    sn = st.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("ns"))
    wmfw = Window.orderBy(F.desc("tot"), "term")
    mfw = (
        st.groupBy("term")
        .agg(F.sum("cnt").alias("tot"))
        .withColumn("rnk", F.row_number().over(wmfw))
        .filter(F.col("rnk") <= 30)
        .select("term")
    )
    grid = sn.crossJoin(F.broadcast(mfw))
    fq = grid.join(st, ["source", "term"], "left").select(
        "source",
        "term",
        F.expr(
            "CAST(floor(1000000000.0 * CAST(COALESCE(cnt, 0) AS DOUBLE)"
            " / ns) AS BIGINT)"
        ).alias("f"),
    )
    dec = F.col("f").cast("decimal(19,0)")
    stats = fq.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("f").cast("bigint").alias("sf"),
        F.sum(dec * dec).cast("double").alias("sf2"),
    )
    zexpr = F.expr(
        "CASE WHEN sf2 / k - (CAST(sf AS DOUBLE) / k)"
        " * (CAST(sf AS DOUBLE) / k) <= 0.0 THEN 0.0"
        " ELSE (f - CAST(sf AS DOUBLE) / k)"
        " / sqrt(sf2 / k - (CAST(sf AS DOUBLE) / k)"
        " * (CAST(sf AS DOUBLE) / k)) END"
    )
    z = fq.join(F.broadcast(stats), "term").select(
        "source", "term", zexpr.alias("z")
    )
    za = z.select(
        F.col("source").alias("src_a"), "term", F.col("z").alias("za")
    )
    zb = z.select(
        F.col("source").alias("src_b"), "term", F.col("z").alias("zb")
    )
    pairs = za.join(zb, "term").filter(F.col("src_a") < F.col("src_b"))
    dq = F.expr("CAST(floor(1000000000.0 * abs(za - zb)) AS BIGINT)")
    return (
        pairs.select("src_a", "src_b", dq.alias("dq"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.expr(
                "CAST(floor(CAST(SUM(dq) AS DOUBLE) / (COUNT(*) * 1000.0))"
                " AS BIGINT)"
            ).alias("delta_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Chunked type-token ratio (lexical diversity, MATTR's linear cousin)
# ---------------------------------------------------------------------------
@register(
    "chunked_ttr_docs",
    # Hash contract (born hardened): chunk ids come from token
    # POSITION in the raw split array (before the empty-token
    # filter, so both engines chunk identically); per-chunk type and
    # token counts are exact integers; the per-doc ratio is one
    # ratio of exact integers floored at 1e-6.
    oracle="""
    WITH pos AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\\s+')) AS tok,
             generate_subscripts(
               string_split_regex(lower(text), '\\s+'), 1) AS p1
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST((p1 - 1) // 50 AS BIGINT) AS chunk,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
      FROM pos WHERE tok <> ''
      GROUP BY doc_id, chunk
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(floor(1000000.0 * CAST(SUM(n_types) AS DOUBLE)
                      / (50.0 * COUNT(*))) AS BIGINT) AS ttr_e6
    FROM chunks WHERE n_tok = 50
    GROUP BY doc_id
    """,
    survey_ids=("B56", "B41", "B16", "B20"),
    description="Chunked type-token ratio per document (50-token windows)",
)
def chunked_ttr_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio averaged over
    NON-OVERLAPPING 50-token chunks. Raw TTR shrinks with document
    length (longer text inevitably repeats), so per-doc TTRs are not
    comparable; chunking at a fixed window removes the length
    confound the way MATTR does, but with a LINEAR plan — MATTR's
    sliding window needs a distinct-count per token position, this
    needs one groupBy over (doc, chunk). Low scores flag repetitive
    / templated documents for the curation filter.

    Scale shape: MAP-ONLY. A document's tokens already live in one
    row, so the chunking, distinct-count, and ratio all run as array
    higher-order functions (slice / array_distinct / aggregate)
    inside whole-stage codegen — no Generate, no shuffle of the
    token stream at any corpus size (the first draft shuffled every
    token to a (doc, chunk) aggregate and measured alpha +1.35 at
    the 100x decade; this plan is alpha ~0). Partial chunks (< 50
    tokens) are dropped on both sides, so the ratio denominator is
    exact.
    """
    docs = t(spark, sf, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(
                # chunks of 50 RAW positions, empties dropped inside
                # each chunk, keeping only full (50 non-empty) chunks
                "filter(transform("
                "  sequence(0, CAST(ceil(size(split(lower(text), '\\\\s+'))"
                "                        / 50.0) AS INT) - 1),"
                "  i -> filter(slice(split(lower(text), '\\\\s+'),"
                "                    i * 50 + 1, 50), x -> x != '')),"
                " c -> size(c) = 50)"
            ).alias("full_chunks"),
        )
        .filter(F.size("full_chunks") >= 1)
        .select(
            "doc_id",
            F.size("full_chunks").cast("bigint").alias("n_chunks"),
            F.expr(
                "CAST(floor(1000000.0 * CAST(aggregate("
                "  transform(full_chunks, c -> size(array_distinct(c))),"
                "  0, (a, x) -> a + x) AS DOUBLE)"
                " / (50.0 * size(full_chunks))) AS BIGINT)"
            ).alias("ttr_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate per source against the corpus top-k vocab
# ---------------------------------------------------------------------------
@register(
    "oov_rate_by_source",
    # Hash contract (born hardened): the reference vocabulary is the
    # deterministic top-20 (count DESC, term ASC row_number); OOV
    # and total counts are exact integers; the rate is one integer
    # ratio floored at 1e-6.
    oracle=f"""
    WITH {_TOKS_SQL},
    tt AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS ct FROM ft GROUP BY term
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY ct DESC, term) AS rnk
        FROM tt
      ) WHERE rnk <= 20
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(floor(1000000.0 *
             CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*)) AS BIGINT) AS oov_rate_e6
    FROM ft LEFT JOIN vocab v ON ft.term = v.term
    GROUP BY source
    """,
    survey_ids=("B56", "B12", "B11", "B16"),
    description="Out-of-vocabulary token rate per source vs the corpus top-20 vocabulary",
)
def oov_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """What fraction of each source's tokens fall outside the corpus
    core vocabulary (the deterministic top-20 terms)? High OOV
    sources carry rare/noisy tokens — encoding-mangled text, code,
    boilerplate IDs — and are the first place a tokenizer's
    byte-fallback budget goes; per-source OOV rate is the standard
    audit column next to perplexity in curation reports.

    Scale shape: the vocabulary is a corpus-size-invariant top-k
    (vocabulary-sized count shuffle + TakeOrdered 20) BROADCAST to
    the token stream, so the membership test is a map-side broadcast
    left join — the only data-scale shuffle is the final per-source
    conditional count (map-side combined).
    """
    docs = t(spark, sf, "documents")
    ft = _tokens(docs)
    tt = ft.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    wv = Window.orderBy(F.desc("ct"), "term")
    vocab = (
        tt.withColumn("rnk", F.row_number().over(wv))
        .filter(F.col("rnk") <= 20)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    joined = ft.join(F.broadcast(vocab), "term", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.expr(
            "CAST(floor(1000000.0 * CAST(SUM(CASE WHEN in_vocab IS NULL"
            " THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        ).alias("oov_rate_e6"),
    )


# ---------------------------------------------------------------------------
# Lognormal fit of the document-length distribution per source
# ---------------------------------------------------------------------------
@register(
    "doclen_lognormal_fit",
    # Hash contract (born hardened): per-doc ln(n_chars) quantizes
    # to an exact 1e-6 grain through the portable ln (BIGINT), so
    # the per-source sum is order-free; the sum of squares is formed
    # in DECIMAL(38,0) AFTER the cast (grain^2 wraps int64 past
    # ln ~ 3e3); mu/sigma are double math over those exact integer
    # sums, already in 1e-6 units, floored to integers.
    oracle=f"""
    WITH lq AS (
      SELECT source,
             CAST(floor(1000000.0 * {portable_ln_sql(
                 "CAST(n_chars AS DOUBLE)", "duckdb", "pll")})
               AS BIGINT) AS l
      FROM documents WHERE n_chars > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(floor(CAST(SUM(l) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mu_e6,
           CAST(floor(sqrt(
             CAST(SUM(CAST(l AS DECIMAL(19,0)) * CAST(l AS DECIMAL(19,0)))
                  AS DOUBLE) / COUNT(*)
             - (CAST(SUM(l) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(l) AS DOUBLE) / COUNT(*))
           )) AS BIGINT) AS sigma_e6
    FROM lq GROUP BY source
    """,
    survey_ids=("B56", "B16", "B43", "B23"),
    description="Method-of-moments lognormal fit of document length per source",
)
def doclen_lognormal_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Fit the per-source document-length distribution with a
    lognormal (method of moments on ln n_chars): web-text lengths
    are famously lognormal-ish, and the (mu, sigma) pair is the
    compact per-source shape summary curation dashboards track —
    a sigma far above the corpus norm flags a source mixing tiny
    fragments with huge concatenations (a chunking bug upstream),
    which a mean length alone cannot see.

    Scale shape: map-only per-doc quantized ln, then ONE map-side-
    combined per-source aggregate of exact integer sums — the
    cheapest possible distributed plan (no joins, no windows, one
    shuffle of source-cardinality rows).
    """
    docs = t(spark, sf, "documents").filter(F.col("n_chars") > 0)
    lq = docs.select(
        "source",
        F.expr(
            "CAST(floor(1000000.0 * "
            + portable_ln_sql("CAST(n_chars AS DOUBLE)", "spark", "pll")
            + ") AS BIGINT)"
        ).alias("l"),
    )
    dec = F.col("l").cast("decimal(19,0)")
    return lq.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr(
            "CAST(floor(CAST(SUM(l) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        ).alias("mu_e6"),
        F.floor(
            F.sqrt(
                F.sum(dec * dec).cast("double") / F.count(F.lit(1))
                - (F.sum("l").cast("double") / F.count(F.lit(1)))
                * (F.sum("l").cast("double") / F.count(F.lit(1)))
            )
        )
        .cast("bigint")
        .alias("sigma_e6"),
    )
