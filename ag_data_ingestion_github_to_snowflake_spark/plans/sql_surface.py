"""ANSI-SQL surface carriers exercised through ``spark.sql`` and the
less-traveled join/generator semantics: LATERAL correlated subqueries,
null-safe equality joins, outer explode.

These prove the engine speaks the *SQL dialect* a warehouse consumer
would port over (reference consumers query Snowflake SQL directly —
``/root/reference/README.md:285-291``), not only the DataFrame DSL:
the LATERAL query is submitted as SQL text and planned by Catalyst
like any DataFrame plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t


@register(
    "lateral_top_nations_per_region",
    oracle="""
    SELECT r.r_name AS region, l.n_name AS nation, l.total_bal
    FROM region r,
    LATERAL (
      SELECT n.n_name,
             CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY total_bal DESC, n.n_name
      LIMIT 2
    ) l
    """,
    survey_ids=("B14", "B15", "B24"),
    description="LATERAL correlated top-2-per-group, submitted as SQL text",
)
def lateral_top_nations_per_region(spark: SparkSession, sf: str) -> DataFrame:
    """Top-2 nations by supplier balance per region via a LATERAL
    correlated subquery — the SQL-text twin of the window top-k
    pattern. Catalyst decorrelates the subquery into a ranked join
    (same physical shape as ``window_topk_orders_per_customer``), so
    "SQL consumer" and "DataFrame consumer" get one plan.
    """
    from ag_data_ingestion_github_to_snowflake_spark.catalog import register_views

    register_views(spark, sf)  # every fixture table as a temp view
    return spark.sql(
        """
        SELECT r.r_name AS region, l.n_name AS nation, l.total_bal
        FROM region r,
        LATERAL (
          SELECT n.n_name,
                 CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY total_bal DESC, n.n_name
          LIMIT 2
        ) l
        """
    )


@register(
    "join_null_safe_priority",
    oracle="""
    WITH o AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS pkey FROM orders),
    d AS (SELECT DISTINCT NULLIF(o_orderpriority, '1-URGENT') AS pkey FROM orders)
    SELECT d.pkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM o JOIN d ON o.pkey IS NOT DISTINCT FROM d.pkey
    GROUP BY d.pkey
    """,
    survey_ids=("B10", "B16"),
    description="null-safe equality join (<=>): NULL keys match NULL, once",
)
def join_null_safe_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe join semantics: NULLIF turns '1-URGENT' into NULL on
    both sides; ``<=>`` must pair the NULL groups exactly once (a
    plain equi-join silently drops them — the classic
    late-night-dashboard bug).

    Plan shape (r9 rewrite, VERDICT r8 item 4): the original form
    joined every orders row against the ~5-row distinct-key table on
    ``<=>``, so the join shuffle hashed the whole fact table onto ~5
    reducer keys — skew by construction, measured alpha +1.28 at 100x.
    Aggregate-first fixes it: count per null-unified key runs as a
    map-side partial aggregation (linear, no skew — each of the 32
    input partitions emits <=6 partial rows), and the ``<=>`` join then
    pairs two <=6-row tables, broadcast, cost invariant in data size.
    Same answer, same oracle; r9 measured alpha +0.18 / 0.66 s at 100x
    (was +1.28 / 5.7 s).
    """
    o = t(spark, sf, "orders").select(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pkey")
    )
    counts = o.groupBy("pkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    d = o.distinct().select(F.col("pkey").alias("dkey"))
    return (
        counts.join(F.broadcast(d), F.col("pkey").eqNullSafe(F.col("dkey")))
        .select("pkey", "n")
    )


@register(
    "explode_outer_long_words",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(w) = 0 THEN [NULL] ELSE w END) AS word
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(text, ' +'),
                         tk -> len(tk) >= 12) AS w
      FROM documents WHERE doc_id < 100
    )
    """,
    survey_ids=("B41", "B39"),
    description="explode_outer: rows with empty arrays survive as NULL rows",
)
def explode_outer_long_words(spark: SparkSession, sf: str) -> DataFrame:
    """Outer explode over a usually-empty filtered token list: docs
    with no >=12-char word must survive with a NULL element (inner
    explode would silently drop them — lossy for left-side
    accounting). Oracle emulates via CASE-to-[NULL] before unnest.
    """
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    words = F.filter(
        F.split(F.col("text"), " +"), lambda tk: F.length(tk) >= 12
    )
    return d.select("doc_id", F.explode_outer(words).alias("word"))


@register(
    "recursive_cte_chunk_threading",
    # Identical recursive CTE on both engines: DuckDB executes the same
    # text the Spark side submits (modulo view names).
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT doc_id AS src, doc_id + 1 AS dst
      FROM documents WHERE doc_id < 50 AND doc_id % 10 != 9
    ),
    thread(root, node) AS (
      SELECT doc_id, doc_id FROM documents WHERE doc_id < 50 AND doc_id % 10 = 0
      UNION ALL
      SELECT thr.root, e.dst FROM thread thr JOIN edges e ON e.src = thr.node
    )
    SELECT root, CAST(COUNT(*) AS BIGINT) AS chain_len,
           CAST(MAX(node) AS BIGINT) AS last_chunk
    FROM thread GROUP BY root
    """,
    survey_ids=("B10", "B16"),
    description="WITH RECURSIVE (Spark 4): next-chunk links threaded into documents",
)
def recursive_cte_chunk_threading(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive closure in pure Spark SQL via ``WITH RECURSIVE``
    (new in Spark 4): chunk rows carry a next-chunk link (derived
    deterministically here: consecutive ids within a decade), and the
    recursion threads each chain from its root — the reassembly step
    for chunked corpora, and the dialect twin of the DataFrame
    connected-components operator (``operators/graph.py``), which
    remains the log-rounds path for graphs whose depth is unbounded.
    """
    t(spark, sf, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT doc_id AS src, doc_id + 1 AS dst
          FROM documents_v WHERE doc_id < 50 AND doc_id % 10 != 9
        ),
        thread(root, node) AS (
          SELECT doc_id, doc_id FROM documents_v
          WHERE doc_id < 50 AND doc_id % 10 = 0
          UNION ALL
          SELECT thr.root, e.dst FROM thread thr JOIN edges e ON e.src = thr.node
        )
        SELECT root, CAST(COUNT(*) AS BIGINT) AS chain_len,
               CAST(MAX(node) AS BIGINT) AS last_chunk
        FROM thread GROUP BY root
        """
    )


@register(
    "pipe_syntax_quality_funnel",
    # The oracle is the de-sugared ANSI equivalent of the pipe chain.
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars >= 200
    GROUP BY lang
    ORDER BY n_docs DESC, lang
    LIMIT 5
    """,
    survey_ids=("B16", "B24", "B6"),
    description="SQL pipe syntax (|>): filter -> aggregate -> rank, one left-to-right chain",
)
def pipe_syntax_quality_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus-funnel aggregation written in Spark 4's SQL pipe
    syntax — each ``|>`` stage reads top-to-bottom the way the data
    flows, the SQL the next generation of warehouse consumers writes.
    Catalyst plans it identically to the de-sugared ANSI form the
    oracle runs (filter pushed to the scan, partial agg, top-k)."""
    t(spark, sf, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        FROM documents_v
        |> WHERE n_chars >= 200
        |> AGGREGATE COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars
           GROUP BY lang
        |> SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, total_chars
        |> ORDER BY n_docs DESC, lang
        |> LIMIT 5
        """
    )
