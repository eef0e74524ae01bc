"""Web-corpus curation queries: HTML -> text -> link graph -> PageRank.

Continues the crawl pipeline that ``warc_extract_records`` starts: the
HTML payloads of a crawl become (a) training text (tag/script/entity
stripping), (b) a link graph (href extraction + host parsing), and
(c) page-importance scores (PageRank) used for quality-weighted
sampling — the CommonCrawl/C4-style curation chain, all JVM-side.

Oracle strategy: the HTML is SYNTHESIZED deterministically from the
documents table with the same concat expression on both sides, so the
extraction itself is what the hash-compare checks. Every regex is in
the Java-regex/RE2 common subset (see ``operators/html.py``). PageRank
is exact fixed-point integer arithmetic, replayed in DuckDB as five
unrolled CTE iterations — bit-identical regardless of partitioning.

Reference parity: the reference (src/extract_github_data.py) consumes a
JSON API and never touches HTML; this module is net-new capability for
the 100 TB web-corpus workload (SURVEY C96/C97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators import html as H
from ag_data_ingestion_github_to_snowflake_spark.plans.registry import register, t

# Shared HTML synthesis: documents row -> one realistic page with a
# title, inline CSS, a comment, entities, a script block, and two
# links. Spark and the oracle build the IDENTICAL string; the queries
# then exercise extraction. Targets use doc_id*31+7 / doc_id*17+3 mod
# 1000 so link targets collide across pages (real in-degree skew).
_HTML_SQL = """
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' (' || source
    || ')</title><style type="text/css">p { color: red; }</style></head>'
    || '<body><!-- build ' || CAST(doc_id AS VARCHAR) || ' --><h1>Doc '
    || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
    || ' &amp; more &lt;markup&gt; &quot;quoted&quot;&nbsp;tail</p>'
    || '<script>var x = 1; if (x < 2) { x = 3; }</script>'
    || '<a href="https://example.com/' || lang || '/'
    || CAST((doc_id * 31 + 7) % 1000 AS VARCHAR)
    || '">first</a> <a href="https://other.org/'
    || CAST((doc_id * 17 + 3) % 1000 AS VARCHAR)
    || '">second</a></body></html>'
"""


def _synth_html(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "), d, F.lit(" ("), F.col("source"),
        F.lit(')</title><style type="text/css">p { color: red; }</style>'
              "</head><body><!-- build "), d, F.lit(" --><h1>Doc "), d,
        F.lit("</h1><p>"), F.col("text"),
        F.lit(" &amp; more &lt;markup&gt; &quot;quoted&quot;&nbsp;tail</p>"
              "<script>var x = 1; if (x < 2) { x = 3; }</script>"
              '<a href="https://example.com/'),
        F.col("lang"), F.lit("/"),
        ((F.col("doc_id") * 31 + 7) % 1000).cast("string"),
        F.lit('">first</a> <a href="https://other.org/'),
        ((F.col("doc_id") * 17 + 3) % 1000).cast("string"),
        F.lit('">second</a></body></html>'),
    )
    return docs.select("doc_id", page.alias("html"))


@register(
    "html_text_extract",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_HTML_SQL} AS html FROM documents
    )
    SELECT doc_id,
      trim(regexp_replace(regexp_extract(html,
        '(?is)<title[^>]*>(.*?)</title>', 1), '[ \t\r\n]+', ' ', 'g'))
        AS title,
      trim(regexp_replace(
        replace(replace(replace(replace(replace(replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(html,
                  '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
            '<[^>]+>', ' ', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
          '&nbsp;', ' '), '&amp;', '&'),
        '[ \t\r\n]+', ' ', 'g')) AS text_clean,
      CAST(len(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS BIGINT)
        AS n_links
    FROM h
    """,
    survey_ids=("B39", "B40", "B56"),
    description="HTML->text: strip script/style/comments/tags, decode entities, title + link count",
)
def html_text_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate-strip stage of a crawl pipeline, fully in codegen:
    regexp chains + fixed entity decode, not a Python parser — at 100 TB
    the text pass must stay JVM-side. The oracle replays the identical
    regex chain in DuckDB (RE2/Java common subset)."""
    h = _synth_html(t(spark, sf, "documents"))
    return h.select(
        "doc_id",
        H.extract_title("html").alias("title"),
        H.html_to_text("html").alias("text_clean"),
        F.size(H.extract_links("html")).cast("long").alias("n_links"),
    )


@register(
    "html_link_graph",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_HTML_SQL} AS html FROM documents
    ),
    links AS (
      SELECT doc_id AS src_doc, unnest(
        regexp_extract_all(html, 'href="([^"]*)"', 1)) AS url
      FROM h
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           CAST(regexp_extract(url, '/([0-9]+)$', 1) AS BIGINT)
             AS target_id,
           CAST(COUNT(*) AS BIGINT) AS in_degree,
           CAST(COUNT(DISTINCT src_doc) AS BIGINT) AS n_sources,
           CAST(MIN(src_doc) AS BIGINT) AS first_source
    FROM links
    GROUP BY 1, 2
    ORDER BY in_degree DESC, host, target_id
    LIMIT 25
    """,
    survey_ids=("B39", "B16", "B24", "B56"),
    description="Link graph from extracted hrefs: per-(host,target) in-degree top-25",
)
def html_link_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Crawl-frontier analytics: explode extracted hrefs, parse host +
    numeric target, rank targets by in-degree. One explode + one
    aggregation shuffle; host parsing is regexp_extract in codegen."""
    h = _synth_html(t(spark, sf, "documents"))
    links = h.select(
        F.col("doc_id").alias("src_doc"),
        F.explode(H.extract_links("html")).alias("url"),
    )
    return (
        links.select(
            "src_doc",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
            F.regexp_extract("url", r"/([0-9]+)$", 1).cast("long")
            .alias("target_id"),
        )
        .groupBy("host", "target_id")
        .agg(
            F.count("*").alias("in_degree"),
            F.countDistinct("src_doc").alias("n_sources"),
            F.min("src_doc").alias("first_source"),
        )
        .orderBy(F.desc("in_degree"), "host", "target_id")
        .limit(25)
    )


_PR_ITER_SQL = """
    SELECT nodes.node,
           CAST(150000000000
                + (85 * COALESCE(SUM({prev}.rank // e.out_deg), 0)) // 100
                AS BIGINT) AS rank
    FROM nodes
    LEFT JOIN edges e ON e.dst = nodes.node
    LEFT JOIN {prev} ON {prev}.node = e.src
    GROUP BY nodes.node
"""


_PR_ORACLE = (
    """
    WITH nodes AS (SELECT doc_id AS node FROM documents),
    n AS (SELECT COUNT(*) AS c FROM nodes),
    edges AS (
      SELECT node AS src, (node % 3) + 1 AS out_deg,
             (node * node + k * 13 + 1) % (SELECT c FROM n) AS dst
      FROM nodes, (SELECT unnest(range(3)) AS k)
      WHERE k < (node % 3) + 1
    ),
    r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
    """
    + ",\n".join(
        f"r{i + 1} AS ({_PR_ITER_SQL.format(prev=f'r{i}')})"
        for i in range(5)
    )
    + """
    SELECT node, rank FROM r5 ORDER BY rank DESC, node LIMIT 20
    """
)


@register(
    "pagerank_link_graph",
    oracle=_PR_ORACLE,
    survey_ids=("B10", "B16", "B24"),
    description="Fixed-point integer PageRank, 5 damped iterations, top-20 nodes",
)
def pagerank_link_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Page-importance scoring for quality-weighted corpus sampling.

    Extracts the edges from synthesized HTML with the SAME href regex
    as ``html_text_extract`` (the oracle constructs them analytically —
    an independent check of the extraction+parse path), then runs
    ``operators/html.pagerank``: exact BIGINT fixed-point power
    iteration, one join + one aggregation shuffle per round, lineage
    truncated per round. Bit-identical to the oracle's five unrolled
    CTE iterations because every step is integer div/sum
    (order-independent), unlike float PageRank.

    Variable out-degree 1..3 and quadratic targets give real in-degree
    skew; dangling mass is removed (no out-degree-0 nodes here)."""
    docs = t(spark, sf, "documents").select("doc_id")
    n = docs.count()  # one bounded action; the node count parameterizes
    # the synthetic edge formula on both sides.

    links = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") % 3) + 1).alias("out_deg"),
        F.concat(
            F.lit("<ul>"),
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), (F.col("doc_id") % 3)),
                    lambda k: F.concat(
                        F.lit('<li><a href="https://crawl.test/'),
                        (
                            (F.col("doc_id") * F.col("doc_id") + k * 13 + 1)
                            % n
                        ).cast("string"),
                        F.lit('">l</a></li>'),
                    ),
                ),
            ),
            F.lit("</ul>"),
        ).alias("html"),
    )
    edges = links.select(
        "src",
        "out_deg",
        F.explode(H.extract_links("html")).alias("url"),
    ).select(
        "src",
        "out_deg",
        F.regexp_extract("url", r"/([0-9]+)$", 1).cast("long").alias("dst"),
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    ranks = H.pagerank(nodes, edges, iterations=5)
    return ranks.orderBy(F.desc("rank"), "node").limit(20)


@register(
    "url_canonical_dedup",
    # Two synthesized aliases per document (uppercase scheme/host +
    # default port + utm params + unsorted query + trailing slash vs
    # the clean form) must collapse to ONE canonical URL; the oracle
    # CONSTRUCTS the canonical analytically from the fixture columns —
    # an independent check of the whole canonicalization chain.
    oracle="""
    SELECT 'https://' || source || '.example.com/' || lang
             || '/doc-' || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS canonical_url,
           CAST(2 AS BIGINT) AS n_variants,
           CAST(doc_id * 2 AS BIGINT) AS kept_variant
    FROM documents
    """,
    survey_ids=("B39", "B53", "B16"),
    description="Crawl-frontier URL canonicalization + alias dedup (min-variant keep)",
)
def url_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """URL alias dedup: lowercase scheme/host, port + fragment + utm_*
    dropped, query params sorted, trailing slash stripped
    (``operators/html.py:canonical_url``), then one groupBy on the
    canonical form keeping the lowest variant id — the step that stops
    a crawl refetching the same page through URL aliases. Map-side
    canonicalization, one dedup shuffle."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.html import (
        canonical_url,
    )

    docs = t(spark, sf, "documents")
    messy = docs.select(
        (F.col("doc_id") * 2).alias("variant_id"),
        F.concat(
            F.lit("HTTPS://"), F.upper(F.col("source")), F.lit(".Example.COM:443/"),
            F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
            F.lit("/?utm_source=feed&b=2&a=1#frag"),
        ).alias("url"),
    )
    clean = docs.select(
        (F.col("doc_id") * 2 + 1).alias("variant_id"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"),
            F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
            F.lit("?a=1&b=2"),
        ).alias("url"),
    )
    frontier = messy.unionByName(clean)
    return (
        frontier.select("variant_id", canonical_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min("variant_id").cast("bigint").alias("kept_variant"),
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the link graph: do popular pages link to
# popular pages?
# ---------------------------------------------------------------------------
@register(
    "graph_degree_assortativity",
    # Degrees are exact integer counts; all five sufficient sums are
    # integer-exact (DECIMAL(38,0) accumulators), so the Pearson
    # coefficient is one double expression over exact inputs.
    oracle="""
    WITH edges AS (
      SELECT doc_id AS src, (doc_id * doc_id + 7) % 1000 AS dst FROM documents
      UNION ALL
      SELECT doc_id, (doc_id * 17 + 3) % 1000 FROM documents
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT src AS node FROM edges
        UNION ALL
        SELECT dst FROM edges
      ) GROUP BY node
    ),
    joined AS (
      SELECT ds.degree AS dx, dd.degree AS dy
      FROM edges e
      JOIN deg ds ON e.src = ds.node
      JOIN deg dd ON e.dst = dd.node
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m,
             CAST(CAST(SUM(dx) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(dy) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
             CAST(CAST(SUM(dx * dx) AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(dy * dy) AS DECIMAL(38,0)) AS DOUBLE) AS syy,
             CAST(CAST(SUM(dx * dy) AS DECIMAL(38,0)) AS DOUBLE) AS sxy
      FROM joined
    )
    SELECT CAST(m AS BIGINT) AS n_edges,
           ROUND(
             (m * sxy - sx * sy)
             / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)),
           6) AS assortativity
    FROM s
    """,
    survey_ids=("B10", "B16", "B43"),
    description="Degree assortativity (Pearson over edge-endpoint degrees), integer-exact sums",
)
def graph_degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity of the synthesized link graph (Newman
    2002): the Pearson correlation of total degree across edge
    endpoints — positive means hubs link hubs, negative means hubs
    link leaves. pagerank_link_graph ranks nodes; this is the global
    MIXING statistic that tells you whether rank concentrates.

    The first link targets a QUADRATIC residue ((id^2+7) mod 1000), so
    target in-degrees stay skewed under any uniform id coverage — an
    affine map goes degree-regular once ids cover every residue class
    (as the 100x replicated fixture does), which would zero the degree
    variance and make assortativity undefined.

    Scale shape: degrees come from one grouped count over the edge
    endpoints; the edge list then joins the degree table on each
    endpoint (two key-bounded shuffle joins — never adjacency
    materialization); five integer-exact sufficient sums finish in a
    1-row aggregate. Same sum-exactness contract as
    spearman_corr_qty_price (DECIMAL(38,0) accumulators).
    """
    docs = t(spark, sf, "documents").select("doc_id")
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.col("doc_id") + 7) % 1000).alias("dst"),
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 17 + 3) % 1000).alias("dst"),
    )
    edges = e1.unionByName(e2)
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    joined = (
        edges.join(deg.select(F.col("node").alias("src"), F.col("degree").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("degree").alias("dy")), "dst")
        .select("dx", "dy")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = joined.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(dec(F.col("dx"))).cast("double").alias("sx"),
        F.sum(dec(F.col("dy"))).cast("double").alias("sy"),
        F.sum(dec(F.col("dx") * F.col("dx"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("dy") * F.col("dy"))).cast("double").alias("syy"),
        F.sum(dec(F.col("dx") * F.col("dy"))).cast("double").alias("sxy"),
    )
    m = F.col("m")
    r = (m * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(m * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(m * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        m.cast("bigint").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient and Jaccard link prediction over the
# hub-filtered undirected link graph
# ---------------------------------------------------------------------------
_UND_EDGES_SQL = """
    raw AS (
      SELECT doc_id AS src, (doc_id * doc_id + 7) % 1000 AS dst FROM documents
      UNION ALL
      SELECT doc_id, (doc_id * 17 + 3) % 1000 FROM documents
    ),
    und AS (
      SELECT DISTINCT
             CASE WHEN src < dst THEN src ELSE dst END AS u,
             CASE WHEN src < dst THEN dst ELSE src END AS v
      FROM raw WHERE src <> dst
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    small AS (
      SELECT e.u, e.v
      FROM und e
      JOIN deg du ON du.node = e.u AND du.degree <= 64
      JOIN deg dv ON dv.node = e.v AND dv.degree <= 64
    )
"""


@register(
    "clustering_coefficient_nodes",
    # Triangles enumerated once each via the ordered a<b<c three-way
    # join on the hub-filtered subgraph; per-node counts and degrees
    # are exact integers, the coefficient one double division.
    oracle=f"""
    WITH {_UND_EDGES_SQL},
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM small e1
      JOIN small e2 ON e2.u = e1.v
      JOIN small e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcount AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    sdeg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT u AS node FROM small UNION ALL SELECT v FROM small
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(tc.n_tri, 0) AS n_triangles,
           ROUND(2.0 * COALESCE(tc.n_tri, 0)
                 / (d.degree * (d.degree - 1)), 6) AS clustering_coeff
    FROM sdeg d LEFT JOIN tcount tc ON tc.node = d.node
    WHERE d.degree >= 2
    ORDER BY clustering_coeff DESC, n_triangles DESC, d.node
    LIMIT 25
    """,
    survey_ids=("B10", "B16", "B24"),
    description="Per-node local clustering coefficient on the hub-filtered link graph, top-25",
)
def clustering_coefficient_nodes(spark: SparkSession, sf: str) -> DataFrame:
    """Local clustering coefficient (Watts-Strogatz) per node: what
    fraction of each page's neighbor pairs are themselves linked —
    the community-tightness signal pagerank/assortativity don't see.

    Hub filter (degree <= 64) BEFORE enumeration: wedge generation is
    sum-of-degree-squared, so unbounded hubs make triangle listing
    super-linear at scale; capping participant degree bounds it by
    64 * |E| (linear), and hub coefficients are ~0 anyway. Triangles
    are enumerated ONCE each by the ordered a<b<c join (same
    convention as graph_triangle_count), then exploded to corners for
    per-node counts — integer-exact throughout, one double division.
    """
    docs = t(spark, sf, "documents").select("doc_id")
    raw = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.col("doc_id") + 7) % 1000).alias("dst"),
    ).unionByName(
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 17 + 3) % 1000).alias("dst"),
        )
    )
    und = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    nonhub = deg.filter(F.col("degree") <= 64).select("node")
    small = (
        und.join(nonhub.withColumnRenamed("node", "u"), "u")
        .join(nonhub.withColumnRenamed("node", "v"), "v")
        .select("u", "v")
    )
    small = small.persist()
    e1 = small.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = small.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = small.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcount = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    sdeg = (
        small.select(F.col("u").alias("node"))
        .unionByName(small.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    out = (
        sdeg.filter(F.col("degree") >= 2)
        .join(tcount, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint")
            .alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy(F.desc("clustering_coeff"), F.desc("n_triangles"), "node")
        .limit(25)
    )
    return out


@register(
    "jaccard_link_prediction",
    # Common-neighbor counts come from wedge enumeration through
    # non-hub centers only (bounded fan-out); Jaccard is one double
    # division of exact integers; candidate pairs must NOT already be
    # edges (anti-join) and are fully tie-broken before LIMIT.
    oracle=f"""
    WITH {_UND_EDGES_SQL},
    adj AS (
      SELECT u AS node, v AS nbr FROM small
      UNION ALL
      SELECT v, u FROM small
    ),
    wedge AS (
      SELECT a1.nbr AS u, a2.nbr AS v,
             CAST(COUNT(*) AS BIGINT) AS common
      FROM adj a1 JOIN adj a2
        ON a1.node = a2.node AND a1.nbr < a2.nbr
      GROUP BY 1, 2
    ),
    sdeg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY node
    ),
    cand AS (
      SELECT w.u, w.v, w.common, du.degree AS deg_u, dv.degree AS deg_v
      FROM wedge w
      JOIN sdeg du ON du.node = w.u
      JOIN sdeg dv ON dv.node = w.v
      ANTI JOIN small e ON e.u = w.u AND e.v = w.v
    )
    SELECT u, v, common, deg_u, deg_v,
           ROUND(CAST(common AS DOUBLE) / (deg_u + deg_v - common), 6)
             AS jaccard
    FROM cand
    ORDER BY jaccard DESC, common DESC, u, v
    LIMIT 25
    """,
    survey_ids=("B10", "B13", "B24"),
    description="Jaccard link prediction: top-25 unlinked pairs by neighbor overlap (hub-filtered)",
)
def jaccard_link_prediction(spark: SparkSession, sf: str) -> DataFrame:
    """Link prediction by neighborhood overlap: for node pairs NOT yet
    connected, the Jaccard similarity of their neighbor sets — the
    classic recommend-an-edge baseline (Liben-Nowell & Kleinberg).

    Scale shape: wedge enumeration through each center node is the
    quadratic step, so the graph is hub-filtered (degree <= 64) FIRST
    — sum over centers of deg^2 is then bounded by 64 * |E|, linear in
    the corpus. Common counts and degrees are exact integers; the
    anti-join removes existing edges; full (jaccard, common, u, v)
    tie-break before the LIMIT.
    """
    docs = t(spark, sf, "documents").select("doc_id")
    raw = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.col("doc_id") + 7) % 1000).alias("dst"),
    ).unionByName(
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 17 + 3) % 1000).alias("dst"),
        )
    )
    und = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    nonhub = deg.filter(F.col("degree") <= 64).select("node")
    small = (
        und.join(nonhub.withColumnRenamed("node", "u"), "u")
        .join(nonhub.withColumnRenamed("node", "v"), "v")
        .select("u", "v")
    )
    small = small.persist()
    adj = small.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        small.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    a1 = adj.select("node", F.col("nbr").alias("u"))
    a2 = adj.select("node", F.col("nbr").alias("v"))
    wedge = (
        a1.join(a2, "node")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    sdeg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    cand = (
        wedge.join(
            sdeg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u")),
            "u",
        )
        .join(
            sdeg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v")),
            "v",
        )
        .join(small, ["u", "v"], "left_anti")
    )
    return cand.select(
        "u",
        "v",
        "common",
        "deg_u",
        "deg_v",
        F.round(
            F.col("common").cast("double")
            / (F.col("deg_u") + F.col("deg_v") - F.col("common")),
            6,
        ).alias("jaccard"),
    ).orderBy(F.desc("jaccard"), F.desc("common"), "u", "v").limit(25)
