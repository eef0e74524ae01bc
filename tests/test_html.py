"""Unit tests for operators/html.py: extraction edge cases and the
exactness contract of fixed-point PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators import html as H


def _one(spark, raw: str, col):
    df = spark.createDataFrame([(raw,)], "html string")
    return df.select(col.alias("v")).first()["v"]


def test_html_to_text_strips_boilerplate(spark):
    raw = (
        "<html><head><title>T</title><style>b{}</style></head><body>"
        "<!-- hidden -->"
        "<script>if (1 < 2) { alert('x'); }</script>"
        "<p>Hello   <b>world</b></p></body></html>"
    )
    assert _one(spark, raw, H.html_to_text("html")) == "T Hello world"


def test_html_to_text_decodes_entities_in_order(spark):
    # Double-escaped &amp;lt; must become the literal text "&lt;",
    # never "<" (amp decode is last).
    raw = "<p>a &amp;lt; b &lt; c &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
    out = _one(spark, raw, H.html_to_text("html"))
    assert out == "a &lt; b < c \"q\" 's' end"


def test_html_to_text_multiline_script_and_case(spark):
    raw = "x<SCRIPT type='t'>\nvar a;\n</SCRIPT>y<STYLE>\np{}\n</STYLE>z"
    assert _one(spark, raw, H.html_to_text("html")) == "x y z"


def test_extract_links_order_and_empty(spark):
    raw = '<a href="u1">a</a><img src="i"/><a href="u2">b</a>'
    assert _one(spark, raw, H.extract_links("html")) == ["u1", "u2"]
    assert _one(spark, "<p>none</p>", H.extract_links("html")) == []


def test_extract_title_decodes_and_defaults_empty(spark):
    raw = "<title>A &amp;\n B</title><title>second</title>"
    assert _one(spark, raw, H.extract_title("html")) == "A & B"
    assert _one(spark, "<p>no title</p>", H.extract_title("html")) == ""


def test_pagerank_exact_two_node_cycle(spark):
    # 0 <-> 1: symmetric, so both keep exactly the initial mass:
    # rank' = 0.15*S + 0.85*rank(other) stays at S for both nodes.
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1)], "src long, dst long, out_deg long"
    )
    got = {
        r["node"]: r["rank"]
        for r in H.pagerank(nodes, edges, iterations=3,
                            checkpoint=False).collect()
    }
    # 10^12 survives each round up to the two integer floors:
    # (85 * 10^12) div 100 = 85*10^10 exactly, + 15*10^10 = 10^12.
    assert got == {0: 10**12, 1: 10**12}


def test_pagerank_dangling_and_source_nodes(spark):
    # 0 -> 1, 1 dangling: after one round,
    # rank(0) = 0.15*S (no in-edges), rank(1) = 0.15*S + 0.85*S.
    s = 10**12
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    edges = spark.createDataFrame([(0, 1, 1)],
                                  "src long, dst long, out_deg long")
    got = {
        r["node"]: r["rank"]
        for r in H.pagerank(nodes, edges, iterations=1,
                            checkpoint=False).collect()
    }
    assert got == {0: 15 * s // 100, 1: 15 * s // 100 + 85 * s // 100}


def test_pagerank_matches_float_reference(spark):
    # The integer fixed point tracks a float implementation to ~1e-9
    # relative on a small skewed graph (scale 10^12 => ulp 10^-12).
    import random

    rng = random.Random(7)
    n = 40
    out = {u: 1 + rng.randrange(3) for u in range(n)}
    edge_list = [
        (u, rng.randrange(n)) for u in range(n) for _ in range(out[u])
    ]
    nodes = spark.createDataFrame([(u,) for u in range(n)], "node long")
    edges = spark.createDataFrame(
        [(u, v, out[u]) for u, v in edge_list],
        "src long, dst long, out_deg long",
    )
    got = {
        r["node"]: r["rank"] / 10**12
        for r in H.pagerank(nodes, edges, iterations=8,
                            checkpoint=False).collect()
    }
    ranks = {u: 1.0 for u in range(n)}
    for _ in range(8):
        s = {u: 0.0 for u in range(n)}
        for u, v in edge_list:
            s[v] += ranks[u] / out[u]
        ranks = {u: 0.15 + 0.85 * s[u] for u in range(n)}
    for u in range(n):
        assert abs(got[u] - ranks[u]) < 1e-6


def test_pagerank_zero_iterations_is_uniform(spark):
    nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
    edges = spark.createDataFrame([], "src long, dst long, out_deg long")
    got = H.pagerank(nodes, edges, iterations=0, checkpoint=False)
    assert {r["rank"] for r in got.collect()} == {10**12}


def test_canonical_url_idempotent_and_correct(spark):
    """canonical_url must be idempotent (canonicalizing a canonical
    URL is the identity) and produce the expected form across a grid
    of messy component combinations — one Spark job."""
    import itertools

    from ag_data_ingestion_github_to_snowflake_spark.operators.html import (
        canonical_url,
    )

    DEFAULTS = {"http": "80", "https": "443"}
    cases = []
    for scheme, host, port, trail, frag, utm in itertools.product(
        ["http", "HTTP", "https"],
        ["Site.Example.COM", "site.example.com"],
        ["", ":443", ":80", ":8080"],
        ["", "/"],
        ["", "#sec"],
        ["", "utm_campaign=x&"],
    ):
        url = f"{scheme}://{host}{port}/Path/p{trail}?{utm}b=2&a=1{frag}"
        cases.append((url,))
    df = spark.createDataFrame(cases, "url STRING")
    out = df.select(
        "url",
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        scheme, rest = r["url"].split("://")
        scheme = scheme.lower()
        # A non-default explicit port is a DISTINCT origin and must
        # survive canonicalization; the scheme default collapses away.
        port = rest.split("/")[0].partition(":")[2]
        keep = f":{port}" if port and port != DEFAULTS[scheme] else ""
        assert (
            r["c1"] == f"{scheme}://site.example.com{keep}/Path/p?a=1&b=2"
        ), r
        assert r["c2"] == r["c1"], r
