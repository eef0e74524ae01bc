"""Product quantization + content-defined chunking: semantic property
tests on top of the registry's oracle-hash parity.

- PQ: codes are valid indices, encoding picks the true nearest
  codeword (vs a float64 Python reference with the same round-6
  first-min rule), and ADC distances equal the reference table-lookup
  sum.
- CDC: the defining property — an insertion reflows ONLY its own
  chunk; all other chunk hashes are unchanged (fixed-size chunking
  shifts every downstream chunk).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators import pq as PQ

DIM, M, K = 16, 4, 4


def _vecs(n):
    return [
        [math.sin(i * 2.3 + d * 0.7) for d in range(DIM)] for i in range(n)
    ]


def _ref_code(v, books):
    d_sub = DIM // M
    codes = []
    for s in range(M):
        sub = v[s * d_sub : (s + 1) * d_sub]
        dists = [
            round(sum((a - b) * (a - b) for a, b in zip(sub, cw)), 6)
            for cw in books[s]
        ]
        codes.append(dists.index(min(dists)))
    return codes


def test_encode_matches_reference(spark):
    books = PQ.pq_codebooks(DIM, M, K, seed=57)
    vecs = _vecs(30)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id INT, embedding: array<double>"
    )
    got = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(df, books).collect()}
    for i, v in enumerate(vecs):
        assert got[i] == _ref_code(v, books), f"vec {i}"
        assert all(0 <= c < K for c in got[i])


def test_adc_equals_reference_lookup(spark):
    books = PQ.pq_codebooks(DIM, M, K, seed=57)
    vecs = _vecs(20)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id INT, embedding: array<double>"
    )
    out = PQ.pq_adc_topk(df, df.filter(F.col("vec_id") < 3), books, topk=19)
    d_sub = DIM // M
    for r in out.collect():
        q = vecs[r["query_id"]]
        codes = _ref_code(vecs[r["neighbor_id"]], books)
        want = round(
            sum(
                round(
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(
                            q[s * d_sub : (s + 1) * d_sub], books[s][codes[s]]
                        )
                    ),
                    6,
                )
                for s in range(M)
            ),
            6,
        )
        assert abs(r["adc_dist"] - want) < 1e-9, (r, want)


def test_cdc_insertion_reflows_one_chunk(spark):
    """Insert a token mid-document: chunk hashes before and after the
    edit point must be identical — only the edited chunk changes."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
    import duckdb  # noqa: F401 — not needed; build directly

    base_words = [f"tok{i}" for i in range(200)]
    edited = base_words[:100] + ["INSERTED"] + base_words[100:]
    docs = spark.createDataFrame(
        [(0, " ".join(base_words)), (1, " ".join(edited))],
        "doc_id INT, text STRING",
    )
    # reuse the registry query's chunking by calling the operator logic
    # inline: same boundary rule (md5_hash60 % 16 == 0)
    from pyspark.sql import Window
    from ag_data_ingestion_github_to_snowflake_spark.operators.dedup import md5_hash60

    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunks = (
        toks.withColumn(
            "bnd", F.when(F.pmod(md5_hash60(F.col("tok")), F.lit(16)) == 0, 1).otherwise(0)
        )
        .withColumn("chunk_id", F.coalesce(F.sum("bnd").over(w), F.lit(0)))
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("h")
        )
    )
    h0 = {r["h"] for r in chunks.filter("doc_id = 0").collect()}
    h1 = {r["h"] for r in chunks.filter("doc_id = 1").collect()}
    shared = h0 & h1
    # every chunk except the single edited one must be shared
    assert len(h0) - len(shared) == 1, (len(h0), len(h1), len(shared))
    assert len(h1) - len(shared) == 1
