"""Edge-case regressions for the r11 fixes (ADVICE r10).

`heaps_law_fit`'s checkpoint cut is `floor(k*(mdoc+1)/10 - 1)`: on a
corpus with fewer than ~10 documents the early cuts are NEGATIVE
fractions, and a bare bigint cast truncates toward zero (-0.6 -> 0,
wrongly including doc_id 0) while the DuckDB oracle's direct
`doc_id <= -0.6` comparison excludes it. The fix floors before the
cast; this test pins the behavior on a 4-document corpus where the
pre-fix plan diverged from the oracle.
"""

from __future__ import annotations

import duckdb

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs
from tests.oracle_harness import compare

TINY_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "alpha beta eta theta"),
    (2, "iota kappa lambda alpha"),
    (3, "mu nu xi omicron pi rho sigma"),
]


def test_heaps_law_fit_tiny_corpus_matches_oracle(spark, tmp_path):
    docs = spark.createDataFrame(TINY_DOCS, ["doc_id", "text"])
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    spec = all_specs()["heaps_law_fit"]
    result = compare(
        "heaps_law_fit[tiny]",
        spec.build(spark, str(tmp_path)),
        con,
        spec.oracle,
    )
    assert result.match, result.detail


def test_heaps_law_fit_tiny_corpus_excludes_doc0_at_negative_cut(spark, tmp_path):
    """With 4 docs, the k=1..2 cuts are negative (floor -> -1): those
    checkpoints must be EMPTY, so the earliest checkpoint that
    contributes a fit point is k=3 (cut 0 -> doc 0 only). A truncating
    cast would instead give doc 0 to k=1 and k=2 as well, shifting the
    OLS inputs."""
    docs = spark.createDataFrame(TINY_DOCS, ["doc_id", "text"])
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_specs()["heaps_law_fit"].build(spark, str(tmp_path)).collect()[0]
    # 8 checkpoints contribute (k=3..10); k=1,2 are pre-corpus.
    assert row["k_checkpoints"] == 8
