"""SemDeDup (operators/semdedup.py): semantic behavior checks on top
of the registry's oracle-hash parity (semdedup_embeddings).

The oracle pins Spark == DuckDB; these tests pin the SEMANTICS — the
seeded near-copies are the ones flagged, their originals are kept, and
assignment agrees with a brute-force nearest-centroid reference.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators import semdedup as SD


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_fixed_centroids_unit_norm():
    cents = SD.fixed_unit_centroids(16, 4, seed=31)
    assert len(cents) == 4 and all(len(c) == 16 for c in cents)
    for c in cents:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-12


def test_assignment_matches_bruteforce(spark):
    cents = SD.fixed_unit_centroids(8, 4, seed=31)
    vecs = [
        [math.sin(i * 1.7 + d) for d in range(8)] for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id INT, embedding: array<double>"
    )
    got = {
        r["vec_id"]: r["cell"]
        for r in SD.assign_cells(df, cents).collect()
    }
    for i, v in enumerate(vecs):
        dots = [round(sum(x * y for x, y in zip(v, c)), 6) for c in cents]
        want = dots.index(max(dots))  # first max, same rule
        assert got[i] == want, f"vec {i}: {got[i]} != {want}"


def test_seeded_duplicates_flagged_originals_kept(spark):
    sf = "/root/testdata/sf0.001"
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    rows = all_specs()["semdedup_embeddings"].build(spark, sf).collect()
    flags = {r["vec_id"]: r["is_dup"] for r in rows}
    originals = [v for v in flags if v < 100000]
    copies = [v for v in flags if v >= 100000]
    assert len(originals) == len(copies) == 150
    # Every original is kept (lower id wins the keep rule).
    assert not any(flags[v] for v in originals)
    # The copies are near-identical to their originals (cosine ~0.9999
    # >> eps=0.95); a copy is only ever unflagged if the fixed-centroid
    # assignment split the pair across cells — allow a small straddle
    # tail but require the overwhelming majority flagged.
    flagged = sum(1 for v in copies if flags[v])
    assert flagged >= 140, f"only {flagged}/150 seeded copies flagged"


def test_cell_straddle_accounting(spark):
    """Quantify the straddle tail: each unflagged copy must actually be
    in a different cell than its original — the miss is the quantizer's
    doing, never the pair scorer's."""
    sf = "/root/testdata/sf0.001"
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    rows = all_specs()["semdedup_embeddings"].build(spark, sf).collect()
    cell = {r["vec_id"]: r["cell"] for r in rows}
    flags = {r["vec_id"]: r["is_dup"] for r in rows}
    for v in [x for x in flags if x >= 100000 and not flags[x]]:
        assert cell[v] != cell[v - 100000]
