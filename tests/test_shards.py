"""Training-shard writer: contiguity, coverage, manifest accounting,
and rerun determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.sources.shards import (
    shard_assignments,
    write_training_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_shards_are_contiguous_ranges(spark):
    out = shard_assignments(_docs(spark), "doc_id", 4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.doc_id)
    # shard key ranges must not interleave: max(shard s) < min(shard s+1)
    bounds = sorted((min(v), max(v), s) for s, v in by_shard.items())
    for (_, hi, _), (lo, _, _) in zip(bounds, bounds[1:]):
        assert hi < lo
    assert set(by_shard) == {0, 1, 2, 3}


def test_write_shards_manifest_accounts_every_row(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = _docs(spark)
    manifest = write_training_shards(spark, docs, path, "doc_id", n_shards=4)
    rows = manifest.collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.n_chars for r in rows) == (
        docs.agg(F.sum(F.length("text"))).collect()[0][0]
    )
    # written data round-trips with shard partition column
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == len(rows)
    # manifest ranges match the data
    for r in rows:
        part = back.filter(F.col("shard") == r.shard)
        lo, hi = part.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        assert (lo, hi) == (r.id_lo, r.id_hi)


def test_shard_membership_is_rerun_deterministic(spark):
    docs = _docs(spark)
    a = shard_assignments(docs.repartition(7), "doc_id", 4)
    b = shard_assignments(docs.coalesce(1), "doc_id", 4)
    assert sorted((r.doc_id, r.shard) for r in a.collect()) == sorted(
        (r.doc_id, r.shard) for r in b.collect()
    )
