"""Generate an sf1.0-equivalent fixture by 10x key-shifted replication
of the driver's sf0.1 tables (schemas in TESTDATA.md; the driver data
itself is read-only, so the scaled copy lives under the repo).

Replication rules preserve per-replica relational structure while
keeping cross-replica interactions LINEAR, so scaling exponents measure
engine behaviour, not fixture artifacts:

- fact/dim keys (orderkey, custkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) shift by replica * stride (stride = next
  power of ten above the max key), so every intra-replica FK join is
  intact and no cross-replica key collides;
- nation/region stay fixed (TPC-H scales facts, not geography);
- document text gets a per-replica token suffix on every word: each
  replica keeps its internal near-dup structure, but no shingle
  crosses replicas (otherwise every doc would acquire 9 exact copies
  and pair counts would grow quadratically);
- embeddings multiply by a per-replica deterministic sign pattern
  (Rademacher from xxhash of (replica, position)): within-replica
  cosines are exactly preserved, cross-replica cosines collapse
  toward 0 so ANN/near-dup output grows linearly.

Usage: python tools/gen_scale_fixture.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def stride_for(df, cols) -> int:
    mx = df.select(F.greatest(*[F.max(c) for c in cols]) if len(cols) > 1 else F.max(cols[0])).first()[0]
    s = 10
    while s <= int(mx):
        s *= 10
    return s


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1.0"
    )
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("gen-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    # stride must be consistent across tables sharing a key family
    strides: dict[str, int] = {}
    for t, cols in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for c in cols:
            fam = c.split("_", 1)[1]  # custkey / orderkey / ...
            strides[fam] = max(strides.get(fam, 0), stride_for(df, [c]))

    for t, cols in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = df.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
        )
        for c in cols:
            fam = c.split("_", 1)[1]
            rep = rep.withColumn(
                c, (F.col(c) + F.col("_r").cast("long") * F.lit(strides[fam])).cast(
                    dict(df.dtypes)[c]
                )
            )
        if t == "documents":
            # suffix every token with the replica id (replica 0 keeps
            # the original text so sf0.1 remains an exact subset)
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit("_"), F.col("_r").cast("string")),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("_r") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        F.col("embedding"),
                        lambda v, i: F.when(
                            F.pmod(F.xxhash64(F.col("_r"), i), F.lit(2)) == 0, v
                        ).otherwise(-v),
                    )
                ),
            )
        rep.drop("_r").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: x{factor}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
