"""Generate a genuinely SKEWED join fixture from the driver's sf0.1
tables (read-only), for measuring the skew machinery in
``operators/skew.py`` against a plain shuffle join.

The driver fixtures are near-uniform, so the salting never faces real
skew there (its oracles prove correctness, not speedup). This tool
re-assigns the join key of a 10x-replicated fact table with a
hot-key mixture — the canonical skew shape at 100 TB (one celebrity
key plus a power-law tail):

- 35% of fact rows -> hot key #1
- 15% -> hot key #2
- 10% -> hot key #3
- remaining 40% -> power-law tail over all dim keys
  (key = min + floor(K * v^2): quadratic inverse-CDF, denser at small
  keys, a Zipf-like tail without per-row log/pow)

Key choice is deterministic (xxhash64 of the fact row's unique id), so
the fixture is reproducible and the three measured plans can be
asserted row-identical. Dim tables are copied unchanged; every
generated key exists in the dim, so inner-join totals are conserved.

Writes: lineitem_skew.parquet (l_suppkey skewed, 10x rows),
        orders_skew.parquet   (o_custkey skewed, 10x rows),
        supplier.parquet / customer.parquet (verbatim copies).

Usage: python tools/gen_skew_fixture.py [out_dir] [factor]
       (default .localdata/skew, factor 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

HOT_SHARES = (0.35, 0.15, 0.10)  # hot keys #1..#3


def skewed_key(unique_col, key_min: int, key_count: int):
    """Deterministic hot-mixture key from a unique row id."""
    u = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(1_000_000)) / 1_000_000.0
    v = F.pmod(F.xxhash64(F.col(unique_col), F.lit(1)), F.lit(1_000_000)) / 1_000_000.0
    tail = (F.lit(key_min) + F.floor(F.lit(key_count) * v * v)).cast("long")
    b1 = HOT_SHARES[0]
    b2 = b1 + HOT_SHARES[1]
    b3 = b2 + HOT_SHARES[2]
    return (
        F.when(u < F.lit(b1), F.lit(key_min).cast("long"))
        .when(u < F.lit(b2), F.lit(key_min + 1).cast("long"))
        .when(u < F.lit(b3), F.lit(key_min + 2).cast("long"))
        .otherwise(tail)
    )


def replicate(df, unique_col: str, factor: int):
    """factor-x row replication with a distinct unique id per replica."""
    stride = 10
    mx = df.select(F.max(unique_col)).first()[0]
    while stride <= int(mx):
        stride *= 10
    rep = df.withColumn(
        "_r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    return rep.withColumn(
        unique_col,
        (F.col(unique_col) + F.col("_r").cast("long") * F.lit(stride)).cast(
            dict(df.dtypes)[unique_col]
        ),
    ).drop("_r")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "skew",
    )
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("gen-skew-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for dim in ("supplier", "customer"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{dim}.parquet")

    supp = spark.read.parquet(f"{SRC}/supplier.parquet")
    s_min, s_max = supp.select(F.min("s_suppkey"), F.max("s_suppkey")).first()
    li = replicate(
        spark.read.parquet(f"{SRC}/lineitem.parquet"), "l_orderkey", factor
    )
    # unique id for the hash: (orderkey, linenumber) is the PK
    li_skew = li.withColumn("_uid", F.xxhash64("l_orderkey", "l_linenumber"))
    li_skew = li_skew.withColumn(
        "l_suppkey",
        skewed_key("_uid", int(s_min), int(s_max - s_min)).cast(
            dict(li.dtypes)["l_suppkey"]
        ),
    ).drop("_uid")
    li_skew.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem_skew.parquet"
    )
    print(f"lineitem_skew: x{factor}, l_suppkey hot mixture over "
          f"[{s_min}, {s_max}]")

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    c_min, c_max = cust.select(F.min("c_custkey"), F.max("c_custkey")).first()
    orders = replicate(
        spark.read.parquet(f"{SRC}/orders.parquet"), "o_orderkey", factor
    )
    o_skew = orders.withColumn(
        "o_custkey",
        skewed_key("o_orderkey", int(c_min), int(c_max - c_min)).cast(
            dict(orders.dtypes)["o_custkey"]
        ),
    )
    o_skew.repartition(32).write.mode("overwrite").parquet(
        f"{out}/orders_skew.parquet"
    )
    print(f"orders_skew: x{factor}, o_custkey hot mixture over "
          f"[{c_min}, {c_max}]")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
