"""Distributed bloom-filter build + probe for runtime join pruning.

At 100 TB the dominant cost of ``fact JOIN dim-subset`` is shuffling
fact rows that can never match. Engines solve this with a *runtime
filter*: hash the build side's join keys into a compact bloom bitmap,
broadcast it, and drop fact rows whose bits aren't set BEFORE the join
shuffle. Spark's own implementation (``BloomFilterAggregate`` behind
``spark.sql.optimizer.runtime.bloomFilter.enabled``) is not exposed as
a public SQL function, so this module builds the same structure from
public DataFrame primitives only:

- build: k = ``num_hashes`` bit positions per key via seeded
  ``xxhash64`` → explode → ``bit_or`` pack into 64-bit words grouped
  by word index. The aggregate output is ``num_bits/64`` words —
  bounded by the filter size, NOT the data size — collapsed into a
  single ``map<int,bigint>`` row that Spark broadcasts (~1 MB at
  2^23 bits).
- probe: one ``forall`` higher-order function over the k positions,
  entirely JVM-side (no Python in the hot path); a row survives only
  if every bit is set.

The filter is one-sided: no false negatives (every true match
survives), tunable false-positive rate ≈ (1 - e^(-kn/m))^k. Callers
MUST keep the exact join after the probe — the bloom prunes shuffle
volume, the join removes false positives, so end-to-end results are
exactly equal to the unpruned plan (which is what the oracle checks).

Reference parity: the reference ingests with per-key point lookups
(/root/reference/src/extract_github_data.py:677-699) and never joins
at scale; this operator is part of the §2.B10/B11 scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 19  # 64 KiB bitmap
DEFAULT_NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of the k seeded-xxhash64 bit positions for one key.

    Build and probe BOTH go through this helper so the hash inputs
    (seed literal type included — xxhash64 hashes type-sensitively)
    can never drift apart.
    """
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate ``df[key]`` into a 1-row bloom bitmap DataFrame.

    Output schema: ``bloom_bm map<int,bigint>`` mapping 64-bit word
    index → word. Absent words are all-zero (probe coalesces to 0),
    so the map stays sparse when the key space clusters.

    Scale shape: explode is k rows per input key (map-side, no
    shuffle), then ONE shuffle of at most ``num_bits/64`` distinct
    word groups. Nothing here grows with the fact table.
    """
    exploded = df.select(
        F.explode(_positions(F.col(key), num_bits, num_hashes)).alias("pos")
    )
    words = exploded.select(
        F.expr("cast(pos div 64 as int)").alias("w"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
    )
    packed = words.groupBy("w").agg(F.bit_or("bit").alias("word"))
    return packed.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("w", "word")))
        ).alias("bloom_bm")
    )


def bloom_probe(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key has every bloom bit set.

    The 1-row bitmap is broadcast (BroadcastNestedLoopJoin degenerates
    to a free replicate for a single row); the membership test is a
    single ``forall`` lambda evaluated inside codegen. May pass false
    positives — follow with the exact join.
    """
    probed = fact.crossJoin(F.broadcast(bloom)).withColumn(
        "_bpos", _positions(F.col(key), num_bits, num_hashes)
    )
    member = F.expr(
        "forall(_bpos, p -> "
        "(coalesce(element_at(bloom_bm, cast(p div 64 as int)), 0L)"
        " & shiftleft(1L, cast(p % 64 as int))) <> 0L)"
    )
    return probed.where(member).drop("bloom_bm", "_bpos")
