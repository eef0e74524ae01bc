"""Distributed bloom-filter build + probe for runtime join pruning.

At 100 TB the dominant cost of ``fact JOIN dim-subset`` is shuffling
fact rows that can never match. Engines solve this with a *runtime
filter*: hash the build side's join keys into a compact bloom bitmap
and drop fact rows whose bits aren't set BEFORE the join shuffle.
Spark's own implementation (``BloomFilterAggregate`` behind
``spark.sql.optimizer.runtime.bloomFilter.enabled``) is not exposed as
a public SQL function, so this module builds the same structure from
public DataFrame primitives only:

- build: k = ``num_hashes`` bit positions per key via seeded
  ``xxhash64`` → explode → ``bit_or`` pack into 64-bit words grouped
  by word index → left-join against ``range(num_bits/64)`` to densify
  → one ``array<bigint>`` row. Every step is bounded by the FILTER
  size (``num_bits/64`` words), never the data size.
- probe: the 1-row bitmap broadcasts (64 KiB at the default size) and
  the membership conjunction — O(1) dense-array ``element_at`` per
  hash — evaluates row-by-row against the streamed fact side.

Two rejected designs, both measured at sf0.1 (600k-row probe side):
a ``map<int,long>`` bitmap costs ~40 s because map ``element_at`` is
a linear scan (8192-entry map × 8192 densify lookups, and again per
probe row); materializing the bitmap into a ``F.lit(list)`` literal
costs seconds of driver time because PySpark builds an 8192-element
literal element-by-element over py4j. The dense-array broadcast keeps
everything distributed and the probe at ~1 s.

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


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k seeded-xxhash64 bit positions for one key.

    Build and probe BOTH go through this helper so the hash inputs
    (seed literal type included — xxhash64 hashes type-sensitively)
    can never drift apart.
    """
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate ``df[key]`` into a 1-row bloom bitmap DataFrame.

    Output schema: ``bloom_bm array<bigint>`` of length
    ``num_bits/64``, dense so probe lookups are O(1) array indexing.

    Scale shape: explode is k rows per input key (map-side, no
    shuffle), then ONE shuffle of at most ``num_bits/64`` word groups,
    densified by a left join against ``spark.range(num_words)``.
    Nothing here grows with the fact table.
    """
    num_words = num_bits // 64
    exploded = df.select(
        F.explode(F.array(*_positions(F.col(key), num_bits, num_hashes))).alias(
            "pos"
        )
    )
    words = exploded.select(
        F.expr("cast(pos div 64 as int)").alias("w"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
    )
    packed = words.groupBy("w").agg(F.bit_or("bit").alias("word"))
    idx = df.sparkSession.range(num_words).select(
        F.col("id").cast("int").alias("w")
    )
    dense = idx.join(F.broadcast(packed), "w", "left").select(
        "w", F.coalesce("word", F.lit(0).cast("long")).alias("word")
    )
    # collect_list has no ordering guarantee -> sort (w, word) structs,
    # then a linear transform strips the index.
    return dense.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("w", "word"))),
            lambda s: s["word"],
        ).alias("bloom_bm")
    )


def with_bloom_member(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    col: str = "bloom_member",
) -> DataFrame:
    """Attach a boolean ``col``: does ``key`` hit every bloom bit?

    The 1-row bitmap broadcasts; the membership conjunction costs k
    O(1) dense-array lookups per fact row. ``False`` is definitive
    (the key is NOT in the build set — no false negatives); ``True``
    may be a false positive. Callers that need both branches (e.g.
    bloom-pruned anti-join: non-members are definitively fresh) use
    this directly; plain pruning uses :func:`bloom_probe`.
    """
    probed = fact.crossJoin(F.broadcast(bloom))
    checks = []
    for p in _positions(F.col(key), num_bits, num_hashes):
        word = F.element_at(
            F.col("bloom_bm"), F.floor(p / F.lit(64)).cast("int") + F.lit(1)
        )
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % F.lit(64)).cast("int")
        )
        checks.append(word.bitwiseAND(bit) != F.lit(0))
    member = checks[0]
    for c in checks[1:]:
        member = member & c
    return probed.withColumn(col, member).drop("bloom_bm")


def bloom_probe(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key has every bloom bit set.

    May pass false positives — follow with the exact join.
    """
    tagged = with_bloom_member(fact, key, bloom, num_bits, num_hashes)
    return tagged.where(F.col("bloom_member")).drop("bloom_member")
