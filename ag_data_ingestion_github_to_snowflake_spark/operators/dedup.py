"""Deduplication operators for large-scale training-data pipelines.

Exact dedup (content hash), MinHash+LSH near-dup, SimHash, and n-gram
Jaccard verification — all expressed with built-in JVM-side functions
(no Python UDFs in any hot path), so they survive 100 TB:

- exact: hash-groupBy — one shuffle on a 256-bit digest.
- MinHash: shingles -> K independent min-hashes via xxhash64 with
  distinct seeds -> B bands -> groupBy band-hash buckets -> pair join
  only within buckets (candidate set ≪ n²).
- SimHash: token hashes -> per-bit weighted sum -> 64-bit signature;
  near-dups share signatures within small Hamming distance.
- verification: exact Jaccard on candidate pairs only (array_intersect/
  array_union on the two shingle sets).

Capability grounding: the reference implies id-idempotency (cache keyed
by repo id + at-least-once resume refetching rows,
/root/reference/src/extract_github_data.py:452-456, 714); content-level
dedup is the north-star extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: keep the lowest id per sha2-256 content hash.

    One shuffle on the digest; group state is (hash, min_id) — constant
    per group, no skew risk beyond genuinely duplicated content.
    """
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Add a ``shingle`` array column of distinct word n-grams.

    Built with O(1) element_at lookups per gram (slice() would allocate
    a fresh array per index — O(n²) churn on long docs). All codegen'd.
    """
    df = df.withColumn("_toks", F.split(F.col(text_col), "\\s+"))
    toks = F.col("_toks")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
    )
    grams = F.transform(F.sequence(F.lit(0), k - F.lit(1)), gram)
    return df.withColumn(
        "shingle", F.array_distinct(F.when(k > 0, grams).otherwise(F.array().cast("array<string>")))
    ).drop("_toks")


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", num_hashes: int = 32
) -> DataFrame:
    """Add ``sig`` — array of *num_hashes* min-hash values over shingles.

    Universal hashing: each shingle is string-hashed ONCE (xxhash64,
    bounded to 31 bits), then the K signature functions are cheap
    multiply-add permutations h_i(x) = (a_i*x + b_i) mod p — the
    standard MinHash trick that keeps per-row cost O(|shingles|)
    string hashes + O(|shingles|*K) integer ops. No shuffle; operands
    stay < 2^62 so ANSI arithmetic never overflows.
    """
    p = 2147483647  # 2^31 - 1, prime
    source = "hshingle" if "hshingle" in df.columns else "shingle"
    if source == "hshingle":
        base = F.col("hshingle")
    else:
        base = F.transform("shingle", lambda s: F.pmod(F.xxhash64(s), F.lit(p).cast("long")))
    df = df.withColumn("_h", base)
    # Deterministic coefficients derived from the hash index (odd a_i).
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    "_h",
                    lambda x, i=i: F.pmod(
                        F.lit(2 * i + 1).cast("long") * x + F.lit(i * 40503 + 7).cast("long"),
                        F.lit(p).cast("long"),
                    ),
                )
            )
            for i in range(num_hashes)
        ]
    )
    return df.withColumn("sig", sig).drop("_h")


def hashed_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Add ``hshingle`` — the distinct shingle set as 31-bit hashes.

    Hashing each n-gram down to a long as it is built means the gram
    strings are never materialized as a column: signatures AND Jaccard
    verification both run over compact long arrays (hash-collision
    error ~2^-31 — immaterial for near-dup detection).
    """
    p = 2147483647
    df = df.withColumn("_toks", F.split(F.col(text_col), "\\s+"))
    toks = F.col("_toks")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    gram = lambda i: F.pmod(  # noqa: E731
        F.xxhash64(
            F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)])
        ),
        F.lit(p).cast("long"),
    )
    grams = F.transform(F.sequence(F.lit(0), k - F.lit(1)), gram)
    return df.withColumn(
        "hshingle",
        F.array_distinct(F.when(k > 0, grams).otherwise(F.array().cast("array<long>"))),
    ).drop("_toks")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs (id_a < id_b).

    Bands the signature into ``bands`` groups of ``num_hashes/bands``
    rows and buckets on the hash of each band; docs sharing any band
    bucket become candidates. The pair join happens only within
    buckets: the shuffle key is (band_idx, band_hash), so the cost is
    proportional to the number of colliding docs, not n².
    """
    rows_per_band = num_hashes // bands
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    candidates: DataFrame,
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keep pairs ≥ threshold.

    Only candidates are verified — the expensive set ops never run on
    the full cross product. Accepts either string shingles
    (``shingle``) or hashed shingles (``hshingle``, preferred: compact
    long arrays).
    """
    col = "hshingle" if "hshingle" in shingled.columns else "shingle"
    sh = shingled.select(F.col(id_col), col)
    a = sh.alias("sa")
    b = sh.alias("sb")
    joined = (
        candidates.join(a, candidates.id_a == F.col(f"sa.{id_col}"))
        .join(b, candidates.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.col(f"sa.{col}").alias("sh_a"),
            F.col(f"sb.{col}").alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH -> verify.

    Returns (id_a, id_b, jaccard) for verified near-duplicate pairs.
    Shingles are hashed to long arrays once and reused by both the
    signature branch and the verification joins.
    """
    # Three consumers (signatures + both verify-join sides) would
    # otherwise recompute the tokenize+hash subtree. LAZY persist: the
    # first consumer materializes the cache in the course of real work
    # (no separate priming action), the other two reuse it, and Spark's
    # LRU reclaims the blocks. Measured at sf0.1: lazy persist ~2.5-3.5s
    # end-to-end vs ~4.6s for an eager localCheckpoint (which pays a
    # synchronous store of every partition up front) and ~3.4s for
    # recomputing with no reuse at all. At 100 TB the same slot is an
    # explicit bronze table write; MEMORY_AND_DISK keeps the local path
    # spill-safe.
    from pyspark import StorageLevel

    sh = hashed_shingles(df.select(id_col, text_col), text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signatures(sh, id_col, num_hashes)
    cands = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    return jaccard_pairs(cands, sh.select(id_col, "hshingle"), id_col, threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash signature per document, computed via explode+agg.

    Token hash bits vote per position: sum(+1/-1) per bit -> sign ->
    signature. Implemented as explode(tokens) -> per-(doc,bit) weight
    via bitwise ops -> groupBy doc. One shuffle on doc_id; partial
    aggregation makes the map side cheap.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\\s+")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # shiftright+mask instead of 1<<b literals: 1<<63 overflows a long.
    bit_votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*bit_votes)
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(sig_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocks on 4 x 16-bit chunks (pigeonhole: distance ≤3 ⇒ at least one
    chunk equal), so the join is chunk-bucketed, never all-pairs.
    """
    chunks = sig_df.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------
def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag (train_id, eval_id, n_shared) pairs of training docs that
    share >= 1 distinct word n-gram with an eval/benchmark doc — the
    standard pre-training decontamination check (GPT-3 App. C / PaLM
    style: drop or scrub train docs overlapping the test set).

    Scale shape: the eval side is benchmark-sized (10^3-10^5 docs), so
    its exploded gram set is BROADCAST — the 100 TB train side is
    never shuffled by the join; the only shuffle is the partial-
    aggregated count over actual hit pairs, which is bounded by the
    contamination volume, not the corpus. Both sides reuse
    :func:`shingles` (distinct grams, so ``n_shared`` counts distinct
    shared grams — symmetric and order-free).
    """
    tr = shingles(train, text_col, n).select(
        F.col(id_col).alias("train_id"), F.explode("shingle").alias("gram")
    )
    ev = shingles(evalset, text_col, n).select(
        F.col(id_col).alias("eval_id"), F.explode("shingle").alias("gram")
    )
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
