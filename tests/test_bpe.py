"""BPE merge training vs a pure-Python reference implementation.

The distributed trainer (operators/bpe.py) is iterative and
driver-coordinated, so its registry entry is rows-only; this test IS
its correctness gate — the learned merge table must equal, rule for
rule, what the classic single-machine algorithm (Sennrich et al. 2016,
overlapping pair counts, left-to-right non-overlapping rewrite,
(count desc, left, right) tie-break) produces on the same corpus.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.bpe import (
    END_OF_WORD,
    _merge_pair_expr,
    train_bpe_merges,
)


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    wf = Counter()
    for t in texts:
        for w in t.lower().split():
            wf[w] += 1
    syms = {w: list(w) + [END_OF_WORD] for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, freq in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
]


def test_trained_merges_equal_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id INT, text STRING")
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe_merges(spark, docs, n_merges=8).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(CORPUS, 8)


def test_merge_fold_overlap_rule(spark):
    """'aaaa' under merge (a,a) fuses left-to-right non-overlapping:
    [aa, aa]; 'aaa' gives [aa, a]."""
    df = spark.createDataFrame([(["a", "a", "a", "a"],), (["a", "a", "a"],)], "sym: array<string>")
    out = df.select(_merge_pair_expr(F.col("sym"), "a", "a").alias("m")).collect()
    assert [r.m for r in out] == [["aa", "aa"], ["aa", "a"]]


def test_merge_fold_no_match_identity(spark):
    df = spark.createDataFrame([(["x", "y", "z"],)], "sym: array<string>")
    out = df.select(_merge_pair_expr(F.col("sym"), "a", "b").alias("m")).collect()
    assert out[0].m == ["x", "y", "z"]


def test_registry_query_runs(spark):
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    df = all_specs()["bpe_train_merges"].build(spark, "/root/testdata/sf0.001")
    rows = df.orderBy("rank").collect()
    assert len(rows) == 6
    # counts must be non-increasing in learn order only when no merge
    # creates a more frequent pair — not guaranteed in general, so
    # assert the structural invariants instead.
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert all(r["pair_count"] > 0 for r in rows)
    assert len({(r["left"], r["right"]) for r in rows}) == 6


def test_apply_merges_matches_reference(spark):
    """apply_bpe_merges_expr must equal the reference tokenizer's
    merge application, including cascades through fused tokens."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.bpe import (
        apply_bpe_merges_expr,
    )

    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    words = ["low", "lower", "hello", "lll", "x"]

    def ref(word):
        s = list(word) + [END_OF_WORD]
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    sym = F.concat(F.split(F.col("w"), ""), F.array(F.lit(END_OF_WORD)))
    got = {
        r["w"]: r["m"]
        for r in df.select("w", apply_bpe_merges_expr(sym, merges).alias("m")).collect()
    }
    for w in words:
        assert got[w] == ref(w), (w, got[w], ref(w))


def test_merge_fold_randomized_vs_reference(spark):
    """300 random symbol sequences (alphabet chosen to force overlap
    and fused-token collisions) through one Spark job, each compared
    to the reference non-overlapping rewrite."""
    import random

    rng = random.Random(1234)
    alphabet = ["a", "b", "ab", "c"]
    seqs = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        for _ in range(300)
    ]

    def ref(s, a, b):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], "i INT, sym: array<string>"
    )
    for a, b in [("a", "b"), ("a", "a"), ("ab", "c")]:
        got = {
            r["i"]: r["m"]
            for r in df.select("i", _merge_pair_expr(F.col("sym"), a, b).alias("m")).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == ref(s, a, b), (i, s, a, b, got[i])


def test_batched_training_equals_sequential_reference(spark):
    """The batch-acceptance rule must leave the learned merge table
    bit-identical to the one-merge-per-round reference — on the chained
    fixture corpus (batching mostly degrades to singles) AND on a
    randomized corpus (mixture of independent and cascading pairs)."""
    import random

    rng = random.Random(99)
    vocab = ["ab", "cd", "ef", "gh", "xy", "pq", "abab", "lowest", "newer", "wide"]
    rand_corpus = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
        for _ in range(60)
    ]
    for corpus, n in [(CORPUS, 8), (rand_corpus, 10)]:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)], "doc_id INT, text STRING"
        )
        got = [
            (r["left"], r["right"], r["pair_count"])
            for r in train_bpe_merges(spark, docs, n_merges=n, batch_size=8)
            .orderBy("rank")
            .collect()
        ]
        assert got == _ref_bpe(corpus, n)


def test_batched_training_cuts_driver_rounds(spark):
    """16 token-disjoint repeated-pair words with strictly separated
    frequencies: all 16 merges must land in very few driver rounds
    (VERDICT r5 item 6: >= 4x fewer round-trips at an equal merge
    list), still bit-identical to the sequential reference."""
    import string

    words = []
    for i in range(16):
        a, b = string.ascii_lowercase[i], string.ascii_uppercase[i]
        words.append((a + b) * 2)  # e.g. "aAaA": pair (a, A) dominates its chain
    corpus = [" ".join([words[i]] * (100 - 5 * i)) for i in range(16)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id INT, text STRING"
    )
    stats: dict = {}
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe_merges(
            spark, docs, n_merges=16, batch_size=16, stats=stats
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == _ref_bpe(corpus, 16)
    assert stats["rounds"] <= 4, stats  # sequential would take 16


def test_batch_accept_in_walk_fusion_collision():
    """Two token-disjoint accepts can fuse to the SAME new symbol
    (lo+west and low+est -> 'lowest'); pairs touching that shared
    symbol can then gain count from BOTH merges (stacking up to ~2B),
    so the batch must close right after the second fusion — accepting
    anything later would not be provably sequential-equivalent."""
    from ag_data_ingestion_github_to_snowflake_spark.operators.bpe import (
        _batch_accept,
    )

    top = [
        {"a": "lo", "b": "west", "cnt": 100},
        {"a": "low", "b": "est", "cnt": 90},
        {"a": "p", "b": "q", "cnt": 80},
    ]
    syms = {"lo", "west", "low", "est", "p", "q"}
    got = _batch_accept(top, tail_bound=0, symbols=syms, max_accepts=8)
    # the colliding accept itself is safe (derived pairs at its step are
    # bounded by B=80 < 90 via the cnt > bound trim); ('p', 'q') is not.
    assert got == [("lo", "west", 100), ("low", "est", 90)]
