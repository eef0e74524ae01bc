"""Distributed BPE merge-rule training (Sennrich et al. 2016) as an
iterative Spark aggregation.

The classic tokenizer-training loop: segment the corpus into words
with frequencies, split words into symbol sequences, then repeatedly
(1) count adjacent symbol pairs corpus-wide, (2) pick the most
frequent pair, (3) fuse its non-overlapping left-to-right occurrences.
Each round is exactly one distributed aggregation (explode adjacent
pairs -> groupBy(pair) -> sum(freq)) plus a driver-side top-1 — the
canonical "one reduce per merge" shape every distributed BPE trainer
uses; the merge rewrite itself is a map-side array fold, no shuffle.

Scale notes (100 TB): the loop runs over the DISTINCT-WORD table, not
the raw corpus — one up-front shuffle collapses the corpus to
vocabulary size (~millions of rows regardless of corpus bytes), after
which each merge iteration shuffles only (pair, count) partials with
map-side combine. The per-round driver traffic is ONE row (the argmax
pair). The working vocab is persisted and re-persisted each round so
lineage stays one fold deep.

Determinism: ties on pair count break by (left, right) string order,
so the learned merge table is a pure function of the corpus. Verified
against a pure-Python reference implementation in
``tests/test_bpe.py`` (the loop is driver-coordinated and iterative,
hence a rows-only registry entry — SURVEY §7.4's non-SQL-expressible
class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _merge_pair_expr(sym: Column, left: str, right: str) -> Column:
    """Fuse non-overlapping (left, right) occurrences left-to-right in
    one array fold: the accumulator carries (emitted prefix, pending
    symbol); a (pending=left, next=right) hit emits the fused token and
    clears the pending slot so overlaps ("aaa" under (a,a)) fuse like
    the reference tokenizer."""
    fused = left + right

    def step(acc: Column, s: Column) -> Column:
        hit = (
            acc["prev"].isNotNull()
            & (acc["prev"] == F.lit(left))
            & (s == F.lit(right))
        )
        out_else = F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(fused))).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(F.struct(out_else.alias("out"), s.alias("prev")))

    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    return F.aggregate(
        sym,
        zero,
        step,
        lambda acc: F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        ),
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): lowercase whitespace tokenization + one groupBy."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def train_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules.

    Returns (rank, left, right, pair_count) — rank is 1-based learn
    order. Adjacent-pair counts are overlapping (reference-tokenizer
    convention); the rewrite fuses non-overlapping left-to-right.
    """
    wf = word_frequencies(docs, text_col=text_col)
    syms = wf.select(
        "freq",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("sym"),
    ).persist()
    syms.count()  # materialize before the loop

    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = (
                syms.select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(sym) - 1),"
                            " i -> struct(sym[i - 1] AS a, sym[i] AS b))"
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
            )
            top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((rank, a, b, cnt))
            nxt = syms.select(
                "freq", _merge_pair_expr(F.col("sym"), a, b).alias("sym")
            ).persist()
            nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()

    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, pair_count BIGINT"
    )


def apply_bpe_merges(
    df: DataFrame, merges: list[tuple[str, str]], sym_col: str = "sym"
) -> Column:
    """Apply a learned merge table in order — a composition of array
    folds, map-side only (tokenize at inference time)."""
    return apply_bpe_merges_expr(F.col(sym_col), merges)


def apply_bpe_merges_expr(sym: Column, merges: list[tuple[str, str]]) -> Column:
    """Column-level form of ``apply_bpe_merges``."""
    for left, right in merges:
        sym = _merge_pair_expr(sym, left, right)
    return sym


def bpe_apply_oracle_expr(sym_expr: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB replay of ``apply_bpe_merges``: the same left-to-right
    non-overlapping fold as ``_merge_pair_expr``, via ``list_reduce``.

    The accumulator is a flat VARCHAR[] whose LAST element is the
    pending (not-yet-emitted) symbol — chr(0) marks "no pending" (NUL
    cannot occur in whitespace-split text tokens). A struct-shaped
    accumulator would be the direct transcription of the Spark fold,
    but DuckDB 1.0's list_reduce does not thread struct FIELDS through
    the accumulator correctly, so the state is list-encoded instead:

    - hit (pending == left, next == right):
      emitted ++ [fused, MARK]
    - else: (pending == MARK ? emitted : emitted ++ [pending]) ++ [next]
      — and ``emitted ++ [pending]`` is just the accumulator itself.

    list_reduce takes no initial value (it seeds with the first
    element); each symbol maps to the single-element list [s], making
    the seed identical to step(empty-state, s1). Equality to the Spark
    fold is pinned by tests and registry parity. Single quotes in
    merge tokens are unsupported (never produced by the whitespace
    tokenization).
    """
    expr = sym_expr
    for left, right in merges:
        if "'" in left or "'" in right:
            raise ValueError("merge tokens with quotes unsupported in oracle")
        fused = left + right
        step = (
            "(acc, e) -> CASE "
            f"WHEN acc[len(acc)] = '{left}' AND e[len(e)] = '{right}' "
            f"THEN acc[1:len(acc) - 1] || ['{fused}', chr(0)] "
            "ELSE (CASE WHEN acc[len(acc)] = chr(0) "
            "THEN acc[1:len(acc) - 1] ELSE acc END) || [e[len(e)]] END"
        )
        folded = f"list_reduce(list_transform({expr}, s -> [s]), {step})"
        expr = (
            f"(SELECT CASE WHEN f[len(f)] = chr(0) THEN f[1:len(f) - 1] "
            f"ELSE f END FROM (SELECT {folded} AS f))"
        )
    return expr
