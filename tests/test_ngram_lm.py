"""Stupid Backoff n-gram LM (operators/ngram_lm.py) vs hand-computed
reference values; the registry query's oracle parity rides
tests/test_oracle_parity.py like every other carrier."""

from __future__ import annotations

import math

import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators.ngram_lm import (
    ALPHA,
    ngram_counts,
    stupid_backoff_scores,
)

TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
]
# Counts: uni: the=3 cat=2 sat=1 on=1 mat=1 ran=1  (N=9, V=6)
#         bi: "the cat"=2 "cat sat"=1 "sat on"=1 "on the"=1 "the mat"=1 "cat ran"=1
#         tri: "the cat sat"=1 "cat sat on"=1 "sat on the"=1 "on the mat"=1 "the cat ran"=1


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_ngram_counts_exact(spark):
    got = {
        (r["n"], r["gram"]): r["cnt"]
        for r in ngram_counts(_df(spark, TRAIN)).collect()
    }
    assert got[(1, "the")] == 3
    assert got[(1, "cat")] == 2
    assert got[(2, "the cat")] == 2
    assert got[(2, "cat sat")] == 1
    assert got[(3, "the cat sat")] == 1
    assert sum(c for (n, _), c in got.items() if n == 1) == 9
    assert len([1 for (n, _) in got if n == 1]) == 6


def test_backoff_chain_hand_computed(spark):
    """One test doc exercising all three levels:

    'the cat sat' -> trigram hit: c3/c(the cat) = 1/2
    'cat sat mat' -> no trigram 'cat sat mat'; backoff bigram 'sat mat'
                     unseen too -> root: 0.4*0.4*(c(mat)+1)/(N+V)
                     = 0.16 * 2/15
    'cat sat on'  -> trigram hit: 1/1
    A doc 'the cat ran fast': trigram 'cat ran fast' unseen, bigram
    'ran fast' unseen -> root with OOV word: 0.16 * (0+1)/15;
    trigram 'the cat ran' hit: 1/2.
    """
    train = _df(spark, TRAIN)
    test = _df(spark, [(10, "the cat sat mat on"), (11, "the cat ran fast")])
    rows = {
        r["doc_id"]: r
        for r in stupid_backoff_scores(train, test).collect()
    }
    # doc 10 trigrams: "the cat sat" (hit3, 1/2), "cat sat mat" (root),
    # "sat mat on" (root: bigram "mat on" unseen)
    r10 = rows[10]
    assert (r10["n_tri"], r10["hit3"], r10["hit2"], r10["hit1"]) == (3, 1, 0, 2)
    s_root_mat = ALPHA * ALPHA * (1 + 1) / (9 + 6)  # c(mat)=1
    s_root_on = ALPHA * ALPHA * (1 + 1) / (9 + 6)  # c(on)=1
    exp10 = (math.log10(0.5) + math.log10(s_root_mat) + math.log10(s_root_on)) / 3
    assert r10["score_e6"] / 1e6 == pytest.approx(exp10, abs=2e-6)
    # doc 11 trigrams: "the cat ran" (hit3, 1/2), "cat ran fast" (root,
    # OOV 'fast' -> (0+1)/15)
    r11 = rows[11]
    assert (r11["n_tri"], r11["hit3"], r11["hit2"], r11["hit1"]) == (2, 1, 0, 1)
    exp11 = (
        math.log10(0.5) + math.log10(ALPHA * ALPHA * 1 / 15)
    ) / 2
    assert r11["score_e6"] / 1e6 == pytest.approx(exp11, abs=2e-6)


def test_bigram_backoff_level(spark):
    """A trigram whose exact form is unseen but whose backoff bigram
    was seen resolves at level 2 with 0.4 * c(w2 w3)/c(w2)."""
    train = _df(spark, TRAIN)
    # "ran the cat": trigram unseen; backoff bigram "the cat" seen ->
    # 0.4 * c(the cat)/c(the) = 0.4 * 2/3
    test = _df(spark, [(20, "ran the cat")])
    r = stupid_backoff_scores(train, test).collect()[0]
    assert (r["n_tri"], r["hit3"], r["hit2"], r["hit1"]) == (1, 0, 1, 0)
    assert r["score_e6"] / 1e6 == pytest.approx(math.log10(ALPHA * 2 / 3), abs=2e-6)


def test_short_and_empty_docs_dropped(spark):
    train = _df(spark, TRAIN)
    test = _df(spark, [(30, "just two"), (31, "one"), (32, "the cat sat")])
    rows = stupid_backoff_scores(train, test).collect()
    assert {r["doc_id"] for r in rows} == {32}
