"""Fold-order invariance gate (VERDICT r12 item 2).

The r11/r12 ``kaplan_meier_survival`` driver reds shared one
mechanism: the oracle collected fold terms with a windowed
``list(...) OVER`` — whose frame-assembly order is
implementation-defined under parallel window computation — and folded
them through float multiplication whose product landed on exact
``floor(1e6*x)`` boundaries (0.8, 0.5, ...), so any DuckDB build that
assembled the list in a different order flipped 11/85 sf0.01 rows by
±1.  These tests are the standing gate for that entire class:

A. STATIC — no oracle may use windowed ``list(...) OVER`` at all.
   Ordered collection must be the in-aggregate ``list(x ORDER BY k)``
   form (spec-guaranteed element order, the shape
   ``portable_math.ordered_sum_sql`` emits) or a positionally-ordered
   producer such as ``string_split``.

B. DYNAMIC — every ``list_reduce`` oracle is re-executed with each of
   its ordered lists wrapped in ``list_reverse(...)`` (the judge's
   r12 repro, automated).  A contract must either be value-invariant
   under the reversal (order-free: per-term integer quantization, or
   a fold that is mathematically commutative over the collected
   terms) or appear in ``ORDER_PINNED`` with a rationale for why its
   pinned order is build-safe.  Order-pinned contracts are
   additionally required to pin via the in-aggregate form only — the
   static scan guarantees no windowed list survives.

Runs against DuckDB only (no SparkSession): the property under test
is the oracle side's robustness to "any DuckDB build"; the Spark side
pins its order with ``array_sort`` / in-aggregate ``sort_array``,
which Spark guarantees.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from ag_data_ingestion_github_to_snowflake_spark.plans import registry as R

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Contracts whose hashed values legitimately depend on fold order.
# Every entry must justify why pinned order is safe on ANY build:
# the order itself must come from a spec-guaranteed construct
# (in-aggregate ORDER BY — verified by the static scan below), and
# the fold must be deterministic GIVEN that order (pure integer math,
# or IEEE +,*,/ with no libm).
# kaplan_meier_survival left this table in r14: its oracle's
# recurrence is now a plain RECURSIVE CTE joined on row_number
# (VERDICT r13 item 1) — no list() collection exists to reverse, so
# the fold-order gate no longer applies; order is pinned by the
# rn = rn+1 equi-join, which no build can reorder.
ORDER_PINNED: dict[str, str] = {
    "double_ewma_forecast": (
        "Holt level/trend recurrence is inherently sequential; order "
        "pinned by in-aggregate ORDER BY; the fold is IEEE +,* only "
        "(no libm), deterministic given the pinned order"
    ),
    "ewma_events_daily": (
        "EWMA recurrence is inherently sequential; order pinned by "
        "in-aggregate ORDER BY; fold is IEEE +,* only, deterministic "
        "given the pinned order"
    ),
}


def _list_call_spans(sql: str):
    """Yield (start, end, inner, windowed) for each ``list( ... )``
    aggregate call; ``windowed`` is True when the call is immediately
    followed by OVER."""
    for m in re.finditer(r"\blist\s*\(", sql):
        depth, j = 1, m.end()
        while depth and j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
        windowed = re.match(r"\s*OVER\b", sql[j:]) is not None
        yield m.start(), j, inner, windowed


def _ordered(inner: str) -> bool:
    return " ORDER BY " in inner.upper().replace("\n", " ")


def _reverse_ordered_lists(sql: str) -> tuple[str, int]:
    """Wrap every in-aggregate-ordered list(...) in list_reverse()."""
    spans = [
        (s, e)
        for s, e, inner, _w in _list_call_spans(sql)
        if _ordered(inner)
    ]
    # outermost-first, non-overlapping
    spans.sort()
    applied, last = [], -1
    for s, e in spans:
        if s < last:
            continue
        applied.append((s, e))
        last = e
    out, i, n = [], 0, 0
    for s, e in applied:
        out.append(sql[i:s])
        out.append("list_reverse(" + sql[s:e] + ")")
        i = e
        n += 1
    out.append(sql[i:])
    return "".join(out), n


def _canon(df):
    """Driver-style order-insensitive canonicalization (value level)."""
    import math

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for _, r in df.iterrows():
        cells = []
        for c in cols:
            v = r[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("N")
            elif isinstance(v, float):
                cells.append(f"{v:.9g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return sorted(rows)


def _oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in R.all_specs().items()
        if spec.oracle is not None
    }


def test_no_windowed_list_anywhere():
    """Part A: windowed ``list(...) OVER`` is banned outright — its
    frame-assembly order is implementation-defined (the r12 red's
    root cause).  Ordered collection must use the in-aggregate
    ``list(x ORDER BY k)`` form."""
    offenders = []
    for name, sql in _oracles().items():
        for s, _e, inner, windowed in _list_call_spans(sql):
            if windowed:
                offenders.append((name, inner[:60].replace("\n", " ")))
    assert not offenders, (
        "windowed list() collections found (implementation-defined "
        f"order): {offenders}"
    )


def test_order_pinned_entries_exist_and_use_in_aggregate_order():
    """Every ORDER_PINNED name must be a real oracle contract whose
    ordered collection is exclusively the in-aggregate form."""
    oracles = _oracles()
    for name in ORDER_PINNED:
        assert name in oracles, f"ORDER_PINNED entry {name} not registered"
        sql = oracles[name]
        ordered_lists = [
            inner
            for _s, _e, inner, w in _list_call_spans(sql)
            if _ordered(inner)
        ]
        assert ordered_lists, (
            f"{name} is ORDER_PINNED but its oracle has no in-aggregate "
            "ordered list — stale entry?"
        )


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


def _fold_contract_names() -> list[str]:
    return sorted(
        name
        for name, sql in _oracles().items()
        if "list_reduce" in sql
        and any(_ordered(i) for _s, _e, i, _w in _list_call_spans(sql))
    )


@pytest.mark.parametrize("name", _fold_contract_names())
def test_fold_reversal_invariance(con, name):
    """Part B: re-run each fold oracle with every ordered list
    reversed.  Invariant => order-free contract (robust to any build
    unconditionally).  Non-invariant => must be ORDER_PINNED with a
    build-safety rationale."""
    sql = _oracles()[name]
    rev, n = _reverse_ordered_lists(sql)
    assert n > 0
    base = _canon(con.execute(sql).fetchdf())
    flipped = _canon(con.execute(rev).fetchdf())
    if base == flipped:
        # Order-free: make sure we are not carrying a stale waiver.
        assert name not in ORDER_PINNED, (
            f"{name} is reversal-invariant — remove its ORDER_PINNED "
            "waiver so regressions resurface"
        )
    else:
        assert name in ORDER_PINNED, (
            f"{name} hashes differently under fold reversal and has no "
            "ORDER_PINNED rationale — re-shape it to per-term integer "
            "quantization or document why its pinned order is build-safe"
        )
