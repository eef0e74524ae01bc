"""Static determinism gate for hash contracts (r12, VERDICT r11 item 5).

The r11 driver reds came from build-sensitive math inside hashed
values. This guard keeps the two eradicated classes out permanently:

1. No oracle may call libm transcendentals (`ln/exp/log*/pow`) — the
   portable_math twins are the only sanctioned spelling.
2. No Spark plan module may use `F.log/F.exp/F.pow` outside
   portable_math itself.

A regex scan, not a semantic one, so it also catches new queries that
copy an old pattern from a blog post. Comments are stripped first so
prose mentioning ln() doesn't false-positive.
"""

from __future__ import annotations

import re
from pathlib import Path

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "ag_data_ingestion_github_to_snowflake_spark"

_LIBM = re.compile(r"(?<![a-zA-Z_.])(ln|exp|log|log2|log10|pow|power)\s*\(", re.I)
_COMMENT = re.compile(r"--[^\n]*")


def test_no_libm_in_any_oracle():
    offenders = {}
    for name, spec in all_specs().items():
        if not spec.oracle:
            continue
        sql = _COMMENT.sub("", spec.oracle)
        hits = sorted({m.group(1).lower() for m in _LIBM.finditer(sql)})
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "libm in oracle SQL (use operators/portable_math twins): "
        f"{offenders}"
    )


def test_no_spark_libm_in_plans_or_operators():
    banned = re.compile(r"F\.(log|log2|log10|log1p|exp|expm1|pow)\b")
    offenders = []
    for py in list((PKG / "plans").glob("*.py")) + list(
        (PKG / "operators").glob("*.py")
    ):
        if py.name == "portable_math.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if banned.search(code):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, (
        "Spark-side libm call in an engine module (use portable_math): "
        + "; ".join(offenders)
    )


def test_no_round_over_hashed_fold():
    """ROUND(double, k) directly wrapping a list_reduce fold was the
    r11 cramers_v failure shape — quantize folds with floor_e6_sql
    instead."""
    offenders = []
    for name, spec in all_specs().items():
        if not spec.oracle:
            continue
        sql = _COMMENT.sub("", spec.oracle).lower()
        if re.search(r"round\s*\(\s*list_reduce", sql):
            offenders.append(name)
    assert not offenders, f"ROUND over a fold in: {offenders}"
