"""Pandas UDF families beyond grouped-map (SURVEY §2.B51): a
grouped-aggregate UDAF and a Python UDTF — the remaining user-defined
function surfaces Spark offers, each Arrow-batched.

Exposed as factories because the registration decorators require an
active SparkSession (they resolve return types against the session).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


def make_weighted_avg_udaf():
    """Grouped-agg pandas UDAF: weighted average of values by weights.

    Usage: ``df.groupBy(k).agg(wavg(v, w))`` — Spark feeds each
    group's columns as whole pandas Series (Arrow); the scalar return
    is the aggregate. Decomposes to sum(w*v)/sum(w), so a SQL oracle
    is exact modulo float rounding.
    """

    @pandas_udf("double")
    def weighted_avg(values: pd.Series, weights: pd.Series) -> float:
        denom = float(weights.sum())
        if denom == 0:
            return 0.0
        return float((values * weights).sum() / denom)

    return weighted_avg


def make_split_sentences_udtf():
    """Python UDTF: explode a document into sentences with metadata.

    One input row -> N output rows (sentence, word count, position) —
    the lateral-join shape a scalar function can't express.
    """

    @udtf(returnType="sentence: string, n_words: int, position: int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            # position = emitted ordinal (dense 0..n-1), not the raw
            # split index: empty segments ('..') must not leave gaps.
            pos = 0
            for raw in text.split("."):
                s = raw.strip()
                if s:
                    yield s, len(s.split()), pos
                    pos += 1

    return SplitSentences
