"""Unicode NFC normalization as an Arrow-batched map operator.

Every web-scale text pipeline canonicalizes Unicode before hashing,
deduping, or tokenizing: the SAME rendered text can arrive as
composed codepoints (NFC, 'é' = U+00E9) or decomposed sequences
(NFD, 'e' + U+0301), and un-normalized corpora silently split
duplicate groups and inflate vocabularies. (Reference parity note:
the reference script /root/reference/src/extract_github_data.py
ships JSON through untouched; normalization belongs to the mandated
training-data-pipeline extension set.)

Spark has no built-in normalizer, so this is a textbook
``mapInPandas`` case (SURVEY §7.4 class b): Python's ``unicodedata``
— the same UCD tables DuckDB's ``nfc_normalize`` uses, which is what
makes the oracle a true differential — applied inside Arrow batches,
schema-preserving plus audit columns. Map-side only: no shuffle, no
state; scales linearly with corpus bytes and pipelines with any
downstream dedup/tokenize stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def nfc_normalize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    changed_col: str = "changed",
) -> DataFrame:
    """Append ``out_col`` = NFC(text) and ``changed_col`` = whether
    normalization altered the string. All input columns pass through
    untouched (Arrow batch in, Arrow batch out)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out_col, T.StringType()),
            T.StructField(changed_col, T.BooleanType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in batches:
            src = pdf[text_col]
            norm = src.map(
                lambda s: unicodedata.normalize("NFC", s) if s is not None else None
            )
            pdf[out_col] = norm
            # NULL text -> NULL changed (SQL three-valued convention:
            # DuckDB's (norm_text <> text) yields NULL there too; a
            # false here would diverge the differential on NULL rows).
            pdf[changed_col] = pd.Series(
                (norm != src) & src.notna(), dtype="boolean"
            ).mask(src.isna())
            yield pdf

    return df.mapInPandas(kernel, schema=schema)
