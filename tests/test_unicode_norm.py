"""NFC normalization operator (operators/unicode_norm.py)."""

from __future__ import annotations

import unicodedata

from ag_data_ingestion_github_to_snowflake_spark.operators.unicode_norm import (
    nfc_normalize,
)


def test_composes_decomposed_sequences(spark):
    rows = [
        (1, "cafe\u0301"),  # e + combining acute -> e-acute
        (2, "caf\u00e9"),  # already NFC
        (3, None),
        (4, ""),
        (5, "A\u030angstro\u0308m"),  # decomposed ring + diaeresis
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    got = {r["id"]: r for r in nfc_normalize(df, "text").collect()}
    assert got[1]["norm_text"] == "caf\u00e9" and got[1]["changed"]
    assert got[2]["norm_text"] == "caf\u00e9" and not got[2]["changed"]
    assert got[3]["norm_text"] is None and not got[3]["changed"]
    assert got[4]["norm_text"] == "" and not got[4]["changed"]
    assert got[5]["norm_text"] == unicodedata.normalize("NFC", rows[4][1])
    assert got[5]["norm_text"] == "\u00c5ngstr\u00f6m" and got[5]["changed"]


def test_passthrough_preserves_all_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", 3.5, ["a"])], "id INT, text STRING, w DOUBLE, tags ARRAY<STRING>"
    )
    out = nfc_normalize(df, "text")
    assert out.columns == ["id", "text", "w", "tags", "norm_text", "changed"]
    r = out.collect()[0]
    assert (r["id"], r["w"], r["tags"]) == (1, 3.5, ["a"])


def test_null_text_yields_null_changed(spark):
    """NULL text must emit NULL (not false) for ``changed`` — the SQL
    three-valued convention the DuckDB oracle's (norm_text <> text)
    follows, so the differential stays green if the corpus ever gains
    NULL rows."""
    df = spark.createDataFrame(
        [(1, "café"), (2, None), (3, "plain")],
        "doc_id INT, text STRING",
    )
    rows = {
        r["doc_id"]: (r["norm_text"], r["changed"])
        for r in nfc_normalize(df).collect()
    }
    assert rows[1] == ("caf\u00e9", True)
    assert rows[2] == (None, None)
    assert rows[3] == ("plain", False)
