"""Reference-implementation tests for the round-13 corpus-statistics
queries (plans/corpus_stats_queries.py): each query is recomputed in
plain Python over the sf0.001 fixture and compared value-by-value.
The oracle-parity harness proves Spark==DuckDB; these prove both
match the textbook definition."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _tokens(docs: pd.DataFrame):
    """(source, term) pairs matching the queries' shared tokenizer."""
    out = []
    for _, r in docs.iterrows():
        for tok in r["text"].lower().split():
            if tok:
                out.append((r["source"], tok))
    return out


def test_g2_keyness_matches_reference(spark, docs):
    toks = _tokens(docs)
    st = Counter(toks)
    tt = Counter(term for _s, term in toks)
    sn = Counter(s for s, _t in toks)
    n = len(toks)
    scored = []
    for (s, term), a in st.items():
        ct = tt[term]
        if ct < 20:
            continue
        b, c = ct - a, sn[s]
        d = n - c
        if a * d <= b * c:
            continue
        e1 = c * ct / n
        e2 = d * ct / n
        g2 = 2.0 * (
            (a * math.log(a / e1) if a > 0 else 0.0)
            + (b * math.log(b / e2) if b > 0 else 0.0)
        )
        scored.append((s, term, a, b, g2))
    ref = {}
    for s in sn:
        top = sorted(
            [r for r in scored if r[0] == s], key=lambda r: (-r[4], r[1])
        )[:5]
        for r in top:
            ref[(s, r[1])] = r
    rows = all_specs()["g2_keyness_by_source"].build(spark, SF).collect()
    assert len(rows) == len(ref)
    for r in rows:
        s, term, a, b, g2 = ref[(r["source"], r["term"])]
        assert (r["a"], r["b"]) == (a, b)
        # portable ln vs math.log: agree to ~1e-12 relative; the e6
        # floor can differ by at most 1 grain at a boundary
        assert abs(r["g2_e6"] - math.floor(1e6 * g2)) <= 1


def test_burrows_delta_matches_reference(spark, docs):
    toks = _tokens(docs)
    st = Counter(toks)
    sn = Counter(s for s, _t in toks)
    tt = Counter(term for _s, term in toks)
    mfw = [t for t, _c in sorted(tt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]
    sources = sorted(sn)
    k = len(sources)
    # quantized relative frequencies, as the contract defines them
    fq = {
        (s, t): math.floor(1e9 * st.get((s, t), 0) / sn[s])
        for s in sources
        for t in mfw
    }
    z = {}
    for t_ in mfw:
        vals = [fq[(s, t_)] for s in sources]
        mean = sum(vals) / k
        var = sum(v * v for v in vals) / k - mean * mean
        for s in sources:
            z[(s, t_)] = 0.0 if var <= 0 else (fq[(s, t_)] - mean) / math.sqrt(var)
    ref = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            dq = sum(
                math.floor(1e9 * abs(z[(sa, t_)] - z[(sb, t_)])) for t_ in mfw
            )
            ref[(sa, sb)] = (len(mfw), math.floor(dq / (len(mfw) * 1000.0)))
    rows = all_specs()["burrows_delta_sources"].build(spark, SF).collect()
    assert len(rows) == len(ref)
    for r in rows:
        n_terms, delta = ref[(r["src_a"], r["src_b"])]
        assert r["n_terms"] == n_terms
        assert abs(r["delta_e6"] - delta) <= 1


def test_chunked_ttr_matches_reference(spark, docs):
    ref = {}
    for _, r in docs.iterrows():
        arr = r["text"].lower().split(" ")
        # positions over the RAW split array, then drop empties —
        # the contract's chunking rule
        chunks: dict[int, list[str]] = {}
        for p, tok in enumerate(arr):
            if tok:
                chunks.setdefault(p // 50, []).append(tok)
        full = {c: v for c, v in chunks.items() if len(v) == 50}
        if not full:
            continue
        n_types = sum(len(set(v)) for v in full.values())
        ref[r["doc_id"]] = (
            len(full),
            math.floor(1e6 * n_types / (50.0 * len(full))),
        )
    rows = all_specs()["chunked_ttr_docs"].build(spark, SF).collect()
    assert len(rows) == len(ref)
    for r in rows:
        assert (r["n_chunks"], r["ttr_e6"]) == ref[r["doc_id"]], r


def test_oov_rate_matches_reference(spark, docs):
    toks = _tokens(docs)
    tt = Counter(term for _s, term in toks)
    vocab = {
        t for t, _c in sorted(tt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    }
    per_src: dict[str, list[int]] = {}
    for s, term in toks:
        tot_oov = per_src.setdefault(s, [0, 0])
        tot_oov[0] += 1
        tot_oov[1] += term not in vocab
    rows = all_specs()["oov_rate_by_source"].build(spark, SF).collect()
    assert len(rows) == len(per_src)
    for r in rows:
        tot, oov = per_src[r["source"]]
        assert (r["n_tokens"], r["n_oov"]) == (tot, oov)
        assert r["oov_rate_e6"] == math.floor(1e6 * oov / tot)


def test_doclen_lognormal_matches_reference(spark, docs):
    per_src: dict[str, list[int]] = {}
    for _, r in docs.iterrows():
        if r["n_chars"] > 0:
            per_src.setdefault(r["source"], []).append(
                math.floor(1e6 * math.log(float(r["n_chars"])))
            )
    rows = all_specs()["doclen_lognormal_fit"].build(spark, SF).collect()
    assert len(rows) == len(per_src)
    for r in rows:
        ls = per_src[r["source"]]
        n = len(ls)
        mu = math.floor(sum(ls) / n)
        var = sum(v * v for v in ls) / n - (sum(ls) / n) ** 2
        sigma = math.floor(math.sqrt(max(var, 0.0)))
        assert r["n_docs"] == n
        # portable-ln grains vs math.log grains: each per-doc grain
        # can differ by 1 at a floor boundary, so the mean/std of ~25
        # docs can drift a few grains
        assert abs(r["mu_e6"] - mu) <= 3
        assert abs(r["sigma_e6"] - sigma) <= 3


def test_new_corpus_queries_plan_shape(spark):
    """Scale-guard: the G2 top-5 window must group-limit; the OOV
    vocabulary membership join must broadcast; no cartesian products
    anywhere (the burrows grid cross join is broadcast-sized)."""
    import io
    from contextlib import redirect_stdout

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    specs = all_specs()
    p = plan_of(specs["g2_keyness_by_source"].build(spark, SF))
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    p = plan_of(specs["oov_rate_by_source"].build(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    p = plan_of(specs["burrows_delta_sources"].build(spark, SF))
    assert "CartesianProduct" not in p
    p = plan_of(specs["doclen_lognormal_fit"].build(spark, SF))
    assert "Exchange" in p and "CartesianProduct" not in p
