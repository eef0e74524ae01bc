"""Distributed PCA (operators/pca.py): the math contracts that stand
in for the SQL oracle an eigendecomposition cannot have."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ag_data_ingestion_github_to_snowflake_spark.operators import pca as P

DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df


def test_stats_match_numpy(spark, emb):
    n, mean, cov = P.covariance_stats(emb, dim=DIM)
    x = np.stack([r["embedding"] for r in emb.collect()]).astype(np.float64)
    assert n == x.shape[0]
    assert np.allclose(mean, x.mean(axis=0), atol=1e-10)
    assert np.allclose(cov, np.cov(x, rowvar=False), atol=1e-8)


def test_components_orthonormal_and_ordered(spark, emb):
    vals, comps, _ = P.pca_components(emb, k=6)
    assert np.allclose(comps @ comps.T, np.eye(6), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(5))
    # sign canon: the largest-|x| coordinate of each component is positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_projection_variance_equals_eigenvalues(spark, emb):
    vals, comps, mean = P.pca_components(emb, k=4)
    proj = np.stack(
        [r["pc"] for r in P.project(emb, comps, mean).collect()]
    )
    pvar = proj.var(axis=0, ddof=1)
    assert np.allclose(pvar, vals[:4], rtol=1e-6)


def test_reconstruction_error_monotone(spark, emb):
    x = np.stack([r["embedding"] for r in emb.collect()]).astype(np.float64)
    errs = []
    for k in (2, 8, 32):
        vals, comps, mean = P.pca_components(emb, k=k)
        recon = (x - mean) @ comps.T @ comps + mean
        errs.append(float(((x - recon) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]
    # full-rank reconstruction is exact
    vals, comps, mean = P.pca_components(emb, k=DIM)
    recon = (x - mean) @ comps.T @ comps + mean
    assert float(((x - recon) ** 2).mean()) < 1e-18


def test_registry_entry_stable(spark):
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    a = all_specs()["embedding_pca_project"].build(spark, "/root/testdata/sf0.001")
    b = all_specs()["embedding_pca_project"].build(spark, "/root/testdata/sf0.001")
    # exploded scalar shape (harness canonicalizer can't hash arrays)
    assert a.columns == ["vec_id", "component_idx", "value"]
    ra = {(r["vec_id"], r["component_idx"]): r["value"] for r in a.collect()}
    rb = {(r["vec_id"], r["component_idx"]): r["value"] for r in b.collect()}
    assert ra == rb  # rerun-deterministic (sign canon + round-6)
    assert {i for (_, i) in ra} == {0, 1, 2, 3}  # k=4 components per vec


def test_frozen_literals_match_live_pca(spark):
    """Pin plans/pca_literals.py to the live pipeline: the frozen
    top-4 axes and mean must equal pca_components() over the sf0.01
    reference corpus (the corpus they were generated from). A drift
    here means the fixture or the PCA implementation changed without
    regenerating the literals."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.pca_literals import (
        PCA_COMPS,
        PCA_MEAN,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    _, comps, mean = P.pca_components(emb, k=4)
    assert np.allclose(np.array(PCA_MEAN), mean, atol=1e-9)
    assert np.allclose(np.array(PCA_COMPS), comps, atol=1e-8)


def test_verified_projection_matches_frozen_axes(spark):
    """The oracle-verified twin projects onto exactly the frozen axes:
    spot-check one vector's four projections against numpy."""
    from ag_data_ingestion_github_to_snowflake_spark.plans.pca_literals import (
        PCA_COMPS,
        PCA_MEAN,
    )
    from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

    out = (
        all_specs()["embedding_pca_project_verified"]
        .build(spark, "/root/testdata/sf0.01")
        .filter("vec_id = 7")
        .collect()[0]
    )
    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .filter("vec_id = 7")
        .collect()[0]["embedding"]
    )
    x = np.array(emb, dtype=np.float64)
    expected = (x - np.array(PCA_MEAN)) @ np.array(PCA_COMPS).T
    got = np.array([out["pc0"], out["pc1"], out["pc2"], out["pc3"]])
    assert np.allclose(got, expected, atol=1e-6)
