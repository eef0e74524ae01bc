"""Distributed PCA over an embedding column — the standard
dimensionality-reduction step before clustering / visualization /
cheap ANN in an embedding curation pipeline.

The textbook two-phase shape every distributed PCA uses (and the only
one that scales):

1. ONE pass over the data computes the sufficient statistics
   (n, sum x, sum x xᵀ) as per-partition partials via ``mapInPandas``
   (numpy matmul per Arrow batch — the d x d partial is O(dim²) per
   partition regardless of row count), combined on the driver.
   Driver traffic is n_partitions * (dim² + dim) floats — for
   dim=64 that is ~33 KB per partition, invariant in the data.
2. The dim x dim covariance eigendecomposition runs on the DRIVER
   (``numpy.linalg.eigh`` — dim=64 is microseconds; the cluster never
   sees it), and the top-k components broadcast back into a map-side
   projection (again numpy per Arrow batch).

Determinism: partials are fixed by the input partitioning; eigh is
deterministic; eigenvector SIGN is canonicalized (largest-|component|
coordinate made positive) so reruns and restarts emit identical
projections. Cross-engine float replay is NOT claimed — an
eigendecomposition has no SQL twin — so the registry entry is
rows-only and the math contracts (orthonormality, eigenvalue order,
projection variance == eigenvalue, monotone reconstruction error)
are pinned in ``tests/test_pca.py`` instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_stats(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[dim], cov[dim, dim]) from one distributed pass.

    Per-partition partials ride back as raw float64 bytes (exact — no
    text serialization); the driver combines and forms the unbiased
    covariance.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        ss = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "ss": [ss.tobytes()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(part, "n long, s binary, ss binary")
        .collect()  # bounded: one row per partition
    )
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("need at least 2 vectors for covariance")
    s = np.zeros(dim)
    ss = np.zeros((dim, dim))
    for r in rows:
        s += np.frombuffer(r["s"], dtype=np.float64)
        ss += np.frombuffer(r["ss"], dtype=np.float64).reshape(dim, dim)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov


def pca_components(
    df: DataFrame, k: int, vec_col: str = "embedding", dim: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(eigvals[k], components[k, dim], mean[dim]) — top-k principal
    axes, eigenvalues descending, sign-canonicalized."""
    _, mean, cov = covariance_stats(df, vec_col=vec_col, dim=dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()  # (k, dim)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return vals[order], comps, mean


def project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pc",
) -> DataFrame:
    """(id, pc array<double> of length k): centered projection, pure
    map-side numpy per Arrow batch."""
    comps = np.ascontiguousarray(components, dtype=np.float64)
    mu = np.ascontiguousarray(mean, dtype=np.float64)

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (x - mu) @ comps.T
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(p)})

    return df.select(id_col, vec_col).mapInPandas(
        proj, f"{id_col} long, {out_col} array<double>"
    )
