"""Distributed-PCA properties: the driver-side eigh must agree with numpy
full PCA on the same quantized corpus, and the projection query's scores
must realize the eigenvalues as variances."""

from __future__ import annotations

import duckdb
import numpy as np

from .conftest import SF_SMOKE


def _corpus(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    return np.floor(X * 32768.0 + 0.5) / 32768.0  # same 2^-15 grid


def test_principal_components_match_numpy(spark):
    from nyc_taxi_lakehouse_spark.llm.pca import principal_components

    evals, comps, mu = principal_components(spark, SF_SMOKE, k=8)
    X = _corpus(SF_SMOKE)
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)

    cov = np.cov(X, rowvar=False, bias=True)
    ref_evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    assert np.allclose(evals, ref_evals, rtol=1e-9)

    # rows orthonormal; each is an eigenvector of cov with its eigenvalue
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    for lam, v in zip(evals, comps):
        assert np.allclose(cov @ v, lam * v, atol=1e-9)
    # sign convention: pivot coordinate positive
    for v in comps:
        assert v[np.argmax(np.abs(v))] > 0

    # eigenvalues nonincreasing, nonnegative (cov is PSD)
    assert (np.diff(evals) <= 1e-15).all()
    assert (evals >= -1e-12).all()


def test_pca_projection_scores_realize_eigenvalues(spark):
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_pca_project"].fn(spark, SF_SMOKE).toPandas()
    X = _corpus(SF_SMOKE)
    n = X.shape[0]
    assert len(got) == n * 8
    wide = got.pivot(index="vec_id", columns="pc", values="score")

    # centered scores: mean ~0, per-PC variance = eigenvalue, cross-PC cov ~0
    from nyc_taxi_lakehouse_spark.llm.pca import principal_components

    evals, comps, mu = principal_components(spark, SF_SMOKE, k=8)
    S = wide.values
    assert np.allclose(S.mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(S.var(axis=0), evals, rtol=1e-9)
    c = (S.T @ S) / n
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-9

    # scores equal the serial projection
    ref = (X - X.mean(axis=0)) @ comps.T
    assert np.allclose(np.sort(S, axis=0), np.sort(ref, axis=0), atol=1e-9)
