"""Property tests for the linalg operators (covariance + PCA whitening).

Oracle exactness for embedding_covariance is covered by
tools/verify_local.py / the driver; embedding_pca_whiten has no SQL
oracle (eigendecomposition), so its contract is pinned HERE: the Gram
kernel agrees with a straight numpy computation, and the whitened
output is decorrelated with unit variance.
"""

from __future__ import annotations

import numpy as np

from kafka_flink_slack_pipeline_spark.operators.linalg import (
    _DIM,
    _PCA_K,
    embedding_covariance,
    embedding_pca_whiten,
    gram_and_means,
    pca_whiten_vectors,
)
from kafka_flink_slack_pipeline_spark.tables import table


def _matrix(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    return np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in
         sorted(rows, key=lambda r: r.vec_id)]
    )


def test_covariance_matches_numpy(spark, sf_dir):
    x = _matrix(spark, sf_dir)
    ref = np.cov(x.T, bias=True)
    got = {(r.i, r.j): r.cov for r in
           embedding_covariance(spark, sf_dir).collect()}
    assert len(got) == _DIM * (_DIM + 1) // 2
    for (i, j), c in got.items():
        assert i <= j
        assert abs(c - ref[i, j]) < 1e-6


def test_gram_kernel_agrees_with_numpy(spark, sf_dir):
    x = _matrix(spark, sf_dir)
    g, s, n = gram_and_means(spark, sf_dir)
    assert n == x.shape[0]
    assert np.abs(g - x.T @ x).max() < 1e-9
    assert np.abs(s - x.sum(axis=0)).max() < 1e-9


def test_whitened_embeddings_are_decorrelated_unit_variance(spark, sf_dir):
    rows = pca_whiten_vectors(spark, sf_dir).collect()
    x = _matrix(spark, sf_dir)
    assert len(rows) == x.shape[0]
    w = np.array([[r[k + 1] for k in range(_PCA_K)] for r in rows])
    cov = np.cov(w.T, bias=True)
    # rounding to 6 decimals bounds each entry's drift well under 1e-4
    assert np.abs(cov - np.eye(_PCA_K)).max() < 1e-4


def test_whitening_is_deterministic(spark, sf_dir):
    a = pca_whiten_vectors(spark, sf_dir).collect()
    b = pca_whiten_vectors(spark, sf_dir).collect()
    assert a == b


def test_whiten_check_is_exact_identity(spark, sf_dir):
    """The registered certificate query must hash-equal the identity —
    the same contract the driver's DuckDB oracle now enforces."""
    rows = embedding_pca_whiten(spark, sf_dir).collect()
    assert len(rows) == _PCA_K * _PCA_K
    for r in rows:
        assert r.cov == (1.0 if r.i == r.j else 0.0), (r.i, r.j, r.cov)
