"""PCA projection: the distributed moment pipeline must agree with a
driver-side numpy replication bit-for-bit (both build the covariance from
the same exact integer sums), and the axes must behave like principal
axes (descending explained variance, orthonormal)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pandas_etl_framework_spark.llmops.projection import (
    COV_SCALE,
    covariance_moments,
    pca_components,
    pca_project,
)
from pandas_etl_framework_spark.llmops.similarity import _emb

SF = "/root/testdata/sf0.001"


def _half_away(x: np.ndarray) -> np.ndarray:
    # Spark SQL round() is half-away-from-zero; numpy's is half-even
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _quantized_matrix(spark) -> np.ndarray:
    rows = _emb(spark, SF).orderBy("vec_id").collect()
    arr = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return _half_away(arr * COV_SCALE).astype(np.int64), arr


def test_covariance_moments_match_numpy_exactly(spark):
    q, _ = _quantized_matrix(spark)
    from pyspark.sql import functions as F

    from pandas_etl_framework_spark.llmops.projection import _QCOV_EXPR

    qdf = _emb(spark, SF).select(F.expr(_QCOV_EXPR).alias("q"))
    mom = covariance_moments(qdf).toPandas()
    g = q.T @ q
    s = q.sum(axis=0)
    for r in mom.itertuples():
        assert r.n == len(q)
        assert r.s_xy == g[r.i - 1, r.j - 1]
        assert r.s_i == s[r.i - 1] and r.s_j == s[r.j - 1]
    assert len(mom) == 64 * 65 // 2


def test_pca_project_matches_driver_replication(spark):
    q, arr = _quantized_matrix(spark)
    out = (
        pca_project(_emb(spark, SF), k=4)
        .orderBy("vec_id")
        .collect()
    )
    pc_spark = np.array([r["pc"] for r in out])
    assert pc_spark.shape == (len(arr), 4)

    # replicate: identical integer moments -> identical covariance ->
    # identical eigh -> identical projection arithmetic
    n, dim = q.shape
    mom = pd.DataFrame(
        [
            {
                "i": i + 1,
                "j": j + 1,
                "s_xy": int((q[:, i] * q[:, j]).sum()),
                "s_i": int(q[:, i].sum()),
                "s_j": int(q[:, j].sum()),
                "n": n,
            }
            for i in range(dim)
            for j in range(i, dim)
        ]
    )
    comps, var = pca_components(mom, k=4)
    mean = q.sum(axis=0) / (n * COV_SCALE)
    expected = (arr - mean) @ comps.T
    assert np.allclose(pc_spark, expected, rtol=1e-9, atol=1e-12)

    # principal-axis sanity: orthonormal rows, descending nonneg variance
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    assert np.all(np.diff(var) <= 1e-12) and var[-1] >= -1e-12


def test_random_projection_matches_numpy(spark):
    from pandas_etl_framework_spark.llmops.projection import (
        RP_K,
        _rp_sign,
        random_projection,
    )

    q, _ = _quantized_matrix(spark)
    out = (
        random_projection(_emb(spark, SF))
        .orderBy("vec_id")
        .toPandas()
    )
    signs = np.array(
        [[_rp_sign(k, i) for i in range(1, q.shape[1] + 1)] for k in range(RP_K)]
    )
    expected = q @ signs.T  # exact int64
    got = out[[f"rp{k}" for k in range(RP_K)]].to_numpy()
    assert (got == expected).all()
    # the ±1 matrix must be balanced enough to be a useful JL transform
    assert 0.3 < (signs > 0).mean() < 0.7


def test_quantize_int8_bounds_and_reconstruction(spark):
    from pandas_etl_framework_spark.llmops.projection import quantize_int8

    out = quantize_int8(_emb(spark, SF)).orderBy("vec_id").collect()
    rows = _emb(spark, SF).orderBy("vec_id").collect()
    for r, src in zip(out, rows):
        x = np.asarray(src["embedding"], dtype=np.float64)
        code = np.asarray(r["code"], dtype=np.int64)
        assert np.abs(code).max() <= 127
        if r["scale"] > 0:
            # dequantized error is bounded by half a quantization step
            assert np.abs(code * r["scale"] - x).max() <= r["scale"] / 2 + 1e-12
        else:
            assert (code == 0).all() and np.abs(x).max() == 0.0


def test_pca_invariants_match_numpy_exactly(spark):
    """pca_invariants per-row quadratic forms and spectrum vs a direct
    numpy mirror on sf0.001: exact int64 equality (no tolerance — the
    operator is defined in exact integer arithmetic end-to-end)."""
    from pandas_etl_framework_spark.llmops.projection import (
        EIG_SCALE,
        PCA_K,
        PROJ_SCALE,
        _round_half_away,
        pca_invariants,
    )

    q, _ = _quantized_matrix(spark)
    n = len(q)
    # independent centered covariance + eigh in numpy
    g = (q.T @ q).astype(np.float64)
    s = q.sum(axis=0).astype(np.float64)
    cov = (n * g - np.outer(s, s)) / (float(n) ** 2 * COV_SCALE**2)
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:PCA_K]
    comps = vecs[:, order].T
    proj = comps.T @ comps
    pq = _round_half_away(proj * PROJ_SCALE)
    lam_q = _round_half_away(w[order] * EIG_SCALE)

    out = {
        r["item_id"]: r
        for r in pca_invariants(_emb(spark, SF)).collect()
    }
    # spectrum rows: exact, positive, descending
    got_lam = [out[-(r + 1)]["norm2_q"] for r in range(PCA_K)]
    assert got_lam == [int(v) for v in lam_q]
    assert got_lam == sorted(got_lam, reverse=True) and got_lam[-1] > 0
    # per-row rows: exact integer quadratic forms
    rows = _emb(spark, SF).orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    t = q @ pq.T  # int64: t[r, i] = sum_j pq[i, j] q[r, j]
    proj_exp = (q * t).sum(axis=1)
    norm_exp = (q * q).sum(axis=1)
    for rid, ne, pe in zip(ids, norm_exp, proj_exp):
        r = out[rid]
        assert r["norm2_q"] == ne
        assert r["proj_q"] == pe
        assert r["resid_q"] == ne * PROJ_SCALE - pe
        # the projector is PSD: residual can only dip below zero by P's
        # quantization slop, bounded by 0.5 * (sum |q|)^2
        assert r["resid_q"] >= -((np.abs(q).sum(axis=1).max() ** 2) // 2)
    # basis invariance: flipping component signs leaves P (hence every
    # output) unchanged
    flipped = (comps * -1.0).T @ (comps * -1.0)
    assert (_round_half_away(flipped * PROJ_SCALE) == pq).all()
