"""Distributed PCA vs direct numpy over the same vectors."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _vecs(n=200, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so the spectrum is well-separated
    scales = np.linspace(5.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    return x


def _ds(x):
    return rd.from_items([
        {"vec_id": i, "embedding": row.astype(np.float32).tolist()}
        for i, row in enumerate(x)
    ])


def test_moments_match_numpy(ray_session):
    from gencore_ray.ops.pca import embedding_moments

    x = _vecs()
    xf = x.astype(np.float32).astype(np.float64)   # engine sees float32
    n, mean, cov = embedding_moments(_ds(x))
    assert n == len(x)
    np.testing.assert_allclose(mean, xf.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(xf, rowvar=False), rtol=1e-8)


def test_fit_matches_numpy_eigh(ray_session):
    from gencore_ray.ops.pca import pca_fit

    x = _vecs()
    xf = x.astype(np.float32).astype(np.float64)
    model = pca_fit(_ds(x), n_components=4)
    w, v = np.linalg.eigh(np.cov(xf, rowvar=False))
    order = np.argsort(w)[::-1][:4]
    exp = v[:, order].T
    for r in range(4):
        lead = np.argmax(np.abs(np.round(exp[r], 12)))
        if exp[r][lead] < 0:
            exp[r] = -exp[r]
    np.testing.assert_allclose(model["eigenvalues"], w[order], rtol=1e-8)
    np.testing.assert_allclose(model["components"], exp, rtol=1e-6)
    assert (np.diff(model["eigenvalues"]) <= 1e-12).all()
    assert model["explained_frac"].sum() <= 1.0 + 1e-9


def test_projection_reconstructs_variance(ray_session):
    from gencore_ray.ops.pca import pca_fit, pca_project

    x = _vecs()
    ds = _ds(x)
    model = pca_fit(ds, n_components=16)   # full rank
    proj = pca_project(ds, model).to_pandas().sort_values("vec_id")
    y = np.asarray([np.asarray(p) for p in proj["pc"]])
    # full-rank projection is an isometry of the centered cloud
    xf = x.astype(np.float32).astype(np.float64)
    xc = xf - xf.mean(axis=0)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=1), np.linalg.norm(xc, axis=1), rtol=1e-8)
    # per-component variance equals the eigenvalue
    np.testing.assert_allclose(
        y.var(axis=0, ddof=1), model["eigenvalues"], rtol=1e-8)


def test_covariance_rows(ray_session):
    from gencore_ray.ops.pca import embedding_covariance

    x = _vecs(n=50, d=4)
    got = embedding_covariance(_ds(x)).sort_values(["i", "j"])
    assert len(got) == 16
    xf = x.astype(np.float32).astype(np.float64)
    exp = np.cov(xf, rowvar=False)
    np.testing.assert_allclose(
        got["cov"].to_numpy().reshape(4, 4), exp, atol=2e-6)


def test_empty_raises(ray_session):
    from gencore_ray.ops.pca import embedding_moments

    with pytest.raises(Exception, match="empty"):
        embedding_moments(_ds(np.zeros((0, 4))))
