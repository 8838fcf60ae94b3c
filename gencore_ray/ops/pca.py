"""Distributed PCA over an embedding column.

Dimensionality reduction is standard post-processing for web-scale
embedding tables (cheaper ANN, whitening before clustering).  The
expensive part — the d x d covariance — is ONE streaming pass: each
block contributes (n, sum, sum-of-outer-products) partials, partials
pre-merge 16:1 in worker tasks, and the driver folds the survivors
(d=1024 -> 8 MB of partial state per block; the driver never sees
vectors).  The eigendecomposition is O(d^3) driver-side numpy on the
folded d x d matrix — independent of corpus size — and the projection
back over the table is a pure broadcast map.  Same
aggregate/broadcast shape as the Lloyd step in ops/kmeans.py.

``embedding_covariance`` is SQL-replayable (sums of products over the
unnested list column) and oracled; the eigendecomposition itself is
not SQL-expressible, so ``pca_fit``/``pca_project`` are pinned by
tests against direct numpy over the same data (sign-canonicalised:
each component's largest-magnitude coordinate is made positive —
eigenvectors are otherwise sign-ambiguous).

gencore analogue: the per-batch partial + driver fold mirrors the
stats accumulators merged at the end of the run
(/root/reference/src/stats.cpp:52-88).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _partials(ds: rd.Dataset, vec_col: str) -> pd.DataFrame:
    """Fold the whole dataset to ONE (n, s, ss) moment triple: per-block
    partials, 16:1 distributed pre-merge, small driver fold."""

    def _block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"n": pd.Series(dtype=np.int64),
                                 "s": pd.Series(dtype=object),
                                 "ss": pd.Series(dtype=object)})
        x = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in df[vec_col].tolist()])
        return pd.DataFrame({
            "n": [np.int64(len(x))],
            "s": [x.sum(axis=0).tobytes()],
            "ss": [(x.T @ x).tobytes()],
        })

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        n = np.int64(df["n"].sum())
        s = np.sum([np.frombuffer(b, dtype=np.float64)
                    for b in df["s"]], axis=0)
        ss = np.sum([np.frombuffer(b, dtype=np.float64)
                     for b in df["ss"]], axis=0)
        return pd.DataFrame({"n": [n], "s": [s.tobytes()],
                             "ss": [ss.tobytes()]})

    parts = (ds.select_columns([vec_col])
             .map_batches(_block, batch_format="pandas")
             .map_batches(_merge, batch_format="pandas", batch_size=16)
             .to_pandas())
    return _merge(parts)


def embedding_moments(
    ds: rd.Dataset, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], sample covariance[d, d]) of the embedding column —
    one streaming pass, driver state O(d^2)."""
    out = _partials(ds, vec_col)
    if not len(out) or int(out["n"].iloc[0]) == 0:
        raise ValueError("embedding_moments: empty dataset")
    n = int(out["n"].iloc[0])
    s = np.frombuffer(out["s"].iloc[0], dtype=np.float64)
    d = len(s)
    ss = np.frombuffer(out["ss"].iloc[0], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean, cov


def embedding_covariance(
    ds: rd.Dataset, vec_col: str = "embedding", round_to: int = 6
) -> pd.DataFrame:
    """The full d x d sample covariance as (i, j, cov) rows (0-based,
    rounded) — the SQL-replayable surface of the PCA pass."""
    _n, _mean, cov = embedding_moments(ds, vec_col)
    d = cov.shape[0]
    i, j = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    p = 10.0 ** round_to
    v = cov.ravel()
    return pd.DataFrame({
        "i": i.ravel().astype(np.int64),
        "j": j.ravel().astype(np.int64),
        "cov": np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p,
    })


def pca_fit(
    ds: rd.Dataset, n_components: int = 8, vec_col: str = "embedding"
) -> dict:
    """{components[k, d], eigenvalues[k], mean[d], explained_frac[k]}:
    top-k principal axes by descending eigenvalue, sign-canonicalised
    (largest-|coordinate| positive; ties broken by lowest index)."""
    n, mean, cov = embedding_moments(ds, vec_col)
    w, v = np.linalg.eigh(cov)              # ascending eigenvalues
    order = np.argsort(w)[::-1][:int(n_components)]
    comps = v[:, order].T                    # (k, d)
    for r in range(comps.shape[0]):
        a = comps[r]
        lead = np.argmax(np.abs(np.round(a, 12)))
        if a[lead] < 0:
            comps[r] = -a
    ev = w[order]
    total = float(w.sum())
    return {
        "components": comps,
        "eigenvalues": ev,
        "mean": mean,
        "explained_frac": ev / total if total else ev * 0.0,
        "n": n,
    }


def pca_project(
    ds: rd.Dataset,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """(id, pc: list<double>[k]) — centered projection onto the fitted
    components, a pure broadcast map (the model is O(k*d), shipped
    once via ray.put)."""
    import ray

    ref = ray.put({"mean": model["mean"], "comps": model["components"]})

    def _proj(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 "pc": pd.Series(dtype=object)})
        x = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in df[vec_col].tolist()])
        y = (x - m["mean"]) @ m["comps"].T
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "pc": list(y)})

    return ds.select_columns([id_col, vec_col]).map_batches(
        _proj, batch_format="pandas")
