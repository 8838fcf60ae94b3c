"""Model-based document classification (Gaussian Naive Bayes).

The fasttext-style quality/language classifier of a training-data
pipeline, reduced to its dependency-free core: fit per-class Gaussian
feature models with one aggregation pass, broadcast the tiny model,
score every document in a pure map.  Unlike iterative learners, NB is
closed-form — the whole fit is per-class (count, sum, sum-of-squares)
partials merged associatively, so it is exactly SQL-replayable and the
driver's DuckDB oracle hash-checks the full fit+score path.

Pipeline shape (the gencore analogue is the two-pass stats model:
accumulate per-group moments, then score each record against them —
/root/reference/src/stats.cpp:39-46 accumulation,
/root/reference/src/pair.cpp:70-86 per-record scoring):

  1. ``map_batches`` partials: per (class, feature) count/sum/sumsq —
     one tiny row pair per batch, never per doc.
  2. driver merge: O(classes x features) floats; variance =
     E[x^2] - E[x]^2 + ``var_smoothing`` (explicit formula, mirrored
     verbatim in the SQL oracle rather than relying on var_pop's
     internal algorithm).
  3. broadcast + scoring map: per-doc log-odds
     ln p(y=1|x) - ln p(y=0|x) under per-feature independence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def gaussian_nb_scores(
    ds: rd.Dataset,
    feature_cols: list[str],
    label_col: str,
    id_col: str = "doc_id",
    var_smoothing: float = 1e-6,
    round_to: int = 6,
) -> rd.Dataset:
    """(id, log_odds, pred) per doc: fit Gaussian NB on the boolean
    ``label_col`` over ``feature_cols``, score the same corpus.

    Both label classes must be present (raises otherwise — a one-class
    corpus has no decision boundary).  ``pred`` is ``log_odds > 0``.
    """
    slim = ds.select_columns([id_col, label_col] + feature_cols)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        y = df[label_col].to_numpy(dtype=bool)
        rows = []
        for cls in (0, 1):
            sub = df.loc[y == bool(cls), feature_cols]
            rows.append({
                "cls": cls, "n": len(sub),
                **{f"sum_{c}": float(sub[c].astype(np.float64).sum())
                   for c in feature_cols},
                **{f"ssq_{c}": float((sub[c].astype(np.float64) ** 2).sum())
                   for c in feature_cols},
            })
        return pd.DataFrame(rows)

    parts = slim.map_batches(_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("cls", sort=True).sum()
    if (agg["n"] == 0).any():
        raise ValueError("gaussian_nb_scores needs both label classes present")
    n_total = float(agg["n"].sum())
    model = {}
    for cls in (0, 1):
        n = float(agg.loc[cls, "n"])
        mu = np.array([agg.loc[cls, f"sum_{c}"] / n for c in feature_cols])
        # clamp at 0 before smoothing: E[x^2]-E[x]^2 can go slightly
        # negative from float cancellation on large-magnitude features
        # (mirrored as greatest(...,0) in the SQL oracle)
        var = np.maximum(np.array([
            agg.loc[cls, f"ssq_{c}"] / n - (agg.loc[cls, f"sum_{c}"] / n) ** 2
            for c in feature_cols
        ]), 0.0) + var_smoothing
        model[cls] = (np.log(n / n_total), mu, var)
    ref = ray.put(model)
    p = 10.0 ** round_to

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        x = df[feature_cols].to_numpy(dtype=np.float64)

        def _ll(cls):
            prior, mu, var = m[cls]
            return prior + np.sum(
                -0.5 * np.log(2.0 * np.pi * var) - (x - mu) ** 2 / (2.0 * var),
                axis=1,
            )

        lo = _ll(1) - _ll(0)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "log_odds": np.sign(lo) * np.floor(np.abs(lo) * p + 0.5) / p,
            "pred": lo > 0,
        })

    return slim.map_batches(_score, batch_format="pandas")
