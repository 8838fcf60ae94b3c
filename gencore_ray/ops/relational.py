"""Relational operators: pre-aggregated groupby, broadcast join, top-k.

The aggregation pattern is partial-then-final (SURVEY §2.4 G11 — the
reference's Stats accumulators merge associatively,
/root/reference/src/stats.cpp:101-151): each batch collapses to one
row per key (vectorised pandas groupby), then one small exchange
merges partials.  A bare ``groupby().aggregate()`` would shuffle every
input row; this shuffles one row per (key, batch).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import ray
import ray.data as rd

from gencore_ray.stages.shuffle import grouped_map

# agg spec: (out_name, in_col, kind) with kind in sum|count|min|max|mean
_PARTIAL_KINDS = {"sum", "count", "min", "max", "mean"}


def grouped_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str | None, str]],
    num_parts: int = 32,
) -> rd.Dataset:
    """Pre-aggregated multi-key groupby.

    aggs: [(out_name, in_col, kind)] — kind in sum/count/min/max/mean.
    count ignores in_col. mean is computed as merged sum / merged count.
    """
    keys = list(keys)
    for _, _, kind in aggs:
        if kind not in _PARTIAL_KINDS:
            raise ValueError(f"unsupported agg kind {kind}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = {}
        for name, col, kind in aggs:
            if kind == "count":
                out[f"{name}__cnt"] = g.size()
            elif kind == "mean":
                out[f"{name}__sum"] = g[col].sum()
                out[f"{name}__n"] = g[col].count()
            else:
                out[f"{name}__{kind}"] = getattr(g[col], kind)()
        return pd.DataFrame(out).reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = {}
        for name, col, kind in aggs:
            if kind == "count":
                out[name] = g[f"{name}__cnt"].sum()
            elif kind == "sum":
                out[name] = g[f"{name}__sum"].sum()
            elif kind == "mean":
                out[name] = g[f"{name}__sum"].sum() / g[f"{name}__n"].sum()
            elif kind == "min":
                out[name] = g[f"{name}__min"].min()
            elif kind == "max":
                out[name] = g[f"{name}__max"].max()
        return pd.DataFrame(out).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_map(partials, keys[0], final, num_parts=num_parts)


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    key: str,
    small_key: str | None = None,
    how: str = "inner",
) -> rd.Dataset:
    """Map-side join against a broadcast dimension table: the small
    side is ``ray.put`` ONCE and merged into every batch — no shuffle
    (the reference's genome-singleton lookup, SURVEY §2.3 ST1)."""
    small_key = small_key or key
    ref = ray.put(small)

    # stateless tasks closing over the ObjectRef: ray.get is a zero-copy
    # hit on the local object store after the first touch per node, and
    # elastic tasks avoid the ~0.3s/actor spawn ramp an actor pool pays
    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(
            ray.get(ref), left_on=key, right_on=small_key,
            how="left" if how == "left_outer" else how,
        )

    return ds.map_batches(join_batch, batch_format="pandas")


def topk(
    ds: rd.Dataset, by: list[str], k: int, descending: list[bool] | bool = True
) -> rd.Dataset:
    """Global deterministic top-k: per-batch prune to k, then one small
    sort+limit (only n_batches*k rows reach the sort)."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=[not d for d in descending],
                              kind="mergesort").head(k)

    return ds.map_batches(prune, batch_format="pandas").sort(
        by, descending=descending
    ).limit(k)
