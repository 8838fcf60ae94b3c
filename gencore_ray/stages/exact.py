"""Exact dedup (SURVEY §2.5 O3).

The reference's exact-dup rule: a second read with identical
coordinates+qname replaces the first (/root/reference/src/cluster.cpp:18-23).
Web analogue: identical text bytes.  One slim hash-shuffle —
``groupby(text_hash)`` over (url, text_hash[, order cols]) only; the
text itself never moves.

Two entry points:
  * ``exact_edges``    — (url, rep_url) edges feeding connected components
  * ``exact_dedup``    — standalone keep-one-per-text operator (queries() entry)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _partition_edges(df: pd.DataFrame) -> pd.DataFrame:
    """All complete text_hash groups of one partition -> (rep, member) edges.

    Fully vectorised: sort by (hash, url); within each group the first
    row is the rep (min url) and every later row edges to it.
    """
    h = df["text_hash"].to_numpy().astype(np.uint64)
    urls = df["url"].to_numpy()
    order = np.lexsort((urls, h))
    h, urls = h[order], urls[order]
    is_first = np.r_[True, h[1:] != h[:-1]]
    group_id = np.cumsum(is_first) - 1
    first_idx = np.flatnonzero(is_first)
    reps = urls[first_idx][group_id]          # rep url broadcast to each row
    member_mask = ~is_first
    return pd.DataFrame({"url_a": reps[member_mask], "url_b": urls[member_mask]})


def exact_edges(sig: rd.Dataset, num_parts: int = 64, min_shingles: int = 1) -> rd.Dataset:
    """Dup edges from identical text_hash. Input: any ds with url, text_hash.

    One slim exchange keyed on text_hash; text never moves.  Rows below
    the min_shingles bypass (gencore's unmapped bypass,
    /root/reference/src/gencore.cpp:254-266) never form edges — empty
    pages are not duplicates of each other."""
    from gencore_ray.stages.shuffle import grouped_map

    if "shingle_count" in sig.columns():
        sig = sig.filter(expr=f"shingle_count >= {min_shingles}")
    slim = sig.select_columns(["url", "text_hash"])
    return grouped_map(slim, "text_hash", _partition_edges, num_parts=num_parts)


def _partition_keep_first(
    df: pd.DataFrame, hash_col: str, order_by: list[str], ascending: list[bool]
) -> pd.DataFrame:
    df = df.sort_values([hash_col, *order_by], ascending=[True, *ascending], kind="mergesort")
    sizes = df.groupby(hash_col, sort=False)[hash_col].transform("size")
    out = df.loc[~df[hash_col].duplicated()].copy()
    out["dup_count"] = sizes.loc[out.index].astype(np.int64)
    return out


def exact_dedup(
    ds: rd.Dataset,
    id_col: str = "url",
    hash_col: str = "text_hash",
    order_by: list[str] | None = None,
    ascending: list[bool] | None = None,
    num_parts: int = 64,
) -> rd.Dataset:
    """Keep one row per hash group (deterministic min id), add dup_count."""
    from gencore_ray.stages.shuffle import grouped_map

    order_by = order_by or [id_col]
    asc = ascending if ascending is not None else [True] * len(order_by)
    return grouped_map(
        ds,
        hash_col,
        lambda df: _partition_keep_first(df, hash_col, order_by, asc),
        num_parts=num_parts,
    )
