"""Canonical-representative election (SURVEY §2.4 G5/G6).

gencore collapses each read group into one consensus read by a
quality-weighted per-position vote with deterministic tie-breaks
(/root/reference/src/group.cpp:320-526, representative pick
196-266).  For text clusters we elect an existing page instead of
synthesizing a hybrid: per cluster, score every member

    rep_score = w_len * min(text_len/2000, 1)
              + w_recency * recency_norm(warc_ts)      # newest crawl wins
              + w_quality * quality

and take the arg-max, exact ties broken by min url (the reference
breaks ties by shorter read / map order, src/group.cpp:235-261).

Runs as ``groupby(cluster_id).map_groups`` — one shuffle keyed by the
cluster id; singletons ride through as 1-row groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gencore_ray.config import DedupConfig

_TS_LO = np.datetime64("2000-01-01", "us")
_TS_SPAN_S = 60.0 * 60 * 24 * 365 * 40  # 40 years, fixed normaliser


def score_members(df: pd.DataFrame, cfg: DedupConfig) -> np.ndarray:
    len_term = np.minimum(df["text_len"].to_numpy() / 2000.0, 1.0)
    if "warc_ts" in df.columns and df["warc_ts"].notna().any():
        ts = df["warc_ts"].to_numpy(dtype="datetime64[us]")
        rec = (ts - _TS_LO) / np.timedelta64(1, "s") / _TS_SPAN_S
        rec = np.clip(np.nan_to_num(rec, nan=0.0), 0.0, 1.0)
    else:
        rec = np.zeros(len(df))
    qual = df["quality"].to_numpy() if "quality" in df.columns else np.zeros(len(df))
    return cfg.w_len * len_term + cfg.w_recency * rec + cfg.w_quality * qual


def _elect_partition(df: pd.DataFrame, cfg: DedupConfig, cluster_col: str) -> pd.DataFrame:
    """Vectorised election over ALL complete clusters of one partition.

    Clusters are ordered by their uint64 hash (string lexsort over
    millions of rows is the classic hidden cost); the arg-max is the
    first row of each run, and EXACT score ties fall back to a min-url
    sort over just the tied rows — same semantics as a per-group scan
    (arg-max, ties -> min url), no per-group Python call.
    """
    from pandas.util import hash_pandas_object

    if not len(df):                 # empty exchange partition: typed empty out
        df = df.copy()
        df["cluster_size"] = np.int64(0)
        df["is_representative"] = False
        df["rep_score"] = np.float64(0.0)
        return df

    scores = np.round(score_members(df, cfg), 12)  # kill float jitter before argmax
    chash = hash_pandas_object(df[cluster_col], index=False).to_numpy()
    order = np.lexsort((-scores, chash))
    df = df.iloc[order].copy()
    scores = scores[order]
    chash = chash[order]
    cl = df[cluster_col].to_numpy()
    # run boundary: hash change, or (collision guard) cluster change
    is_first = np.r_[True, (chash[1:] != chash[:-1]) | (cl[1:] != cl[:-1])]
    group_id = np.cumsum(is_first) - 1
    first_idx = np.flatnonzero(is_first)
    sizes = np.bincount(group_id)

    rep_pos = first_idx
    top_score = scores[first_idx][group_id]
    tied = scores == top_score
    if tied.sum() > len(first_idx):  # some cluster has a tie at the top
        urls = df["url"].to_numpy()
        pos = np.flatnonzero(tied)
        tdf = pd.DataFrame({"g": group_id[pos], "url": urls[pos], "pos": pos})
        rep_pos = (
            tdf.sort_values(["g", "url"], kind="mergesort")
            .drop_duplicates("g")["pos"].to_numpy()
        )
    is_rep = np.zeros(len(df), dtype=bool)
    is_rep[rep_pos] = True

    df["cluster_size"] = sizes[group_id].astype(np.int64)
    df["is_representative"] = is_rep
    df["rep_score"] = scores
    return df


def elect_representatives(
    members: rd.Dataset,
    cfg: DedupConfig,
    cluster_col: str = "cluster_id",
    num_parts: int = 64,
) -> rd.Dataset:
    """members(url, cluster_id, text_len, quality[, warc_ts]) -> clusters table.

    One exchange keyed on cluster_id (singletons ride through as 1-row
    groups)."""
    from gencore_ray.stages.shuffle import grouped_map

    return grouped_map(
        members,
        cluster_col,
        lambda df: _elect_partition(df, cfg, cluster_col),
        num_parts=num_parts,
    )
