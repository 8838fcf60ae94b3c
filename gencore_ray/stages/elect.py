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

    Sort by (cluster, -score, url); the first row of each cluster run
    is the representative — the same arg-max + min-url tie-break as a
    per-group scan, with no per-group Python call.
    """
    scores = np.round(score_members(df, cfg), 12)  # kill float jitter before argmax
    cl = df[cluster_col].to_numpy()
    urls = df["url"].to_numpy()
    order = np.lexsort((urls, -scores, cl))
    df = df.iloc[order].copy()
    cl = cl[order]
    is_first = np.r_[True, cl[1:] != cl[:-1]]
    group_id = np.cumsum(is_first) - 1
    sizes = np.bincount(group_id)
    df["cluster_size"] = sizes[group_id].astype(np.int64)
    df["is_representative"] = is_first
    df["rep_score"] = scores[order]
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
