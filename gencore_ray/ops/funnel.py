"""Ordered funnel analysis over the event log.

The reference's consensus path is a staged pipeline where each stage
consumes only survivors of the previous one (group -> vote -> duplex
-> supporting-reads filter, /root/reference/src/cluster.cpp:102-188);
the event-log analogue is the conversion funnel: stage k counts only
users whose first stage-k event happened AT OR AFTER their first
stage-(k-1) event.

One exchange keyed on the user; inside each partition every stage is
one vectorised merge + groupby-min (S stages = S pandas passes over
slim frames, no per-row Python).  Timestamps are compared exactly, so
the whole result is hash-replayable in SQL (chained min-join CTEs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gencore_ray.stages.shuffle import grouped_map


def funnel_stages(
    events: rd.Dataset,
    stages: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_parts: int = 32,
) -> rd.Dataset:
    """Per-key funnel: for each key that entered stage 1, the first
    timestamp of each stage reached in order (stage k's event must be
    >= the key's first stage-(k-1) timestamp) and ``stage_reached``.

    Output: (key, stage_1_ts, ..., stage_N_ts, stage_reached); keys
    that never produced a stage-1 event are absent (the SQL LEFT JOIN
    chain shape).
    """
    if not stages:
        raise ValueError("funnel_stages: need at least one stage")
    ts_cols = [f"stage_{i + 1}_ts" for i in range(len(stages))]

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        # first stage: min ts per key among stage-1 events
        cur = (df[df[type_col] == stages[0]]
               .groupby(key, sort=False)[ts_col].min()
               .rename(ts_cols[0]).reset_index())
        out = cur
        for i, ev in enumerate(stages[1:], start=1):
            sub = df[df[type_col] == ev][[key, ts_col]].merge(
                out[[key, ts_cols[i - 1]]], on=key)
            sub = sub[sub[ts_col] >= sub[ts_cols[i - 1]]]
            nxt = (sub.groupby(key, sort=False)[ts_col].min()
                   .rename(ts_cols[i]).reset_index())
            out = out.merge(nxt, on=key, how="left")
        reached = np.zeros(len(out), dtype=np.int64)
        for i, c in enumerate(ts_cols, start=1):
            reached = np.where(out[c].notna(), i, reached)
        return out.assign(stage_reached=reached)

    ev = events.select_columns([key, ts_col, type_col])
    ev = ev.filter(expr=" or ".join(f"{type_col} == '{s}'" for s in stages))
    return grouped_map(ev, key, per_partition, num_parts=num_parts)


def top_session_paths(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    max_len: int = 5,
    k: int = 20,
    num_parts: int = 32,
) -> rd.Dataset:
    """Path mining: the ``k`` most common event-type sequences over
    sessions (gap-based sessionisation, first ``max_len`` events per
    session, '->'-joined).  Ties broken (count desc, path asc).

    One key-keyed exchange does sessionisation AND path building (user
    rows co-locate; ordering is (ts, id) — deterministic under ts
    ties); the count aggregate then moves one row per distinct path per
    partition — path strings are short and low-cardinality, so the
    final fold is tiny.
    """
    from gencore_ray.ops.relational import grouped_aggregate, topk

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"path": pd.Series(dtype=object)})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        prev = df.groupby(key, sort=False)[ts_col].shift()
        brk = (prev.isna() | ((df[ts_col] - prev) > gap)).astype(np.int64)
        sess = brk.groupby(df[key]).cumsum()
        g = df.assign(__s=sess)
        g = g.assign(__pos=g.groupby([key, "__s"], sort=False).cumcount())
        g = g[g["__pos"] < max_len]
        agg = (g.groupby([key, "__s"], sort=False)[type_col]
               .agg("->".join).rename("path").reset_index())
        return agg[["path"]]

    p = grouped_map(events.select_columns([key, ts_col, type_col, id_col]),
                    key, paths, num_parts=num_parts)
    counts = grouped_aggregate(p, ["path"], [("n_sessions", None, "count")],
                               num_parts=min(num_parts, 16))
    return topk(counts, ["n_sessions", "path"], k, descending=[True, False])
