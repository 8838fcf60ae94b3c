"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time windows or watermarks (the reference's
watermark machinery, /root/reference/src/gencore.cpp:319-389, collapses
into batch shuffles — SURVEY §2.7).  Windows are expressed as
``grouped_map`` over the partition key with pandas doing the per-key
ordered logic.  Ordering assumption: events within a key fit in one
partition and are sorted by ``ts`` inside the UDF — the analogue of
gencore's input-sortedness precondition (src/gencore.cpp:232-241).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gencore_ray.stages.shuffle import grouped_map


def session_windows(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_parts: int = 32,
) -> rd.Dataset:
    """Session windows: a gap > ``gap`` starts a new session.

    Output: (key, session_id (1-based per key), n_events,
    session_start, session_end) — the exact shape of the standard SQL
    lag/cumsum formulation, so it is DuckDB-oracle-checkable.
    """

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        prev = df.groupby(key, sort=False)[ts_col].shift()
        brk = (prev.isna() | ((df[ts_col] - prev) > gap)).astype(np.int64)
        df = df.assign(session_id=brk.groupby(df[key]).cumsum())
        g = df.groupby([key, "session_id"], sort=False)
        out = g.agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index()
        return out

    return grouped_map(
        events.select_columns([key, ts_col]), key, per_partition, num_parts=num_parts
    )


def tumbling_window_agg(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "1d",
    num_parts: int = 32,
) -> rd.Dataset:
    """Tumbling windows per key: (key, window_start, n_events, total_value)."""

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df[ts_col].dt.floor(width))
        g = df.groupby([key, "window_start"], sort=False)
        return g.agg(
            n_events=(ts_col, "size"), total_value=(value_col, "sum")
        ).reset_index()

    return grouped_map(
        events.select_columns([key, ts_col, value_col]), key, per_partition,
        num_parts=num_parts,
    )


def running_totals(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_parts: int = 32,
) -> rd.Dataset:
    """Ordered running sum per key (event_id kept as the row identity).

    The per-key incremental-state analogue of the reference's streaming
    accumulators; deterministic given the (key, ts, event_id) order.
    """

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        order = [key, ts_col] + (["event_id"] if "event_id" in df.columns else [])
        df = df.sort_values(order, kind="mergesort")
        df = df.assign(running_value=df.groupby(key, sort=False)[value_col].cumsum())
        return df

    return grouped_map(events, key, per_partition, num_parts=num_parts)
