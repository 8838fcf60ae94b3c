"""As-of (temporal) join — attach the most recent right-side row.

The reference's duplex pass pairs each consensus read with the *one*
matching record from a second stream (/root/reference/src/cluster.cpp:
119-168); the event-log analogue is the as-of join: for every left
row, find the latest right row whose timestamp is <= the left row's,
within the same key (DuckDB/kdb ``ASOF JOIN``).  Ray Data has no such
operator, so it is built as (SURVEY §2 custom-operator path (a)):

  1. tag both sides, align schemas, union            (pure maps)
  2. ONE hash exchange keyed on the equi-key         (all-to-all)
  3. per partition: sort by ts, ``pd.merge_asof``    (vectorised C)

Both sides move exactly once; the payload that rides the shuffle is
whatever columns the caller kept (prune first).  Partitioning
assumption: all rows of one key land in one partition — guaranteed by
the hash exchange; per-key history must fit a worker (same contract
as every windowed op in ops/windows.py).

Determinism contract: ties on the right side (two right rows with the
same (key, ts)) are ambiguous in ANY as-of engine — pre-aggregate the
right side to unique (key, ts) first (the queries do max(value)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.stages.shuffle import grouped_map, to_arrow_blocks


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts_col: str,
    direction: str = "backward",
    tolerance: pd.Timedelta | None = None,
    num_parts: int = 32,
) -> rd.Dataset:
    """For each left row, attach the nearest right row per ``direction``
    (backward = latest right.ts <= left.ts) sharing ``key``.

    ``key`` and ``ts_col`` must exist on both sides; every other column
    name must be disjoint (rename first — same contract as hash_join).
    Right rows that match nothing are dropped; left rows with no match
    keep typed nulls in the right columns (LEFT as-of join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction}")
    left = to_arrow_blocks(left)
    right = to_arrow_blocks(right)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [n for n in lschema.names if n not in (key, ts_col)]
    rcols = [n for n in rschema.names if n not in (key, ts_col)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"asof_join column overlap: {sorted(overlap)} — rename first")
    out_names = [key, ts_col, *lcols, *rcols]

    def tag(side: int, pad: list[str], pad_schema: pa.Schema):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            t = t.append_column("__side", pa.array(np.full(n, side, dtype=np.int8)))
            for name in pad:
                t = t.append_column(name, pa.nulls(n, pad_schema.field(name).type))
            return t.select([key, ts_col, "__side", *lcols, *rcols])
        return fn

    tagged = left.map_batches(tag(0, rcols, rschema), batch_format="pyarrow").union(
        right.map_batches(tag(1, lcols, lschema), batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[out_names]
        lf = df[df["__side"] == 0][[key, ts_col, *lcols]]
        rf = df[df["__side"] == 1][[key, ts_col, *rcols]]
        # merge_asof wants both frames globally sorted on the `on` column
        lf = lf.sort_values(ts_col, kind="mergesort")
        rf = rf.sort_values(ts_col, kind="mergesort")
        # right ts survives as an output column (when did the match happen)
        rf = rf.assign(**{f"{ts_col}_right": rf[ts_col]})
        out = pd.merge_asof(
            lf, rf, on=ts_col, by=key, direction=direction,
            tolerance=tolerance, allow_exact_matches=True,
        )
        return out[[*out_names, f"{ts_col}_right"]]

    return grouped_map(tagged, key, merge, num_parts=num_parts)
