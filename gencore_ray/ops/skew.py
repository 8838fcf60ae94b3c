"""Key-skew diagnostics: measure a shuffle key BEFORE paying for it.

Every wide op in this engine exchanges on a key, and the north rule
demands skew handled explicitly — the LSH stage caps hot buckets with
counters (stages/lsh.py:11-20), salting is the documented remedy.
This op is the measurement side: one pass over the per-key counts
yields the concentration numbers that decide whether a key needs
salting (top1_share), capping (max_count vs a per-partition budget),
or is safe (HHI near 1/n_keys).

Cost: ONE exchange (the per-key count, partial-aggregated in the
mappers) + two tiny folds over the count table — never the payload.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def key_skew_profile(
    ds: rd.Dataset,
    key: str,
    top: int = 10,
    num_parts: int = 32,
) -> rd.Dataset:
    """One-row skew profile of ``key``.

    Columns: ``n_rows``, ``n_keys``, ``max_count`` (the hottest key),
    ``top1_share`` / ``top{top}_share`` (fraction of all rows held by
    the hottest 1 / ``top`` keys), ``hhi`` (Herfindahl index
    ``sum((cnt/total)^2)`` — 1/n_keys when uniform, 1.0 when a single
    key owns everything).  Shares rounded to 6.
    """
    from gencore_ray.ops.relational import grouped_aggregate, topk

    counts = grouped_aggregate(
        ds, [key], [("cnt", None, "count")], num_parts=num_parts
    ).materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].to_numpy("float64")
        return pd.DataFrame(
            {
                "n_keys": [len(c)],
                "total": [c.sum()],
                "mx": [c.max() if len(c) else 0.0],
                "ssq": [(c * c).sum()],
            }
        )

    agg = counts.map_batches(partial, batch_format="pandas").to_pandas()
    total = 0.0 if agg.empty else float(agg["total"].sum())
    if total == 0:   # zero-row input (the count exchange never ran,
        # or produced only schema-correct empty partitions)
        row = {"n_rows": 0, "n_keys": 0, "max_count": 0,
               "top1_share": 0.0, f"top{top}_share": 0.0, "hhi": 0.0}
    else:
        n_keys = int(agg["n_keys"].sum())
        mx = float(agg["mx"].max())
        ssq = float(agg["ssq"].sum())
        # ties among equal counts don't change the top-N SUM, so the
        # deterministic-tiebreak question is moot here
        s_top = float(topk(counts, ["cnt"], top).to_pandas()["cnt"].sum())
        row = {
            "n_rows": int(total),
            "n_keys": n_keys,
            "max_count": int(mx),
            "top1_share": round(mx / total, 6),
            f"top{top}_share": round(s_top / total, 6),
            "hhi": round(ssq / (total * total), 6),
        }
    return rd.from_arrow(
        pa.table({k: pa.array([v]) for k, v in row.items()})
    )


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    hot_threshold: int = 100_000,
    num_parts: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """Hash join with explicit hot-key handling — the remedy side of
    ``key_skew_profile``.

    A plain hash join sends ALL rows of a key to one partition; a key
    with 10^8 left rows turns one reduce task into the job's critical
    path.  This variant counts left keys first (one slim exchange),
    declares keys above ``hot_threshold`` hot, and splits the work:

      cold rows -> normal partitioned ``hash_join``
      hot rows  -> the RIGHT rows of hot keys are broadcast (ray.put)
                   and merged map-side into the left's own blocks — the
                   hot keys' row mass NEVER moves through an exchange.

    Results are the exact union of both paths (equality-tested against
    the plain join).  Assumption to document at scale: the right side
    of a hot key must be broadcast-small (dimension-like); if BOTH
    sides of one key are huge the join output is quadratic in that key
    and no partitioning can save it — cap or pre-aggregate instead.
    Only ``how='inner'`` is offered: outer padding would need a second
    accounting pass across the split.
    """
    import numpy as np
    import ray

    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import hash_join

    if how != "inner":
        raise ValueError("skew_join supports how='inner' only")

    counts = grouped_aggregate(
        left.select_columns([left_key]), [left_key],
        [("cnt", None, "count")], num_parts=num_parts,
    )
    hot = counts.filter(expr=f"cnt > {int(hot_threshold)}").to_pandas()
    # a fully-filtered Dataset can surface as a column-less empty frame
    hot_keys = (hot[left_key].to_numpy() if len(hot)
                else np.array([], dtype=np.int64))
    if not len(hot_keys):
        return hash_join(left, right, left_key, right_key,
                         num_parts=num_parts)

    hot_ref = ray.put(hot_keys)

    def split(keep_hot: bool, key: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            m = df[key].isin(ray.get(hot_ref))
            return df[m] if keep_hot else df[~m]
        return fn

    # pre-split schemas: either cold side may filter to ZERO rows (every
    # key hot), which leaves Ray without a derivable schema
    from gencore_ray.stages.shuffle import to_arrow_blocks

    left = to_arrow_blocks(left)
    right = to_arrow_blocks(right)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema

    cold = hash_join(
        left.map_batches(split(False, left_key), batch_format="pandas"),
        right.map_batches(split(False, right_key), batch_format="pandas"),
        left_key, right_key, num_parts=num_parts,
        left_schema=lschema, right_schema=rschema,
    )

    right_hot = right.map_batches(split(True, right_key),
                                  batch_format="pandas").to_pandas()
    rh_ref = ray.put(right_hot)
    rcols = [c for c in right_hot.columns if c != right_key]

    def bcast_merge(df: pd.DataFrame) -> pd.DataFrame:
        rh = ray.get(rh_ref)
        out = df.merge(rh, left_on=left_key, right_on=right_key, how="inner")
        return out[[*df.columns, *rcols]]

    hot_joined = left.map_batches(split(True, left_key),
                                  batch_format="pandas").map_batches(
        bcast_merge, batch_format="pandas")
    return cold.union(hot_joined)
