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
