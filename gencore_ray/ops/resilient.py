"""Poison-pill-safe batch mapping with a dead-letter quarantine.

At 100 TB there is ALWAYS a malformed record — a page that crashes the
extractor, a codec bomb, a row that trips a library bug.  A naive
``map_batches`` fn kills the whole job on the first one (Ray retries
the task, hits the same row, and gives up).  This wrapper keeps the
fast vectorized path for healthy batches and degrades ONLY failing
batches to per-row application, shunting the rows that still fail —
with their error strings — into a quarantine parquet directory the
operator can inspect and replay.

The reference's skip-don't-die discipline for malformed inputs is
the WARC parser (gencore_ray/sources.py::_parse_warc_bytes — records
that don't parse are skipped, never fatal); this generalises it to
any batch transform.

Cost model: zero overhead while nothing fails (one try/except around
the vectorized call); a failing batch pays one re-run per row of that
batch only.  Quarantine files are written directly by the worker task
(one file per failing batch, unique name) — no driver round-trip, no
shuffle.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import ray.data as rd


def resilient_map_batches(
    ds: rd.Dataset,
    fn,
    quarantine_dir: str,
    batch_format: str = "pandas",
) -> rd.Dataset:
    """``ds.map_batches(fn)`` that quarantines failing ROWS instead of
    failing the job.  ``fn``: DataFrame -> DataFrame (pandas only —
    per-row bisection needs row slicing).  Returns the healthy output;
    quarantined rows land in ``quarantine_dir/*.parquet`` with an
    ``error`` column appended.  Read them back with
    ``ray.data.read_parquet(quarantine_dir)`` to inspect or replay.
    """
    if batch_format != "pandas":
        raise ValueError("resilient_map_batches requires pandas batches")
    os.makedirs(quarantine_dir, exist_ok=True)

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        # fn may mutate its frame in place BEFORE raising; hand it a
        # copy so the per-row retries and the quarantine parquet always
        # see pristine input rows
        try:
            return fn(df.copy())
        except Exception:
            pass
        goods: list[pd.DataFrame] = []
        bads: list[pd.DataFrame] = []
        errs: list[str] = []
        for i in range(len(df)):
            row = df.iloc[i:i + 1]
            try:
                goods.append(fn(row.copy()))
            except Exception as ex:                      # noqa: BLE001
                bads.append(row)
                errs.append(f"{type(ex).__name__}: {ex}")
        if bads:
            import pyarrow as pa
            import pyarrow.parquet as pq

            q = pd.concat(bads, ignore_index=True)
            q["error"] = errs
            pq.write_table(
                pa.Table.from_pandas(q, preserve_index=False),
                os.path.join(quarantine_dir,
                             f"quarantine-{uuid.uuid4().hex}.parquet"),
            )
        if goods:
            return pd.concat(goods, ignore_index=True)
        # whole batch quarantined: emit a schema-correct empty frame
        try:
            return fn(df.iloc[0:0].copy())
        except Exception:                                # noqa: BLE001
            return pd.DataFrame()

    return ds.map_batches(wrapper, batch_format="pandas")
