"""Broadcast interval (range) join — the BED-region analogue.

The reference loads a static BED interval table once and overlap-joins
every read against it (/root/reference/src/bed.cpp:110-169, overlap
test src/bed.cpp:64-79).  Ours: the interval table is tiny, so it is
broadcast (``ray.put``) and each batch does a vectorised
``np.searchsorted`` lookup — no shuffle, matching the reference's
in-memory per-record check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def interval_lookup_join(
    ds: rd.Dataset,
    intervals: pd.DataFrame,   # columns: lo, hi, label  (sorted, non-overlapping)
    value_col: str,
    label_col: str = "bucket",
) -> rd.Dataset:
    """Label each row with the interval [lo, hi) containing value_col.

    Rows outside every interval get label None.
    """
    iv = intervals.sort_values("lo").reset_index(drop=True)
    los = iv["lo"].to_numpy(dtype=np.float64)
    his = iv["hi"].to_numpy(dtype=np.float64)
    labels = iv["label"].to_numpy()
    ref = ray.put((los, his, labels))

    # stateless tasks over the broadcast ref (local-store hit per node;
    # no actor-pool spawn ramp for state this cheap)
    def label_batch(df: pd.DataFrame) -> pd.DataFrame:
        blos, bhis, blabels = ray.get(ref)
        v = df[value_col].to_numpy(dtype=np.float64)
        idx = np.searchsorted(blos, v, side="right") - 1
        ok = (idx >= 0) & (v < bhis[np.clip(idx, 0, len(bhis) - 1)])
        out = np.where(ok, blabels[np.clip(idx, 0, len(blabels) - 1)], None)
        df = df.copy(deep=False)
        df[label_col] = out
        return df

    return ds.map_batches(label_batch, batch_format="pandas")
