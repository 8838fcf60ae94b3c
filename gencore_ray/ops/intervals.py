"""Interval (range) joins — the BED-region analogue.

The reference loads a static BED interval table once and overlap-joins
every read against it (/root/reference/src/bed.cpp:110-169, overlap
test src/bed.cpp:64-79).  Two shapes here:

* ``interval_lookup_join`` — point-in-interval against a TINY interval
  table: broadcast (``ray.put``) + vectorised ``np.searchsorted`` per
  batch, no shuffle (the reference's in-memory per-record check).
* ``interval_overlap_join`` — interval x interval overlap between two
  LARGE sides: domain binning.  Each interval explodes to the fixed-
  width bins it touches, ONE hash exchange keyed on the bin id
  co-locates potential partners, and each surviving pair is emitted
  exactly once via the max-lo-bin ownership rule (the bin containing
  ``max(lo_a, lo_b)`` owns the pair) — no dedupe exchange needed.
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


def interval_overlap_join(
    left: rd.Dataset,
    right: rd.Dataset | None,
    id_col: str = "iv_id",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: int = 3_600_000_000,
    num_parts: int = 64,
) -> rd.Dataset:
    """All pairs of CLOSED intervals [lo, hi] that overlap
    (``a.lo <= b.hi AND b.lo <= a.hi``), ids int64, bounds int64
    (e.g. epoch-microsecond timestamps; default bin = 1 hour).

    ``right=None`` -> self-join over ``left`` emitting each unordered
    pair once as ``id_a < id_b``; otherwise left x right pairs.

    Scale shape: explode cost per interval = span/bin_width + 1 rows of
    24 B; the exchange moves only (bin, side, id, lo, hi); pair
    generation is a per-bin vectorised merge.  Choose bin_width near
    the median interval span.  Skewed bins (many intervals alive at
    once) cost O(pairs-in-bin) — that is output mass, not overhead; the
    ownership rule means no pair is ever produced twice.
    """
    from gencore_ray.stages.shuffle import grouped_map

    bw = np.int64(bin_width)

    def explode(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids = df[id_col].to_numpy(dtype=np.int64)
            lo = df[lo_col].to_numpy(dtype=np.int64)
            hi = df[hi_col].to_numpy(dtype=np.int64)
            if np.any(hi < lo):
                raise ValueError("interval_overlap_join: hi < lo")
            b0, b1 = lo // bw, hi // bw
            reps = (b1 - b0 + 1).astype(np.int64)
            if len(reps) and int(reps.max()) > 1_000_000:
                # a degenerate interval spanning ~10^6 bins would explode
                # the exchange silently — refuse loudly; pick a bin_width
                # near the median span instead
                raise ValueError(
                    f"interval_overlap_join: an interval spans {int(reps.max())} "
                    f"bins (bin_width={int(bw)}) — raise bin_width")
            base = np.repeat(b0, reps)
            # within-interval bin offsets: 0..reps-1 via cumcount reset
            off = np.arange(len(base), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
            return pd.DataFrame({
                "bin": base + off,
                "side": np.int8(side),
                "iid": np.repeat(ids, reps),
                "ilo": np.repeat(lo, reps),
                "ihi": np.repeat(hi, reps),
            })
        return fn

    cols = [id_col, lo_col, hi_col]
    exploded = left.select_columns(cols).map_batches(
        explode(0), batch_format="pandas")
    self_mode = right is None
    if not self_mode:
        exploded = exploded.union(
            right.select_columns(cols).map_batches(
                explode(1), batch_format="pandas"))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        a = df[df["side"] == 0] if not self_mode else df
        b = df[df["side"] == 1] if not self_mode else df
        m = a.merge(b, on="bin", suffixes=("_a", "_b"))
        if not len(m):
            return empty
        if self_mode:
            m = m[m["iid_a"] < m["iid_b"]]
        keep = (
            (m["ilo_a"] <= m["ihi_b"]) & (m["ilo_b"] <= m["ihi_a"])
            # ownership: only the bin holding max(lo_a, lo_b) emits
            & (np.maximum(m["ilo_a"], m["ilo_b"]) // bw == m["bin"])
        )
        m = m[keep]
        return pd.DataFrame({"id_a": m["iid_a"].to_numpy(dtype=np.int64),
                             "id_b": m["iid_b"].to_numpy(dtype=np.int64)})

    return grouped_map(exploded, "bin", pairs, num_parts=num_parts)
