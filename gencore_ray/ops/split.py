"""Deterministic train/val/test splitting by key hash.

A training-data pipeline needs a split that is (a) stable across runs
and cluster sizes — re-running the job or adding nodes must not move a
document between train and test — and (b) a pure per-row map, so it
never shuffles.  We hash the KEY (url / doc_id), not the row position:
position-based splits (``ds.split_proportionately``, ``random_shuffle``
+ take) change membership whenever block boundaries move, which leaks
test data into training on any re-partition.  The reference fixes
per-read grouping the same way — by content key, never by file order
(/root/reference/src/duplicate.cpp:24-41, read signature from canonical
fields).

The bucket is ``md5_low64(str(key) || chr(30) || str(seed)) % 10**6``
— DuckDB's ``md5_number_lower`` on the same string, so every
assignment is SQL-replayable exactly (no float thresholds: cumulative
fractions are converted to integer bucket cutoffs once, on the
driver).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

_BUCKETS = 1_000_000
_SEP = chr(30)


def split_cutoffs(fracs: dict[str, float]) -> list[tuple[str, int]]:
    """[(name, exclusive_upper_bucket)] in dict order; last cut == 10**6.

    Fractions must be positive and sum to 1 (±1e-9); cutoffs are
    rounded once so every bucket maps to exactly one split.
    """
    if not fracs:
        raise ValueError("fracs is empty")
    total = sum(fracs.values())
    if any(f <= 0 for f in fracs.values()) or abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must be > 0 and sum to 1, got {fracs}")
    cuts, acc = [], 0.0
    names = list(fracs)
    for name in names[:-1]:
        acc += fracs[name]
        cuts.append((name, int(round(acc * _BUCKETS))))
    cuts.append((names[-1], _BUCKETS))
    return cuts


def assign_split(keys: list, cuts: list[tuple[str, int]], seed: int) -> np.ndarray:
    """Vectorized-per-batch split assignment; md5 per DISTINCT key."""
    arr = np.asarray([str(k) for k in keys], dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    tail = (_SEP + str(seed)).encode()
    buckets_u = np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode() + tail).digest()[8:], "little")
            % _BUCKETS
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    buckets = buckets_u[inv]
    bounds = np.asarray([c for _, c in cuts], dtype=np.int64)
    idx = np.searchsorted(bounds, buckets, side="right")
    names = np.asarray([n for n, _ in cuts], dtype=object)
    return names[idx]


def hash_split(
    ds: rd.Dataset,
    key_col: str,
    fracs: dict[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> rd.Dataset:
    """Add a deterministic split column — pure map, zero exchanges.

    Default fracs: train 0.8 / val 0.1 / test 0.1.  Rows sharing a key
    always land in the same split (the whole point: dedup clusters
    collapsed to a canonical url stay on one side of the split).
    """
    cuts = split_cutoffs(fracs or {"train": 0.8, "val": 0.1, "test": 0.1})

    def add(t: pa.Table) -> pa.Table:
        names = assign_split(t[key_col].to_pylist(), cuts, seed)
        return t.append_column(out_col, pa.array(names, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def split_sql_case(key_expr: str, fracs: dict[str, float], seed: int) -> str:
    """The DuckDB twin of ``assign_split`` as a CASE expression."""
    cuts = split_cutoffs(fracs)
    h = (
        f"(md5_number_lower(CAST({key_expr} AS VARCHAR) || chr(30) || "
        f"'{seed}') % {_BUCKETS})"
    )
    parts = [
        f"WHEN {h} < {cut} THEN '{name}'" for name, cut in cuts[:-1]
    ]
    return f"CASE {' '.join(parts)} ELSE '{cuts[-1][0]}' END"
