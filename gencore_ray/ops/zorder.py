"""Z-order (Morton) layout keys for multi-column data clustering.

Writing 100 TB once and range-scanning it forever means file layout IS
the index: sorting by a bit-interleaved key of two range-queried
columns co-locates rows that are close in BOTH dimensions, so
min/max-pruned Parquet reads (sources.read_pages column/row-group
pruning) skip most files for 2-D range predicates — the standard
Delta/Iceberg OPTIMIZE ZORDER layout, computed here as a pure
vectorised column (no exchange; the caller chooses whether to pay the
global ``ds.sort(zkey)`` for the re-layout write).

The interleave is integer-exact bit twiddling, so the SQL twin can
replay it with shift/mask arithmetic — layout keys belong in the
oracle-checkable set like every other transform.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _spread16(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of x (uint64):
    bit i -> bit 2i.  Classic Morton spreading via magic masks."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """32-bit Morton code from the low 16 bits of two non-negative
    integer arrays: a's bits land on even positions, b's on odd."""
    return (_spread16(a) | (_spread16(b) << np.uint64(1))).astype(np.int64)


def zorder_keys(
    ds: rd.Dataset,
    col_a: str,
    col_b: str,
    out_col: str = "zkey",
) -> rd.Dataset:
    """Add the Morton key of (col_a, col_b) — both reduced to their low
    16 bits; pre-bucket continuous values first (e.g. floor(value),
    epoch-hour).  Pure map; chain ``.sort(out_col)`` +
    ``write_parquet`` for the actual re-layout."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        a = df[col_a].to_numpy()
        b = df[col_b].to_numpy()
        if (np.asarray(a) < 0).any() or (np.asarray(b) < 0).any():
            raise ValueError("zorder_keys: bucket columns must be >= 0")
        df[out_col] = morton_key(a.astype(np.uint64), b.astype(np.uint64))
        return df

    return ds.map_batches(fn, batch_format="pandas")
