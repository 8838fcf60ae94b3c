"""Partition-wise grouped execution.

``Dataset.groupby(k).map_groups(fn)`` invokes ``fn`` once per group —
per-invocation overhead dominates when groups are tiny and numerous
(LSH buckets, text-hash groups, clusters).  The scalable pattern used
throughout this engine instead:

  1. add ``_part = stable_hash(key) % P``   (vectorised)
  2. ``groupby("_part").map_groups(fn)``    -> P big invocations
  3. inside ``fn``, process ALL complete key-groups of the partition
     with vectorised pandas/numpy.

Same all-to-all exchange semantics (every row moves once, keyed), but
the per-group Python cost collapses into a handful of vectorised
calls.  P bounds partition size at scale: choose P ~ total_rows /
(target rows per partition).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from pandas.util import hash_pandas_object

_PART = "_part"


def _part_of_column(col: pd.Series, num_parts: int) -> np.ndarray:
    if pd.api.types.is_integer_dtype(col):
        return (col.to_numpy().astype(np.uint64) % np.uint64(num_parts)).astype(np.int64)
    # hash_pandas_object is deterministic across processes (fixed hash_key)
    return (hash_pandas_object(col, index=False).to_numpy() % np.uint64(num_parts)).astype(
        np.int64
    )


def grouped_map(
    ds: rd.Dataset,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_parts: int = 64,
) -> rd.Dataset:
    """Hash-partition by ``key``; ``fn`` sees one partition DataFrame
    holding only complete key-groups and returns any DataFrame."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df[_PART] = _part_of_column(df[key], num_parts)
        return df

    def run(df: pd.DataFrame) -> pd.DataFrame:
        out = fn(df.drop(columns=[_PART]))
        return out

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby(_PART)
        .map_groups(run, batch_format="pandas")
    )


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    num_parts: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """Partitioned hash join without persistent aggregator actors.

    ``Dataset.join`` spins up ``num_partitions`` long-lived aggregator
    actors per join — two chained joins deadlock a small node, and the
    Arrow join kernel rejects list payloads.  This implementation is
    the guide's portable pattern: tag each side, align schemas with
    typed null columns, union, one sort-shuffle keyed on the join key,
    then a vectorised ``pd.merge`` per partition.

    Non-key column names must already be disjoint (rename first).
    The right key column does not appear in the output.
    """
    import pyarrow as _pa

    lschema = left.schema().base_schema
    if not isinstance(lschema, _pa.Schema):
        left = to_arrow_blocks(left)
        lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    if not isinstance(rschema, _pa.Schema):
        right = to_arrow_blocks(right)
        rschema = right.schema().base_schema
    lcols = [n for n in lschema.names]
    rcols = [n for n in rschema.names if n != right_key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"hash_join column overlap: {sorted(overlap)} — rename first")

    def tag_left(t: _pa.Table) -> _pa.Table:
        n = t.num_rows
        t = t.append_column("__key", t[left_key].cast(_pa.string()))
        t = t.append_column("__side", _pa.array(np.zeros(n, dtype=np.int8)))
        for name in rcols:
            t = t.append_column(name, _pa.nulls(n, rschema.field(name).type))
        return t.select(["__key", "__side", *lcols, *rcols])

    def tag_right(t: _pa.Table) -> _pa.Table:
        n = t.num_rows
        t = t.append_column("__key", t[right_key].cast(_pa.string()))
        t = t.append_column("__side", _pa.array(np.ones(n, dtype=np.int8)))
        for name in lcols:
            t = t.append_column(name, _pa.nulls(n, lschema.field(name).type))
        t = t.drop_columns([right_key])
        return t.select(["__key", "__side", *lcols, *rcols])

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    pd_how = {"inner": "inner", "left_outer": "left"}[how]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df.loc[df["__side"] == 0, ["__key", *lcols]]
        rdf = df.loc[df["__side"] == 1, ["__key", *rcols]]
        out = ldf.merge(rdf, on="__key", how=pd_how)
        return out.drop(columns=["__key"])

    return grouped_map(tagged, "__key", merge, num_parts=num_parts)


def to_arrow_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Normalise block type to Arrow (pandas-producing ops emit pandas
    blocks; union/iter over mixed block types breaks)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)


def dedupe_rows(ds: rd.Dataset, cols: list[str], num_parts: int = 64) -> rd.Dataset:
    """Distributed DISTINCT over ``cols`` (exchange keyed on cols[0])."""
    return grouped_map(
        ds, cols[0], lambda df: df.drop_duplicates(subset=cols), num_parts=num_parts
    )
