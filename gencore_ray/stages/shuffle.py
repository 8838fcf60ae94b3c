"""Partition-wise grouped execution.

``Dataset.groupby(k).map_groups(fn)`` invokes ``fn`` once per group —
per-invocation overhead dominates when groups are tiny and numerous
(LSH buckets, text-hash groups, clusters).  The scalable pattern used
throughout this engine instead:

  1. add ``_part = stable_hash(key) % P``   (vectorised)
  2. ``groupby("_part").map_groups(fn)``    -> P big invocations
  3. inside ``fn``, process ALL complete key-groups of the partition
     with vectorised pandas/numpy/arrow.

Same all-to-all exchange semantics (every row moves once, keyed), but
the per-group Python cost collapses into a handful of vectorised
calls.  P bounds partition size at scale: choose P ~ total_rows /
(target rows per partition).

Two body formats: ``batch_format="pandas"`` for slim numeric/string
tables, ``"pyarrow"`` when rows carry wide binary payloads (pandas
conversion of per-row bytes objects is the classic hidden cost).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from pandas.util import hash_pandas_object

_PART = "_part"


def _part_values(col, num_parts: int) -> np.ndarray:
    """Stable partition ids for a key column (pa.ChunkedArray or pd.Series)."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            return (vals % np.uint64(num_parts)).astype(np.int64)
        col = col.to_pandas()  # key column only — payload columns untouched
    if pd.api.types.is_integer_dtype(col):
        return (col.to_numpy().astype(np.uint64) % np.uint64(num_parts)).astype(np.int64)
    # hash_pandas_object is deterministic across processes (fixed hash_key)
    return (hash_pandas_object(col, index=False).to_numpy() % np.uint64(num_parts)).astype(
        np.int64
    )


import ray as _ray

# ---------------------------------------------------------------------------
# Version-coupled fast path: the exchange avoids from_arrow_refs' extra
# one-metadata-task-per-block driver round by computing block metadata
# INSIDE the reduce tasks and assembling the MaterializedDataset
# directly.  That needs four `ray.data._internal` symbols (public
# package, private module — a Ray upgrade may move them).  Capability
# is probed ONCE on the driver and threaded into the tasks as a plain
# argument; when the probe fails, everything falls back to the public
# ``ray.data.from_arrow_refs`` (identical results, one extra metadata
# round per exchange).  tests/test_shuffle.py monkeypatches the probe
# off to keep the fallback exercised.
# ---------------------------------------------------------------------------


def _internal_api_ok() -> bool:
    try:
        from ray.data._internal.logical.interfaces import LogicalPlan  # noqa: F401
        from ray.data._internal.logical.operators.from_operators import (  # noqa: F401
            FromArrow,
        )
        from ray.data._internal.plan import ExecutionPlan  # noqa: F401
        from ray.data._internal.stats import DatasetStats  # noqa: F401
        from ray.data._internal.util import (  # noqa: F401
            get_table_block_metadata_schema,
        )
        return True
    except Exception:
        return False


_INTERNAL_OK: bool | None = None


def _use_internal() -> bool:
    global _INTERNAL_OK
    if _INTERNAL_OK is None:
        _INTERNAL_OK = _internal_api_ok()
    return _INTERNAL_OK


def _block_meta(out: pa.Table, use_internal: bool):
    """Block metadata for the fast assembly path, or None to signal the
    public from_arrow_refs fallback (also taken if the worker's Ray
    build disagrees with the driver probe)."""
    if not use_internal:
        return None
    try:
        from ray.data._internal.util import get_table_block_metadata_schema

        return get_table_block_metadata_schema(out)
    except Exception:
        return None


@_ray.remote
def _exchange_map(block: pa.Table, key: str, num_parts: int):
    """Split one block into num_parts sub-tables by stable key hash."""
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if not block.column_names:
        # a column-less block carries zero rows by construction (Ray
        # emits these for some empty intermediate blocks) — nothing to route
        return None if num_parts == 1 else tuple(None for _ in range(num_parts))
    if key not in block.column_names:
        raise KeyError(
            f"hash_exchange key {key!r} missing; block has {block.column_names}"
        )
    parts = _part_values(block[key], num_parts)
    order = np.argsort(parts, kind="stable")
    sorted_parts = parts[order]
    bounds = np.searchsorted(sorted_parts, np.arange(num_parts + 1))
    reordered = block.take(pa.array(order))
    if num_parts == 1:
        # num_returns=1 stores the return value itself as the single
        # object — return the bare table, not a 1-tuple
        return reordered
    return tuple(
        reordered.slice(bounds[p], bounds[p + 1] - bounds[p])
        for p in range(num_parts)
    )


@_ray.remote(num_returns=2)
def _exchange_reduce(schema: pa.Schema, use_internal: bool, *tables):
    tables = [t for t in tables if t is not None]
    if not tables:
        # every input block was column-less; rebuild from the dataset schema
        out = schema.empty_table()
    else:
        # empty inputs still carry the schema, so an all-empty partition
        # reduces to a schema-correct empty block
        out = pa.concat_tables(tables, promote_options="default").combine_chunks()
    # emit the block metadata HERE: the driver assembles the Dataset from
    # (block, metadata) ref pairs without from_arrow_refs' extra
    # one-task-per-block metadata round after the exchange
    return out, _block_meta(out, use_internal)


def _dataset_from_reduced(block_refs, meta_refs) -> rd.Dataset:
    """MaterializedDataset over exchange outputs (mirrors
    ray.data.from_arrow_refs, minus its per-block metadata task round —
    the metadata was computed inside the reduce tasks).  Falls back to
    the public ``ray.data.from_arrow_refs`` when the internal assembly
    API is unavailable or any task declined to emit metadata."""
    metadata_schema = _ray.get(meta_refs)
    # drop empty partitions at assembly: a 0-row block later surfaces as
    # a schema-less RefBundle ("Operator produced a RefBundle with a
    # different schema" warning) and makes downstream schema inference
    # on sparse outputs fragile.  One schema-carrying block is kept when
    # EVERY partition is empty, so the dataset never loses its schema.
    def _rows(m):
        try:
            return m.metadata.num_rows
        except AttributeError:
            return None

    if all(m is not None and _rows(m) is not None for m in metadata_schema):
        keep = [i for i, m in enumerate(metadata_schema) if _rows(m)]
        if not keep:
            keep = [0]
        if len(keep) < len(metadata_schema):
            block_refs = [block_refs[i] for i in keep]
            metadata_schema = [metadata_schema[i] for i in keep]
    if _use_internal() and all(m is not None for m in metadata_schema):
        try:
            from ray.data._internal.logical.interfaces import LogicalPlan
            from ray.data._internal.logical.operators.from_operators import FromArrow
            from ray.data._internal.plan import ExecutionPlan
            from ray.data._internal.stats import DatasetStats
            from ray.data.context import DataContext
            from ray.data.dataset import MaterializedDataset

            execution_plan = ExecutionPlan(
                DatasetStats(metadata={"FromArrow": metadata_schema}, parent=None),
                DataContext.get_current().copy(),
            )
            logical_plan = LogicalPlan(
                FromArrow(block_refs, metadata_schema), execution_plan._context
            )
            return MaterializedDataset(execution_plan, logical_plan)
        except Exception:
            pass
    return rd.from_arrow_refs(list(block_refs))


def exchange_refs(ds: rd.Dataset, key: str, num_parts: int):
    """The exchange as raw refs: returns (block_refs, meta_refs) — one
    (block, metadata) pair per partition, still pending.  Lets callers
    chain several exchanges/joins as ONE task graph with no driver sync
    between rounds (``_dataset_from_reduced`` assembles the final
    Dataset).  Returns (None, None) for an empty input."""
    block_refs = [ref for ref in ds.to_arrow_refs()]
    if not block_refs:
        return None, None
    schema_info = ds.schema()
    if schema_info is None:
        # zero-row lineage: ray can't derive a schema (e.g. map_batches
        # over an empty source never ran its fn) — same as no blocks
        return None, None
    schema = schema_info.base_schema
    map_out = [
        _exchange_map.options(num_returns=num_parts).remote(ref, key, num_parts)
        for ref in block_refs
    ]
    if num_parts == 1:
        map_out = [[r] for r in map_out]
    use_internal = _use_internal()
    reduced = [
        _exchange_reduce.remote(schema, use_internal, *[mo[p] for mo in map_out])
        for p in range(num_parts)
    ]
    return [r[0] for r in reduced], [r[1] for r in reduced]


def hash_exchange(ds: rd.Dataset, key: str, num_parts: int) -> rd.Dataset:
    """Raw-Ray two-round hash exchange: one output block per partition,
    all rows of a key in exactly one block.

    Ray Data's ``groupby`` exchange is a full SORT (sample -> range
    map -> merge) — it buys a global order that partition-wise grouped
    execution never needs, and its sampling barrier + per-block
    dispatch dominate wall time for slim tables.  This is the one spot
    the Dataset API can't express the cheaper semantics, so it drops
    to ray.remote: map tasks split each block by key hash, reduce
    tasks concat per partition (a textbook 2-round shuffle; the object
    store spills as needed).  Choose num_parts so a partition fits a
    worker's heap.

    Empty partitions flow through as SCHEMA-CORRECT empty blocks (every
    grouped fn is empty-safe) — no extra driver round counting rows; the
    only driver sync is the metadata gather at Dataset assembly.
    """
    blocks, metas = exchange_refs(ds, key, num_parts)
    if blocks is None:
        return ds
    return _dataset_from_reduced(blocks, metas)


def grouped_map(
    ds: rd.Dataset,
    key: str,
    fn: Callable,
    num_parts: int = 64,
    batch_format: str = "pandas",
) -> rd.Dataset:
    """Hash-partition by ``key``; ``fn`` sees one partition (DataFrame
    or pa.Table per batch_format) holding only complete key-groups."""
    parted = hash_exchange(to_arrow_blocks(ds), key, num_parts)
    # batch_size=None -> fn is called once per block == once per partition
    return parted.map_batches(fn, batch_format=batch_format, batch_size=None)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    num_parts: int = 64,
    how: str = "inner",
    left_dedupe: list[str] | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Partitioned hash join without persistent aggregator actors.

    ``Dataset.join`` spins up ``num_partitions`` long-lived aggregator
    actors per join — two chained joins deadlock a small node, and the
    Arrow join kernel rejects list payloads.  This implementation is
    the guide's portable pattern: tag each side, align schemas with
    typed null columns, union, one sort-shuffle keyed on the join key,
    then an Arrow-native matched ``take`` per partition — payload
    columns (binary sketches etc.) stay in Arrow buffers end to end.

    Non-key column names must already be disjoint (rename first).
    The right key column does not appear in the output; for
    ``how="full_outer"`` the left key column carries
    ``COALESCE(l.key, r.key)`` so right-only rows keep their key.
    """
    # explicit schemas let a caller join a side that MAY be empty (a
    # zero-row filtered lineage has no derivable schema — Ray never ran
    # the map fn); skew_join passes the pre-split schemas this way
    if left_schema is not None:
        lschema = left_schema
    else:
        lschema = left.schema().base_schema
        if not isinstance(lschema, pa.Schema):
            left = to_arrow_blocks(left)
            lschema = left.schema().base_schema
    if right_schema is not None:
        rschema = right_schema
    else:
        rschema = right.schema().base_schema
        if not isinstance(rschema, pa.Schema):
            right = to_arrow_blocks(right)
            rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols = [n for n in rschema.names if n != right_key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"hash_join column overlap: {sorted(overlap)} — rename first")

    # keys keep their native type (int keys hash/factorize ~10x faster
    # than strings); both sides must agree
    kt_l, kt_r = lschema.field(left_key).type, rschema.field(right_key).type
    if kt_l != kt_r:
        raise ValueError(f"hash_join key type mismatch: {kt_l} vs {kt_r}")

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.append_column("__key", t[left_key].combine_chunks()
                            if isinstance(t[left_key], pa.ChunkedArray) else t[left_key])
        t = t.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        for name in rcols:
            t = t.append_column(name, pa.nulls(n, rschema.field(name).type))
        return t.select(["__key", "__side", *lcols, *rcols])

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keycol = (t[right_key].combine_chunks()
                  if isinstance(t[right_key], pa.ChunkedArray) else t[right_key])
        # drop the key BEFORE padding: when left_key == right_key the
        # null left-key pad would otherwise collide with the right key
        t = t.drop_columns([right_key])
        t = t.append_column("__key", keycol)
        t = t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        for name in lcols:
            t = t.append_column(name, pa.nulls(n, lschema.field(name).type))
        return t.select(["__key", "__side", *lcols, *rcols])

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    left_outer = how == "left_outer"
    full_outer = how == "full_outer"
    if how not in ("inner", "left_outer", "full_outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how}")

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["__side"].to_numpy(zero_copy_only=False)
        keys = np.asarray(t["__key"].to_pandas())
        lmask = side == 0
        lidx = np.nonzero(lmask)[0]
        ridx = np.nonzero(~lmask)[0]
        if left_dedupe and len(lidx):
            # partition-local dedupe of left rows: rows sharing the join
            # key colocate here, so this is a GLOBAL distinct over
            # left_dedupe without a dedicated exchange
            kdf = t.select(left_dedupe).take(pa.array(lidx)).to_pandas()
            keep = ~kdf.duplicated().to_numpy()
            lidx = lidx[keep]
        if how in ("semi", "anti"):
            # existence check only — left rows kept/dropped by whether
            # their key appears on the right; right payload never emitted.
            # SQL NULL semantics: a NULL key matches NOTHING (factorize
            # maps nulls to -1 on both sides, which would wrongly match)
            codes, _ = pd.factorize(keys)
            rcodes = codes[ridx]
            present = np.isin(codes[lidx], rcodes[rcodes != -1])
            present &= codes[lidx] != -1
            sel = lidx[present] if how == "semi" else lidx[~present]
            return t.select(lcols).take(pa.array(sel))
        # match left rows to right rows on the key (first match wins is
        # wrong for 1:N — build full index pairs via pandas merge on
        # integer codes, cheap: keys only).  SQL NULL semantics: a NULL
        # key matches NOTHING — factorize maps nulls to -1 on BOTH sides,
        # which would wrongly pair them, so each null row gets a unique
        # sentinel code from a side-disjoint negative range instead
        codes, _ = pd.factorize(keys)
        lc = codes[lidx].astype(np.int64)
        rc = codes[ridx].astype(np.int64)
        lnull, rnull = lc == -1, rc == -1
        lc[lnull] = -2 - 2 * np.arange(np.count_nonzero(lnull), dtype=np.int64)
        rc[rnull] = -3 - 2 * np.arange(np.count_nonzero(rnull), dtype=np.int64)
        ldf = pd.DataFrame({"c": lc, "li": lidx})
        rdf = pd.DataFrame({"c": rc, "ri": ridx})
        pd_how = "outer" if full_outer else ("left" if left_outer else "inner")
        m = ldf.merge(rdf, on="c", how=pd_how)
        li = m["li"].fillna(-1).to_numpy(dtype=np.int64)
        ri = m["ri"].fillna(-1).to_numpy(dtype=np.int64)

        # null take-index -> null row (outer padding)
        left_part = t.select(lcols).take(pa.array(li, mask=li < 0))
        right_part = t.select(rcols).take(pa.array(ri, mask=ri < 0))
        if full_outer:
            # the join key column must survive right-only rows:
            # COALESCE(l.key, r.key) from the tagged __key column
            src = np.where(li >= 0, li, ri)
            key_vals = t["__key"].take(pa.array(src))
            left_part = left_part.set_column(
                lcols.index(left_key), left_key, key_vals)
        out = left_part
        for name in rcols:
            out = out.append_column(name, right_part[name])
        return out

    return grouped_map(tagged, "__key", merge, num_parts=num_parts,
                       batch_format="pyarrow")


def pair_mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Mix two uint64-able id arrays into one well-distributed int64
    PAIR key (golden-ratio multiply + xor) — the partition/chunk key
    for pair-level exchanges (ops/setjoin.py, stages/verify.py); both
    rows of a pair always land together."""
    av = np.asarray(a).astype(np.uint64)
    bv = np.asarray(b).astype(np.uint64)
    return ((av * np.uint64(0x9E3779B97F4A7C15)) ^ bv).astype(np.int64)


def scaled_num_parts(base: int, est_bytes: float,
                     target_bytes: int = 256 << 20) -> int:
    """Partition count respecting BOTH the cpu-based floor and a
    per-partition byte ceiling.  Arrow IPC serialization of a single
    table breaks past 2 GB (negative bodyLength -> SIGSEGV in the
    worker), so any exchange whose per-partition table could get large
    must scale its partition count with the DATA, not only with the
    CPU count — measured failure: 4M pages at num_cpus=8 put ~5 GB of
    attached pair rows into one verify-join partition.  256 MB keeps a
    healthy 8x margin while adding negligible task overhead."""
    return max(int(base), int(est_bytes // target_bytes) + 1)


def to_arrow_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Normalise block type to Arrow (pandas-producing ops emit pandas
    blocks; union/iter over mixed block types breaks)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)


def dedupe_rows(ds: rd.Dataset, cols: list[str], num_parts: int = 64) -> rd.Dataset:
    """Distributed DISTINCT over ``cols`` (exchange keyed on cols[0])."""
    return grouped_map(
        ds, cols[0], lambda df: df.drop_duplicates(subset=cols), num_parts=num_parts
    )
