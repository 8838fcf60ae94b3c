"""Token-budget mixture sampling + sequence packing (training prep).

Two ops every LLM-data pipeline runs after dedup/filtering:

* :func:`token_budget_sample` — build a training mixture by taking
  docs per source in a deterministic pseudo-random order until each
  source's token budget is reached. The order is the same Knuth
  multiplicative hash as ``stratified_sample`` (mod-first, exact for
  every id on both the engine and the SQL oracle), so the sample is
  reproducible by ANY engine from the table alone — no RNG state.

* :func:`pack_sequences` — GPT-style concat-and-chunk packing: docs
  are laid out in deterministic id order and cut into fixed
  ``seq_len``-token windows; each doc reports its global token offset
  and the chunk range it lands in. The global offset is a DISTRIBUTED
  prefix sum (per-range-partition local cumsums + one tiny driver
  round for the partition prefix offsets — the classic scan pattern),
  never a driver-side sort of the corpus.

gencore analogue: the output reorder buffer assigns each consensus
read its position in the global coordinate order while streaming
(/root/reference/src/gencore.cpp:113-143) — a watermark prefix scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from gencore_ray.functions.text import TextFeatures

_MULT, _MOD = np.uint64(2654435761), np.uint64(1 << 32)


def _token_counts(ds: rd.Dataset, id_col: str, text_col: str,
                  extra_cols: list[str]) -> rd.Dataset:
    """Slim (id[, extras], n_tokens) projection — the only pass that
    touches text."""
    def _tc(t: pa.Table) -> pa.Table:
        tf = TextFeatures(t[text_col].to_pylist(), need_hashes=False)
        cols = {id_col: t[id_col]}
        for c in extra_cols:
            cols[c] = t[c]
        cols["n_tokens"] = pa.array(tf.token_count)
        return pa.table(cols)

    return ds.select_columns([id_col, *extra_cols, text_col]).map_batches(
        _tc, batch_format="pyarrow", zero_copy_batch=True
    )


def token_budget_sample(
    docs: rd.Dataset,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 16,
) -> rd.Dataset:
    """-> (group, id, n_tokens): docs kept per group, in multiplicative-
    hash order, while the group's running token count (exclusive) is
    below ``budget_tokens`` — so each group lands within one doc of its
    budget. One exchange keyed on the group."""
    from gencore_ray.stages.shuffle import grouped_map

    counts = _token_counts(docs, id_col, text_col, [group_col])

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        h = ((df[id_col].to_numpy().astype(np.uint64) % _MOD) * _MULT) % _MOD
        df = df.assign(_h=h).sort_values(["_h", id_col], kind="mergesort")
        before = (
            df.groupby(group_col, sort=False)["n_tokens"].cumsum()
            - df["n_tokens"]
        )
        return df[before < budget_tokens].drop(columns=["_h"])

    return grouped_map(counts, group_col, per_group, num_parts=num_parts)


def pack_sequences(
    docs: rd.Dataset,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 16,
) -> rd.Dataset:
    """-> (id, n_tokens, start_offset, first_chunk, last_chunk).

    Concat-and-chunk layout in ascending id order: ``start_offset`` is
    the doc's global token position, chunks are ``seq_len`` windows of
    the concatenated stream; a doc spans ``first_chunk..last_chunk``
    (zero-token docs sit at their offset's chunk). Distributed prefix
    sum: range-partition by ``id // W`` (monotone in id, so partition
    order == id order), local cumsum per partition, then one small
    driver round turns per-partition totals into prefix offsets."""
    from gencore_ray.stages.shuffle import grouped_map

    counts = _token_counts(docs, id_col, text_col, [])
    max_id = counts.max(id_col) or 0
    width = max(1, (int(max_id) + num_parts) // num_parts)

    def _part(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(ids // width))

    parted = counts.map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    )

    def local_scan(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(local_before=pd.Series(dtype=np.int64))
        df = df.sort_values([id_col], kind="mergesort")
        before = (
            df.groupby("part", sort=False)["n_tokens"].cumsum() - df["n_tokens"]
        )
        return df.assign(local_before=before.astype(np.int64))

    scanned = grouped_map(
        parted, "part", local_scan, num_parts=num_parts
    ).materialize()

    # tiny driver round: per-partition token totals -> exclusive prefix
    from gencore_ray.ops.relational import grouped_aggregate

    totals = grouped_aggregate(
        scanned.select_columns(["part", "n_tokens"]), ["part"],
        [("tok", "n_tokens", "sum")], num_parts=4,
    ).to_pandas().sort_values("part")
    prefix = dict(zip(
        totals["part"].astype(np.int64),
        np.concatenate([[0], totals["tok"].to_numpy()[:-1].cumsum()]).astype(np.int64),
    ))
    prefix_ref = ray.put(prefix)

    def assign(t: pa.Table) -> pa.Table:
        pfx = ray.get(prefix_ref)
        part = pd.Series(t["part"].to_numpy(zero_copy_only=False))
        start = (
            part.map(pfx).to_numpy(dtype=np.int64)
            + t["local_before"].to_numpy(zero_copy_only=False)
        )
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        last_tok = np.where(n == 0, start, start + n - 1)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "start_offset": pa.array(start),
            "first_chunk": pa.array(start // seq_len),
            "last_chunk": pa.array(last_tok // seq_len),
        })

    return scanned.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
