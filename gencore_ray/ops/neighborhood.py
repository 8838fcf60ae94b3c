"""Sorted-neighborhood blocking (Hernandez & Stolfo 1995).

The third candidate-generation strategy beside LSH banding
(stages/lsh.py) and the suffix array (ops/suffix.py): sort the corpus
by a domain key and compare only rows within a rank window of w — the
classic record-linkage method when near-duplicates share a PREFIX
(titles, names, addresses, normalized text starts).

Distributed shape (no global sort materialization):

  1. sortkey: the first 8 sanitized-ASCII chars big-endian-packed into
     a uint64 — integer order == byte-lexicographic prefix order, so
     the global rank is SQL-replayable (ROW_NUMBER over the string).
  2. global rank via the range-partition prefix-sum pattern of
     ops/packing.py: partition by key range, local sort + local rank,
     one tiny driver round for partition offsets.
  3. window pairs: each row lands in rank-blocks rn//w and rn//w+1;
     a pair is emitted by the block holding the LARGER rank only
     (exactly-once ownership, as ops/intervals.py).

Pair mass is exactly n*w minus boundary truncation — linear in the
corpus, the whole point of the method.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

_SANITIZE = r"[^a-z0-9 ]"


def _prefix_key(texts: list, prefix_len: int = 8) -> np.ndarray:
    """Big-endian pack of the first ``prefix_len`` sanitized chars —
    uint64 order equals lexicographic order of the ASCII prefix."""
    import re

    pat = re.compile(_SANITIZE)
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        s = pat.sub("", (t or "").lower())[:prefix_len].encode()
        out[i] = int.from_bytes(s.ljust(8, b"\0"), "big")
    return out


def sorted_neighborhood_pairs(
    docs: rd.Dataset,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 16,
) -> rd.Dataset:
    """Candidate pairs (id_a, id_b, rank_dist) for all rows within
    ``window`` ranks of each other under (sanitized-prefix, id) order.
    Downstream verification (exact Jaccard / Levenshtein) is the
    caller's choice — this op is the blocking stage only.
    """
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import grouped_map

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        k = _prefix_key(df[text_col].tolist()).view(np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "sk": k})

    K = docs.select_columns([id_col, text_col]).map_batches(
        keyed, batch_format="pandas").materialize()

    # range partition on the key (prefix-sum pattern, ops/packing.py):
    # uint64 key space split evenly; skewed prefixes are bounded by the
    # per-partition local sort, not by correctness
    lo = K.min("sk")
    if lo is None:                       # empty corpus
        return rd.from_pandas(pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "rank_dist": pd.Series(dtype="int64")}))
    hi = K.max("sk")
    width = max(1, (int(hi) - int(lo)) // num_parts + 1)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(part=(df["sk"].to_numpy(np.int64) - int(lo))
                         // width)

    def local_rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(local_rn=pd.Series(dtype="int64"))
        # the global-rank carry needs one part per partition (parts
        # 0..num_parts-1 exchange as p % num_parts — a bijection);
        # loud, not assumed
        if df["part"].nunique() != 1:
            raise AssertionError("sorted_neighborhood_pairs: partition "
                                 "holds multiple key ranges")
        df = df.sort_values(["sk", id_col], kind="mergesort")
        df = df.assign(local_rn=np.arange(len(df), dtype=np.int64))
        return df

    ranked = grouped_map(K.map_batches(part, batch_format="pandas"),
                         "part", local_rank,
                         num_parts=num_parts).materialize()
    totals = grouped_aggregate(ranked.select_columns(["part"]), ["part"],
                               [("cnt", None, "count")], num_parts=4,
                               ).to_pandas().sort_values("part")
    prefix = dict(zip(
        totals["part"].astype(np.int64),
        np.concatenate([[0], totals["cnt"].to_numpy()[:-1].cumsum()])
        .astype(np.int64)))
    prefix_ref = ray.put(prefix)

    w = int(window)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        pfx = ray.get(prefix_ref)
        rn = (df["part"].map(pfx).to_numpy(dtype=np.int64)
              + df["local_rn"].to_numpy())
        blk = rn // w
        out = pd.DataFrame({
            "blk": np.concatenate([blk, blk + 1]),
            id_col: np.tile(df[id_col].to_numpy(np.int64), 2),
            "rn": np.tile(rn, 2),
        })
        return out

    exploded = ranked.map_batches(explode, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "rank_dist": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        m = df.merge(df, on="blk", suffixes=("_a", "_b"))
        m = m[m["rn_a"] < m["rn_b"]]
        keep = ((m["rn_b"] - m["rn_a"] <= w)
                # ownership: the block of the LARGER rank emits
                & (m["rn_b"] // w == m["blk"]))
        m = m[keep]
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy(np.int64),
            "id_b": m[f"{id_col}_b"].to_numpy(np.int64),
            "rank_dist": (m["rn_b"] - m["rn_a"]).to_numpy(np.int64),
        })

    return grouped_map(exploded, "blk", pairs, num_parts=num_parts)
