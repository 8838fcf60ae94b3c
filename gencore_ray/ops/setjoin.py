"""Exact set-similarity self-join via prefix filtering (PPJoin family,
Chaudhuri et al. 2006 / Xiao et al. 2008).

The EXACT-recall complement to MinHash-LSH (stages/lsh.py): for token-
SET Jaccard >= tau, two sets must share at least one token among each
set's first ``|d| - ceil(tau*|d|) + 1`` tokens under ANY fixed global
token order — choosing rarest-first (ascending document frequency)
makes those prefixes index almost nothing for most documents.  No
probabilistic recall: every qualifying pair is found, by the prefix-
filter theorem, and every candidate is verified with the true Jaccard.

Dataflow:

  1. distinct (doc, token-hash) rows; df per token (one slim exchange)
  2. df map broadcast (vocabulary-bounded, the ops/lm.py shape);
     per doc: sort its tokens by (df, th), emit only the PREFIX rows
  3. prefix-token-keyed exchange -> candidate pairs (deduped by a
     pair-keyed aggregate; prefix tokens are rare by construction, so
     the per-token fan-out is the opposite of a hot key)
  4. verification WITHOUT token lists and WITHOUT driver collection:
     the candidate table stays a Dataset; each side's token rows
     attach via a partitioned ``hash_join`` on the doc id, the two
     attached streams union, and ONE pair-keyed exchange counts the
     (pair, token) keys seen twice — i.e. from both sides — which is
     the exact intersection size.  Sizes ride the candidate rows, so
     the Jaccard finishes inside the same exchange.

Partitioning assumptions: a token's prefix postings fit a partition
(prefixes select LOW-df tokens; a token with huge df appears in almost
no prefixes), and a single DOC's (pairs x tokens) verification rows fit
the join partition that colocates them — a doc in k pairs with t
tokens emits k*t slim rows there before the pair-keyed exchange
spreads them (the one skew axis; prefix filtering keeps k near-linear).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def set_similarity_join(
    docs: rd.Dataset,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    num_parts: int = 16,
) -> rd.Dataset:
    """All pairs (doc_a < doc_b) with token-SET Jaccard >= threshold —
    EXACT (100% recall, verified candidates).  Pick a ``threshold``
    with an exact binary representation (0.5, 0.75) so the engine and
    a SQL twin compute identical ceil(tau*|d|) prefix lengths."""
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.ops.sparse import make_term_rows_fn
    from gencore_ray.stages.shuffle import grouped_map

    T = docs.select_columns([id_col, text_col]).map_batches(
        make_term_rows_fn(id_col, text_col),
        batch_format="pandas").materialize()
    # SET semantics: term_rows already emits one row per DISTINCT
    # (doc, token); tf is ignored from here on
    dfreq = grouped_aggregate(T.select_columns(["th"]), ["th"],
                              [("df", None, "count")],
                              num_parts=num_parts).to_pandas()
    if not len(dfreq):
        return rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}))
    df_map = dict(zip(dfreq["th"].to_numpy(), dfreq["df"].to_numpy()))
    df_ref = ray.put(df_map)
    tau = float(threshold)

    def doc_lists(df: pd.DataFrame) -> pd.DataFrame:
        """Per doc: full sorted token list + its prefix rows."""
        m = ray.get(df_ref)
        df = df.assign(dfv=df["th"].map(m))
        df = df.sort_values([id_col, "dfv", "th"], kind="mergesort")
        sz = df.groupby(id_col, sort=False)["th"].transform("size")
        pos = df.groupby(id_col, sort=False).cumcount()
        plen = sz - np.ceil(tau * sz.to_numpy()).astype(np.int64) + 1
        df = df.assign(sz=sz.astype(np.int64), pos=pos,
                       is_prefix=pos < plen)
        return df[[id_col, "th", "sz", "pos", "is_prefix"]]

    # doc rows co-locate so sort/cumcount see complete docs
    D = grouped_map(T.select_columns([id_col, "th"]), id_col, doc_lists,
                    num_parts=num_parts).materialize()

    prefix = D.filter(expr="is_prefix == True").select_columns(
        [id_col, "th", "sz"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "sa": pd.Series(dtype="int64"),
                              "sb": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        m = df.merge(df, on="th", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        # size filter: J >= tau requires tau*sa <= sb (and vice versa)
        keep = (m["sz_b"].to_numpy() >= tau * m["sz_a"].to_numpy()) & \
               (m["sz_a"].to_numpy() >= tau * m["sz_b"].to_numpy())
        m = m[keep]
        if not len(m):
            return empty
        return pd.DataFrame({
            "doc_a": m[f"{id_col}_a"].to_numpy(np.int64),
            "doc_b": m[f"{id_col}_b"].to_numpy(np.int64),
            "sa": m["sz_a"].to_numpy(np.int64),
            "sb": m["sz_b"].to_numpy(np.int64),
        })

    cand = grouped_map(prefix, "th", pairs, num_parts=num_parts)
    cand = grouped_aggregate(cand, ["doc_a", "doc_b"],
                             [("sa", "sa", "max"), ("sb", "sb", "max")],
                             num_parts=num_parts)

    # --- verification: the candidate table stays a DATASET end to end
    # — token LISTS never ride a join (list payloads trip Ray's
    # output-buffer slicing) and the pair set never lands on the
    # driver.  Each side's distinct (doc, th) rows attach via a
    # partitioned hash_join on the doc id; each (pair, th) key then
    # appears ONCE per side that owns the token, so a pair-keyed
    # exchange counting keys seen twice computes the exact
    # intersection, and sa/sb (riding the candidate rows) finish the
    # Jaccard inside the same exchange.
    from gencore_ray.stages.shuffle import (
        hash_join, pair_mix, scaled_num_parts, to_arrow_blocks)

    empty_out = rd.from_pandas(pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"),
         "doc_b": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}))
    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty_out
    # verification row mass = sum(sa + sb) over candidates; scale the
    # exchange partition count with it (Arrow 2 GB IPC bound)
    est_rows = float(cand.sum("sa") or 0) + float(cand.sum("sb") or 0)
    vparts = scaled_num_parts(num_parts, est_rows * 48.0)

    Tslim = to_arrow_blocks(T.select_columns([id_col, "th"])).rename_columns(
        {id_col: "__d"}).materialize()

    def _pkey(t):
        import pyarrow as pa
        k = pair_mix(t["doc_a"].to_numpy(zero_copy_only=False),
                     t["doc_b"].to_numpy(zero_copy_only=False))
        return t.append_column("pkey", pa.array(k))

    ja = hash_join(cand, Tslim, "doc_a", "__d", num_parts=vparts)
    jb = hash_join(cand, Tslim, "doc_b", "__d", num_parts=vparts)
    P = ja.union(jb).map_batches(_pkey, batch_format="pyarrow")

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "jaccard": pd.Series(dtype="float64")})
        if not len(df):
            return empty
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        th = df["th"].to_numpy()
        order = np.lexsort((th, b, a))
        a, b, th = a[order], b[order], th[order]
        # each (pair, th) row is unique per side (term rows are distinct
        # per doc; candidate rows unique per pair), so a run of length 2
        # == token present in BOTH sets
        new_tok = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])
                        | (th[1:] != th[:-1])]
        new_pair = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        gid = np.cumsum(new_pair) - 1
        inter = np.bincount(gid[~new_tok], minlength=int(gid[-1]) + 1)
        first = np.flatnonzero(new_pair)
        sa = df["sa"].to_numpy(np.int64)[order][first]
        sb = df["sb"].to_numpy(np.int64)[order][first]
        union = sa + sb - inter
        jac = np.floor(inter / union * 10.0 ** round_to + 0.5) \
            / 10.0 ** round_to
        keep = jac >= tau
        return pd.DataFrame({"doc_a": a[first][keep],
                             "doc_b": b[first][keep],
                             "jaccard": jac[keep]})

    return grouped_map(P, "pkey", verify_partition, num_parts=vparts)
