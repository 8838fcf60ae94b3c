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
  4. verification WITHOUT token lists: the candidate set (near-linear
     by the prefix filter; loud guard) is broadcast as a doc ->
     (pair, side) index, one pass over the term rows emits slim
     (pair, th, side) rows, and a pair-keyed exchange counts tokens
     seen from BOTH sides — the exact intersection size.

Partitioning assumptions: a token's prefix postings fit a partition
(prefixes select LOW-df tokens; a token with huge df appears in almost
no prefixes) and the candidate PAIR LIST fits the driver (the edge-set
collection bound the flagship's driver-CC also documents).
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

    # --- verification: (pair, token) exchange — token LISTS never ride
    # a join (list payloads trip Ray's output-buffer slicing).  The
    # candidate set is collected once (bounded: prefix filtering emits
    # near-linear candidates; loud guard below) and broadcast as a
    # doc -> [(pair, side)] index; one pass over the term rows emits
    # (pair, th, side), and a pair-keyed exchange counts tokens seen
    # from BOTH sides = the exact intersection size.
    cp = cand.to_pandas()
    if not len(cp):
        return rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}))
    if len(cp) > 20_000_000:
        raise ValueError(
            f"set_similarity_join: {len(cp)} candidates — raise threshold "
            "or pre-partition the corpus before the join")
    cp = cp.reset_index(drop=True)
    cp["pid"] = np.arange(len(cp), dtype=np.int64)
    side_a = cp[["pid", "doc_a"]].rename(columns={"doc_a": "d"})
    side_a["side"] = np.int8(0)
    side_b = cp[["pid", "doc_b"]].rename(columns={"doc_b": "d"})
    side_b["side"] = np.int8(1)
    doc_index = pd.concat([side_a, side_b], ignore_index=True)
    idx_ref = ray.put(doc_index)
    sizes_ref = ray.put(cp[["pid", "doc_a", "doc_b", "sa", "sb"]])

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ix = ray.get(idx_ref)
        m = df[[id_col, "th"]].merge(ix, left_on=id_col, right_on="d")
        return m[["pid", "th", "side"]]

    P = T.select_columns([id_col, "th"]).map_batches(
        emit, batch_format="pandas")

    def inter_count(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"pid": pd.Series(dtype="int64"),
                              "inter": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        # a token counts toward the intersection iff both sides saw it
        d = df.drop_duplicates(["pid", "th", "side"])
        both = (d.groupby(["pid", "th"], sort=False)["side"]
                .size().reset_index(name="ns"))
        both = both[both["ns"] == 2]
        out = (both.groupby("pid", sort=False).size()
               .reset_index(name="inter"))
        return out.astype({"pid": "int64", "inter": "int64"})

    I = grouped_map(P, "pid", inter_count, num_parts=num_parts)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "jaccard": pd.Series(dtype="float64")})
        if not len(df):
            return empty
        sz = ray.get(sizes_ref)
        m = df.merge(sz, on="pid")
        inter = m["inter"].to_numpy(np.int64)
        union = m["sa"].to_numpy(np.int64) + m["sb"].to_numpy(np.int64) \
            - inter
        jac = np.floor(inter / union * 10.0 ** round_to + 0.5) \
            / 10.0 ** round_to
        out = pd.DataFrame({"doc_a": m["doc_a"].to_numpy(np.int64),
                            "doc_b": m["doc_b"].to_numpy(np.int64),
                            "jaccard": jac})
        return out[out["jaccard"] >= tau]

    return I.map_batches(finish, batch_format="pandas")
