"""Sparse TF-IDF cosine similarity via an inverted-index exchange.

The dense embedding ops (ops/ann.py) pay O(n^2) matmuls or LSH
recall; the sparse complement exploits that two documents' TF-IDF dot
product only has terms BOTH contain — so pairs are generated term-by-
term (the inverted index join of classic IR), and the quadratic cost
collapses to sum(df^2) over the pruned vocabulary.

Dataflow (every exchange slim, text never rides a shuffle):

  1. map: per-doc term frequencies -> (th=md5_low64(term), doc_id, tf)
  2. term-keyed aggregate: document frequency df per term; terms with
     df=1 (can't pair) or df > max_df (stop terms — the hot-key guard
     AND the classic IR prune: near-zero idf, quadratic pair cost) are
     dropped, COUNTED, and the pruned-vocab idf table is broadcast
     (vocabulary-bounded — same O(V) broadcast-model shape as
     ops/lm.py).
  3. map + doc-keyed aggregate: w = tf*idf, per-doc norms over the
     pruned vector.
  4. doc-keyed join: norms ride with the term rows (8 B each), so the
     final pair aggregate needs no second lookup.
  5. term-keyed exchange: per term, all (doc, w) pairs merge -> partial
     products (doc_a < doc_b); pair-keyed aggregate sums them; one
     rounded division by the norms gives cosine.

The reference analogue is the UMI-prefix bucketed pair generation
(/root/reference/src/cluster.cpp:55-100): candidates only within a
shared key, never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from gencore_ray.functions.embed import md5_low64


def make_term_rows_fn(id_col: str, text_col: str):
    """Batch map: docs -> one (id, th, tf) row per distinct (doc, term).
    One factorize + one unique over the whole batch (the sparse fold of
    textstats.token_entropy); md5 runs ONCE per DISTINCT token in the
    batch — the Zipfian corpus makes that the win."""
    from gencore_ray.functions.text import _TOKEN_RE

    def term_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids_arr = df[id_col].to_numpy(dtype=np.int64)
        tok_lists = [_TOKEN_RE.findall((t or "").lower())
                     for t in df[text_col].tolist()]
        lens = np.fromiter(map(len, tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        empty = pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "th": pd.Series(dtype="int64"),
            "tf": pd.Series(dtype="int64")})
        if not int(lens.sum()):
            return empty
        from itertools import chain
        pos = np.repeat(np.arange(len(df)), lens)
        tcodes, uniques = pd.factorize(
            pd.Series(list(chain.from_iterable(tok_lists))), sort=False)
        n_uniq = len(uniques)
        th_uniq = np.fromiter((md5_low64(u) for u in uniques),
                              dtype=np.uint64, count=n_uniq).view(np.int64)
        comb = pos * np.int64(n_uniq) + tcodes
        uniq, cnt = np.unique(comb, return_counts=True)
        return pd.DataFrame({
            id_col: ids_arr[uniq // n_uniq],
            "th": th_uniq[uniq % n_uniq],
            "tf": cnt.astype(np.int64),
        })

    return term_rows


def tfidf_cosine_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | float = 0.2,
    min_df: int = 2,
    round_to: int = 6,
    num_parts: int = 16,
) -> rd.Dataset:
    """All doc pairs (doc_a < doc_b) whose TF-IDF cosine over the
    df-pruned vocabulary is >= ``threshold`` (rounded to ``round_to``
    BEFORE thresholding, so the cut is SQL-replayable).

    idf = ln(N / df); terms outside [min_df, max_df] are removed from
    the vectors entirely (norms included) — standard stop-term pruning,
    which is also what bounds the per-term pair fan-out.  ``max_df``
    < 1.0 means a FRACTION of the corpus (the scale-stable contract —
    an absolute cut empties the vocabulary once every term's df grows
    past it); >= 1 is an absolute document count.
    """
    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import grouped_map, hash_join

    n_docs = docs.count()
    max_df_abs = int(max_df) if max_df >= 1 else int(np.floor(max_df * n_docs))

    T = docs.select_columns([id_col, text_col]).map_batches(
        make_term_rows_fn(id_col, text_col),
        batch_format="pandas").materialize()

    dfreq = grouped_aggregate(T.select_columns(["th"]), ["th"],
                              [("df", None, "count")], num_parts=num_parts)
    dfreq = dfreq.filter(expr=f"df >= {int(min_df)} and df <= {max_df_abs}")
    dfp = dfreq.to_pandas()          # pruned vocabulary — bounded by max_df cut
    if not len(dfp):                 # empty prune survives column-less
        return rd.from_pandas(pd.DataFrame({
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64")}))
    idf = dict(zip(dfp["th"].to_numpy(),
                   np.log(float(n_docs) / dfp["df"].to_numpy(dtype=np.float64))))
    idf_ref = ray.put(idf)

    def weight(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(idf_ref)
        iv = df["th"].map(m)
        keep = iv.notna()
        df = df.loc[keep].assign(w=df.loc[keep, "tf"].to_numpy(dtype=np.float64)
                                 * iv[keep].to_numpy(dtype=np.float64))
        return df[[id_col, "th", "w"]]

    W = T.map_batches(weight, batch_format="pandas").materialize()

    def w2(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col],
                             "w2": df["w"].to_numpy() ** 2})

    norms = grouped_aggregate(W.map_batches(w2, batch_format="pandas"),
                              [id_col], [("sum_w2", "w2", "sum")],
                              num_parts=num_parts)

    def to_norm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_doc": df[id_col],
                             "nrm": np.sqrt(df["sum_w2"].to_numpy())})

    norms = norms.map_batches(to_norm, batch_format="pandas")
    Wn = hash_join(W, norms, id_col, "n_doc", num_parts=num_parts)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "prod": pd.Series(dtype="float64"),
                              "na": pd.Series(dtype="float64"),
                              "nb": pd.Series(dtype="float64")})
        if not len(df):
            return empty
        m = df.merge(df, on="th", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return empty
        return pd.DataFrame({
            "doc_a": m[f"{id_col}_a"].to_numpy(dtype=np.int64),
            "doc_b": m[f"{id_col}_b"].to_numpy(dtype=np.int64),
            "prod": m["w_a"].to_numpy() * m["w_b"].to_numpy(),
            "na": m["nrm_a"].to_numpy(),
            "nb": m["nrm_b"].to_numpy(),
        })

    P = grouped_map(Wn, "th", partials, num_parts=num_parts)
    agg = grouped_aggregate(
        P, ["doc_a", "doc_b"],
        [("dot", "prod", "sum"), ("na", "na", "max"), ("nb", "nb", "max")],
        num_parts=num_parts,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cos = np.round(df["dot"].to_numpy()
                       / (df["na"].to_numpy() * df["nb"].to_numpy()), round_to)
        out = df.assign(cos_sim=cos)[["doc_a", "doc_b", "cos_sim"]]
        return out[out["cos_sim"] >= threshold]

    return agg.map_batches(finish, batch_format="pandas")


def weighted_jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | float = 0.5,
    min_df: int = 2,
    round_to: int = 6,
    num_parts: int = 16,
) -> rd.Dataset:
    """All doc pairs with WEIGHTED Jaccard >= threshold over the
    df-pruned vocabulary: J = sum(min(tf_a, tf_b)) / sum(max(tf_a,
    tf_b)) — the multiset dedup metric (set Jaccard scores 'the the
    the' == 'the'; weighted Jaccard does not).

    Identity used: sum_max = tot_a + tot_b - sum_min over the shared
    terms only, so the SAME inverted-index exchange as
    ``tfidf_cosine_pairs`` suffices: per shared term emit min(tf_a,
    tf_b); per-doc pruned-vocab totals ride with the term rows.
    Every intermediate is an INTEGER — the one rounded division at the
    end is the only float, making this the most replay-robust pair
    metric in the suite.  Pruning contract as tfidf_cosine_pairs:
    the metric is DEFINED over the pruned vocabulary (documented
    semantic, identical in the SQL twin).
    """
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import grouped_map, hash_join

    n_docs = docs.count()
    max_df_abs = int(max_df) if max_df >= 1 else int(np.floor(max_df * n_docs))

    T = docs.select_columns([id_col, text_col]).map_batches(
        make_term_rows_fn(id_col, text_col),
        batch_format="pandas").materialize()

    dfreq = grouped_aggregate(T.select_columns(["th"]), ["th"],
                              [("df", None, "count")], num_parts=num_parts)
    dfreq = dfreq.filter(expr=f"df >= {int(min_df)} and df <= {max_df_abs}")
    dfp = dfreq.to_pandas()
    empty_out = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "w_jaccard": pd.Series(dtype="float64")})
    if not len(dfp):
        return rd.from_pandas(empty_out)
    keep_ref = ray.put(set(dfp["th"].tolist()))

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["th"].isin(ray.get(keep_ref))
        return df[keep]

    Tp = T.map_batches(prune, batch_format="pandas").materialize()
    tots = grouped_aggregate(Tp, [id_col], [("tot", "tf", "sum")],
                             num_parts=num_parts)

    def to_tot(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t_doc": df[id_col],
                             "tot": df["tot"].astype(np.int64)})

    Tn = hash_join(Tp, tots.map_batches(to_tot, batch_format="pandas"),
                   id_col, "t_doc", num_parts=num_parts)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "mn": pd.Series(dtype="int64"),
                              "ta": pd.Series(dtype="int64"),
                              "tb": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        m = df.merge(df, on="th", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return empty
        return pd.DataFrame({
            "doc_a": m[f"{id_col}_a"].to_numpy(dtype=np.int64),
            "doc_b": m[f"{id_col}_b"].to_numpy(dtype=np.int64),
            "mn": np.minimum(m["tf_a"].to_numpy(), m["tf_b"].to_numpy())
            .astype(np.int64),
            "ta": m["tot_a"].to_numpy(dtype=np.int64),
            "tb": m["tot_b"].to_numpy(dtype=np.int64),
        })

    P = grouped_map(Tn, "th", partials, num_parts=num_parts)
    agg = grouped_aggregate(
        P, ["doc_a", "doc_b"],
        [("smin", "mn", "sum"), ("ta", "ta", "max"), ("tb", "tb", "max")],
        num_parts=num_parts,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        smin = df["smin"].to_numpy(dtype=np.float64)
        smax = (df["ta"].to_numpy(dtype=np.float64)
                + df["tb"].to_numpy(dtype=np.float64) - smin)
        j = np.round(smin / smax, round_to)
        out = df.assign(w_jaccard=j)[["doc_a", "doc_b", "w_jaccard"]]
        return out[out["w_jaccard"] >= threshold]

    return agg.map_batches(finish, batch_format="pandas")
