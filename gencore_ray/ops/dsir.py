"""DSIR-style importance weighting: hashed n-gram log-likelihood
ratios against a target distribution (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023).

A large-scale curation pipeline scores every raw document by how much
it "looks like" a trusted target corpus: both corpora are reduced to
hashed n-gram (unigram + bigram) bag-of-words models over 2^b
buckets, and a document's importance weight is

    logratio(d) = sum_b tf_d(b) * [ log p_t(b) - log p_r(b) ]

with add-1 smoothing over the V = 2^b buckets.  Resampling the raw
corpus proportional to these weights (or thresholding) concentrates
training data on the target distribution.

Dataflow (all slim, one driver-visible table of <= 2*V rows):

  1. one tokenise pass emits (doc, bucket, tf, is_target) rows —
     md5 runs once per DISTINCT gram per batch (the ops/sparse.py
     factorize fold); bucket = md5_low64(gram) % V, which DuckDB
     replays verbatim as ``md5_number_lower(g) % V``;
  2. one (bucket, class) aggregate -> the 2-class bucket-count table
     (bounded by 2*V rows — vocabulary-bounded, the ops/lm.py shape)
     folded into a broadcast log-ratio array of V float64;
  3. one map over the term rows + one doc-keyed aggregate computes
     every document's weight.  Nothing row-wise ever reaches the
     driver.

Reference analogue: gencore's quality-weighted scoring of candidates
against the resident reference (src/group.cpp:320-526) — an external
"what good looks like" model broadcast into a per-record score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from gencore_ray.functions.embed import md5_low64
from gencore_ray.functions.text import _TOKEN_RE


def dsir_logratios(
    docs: rd.Dataset,
    target_col: str = "lang",
    target_value: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_bits: int = 16,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """(id, target_col, text) -> (id, dsir_logratio) for every doc
    with at least one token.  Target class: ``target_col ==
    target_value``; raw class: everything else."""
    from gencore_ray.ops.relational import grouped_aggregate

    V = np.int64(1 << vocab_bits)

    def feat_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids_arr = df[id_col].to_numpy(dtype=np.int64)
        tgt_arr = (df[target_col] == target_value).to_numpy(dtype=bool)
        gram_lists = []
        for t in df[text_col].tolist():
            toks = _TOKEN_RE.findall((t or "").lower())
            gram_lists.append(
                toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])])
        lens = np.fromiter(map(len, gram_lists), dtype=np.int64,
                           count=len(gram_lists))
        empty = pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "tf": pd.Series(dtype="int64"),
            "tgt": pd.Series(dtype="bool")})
        if not int(lens.sum()):
            return empty
        from itertools import chain

        pos = np.repeat(np.arange(len(df)), lens)
        codes, uniques = pd.factorize(
            pd.Series(list(chain.from_iterable(gram_lists))), sort=False)
        # PYTHON-int bitmask, not `% np.uint64(V)`: mixing a >2^63
        # python int with a numpy uint64 scalar silently routes through
        # float64 on this numpy and corrupts the low bits (measured:
        # md5_low64('the') % np.uint64(65536) -> 2048, true 2363)
        mask = (1 << vocab_bits) - 1
        bk_uniq = np.fromiter(
            (md5_low64(u) & mask for u in uniques),
            dtype=np.int64, count=len(uniques))
        comb = pos * V + bk_uniq[codes]
        uniq, cnt = np.unique(comb, return_counts=True)
        di = (uniq // V).astype(np.int64)
        return pd.DataFrame({
            id_col: ids_arr[di],
            "b": (uniq % V).astype(np.int64),
            "tf": cnt.astype(np.int64),
            "tgt": tgt_arr[di],
        })

    rows = docs.select_columns([id_col, target_col, text_col]).map_batches(
        feat_rows, batch_format="pandas").materialize()

    # class-bucket counts -> broadcast log-ratio array (V float64)
    cls = grouped_aggregate(
        rows.select_columns(["b", "tgt", "tf"]), ["b", "tgt"],
        [("c", "tf", "sum")], num_parts=num_parts).to_pandas()
    ct = np.zeros(int(V), dtype=np.float64)
    cr = np.zeros(int(V), dtype=np.float64)
    if len(cls):
        t_mask = cls["tgt"].to_numpy(dtype=bool)
        bt = cls["b"].to_numpy(np.int64)
        cv = cls["c"].to_numpy(np.float64)
        np.add.at(ct, bt[t_mask], cv[t_mask])
        np.add.at(cr, bt[~t_mask], cv[~t_mask])
    nt = ct.sum() + float(V)
    nr = cr.sum() + float(V)
    lr = np.log((ct + 1.0) / nt) - np.log((cr + 1.0) / nr)
    lr_ref = ray.put(lr)

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(lr_ref)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "x": df["tf"].to_numpy(np.float64)
            * w[df["b"].to_numpy(np.int64)],
        })

    scores = grouped_aggregate(
        rows.map_batches(contrib, batch_format="pandas"),
        [id_col], [("s", "x", "sum")], num_parts=num_parts)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.float64)
        # half-away rounding (DuckDB round()); np.round is banker's
        out = np.where(s >= 0, np.floor(s * 10.0 ** round_to + 0.5),
                       -np.floor(-s * 10.0 ** round_to + 0.5)) \
            / 10.0 ** round_to
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "dsir_logratio": out})

    return scores.map_batches(finish, batch_format="pandas")
