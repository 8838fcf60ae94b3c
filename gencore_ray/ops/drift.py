"""Corpus drift monitoring: token-distribution divergence between slices.

A production training-data pipeline watches whether today's crawl
slice is distributed like yesterday's (vocabulary drift breaks
dedup thresholds, LM perplexity gates and mixture weights).  This op
compares the unigram distributions of corpus slices (by source, day,
language...) with pairwise Jensen-Shannon divergence.

Shape: ONE (group, token-hash)-keyed count exchange (the lm.py
vocabulary-exchange pattern) + one token-keyed fold for the global
top-V restriction; the final G x V probability matrix is
vocabulary-bounded (never corpus-bounded) and folds on the driver —
same O(V) driver-state argument as the broadcast LM.  All numbers
(add-1 smoothed probabilities, ln ratios) are SQL-replayable via
md5 token hashes; output rounded to 6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gencore_ray.functions.embed import md5_low64


def token_js_divergence(
    docs: rd.Dataset,
    group_col: str = "source",
    text_col: str = "text",
    top_vocab: int = 2000,
    round_to: int = 6,
    num_parts: int = 16,
) -> rd.Dataset:
    """Pairwise JS divergence between the add-1-smoothed unigram
    distributions of every two groups, over the global top-``top_vocab``
    tokens (count desc, hash asc — deterministic cut).

    Output: (group_a, group_b, js_divergence) for group_a < group_b.
    JS = 0.5 KL(P||M) + 0.5 KL(Q||M), M = (P+Q)/2 — symmetric,
    bounded by ln 2, and defined everywhere thanks to the smoothing.
    """
    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.relational import grouped_aggregate, topk

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        # batch-wide factorize + sparse unique fold; md5 once per
        # DISTINCT token per batch (same kernel shape as
        # ops/sparse.py::term_rows)
        tok_lists = [_TOKEN_RE.findall((t or "").lower())
                     for t in df[text_col].tolist()]
        lens = np.fromiter(map(len, tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        empty = pd.DataFrame({
            group_col: pd.Series(dtype=object),
            "th": pd.Series(dtype="int64"),
            "cnt": pd.Series(dtype="int64")})
        if not int(lens.sum()):
            return empty
        from itertools import chain
        gcodes, guniq = pd.factorize(df[group_col], sort=False)
        gpos = np.repeat(gcodes.astype(np.int64), lens)
        tcodes, uniques = pd.factorize(
            pd.Series(list(chain.from_iterable(tok_lists))), sort=False)
        n_uniq = len(uniques)
        th_uniq = np.fromiter((md5_low64(u) for u in uniques),
                              dtype=np.uint64, count=n_uniq).view(np.int64)
        comb = gpos * np.int64(n_uniq) + tcodes
        uniq, cnt = np.unique(comb, return_counts=True)
        return pd.DataFrame({
            group_col: guniq.take(uniq // n_uniq),
            "th": th_uniq[uniq % n_uniq],
            "cnt": cnt.astype(np.int64),
        })

    gc = grouped_aggregate(
        docs.select_columns([group_col, text_col]).map_batches(
            counts, batch_format="pandas"),
        [group_col, "th"], [("cnt", "cnt", "sum")], num_parts=num_parts,
    ).materialize()

    tot = grouped_aggregate(gc.select_columns(["th", "cnt"]), ["th"],
                            [("tc", "cnt", "sum")], num_parts=num_parts)
    vocab = topk(tot, ["tc", "th"], int(top_vocab),
                 descending=[True, False]).to_pandas()
    vset = set(vocab["th"].tolist())
    V = len(vset)

    # G x V — vocabulary-bounded driver fold (the broadcast-LM shape)
    mat = gc.to_pandas()
    mat = mat[mat["th"].isin(vset)]
    groups = sorted(mat[group_col].unique().tolist())
    th_sorted = sorted(vset)
    th_pos = {h: i for i, h in enumerate(th_sorted)}
    P = np.zeros((len(groups), V), dtype=np.float64)
    gi = {g: i for i, g in enumerate(groups)}
    P[mat[group_col].map(gi).to_numpy(),
      mat["th"].map(th_pos).to_numpy()] = mat["cnt"].to_numpy(dtype=np.float64)
    gn = P.sum(axis=1)
    Pr = (P + 1.0) / (gn[:, None] + V)

    rows_a, rows_b, js = [], [], []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            pa, pb = Pr[i], Pr[j]
            m = 0.5 * (pa + pb)
            d = 0.5 * np.sum(pa * np.log(pa / m)) \
                + 0.5 * np.sum(pb * np.log(pb / m))
            rows_a.append(groups[i])
            rows_b.append(groups[j])
            js.append(round(float(d), round_to))
    return rd.from_pandas(pd.DataFrame({
        "group_a": rows_a, "group_b": rows_b,
        "js_divergence": np.asarray(js, dtype=np.float64),
    }))
