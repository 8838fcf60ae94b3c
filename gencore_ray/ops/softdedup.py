"""SoftDedup-style data-commonness reweighting: score every document
by how FREQUENT its n-grams are across the corpus, instead of hard
removal (He et al., "SoftDedup: an Efficient Data Reweighting Method
for Speeding Up Language Model Pre-training", ACL 2024).

Hard dedup (exact / MinHash) drops whole documents at a threshold; a
reweighting pipeline instead keeps everything and down-samples the
common mass.  The per-doc signal is *data commonness*: the geometric
mean of the corpus-wide document frequency of the doc's n-grams,

    commonness(d) = mean over distinct grams g of d of
                      ln( df(g) / N )          (always <= 0)

where df(g) = number of distinct docs containing g and N = number of
docs with at least one gram.  exp(commonness) is the geometric-mean
df fraction: 1.0 for a doc made entirely of corpus-universal
boilerplate, ~1/N for fully novel text.  A sampler takes weight
proportional to exp(-alpha * commonness) or thresholds on it.

Grams are hashed word 3-grams over 2^b buckets (md5 low-64 masked),
so the vocabulary side is bounded: the (bucket -> df) table is at most
V = 2^b rows regardless of corpus size, and folds into one broadcast
int64 array (2 MB at b=18) — the ops/dsir.py / ops/lm.py
vocabulary-bounded-broadcast shape.  Bucket hashing replays verbatim
in DuckDB as ``md5_number_lower(g) % V``.

Dataflow (three passes, nothing row-wise on the driver):

  1. one tokenise pass emits DISTINCT (doc, bucket) rows — md5 runs
     once per distinct gram per batch (factorize fold), within-doc
     dedup via one np.unique on doc*V+bucket;
  2. one bucket-keyed aggregate -> df table (<= V rows) -> broadcast
     float64 ln(df) array;
  3. one map over the (doc, bucket) rows + one doc-keyed aggregate
     -> per-doc (n_grams, sum ln df); a final map subtracts ln(N).

Reference analogue: gencore's duplication-level statistics
(/root/reference/src/stats.h:15, duplevel histogram) — the engine
reports HOW duplicated each record is rather than only which records
to drop; here that per-record duplication level becomes the training
weight.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from gencore_ray.functions.embed import md5_low64
from gencore_ray.functions.text import _TOKEN_RE


def commonness_scores(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    vocab_bits: int = 18,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """(id, text) -> (id, n_grams, commonness) for every doc with at
    least one word ``ngram``-gram (docs shorter than ``ngram`` tokens
    are excluded, matching the SQL twin's empty-unnest behavior).

    ``commonness`` is mean ln(df/N) over the doc's DISTINCT hashed
    grams, rounded half-away to ``round_to``; ``n_grams`` counts the
    distinct hashed grams (collisions merge, in engine and SQL alike).
    """
    from gencore_ray.ops.relational import grouped_aggregate

    V = np.int64(1 << vocab_bits)
    mask = (1 << vocab_bits) - 1  # PYTHON int: see ops/dsir.py bit-trap note

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids_arr = df[id_col].to_numpy(dtype=np.int64)
        gram_lists = []
        for t in df[text_col].tolist():
            toks = _TOKEN_RE.findall((t or "").lower())
            gram_lists.append(
                [" ".join(toks[i:i + ngram])
                 for i in range(len(toks) - ngram + 1)])
        lens = np.fromiter(map(len, gram_lists), dtype=np.int64,
                           count=len(gram_lists))
        if not int(lens.sum()):
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64")})
        from itertools import chain

        pos = np.repeat(np.arange(len(df)), lens)
        codes, uniques = pd.factorize(
            pd.Series(list(chain.from_iterable(gram_lists))), sort=False)
        bk_uniq = np.fromiter(
            (md5_low64(u) & mask for u in uniques),
            dtype=np.int64, count=len(uniques))
        comb = np.unique(pos * V + bk_uniq[codes])  # within-doc distinct
        di = (comb // V).astype(np.int64)
        return pd.DataFrame({
            id_col: ids_arr[di],
            "b": (comb % V).astype(np.int64),
        })

    rows = docs.select_columns([id_col, text_col]).map_batches(
        gram_rows, batch_format="pandas").materialize()

    # bucket -> df (distinct-doc count; rows are already distinct per doc)
    dft = grouped_aggregate(
        rows, ["b"], [("df", None, "count")], num_parts=num_parts
    ).to_pandas()
    ln_df = np.zeros(int(V), dtype=np.float64)
    if len(dft):
        ln_df[dft["b"].to_numpy(np.int64)] = np.log(
            dft["df"].to_numpy(np.float64))
    ln_ref = ray.put(ln_df)

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ln_ref)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "x": w[df["b"].to_numpy(np.int64)],
        })

    per_doc = grouped_aggregate(
        rows.map_batches(contrib, batch_format="pandas"),
        [id_col], [("n_grams", None, "count"), ("s", "x", "sum")],
        num_parts=num_parts,
    ).materialize()
    n_docs = per_doc.count()  # N: docs with >= 1 gram (aggregate row count)
    ln_n = float(np.log(n_docs)) if n_docs else 0.0

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["s"].to_numpy(np.float64)
             / df["n_grams"].to_numpy(np.float64)) - ln_n
        out = np.where(s >= 0, np.floor(s * 10.0 ** round_to + 0.5),
                       -np.floor(-s * 10.0 ** round_to + 0.5)) \
            / 10.0 ** round_to  # half-away rounding (DuckDB round())
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_grams": df["n_grams"].to_numpy(np.int64),
            "commonness": out,
        })

    return per_doc.map_batches(finish, batch_format="pandas")
