"""BM25 keyword retrieval over the corpus.

The search-side complement to the dedup suite: score every document
against a small bag of query terms with Okapi BM25 (Lucene's
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant, which is always
positive) and return the global top-k.

Dataflow (two passes over a slim numeric table, no shuffle):

1. one tokenizing map produces a per-doc stats table
   ``(id, dl, tf_0..tf_{Q-1})`` — Q is the query-term count, so the
   table is O(N·Q) numbers regardless of text size; it is materialized
   once and feeds both consumers;
2. a reduced aggregate (per-batch partials -> driver fold of a few
   rows) yields N, avgdl and per-term document frequencies — the
   broadcast "index" is Q+2 floats, the extreme small-side case of the
   reference's in-memory side table (/root/reference/src/reference.cpp:4-11);
3. a pure scoring map + the existing top-k (per-batch prune, then a
   k-row global sort) emit the result.

At 100 TB the text is read exactly once (step 1); everything after is
arithmetic over O(N·Q) numbers.  Scores are rounded before ranking so
the DuckDB twin (same formula in SQL) ranks identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.functions.text import tokenize


def _doc_term_stats(
    docs: rd.Dataset, id_col: str, text_col: str, terms: list[str]
) -> rd.Dataset:
    """Slim per-doc table: (id, dl, tf_<j> for each query term)."""
    term_ix = {t: j for j, t in enumerate(terms)}
    q = len(terms)

    def stats(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n = len(texts)
        dl = np.zeros(n, dtype=np.int64)
        tf = np.zeros((n, q), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = tokenize(txt or "")
            dl[i] = len(toks)
            for tok in toks:
                j = term_ix.get(tok)
                if j is not None:
                    tf[i, j] += 1
        cols = {id_col: t[id_col], "dl": pa.array(dl)}
        for j in range(q):
            cols[f"tf_{j}"] = pa.array(tf[:, j])
        return pa.table(cols)

    return docs.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def bm25_topk(
    docs: rd.Dataset,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> rd.Dataset:
    """Global top-k docs by BM25 score for ``terms``.

    Output: (id_col, score) — docs matching no term never appear;
    ties on the rounded score break by ascending id.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("query terms must be distinct")
    from gencore_ray.ops.relational import topk

    q = len(terms)
    tf_cols = [f"tf_{j}" for j in range(q)]
    stats = _doc_term_stats(docs, id_col, text_col, terms).materialize()

    # reduced aggregate: one partial row per batch, driver folds them
    def partial(t: pa.Table) -> pa.Table:
        row = {"n": [t.num_rows], "sum_dl": [pa.compute.sum(t["dl"]).as_py() or 0]}
        for c in tf_cols:
            row["df_" + c] = [
                pa.compute.sum(
                    pa.compute.cast(
                        pa.compute.greater(t[c], 0), pa.int64()
                    )
                ).as_py()
                or 0
            ]
        return pa.table(row)

    parts = stats.map_batches(partial, batch_format="pyarrow").to_pandas()
    # an empty corpus yields ZERO partial rows (not a zero-valued one),
    # so guard on the frame shape before summing
    n_docs = int(parts["n"].sum()) if len(parts) else 0
    if n_docs == 0:
        schema = docs.schema()          # None when every row was filtered
        id_type = (
            schema.base_schema.field(id_col).type if schema is not None
            else pa.int64()
        )
        return rd.from_arrow(
            pa.table(
                {id_col: pa.array([], id_type), "score": pa.array([], pa.float64())}
            )
        )
    avgdl = float(parts["sum_dl"].sum()) / n_docs
    df = parts[["df_" + c for c in tf_cols]].sum().to_numpy(dtype=np.float64)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        tf = np.stack(
            [t[c].to_numpy(zero_copy_only=False) for c in tf_cols], axis=1
        ).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        with np.errstate(invalid="ignore"):
            s = (idf[None, :] * tf * (k1 + 1.0) / denom).sum(axis=1)
        hit = tf.sum(axis=1) > 0
        p = 10.0**round_to
        s = np.floor(np.abs(s) * p + 0.5) / p  # scores are >= 0
        return pa.table(
            {id_col: pa.array(np.asarray(t[id_col])[hit]),
             "score": pa.array(s[hit])}
        )

    scored = stats.map_batches(score, batch_format="pyarrow")
    return topk(scored, ["score", id_col], k, descending=[True, False])
