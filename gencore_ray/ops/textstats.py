"""Text-analysis operators: metrics, quality, language-ID, fingerprints.

One ``map_batches`` pass per table — tokenisation happens once and
feeds every derived column (the same single-pass discipline as the
signature stage).  SQL-replicable columns (text_len, alnum_count,
token_count) are bit-exact against DuckDB regexes on ASCII corpora;
the heuristic columns (quality, lang_pred, fingerprint) are
engine-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from gencore_ray.functions.hashing import U64
from gencore_ray.functions.text import TextFeatures, detect_lang, doc_fingerprint


class TextStatsStage:
    """Adds text_len, alnum_count, token_count, quality, lang_pred,
    fingerprint columns. Stateless-cheap; runs as plain tasks."""

    def __init__(self, text_col: str = "text", seed: int = 42,
                 with_heuristics: bool = True):
        self.text_col = text_col
        self.seed = seed
        self.with_heuristics = with_heuristics

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        n = len(texts)
        feats = TextFeatures(texts, seed=self.seed,
                             need_hashes=self.with_heuristics)
        batch = (
            batch.append_column("text_len", pa.array(feats.text_len))
            .append_column("alnum_count", pa.array(feats.alnum_count))
            .append_column("token_count", pa.array(feats.token_count))
        )
        if self.with_heuristics:
            batch = (
                batch.append_column("quality", pa.array(feats.quality))
                .append_column(
                    "lang_pred",
                    pa.array([detect_lang(tl) for tl in feats.tok_lists], pa.string()),
                )
                .append_column(
                    "fingerprint",
                    pa.array(np.fromiter(
                        (doc_fingerprint(th) for th in feats.tok_hashes),
                        dtype=U64, count=n)),
                )
            )
        return batch


def text_stats(ds: rd.Dataset, text_col: str = "text", **kw) -> rd.Dataset:
    return ds.map_batches(
        TextStatsStage(text_col=text_col, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _round_half_away(x: np.ndarray, round_to: int) -> np.ndarray:
    p = 10.0 ** round_to
    return np.floor(x * p + 0.5) / p            # DuckDB round(): half-away


def _repetition_signals(texts: list, round_to: int = 6):
    """(n_lines, dup_line_frac, top_bigram_frac, TextFeatures) for one
    batch — the shared vectorised core of repetition_profile and
    corpus_filter. Lines are factorized per (doc, line) pair and
    counted with segment sums; bigram counting runs on uint64 window
    hashes of the token-hash stream (no gram strings)."""
    import pandas as pd

    from gencore_ray.functions.hashing import pow_array, splitmix64
    from gencore_ray.functions.text import _POLY

    powers2 = pow_array(_POLY, 2)
    n = len(texts)
    # --- duplicate-line fraction -----------------------------------
    line_lists = [s.split("\n") for s in texts]
    lens = np.fromiter(map(len, line_lists), dtype=np.int64, count=n)
    doc_of = np.repeat(np.arange(n), lens)
    from itertools import chain

    flat = pd.factorize(
        pd.Index(list(chain.from_iterable(line_lists)))
    )[0]
    # distinct (doc, line) pairs via lexsort + boundary count
    o = np.lexsort((flat, doc_of))
    d1, f1 = doc_of[o], flat[o]
    uniq_mask = np.r_[True, (d1[1:] != d1[:-1]) | (f1[1:] != f1[:-1])]
    n_uniq = np.bincount(d1[uniq_mask], minlength=n)
    dup_frac = _round_half_away((lens - n_uniq) / np.maximum(lens, 1), round_to)

    # --- top-bigram fraction (hash-counted) ------------------------
    feats = TextFeatures(texts)
    tlens = np.fromiter(map(len, feats.tok_hashes), dtype=np.int64, count=n)
    top_frac = np.zeros(n, dtype=np.float64)
    total = int(tlens.sum())
    if total >= 2:
        tflat = np.concatenate(feats.tok_hashes)
        tdoc = np.repeat(np.arange(n), tlens)
        win = np.lib.stride_tricks.sliding_window_view(tflat, 2)
        with np.errstate(over="ignore"):
            wh = splitmix64((win * powers2).sum(axis=1, dtype=U64))
        valid = tdoc[: total - 1] == tdoc[1:]
        wd, wh2 = tdoc[: total - 1][valid], wh[valid]
        if not len(wd):
            # >= 2 tokens overall but none adjacent within one doc
            # (e.g. many 1-token docs): no bigrams anywhere
            return lens, dup_frac, top_frac, feats
        o2 = np.lexsort((wh2, wd))
        d2, h2 = wd[o2], wh2[o2]
        seg = np.r_[True, (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])]
        starts = np.flatnonzero(seg)
        counts = np.diff(np.r_[starts, len(d2)])
        mx = np.zeros(n, dtype=np.int64)
        np.maximum.at(mx, d2[starts], counts)
        tot = np.bincount(wd, minlength=n)
        has = tot > 0
        top_frac[has] = _round_half_away(mx[has] / tot[has], round_to)
    return lens, dup_frac, top_frac, feats


def repetition_profile(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
    round_to: int = 6,
) -> rd.Dataset:
    """Gopher-style repetition quality signals per document
    (Rae et al. 2021, "Scaling Language Models" §A1.1 — the standard
    pre-training repetition filters):

      * n_lines          — newline-delimited line count
      * dup_line_frac    — fraction of lines that repeat an earlier line
      * top_bigram_frac  — occurrences of the most frequent token
                           2-gram over all 2-gram occurrences (0.0 for
                           docs with fewer than 2 tokens)

    All fractions round half-away-from-zero to match the SQL oracle.
    """

    def batch_fn(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t[text_col].to_pylist()]
        lens, dup_frac, top_frac, _ = _repetition_signals(texts, round_to)
        return pa.table({
            id_col: t[id_col],
            "n_lines": pa.array(lens),
            "dup_line_frac": pa.array(dup_frac),
            "top_bigram_frac": pa.array(top_frac),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        batch_fn, batch_format="pyarrow", zero_copy_batch=True
    )


def gopher_signals(
    texts: list,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alnum_ratio: float = 0.5,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    round_to: int = 6,
):
    """Per-batch Gopher-rule core shared by ``corpus_filter`` and the
    fused curation map: returns (reason array, signals dict incl. the
    batch TextFeatures) from ONE tokenisation pass."""
    n = len(texts)
    lens, dup_frac, top_frac, feats = _repetition_signals(texts, round_to)
    mwl = _round_half_away(feats.mean_word_len, round_to)
    alnum = _round_half_away(
        feats.alnum_count / np.maximum(feats.text_len, 1), round_to
    )
    ntok = feats.token_count
    reason = np.full(n, "ok", dtype=object)
    # reverse order so earlier rules overwrite later ones
    for cond, tag in [
        (top_frac > max_top_bigram_frac, "top_bigram"),
        (dup_frac > max_dup_line_frac, "dup_lines"),
        (alnum < min_alnum_ratio, "alnum_ratio"),
        ((mwl < min_mean_word_len) | (mwl > max_mean_word_len),
         "mean_word_len"),
        (ntok > max_tokens, "too_many_tokens"),
        (ntok < min_tokens, "too_few_tokens"),
    ]:
        reason[cond] = tag
    return reason, {
        "n_tokens": ntok, "mean_word_len": mwl, "alnum_ratio": alnum,
        "dup_line_frac": dup_frac, "top_bigram_frac": top_frac,
        "n_lines": lens, "feats": feats,
    }


def corpus_filter(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alnum_ratio: float = 0.5,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    round_to: int = 6,
) -> rd.Dataset:
    """Gopher-rules pre-training filter: every doc gets a keep/drop
    verdict plus the FIRST failing rule as its reason (deterministic
    rule order below), alongside the raw signals. Pure map — no
    shuffle; the corpus-scale consumer filters on ``keep``.

    Rule order: too_few_tokens, too_many_tokens, mean_word_len,
    alnum_ratio, dup_lines, top_bigram; survivors get reason 'ok'.
    (Rae et al. 2021 §A1.1 thresholds, defaults relaxed for short
    synthetic docs; override per corpus.)"""

    def batch_fn(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t[text_col].to_pylist()]
        reason, sig = gopher_signals(
            texts, min_tokens=min_tokens, max_tokens=max_tokens,
            min_mean_word_len=min_mean_word_len,
            max_mean_word_len=max_mean_word_len,
            min_alnum_ratio=min_alnum_ratio,
            max_dup_line_frac=max_dup_line_frac,
            max_top_bigram_frac=max_top_bigram_frac, round_to=round_to,
        )
        keep = reason == "ok"
        ntok, mwl, alnum = sig["n_tokens"], sig["mean_word_len"], sig["alnum_ratio"]
        dup_frac, top_frac = sig["dup_line_frac"], sig["top_bigram_frac"]
        return pa.table({
            id_col: t[id_col],
            "keep": pa.array(keep),
            "reason": pa.array(reason, pa.string()),
            "n_tokens": pa.array(ntok),
            "mean_word_len": pa.array(mwl),
            "alnum_ratio": pa.array(alnum),
            "dup_line_frac": pa.array(dup_frac),
            "top_bigram_frac": pa.array(top_frac),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        batch_fn, batch_format="pyarrow", zero_copy_batch=True
    )


def tfidf_top_terms(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_parts: int = 16,
    round_to: int = 6,
    broadcast_df: bool = True,
) -> rd.Dataset:
    """Per-document top-k terms by TF-IDF — the keyword-extraction /
    topic-profiling primitive of a training-data pipeline.

    score(term, doc) = tf * ln(N / df), rounded half-away-from-zero to
    ``round_to``; ties break on term ascending.  Two passes over the
    corpus, both map-side on the heavy table:

      1. document frequencies: per-batch distinct (doc, term) collapse,
         then one COMPACT exchange of (term, partial_df) rows (one row
         per term per batch, never per occurrence).
      2. per-doc term counts + scoring + per-doc top-k — entirely
         inside ``map_batches`` because every term of a doc lives in
         its batch; no second exchange.

    The DF table is vocabulary-sized.  ``broadcast_df=True`` ships it
    once via ``ray.put`` (right for any vocabulary that fits a worker —
    tens of millions of terms).  ``broadcast_df=False`` instead
    re-keys the per-doc term rows through ``hash_join`` on the term —
    one extra exchange of O(distinct (doc, term)) rows plus a
    ``top_k_per_group`` exchange keyed on the doc, for open-web
    vocabularies beyond single-worker memory.  Both paths are
    bit-identical (equality-tested).
    """
    import pandas as pd

    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.stages.shuffle import grouped_map

    n_docs = ds.count()
    slim = ds.select_columns([id_col, text_col])

    def _tok_frame(df: pd.DataFrame) -> pd.DataFrame:
        """(doc, term, tf) — one row per distinct term per doc."""
        toks = [_TOKEN_RE.findall((t or "").lower())
                for t in df[text_col].tolist()]
        lens = np.fromiter(map(len, toks), dtype=np.int64, count=len(toks))
        ids = np.repeat(df[id_col].to_numpy(), lens)
        if not len(ids):
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "term": pd.Series(dtype=object),
                                 "tf": pd.Series(dtype=np.int64)})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
        return (pd.DataFrame({id_col: ids, "term": flat})
                .groupby([id_col, "term"], sort=False)
                .size().rename("tf").reset_index())

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = _tok_frame(df)
        return (tf.groupby("term", sort=False)
                .size().rename("df").reset_index())

    def df_final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("term", sort=False)["df"]
                .sum().reset_index())

    df_parts = slim.map_batches(df_partial, batch_format="pandas")
    df_table = grouped_map(df_parts, "term", df_final, num_parts=num_parts)

    p = 10.0 ** round_to

    def _score(tf: pd.DataFrame) -> pd.DataFrame:
        v = tf["tf"].to_numpy(dtype=np.float64) * np.log(
            n_docs / tf["df"].to_numpy(dtype=np.float64))
        tf = tf.assign(tfidf=np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p)
        return tf

    def _head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "tfidf", "term"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby(id_col, sort=False).head(k)

    if broadcast_df:
        import ray as _ray

        ref = _ray.put(df_table.to_pandas().set_index("term")["df"])

        def per_batch(df: pd.DataFrame) -> pd.DataFrame:
            tf = _tok_frame(df)
            tf["df"] = tf["term"].map(_ray.get(ref)).astype(np.int64)
            return _head(_score(tf))

        return slim.map_batches(per_batch, batch_format="pandas")

    # shuffle path: (doc, term, tf) rows join the DF table on the term,
    # then one doc-keyed exchange finds each doc's top-k
    from gencore_ray.ops.relational import top_k_per_group
    from gencore_ray.stages.shuffle import hash_join

    tf_rows = slim.map_batches(
        lambda df: _tok_frame(df), batch_format="pandas")
    joined = hash_join(tf_rows, df_table, "term", "term",
                       num_parts=num_parts, how="inner")
    scored = joined.map_batches(_score, batch_format="pandas")
    out = top_k_per_group(scored, [id_col], ["tfidf", "term"], k,
                          descending=[True, False], num_parts=num_parts)
    return out.select_columns([id_col, "term", "tf", "df", "tfidf"])


def token_entropy(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> rd.Dataset:
    """Per-doc Shannon entropy of the unigram distribution (nats) plus
    the type/token ratio — the information-density quality signals
    (low entropy = repetitive/templated text, the same family as the
    Gopher repetition rules but distribution-based).

    Pure map, no exchange.  Per batch the (row, token) pairs are
    factorized ONCE and folded with a single bincount over combined
    codes — no per-doc Python beyond the token split.  Empty docs get
    entropy 0 by contract.
    """
    import pandas as pd

    from gencore_ray.functions.text import _TOKEN_RE

    def batch_fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        rows, toks = [], []
        for r, t in enumerate(df[text_col].tolist()):
            ts = _TOKEN_RE.findall((t or "").lower())
            rows.extend([r] * len(ts))
            toks.extend(ts)
        n = len(df)
        ent = np.zeros(n, dtype=np.float64)
        ttr = np.zeros(n, dtype=np.float64)
        n_tok = np.zeros(n, dtype=np.int64)
        if toks:
            # sparse fold: unique (row, token) pairs with counts — never a
            # dense docs x vocab matrix (which is O(batch * batch-vocab))
            rcodes = np.asarray(rows, dtype=np.int64)
            tcodes, _ = pd.factorize(pd.Series(toks), sort=False)
            n_types = int(tcodes.max()) + 1
            comb = rcodes * np.int64(n_types) + tcodes
            uniq, cnt = np.unique(comb, return_counts=True)
            urows = uniq // n_types
            tot = np.bincount(rcodes, minlength=n).astype(np.float64)
            n_tok = tot.astype(np.int64)
            p = cnt / tot[urows]
            ent = -np.bincount(urows, weights=p * np.log(p), minlength=n)
            ttr = np.where(tot > 0,
                           np.bincount(urows, minlength=n) / np.maximum(tot, 1),
                           0.0)
            ent[tot == 0] = 0.0
        p10 = 10.0 ** round_to
        out = pd.DataFrame({
            id_col: ids,
            "n_tokens": n_tok,
            "entropy": np.sign(ent) * np.floor(np.abs(ent) * p10 + 0.5) / p10,
            "type_token_ratio": np.floor(ttr * p10 + 0.5) / p10,
        })
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        batch_fn, batch_format="pandas")


def compression_ratio(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    round_to: int = 6,
) -> rd.Dataset:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    cheapest repetition detector there is (RefinedWeb-style filtering:
    boilerplate and template spam compress far below natural text).
    Pure map, C-speed zlib per doc; empty docs get ratio 1.0 by
    contract.  Engine-only signal (no SQL zlib), pinned by pytest
    against direct zlib calls."""
    import zlib

    def batch_fn(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        ids = df[id_col].to_numpy()
        ratios = np.ones(len(df), dtype=np.float64)
        raw_lens = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df[text_col].tolist()):
            b = (t or "").encode()
            raw_lens[i] = len(b)
            if b:
                ratios[i] = len(zlib.compress(b, level)) / len(b)
        p = 10.0 ** round_to
        return _pd.DataFrame({
            id_col: ids,
            "raw_bytes": raw_lens,
            "zlib_ratio": np.floor(ratios * p + 0.5) / p,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        batch_fn, batch_format="pandas")
