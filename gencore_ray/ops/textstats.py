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

    One vectorised pass per batch: lines are factorized per (doc, line)
    pair and counted with segment sums; bigram counting runs on uint64
    window hashes of the token-hash stream (no gram strings).  All
    fractions round half-away-from-zero to match the SQL oracle.
    """
    from gencore_ray.functions.hashing import pow_array, splitmix64
    from gencore_ray.functions.text import _POLY

    powers2 = pow_array(_POLY, 2)

    def _round(x: np.ndarray) -> np.ndarray:
        p = 10.0 ** round_to
        return np.floor(x * p + 0.5) / p        # DuckDB round(): half-away

    def batch_fn(t: pa.Table) -> pa.Table:
        import pandas as pd

        texts = [x or "" for x in t[text_col].to_pylist()]
        n = len(texts)
        # --- duplicate-line fraction -------------------------------
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
        dup_frac = _round((lens - n_uniq) / np.maximum(lens, 1))

        # --- top-bigram fraction (hash-counted) --------------------
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
            o2 = np.lexsort((wh2, wd))
            d2, h2 = wd[o2], wh2[o2]
            seg = np.r_[True, (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])]
            starts = np.flatnonzero(seg)
            counts = np.diff(np.r_[starts, len(d2)])
            mx = np.zeros(n, dtype=np.int64)
            np.maximum.at(mx, d2[starts], counts)
            tot = np.bincount(wd, minlength=n)
            has = tot > 0
            top_frac[has] = _round(mx[has] / tot[has])

        return pa.table({
            id_col: t[id_col],
            "n_lines": pa.array(lens),
            "dup_line_frac": pa.array(dup_frac),
            "top_bigram_frac": pa.array(top_frac),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        batch_fn, batch_format="pyarrow", zero_copy_batch=True
    )
