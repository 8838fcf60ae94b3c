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
