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
from gencore_ray.functions.text import (
    detect_lang,
    doc_fingerprint,
    quality_score,
    token_hashes_for_batch,
    tokenize,
)


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
        text_len = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        alnum = np.fromiter(
            (sum(c.isalnum() for c in t) for t in texts), dtype=np.int64, count=n
        )
        tok_lists = [tokenize(t) for t in texts]
        token_count = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        batch = (
            batch.append_column("text_len", pa.array(text_len))
            .append_column("alnum_count", pa.array(alnum))
            .append_column("token_count", pa.array(token_count))
        )
        if self.with_heuristics:
            toks = token_hashes_for_batch(texts, seed=self.seed)
            batch = (
                batch.append_column(
                    "quality",
                    pa.array(np.fromiter((quality_score(t) for t in texts),
                                         dtype=np.float64, count=n)),
                )
                .append_column(
                    "lang_pred", pa.array([detect_lang(tl) for tl in tok_lists], pa.string())
                )
                .append_column(
                    "fingerprint",
                    pa.array(np.fromiter((doc_fingerprint(th) for th in toks),
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
