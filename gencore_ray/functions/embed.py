"""Text -> embedding as a STATEFUL actor-pool stage (ST1).

The reference loads its reference-genome singleton once per process
(/root/reference/src/reference.cpp:4-11, loaded at
/root/reference/src/main.cpp:94-98) and every worker reuses it; the
Ray analogue is a callable CLASS passed to ``map_batches(Cls,
concurrency=N)`` — model setup in ``__init__`` (once per actor),
batched inference in ``__call__``.  A real deployment drops a
sentence-transformer into ``__init__``; this repo (no model weights,
no network) ships a deterministic stand-in with the same pipeline
shape AND an exact SQL twin, so the whole chain text -> embed ->
k-means -> within-cluster verify is oracle-checkable end-to-end:

**Hashing-trick signed bag-of-words** (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning"): for each token
``t``, ``h = md5_low64(t)`` (the low 8 digest bytes, little-endian —
DuckDB's ``md5_number_lower``), bucket ``h % dim``, sign +1/-1 from
bit 6 (``(h // dim) % 2`` at dim=64); the embedding is the per-bucket
signed count.  Integer-exact in any engine — the SQL oracle replays
it verbatim — and cosine between such vectors approximates token-
multiset similarity, which is exactly what a semantic near-dup pass
wants from a cheap model.
"""

from __future__ import annotations

import hashlib
from itertools import chain

import numpy as np
import pandas as pd
import ray.data as rd


def md5_low64(token: str) -> int:
    """Low 8 digest bytes of md5, little-endian — equals DuckDB's
    ``md5_number_lower(token)``, making every hash SQL-replayable."""
    return int.from_bytes(hashlib.md5(token.encode()).digest()[8:], "little")


class HashingEmbedder:
    """Callable batch stage: (id, text) -> (id, embedding list<i64>).

    ``__init__`` is the once-per-actor model load (here: tokenizer
    compile + config; a real model's weights would load here);
    ``__call__`` embeds one batch, hashing each DISTINCT token of the
    batch exactly once (md5 is the per-token cost; factorize makes it
    vocabulary-bounded, not token-bounded).
    """

    def __init__(self, dim: int = 64, id_col: str = "doc_id",
                 text_col: str = "text"):
        from gencore_ray.functions.text import _TOKEN_RE

        if dim <= 0 or dim & (dim - 1):
            raise ValueError("dim must be a positive power of two")
        self.dim = int(dim)
        self.id_col = id_col
        self.text_col = text_col
        self._token_re = _TOKEN_RE          # compiled once per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        dim = self.dim
        texts = df[self.text_col].fillna("").tolist()
        tok_lists = [self._token_re.findall(t.lower()) for t in texts]
        lens = np.fromiter(map(len, tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        emb = np.zeros((len(texts), dim), dtype=np.int64)
        if lens.sum():
            flat = list(chain.from_iterable(tok_lists))
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            h_uniq = np.fromiter((md5_low64(u) for u in uniq),
                                 dtype=np.uint64, count=len(uniq))
            h = h_uniq[codes]
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h // np.uint64(dim)) & np.uint64(1) == 0, 1, -1)
            row = np.repeat(np.arange(len(texts)), lens)
            np.add.at(emb, (row, bucket), sign)
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "embedding": list(emb),
        })


def embed_texts(
    ds: rd.Dataset,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple | None = None,
    batch_size: int = 512,
) -> rd.Dataset:
    """(id, embedding): the actor-pool embed stage.  ``concurrency``
    sizes the pool (None lets Ray autoscale a task pool — fine for the
    hash model; a weights-loading model wants an explicit pool so the
    load amortises)."""
    kwargs = dict(batch_format="pandas", batch_size=batch_size,
                  fn_constructor_kwargs=dict(dim=dim, id_col=id_col,
                                             text_col=text_col))
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.select_columns([id_col, text_col]).map_batches(
        HashingEmbedder, **kwargs)
