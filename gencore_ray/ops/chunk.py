"""Fixed-size token chunking with overlap — training/RAG sequence prep.

Splits each document's token stream into windows of ``chunk_tokens``
tokens advancing by ``chunk_tokens - overlap`` (so consecutive chunks
share ``overlap`` tokens of context — the standard long-document
training and retrieval-indexing layout).  The sibling op
``ops/packing.pack_sequences`` solves the opposite problem (concat
many SHORT docs into fixed windows); this one splits LONG docs.

Deterministic and SQL-replayable end to end: tokens are the corpus
token class ``[a-z0-9_]+`` over the lowercased text (the same class
every other text op and every oracle uses), chunk text is the tokens
joined by single spaces, and chunk starts are ``0, step, 2*step, ...``
while ``start < n_tokens`` — DuckDB replays the exact layout with
``regexp_extract_all`` + ``generate_series`` + list slicing.

A pure flat-map: no exchange, no state; chunk rows inherit the input
partitioning (a doc's chunks stay in its block).  Per-batch work is
one compiled-regex pass per doc plus O(n_chunks) slicing.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def chunk_batch(
    ids: list,
    texts: list,
    chunk_tokens: int,
    overlap: int,
) -> dict[str, list]:
    """Pure kernel: one batch of (id, text) -> exploded chunk columns."""
    step = chunk_tokens - overlap
    out_id: list = []
    out_no: list[int] = []
    out_n: list[int] = []
    out_text: list[str] = []
    for did, text in zip(ids, texts):
        toks = _TOKEN_RE.findall((text or "").lower())
        n = len(toks)
        for no, start in enumerate(range(0, n, step)):
            seg = toks[start : start + chunk_tokens]
            out_id.append(did)
            out_no.append(no)
            out_n.append(len(seg))
            out_text.append(" ".join(seg))
    return {
        "doc_id": out_id,
        "chunk_no": out_no,
        "n_tokens": out_n,
        "chunk_text": out_text,
    }


def chunk_documents(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> rd.Dataset:
    """(id, text) -> (doc_id, chunk_no, n_tokens, chunk_text) rows.

    ``0 <= overlap < chunk_tokens`` (the step must advance).  Docs with
    zero tokens emit no chunks; the final chunk may be shorter than
    ``chunk_tokens`` (its true length is in ``n_tokens``).
    """
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / {chunk_tokens}"
        )

    def fn(t: pa.Table) -> pa.Table:
        cols = chunk_batch(
            t[id_col].to_pylist(),
            t[text_col].to_pylist(),
            chunk_tokens,
            overlap,
        )
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"], t.schema.field(id_col).type),
                "chunk_no": pa.array(cols["chunk_no"], pa.int64()),
                "n_tokens": pa.array(cols["n_tokens"], pa.int64()),
                "chunk_text": pa.array(cols["chunk_text"], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
