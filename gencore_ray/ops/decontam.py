"""Benchmark decontamination (training-data hygiene).

Before training, any document that shares verbatim n-grams with an
evaluation/benchmark set must be flagged or dropped — otherwise eval
scores measure memorisation. The standard check (GPT-3 appendix C,
Llama 2 §A.6) is k-gram overlap: a doc is contaminated if any of its
distinct k-gram shingles appears in the benchmark set.

Shape: the benchmark side is SMALL (eval sets are thousands of docs),
the corpus side is the full 100-TB table — so this is a textbook
broadcast membership test, not a join:

1. one distributed pass collects the benchmark's distinct shingle
   hashes (per-batch ``np.unique``, driver-side union — the result is
   a few MB even for large eval suites);
2. the sorted hash array is ``ray.put`` ONCE and every corpus batch
   runs a vectorised ``np.searchsorted`` membership test against it —
   no shuffle, no per-row Python.

Shingles reuse the engine's single tokenisation + polynomial hashing
(functions/text.py::shingle_hashes), so the overlap counts match the
SQL oracle's distinct-gram join exactly (modulo 2^-64 hash collisions).

gencore analogue: the reference consults its broadcast reference
genome to veto consensus bases (/root/reference/src/group.cpp:430-501)
— a read-only side structure checked per record, never shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from gencore_ray.functions.hashing import U64
from gencore_ray.functions.text import TextFeatures, shingle_hashes


def _batch_shingles(texts, k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated per-doc distinct shingle hashes + int64 offsets."""
    tf = TextFeatures(texts, seed=seed)
    per_doc = [shingle_hashes(h, k) for h in tf.tok_hashes]
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(a) for a in per_doc], out=offs[1:])
    flat = (
        np.concatenate(per_doc) if offs[-1] else np.empty(0, dtype=U64)
    )
    return flat, offs


def benchmark_shingle_set(
    bench: rd.Dataset, text_col: str = "text", k: int = 5, seed: int = 42
) -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark set."""
    def _u(t: pa.Table) -> pa.Table:
        flat, _ = _batch_shingles(t[text_col].to_pylist(), k, seed)
        return pa.table({"h": pa.array(np.unique(flat))})

    parts = bench.select_columns([text_col]).map_batches(
        _u, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()["h"]
    if not len(parts):
        return np.empty(0, dtype=U64)
    return np.unique(parts.to_numpy().astype(U64))


def contamination_check(
    docs: rd.Dataset,
    bench: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    seed: int = 42,
    flagged_only: bool = True,
) -> rd.Dataset:
    """(id, n_shingles, n_shared) per corpus doc vs the benchmark set.

    ``flagged_only`` keeps only contaminated rows (n_shared >= 1) —
    the corpus-scale output should be the small flag list, not an
    annotated copy of the corpus.
    """
    bench_ref = ray.put(benchmark_shingle_set(bench, text_col, k, seed))

    def _check(t: pa.Table) -> pa.Table:
        bh = ray.get(bench_ref)
        flat, offs = _batch_shingles(t[text_col].to_pylist(), k, seed)
        if len(bh) and len(flat):
            idx = np.searchsorted(bh, flat)
            idx_c = np.minimum(idx, len(bh) - 1)
            hit = (bh[idx_c] == flat).astype(np.int64)
        else:
            hit = np.zeros(len(flat), dtype=np.int64)
        csum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(hit, out=csum[1:])
        n_shared = csum[offs[1:]] - csum[offs[:-1]]
        out = pa.table({
            id_col: t[id_col],
            "n_shingles": pa.array(np.diff(offs)),
            "n_shared": pa.array(n_shared),
        })
        if flagged_only:
            out = out.take(pa.array(np.flatnonzero(n_shared > 0)))
        return out

    return docs.select_columns([id_col, text_col]).map_batches(
        _check, batch_format="pyarrow", zero_copy_batch=True
    )
