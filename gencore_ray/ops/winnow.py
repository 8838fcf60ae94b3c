"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm) as a Ray-Data op.

Per document: k-token grams are hashed, then a length-``w`` window
slides over the gram-hash sequence and each window selects its MINIMUM
hash (ties -> the RIGHTMOST minimal position, the paper's rule).  The
distinct selected hashes are the document's fingerprint set, with the
guarantee that any shared token run of length >= k + w - 1 yields at
least one shared fingerprint — position-aware dedup evidence at a
~1/w sample rate of the gram stream, far slimmer than the full window
explode in ops/substrings.py.

Hash choice: ``md5_low64`` of the chr(31)-joined gram STRING (the
same SQL-replayable hash the embed stage proved equal to DuckDB's
``md5_number_lower``), so the entire selection — including tie-breaks,
encoded as ``HUGEINT h * 2^32 - p`` — replays verbatim in the oracle.
A production deployment would swap in the polynomial rolling hash the
span ops use (functions/text.py::_POLY windows, O(1) per gram and
vocabulary-free); the dataflow is identical, only the per-gram kernel
changes.

Dataflow (both ops): one tokenize+hash+winnow map over the corpus
(doc-local, no exchange), then for the pair op a slim
``(fp: u64, doc_id)`` exchange — fingerprint rows are ~1/w of the
gram count — and a tiny pair-count exchange.  The reference analogue
of selecting a canonical witness per window is the per-bucket
dominant-UMI selection (/root/reference/src/cluster.cpp:41-53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_SEP = "\x1f"


def _winnow_batch(
    texts: list, ids: np.ndarray, k: int, w: int, id_col: str
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(per-doc stats frame, fingerprint rows frame) for one batch.

    Gram hashing is factorised batch-wide (each distinct gram string
    is md5-hashed once); winnowing itself is one vectorised
    sliding-window argmin over the flattened hash stream with
    cross-doc windows masked out."""
    from gencore_ray.functions.embed import md5_low64
    from gencore_ray.functions.text import _TOKEN_RE

    tok_lists = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
    gram_lists: list[list[str]] = [
        [_SEP.join(toks[p:p + k]) for p in range(len(toks) - k + 1)]
        for toks in tok_lists
    ]
    glens = np.fromiter(map(len, gram_lists), dtype=np.int64,
                        count=len(gram_lists))
    n_windows = np.maximum(glens - w + 1, 0)
    stats = pd.DataFrame({
        id_col: ids,
        "n_windows": n_windows,
        "n_fingerprints": np.zeros(len(ids), dtype=np.int64),
    })
    fp_empty = pd.DataFrame({
        "fp": pd.Series(dtype=np.uint64),
        id_col: pd.Series(dtype=ids.dtype),
    })
    total = int(glens.sum())
    if total < w:
        return stats, fp_empty

    flat_grams = [g for gl in gram_lists for g in gl]
    codes, uniq = pd.factorize(np.asarray(flat_grams, dtype=object))
    h_uniq = np.fromiter((md5_low64(u) for u in uniq),
                         dtype=np.uint64, count=len(uniq))
    h = h_uniq[codes]
    gdoc = np.repeat(np.arange(len(glens)), glens)
    offs = np.repeat(np.cumsum(glens) - glens, glens)

    # window start i is valid iff it does not cross a doc boundary
    wv = np.lib.stride_tricks.sliding_window_view(h, w)
    valid = gdoc[: total - w + 1] == gdoc[w - 1:]
    if not valid.any():
        return stats, fp_empty
    starts = np.flatnonzero(valid)
    # min hash, tie -> rightmost: argmin over the REVERSED window
    # returns the first (= rightmost in the original) minimal slot
    rel = (w - 1) - np.argmin(wv[starts, ::-1], axis=1)
    sel = starts + rel                       # flat gram index selected
    # distinct selected positions per doc -> fingerprint count;
    # distinct selected hashes per doc -> matching rows
    sel = np.unique(sel)                     # consecutive windows reuse picks
    sdoc = gdoc[sel]
    stats_fp = np.bincount(sdoc, minlength=len(glens))
    stats["n_fingerprints"] = stats_fp.astype(np.int64)

    o = np.lexsort((h[sel], sdoc))
    d1, h1 = sdoc[o], h[sel][o]
    first = np.r_[True, (d1[1:] != d1[:-1]) | (h1[1:] != h1[:-1])]
    fp_rows = pd.DataFrame({"fp": h1[first], id_col: ids[d1[first]]})
    return stats, fp_rows


def winnow_fingerprints(
    ds: rd.Dataset,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(id, n_windows, n_fingerprints) per document — the winnowing
    density profile (n_fingerprints ~ n_windows * 2/(w+1) on random
    text, the paper's expected density).  Docs with fewer than
    k + w - 1 tokens have no window and 0 fingerprints (the
    short-record bypass discipline, M4)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        stats, _ = _winnow_batch(
            df[text_col].tolist(), df[id_col].to_numpy(), k, w, id_col)
        return stats

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")


def winnow_dup_pairs(
    ds: rd.Dataset,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 16,
    max_docs_per_fp: int | None = None,
) -> rd.Dataset:
    """(doc_a, doc_b, shared_fps) for every document pair sharing at
    least ``min_shared`` winnowing fingerprints (doc_a < doc_b).

    Exchanges: fingerprint rows (12-16 B each, ~1/w of the gram count)
    keyed by fp, then the pair-count rows keyed by (doc_a, doc_b) —
    the text never rides a shuffle.  ``max_docs_per_fp=None`` is
    EXACT (the SQL twin's semantics); setting it caps pair generation
    for a boilerplate fingerprint shared by a huge doc set, the same
    bounded-quadratic discipline as the LSH bucket cap
    (stages/lsh.py) — capped groups keep their ``min(doc_id)``-first
    slice so the selection is deterministic."""
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import grouped_map

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        _, fp_rows = _winnow_batch(
            df[text_col].tolist(), df[id_col].to_numpy(), k, w, id_col)
        return fp_rows

    fps = ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in df.groupby("fp", sort=False):
            d = np.unique(grp[id_col].to_numpy())
            if max_docs_per_fp is not None and len(d) > max_docs_per_fp:
                d = d[:max_docs_per_fp]
            if len(d) < 2:
                continue
            ia, ib = np.triu_indices(len(d), k=1)
            out_a.append(d[ia])
            out_b.append(d[ib])
        if not out_a:
            dt = df[id_col].dtype if len(df.columns) else np.int64
            return pd.DataFrame({"doc_a": pd.Series(dtype=dt),
                                 "doc_b": pd.Series(dtype=dt)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    pair_rows = grouped_map(fps, "fp", _pairs, num_parts=num_parts)
    counted = grouped_aggregate(
        pair_rows, ["doc_a", "doc_b"], [("shared_fps", None, "count")],
        num_parts=max(4, num_parts // 4),
    )
    return counted.filter(expr=f"shared_fps >= {min_shared}")
