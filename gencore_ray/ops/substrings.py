"""Exact substring-duplicate detection (north_star's "suffix-array
substring pass", Ray-Data-first).

A distributed suffix array over 10^12 documents is the wrong tool when
the goal is page-level substring dups: the bottom-m containment sketch
(gencore_ray/functions/text.py::bottom_m_sketch) already surfaces every
pair with shingle-containment ~1.0 as an LSH candidate — and a TRUE
substring pair has containment exactly 1.0 (the shorter text's token
windows are a contiguous subrange of the longer's).  So:

    sketch candidates (containment >= threshold, from the standard
    pipeline) -> re-attach the two texts (string-keyed hash joins)
    -> exact ``shorter in longer`` byte check.

The exact check touches only the candidate pairs, never n^2 texts;
the reference's analogous exact containment test is the cigar/isPartOf
check (/root/reference/src/bamutil.cpp:204-255).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.config import DedupConfig


def substring_dup_pairs(
    pages: rd.Dataset,
    cfg: DedupConfig | None = None,
    num_parts: int | None = None,
) -> rd.Dataset:
    """pages(url, text) -> (url_a, url_b) where one token stream is a
    strict contiguous subsequence of the other (url_a < url_b
    lexicographically; equal token streams are NOT substring pairs).

    Contract — TOKEN granularity, boundary-guarded: containment is
    tested on the space-joined token streams padded with spaces, so
    "a b" never "matches" inside "xa b", and whitespace/punctuation
    variants normalise away (dedup is about content).  Token-aligned
    containment is also what the shingle machinery measures: a
    token-substring's k-gram windows are ALL present in the longer
    stream, so the exact verify sees containment 1.0 (byte-level
    overlaps that break a token boundary do NOT count as dups here).
    Candidate discovery is the bottom-m sketch — near-certain when the
    shorter side is a sizable fraction of the longer, degrading for
    tiny-inside-huge containments (raise ``containment_bottom_m`` /
    ``containment_perms`` for that regime).  Both texts must have at least
    ``cfg.shingle_k`` tokens (micro-texts carry no containment
    evidence — gencore's short/unmapped-read bypass analogue,
    /root/reference/src/gencore.cpp:254-266)."""
    import ray

    from gencore_ray.pipelines.dedup import compute_signatures
    from gencore_ray.stages.lsh import candidate_pairs
    from gencore_ray.stages.shuffle import hash_join
    from gencore_ray.stages.verify import verified_edges

    cfg = cfg or DedupConfig()
    if num_parts is None:
        num_parts = int(ray.cluster_resources().get("CPU", 8))

    sig = compute_signatures(pages, cfg).materialize()
    pairs = candidate_pairs(sig, cfg, num_parts=num_parts, dedupe=False)
    cands = verified_edges(pairs, sig, cfg).filter(
        expr=f"containment >= {cfg.containment_threshold}"
    ).select_columns(["url_a", "url_b"])

    def slim(name: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({key: t["url"], name: t["text"]})

        return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    j1 = hash_join(cands, slim("text_a", "pa_"), "url_a", "pa_",
                   num_parts=num_parts, left_dedupe=["url_a", "url_b"])
    j2 = hash_join(j1, slim("text_b", "pb_"), "url_b", "pb_",
                   num_parts=num_parts)

    from gencore_ray.functions.text import tokenize

    k = cfg.shingle_k

    def _padded(text: str) -> tuple[str, int]:
        toks = tokenize(text)
        return " " + " ".join(toks) + " ", len(toks)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url_a": pd.Series(dtype=object),
                                 "url_b": pd.Series(dtype=object)})
        ta = df["text_a"].fillna("").to_numpy(dtype=object)
        tb = df["text_b"].fillna("").to_numpy(dtype=object)
        # tokenize each DISTINCT text exactly once per batch: a hub doc
        # appearing in k candidate pairs costs one tokenize, not k
        # (tokenize+join dominates the exact `in` scan)
        codes, uniq = pd.factorize(np.concatenate([ta, tb]))
        padded: list[str] = [""] * len(uniq)
        ntoks = np.empty(len(uniq), dtype=np.int64)
        for i, t in enumerate(uniq):
            padded[i], ntoks[i] = _padded(t)
        ca, cb = codes[: len(ta)], codes[len(ta):]
        # cheap vectorised prefilter; the exact `in` scan runs only on
        # rows that survive the token-count and inequality gates
        cand = (ntoks[ca] >= k) & (ntoks[cb] >= k) & (ca != cb)
        keep = np.zeros(len(df), dtype=bool)
        for i in np.flatnonzero(cand):
            ja, jb = padded[ca[i]], padded[cb[i]]
            keep[i] = ja != jb and (ja in jb or jb in ja)
        out = df.loc[keep, ["url_a", "url_b"]].copy()
        a, b = out["url_a"].to_numpy(), out["url_b"].to_numpy()
        swap = a > b
        out["url_a"], out["url_b"] = np.where(swap, b, a), np.where(swap, a, b)
        return out

    return j2.map_batches(check, batch_format="pandas")
