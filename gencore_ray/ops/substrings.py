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


# --- repeated-gram prefilter -----------------------------------------
# Most L-grams are unique to one document and can never dedup, yet the
# naive explode ships one 24 B row per token window — O(corpus tokens)
# exchange mass.  One cheap hashing pass builds a Bloom of grams seen
# in >= 2 DISTINCT docs (no false negatives: a bit can only be missing
# if the gram truly has < 2 docs), and the explode then emits only
# members — typically a 5-20x row cut.  False positives just ride the
# exchange and fall out of the group-size/owner logic downstream, so
# results are bit-identical (tested).  This is the reference's own
# bounded-work discipline (the low-complexity skip,
# /root/reference/src/group.cpp:142-175) applied at the explode.
#
# Maps auto-size to ~8 bits/token clamped to [2^20, 2^28] bits
# (128 KB - 32 MB); the TWICE map stays much emptier than the seen map
# because a false "twice" bit needs two different blocks' seen-bits to
# collide.  At 10^12 docs pass a larger bits_log2 (cost is linear) or
# shard the pass by gram-hash prefix.


def _gram_probes(h: np.ndarray, mask: np.uint64):
    from gencore_ray.functions.hashing import splitmix64

    h = h.astype(np.uint64)
    return h & mask, splitmix64(h) & mask


def _bits_add(bits: np.ndarray, h: np.ndarray) -> None:
    mask = np.uint64(len(bits) * 64 - 1)        # len is a power of two
    for idx in _gram_probes(h, mask):
        np.bitwise_or.at(
            bits, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)))


def _bits_test(bits: np.ndarray, h: np.ndarray) -> np.ndarray:
    mask = np.uint64(len(bits) * 64 - 1)
    out = np.ones(len(h), dtype=bool)
    for idx in _gram_probes(h, mask):
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return out


def token_hash_table(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Materialized (id, th: list<u64>, n_tokens) — the corpus
    tokenized and hashed exactly ONCE.  Every span pass (the Bloom
    build, the window explode, the per-doc base) then reruns only
    cheap numpy window hashing over this table instead of the regex
    tokenizer.  ~8 B/token, i.e. roughly a quarter of the text bytes;
    it lives in the object store and spills like any other blocks."""
    from gencore_ray.functions.text import TextFeatures

    def _t(df: pd.DataFrame) -> pd.DataFrame:
        feats = TextFeatures(df[text_col].fillna("").tolist())
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "th": [np.asarray(h, dtype=np.uint64) for h in feats.tok_hashes],
            "n_tokens": np.asarray(feats.token_count, dtype=np.int64),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _t, batch_format="pandas").materialize()


def _cached_hashes(df: pd.DataFrame) -> list:
    """th column -> list of uint64 arrays (robust to the Arrow list
    round-trip handing back lists or differently-typed arrays)."""
    return [np.asarray(x, dtype=np.uint64) for x in df["th"].tolist()]


def _resolve_prefilter(prefilter) -> bool:
    """"on"/"off"/"auto" (or bool): auto engages the repeated-gram
    Bloom only on a multi-node cluster — exchange rows are only
    expensive CROSS-NODE (single-node object store is shared memory,
    where the extra hashing pass costs more than the row cut saves);
    same gating policy as DedupConfig.bloom_prefilter."""
    import ray

    if isinstance(prefilter, bool):
        return prefilter
    if prefilter == "on":
        return True
    if prefilter == "off":
        return False
    return sum(1 for nd in ray.nodes() if nd.get("Alive")) > 1


def repeated_gram_bloom(
    hash_table: rd.Dataset,
    span_tokens: int,
    bits_log2: int | None = None,
) -> np.ndarray:
    """Bloom bitmap (uint64 words) of L-gram hashes occurring in >= 2
    distinct documents of a ``token_hash_table``.  Exact superset
    guarantee: per block, grams are doc-deduped, then ``dup`` captures
    >=2-docs-within-block and the saturating (seen, twice) merge —
    associative, so it can fold in any order/tree — captures
    cross-block repeats; a truly-repeated gram can never be missed.

    ``bits_log2=None`` sizes the map to the corpus: ~8 bits per token
    (the gram count is ~the token count), clamped to [20, 28] —
    256 KB to 32 MB.  Block bitmaps are pre-merged 16-at-a-time in
    worker tasks so the driver pulls n_blocks/16 maps, not n_blocks;
    corpora whose block count makes even that pull heavy should shard
    the pass by gram-hash prefix (each shard an independent bitmap)."""
    import math

    L = int(span_tokens)
    if bits_log2 is None:
        total = int(hash_table.sum("n_tokens") or 0)
        bits_log2 = min(28, max(20, int(math.ceil(
            math.log2(8 * max(total, 1) + 1)))))
    words = (1 << bits_log2) // 64

    def _block_maps(df: pd.DataFrame) -> pd.DataFrame:
        seen = np.zeros(words, dtype=np.uint64)
        dup = np.zeros(words, dtype=np.uint64)
        coords = _gram_window_coords(_cached_hashes(df), L)
        if coords is not None:
            wd, wh, _pos = coords
            o = np.lexsort((wh, wd))
            d1, h1 = wd[o], wh[o]
            new_doc = np.r_[True, (d1[1:] != d1[:-1]) | (h1[1:] != h1[:-1])]
            h_doc = h1[new_doc]                     # per-doc distinct
            # within-block >=2-docs grams: adjacent equal hashes in the
            # doc-deduped, hash-sorted stream
            hs = np.sort(h_doc, kind="stable")
            dup_h = hs[1:][hs[1:] == hs[:-1]]
            _bits_add(seen, h_doc)
            _bits_add(dup, dup_h)
        return pd.DataFrame({"seen": [seen.tobytes()], "dup": [dup.tobytes()]})

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        seen = np.zeros(words, dtype=np.uint64)
        twice = np.zeros(words, dtype=np.uint64)
        for s, d in zip(df["seen"], df["dup"]):
            s = np.frombuffer(s, dtype=np.uint64)
            twice |= np.frombuffer(d, dtype=np.uint64) | (seen & s)
            seen |= s
        return pd.DataFrame({"seen": [seen.tobytes()],
                             "dup": [twice.tobytes()]})

    # per-block maps, one distributed 16:1 pre-merge, driver fold of
    # the survivors — the driver never pulls n_blocks full bitmaps
    parts = (hash_table.select_columns(["th"])
             .map_batches(_block_maps, batch_format="pandas",
                          batch_size=None)
             .map_batches(_merge, batch_format="pandas", batch_size=16)
             .to_pandas())
    final = _merge(parts)
    return np.frombuffer(final["dup"].iloc[0], dtype=np.uint64).copy()


def _gram_window_coords(tok_hashes: list, L: int):
    """(doc_idx, window_hash, pos) for every same-doc L-token window of
    a batch — the shared hashing core of ``span_dedup_rewrite`` and
    ``duplicate_span_stats``.  Returns None when the batch has no
    window (short docs, empty batch)."""
    from gencore_ray.functions.hashing import pow_array, splitmix64
    from gencore_ray.functions.text import _POLY

    lens = np.fromiter(map(len, tok_hashes), dtype=np.int64,
                       count=len(tok_hashes))
    total = int(lens.sum())
    if total < L:
        return None
    flat = np.concatenate(tok_hashes)
    tdoc = np.repeat(np.arange(len(lens)), lens)
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    win = np.lib.stride_tricks.sliding_window_view(flat, L)
    with np.errstate(over="ignore"):
        wh = splitmix64((win * pow_array(_POLY, L)).sum(
            axis=1, dtype=np.uint64))
    valid = tdoc[: total - L + 1] == tdoc[L - 1:]
    if not valid.any():
        return None
    idx = np.flatnonzero(valid)
    return tdoc[idx], wh[idx], idx - offs[idx]


def span_window_rows(
    hash_table: rd.Dataset,
    id_col: str = "doc_id",
    span_tokens: int = 8,
    bloom_ref=None,
) -> rd.Dataset:
    """(ghash, id, p) rows for every same-doc L-token window of a
    ``token_hash_table``; with ``bloom_ref`` (a ``ray.put`` of
    ``repeated_gram_bloom``) only windows whose gram can possibly
    dedup are emitted.  Exposed so tests can measure the exchange-row
    cut directly."""
    import ray

    L = int(span_tokens)

    def _window_rows(df: pd.DataFrame) -> pd.DataFrame:
        coords = _gram_window_coords(_cached_hashes(df), L)
        if coords is None:
            return pd.DataFrame({"ghash": pd.Series(dtype=np.uint64),
                                 id_col: pd.Series(dtype=df[id_col].dtype),
                                 "p": pd.Series(dtype=np.int64)})
        doc_idx, wh, pos = coords
        if bloom_ref is not None:
            keep = _bits_test(ray.get(bloom_ref), wh)
            doc_idx, wh, pos = doc_idx[keep], wh[keep], pos[keep]
        return pd.DataFrame({
            "ghash": wh,
            id_col: df[id_col].to_numpy()[doc_idx],
            "p": pos,
        })

    return hash_table.select_columns([id_col, "th"]).map_batches(
        _window_rows, batch_format="pandas")


def span_dedup_rewrite(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    num_parts: int = 16,
    prefilter: str | bool = "auto",
) -> rd.Dataset:
    """Lee et al. 2022 exact-substring dedup as a TRANSFORM: cut every
    token covered by a duplicated L-gram window, keep the owner doc's
    copy, reassemble the survivors.

    Policy (deterministic, owner-doc-keeps): each L-gram's OWNER is the
    smallest doc_id containing it; in every other doc, all windows of
    that gram are removed and every token position covered by a removed
    window is cut.  The owner doc keeps all its occurrences (a simpler,
    partition-stable variant of Lee et al.'s keep-one-occurrence).
    Output: (id, n_tokens, n_cut, clean_text) — clean_text is the
    space-joined surviving tokens of the NORMALISED stream (lowercase
    ``[a-z0-9_]+``; dedup is about content, same contract as
    ``substring_dup_pairs``).

    Scale shape: window rows (ghash, id, pos — 24 B) through one
    gram-keyed exchange that computes owners and emits only the losing
    windows; per-doc removed positions aggregate through one id-keyed
    exchange (bounded by the doc's window count); the text is then cut
    in a pure map joined by id — text never rides the gram exchange.
    ``prefilter`` ("auto" default: on only multi-node, where exchange
    rows cross the wire) first builds the repeated-gram Bloom and
    explodes only grams seen in >= 2 docs — identical output (unique
    grams have no losers), 5-20x fewer exchange rows on typical
    corpora.  The corpus is tokenized exactly once into
    ``token_hash_table``; the Bloom pass and the explode rerun only
    numpy window hashing over it.
    """
    import ray

    from gencore_ray.functions.text import TextFeatures
    from gencore_ray.stages.shuffle import grouped_map, hash_join

    L = int(span_tokens)
    ht = token_hash_table(ds, id_col, text_col)
    bloom_ref = ray.put(repeated_gram_bloom(ht, L)) \
        if _resolve_prefilter(prefilter) else None

    def _losers(df: pd.DataFrame) -> pd.DataFrame:
        """Windows whose gram is owned by a smaller doc_id (the gram
        exchange co-locates every occurrence of a hash)."""
        owner = df.groupby("ghash", sort=False)[id_col].transform("min")
        lose = df[id_col].to_numpy() != owner.to_numpy()
        return df.loc[lose, [id_col, "p"]]

    def _collect(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(id_col, sort=False)["p"]
                .agg(lambda s: s.to_numpy().tolist())
                .rename("cut_ps").reset_index())

    wins = span_window_rows(ht, id_col, L, bloom_ref=bloom_ref)
    losers = grouped_map(wins, "ghash", _losers, num_parts=num_parts)
    per_doc = grouped_map(losers, id_col, _collect, num_parts=num_parts)
    joined = hash_join(ds.select_columns([id_col, text_col]), per_doc,
                       id_col, id_col, num_parts=num_parts,
                       how="left_outer")

    def _rewrite(df: pd.DataFrame) -> pd.DataFrame:
        feats = TextFeatures(df[text_col].fillna("").tolist(),
                             need_hashes=False)
        out_text, n_cut = [], []
        for toks, ps in zip(feats.tok_lists, df["cut_ps"].tolist()):
            if ps is None or (isinstance(ps, float) and pd.isna(ps)) \
                    or not len(toks):
                out_text.append(" ".join(toks))
                n_cut.append(0)
                continue
            # coverage via a difference array: +1 at window start,
            # -1 past its end, cumsum > 0 == covered
            diff = np.zeros(len(toks) + 1, dtype=np.int64)
            pa_ = np.asarray(ps, dtype=np.int64)
            np.add.at(diff, pa_, 1)
            np.add.at(diff, np.minimum(pa_ + L, len(toks)), -1)
            cut = np.cumsum(diff[:-1]) > 0
            kept = [t for t, c in zip(toks, cut) if not c]
            out_text.append(" ".join(kept))
            n_cut.append(int(cut.sum()))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": feats.token_count,
            "n_cut": np.asarray(n_cut, dtype=np.int64),
            "clean_text": out_text,
        })

    return joined.map_batches(_rewrite, batch_format="pandas")


def duplicate_span_stats(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    num_parts: int = 16,
    round_to: int = 6,
    prefilter: str | bool = "auto",
) -> rd.Dataset:
    """Per-document duplicated-span profile (the Lee et al. 2022
    "Deduplicating Training Data" exact-substring signal, aggregated
    per doc instead of cutting the spans out): for every document,
    the fraction of its L-token sliding windows whose token L-gram
    also occurs in at least one OTHER document.

    Contract — CROSS-document only: within-doc repetition is already
    measured by ``repetition_profile``; a gram repeated ten times in
    one doc but nowhere else contributes nothing here.  Docs with
    fewer than ``span_tokens`` tokens have 0 windows and frac 0.0
    (no short-text fallback, unlike ``shingle_hashes``).

    Scale shape: one explode row per DISTINCT (doc, gram) — ~n_tokens
    rows/doc of (u64 gram hash, id, count), the same order of exchange
    mass as a suffix-array dedup pass and inherent to the semantics.
    Cross-doc grams are found by one gram-keyed exchange (group size
    >= 2 — no driver state, no broadcast), per-doc sums by a second
    id-keyed exchange over only the surviving dup rows.
    ``prefilter`` ("auto" default: on only multi-node) cuts the explode
    to grams the repeated-gram Bloom says occur in >= 2 docs —
    single-doc grams are dropped by the group-size gate anyway, so
    output is identical.
    The corpus is tokenized exactly once into ``token_hash_table``;
    the Bloom pass, the explode, AND the per-doc window-count base all
    reread that table instead of re-tokenizing.
    """
    import pandas as pd
    import ray

    from gencore_ray.stages.shuffle import grouped_map, hash_join

    L = int(span_tokens)
    p = 10.0 ** round_to
    ht = token_hash_table(ds, id_col, text_col)
    bloom_ref = ray.put(repeated_gram_bloom(ht, L)) \
        if _resolve_prefilter(prefilter) else None

    def _gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        """(id, ghash, m): per-doc occurrence count of each distinct
        L-gram — windows from the shared ``_gram_window_coords`` core,
        multiplicities by lexsort segment count."""
        coords = _gram_window_coords(_cached_hashes(df), L)
        if coords is None:
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "ghash": pd.Series(dtype=np.uint64),
                                 "m": pd.Series(dtype=np.int64)})
        wd, wh, _pos = coords
        if bloom_ref is not None:
            keep = _bits_test(ray.get(bloom_ref), wh)
            wd, wh = wd[keep], wh[keep]
            if not len(wd):
                return pd.DataFrame(
                    {id_col: pd.Series(dtype=df[id_col].dtype),
                     "ghash": pd.Series(dtype=np.uint64),
                     "m": pd.Series(dtype=np.int64)})
        o = np.lexsort((wh, wd))
        d1, h1 = wd[o], wh[o]
        seg = np.r_[True, (d1[1:] != d1[:-1]) | (h1[1:] != h1[:-1])]
        starts = np.flatnonzero(seg)
        m = np.diff(np.r_[starts, len(d1)])
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[d1[starts]],
            "ghash": h1[starts],
            "m": m.astype(np.int64),
        })

    def _cross_doc(df: pd.DataFrame) -> pd.DataFrame:
        """Keep rows whose gram occurs in >= 2 docs of its group (the
        exchange co-locates each gram, so group size IS doc count)."""
        sz = df.groupby("ghash", sort=False)["m"].transform("size")
        return df.loc[sz.to_numpy() >= 2, [id_col, "m"]]

    def _doc_sum(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(id_col, sort=False)["m"].sum()
                .rename("dup_windows").reset_index())

    grams = ht.select_columns([id_col, "th"]).map_batches(
        _gram_rows, batch_format="pandas")
    dup_rows = grouped_map(grams, "ghash", _cross_doc, num_parts=num_parts)
    per_doc = grouped_map(dup_rows, id_col, _doc_sum, num_parts=num_parts)

    def _base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_windows": np.maximum(
                df["n_tokens"].to_numpy(dtype=np.int64) - L + 1, 0),
        })

    base = ht.select_columns([id_col, "n_tokens"]).map_batches(
        _base, batch_format="pandas")
    joined = hash_join(base, per_doc, id_col, id_col,
                       num_parts=num_parts, how="left_outer")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        nw = df["n_windows"].to_numpy(dtype=np.int64)
        dw = df["dup_windows"].fillna(0).to_numpy(dtype=np.int64)
        frac = np.floor(dw / np.maximum(nw, 1) * p + 0.5) / p
        return pd.DataFrame({id_col: df[id_col], "n_windows": nw,
                             "dup_windows": dw, "dup_span_frac": frac})

    return joined.map_batches(_finish, batch_format="pandas")
