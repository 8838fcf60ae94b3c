"""Text signature functions: tokens, shingles, MinHash, SimHash, quality.

These are the web-text analogue of the reference's per-read key
extraction: cluster-key computation (/root/reference/src/gencore.cpp:295-313)
becomes shingle/MinHash band keys; UMI parsing
(/root/reference/src/bamutil.cpp:23-112) becomes tokenisation; the
qual->score map (/root/reference/src/pair.cpp:70-86) becomes the page
quality score.

All functions are pure and deterministic given (text, seed).
"""

from __future__ import annotations

import re

import numpy as np

from gencore_ray.functions.hashing import (
    U64,
    _MASK,
    hash_str_array_u64,
    minhash_perms,
    pow_array,
    splitmix64,
)

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
# ASCII alphanumerics, stripped in one C pass — the exact complement of
# the SQL oracle's regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')
_NON_ALNUM_RE = re.compile(r"[^a-zA-Z0-9]")

# polynomial base for order-sensitive shingle hashing (FNV prime)
_POLY = np.uint64(0x100000001B3)


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens. The single tokenisation used everywhere."""
    return _TOKEN_RE.findall(text.lower())


class TextFeatures:
    """One-tokenise-pass batch features (signature + textstats input).

    Everything derived from the token stream is computed here exactly
    once per batch: the per-text token-hash arrays (each *unique* token
    of the batch hashed once, gathered by factorised codes), plus the
    scalar columns (text_len, alnum_count, token_count, quality).  No
    per-character or per-token Python loops — tokenisation is one C
    regex call per text, the vocabulary is one pd.factorize hashtable
    pass, and every downstream reduction is a cumsum-segment gather.
    """

    __slots__ = ("tok_lists", "tok_hashes", "text_len", "alnum_count",
                 "token_count", "mean_word_len", "quality")

    def __init__(self, texts, seed: int = 42, need_hashes: bool = True):
        import itertools

        import pandas as pd

        n = len(texts)
        tok_lists = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
        counts = np.fromiter(map(len, tok_lists), dtype=np.int64, count=n)
        offsets = np.empty(n + 1, dtype=np.int64)
        offsets[0] = 0
        np.cumsum(counts, out=offsets[1:])

        if offsets[-1]:
            flat = np.array(
                list(itertools.chain.from_iterable(tok_lists)), dtype=object
            )
            codes, uniques = pd.factorize(flat, sort=False)
            uniq_lens = np.fromiter(map(len, uniques), dtype=np.int64,
                                    count=len(uniques))
            cs = np.empty(offsets[-1] + 1, dtype=np.int64)
            cs[0] = 0
            np.cumsum(uniq_lens[codes], out=cs[1:])
            sum_wl = cs[offsets[1:]] - cs[offsets[:-1]]
            if need_hashes:
                uniq_hashes = hash_str_array_u64(list(uniques), seed=seed)
                tok_hash_flat = uniq_hashes[codes]
            else:
                tok_hash_flat = np.empty(0, dtype=U64)
                offsets = np.zeros(n + 1, dtype=np.int64)
        else:
            tok_hash_flat = np.empty(0, dtype=U64)
            sum_wl = np.zeros(n, dtype=np.int64)

        self.tok_lists = tok_lists
        self.tok_hashes = [
            tok_hash_flat[offsets[i]: offsets[i + 1]] for i in range(n)
        ]
        self.text_len = np.fromiter(
            (len(t or "") for t in texts), dtype=np.int64, count=n
        )
        self.alnum_count = np.fromiter(
            (len(_NON_ALNUM_RE.sub("", t or "")) for t in texts),
            dtype=np.int64, count=n,
        )
        self.token_count = counts
        denom = np.maximum(counts, 1)
        self.mean_word_len = sum_wl / denom
        len_term = np.minimum(self.text_len / 2000.0, 1.0)
        alnum_term = self.alnum_count / np.maximum(self.text_len, 1)
        wl_term = np.minimum(self.mean_word_len / 8.0, 1.0)
        # round half-away-from-zero on the scaled double — bit-identical
        # to DuckDB/C++ round(x, 6), unlike np.round's half-even-on-
        # scaled which can flip the 6th decimal
        q = 0.4 * len_term + 0.4 * alnum_term + 0.2 * wl_term
        q = np.floor(q * 1e6 + 0.5) / 1e6
        self.quality = np.where((self.text_len == 0) | (counts == 0), 0.0, q)


def token_hashes_for_batch(texts, seed: int = 42) -> list[np.ndarray]:
    """Per-text arrays of token hashes (compat shim over TextFeatures)."""
    return TextFeatures(texts, seed=seed).tok_hashes


def shingle_hashes(tok_hashes: np.ndarray, k: int) -> np.ndarray:
    """Sorted unique hashes of k-gram shingles from a token-hash array.

    Order-sensitive polynomial over each window, then a splitmix64
    finalise. Texts with 0 < n < k tokens yield one shingle over all
    tokens (so short-but-nonempty pages still dedup); empty -> empty.
    """
    n = len(tok_hashes)
    if n == 0:
        return np.empty(0, dtype=U64)
    kk = min(k, n)
    windows = np.lib.stride_tricks.sliding_window_view(tok_hashes, kk)
    powers = pow_array(_POLY, kk)
    with np.errstate(over="ignore"):
        raw = (windows * powers).sum(axis=1, dtype=U64)
    return np.unique(splitmix64(raw))


class MinHasher:
    """128-perm MinHash over shingle-hash sets. Build once per actor."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        self.num_perm = num_perm
        a, b = minhash_perms(num_perm, seed)
        self._a = a[:, None]  # (P,1) for broadcasting against (1,S)
        self._b = b[:, None]

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty sets."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=U64)
        with np.errstate(over="ignore"):
            permuted = (self._a * shingles[None, :] + self._b) & _MASK
        return permuted.min(axis=1)

    # NOTE: a batch-level variant (permute the concatenated shingle
    # stream, np.minimum.reduceat per doc) was measured 19x SLOWER than
    # this per-doc broadcast — reduceat on axis=1 over uint64 takes a
    # numpy slow path.  The per-doc loop is the fast form here.


def band_keys_batch(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n, bands) uint64 bucket keys for a (n, bands*rows) signature
    matrix; band index mixed in so bands don't collide.  One numpy shot
    across the whole batch (rows is tiny, so the inner loop is O(rows))."""
    n = len(sigs)
    mat = sigs.reshape(n, bands, rows)
    acc = np.zeros((n, bands), dtype=U64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            acc = (acc * _POLY + mat[:, :, r]) & _MASK
        acc = (acc * _POLY + np.arange(bands, dtype=U64)[None, :]) & _MASK
    return splitmix64(acc)


def band_keys(signature: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(bands,) uint64 bucket keys for ONE signature (batch path above)."""
    return band_keys_batch(signature[None, :], bands, rows)[0]


def simhash64(tok_hashes: np.ndarray) -> int:
    """64-bit SimHash from token hashes weighted by term frequency."""
    if len(tok_hashes) == 0:
        return 0
    uniq, counts = np.unique(tok_hashes, return_counts=True)
    bits = np.unpackbits(uniq.astype(">u8").view(np.uint8)).reshape(-1, 64)
    votes = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
    fp_bits = (votes > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(fp_bits).tobytes(), "big")


def bottom_m_sketch(
    shingles: np.ndarray, perms_a: np.ndarray, perms_b: np.ndarray, m: int
) -> np.ndarray:
    """Bottom-m sketch keys for the containment pass.

    For each of P independent permutations, emit the m smallest
    permuted shingle values.  If A ⊆ B with |A| >= |B|/3, A's minimum
    under a permutation lands in B's bottom-m with probability
    1-(1-|A|/|B|)^m, so contained pairs collide on at least one key
    w.h.p. across the P permutations.  Substring-dup analogue of
    gencore's cigar-containment test (/root/reference/src/bamutil.cpp:204-255).
    """
    if len(shingles) == 0:
        return np.empty(0, dtype=U64)
    P = len(perms_a)
    with np.errstate(over="ignore"):
        permuted = (perms_a[:, None] * shingles[None, :] + perms_b[:, None]) & _MASK
        mm = min(m, permuted.shape[1])
        part = np.partition(permuted, mm - 1, axis=1)[:, :mm]
        # mix in the permutation index so keys from different perms never collide
        keys = (part * _POLY + np.arange(P, dtype=U64)[:, None]) & _MASK
    return splitmix64(keys.ravel())


# ---------------------------------------------------------------------------
# quality / language / token-count scalar features (SURVEY §2.2 M8 analogue)
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": frozenset(
        "the of and to in a is that it was for on are as with his they at be this "
        "have from or had by not but what all were when we there can an your which".split()
    ),
    # lists are ASCII-folded on purpose: corpus texts built from them
    # stay byte-parseable by BOTH Python \w+ and the SQL oracles' ASCII
    # token class, so tokenisation parity holds end to end
    "de": frozenset(
        "der die das und ist von zu den nicht mit sich des auf im dem ein eine "
        "als auch es an werden aus er hat dass sie nach bei um noch wie wenn dann".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une est que dans qui par pour sur au plus "
        "pas ce ne se sont avec son ses mais comme ou si leur elle".split()
    ),
    "es": frozenset(
        "el la de que y en los del se las por un para con no una su al lo como "
        "pero sus le ya este porque esta entre cuando muy sin sobre donde todos".split()
    ),
    "it": frozenset(
        "il di che e la per una in del non sono con si da come anche nel "
        "alla gli dei delle questo essere ha loro quando nella stato quindi dove".split()
    ),
    "pt": frozenset(
        "o a de que e do da em um para com nao uma os no se na por mais as "
        "dos como mas foi ao ele das tem seu sua pelo pela isso ela depois".split()
    ),
    "nl": frozenset(
        "de het een en van ik te dat die in is zij niet met aan er om ook als "
        "dan maar bij nog naar dit toch heeft worden zijn deze wel geen".split()
    ),
}


def quality_score(text: str) -> float:
    """Deterministic [0,1] quality score: length, alnum ratio, word length.

    Mirrors gencore's coarse qual->score thresholds
    (/root/reference/src/pair.cpp:70-86): cheap, monotone heuristics.
    Scalar convenience over the vectorised ``TextFeatures`` batch path
    (alnum is the ASCII class, matching the SQL oracle exactly).
    """
    return float(TextFeatures([text]).quality[0])


# GPT-2-style pre-tokenizer shape, ASCII classes so the Python re and
# the SQL oracle's RE2 agree byte-for-byte: runs of letters, runs of
# digits, runs of other non-space, each with an optional leading space;
# residual whitespace runs count as tokens too (as in the original).
_BPE_RE = re.compile(r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+")
BPE_PATTERN_SQL = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"
_WS_TOKEN_RE = re.compile(r"\S+")


def bpe_token_counts(texts) -> "np.ndarray":
    """Per-text BPE-ish pre-token counts (one C regex pass per text)."""
    return np.fromiter(
        (len(_BPE_RE.findall(t or "")) for t in texts),
        dtype=np.int64, count=len(texts),
    )


def ws_token_counts(texts) -> "np.ndarray":
    """Per-text whitespace-delimited token counts."""
    return np.fromiter(
        (len(_WS_TOKEN_RE.findall(t or "")) for t in texts),
        dtype=np.int64, count=len(texts),
    )


# word -> [(lang, weight)]: weight = 1 / number-of-languages containing
# the word, so shared Romance/Germanic function words ("la", "de", "en")
# vote weakly while language-unique words ("dass", "porque", "jullie")
# vote at full strength — the cheap dependency-free cure for the
# related-language confusion a plain distinct-hit count suffers from.
def _build_lang_word_weights() -> dict[str, list[tuple[str, float]]]:
    from collections import Counter

    df = Counter(w for s in _STOPWORDS.values() for w in s)
    table: dict[str, list[tuple[str, float]]] = {}
    for lang in sorted(_STOPWORDS):
        for w in _STOPWORDS[lang]:
            table.setdefault(w, []).append((lang, 1.0 / df[w]))
    return table


_LANG_WORD_WEIGHTS = _build_lang_word_weights()


def detect_lang(tokens: list[str]) -> str:
    """Stopword-voting language ID over 7 languages
    {en, de, fr, es, it, pt, nl}; returns '' when no stopword matches.

    Each distinct matched stopword votes with specificity weight
    1/df(word); highest summed weight wins, ties break to the
    lexicographically smallest language code (deterministic).
    """
    if not tokens:
        return ""
    scores: dict[str, float] = {}
    for w in set(tokens):
        for lang, wt in _LANG_WORD_WEIGHTS.get(w, ()):
            scores[lang] = scores.get(lang, 0.0) + wt
    if not scores:
        return ""
    return min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def doc_fingerprint(tok_hashes: np.ndarray) -> int:
    """Order-sensitive rolling-hash fingerprint of the full token stream."""
    if len(tok_hashes) == 0:
        return 0
    acc = np.uint64(0xCBF29CE484222325)
    # vectorised horner: fold in chunks to avoid a python loop per token
    powers_cache: dict[int, np.ndarray] = {}
    chunk = 4096
    with np.errstate(over="ignore"):
        for start in range(0, len(tok_hashes), chunk):
            seg = tok_hashes[start : start + chunk]
            L = len(seg)
            powers = powers_cache.get(L)
            if powers is None:
                powers = pow_array(_POLY, L)
                powers_cache[L] = powers
            p_l = (powers[0] * _POLY) & _MASK  # _POLY ** L
            acc = (acc * p_l + (seg * powers).sum(dtype=U64)) & _MASK
    return int(splitmix64(acc))


def normalize_text_arrow(col):
    """Canonical text cleanup as three Arrow column kernels (no Python
    per-row work): Unicode NFC composition, horizontal-whitespace
    collapse, space trim.

    NFC first: decomposed sequences (``e`` + U+0301) from mixed crawl
    encodings hash differently from their composed twins, silently
    splitting duplicate clusters — the same reason the reference
    canonicalises read keys before grouping
    (/root/reference/src/gencore.cpp:295-313).  Every step is chosen to
    be SQL-replayable: ``nfc_normalize`` + ``regexp_replace(..., 'g')``
    + ``trim`` in DuckDB produce byte-identical output.

    NFC runs through ``unicodedata`` (one C call per string, with the
    ``is_normalized`` quick-check short-circuiting the pure-ASCII bulk
    of a web corpus) because this build's ``pc.utf8_normalize``
    decomposes without recomposing — it emits NFD for every form, which
    would disagree with every other engine's NFC.  Whitespace collapse
    and trim stay Arrow column kernels.
    """
    import unicodedata

    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    x = pa.array(
        [
            None
            if s is None
            else (s if unicodedata.is_normalized("NFC", s)
                  else unicodedata.normalize("NFC", s))
            for s in col.to_pylist()
        ],
        pa.string(),
    )
    x = pc.replace_substring_regex(x, r"[ \t]+", " ")
    return pc.utf8_trim(x, " ")
