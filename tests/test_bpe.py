"""Distributed BPE trainer vs an independent in-memory reference."""

from collections import Counter

import pandas as pd
import pytest
import ray.data as rd

EOW = "</w>"


def _ref_bpe(texts, n_merges, min_pair_count=2, top_words=None):
    """Straight-line Sennrich et al. 2016 over a word-count dict."""
    import re

    tok = re.compile(r"[a-z0-9_]+")
    wc = Counter()
    for t in texts:
        wc.update(tok.findall((t or "").lower()))
    items = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    if top_words is not None:
        items = items[:top_words]
    vocab = {tuple(list(w) + [EOW]): c for w, c in items}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for pair in zip(syms, syms[1:]):
                stats[pair] += c
        if not stats:
            break
        (left, right), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((left, right, c))

        def _merge(syms):
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        nxt = Counter()
        for syms, c2 in vocab.items():
            nxt[_merge(syms)] += c2
        vocab = dict(nxt)
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jumped over lazy dogs",
    "lowest lower low lowly newest newer new newly",
    "aaaa aaa aa a baaa abaa",          # overlapping-pair semantics
    "the the the thus then than that these those",
    "",
]


@pytest.mark.parametrize("n_merges,top_words,collapse", [
    (12, None, 200_000),   # collapsed path (vocab fits)
    (25, 10, 200_000),
    (12, None, 0),         # forced distributed per-iteration path
])
def test_bpe_matches_reference(ray_session, n_merges, top_words, collapse):
    from gencore_ray.ops.bpe import bpe_train

    ds = rd.from_items([{"text": t} for t in TEXTS])
    got = bpe_train(ds, n_merges=n_merges, top_words=top_words, num_parts=4,
                    collapse_threshold=collapse)
    exp = _ref_bpe(TEXTS, n_merges, top_words=top_words)
    assert len(got) == len(exp)
    for i, (l, r, c) in enumerate(exp):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["pair_count"]) == (l, r, c), i


def test_bpe_min_pair_count_stops(ray_session):
    from gencore_ray.ops.bpe import bpe_train

    ds = rd.from_items([{"text": "x y z"}])   # all pairs are singletons
    got = bpe_train(ds, n_merges=10, min_pair_count=2, num_parts=2)
    assert len(got) == 0


def test_word_count_table(ray_session):
    from gencore_ray.ops.bpe import word_count_table

    ds = rd.from_items([{"text": "a b a"}, {"text": "b a"}])
    got = (word_count_table(ds, num_parts=2).to_pandas()
           .sort_values("word").reset_index(drop=True))
    assert got.to_dict("records") == [
        {"word": "a", "count": 3}, {"word": "b", "count": 2}]
    top = word_count_table(ds, num_parts=2, top_words=1).to_pandas()
    assert top.to_dict("records") == [{"word": "a", "count": 3}]
