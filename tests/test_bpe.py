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


def _ref_encode_word(w, merges):
    """Naive sequential replay: apply every merge in rank order."""
    syms = list(w) + [EOW]
    for left, right, _c in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_sequential_replay(ray_session):
    from gencore_ray.ops.bpe import BpeEncoder, bpe_encode, bpe_train

    docs = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    merges_ref = _ref_bpe(TEXTS, 20)
    merges = bpe_train(rd.from_pandas(docs), n_merges=20)
    assert list(zip(merges["left"], merges["right"])) == [
        (l, r) for l, r, _ in merges_ref]

    # word-level: min-rank-first loop == sequential rank-order replay
    enc = BpeEncoder(merges)
    import re
    words = sorted({w for t in TEXTS for w in re.findall(r"[a-z0-9_]+", t)})
    for w in words:
        assert enc._encode_word(w) == _ref_encode_word(w, merges_ref), w

    # dataset-level counts line up with per-word encoding
    got = (bpe_encode(rd.from_pandas(docs), merges, concurrency=2,
                      batch_size=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(TEXTS):
        ws = re.findall(r"[a-z0-9_]+", (t or "").lower())
        want = sum(len(_ref_encode_word(w, merges_ref)) for w in ws)
        assert got.loc[i, "n_words"] == len(ws)
        assert got.loc[i, "n_bpe_tokens"] == want


def test_bpe_encode_emit_tokens_roundtrip(ray_session):
    from gencore_ray.ops.bpe import bpe_encode, bpe_train

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["low lower lowest",
                                                    "new newer newest"]})
    merges = bpe_train(rd.from_pandas(docs), n_merges=30, min_pair_count=1)
    got = (bpe_encode(rd.from_pandas(docs), merges, emit_tokens=True)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # stripping the end-of-word markers reconstructs the original words
    for i, t in enumerate(docs["text"]):
        joined = "".join(got.loc[i, "bpe_tokens"]).replace("</w>", " ").strip()
        assert joined == t
