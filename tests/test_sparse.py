"""Sparse TF-IDF cosine pairs vs a dense in-process reference."""

import numpy as np
import pandas as pd

import ray.data as rd

from gencore_ray.functions.embed import md5_low64
from gencore_ray.ops.sparse import tfidf_cosine_pairs

TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "dogs chase cats in the park",
    "dogs chase balls in the park",
    "completely unrelated quantum chromodynamics lattice",
    "quantum chromodynamics on the lattice",
    "the the the the the",
    "",
]


def _dense_ref(texts, max_df, min_df, threshold):
    import re

    tok = re.compile(r"[a-z0-9_]+")
    tfs = [pd.Series(tok.findall(t.lower())).value_counts() if t else
           pd.Series(dtype="int64") for t in texts]
    # term -> md5 bucket exactly like the engine (collisions included)
    htfs = []
    for s in tfs:
        d = {}
        for term, c in s.items():
            h = md5_low64(term)
            d[h] = d.get(h, 0) + int(c)
        htfs.append(d)
    df_count = {}
    for d in htfs:
        for h in d:
            df_count[h] = df_count.get(h, 0) + 1
    n = len(texts)
    idf = {h: np.log(n / c) for h, c in df_count.items()
           if min_df <= c <= max_df}
    vecs = [{h: c * idf[h] for h, c in d.items() if h in idf} for d in htfs]
    nrm = [np.sqrt(sum(w * w for w in v.values())) for v in vecs]
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            shared = set(vecs[i]) & set(vecs[j])
            if not shared or nrm[i] == 0 or nrm[j] == 0:
                continue
            dot = sum(vecs[i][h] * vecs[j][h] for h in shared)
            cos = round(dot / (nrm[i] * nrm[j]), 6)
            if cos >= threshold:
                out.add((i, j, cos))
    return out


def test_tfidf_cosine_pairs_matches_dense(ray_session):
    docs = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    got = tfidf_cosine_pairs(rd.from_pandas(docs), threshold=0.1,
                             max_df=len(TEXTS), min_df=2,
                             num_parts=4).to_pandas()
    want = _dense_ref(TEXTS, max_df=len(TEXTS), min_df=2, threshold=0.1)
    have = {(int(a), int(b), float(c)) for a, b, c in
            zip(got["doc_a"], got["doc_b"], got["cos_sim"])}
    assert have == want


def test_tfidf_stop_term_prune_drops_common_words(ray_session):
    docs = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    # max_df=2: 'the' (df 6) is pruned everywhere, so the all-'the' doc
    # has an empty vector and can pair with nothing
    got = tfidf_cosine_pairs(rd.from_pandas(docs), threshold=0.01,
                             max_df=2, min_df=2, num_parts=4).to_pandas()
    assert 6 not in set(got["doc_a"]) | set(got["doc_b"])
    want = _dense_ref(TEXTS, max_df=2, min_df=2, threshold=0.01)
    have = {(int(a), int(b), float(c)) for a, b, c in
            zip(got["doc_a"], got["doc_b"], got["cos_sim"])}
    assert have == want


def test_weighted_jaccard_pairs_matches_dense(ray_session):
    import re

    from gencore_ray.ops.sparse import weighted_jaccard_pairs

    docs = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    got = weighted_jaccard_pairs(rd.from_pandas(docs), threshold=0.05,
                                 max_df=len(TEXTS), min_df=2,
                                 num_parts=4).to_pandas()
    tok = re.compile(r"[a-z0-9_]+")
    tfs = []
    for t in TEXTS:
        d = {}
        for w in tok.findall(t.lower()):
            h = md5_low64(w)
            d[h] = d.get(h, 0) + 1
        tfs.append(d)
    dfc = {}
    for d in tfs:
        for h in d:
            dfc[h] = dfc.get(h, 0) + 1
    keep = {h for h, c in dfc.items() if 2 <= c <= len(TEXTS)}
    pruned = [{h: c for h, c in d.items() if h in keep} for d in tfs]
    want = set()
    for i in range(len(TEXTS)):
        for j in range(i + 1, len(TEXTS)):
            shared = set(pruned[i]) & set(pruned[j])
            if not shared:
                continue
            smin = sum(min(pruned[i][h], pruned[j][h]) for h in shared)
            smax = sum(pruned[i].values()) + sum(pruned[j].values()) - smin
            wj = round(smin / smax, 6)
            if wj >= 0.05:
                want.add((i, j, wj))
    have = {(int(a), int(b), float(c)) for a, b, c in
            zip(got["doc_a"], got["doc_b"], got["w_jaccard"])}
    assert have == want
    # multiset sensitivity: 'the the the the the' vs one 'the' must NOT
    # score 1.0 (set Jaccard would) — check any pair involving doc 6
    six = {p for p in have if 6 in p[:2]}
    assert all(c < 1.0 for _, _, c in six)


def test_sorted_neighborhood_pairs_matches_bruteforce(ray_session):
    import re

    from gencore_ray.ops.neighborhood import sorted_neighborhood_pairs

    rng = np.random.RandomState(3)
    words = ["apple", "apply", "apricot", "banana", "bandana", "candle",
             "zebra", "zebras", ""]
    texts = [f"{rng.choice(words)} {rng.choice(words)} filler {i}"
             for i in range(60)]
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})
    w = 4
    got = sorted_neighborhood_pairs(rd.from_pandas(docs), window=w,
                                    num_parts=5).to_pandas()
    # brute force: rank under (sanitized 8-char prefix, doc_id)
    pat = re.compile(r"[^a-z0-9 ]")
    keys = sorted((pat.sub("", t.lower())[:8], i)
                  for i, t in enumerate(texts))
    want = set()
    for a in range(len(keys)):
        for b in range(a + 1, min(a + w + 1, len(keys))):
            want.add((keys[a][1], keys[b][1], b - a))
    have = set(zip(got["id_a"], got["id_b"], got["rank_dist"]))
    assert have == want
    assert len(got) == len(got.drop_duplicates()), "pair emitted twice"


def test_set_similarity_join_exact_recall(ray_session):
    """PPJoin prefix filter must have 100% recall: every brute-force
    pair above the threshold appears, with the exact Jaccard."""
    import re

    from gencore_ray.ops.setjoin import set_similarity_join

    rng = np.random.RandomState(4)
    vocab = [f"w{i}" for i in range(120)]
    base = [" ".join(rng.choice(vocab, size=rng.randint(5, 25),
                                replace=False)) for _ in range(30)]
    texts = list(base)
    for t in base[:10]:          # planted near-dups: drop/add a token
        toks = t.split()
        texts.append(" ".join(toks[:-1] + [rng.choice(vocab)]))
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    tau = 0.5
    got = set_similarity_join(rd.from_pandas(docs), threshold=tau,
                              num_parts=4).to_pandas()
    tok = re.compile(r"[a-z0-9_]+")
    sets = [set(tok.findall(t.lower())) for t in texts]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if not sets[i] or not sets[j]:
                continue
            jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            if round(jac, 6) >= tau:
                want.add((i, j, round(jac, 6)))
    have = set(zip(got["doc_a"], got["doc_b"], got["jaccard"]))
    assert have == want
    assert len(want) >= 10       # the planted dups are all found
