"""Unit vectors for the training-data hygiene operators:
decontamination (ops/decontam.py), URL canonicalisation
(ops/urltools.py), PII redaction (functions/redact.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from gencore_ray.functions.redact import redact_pii
from gencore_ray.ops.urltools import canonicalize_url


# --- URL canonicalisation (pure kernel, no ray) ----------------------

@pytest.mark.parametrize("raw,canon", [
    ("HTTP://WWW.Site-1.Example:80/a/5?id=5#top",
     "http://site-1.example/a/5?id=5"),
    ("https://Host.example:443/x/", "https://host.example/x"),
    ("http://h.example/a/5/?utm_source=feed&id=5",
     "http://h.example/a/5?id=5"),
    ("http://h.example/a?id=5&utm_campaign=x", "http://h.example/a?id=5"),
    ("http://h.example/a?utm_a=1&utm_b=2&id=3", "http://h.example/a?id=3"),
    ("http://h.example/a?utm_only=1", "http://h.example/a"),
    ("http://h.example:8080/a", "http://h.example:8080/a"),  # non-default port kept
    ("https://h.example:80/a", "https://h.example:80/a"),    # :80 not default for https
])
def test_canonicalize_url_vectors(raw, canon):
    assert canonicalize_url(raw) == canon


def test_canonicalize_idempotent():
    u = "HTTP://WWW.A.Example:80/p/?utm_x=1&id=2#f"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_canonicalize_vector_matches_scalar():
    """The Arrow-RE2 vector kernel must be char-identical to the scalar
    ``re`` chain on every rule's edge cases (RE2-safety is the module's
    stated contract — this is the test that holds it to it)."""
    from gencore_ray.ops.urltools import canonicalize_urls

    urls = [
        "HTTP://WWW.Site-1.Example:80/a/5?id=5#top",
        "https://Host.example:443/x/",
        "http://h.example/a/5/?utm_source=feed&id=5",
        "http://h.example/a?id=5&utm_campaign=x",
        "http://h.example/a?utm_a=1&utm_b=2&id=3",
        "http://h.example/a?utm_only=1",
        "http://h.example:8080/a",
        "https://h.example:80/a",
        "no-scheme-at-all",
        "ftp://Mixed.Case.example/Path/CASE/",
        "http://h.example/##double#frag",
        "http://h.example/?",
        "http://h.example/utm_trap=1&x=2",   # utm_ as literal path text
        "https://www.h.example:443/",
        "http://h.example/a?x=1&utm_z=",     # empty utm value, at end
        "",
    ]
    vec = canonicalize_urls(pa.array(urls, pa.string())).to_pylist()
    assert vec == [canonicalize_url(u) for u in urls]


# --- PII redaction (pure kernel) -------------------------------------

def test_redact_pii_vectors():
    texts = [
        "mail me at jo.doe+x@sub.example.org today",
        "server at 10.0.200.13 went down",
        "call +4915512345678 now",
        "nothing sensitive here 1.2 or a@b",   # not an email (no TLD), not an IP
    ]
    clean, flags = redact_pii(texts)
    assert clean[0] == "mail me at <EMAIL> today"
    assert clean[1] == "server at <IP> went down"
    assert clean[2] == "call <PHONE> now"
    assert clean[3] == texts[3]
    assert flags["email"].tolist() == [True, False, False, False]
    assert flags["ipv4"].tolist() == [False, True, False, False]
    assert flags["phone"].tolist() == [False, False, True, False]


def test_redact_flags_on_original_text():
    # the email contains an IP-shaped host: the ip flag reflects the
    # ORIGINAL text even though the email pattern rewrites it first
    clean, flags = redact_pii(["x 10.1.2.3 and a@b.co y"])
    assert flags["ipv4"][0] and flags["email"][0]
    assert clean[0] == "x <IP> and <EMAIL> y"


# --- decontamination (distributed) -----------------------------------

def test_contamination_check_planted(ray_session):
    from gencore_ray.ops.decontam import contamination_check

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            f"intro words then {shared} and a long unique tail here",
            "completely different content with no overlap at all today",
            "",
        ],
    }))
    bench = rd.from_arrow(pa.table({
        "doc_id": [100],
        "text": [f"benchmark question: {shared}"],
    }))
    out = contamination_check(docs, bench).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert (out["n_shared"] > 0).all()
    assert (out["n_shared"] <= out["n_shingles"]).all()

    # flagged_only=False annotates every doc
    full = contamination_check(docs, bench, flagged_only=False).to_pandas()
    assert sorted(full["doc_id"]) == [1, 2, 3]
    assert full.set_index("doc_id").loc[2, "n_shared"] == 0


def test_url_variant_dedup_collapses(ray_session):
    from gencore_ray.ops.urltools import url_variant_dedup

    urls = [
        "http://a.example/p?id=1",
        "HTTP://WWW.A.Example:80/p?id=1#frag",
        "http://a.example/p/?utm_source=x&id=1",
        "https://b.example/q",
    ]
    out = url_variant_dedup(
        rd.from_arrow(pa.table({"url": urls})), num_parts=2
    ).to_pandas().set_index("canonical_url")
    assert out.loc["http://a.example/p?id=1", "n_variants"] == 3
    assert out.loc["http://a.example/p?id=1", "first_url"] == (
        "HTTP://WWW.A.Example:80/p?id=1#frag"
    )
    assert out.loc["https://b.example/q", "n_variants"] == 1


# --- mixture sampling + sequence packing (ops/packing.py) ------------

def _tok_count(s):
    import re
    return len(re.findall(r"[a-z0-9_]+", s.lower()))


def test_token_budget_sample_semantics(ray_session):
    from gencore_ray.ops.packing import token_budget_sample

    rng = np.random.default_rng(3)
    n = 120
    texts = [" ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(5, 40))))
             for _ in range(n)]
    tbl = pa.table({
        "doc_id": list(range(n)),
        "source": [f"s{i % 3}" for i in range(n)],
        "text": texts,
    })
    budget = 200
    out = token_budget_sample(
        rd.from_arrow(tbl), budget_tokens=budget, num_parts=4
    ).to_pandas()

    # reference: per-source hash order, exclusive cumsum < budget
    import pandas as pd
    ref = pd.DataFrame({
        "doc_id": range(n),
        "source": [f"s{i % 3}" for i in range(n)],
        "n_tokens": [_tok_count(t) for t in texts],
    })
    h = ((ref["doc_id"].to_numpy().astype(np.uint64) % np.uint64(1 << 32))
         * np.uint64(2654435761)) % np.uint64(1 << 32)
    ref = ref.assign(_h=h).sort_values(["_h", "doc_id"], kind="mergesort")
    before = ref.groupby("source", sort=False)["n_tokens"].cumsum() - ref["n_tokens"]
    want = set(ref[before < budget]["doc_id"])
    assert set(out["doc_id"]) == want
    # each source lands within one doc of its budget
    per_src = out.groupby("source")["n_tokens"].sum()
    max_doc = out.groupby("source")["n_tokens"].max()
    assert ((per_src < budget + max_doc) & (per_src > 0)).all()


def test_pack_sequences_prefix_sum(ray_session):
    from gencore_ray.ops.packing import pack_sequences

    rng = np.random.default_rng(4)
    n = 200
    # non-contiguous sparse ids: the range partitioner must not care
    ids = sorted(rng.choice(100_000, size=n, replace=False).tolist())
    texts = [" ".join("tok" for _ in range(int(rng.integers(0, 30)))) for _ in range(n)]
    tbl = pa.table({"doc_id": ids, "text": texts})
    L = 64
    for parts in (3, 7):
        out = pack_sequences(
            rd.from_arrow(tbl), seq_len=L, num_parts=parts
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        ntok = np.array([_tok_count(t) for t in texts])
        want_start = np.concatenate([[0], ntok[:-1].cumsum()])
        assert (out["doc_id"].to_numpy() == np.array(ids)).all()
        assert (out["n_tokens"].to_numpy() == ntok).all()
        assert (out["start_offset"].to_numpy() == want_start).all()
        assert (out["first_chunk"].to_numpy() == want_start // L).all()
        last_tok = np.where(ntok == 0, want_start, want_start + ntok - 1)
        assert (out["last_chunk"].to_numpy() == last_tok // L).all()


# --- winnowing fingerprints (ops/winnow.py) ---------------------------

def test_winnow_guarantee_and_bypass(ray_session):
    """The paper's guarantee: a shared token run of >= k+w-1 tokens
    must yield >= 1 shared fingerprint; docs below k+w-1 tokens have
    no window (bypass).  k=w=4 here, so the magic length is 7."""
    import pandas as pd

    from gencore_ray.ops.winnow import winnow_dup_pairs, winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"   # exactly 7 tokens
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "intro words here " + shared + " tail one",
            "completely different lead " + shared + " other ending",
            "nothing in common with anyone at all whatsoever",
            "tiny doc",                                   # < 7 tokens: bypass
        ],
    })
    ds = rd.from_pandas(docs)
    stats = winnow_fingerprints(ds, k=4, w=4).to_pandas().set_index("doc_id")
    assert stats.loc[4, "n_windows"] == 0
    assert stats.loc[4, "n_fingerprints"] == 0
    assert (stats.loc[[1, 2, 3], "n_fingerprints"] > 0).all()

    pairs = winnow_dup_pairs(ds, k=4, w=4, min_shared=1).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (1, 2) in got                     # the shared run is caught
    assert not any(3 in p or 4 in p for p in got)


def test_winnow_tie_rightmost():
    """Identical gram repeated w times in one window: every window must
    select the RIGHTMOST minimal position (one fingerprint position per
    window start, all distinct), matching the SQL twin's
    arg_min(p, h*2^32 - p) encoding."""
    import numpy as np

    from gencore_ray.ops.winnow import _winnow_batch

    # "x x x x x x x" -> all 4-grams identical -> every window's min is
    # a tie across all 4 slots; rightmost rule selects positions
    # 3, 4, ... (0-based), i.e. one NEW position per window
    stats, fps = _winnow_batch(
        ["x x x x x x x x x x"], np.array([7]), 4, 4, "doc_id")
    n_grams = 10 - 4 + 1                      # 7
    n_windows = n_grams - 4 + 1               # 4
    assert stats.loc[0, "n_windows"] == n_windows
    assert stats.loc[0, "n_fingerprints"] == n_windows   # one per window
    assert len(fps) == 1                      # but a single distinct hash


# ---------------------------------------------------------------------------
# BM25 search + Misra–Gries heavy hitters
# ---------------------------------------------------------------------------


def test_bm25_matches_brute_force(ray_session):
    import math

    import ray.data as rd

    from gencore_ray.functions.text import tokenize
    from gencore_ray.ops.search import bm25_topk

    rng = __import__("random").Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "rare"]
    docs = [
        {"doc_id": i,
         "text": " ".join(rng.choices(vocab[:4], k=rng.randint(3, 30))
                          + (["rare"] if i % 11 == 0 else []))}
        for i in range(120)
    ]
    docs[5]["text"] = ""          # empty doc counts toward N and avgdl
    terms, k1, b = ["alpha", "rare"], 1.2, 0.75

    toks = {d["doc_id"]: tokenize(d["text"]) for d in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    exp = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf:
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            exp[i] = round(s, 6)
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = bm25_topk(rd.from_items(docs), terms, k=10).to_pandas()
    assert list(zip(got["doc_id"], got["score"])) == want


def test_bm25_rejects_bad_terms(ray_session):
    import pytest
    import ray.data as rd

    from gencore_ray.ops.search import bm25_topk

    ds = rd.from_items([{"doc_id": 1, "text": "a b"}])
    with pytest.raises(ValueError):
        bm25_topk(ds, [], k=3)
    with pytest.raises(ValueError):
        bm25_topk(ds, ["a", "a"], k=3)


def test_heavy_hitters_exact_when_capacity_covers_vocab(ray_session):
    from collections import Counter

    import ray.data as rd

    from gencore_ray.functions.sketch import heavy_hitters

    rows = [{"k": f"key{i % 17}"} for i in range(5000)]
    truth = Counter(r["k"] for r in rows)
    out = heavy_hitters(rd.from_items(rows), "k", capacity=64, k=5)
    assert out.attrs["max_err"] == 0
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(out["token"], out["est_count"])) == want


def test_heavy_hitters_bound_under_capacity(ray_session):
    """capacity << distinct keys: estimates are lower bounds within the
    reported max_err, max_err <= n/(capacity+1), and every key whose
    true count exceeds max_err survives the sketch."""
    from collections import Counter

    import ray.data as rd

    rng = __import__("random").Random(3)
    # zipf-ish: a few heavy keys over a long uniform tail
    keys = (["hot0"] * 4000 + ["hot1"] * 2500 + ["hot2"] * 1200
            + [f"tail{rng.randrange(3000)}" for _ in range(12000)])
    rng.shuffle(keys)
    truth = Counter(keys)
    n, cap = len(keys), 100

    from gencore_ray.functions.sketch import heavy_hitters

    ds = rd.from_items([{"k": k} for k in keys]).repartition(8)
    out = heavy_hitters(ds, "k", capacity=cap)
    err = out.attrs["max_err"]
    assert 0 < err <= n / (cap + 1)
    est = dict(zip(out["token"], out["est_count"]))
    for tok, e in est.items():
        assert e <= truth[tok]                     # never overcounts
        assert truth[tok] - e <= err               # within the bound
    for tok, c in truth.items():
        if c > err:
            assert tok in est                      # no false negatives
    assert {"hot0", "hot1", "hot2"} <= set(est)


def test_mg_merge_associative_error_accounting():
    from collections import Counter

    from gencore_ray.functions.sketch import mg_batch_summary, mg_merge

    import random

    rng = random.Random(11)
    stream = [f"k{rng.randrange(40)}" for _ in range(3000)]
    chunks = [stream[i::3] for i in range(3)]
    cap = 12
    parts = [mg_batch_summary(c, cap) for c in chunks]
    acc, err = {}, 0
    for counts, sub in parts:
        err += sub
        acc, sub2 = mg_merge(acc, counts, cap)
        err += sub2
    truth = Counter(stream)
    assert len(acc) <= cap
    assert err <= len(stream) / (cap + 1)
    for k, v in acc.items():
        assert v <= truth[k] and truth[k] - v <= err


def test_kll_rank_error_and_merge():
    import numpy as np

    from gencore_ray.functions.sketch import KLL

    rng = np.random.default_rng(5)
    data = np.concatenate([
        rng.exponential(10.0, 120000),        # heavy skew
        rng.normal(100.0, 3.0, 80000),
    ])
    srt = np.sort(data)
    n = len(data)

    def rank_err(sk):
        errs = []
        for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
            est = sk.quantile(q)
            true_rank = np.searchsorted(srt, est, side="right") / n
            errs.append(abs(true_rank - q))
        return max(errs)

    one = KLL(k=200)
    one.add_many(data)
    assert rank_err(one) < 0.025

    merged = KLL(k=200)
    for i in range(10):                        # distributed shape
        part = KLL(k=200)
        part.add_many(data[i::10])
        merged.merge(KLL.from_bytes(part.to_bytes()))  # via serialization
    assert merged.n == n
    assert rank_err(merged) < 0.025

    # deterministic: same input -> identical sketch state
    again = KLL(k=200)
    again.add_many(data)
    assert again.levels == one.levels


def test_kll_approx_quantiles_dataset(ray_session):
    import numpy as np
    import ray.data as rd

    from gencore_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(9)
    vals = rng.gamma(2.0, 50.0, 50000)
    ds = rd.from_items([{"v": float(x)} for x in vals]).repartition(8)
    est = approx_quantiles(ds, "v", [0.1, 0.5, 0.9], k=200)
    srt = np.sort(vals)
    for q, e in est.items():
        true_rank = np.searchsorted(srt, e, side="right") / len(vals)
        assert abs(true_rank - q) < 0.03, (q, e, true_rank)


def test_kll_edge_cases():
    import math

    import pytest

    from gencore_ray.functions.sketch import KLL

    with pytest.raises(ValueError):
        KLL(k=4)
    sk = KLL(k=16)
    assert math.isnan(sk.quantile(0.5))
    sk.add_many([float("nan"), 3.0])           # NaNs dropped
    assert sk.n == 1 and sk.quantile(0.5) == 3.0
    with pytest.raises(ValueError):
        sk.quantile(1.5)
    with pytest.raises(ValueError):
        sk.merge(KLL(k=32))


def test_heavy_hitters_reports_err_when_summary_collapses(ray_session):
    """A near-uniform batch with distincts >> capacity compresses to an
    EMPTY summary; the subtracted mass must still reach the driver so
    max_err stays honest (was silently dropped -> max_err == 0)."""
    import ray.data as rd

    from gencore_ray.functions.sketch import heavy_hitters

    rows = [{"k": f"u{i}"} for i in range(100)]        # all distinct
    out = heavy_hitters(rd.from_items(rows), "k", capacity=8)
    err = out.attrs["max_err"]
    assert 0 < err <= 100 / 9
    assert (out["est_count"] > 0).all()                # no carrier rows leak


def test_bm25_empty_corpus(ray_session):
    import ray.data as rd

    from gencore_ray.ops.search import bm25_topk

    docs = rd.from_items(
        [{"doc_id": i, "text": "beta"} for i in range(5)]
    ).filter(lambda r: r["doc_id"] > 99)               # nothing survives
    out = bm25_topk(docs, ["alpha"], k=3)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "score"]


def test_count_min_bounds_and_merge(ray_session):
    """CM never undercounts; overcount bounded by eps*n with high
    probability; distributed fold == single-box fold."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gencore_ray.functions.sketch import cm_batch, cm_count, cm_query

    rng = np.random.RandomState(7)
    # Zipf-ish: key k appears ~1000/k times
    keys = np.concatenate([np.full(1000 // (k + 1), k, dtype=np.int64)
                           for k in range(50)])
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    n = len(keys)
    true = pd.Series(keys).value_counts()
    qk = np.arange(50, dtype=np.int64)
    eps, delta = 0.01, 1e-3
    est = cm_count(rd.from_pandas(df).repartition(6), "k", qk,
                   eps=eps, delta=delta)
    tv = np.array([int(true.get(k, 0)) for k in qk])
    assert (est >= tv).all(), "count-min must never undercount"
    assert (est - tv <= eps * n + 1).all()  # the w=ceil(e/eps) guarantee

    # mergeability: sum of per-chunk grids == one-shot grid
    from gencore_ray.functions.sketch import cm_params
    d_, w_ = cm_params(eps, delta)
    g1 = cm_batch(keys[: n // 2].astype(np.uint64), d_, w_)
    g2 = cm_batch(keys[n // 2:].astype(np.uint64), d_, w_)
    g = cm_batch(keys.astype(np.uint64), d_, w_)
    assert (g1 + g2 == g).all()
    assert (cm_query(g1 + g2, qk.astype(np.uint64)) == est).all()


def test_dsir_logratios_separates_distributions(ray_session):
    """DSIR importance weights (ops/dsir.py): documents drawn from the
    target vocabulary must score strictly above documents drawn from
    the raw vocabulary — including a held-out doc whose LABEL is raw
    but whose CONTENT is target-like (the resampling use case)."""
    import pandas as pd

    from gencore_ray.ops.dsir import dsir_logratios

    rng = np.random.RandomState(3)
    tvocab = [f"alpha{i}" for i in range(40)]
    rvocab = [f"zulu{i}" for i in range(40)]

    def doc(vocab):
        return " ".join(rng.choice(vocab, size=30))

    rows = []
    for i in range(25):
        rows.append({"doc_id": i, "lang": "en", "text": doc(tvocab)})
    for i in range(25, 50):
        rows.append({"doc_id": i, "lang": "de", "text": doc(rvocab)})
    # held out: labelled raw, written in the target vocabulary
    rows.append({"doc_id": 50, "lang": "de", "text": doc(tvocab)})
    docs = rd.from_pandas(pd.DataFrame(rows))
    out = dsir_logratios(docs, target_col="lang", target_value="en",
                         num_parts=4).to_pandas().set_index("doc_id")
    t_scores = out.loc[range(25), "dsir_logratio"]
    r_scores = out.loc[range(25, 50), "dsir_logratio"]
    assert t_scores.min() > 0 > r_scores.max()
    held = float(out.loc[50, "dsir_logratio"])
    assert held > r_scores.max()     # content beats label
    assert len(out) == 51


def test_dsir_partition_invariance(ray_session):
    """DSIR weights must not depend on partitioning — same scores from
    1 and 7 exchange partitions, and from a re-blocked input."""
    import pandas as pd

    from gencore_ray.ops.dsir import dsir_logratios

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(60)]
    rows = [{"doc_id": i, "lang": ("en" if i % 3 else "de"),
             "text": " ".join(rng.choice(vocab, size=25))}
            for i in range(80)]
    df = pd.DataFrame(rows)
    a = dsir_logratios(rd.from_pandas(df), num_parts=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dsir_logratios(rd.from_pandas(df).repartition(7), num_parts=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_cluster_safe_split_no_leakage(ray_session):
    """Splitting on the dedup CLUSTER id must keep every member of a
    cluster in one split (the leakage-safe property), and the doc-id
    split must demonstrably violate it on planted near-dup clusters."""
    import pandas as pd

    from gencore_ray.config import DedupConfig
    from gencore_ray.corpus import generate_pages
    from gencore_ray.ops.split import hash_split
    from gencore_ray.pipelines.dedup import dedup_pages

    tbl = generate_pages(400, 21)
    res = dedup_pages(rd.from_arrow(tbl.select(
        ["url", "warc_ts", "text", "lang"])), DedupConfig())
    tagged = hash_split(res.clusters, "cluster_id", seed=42).to_pandas()
    per_cluster = tagged.groupby("cluster_id")["split"].nunique()
    assert per_cluster.max() == 1                  # zero leakage
    multi = tagged.groupby("cluster_id")["url"].transform("size") > 1
    assert multi.any()                             # real clusters exist
    # counter-example: url-keyed split scatters >=1 multi-cluster
    url_tagged = hash_split(res.clusters, "url", seed=42).to_pandas()
    leaks = url_tagged.groupby("cluster_id")["split"].nunique()
    assert leaks.max() > 1
    # all three splits materialise at cluster granularity
    assert set(tagged["split"].unique()) == {"train", "val", "test"}


def test_soft_dedup_commonness_orders_duplication(ray_session):
    """SoftDedup commonness (ops/softdedup.py): a doc repeated many
    times must score higher (closer to 0) than corpus-unique docs; a
    doc of half-shared / half-unique grams lands strictly between.
    Closed-form check on a planted corpus: distinct 3-grams of
    'a0 a1 ... a9' all have df = n_copies."""
    import pandas as pd

    from gencore_ray.ops.softdedup import commonness_scores

    common = " ".join(f"a{i}" for i in range(10))       # 8 distinct 3-grams
    rows = [{"doc_id": i, "text": common} for i in range(6)]
    rows += [{"doc_id": 10 + i,
              "text": " ".join(f"u{i}x{j}" for j in range(10))}
             for i in range(4)]
    # half common, half unique grams
    rows.append({"doc_id": 99,
                 "text": common + " " + " ".join(f"m{j}" for j in range(10))})
    out = commonness_scores(
        rd.from_pandas(pd.DataFrame(rows)), num_parts=3
    ).to_pandas().set_index("doc_id")
    n = 11.0
    # the 6 copies: every gram has df=7 (6 copies + the mixed doc)
    assert np.allclose(out.loc[range(6), "commonness"], np.log(7 / n),
                       atol=1e-6)
    # unique docs: every gram df=1
    assert np.allclose(out.loc[range(10, 14), "commonness"], np.log(1 / n),
                       atol=1e-6)
    mixed = float(out.loc[99, "commonness"])
    assert np.log(1 / n) < mixed < np.log(7 / n)
    assert int(out.loc[0, "n_grams"]) == 8
    # short docs (< 3 tokens) are excluded, matching the SQL twin
    out2 = commonness_scores(rd.from_pandas(pd.DataFrame(
        [{"doc_id": 0, "text": "one two"},
         {"doc_id": 1, "text": "x y z"}])), num_parts=2).to_pandas()
    assert out2["doc_id"].tolist() == [1]


def test_soft_dedup_partition_invariance(ray_session):
    """Commonness must not depend on partitioning: same scores from 1
    and 5 exchange partitions and from a re-blocked input."""
    import pandas as pd

    from gencore_ray.ops.softdedup import commonness_scores

    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(40)]
    rows = [{"doc_id": i, "text": " ".join(rng.choice(vocab, size=20))}
            for i in range(60)]
    df = pd.DataFrame(rows)
    a = commonness_scores(rd.from_pandas(df), num_parts=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = commonness_scores(
        rd.from_pandas(df).repartition(9), num_parts=5
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_domain_cap_top_k_per_group(ray_session):
    """Per-domain quota cap: top_k_per_group keyed on the extracted
    host keeps exactly min(k, n_domain) pages per domain, the longest
    ones, with the url tiebreak deterministic."""
    import pandas as pd

    rows = []
    for d in ("a.example", "b.example"):
        for i in range(7):
            rows.append({"domain": d, "url": f"http://{d}/p{i}",
                         "text_len": 100 + (i % 3)})
    rows.append({"domain": "c.example", "url": "http://c.example/only",
                 "text_len": 5})
    from gencore_ray.ops.relational import top_k_per_group

    out = top_k_per_group(
        rd.from_pandas(pd.DataFrame(rows)), ["domain"],
        ["text_len", "url"], k=5, descending=[True, False], num_parts=3
    ).to_pandas()
    sizes = out.groupby("domain").size().to_dict()
    assert sizes == {"a.example": 5, "b.example": 5, "c.example": 1}
    a = out[out["domain"] == "a.example"].sort_values(
        ["text_len", "url"], ascending=[False, True])
    # longest first; within equal length, lexicographically-first urls
    assert a["text_len"].tolist() == [102, 102, 101, 101, 100]
    assert a["url"].tolist() == [
        "http://a.example/p2", "http://a.example/p5",
        "http://a.example/p1", "http://a.example/p4",
        "http://a.example/p0"]


def test_collapse_repeated_lines_first_occurrence_order(ray_session):
    """Within-doc line collapse: later repeats drop, first occurrence
    and inter-line order survive, blank-line runs collapse to one."""
    import pandas as pd

    from gencore_ray.ops.linedup import collapse_repeated_lines

    docs = pd.DataFrame([
        {"doc_id": 0, "text": "nav\nbody one\nnav\nbody two\nnav"},
        {"doc_id": 1, "text": "only line"},
        {"doc_id": 2, "text": "a\n\nb\n\na\nb"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
    ])
    out = collapse_repeated_lines(rd.from_pandas(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "clean_text"] == "nav\nbody one\nbody two"
    assert int(out.loc[0, "n_lines"]) == 5
    assert int(out.loc[0, "n_collapsed"]) == 2
    assert out.loc[1, "clean_text"] == "only line"
    assert int(out.loc[1, "n_collapsed"]) == 0
    assert out.loc[2, "clean_text"] == "a\n\nb"   # '' dedups like any line
    assert int(out.loc[2, "n_collapsed"]) == 3
    assert out.loc[3, "clean_text"] == "" and int(out.loc[3, "n_lines"]) == 1
    assert out.loc[4, "clean_text"] == ""         # null -> empty doc
