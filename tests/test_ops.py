"""Unit tests for the training-data ops (relational, windows,
intervals, ann, textstats, multimodal) against in-process ground truth."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from gencore_ray.ops.ann import brute_force_topk, near_dup_pairs
from gencore_ray.ops.intervals import interval_lookup_join
from gencore_ray.ops.multimodal import MediaDecodeStage, decode_media, frame_sample_plan
from gencore_ray.ops.relational import broadcast_join, grouped_aggregate, topk
from gencore_ray.ops.textstats import text_stats
from gencore_ray.ops.windows import running_totals, session_windows, tumbling_window_agg
from gencore_ray.stages.exact import exact_edges
from gencore_ray.pipelines.dedup import compute_signatures
from gencore_ray.config import DedupConfig


@pytest.fixture
def events_df(ray_session):
    rng = np.random.RandomState(3)
    n = 400
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 10, size=n),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(np.sort(rng.randint(0, 86400 * 5, size=n)), unit="s"),
            "value": rng.rand(n) * 100,
        }
    )


def test_grouped_aggregate_matches_pandas(events_df):
    got = (
        grouped_aggregate(
            rd.from_pandas(events_df), ["user_id"],
            [("n", None, "count"), ("total", "value", "sum"),
             ("avg", "value", "mean"), ("lo", "value", "min"), ("hi", "value", "max")],
            num_parts=4,
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    want = (
        events_df.groupby("user_id")
        .agg(n=("value", "size"), total=("value", "sum"), avg=("value", "mean"),
             lo=("value", "min"), hi=("value", "max"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_broadcast_join(ray_session):
    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 2], "x": [10, 20, 30, 40]}))
    dim = pd.DataFrame({"k": [1, 2], "name": ["a", "b"]})
    got = broadcast_join(big, dim, key="k").to_pandas().sort_values("x")
    assert got["name"].tolist() == ["a", "b", "b"]


def test_topk_deterministic_ties(ray_session):
    df = pd.DataFrame({"id": [3, 1, 2, 4], "v": [9, 9, 9, 1]})
    got = topk(rd.from_pandas(df), ["v", "id"], 2, descending=[True, False]).to_pandas()
    assert got["id"].tolist() == [1, 2]


def test_session_windows_match_pandas(events_df):
    gap = pd.Timedelta(minutes=30)
    got = (
        session_windows(rd.from_pandas(events_df), gap=gap, num_parts=4)
        .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    df = events_df.sort_values(["user_id", "ts"])
    prev = df.groupby("user_id")["ts"].shift()
    brk = (prev.isna() | ((df["ts"] - prev) > gap)).astype(np.int64)
    df = df.assign(session_id=brk.groupby(df["user_id"]).cumsum())
    want = (
        df.groupby(["user_id", "session_id"])
        .agg(n_events=("ts", "size"), session_start=("ts", "min"), session_end=("ts", "max"))
        .reset_index().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_running_totals(events_df):
    got = (
        running_totals(rd.from_pandas(events_df), num_parts=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    df = events_df.sort_values(["user_id", "ts", "event_id"])
    want = df.assign(running_value=df.groupby("user_id")["value"].cumsum()).sort_values(
        "event_id"
    ).reset_index(drop=True)
    np.testing.assert_allclose(got["running_value"], want["running_value"])


def test_tumbling_window(events_df):
    got = tumbling_window_agg(rd.from_pandas(events_df), width="1d", num_parts=4).to_pandas()
    want = (
        events_df.assign(window_start=events_df["ts"].dt.floor("1d"))
        .groupby(["user_id", "window_start"])
        .agg(n_events=("ts", "size"), total_value=("value", "sum"))
        .reset_index()
    )
    got = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_interval_lookup_join(ray_session):
    iv = pd.DataFrame({"lo": [0.0, 10.0], "hi": [10.0, 20.0], "label": ["a", "b"]})
    ds = rd.from_pandas(pd.DataFrame({"value": [5.0, 10.0, 19.9, 25.0, -1.0]}))
    got = interval_lookup_join(ds, iv, "value").to_pandas()
    assert got.sort_values("value")["bucket"].tolist() == [None, "a", "b", "b", None]


def test_brute_force_topk_exact(ray_session):
    rng = np.random.RandomState(5)
    mat = rng.randn(300, 16).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(300), "embedding": list(mat)}))
    q = mat[7].astype(np.float64)
    got = brute_force_topk(ds, q, k=5).to_pandas()
    mn = mat.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    cos = np.round(mn @ (q / np.linalg.norm(q)), 6)
    want = np.lexsort((np.arange(300), -cos))[:5]
    assert got["vec_id"].tolist() == want.tolist()
    assert got["vec_id"].iloc[0] == 7  # self-match first


def test_near_dup_pairs_threshold(ray_session):
    base = np.eye(4, 8)
    mat = np.vstack([base, base[0] + 1e-6])  # row 4 ~ row 0
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(5), "embedding": list(mat)}))
    got = near_dup_pairs(ds, threshold=0.99).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == {(0, 4)}


def _planted_near_dups(n=120, d=16, n_dups=10, seed=9):
    """Random unit vectors + planted near-identical pairs (cos ~0.999)."""
    rng = np.random.RandomState(seed)
    mat = rng.randn(n, d)
    for i in range(n_dups):
        mat[n - n_dups + i] = mat[i] + 0.02 * rng.randn(d)
    return mat


def test_lsh_near_dup_matches_brute(ray_session):
    from gencore_ray.ops.ann import lsh_near_dup_pairs

    mat = _planted_near_dups()
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(mat)), "embedding": list(mat)})
    )
    bf = near_dup_pairs(ds, threshold=0.9).to_pandas()
    lsh = lsh_near_dup_pairs(ds, threshold=0.9).to_pandas()
    assert len(bf) >= 10
    bs = set(zip(bf["id_a"], bf["id_b"]))
    ls = set(zip(lsh["id_a"], lsh["id_b"]))
    assert ls <= bs                 # exact verify -> no false positives
    assert len(bs & ls) / len(bs) >= 0.99   # recall at cos>=0.9
    merged = lsh.merge(bf, on=["id_a", "id_b"], suffixes=("_l", "_b"))
    assert (merged["cos_sim_l"] == merged["cos_sim_b"]).all()


def test_near_dup_pairs_no_driver_matrix(ray_session):
    """Block-pair tasks must cover every cross-block pair: force many
    small blocks and check the result is identical to one block."""
    mat = _planted_near_dups(n=60, n_dups=6)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(mat)), "embedding": list(mat)})
    )
    one = near_dup_pairs(ds, threshold=0.9, num_blocks=1).to_pandas()
    many = near_dup_pairs(ds, threshold=0.9, num_blocks=7).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True),
    )


def test_ivf_random_sample_unbiased(ray_session):
    """ivf with nprobe == n_clusters equals exact brute force even on an
    adversarially SORTED input (limit()-based sampling would train all
    centroids on one cluster and mis-assign the rest)."""
    from gencore_ray.ops.ann import ivf_topk

    rng = np.random.RandomState(11)
    a = rng.randn(200, 8) + 4.0      # cluster A first in storage order
    b = rng.randn(200, 8) - 4.0
    mat = np.vstack([a, b])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(mat)), "embedding": list(mat)})
    )
    q = mat[350]
    exact = brute_force_topk(ds, q, k=5).to_pandas()
    ivf_all = ivf_topk(ds, q, k=5, n_clusters=4, nprobe=4,
                       sample_size=64).to_pandas()
    assert ivf_all["vec_id"].tolist() == exact["vec_id"].tolist()
    # approximate regime still finds the true top hit
    ivf_1 = ivf_topk(ds, q, k=5, n_clusters=4, nprobe=1,
                     sample_size=64).to_pandas()
    assert ivf_1["vec_id"].iloc[0] == exact["vec_id"].iloc[0]


def test_semi_anti_join(ray_session):
    from gencore_ray.stages.shuffle import hash_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")}))
    right = rd.from_pandas(pd.DataFrame({"rk": [2, 2, 4, 9]}))
    semi = hash_join(left, right, "k", "rk", num_parts=3, how="semi").to_pandas()
    anti = hash_join(left, right, "k", "rk", num_parts=3, how="anti").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3]
    assert list(semi.columns) == ["k", "v"]       # right payload never emitted


def test_top_k_per_group(ray_session):
    from gencore_ray.ops.relational import top_k_per_group

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 2,
        "score": [5, 3, 9, 9, 1, 2, 7],
        "id": list(range(7)),
    })
    got = top_k_per_group(rd.from_pandas(df), ["g"], ["score", "id"], k=2,
                          descending=[True, False], num_parts=3).to_pandas()
    got = got.sort_values(["g", "score", "id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    assert got[["g", "id"]].values.tolist() == [["a", 2], ["a", 3], ["b", 6], ["b", 5]]


def test_stratified_sample_deterministic(ray_session):
    from gencore_ray.ops.relational import stratified_sample

    df = pd.DataFrame({"g": ["x"] * 50 + ["y"] * 30,
                       "id": list(range(80))})
    ds = rd.from_pandas(df)
    s1 = stratified_sample(ds, ["g"], "id", 4, num_parts=3).to_pandas()
    s2 = stratified_sample(ds, ["g"], "id", 4, num_parts=5).to_pandas()
    key = ["g", "id"]
    assert sorted(map(tuple, s1[key].values.tolist())) == \
        sorted(map(tuple, s2[key].values.tolist()))          # partition-invariant
    assert s1.groupby("g").size().to_dict() == {"x": 4, "y": 4}
    # matches the closed-form hash ordering
    want = (df.assign(h=(df["id"] * 2654435761) % (1 << 32))
            .sort_values(["h", "id"]).groupby("g").head(4))
    assert sorted(s1["id"]) == sorted(want["id"])


def test_hll_approx_distinct(ray_session):
    """HLL within its theoretical error (~1.04/sqrt(m) ≈ 1.6% at p=12;
    assert 5% for slack) against exact distinct, and merge-order
    invariance of the registers."""
    from gencore_ray.functions.sketch import (
        approx_distinct, hll_estimate, hll_merge, hll_register_batch,
    )

    rng = np.random.RandomState(4)
    true_n = 20_000
    vals = rng.choice(true_n, size=60_000).astype(str)   # heavy repeats
    exact = len(set(vals.tolist()))
    ds = rd.from_pandas(pd.DataFrame({"user": vals}))
    est = approx_distinct(ds, "user", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # associativity/commutativity: any merge order gives the same registers
    a = hll_register_batch(vals[:20000])
    b = hll_register_batch(vals[20000:40000])
    c = hll_register_batch(vals[40000:])
    m1 = hll_merge(hll_merge(a, b), c)
    m2 = hll_merge(c, hll_merge(b, a))
    assert np.array_equal(m1, m2)
    assert abs(hll_estimate(m1) - exact) / exact < 0.05


def test_grouped_hll_distinct(ray_session):
    """Per-group HLL estimates within theory bounds; partitioning of
    the input must not change the estimates (register merges are
    associative/commutative)."""
    from gencore_ray.functions.sketch import grouped_approx_distinct

    rng = np.random.RandomState(11)
    g = rng.choice(["a", "b", "c"], size=30_000)
    cards = {"a": 5_000, "b": 300, "c": 12_000}
    v = np.array([f"{x}-{rng.randint(cards[x])}" for x in g])
    df = pd.DataFrame({"g": g, "v": v})
    exact = df.groupby("g")["v"].nunique().to_dict()
    ds = rd.from_pandas(df)
    out = (grouped_approx_distinct(ds, "g", "v", p=12, num_parts=4)
           .to_pandas().set_index("g")["approx_distinct"].to_dict())
    assert set(out) == set(exact)
    for k in exact:
        assert abs(out[k] - exact[k]) / exact[k] < 0.05, (k, out[k], exact[k])
    out2 = (grouped_approx_distinct(ds.repartition(13), "g", "v", p=12,
                                    num_parts=2)
            .to_pandas().set_index("g")["approx_distinct"].to_dict())
    assert out == out2       # partition-invariant


def test_semi_anti_join_null_keys(ray_session):
    """SQL NULL semantics: a NULL key matches nothing — semi drops
    null-key left rows, anti keeps them (NOT EXISTS is true)."""
    from gencore_ray.stages.shuffle import hash_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": pd.array([1, None, 3], dtype="Int64"), "v": list("abc")}
    ))
    right = rd.from_pandas(pd.DataFrame(
        {"rk": pd.array([1, None], dtype="Int64")}
    ))
    semi = hash_join(left, right, "k", "rk", num_parts=2, how="semi").to_pandas()
    anti = hash_join(left, right, "k", "rk", num_parts=2, how="anti").to_pandas()
    assert sorted(semi["v"]) == ["a"]
    assert sorted(anti["v"]) == ["b", "c"]


def test_hopping_window_agg(ray_session):
    from gencore_ray.ops.windows import hopping_window_agg

    ev = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:30", "2024-01-01 01:30",
                              "2024-01-01 05:10"]),
        "value": [1.0, 2.0, 4.0],
    })
    got = hopping_window_agg(rd.from_pandas(ev), width_hours=3, hop_hours=1) \
        .to_pandas().set_index("window_start").sort_index()
    # event at 00:30 lands in windows starting 22:00, 23:00, 00:00
    assert got.loc[pd.Timestamp("2024-01-01 00:00"), "n_events"] == 2
    assert got.loc[pd.Timestamp("2024-01-01 00:00"), "total_value"] == 3.0
    assert got.loc[pd.Timestamp("2023-12-31 23:00"), "n_events"] == 2
    assert got.loc[pd.Timestamp("2024-01-01 05:00"), "total_value"] == 4.0
    assert got["n_events"].sum() == 9             # 3 events x 3 windows


def test_grouped_quantiles_exact(ray_session):
    from gencore_ray.ops.relational import grouped_quantiles

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 500),
                       "v": rng.rand(500) * 100})
    ds = rd.from_pandas(df)
    got = grouped_quantiles(ds, ["k"], "v", [("p50", 0.5), ("p90", 0.9)],
                            num_parts=4).to_pandas().set_index("k")
    for k, g in df.groupby("k"):
        assert got.loc[k, "p50"] == round(float(np.percentile(g["v"], 50)), 6)
        assert got.loc[k, "p90"] == round(float(np.percentile(g["v"], 90)), 6)


def test_top_ngrams(ray_session):
    from gencore_ray.ops.relational import top_ngrams

    ds = rd.from_items([
        {"text": "one two three four five six"},     # 2 distinct 5-grams
        {"text": "one two three four five"},          # repeats the first
        {"text": "too short"},
    ])
    got = top_ngrams(ds, n=5, k=10).to_pandas()
    assert got.iloc[0]["ngram"] == "one two three four five"
    assert got.iloc[0]["n_occurrences"] == 2
    assert len(got) == 2


def test_bpe_token_counts():
    from gencore_ray.functions.text import bpe_token_counts, ws_token_counts

    assert bpe_token_counts(["Hello world, it's 42!"]).tolist() == [8]
    assert ws_token_counts(["Hello world, it's 42!", "", None]).tolist() == [4, 0, 0]


def test_text_stats_columns(ray_session):
    ds = rd.from_items([{"text": "Hello world AB12"}, {"text": ""}])
    got = text_stats(ds).to_pandas().sort_values("text_len", ascending=False)
    assert got["text_len"].tolist() == [16, 0]
    assert got["token_count"].tolist() == [3, 0]
    assert got["alnum_count"].tolist() == [14, 0]
    assert got["quality"].iloc[1] == 0.0


def test_multimodal_decode_stage(ray_session):
    """Real decode for supported containers, deterministic fake features
    for unknown bytes (default mode), strict raising on garbage."""
    from gencore_ray.functions.codecs import encode_png, encode_wav

    png = encode_png(np.full((4, 6, 3), 200, dtype=np.uint8))
    t = np.arange(1600) / 16000.0
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), sample_rate=16000)
    ds = rd.from_items([
        {"doc_id": 1, "payload": b"abc"},          # unknown -> fake features
        {"doc_id": 2, "payload": b""},
        {"doc_id": 3, "payload": png},             # real image decode
        {"doc_id": 4, "payload": wav},             # real audio decode
    ])
    got = decode_media(ds, batch_size=2, concurrency=1).to_pandas()
    got = got.sort_values("doc_id").set_index("doc_id")
    assert "payload" not in got.columns  # payload never leaves the stage
    assert got["byte_len"].loc[[1, 2]].tolist() == [3, 0]
    assert got.loc[1, "media_kind"] == "fake"
    assert got.loc[3, "media_kind"] == "png"
    assert (got.loc[3, "width"], got.loc[3, "height"]) == (6, 4)
    assert got.loc[3, "mean_value"] == 200.0       # pixel-level proof
    assert got.loc[4, "media_kind"] == "wav"
    assert got.loc[4, "sample_rate"] == 16000
    assert got.loc[4, "n_frames"] == 1600
    assert abs(got.loc[4, "mean_value"] - 0.5 / np.sqrt(2)) < 0.01  # RMS
    # strict mode: real decode for supported payloads...
    strict = MediaDecodeStage(strict=True)
    out = strict(
        rd.from_items([{"doc_id": 3, "payload": png}]).to_pandas().pipe(
            lambda df: __import__("pyarrow").table(
                {"doc_id": df["doc_id"], "payload": df["payload"]})
        )
    )
    assert out["media_kind"].to_pylist() == ["png"]
    # ...and a hard error on genuinely unsupported containers
    import pyarrow as _pa

    with pytest.raises(ValueError, match="unsupported media container"):
        strict(_pa.table({"doc_id": [9], "payload": [b"\xff\xd8garbage"]}))
    plan = frame_sample_plan(np.array([50, 10]), every=24)
    assert plan[0].tolist() == [0, 24, 48] and plan[1].tolist() == [0]


def test_exact_edges_operator(ray_session):
    sig = compute_signatures(
        rd.from_items(
            [
                {"url": "u3", "text": "same words in this doc"},
                {"url": "u1", "text": "same words in this doc"},
                {"url": "u2", "text": "same words in this doc"},
                {"url": "u9", "text": "entirely different content here"},
            ]
        ),
        DedupConfig(),
    )
    got = exact_edges(sig, num_parts=4).to_pandas().sort_values("url_b")
    assert got["url_a"].tolist() == ["u1", "u1"]
    assert got["url_b"].tolist() == ["u2", "u3"]


def test_brute_force_topk_batch_equals_single_runs(ray_session):
    """Batched multi-query ANN: one-scan results must equal Q separate
    single-query brute-force runs, per query (round-2 VERDICT #8)."""
    from gencore_ray.ops.ann import brute_force_topk_batch

    rng = np.random.RandomState(17)
    mat = rng.randn(400, 12).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(400), "embedding": list(mat)})
    queries = mat[[3, 99, 250]].astype(np.float64)
    got = brute_force_topk_batch(
        rd.from_pandas(df), queries, k=7,
        query_ids=np.array([3, 99, 250]),
    ).to_pandas()
    assert set(got["query_id"]) == {3, 99, 250}
    for qid, qv in zip([3, 99, 250], queries):
        single = brute_force_topk(
            rd.from_pandas(df), qv, k=7
        ).to_pandas()
        mine = got[got["query_id"] == qid].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert mine["vec_id"].tolist() == single["vec_id"].tolist(), qid
        assert mine["cos_sim"].tolist() == single["cos_sim"].tolist(), qid


def test_repetition_profile_matches_scalar(ray_session):
    """Gopher repetition signals vs a straightforward per-doc reference."""
    from collections import Counter

    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.textstats import repetition_profile

    docs = [
        "one two three\none two three\nunique line",        # dup line
        "spam ham spam ham spam ham spam",                  # heavy bigram
        "",                                                  # empty
        "single",                                            # 1 token
        "a b c d e f g h",                                   # all-distinct
        "x\nx\nx\nx",                                        # 3/4 dup lines
    ]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    got = repetition_profile(ds).to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(docs):
        lines = t.split("\n")
        want_dup = round((len(lines) - len(set(lines))) / len(lines), 6)
        toks = _TOKEN_RE.findall(t.lower())
        grams = Counter(zip(toks, toks[1:]))
        want_top = round(max(grams.values()) / sum(grams.values()), 6) if grams else 0.0
        assert got.loc[i, "n_lines"] == len(lines), i
        assert abs(got.loc[i, "dup_line_frac"] - want_dup) < 1e-9, i
        assert abs(got.loc[i, "top_bigram_frac"] - want_top) < 1e-9, i
    assert got.loc[1, "top_bigram_frac"] > 0.4                # spam-ham dominates
    assert got.loc[5, "dup_line_frac"] == 0.75


def test_corpus_filter_rules_and_precedence(ray_session):
    """Gopher-rules filter: every rule fires on its crafted doc, the
    FIRST failing rule wins (deterministic order), clean docs keep."""
    from gencore_ray.ops.textstats import corpus_filter

    clean = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    docs = {
        0: clean,                                            # ok
        1: "too few",                                        # too_few_tokens
        2: " ".join("supercalifragilistic" for _ in range(20)),  # mean_word_len (long)
        3: "!!! ??? *** " * 20 + "aa bb cc dd ee ff gg hh ii jj",  # alnum_ratio
        4: ("line one two three\n" * 3) + clean,             # dup_lines
        5: "spam ham " * 20,                                 # top_bigram
        # fails BOTH mean_word_len and top_bigram -> first rule wins
        6: "supercalifragilistically expialidocious " * 20,
    }
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs.items()])
    got = corpus_filter(ds, max_tokens=50).to_pandas().set_index("doc_id")
    assert got.loc[0, "reason"] == "ok" and bool(got.loc[0, "keep"])
    assert got.loc[1, "reason"] == "too_few_tokens"
    assert got.loc[2, "reason"] == "mean_word_len"
    assert got.loc[3, "reason"] == "alnum_ratio"
    assert got.loc[4, "reason"] == "dup_lines"
    assert got.loc[5, "reason"] == "top_bigram"
    assert got.loc[6, "reason"] == "mean_word_len"           # precedence
    assert not got.drop(index=0)["keep"].any()
    # max_tokens gate: clean doc trips too_many_tokens when capped low
    got2 = corpus_filter(ds, max_tokens=20).to_pandas().set_index("doc_id")
    assert got2.loc[0, "reason"] == "too_many_tokens"
    # signal columns ride along for downstream threshold tuning
    assert {"n_tokens", "mean_word_len", "alnum_ratio", "dup_line_frac",
            "top_bigram_frac"} <= set(got.columns)


def test_duplicate_span_stats_matches_brute_force(ray_session):
    """Cross-doc L-gram window dedup signal vs an all-pairs reference;
    within-doc-only repeats and sub-L docs must contribute nothing."""
    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.substrings import duplicate_span_stats

    docs = {
        0: " ".join(f"w{i}" for i in range(20)),              # shares w5..w12
        1: "x y z " + " ".join(f"w{i}" for i in range(5, 13)) + " q r s t",
        2: "unique words only here nothing shared at all ok",  # clean
        3: "short",                                            # < L tokens
        4: "rep rep rep rep rep rep rep rep rep",              # within-doc only
    }
    L = 4
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    got = (duplicate_span_stats(ds, span_tokens=L, num_parts=4)
           .to_pandas().set_index("doc_id").sort_index())
    grams = {d: [tuple(_TOKEN_RE.findall(t.lower())[i:i + L])
                 for i in range(len(_TOKEN_RE.findall(t.lower())) - L + 1)]
             for d, t in docs.items()}
    owners = {}
    for d, gs in grams.items():
        for g in set(gs):
            owners.setdefault(g, set()).add(d)
    for d, gs in grams.items():
        dup = sum(1 for g in gs if len(owners[g]) >= 2)
        assert got.loc[d, "n_windows"] == len(gs), d
        assert got.loc[d, "dup_windows"] == dup, d
        assert abs(got.loc[d, "dup_span_frac"]
                   - round(dup / max(len(gs), 1), 6)) < 1e-9, d
    assert got.loc[4, "dup_windows"] == 0          # within-doc not counted
    assert got.loc[3, "n_windows"] == 0            # sub-L doc: no windows


def test_lm_perplexity_closed_form(ray_session):
    """Unigram perplexity vs a Counter-based reference, including the
    <unk> fold at a tiny vocab cap and zero-token-doc exclusion."""
    import math
    from collections import Counter

    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.lm import lm_unigram_perplexity

    docs = {0: "the cat sat on the mat", 1: "the the the dog",
            2: "zebra quokka axolotl", 3: "", 4: "the cat"}
    cap = 3
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    got = (lm_unigram_perplexity(ds, vocab_cap=cap, num_parts=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert 3 not in got.index                      # zero-token doc dropped
    toks = {d: _TOKEN_RE.findall(t.lower()) for d, t in docs.items()}
    cnt = Counter(w for t in toks.values() for w in t)
    n = sum(cnt.values())
    topv = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:cap])
    cu = n - sum(topv.values())
    denom = n + len(topv) + 1.0
    for d, t in toks.items():
        if not t:
            continue
        lps = [math.log((topv.get(w, cu) + 1.0) / denom) for w in t]
        avg = sum(lps) / len(lps)
        assert got.loc[d, "n_tokens"] == len(t), d
        assert abs(got.loc[d, "avg_logp"] - round(avg, 6)) < 2e-6, d
        assert abs(got.loc[d, "perplexity"] - round(math.exp(-avg), 6)) < 2e-6, d
    # rarer-token docs must score strictly higher perplexity
    assert got.loc[2, "perplexity"] > got.loc[0, "perplexity"]


def _blob_corpus(n=300, n_dups=12, noise=0.7, seed=11):
    """3 separable gaussian blobs + planted near-identical pairs."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(3, 16)
    mat = np.vstack([centers[i % 3] + noise * rng.randn(16) for i in range(n)])
    for i in range(n_dups):
        mat = np.vstack([mat, mat[i] + 0.002 * rng.randn(16)])
    return mat


def test_kmeans_fit_matches_local_lloyd(ray_session):
    """Distributed partial-sum Lloyd == a local numpy replay with the
    same hash-min seeding and iteration count."""
    from gencore_ray.functions.hashing import U64, splitmix64
    from gencore_ray.ops.kmeans import kmeans_assign, kmeans_fit

    mat = _blob_corpus()
    ids = np.arange(len(mat))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(mat)}))
    cent = kmeans_fit(ds, k=3, iters=5)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)

    def unit(m):
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1
        return m / nrm

    h = splitmix64(ids.astype(np.int64).view(U64))
    c = unit(mat[np.lexsort((ids, h))[:3]].astype(np.float64))
    mm = unit(mat.astype(np.float64))
    for _ in range(5):
        a = np.argmax(mm @ c.T, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, mm)
        c = unit(np.where((np.bincount(a, minlength=3) > 0)[:, None], sums, c))
    assert np.allclose(cent, c, atol=1e-9)
    asg = kmeans_assign(ds, cent).to_pandas()
    assert len(asg) == len(mat)
    assert (asg["cluster_id"].to_numpy()
            == np.argmax(mm @ cent.T, axis=1)[asg["vec_id"].to_numpy()]).all()


def test_semantic_dedup_planted_recall(ray_session):
    """SemDeDup finds every planted near-identical pair with zero false
    positives and brute-force-identical cosines; blob pairs sit below
    the threshold so cluster-straddle cannot hide a true dup."""
    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    mat = _blob_corpus()
    ids = np.arange(len(mat))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(mat)}))
    sd = semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5,
                              num_parts=4).to_pandas()
    bf = near_dup_pairs(ds, threshold=0.95).to_pandas()
    bs, ss = set(zip(bf["id_a"], bf["id_b"])), set(zip(sd["id_a"], sd["id_b"]))
    assert {(i, 300 + i) for i in range(12)} <= bs
    assert ss == bs                                  # recall 1.0, no FPs
    m = sd.merge(bf, on=["id_a", "id_b"], suffixes=("_s", "_b"))
    assert (m["cos_sim_s"] == m["cos_sim_b"]).all()  # exact verify parity


def test_semantic_dedup_hot_cluster_cap(ray_session):
    """max_cluster_size subsamples deterministically instead of going
    quadratic on a hot cluster — output stays a subset of brute force."""
    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    mat = _blob_corpus()
    ids = np.arange(len(mat))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(mat)}))
    capped = semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5,
                                  num_parts=4, max_cluster_size=50).to_pandas()
    full = semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5,
                                num_parts=4).to_pandas()
    cs = set(zip(capped["id_a"], capped["id_b"]))
    fs = set(zip(full["id_a"], full["id_b"]))
    assert cs <= fs
    again = semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5,
                                 num_parts=4, max_cluster_size=50).to_pandas()
    assert cs == set(zip(again["id_a"], again["id_b"]))  # deterministic


def test_semantic_dedup_counted_caps_and_auto_k(ray_session):
    """The hot-cluster subsample is COUNTED (dropped_members /
    subsampled_clusters), never silent; k=None auto-scales with n."""
    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    mat = _blob_corpus()
    ids = np.arange(len(mat))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(mat)}))
    c = {}
    semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5, num_parts=4,
                         max_cluster_size=50, counters=c).to_pandas()
    assert c["n_docs"] == len(mat)
    assert c["k_used"] == 3
    assert c["subsampled_clusters"] >= 1
    # every member beyond the per-cluster cap is accounted for
    assert c["dropped_members"] == c["n_docs"] - min(len(mat), 50 * 3) \
        or c["dropped_members"] > 0
    # uncapped run: counters prove the cap was NOT hit
    c2 = {}
    semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5, num_parts=4,
                         counters=c2).to_pandas()
    assert c2["subsampled_clusters"] == 0 and c2["dropped_members"] == 0
    # auto-k: small corpus -> floor of 8; cap becomes the exception
    c3 = {}
    semantic_dedup_pairs(ds, threshold=0.95, iters=3, num_parts=4,
                         counters=c3).to_pandas()
    assert c3["k_used"] == 8


def test_gaussian_nb_matches_numpy_replay(ray_session):
    """Distributed moment-partial NB == a local closed-form fit, and it
    separates an obviously separable two-class corpus."""
    from gencore_ray.ops.classifier import gaussian_nb_scores

    rng = np.random.RandomState(4)
    n = 400
    y = rng.rand(n) < 0.4
    f1 = np.where(y, 100.0, 30.0) + rng.randn(n) * 5
    f2 = np.where(y, 10.0, 40.0) + rng.randn(n) * 3
    df = pd.DataFrame({"doc_id": np.arange(n), "lab": y, "f1": f1, "f2": f2})
    got = (gaussian_nb_scores(rd.from_pandas(df), ["f1", "f2"], "lab")
           .to_pandas().set_index("doc_id").sort_index())

    lo = np.zeros(n)
    n1, n0 = y.sum(), (~y).sum()
    for sign, mask, cnt in [(1.0, y, n1), (-1.0, ~y, n0)]:
        prior = np.log(cnt / n)
        ll = np.full(n, prior)
        for f in (f1, f2):
            mu = f[mask].sum() / cnt
            var = (f[mask] ** 2).sum() / cnt - mu ** 2 + 1e-6
            ll += -0.5 * np.log(2 * np.pi * var) - (f - mu) ** 2 / (2 * var)
        lo += sign * ll
    np.testing.assert_allclose(got["log_odds"].to_numpy(),
                               np.round(lo, 6), atol=1e-6)
    assert (got["pred"].to_numpy() == (lo > 0)).all()
    acc = (got["pred"].to_numpy() == y).mean()
    assert acc > 0.97                       # separable -> near-perfect

    one_class = df.assign(lab=True)
    with pytest.raises(ValueError):
        gaussian_nb_scores(rd.from_pandas(one_class), ["f1", "f2"], "lab")


def test_line_dedup_removes_boilerplate(ray_session):
    """CCNet-style line dedup: lines in >= min_docs distinct docs are
    removed everywhere, unique lines survive byte-identically in order,
    and within-doc-only repeats are NOT boilerplate."""
    from gencore_ray.ops.linedup import line_dedup

    banner = "accept cookies"
    docs = {
        0: f"{banner}\nalpha unique\nbeta unique",
        1: f"intro line\n{banner}\ngamma text",
        2: f"delta text\n{banner}",
        3: "solo doc no banner",
        4: "self\nself\nself",              # within-doc repeat only
        5: "",                               # empty doc
    }
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    got = (line_dedup(ds, min_docs=3, num_parts=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert got.loc[0, "clean_text"] == "alpha unique\nbeta unique"
    assert got.loc[1, "clean_text"] == "intro line\ngamma text"
    assert got.loc[2, "clean_text"] == "delta text"
    assert got.loc[3, "clean_text"] == docs[3]       # untouched
    assert got.loc[4, "clean_text"] == docs[4]       # 1 doc -> kept
    assert got.loc[5, "clean_text"] == ""
    assert got.loc[0, "n_lines"] == 3 and got.loc[0, "n_removed"] == 1
    assert got.loc[4, "n_removed"] == 0
    # min_docs=2: "self" still survives (distinct-DOC count is 1)
    got2 = (line_dedup(ds, min_docs=2, num_parts=4)
            .to_pandas().set_index("doc_id").sort_index())
    assert got2.loc[4, "clean_text"] == docs[4]


def test_line_dedup_exchange_is_slim(ray_session):
    """The exploded rows that ride the line-hash exchange carry NO
    text — only (id, line_no, lh) fixed-width columns.  At 100 TB the
    exchange mass is 20 B/line, not 2x the corpus bytes."""
    import pyarrow as pa

    from gencore_ray.ops.linedup import line_hash_rows

    big_line = "x" * 10_000
    ds = rd.from_items([{"doc_id": i, "text": f"{big_line}\nshort {i}"}
                        for i in range(20)])
    rows = line_hash_rows(ds).materialize()
    sch = rows.schema()
    for name, typ in zip(sch.names, sch.types):
        assert not pa.types.is_string(typ), (name, typ)
        assert not pa.types.is_large_string(typ), (name, typ)
        assert not pa.types.is_binary(typ), (name, typ)
    # 40 lines x ~20 B -- nowhere near the ~200 KB of corpus text
    assert rows.size_bytes() < 5_000, rows.size_bytes()


def test_curate_adaptive_ppl_threshold(ray_session):
    """ppl_drop_frac drops ~the requested tail of the corpus's own
    perplexity distribution regardless of its absolute level."""
    from gencore_ray.pipelines.curate import curate_documents

    rng = np.random.RandomState(6)
    vocab = [f"w{i}" for i in range(40)]
    docs = {d: " ".join(rng.choice(vocab, size=30).tolist())
            for d in range(50)}
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    got = (curate_documents(ds, ppl_drop_frac=0.2, vocab_cap=100,
                            num_parts=4).to_pandas())
    dropped = (got["reason"] == "high_perplexity").sum()
    # exact count depends on quantile ties; tail-drop must be ~20%
    assert 5 <= dropped <= 12, dropped
    # the dropped docs are exactly the highest-perplexity ones
    cut = got.loc[got["reason"] == "high_perplexity", "perplexity"].min()
    assert (got.loc[got["reason"] == "ok", "perplexity"] < cut).all()


def test_resilient_map_quarantines_poison_rows(ray_session, tmp_path):
    """Healthy rows flow through vectorized; poison rows land in the
    quarantine parquet with error strings; job never dies."""
    from gencore_ray.ops.resilient import resilient_map_batches

    qdir = str(tmp_path / "dead_letter")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if (df["x"] < 0).any():
            raise ValueError("negative x")
        return df.assign(y=df["x"] * 2)

    df = pd.DataFrame({"doc_id": range(10),
                       "x": [1, 2, -3, 4, 5, -6, 7, 8, 9, 10]})
    got = (resilient_map_batches(rd.from_pandas(df), fn, qdir)
           .to_pandas().sort_values("doc_id"))
    assert got["doc_id"].tolist() == [0, 1, 3, 4, 6, 7, 8, 9]
    assert (got["y"] == got["x"] * 2).all()
    quarantined = rd.read_parquet(qdir).to_pandas().sort_values("doc_id")
    assert quarantined["doc_id"].tolist() == [2, 5]
    assert quarantined["error"].str.contains("negative x").all()
    # no-failure path adds zero quarantine files
    import glob
    n_files = len(glob.glob(f"{qdir}/*.parquet"))
    clean = resilient_map_batches(
        rd.from_pandas(df.assign(x=df["x"].abs())), fn, qdir).to_pandas()
    assert len(clean) == 10
    assert len(glob.glob(f"{qdir}/*.parquet")) == n_files


def test_snapshot_diff_statuses(ray_session):
    """Four statuses over a crafted old/new pair; content compare, not
    identity (same id + same text = unchanged even if row moved)."""
    from gencore_ray.ops.relational import snapshot_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4, 5],
                        "text": ["b", "c CHANGED", "d", "e"]})
    got = (snapshot_diff(rd.from_pandas(old), rd.from_pandas(new),
                         num_parts=3)
           .to_pandas().set_index("doc_id")["status"].sort_index())
    assert got.to_dict() == {1: "removed", 2: "unchanged", 3: "changed",
                             4: "unchanged", 5: "added"}


def test_pair_agreement_stats(ray_session):
    """Rand/ARI vs hand-computed values; identical labelings give 1.0;
    the dedup use-case (pipeline clusters vs generator truth) too."""
    from gencore_ray.ops.relational import pair_agreement_stats

    # hand-checkable: a=[x,x,y,y], b=[1,2,1,2] -> contingency all 1s
    df = pd.DataFrame({"a": ["x", "x", "y", "y"], "b": [1, 2, 1, 2]})
    got = pair_agreement_stats(rd.from_pandas(df), "a", "b").to_pandas()
    assert got["n_rows"].iloc[0] == 4
    assert got["pairs_a"].iloc[0] == 2 and got["pairs_b"].iloc[0] == 2
    assert got["pairs_both"].iloc[0] == 0
    assert abs(got["rand_index"].iloc[0] - round((6 - 4) / 6, 6)) < 1e-9
    # ARI for independent labelings: (0 - 2*2/6) / (2 - 2*2/6)
    assert abs(got["adjusted_rand"].iloc[0] - round((-2 / 3) / (4 / 3), 6)) < 1e-9

    same = pair_agreement_stats(
        rd.from_pandas(df.assign(b=df["a"])), "a", "b").to_pandas()
    assert same["rand_index"].iloc[0] == 1.0
    assert same["adjusted_rand"].iloc[0] == 1.0

    # dedup evaluation: pipeline clusters vs generator truth -> ARI 1.0
    from gencore_ray.corpus import generate_pages
    from gencore_ray.pipelines.dedup import dedup_pages

    pages_tbl, truth = generate_pages(300, 11, with_truth=True)
    res = dedup_pages(
        rd.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"])),
        DedupConfig())
    pred = res.clusters.to_pandas()[["url", "cluster_id"]]
    joined = pred.merge(
        truth.to_pandas().rename(columns={"true_cluster": "truth"})
        [["url", "truth"]], on="url")
    score = pair_agreement_stats(
        rd.from_pandas(joined), "cluster_id", "truth").to_pandas()
    # truth includes planted near-dups BELOW the Jaccard threshold, so
    # perfect oracle parity still scores slightly under 1.0 vs truth
    assert score["adjusted_rand"].iloc[0] > 0.98


def test_ivf_persisted_index_roundtrip(ray_session, tmp_path):
    """Persisted IVF: full-probe query over the hive-partitioned index
    equals brute force exactly; partial probe reads only its cells."""
    import glob

    from gencore_ray.ops.ann import ivf_build, ivf_query

    rng = np.random.RandomState(3)
    mat = rng.randn(400, 16)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(400), "embedding": list(mat)}))
    idx = str(tmp_path / "ivf")
    cent = ivf_build(ds, idx, n_clusters=8)
    assert cent.shape[1] == 16
    assert len(glob.glob(f"{idx}/cells/ivf_cell=*")) >= 2
    q = mat[7]
    full = ivf_query(idx, q, k=5, nprobe=8).to_pandas()
    bf = brute_force_topk(ds, q, k=5).to_pandas()
    assert full["vec_id"].tolist() == bf["vec_id"].tolist()
    assert (full["cos_sim"] == bf["cos_sim"]).all()
    part = ivf_query(idx, q, k=5, nprobe=2).to_pandas()
    assert part["vec_id"].iloc[0] == 7          # self-match survives pruning
    assert set(part["vec_id"]) <= set(
        ivf_query(idx, q, k=400, nprobe=8).to_pandas()["vec_id"])


def test_profile_columns_nulls_and_types(ray_session):
    """Per-column profile: exact distincts (nulls excluded), null
    counts, numeric min/max, string columns get NULL min/max."""
    from gencore_ray.ops.relational import profile_columns

    df = pd.DataFrame({
        "i": [1, 2, 2, None, 3],
        "s": ["a", "a", None, "b", "c"],
        "f": [1.5, -2.25, 1.5, 1.5, None],
    })
    got = (profile_columns(rd.from_pandas(df), ["i", "s", "f"], num_parts=3)
           .to_pandas().set_index("column"))
    assert got.loc["i", "n_rows"] == 5 and got.loc["i", "n_nulls"] == 1
    assert got.loc["i", "n_distinct"] == 3
    assert got.loc["i", "min_num"] == 1.0 and got.loc["i", "max_num"] == 3.0
    assert got.loc["s", "n_distinct"] == 3 and got.loc["s", "n_nulls"] == 1
    assert pd.isna(got.loc["s", "min_num"])
    assert got.loc["f", "n_distinct"] == 2
    assert got.loc["f", "min_num"] == -2.25 and got.loc["f", "max_num"] == 1.5


def test_ppl_buckets_tertiles_per_lang(ray_session):
    """head/middle/tail assignment equals numpy tertiles computed per
    language on the rounded perplexities; thirds are balanced."""
    from gencore_ray.ops.lm import ppl_buckets

    rng = np.random.RandomState(8)
    vocab = {"en": [f"en{i}" for i in range(20)],
             "de": [f"de{i}" for i in range(20)]}
    docs = []
    for d in range(60):
        lang = "en" if d % 2 == 0 else "de"
        # vary rarity so perplexities spread within each language
        hi = 3 + (d % 10)
        words = [vocab[lang][rng.randint(0, hi)] for _ in range(15)]
        docs.append({"doc_id": d, "lang": lang, "text": " ".join(words)})
    ds = rd.from_items(docs)
    got = (ppl_buckets(ds, vocab_cap=100, num_parts=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert len(got) == 60
    for lang, grp in got.groupby("lang"):
        v = grp["perplexity"].to_numpy()
        p33 = round(float(np.percentile(v, 100 / 3, method="linear")), 6)
        p66 = round(float(np.percentile(v, 200 / 3, method="linear")), 6)
        want = np.where(v <= p33, "head",
                        np.where(v <= p66, "middle", "tail"))
        assert (grp["bucket"].to_numpy() == want).all(), lang
        counts = grp["bucket"].value_counts()
        assert counts.min() >= len(grp) // 3 - 2  # balanced thirds


def test_new_exchange_ops_partition_invariant(ray_session):
    """duplicate_span_stats / line_dedup / span_dedup_rewrite results
    must not depend on the exchange partition count (the global
    property each op's per-partition logic relies on)."""
    from gencore_ray.ops.linedup import line_dedup
    from gencore_ray.ops.substrings import (
        duplicate_span_stats, span_dedup_rewrite,
    )

    rng = np.random.RandomState(13)
    vocab = [f"tok{i}" for i in range(30)]
    docs = {}
    for d in range(20):
        words = list(rng.choice(vocab, size=rng.randint(5, 30)))
        docs[d] = " ".join(words)
    # plant a shared run + a shared line
    shared = "alpha beta gamma delta epsilon zeta"
    for d in (3, 7, 11):
        docs[d] = docs[d] + " " + shared
        docs[d] = "shared banner line\n" + docs[d]
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    for op, kw in [(duplicate_span_stats, {"span_tokens": 4}),
                   (span_dedup_rewrite, {"span_tokens": 4}),
                   (line_dedup, {"min_docs": 3})]:
        a = (op(ds, num_parts=2, **kw).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (op(ds, num_parts=9, **kw).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b, check_like=True)


def test_span_dedup_rewrite_owner_keeps(ray_session):
    """Owner doc (smallest id per gram) keeps its text; larger docs
    lose every token covered by a shared L-gram window; partial
    overlaps cut exactly the covered positions."""
    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.substrings import span_dedup_rewrite

    L = 4
    docs = {
        0: " ".join(f"w{i}" for i in range(12)),
        1: "x y z " + " ".join(f"w{i}" for i in range(4, 12)) + " q r",
        2: "unique text here totally fresh stuff",
        3: "tiny",
    }
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    got = (span_dedup_rewrite(ds, span_tokens=L, num_parts=4)
           .to_pandas().set_index("doc_id").sort_index())
    toks = {d: _TOKEN_RE.findall(t.lower()) for d, t in docs.items()}
    owners = {}
    for d in sorted(toks):
        for i in range(len(toks[d]) - L + 1):
            owners.setdefault(tuple(toks[d][i:i + L]), d)
    for d, t in toks.items():
        cut = [False] * len(t)
        for i in range(len(t) - L + 1):
            if owners[tuple(t[i:i + L])] < d:
                for j in range(i, i + L):
                    cut[j] = True
        want = " ".join(tok for tok, c in zip(t, cut) if not c)
        assert got.loc[d, "clean_text"] == want, d
        assert got.loc[d, "n_cut"] == sum(cut), d
        assert got.loc[d, "n_tokens"] == len(t), d
    assert got.loc[0, "n_cut"] == 0          # owner untouched
    assert got.loc[1, "n_cut"] == 8          # the shared w4..w11 run


def test_curation_pipeline_reason_priority(ray_session):
    """Composed curation verdict: exact_dup outranks gopher rules
    outranks high_perplexity; clean docs keep."""
    from gencore_ray.pipelines.curate import curate_documents

    clean = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    docs = {
        0: clean,                       # ok (common vocab, low ppl)
        1: clean,                       # exact dup of 0 -> exact_dup
        2: "tiny",                      # too_few_tokens
        3: "tiny",                      # dup of 2: exact_dup WINS over gopher
        # rare vocab -> high perplexity, passes gopher
        4: " ".join(f"zzqx{i} wwvy{i} kkjh{i}" for i in range(12)),
        5: "",                          # zero tokens -> too_few_tokens
    }
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])
    # corpus ppl baseline ~ uniform over the clean vocab; threshold set
    # between the clean docs' ppl and the rare-vocab doc's ppl
    probe = curate_documents(ds, ppl_threshold=1e18, num_parts=4,
                             vocab_cap=100).to_pandas().set_index("doc_id")
    thr = (probe.loc[0, "perplexity"] + probe.loc[4, "perplexity"]) / 2
    assert probe.loc[4, "perplexity"] > probe.loc[0, "perplexity"]
    got = curate_documents(ds, ppl_threshold=thr, num_parts=4,
                           vocab_cap=100).to_pandas().set_index("doc_id")
    assert got.loc[0, "reason"] == "ok" and bool(got.loc[0, "keep"])
    assert got.loc[1, "reason"] == "exact_dup"
    assert got.loc[2, "reason"] == "too_few_tokens"
    assert got.loc[3, "reason"] == "exact_dup"       # dup outranks gopher
    assert got.loc[4, "reason"] == "high_perplexity"
    assert got.loc[5, "reason"] == "too_few_tokens"  # no ppl row needed
    assert got.loc[5, "perplexity"] == 0.0
    assert not got.drop(index=0)["keep"].any()


def test_asof_join_matches_pandas(events_df):
    """Backward as-of join vs a global pandas merge_asof reference."""
    from gencore_ray.ops.relational import asof_join

    left = events_df[["event_id", "user_id", "ts", "value"]]
    right = (
        events_df[events_df["event_id"] % 3 == 0]
        .groupby(["user_id", "ts"], as_index=False)
        .agg(marker=("value", "max"))
    )
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="user_id", on="ts", num_parts=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "value", "marker"]],
        want[["event_id", "value", "marker"]],
        check_dtype=False,
    )
    with pytest.raises(ValueError, match="overlap"):
        asof_join(rd.from_pandas(left), rd.from_pandas(left),
                  by="user_id", on="ts")


def test_lag_lead_matches_pandas(events_df):
    from gencore_ray.ops.windows import lag_lead

    got = (
        lag_lead(rd.from_pandas(events_df), num_parts=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    want = events_df.sort_values(["user_id", "ts", "event_id"],
                                 kind="mergesort")
    g = want.groupby("user_id", sort=False)["value"]
    want = want.assign(prev_value=g.shift(1), next_value=g.shift(-1))
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "prev_value", "next_value"]],
        want[["event_id", "prev_value", "next_value"]],
        check_dtype=False,
    )


def test_group_ranks_ties(ray_session):
    from gencore_ray.ops.relational import group_ranks

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "k": ["a", "a", "a", "b", "b"],
        "v": [10, 10, 5, 7, 7],
    })
    got = (
        group_ranks(rd.from_pandas(df), "k", "v", "id", num_parts=3)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # k=a: v=10,10,5 -> row_number 1,2,3; rank 1,1,3; dense 1,1,2
    assert got["row_number"].tolist() == [1, 2, 3, 1, 2]
    assert got["rank"].tolist() == [1, 1, 3, 1, 1]
    assert got["dense_rank"].tolist() == [1, 1, 2, 1, 1]
    # percent_rank = (rank-1)/(n-1); cume_dist = max_rank/n (SQL defs)
    assert got["percent_rank"].tolist() == [0.0, 0.0, 1.0, 0.0, 0.0]
    assert got["cume_dist"].tolist() == [
        round(2 / 3, 6), round(2 / 3, 6), 1.0, 1.0, 1.0]
    # singleton group: percent_rank 0, cume_dist 1
    one = (group_ranks(rd.from_pandas(
        pd.DataFrame({"id": [9], "k": ["z"], "v": [1]})),
        "k", "v", "id", num_parts=2).to_pandas())
    assert one["percent_rank"].iloc[0] == 0.0
    assert one["cume_dist"].iloc[0] == 1.0


def test_ntile_exact_sql_semantics(ray_session):
    from gencore_ray.ops.relational import ntile

    # 10 rows, 4 buckets: sizes 3,3,2,2 (first rem=2 buckets get 3)
    df = pd.DataFrame({"id": range(10), "v": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]})
    got = (
        ntile(rd.from_pandas(df), "v", "id", 4, num_parts=3)
        .to_pandas().sort_values(["v", "id"]).reset_index(drop=True)
    )
    assert got["bucket"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # more buckets than rows: one row each, buckets 1..n_rows
    got2 = (
        ntile(rd.from_pandas(df.head(3)), "v", "id", 8, num_parts=2)
        .to_pandas().sort_values(["v", "id"]).reset_index(drop=True)
    )
    assert got2["bucket"].tolist() == [1, 2, 3]


def test_rollup_aggregate_levels(ray_session):
    from gencore_ray.ops.relational import rollup_aggregate

    df = pd.DataFrame({
        "a": ["x", "x", "y"], "b": [1, 2, 1], "v": [10.0, 20.0, 30.0],
    })
    got = rollup_aggregate(
        rd.from_pandas(df), ["a", "b"],
        [("n", None, "count"), ("mx", "v", "max")], num_parts=2,
    ).to_pandas()
    lvl0 = got[got["level"] == 0].sort_values(["a", "b"])
    assert lvl0["n"].tolist() == [1, 1, 1]
    lvl1 = got[got["level"] == 1].sort_values("a")
    assert lvl1["a"].tolist() == ["x", "y"]
    assert lvl1["b"].isna().all()
    assert lvl1["n"].tolist() == [2, 1]
    assert lvl1["mx"].tolist() == [20.0, 30.0]
    lvl2 = got[got["level"] == 2]
    assert len(lvl2) == 1 and lvl2["n"].iloc[0] == 3 and lvl2["mx"].iloc[0] == 30.0
    assert lvl2["a"].isna().all() and lvl2["b"].isna().all()
    with pytest.raises(ValueError, match="re-aggregatable"):
        rollup_aggregate(rd.from_pandas(df), ["a"], [("m", "v", "mean")])


def test_full_outer_join_null_keys(ray_session):
    from gencore_ray.stages.shuffle import hash_join

    a = pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64"),
                      "av": [10.0, 20.0, 30.0]})
    b = pd.DataFrame({"k2": pd.array([2, 4, None], dtype="Int64"),
                      "bv": [200.0, 400.0, 500.0]})
    got = hash_join(
        rd.from_pandas(a), rd.from_pandas(b), "k", "k2",
        num_parts=3, how="full_outer",
    ).to_pandas()
    # SQL semantics: NULL keys match nothing -> 5 rows
    # (1 matched, 1+1 left-only incl. null, 1+1 right-only incl. null)
    assert len(got) == 5
    m = got[got["k"] == 2]
    assert len(m) == 1 and m["av"].iloc[0] == 20.0 and m["bv"].iloc[0] == 200.0
    right_only = got[got["k"] == 4]
    assert len(right_only) == 1 and pd.isna(right_only["av"]).all()
    assert right_only["bv"].iloc[0] == 400.0
    # two distinct null-key rows survive unmatched
    nulls = got[got["k"].isna()]
    assert len(nulls) == 2
    assert sorted(x for x in nulls[["av", "bv"]].stack().tolist()) == [30.0, 500.0]


def test_pivot_counts(events_df):
    from gencore_ray.ops.relational import pivot_counts

    events_df = events_df.assign(
        event_type=np.array(["click", "view", "purchase"])[
            events_df["event_id"].to_numpy() % 3]
    )
    cats = sorted(events_df["event_type"].unique())
    got = (
        pivot_counts(rd.from_pandas(events_df), "user_id", "event_type",
                     cats, num_parts=4)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    want = (
        pd.crosstab(events_df["user_id"], events_df["event_type"])
        .reindex(columns=cats, fill_value=0)
    )
    for c in cats:
        assert got[f"n_{c}"].tolist() == want[c].tolist()


def test_winsorize_by_group(events_df):
    from gencore_ray.ops.relational import winsorize_by_group

    events_df = events_df.assign(
        event_type=np.array(["click", "view"])[
            events_df["event_id"].to_numpy() % 2]
    )
    got = (
        winsorize_by_group(
            rd.from_pandas(events_df[["event_id", "event_type", "value"]]),
            "event_type", "value", 0.1, 0.9, num_parts=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    q = events_df.groupby("event_type")["value"].quantile([0.1, 0.9]).unstack()
    for t, g in got.groupby("event_type"):
        lo, hi = q.loc[t, 0.1], q.loc[t, 0.9]
        assert (g["value_w"] >= round(lo, 6) - 1e-9).all()
        assert (g["value_w"] <= round(hi, 6) + 1e-9).all()
        inner = g[(g["value"] > lo) & (g["value"] < hi)]
        assert np.allclose(inner["value_w"], inner["value"].round(6))


def test_grouped_moments_matches_pandas(ray_session):
    """grouped_moments' merged partial sums must reproduce pandas'
    per-group mean/std/corr (round-6)."""
    from gencore_ray.ops.relational import grouped_moments

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=500),
        "x": rng.normal(100, 15, size=500),
        "y": rng.normal(5, 2, size=500),
    })
    got = (grouped_moments(rd.from_pandas(df), ["g"], "x", "y", num_parts=3)
           .to_pandas().set_index("g").sort_index())
    for g, sub in df.groupby("g"):
        assert got.loc[g, "n"] == len(sub)
        assert abs(got.loc[g, "x_mean"] - round(sub["x"].mean(), 6)) < 1e-9
        assert abs(got.loc[g, "x_std"] - round(sub["x"].std(ddof=1), 6)) < 1e-6
        assert abs(got.loc[g, "y_std"] - round(sub["y"].std(ddof=1), 6)) < 1e-6
        assert abs(got.loc[g, "corr_xy"] - round(sub["x"].corr(sub["y"]), 6)) < 1e-6
    # degenerate groups: n=1 and zero variance -> NULL std/corr
    tiny = pd.DataFrame({"g": ["s", "z", "z"], "x": [1.0, 2.0, 2.0],
                         "y": [3.0, 4.0, 5.0]})
    got2 = (grouped_moments(rd.from_pandas(tiny), ["g"], "x", "y", num_parts=1)
            .to_pandas().set_index("g"))
    assert np.isnan(got2.loc["s", "x_std"]) and np.isnan(got2.loc["s", "corr_xy"])
    assert np.isnan(got2.loc["z", "corr_xy"])  # x variance 0


def test_cube_aggregate_grouping_sets(ray_session):
    """CUBE(a, b) = 4 grouping sets with SQL GROUPING() bit values."""
    from gencore_ray.ops.relational import cube_aggregate

    df = pd.DataFrame({
        "a": ["x", "x", "y"], "b": [1, 2, 1], "v": [10.0, 20.0, 30.0],
    })
    got = cube_aggregate(
        rd.from_pandas(df), ["a", "b"],
        [("n", None, "count"), ("mx", "v", "max")], num_parts=2,
    ).to_pandas()
    assert sorted(got["grouping_id"].unique().tolist()) == [0, 1, 2, 3]
    finest = got[got["grouping_id"] == 0]
    assert len(finest) == 3 and finest["n"].tolist() == [1, 1, 1]
    by_a = got[got["grouping_id"] == 1].sort_values("a")   # b rolled up
    assert by_a["a"].tolist() == ["x", "y"] and by_a["b"].isna().all()
    assert by_a["n"].tolist() == [2, 1] and by_a["mx"].tolist() == [20.0, 30.0]
    by_b = got[got["grouping_id"] == 2].sort_values("b")   # a rolled up
    assert by_b["b"].tolist() == [1, 2] and by_b["a"].isna().all()
    assert by_b["n"].tolist() == [2, 1]
    total = got[got["grouping_id"] == 3]
    assert len(total) == 1 and total["n"].iloc[0] == 3 and total["mx"].iloc[0] == 30.0


def test_priority_sample_deterministic_and_weighted(ray_session):
    """Priority sampling: exact local replay (pure function of
    (id, weight)) and weight-proportional inclusion."""
    from gencore_ray.ops.relational import priority_sample

    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "w": np.where(np.arange(n) % 2 == 0, 100.0, 1.0),
    })
    got = priority_sample(rd.from_pandas(df), "id", "w", k=100).to_pandas()
    # local replay
    u = ((df["id"].to_numpy().astype(np.uint64) % np.uint64(1 << 32))
         * np.uint64(2654435761)) % np.uint64(1 << 32)
    pri = (u.astype(np.float64) + 1.0) / df["w"].to_numpy()
    want = df.assign(priority=pri).sort_values(["priority", "id"]).head(100)
    assert got["id"].tolist() == want["id"].tolist()
    assert np.allclose(got["priority"].to_numpy(), want["priority"].to_numpy())
    # heavy rows (weight 100) dominate the sample
    assert (got["w"] == 100.0).mean() > 0.9


def test_grouped_quantiles_compact_equals_plain(ray_session):
    """Value-count compaction must give the same linear-interpolated
    quantiles as the row-shuffling operator on a discrete column."""
    from gencore_ray.ops.relational import grouped_quantiles, grouped_quantiles_compact

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], size=400),
        "v": rng.integers(0, 25, size=400).astype(np.int64),
    })
    qs = [("p25", 0.25), ("p50", 0.5), ("p90", 0.9)]
    plain = (grouped_quantiles(rd.from_pandas(df), ["g"], "v", qs, num_parts=2)
             .to_pandas().sort_values("g").reset_index(drop=True))
    compact = (grouped_quantiles_compact(rd.from_pandas(df), ["g"], "v", qs,
                                         num_parts=2)
               .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, compact)


def test_tfidf_broadcast_and_shuffle_paths_equal(ray_session):
    """Both DF-distribution strategies must produce identical top-k,
    and match a scalar reference."""
    from collections import Counter
    from math import log

    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.textstats import tfidf_top_terms

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick red fox",
        "lorem ipsum dolor sit amet the",
        "quick quick quick brown",
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    k = 3

    def norm(out):
        return (out.to_pandas()
                .sort_values(["doc_id", "term"]).reset_index(drop=True)
                [["doc_id", "term", "tf", "df", "tfidf"]]
                .astype({"tf": "int64", "df": "int64"}))

    bcast = norm(tfidf_top_terms(rd.from_pandas(df), k=k, num_parts=2))
    shuf = norm(tfidf_top_terms(rd.from_pandas(df), k=k, num_parts=2,
                                broadcast_df=False))
    pd.testing.assert_frame_equal(bcast, shuf)

    # scalar reference
    toks = [_TOKEN_RE.findall(t.lower()) for t in texts]
    dfc = Counter()
    for t in toks:
        dfc.update(set(t))
    n = len(texts)
    for d, t in enumerate(toks):
        tf = Counter(t)
        scored = sorted(
            ((round(c * log(n / dfc[w]), 6), w) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]))[:k]
        got_d = bcast[bcast["doc_id"] == d]
        assert sorted(got_d["term"]) == sorted(w for _, w in scored), d
        for s, w in scored:
            assert abs(got_d[got_d["term"] == w]["tfidf"].iloc[0] - s) < 1e-9


def test_json_int_field(ray_session):
    from gencore_ray.ops.jsonops import json_int_field

    df = pd.DataFrame({"p": ['{"k": 42}', '{"x": 1}', '{"k": -7, "j": 2}',
                             None, '{"k":0}']})
    got = json_int_field(rd.from_pandas(df), "p", "k", "k").to_pandas()
    assert got["k"].tolist()[0] == 42
    assert pd.isna(got["k"].iloc[1])
    assert got["k"].iloc[2] == -7
    assert pd.isna(got["k"].iloc[3])
    assert got["k"].iloc[4] == 0


# --- round-4 ADVICE regression tests ---------------------------------

def test_ivf_rebuild_clears_stale_cells(ray_session, tmp_path):
    """Rebuilding an IVF index into the same directory must not leave
    the previous build's vectors inside the hive cells (parquet names
    are unique per run, so without a clear they'd survive and be
    scored against the NEW centroids)."""
    import glob

    from gencore_ray.ops.ann import ivf_build, ivf_query

    rng = np.random.RandomState(9)
    idx = str(tmp_path / "ivf")
    big = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(300), "embedding": list(rng.randn(300, 8))}))
    ivf_build(big, idx, n_clusters=4)
    small_mat = rng.randn(50, 8)
    small = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(1000, 1050), "embedding": list(small_mat)}))
    ivf_build(small, idx, n_clusters=4)
    files = glob.glob(f"{idx}/cells/ivf_cell=*/*.parquet")
    n_indexed = sum(len(pd.read_parquet(f)) for f in files)
    assert n_indexed == 50
    got = ivf_query(idx, small_mat[3], k=10, nprobe=4).to_pandas()
    assert set(got["vec_id"]) <= set(range(1000, 1050))
    assert got["vec_id"].iloc[0] == 1003


def test_curate_no_perplexity_gate(ray_session):
    """ppl_threshold=None + ppl_drop_frac=None means NO perplexity
    gate (not a TypeError inside the remote verdict map)."""
    from gencore_ray.pipelines.curate import curate_documents

    ds = rd.from_items([
        {"doc_id": i,
         "text": " ".join(f"w{j}" for j in range(i % 7, i % 7 + 60))}
        for i in range(20)])
    got = curate_documents(ds, ppl_threshold=None, num_parts=2).to_pandas()
    assert len(got) == 20
    assert not (got["reason"] == "high_perplexity").any()


def test_fingerprint_ignores_execution_knobs():
    """Pure performance knobs (result-identical by test) must not
    invalidate checkpoint manifests / incremental state."""
    base = DedupConfig()
    perf = DedupConfig(bloom_prefilter="on", pair_num_partitions=7,
                       sig_batch_size=64, join_num_partitions=3,
                       sig_concurrency=2)
    assert base.fingerprint() == perf.fingerprint()
    assert base.fingerprint() != DedupConfig(
        jaccard_threshold=0.8).fingerprint()
    assert base.fingerprint() != DedupConfig(
        bands=16, rows_per_band=8).fingerprint()


def test_resilient_map_quarantines_pristine_rows(ray_session, tmp_path):
    """A fn that mutates its frame in place BEFORE raising must not
    leak partially-mutated values into the quarantine parquet or the
    per-row retries."""
    from gencore_ray.ops.resilient import resilient_map_batches

    qdir = str(tmp_path / "dead_letter")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df["x"] = df["x"] * 10            # in-place mutation...
        if (df["x"] < 0).any():
            raise ValueError("negative x")  # ...then the raise
        return df

    src = pd.DataFrame({"doc_id": range(6), "x": [1, 2, -3, 4, -5, 6]})
    got = (resilient_map_batches(rd.from_pandas(src), fn, qdir)
           .to_pandas().sort_values("doc_id"))
    # healthy rows: exactly one application of fn (x*10), not two
    assert got["x"].tolist() == [10, 20, 40, 60]
    q = rd.read_parquet(qdir).to_pandas().sort_values("doc_id")
    # quarantined rows carry the PRISTINE input values
    assert q["doc_id"].tolist() == [2, 4]
    assert q["x"].tolist() == [-3, -5]


def test_priority_sample_rejects_nonpositive_weights(ray_session):
    """Zero/negative weights are a loud ValueError, not a silent
    never-sampled / always-wins row."""
    from gencore_ray.ops.relational import priority_sample

    df = pd.DataFrame({"doc_id": range(5), "w": [1.0, 2.0, 0.0, 3.0, 4.0]})
    with pytest.raises(Exception, match="strictly positive"):
        priority_sample(rd.from_pandas(df), "doc_id", "w", 3).to_pandas()
    neg = df.assign(w=[1.0, 2.0, -1.0, 3.0, 4.0])
    with pytest.raises(Exception, match="strictly positive"):
        priority_sample(rd.from_pandas(neg), "doc_id", "w", 3).to_pandas()


def test_repeated_gram_prefilter_equivalent_and_cuts_rows(ray_session):
    """The repeated-gram Bloom prefilter is result-IDENTICAL for both
    span ops (no false negatives by construction) and cuts the window
    exchange by the unique-gram fraction."""
    import ray

    from gencore_ray.ops.substrings import (
        duplicate_span_stats, repeated_gram_bloom, span_dedup_rewrite,
        span_window_rows, token_hash_table)

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(4000)]
    shared = " ".join(rng.choice(vocab, size=30).tolist())
    docs = {}
    for d in range(60):
        body = " ".join(rng.choice(vocab, size=120).tolist())
        # every third doc embeds the shared 30-token span
        docs[d] = f"{body} {shared}" if d % 3 == 0 else body
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in docs.items()])

    ht = token_hash_table(ds)
    full = span_window_rows(ht).count()
    bloom = repeated_gram_bloom(ht, 8)
    filt = span_window_rows(ht, bloom_ref=ray.put(bloom)).count()
    assert filt < full / 2, (full, filt)       # most grams are unique

    for fn in (span_dedup_rewrite, duplicate_span_stats):
        on = (fn(ds, num_parts=4, prefilter="on")
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        off = (fn(ds, num_parts=4, prefilter="off")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(on, off)
    # the planted span was actually cut from the non-owner docs
    rw = (span_dedup_rewrite(ds, num_parts=4, prefilter="on")
          .to_pandas().set_index("doc_id"))
    owners = [d for d in docs if d % 3 == 0]
    assert (rw.loc[owners[1:], "n_cut"] >= 30 - 8).all()
    assert rw.loc[owners[0], "n_cut"] == 0     # owner keeps its copy


def test_hashing_embedder_matches_manual_and_is_batch_invariant(ray_session):
    """The actor-pool embed stage (ST1: model in __init__, inference in
    __call__) reproduces the closed-form hashing-trick embedding and is
    invariant to batch size / empty and null texts."""
    from gencore_ray.functions.embed import HashingEmbedder, embed_texts, md5_low64

    texts = {0: "hello world alpha beta", 1: "", 2: None,
             3: "hello hello HELLO x9 _u", 4: "solo"}
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in texts.items()])
    got = (embed_texts(ds, dim=16, concurrency=2, batch_size=2)
           .to_pandas().set_index("doc_id").sort_index())

    def manual(t):
        import re
        e = np.zeros(16, dtype=np.int64)
        for tok in re.findall(r"\w+", (t or "").lower()):
            h = md5_low64(tok)
            e[h % 16] += 1 if ((h // 16) % 2) == 0 else -1
        return e.tolist()

    for d, t in texts.items():
        assert list(got.loc[d, "embedding"]) == manual(t), d
    # batch-size invariance
    one = (embed_texts(ds, dim=16, concurrency=1, batch_size=100)
           .to_pandas().set_index("doc_id").sort_index())
    for d in texts:
        assert list(one.loc[d, "embedding"]) == list(got.loc[d, "embedding"])
    with pytest.raises(ValueError, match="power of two"):
        HashingEmbedder(dim=10)


def test_semantic_dedup_multiprobe_superset(ray_session):
    """probes>1 can only ADD pairs (boundary rescue), never lose or
    duplicate them."""
    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    mat = _blob_corpus()
    ids = np.arange(len(mat))
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(mat)}))
    p1 = semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5,
                              num_parts=4, probes=1).to_pandas()
    p2 = semantic_dedup_pairs(ds, threshold=0.95, k=3, iters=5,
                              num_parts=4, probes=2).to_pandas()
    s1 = set(zip(p1.id_a, p1.id_b))
    s2 = set(zip(p2.id_a, p2.id_b))
    assert s1 <= s2
    assert len(p2) == len(s2)            # deduped: no repeated pairs
