"""End-to-end pipeline correctness vs the brute-force oracle
(FIXTURES.md §2) plus stage-level behavior: exact dedup, rep-election
tie-breaks, distributed CC equality, checkpoint resume."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.corpus import generate_pages
from gencore_ray.oracle import oracle_edges, oracle_jaccard_pairs, union_find_clusters
from gencore_ray.pipelines.dedup import compute_signatures, dedup_pages
from gencore_ray.stages.elect import elect_representatives
from gencore_ray.stages.exact import exact_dedup

N_PAGES = 300
CFG = DedupConfig()


@pytest.fixture(scope="module")
def corpus(ray_session):
    pages_tbl, truth = generate_pages(N_PAGES, 42, with_truth=True)
    return pages_tbl, truth


@pytest.fixture(scope="module")
def engine_clusters(corpus):
    pages_tbl, _ = corpus
    pages = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))
    res = dedup_pages(pages, CFG, cc_mode="driver")
    return res.clusters.to_pandas()


@pytest.fixture(scope="module")
def oracle_result(corpus):
    pages_tbl, _ = corpus
    ids = pages_tbl["url"].to_pylist()
    texts = pages_tbl["text"].to_pylist()
    edges = oracle_edges(ids, texts, CFG)
    return ids, texts, edges, union_find_clusters(ids, edges)


def test_cluster_parity_with_oracle(engine_clusters, oracle_result):
    ids, _, _, oclust = oracle_result
    eng = dict(zip(engine_clusters["url"], engine_clusters["cluster_id"]))
    mismatches = [u for u in ids if eng.get(u) != oclust[u]]
    assert mismatches == []


def test_dup_pair_recall(engine_clusters, oracle_result):
    ids, texts, _, _ = oracle_result
    jp = oracle_jaccard_pairs(ids, texts, CFG)
    eng = dict(zip(engine_clusters["url"], engine_clusters["cluster_id"]))
    hits = sum(1 for a, b, _ in jp if eng[a] == eng[b])
    assert len(jp) > 50  # corpus actually plants duplicates
    assert hits / len(jp) >= 0.99


def test_every_cluster_has_exactly_one_rep(engine_clusters):
    reps = engine_clusters.groupby("cluster_id")["is_representative"].sum()
    assert (reps == 1).all()


def test_cluster_sizes_consistent(engine_clusters):
    sizes = engine_clusters.groupby("cluster_id").size()
    for cid, grp in engine_clusters.groupby("cluster_id"):
        assert (grp["cluster_size"] == sizes[cid]).all()


def test_empty_and_short_pages_are_singletons(engine_clusters, corpus):
    _, truth = corpus
    tdf = truth.to_pandas()
    eng = engine_clusters.set_index("url")
    for u in tdf.loc[tdf["kind"] == "empty", "url"]:
        assert eng.loc[u, "cluster_size"] == 1


def test_distributed_cc_matches_driver(corpus):
    pages_tbl, _ = corpus
    pages = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))
    d = dedup_pages(pages, CFG, cc_mode="driver").clusters.to_pandas()
    x = dedup_pages(pages, CFG, cc_mode="distributed").clusters.to_pandas()
    md = dict(zip(d["url"], d["cluster_id"]))
    mx = dict(zip(x["url"], x["cluster_id"]))
    assert md == mx


def test_checkpoint_resume_identical(corpus, tmp_path):
    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 120)
    pages = rd.from_arrow(small.select(["url", "warc_ts", "text", "lang"]))
    ck = str(tmp_path / "ckpt")
    d1 = dedup_pages(pages, CFG, checkpoint_dir=ck).clusters.to_pandas()
    # resume: stages reload from manifest; result identical
    d2 = dedup_pages(pages, CFG, checkpoint_dir=ck).clusters.to_pandas()
    s1 = d1.sort_values("url").reset_index(drop=True)
    s2 = d2.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2)
    manifest = os.path.join(ck, "manifest.jsonl")
    assert os.path.exists(manifest)
    assert sum(1 for _ in open(manifest)) >= 4  # one record per stage


def test_resume_after_partial_failure(corpus, tmp_path):
    """Kill after stage 'candidate_pairs' (delete later checkpoints);
    resume equals the single-shot run (FIXTURES.md §3 manifest/resume)."""
    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 120)
    pages = rd.from_arrow(small.select(["url", "warc_ts", "text", "lang"]))
    ck = str(tmp_path / "ckpt2")
    full = dedup_pages(pages, CFG, checkpoint_dir=ck).clusters.to_pandas()
    # simulate mid-pipeline crash: drop the last two stage outputs
    for stage in ["verified_edges", "clusters"]:
        shutil.rmtree(os.path.join(ck, stage), ignore_errors=True)
    resumed = dedup_pages(pages, CFG, checkpoint_dir=ck).clusters.to_pandas()
    pd.testing.assert_frame_equal(
        full.sort_values("url").reset_index(drop=True),
        resumed.sort_values("url").reset_index(drop=True),
    )


def test_substring_dup_pairs_finds_planted(corpus, ray_session):
    """Every planted substring cluster (one page is a paragraph-slice of
    another) must yield its exact-substring pair; no false positives
    against the brute-force text check."""
    from gencore_ray.ops.substrings import substring_dup_pairs

    pages_tbl, truth = corpus
    pages = rd.from_arrow(pages_tbl.select(["url", "text"]))
    got = substring_dup_pairs(pages, CFG).to_pandas()
    found = set(zip(got["url_a"], got["url_b"]))
    # brute-force ground truth over the whole corpus
    urls = pages_tbl["url"].to_pylist()
    texts = pages_tbl["text"].to_pylist()
    from gencore_ray.functions.text import tokenize

    toks = [tokenize(t or "") for t in texts]
    joined = [" " + " ".join(tl) + " " for tl in toks]
    want = set()
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            ja, jb = joined[i], joined[j]
            if (len(toks[i]) >= CFG.shingle_k and len(toks[j]) >= CFG.shingle_k
                    and ja != jb and (ja in jb or jb in ja)):
                want.add(tuple(sorted((urls[i], urls[j]))))
    assert found == want
    # sanity: the planted substring clusters are represented
    kinds = dict(zip(truth["url"].to_pylist(), truth["kind"].to_pylist()))
    assert any(kinds.get(a) == "substring" or kinds.get(b) == "substring"
               for a, b in found)


def test_cross_process_determinism(tmp_path):
    """Two FRESH Ray sessions (separate processes) must produce
    byte-identical cluster tables — the engine's analogue of gencore's
    deterministic-map-iteration guarantee (src/gencore.cpp:325-385)."""
    import subprocess
    import sys

    script = r"""
import sys, ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
sys.path.insert(0, "/root/repo")
from gencore_ray.corpus import generate_pages
from gencore_ray.config import DedupConfig
from gencore_ray.pipelines.dedup import dedup_pages
pages = generate_pages(150, seed=9)
res = dedup_pages(rd.from_arrow(pages.select(["url","warc_ts","text","lang"])), DedupConfig())
df = res.clusters.to_pandas().sort_values("url").reset_index(drop=True)
df.to_parquet(sys.argv[1])
ray.shutdown()
"""
    outs = []
    for i in range(2):
        out = str(tmp_path / f"run{i}.parquet")
        subprocess.run([sys.executable, "-c", script, out], check=True,
                       capture_output=True)
        outs.append(pd.read_parquet(out))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_containment_disabled_still_finds_near_dups(corpus, ray_session):
    """containment_enabled=False drops the sketch keys from the explode
    (-38% shuffle rows); near-dup clusters must still resolve via the
    MinHash bands."""
    pages_tbl, truth = corpus
    pages = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))
    cfg = DedupConfig(containment_enabled=False)
    out = dedup_pages(pages, cfg).clusters.to_pandas()
    eng = dict(zip(out["url"], out["cluster_id"]))
    tdf = truth.to_pandas()
    # every exact/near true-cluster must collapse to ONE engine cluster
    sel = tdf[tdf["kind"].isin(["exact", "near"])]
    for tc, grp in sel.groupby("true_cluster"):
        labels = {eng[u] for u in grp["url"]}
        assert len(labels) == 1, f"true cluster {tc} split into {labels}"


def test_consensus_synthesis_vote(ray_session):
    """G6: per-position quality-weighted token vote over cluster members
    (hand-computed fixture mirroring gencore's consensus semantics)."""
    from gencore_ray.stages.consensus import synthesize_clusters

    clusters = rd.from_items([
        # majority cluster: 2 of 3 agree at position 1
        {"url": "m1", "cluster_id": "m1", "cluster_size": 3,
         "is_representative": True, "quality": 0.5, "text_len": 5},
        {"url": "m2", "cluster_id": "m1", "cluster_size": 3,
         "is_representative": False, "quality": 0.5, "text_len": 5},
        {"url": "m3", "cluster_id": "m1", "cluster_size": 3,
         "is_representative": False, "quality": 0.5, "text_len": 5},
        # weighted cluster: one high-quality member outvotes two low
        {"url": "w1", "cluster_id": "w1", "cluster_size": 3,
         "is_representative": True, "quality": 0.9, "text_len": 5},
        {"url": "w2", "cluster_id": "w1", "cluster_size": 3,
         "is_representative": False, "quality": 0.2, "text_len": 5},
        {"url": "w3", "cluster_id": "w1", "cluster_size": 3,
         "is_representative": False, "quality": 0.2, "text_len": 5},
        # singleton passthrough
        {"url": "s1", "cluster_id": "s1", "cluster_size": 1,
         "is_representative": True, "quality": 0.3, "text_len": 3},
    ])
    pages = rd.from_items([
        {"url": "m1", "text": "a b c"}, {"url": "m2", "text": "a b c"},
        {"url": "m3", "text": "a X c"},
        {"url": "w1", "text": "a Y c"}, {"url": "w2", "text": "a b c"},
        {"url": "w3", "text": "a b c"},
        {"url": "s1", "text": "solo page"},
    ])
    out = synthesize_clusters(pages, clusters, CFG, num_parts=4).to_pandas()
    out = out.set_index("cluster_id")
    assert out.loc["m1", "consensus_text"] == "a b c"          # majority wins
    assert abs(out.loc["m1", "vote_agreement"] - 2 / 3) < 1e-6
    assert out.loc["w1", "consensus_text"] == "a Y c"          # weight wins
    assert out.loc["s1", "consensus_text"] == "solo page"
    assert out.loc["s1", "content_src"] == "single"
    assert out.loc["m1", "content_src"] == "consensus_vote"
    assert out.loc["m1", "rep_url"] == "m1"
    assert int(out.loc["w1", "total_text_len"]) == 15
    assert len(out) == 3                                       # one row per cluster


def test_verified_edges_chunked_equals_single(corpus):
    """Pair-chunked verification (the bounded-liveset path the 4M
    spill regime takes) must produce exactly the single-shot edge set:
    chunking is on the (ha, hb) pair key, so every copy of a pair
    lands in one chunk and the in-partition dedupe is unaffected."""
    from gencore_ray.stages.lsh import candidate_pairs
    from gencore_ray.stages.verify import verified_edges

    pages_tbl, _ = corpus
    pages = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))
    sig = compute_signatures(pages, CFG).materialize()
    pairs = candidate_pairs(sig, CFG, dedupe=False).materialize()

    def norm(ds):
        df = ds.to_pandas()
        cols = ["url_a", "url_b", "jaccard", "containment"]
        return (df[cols].sort_values(["url_a", "url_b"], kind="mergesort")
                .reset_index(drop=True))

    single = norm(verified_edges(pairs, sig, CFG))
    chunked = norm(verified_edges(pairs, sig, CFG, chunks=5))
    assert len(single) > 0
    pd.testing.assert_frame_equal(single, chunked)


def test_consensus_trusted_source_override(ray_session):
    """G6 side-input cross-check (gencore's reference-genome
    consultation, src/group.cpp:430-501): at vote positions with NO
    strict count majority, a trusted (url, text) stream overrides the
    quality-weighted winner; overrides are counted and tagged."""
    from gencore_ray.stages.consensus import synthesize_clusters

    def member(url, cid, q, text):
        return {"url": url, "cluster_id": cid, "cluster_size": 2,
                "is_representative": url.endswith("1"), "quality": q,
                "text_len": len(text), "text": text}

    rows = [
        # planted disagreement: counts tie 1-1 at pos 1, weighted
        # winner would be "dog" (0.9 > 0.2) — trusted must impose "cat"
        member("r1", "r1", 0.2, "the cat sat"),
        member("r2", "r1", 0.9, "the dog sat"),
        # identical shape, no trusted member: weight wins
        member("n1", "n1", 0.2, "the cat sat"),
        member("n2", "n1", 0.9, "the dog sat"),
        # trusted member present but position HAS a strict count
        # majority: no override
        member("u1", "u1", 0.3, "a b"),
        member("u2", "u1", 0.3, "a b"),
        member("u3", "u1", 0.3, "a c"),
    ]
    rows[-1]["cluster_size"] = rows[-2]["cluster_size"] = rows[-3]["cluster_size"] = 3
    clusters = rd.from_items([{k: v for k, v in r.items() if k != "text"}
                              for r in rows])
    pages = rd.from_items([{"url": r["url"], "text": r["text"]}
                           for r in rows])
    trusted = rd.from_items([
        {"url": "r1", "text": "the cat sat"},
        {"url": "u3", "text": "a c"},
    ])
    out = synthesize_clusters(pages, clusters, CFG, num_parts=3,
                              trusted=trusted).to_pandas()
    out = out.set_index("cluster_id")
    assert out.loc["r1", "consensus_text"] == "the cat sat"
    assert int(out.loc["r1", "ref_overrides"]) == 1
    assert out.loc["r1", "content_src"] == "consensus_vote+ref"
    assert out.loc["n1", "consensus_text"] == "the dog sat"
    assert int(out.loc["n1", "ref_overrides"]) == 0
    assert out.loc["n1", "content_src"] == "consensus_vote"
    assert out.loc["u1", "consensus_text"] == "a b"    # majority holds
    assert int(out.loc["u1", "ref_overrides"]) == 0
    # without a trusted table the schema still carries ref_overrides=0
    plain = synthesize_clusters(pages, clusters, CFG, num_parts=3).to_pandas()
    assert (plain["ref_overrides"] == 0).all()


def test_consensus_vote_vectorized_matches_scalar():
    """The factorized vote (_vote_clusters: one lexsort + segment-sum
    per partition) must reproduce the scalar per-position dict vote
    exactly — and do it fast (the scalar loop on this fixture is the
    round-2 anti-pattern this replaces)."""
    import time

    from gencore_ray.stages.consensus import _synth_partition

    def scalar_vote(texts, weights):
        toks = [t.split() if t else [] for t in texts]
        max_len = max(len(t) for t in toks)
        out, agree = [], 0
        for p in range(max_len):
            cand = {}
            for m, tl in enumerate(toks):
                if p < len(tl):
                    cand[tl[p]] = cand.get(tl[p], 0.0) + float(weights[m])
            if len(cand) == 1:
                agree += 1
            out.append(min(cand.items(), key=lambda kv: (-kv[1], kv[0]))[0])
        return " ".join(out), (agree / max_len if max_len else 1.0)

    rng = np.random.RandomState(5)
    vocab = np.array([f"w{i}" for i in range(50)])
    rows = []
    texts_by_cluster = {}
    for c in range(60):                       # 60 clusters x 5 members
        base = vocab[rng.randint(0, 50, size=rng.randint(3, 400))]
        members = []
        for m in range(5):
            t = base.copy()
            if len(t) and rng.rand() < 0.8:   # mutate a few positions
                t[rng.randint(0, len(t), size=max(1, len(t) // 20))] = "MUT%d" % m
            members.append(" ".join(t))
        texts_by_cluster[f"c{c:03d}"] = members
        for m, text in enumerate(members):
            rows.append({"url": f"c{c:03d}-u{m}", "cluster_id": f"c{c:03d}",
                         "cluster_size": 5, "is_representative": m == 2,
                         "quality": float(rng.rand() + 0.1),
                         "text_len": len(text), "text": text})
    df = pd.DataFrame(rows).sample(frac=1, random_state=9)  # shuffled input
    t0 = time.monotonic()
    out = _synth_partition(df, CFG).set_index("cluster_id")
    elapsed = time.monotonic() - t0
    # scalar reference per cluster, weights in (cluster_id, url) order
    sdf = df.sort_values(["cluster_id", "url"], kind="mergesort")
    for cid, g in sdf.groupby("cluster_id"):
        want_text, want_agree = scalar_vote(
            g["text"].tolist(), np.maximum(g["quality"].to_numpy(), 1e-9)
        )
        assert out.loc[cid, "consensus_text"] == want_text, cid
        assert abs(out.loc[cid, "vote_agreement"] - round(want_agree, 6)) < 1e-9
        assert out.loc[cid, "rep_url"] == f"{cid}-u2"
    # ~60k tokens x 5 members: the factorized pass must stay well under
    # the scalar loop's cost (timing note, generous bound for CI noise)
    assert elapsed < 2.0, f"vectorized vote too slow: {elapsed:.2f}s"


def test_partitioned_sink_resume(corpus, tmp_path, ray_session):
    """S5 scale form: atomic per-partition files; a re-run skips every
    completed partition and only fills holes."""
    import pyarrow.parquet as pq

    from gencore_ray.state.sink import read_partitioned, write_partitioned

    pages_tbl, _ = corpus
    ds = rd.from_arrow(pages_tbl.slice(0, 150).select(["url", "text"]))
    out = str(tmp_path / "sink")
    r1 = write_partitioned(ds, out, "url", num_parts=8)
    assert r1 == {"partitions": 8, "rows": 150, "skipped": 0, "written": 8}
    # full re-run: everything skipped, nothing rewritten
    r2 = write_partitioned(ds, out, "url", num_parts=8)
    assert r2["skipped"] == 8 and r2["written"] == 0 and r2["rows"] == 150
    # crash simulation: delete two partitions -> only those are rewritten
    for p in (1, 5):
        os.remove(os.path.join(out, f"part-{p:05d}.parquet"))
    r3 = write_partitioned(ds, out, "url", num_parts=8)
    assert r3["skipped"] == 6 and r3["written"] == 2
    back = read_partitioned(out).to_pandas()
    assert sorted(back["url"]) == sorted(pages_tbl.slice(0, 150)["url"].to_pylist())


def test_html_report_emitted(corpus, tmp_path):
    """S7: checkpointed runs emit a self-contained report.html with
    counters, stage lineage, and the duplication-level histogram."""
    pages_tbl, _ = corpus
    pages = rd.from_arrow(pages_tbl.slice(0, 120).select(["url", "warc_ts", "text", "lang"]))
    ck = str(tmp_path / "ckpt_html")
    dedup_pages(pages, CFG, checkpoint_dir=ck).clusters.count()
    html_path = os.path.join(ck, "report.html")
    assert os.path.exists(html_path)
    html = open(html_path).read()
    for needle in ("Run counters", "Stage lineage", "Duplication-level histogram",
                   "pages_in", "signatures", "clusters"):
        assert needle in html, needle
    import json as _json

    rep = _json.load(open(os.path.join(ck, "report.json")))
    hist = {int(k): v for k, v in rep["cluster_size_histogram"].items()}
    assert sum(hist.values()) == rep["counters"]["clusters_total"]
    assert sum(k * v for k, v in hist.items()) == 120


def test_checkpoint_not_reused_for_different_input(corpus, tmp_path):
    """Same checkpoint_dir + same config but a DIFFERENT corpus must
    recompute, not reload stale parquet (fingerprints cover input
    identity — ADVICE round 1)."""
    import pyarrow.parquet as pq

    pages_tbl, _ = corpus
    a = pages_tbl.slice(0, 100).select(["url", "warc_ts", "text", "lang"])
    b = pages_tbl.slice(100, 100).select(["url", "warc_ts", "text", "lang"])
    pa_dir, pb_dir = tmp_path / "in_a", tmp_path / "in_b"
    pa_dir.mkdir(), pb_dir.mkdir()
    pq.write_table(a, str(pa_dir / "pages.parquet"))
    pq.write_table(b, str(pb_dir / "pages.parquet"))
    ck = str(tmp_path / "ckpt3")
    d_a = dedup_pages(rd.read_parquet(str(pa_dir)), CFG,
                      checkpoint_dir=ck).clusters.to_pandas()
    d_b = dedup_pages(rd.read_parquet(str(pb_dir)), CFG,
                      checkpoint_dir=ck).clusters.to_pandas()
    assert set(d_b["url"]) == set(b["url"].to_pylist())   # not corpus A's rows
    assert set(d_a["url"]) != set(d_b["url"])


def test_exact_dedup_operator(ray_session):
    sig = compute_signatures(
        rd.from_items(
            [
                {"url": "b", "warc_ts": None, "text": "same text here ok", "lang": "en"},
                {"url": "a", "warc_ts": None, "text": "same text here ok", "lang": "en"},
                {"url": "c", "warc_ts": None, "text": "different words entirely", "lang": "en"},
            ]
        ),
        CFG,
    )
    out = exact_dedup(sig, num_parts=4).to_pandas().sort_values("url")
    assert out["url"].tolist() == ["a", "c"]
    assert out.set_index("url")["dup_count"].to_dict() == {"a": 2, "c": 1}


def test_rep_election_tiebreaks(ray_session):
    # equal score -> min url wins; length decides otherwise
    members = rd.from_items(
        [
            {"url": "z", "cluster_id": "c1", "text_len": 100, "quality": 0.5},
            {"url": "a", "cluster_id": "c1", "text_len": 100, "quality": 0.5},
            {"url": "m", "cluster_id": "c2", "text_len": 5000, "quality": 0.5},
            {"url": "a2", "cluster_id": "c2", "text_len": 10, "quality": 0.5},
        ]
    )
    out = elect_representatives(members, CFG, num_parts=4).to_pandas()
    reps = out[out["is_representative"]].set_index("cluster_id")["url"].to_dict()
    assert reps == {"c1": "a", "c2": "m"}


def test_manifest_has_per_partition_lineage(corpus, tmp_path):
    """north rule: per-partition lineage + metrics in the checkpoint."""
    import json

    pages_tbl, _ = corpus
    pages = rd.from_arrow(pages_tbl.slice(0, 120).select(["url", "warc_ts", "text", "lang"]))
    ck = str(tmp_path / "ckpt3")
    dedup_pages(pages, CFG, checkpoint_dir=ck).clusters.count()
    recs = [json.loads(l) for l in open(os.path.join(ck, "manifest.jsonl"))]
    stages = {r["stage"] for r in recs}
    assert {"signatures", "candidate_pairs", "verified_edges", "clusters"} <= stages
    for r in recs:
        assert r["partitions"], r["stage"]
        for p in r["partitions"]:
            assert os.path.exists(p["path"]) and p["rows"] >= 0
        assert r["rows_out"] == sum(p["rows"] for p in r["partitions"])
    # fingerprints are CHAINED per stage (config + input + upstream) —
    # all distinct, none equal to the bare config fingerprint
    fps = [r["fingerprint"] for r in recs]
    assert len(set(fps)) == len(fps)
    assert CFG.fingerprint() not in fps
    report = json.load(open(os.path.join(ck, "report.json")))
    assert report["counters"]["pages_in"] == 120


def test_cluster_parity_midscale(ray_session):
    """Parity + recall at 800 pages (hot bucket ~66 members exercises
    the capped-pairing path harder than the 300-page fixture)."""
    import ray.data as rd2

    pages_tbl, _ = generate_pages(800, 43, with_truth=True)  # different seed too
    pages = rd2.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))
    out = dedup_pages(pages, CFG, cc_mode="driver").clusters.to_pandas()
    ids = pages_tbl["url"].to_pylist()
    texts = pages_tbl["text"].to_pylist()
    oclust = union_find_clusters(ids, oracle_edges(ids, texts, CFG))
    eng = dict(zip(out["url"], out["cluster_id"]))
    assert [u for u in ids if eng.get(u) != oclust[u]] == []
    jp = oracle_jaccard_pairs(ids, texts, CFG)
    hits = sum(1 for a, b, _ in jp if eng[a] == eng[b])
    assert hits / max(1, len(jp)) >= 0.99


def test_cluster_parity_2k(ray_session):
    """Parity at 2000 pages / a third fresh seed — the largest corpus
    the brute-force oracle affords in-suite (~5 s); exercises bucket
    caps, the Bloom gate and CC at 5x the fixture scale."""
    import ray.data as rd2

    pages_tbl, _ = generate_pages(2000, 1234, with_truth=True)
    pages = rd2.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))
    out = dedup_pages(pages, CFG).clusters.to_pandas()
    ids = pages_tbl["url"].to_pylist()
    texts = pages_tbl["text"].to_pylist()
    oclust = union_find_clusters(ids, oracle_edges(ids, texts, CFG))
    eng = dict(zip(out["url"], out["cluster_id"]))
    assert [u for u in ids if eng.get(u) != oclust[u]] == []


def test_simhash_delta_consistency(corpus, ray_session):
    """Round-2 VERDICT #10: the full default pipeline (SimHash edges ON)
    must equal the fully SQL-checked simhash_enabled=False twin
    (pages_dedup_sql's configuration) PLUS exactly the Hamming-only
    edges the engine itself counts — i.e. the one non-SQL-expressible
    edge source contributes its counted edges and nothing else."""
    from gencore_ray.oracle import union_find_clusters
    from gencore_ray.stages.verify import verified_edges
    from gencore_ray.stages.lsh import candidate_pairs
    from gencore_ray.pipelines.dedup import compute_signatures

    import pyarrow as pa

    pages_tbl, truth = corpus
    # plant one guaranteed Hamming-ONLY pair: identical token BAG in
    # reversed sentence order — simhash (order-insensitive) distance 0,
    # 5-gram jaccard ~0.22 (order-sensitive), shared shingles > 0 (the
    # verify stage's shared-evidence guard).  The classic reordered-
    # boilerplate web dup that only the SimHash pass can catch.
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
             "omega aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr "
             "ss tt uu vv ww xx").split()
    sents = [words[i * 6:(i + 1) * 6] for i in range(8)]
    doca = " ".join(w for s in sents for w in s)
    docb = " ".join(w for s in reversed(sents) for w in s)
    extra = pa.table({
        "url": ["zz-reorder-a", "zz-reorder-b"],
        "warc_ts": pa.array([None, None], pages_tbl["warc_ts"].type),
        "text": [doca, docb],
        "lang": ["en", "en"],
    })
    pages_tbl = pa.concat_tables(
        [pages_tbl.select(["url", "warc_ts", "text", "lang"]), extra]
    )
    pages = rd.from_arrow(pages_tbl)
    cfg_on = CFG
    cfg_off = DedupConfig(simhash_enabled=False)

    res_on = dedup_pages(pages, cfg_on)
    on = res_on.clusters.to_pandas()
    off = dedup_pages(pages, cfg_off).clusters.to_pandas()

    # engine's own edge table at the ON config, split by qualifying rule
    sig = compute_signatures(pages, cfg_on).materialize()
    edges = verified_edges(
        candidate_pairs(sig, cfg_on, dedupe=False), sig, cfg_on
    ).to_pandas()
    ham_only = edges[
        (edges["jaccard"] < cfg_on.jaccard_threshold)
        & (edges["containment"] < cfg_on.containment_threshold)
    ]
    assert res_on.counters["hamming_only_edges"] == len(ham_only)
    assert len(ham_only) > 0   # the fixture DOES plant simhash-only dups

    # reconstruct the ON partition from the OFF partition + ham edges
    ids = pages_tbl["url"].to_pylist()
    off_edges = [
        (a, b) for a, b in zip(edges["url_a"], edges["url_b"])
        if (a, b) not in set(zip(ham_only["url_a"], ham_only["url_b"]))
    ]
    want_off = union_find_clusters(ids, off_edges)
    got_off = dict(zip(off["url"], off["cluster_id"]))
    assert got_off == want_off

    want_on = union_find_clusters(
        ids, off_edges + list(zip(ham_only["url_a"], ham_only["url_b"]))
    )
    got_on = dict(zip(on["url"], on["cluster_id"]))
    assert got_on == want_on


def test_checkpoint_distinguishes_equal_shape_corpora(tmp_path, ray_session):
    """ADVICE r2: two DIFFERENT in-memory corpora with identical schema
    and row count must NOT share checkpointed stages — the input
    fingerprint folds in a content digest, so the second run misses the
    first run's cache and computes its own (correct) clusters."""
    import pyarrow as pa

    def corpus_of(texts):
        n = len(texts)
        return rd.from_arrow(pa.table({
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa.array([None] * n, pa.timestamp("us")),
            "text": texts,
            "lang": ["en"] * n,
        }))

    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [f"totally unique document number {i} with its own words {i*7}"
            for i in range(6)]
    a = corpus_of([dup_text, dup_text] + uniq[:4])   # one dup pair
    b = corpus_of(uniq[:6])                          # all singletons
    ck = str(tmp_path / "shared_ck")
    ra = dedup_pages(a, CFG, checkpoint_dir=ck).clusters.to_pandas()
    rb = dedup_pages(b, CFG, checkpoint_dir=ck).clusters.to_pandas()
    assert (ra["cluster_size"] > 1).any()            # a found its dup
    assert (rb["cluster_size"] == 1).all(), (
        "second corpus silently reloaded the first corpus's stages"
    )


def test_sink_rejects_mismatched_resume(corpus, tmp_path, ray_session):
    """ADVICE r2: resuming a partitioned sink with a different key or
    num_parts must raise, never silently mix partitionings."""
    from gencore_ray.state.sink import write_partitioned

    pages_tbl, _ = corpus
    ds = rd.from_arrow(pages_tbl.slice(0, 50).select(["url", "text"]))
    out = str(tmp_path / "sink")
    write_partitioned(ds, out, key="url", num_parts=4)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned(ds, out, key="url", num_parts=8)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned(ds.select_columns(["url"]), out, key="url", num_parts=4)
    # identical config resumes fine (all partitions skipped)
    again = write_partitioned(ds, out, key="url", num_parts=4)
    assert again["skipped"] == 4 and again["written"] == 0


def test_bloom_prefilter_equivalent_and_gated(corpus, ray_session):
    """The Bloom candidate-doc prefilter ("on") must yield exactly the
    edge set of the plain path ("off"), and "auto" must resolve to off
    on this single-node cluster (the filter only pays cross-node — its
    driver-side OR-reduce is a serial Amdahl tax measured at ~0.6 s on
    the 32-cpu scaling leg)."""
    from gencore_ray.pipelines.dedup import compute_signatures
    from gencore_ray.stages.lsh import candidate_pairs
    from gencore_ray.stages.verify import verified_edges

    pages_tbl, _ = corpus
    pages = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "text", "lang"]))

    def edges_with(bloom: str) -> pd.DataFrame:
        cfg = DedupConfig(bloom_prefilter=bloom)
        sig = compute_signatures(pages, cfg).materialize()
        e = verified_edges(
            candidate_pairs(sig, cfg, dedupe=False), sig, cfg
        ).to_pandas()
        return e.sort_values(["url_a", "url_b"]).reset_index(drop=True)

    on, off = edges_with("on"), edges_with("off")
    assert len(on) > 50
    pd.testing.assert_frame_equal(on, off)


def test_compact_parquet_preserves_rows(ray_session, tmp_path):
    """Compaction: many tiny files -> few target-sized files, rows and
    values intact, source directory untouched."""
    import os

    import pandas as pd
    import ray.data as rd

    from gencore_ray.state.sink import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = pd.DataFrame({"k": range(5000), "v": [f"v{i}" for i in range(5000)]})
    rd.from_pandas(df).repartition(20).write_parquet(src)
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src >= 10
    stats = compact_parquet(src, dst, target_mb=128)
    assert stats["rows"] == 5000 and stats["files_in"] == n_src
    assert stats["files_out"] < n_src
    got = rd.read_parquet(dst).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df, check_dtype=False)
    # source untouched
    assert sum(1 for f in os.listdir(src) if f.endswith(".parquet")) == n_src


def test_kill_mid_stage_resume_real_sigkill(tmp_path):
    """The REAL failure mode (SURVEY §5): SIGKILL the whole flagship
    process group right after the candidate-pair exchange checkpoints,
    resume in a fresh process — identical clusters, manifest history
    preserved verbatim, completed stages never re-run.  (The bench-
    scale 60k-page variant runs via tools/kill_resume_proof.py and is
    recorded in BASELINE.md.)"""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.kill_resume_proof import run_proof

    rep = run_proof(pages=4000, cpus=4, work_dir=str(tmp_path),
                    timeout=420.0)
    assert rep["clusters_identical"] and rep["manifest_prefix_preserved"]
    assert "candidate_pairs" in rep["killed_after_stages"]
    assert "clusters" in rep["resumed_new_stages"]
