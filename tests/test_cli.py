"""End-to-end CLI tests — each subcommand in its own subprocess (the
CLI owns its Ray session, so in-process invocation would fight the
test fixture's session).  These are the `gencore <args>` parity
surface (reference EP1, /root/reference/src/main.cpp:29-89)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


def _run(*args: str, timeout: int = 240) -> str:
    env = dict(os.environ, RAY_ADDRESS="")
    out = subprocess.run(
        [sys.executable, "-m", "gencore_ray", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    from gencore_ray.corpus import write_pages_corpus

    d = tmp_path_factory.mktemp("cli_corpus")
    write_pages_corpus(str(d), n_pages=120, seed=3)
    return str(d / "pages.parquet")


def test_cli_builtin_vectors():
    assert _run("test") == "PASSED"


def test_cli_dedup_end_to_end(tiny_corpus, tmp_path):
    out = str(tmp_path / "clusters")
    rep = json.loads(_run("dedup", "-i", tiny_corpus, "-o", out,
                          "--num-cpus", "4"))
    assert rep["counters"]["pages_in"] == 120
    t = pq.read_table(out)
    assert t.num_rows == 120
    assert {"url", "cluster_id", "cluster_size"} <= set(t.schema.names)


def test_cli_curate_profile_diff(tiny_corpus, tmp_path):
    docs = str(tmp_path / "docs.parquet")
    t = pq.read_table(tiny_corpus, columns=["url", "text"])
    pq.write_table(t, docs)

    rep = json.loads(_run("curate", "-i", docs, "-o",
                          str(tmp_path / "verdicts"), "--id-col", "url",
                          "--ppl-drop-frac", "0.1", "--num-cpus", "4"))
    assert rep["docs"] == 120
    assert rep["kept"] + sum(rep["dropped_by_reason"].values()) == 120

    line = _run("profile", "-i", docs, "--columns", "url",
                "--num-cpus", "4")
    prof = json.loads(line)
    assert prof["n_rows"] == 120 and prof["n_distinct"] == 120

    rep = json.loads(_run("diff", "--old", docs, "--new", docs,
                          "--id-col", "url", "--content-col", "text",
                          "--num-cpus", "4"))
    assert rep["rows"] == 120 and rep.get("unchanged") == 120


def test_cli_semdedup_counted_caps(tmp_path):
    """semdedup subcommand: pairs parquet + cap accounting in the JSON
    report (dropped_members visible when a cluster exceeds the cap)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    rng = np.random.RandomState(5)
    base = rng.randn(90, 8)
    mat = np.vstack([base, base[:10] + 1e-6])     # 10 planted near-dups
    vecs = str(tmp_path / "vecs.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(mat)), "embedding": list(mat)})), vecs)

    out = str(tmp_path / "pairs")
    rep = json.loads(_run("semdedup", "-i", vecs, "-o", out,
                          "--k", "4", "--num-cpus", "4"))
    assert rep["pairs"] >= 10 and rep["n_docs"] == 100
    assert rep["subsampled_clusters"] == 0 and rep["dropped_members"] == 0
    t = pq.read_table(out)
    assert {"id_a", "id_b", "cos_sim"} == set(t.schema.names)

    # force an oversize cluster: cap far below the cluster sizes
    rep2 = json.loads(_run("semdedup", "-i", vecs, "-o",
                           str(tmp_path / "pairs2"), "--k", "2",
                           "--max-cluster-size", "20", "--num-cpus", "4"))
    assert rep2["subsampled_clusters"] >= 1
    assert rep2["dropped_members"] >= 100 - 2 * 20


def test_cli_semdedup_from_text(tmp_path):
    """--from-text runs the full chain documents parquet -> actor-pool
    embed -> k-means -> pairs; planted exact-duplicate texts must pair
    at cos 1.0."""
    import pandas as pd
    import pyarrow as pa

    rows = []
    for i in range(40):
        body = " ".join(f"tok{i}x{j}" for j in range(30))
        rows.append({"doc_id": i, "text": body})
    for i in range(5):                       # exact text copies
        rows.append({"doc_id": 1000 + i, "text": rows[i]["text"]})
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), docs)

    out = str(tmp_path / "pairs")
    rep = json.loads(_run("semdedup", "-i", docs, "-o", out,
                          "--from-text", "--id-col", "doc_id",
                          "--k", "2", "--probes", "2", "--num-cpus", "4"))
    t = pq.read_table(out).to_pandas()
    planted = {(i, 1000 + i) for i in range(5)}
    assert planted <= set(zip(t.id_a, t.id_b))
    assert (t.set_index(["id_a", "id_b"]).loc[list(planted)]["cos_sim"]
            == 1.0).all()
    assert rep["n_docs"] == 45 * 2           # probes=2 assignment rows


def test_cli_split(tiny_corpus, tmp_path):
    out_root = str(tmp_path / "splits")
    lines = subprocess.run(
        [sys.executable, "-m", "gencore_ray", "split", "-i", tiny_corpus,
         "-o", out_root, "--key", "url", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240,
        env=dict(os.environ, RAY_ADDRESS=""), cwd="/root/repo",
    )
    assert lines.returncode == 0, lines.stderr[-2000:]
    recs = [json.loads(x) for x in lines.stdout.strip().splitlines()[-3:]]
    by_name = {r["split"]: r for r in recs}
    assert set(by_name) == {"train", "val", "test"}
    assert sum(r["rows"] for r in recs) == 120
    assert by_name["train"]["rows"] > by_name["val"]["rows"]
    # per-split dirs exist, split column stripped, no key overlap
    seen = {}
    for name, r in by_name.items():
        t = pq.read_table(r["path"])
        assert t.num_rows == r["rows"]
        assert "split" not in t.schema.names
        for u in t["url"].to_pylist():
            assert u not in seen, (u, name, seen[u]) if u in seen else None
            seen[u] = name
    # determinism: a second run assigns identically
    out2 = str(tmp_path / "splits2")
    lines2 = subprocess.run(
        [sys.executable, "-m", "gencore_ray", "split", "-i", tiny_corpus,
         "-o", out2, "--key", "url", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240,
        env=dict(os.environ, RAY_ADDRESS=""), cwd="/root/repo",
    )
    recs2 = [json.loads(x) for x in lines2.stdout.strip().splitlines()[-3:]]
    assert {r["split"]: r["rows"] for r in recs2} == {
        r["split"]: r["rows"] for r in recs}


def test_cli_chunk(tiny_corpus, tmp_path):
    docs = str(tmp_path / "docs.parquet")
    t = pq.read_table(tiny_corpus, columns=["url", "text"])
    pq.write_table(t, docs)
    out = str(tmp_path / "chunks")
    rep = json.loads(_run("chunk", "-i", docs, "-o", out, "--id-col", "url",
                          "--chunk-tokens", "32", "--overlap", "4",
                          "--num-cpus", "4"))
    assert rep["docs"] == 120 and rep["chunks"] >= 120
    ct = pq.read_table(out)
    assert ct.num_rows == rep["chunks"]
    assert set(ct.schema.names) == {"doc_id", "chunk_no", "n_tokens",
                                    "chunk_text"}
    assert max(ct["n_tokens"].to_pylist()) <= 32


def test_cli_quality_checks(tmp_path):
    import pandas as pd
    import pyarrow as pa

    t = str(tmp_path / "t.parquet")
    dim = str(tmp_path / "dim.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "id": [1, 2, 2, 3], "v": [1.0, -5.0, 2.0, 99.0],
        "cat": ["a", "b", "xx", "a"], "fk": [10, 10, 7, 20]})), t)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({"k": [10, 20]})), dim)
    rep = json.loads(_run(
        "quality", "-i", t, "--unique", "id", "--not-null", "v",
        "--accepted", "cat=a|b", "--range", "v=0:50",
        "--fk", f"fk={dim}:k", "--num-cpus", "4"))
    by = {c["check_name"]: c["violations"] for c in rep["checks"]}
    assert by["unique(id)"] == 1
    assert by["not_null(v)"] == 0
    assert by["accepted_values(cat)"] == 1
    assert by["range(v,[0.0,50.0))"] == 2
    assert by["foreign_key(fk)"] == 1
    assert rep["total_violations"] == 5

    # --strict turns violations into a nonzero exit (the CI-gate shape)
    env = dict(os.environ, RAY_ADDRESS="")
    out = subprocess.run(
        [sys.executable, "-m", "gencore_ray", "quality", "-i", t,
         "--unique", "id", "--strict", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd="/root/repo")
    assert out.returncode == 1
