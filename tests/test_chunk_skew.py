"""Round-4 operators: token chunking (ops/chunk.py) and key-skew
profiling (ops/skew.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from gencore_ray.ops.chunk import chunk_batch, chunk_documents
from gencore_ray.ops.skew import key_skew_profile


def test_chunk_batch_layout():
    text = " ".join(f"t{i}" for i in range(10))   # 10 tokens
    out = chunk_batch([1], [text], chunk_tokens=4, overlap=1)
    # starts 0,3,6,9 (step 3, while start < 10)
    assert out["chunk_no"] == [0, 1, 2, 3]
    assert out["n_tokens"] == [4, 4, 4, 1]
    assert out["chunk_text"][0] == "t0 t1 t2 t3"
    assert out["chunk_text"][1] == "t3 t4 t5 t6"   # 1-token overlap
    assert out["chunk_text"][3] == "t9"


def test_chunk_batch_edges():
    out = chunk_batch([1, 2, 3], ["", "one", "Mixed CASE x"], 4, 0)
    assert out["doc_id"] == [2, 3]                 # empty doc: no chunks
    assert out["chunk_text"] == ["one", "mixed case x"]


def test_chunk_documents_validation_and_ray(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array(["a b c d e f", "g h"])}
        )
    )
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    out = (
        chunk_documents(docs, chunk_tokens=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_no"])
        .reset_index(drop=True)
    )
    assert list(out["chunk_text"]) == ["a b c d", "d e f", "g h"]
    # chunks inherit the doc's partition: repartitioned input, same rows
    out2 = (
        chunk_documents(docs.repartition(3), chunk_tokens=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_no"])
        .reset_index(drop=True)
    )
    assert (out == out2).all().all()


def test_key_skew_profile_uniform_vs_hot(ray_session):
    uniform = rd.from_arrow(
        pa.table({"k": pa.array([i % 50 for i in range(5000)], pa.int64())})
    )
    p = key_skew_profile(uniform, "k", num_parts=4).to_pandas().iloc[0]
    assert p["n_rows"] == 5000 and p["n_keys"] == 50
    assert p["max_count"] == 100
    assert p["top1_share"] == pytest.approx(0.02)
    assert p["hhi"] == pytest.approx(1 / 50, abs=1e-6)   # uniform floor

    hot = rd.from_arrow(
        pa.table({"k": pa.array([0] * 900 + list(range(1, 101)), pa.int64())})
    )
    p = key_skew_profile(hot, "k", num_parts=4).to_pandas().iloc[0]
    assert p["max_count"] == 900
    assert p["top1_share"] == pytest.approx(0.9)
    assert p["top10_share"] == pytest.approx(0.909)
    assert p["hhi"] > 0.8                               # concentration


def test_key_skew_profile_empty(ray_session):
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    p = key_skew_profile(empty, "k", num_parts=2).to_pandas().iloc[0]
    assert p["n_rows"] == 0 and p["hhi"] == 0.0


def test_grouped_line_dedup_scopes_counts(ray_session):
    from gencore_ray.ops.linedup import line_dedup

    # 'banner' appears in 3 docs of group A (frequent there) and 1 of
    # group B; 'spread' appears once per group (corpus-wide 4 >= 3 but
    # never frequent within any group)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "g": pa.array(["A", "A", "A", "B", "A", "B", "C", "D"]),
        "text": pa.array([
            "banner\nkeep0", "banner\nkeep1", "banner\nkeep2",
            "banner\nkeep3",
            "spread\nkeep4", "spread\nkeep5", "spread\nkeep6",
            "spread\nkeep7",
        ]),
    }))
    out = (
        line_dedup(docs, min_docs=3, num_parts=4, group_col="g")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # group A's banner removed from its 3 A-docs, kept in the B doc
    assert list(out["clean_text"][:4]) == [
        "keep0", "keep1", "keep2", "banner\nkeep3"]
    # 'spread' never reaches 3 within one group -> kept everywhere
    assert all(t.startswith("spread\n") for t in out["clean_text"][4:])
    # the same corpus WITHOUT grouping removes 'spread' (global count 4)
    glob = (
        line_dedup(docs, min_docs=3, num_parts=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert all(not t.startswith("spread") for t in glob["clean_text"][4:])
