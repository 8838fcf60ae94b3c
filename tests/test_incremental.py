"""Incremental dedup (pipelines/incremental.py): merging a new batch
into prior state must equal a from-scratch run over the union, chained
increments must stay consistent, and the state dir must be guarded
against config drift."""

import shutil

import numpy as np
import pytest

import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.corpus import generate_pages
from gencore_ray.pipelines.dedup import dedup_pages
from gencore_ray.pipelines.incremental import incremental_dedup

CFG = DedupConfig()
COLS = ["url", "warc_ts", "text", "lang"]


@pytest.fixture(scope="module")
def split_corpus(ray_session):
    tbl = generate_pages(600, 7).select(COLS)
    idx = np.arange(tbl.num_rows)
    old_t = tbl.take([int(i) for i in idx if i % 3 != 0])
    new_t = tbl.take([int(i) for i in idx if i % 3 == 0])
    return tbl, old_t, new_t


def _cluster_frame(ds):
    return (
        ds.to_pandas()
        .set_index("url")[["cluster_id", "cluster_size", "is_representative"]]
        .sort_index()
    )


def test_incremental_equals_full_run(split_corpus, tmp_path):
    tbl, old_t, new_t = split_corpus
    full = _cluster_frame(dedup_pages(rd.from_arrow(tbl), CFG).clusters)

    sd = str(tmp_path / "state")
    dedup_pages(rd.from_arrow(old_t), CFG, state_dir=sd)
    res = incremental_dedup(rd.from_arrow(new_t), sd, CFG)
    inc = _cluster_frame(res.clusters)

    assert list(full.index) == list(inc.index)
    assert (full["cluster_id"] == inc["cluster_id"]).all()
    assert (full["cluster_size"] == inc["cluster_size"]).all()
    assert (full["is_representative"] == inc["is_representative"]).all()
    # old-old pairs are never generated; the merge found real new edges
    assert res.counters["new_edges"] > 0
    assert res.counters["affected_clusters"] > 0


def test_chained_increments_equal_full_run(split_corpus, tmp_path):
    """Three-way split folded in twice: state must stay consistent
    across successive updates (the daily-crawl loop)."""
    tbl, _, _ = split_corpus
    idx = np.arange(tbl.num_rows)
    b0 = tbl.take([int(i) for i in idx if i % 3 == 0])
    b1 = tbl.take([int(i) for i in idx if i % 3 == 1])
    b2 = tbl.take([int(i) for i in idx if i % 3 == 2])

    full = _cluster_frame(dedup_pages(rd.from_arrow(tbl), CFG).clusters)

    sd = str(tmp_path / "state2")
    dedup_pages(rd.from_arrow(b0), CFG, state_dir=sd)
    incremental_dedup(rd.from_arrow(b1), sd, CFG)          # updates state
    res = incremental_dedup(rd.from_arrow(b2), sd, CFG)
    inc = _cluster_frame(res.clusters)

    assert list(full.index) == list(inc.index)
    assert (full["cluster_id"] == inc["cluster_id"]).all()
    assert (full["cluster_size"] == inc["cluster_size"]).all()
    assert (full["is_representative"] == inc["is_representative"]).all()


def test_chained_increments_distributed_cc(split_corpus, tmp_path):
    """The distributed merge path (what the auto-switch selects above
    cc_driver_max_edges) must equal the from-scratch run exactly, also
    across chained merges — star edges flow as a Dataset into
    distributed_cc, labels re-attach via hash joins.  One leg forces
    cc_mode='distributed'; the other proves the auto wiring by setting
    the switch threshold to 0 edges."""
    tbl, _, _ = split_corpus
    idx = np.arange(tbl.num_rows)
    b0 = tbl.take([int(i) for i in idx if i % 3 == 0])
    b1 = tbl.take([int(i) for i in idx if i % 3 == 1])
    b2 = tbl.take([int(i) for i in idx if i % 3 == 2])

    full = _cluster_frame(dedup_pages(rd.from_arrow(tbl), CFG).clusters)

    sd = str(tmp_path / "state_dcc")
    dedup_pages(rd.from_arrow(b0), CFG, state_dir=sd)
    incremental_dedup(rd.from_arrow(b1), sd, CFG, cc_mode="distributed")
    res = incremental_dedup(rd.from_arrow(b2), sd, CFG,
                            cc_mode="auto", cc_driver_max_edges=0)
    inc = _cluster_frame(res.clusters)

    assert list(full.index) == list(inc.index)
    assert (full["cluster_id"] == inc["cluster_id"]).all()
    assert (full["cluster_size"] == inc["cluster_size"]).all()
    assert (full["is_representative"] == inc["is_representative"]).all()
    assert res.counters["affected_clusters"] > 0


def test_unrelated_batch_leaves_prior_rows_untouched(split_corpus, tmp_path):
    """A new batch with no duplicates against the state: every prior
    row passes through unchanged and every new doc is a singleton."""
    _, old_t, _ = split_corpus
    sd = str(tmp_path / "state3")
    prior = _cluster_frame(dedup_pages(rd.from_arrow(old_t), CFG,
                                       state_dir=sd).clusters)

    import pyarrow as pa

    n = 50
    fresh = pa.table({
        "url": [f"zz-unique-{i:04d}" for i in range(n)],
        "warc_ts": pa.array([None] * n, pa.timestamp("us")),
        "text": [
            f"completely unrelated sentence number {i} about topic "
            f"{i * 37} with distinct vocabulary token{i}a token{i}b "
            f"token{i}c token{i}d token{i}e token{i}f"
            for i in range(n)
        ],
        "lang": ["en"] * n,
    })
    res = incremental_dedup(rd.from_arrow(fresh), sd, CFG, update_state=False)
    out = _cluster_frame(res.clusters)

    old_rows = out.loc[[u for u in out.index if not u.startswith("zz-")]]
    assert (old_rows["cluster_id"] == prior["cluster_id"]).all()
    assert (old_rows["is_representative"] == prior["is_representative"]).all()
    new_rows = out.loc[[u for u in out.index if u.startswith("zz-")]]
    assert (new_rows["cluster_size"] == 1).all()
    assert new_rows["is_representative"].all()


def test_config_drift_rejected(split_corpus, tmp_path):
    _, old_t, new_t = split_corpus
    sd = str(tmp_path / "state4")
    dedup_pages(rd.from_arrow(old_t), CFG, state_dir=sd)
    other = DedupConfig(jaccard_threshold=0.5)
    with pytest.raises(ValueError, match="different DedupConfig"):
        incremental_dedup(rd.from_arrow(new_t), sd, other)


def test_missing_state_rejected(split_corpus, tmp_path):
    _, _, new_t = split_corpus
    with pytest.raises(FileNotFoundError):
        incremental_dedup(rd.from_arrow(new_t), str(tmp_path / "nope"), CFG)


def test_crashed_merge_leaves_prior_state_usable(split_corpus, tmp_path):
    """A merge that died after writing data dirs but BEFORE the
    state.json commit must be invisible: orphan dirs are ignored and
    re-running the increment produces the correct result."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl, old_t, new_t = split_corpus
    sd = str(tmp_path / "state5")
    dedup_pages(rd.from_arrow(old_t), CFG, state_dir=sd)

    # simulate the crash: orphan sig batch + orphan clusters dir exist
    # on disk but state.json still points at the bootstrap state
    orphan_sig = os.path.join(sd, "signatures", "batch-000001")
    os.makedirs(orphan_sig)
    pq.write_table(pa.table({"garbage": [1, 2, 3]}),
                   os.path.join(orphan_sig, "part.parquet"))
    os.makedirs(os.path.join(sd, "clusters-000001"))

    full = _cluster_frame(dedup_pages(rd.from_arrow(tbl), CFG).clusters)
    res = incremental_dedup(rd.from_arrow(new_t), sd, CFG)
    inc = _cluster_frame(res.clusters)
    assert (full["cluster_id"] == inc["cluster_id"]).all()
    assert (full["is_representative"] == inc["is_representative"]).all()

    # the successful merge committed OVER the orphan names
    import json

    meta = json.load(open(os.path.join(sd, "state.json")))
    assert meta["sig_batches"] == ["batch-000000", "batch-000001"]
    assert meta["clusters"] == "clusters-000001"
    assert meta["pages"] == len(inc)


def test_merge_over_orphans_is_clean(split_corpus, tmp_path):
    """The committed batch must not inherit stale files from an orphan
    dir of the same name: a SECOND merge (which reads every committed
    batch) must succeed and stay correct."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl, _, _ = split_corpus
    idx = np.arange(tbl.num_rows)
    b0 = tbl.take([int(i) for i in idx if i % 3 == 0])
    b1 = tbl.take([int(i) for i in idx if i % 3 == 1])
    b2 = tbl.take([int(i) for i in idx if i % 3 == 2])

    sd = str(tmp_path / "state6")
    dedup_pages(rd.from_arrow(b0), CFG, state_dir=sd)
    orphan = os.path.join(sd, "signatures", "batch-000001")
    os.makedirs(orphan)
    pq.write_table(pa.table({"garbage": [1]}),
                   os.path.join(orphan, "stale.parquet"))

    incremental_dedup(rd.from_arrow(b1), sd, CFG)   # commits batch-000001
    res = incremental_dedup(rd.from_arrow(b2), sd, CFG)  # reads it back
    full = _cluster_frame(dedup_pages(rd.from_arrow(tbl), CFG).clusters)
    inc = _cluster_frame(res.clusters)
    assert (full["cluster_id"] == inc["cluster_id"]).all()
