"""The full daily-crawl user story in one test: day-1 bootstrap
(curate -> dedup -> state), day-2 increment (curate -> incremental
merge), then the training-prep tail (split -> pack) — every stage an
operator this engine ships, chained the way a production pipeline
would chain them, with row accounting asserted at each boundary."""

import numpy as np
import pandas as pd

import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.corpus import generate_pages
from gencore_ray.ops.packing import pack_sequences
from gencore_ray.ops.split import hash_split
from gencore_ray.pipelines.curate import curate_documents
from gencore_ray.pipelines.dedup import dedup_pages
from gencore_ray.pipelines.incremental import incremental_dedup

CFG = DedupConfig()
COLS = ["url", "warc_ts", "text", "lang"]


def _docs_from_pages(tbl):
    df = tbl.to_pandas()
    return pd.DataFrame({
        "doc_id": np.arange(len(df), dtype=np.int64),
        "url": df["url"],
        "text": df["text"],
    })


def test_daily_crawl_end_to_end(ray_session, tmp_path):
    tbl = generate_pages(500, 77).select(COLS)
    idx = np.arange(tbl.num_rows)
    day1 = tbl.take([int(i) for i in idx if i % 4 != 0])
    day2 = tbl.take([int(i) for i in idx if i % 4 == 0])

    # --- day 1: curation gate -------------------------------------
    d1_docs = _docs_from_pages(day1)
    verdicts = curate_documents(
        rd.from_pandas(d1_docs[["doc_id", "text"]]),
        ppl_threshold=None, ppl_drop_frac=0.1, min_tokens=3,
        num_parts=4,
    ).to_pandas()
    assert len(verdicts) == len(d1_docs)
    kept_ids = set(verdicts.loc[verdicts["keep"], "doc_id"])
    assert 0 < len(kept_ids) < len(d1_docs)      # the gate actually gates
    d1_kept = d1_docs[d1_docs["doc_id"].isin(kept_ids)]

    # --- day 1: dedup + persist state -----------------------------
    day1_pages = day1.to_pandas()
    day1_pages = day1_pages[day1_pages["url"].isin(set(d1_kept["url"]))]
    sd = str(tmp_path / "state")
    res1 = dedup_pages(rd.from_pandas(day1_pages), CFG, state_dir=sd)
    c1 = res1.clusters.to_pandas()
    assert len(c1) == len(day1_pages)            # every kept page labelled
    n_clusters_day1 = c1["cluster_id"].nunique()
    assert (c1.groupby("cluster_id")["is_representative"].sum() == 1).all()

    # --- day 2: incremental merge ---------------------------------
    res2 = incremental_dedup(rd.from_arrow(day2), sd, CFG)
    c2 = res2.clusters.to_pandas()
    assert len(c2) == len(day1_pages) + day2.num_rows
    assert set(c2["url"]) >= set(c1["url"])      # old rows survive
    assert (c2.groupby("cluster_id")["is_representative"].sum() == 1).all()
    assert c2["cluster_id"].nunique() >= 1
    # day-2 brought in near-dups of day-1 content: cluster count grows
    # by LESS than the new row count (some new rows joined old clusters)
    assert c2["cluster_id"].nunique() - n_clusters_day1 < day2.num_rows

    # --- training prep: representatives -> split -> pack ----------
    reps = c2[c2["is_representative"]][["url"]].copy()
    corpus = tbl.to_pandas().merge(reps, on="url")
    corpus = corpus.reset_index(drop=True)
    corpus["doc_id"] = np.arange(len(corpus), dtype=np.int64)
    ds = rd.from_pandas(corpus[["doc_id", "text"]])
    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    splits = hash_split(ds, key_col="doc_id", fracs=fracs, seed=7).to_pandas()
    assert len(splits) == len(corpus)
    by = splits["split"].value_counts()
    assert set(by.index) <= {"train", "val", "test"}
    assert by.get("train", 0) > by.get("val", 0)

    train_ids = set(splits.loc[splits["split"] == "train", "doc_id"])
    train = corpus[corpus["doc_id"].isin(train_ids)]
    packed = pack_sequences(rd.from_pandas(train[["doc_id", "text"]]),
                            seq_len=128, num_parts=4).to_pandas()
    assert len(packed) == len(train)
    packed = packed.sort_values("doc_id").reset_index(drop=True)
    # global offsets are a prefix sum of token counts in id order
    want = np.concatenate([[0], packed["n_tokens"].to_numpy()[:-1].cumsum()])
    assert (packed["start_offset"].to_numpy() == want).all()
