"""Incremental dedup: fold a NEW batch of pages into a prior run's
cluster state without re-shuffling the prior corpus.

This is the production daily-crawl pattern: yesterday's 10^12-doc
corpus is already deduplicated; today's 10^8-doc crawl must be merged
into it. gencore's analogue is the incremental cluster flush — only
the active window of clusters stays live while the stream advances
(/root/reference/src/gencore.cpp:319-389); our durable state dir is
that window made persistent across runs.

State layout (written by ``dedup_pages(..., state_dir=)`` or
:func:`save_state`) — VERSIONED, with ``state.json`` as the atomic
commit point (os.replace); readers resolve every path through it, so a
crash mid-merge leaves at worst unlisted orphan dirs and the prior
state fully consistent::

    state_dir/state.json                     commit point: cfg
                                             fingerprint, page count,
                                             sig batch list, current
                                             clusters dir name
    state_dir/signatures/batch-NNNNNN/*.parquet   one dir per merged batch
    state_dir/clusters-NNNNNN/*.parquet           current clusters table

Scale contract — the incremental run never re-shuffles the old corpus:

* old signatures are read with COLUMN PRUNING (4 key columns for the
  explode, the slim 5-column projection for verify);
* old exploded bucket keys are filtered by a Bloom filter of the NEW
  batch's keys BEFORE the bucket exchange, so only buckets a new doc
  touches ever move;
* the old slim verify payload (tshash, ~2 KB/doc) is filtered by a
  Bloom of the candidate-pair doc hashes — it ships only for docs that
  actually appear in a candidate pair;
* old-old pairs are never generated (``nw`` flag in the pairing
  kernel): prior connectivity enters CC as star edges
  (member -> prior cluster_id) for the AFFECTED clusters only.

Equality: the merged cluster table equals a from-scratch
``dedup_pages`` run over old+new (tested in
tests/test_incremental.py), provided (a) urls are disjoint between
batches (a re-crawl of the same url is an update, not an insert — out
of scope here) and (b) no bucket crosses ``bucket_hard_cap`` between
the two runs (neighbor-link pairing inside over-cap buckets depends on
bucket membership).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.functions.hashing import U64
from gencore_ray.pipelines.dedup import DedupResult, compute_signatures
from gencore_ray.stages.cc import driver_cc
from gencore_ray.stages.elect import elect_representatives
from gencore_ray.stages.lsh import _pairs_in_partition, explode_keys
from gencore_ray.stages.verify import _SLIM_COLS, _bloom_add, _bloom_test, _BLOOM_WORDS
from gencore_ray.stages.shuffle import grouped_map

_EXPLODE_COLS = ["uhash", "simhash", "band_key", "ckeys"]
_FEATURE_COLS = ["url", "warc_ts", "text_len", "quality"]
_CLUSTER_COLS = _FEATURE_COLS + [
    "cluster_id", "cluster_size", "is_representative", "rep_score",
]


def _commit_state(state_dir: str, meta: dict) -> None:
    """state.json is the COMMIT POINT: it is replaced atomically
    (os.replace) and every reader resolves sig batches / clusters
    through it, so a crash at any earlier point leaves only unlisted
    orphan dirs — the prior state stays fully consistent."""
    tmp = os.path.join(state_dir, "state.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(state_dir, "state.json"))


def save_state(state_dir: str, sig: rd.Dataset, clusters: rd.Dataset,
               cfg: DedupConfig) -> None:
    """Persist a run's signature + cluster tables as incremental state
    (versioned layout: signatures/batch-NNNNNN dirs + clusters-NNNNNN,
    resolved through the atomically-committed state.json)."""
    import shutil

    os.makedirs(os.path.join(state_dir, "signatures"), exist_ok=True)
    # target dirs are unlisted (orphans from a crashed run at worst):
    # clear them so no stale file rides into the committed batch
    b0 = os.path.join(state_dir, "signatures", "batch-000000")
    c0 = os.path.join(state_dir, "clusters-000000")
    shutil.rmtree(b0, ignore_errors=True)
    shutil.rmtree(c0, ignore_errors=True)
    sig.write_parquet(b0)
    clusters.write_parquet(c0)
    _commit_state(state_dir, {
        "version": 1,
        "cfg_fingerprint": cfg.fingerprint(),
        "pages": clusters.count(),
        "sig_batches": ["batch-000000"],
        "clusters": "clusters-000000",
    })


def _load_state_meta(state_dir: str, cfg: DedupConfig) -> dict:
    path = os.path.join(state_dir, "state.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no incremental state at {state_dir} (run dedup_pages with "
            "state_dir= first, or call save_state)"
        )
    with open(path) as f:
        meta = json.load(f)
    if meta["cfg_fingerprint"] != cfg.fingerprint():
        raise ValueError(
            "incremental state was built with a different DedupConfig — "
            "signatures are not comparable; re-bootstrap the state"
        )
    return meta


def _sig_paths(state_dir: str, meta: dict) -> list[str]:
    """Parquet FILES of every committed signature batch (read_parquet
    expands a single directory but not directories inside a list)."""
    files: list[str] = []
    for b in meta["sig_batches"]:
        d = os.path.join(state_dir, "signatures", b)
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    return files


def _dataset_bloom(ds: rd.Dataset, col: str) -> np.ndarray:
    """OR-reduced Bloom bitmap of one uint64 column (2 MB fixed)."""
    def _b(t: pa.Table) -> pa.Table:
        h = t[col].to_numpy(zero_copy_only=False).astype(U64)
        return pa.table({"bloom": pa.array([_bloom_add(h).tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        _b, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()["bloom"]
    bits = np.zeros(_BLOOM_WORDS, dtype=U64)
    for b in parts:
        bits |= np.frombuffer(b, dtype=U64)
    return bits


def _merge_driver(prior, edges, new_sig, feat_cols, cluster_cols):
    """Driver-CC merge path (small edge sets): collect edges, broadcast
    the affected-url set and the label map.  Returns
    (members, untouched, n_affected_clusters)."""
    edf = (edges.select_columns(["url_a", "url_b"]).to_pandas()
           if edges is not None else None)
    if edf is None or "url_a" not in edf.columns:   # zero verified edges
        edf = pd.DataFrame({"url_a": pd.Series(dtype=str),
                            "url_b": pd.Series(dtype=str)})
    edge_urls = set(edf["url_a"]) | set(edf["url_b"])
    urls_ref = ray.put(edge_urls)

    def _touched_cids(t: pa.Table) -> pa.Table:
        us = ray.get(urls_ref)
        mask = t["url"].to_pandas().isin(us).to_numpy()
        return pa.table({
            "cluster_id": pa.array(
                pd.unique(t["cluster_id"].to_pandas()[mask]), pa.string())
        })

    if edge_urls:
        aff_cids = set(
            prior.map_batches(_touched_cids, batch_format="pyarrow")
            .to_pandas()["cluster_id"]
        )
    else:
        aff_cids = set()
    cids_ref = ray.put(aff_cids)

    def _split(t: pa.Table, affected: bool) -> pa.Table:
        cs = ray.get(cids_ref)
        mask = t["cluster_id"].to_pandas().isin(cs).to_numpy()
        if not affected:
            mask = ~mask
        return t.take(pa.array(np.flatnonzero(mask)))

    aff = prior.map_batches(
        lambda t: _split(t, True), batch_format="pyarrow"
    ).materialize() if aff_cids else None

    # CC over new edges + prior star edges (member -> prior cluster_id;
    # cluster ids ARE min urls, so labels stay urls)
    star = (
        aff.select_columns(["url", "cluster_id"]).to_pandas()
        if aff is not None else pd.DataFrame({"url": [], "cluster_id": []})
    )
    cc_edges = pa.table({
        "url_a": pa.array(
            list(edf["url_a"]) + list(star["url"]), pa.string()),
        "url_b": pa.array(
            list(edf["url_b"]) + list(star["cluster_id"]), pa.string()),
    })
    label_map = driver_cc(rd.from_arrow(cc_edges)) if cc_edges.num_rows else {}
    map_ref = ray.put(label_map)

    def _assign(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        urls = t["url"].to_pandas()
        lab = urls.map(m).fillna(urls)
        return t.append_column("cluster_id", pa.array(lab, pa.string()))

    members = new_sig.select_columns(feat_cols).map_batches(
        _assign, batch_format="pyarrow"
    )
    if aff is not None:
        members = members.union(
            aff.select_columns(feat_cols).map_batches(
                _assign, batch_format="pyarrow")
        )
    untouched = prior.map_batches(
        lambda t: _split(t, False), batch_format="pyarrow"
    ).select_columns(cluster_cols)
    return members, untouched, len(aff_cids)


def _merge_distributed(prior, edges, new_sig, feat_cols, cluster_cols,
                       num_parts: int):
    """Distributed merge path: neither the edge set nor any url/label
    map ever lands on the driver.  Affected clusters are found by a
    semi join (prior members vs edge endpoints), star edges flow as a
    Dataset into ``distributed_cc``, and labels re-attach via
    partitioned left-outer hash joins (the flagship's distributed
    branch, pipelines/dedup.py).  Returns (members, untouched, n_aff).
    """
    from gencore_ray.stages.cc import distributed_cc
    from gencore_ray.stages.shuffle import (
        dedupe_rows, hash_join, to_arrow_blocks)

    e = to_arrow_blocks(
        edges.select_columns(["url_a", "url_b"])).materialize()

    def _endpoints(t: pa.Table) -> pa.Table:
        a = (t["url_a"].combine_chunks()
             if isinstance(t["url_a"], pa.ChunkedArray) else t["url_a"])
        b = (t["url_b"].combine_chunks()
             if isinstance(t["url_b"], pa.ChunkedArray) else t["url_b"])
        return pa.table({"eurl": pa.concat_arrays([a, b])})

    eu = e.map_batches(_endpoints, batch_format="pyarrow")
    touched = hash_join(
        prior.select_columns(["url", "cluster_id"]), eu, "url", "eurl",
        num_parts=num_parts, how="semi")
    tc = to_arrow_blocks(
        dedupe_rows(touched.select_columns(["cluster_id"]), ["cluster_id"],
                    num_parts=num_parts)
    ).rename_columns({"cluster_id": "tcid"}).materialize()
    n_aff = tc.count()

    if n_aff:
        aff = hash_join(prior, tc, "cluster_id", "tcid",
                        num_parts=num_parts, how="semi").materialize()
        untouched = hash_join(prior, tc, "cluster_id", "tcid",
                              num_parts=num_parts, how="anti"
                              ).select_columns(cluster_cols)
        star = aff.select_columns(["url", "cluster_id"]).map_batches(
            lambda t: pa.table({"url_a": t["url"], "url_b": t["cluster_id"]}),
            batch_format="pyarrow")
        cc_in = e.union(star)
    else:
        aff = None
        untouched = prior.select_columns(cluster_cols)
        cc_in = e

    labels = distributed_cc(cc_in).map_batches(
        lambda t: pa.table({"node": t["url"], "label": t["label"]}),
        batch_format="pyarrow").materialize()

    def _attach(src: rd.Dataset) -> rd.Dataset:
        j = hash_join(
            to_arrow_blocks(src.select_columns(feat_cols)), labels,
            "url", "node", num_parts=num_parts, how="left_outer")

        def fill(t: pa.Table) -> pa.Table:
            lab = t["label"].to_pandas()
            lab = lab.fillna(pd.Series(t["url"].to_pandas()))
            t = t.drop_columns(["label"])
            return t.append_column("cluster_id", pa.array(lab, pa.string()))

        return j.map_batches(fill, batch_format="pyarrow")

    members = _attach(new_sig)
    if aff is not None:
        members = members.union(_attach(aff))
    return members, untouched, n_aff


def incremental_dedup(
    new_pages: rd.Dataset,
    state_dir: str,
    cfg: DedupConfig | None = None,
    extract_html: bool = False,
    update_state: bool = True,
    cc_mode: str = "auto",            # "auto" | "driver" | "distributed"
    cc_driver_max_edges: int = 5_000_000,
) -> DedupResult:
    """Merge a new page batch into prior dedup state.

    Returns the UPDATED full clusters table (prior rows of untouched
    clusters pass through byte-identical; affected clusters and all
    new docs are re-labelled and re-elected). With ``update_state``
    the state dir is advanced to reflect the merge (new signatures
    appended; clusters dir atomically replaced).

    CC follows the flagship's auto discipline (pipelines/dedup.py): at
    most ``cc_driver_max_edges`` verified edges take the vectorised
    driver path; above it the edge table NEVER lands on the driver —
    prior-cluster star edges flow as a Dataset into ``distributed_cc``
    and labels re-attach via partitioned hash joins, so a pathological
    daily batch (boilerplate linking a large fraction of the prior
    corpus) degrades to extra exchanges, not driver memory.
    """
    cfg = cfg or DedupConfig()
    meta = _load_state_meta(state_dir, cfg)
    sig_paths = _sig_paths(state_dir, meta)
    cl_dir = os.path.join(state_dir, meta["clusters"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = cfg.pair_num_partitions or ncpu
    counters: dict[str, int] = {"prior_pages": int(meta.get("pages", 0))}

    import sys
    import time

    _timing = os.environ.get("GENCORE_TIMING")
    _t0 = time.monotonic()

    def _t(label: str) -> None:
        nonlocal _t0
        if _timing:
            now = time.monotonic()
            print(f"[inc-timing] {label}: {now - _t0:.2f}s", file=sys.stderr)
            _t0 = now

    new_sig = compute_signatures(new_pages, cfg, extract_html).materialize()
    counters["new_pages_in"] = new_sig.count()
    _t("new_signatures")

    # --- candidate pairs touching >=1 new doc ----------------------
    sim_on = cfg.simhash_enabled

    def _explode_new(t: pa.Table) -> pa.Table:
        out = explode_keys(t, include_simhash_keys=sim_on)
        return out.append_column("nw", pa.array(np.ones(out.num_rows, dtype=bool)))

    new_expl = new_sig.map_batches(
        _explode_new, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # Bloom of the new batch's bucket keys: old exploded rows pass the
    # exchange only if their bucket may contain a new doc (FPs just add
    # harmless rows — pairing still requires a real shared key).
    key_bloom_ref = ray.put(_dataset_bloom(new_expl, "bkey"))
    _t("new_explode+key_bloom")

    def _explode_old(t: pa.Table) -> pa.Table:
        out = explode_keys(t, include_simhash_keys=sim_on)
        bl = ray.get(key_bloom_ref)
        k = out["bkey"].to_numpy(zero_copy_only=False).astype(U64)
        out = out.take(pa.array(np.flatnonzero(_bloom_test(bl, k))))
        return out.append_column("nw", pa.array(np.zeros(out.num_rows, dtype=bool)))

    old_expl = rd.read_parquet(sig_paths, columns=_EXPLODE_COLS).map_batches(
        _explode_old, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = grouped_map(
        new_expl.union(old_expl), "bkey",
        lambda df: _pairs_in_partition(df, cfg), num_parts=P,
    ).materialize()
    counters["candidate_pairs"] = pairs.count()
    _t("old_explode+pairing")

    # --- verify ------------------------------------------------------
    # slim payload: new docs fully, old docs only if a pair references
    # them (Bloom of pair doc hashes — same trade as the multi-node
    # verify prefilter, but here it is what keeps the increment O(new))
    from gencore_ray.stages.verify import verified_edges

    if counters["candidate_pairs"]:
        # one pass builds the Bloom over BOTH pair columns
        def _pair_bloom(t: pa.Table) -> pa.Table:
            both = np.concatenate([
                t["ha"].to_numpy(zero_copy_only=False),
                t["hb"].to_numpy(zero_copy_only=False),
            ]).astype(U64)
            return pa.table(
                {"bloom": pa.array([_bloom_add(both).tobytes()], pa.binary())}
            )

        parts = pairs.select_columns(["ha", "hb"]).map_batches(
            _pair_bloom, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()["bloom"]
        doc_bloom = np.zeros(_BLOOM_WORDS, dtype=U64)
        for b in parts:
            doc_bloom |= np.frombuffer(b, dtype=U64)
        doc_bloom_ref = ray.put(doc_bloom)

        def _filter_old_slim(t: pa.Table) -> pa.Table:
            bl = ray.get(doc_bloom_ref)
            uh = t["uhash"].to_numpy(zero_copy_only=False).astype(U64)
            return t.take(pa.array(np.flatnonzero(_bloom_test(bl, uh))))

        old_slim = rd.read_parquet(sig_paths, columns=_SLIM_COLS).map_batches(
            _filter_old_slim, batch_format="pyarrow", zero_copy_batch=True
        )
        slim = new_sig.select_columns(_SLIM_COLS).union(old_slim)
        _t("pair_doc_bloom")
        edges = verified_edges(pairs, slim, cfg).materialize()
        n_edges = edges.count()
        _t("verify")
    else:
        edges = None
        n_edges = 0
    counters["new_edges"] = n_edges

    # flagship auto discipline (pipelines/dedup.py): the collected edge
    # set is driver-safe only below the threshold; above it everything
    # stays a Dataset end to end
    if cc_mode == "auto":
        cc_mode = "driver" if n_edges <= cc_driver_max_edges else "distributed"

    prior = rd.read_parquet(cl_dir)
    # feature columns present in BOTH the prior state and the new batch
    # (warc_ts is optional in the pages schema); the output schema
    # follows the state
    feat_cols = [c for c in _FEATURE_COLS
                 if c in prior.columns() and c in new_sig.columns()]
    cluster_cols = feat_cols + [
        "cluster_id", "cluster_size", "is_representative", "rep_score",
    ]

    if cc_mode == "distributed" and n_edges > 0:
        members, untouched, n_aff = _merge_distributed(
            prior, edges, new_sig, feat_cols, cluster_cols, P)
        counters["affected_clusters"] = n_aff
        _t("affected_scan")
    else:
        members, untouched, n_aff = _merge_driver(
            prior, edges, new_sig, feat_cols, cluster_cols)
        counters["affected_clusters"] = n_aff
        _t("affected_scan")
    updated = elect_representatives(members, cfg, num_parts=ncpu)
    updated = updated.select_columns(cluster_cols)
    clusters = updated.union(untouched)
    if update_state:
        clusters = clusters.materialize()
        counters["pages_out"] = clusters.count()
    else:
        # nothing is ever dropped by a merge: arithmetic beats a full
        # count() pass over the (mostly untouched) union
        counters["pages_out"] = counters["prior_pages"] + counters["new_pages_in"]
    _t("cc+elect+assemble")

    if update_state:
        # versioned advance: write the new sig batch + clusters dir,
        # THEN atomically commit state.json pointing at them; only
        # after the commit is the superseded clusters dir removed.
        # A crash at any point leaves the prior state fully usable
        # (orphan unlisted dirs at worst).
        import shutil

        k = len(meta["sig_batches"])
        batch_name = f"batch-{k:06d}"
        clusters_name = f"clusters-{k:06d}"
        bdir = os.path.join(state_dir, "signatures", batch_name)
        cdir = os.path.join(state_dir, clusters_name)
        # unlisted orphans (crashed prior attempt) must not leak stale
        # files into the batch we are about to commit
        shutil.rmtree(bdir, ignore_errors=True)
        shutil.rmtree(cdir, ignore_errors=True)
        new_sig.write_parquet(bdir)
        clusters.write_parquet(cdir)
        _commit_state(state_dir, {
            "version": 1,
            "cfg_fingerprint": cfg.fingerprint(),
            "pages": counters["pages_out"],
            "sig_batches": meta["sig_batches"] + [batch_name],
            "clusters": clusters_name,
        })
        shutil.rmtree(cl_dir, ignore_errors=True)   # superseded

    if cfg.min_cluster_size > 1:
        clusters = clusters.filter(
            expr=f"cluster_size >= {cfg.min_cluster_size}"
        )
    return DedupResult(clusters=clusters, counters=counters)
