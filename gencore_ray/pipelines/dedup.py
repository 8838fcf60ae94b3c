"""The flagship near-dup pipeline (SURVEY §3 "Our pipeline lifecycle").

    pages --SignatureStage--> signatures (incl. uint64 doc hash)
          --candidate_pairs (LSH explode -> bucket exchange, capped)
          --verified_edges  (2 int-keyed joins + exact jaccard/
                             containment/hamming; pair dedupe in-join)
          --> connected components (driver union-find | distributed
              large-star/small-star)
    signatures(features) + labels
          --elect_representatives--> clusters(url, cluster_id,
                                              cluster_size,
                                              is_representative, rep_score)

Exchanges: bucket exchange (bkey), two verify joins (doc hash), the
cluster-id election exchange — each keyed, slim, and justified in its
stage module.  Stage outputs are materialized (or checkpointed) and
coalesced; gencore file refs live in the stage modules.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.stages.cc import distributed_cc, driver_cc
from gencore_ray.stages.elect import elect_representatives
from gencore_ray.stages.lsh import candidate_pairs
from gencore_ray.stages.signature import SignatureStage
from gencore_ray.stages.verify import verified_edges
from gencore_ray.state.manifest import CheckpointManager


@dataclass
class DedupResult:
    clusters: rd.Dataset
    counters: dict[str, int] = field(default_factory=dict)


def compute_signatures(
    pages: rd.Dataset, cfg: DedupConfig, extract_html: bool = False
) -> rd.Dataset:
    """pages -> signatures. Optionally runs HTML extraction first
    (actor pool; html never leaves this stage)."""
    stage = SignatureStage(cfg, extract_from="html" if extract_html else None)
    kwargs = {}
    if cfg.sig_concurrency is not None:
        # explicit actor pool (heavy per-actor state, e.g. a real model)
        kwargs["concurrency"] = cfg.sig_concurrency
        kwargs["fn_constructor_kwargs"] = {
            "cfg": cfg, "extract_from": "html" if extract_html else None,
        }
        stage = SignatureStage
    # default: a prebuilt INSTANCE -> stateless tasks. The stage state
    # (perm matrices, compiled regexes) is tiny, so elastic tasks on
    # warm workers beat paying actor-pool spawn ramp at high CPU counts;
    # pass sig_concurrency for genuinely heavy state.
    return pages.map_batches(
        stage,
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size if not extract_html else min(cfg.sig_batch_size, 512),
        zero_copy_batch=True,
        **kwargs,
    )


def dedup_pages(
    pages: rd.Dataset,
    cfg: DedupConfig | None = None,
    extract_html: bool = False,
    cc_mode: str = "auto",            # "auto" | "driver" | "distributed"
    checkpoint_dir: str | None = None,
    cc_driver_max_edges: int = 5_000_000,
    state_dir: str | None = None,     # persist sig+clusters for incremental_dedup
) -> DedupResult:
    """Full near-dup detection + clustering + representative election."""
    cfg = cfg or DedupConfig()
    ckpt = CheckpointManager(checkpoint_dir, enabled=checkpoint_dir is not None)

    # --- stage fingerprints: chained, covering config AND input identity
    # AND the extract flag AND the upstream stage (a resume with the same
    # config but a different corpus or toggled extract_html must MISS,
    # not silently reload stale parquet)
    import hashlib as _hl
    import json as _json

    def _chain(*parts: str) -> str:
        return _hl.sha256("|".join(parts).encode()).hexdigest()[:16]

    try:
        # identity = (path, size, mtime) per input file: a file
        # OVERWRITTEN in place with different data must change the
        # fingerprint, not just a renamed one
        import os as _os

        def _stat(p: str):
            try:
                st = _os.stat(p)
                return [p, st.st_size, st.st_mtime_ns]
            except OSError:
                return [p, -1, -1]

        in_files = sorted(_stat(p) for p in (pages.input_files() or []))
    except Exception:
        in_files = []
    try:
        in_schema = ",".join(pages.schema().base_schema.names)
    except Exception:
        in_schema = "?"
    in_rows = ""
    if not in_files and ckpt.enabled:
        # in-memory input: no files to identify it.  Schema+count alone
        # is NOT an identity (two different corpora with equal schema
        # and row count would silently share stale stage parquet), so
        # fold in a CONTENT digest: the order-insensitive sum of
        # per-row hashes over url AND the content column — one
        # distributed pass, only paid when checkpointing is actually on.
        if isinstance(pages, rd.dataset.MaterializedDataset):
            from pandas.util import hash_pandas_object as _hpo

            _dig_cols = [c for c in ("url", "text", "html")
                         if c in pages.columns()]

            def _digest(t: pa.Table) -> pa.Table:
                h = _hpo(
                    t.select(_dig_cols).to_pandas(), index=False
                ).to_numpy()
                import numpy as _np

                with _np.errstate(over="ignore"):
                    d = h.astype("uint64").sum(dtype="uint64")
                return pa.table({
                    "d": pa.array([int(d)], pa.uint64()),
                    "n": [t.num_rows],
                })

            dd = pages.map_batches(_digest, batch_format="pyarrow").to_pandas()
            import numpy as _np

            with _np.errstate(over="ignore"):
                content = int(dd["d"].to_numpy().astype("uint64").sum(
                    dtype="uint64"))
            in_rows = f"{int(dd['n'].sum())}:{content:x}"
        else:
            # lazy in-memory lineage: no stable identity to key a resume
            # on — checkpointing OFF beats silently reusing stale stages
            import sys as _sys

            print(
                "[gencore_ray] checkpointing disabled: input has no files "
                "and is not materialized, so no stable input identity "
                "exists (materialize() the input to enable resume)",
                file=_sys.stderr,
            )
            ckpt = CheckpointManager(None, enabled=False)
    input_id = _chain(_json.dumps(in_files), in_schema, in_rows)
    fps: dict[str, str] = {}
    prev = _chain(cfg.fingerprint(), input_id, f"extract={extract_html}")
    for _stage in ("signatures", "candidate_pairs", "verified_edges", "clusters"):
        prev = fps[_stage] = _chain(prev, _stage)

    counters: dict[str, int] = {}

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))

    import os as _os

    _timing = _os.environ.get("GENCORE_TIMING")

    def _t(label: str, t0: float) -> None:
        if _timing:
            import sys as _sys

            print(f"[timing] {label}: {time.monotonic() - t0:.2f}s", file=_sys.stderr)

    def run_stage(name: str, build):
        """Checkpoint if enabled, else materialize: every stage output
        feeds multiple consumers or a barrier, and one mega-DAG
        (explode+3 sorts+2 joins fused) measures ~2x slower than
        stage-at-a-time execution on this Ray version.  Outputs are
        coalesced to O(ncpu) blocks — exchange cost here is dominated
        by per-block dispatch, not bytes (measured: a 5M-row groupby is
        0.4s from 32 blocks, 2.2s from 180)."""
        t0 = time.monotonic()
        ds = ckpt.stage(name, fps[name], build)
        if ckpt.enabled:
            _t(name, t0)
            return ds
        ds = ds.materialize()
        # block-count target respects BOTH directions: coalesce the
        # many-tiny-blocks case down to ~ncpu (dispatch-bound exchanges)
        # AND split the few-huge-blocks case (a single block must stay
        # far below Arrow's 2 GB IPC ceiling — at 4M pages / 8 cpus a
        # signature block reaches ~1.6 GB without this)
        nbytes = ds.size_bytes() or 0
        target = max(ncpu, int(nbytes // (512 << 20)) + 1)
        if ds.num_blocks() != target and not _os.environ.get(
                "GENCORE_NO_REPART") and (
                ds.num_blocks() > target or nbytes > 512 << 20):
            ds = ds.repartition(target).materialize()
        _t(name, t0)
        return ds

    sig = run_stage("signatures", lambda: compute_signatures(pages, cfg, extract_html))

    # --- edge generation -------------------------------------------
    # NOTE: no separate exact-dup pass. Identical texts have identical
    # MinHash => share every band bucket, and inside an over-cap bucket
    # they sort adjacently (identical simhash, consecutive urls) so the
    # neighbor-linking always connects them; verification yields
    # jaccard=1 >= tau. The standalone exact_dedup operator remains for
    # exact-only pipelines (stages/exact.py).
    pairs = run_stage(
        "candidate_pairs", lambda: candidate_pairs(sig, cfg, dedupe=False)
    )
    if ckpt.enabled:
        # disk-backed (checkpointed) stage inputs are not
        # MaterializedDatasets, but parquet metadata makes counting
        # cheap — pass an explicit mass estimate so the attached-pair
        # partition count still scales with DATA (Arrow 2 GB IPC bound),
        # not only with CPUs.  ~2.5 KB/doc payload when size is unknown.
        sig_rows = max(1, sig.count())
        nb = sig.size_bytes() or (2560 * sig_rows)
        ve_est = pairs.count() * (16.0 + nb / sig_rows)
    else:
        ve_est = None
    ver_edges = run_stage(
        "verified_edges",
        lambda: verified_edges(pairs, sig, cfg, est_bytes=ve_est))

    # lineage counters (gencore Stats analogue, src/stats.cpp:101-151);
    # counts on materialized datasets read block metadata — no recompute
    counters["pages_in"] = sig.count()
    counters["candidate_pairs"] = pairs.count()
    counters["verified_edges"] = ver_edges.count()

    # the three AGGREGATE counters below each launch a full task wave
    # over a materialized table; none of them gates the CC/elect tail,
    # so they run in background threads and join before the counters
    # are read (and before sig/pairs references are dropped) — at 1M
    # pages this takes ~1 s of fixed wave latency off the critical path
    import threading as _threading

    _cthreads: list = []
    _cerrs: list = []

    def _async_counter(fn) -> None:
        def _run():
            try:
                fn()
            except Exception as e:          # re-raised at join
                _cerrs.append(e)

        th = _threading.Thread(target=_run, daemon=True)
        th.start()
        _cthreads.append(th)

    def _join_counters() -> None:
        for th in _cthreads:
            th.join()
        _cthreads.clear()
        if _cerrs:
            raise _cerrs[0]

    # exploded bucket-key volume (the pipeline's one big exchange):
    # exact count derived from the materialized signature table — bands
    # + sketch keys per active doc + C(B, B-k) simhash combos — without
    # re-running the explode. Reported per-doc so a config change's
    # shuffle-mass impact is visible in every manifest.
    from gencore_ray.stages.lsh import simhash_combo_count

    n_combo = simhash_combo_count() if cfg.simhash_enabled else 0

    def _key_mass(t: pa.Table) -> pa.Table:
        active = t["shingle_count"].to_numpy(zero_copy_only=False) >= cfg.min_shingles
        ck = t["ckeys"].combine_chunks() if isinstance(t["ckeys"], pa.ChunkedArray) else t["ckeys"]
        n_ck = int(len(ck.values))
        return pa.table({"k": [int(active.sum()) * (cfg.bands + n_combo) + n_ck]})

    def _explode_rows(_sig=sig) -> None:
        counters["explode_rows"] = int(
            _sig.map_batches(_key_mass, batch_format="pyarrow").sum("k") or 0
        )
        if counters["pages_in"]:
            counters["explode_rows_per_doc_x100"] = (
                counters["explode_rows"] * 100 // counters["pages_in"]
            )

    _async_counter(_explode_rows)

    def _capped(_pairs=pairs) -> None:
        try:
            counters["capped_docs"] = int(_pairs.sum("capped") or 0)
        except Exception:
            pass

    _async_counter(_capped)
    if cfg.simhash_enabled:
        # edges that qualified ONLY via the Hamming clause: exactly the
        # delta between this pipeline and its fully SQL-expressible
        # simhash_enabled=False twin (pages_dedup_sql) — counted so the
        # manifest shows each edge source's contribution, and so the
        # cross-check test can prove full == sql-twin + these edges
        tau, c = cfg.jaccard_threshold, cfg.containment_threshold

        def _ham_only(t: pa.Table) -> pa.Table:
            jac = t["jaccard"].to_numpy(zero_copy_only=False)
            cont = t["containment"].to_numpy(zero_copy_only=False)
            return pa.table({"k": [int(((jac < tau) & (cont < c)).sum())]})

        def _hamming(_ve=ver_edges) -> None:
            counters["hamming_only_edges"] = int(
                _ve.map_batches(_ham_only, batch_format="pyarrow").sum("k") or 0
            )

        _async_counter(_hamming)

    all_edges = ver_edges.select_columns(["url_a", "url_b"])

    # --- connected components --------------------------------------
    # auto: collected edges are orders of magnitude smaller than the
    # corpus, so the vectorised driver CC wins below the threshold; the
    # caller never needs to know (gencore's analogous internal switch:
    # low-complexity clusters take the cheap path, src/group.cpp:142-175)
    if cc_mode == "auto":
        cc_mode = (
            "driver" if counters["verified_edges"] <= cc_driver_max_edges
            else "distributed"
        )
    features = sig.select_columns(
        [c for c in ["url", "warc_ts", "text_len", "quality"] if c in sig.columns()]
    )
    feat_thread = None
    feat_box: dict = {}
    if state_dir is None:
        # CC/elect only ever touch the slim feature columns; pin them as
        # their own materialized blocks and drop the LAST references to
        # the heavy signature table (tshash shingle sets + minhash +
        # ckeys are ~10x the feature bytes) and the raw pair table, so
        # the object store can evict/un-spill them during the tail
        # stages instead of holding peak bytes to the end of the run.
        # (state_dir keeps sig alive: save_state persists it below.)
        # The pin runs in a BACKGROUND thread so its task wave overlaps
        # the driver-serial CC below (both only read sig; the thread
        # merely submits Ray tasks) — a measured ~1 s off the critical
        # path at 1M pages that neither leg's cpu count can touch.
        import threading

        def _pin() -> None:
            try:
                feat_box["ds"] = features.materialize()
            except Exception as e:      # re-raised at join, not lost
                feat_box["err"] = e

        feat_thread = threading.Thread(target=_pin, daemon=True)
        feat_thread.start()

    def _pinned_features():
        nonlocal features, sig, pairs
        if feat_thread is not None:
            feat_thread.join()
            if "err" in feat_box:
                raise feat_box["err"]
            features = feat_box["ds"]
            # counter threads hold their own sig/pairs refs — join them
            # before dropping ours so the release actually releases
            _join_counters()
            sig = None
            pairs = None
        return features

    t_cc = time.monotonic()
    if cc_mode == "distributed":
        from gencore_ray.stages.shuffle import hash_join

        labels = distributed_cc(all_edges).map_batches(
            lambda t: t.rename_columns(
                ["node" if c == "url" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
        members = hash_join(
            _pinned_features(), labels, "url", "node",
            num_parts=cfg.join_num_partitions or ncpu, how="left_outer",
        )

        def fill(t: pa.Table) -> pa.Table:
            lab = t["label"].to_pandas()
            lab = lab.fillna(pd.Series(t["url"].to_pandas()))
            t = t.drop_columns(["label"])
            return t.append_column("cluster_id", pa.array(lab, pa.string()))

        members = members.map_batches(fill, batch_format="pyarrow")
    else:
        label_map = driver_cc(all_edges)
        import ray as _ray

        map_ref = _ray.put(label_map)

        def assign(t: pa.Table) -> pa.Table:
            m = _ray.get(map_ref)
            urls = t["url"].to_pandas()
            lab = urls.map(m).fillna(urls)     # vectorised dict lookup
            return t.append_column("cluster_id", pa.array(lab, pa.string()))

        members = _pinned_features().map_batches(assign, batch_format="pyarrow")

    _t("cc+assign", t_cc)
    # labels are assigned; the edge table's last consumer has run
    ver_edges = None
    all_edges = None
    clusters = run_stage(
        "clusters", lambda: elect_representatives(members, cfg, num_parts=ncpu)
    )
    _join_counters()          # no-op if _pinned_features already joined
    counters["pages_out"] = clusters.count()
    if cc_mode == "driver":
        counters["dup_pages"] = len(label_map)               # pages in multi-clusters
        counters["dup_clusters"] = len(set(label_map.values()))
    else:
        # same counters from the materialised clusters table (two cheap
        # metadata-backed passes; no driver-side label map exists here)
        counters["dup_pages"] = clusters.filter(expr="cluster_size > 1").count()
        counters["dup_clusters"] = (
            clusters.filter(expr="cluster_size > 1")
            .filter(expr="is_representative == True").count()
        )
    counters["clusters_total"] = (
        counters["pages_out"] - counters["dup_pages"] + counters["dup_clusters"]
    )
    if ckpt.enabled:
        # duplication-level histogram for the reports (gencore's
        # supporting-reads histogram, src/stats.h:15): one small
        # pre-aggregated exchange over the representatives
        from gencore_ray.ops.relational import grouped_aggregate

        reps = clusters.filter(expr="is_representative == True").select_columns(
            ["cluster_size"]
        )
        hdf = grouped_aggregate(
            reps, ["cluster_size"], [("n", None, "count")], num_parts=4
        ).to_pandas()
        hist = dict(zip(hdf["cluster_size"].astype(int), hdf["n"].astype(int)))
        ckpt.write_report(counters, histogram=hist)
    if state_dir is not None:
        # durable incremental state (pipelines/incremental.py): full
        # signature table + the UNFILTERED clusters table
        from gencore_ray.pipelines.incremental import save_state

        save_state(state_dir, sig, clusters, cfg)
    if cfg.min_cluster_size > 1:
        n = cfg.min_cluster_size
        clusters = clusters.filter(expr=f"cluster_size >= {n}")
    return DedupResult(clusters=clusters, counters=counters)
