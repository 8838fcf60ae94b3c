"""The flagship near-dup pipeline (SURVEY §3 "Our pipeline lifecycle").

    pages --SignatureStage--> signatures
          --exact_edges------------------------\\
          --candidate_pairs--> verified_edges --+--> connected components
                                                      |
    signatures(features) <---- labels ----------------/
          --elect_representatives--> clusters(url, cluster_id,
                                              cluster_size,
                                              is_representative, rep_score)

Everything is lazy Ray Data until a checkpoint or the final sink; the
only all-to-all exchanges are: the band-bucket groupby, the exact-hash
groupby, the pair-dedupe groupby, two pair⋈signature joins, the label
join and the cluster-id groupby — each keyed and justified in its
stage module.  gencore file refs live in the stage modules.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.extract import ExtractStage
from gencore_ray.stages.cc import distributed_cc, driver_cc
from gencore_ray.stages.exact import exact_edges
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
    if extract_html:
        pages = pages.map_batches(
            ExtractStage,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=cfg.sig_concurrency or (2, 8),
            zero_copy_batch=True,
        )
        keep = [c for c in ["url", "warc_ts", "text", "lang"] if c in pages.columns()]
        pages = pages.select_columns(keep)
    return pages.map_batches(
        SignatureStage,
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"cfg": cfg},
        # autoscaling actor pool: state (perm matrices) built once per actor
        concurrency=cfg.sig_concurrency or (1, 16),
    )


def dedup_pages(
    pages: rd.Dataset,
    cfg: DedupConfig | None = None,
    extract_html: bool = False,
    cc_mode: str = "driver",          # "driver" | "distributed"
    checkpoint_dir: str | None = None,
) -> DedupResult:
    """Full near-dup detection + clustering + representative election."""
    cfg = cfg or DedupConfig()
    ckpt = CheckpointManager(checkpoint_dir, enabled=checkpoint_dir is not None)
    fp = cfg.fingerprint()
    counters: dict[str, int] = {}

    sig = ckpt.stage("signatures", fp, lambda: compute_signatures(pages, cfg, extract_html))
    if not ckpt.enabled:
        # signatures feed 4 consumers (exact, LSH, verify-join, features);
        # without a parquet checkpoint each consumer would re-run the whole
        # extract+signature lineage. Pin it once (spills to disk if large —
        # production runs should pass checkpoint_dir instead).
        sig = sig.materialize()

    # --- edge sources ----------------------------------------------
    ex_edges = ckpt.stage(
        "exact_edges", fp, lambda: exact_edges(sig, min_shingles=cfg.min_shingles)
    )

    pairs = ckpt.stage("candidate_pairs", fp, lambda: candidate_pairs(sig, cfg))
    ver_edges = ckpt.stage("verified_edges", fp, lambda: verified_edges(pairs, sig, cfg))

    from gencore_ray.stages.shuffle import to_arrow_blocks

    all_edges = to_arrow_blocks(ver_edges.select_columns(["url_a", "url_b"])).union(
        to_arrow_blocks(ex_edges.select_columns(["url_a", "url_b"]))
    )

    # --- connected components --------------------------------------
    features = sig.select_columns(
        [c for c in ["url", "warc_ts", "text_len", "quality"] if c in sig.columns()]
    )
    if cc_mode == "distributed":
        from gencore_ray.stages.shuffle import hash_join

        labels = distributed_cc(all_edges).map_batches(
            lambda t: t.rename_columns(
                ["node" if c == "url" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
        members = hash_join(
            features, labels, "url", "node",
            num_parts=cfg.join_num_partitions, how="left_outer",
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
            urls = t["url"].to_pylist()
            lab = [m.get(u, u) for u in urls]
            return t.append_column("cluster_id", pa.array(lab, pa.string()))

        members = features.map_batches(assign, batch_format="pyarrow")

    clusters = ckpt.stage(
        "clusters", fp, lambda: elect_representatives(members, cfg)
    )
    if cfg.min_cluster_size > 1:
        n = cfg.min_cluster_size
        clusters = clusters.filter(expr=f"cluster_size >= {n}")
    return DedupResult(clusters=clusters, counters=counters)
