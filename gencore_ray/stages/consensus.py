"""Cluster consensus synthesis (SURVEY §2.4 G6 — the one gencore
semantic the engine previously only approximated).

gencore collapses each read group into a NEW record: a quality-weighted
per-position majority vote over the aligned member reads
(/root/reference/src/group.cpp:320-526), with duplex disagreement
masking (/root/reference/src/cluster.cpp:190-258) and FR/RR rationale
tags on the output.  The text analogue synthesizes one record per
cluster:

  * ``consensus_text`` — per-POSITION quality-weighted token vote over
    the members' whitespace-token streams (position == alignment
    coordinate; members are near-identical by construction, so
    positional voting is the honest analogue of the read-pileup vote).
    Ties break to the lexicographically smallest token (deterministic,
    like the reference's map-order tie-break).
  * ``content_src`` — rationale tag (gencore's FR/RR analogue):
    "single" for singletons, "consensus_vote" for voted clusters.
  * ``vote_agreement`` — fraction of positions where every member
    agreed (the duplex-consistency signal; 1.0 for singletons).
  * merged metadata — rep_url (elected member), max_quality,
    max_text_len, total_text_len (order-insensitive exact aggregates).

Runs as one exchange keyed on cluster_id; singleton clusters are
synthesized fully vectorised, only genuine multi-member clusters (the
tiny minority) take the per-cluster vote path — each vote itself a
vectorised pass over the member-x-position token matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gencore_ray.config import DedupConfig


def _vote_cluster(texts: list[str], weights: np.ndarray) -> tuple[str, float]:
    """Quality-weighted per-position token vote -> (consensus, agreement)."""
    toks = [t.split() if t else [] for t in texts]
    max_len = max(len(t) for t in toks)
    out: list[str] = []
    agree = 0
    for p in range(max_len):
        cand: dict[str, float] = {}
        for m, tl in enumerate(toks):
            if p < len(tl):
                cand[tl[p]] = cand.get(tl[p], 0.0) + float(weights[m])
        if len(cand) == 1:
            agree += 1
        # max weight, ties -> lexicographically smallest token
        best = min(cand.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append(best)
    return " ".join(out), (agree / max_len if max_len else 1.0)


def _synth_partition(df: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    cols = {
        "cluster_id": pd.Series(dtype=object),
        "cluster_size": pd.Series(dtype=np.int64),
        "rep_url": pd.Series(dtype=object),
        "content_src": pd.Series(dtype=object),
        "consensus_text": pd.Series(dtype=object),
        "vote_agreement": pd.Series(dtype=np.float64),
        "max_quality": pd.Series(dtype=np.float64),
        "max_text_len": pd.Series(dtype=np.int64),
        "total_text_len": pd.Series(dtype=np.int64),
    }
    if not len(df):
        return pd.DataFrame(cols)
    df = df.sort_values(["cluster_id", "url"], kind="mergesort")
    size = df.groupby("cluster_id", sort=False)["url"].transform("size")

    # --- singletons: fully vectorised passthrough synthesis
    single = df[size.to_numpy() == 1]
    parts = []
    if len(single):
        parts.append(pd.DataFrame({
            "cluster_id": single["cluster_id"].to_numpy(),
            "cluster_size": np.ones(len(single), dtype=np.int64),
            "rep_url": single["url"].to_numpy(),
            "content_src": np.full(len(single), "single", dtype=object),
            "consensus_text": single["text"].fillna("").to_numpy(),
            "vote_agreement": np.ones(len(single)),
            "max_quality": single["quality"].to_numpy(dtype=np.float64),
            "max_text_len": single["text_len"].to_numpy(dtype=np.int64),
            "total_text_len": single["text_len"].to_numpy(dtype=np.int64),
        }))

    # --- multi-member clusters: per-cluster quality-weighted vote
    multi = df[size.to_numpy() > 1]
    if len(multi):
        recs = []
        for cid, g in multi.groupby("cluster_id", sort=False):
            w = g["quality"].to_numpy(dtype=np.float64)
            text, agreement = _vote_cluster(
                g["text"].fillna("").tolist(), np.maximum(w, 1e-9)
            )
            rep = g.loc[g["is_representative"], "url"]
            recs.append({
                "cluster_id": cid,
                "cluster_size": np.int64(len(g)),
                "rep_url": rep.iloc[0] if len(rep) else g["url"].iloc[0],
                "content_src": "consensus_vote",
                "consensus_text": text,
                "vote_agreement": round(agreement, 6),
                "max_quality": float(w.max()),
                "max_text_len": np.int64(g["text_len"].max()),
                "total_text_len": np.int64(g["text_len"].sum()),
            })
        parts.append(pd.DataFrame(recs))
    out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(cols)
    return out.astype({"cluster_size": np.int64, "max_text_len": np.int64,
                       "total_text_len": np.int64})


def synthesize_clusters(
    pages: rd.Dataset,
    clusters: rd.Dataset,
    cfg: DedupConfig | None = None,
    num_parts: int | None = None,
) -> rd.Dataset:
    """pages(url, text) ⋈ clusters(url, cluster_id, ...) -> one
    synthesized consensus record per cluster.

    One string-keyed join to re-attach the member texts (text never
    rode the dedup pipeline), then one exchange keyed on cluster_id.
    """
    import ray

    from gencore_ray.stages.shuffle import grouped_map, hash_join

    cfg = cfg or DedupConfig()
    if num_parts is None:
        num_parts = int(ray.cluster_resources().get("CPU", 8))

    import pyarrow as pa

    def slim_pages(t: pa.Table) -> pa.Table:
        return pa.table({"purl": t["url"], "text": t["text"]})

    members = hash_join(
        clusters.select_columns(
            ["url", "cluster_id", "cluster_size", "is_representative",
             "quality", "text_len"]
        ),
        pages.map_batches(slim_pages, batch_format="pyarrow", zero_copy_batch=True),
        "url", "purl", num_parts=num_parts,
    )
    return grouped_map(
        members, "cluster_id", lambda df: _synth_partition(df, cfg),
        num_parts=num_parts,
    )
