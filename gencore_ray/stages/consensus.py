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


def _vote_clusters(
    cluster_codes: np.ndarray, texts: list[str], weights: np.ndarray,
    n_clusters: int,
) -> tuple[list[str], np.ndarray]:
    """Quality-weighted per-position token vote over ALL multi-member
    clusters of a partition in one factorized pass.

    Semantics (identical to the scalar per-position vote, and to
    gencore's pileup vote /root/reference/src/group.cpp:320-526): at
    each position the candidate token with the highest summed member
    quality wins; ties break to the lexicographically smallest token;
    ``agreement`` is the fraction of positions where every covering
    member agreed.

    No per-position Python loop: one (cluster, position, token-code)
    lexsort + segment-sum (``np.add.reduceat``) computes every
    candidate weight, a second lexsort picks each position's winner,
    and the only remaining Python is one ``" ".join`` per cluster.

    Returns (consensus_text per cluster code, agreement per code).
    """
    toks = [t.split() if t else [] for t in texts]
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return [""] * n_clusters, np.ones(n_clusters)
    # flat (member -> token stream) coordinates, all vectorised
    member = np.repeat(np.arange(len(toks)), lens)
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    pos = np.arange(total, dtype=np.int64) - offs
    c = cluster_codes[member]
    wt = np.asarray(weights, dtype=np.float64)[member]

    from itertools import chain

    flat = pd.Index(list(chain.from_iterable(toks)))
    codes, uniq = pd.factorize(flat, sort=True)   # sort=True: code == lex rank
    lex_sorted = np.asarray(uniq, dtype=object)

    # --- candidate weights: segment-sum over sorted (c, pos, token)
    o1 = np.lexsort((codes, pos, c))
    c1, p1, k1, w1 = c[o1], pos[o1], codes[o1], wt[o1]
    seg = np.r_[True, (c1[1:] != c1[:-1]) | (p1[1:] != p1[:-1]) | (k1[1:] != k1[:-1])]
    starts = np.flatnonzero(seg)
    wsum = np.add.reduceat(w1, starts)
    c_s, p_s, k_s = c1[starts], p1[starts], k1[starts]

    # --- (c, pos) groups over the candidate segments
    cp_new = np.r_[True, (c_s[1:] != c_s[:-1]) | (p_s[1:] != p_s[:-1])]
    cp_gid = np.cumsum(cp_new) - 1
    n_cp = int(cp_gid[-1]) + 1
    n_cand = np.bincount(cp_gid, minlength=n_cp)

    # --- winner per (c, pos): max weight, ties -> smallest lex rank
    o2 = np.lexsort((k_s, -wsum, cp_gid))
    win = o2[np.r_[True, cp_gid[o2][1:] != cp_gid[o2][:-1]]]
    win_tok = lex_sorted[k_s[win]]          # already in (c, pos) order
    c_cp = c_s[win]                          # cluster of each position

    # --- assemble per-cluster strings + agreement
    npos = np.bincount(c_cp, minlength=n_clusters)
    agree = np.bincount(c_cp[n_cand == 1], minlength=n_clusters)
    bounds = np.r_[0, np.cumsum(npos)]
    texts_out = [
        " ".join(win_tok[bounds[i]:bounds[i + 1]]) for i in range(n_clusters)
    ]
    agreement = np.where(npos > 0, agree / np.maximum(npos, 1), 1.0)
    return texts_out, agreement


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

    # --- multi-member clusters: ONE factorized vote over all of them
    multi = df[size.to_numpy() > 1]
    if len(multi):
        ccodes, cids = pd.factorize(multi["cluster_id"], sort=False)
        ncl = len(cids)
        w = np.maximum(multi["quality"].to_numpy(dtype=np.float64), 1e-9)
        texts, agreement = _vote_clusters(
            ccodes, multi["text"].fillna("").tolist(), w, ncl
        )
        # metadata aggregates, vectorised per cluster code
        rep_mask = multi["is_representative"].to_numpy(dtype=bool)
        urls = multi["url"].to_numpy()
        # first url per cluster (df is (cluster_id, url)-sorted), then
        # overwrite with the elected representative where one exists
        first_idx = np.flatnonzero(np.r_[True, ccodes[1:] != ccodes[:-1]])
        rep_url = urls[first_idx].copy()
        ridx = np.flatnonzero(rep_mask)
        # reversed so the FIRST representative per cluster wins
        rep_url[ccodes[ridx[::-1]]] = urls[ridx[::-1]]
        tl = multi["text_len"].to_numpy(dtype=np.int64)
        max_q = np.zeros(ncl)
        np.maximum.at(max_q, ccodes, w)
        max_tl = np.zeros(ncl, dtype=np.int64)
        np.maximum.at(max_tl, ccodes, tl)
        parts.append(pd.DataFrame({
            "cluster_id": np.asarray(cids, dtype=object),
            "cluster_size": np.bincount(ccodes, minlength=ncl).astype(np.int64),
            "rep_url": rep_url,
            "content_src": np.full(ncl, "consensus_vote", dtype=object),
            "consensus_text": np.asarray(texts, dtype=object),
            "vote_agreement": np.round(agreement, 6),
            "max_quality": max_q,
            "max_text_len": max_tl,
            "total_text_len": np.bincount(ccodes, weights=tl, minlength=ncl).astype(np.int64),
        }))
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
