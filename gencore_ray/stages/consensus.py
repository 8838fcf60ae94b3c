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
    ref_streams: tuple | None = None,
) -> tuple[list[str], np.ndarray, np.ndarray]:
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

    With ``ref_streams`` (the trusted-source analogue of gencore's
    reference-genome consultation, /root/reference/src/group.cpp:430-501):
    at every position where NO token holds a strict COUNT majority of
    the covering members (the integer-exact "ambiguous pileup" rule —
    count arithmetic replays exactly in SQL, float weight sums do not)
    and the cluster's trusted stream covers the position, the trusted
    token is imposed and counted.  ``ref_streams`` is
    ``(flat_tokens, offsets, lengths)`` indexed by cluster code.

    Returns (consensus_text per cluster code, agreement per code,
    ref_overrides per code).
    """
    toks = [t.split() if t else [] for t in texts]
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return ([""] * n_clusters, np.ones(n_clusters),
                np.zeros(n_clusters, dtype=np.int64))
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

    # --- trusted-source consultation (integer-exact ambiguity rule)
    overrides = np.zeros(n_clusters, dtype=np.int64)
    if ref_streams is not None:
        ref_flat, ref_off, ref_len = ref_streams
        # per-(c,pos,token) member counts are the candidate-segment
        # lengths; strict count majority = one token with 2*cnt > ncov
        cnt_s = np.diff(np.r_[starts, len(w1)])
        cp_starts = np.flatnonzero(cp_new)
        maxc = np.maximum.reduceat(cnt_s, cp_starts)
        ncov = np.add.reduceat(cnt_s, cp_starts)
        p_cp = p_s[win]
        apply = (2 * maxc <= ncov) & (p_cp < ref_len[c_cp])
        if apply.any():
            rows = np.flatnonzero(apply)
            win_tok = win_tok.copy()
            win_tok[rows] = ref_flat[ref_off[c_cp[rows]] + p_cp[rows]]
            overrides = np.bincount(c_cp[rows], minlength=n_clusters
                                    ).astype(np.int64)

    # --- assemble per-cluster strings + agreement
    npos = np.bincount(c_cp, minlength=n_clusters)
    agree = np.bincount(c_cp[n_cand == 1], minlength=n_clusters)
    bounds = np.r_[0, np.cumsum(npos)]
    texts_out = [
        " ".join(win_tok[bounds[i]:bounds[i + 1]]) for i in range(n_clusters)
    ]
    agreement = np.where(npos > 0, agree / np.maximum(npos, 1), 1.0)
    return texts_out, agreement, overrides


def _synth_partition(df: pd.DataFrame, cfg: DedupConfig,
                     ref_map: dict | None = None) -> pd.DataFrame:
    cols = {
        "cluster_id": pd.Series(dtype=object),
        "cluster_size": pd.Series(dtype=np.int64),
        "rep_url": pd.Series(dtype=object),
        "content_src": pd.Series(dtype=object),
        "consensus_text": pd.Series(dtype=object),
        "vote_agreement": pd.Series(dtype=np.float64),
        "ref_overrides": pd.Series(dtype=np.int64),
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
            "ref_overrides": np.zeros(len(single), dtype=np.int64),
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

        # trusted stream per cluster: the MIN member url present in the
        # trusted table (deterministic; df is (cluster_id, url)-sorted
        # so the first hit per cluster is the min)
        ref_streams = None
        if ref_map:
            urls_m = multi["url"].to_numpy()
            hit = pd.Series(urls_m).isin(ref_map.keys()).to_numpy()
            ref_url = np.full(ncl, None, dtype=object)
            for i in np.flatnonzero(hit)[::-1]:   # first per cluster wins
                ref_url[ccodes[i]] = urls_m[i]
            streams = [
                (ref_map[u] or "").split() if u is not None else []
                for u in ref_url
            ]
            ref_len = np.array([len(s) for s in streams], dtype=np.int64)
            ref_off = np.r_[0, np.cumsum(ref_len)][:-1]
            flat: list = []
            for s in streams:
                flat.extend(s)
            ref_streams = (np.asarray(flat, dtype=object), ref_off, ref_len)

        texts, agreement, overrides = _vote_clusters(
            ccodes, multi["text"].fillna("").tolist(), w, ncl,
            ref_streams=ref_streams,
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
        # rationale tag: gencore's FR/RR analogue, extended with the
        # ref-consulted marker when the trusted source imposed a token
        src_tag = np.where(overrides > 0, "consensus_vote+ref",
                           "consensus_vote").astype(object)
        parts.append(pd.DataFrame({
            "cluster_id": np.asarray(cids, dtype=object),
            "cluster_size": np.bincount(ccodes, minlength=ncl).astype(np.int64),
            "rep_url": rep_url,
            "content_src": src_tag,
            "consensus_text": np.asarray(texts, dtype=object),
            "vote_agreement": np.round(agreement, 6),
            "ref_overrides": overrides,
            "max_quality": max_q,
            "max_text_len": max_tl,
            "total_text_len": np.bincount(ccodes, weights=tl, minlength=ncl).astype(np.int64),
        }))
    out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(cols)
    return out.astype({"cluster_size": np.int64, "max_text_len": np.int64,
                       "total_text_len": np.int64,
                       "ref_overrides": np.int64})


def synthesize_clusters(
    pages: rd.Dataset,
    clusters: rd.Dataset,
    cfg: DedupConfig | None = None,
    num_parts: int | None = None,
    trusted: rd.Dataset | None = None,
) -> rd.Dataset:
    """pages(url, text) ⋈ clusters(url, cluster_id, ...) -> one
    synthesized consensus record per cluster.

    One string-keyed join to re-attach the member texts (text never
    rode the dedup pipeline), then one exchange keyed on cluster_id.

    ``trusted`` is an optional (url, text) Dataset of
    externally-validated content — the analogue of gencore's resident
    reference genome (/root/reference/src/reference.cpp:4-11, consulted
    by the vote at src/group.cpp:430-501).  It is broadcast ONCE via
    ``ray.put`` (curated sets are small by definition; the ST1
    broadcast-side-table pattern): at ambiguous vote positions (no
    strict count majority) covered by the cluster's trusted stream, the
    trusted token is imposed; ``ref_overrides`` counts impositions per
    cluster and ``content_src`` gains the ``+ref`` rationale tag.
    """
    import ray

    from gencore_ray.stages.shuffle import grouped_map, hash_join

    cfg = cfg or DedupConfig()
    if num_parts is None:
        num_parts = int(ray.cluster_resources().get("CPU", 8))
    ref_ref = None
    if trusted is not None:
        tdf = trusted.to_pandas()
        ref_ref = ray.put(dict(zip(tdf["url"], tdf["text"])))

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
    def _synth(df: pd.DataFrame) -> pd.DataFrame:
        rm = ray.get(ref_ref) if ref_ref is not None else None
        return _synth_partition(df, cfg, ref_map=rm)

    return grouped_map(members, "cluster_id", _synth, num_parts=num_parts)
