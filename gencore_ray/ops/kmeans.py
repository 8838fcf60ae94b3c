"""Distributed spherical k-means + SemDeDup-style semantic dedup.

SemDeDup (Abbas et al. 2023) makes embedding near-dup detection scale
past the O(n^2) wall: cluster the corpus embeddings with k-means, then
run the exact pairwise cosine check only WITHIN each cluster —
near-identical vectors land in the same cluster, so the quadratic work
shrinks by ~k x while recall on true near-dups stays ~1.

Everything here is Ray-Data-first and deterministic:

  * **init** — the k seed vectors are the rows with the k smallest
    ``splitmix64(vec_id)`` values (the repo's standard deterministic
    sample: stable under any partitioning / block order, no RNG).
  * **Lloyd iteration** — centroids are broadcast via ``ray.put``;
    one ``map_batches`` pass computes per-batch partial sums
    (k x d matrix + k counts, one matmul per batch); the driver merges
    the tiny partials and renormalises.  Per-iteration cost is one
    corpus scan, driver state is O(k*d).  Empty clusters keep their
    previous centroid.
  * **assign** — one scoring map adds (cluster_id, centroid_sim).
  * **within-cluster dedup** — one cluster-keyed exchange, then the
    exact pairwise check per cluster partition (vectorised matmul).
    Hot-cluster guard: clusters above ``max_cluster_size`` are
    subsampled deterministically (smallest id-hashes kept) — the same
    bounded-bucket discipline as stages/lsh.py.

The gencore analogue is the position-cluster -> within-cluster UMI
check (/root/reference/src/gencore.cpp:295-313 clusters first,
/root/reference/src/cluster.cpp:55-100 compares only within a
cluster); k-means plays the role of the position key for dense
vectors.  Iterative fitting is not expressible in one SQL query, so
these ops are pytest-verified (numpy Lloyd parity, planted-dup
recall) rather than DuckDB-oracled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from gencore_ray.functions.hashing import U64, splitmix64


def _batch_mat(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    if not len(df):
        return np.empty((0, 0))
    m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit k spherical centroids; returns a (k, d) unit-row matrix.

    Deterministic: hash-min seeding + fixed iteration count — reruns on
    the same partitioning are bit-identical; a different block layout
    reorders float partial-sum addition (differences ~1e-15, which can
    only flip an assignment for a vector exactly equidistant between
    centroids).
    """
    slim = ds.select_columns([id_col, vec_col]).materialize()

    # --- deterministic seeds: k smallest splitmix64(id) rows ---------
    def _seed_cand(df: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(df[id_col].to_numpy().astype(np.int64).view(U64))
        o = np.argsort(h, kind="stable")[:k]
        return df.iloc[o].assign(_h=h[o])

    cand = slim.map_batches(_seed_cand, batch_format="pandas").to_pandas()
    seeds = cand.sort_values(["_h", id_col], kind="mergesort").head(k)
    if not len(seeds):
        raise ValueError("kmeans_fit needs a non-empty dataset")
    cent = _batch_mat(seeds, vec_col)
    if len(cent) < k:
        k = len(cent)

    for _ in range(iters):
        ref = ray.put(cent)

        def _partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            if not len(df):
                return pd.DataFrame({"j": np.arange(len(c)),
                                     "cnt": np.zeros(len(c)),
                                     "vsum": [r.tolist()
                                              for r in np.zeros_like(c)]})
            m = _batch_mat(df, vec_col)
            a = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=len(c)).astype(np.float64)
            return pd.DataFrame({
                "j": np.arange(len(c)),
                "cnt": cnt,
                "vsum": [v.tolist() for v in sums],
            })

        parts = slim.map_batches(_partial, batch_format="pandas").to_pandas()
        sums = np.zeros_like(cent)
        cnt = np.zeros(len(cent))
        # partition-index order is irrelevant to the result (addition of
        # per-batch partials grouped by j), but sort for determinism
        for j, grp in parts.groupby("j", sort=True):
            sums[j] = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            cnt[j] = grp["cnt"].sum()
        nz = cnt > 0
        cent = np.where(nz[:, None], sums, cent)
        norms = np.linalg.norm(cent, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = cent / norms
    return cent


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> rd.Dataset:
    """(id, cluster_id, centroid_sim) — one broadcast + one scoring map."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    p = 10.0 ** round_to

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "cluster_id": pd.Series(dtype=np.int64),
                                 "centroid_sim": pd.Series(dtype=np.float64)})
        m = _batch_mat(df, vec_col)
        sims = m @ c.T
        a = np.argmax(sims, axis=1)
        best = sims[np.arange(len(m)), a]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster_id": a.astype(np.int64),
            "centroid_sim": np.floor(best * p + 0.5) / p,
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        _assign, batch_format="pandas")


def semantic_dedup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.95,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_parts: int = 16,
    max_cluster_size: int = 20_000,
    round_to: int = 6,
    target_cluster_size: int = 4_096,
    counters: dict | None = None,
    probes: int = 1,
) -> rd.Dataset:
    """SemDeDup: (id_a, id_b, cos_sim) with cosine >= threshold, exact
    pairwise check restricted to k-means cluster mates.

    Recall caveat (documented, tested): a near-dup pair straddling a
    cluster boundary is missed; for cos >= 0.95 pairs and reasonable k
    the straddle rate is ~0 (near-identical vectors share an argmax).
    The O(n^2/k) per-cluster check runs inside one cluster-keyed
    exchange partition; clusters beyond ``max_cluster_size`` are
    deterministically subsampled (smallest id-hash rows kept).

    ``k=None`` (default) scales the cluster count with the corpus —
    k = ceil(n / target_cluster_size), floor 8 — so at any real corpus
    size the mean cluster sits far below ``max_cluster_size`` and the
    subsample cap is the exception, not the norm (a fixed k=8 would
    GUARANTEE oversize clusters past 160k vectors).

    Pass ``counters={}`` to get the cap accounting filled in driver-
    side (one extra slim count pass over the assignments — the same
    counted-skip discipline as stages/lsh.py's ``capped_docs``):
    ``n_docs, k_used, subsampled_clusters, dropped_members``.  Dropped
    members are docs excluded from the pairwise check of their own
    oversize cluster — pairs among them are missed, and that loss is
    now VISIBLE instead of silent.  (With ``probes>1`` the counts are
    per ASSIGNMENT row, i.e. n_docs ~= probes x corpus.)

    ``probes>1`` assigns each vector to its top-p clusters (multi-probe
    SemDeDup): a pair whose two vectors straddle a cluster boundary is
    still checked when their probe sets intersect — the standard
    recall insurance for threshold-grazing pairs, at p x explode cost
    plus one slim pair-dedupe exchange.
    """
    from gencore_ray.stages.shuffle import grouped_map

    # ONE pass over the (possibly expensive) upstream lineage: the slim
    # (id, vec) projection is materialized here and every consumer —
    # the auto-k count, kmeans_fit's Lloyd passes, the probe tagging —
    # reads the in-store blocks.  Without this, an unmaterialized input
    # (e.g. the --from-text embedding actor pool) re-embeds the corpus
    # once per consumer.
    ds = ds.select_columns([id_col, vec_col]).materialize()
    if k is None:
        n_total = ds.count()    # block metadata on a materialized dataset
        k = max(8, -(-int(n_total) // int(target_cluster_size)))
    cent = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cent)
    p = 10.0 ** round_to

    p_probe = max(1, min(int(probes), len(cent)))

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "cluster_id": pd.Series(dtype=np.int64),
                                 "vec": pd.Series(dtype=object)})
        m = _batch_mat(df, vec_col)
        sims = m @ c.T
        if p_probe == 1:
            a = np.argmax(sims, axis=1)[:, None]
        else:
            a = np.argpartition(-sims, p_probe - 1, axis=1)[:, :p_probe]
        ids = np.repeat(df[id_col].to_numpy(), p_probe)
        return pd.DataFrame({
            id_col: ids,
            "cluster_id": a.reshape(-1).astype(np.int64),
            "vec": np.repeat(m, p_probe, axis=0).tolist(),
        })

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        _tag, batch_format="pandas")

    if counters is not None:
        # one slim counting pass: per-batch O(k) partials, driver merge
        tagged = tagged.materialize()

        def _sizes(df: pd.DataFrame) -> pd.DataFrame:
            cnt = np.bincount(df["cluster_id"].to_numpy(), minlength=1)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame({"cluster_id": nz, "n": cnt[nz]})

        sizes = (tagged.select_columns(["cluster_id"])
                 .map_batches(_sizes, batch_format="pandas").to_pandas()
                 .groupby("cluster_id")["n"].sum())
        over = sizes[sizes > max_cluster_size]
        counters.update({
            "n_docs": int(sizes.sum()),
            "k_used": int(k),
            "subsampled_clusters": int(len(over)),
            "dropped_members": int((over - max_cluster_size).sum()),
        })

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for _, grp in df.groupby("cluster_id", sort=False):
            if len(grp) < 2:
                continue
            if len(grp) > max_cluster_size:
                h = splitmix64(
                    grp[id_col].to_numpy().astype(np.int64).view(U64))
                grp = grp.iloc[np.argsort(h, kind="stable")[:max_cluster_size]]
            ids = grp[id_col].to_numpy()
            m = np.stack(grp["vec"].to_numpy())
            # row-strip blocking: peak memory O(strip x n), not O(n^2)
            # (a max-size cluster would otherwise build a multi-GB
            # sims matrix inside one reduce task)
            strip = max(1, min(len(m), 8_388_608 // max(len(m), 1) + 1))
            for i0 in range(0, len(m), strip):
                i1 = min(i0 + strip, len(m))
                sims = m[i0:i1] @ m.T                    # (strip, n)
                ii, jj = np.nonzero(
                    sims >= threshold - 0.5 / p)         # pre-round gate
                upper = jj > ii + i0                     # j > i only
                ii, jj = ii[upper], jj[upper]
                vals = np.floor(sims[ii, jj] * p + 0.5) / p
                keep = vals >= threshold
                a, b = ids[ii[keep] + i0], ids[jj[keep]]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(vals[keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "cos_sim": pd.Series(dtype=np.float64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cos_sim": np.concatenate(out_s)})

    pairs = grouped_map(tagged, "cluster_id", _pairs, num_parts=num_parts)
    if p_probe == 1:
        return pairs

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        # a pair sharing two probed clusters is emitted by both
        # partitions; one slim exchange on id_a collapses them
        return df.drop_duplicates(subset=["id_a", "id_b"])

    return grouped_map(pairs, "id_a", _dedupe, num_parts=num_parts)
