"""Similarity search over an embedding column (list<float>).

Patterns:
  * ``brute_force_topk`` — exact cosine top-k: the query matrix is
    broadcast once (``ray.put``), every batch does one float64 matmul,
    global top-k via per-batch pruning + a small driver merge.  The
    correctness baseline.
  * ``ivf_topk`` — IVF-style scale path: seeded k-means centroids
    trained on a sample, every row assigned to its nearest centroid
    (one broadcast matmul per batch), queries probe only the
    ``nprobe`` nearest centroid partitions.  Approximate; recall
    governed by nprobe.
  * ``near_dup_pairs`` — embedding-cosine near-duplicate edges:
    batch-vs-broadcast matmul emits pairs with cosine >= threshold
    (the embedding analogue of the Jaccard verify stage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> / tensor-extension column."""
    arr = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
    n = len(arr)
    if hasattr(arr, "flatten"):  # ListArray / FixedSizeListArray
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    # Ray ArrowTensorArray (from_pandas of ndarray cells) -> (n, d) directly
    mat = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64)
    return mat.reshape(n, -1) if n else mat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> rd.Dataset:
    """Exact cosine top-k for ONE query vector; returns (id, cos_sim).

    Deterministic tie-break: (cos_sim desc, id asc).
    """
    q = _normalize(query.reshape(1, -1).astype(np.float64))[0]
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_batch_matrix(t, vec_col))
        cos = m @ qv
        if round_to is not None:
            cos = np.round(cos, round_to)
        # per-batch prune to k candidates — only k rows per batch reach the sort
        order = np.lexsort((t[id_col].to_numpy(zero_copy_only=False), -cos))[:k]
        return pa.table(
            {id_col: t[id_col].take(pa.array(order)), "cos_sim": pa.array(cos[order])}
        )

    pruned = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


def _kmeans(sample: np.ndarray, n_clusters: int, seed: int, iters: int = 10) -> np.ndarray:
    """Tiny deterministic k-means on normalized vectors (spherical)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 2048,
) -> rd.Dataset:
    """IVF-bucketed approximate top-k: train centroids on a seeded
    sample, probe the nprobe nearest centroid cells only."""
    sample_t = ds.limit(sample_size).to_pandas()
    sample = _normalize(
        np.stack(sample_t[vec_col].to_numpy()).astype(np.float64)
    )
    cent = _kmeans(sample, n_clusters, seed)
    q = _normalize(query.reshape(1, -1).astype(np.float64))[0]
    probe = set(np.argsort(-(cent @ q))[:nprobe].tolist())
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qv = ray.get(q_ref)
        m = _normalize(_batch_matrix(t, vec_col))
        assign = np.argmax(m @ c.T, axis=1)
        mask = np.isin(assign, list(probe))
        idx = np.nonzero(mask)[0]
        cos = np.round(m[idx] @ qv, 6)
        order = np.lexsort((t[id_col].to_numpy(zero_copy_only=False)[idx], -cos))[:k]
        return pa.table(
            {id_col: t[id_col].take(pa.array(idx[order])), "cos_sim": pa.array(cos[order])}
        )

    pruned = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


def near_dup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> rd.Dataset:
    """All pairs (id_a < id_b) with cosine >= threshold.

    The full normalized matrix is broadcast once via ``ray.put``; each
    batch does one (b x n) matmul against it.  O(n^2) compute spread
    over the cluster; for corpora where n^2 is prohibitive use the
    LSH pipeline on quantized embeddings instead.
    """
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    mat_all = _normalize(np.stack(full[vec_col].to_numpy()).astype(np.float64))
    ids_ref = ray.put(ids_all)
    mat_ref = ray.put(mat_all)

    def pairs(t: pa.Table) -> pa.Table:
        ids_a = t[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(t, vec_col))
        all_ids = ray.get(ids_ref)
        all_m = ray.get(mat_ref)
        cos = m @ all_m.T
        bi, gj = np.nonzero(cos >= threshold)   # threshold on RAW cosine
        a, b = ids_a[bi], all_ids[gj]
        keep = a < b          # dedupe + drop self-pairs
        vals = cos[bi[keep], gj[keep]]
        if round_to is not None:
            vals = np.round(vals, round_to)
        return pa.table(
            {"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep]),
             "cos_sim": pa.array(vals)}
        )

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
