"""Connected components over the verified-edge table (SURVEY §2.4 G3).

gencore's greedy UMI-absorb loop (/root/reference/src/cluster.cpp:55-100)
assigns every read to the component of its nearest dominant UMI; our
equivalent is classic connected components over verified dup edges,
with the deterministic label = lexicographic min url of the component
(matches the reference's "most frequent UMI wins, ties broken by map
order" determinism).

Two implementations, equal by construction (tested against each other):

* ``driver_cc``      — vectorised min-label CC (numpy hooking +
  pointer-jumping) on collected edges.  Edges are the verified dup
  pairs, orders of magnitude smaller than the corpus, so this is the
  default up to ``cc_driver_max_edges`` (the pipeline auto-switches
  to the distributed path above it).
* ``distributed_cc`` — alternating large-star / small-star over the
  edges Dataset (Kiveris et al., "Connected Components in MapReduce
  and Beyond", SoCC'14): each round is one partition-wise exchange
  keyed by node; converges in O(log n) rounds.  The scale path for
  10^12-doc corpora where even the edge set exceeds driver memory.
  Star steps are vectorised per partition (hash-primary sort + run
  boundaries), never per-group Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from pandas.util import hash_pandas_object


def _min_label_cc(u: np.ndarray, v: np.ndarray, n: int,
                  max_iters: int = 64) -> np.ndarray:
    """Vectorised CC over int edge arrays: parent[i] = min node index of
    i's component.  Hooking (np.minimum.at) + pointer-jumping; no
    per-edge Python loop.  Converges in O(log n) rounds."""
    parent = np.arange(n, dtype=np.int64)
    for _ in range(max_iters):
        pu, pv = parent[u], parent[v]
        if len(pu) == 0 or (pu == pv).all():
            return parent
        mn = np.minimum(pu, pv)
        mx = np.maximum(pu, pv)
        np.minimum.at(parent, mx, mn)
        while True:                       # full path compression
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    raise RuntimeError("min-label CC failed to converge")  # pragma: no cover


def driver_cc(edges: rd.Dataset) -> dict[str, str]:
    """Collect (url_a,url_b) edges, vectorised CC -> url->label (min url).

    Distinct urls come from ``pd.factorize`` (C hash table — np.unique
    on object strings is a Python-level sort over EVERY endpoint, the
    measured 2.6 s driver floor at 1M pages), then only the DISTINCT
    urls are argsorted so codes can be re-ranked lexicographically; the
    numeric component minimum over ranks IS the lexicographic min url —
    no per-row Python loop anywhere.  Matches ``union_find_clusters``
    (the test oracle) exactly.
    """
    ua: list[np.ndarray] = []
    ub: list[np.ndarray] = []
    for t in edges.select_columns(["url_a", "url_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ua.append(t["url_a"].to_pandas().to_numpy())
        ub.append(t["url_b"].to_pandas().to_numpy())
    if not ua:
        return {}
    a = np.concatenate(ua)
    b = np.concatenate(ub)
    codes, uniq_idx = pd.factorize(np.concatenate([a, b]), sort=False)
    uniq = np.asarray(uniq_idx, dtype=object)
    order = np.argsort(uniq, kind="stable")     # lex sort, distinct only
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq), dtype=np.int64)
    rcodes = rank[codes]
    cu = rcodes[: len(a)]
    cv = rcodes[len(a):]
    parent = _min_label_cc(cu, cv, len(uniq))
    sorted_uniq = uniq[order]
    return dict(zip(sorted_uniq.tolist(), sorted_uniq[parent].tolist()))


# ---------------------------------------------------------------------------
# distributed large-star / small-star (vectorised)
# ---------------------------------------------------------------------------


def _runs(keys_hash: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Group ids for pre-sorted rows; hash boundary with collision guard."""
    new = np.r_[True, (keys_hash[1:] != keys_hash[:-1]) | (keys[1:] != keys[:-1])]
    return np.cumsum(new) - 1


def _star_partition(df: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One star step over all complete node-groups of a partition.

    Input rows (k, n): ``k`` the grouping endpoint, ``n`` a neighbor.
    large-star: attach neighbors > k to m = min(neighborhood ∪ {k});
    small-star: attach neighbors (all <= k by construction) and k to m.
    """
    if not len(df):
        return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)})
    kh = hash_pandas_object(df["k"], index=False).to_numpy()
    order = np.argsort(kh, kind="stable")
    df = df.iloc[order]
    kh = kh[order]
    k = df["k"].to_numpy()
    n = df["n"].to_numpy()
    g = _runs(kh, k)
    # per-run min over neighbors, then vs k itself (string mins)
    m_n = pd.Series(n).groupby(g, sort=False).min().to_numpy()
    k_first = k[np.r_[True, g[1:] != g[:-1]]]
    m = np.minimum(m_n, k_first)
    m_row = m[g]
    if large:
        keep = n > k
        return pd.DataFrame({"u": m_row[keep], "v": n[keep]})
    # small-star: attach all neighbors != m, plus k itself where k != m
    keep = n != m_row
    out_u = [m_row[keep]]
    out_v = [n[keep]]
    k_keep = k_first != m
    out_u.append(m[k_keep])
    out_v.append(k_first[k_keep])
    return pd.DataFrame(
        {"u": np.concatenate(out_u), "v": np.concatenate(out_v)}
    ).drop_duplicates()


def _canon(t: pa.Table) -> pa.Table:
    """Canonicalise an edge table: u < v, no self-loops, columns (u, v)."""
    u = t["u"].to_pandas().to_numpy()
    v = t["v"].to_pandas().to_numpy()
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    keep = lo != hi
    return pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})


def _expand_both(t: pa.Table) -> pa.Table:
    """(u,v) -> rows (k=u,n=v) and (k=v,n=u) for large-star grouping."""
    u = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) else t["u"]
    v = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) else t["v"]
    return pa.table(
        {
            "k": pa.concat_arrays([u, v]),
            "n": pa.concat_arrays([v, u]),
        }
    )


def _expand_small(t: pa.Table) -> pa.Table:
    """(u,v) with u<v -> rows keyed by the larger endpoint."""
    return pa.table({"k": t["v"], "n": t["u"]})


def _edge_fingerprint(edges: rd.Dataset) -> tuple[int, int]:
    """(count, hash-sum) — convergence detector, fully vectorised."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            hash_pandas_object(df["u"], index=False).to_numpy()
            ^ hash_pandas_object(df["v"], index=False).to_numpy()
        )
        with np.errstate(over="ignore"):
            s = np.uint64(h.sum(dtype=np.uint64))
        return pd.DataFrame({"n": [len(df)], "h": [np.uint64(s)]})

    agg = edges.map_batches(per_batch, batch_format="pandas").to_pandas()
    with np.errstate(over="ignore"):
        return int(agg["n"].sum()), int(
            np.uint64(agg["h"].to_numpy().astype(np.uint64).sum(dtype=np.uint64))
        )


def distributed_cc(
    edges: rd.Dataset, max_rounds: int = 50, num_parts: int | None = None
) -> rd.Dataset:
    """Edges (url_a,url_b) -> labels Dataset (url, label).

    Alternates large-star/small-star until the canonical edge multiset
    is stable; the fixpoint is a star forest rooted at each component's
    min url, which IS the (url, label) mapping for non-root members;
    roots label themselves.
    """
    from gencore_ray.stages.shuffle import grouped_map

    if num_parts is None:
        import ray as _ray

        num_parts = int(_ray.cluster_resources().get("CPU", 8))

    cur = edges.map_batches(
        lambda t: pa.table({"u": t["url_a"], "v": t["url_b"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(_canon, batch_format="pyarrow").materialize()

    prev_fp = None
    for _ in range(max_rounds):
        ls = grouped_map(
            cur.map_batches(_expand_both, batch_format="pyarrow"),
            "k", lambda df: _star_partition(df, large=True), num_parts=num_parts,
        )
        union = (
            ls.map_batches(lambda t: t, batch_format="pyarrow")
            .union(cur)
            .map_batches(_canon, batch_format="pyarrow")
        )
        ss = grouped_map(
            union.map_batches(_expand_small, batch_format="pyarrow"),
            "k", lambda df: _star_partition(df, large=False), num_parts=num_parts,
        )
        cur = (
            grouped_map(
                ss.map_batches(_canon, batch_format="pyarrow"),
                "u", lambda df: df.drop_duplicates(), num_parts=num_parts,
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp

    # fixpoint edges are (root=u, member=v)
    return cur.map_batches(
        lambda t: pa.table({"url": t["v"], "label": t["u"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
