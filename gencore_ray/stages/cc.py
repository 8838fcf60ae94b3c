"""Connected components over the verified-edge table (SURVEY §2.4 G3).

gencore's greedy UMI-absorb loop (/root/reference/src/cluster.cpp:55-100)
assigns every read to the component of its nearest dominant UMI; our
equivalent is classic connected components over verified dup edges,
with the deterministic label = lexicographic min url of the component
(matches the reference's "most frequent UMI wins, ties broken by map
order" determinism).

Two implementations, equal by construction (tested against each other):

* ``driver_cc``      — union-find on collected edges.  Edges are the
  verified dup pairs, orders of magnitude smaller than the corpus, so
  this is the default up to ~10M edges.
* ``distributed_cc`` — alternating large-star / small-star over the
  edges Dataset (Kiveris et al., "Connected Components in MapReduce
  and Beyond", SoCC'14): each round is one groupby shuffle keyed by
  node; converges in O(log n) rounds.  The scale path for 10^12-doc
  corpora where even the edge set exceeds driver memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.oracle import union_find_clusters


def driver_cc(edges: rd.Dataset) -> dict[str, str]:
    """Stream (url_a,url_b) edges to the driver, union-find -> url->label."""
    ids: set[str] = set()
    pair_list: list[tuple[str, str, float]] = []
    for t in edges.select_columns(["url_a", "url_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for x, y in zip(t["url_a"].to_pylist(), t["url_b"].to_pylist()):
            ids.add(x)
            ids.add(y)
            pair_list.append((x, y, 1.0))
    return union_find_clusters(sorted(ids), pair_list)


# ---------------------------------------------------------------------------
# distributed large-star / small-star
# ---------------------------------------------------------------------------


def _canon(t: pa.Table) -> pa.Table:
    """Canonicalise an edge table: u < v, no self-loops, columns (u, v)."""
    u = t["u"].to_pandas()
    v = t["v"].to_pandas()
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    keep = lo != hi
    return pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})


def _large_star(df: pd.DataFrame) -> pd.DataFrame:
    """Group = all edges touching node ``k``; attach strict-greater
    neighbors to the minimum of the neighborhood (incl. k)."""
    k = df["k"].iloc[0]
    nbrs = df["n"].to_numpy()
    m = min(k, nbrs.min())
    big = nbrs[nbrs > k]
    if len(big) == 0:
        return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)})
    return pd.DataFrame({"u": np.full(len(big), m), "v": big})


def _small_star(df: pd.DataFrame) -> pd.DataFrame:
    """Group = edges (v<=k) for node k; attach all small neighbors + k
    to the minimum."""
    k = df["k"].iloc[0]
    nbrs = df["n"].to_numpy()
    m = min(k, nbrs.min())
    targets = np.unique(np.append(nbrs[nbrs != m], k))
    targets = targets[targets != m]
    if len(targets) == 0:
        return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)})
    return pd.DataFrame({"u": np.full(len(targets), m), "v": targets})


def _expand_both(t: pa.Table) -> pa.Table:
    """(u,v) -> rows (k=u,n=v) and (k=v,n=u) for large-star grouping."""
    u, v = t["u"], t["v"]
    return pa.table(
        {
            "k": pa.chunked_array([u, v]).combine_chunks(),
            "n": pa.chunked_array([v, u]).combine_chunks(),
        }
    )


def _expand_small(t: pa.Table) -> pa.Table:
    """(u,v) with u<v -> rows keyed by the larger endpoint."""
    return pa.table({"k": t["v"], "n": t["u"]})


def _edge_checksum(edges: rd.Dataset) -> tuple[int, int]:
    """(count, hash-sum) fingerprint used for convergence detection."""
    import hashlib

    def per_batch(t: pa.Table) -> pa.Table:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for a, b in zip(t["u"].to_pylist(), t["v"].to_pylist()):
                d = hashlib.blake2b(f"{a}|{b}".encode(), digest_size=8).digest()
                h = (h + np.uint64(int.from_bytes(d, "little"))) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "h": pa.array([int(h)], pa.uint64())})

    agg = edges.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    return int(agg["n"].sum()), int(np.uint64(agg["h"].to_numpy().astype(np.uint64).sum()))


def distributed_cc(edges: rd.Dataset, max_rounds: int = 50) -> rd.Dataset:
    """Edges (url_a,url_b) -> labels Dataset (url, label).

    Alternates large-star/small-star until the canonical edge multiset
    is stable; the fixpoint is a star forest rooted at each component's
    min url, which IS the (url, label) mapping for non-root members;
    roots label themselves.
    """
    cur = edges.map_batches(
        lambda t: pa.table({"u": t["url_a"], "v": t["url_b"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(_canon, batch_format="pyarrow")

    prev_fp = None
    for _ in range(max_rounds):
        # large-star
        ls = (
            cur.map_batches(_expand_both, batch_format="pyarrow")
            .groupby("k")
            .map_groups(_large_star, batch_format="pandas")
        )
        union = ls.union(cur.map_batches(_canon, batch_format="pyarrow"))
        # small-star
        ss = (
            union.map_batches(_canon, batch_format="pyarrow")
            .map_batches(_expand_small, batch_format="pyarrow")
            .groupby("k")
            .map_groups(_small_star, batch_format="pandas")
        )
        cur = (
            ss.map_batches(_canon, batch_format="pyarrow")
            .groupby("u")  # dedupe identical edges cheaply within groups
            .map_groups(lambda df: df.drop_duplicates(), batch_format="pandas")
            .materialize()
        )
        fp = _edge_checksum(cur)
        if fp == prev_fp:
            break
        prev_fp = fp

    # fixpoint edges are (root=u, member=v)
    return cur.map_batches(
        lambda t: pa.table({"url": t["v"], "label": t["u"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
