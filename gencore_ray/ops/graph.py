"""Iterative graph centrality: synchronous PageRank over an edge list.

Web-corpus curation weighs a page by its position in the host link
graph (quality-signal mixing — the Gopher/CCNet pipelines both consume
link-based quality priors).  The operator is generic: any
``(src, dst)`` int64 edge list works.

Dataflow per iteration (the SemDeDup/Lloyd shape, ops/kmeans.py:55):
rank vector BROADCAST once via ``ray.put`` (numpy, 16 B/node), one
``map_batches`` over the STATIC materialized edge blocks emitting
per-block pre-aggregated ``(dst, contrib)`` partials (``np.bincount``
inside the block — the exchange carries at most the block's distinct
dst count), one ``grouped_aggregate`` sum, then an O(N) driver fold of
teleport + dangling mass.  Edges are never re-shuffled: the per-block
src→index lookup is ``np.searchsorted`` against the broadcast node
index.

Regime: driver + broadcast state is O(N nodes) — 16 GB at 10^9 nodes.
That covers every HOST-level graph (Common Crawl is ~10^8 hosts); a
document-level graph at 10^12 nodes needs the rank table kept
distributed and joined per iteration (2 exchanges/iter via
``stages/shuffle.hash_join``) — the same auto-switch discipline as
driver-CC vs large-star/small-star in ``stages/cc.py:175``.

The synchronous update is SQL-replayable: one unrolled CTE per
iteration (see ``__ray_entry__`` oracle) reproduces ranks to float64
round-off; results are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def pagerank(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    num_parts: int = 32,
    dedupe: bool = True,
) -> rd.Dataset:
    """Synchronous PageRank; returns a Dataset of (node, rank).

    ``rank_0 = 1/N``;
    ``rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u)/deg(u)
    + dangling_i / N)`` — dangling mass is the total rank of
    zero-out-degree nodes, redistributed uniformly (the standard
    stochastic completion, so ranks sum to 1 every iteration).
    """
    from gencore_ray.ops.relational import grouped_aggregate

    empty = rd.from_arrow(
        pa.table({"node": pa.array([], pa.int64()),
                  "rank": pa.array([], pa.float64())})
    )
    edges = edges.materialize()
    if edges.count() == 0:
        return empty
    if dedupe:
        # parallel edges would double-count contributions; one exchange
        edges = grouped_aggregate(
            edges, [src, dst], [("__m", None, "count")], num_parts=num_parts
        ).drop_columns(["__m"])
    edges = edges.materialize()

    # node index + out-degrees: two slim aggregates, folded on the
    # driver (the documented O(N) state)
    deg_tbl = grouped_aggregate(
        edges, [src], [("deg", None, "count")], num_parts=num_parts
    ).to_pandas()
    dst_tbl = grouped_aggregate(
        edges, [dst], [("__m", None, "count")], num_parts=num_parts
    ).to_pandas()
    nodes = np.union1d(
        deg_tbl[src].to_numpy(np.int64), dst_tbl[dst].to_numpy(np.int64)
    )
    n = len(nodes)
    if n == 0:
        return empty
    deg = np.zeros(n, dtype=np.float64)
    deg[np.searchsorted(nodes, deg_tbl[src].to_numpy(np.int64))] = (
        deg_tbl["deg"].to_numpy(np.float64)
    )
    dangling_mask = deg == 0.0

    nodes_ref = ray.put(nodes)
    deg_ref = ray.put(deg)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    d = float(damping)

    for _ in range(iters):
        state_ref = ray.put(rank)

        # per-block partial: contrib(u->v) = rank[u]/deg[u], pre-summed
        # per dst inside the block so the exchange carries distinct
        # dsts only
        def partial(df: pd.DataFrame, _nodes=nodes_ref, _state=state_ref,
                    _deg=deg_ref) -> pd.DataFrame:
            nd, rk, dg = ray.get(_nodes), ray.get(_state), ray.get(_deg)
            si = np.searchsorted(nd, df[src].to_numpy(np.int64))
            dv = df[dst].to_numpy(np.int64)
            w = rk[si] / dg[si]
            du, inv = np.unique(dv, return_inverse=True)
            return pd.DataFrame(
                {"node": du, "c": np.bincount(inv, weights=w,
                                              minlength=len(du))}
            )

        inc_tbl = grouped_aggregate(
            edges.map_batches(partial, batch_format="pandas"),
            ["node"],
            [("inc", "c", "sum")],
            num_parts=num_parts,
        ).to_pandas()

        inc = np.zeros(n, dtype=np.float64)
        inc[np.searchsorted(nodes, inc_tbl["node"].to_numpy(np.int64))] = (
            inc_tbl["inc"].to_numpy(np.float64)
        )
        dangling = float(rank[dangling_mask].sum())
        rank = (1.0 - d) / n + d * (inc + dangling / n)

    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "rank": pa.array(rank, pa.float64())})
    )
