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

Two regimes, equal by construction (equality-tested), selected by a
node-count auto-switch (the driver-CC vs large-star/small-star
discipline, ``stages/cc.py:175``):

* ``broadcast`` — driver + broadcast state is O(N nodes), 16 B/node
  (16 GB at 10^9 nodes).  Covers every HOST-level graph (Common Crawl
  is ~10^8 hosts).  Edges never re-shuffle.
* ``distributed`` — the doc-scale path (10^12 nodes): the rank table
  stays a Dataset keyed by node; each iteration is one
  ``hash_join`` (edges x rank on src), one dst-keyed partial-sum
  aggregate, and one left-outer join rebuilding the rank table —
  O(E) exchange per iteration, nothing O(N) on the driver.  Dangling
  mass is a scalar aggregate.

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
    mode: str = "auto",          # "auto" | "broadcast" | "distributed"
    max_broadcast_nodes: int = 50_000_000,
) -> rd.Dataset:
    """Synchronous PageRank; returns a Dataset of (node, rank).

    ``rank_0 = 1/N``;
    ``rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u)/deg(u)
    + dangling_i / N)`` — dangling mass is the total rank of
    zero-out-degree nodes, redistributed uniformly (the standard
    stochastic completion, so ranks sum to 1 every iteration).

    ``mode="auto"`` counts distinct nodes with one slim distributed
    aggregate and picks broadcast (node state via ``ray.put``) below
    ``max_broadcast_nodes``, the joined rank-table path above it.
    """
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import dedupe_rows, to_arrow_blocks

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

    # node index + out-degrees: two slim node-level aggregates
    deg_ds = grouped_aggregate(
        edges, [src], [("deg", None, "count")], num_parts=num_parts
    ).materialize()
    dst_ds = grouped_aggregate(
        edges, [dst], [("__m", None, "count")], num_parts=num_parts
    ).drop_columns(["__m"]).materialize()

    if mode == "auto":
        # metadata-only upper bound first: |V| <= |distinct src| +
        # |distinct dst| (both already materialized) — the common
        # below-threshold case is decided with ZERO extra tasks; only
        # when the bound exceeds the threshold is the exact distinct
        # count worth an exchange
        ub = deg_ds.count() + dst_ds.count()
        if ub <= max_broadcast_nodes:
            mode = "broadcast"
        else:
            both = to_arrow_blocks(
                deg_ds.select_columns([src])).rename_columns(
                {src: "node"}
            ).union(
                to_arrow_blocks(dst_ds.select_columns([dst])).rename_columns(
                    {dst: "node"})
            )
            n_nodes = dedupe_rows(both, ["node"], num_parts=num_parts).count()
            mode = ("broadcast" if n_nodes <= max_broadcast_nodes
                    else "distributed")
    if mode == "distributed":
        return _pagerank_distributed(
            edges, deg_ds, dst_ds, src, dst, float(damping), iters, num_parts)

    # --- broadcast regime: fold the node tables on the driver --------
    deg_tbl = deg_ds.to_pandas()
    dst_tbl = dst_ds.to_pandas()
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


def _pagerank_distributed(
    edges: rd.Dataset,
    deg_ds: rd.Dataset,
    dst_ds: rd.Dataset,
    src: str,
    dst: str,
    d: float,
    iters: int,
    num_parts: int,
) -> rd.Dataset:
    """Doc-scale regime: the rank table lives as a Dataset keyed by
    node; nothing O(N) ever sits on the driver.  Per iteration: one
    hash_join (edges x rank on src), per-block dst partial sums, one
    dst-keyed aggregate, one left-outer join rebuilding the rank
    table.  Scalars (n, dangling mass) are distributed aggregates.
    """
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import hash_join, to_arrow_blocks

    # node table (node, deg): src-degrees FULL OUTER distinct dsts
    left = to_arrow_blocks(deg_ds).rename_columns({src: "node"})
    right = to_arrow_blocks(dst_ds).rename_columns({dst: "__dn"})
    raw = hash_join(left, right, "node", "__dn",
                    num_parts=num_parts, how="full_outer")

    def _fill_deg(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_pandas().fillna(0).to_numpy(np.float64)
        return pa.table({"node": t["node"], "deg": pa.array(deg)})

    nodes = raw.map_batches(_fill_deg, batch_format="pyarrow").materialize()
    n = nodes.count()
    r0 = 1.0 / n

    def _init(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.full(t.num_rows, r0, dtype=np.float64)))

    R = nodes.map_batches(_init, batch_format="pyarrow").materialize()
    E = to_arrow_blocks(edges.select_columns([src, dst])).materialize()

    def _dangling(t: pa.Table) -> pa.Table:
        dg = t["deg"].to_numpy(zero_copy_only=False)
        rk = t["rank"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([float(rk[dg == 0.0].sum())])})

    def _rename_r(t: pa.Table) -> pa.Table:
        return pa.table({"__rn": t["node"], "__rdeg": t["deg"],
                         "__rrank": t["rank"]})

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["__rrank"].to_numpy() / df["__rdeg"].to_numpy()
        dv = df[dst].to_numpy(np.int64)
        du, inv = np.unique(dv, return_inverse=True)
        return pd.DataFrame(
            {"__in": du,
             "c": np.bincount(inv, weights=w, minlength=len(du))})

    for _ in range(iters):
        dang = float(
            R.map_batches(_dangling, batch_format="pyarrow").sum("s") or 0.0)
        Rr = R.map_batches(_rename_r, batch_format="pyarrow")
        j = hash_join(E, Rr, src, "__rn", num_parts=num_parts)
        inc = grouped_aggregate(
            j.map_batches(_partial, batch_format="pandas"),
            ["__in"], [("inc", "c", "sum")], num_parts=num_parts)
        newR = hash_join(nodes, to_arrow_blocks(inc), "node", "__in",
                         num_parts=num_parts, how="left_outer")
        base = (1.0 - d) / n + d * dang / n

        def _upd(t: pa.Table, _base=base) -> pa.Table:
            iv = t["inc"].to_pandas().fillna(0.0).to_numpy(np.float64)
            return pa.table({"node": t["node"], "deg": t["deg"],
                             "rank": pa.array(_base + d * iv)})

        R = newR.map_batches(_upd, batch_format="pyarrow").materialize()

    return R.select_columns(["node", "rank"])
