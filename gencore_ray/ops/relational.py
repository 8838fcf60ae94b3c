"""Relational operators: pre-aggregated groupby, broadcast join, top-k.

The aggregation pattern is partial-then-final (SURVEY §2.4 G11 — the
reference's Stats accumulators merge associatively,
/root/reference/src/stats.cpp:101-151): each batch collapses to one
row per key (vectorised pandas groupby), then one small exchange
merges partials.  A bare ``groupby().aggregate()`` would shuffle every
input row; this shuffles one row per (key, batch).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import ray
import ray.data as rd

from gencore_ray.stages.shuffle import grouped_map

# agg spec: (out_name, in_col, kind) with kind in sum|count|min|max|mean
_PARTIAL_KINDS = {"sum", "count", "min", "max", "mean"}


def grouped_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str | None, str]],
    num_parts: int = 32,
) -> rd.Dataset:
    """Pre-aggregated multi-key groupby.

    aggs: [(out_name, in_col, kind)] — kind in sum/count/min/max/mean.
    count ignores in_col. mean is computed as merged sum / merged count.
    """
    keys = list(keys)
    for _, _, kind in aggs:
        if kind not in _PARTIAL_KINDS:
            raise ValueError(f"unsupported agg kind {kind}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = {}
        for name, col, kind in aggs:
            if kind == "count":
                out[f"{name}__cnt"] = g.size()
            elif kind == "mean":
                out[f"{name}__sum"] = g[col].sum()
                out[f"{name}__n"] = g[col].count()
            else:
                out[f"{name}__{kind}"] = getattr(g[col], kind)()
        return pd.DataFrame(out).reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out = {}
        for name, col, kind in aggs:
            if kind == "count":
                out[name] = g[f"{name}__cnt"].sum()
            elif kind == "sum":
                out[name] = g[f"{name}__sum"].sum()
            elif kind == "mean":
                out[name] = g[f"{name}__sum"].sum() / g[f"{name}__n"].sum()
            elif kind == "min":
                out[name] = g[f"{name}__min"].min()
            elif kind == "max":
                out[name] = g[f"{name}__max"].max()
        return pd.DataFrame(out).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_map(partials, keys[0], final, num_parts=num_parts)


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    key: str,
    small_key: str | None = None,
    how: str = "inner",
) -> rd.Dataset:
    """Map-side join against a broadcast dimension table: the small
    side is ``ray.put`` ONCE and merged into every batch — no shuffle
    (the reference's genome-singleton lookup, SURVEY §2.3 ST1)."""
    small_key = small_key or key
    ref = ray.put(small)

    # stateless tasks closing over the ObjectRef: ray.get is a zero-copy
    # hit on the local object store after the first touch per node, and
    # elastic tasks avoid the ~0.3s/actor spawn ramp an actor pool pays
    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(
            ray.get(ref), left_on=key, right_on=small_key,
            how="left" if how == "left_outer" else how,
        )

    return ds.map_batches(join_batch, batch_format="pandas")


def grouped_quantiles(
    ds: rd.Dataset,
    keys: Sequence[str],
    value_col: str,
    qs: Sequence[tuple[str, float]],
    num_parts: int = 16,
    round_to: int | None = 6,
) -> rd.Dataset:
    """EXACT per-group quantiles (linear interpolation — matches both
    numpy 'linear' and SQL quantile_cont).

    Quantiles don't decompose into partials, so the exchange moves the
    (key, value) pairs — prune to those two columns first.  Each
    partition holds complete key-groups; the percentile call is one
    numpy shot per group."""
    import numpy as np

    slim = ds.select_columns([*keys, value_col])

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for kv, g in df.groupby(list(keys), sort=False):
            vals = g[value_col].to_numpy(dtype=np.float64)
            row = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
            for name, q in qs:
                v = float(np.percentile(vals, q * 100.0, method="linear"))
                if round_to is not None:
                    # half-away-from-zero == DuckDB round() (banker's
                    # rounding flips exact halves the other way)
                    p = 10.0 ** round_to
                    v = float(np.sign(v) * np.floor(abs(v) * p + 0.5) / p)
                row[name] = v
            out_rows.append(row)
        if not out_rows:
            return pd.DataFrame(
                {**{k: pd.Series(dtype=object) for k in keys},
                 **{name: pd.Series(dtype=np.float64) for name, _ in qs}}
            )
        return pd.DataFrame(out_rows)

    return grouped_map(slim, keys[0], per_partition, num_parts=num_parts)


def top_ngrams(
    ds: rd.Dataset,
    text_col: str = "text",
    n: int = 5,
    k: int = 20,
    num_parts: int = 16,
) -> rd.Dataset:
    """Global top-k token n-grams by occurrence count.

    Partial counts inside each batch are computed on uint64 WINDOW
    HASHES (the shingle polynomial over the batch's token-hash stream),
    so the counting pass allocates no gram strings at all; the gram
    string is materialised exactly once per DISTINCT surviving hash
    (O(unique), not O(total windows) — a gram-dense batch no longer
    amplifies memory n-fold).  Then ONE slim exchange of
    (ngram, count) partials, merge, deterministic top-k (count desc,
    ngram asc).  Docs with fewer than n tokens contribute nothing.
    Two distinct grams colliding on the 64-bit window hash would be
    counted together (probability ~windows^2/2^64 — negligible below
    ~10^9 distinct grams per batch)."""
    import numpy as np

    from gencore_ray.functions.hashing import U64, pow_array, splitmix64
    from gencore_ray.functions.text import _POLY, TextFeatures

    powers = pow_array(_POLY, n)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ngram": pd.Series(dtype=object),
                              "n_occurrences": pd.Series(dtype=np.int64)})
        feats = TextFeatures(df[text_col].tolist())
        lens = np.fromiter(map(len, feats.tok_hashes), dtype=np.int64,
                           count=len(feats.tok_hashes))
        total = int(lens.sum())
        if total < n:
            return empty
        flat = np.concatenate(feats.tok_hashes)
        offs = np.r_[0, np.cumsum(lens)]
        doc_of = np.repeat(np.arange(len(lens)), lens)
        # one vectorised rolling hash over the whole batch stream;
        # windows crossing a document boundary are masked out
        win = np.lib.stride_tricks.sliding_window_view(flat, n)
        with np.errstate(over="ignore"):
            wh = splitmix64((win * powers).sum(axis=1, dtype=U64))
        valid = doc_of[: total - n + 1] == doc_of[n - 1:]
        if not valid.any():
            return empty
        starts = np.flatnonzero(valid)
        uh, first, counts = np.unique(
            wh[valid], return_index=True, return_counts=True
        )
        # strings only for the distinct survivors
        grams = []
        for g in starts[first]:
            d = doc_of[g]
            loc = int(g - offs[d])
            grams.append(" ".join(feats.tok_lists[d][loc: loc + n]))
        return pd.DataFrame(
            {"ngram": np.asarray(grams, dtype=object),
             "n_occurrences": counts.astype(np.int64)}
        )

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas"
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", sort=False)["n_occurrences"].sum().reset_index()
        # per-partition prune: only each partition's top-k reach the sort
        return g.sort_values(["n_occurrences", "ngram"],
                             ascending=[False, True], kind="mergesort").head(k)

    merged = grouped_map(partials, "ngram", merge, num_parts=num_parts)
    return merged.sort(["n_occurrences", "ngram"],
                       descending=[True, False]).limit(k)


def top_k_per_group(
    ds: rd.Dataset,
    keys: Sequence[str],
    by: Sequence[str],
    k: int,
    descending: Sequence[bool] | bool = True,
    num_parts: int = 16,
) -> rd.Dataset:
    """Top-k rows per key group (training-data curation: best docs per
    domain/language).  One exchange keyed on keys[0]; inside each
    partition a single vectorised sort + groupby-head — no per-group
    Python.  Deterministic: ``by`` should end in a unique tiebreaker."""
    keys = list(keys)
    by = list(by)
    if isinstance(descending, bool):
        descending = [descending] * len(by)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(by, ascending=[not d for d in descending],
                            kind="mergesort")
        return df.groupby(keys, sort=False).head(k)

    return grouped_map(ds, keys[0], per_partition, num_parts=num_parts)


def stratified_sample(
    ds: rd.Dataset,
    keys: Sequence[str],
    id_col: str,
    n_per_key: int,
    num_parts: int = 16,
) -> rd.Dataset:
    """Deterministic stratified sample: n rows per key, ordered by a
    fixed multiplicative hash of the integer id (Knuth 2654435761 mod
    2^32) — pseudo-random but pure integer arithmetic, so any engine
    (including the SQL oracle) reproduces the exact same sample.  The
    scale-correct alternative to driver-side or rng-order sampling.

    Overflow-exact for EVERY id: the id is reduced mod 2^32 BEFORE the
    multiply ((a*b) mod m == ((a mod m)*b) mod m), so the uint64
    product never exceeds (2^32-1)*2654435761 < 2^64 and the SQL twin
    ((CAST(id AS UBIGINT) % 4294967296) * 2654435761) % 4294967296
    computes the identical value without DuckDB's UBIGINT overflow
    error — a naive int64 product would silently wrap above ~3.46e9."""
    import numpy as np

    keys = list(keys)
    mult, mod = np.uint64(2654435761), np.uint64(1 << 32)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        h = ((df[id_col].to_numpy().astype(np.uint64) % mod) * mult) % mod
        out = (
            df.assign(_h=h)
            .sort_values(["_h", id_col], kind="mergesort")
            .groupby(keys, sort=False).head(n_per_key)
        )
        return out.drop(columns=["_h"])

    return grouped_map(ds, keys[0], per_partition, num_parts=num_parts)


def topk(
    ds: rd.Dataset, by: list[str], k: int, descending: list[bool] | bool = True
) -> rd.Dataset:
    """Global deterministic top-k: per-batch prune to k, then one small
    sort+limit (only n_batches*k rows reach the sort)."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=[not d for d in descending],
                              kind="mergesort").head(k)

    return ds.map_batches(prune, batch_format="pandas").sort(
        by, descending=descending
    ).limit(k)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    on: str,
    num_parts: int = 16,
) -> rd.Dataset:
    """Backward as-of join: each left row picks up the payload of the
    right row with the greatest ``on`` <= left.on inside the same
    ``by`` group (inclusive, SQL ``ASOF LEFT JOIN`` semantics) — the
    classic event-stream enrichment Ray Data's Dataset API lacks.

    ONE exchange keyed on ``by`` co-locates complete key groups; inside
    each partition both sides sort by ``on`` once and a single
    ``pandas.merge_asof`` does the vectorised backward scan.  Right
    payload column names must not collide with left's (rename first),
    and the right side should be unique per (by, on) — with duplicates
    the LAST row in ``on``-order wins (pre-aggregate for determinism).
    """
    import numpy as np
    import pyarrow as pa

    from gencore_ray.stages.shuffle import grouped_map, to_arrow_blocks

    left = to_arrow_blocks(left)
    right = to_arrow_blocks(right)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols = [n for n in rschema.names if n not in (by, on)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"asof_join column overlap: {sorted(overlap)} — rename first")

    def tag(side: int, own: list[str], other_schema: pa.Schema, other: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            t = t.append_column("__side", pa.array(np.full(n, side, dtype=np.int8)))
            for name in other:
                t = t.append_column(name, pa.nulls(n, other_schema.field(name).type))
            return t.select([by, on, "__side", *[c for c in lcols if c not in (by, on)], *rcols])

        return fn

    tagged = left.map_batches(
        tag(0, lcols, rschema, rcols), batch_format="pyarrow"
    ).union(right.map_batches(
        tag(1, [by, on, *rcols], lschema,
            [c for c in lcols if c not in (by, on)]),
        batch_format="pyarrow",
    ))

    lpayload = [c for c in lcols if c not in (by, on)]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][[by, on, *lpayload]]
        r = df[df["__side"] == 1][[by, on, *rcols]]
        if not len(l):
            return l.iloc[0:0][[by, on, *lpayload]].assign(
                **{c: pd.Series(dtype=r[c].dtype) for c in rcols}
            )
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(on, kind="mergesort")
        out = pd.merge_asof(l, r, on=on, by=by, direction="backward")
        return out[[by, on, *lpayload, *rcols]]

    return grouped_map(tagged, by, merge, num_parts=num_parts)


def group_ranks(
    ds: rd.Dataset,
    key: str,
    order_col: str,
    id_col: str,
    descending: bool = True,
    num_parts: int = 16,
) -> rd.Dataset:
    """SQL window ranks per key: ``row_number`` / ``rank`` /
    ``dense_rank`` / ``percent_rank`` / ``cume_dist`` over
    (order_col [DESC], id_col) within each key — the curation
    primitive behind "keep the N best docs per domain" / "percentile
    of each doc within its language".

    One exchange keyed on ``key``; inside each partition a single sort
    plus vectorised pandas group rank kernels.  ``id_col`` must be
    unique so ``row_number`` is deterministic.  percent_rank =
    (rank-1)/(n-1) (0.0 for singleton groups) and cume_dist =
    max-rank/n, both rounded half-away to 6 — SQL semantics exactly.
    """
    import numpy as np

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            empty_i = pd.Series(dtype="int64")
            empty_f = pd.Series(dtype="float64")
            return df.assign(row_number=empty_i, rank=empty_i,
                             dense_rank=empty_i, percent_rank=empty_f,
                             cume_dist=empty_f)
        df = df.sort_values([key, order_col, id_col],
                            ascending=[True, not descending, True],
                            kind="mergesort")
        g = df.groupby(key, sort=False)
        asc = not descending
        rank = g[order_col].rank(method="min", ascending=asc).to_numpy()
        rmax = g[order_col].rank(method="max", ascending=asc).to_numpy()
        n = g[order_col].transform("size").to_numpy(dtype=np.float64)
        pr = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        cd = rmax / n
        return df.assign(
            row_number=(g.cumcount() + 1).astype("int64"),
            rank=rank.astype("int64"),
            dense_rank=g[order_col].rank(method="dense", ascending=asc).astype("int64"),
            percent_rank=np.floor(pr * 1e6 + 0.5) / 1e6,
            cume_dist=np.floor(cd * 1e6 + 0.5) / 1e6,
        )

    return grouped_map(ds, key, per_partition, num_parts=num_parts)


def ntile(
    ds: rd.Dataset,
    by_col: str,
    id_col: str,
    n: int,
    num_parts: int = 16,
) -> rd.Dataset:
    """Global equi-depth bucketing with exact SQL ``NTILE(n) OVER
    (ORDER BY by_col, id_col)`` semantics — length/score-tier
    assignment over the whole corpus without a global sort.

    The global row number decomposes: rows_before(v) (count of rows
    with by_col < v) + the row's rank among rows sharing v.  The first
    term is a SMALL aggregate (one row per distinct by_col value —
    lengths/scores/dates are bounded-cardinality; do NOT use a unique
    id as by_col) broadcast to every partition; the second is one
    exchange keyed on by_col.  No stage materialises the data and the
    heavy table is touched exactly twice, both map-side.
    """
    import numpy as np

    counts = (
        grouped_aggregate(ds, [by_col], [("__n", None, "count")],
                          num_parts=num_parts)
        .to_pandas()
        .sort_values(by_col)
    )
    total = int(counts["__n"].sum())
    before = np.concatenate([[0], np.cumsum(counts["__n"].to_numpy())[:-1]])
    offsets = ray.put(dict(zip(counts[by_col].tolist(), before.tolist())))
    # NTILE(n): first (total % n) buckets get (total//n + 1) rows
    size, rem = divmod(total, n)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(bucket=pd.Series(dtype="int64"))
        df = df.sort_values([by_col, id_col], kind="mergesort")
        off = df[by_col].map(ray.get(offsets)).to_numpy(dtype=np.int64)
        within = df.groupby(by_col, sort=False).cumcount().to_numpy()
        r0 = off + within
        big = size + 1
        cut = rem * big
        bucket = np.where(r0 < cut, r0 // max(big, 1),
                          rem + (r0 - cut) // max(size, 1))
        return df.assign(bucket=bucket.astype(np.int64) + 1)

    return grouped_map(ds, by_col, per_partition, num_parts=num_parts)


def rollup_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str | None, str]],
    num_parts: int = 32,
) -> rd.Dataset:
    """``GROUP BY ROLLUP(keys)``: every prefix level of ``keys`` plus
    the grand total, coarser levels carrying NULL in the rolled-up key
    columns and ``level`` = number of rolled-up keys.

    The heavy input is aggregated ONCE at the finest level
    (partial-then-final, one slim exchange); every coarser level
    re-aggregates the previous level's compact result, so 100 TB of
    input never flows more than once.  Only re-aggregatable kinds
    (sum/count/min/max) are allowed — a rolled-up mean must be derived
    from sum+count by the caller.  Key values must be non-NULL (NULL
    is the rollup marker, as in SQL without GROUPING()).
    """
    import numpy as np
    import pyarrow as pa

    from gencore_ray.stages.shuffle import to_arrow_blocks

    keys = list(keys)
    for _, _, kind in aggs:
        if kind not in ("sum", "count", "min", "max"):
            raise ValueError(
                f"rollup_aggregate: {kind} is not re-aggregatable; use sum/count/min/max"
            )
    agg_names = [name for name, _, _ in aggs]
    # coarser levels merge the finest partials: a count re-aggregates as sum
    reagg = [(name, name, "sum" if kind == "count" else kind)
             for name, _, kind in aggs]

    finest = to_arrow_blocks(
        grouped_aggregate(ds, keys, aggs, num_parts=num_parts)
    ).materialize()
    schema = finest.schema().base_schema
    out_cols = [*keys, *agg_names, "level"]

    def with_level(level: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            for k in keys[len(keys) - level:]:
                t = t.append_column(k, pa.nulls(n, schema.field(k).type))
            t = t.append_column(
                "level", pa.array(np.full(n, level, dtype=np.int64)))
            return t.select(out_cols)

        return fn

    levels = [finest.map_batches(with_level(0), batch_format="pyarrow")]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        sub = keys[:i]
        if sub:
            cur = to_arrow_blocks(grouped_aggregate(
                cur, sub, reagg, num_parts=min(num_parts, 8))).materialize()
        else:
            # grand total: constant-key reduce of the (already tiny) level-1
            const = cur.map_batches(
                lambda df: df.assign(__all=np.int64(0)), batch_format="pandas")
            cur = to_arrow_blocks(
                grouped_aggregate(const, ["__all"], reagg, num_parts=1)
                .drop_columns(["__all"])
            ).materialize()
        levels.append(cur.map_batches(with_level(len(keys) - i),
                                      batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def grouped_moments(
    ds: rd.Dataset,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """Per-group second-order statistics in ONE pass: count, means,
    sample stddevs and the Pearson correlation of two columns — the
    profiling aggregate behind "is this feature informative".

    Decomposes exactly into per-batch partial sums
    (n, Σx, Σy, Σx², Σy², Σxy); the exchange moves one 6-number row
    per (key, batch) and the final merge applies the closed forms
      var = (Σx² − (Σx)²/n) / (n−1)
      corr = (Σxy − ΣxΣy/n) / sqrt((Σx²−(Σx)²/n)(Σy²−(Σy)²/n)).
    Results are rounded half-away-from-zero to ``round_to`` so the
    value-hash matches SQL engines whose streaming accumulation order
    differs in the last ulp.  Groups with n < 2 or zero variance yield
    NULL stddev/corr (SQL semantics).
    """
    import numpy as np

    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].astype("float64")
        y = df[y_col].astype("float64")
        tmp = pd.DataFrame({
            **{k: df[k] for k in keys},
            "__n": np.ones(len(df), dtype=np.int64),
            "__sx": x, "__sy": y, "__sxx": x * x, "__syy": y * y,
            "__sxy": x * y,
        })
        return tmp.groupby(keys, sort=False, as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False).sum()
        n = g["__n"].to_numpy(dtype=np.float64)
        sx, sy = g["__sx"].to_numpy(), g["__sy"].to_numpy()
        sxx, syy, sxy = g["__sxx"].to_numpy(), g["__syy"].to_numpy(), g["__sxy"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            cx = sxx - sx * sx / n
            cy = syy - sy * sy / n
            cxy = sxy - sx * sy / n
            sd_x = np.where(n > 1, np.sqrt(np.maximum(cx, 0) / (n - 1)), np.nan)
            sd_y = np.where(n > 1, np.sqrt(np.maximum(cy, 0) / (n - 1)), np.nan)
            corr = np.where((n > 1) & (cx > 0) & (cy > 0),
                            cxy / np.sqrt(np.maximum(cx * cy, 1e-300)), np.nan)

        def rnd(v: np.ndarray) -> np.ndarray:
            p = 10.0 ** round_to
            return np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p

        out = g[keys].copy()
        out["n"] = g["__n"].astype("int64")
        out["x_mean"] = rnd(sx / n)
        out["y_mean"] = rnd(sy / n)
        out["x_std"] = rnd(sd_x)
        out["y_std"] = rnd(sd_y)
        out["corr_xy"] = rnd(corr)
        return out

    slim = ds.select_columns([*keys, x_col, y_col])
    partials = slim.map_batches(partial, batch_format="pandas")
    return grouped_map(partials, keys[0], final, num_parts=num_parts)


def cube_aggregate(
    ds: rd.Dataset,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str | None, str]],
    num_parts: int = 32,
) -> rd.Dataset:
    """``GROUP BY CUBE(keys)``: every subset of ``keys``, rolled-up key
    columns NULL, plus ``grouping_id`` with SQL ``GROUPING(keys...)``
    bit semantics (bit set ⇔ that key is rolled up; keys[0] is the
    most-significant bit).

    Like ``rollup_aggregate``, the heavy input is aggregated ONCE at
    the finest level; all 2^len(keys)−1 coarser subsets re-aggregate
    that compact result, so the full table never flows twice.  Only
    re-aggregatable kinds (sum/count/min/max); key values must be
    non-NULL (NULL is the cube marker).
    """
    from itertools import combinations

    import numpy as np
    import pyarrow as pa

    from gencore_ray.stages.shuffle import to_arrow_blocks

    keys = list(keys)
    for _, _, kind in aggs:
        if kind not in ("sum", "count", "min", "max"):
            raise ValueError(
                f"cube_aggregate: {kind} is not re-aggregatable; use sum/count/min/max"
            )
    agg_names = [name for name, _, _ in aggs]
    reagg = [(name, name, "sum" if kind == "count" else kind)
             for name, _, kind in aggs]

    finest = to_arrow_blocks(
        grouped_aggregate(ds, keys, aggs, num_parts=num_parts)
    ).materialize()
    schema = finest.schema().base_schema
    out_cols = [*keys, *agg_names, "grouping_id"]

    def shape(subset: tuple[str, ...]):
        gid = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in subset)

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            for k in keys:
                if k not in subset:
                    t = t.append_column(k, pa.nulls(n, schema.field(k).type))
            t = t.append_column(
                "grouping_id", pa.array(np.full(n, gid, dtype=np.int64)))
            return t.select(out_cols)

        return fn

    levels = [finest.map_batches(shape(tuple(keys)), batch_format="pyarrow")]
    for r in range(len(keys) - 1, -1, -1):
        for subset in combinations(keys, r):
            if subset:
                sub = to_arrow_blocks(grouped_aggregate(
                    finest, list(subset), reagg, num_parts=min(num_parts, 8)
                )).materialize()
            else:
                const = finest.map_batches(
                    lambda df: df.assign(__all=np.int64(0)), batch_format="pandas")
                sub = to_arrow_blocks(
                    grouped_aggregate(const, ["__all"], reagg, num_parts=1)
                    .drop_columns(["__all"])
                ).materialize()
            levels.append(sub.map_batches(shape(subset), batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def priority_sample(
    ds: rd.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
) -> rd.Dataset:
    """Deterministic weight-proportional sample of k rows
    (Duffield–Lund–Thorup priority sampling): each row gets priority
    u/w where u is the fixed multiplicative hash of the integer id
    (uniform in [1, 2^32], see ``stratified_sample``) and w its weight;
    the k SMALLEST priorities win, so heavy rows are proportionally
    likelier — and the whole draw is a pure function of (id, weight),
    replayable bit-for-bit by any engine including the SQL oracle
    (one exact-integer division is the only float op; IEEE division is
    correctly rounded, so the doubles are identical everywhere).

    Scale shape: per-batch prune to k, then sort+limit over the
    n_batches*k survivors — the input is touched once, map-side.
    Weights must be > 0.
    """
    import numpy as np

    mult, mod = np.uint64(2654435761), np.uint64(1 << 32)

    def with_priority(df: pd.DataFrame) -> pd.DataFrame:
        u = ((df[id_col].to_numpy().astype(np.uint64) % mod) * mult) % mod
        w = df[weight_col].to_numpy(dtype=np.float64)
        if len(w) and not (w > 0).all():
            raise ValueError(
                f"priority_sample: weight column {weight_col!r} must be "
                "strictly positive (zero weight -> inf priority, never "
                "sampled; negative -> always wins)")
        df = df.assign(priority=(u.astype(np.float64) + 1.0) / w)
        return df.sort_values(["priority", id_col], kind="mergesort").head(k)

    pruned = ds.map_batches(with_priority, batch_format="pandas")
    return pruned.sort(["priority", id_col]).limit(k)


def grouped_quantiles_compact(
    ds: rd.Dataset,
    keys: Sequence[str],
    value_col: str,
    qs: Sequence[tuple[str, float]],
    num_parts: int = 16,
    round_to: int | None = 6,
) -> rd.Dataset:
    """EXACT per-group quantiles over a BOUNDED-CARDINALITY value
    column (lengths, scores, counts, dates) at a fraction of
    ``grouped_quantiles``' shuffle: each batch collapses to one row per
    distinct (key, value) with a count, the exchange moves only those
    compact partials, and the final stage computes the same
    linear-interpolated quantile from the weighted value histogram —
    identical results to numpy 'linear' / SQL quantile_cont, but 100 TB
    of rows shuffle as at most |distinct values| rows per key.  (For
    genuinely continuous columns where every value is distinct this
    degenerates to the plain operator — use grouped_quantiles there.)
    """
    import numpy as np

    keys = list(keys)
    slim = ds.select_columns([*keys, value_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([*keys, value_col], sort=False)
             .size().rename("__cnt").reset_index())
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        merged = (df.groupby([*keys, value_col], sort=False)["__cnt"]
                  .sum().reset_index())
        for kv, g in merged.groupby(keys, sort=False):
            g = g.sort_values(value_col, kind="mergesort")
            vals = g[value_col].to_numpy(dtype=np.float64)
            cnts = g["__cnt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(cnts)          # 1-based cumulative ranks
            n = int(cum[-1])
            row = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
            for name, q in qs:
                pos = q * (n - 1)          # 0-based fractional rank
                i0 = int(np.floor(pos))
                frac = pos - i0
                # value at 0-based sorted index i = first j with cum[j] > i
                v0 = vals[np.searchsorted(cum, i0, side="right")]
                v1 = vals[np.searchsorted(cum, min(i0 + 1, n - 1), side="right")]
                v = v0 + frac * (v1 - v0)
                if round_to is not None:
                    p = 10.0 ** round_to
                    v = float(np.sign(v) * np.floor(abs(v) * p + 0.5) / p)
                row[name] = v
            out_rows.append(row)
        if not out_rows:
            return pd.DataFrame(
                {**{k: pd.Series(dtype=object) for k in keys},
                 **{name: pd.Series(dtype=np.float64) for name, _ in qs}}
            )
        return pd.DataFrame(out_rows)

    partials = slim.map_batches(partial, batch_format="pandas")
    return grouped_map(partials, keys[0], final, num_parts=num_parts)


def pivot_counts(
    ds: rd.Dataset,
    key: str,
    cat_col: str,
    categories: Sequence[str],
    num_parts: int = 16,
) -> rd.Dataset:
    """Pivot a categorical column into per-category count columns
    (``n_<cat>`` per key) — conditional aggregation, the long->wide
    reshape behind per-user activity profiles.

    Map-side indicator columns collapse each batch to one row per key
    before the exchange (partial-then-final), so the shuffle carries
    one slim row per (key, batch) regardless of input width.
    ``categories`` must be the known category list — an unknown value
    counts toward no column (SQL CASE WHEN semantics).
    """

    def indicators(df: pd.DataFrame) -> pd.DataFrame:
        out = {key: df[key]}
        for c in categories:
            out[f"n_{c}"] = (df[cat_col] == c).astype("int64")
        return pd.DataFrame(out)

    ind = ds.select_columns([key, cat_col]).map_batches(
        indicators, batch_format="pandas")
    return grouped_aggregate(
        ind, [key], [(f"n_{c}", f"n_{c}", "sum") for c in categories],
        num_parts=num_parts,
    )


def winsorize_by_group(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """Per-group winsorization: clip ``value_col`` to the group's
    exact [lo, hi] quantiles — outlier taming before training-data
    statistics.  The quantile table is one row per key (exact, via
    grouped_quantiles), broadcast back into a map-side clip — the big
    table crosses the cluster once for the quantile exchange and never
    again.  Adds ``<value_col>_w``; clip bounds and the clipped value
    are rounded half-away-from-zero to ``round_to`` (DuckDB parity).
    """
    import numpy as np

    q = grouped_quantiles(
        ds, [key], value_col,
        [("__lo", lo), ("__hi", hi)], num_parts=num_parts,
        round_to=round_to,
    ).to_pandas()
    ref = ray.put(q)

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(ref), on=key, how="left")
        v = np.clip(m[value_col].to_numpy(dtype=np.float64),
                    m["__lo"].to_numpy(), m["__hi"].to_numpy())
        p = 10.0 ** round_to
        df[f"{value_col}_w"] = np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p
        return df

    return ds.map_batches(clip, batch_format="pandas")


def mad_outliers(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    z: float = 3.5,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """Robust per-group outlier flags via the modified z-score
    0.6745 * (v - median) / MAD (Iglewicz-Hoaglin): immune to the very
    outliers a mean/stddev rule would absorb — the right QA gate for
    heavy-tailed web-doc statistics.

    Two exact-quantile passes (median, then median absolute deviation),
    each one slim exchange + a broadcast join back — the big table
    crosses the cluster twice for the quantile exchanges and is never
    re-shuffled for the flagging map.  Degenerate groups (MAD = 0, i.e.
    a majority of identical values) get NULL ``mod_z`` and are never
    flagged — the documented contract, replayed in SQL with a CASE.
    """
    import numpy as np

    med = grouped_quantiles(ds, [key], value_col, [("med", 0.5)],
                            num_parts=num_parts, round_to=round_to).to_pandas()
    med_ref = ray.put(med)

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(med_ref), on=key, how="left")
        df = df.assign(med=m["med"].to_numpy())
        df["__ad"] = np.abs(df[value_col].to_numpy(dtype=np.float64)
                            - df["med"].to_numpy())
        return df

    with_dev = ds.map_batches(dev, batch_format="pandas").materialize()
    mad = grouped_quantiles(with_dev, [key], "__ad", [("mad", 0.5)],
                            num_parts=num_parts, round_to=round_to).to_pandas()
    mad_ref = ray.put(mad)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(mad_ref), on=key, how="left")
        df = df.assign(mad=m["mad"].to_numpy())
        v = df[value_col].to_numpy(dtype=np.float64)
        madv = df["mad"].to_numpy(dtype=np.float64)
        medv = df["med"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mz = 0.6745 * (v - medv) / madv
        p = 10.0 ** round_to
        mz = np.sign(mz) * np.floor(np.abs(mz) * p + 0.5) / p
        zero = madv == 0
        out = df.drop(columns=["__ad"]).assign(
            mod_z=np.where(zero, np.nan, mz),
            is_outlier=np.where(zero, False, np.abs(mz) > z),
        )
        out["is_outlier"] = out["is_outlier"].astype(bool)
        return out

    return with_dev.map_batches(flag, batch_format="pandas")


def grouped_linear_trend(
    ds: rd.Dataset,
    key: str,
    x_col: str,
    y_col: str,
    num_parts: int = 16,
    round_to: int = 6,
    min_points: int = 2,
) -> rd.Dataset:
    """Per-group OLS trend line y = slope*x + intercept from the five
    moment sums (n, Sx, Sy, Sxx, Sxy) — closed-form regression as ONE
    partial+final aggregate; no per-group solver, no second pass.
    Groups with < ``min_points`` points or zero x-variance are dropped
    (slope undefined) — the SQL ``regr_slope IS NOT NULL`` contract.

    Output: (key, n, slope, intercept) rounded to ``round_to``.
    """
    import numpy as np

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        g = pd.DataFrame({key: df[key], "x": x, "y": y,
                          "xx": x * x, "xy": x * y})
        out = g.groupby(key, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum")).reset_index()
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series(dtype=df[key].dtype),
                                 "n": pd.Series(dtype="int64"),
                                 "slope": pd.Series(dtype="float64"),
                                 "intercept": pd.Series(dtype="float64")})
        g = df.groupby(key, sort=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), sxy=("sxy", "sum")).reset_index()
        n = g["n"].to_numpy(dtype=np.float64)
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxx, sxy = g["sxx"].to_numpy(), g["sxy"].to_numpy()
        denom = n * sxx - sx * sx
        ok = (g["n"].to_numpy() >= min_points) & (denom != 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / denom
            intercept = (sy - slope * sx) / n
        p = 10.0 ** round_to
        out = pd.DataFrame({
            key: g[key], "n": g["n"].astype(np.int64),
            "slope": np.sign(slope) * np.floor(np.abs(slope) * p + 0.5) / p,
            "intercept": np.sign(intercept)
            * np.floor(np.abs(intercept) * p + 0.5) / p,
        })
        return out[ok]

    partials = ds.select_columns([key, x_col, y_col]).map_batches(
        partial, batch_format="pandas")
    from gencore_ray.stages.shuffle import grouped_map

    return grouped_map(partials, key, final, num_parts=num_parts)


def chi_square_independence(
    ds: rd.Dataset,
    col_a: str,
    col_b: str,
    num_parts: int = 8,
    round_to: int = 6,
) -> rd.Dataset:
    """Pearson chi-square test of independence between two categorical
    columns — the statistical drift/bias probe (is event mix
    independent of hour? is language independent of source?).

    ONE (a, b)-keyed count exchange (pre-aggregated in the mappers);
    the driver folds only the contingency CELLS (|A| x |B|, bounded by
    the categories, never the rows): expected = row_tot * col_tot / n
    over the FULL grid (absent cells count as observed 0), chi2 =
    sum((o-e)^2/e), dof = (|A|-1)(|B|-1).  Output: one row
    (chi2, dof, n_rows).
    """
    import numpy as np

    counts = grouped_aggregate(
        ds.select_columns([col_a, col_b]), [col_a, col_b],
        [("o", None, "count")], num_parts=num_parts,
    ).to_pandas()
    if not len(counts):
        return rd.from_pandas(pd.DataFrame(
            {"chi2": [0.0], "dof": [0], "n_rows": [0]}))
    piv = counts.pivot_table(index=col_a, columns=col_b, values="o",
                             fill_value=0, aggfunc="sum")
    o = piv.to_numpy(dtype=np.float64)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float(((o - e) ** 2 / e).sum())
    p = 10.0 ** round_to
    return rd.from_pandas(pd.DataFrame({
        "chi2": [np.floor(chi2 * p + 0.5) / p],
        "dof": [np.int64((o.shape[0] - 1) * (o.shape[1] - 1))],
        "n_rows": [np.int64(n)],
    }))


def profile_columns(
    ds: rd.Dataset,
    cols: Sequence[str],
    num_parts: int = 8,
    round_to: int = 6,
) -> rd.Dataset:
    """Table profiling — the data-quality prelude of every large
    pipeline: per column, (n_rows, n_nulls, n_distinct exact,
    min_num, max_num).

    One pass computes the associative stats (counts, nulls, numeric
    min/max as tiny per-batch partials) AND emits one slim
    (column, value-hash) row per DISTINCT value per batch; a single
    hash-keyed exchange counts exact distincts.  min/max are reported
    (rounded) only for numeric columns — NULL otherwise — so the SQL
    replay never depends on engine-specific string formatting of
    floats/timestamps.  NULLs are excluded from the distinct count
    (SQL ``count(DISTINCT c)`` semantics).  Caveat: distinct doubles
    compare by BITS here (-0.0 != 0.0), by value in SQL.
    """
    import numpy as np

    from gencore_ray.functions.hashing import U64, hash_str_array_u64, splitmix64
    from gencore_ray.stages.shuffle import grouped_map

    cols = list(cols)
    slim = ds.select_columns(cols)

    def _vhash(s: pd.Series) -> np.ndarray:
        v = s.dropna()
        if not len(v):
            return np.empty(0, dtype=U64)
        if pd.api.types.is_float_dtype(v):
            return splitmix64(v.to_numpy(dtype=np.float64).view(U64))
        if pd.api.types.is_integer_dtype(v):
            return splitmix64(v.to_numpy(dtype=np.int64).view(U64))
        if pd.api.types.is_datetime64_any_dtype(v):
            return splitmix64(v.to_numpy(dtype="datetime64[us]")
                              .view(np.int64).view(U64))
        return hash_str_array_u64(v.astype(str).tolist())

    def _stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            numeric = (pd.api.types.is_numeric_dtype(s)
                       and not pd.api.types.is_bool_dtype(s))
            nn = s.dropna()
            rows.append({
                "column": c, "n_rows": len(s),
                "n_nulls": int(s.isna().sum()),
                "min_num": float(nn.min()) if numeric and len(nn) else np.nan,
                "max_num": float(nn.max()) if numeric and len(nn) else np.nan,
            })
        return pd.DataFrame(rows)

    def _distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            h = np.unique(_vhash(df[c]))
            frames.append(pd.DataFrame({"column": np.repeat(c, len(h)),
                                        "vh": h}))
        out = pd.concat(frames, ignore_index=True)
        out["column"] = out["column"].astype(object)
        return out

    def _count_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        # the vh exchange co-locates every occurrence of a hash, so a
        # per-partition dedupe is globally exact; emit tiny
        # (column, cnt) partials — no column's distinct set ever
        # funnels into one task
        return (df.drop_duplicates(["column", "vh"])
                .groupby("column", sort=False).size()
                .rename("cnt").reset_index())

    def _sum_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("column", sort=False)["cnt"].sum()
                .rename("n_distinct").reset_index())

    nd = grouped_map(
        slim.map_batches(_distinct_partial, batch_format="pandas"),
        "vh", _count_in_partition, num_parts=num_parts,
    )
    nd = grouped_map(nd, "column", _sum_counts,
                     num_parts=min(num_parts, len(cols)))
    nd = nd.to_pandas().set_index("column")["n_distinct"]

    parts = slim.map_batches(_stats_partial, batch_format="pandas").to_pandas()
    p = 10.0 ** round_to

    def _r(x: float) -> float:
        return float(np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p)

    out_rows = []
    for c in cols:
        g = parts[parts["column"] == c]
        mn, mx = g["min_num"].min(), g["max_num"].max()
        out_rows.append({
            "column": c,
            "n_rows": int(g["n_rows"].sum()),
            "n_nulls": int(g["n_nulls"].sum()),
            "n_distinct": int(nd.get(c, 0)),
            "min_num": _r(mn) if pd.notna(mn) else None,
            "max_num": _r(mx) if pd.notna(mx) else None,
        })
    return rd.from_pandas(pd.DataFrame(out_rows))


def pair_agreement_stats(
    ds: rd.Dataset,
    label_a: str,
    label_b: str,
    num_parts: int = 8,
    round_to: int = 6,
) -> rd.Dataset:
    """Pair-counting agreement between two labelings of the same rows —
    the standard way to score a dedup/clustering output against truth
    (or against another method): Rand index and Adjusted Rand Index
    from the contingency table.

    One slim exchange: per-batch (a, b) cell-count partials (one row
    per distinct label pair per batch), merged by a grouped sum; every
    C(n,2) sum then reduces driver-side from the cell counts (O(cells)
    state).  Returns ONE row: n_rows, pairs_a (same-label-in-A pairs),
    pairs_b, pairs_both, rand_index, adjusted_rand.

    gencore analogue: the pre/post Stats comparison that quantifies
    how much the dedup changed (/root/reference/src/stats.cpp:195-221),
    upgraded to a proper cluster-agreement statistic.
    """
    import numpy as np

    slim = ds.select_columns([label_a, label_b])

    def _cells(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([label_a, label_b], sort=False)
                .size().rename("c").reset_index())

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([label_a, label_b], sort=False)["c"]
                .sum().reset_index())

    cells = grouped_map(
        slim.map_batches(_cells, batch_format="pandas"),
        label_a, _merge, num_parts=num_parts,
    ).to_pandas()

    n = int(cells["c"].sum())
    nij = cells["c"].to_numpy(dtype=np.float64)
    ai = cells.groupby(label_a)["c"].sum().to_numpy(dtype=np.float64)
    bj = cells.groupby(label_b)["c"].sum().to_numpy(dtype=np.float64)

    def c2(x):
        return float((x * (x - 1) / 2.0).sum())

    sum_ij, sum_a, sum_b = c2(nij), c2(ai), c2(bj)
    total = n * (n - 1) / 2.0
    # Rand = (agreements) / total; ARI = (sum_ij - E) / (max - E)
    rand = ((total + 2 * sum_ij - sum_a - sum_b) / total) if total else 1.0
    exp = sum_a * sum_b / total if total else 0.0
    mx = (sum_a + sum_b) / 2.0
    ari = ((sum_ij - exp) / (mx - exp)) if mx != exp else 1.0
    p = 10.0 ** round_to

    def _r(x):
        return float(np.sign(x) * np.floor(abs(x) * p + 0.5) / p)

    return rd.from_pandas(pd.DataFrame([{
        "n_rows": n,
        "pairs_a": int(sum_a), "pairs_b": int(sum_b),
        "pairs_both": int(sum_ij),
        "rand_index": _r(rand), "adjusted_rand": _r(ari),
    }]))


def snapshot_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    id_col: str = "doc_id",
    content_col: str = "text",
    num_parts: int = 16,
) -> rd.Dataset:
    """Corpus-version diff — the audit primitive of an incremental
    pipeline (what changed between yesterday's crawl state and
    today's): (id, status) with status in
    ``added | removed | changed | unchanged``.

    Content comparison is by 64-bit content hash, so only (id, hash)
    rows ride the full-outer exchange — the text never moves.  The
    same slim-exchange discipline as stages/exact.py.
    """
    import numpy as np

    from gencore_ray.functions.hashing import hash_str_array_u64
    from gencore_ray.stages.shuffle import hash_join

    def _hashed(ds: rd.Dataset, hcol: str, kcol: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                kcol: df[id_col].to_numpy(),
                hcol: hash_str_array_u64(df[content_col].fillna("").tolist()),
            })

        return ds.select_columns([id_col, content_col]).map_batches(
            fn, batch_format="pandas")

    j = hash_join(_hashed(old, "h_old", id_col),
                  _hashed(new, "h_new", "nid"),
                  id_col, "nid", num_parts=num_parts, how="full_outer")

    def _status(df: pd.DataFrame) -> pd.DataFrame:
        ho = df["h_old"]
        hn = df["h_new"]
        status = np.where(
            ho.isna(), "added",
            np.where(hn.isna(), "removed",
                     np.where(ho == hn, "unchanged", "changed")))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "status": status.astype(object)})

    return j.map_batches(_status, batch_format="pandas")
