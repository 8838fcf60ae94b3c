"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time windows or watermarks (the reference's
watermark machinery, /root/reference/src/gencore.cpp:319-389, collapses
into batch shuffles — SURVEY §2.7).  Windows are expressed as
``grouped_map`` over the partition key with pandas doing the per-key
ordered logic.  Ordering assumption: events within a key fit in one
partition and are sorted by ``ts`` inside the UDF — the analogue of
gencore's input-sortedness precondition (src/gencore.cpp:232-241).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gencore_ray.stages.shuffle import grouped_map


def session_windows(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_parts: int = 32,
) -> rd.Dataset:
    """Session windows: a gap > ``gap`` starts a new session.

    Output: (key, session_id (1-based per key), n_events,
    session_start, session_end) — the exact shape of the standard SQL
    lag/cumsum formulation, so it is DuckDB-oracle-checkable.
    """

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        prev = df.groupby(key, sort=False)[ts_col].shift()
        brk = (prev.isna() | ((df[ts_col] - prev) > gap)).astype(np.int64)
        df = df.assign(session_id=brk.groupby(df[key]).cumsum())
        g = df.groupby([key, "session_id"], sort=False)
        out = g.agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index()
        return out

    return grouped_map(
        events.select_columns([key, ts_col]), key, per_partition, num_parts=num_parts
    )


def tumbling_window_agg(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "1d",
    num_parts: int = 32,
) -> rd.Dataset:
    """Tumbling windows per key: (key, window_start, n_events, total_value)."""

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df[ts_col].dt.floor(width))
        g = df.groupby([key, "window_start"], sort=False)
        return g.agg(
            n_events=(ts_col, "size"), total_value=(value_col, "sum")
        ).reset_index()

    return grouped_map(
        events.select_columns([key, ts_col, value_col]), key, per_partition,
        num_parts=num_parts,
    )


def hopping_window_agg(
    events: rd.Dataset,
    ts_col: str = "ts",
    value_col: str = "value",
    width_hours: int = 3,
    hop_hours: int = 1,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """Global hopping (sliding) windows: width ``width_hours``, hop
    ``hop_hours`` — each event lands in width/hop windows.

    Map-side expansion (one vectorised repeat per batch — no per-row
    loop), then the standard pre-aggregated exchange: the shuffle moves
    one partial row per (window, batch), never the expanded events.
    Output: (window_start, n_events, total_value).
    """
    from gencore_ray.ops.relational import grouped_aggregate

    n_win = width_hours // hop_hours
    offsets = pd.to_timedelta(np.arange(n_win) * hop_hours, unit="h")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        base = df[ts_col].dt.floor(f"{hop_hours}h")
        n = len(df)
        return pd.DataFrame({
            "window_start": np.repeat(base.to_numpy(), n_win)
            - np.tile(offsets.to_numpy(), n),
            value_col: np.repeat(df[value_col].to_numpy(), n_win),
        })

    expanded = events.select_columns([ts_col, value_col]).map_batches(
        expand, batch_format="pandas"
    )
    out = grouped_aggregate(
        expanded, ["window_start"],
        [("n_events", None, "count"), ("total_value", value_col, "sum")],
        num_parts=num_parts,
    )

    def rnd(df: pd.DataFrame) -> pd.DataFrame:
        v = df["total_value"].to_numpy(dtype=np.float64)
        p = 10.0 ** round_to
        df["total_value"] = np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p
        return df

    return out.map_batches(rnd, batch_format="pandas")


def lag_lead(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_parts: int = 32,
) -> rd.Dataset:
    """Per-key LAG/LEAD: previous and next ``value_col`` in
    (ts, id) order within each key — the event-stream neighbour lookup
    (time since last click, value of the next purchase).  One exchange
    keyed on ``key``; inside each partition a single sort + two
    vectorised group shifts, no per-row Python.
    """

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(prev_value=pd.Series(dtype="float64"),
                             next_value=pd.Series(dtype="float64"))
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        g = df.groupby(key, sort=False)[value_col]
        return df.assign(prev_value=g.shift(1), next_value=g.shift(-1))

    return grouped_map(events, key, per_partition, num_parts=num_parts)


def _range_frame_bounds(codes: np.ndarray, ts0: np.ndarray,
                        range_us: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row [lo, hi) index bounds of the trailing RANGE frame over a
    (key-code, time)-sorted series — the pure kernel of
    ``sliding_range_agg``.  ``codes`` must be monotone non-decreasing
    and ``ts0`` sorted ascending within each code, starting at >= 0.
    Encodes (code, t) into one sortable axis so BOTH boundaries come
    from plain ``searchsorted`` with no per-group loop.
    """
    if not len(codes):
        return (np.zeros(0, dtype=np.int64),) * 2
    big = np.int64(int(ts0.max()) + range_us + 2)
    if (int(codes.max()) + 1) * int(big) >= 2**62:
        raise ValueError("range-frame offset encoding overflow — "
                         "raise num_parts")
    comb = codes * big + ts0
    lo = np.searchsorted(comb, codes * big + (ts0 - range_us), side="left")
    hi = np.searchsorted(comb, comb, side="right")
    return lo.astype(np.int64), hi.astype(np.int64)


def sliding_range_agg(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    range_width: pd.Timedelta = pd.Timedelta(hours=1),
    num_parts: int = 32,
) -> rd.Dataset:
    """Per-key sliding event-time window: for every event, the count and
    value-sum of all events of the same key in ``[ts - range_width, ts]``
    (SQL ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW`` — peer rows at
    the exact same ts are all included, on both boundary sides).

    One exchange keyed on ``key``; inside each partition the frame
    boundaries come from TWO vectorised ``searchsorted`` calls over a
    key-offset-encoded time axis (no per-row or per-group Python), and
    the sums from prefix-sum differences.

    Exactness discipline: the summed value is ``floor(value)`` as int64 —
    a sliding-frame FLOAT sum is accumulation-order-dependent in every
    engine (this one subtracts prefix sums; DuckDB walks a segment
    tree), so only an integer (or fixed-point) measure can be replayed
    bit-exactly.  ``win_avg`` divides the two exact integers once.
    """
    range_us = int(range_width / pd.Timedelta(microseconds=1))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(win_n=pd.Series(dtype="int64"),
                             win_vsum=pd.Series(dtype="int64"),
                             win_avg=pd.Series(dtype="float64"))
        df = df.sort_values([key, ts_col], kind="mergesort")
        # pin the epoch unit: parquet feeds datetime64[us], from_pandas
        # feeds [ns] — a bare astype(int64) silently changes the window
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        codes, _ = pd.factorize(df[key], sort=False)  # monotone: df is key-sorted
        codes = codes.astype(np.int64)
        ts0 = ts - ts.min()
        lo, hi = _range_frame_bounds(codes, ts0, range_us)
        v = np.floor(df[value_col].to_numpy(dtype=np.float64)).astype(np.int64)
        cs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(v)])
        win_n = (hi - lo).astype(np.int64)
        win_vsum = cs[hi] - cs[lo]
        return df.assign(win_n=win_n, win_vsum=win_vsum,
                         win_avg=win_vsum / win_n)

    return grouped_map(events, key, per_partition, num_parts=num_parts)


def running_totals(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_parts: int = 32,
) -> rd.Dataset:
    """Ordered running sum per key (event_id kept as the row identity).

    The per-key incremental-state analogue of the reference's streaming
    accumulators; deterministic given the (key, ts, event_id) order.
    """

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        order = [key, ts_col] + (["event_id"] if "event_id" in df.columns else [])
        df = df.sort_values(order, kind="mergesort")
        df = df.assign(running_value=df.groupby(key, sort=False)[value_col].cumsum())
        return df

    return grouped_map(events, key, per_partition, num_parts=num_parts)


def retention_cohorts(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    period: str = "1d",
    num_parts: int = 32,
) -> rd.Dataset:
    """Cohort retention: users grouped by first-activity period
    (cohort), counted by how many were active k periods later.

    Output: (cohort, period_offset, n_active) — the activation/
    retention triangle.  Two slim exchanges: (1) key-keyed first-seen
    min, whose result rides back joined map-side per partition, then
    (2) the (cohort, offset) count aggregate over per-batch partials.
    Distinctness (a user active twice in one period counts once) is
    resolved inside the key-keyed partition — user rows co-locate, so
    the dedupe is exact with no extra exchange.
    """
    from gencore_ray.ops.relational import grouped_aggregate

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cohort": pd.Series(dtype="datetime64[us]"),
                                 "period_offset": pd.Series(dtype="int64")})
        p = df[ts_col].dt.floor(period)
        first = p.groupby(df[key]).transform("min")
        off = ((p - first) / pd.Timedelta(period)).astype(np.int64)
        out = pd.DataFrame({key: df[key], "cohort": first,
                            "period_offset": off}).drop_duplicates()
        return out[["cohort", "period_offset"]]

    act = grouped_map(events.select_columns([key, ts_col]), key,
                      per_partition, num_parts=num_parts)
    return grouped_aggregate(act, ["cohort", "period_offset"],
                             [("n_active", None, "count")],
                             num_parts=min(num_parts, 16))


def fill_period_gaps(
    events: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    period: str = "1d",
    num_parts: int = 32,
) -> rd.Dataset:
    """Dense per-key period series: aggregate to (key, period) counts
    and sums, then EMIT the missing periods between each key's first
    and last active period as explicit zero rows — the gap-filling
    resample every time-series consumer (rate alerting, trend fits)
    needs before arithmetic on the series.

    One key-keyed exchange; the expansion is vectorised repeat/arange
    per partition.  Scale note: output mass is span/period rows per
    key — bounded by the key's own activity span, never the global
    corpus span.
    """
    per = pd.Timedelta(period)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype=df[key].dtype),  # empty frames keep dtype
                "period_start": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64"),
                "total_value": pd.Series(dtype="float64")}
        if not len(df):
            return pd.DataFrame(cols)
        p = df[ts_col].dt.floor(period)
        g = (df.assign(__p=p).groupby([key, "__p"], sort=True)
             .agg(n_events=(ts_col, "size"), total_value=(value_col, "sum"))
             .reset_index())
        # dense index per key: first..last active period
        bounds = g.groupby(key, sort=False)["__p"].agg(["min", "max"])
        reps = ((bounds["max"] - bounds["min"]) / per).astype(np.int64) + 1
        keys_out = np.repeat(bounds.index.to_numpy(), reps.to_numpy())
        offs = np.concatenate([np.arange(r) for r in reps.to_numpy()]) \
            if len(reps) else np.array([], dtype=np.int64)
        starts = np.repeat(bounds["min"].to_numpy(), reps.to_numpy())
        dense = pd.DataFrame({key: keys_out,
                              "__p": starts + offs * per.to_numpy()})
        out = dense.merge(g, on=[key, "__p"], how="left")
        out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
        out["total_value"] = out["total_value"].fillna(0.0)
        return out.rename(columns={"__p": "period_start"})

    return grouped_map(events.select_columns([key, ts_col, value_col]),
                       key, per_partition, num_parts=num_parts)


def watermark_lateness(
    events: rd.Dataset,
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    delay: pd.Timedelta = pd.Timedelta(minutes=10),
    num_parts: int = 16,
) -> rd.Dataset:
    """The reference's watermark semantics as a first-class operator
    (/root/reference/src/gencore.cpp:319-389: clusters flush once the
    read head passes them; reads behind the watermark are impossible by
    the sortedness precondition — in a web event log they are LATE).

    Processing order is ``arrival_col``; the watermark after each
    arrival is ``running_max(ts) - delay`` over all STRICTLY EARLIER
    arrivals; an event is late iff its own ts is below that watermark.
    Output: every event + (watermark, is_late) — the triage a
    streaming ingest needs before windowed aggregation.

    Distributed shape: the prefix-scan pattern (ops/packing.py) —
    range-partition by arrival id (order-preserving), ONE tiny driver
    round carries each partition's max-ts prefix, then a vectorised
    cummax inside each partition.  SQL twin: ``max(ts) OVER (ORDER BY
    arrival ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.
    """
    from gencore_ray.ops.relational import grouped_aggregate

    ev = events.select_columns([arrival_col, ts_col])
    max_id = ev.max(arrival_col)
    if max_id is None:
        return rd.from_pandas(pd.DataFrame({
            arrival_col: pd.Series(dtype="int64"),
            ts_col: pd.Series(dtype="datetime64[us]"),
            "watermark": pd.Series(dtype="datetime64[us]"),
            "is_late": pd.Series(dtype="bool")}))
    width = max(1, (int(max_id) + num_parts) // num_parts)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(part=df[arrival_col].to_numpy(np.int64) // width)

    parted = ev.map_batches(part, batch_format="pandas")
    ptots = grouped_aggregate(parted, ["part"], [("mx", ts_col, "max")],
                              num_parts=4).to_pandas().sort_values("part")
    # exclusive running max of earlier partitions' ts maxima
    carry = {}
    run = None
    for p, mx in zip(ptots["part"].astype(np.int64), ptots["mx"]):
        carry[int(p)] = run
        run = mx if run is None or mx > run else run
    import ray

    carry_ref = ray.put(carry)

    delay_us = np.int64(int(delay / pd.Timedelta(microseconds=1)))
    NEG = np.iinfo(np.int64).min

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["part"]).assign(
                watermark=pd.Series(dtype="datetime64[us]"),
                is_late=pd.Series(dtype="bool"))
        # the carry protocol needs one part per partition — guaranteed by
        # construction (parts 0..num_parts-1, int keys exchange as
        # p % num_parts, a bijection); keep it loud, not assumed
        if df["part"].nunique() != 1:
            raise AssertionError("watermark_lateness: partition holds "
                                 "multiple arrival ranges — part/num_parts "
                                 "bijection broken")
        df = df.sort_values(arrival_col, kind="mergesort")
        tsv = (df[ts_col].astype("datetime64[us]").astype("int64")
               .to_numpy())
        # running max over STRICTLY EARLIER arrivals, seeded with the
        # carried maximum of all earlier partitions
        c = ray.get(carry_ref).get(int(df["part"].iloc[0]))
        # Timestamp.value is ALWAYS nanoseconds — divide to the us axis
        seed = NEG if c is None else int(pd.Timestamp(c).value) // 1000
        prev = np.concatenate([
            np.array([seed], dtype=np.int64),
            np.maximum.accumulate(np.maximum(tsv, seed))[:-1],
        ])
        has_wm = prev != NEG
        wm = np.where(has_wm, prev - delay_us, 0)
        late = has_wm & (tsv < wm)
        out = df.drop(columns=["part"]).assign(
            watermark=pd.Series(wm, index=df.index).astype("datetime64[us]")
            .mask(~has_wm),
            is_late=late)
        return out

    from gencore_ray.stages.shuffle import grouped_map

    return grouped_map(parted, "part", per_partition, num_parts=num_parts)
