"""Mergeable cardinality sketch: HyperLogLog (Flajolet et al. 2007).

The associative-accumulator shape of gencore's Stats counters
(/root/reference/src/stats.cpp:101-151) applied to distinct counting:
each batch collapses to a (2^p)-register uint8 array, registers merge
by elementwise max (associative + commutative — safe in any shuffle
order), and the estimate is read once at the end.  At 100 TB this is
the difference between an exact distinct (full exchange of every key)
and ONE slim fixed-size row per batch.
"""

from __future__ import annotations

import numpy as np

from gencore_ray.functions.hashing import U64, hash_str_array_u64


def hll_register_batch(values, p: int = 12, seed: int = 42) -> np.ndarray:
    """(2^p,) uint8 register array for one batch of values.

    Values are hashed to uint64; the top p bits pick the register, the
    rank = 1 + leading-zeros of the remaining 64-p bits (clamped).
    Vectorised: one hash pass + one np.maximum.at scatter.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    vals = [("" if v is None else str(v)) for v in values]
    if not vals:
        return regs
    h = hash_str_array_u64(vals, seed=seed).astype(U64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # guard low bits
    # rank = leading zeros of `rest` + 1 (<= 64 - p + 1)
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        with np.errstate(over="ignore"):
            cur[mask] = cur[mask] << np.uint64(shift)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with small-range (linear counting) and
    bias corrections."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)          # linear counting
    if est > (1 << 32) / 30.0:                # large-range correction
        return -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def approx_distinct(ds, col: str, p: int = 12, seed: int = 42) -> float:
    """Distributed approximate COUNT(DISTINCT col) over a Dataset: one
    fixed-size register row per batch, one tiny driver-side merge
    (standard error ~= 1.04 / sqrt(2^p) — ~1.6% at p=12)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_register_batch(t[col].to_pylist(), p=p, seed=seed)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:
        merged = hll_merge(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return hll_estimate(merged)


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (Misra & Gries 1982; merge rule from the
# mergeable-summaries formulation of Agarwal et al., PODS 2012)
# ---------------------------------------------------------------------------


def mg_compress(counts: dict, capacity: int) -> tuple[dict, int]:
    """Shrink ``counts`` to <= capacity keys; returns (counts, subtracted).

    Batch form of the MG decrement: subtract the (capacity+1)-th largest
    count from every counter and drop the non-positive ones.  The
    subtracted amount bounds the undercount this step introduces.
    """
    if len(counts) <= capacity:
        return counts, 0
    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # (capacity+1)-th largest == index len-capacity-1 of the ascending sort
    m = int(np.partition(vals, len(vals) - capacity - 1)[len(vals) - capacity - 1])
    out = {k: c - m for k, c in counts.items() if c > m}
    return out, m


def mg_batch_summary(keys, capacity: int) -> tuple[dict, int]:
    """One batch -> MG summary (counts dict, subtracted).

    ``keys`` is any iterable of hashables (None folded to "").
    """
    from collections import Counter

    counts = Counter("" if k is None else k for k in keys)
    return mg_compress(dict(counts), capacity)


def mg_merge(a: dict, b: dict, capacity: int) -> tuple[dict, int]:
    """Merge two summaries; error bounds add (still <= n/(capacity+1)
    in total because every subtraction removes >= capacity+1 count mass)."""
    out = dict(a)
    for k, c in b.items():
        out[k] = out.get(k, 0) + c
    return mg_compress(out, capacity)


def heavy_hitters(
    ds,
    col: str,
    capacity: int = 4096,
    k: int | None = None,
    tokenize_text: bool = False,
):
    """Distributed heavy hitters WITHOUT a key shuffle: each batch emits
    a <= capacity-row summary, the driver folds summaries through one
    bounded MG accumulator (O(capacity) state however large the input).

    est_count is a LOWER bound on the true count; ``max_err`` (the total
    subtracted mass, a single number for the whole run) bounds the
    undercount: true - est <= max_err <= n/(capacity+1).  Every key with
    true count > max_err is guaranteed present (no false negatives above
    the bound).  With capacity >= the distinct-key count the answer is
    exact and max_err == 0 — the regime the SQL oracle replays.

    ``tokenize_text=True`` treats ``col`` as text and counts tokens.
    Returns a pandas DataFrame (token, est_count) of the top-k by
    (est_count desc, token asc), plus the bound in ``df.attrs["max_err"]``.
    """
    import pandas as pd
    import pyarrow as pa

    from gencore_ray.functions.text import tokenize

    def partial(t: pa.Table) -> pa.Table:
        if tokenize_text:
            keys: list = []
            for txt in t[col].to_pylist():
                keys.extend(tokenize(txt or ""))
        else:
            keys = t[col].to_pylist()
        counts, sub = mg_batch_summary(keys, capacity)
        toks = list(counts.keys())
        return pa.table({
            "token": pa.array([str(x) for x in toks], pa.string()),
            "cnt": pa.array([counts[x] for x in toks], pa.int64()),
            "sub": pa.array([sub] + [0] * (len(toks) - 1) if toks else [], pa.int64()),
        })

    summaries = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    acc: dict = {}
    max_err = 0
    # the summary stream is bounded (<= capacity rows per input batch);
    # fold it through one MG accumulator — never the raw keys
    for t in summaries.iter_batches(batch_format="pyarrow", batch_size=None):
        batch_counts = dict(zip(t["token"].to_pylist(), t["cnt"].to_pylist()))
        max_err += int(pa.compute.sum(t["sub"]).as_py() or 0)
        acc, sub = mg_merge(acc, batch_counts, capacity)
        max_err += sub

    out = pd.DataFrame(
        {"token": list(acc.keys()), "est_count": list(acc.values())}
    ).sort_values(["est_count", "token"], ascending=[False, True],
                  kind="mergesort").reset_index(drop=True)
    if k is not None:
        out = out.head(k).reset_index(drop=True)
    out.attrs["max_err"] = max_err
    return out
