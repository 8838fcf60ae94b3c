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
