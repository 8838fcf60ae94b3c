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


def grouped_approx_distinct(
    ds, group_col: str, col: str, p: int = 12, seed: int = 42,
    num_parts: int = 32,
):
    """Per-group approximate COUNT(DISTINCT col): one 2^p-byte register
    row per (batch, group) partial, folded per group through ONE
    group-keyed exchange of registers — the VALUES never ride a
    shuffle.  This is the scale path where the exact per-group distinct
    (ops/relational.profile's value-hash exchange) would move one row
    per distinct value: register mass is #groups x 4 KB regardless of
    cardinality.  Returns a Dataset of (group, approx_distinct:double);
    standard error ~1.04/sqrt(2^p) (~1.6% at p=12).
    """
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gencore_ray.stages.shuffle import grouped_map

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"g": t[group_col].to_pylist(), "v": t[col].to_pylist()}
        )
        rows_g, rows_r = [], []
        for g, sub in df.groupby("g", sort=False):
            rows_g.append(g)
            rows_r.append(
                hll_register_batch(sub["v"].tolist(), p=p, seed=seed).tobytes()
            )
        return pa.table(
            {group_col: rows_g, "regs": pa.array(rows_r, pa.binary())}
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for g, sub in df.groupby(group_col, sort=False):
            merged = np.zeros(1 << p, dtype=np.uint8)
            for b in sub["regs"]:
                merged = hll_merge(merged, np.frombuffer(b, dtype=np.uint8))
            out_g.append(g)
            out_n.append(hll_estimate(merged))
        return pd.DataFrame({group_col: out_g, "approx_distinct": out_n})

    partials = ds.select_columns([group_col, col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(partials, group_col, fold, num_parts=num_parts)


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
        # a summary can compress to ZERO survivors (near-uniform batch
        # with distincts > capacity) — the subtracted mass must still
        # reach the driver, so emit a cnt=0 carrier row for it
        if not toks and sub:
            toks, cnts = [""], [0]
        else:
            cnts = [counts[x] for x in toks]
        subs = [sub] + [0] * (len(toks) - 1) if toks else []
        return pa.table({
            "token": pa.array([str(x) for x in toks], pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
            "sub": pa.array(subs, pa.int64()),
        })

    summaries = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    acc: dict = {}
    max_err = 0
    # the summary stream is bounded (<= capacity rows per input batch);
    # fold it through one MG accumulator — never the raw keys
    for t in summaries.iter_batches(batch_format="pyarrow", batch_size=None):
        batch_counts = {
            k: c for k, c in zip(t["token"].to_pylist(), t["cnt"].to_pylist())
            if c > 0          # skip sub-carrier rows
        }
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


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016 — simplified
# compactor-stack variant; rank error ~ O(1/k) with capacity parameter k)
# ---------------------------------------------------------------------------


class KLL:
    """Mergeable streaming quantile sketch.

    A stack of compactors: level L holds items of weight 2^L.  When a
    level overflows its capacity the level is sorted and every other
    item (random offset) is promoted to level L+1 — halving the count
    while preserving ranks to within the level's weight.  State is
    O(k log(n/k)) values regardless of stream size; two sketches merge
    by levelwise concatenation + recompaction, so the dataset op ships
    ONE small summary per batch instead of shuffling every value (the
    same associative-accumulator shape as the HLL / Misra-Gries ops
    above and the reference's Stats counters,
    /root/reference/src/stats.cpp:101-151).

    Deterministic: the even/odd promotion offset comes from a counted
    xorshift of (seed, compaction index), so equal inputs give equal
    sketches in any execution.
    """

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = seed
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._compactions = 0

    def _capacity(self, level: int) -> int:
        # geometrically shrinking capacities above the base level
        c = int(self.k * (2.0 / 3.0) ** (len(self.levels) - 1 - level))
        return max(8, c)

    def _coin(self) -> int:
        x = (self.seed * 0x9E3779B97F4A7C15 + self._compactions) & (2**64 - 1)
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & (2**64 - 1)
        x ^= x >> 33
        self._compactions += 1
        return x & 1

    def add_many(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return
        self.levels[0].extend(vals.tolist())
        self.n += len(vals)
        self._compress()

    def _compress(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_capacity():
            for lvl in range(len(self.levels)):
                if len(self.levels[lvl]) > self._capacity(lvl):
                    self._compact_level(lvl)
                    break
            else:
                break

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def _compact_level(self, lvl: int) -> None:
        items = sorted(self.levels[lvl])
        off = self._coin()
        promoted = items[off::2]
        self.levels[lvl] = []
        if lvl + 1 == len(self.levels):
            self.levels.append([])
        self.levels[lvl + 1].extend(promoted)

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for lvl, items in enumerate(other.levels):
            self.levels[lvl].extend(items)
        self.n += other.n
        self._compactions = max(self._compactions, other._compactions)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        """Value at rank q*n (lower interpolation on the weighted
        sample)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        if self.n == 0:
            return float("nan")
        vals: list[float] = []
        wts: list[int] = []
        for lvl, items in enumerate(self.levels):
            vals.extend(items)
            wts.extend([1 << lvl] * len(items))
        order = np.argsort(np.asarray(vals), kind="mergesort")
        v = np.asarray(vals)[order]
        w = np.asarray(wts, dtype=np.int64)[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[int(np.searchsorted(cum, target, side="left"))])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, self.seed, self.n, self._compactions, self.levels)
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        import pickle

        k, seed, n, comps, levels = pickle.loads(blob)
        out = cls(k=k, seed=seed)
        out.n, out._compactions, out.levels = n, comps, levels
        return out


def approx_quantiles(
    ds, col: str, qs: list[float], k: int = 200, seed: int = 42
) -> dict[float, float]:
    """Distributed approximate quantiles: one KLL summary per batch
    (O(k log n) bytes), a driver-side fold, no sort shuffle.  The
    approximate complement to ops/relational.grouped_quantiles —
    use it when an all-to-all sort of the value column is the
    bottleneck and ~1/k rank error is acceptable."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        sk = KLL(k=k, seed=seed)
        sk.add_many(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    acc = KLL(k=k, seed=seed)
    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in t["sk"].to_pylist():
            acc.merge(KLL.from_bytes(blob))
    return {q: acc.quantile(q) for q in qs}


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimates with a one-sided error bound — the complement of Misra-Gries
# (MG undercounts by at most n/(capacity+1); CM OVERcounts by at most
# eps*n with probability 1-delta, never undercounts).  Used where the
# per-key count table itself is too large to exchange: each block folds
# into a fixed (depth x width) uint64 grid, grids add elementwise.
# ---------------------------------------------------------------------------


def cm_params(eps: float = 1e-4, delta: float = 1e-3) -> tuple[int, int]:
    """(depth, width) for error <= eps*n with prob >= 1-delta:
    width = ceil(e/eps), depth = ceil(ln(1/delta))."""
    width = int(np.ceil(np.e / eps))
    depth = int(np.ceil(np.log(1.0 / delta)))
    return depth, width


def _cm_hash(keys: np.ndarray, row: int, seed: int, width: int) -> np.ndarray:
    from gencore_ray.functions.hashing import splitmix64

    salt = np.uint64((0x9E3779B97F4A7C15 * (row + 1) + seed) % (1 << 64))
    with np.errstate(over="ignore"):
        h = splitmix64(keys.astype(np.uint64) ^ salt)
    return (h % np.uint64(width)).astype(np.int64)


def cm_batch(keys: np.ndarray, depth: int, width: int,
             seed: int = 42) -> np.ndarray:
    """Fold a batch of uint64 keys into a fresh (depth, width) grid."""
    grid = np.zeros((depth, width), dtype=np.int64)
    for r in range(depth):
        idx = _cm_hash(keys, r, seed, width)
        np.add.at(grid[r], idx, 1)
    return grid


def cm_query(grid: np.ndarray, keys: np.ndarray, seed: int = 42) -> np.ndarray:
    """Point estimates: min over rows of the hashed cells (>= true)."""
    depth, width = grid.shape
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        est = np.minimum(est, grid[r][_cm_hash(keys, r, seed, width)])
    return est


def cm_count(ds, col: str, query_keys: np.ndarray,
             eps: float = 1e-4, delta: float = 1e-3,
             seed: int = 42) -> np.ndarray:
    """Distributed count-min over ``col`` (uint64-hashable values):
    one fixed-size grid per batch, elementwise-summed on the driver
    (grids are ~depth*width*8 bytes regardless of corpus size), then
    point-queried for ``query_keys``.  Never undercounts; overcounts
    by <= eps*n with probability 1-delta."""
    import pyarrow as pa

    from gencore_ray.functions.hashing import hash_str_array_u64

    depth, width = cm_params(eps, delta)

    def to_keys(vals) -> np.ndarray:
        arr = vals.to_numpy(zero_copy_only=False)
        if arr.dtype.kind in "iu":
            return arr.astype(np.uint64)
        return hash_str_array_u64([str(v) for v in arr])

    def partial(t: pa.Table) -> pa.Table:
        g = cm_batch(to_keys(t[col]), depth, width, seed)
        return pa.table({"g": pa.array([g.tobytes()], pa.binary())})

    grid = np.zeros((depth, width), dtype=np.int64)
    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in t["g"].to_pylist():
            grid += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    qk = query_keys.astype(np.uint64) if query_keys.dtype.kind in "iu" \
        else hash_str_array_u64([str(v) for v in query_keys])
    return cm_query(grid, qk, seed)
