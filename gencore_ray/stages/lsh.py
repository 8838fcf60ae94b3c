"""LSH candidate generation: band explode -> bucket shuffle -> capped pairing.

This is the heart of the engine — the analogue of gencore's position
clustering (nested-map insert by fragment key,
/root/reference/src/gencore.cpp:295-316) re-expressed as ONE hash
shuffle: every doc emits its bucket keys (MinHash band keys, SimHash
chunk keys, containment-sketch keys — all pre-mixed into disjoint
uint64 key spaces by the signature stage), then ``groupby(bkey)``
materialises each bucket and a ``map_groups`` emits candidate pairs.

Skew handling (gencore's low-complexity-cluster skip analogue,
/root/reference/src/group.cpp:142-175):
  * bucket <= bucket_pair_cap           -> all O(n^2) pairs
  * bucket <= bucket_hard_cap           -> sort members by (simhash, url)
       and link each to its next `bucket_neighbor_links` neighbors —
       O(n*w) pairs that preserve connectivity (near-identical docs
       sort adjacently, and connected components stitches chains)
  * bucket >  bucket_hard_cap           -> deterministic subsample to
       hard_cap before neighbor-linking; the drop is COUNTED (capped
       column) — no silent truncation.

The shuffle payload is deliberately slim: (bkey u64, uh u64,
sort32 u32) — 20 bytes/row; neither url strings nor shingle arrays
ride the explode (both are joined back only for the much smaller
verified-candidate set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.functions.hashing import U64, _MASK, splitmix64

_SIMHASH_CHUNK_TAG = np.uint64(0x51AB5A1DE5C0FFEE)

# SimHash blocking (Manku/Jain/Sarma, WWW'07 "Detecting Near-Duplicates
# for Web Crawling"): split the 64-bit fingerprint into B=5 blocks; any
# two fingerprints within Hamming distance <= 3 have their <=3 differing
# bits confined to <=3 blocks, so at least one combination of B-3=2
# blocks is identical — index each of the C(5,2)=10 combinations as a
# bucket key (~25.6 matched bits each). Same exact collision guarantee
# as the previous B=6/C(6,3)=20 layout at HALF the exploded key mass;
# the narrower keys admit ~n^2/2^25.6 random collisions per combo
# (~10^5 spurious candidate pairs at 1M docs — noise next to the
# verified-edge volume, and every candidate is exact-verified anyway).
_SIMHASH_BLOCKS = 5
_BLOCK_BOUNDS = np.linspace(0, 64, _SIMHASH_BLOCKS + 1).astype(np.uint64)


def simhash_combo_count(hamming_max: int = 3) -> int:
    """Number of block-combination keys emitted per doc (C(B, B-k))."""
    from math import comb

    return comb(_SIMHASH_BLOCKS, _SIMHASH_BLOCKS - hamming_max)


def _simhash_combo_keys(sim: np.ndarray, hamming_max: int) -> list[np.ndarray]:
    """One uint64 key array per block-combination (len C(B, B-hamming_max))."""
    from itertools import combinations

    blocks = []
    for i in range(_SIMHASH_BLOCKS):
        lo, hi = int(_BLOCK_BOUNDS[i]), int(_BLOCK_BOUNDS[i + 1])
        width = hi - lo
        mask = np.uint64((1 << width) - 1)
        blocks.append((sim >> np.uint64(lo)) & mask)
    keep = _SIMHASH_BLOCKS - hamming_max
    keys = []
    with np.errstate(over="ignore"):
        for ci, combo in enumerate(combinations(range(_SIMHASH_BLOCKS), keep)):
            acc = np.full(len(sim), np.uint64(ci + 1), dtype=U64)
            for b in combo:
                acc = (acc * np.uint64(0x100000001B3) + blocks[b]) & _MASK
            keys.append(splitmix64(acc ^ _SIMHASH_CHUNK_TAG))
    return keys


def explode_keys(batch: pa.Table, include_simhash_keys: bool = True) -> pa.Table:
    """(uhash, band_key, ckeys, simhash) -> (bkey, uh, sort32) rows.

    Emits one row per (doc, bucket key):
      * all LSH band keys           (band_key fixed list — already mixed)
      * all containment sketch keys (ckeys list)
      * C(5,2) SimHash block-combination keys (guaranteed collision for
        fingerprints within Hamming<=3 — Manku et al., see above)

    Rows are (u64 key, u64 doc hash, u32 sort prefix) = 20 bytes — url
    strings never ride the explode; pairs are resolved back to urls by
    the verify joins.  The sort prefix is the top 32 simhash bits: it is
    only used to order members INSIDE oversize buckets so near-identical
    docs land adjacent before neighbor-linking, and 32 bits of prefix
    preserve that adjacency while shaving 17% off the exchange bytes.
    """
    n = batch.num_rows
    uh = batch["uhash"].to_numpy(zero_copy_only=False).astype(U64)
    sim = batch["simhash"].to_numpy(zero_copy_only=False).astype(U64)

    keys: list[np.ndarray] = []
    url_idx: list[np.ndarray] = []

    band = batch["band_key"].combine_chunks() if isinstance(batch["band_key"], pa.ChunkedArray) else batch["band_key"]
    bw = band.type.list_size
    band_flat = band.flatten().to_numpy(zero_copy_only=False).reshape(n, bw)
    # rows with all-zero band keys are bypass rows (min_shingles guard)
    active = ~(band_flat == 0).all(axis=1)
    act_idx = np.nonzero(active)[0]
    keys.append(band_flat[active].ravel())
    url_idx.append(np.repeat(act_idx, bw))

    ck = batch["ckeys"].combine_chunks() if isinstance(batch["ckeys"], pa.ChunkedArray) else batch["ckeys"]
    coffs = np.asarray(ck.offsets)
    cvals = ck.values.to_numpy(zero_copy_only=False)
    clens = np.diff(coffs)
    keys.append(cvals)
    url_idx.append(np.repeat(np.arange(n), clens))

    if include_simhash_keys:
        for k in _simhash_combo_keys(sim, hamming_max=3):
            keys.append(k[act_idx])
            url_idx.append(act_idx)

    all_keys = np.concatenate(keys).astype(U64)
    all_idx = np.concatenate(url_idx)
    sort32 = (sim >> np.uint64(32)).astype(np.uint32)
    return pa.table(
        {
            "bkey": pa.array(all_keys),
            "uh": pa.array(uh[all_idx]),
            "sort32": pa.array(sort32[all_idx]),
        }
    )


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    got = _TRIU_CACHE.get(n)
    if got is None:
        got = _TRIU_CACHE[n] = np.triu_indices(n, k=1)
    return got


def _pairs_in_partition(df: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """Vectorised pairing over ALL complete buckets of one partition.

    Per-bucket caps per module docstring; buckets of equal (small) size
    are paired in one numpy shot via cached triangular index templates.
    """
    empty = pd.DataFrame(
        {"ha": pd.Series(dtype=np.uint64), "hb": pd.Series(dtype=np.uint64),
         "pair_hash": pd.Series(dtype=np.uint64),
         "capped": pd.Series(dtype=np.int64)}
    )
    if len(df) < 2:
        return empty
    bkey = df["bkey"].to_numpy().astype(np.uint64)
    uhash = df["uh"].to_numpy().astype(np.uint64)
    sort32 = df["sort32"].to_numpy().astype(np.uint32)
    # optional new/old flag (incremental dedup): pairs where BOTH sides
    # are old are skipped — prior connectivity is already in the state
    nw = df["nw"].to_numpy().astype(bool) if "nw" in df.columns else None

    # pure uint64 path: docs are their uhash here; urls rejoin later.
    # TWO-key lexsort only — (bkey, uhash) gives bucket runs plus the
    # duplicate-membership adjacency; the sort32 (simhash prefix) order
    # is only needed INSIDE the rare oversize buckets and is applied
    # there locally (one argsort pass fewer over the whole partition —
    # this stage is memory-bandwidth-bound at full concurrency).
    order = np.lexsort((uhash, bkey))
    bkey, sort32, uhash = bkey[order], sort32[order], uhash[order]
    if nw is not None:
        nw = nw[order]
    # drop duplicate (bkey, doc) membership (one doc can reach a bucket
    # through several key sources): consecutive after the sort
    dup = np.r_[False, (bkey[1:] == bkey[:-1]) & (uhash[1:] == uhash[:-1])]
    if dup.any():
        keepm = ~dup
        bkey, sort32, uhash = bkey[keepm], sort32[keepm], uhash[keepm]
        if nw is not None:
            nw = nw[keepm]
    # bucket boundaries
    starts = np.flatnonzero(np.r_[True, bkey[1:] != bkey[:-1]])
    sizes = np.diff(np.r_[starts, len(bkey)])

    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    capped_total = 0

    # --- small buckets, grouped by size: one numpy shot per size class
    small = sizes <= cfg.bucket_pair_cap
    for s in np.unique(sizes[small & (sizes >= 2)]):
        offs = starts[small & (sizes == s)]
        ia_t, ib_t = _triu(int(s))
        ia_parts.append((offs[:, None] + ia_t[None, :]).ravel())
        ib_parts.append((offs[:, None] + ib_t[None, :]).ravel())

    # --- large buckets: neighbor-linking in sorted (sort32, uhash) order
    for bi in np.flatnonzero(~small):
        st, s = int(starts[bi]), int(sizes[bi])
        idx = np.arange(st, st + s)
        # local simhash-prefix-primary order: near-identical docs adjacent
        idx = idx[np.lexsort((uhash[idx], sort32[idx]))]
        if s > cfg.bucket_hard_cap:
            capped_total += s - cfg.bucket_hard_cap
            sel = np.argsort(splitmix64(np.arange(s, dtype=np.uint64)))[: cfg.bucket_hard_cap]
            idx = idx[np.sort(sel)]
            s = len(idx)
        w = min(cfg.bucket_neighbor_links, s - 1)
        ia_parts.append(np.concatenate([idx[: s - d] for d in range(1, w + 1)]))
        ib_parts.append(np.concatenate([idx[d:] for d in range(1, w + 1)]))

    if not ia_parts:
        return empty
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    if nw is not None:
        want = nw[ia] | nw[ib]           # >=1 new member, else already known
        ia, ib = ia[want], ib[want]
        if not len(ia):
            return empty
    a, b = uhash[ia], uhash[ib]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    with np.errstate(over="ignore"):
        ph = splitmix64((a2 * np.uint64(0x100000001B3)) ^ b2)
    # within-partition dedupe on the (ha, hb) TUPLE (vectorised lexsort):
    # pair_hash stays a partition key only — a 64-bit collision between
    # two distinct pairs must not drop a real candidate
    po = np.lexsort((b2, a2))
    first = np.r_[True, (a2[po][1:] != a2[po][:-1]) | (b2[po][1:] != b2[po][:-1])]
    uniq_idx = np.sort(po[first])
    out = pd.DataFrame(
        {"ha": a2[uniq_idx], "hb": b2[uniq_idx], "pair_hash": ph[uniq_idx],
         "capped": np.zeros(len(uniq_idx), dtype=np.int64)}
    )
    if capped_total:
        # sentinel row carries the cap count (no silent drops): its
        # pair_hash is unique per partition so pair-dedupe keeps it, and
        # ha=hb=0 matches nothing in the verify joins
        sentinel = pd.DataFrame(
            {"ha": [np.uint64(0)], "hb": [np.uint64(0)],
             "pair_hash": [np.uint64(splitmix64(np.uint64(int(bkey[0]) ^ capped_total)))],
             "capped": [np.int64(capped_total)]}
        )
        out = pd.concat([out, sentinel], ignore_index=True)
    return out


def candidate_pairs(
    sig: rd.Dataset, cfg: DedupConfig, num_parts: int | None = None,
    dedupe: bool = True,
) -> rd.Dataset:
    """signatures -> candidate-pair table (url_a < url_b).

    One slim exchange: exploded keys partitioned by bkey for pairing.
    A pair found in k buckets appears k times; with ``dedupe=True`` a
    second exchange keyed on the uint64 pair_hash makes pairs unique.
    The flagship pipeline passes ``dedupe=False`` and instead dedupes
    for free inside the verify join partition (rows sharing url_a
    colocate there — see hash_join(left_dedupe=...)).
    """
    from gencore_ray.stages.shuffle import grouped_map

    if num_parts is None:
        import ray as _ray

        from ray.data.dataset import MaterializedDataset

        from gencore_ray.stages.shuffle import scaled_num_parts

        cpu_p = int(_ray.cluster_resources().get("CPU", 8))
        # explode mass ~= rows x keys/doc x 20 B; one partition's table
        # must stay well under Arrow's 2 GB IPC ceiling (see
        # scaled_num_parts) and its pandas pairing frame in heap
        keys_per_doc = cfg.bands
        if cfg.containment_enabled:
            keys_per_doc += cfg.containment_perms * cfg.containment_bottom_m
        if cfg.simhash_enabled:
            keys_per_doc += simhash_combo_count(cfg.simhash_hamming_max)
        est = (sig.count() * keys_per_doc * 20
               if isinstance(sig, MaterializedDataset) else 0)
        num_parts = cfg.pair_num_partitions or scaled_num_parts(cpu_p, est)
    sim_on = cfg.simhash_enabled
    exploded = sig.map_batches(
        lambda t: explode_keys(t, include_simhash_keys=sim_on),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = grouped_map(
        exploded, "bkey", lambda df: _pairs_in_partition(df, cfg), num_parts=num_parts
    )
    if not dedupe:
        return pairs

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        # dedupe on the (ha, hb) tuple (pair_hash is only the partition
        # key); capped sentinel rows (ha=hb=0, counter payload) pass
        # through undeduped so cap counts are never collapsed
        sent = df["capped"] > 0
        return pd.concat(
            [df[~sent].drop_duplicates(subset=["ha", "hb"]), df[sent]],
            ignore_index=True,
        )

    return grouped_map(pairs, "pair_hash", _dedupe, num_parts=num_parts)
