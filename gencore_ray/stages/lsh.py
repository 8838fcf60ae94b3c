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

The shuffle payload is deliberately slim: (bkey, url, sort64) — three
fixed-width columns; shingle arrays never ride the explode (they are
joined back only for the much smaller verified-candidate set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.functions.hashing import U64, _MASK, splitmix64

_SIMHASH_CHUNK_TAG = np.uint64(0x51AB5A1DE5C0FFEE)


def explode_keys(batch: pa.Table, include_simhash_keys: bool = True) -> pa.Table:
    """(url, band_key, ckeys, simhash) -> (bkey, url, sort64) rows.

    Emits one row per (doc, bucket key):
      * all LSH band keys           (band_key fixed list — already mixed)
      * all containment sketch keys (ckeys list)
      * 4x 16-bit SimHash chunk keys (docs within Hamming<=3 of each
        other share at least one chunk — pigeonhole over 4 chunks)
    """
    n = batch.num_rows
    urls = batch["url"]
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
        for c in range(4):
            chunk = (sim >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):
                k = splitmix64((chunk * np.uint64(0x9E3779B97F4A7C15) + np.uint64(c)) ^ _SIMHASH_CHUNK_TAG)
            keys.append(k[act_idx])
            url_idx.append(act_idx)

    all_keys = np.concatenate(keys).astype(U64)
    all_idx = np.concatenate(url_idx)
    return pa.table(
        {
            "bkey": pa.array(all_keys),
            "url": urls.take(pa.array(all_idx)),
            "sort64": pa.array(sim[all_idx]),
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
        {"url_a": pd.Series(dtype=object), "url_b": pd.Series(dtype=object),
         "capped": pd.Series(dtype=np.int64)}
    )
    if len(df) < 2:
        return empty
    # drop duplicate (bkey, url) membership (one url can reach a bucket
    # through several key sources)
    df = df.drop_duplicates(subset=["bkey", "url"])
    bkey = df["bkey"].to_numpy().astype(np.uint64)
    urls = df["url"].to_numpy()
    sort64 = df["sort64"].to_numpy().astype(np.uint64)

    order = np.lexsort((urls, sort64, bkey))
    bkey, urls, sort64 = bkey[order], urls[order], sort64[order]
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

    # --- large buckets: neighbor-linking in sorted (sort64, url) order
    for bi in np.flatnonzero(~small):
        st, s = int(starts[bi]), int(sizes[bi])
        idx = np.arange(st, st + s)
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
    a, b = urls[ia], urls[ib]
    swap = a > b
    out = pd.DataFrame(
        {"url_a": np.where(swap, b, a), "url_b": np.where(swap, a, b)}
    ).drop_duplicates()
    out["capped"] = np.int64(capped_total)
    return out


def candidate_pairs(sig: rd.Dataset, cfg: DedupConfig, num_parts: int = 64) -> rd.Dataset:
    """signatures -> deduplicated candidate-pair table (url_a < url_b).

    Two slim exchanges: (1) exploded keys partitioned by bkey for
    pairing, (2) pairs partitioned by url_a for global dedupe.
    """
    from gencore_ray.stages.shuffle import dedupe_rows, grouped_map

    exploded = sig.map_batches(
        explode_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = grouped_map(
        exploded, "bkey", lambda df: _pairs_in_partition(df, cfg), num_parts=num_parts
    )
    return dedupe_rows(pairs, ["url_a", "url_b"], num_parts=num_parts)
