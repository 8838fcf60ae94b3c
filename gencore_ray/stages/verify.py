"""Candidate-pair verification (SURVEY §2.2 M9 analogue).

gencore verifies fuzzy membership with an exact Hamming check against
the locally-dominant UMI (/root/reference/src/cluster.cpp:41-53) and
an exact overlap score (/root/reference/src/pair.cpp:88-172).  Our
verification is exact too — no estimate survives into an edge:

  * exact Jaccard of the two shingle-hash sets (sorted-array intersect)
  * exact containment |A∩B| / min(|A|,|B|)   (isPartOf analogue)
  * exact SimHash Hamming distance

A pair becomes a verified edge iff
    jaccard >= tau  OR  containment >= c  OR  hamming <= k.

Dataflow: pairs(ha,hb — uint64 doc hashes) need the slim signature
projection (uhash, url, tshash, simhash, shingle_count) attached on
BOTH sides.  The signature table is hash-partitioned by uhash exactly
ONCE and those partitions are reused for both attaches — the A-side
attach, the re-exchange of the (much smaller) pair rows by hb, and the
fused B-side attach + metric computation all run as a single raw-Ray
task graph with no driver synchronisation between rounds.  The shingle
arrays (and the url strings) ride only the pair rows, never the LSH
explode, and the big signature payload crosses the wire once, not
twice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.functions.hashing import U64, popcount64


# Bloom filter for the candidate-doc prefilter: 2^24 bits (2 MB), two
# probes per key.  FP rate at n candidate docs: (1-e^(-2n/2^24))^2 —
# ~1.3% at 1M, still <20% at 8M; false positives only add rows to the
# slim exchange, never wrong results.  For corpora far beyond that,
# raise _BLOOM_BITS_LOG2 (cost is linear in the bitmap).
_BLOOM_BITS_LOG2 = 24
_BLOOM_WORDS = (1 << _BLOOM_BITS_LOG2) // 64
_BLOOM_MASK = np.uint64((1 << _BLOOM_BITS_LOG2) - 1)


def _bloom_probes(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from gencore_ray.functions.hashing import splitmix64

    i1 = h & _BLOOM_MASK
    i2 = splitmix64(h) & _BLOOM_MASK
    return i1, i2


def _bloom_add(h: np.ndarray) -> np.ndarray:
    bits = np.zeros(_BLOOM_WORDS, dtype=U64)
    for idx in _bloom_probes(h.astype(U64)):
        np.bitwise_or.at(
            bits, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    return bits


def _bloom_test(bits: np.ndarray, h: np.ndarray) -> np.ndarray:
    out = np.ones(len(h), dtype=bool)
    for idx in _bloom_probes(h.astype(U64)):
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return out


_SLIM_COLS = ["uhash", "url", "tshash", "simhash", "shingle_count"]
_RENAME_A = {"url": "url_a", "tshash": "tshash_a",
             "simhash": "simhash_a", "shingle_count": "count_a"}
_RENAME_B = {"url": "url_b", "tshash": "tshash_b",
             "simhash": "simhash_b", "shingle_count": "count_b"}


def _join_part(left: pa.Table, right: pa.Table, lkey: str, rkey: str,
               rename: dict[str, str]) -> pa.Table:
    """Inner-join two co-partitioned Arrow tables on an int key; right
    payload columns are renamed, the right key is dropped.  Vectorised
    (factorised codes + Arrow take); payloads stay in Arrow buffers."""
    rcols = [(c, rename.get(c, c)) for c in right.column_names if c != rkey]
    if left.num_rows == 0 or right.num_rows == 0:
        out = pa.schema(
            list(left.schema)
            + [pa.field(rn, right.schema.field(c).type) for c, rn in rcols]
        )
        return out.empty_table()
    lk = left[lkey].to_numpy(zero_copy_only=False)
    rk = right[rkey].to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(np.concatenate([lk, rk]))
    ldf = pd.DataFrame({"c": codes[: len(lk)], "li": np.arange(len(lk))})
    rdf = pd.DataFrame({"c": codes[len(lk):], "ri": np.arange(len(rk))})
    m = ldf.merge(rdf, on="c", how="inner")
    out = left.take(pa.array(m["li"].to_numpy()))
    rtaken = right.take(pa.array(m["ri"].to_numpy()))
    for c, rn in rcols:
        out = out.append_column(rn, rtaken[c])
    return out


@ray.remote
def _attach_a(pairs_t: pa.Table, slim_t: pa.Table) -> pa.Table:
    """Partition-local (ha,hb) distinct (rows sharing ha colocate here,
    so this is a GLOBAL distinct) + A-side signature attach."""
    if pairs_t.num_rows:
        ha = pairs_t["ha"].to_numpy(zero_copy_only=False)
        hb = pairs_t["hb"].to_numpy(zero_copy_only=False)
        po = np.lexsort((hb, ha))
        first = np.r_[True, (ha[po][1:] != ha[po][:-1]) | (hb[po][1:] != hb[po][:-1])]
        pairs_t = pairs_t.take(pa.array(np.sort(po[first])))
    return _join_part(pairs_t, slim_t, "ha", "uhash", _RENAME_A)


@ray.remote(num_returns=2)
def _attach_b_verify(j1_t: pa.Table, slim_t: pa.Table, cfg: DedupConfig,
                     use_internal: bool):
    """Fused B-side attach + exact metric verification; emits the final
    edge block plus its Dataset metadata (no extra metadata round when
    the internal fast-assembly API is available — see
    stages/shuffle.py::_block_meta for the public-API fallback)."""
    from gencore_ray.stages.shuffle import _block_meta

    joined = _join_part(j1_t, slim_t, "hb", "uhash", _RENAME_B)
    out = _verify_batch(joined, cfg)
    return out, _block_meta(out, use_internal)


def _verify_batch(t: pa.Table, cfg: DedupConfig) -> pa.Table:
    n = t.num_rows
    if n == 0:
        return pa.table(
            {"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string()),
             "jaccard": pa.array([], pa.float64()), "containment": pa.array([], pa.float64()),
             "hamming": pa.array([], pa.int64()), "src": pa.array([], pa.string())}
        )
    a_bufs = t["tshash_a"].to_pylist()
    b_bufs = t["tshash_b"].to_pylist()
    a_sets = [np.frombuffer(b or b"", dtype="<u8") for b in a_bufs]
    b_sets = [np.frombuffer(b or b"", dtype="<u8") for b in b_bufs]
    sim_a = t["simhash_a"].to_numpy(zero_copy_only=False).astype(U64)
    sim_b = t["simhash_b"].to_numpy(zero_copy_only=False).astype(U64)
    hamming = popcount64(sim_a ^ sim_b)

    jac = np.empty(n, dtype=np.float64)
    cont = np.empty(n, dtype=np.float64)
    for i in range(n):
        A, B = a_sets[i], b_sets[i]
        if len(A) == 0 or len(B) == 0:
            jac[i] = cont[i] = 0.0
            continue
        inter = len(np.intersect1d(A, B, assume_unique=True))
        jac[i] = inter / (len(A) + len(B) - inter)
        cont[i] = inter / min(len(A), len(B))

    # a SimHash edge additionally requires shared-shingle evidence
    # (jac > 0 ⟺ ≥1 common shingle): matching the brute-force oracle's
    # candidate definition (gencore_ray/oracle.py — pairs sharing zero
    # shingles are never dup candidates), and killing the degenerate
    # short-doc false positives where sparse fingerprints land within
    # Hamming<=3 of unrelated docs
    keep = (jac >= cfg.jaccard_threshold) | (cont >= cfg.containment_threshold)
    if cfg.simhash_enabled:
        keep |= (hamming <= cfg.simhash_hamming_max) & (jac > 0)
    # bypass guard: rows below min_shingles never form edges
    counts_a = t["count_a"].to_numpy(zero_copy_only=False)
    counts_b = t["count_b"].to_numpy(zero_copy_only=False)
    keep &= (counts_a >= cfg.min_shingles) & (counts_b >= cfg.min_shingles)

    idx = np.nonzero(keep)[0]
    out = t.select(["url_a", "url_b"]).take(pa.array(idx))
    return (
        out.append_column("jaccard", pa.array(jac[idx]))
        .append_column("containment", pa.array(cont[idx]))
        .append_column("hamming", pa.array(hamming[idx]))
        .append_column("src", pa.array(["lsh"] * len(idx), pa.string()))
    )


EDGE_SCHEMA = pa.schema(
    [("url_a", pa.string()), ("url_b", pa.string()), ("jaccard", pa.float64()),
     ("containment", pa.float64()), ("hamming", pa.int64()), ("src", pa.string())]
)


def verified_edges(pairs: rd.Dataset, sig: rd.Dataset, cfg: DedupConfig,
                   est_bytes: float | None = None,
                   chunks: int | None = None) -> rd.Dataset:
    """One task graph: exchange(sig by uhash) ∥ exchange(pairs by ha) →
    attach A → exchange(pair rows by hb) → fused attach B + verify.

    The signature partitions are computed once and consumed by BOTH
    attach rounds; only the slim pair rows are re-exchanged."""
    from gencore_ray.stages.shuffle import (
        _dataset_from_reduced,
        _exchange_map,
        _exchange_reduce,
        _use_internal,
        exchange_refs,
        to_arrow_blocks,
    )

    if pairs.schema() is None:  # no candidates at all (all-unique corpus)
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    # partition count must scale with the attached-pair-row mass, not
    # only with CPUs: every pair row carries the A-side payload
    # (tshash ~2 KB/doc dominates) through the hb re-exchange, and one
    # partition's table must stay far below Arrow's 2 GB IPC ceiling
    # (measured SIGSEGV at 4M pages / 8 cpus with P=cpu).  Row counts
    # and sizes are metadata here — both inputs arrive materialized.
    from ray.data.dataset import MaterializedDataset

    from gencore_ray.stages.shuffle import scaled_num_parts

    cpu_p = int(ray.cluster_resources().get("CPU", 8))
    if est_bytes is None:
        if isinstance(pairs, MaterializedDataset) and \
                isinstance(sig, MaterializedDataset):
            sig_rows = max(1, sig.count())
            payload_b = (sig.size_bytes() or 0) / sig_rows
            est_bytes = pairs.count() * (16 + payload_b)
        else:
            # unmaterialized inputs (operator used standalone): counting
            # would re-execute lineage; fall back to the cpu floor.
            # Checkpointed (disk-backed) callers pass est_bytes instead
            # (pipelines/dedup.py) — parquet metadata makes it cheap.
            est_bytes = 0
    P = cfg.join_num_partitions or scaled_num_parts(cpu_p, est_bytes)

    # candidate-doc prefilter: the slim projection carries tshash
    # (~2 KB/doc — by far the heaviest column in the pipeline), but only
    # docs appearing in >=1 candidate pair are ever joined.  A Bloom
    # filter of the pair doc-hashes (fixed 2 MB bitmap per pair block,
    # OR-reduced on the driver — NOT a driver-side distinct, which would
    # be O(pair rows)) is broadcast once; the exchange then moves tshash
    # essentially only for candidate docs (false positives ~1% at 1M
    # candidates just ride along harmlessly — the joins match real pairs
    # only).  At a 35% dup rate this cuts the heaviest exchange ~3x.
    use_bloom = cfg.bloom_prefilter == "on" or (
        cfg.bloom_prefilter == "auto"
        and sum(1 for nd in ray.nodes() if nd.get("Alive")) > 1
    )
    slim = sig.select_columns(_SLIM_COLS)
    if use_bloom:
        def _pair_bloom(t: pa.Table) -> pa.Table:
            both = np.concatenate([
                t["ha"].to_numpy(zero_copy_only=False),
                t["hb"].to_numpy(zero_copy_only=False),
            ]).astype(U64)
            return pa.table({"bloom": pa.array([_bloom_add(both).tobytes()], pa.binary())})

        blooms = pairs.select_columns(["ha", "hb"]).map_batches(
            _pair_bloom, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()["bloom"]
        bloom = np.zeros(_BLOOM_WORDS, dtype=U64)
        for b in blooms:
            bloom |= np.frombuffer(b, dtype=U64)
        bloom_ref = ray.put(bloom)

        def _filter_slim(t: pa.Table) -> pa.Table:
            bl = ray.get(bloom_ref)
            uh = t["uhash"].to_numpy(zero_copy_only=False).astype(U64)
            return t.take(pa.array(np.flatnonzero(_bloom_test(bl, uh))))

        slim = slim.map_batches(
            _filter_slim, batch_format="pyarrow", zero_copy_batch=True
        )
    slim_blocks, _ = exchange_refs(to_arrow_blocks(slim), "uhash", P)
    if slim_blocks is None:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())

    # --- pair-chunking: bound the stage's IN-FLIGHT attached-pair mass.
    # The raw task graph below has no backpressure — all P partitions'
    # attach-A output, its re-exchange, and attach-B intermediates
    # co-reside — so its liveset is ~3x the attached-pair bytes.  On one
    # node that must fit store+spill disk (measured: a 4M-page corpus'
    # 36M candidate rows x ~2 KB payload = ~70 GB attach mass wedged the
    # sandbox); on a cluster it is the per-node footprint.  Pairs are
    # split into K hash-chunks on the (ha, hb) PAIR key (all copies of a
    # pair land in one chunk, so the in-partition dedupe still sees
    # them together); the slim signature partitions are exchanged ONCE
    # and reused by every chunk; each chunk's graph runs to a barrier
    # before the next submits.  K == 1 (the common case) is exactly the
    # old single-shot path.
    if chunks is not None:
        K = max(1, int(chunks))
    else:
        store_b = float(
            ray.cluster_resources().get("object_store_memory", 0) or (8 << 30))
        # est_bytes OVERestimates the live attach mass ~2x (it counts
        # pre-dedupe pair rows; measured: 1M pages, est 22 GB, ran
        # spill-free in a 37.6 GB store unchunked), and the liveset is
        # ~3x the post-dedupe mass — net ~1.5x est.  Chunk above
        # 0.6x store (just past the measured-safe point), sized to
        # half the store; below it the per-chunk barrier (~1 s at 1M)
        # is pure loss.
        if est_bytes and est_bytes > 0.6 * store_b:
            K = max(1, min(256, int(np.ceil(est_bytes / (0.5 * store_b)))))
        else:
            K = 1

    slim_schema = slim.schema().base_schema
    j1_schema = pa.schema(
        [("ha", pa.uint64()), ("hb", pa.uint64())]
        + [pa.field(_RENAME_A.get(f.name, f.name), f.type)
           for f in slim_schema if f.name != "uhash"]
    )
    use_internal = _use_internal()
    pairs_sel = to_arrow_blocks(pairs.select_columns(["ha", "hb"]))
    if K > 1:
        pairs_sel = pairs_sel.materialize()

    def _chunk_filter(k: int):
        from gencore_ray.stages.shuffle import pair_mix

        def f(t: pa.Table) -> pa.Table:
            c = pair_mix(t["ha"].to_numpy(zero_copy_only=False),
                         t["hb"].to_numpy(zero_copy_only=False)) \
                .astype(np.uint64) % np.uint64(K)
            return t.take(pa.array(np.flatnonzero(c == np.uint64(k))))
        return f

    all_blocks: list = []
    all_metas: list = []
    for k in range(K):
        pk = pairs_sel if K == 1 else pairs_sel.map_batches(
            _chunk_filter(k), batch_format="pyarrow", zero_copy_batch=True)
        pair_blocks, _ = exchange_refs(pk, "ha", P)
        if pair_blocks is None:
            continue
        j1 = [_attach_a.remote(pair_blocks[p], slim_blocks[p])
              for p in range(P)]
        maps = [
            _exchange_map.options(num_returns=P).remote(j1[p], "hb", P)
            for p in range(P)
        ]
        if P == 1:
            maps = [[r] for r in maps]
        j1b = [
            _exchange_reduce.remote(
                j1_schema, use_internal, *[maps[q][p] for q in range(P)])
            for p in range(P)
        ]
        outs = [
            _attach_b_verify.remote(j1b[p][0], slim_blocks[p], cfg, use_internal)
            for p in range(P)
        ]
        if K > 1:
            ray.get([o[1] for o in outs])   # barrier: one chunk in flight
        all_blocks.extend(o[0] for o in outs)
        all_metas.extend(o[1] for o in outs)
    if not all_blocks:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    return _dataset_from_reduced(all_blocks, all_metas)
