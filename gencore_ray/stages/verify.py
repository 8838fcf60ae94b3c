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

Dataflow: pairs(ha,hb — uint64 doc hashes) are joined twice against
the slim signature projection (uhash, url, tshash, simhash,
shingle_count) — two int-keyed hash-partitioned joins — then a
stateless vectorised map_batches computes the three metrics.  The
shingle arrays (and the url strings) ride only this small pair table,
never the LSH explode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.functions.hashing import U64, popcount64


def _rename(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def attach_signatures(
    pairs: rd.Dataset, sig: rd.Dataset, cfg: DedupConfig
) -> rd.Dataset:
    """pairs(ha,hb) ⋈ sig on the uint64 doc hash, twice.

    Int-keyed hash-partitioned joins; the url strings re-enter the
    pipeline here from the signature side."""
    from gencore_ray.stages.shuffle import hash_join

    slim = sig.select_columns(["uhash", "url", "tshash", "simhash", "shingle_count"])
    import ray as _ray

    np_parts = cfg.join_num_partitions or int(
        _ray.cluster_resources().get("CPU", 8)
    )

    slim_a = _rename(slim, {"url": "url_a", "tshash": "tshash_a",
                            "simhash": "simhash_a", "shingle_count": "count_a"})
    # left_dedupe: multi-band duplicate pairs collapse here (global
    # distinct — duplicates share ha, hence the partition)
    j1 = hash_join(pairs, slim_a, "ha", "uhash", num_parts=np_parts,
                   left_dedupe=["ha", "hb"])
    slim_b = _rename(slim, {"url": "url_b", "tshash": "tshash_b",
                            "simhash": "simhash_b", "shingle_count": "count_b"})
    return hash_join(j1, slim_b, "hb", "uhash", num_parts=np_parts)


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
    keep = (
        (jac >= cfg.jaccard_threshold)
        | (cont >= cfg.containment_threshold)
        | ((hamming <= cfg.simhash_hamming_max) & (jac > 0))
    )
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


def verified_edges(pairs: rd.Dataset, sig: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    if pairs.schema() is None:  # no candidates at all (all-unique corpus)
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    withsig = attach_signatures(pairs.select_columns(["ha", "hb"]), sig, cfg)
    return withsig.map_batches(
        lambda t: _verify_batch(t, cfg), batch_format="pyarrow", zero_copy_batch=True
    )
