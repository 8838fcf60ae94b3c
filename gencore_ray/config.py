"""Pipeline configuration.

The reference exposes its knobs as CLI flags parsed into an Options
struct (/root/reference/src/options.h:15-61, defaults
/root/reference/src/options.cpp:11-40).  Ours is a frozen dataclass
threaded through every stage; all hashing is keyed off ``seed`` so two
processes produce bit-identical signatures (the reference gets the
same property from deterministic std::map iteration,
/root/reference/src/gencore.cpp:325-385).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class DedupConfig:
    # --- signatures -------------------------------------------------
    shingle_k: int = 5            # word n-gram width (gencore: fragment key width analogue)
    num_perm: int = 128           # MinHash permutations
    bands: int = 32               # LSH bands; bands*rows must equal num_perm
    rows_per_band: int = 4
    simhash_bits: int = 64
    seed: int = 42

    # --- thresholds -------------------------------------------------
    jaccard_threshold: float = 0.7    # ~ gencore umi_diff_threshold (src/main.cpp:45)
    simhash_hamming_max: int = 3      # duplex-merge analogue (src/cluster.cpp:119-168)
    simhash_enabled: bool = True      # False: no SimHash bucket keys and no
                                      # Hamming edges (jaccard/containment only —
                                      # the fully SQL-expressible configuration)
    containment_threshold: float = 0.9  # substring-dup pass (isPartOf analogue,
                                        # src/bamutil.cpp:204-255)
    min_shingles: int = 1         # rows below this bypass dedup entirely
                                  # (~ unmapped bypass, src/gencore.cpp:254-266)

    # --- skew / scale guards ---------------------------------------
    bucket_pair_cap: int = 64     # full O(n^2) pairing only for buckets <= this
                                  # (~ low-complexity cluster skip at 1000 pairs,
                                  #    src/group.cpp:142-175, src/options.cpp:31)
    bucket_neighbor_links: int = 3  # in oversize buckets, link each doc to this many
                                    # sorted neighbors (connectivity-preserving cap)
    bucket_hard_cap: int = 100_000  # beyond this a bucket is degenerate boilerplate;
                                    # subsample + count in manifest, never O(n^2)

    # --- containment (bottom-m sketch) ------------------------------
    containment_enabled: bool = True  # False: no sketch keys ride the explode
                                      # (-38% shuffle rows; substring dups
                                      # then surface only via band collisions)
    containment_perms: int = 2    # independent permutations for the bottom-m sketch
    containment_bottom_m: int = 8  # keys emitted per permutation per doc
    # 2x8=16 sketch keys/doc (was 4x8=32): containment edges are the
    # rarest edge type and carried the worst key-mass/edge ratio of the
    # whole explode; two independent bottom-8 sketches keep measured
    # recall 1.0 on the parity corpora (a containment>=0.9 pair collides
    # per-perm with prob ~1-(1-c)^m >> 0.99) at half the shuffle rows.

    # --- representative election ------------------------------------
    w_len: float = 0.5            # weights of the scored vote (gencore consensus
    w_recency: float = 0.3        #  scoring, src/pair.cpp:70-86 + src/group.cpp:320-405)
    w_quality: float = 0.2

    # --- execution ---------------------------------------------------
    sig_batch_size: int = 1024    # signature stage is CPU-heavy -> smaller batches
    sig_concurrency: int | None = None  # None -> stateless-task autoscale
    join_num_partitions: int | None = None   # None -> 2 * cluster CPUs
    pair_num_partitions: int | None = None   # None -> 2 * cluster CPUs
    min_cluster_size: int = 1     # emit only clusters with >= this many members
                                  # (~ supporting_reads filter, src/cluster.cpp:138)
    bloom_prefilter: str = "auto"  # "on" | "off" | "auto": Bloom-prefilter the
                                   # verify-join signature exchange to candidate
                                   # docs.  The filter trades a fixed driver-side
                                   # OR-reduce (~0.3-0.7 s serial) for a ~3x byte
                                   # cut on the heaviest exchange; bytes are only
                                   # expensive CROSS-NODE (single-node object
                                   # store is shared memory), so "auto" engages
                                   # it only when the cluster has >1 alive node.

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"!= num_perm ({self.num_perm})"
            )

    # pure performance knobs — proven result-identical by tests
    # (test_bloom_prefilter_equivalent_and_gated, partition-count
    # invariance tests) — must NOT invalidate checkpoints / incremental
    # state when toggled: fingerprint only the semantic fields.
    _EXECUTION_KNOBS = frozenset({
        "sig_batch_size", "sig_concurrency", "join_num_partitions",
        "pair_num_partitions", "bloom_prefilter",
    })

    def fingerprint(self) -> str:
        """Stable hash of the RESULT-AFFECTING config fields; part of
        every checkpoint manifest.  Execution knobs (batch sizes,
        partition counts, the Bloom prefilter toggle) are excluded —
        changing them never changes the output, so they must not force
        a re-bootstrap of incremental state."""
        d = {k: v for k, v in asdict(self).items()
             if k not in DedupConfig._EXECUTION_KNOBS}
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
