"""gencore_ray — a Ray-Data-native near-duplicate detection engine.

A from-scratch reimagination of OpenGene/gencore's read-grouping +
consensus pipeline (reference: /root/reference/src/gencore.cpp) as
web-scale text dedup over Parquet pages:

    read_parquet(pages)
      -> signature stage  (map_batches actor pool: shingles, MinHash-128,
                           SimHash-64, quality)          [~ gencore UMI/key extraction]
      -> exact-dup fast path (groupby(text_hash))        [~ Cluster::addPair exact dedup]
      -> LSH band explode + bucket groupby               [~ position clustering]
      -> candidate pairs (capped, skew-guarded)          [~ low-complexity cluster guard]
      -> verify (exact Jaccard / SimHash Hamming /
                 shingle containment)                    [~ UMI Hamming sub-grouping]
      -> connected components (union-find or
         large-star/small-star on the edges Dataset)     [~ greedy UMI absorb]
      -> representative election (scored vote)           [~ quality-weighted consensus]
      -> clusters parquet + lineage manifest             [~ output BAM + JSON report]

Everything is expressed Ray-Data-first: lazy Dataset pipelines,
zero-copy Arrow batches, actor pools for stateful stages, explicit
shuffle keys, salting/caps for hot buckets.
"""

from gencore_ray.config import DedupConfig

__version__ = "0.1.0"

__all__ = ["DedupConfig", "__version__"]
