"""Brute-force dedup oracle (driver-side, exact, test-only).

Computes the ground-truth edge set the engine must reproduce with
dup-pair recall >= 0.99 (BASELINE.json): for every pair of docs that
share at least one shingle, the exact 5-gram Jaccard, exact shingle
containment, and exact SimHash Hamming distance, thresholded by the
same DedupConfig the engine runs with.  Pairs sharing zero shingles
have Jaccard 0 and containment 0 by definition and (for non-degenerate
docs) cannot sit within SimHash Hamming <= 3, so the inverted-index
candidate set is exhaustive.

Mirrors the reference's own style of checking grouped output against
hand-computable expectations (/root/reference/src/unittest.cpp:10-16).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from gencore_ray.config import DedupConfig
from gencore_ray.functions.hashing import U64, popcount64
from gencore_ray.functions.text import (
    shingle_hashes,
    simhash64,
    token_hashes_for_batch,
)


def oracle_edges(
    ids: list[str], texts: list[str], cfg: DedupConfig
) -> list[tuple[str, str, float]]:
    """All (id_a, id_b, jaccard) dup edges under cfg's thresholds, a<b."""
    toks = token_hashes_for_batch(texts, seed=cfg.seed)
    shingles = [shingle_hashes(t, cfg.shingle_k) for t in toks]
    sims = np.array([simhash64(t) for t in toks], dtype=U64)
    sizes = [len(s) for s in shingles]

    # inverted index shingle -> doc indices
    inv: dict[int, list[int]] = defaultdict(list)
    for i, sh in enumerate(shingles):
        for h in sh.tolist():
            inv[h].append(i)

    co: dict[tuple[int, int], int] = defaultdict(int)
    for docs in inv.values():
        if len(docs) < 2:
            continue
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                co[(docs[x], docs[y])] += 1

    edges = []
    for (i, j), c in co.items():
        if sizes[i] < cfg.min_shingles or sizes[j] < cfg.min_shingles:
            continue
        union = sizes[i] + sizes[j] - c
        jac = c / union if union else 0.0
        containment = c / min(sizes[i], sizes[j])
        hamming = int(popcount64(sims[i] ^ sims[j])[0])
        if (
            jac >= cfg.jaccard_threshold
            or containment >= cfg.containment_threshold
            or (cfg.simhash_enabled and hamming <= cfg.simhash_hamming_max)
        ):
            a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
            edges.append((a, b, jac))
    return sorted(edges)


def oracle_jaccard_pairs(
    ids: list[str], texts: list[str], cfg: DedupConfig
) -> list[tuple[str, str, float]]:
    """Only the Jaccard >= tau edges (the recall-accounting subset)."""
    return [
        e
        for e in oracle_edges(ids, texts, cfg)
        if e[2] >= cfg.jaccard_threshold
    ]


def union_find_clusters(ids: list[str], edges) -> dict[str, str]:
    """id -> cluster id (min member id, lexicographic). Deterministic."""
    parent: dict[str, str] = {i: i for i in ids}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b, *_ in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the label deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in ids}
