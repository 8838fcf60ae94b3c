#!/usr/bin/env python
"""Stress the de-drivered PPJoin verification path (ops/setjoin.py).

Builds a deterministic corpus whose candidate-pair count is known in
closed form — ``groups * C(k, 2)`` pairs, default 1100 * C(270,2) =
39.9M, ~10x the 3.9M candidates the sf0.1 bench query generates — and
runs :func:`set_similarity_join` end to end.  With the round-4 driver
collection this size raised the 20M-candidate ValueError; the Dataset
path must stream it (spilling as needed) instead.

Corpus shape (per doc, 4 tokens): 2 unique tokens (df=1), 1 group
token shared by its k group members (df=k), 1 global filler token
(df=N).  With tau=0.5 the prefix is the 3 rarest tokens = the uniques
+ the group token, so each group contributes exactly C(k,2)
candidates, and every one FAILS verification (true J = 2/6) — the
stress is all candidate volume, no output volume.  A planted block of
``dups`` doc pairs with identical token sets (J = 1.0) checks the
output is still exact under load.

Run:  python tools/stress_setjoin.py [--groups 1100] [--k 270]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def build_corpus(groups: int, k: int, dups: int) -> tuple[pd.DataFrame, int]:
    n = groups * k
    gid = np.repeat(np.arange(groups), k)
    i = np.arange(n)
    texts = [
        f"u{2 * d}x u{2 * d + 1}x g{g}g common"
        for d, g in zip(i, gid)
    ]
    # planted exact dups: doc pairs with identical 4-token sets, using
    # a token namespace disjoint from the stress groups
    for j in range(dups):
        t = f"pa{j} pb{j} pc{j} pd{j}"
        texts.append(t)
        texts.append(t)
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    expected_cands = groups * (k * (k - 1) // 2) + dups
    return df, expected_cands


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=1100)
    ap.add_argument("--k", type=int, default=270)
    ap.add_argument("--dups", type=int, default=50)
    ap.add_argument("--num-parts", type=int, default=32)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from gencore_ray.ops.setjoin import set_similarity_join

    docs, expected = build_corpus(args.groups, args.k, args.dups)
    print(f"docs={len(docs)}  expected_candidates={expected:,}")
    t0 = time.monotonic()
    out = set_similarity_join(
        rd.from_pandas(docs).repartition(32), threshold=0.5,
        num_parts=args.num_parts,
    ).to_pandas()
    wall = time.monotonic() - t0
    # only the planted identical pairs survive verification (stress
    # pairs have true J = 2/6 < 0.5)
    assert len(out) == args.dups, (len(out), args.dups)
    assert (out["jaccard"] == 1.0).all()
    print(f"OK: {expected:,} candidates verified in {wall:.1f}s "
          f"({args.dups} planted dups survived, all J=1.0)")
    ray.shutdown()


if __name__ == "__main__":
    main()
