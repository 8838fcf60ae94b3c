#!/usr/bin/env python
"""Large-corpus spill-regime probe for the flagship dedup pipeline.

The object store on this box holds ~a quarter of a 4M-page run's raw
Arrow working set, and round-4 measurements showed plain execution
spills ~2x the corpus bytes per stage boundary — at 4M pages the raw
spill exceeded the sandbox disk (honest OutOfDiskError).  This probe
runs the checkpoint-then-release execution instead: every stage
streams its output to snappy parquet (3-5x smaller than raw Arrow
spill for text) and downstream stages re-read from disk, so the store
only ever holds one stage's in-flight blocks.

    python tools/scale_probe.py [--pages 4000000] [--cpus 32]

Prints one JSON line: wall seconds, rows out, cumulative spill MiB,
checkpoint bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--keep", action="store_true",
                    help="keep the checkpoint dir after the run")
    ap.add_argument("--store-gb", type=float, default=None,
                    help="object store size in GiB (default: Ray's 30%%"
                         " heuristic); on a RAM-rich box a larger"
                         " /dev/shm-backed store trades disk spill for"
                         " memory")
    args = ap.parse_args()

    import ray

    kw = {}
    if args.store_gb:
        kw["object_store_memory"] = int(args.store_gb * (1 << 30))
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bench import _spilled_mib
    from gencore_ray.config import DedupConfig
    from gencore_ray.corpus import write_pages_corpus
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.sources import read_pages

    cache = f"/tmp/gencore_bench_pages_{args.pages}_s{args.seed}_v4"
    if not os.path.exists(os.path.join(cache, "pages.parquet")):
        write_pages_corpus(cache, n_pages=args.pages, seed=args.seed)

    ckpt_dir = f"/tmp/gencore_scale_probe_ckpt_{args.pages}"
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    n_blocks = 2 * args.cpus * max(1, args.pages // 1_000_000)
    t0 = time.monotonic()
    pages = read_pages(os.path.join(cache, "pages"), need_html=True,
                       override_num_blocks=n_blocks)
    res = dedup_pages(pages, DedupConfig(), extract_html=True,
                      checkpoint_dir=ckpt_dir)
    rows = res.clusters.count()
    wall = time.monotonic() - t0

    ck_bytes = 0
    for root, _dirs, files in os.walk(ckpt_dir):
        ck_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    out = {
        "pages": args.pages,
        "num_cpus": args.cpus,
        "wall_sec": round(wall, 1),
        "pages_per_sec": round(args.pages / wall, 1),
        "rows_out": rows,
        "spilled_mib": _spilled_mib(),
        "checkpoint_mib": round(ck_bytes / (1 << 20), 1),
        "counters": res.counters,
    }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
