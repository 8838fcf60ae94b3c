#!/usr/bin/env python
"""REAL-kill resume proof (SURVEY §5 resume test at bench scale).

Round-3 proved resume only by deleting stage outputs; this drives the
actual failure mode: a flagship dedup run is SIGKILLed (whole process
group, mid-flight Ray workers and all) the moment the candidate-pair
exchange finishes checkpointing, then resumed in a FRESH process
against the same checkpoint dir.  Asserts:

  * resumed clusters == a clean single-shot run's clusters, byte-equal
    after url sort;
  * manifest continuity: the pre-kill manifest lines survive VERBATIM
    as a prefix of the resumed manifest (resume appends completed
    stages, never rewrites history), and the resumed run reuses the
    pre-kill stage fingerprints;
  * the resumed run actually SKIPPED the killed run's completed work
    (its manifest adds no duplicate signatures/candidate_pairs
    records).

Usage:  python tools/kill_resume_proof.py [--pages 60000] [--cpus 32]
Prints one JSON line; exit 0 iff every assertion holds.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from gencore_ray.config import DedupConfig
from gencore_ray.pipelines.dedup import dedup_pages
from gencore_ray.sources import read_pages
pages = read_pages(os.path.join({corpus!r}, "pages"), need_html=True)
res = dedup_pages(pages, DedupConfig(), extract_html=True,
                  checkpoint_dir={ck!r})
df = res.clusters.to_pandas().sort_values("url").reset_index(drop=True)
df.to_parquet({out!r})
ray.shutdown()
"""


def _spawn(corpus: str, ck: str, out: str, cpus: int) -> subprocess.Popen:
    code = _CHILD.format(repo=REPO, cpus=cpus, corpus=corpus, ck=ck, out=out)
    # own process group so SIGKILL takes the raylet and workers too
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)


def _wait(proc: subprocess.Popen, timeout: float) -> None:
    rc = proc.wait(timeout=timeout)
    if rc != 0:
        raise RuntimeError(f"child exited rc={rc}")


def run_proof(pages: int, cpus: int, work_dir: str,
              timeout: float = 900.0) -> dict:
    import pandas as pd

    sys.path.insert(0, REPO)
    from gencore_ray.corpus import write_pages_corpus

    # same cache naming as bench._corpus_dir so the bench corpus is
    # reused when sizes match
    corpus = f"/tmp/gencore_bench_pages_{pages}_s42_v4"
    if not os.path.exists(os.path.join(corpus, "pages.parquet")):
        write_pages_corpus(corpus, n_pages=pages, seed=42)
    ck_clean = os.path.join(work_dir, "ck_clean")
    ck_kill = os.path.join(work_dir, "ck_kill")
    out_clean = os.path.join(work_dir, "clusters_clean.parquet")
    out_res = os.path.join(work_dir, "clusters_resumed.parquet")
    manifest = os.path.join(ck_kill, "manifest.jsonl")

    # 1) clean single-shot run (also warms the OS page cache)
    t0 = time.monotonic()
    _wait(_spawn(corpus, ck_clean, out_clean, cpus), timeout)
    t_clean = time.monotonic() - t0

    # 2) killed run: SIGKILL the whole group the moment the
    #    candidate_pairs stage record lands in the manifest
    proc = _spawn(corpus, ck_kill, out_res, cpus)
    killed_after = None
    t0 = time.monotonic()
    try:
        while proc.poll() is None:
            if os.path.exists(manifest):
                try:
                    stages = [json.loads(l)["stage"] for l in open(manifest)]
                except (json.JSONDecodeError, KeyError):
                    stages = []       # caught the child mid-append; re-poll
                if "candidate_pairs" in stages:
                    killed_after = stages
                    os.killpg(proc.pid, signal.SIGKILL)
                    break
            if time.monotonic() - t0 > timeout:
                raise RuntimeError("kill window never arrived")
            time.sleep(0.02)
    finally:
        if proc.poll() is None:       # error path: never leave the child running
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        try:
            proc.wait(timeout=60)
        except Exception:
            pass
    if killed_after is None:
        raise RuntimeError("child finished before the kill — corpus too "
                           "small or checkpointing too fast; raise --pages")
    if os.path.exists(out_res):
        raise RuntimeError("killed run produced output — kill landed too late")
    pre_kill_lines = open(manifest).read().splitlines()

    # 3) resume in a fresh process against the same checkpoint dir
    t0 = time.monotonic()
    _wait(_spawn(corpus, ck_kill, out_res, cpus), timeout)
    t_resume = time.monotonic() - t0

    # --- assertions ---------------------------------------------------
    clean = pd.read_parquet(out_clean)
    resumed = pd.read_parquet(out_res)
    pd.testing.assert_frame_equal(clean, resumed)

    post_lines = open(manifest).read().splitlines()
    assert post_lines[: len(pre_kill_lines)] == pre_kill_lines, \
        "resume rewrote pre-kill manifest history"
    pre_recs = [json.loads(l) for l in pre_kill_lines]
    post_recs = [json.loads(l) for l in post_lines]
    pre_stages = [r["stage"] for r in pre_recs]
    new_stages = [r["stage"] for r in post_recs[len(pre_recs):]]
    assert not set(pre_stages) & set(new_stages), \
        f"resume re-ran completed stages: {set(pre_stages) & set(new_stages)}"
    assert "clusters" in new_stages, "resume never reached final stage"

    return {
        "metric": "kill-after-candidate_pairs resume proof",
        "pages": pages,
        "num_cpus": cpus,
        "killed_after_stages": killed_after,
        "resumed_new_stages": new_stages,
        "clusters_identical": True,
        "manifest_prefix_preserved": True,
        "sec_clean": round(t_clean, 2),
        "sec_resume": round(t_resume, 2),
        "resume_speedup": round(t_clean / t_resume, 2),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--work-dir", default="/tmp/gencore_kill_proof")
    args = ap.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)
    print(json.dumps(run_proof(args.pages, args.cpus, args.work_dir)))
