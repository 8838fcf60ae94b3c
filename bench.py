#!/usr/bin/env python
"""Benchmark harness.

Plain run: executes the headline pipeline (full HTML->clusters dedup
over the synthesized pages corpus) plus a representative query set
over $GRAFT_SF_DIR (default /root/testdata/sf0.1), then prints ONE
JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pages": N, "pages_per_sec": N}

--scaling: runs the identical job in two FRESH processes at
num_cpus=8 and num_cpus=32 (the sandbox proxy for the north rule's
N-node vs 4N-node clusters) and reports both throughputs plus
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "60000"))
CORPUS_SEED = 42

QUERY_NAMES = [
    "exact_dedup_docs",
    "dedup_docs_pipeline",
    "lineitem_pricing_summary",
    "revenue_by_nation",
    "events_by_type",
    "ann_topk",
    "embedding_near_dups",
    "text_quality_profile",
    "top_ngrams",
    "events_value_quantiles",
    "distinct_users_by_type",
    "curation_pipeline",
    # round-4 additions (new keys only — earlier keys stay comparable
    # across rounds)
    "train_val_test_split",
    "doc_chunks",
    "purchase_graph_pagerank",
    "events_user_skew",
    "events_asof_join",
    "events_sliding_1h",
    "embedding_knn_graph",
    "returned_item_report",
    "tfidf_cosine_pairs",
    "events_funnel",
    "events_quality_report",
    "source_token_divergence",
    "top_session_paths",
    "doc_token_entropy",
    "events_daily_filled",
    "user_value_trends",
    "sorted_neighborhood_pairs",
    # round-5 additions
    "dsir_logratios",
    "soft_dedup_commonness",
]


def _corpus_dir() -> str:
    """Deterministic bench corpus, cached across runs (generation is
    driver-side and excluded from timings)."""
    from gencore_ray.corpus import write_pages_corpus

    cache = f"/tmp/gencore_bench_pages_{BENCH_PAGES}_s{CORPUS_SEED}_v4"
    marker = os.path.join(cache, "pages.parquet")
    if not os.path.exists(marker):
        write_pages_corpus(cache, n_pages=BENCH_PAGES, seed=CORPUS_SEED)
    return cache


def _consume(res) -> int:
    """Consume a Dataset/DataFrame fully; return row count."""
    if hasattr(res, "count") and not hasattr(res, "columns"):
        return res.count()
    if hasattr(res, "to_pandas"):
        return len(res.to_pandas())
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.sources import read_pages

    corpus = _corpus_dir()

    # two read blocks per core: the fused read->extract->signature chain
    # load-balances across stragglers (measured: 2x blocks shaves the
    # signature-stage tail at 32 cpus); run_stage coalesces the
    # materialized output back to ~ncpu blocks for the exchanges
    n_blocks = int(os.environ.get("GRAFT_BENCH_BLOCKS_PER_CPU", "2")) * NUM_CPUS

    # warm-up, untimed: (a) OS page cache for the corpus, (b) Ray worker
    # processes + their library imports — a tiny full-pipeline run makes
    # every worker import the stage modules once, so the timed run
    # measures steady-state compute+shuffle (what a long-running
    # production job sees), not one-time process spin-up
    read_pages(os.path.join(corpus, "pages"), need_html=True,
               override_num_blocks=n_blocks).count()
    warm = read_pages(os.path.join(corpus, "pages"), need_html=True,
                      override_num_blocks=n_blocks).limit(2000)
    dedup_pages(warm, DedupConfig(), extract_html=True,
                ).clusters.count()

    # --- headline: full extract -> signatures -> LSH -> CC -> elect ----
    # median of N trials (default 5): shared-box neighbor load arrives
    # in ~40 s bursts that inflate a single trial 2-3x (measured
    # 2026-08-18: 8 trials = [8.1 8.3 8.6 8.8 9.7 10.0 16.9 26.9] on
    # identical code/input — two burst-hit trials, six clean).  Five
    # trials keep the median robust to one burst; `value_min` rides
    # along as the least-contaminated estimate (interference is
    # strictly additive), and the raw trials ride along for audits.
    trials = max(1, int(os.environ.get("GRAFT_BENCH_TRIALS", "5")))
    trial_secs: list[float] = []
    n_out = 0
    for _ in range(trials):
        t0 = time.monotonic()
        pages = read_pages(os.path.join(corpus, "pages"), need_html=True,
                           override_num_blocks=n_blocks)
        res = dedup_pages(pages, DedupConfig(), extract_html=True)
        n_out = res.clusters.count()
        trial_secs.append(time.monotonic() - t0)
    headline = sorted(trial_secs)[len(trial_secs) // 2]

    # --- representative query set over SF_DIR --------------------------
    # (skippable for scaling legs: GRAFT_BENCH_QUERIES=0 keeps the leg's
    # exposure window to shared-box load bursts as short as possible)
    # min-of-N per query (default 3): single-trial side-query numbers on
    # this shared box swing +/-30% with neighbor load, which made the
    # round-3 snapshot's apparent regressions unattributable; neighbor
    # interference is additive, so the fastest trial is the least-
    # contaminated estimate.  Raw trials ride along for audits.
    qtimes: dict[str, float] = {}
    qtrials: dict[str, list[float]] = {}
    if os.environ.get("GRAFT_BENCH_QUERIES", "1") != "0":
        q_n = max(1, int(os.environ.get("GRAFT_BENCH_QUERY_TRIALS", "3")))
        queries = entrymod.queries()
        for name in QUERY_NAMES:
            secs = []
            for _ in range(q_n):
                t0 = time.monotonic()
                _consume(queries[name](SF_DIR))
                secs.append(round(time.monotonic() - t0, 3))
            qtrials[name] = secs
            qtimes[name] = min(secs)

    spilled_mib = _spilled_mib()
    ray.shutdown()
    return {
        "metric": "e2e web-page dedup (extract+minhash+lsh+verify+cc+elect)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": BENCH_PAGES,
        "pages_per_sec": round(BENCH_PAGES / headline, 1),
        "value_min": round(min(trial_secs), 3),
        "pages_per_sec_min": round(BENCH_PAGES / min(trial_secs), 1),
        "rows_out": n_out,
        "headline_trials": [round(s, 3) for s in trial_secs],
        "query_trials": qtrials,
        "spilled_mib": spilled_mib,
    }


def _spilled_mib() -> float | None:
    """Object-store spill volume for this session (MiB), from the
    raylet's cumulative spill log lines — evidence that large corpora
    STREAM through the store (spill instead of OOM) rather than being
    held in heap.  0.0 = ran entirely in-store."""
    try:
        import glob
        import re

        import ray

        session = ray._private.worker._global_node.get_session_dir_path()
        total = 0.0
        for f in glob.glob(os.path.join(session, "logs", "raylet*.out")):
            with open(f, errors="ignore") as fh:
                for m in re.finditer(r"Spilled (\d+) MiB", fh.read()):
                    total = max(total, float(m.group(1)))   # cumulative
        return total
    except Exception:                                    # noqa: BLE001
        return None


def _canary(ncpu: int) -> float:
    """Embarrassingly-parallel ceiling probe: a FIXED total workload (128
    equal blake2b tasks — same total work at every cpu count, exactly like
    the pipeline legs) in a fresh Ray session.  On a SHARED box the 8->32
    strong-scaling efficiency of even perfectly-parallel work sits well
    below 1.0 (frequency/memory-bandwidth budget + neighbor load); the
    pipeline's efficiency is only meaningful relative to this ceiling, so
    every scaling run measures both with the same (sec_8/sec_32)/4
    formula.  NOTE the task count must NOT scale with ncpu: a weak-scaling
    canary under a strong-scaling formula reads ~0.25 and is meaningless."""
    code = (
        "import ray, time, hashlib\n"
        f"ray.init(address='local', num_cpus={ncpu}, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "@ray.remote\n"
        "def work(i):\n"
        "    h = hashlib.blake2b(); b = bytes(1 << 20)\n"
        "    for _ in range(64): h.update(b)\n"
        "    return h.hexdigest()[:4]\n"
        f"ray.get([work.remote(i) for i in range({2 * ncpu})])\n"  # warm workers
        "t0 = time.monotonic()\n"
        "ray.get([work.remote(i) for i in range(128)])\n"  # fixed total work
        "print(time.monotonic() - t0)\n"
        "ray.shutdown()\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True).stdout
    return float(out.strip().splitlines()[-1])


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 then 32 (the sandbox proxy
    for the north rule's N vs 4N nodes), plus the same-moment
    embarrassingly-parallel canary ceiling at both levels.

    Defaults to a 200k-page corpus (vs 60k for the plain run): large
    enough that compute dominates the fixed per-exchange latency at
    both levels, small enough to generate and run in minutes."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        env.setdefault("GRAFT_BENCH_PAGES", "200000")
        env.setdefault("GRAFT_BENCH_QUERIES", "0")   # scaling: headline only
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            # surface the leg's own traceback — a bare
            # CalledProcessError hides the actual failure (OOM/ENOSPC)
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(
                f"scaling leg num_cpus={ncpu} failed (exit {proc.returncode})"
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    can_lo, lo = _canary(8), run(8)
    can_hi, hi = _canary(32), run(32)
    # min-of-trials per leg: shared-box neighbor interference is strictly
    # ADDITIVE noise, so the fastest trial is the least-contaminated
    # estimate of the job's own cost (raw trials ride along for audits)
    sec_lo = min(lo.get("headline_trials") or [lo["value"]])
    sec_hi = min(hi.get("headline_trials") or [hi["value"]])
    thr_lo = round(lo["pages"] / sec_lo, 1)
    thr_hi = round(hi["pages"] / sec_hi, 1)
    eff = (thr_hi / thr_lo) / (32 / 8)
    can_eff = (can_lo / can_hi) / (32 / 8)   # fixed work: ideal sec ~ 1/ncpu
    return {
        "metric": "scaling efficiency (num_cpus 8 -> 32, fresh sessions)",
        "sec_8": round(sec_lo, 3),
        "sec_32": round(sec_hi, 3),
        "pages_per_sec_8": thr_lo,
        "pages_per_sec_32": thr_hi,
        "scaling_efficiency": round(eff, 3),
        "canary_sec_8": round(can_lo, 3),
        "canary_sec_32": round(can_hi, 3),
        "canary_ceiling_efficiency": round(can_eff, 3),
        "efficiency_vs_ceiling": round(eff / can_eff, 3) if can_eff else None,
        "pages": lo["pages"],
        "headline_trials_8": lo.get("headline_trials"),
        "headline_trials_32": hi.get("headline_trials"),
        "spilled_mib_8": lo.get("spilled_mib"),
        "spilled_mib_32": hi.get("spilled_mib"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
