"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() here or in gencore_ray library code.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TESTDATA_SMOKE = "/root/testdata/sf0.001"


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def _docs_as_pages_from(ds):
    """documents Dataset (doc_id, text) -> pages-like (url, text)."""
    def to_pages(t: pa.Table) -> pa.Table:
        urls = pa.array([f"doc-{int(i):08d}" for i in t["doc_id"].to_pylist()], pa.string())
        return pa.table({"url": urls, "text": t["text"]})

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def _docs_as_pages(sf_dir: str):
    """documents(doc_id,text,...) -> pages-like input (url,text)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_pages(t: pa.Table) -> pa.Table:
        urls = pa.array([f"doc-{int(i):08d}" for i in t["doc_id"].to_pylist()], pa.string())
        return pa.table({"url": urls, "text": t["text"]})

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def _round_cols(ds, cols: dict[str, int]):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        for c, nd in cols.items():
            v = df[c].astype(np.float64).to_numpy()
            # half-away-from-zero on the scaled double == DuckDB round()
            p = 10.0 ** nd
            df[c] = np.sign(v) * np.floor(np.abs(v) * p + 0.5) / p
        return df

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship near-dup pipeline over sf0.001 documents."""
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages

    pages = _docs_as_pages(TESTDATA_SMOKE)
    res = dedup_pages(pages, DedupConfig())
    return res.clusters.select_columns(
        ["url", "cluster_id", "cluster_size", "is_representative", "rep_score"]
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_exact_dedup_docs(sf_dir: str):
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import compute_signatures
    from gencore_ray.stages.exact import exact_dedup

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        from gencore_ray.functions.hashing import U64, hash_bytes_u64

        # NULL text hashes a distinct sentinel (prefix byte disambiguates
        # it from every real text) — matches SQL GROUP BY keeping NULL as
        # its own group instead of merging NULL with ""
        hashes = np.fromiter(
            (
                hash_bytes_u64(b"\x00" if x is None else b"\x01" + x.encode())
                for x in t["text"].to_pylist()
            ),
            dtype=U64, count=t.num_rows,
        )
        return pa.table({"doc_id": t["doc_id"], "text_hash": pa.array(hashes)})

    hashed = docs.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = exact_dedup(hashed, id_col="doc_id", hash_col="text_hash", num_parts=16)
    return out.select_columns(["doc_id", "dup_count"])


def _q_doc_stats_by_lang(sf_dir: str):
    from gencore_ray.ops.relational import grouped_aggregate

    docs = _docs(sf_dir).select_columns(["lang", "n_chars"])
    out = grouped_aggregate(
        docs,
        ["lang"],
        [("n_docs", None, "count"), ("total_chars", "n_chars", "sum"),
         ("avg_chars", "n_chars", "mean")],
        num_parts=8,
    )
    return _round_cols(out, {"avg_chars": 6})


def _q_token_counts_by_source(sf_dir: str):
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.ops.textstats import text_stats

    docs = _docs(sf_dir).select_columns(["source", "text"])
    stats = text_stats(docs, with_heuristics=False).select_columns(
        ["source", "token_count"]
    )
    return grouped_aggregate(
        stats,
        ["source"],
        [("total_tokens", "token_count", "sum"), ("n_docs", None, "count")],
        num_parts=8,
    )


def _q_text_metrics(sf_dir: str):
    from gencore_ray.ops.textstats import text_stats

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return text_stats(docs, with_heuristics=False).select_columns(
        ["doc_id", "text_len", "alnum_count", "token_count"]
    )


def _q_top_longest_docs(sf_dir: str):
    from gencore_ray.ops.relational import topk

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    return topk(docs, ["n_chars", "doc_id"], 10, descending=[True, False])


def _q_events_by_type(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = grouped_aggregate(
        ev,
        ["event_type"],
        [("n_events", None, "count"), ("total_value", "value", "sum"),
         ("avg_value", "value", "mean")],
        num_parts=8,
    )
    return _round_cols(out, {"total_value": 6, "avg_value": 6})


def _q_events_hourly(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": df["ts"].dt.floor("h")})

    hours = ev.map_batches(add_hour, batch_format="pandas")
    return grouped_aggregate(hours, ["hour"], [("n_events", None, "count")], num_parts=8)


def _q_lineitem_pricing_summary(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_aggregate

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"],
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        df["charge"] = df["disc_price"] * (1 + df["l_tax"])
        return df

    li = li.map_batches(derive, batch_format="pandas")
    out = grouped_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [("sum_qty", "l_quantity", "sum"), ("sum_base_price", "l_extendedprice", "sum"),
         ("sum_disc_price", "disc_price", "sum"), ("sum_charge", "charge", "sum"),
         ("avg_qty", "l_quantity", "mean"), ("avg_price", "l_extendedprice", "mean"),
         ("avg_disc", "l_discount", "mean"), ("count_order", None, "count")],
        num_parts=8,
    )
    return _round_cols(
        out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2,
              "sum_charge": 2, "avg_qty": 4, "avg_price": 4, "avg_disc": 4}
    )


def _q_revenue_by_nation(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.relational import broadcast_join, grouped_aggregate

    # small dims read driver-side once, broadcast into every batch
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ]
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    joined = broadcast_join(orders, dim, key="o_custkey", small_key="c_custkey")
    out = grouped_aggregate(
        joined.select_columns(["n_name", "o_totalprice"]),
        ["n_name"],
        [("total_revenue", "o_totalprice", "sum"), ("n_orders", None, "count")],
        num_parts=8,
    )
    return _round_cols(out, {"total_revenue": 2})


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    row = df.loc[df["vec_id"] == 0, "embedding"].iloc[0]
    return np.asarray(row, dtype=np.float64)


def _q_ann_topk(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.ann import brute_force_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(emb, _query_vec(sf_dir), k=10)


def _q_ann_multi_topk(sf_dir: str):
    """Batched multi-query ANN: the whole (Q, d) query matrix scored in
    ONE scan (one matmul per batch for all queries) — per-query results
    identical to Q separate brute-force runs (round-2 VERDICT #8)."""
    import ray.data as rd

    from gencore_ray.ops.ann import brute_force_topk_batch

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    qdf = t[t["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk_batch(
        emb, Q, k=10, query_ids=qdf["vec_id"].to_numpy()
    )


def _q_ann_ivf_topk(sf_dir: str):
    """IVF with nprobe == n_clusters probes every cell, so the result
    must equal exact brute-force top-k — which is the SQL oracle.  The
    approximate regime (nprobe < n_clusters) is covered by pytest
    recall assertions."""
    import ray.data as rd

    from gencore_ray.ops.ann import ivf_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_topk(emb, _query_vec(sf_dir), k=10, n_clusters=16, nprobe=16)


def _q_embedding_near_dups(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    from gencore_ray.ops.ann import near_dup_pairs

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") < 500),     # row-group pushdown at the read
    )
    return near_dup_pairs(emb, threshold=0.45)


def _q_embedding_lsh_near_dups(sf_dir: str):
    """Random-hyperplane LSH near-dup pairs, amplified for the corpus's
    low (0.45) threshold so recall is 1.0 — verified against the exact
    all-pairs SQL oracle.  At web-scale thresholds (>=0.8) the defaults
    (24 tables x 12 bits) prune far harder; see ops/ann.py."""
    import ray.data as rd

    from gencore_ray.ops.ann import lsh_near_dup_pairs

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return lsh_near_dup_pairs(emb, threshold=0.45, n_tables=48, bits=4)


def _q_dedup_docs_pipeline(sf_dir: str):
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages

    res = dedup_pages(_docs_as_pages(sf_dir), DedupConfig())
    return res.clusters.select_columns(
        ["url", "cluster_id", "cluster_size", "is_representative"]
    )


def _q_incremental_dedup_docs(sf_dir: str):
    """Daily-crawl merge (pipelines/incremental.py): bootstrap dedup
    state on 2/3 of the corpus, fold the remaining 1/3 in
    incrementally — old-old pairs are never regenerated; prior
    connectivity enters as star edges.  The merged cluster table must
    equal a from-scratch run over the union, so it shares the
    recursive-CTE full-pipeline SQL oracle verbatim."""
    import shutil
    import tempfile

    import numpy as np

    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.pipelines.incremental import incremental_dedup

    pages = _docs_as_pages(sf_dir)

    def _part(t: pa.Table, want_new: bool) -> pa.Table:
        did = np.array([int(u.rsplit("-", 1)[1]) for u in t["url"].to_pylist()])
        m = (did % 3 == 0) == want_new
        return t.take(pa.array(np.flatnonzero(m)))

    old_p = pages.map_batches(lambda t: _part(t, False), batch_format="pyarrow")
    new_p = pages.map_batches(lambda t: _part(t, True), batch_format="pyarrow")
    sd = tempfile.mkdtemp(prefix="gencore_inc_state_")
    try:
        cfg = DedupConfig()
        dedup_pages(old_p, cfg, state_dir=sd)
        res = incremental_dedup(new_p, sd, cfg, update_state=False)
        return res.clusters.select_columns(
            ["url", "cluster_id", "cluster_size", "is_representative"]
        ).materialize()
    finally:
        shutil.rmtree(sd, ignore_errors=True)


def _q_benchmark_contamination(sf_dir: str):
    """Training-data decontamination (ops/decontam.py): docs sharing a
    verbatim 5-gram shingle with a held-out benchmark slice (doc_id %
    29 == 0) are flagged with their distinct-shingle overlap count.
    Broadcast membership test — the benchmark hash set ships once via
    ray.put; no shuffle touches the corpus."""
    from gencore_ray.ops.decontam import contamination_check

    import numpy as np

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def _mod_split(t: pa.Table, is_bench: bool) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (did % 29 == 0) == is_bench
        return t.take(pa.array(np.flatnonzero(m)))

    bench = docs.map_batches(
        lambda t: _mod_split(t, True), batch_format="pyarrow"
    )
    corpus = docs.map_batches(
        lambda t: _mod_split(t, False), batch_format="pyarrow"
    )
    return contamination_check(corpus, bench)


def _q_url_canonical_dedup(sf_dir: str):
    """URL-variant dedup (ops/urltools.py): messy url spellings —
    scheme/host case, www., default :80 port, utm params, fragments,
    trailing slashes — derived deterministically from doc_id, then
    collapsed by the RE2-safe canonicalisation chain. The oracle
    replays the exact rule chain with regexp_replace."""
    import numpy as np

    from gencore_ray.ops.urltools import url_variant_dedup

    docs = _docs(sf_dir).select_columns(["doc_id"])

    def _mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        urls = []
        for di in d.tolist():
            pi = di % 97
            scheme = "http" if di % 2 == 0 else "HTTP"
            www = "WWW." if di % 3 == 0 else ""
            port = ":80" if di % 4 == 0 else ""
            slash = "/" if di % 5 == 0 else ""
            q = f"?utm_source=feed&id={pi}" if di % 6 == 0 else f"?id={pi}"
            frag = "#top" if di % 7 == 0 else ""
            urls.append(
                f"{scheme}://{www}Site-{pi % 10}.Example{port}/a/{pi}{slash}{q}{frag}"
            )
        return pa.table({"url": pa.array(urls, pa.string())})

    return url_variant_dedup(docs.map_batches(_mk, batch_format="pyarrow"))


def _q_pages_domain_stats(sf_dir: str):
    """Per-host crawl profile over the pages corpus (ops/urltools.py):
    domain extraction + pre-aggregated grouped stats.  The corpus is
    synthetic and the oracle string pins the 1500-page cache at
    registration time, so the engine side pins the SAME corpus
    regardless of sf_dir (the pages_dedup_sql convention)."""
    import ray.data as rd

    from gencore_ray.ops.urltools import domain_stats

    cache = _pages_cache("/root/testdata/sf0.01")
    pages = rd.read_parquet(f"{cache}/pages.parquet", columns=["url", "text"])
    return _round_cols(domain_stats(pages), {"avg_chars": 6})


def _q_pages_domain_cap(sf_dir: str):
    """Per-domain quota cap (CC curation: limit pages per host so one
    crawl-heavy domain cannot dominate the training mix): extract the
    host with the domain_stats regex, keep the top-5 pages per domain
    by (length desc, url asc) via ops/relational.py top_k_per_group —
    one exchange keyed on domain, vectorised sort + groupby-head
    inside each partition (no per-group Python)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from gencore_ray.ops.relational import top_k_per_group

    cache = _pages_cache("/root/testdata/sf0.01")
    pages = rd.read_parquet(f"{cache}/pages.parquet", columns=["url", "text"])

    def _extract(t: pa.Table) -> pa.Table:
        dom = pc.fill_null(
            pc.struct_field(
                pc.extract_regex(
                    pc.utf8_lower(t["url"].cast(pa.string())),
                    pattern=r"^[a-z][a-z0-9+.-]*://(?P<d>[^/:?#]+)",
                ),
                "d",
            ),
            "",
        )
        tl = pc.fill_null(
            pc.utf8_length(t["text"].cast(pa.string())), 0).cast(pa.int64())
        return pa.table({"domain": dom, "url": t["url"], "text_len": tl})

    slim = pages.map_batches(_extract, batch_format="pyarrow",
                             zero_copy_batch=True)
    return top_k_per_group(slim, ["domain"], ["text_len", "url"], k=5,
                           descending=[True, False], num_parts=8)


def _q_pii_redaction(sf_dir: str):
    """PII scrub (functions/redact.py): a deterministic contact line
    (email + IPv4 + intl phone derived from doc_id) is appended to
    each doc, then redacted to typed tags; flags are computed on the
    pre-redaction text. The oracle replays the exact regex chain with
    regexp_replace/regexp_matches (patterns are RE2-safe and
    ASCII-explicit so both engines agree)."""
    from gencore_ray.functions.redact import redact_pii

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def _aug_redact(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_pylist()
        texts = [
            f"{x or ''} contact user{d}@mail-{d % 7}.example.org or "
            f"10.{d % 200}.{d % 97}.{d % 251} phone +1555{d:07d}"
            for d, x in zip(did, t["text"].to_pylist())
        ]
        clean, flags = redact_pii(texts)
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": pa.array(list(clean), pa.string()),
            "has_email": pa.array(flags["email"]),
            "has_ip": pa.array(flags["ipv4"]),
            "has_phone": pa.array(flags["phone"]),
        })

    return docs.map_batches(
        _aug_redact, batch_format="pyarrow", zero_copy_batch=True
    )


def _q_mixture_token_sample(sf_dir: str):
    """Training-mixture sampling (ops/packing.py): per source, take
    docs in deterministic multiplicative-hash order until the source's
    running token count reaches 20k — reproducible by any engine, no
    RNG state."""
    from gencore_ray.ops.packing import token_budget_sample

    docs = _docs(sf_dir).select_columns(["doc_id", "source", "text"])
    return token_budget_sample(docs, budget_tokens=20_000)


def _q_sequence_packing(sf_dir: str):
    """GPT-style concat-and-chunk packing (ops/packing.py): global
    token offsets via a distributed prefix sum, then 2048-token chunk
    spans per doc."""
    from gencore_ray.ops.packing import pack_sequences

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return pack_sequences(docs, seq_len=2048)


def _q_cluster_consensus(sf_dir: str):
    """G6 parity: one SYNTHESIZED record per cluster (gencore's
    quality-weighted consensus, /root/reference/src/group.cpp:320-526).
    The SQL-checked projection covers the merged metadata; the voted
    consensus_text itself is pytest-verified (tests/test_pipeline.py)."""
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.stages.consensus import synthesize_clusters

    pages = _docs_as_pages(sf_dir)
    res = dedup_pages(pages, DedupConfig())
    cons = synthesize_clusters(pages, res.clusters)
    return cons.select_columns(
        ["cluster_id", "cluster_size", "rep_url", "max_quality",
         "max_text_len", "total_text_len"]
    )


def _q_cluster_consensus_ref(sf_dir: str):
    """G6 side-input cross-check (gencore consults the reference genome
    at ambiguous pileup positions, src/group.cpp:430-501): a trusted
    (url, text) table — here every 5th doc, standing in for a curated
    source — is broadcast into the vote; at positions with NO strict
    count majority that the cluster's trusted stream covers, the
    trusted token is imposed and counted.  The count rule is integer-
    exact, so ref_overrides replays in SQL verbatim.

    This corpus's near-dups differ by truncation, never substitution —
    members agree at every covered position — so the query PLANTS
    disagreements deterministically: member streams (vote input only;
    clustering is untouched) get token #2 replaced with 'refx' for
    every doc_id % 7 == 3, while the trusted table reads the original
    text.  The SQL twin applies the identical perturbation."""
    import ray.data as rd

    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.stages.consensus import synthesize_clusters

    pages = _docs_as_pages(sf_dir)
    res = dedup_pages(pages, DedupConfig())
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    def _every5(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.flatnonzero(d % 5 == 0)))

    trusted = _docs_as_pages_from(
        docs.map_batches(_every5, batch_format="pyarrow"))

    def _plant(t: pa.Table) -> pa.Table:
        out = []
        for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            if int(u[4:]) % 7 == 3 and x:
                tk = x.split()
                if len(tk) >= 2:
                    tk[1] = "refx"
                    x = " ".join(tk)
            out.append(x)
        return pa.table({"url": t["url"],
                         "text": pa.array(out, pa.string())})

    voted_pages = pages.map_batches(_plant, batch_format="pyarrow")
    cons = synthesize_clusters(voted_pages, res.clusters, trusted=trusted)
    return cons.select_columns(
        ["cluster_id", "cluster_size", "ref_overrides"])


def _q_cluster_safe_split(sf_dir: str):
    """Leakage-safe train/val/test split: the split key is the DEDUP
    CLUSTER id, so every member of a near-dup cluster lands on the
    same side — the split that actually prevents test-set
    contamination (splitting raw doc ids scatters near-identical
    texts across train and test).  Composition of the flagship
    pipeline with ops/split.py's pure-map hash split; the SQL twin
    replays the cluster labels via the recursive-CTE CC and the
    md5_number_lower bucket cutoffs."""
    from gencore_ray.ops.split import hash_split

    clusters = _q_dedup_docs_pipeline(sf_dir)
    tagged = hash_split(clusters, "cluster_id", seed=42)
    return tagged.select_columns(["url", "cluster_id", "split"])


def _q_dsir_logratios(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023, ops/dsir.py): hashed
    unigram+bigram bag models (2^16 md5 buckets, add-1 smoothing) for
    the target (lang='en') vs raw classes; each doc scored by the
    summed log-likelihood ratio of its grams.  Bucket hashing is
    md5_low64 % V == DuckDB md5_number_lower % V, so the whole model
    replays in SQL."""
    from gencore_ray.ops.dsir import dsir_logratios

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "text"])
    return dsir_logratios(docs, target_col="lang", target_value="en")


def _q_within_doc_line_collapse(sf_dir: str):
    """Within-document repeated-line collapse (ops/linedup.py
    collapse_repeated_lines): keep each line's FIRST occurrence inside
    a doc, drop later repeats, preserve order — the in-page complement
    of cross-doc line dedup (crawlers re-emit nav menus/banners inside
    one page).  Pure per-row map, no exchange.  The corpus has
    single-line docs, so repeats are planted deterministically: a
    'head <lang>' banner line, re-appended for even doc_ids, and the
    body line duplicated for doc_id % 5 == 0 — both replayed verbatim
    in the SQL twin."""
    from gencore_ray.ops.linedup import collapse_repeated_lines

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        txt = [x or "" for x in t["text"].to_pylist()]
        out = [
            f"head {g}\n" + s
            + (f"\nhead {g}" if i % 2 == 0 else "")
            + ("\n" + s if i % 5 == 0 else "")
            for i, g, s in zip(ids, langs, txt)
        ]
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(out, pa.string())})

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "text"])
    return collapse_repeated_lines(
        docs.map_batches(plant, batch_format="pyarrow"))


def _q_soft_dedup_commonness(sf_dir: str):
    """SoftDedup reweighting signal (He et al. 2024, ops/softdedup.py):
    per-doc data commonness = mean ln(df/N) over the doc's distinct
    hashed word 3-grams (2^18 md5 buckets).  The soft alternative to
    hard dedup — duplication level becomes a training weight instead
    of a drop decision (gencore's duplevel histogram per record,
    /root/reference/src/stats.h:15).  Bucket hashing is md5_low64 &
    (V-1) == DuckDB md5_number_lower % V, so the score replays in SQL.
    """
    from gencore_ray.ops.softdedup import commonness_scores

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return commonness_scores(docs)


def _q_cluster_size_histogram(sf_dir: str):
    """Duplication-level histogram (gencore's supporting-reads
    histogram analogue, /root/reference/src/stats.h:15): how many
    clusters exist at each cluster size."""
    from gencore_ray.ops.relational import grouped_aggregate

    clusters = _q_dedup_docs_pipeline(sf_dir)
    reps = clusters.filter(expr="is_representative == True").select_columns(
        ["cluster_size"]
    )
    return grouped_aggregate(
        reps, ["cluster_size"], [("n_clusters", None, "count")], num_parts=4
    )


def _q_text_quality_profile(sf_dir: str):
    from gencore_ray.ops.textstats import text_stats

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return text_stats(docs).select_columns(
        ["doc_id", "quality", "lang_pred", "fingerprint"]
    )


_SIG_EDGES_CACHE: dict[str, Any] = {}


def _sig_edges(sf_dir: str):
    """Signatures -> candidate pairs -> verified edges, MEMOIZED per
    sf_dir: four pair queries (jaccard/simhash/containment/substring
    callers) share one materialized edge table instead of recomputing
    the signature pipeline each time."""
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import compute_signatures
    from gencore_ray.stages.lsh import candidate_pairs
    from gencore_ray.stages.verify import verified_edges

    import ray

    cfg = DedupConfig()
    # cache entries hold object-store refs — valid only within the Ray
    # session that created them; rebuild if the driver restarted (the
    # node id is session-unique for local sessions, unlike the job id)
    job = ray.get_runtime_context().get_node_id() if ray.is_initialized() else None
    hit = _SIG_EDGES_CACHE.get(sf_dir)
    if hit is not None and hit[0] == job:
        return hit[1], cfg
    sig = compute_signatures(_docs_as_pages(sf_dir), cfg).materialize()
    pairs = candidate_pairs(sig, cfg, num_parts=16)
    edges = verified_edges(pairs, sig, cfg).materialize()
    _SIG_EDGES_CACHE[sf_dir] = (job, edges)
    return edges, cfg


def _canon_pairs(ds):
    """Orient each edge lexicographically (url_a < url_b): engine pair
    orientation is uint64-hash order, the SQL oracle's is doc_id order."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df["url_a"].to_numpy(), df["url_b"].to_numpy()
        swap = a > b
        df = df.copy(deep=False)
        df["url_a"] = np.where(swap, b, a)
        df["url_b"] = np.where(swap, a, b)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def _q_simhash_near_pairs(sf_dir: str):
    edges, cfg = _sig_edges(sf_dir)
    out = edges.filter(expr=f"hamming <= {cfg.simhash_hamming_max}").select_columns(
        ["url_a", "url_b", "hamming"]
    )
    return _canon_pairs(out)


def _q_containment_pairs(sf_dir: str):
    edges, cfg = _sig_edges(sf_dir)
    out = edges.filter(expr=f"containment >= {cfg.containment_threshold}").select_columns(
        ["url_a", "url_b", "containment"]
    )
    return _round_cols(_canon_pairs(out), {"containment": 6})


def _q_ngram_jaccard_pairs(sf_dir: str):
    edges, cfg = _sig_edges(sf_dir)
    out = edges.filter(expr=f"jaccard >= {cfg.jaccard_threshold}").select_columns(
        ["url_a", "url_b", "jaccard"]
    )
    return _round_cols(_canon_pairs(out), {"jaccard": 6})


def _q_dup_pair_lang_matrix(sf_dir: str):
    """Cross-slice duplication monitor: verified near-dup pairs joined
    to each side's language and aggregated into a symmetric
    (lang_lo, lang_hi) pair-count matrix — which corpus slices
    duplicate into which (mirror sites across locales show up as
    off-diagonal mass).  Composition: the memoized edge table
    (_sig_edges) -> two slim int-keyed hash_joins against the
    (doc_id, lang) projection -> one tiny grouped aggregate; langs are
    canonically ordered so pair orientation cancels."""
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import hash_join

    edges, cfg = _sig_edges(sf_dir)
    dup = edges.filter(
        expr=f"jaccard >= {cfg.jaccard_threshold}"
    ).select_columns(["url_a", "url_b"])

    def parse_ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ia": df["url_a"].str[4:].astype(np.int64),
            "ib": df["url_b"].str[4:].astype(np.int64),
        })

    pairs = dup.map_batches(parse_ids, batch_format="pandas")
    docs = _docs(sf_dir).select_columns(["doc_id", "lang"])

    def side(name: str):
        def fn(df: pd.DataFrame, _n=name) -> pd.DataFrame:
            return pd.DataFrame({f"d_{_n}": df["doc_id"].to_numpy(np.int64),
                                 f"lang_{_n}": df["lang"]})
        return docs.map_batches(fn, batch_format="pandas")

    j = hash_join(pairs, side("a"), "ia", "d_a", num_parts=8)
    j = hash_join(j, side("b"), "ib", "d_b", num_parts=8)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df["lang_a"].to_numpy(dtype=object)
        b = df["lang_b"].to_numpy(dtype=object)
        return pd.DataFrame({"lang_lo": np.minimum(a, b),
                             "lang_hi": np.maximum(a, b)})

    return grouped_aggregate(
        j.map_batches(canon, batch_format="pandas"),
        ["lang_lo", "lang_hi"], [("n_pairs", None, "count")], num_parts=4)


def _q_doc_quality_scores(sf_dir: str):
    from gencore_ray.ops.textstats import text_stats

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return text_stats(docs).select_columns(["doc_id", "quality"])


def _q_events_sessions(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.windows import session_windows

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return session_windows(ev, gap=pd.Timedelta(minutes=30))


def _q_events_value_buckets(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.intervals import interval_lookup_join
    from gencore_ray.ops.relational import grouped_aggregate

    buckets = pd.DataFrame(
        {"lo": [0.0, 50.0, 200.0], "hi": [50.0, 200.0, 1000.0],
         "label": ["low", "mid", "high"]}
    )
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    lab = interval_lookup_join(ev, buckets, "value", label_col="bucket")
    out = grouped_aggregate(
        lab, ["bucket"],
        [("n_events", None, "count"), ("total_value", "value", "sum")],
        num_parts=4,
    )
    return _round_cols(out, {"total_value": 6})


def _q_user_running_totals(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.windows import running_totals

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = running_totals(ev).select_columns(["event_id", "user_id", "running_value"])
    return _round_cols(out, {"running_value": 6})


def _q_events_daily_user(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.windows import tumbling_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    out = tumbling_window_agg(ev, width="1d")
    return _round_cols(out, {"total_value": 6})


def _q_token_profile(sf_dir: str):
    """Token counting the way a training-data pipeline needs it:
    whitespace tokens AND a BPE-ish (GPT-2-shape) pre-token count."""
    from gencore_ray.functions.text import bpe_token_counts, ws_token_counts

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "bpe_tokens": pa.array(bpe_token_counts(texts)),
            "ws_tokens": pa.array(ws_token_counts(texts)),
        })

    return docs.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


def _q_top_ngrams(sf_dir: str):
    from gencore_ray.ops.relational import top_ngrams

    docs = _docs(sf_dir).select_columns(["text"])
    return top_ngrams(docs, n=5, k=20)


def _q_events_value_quantiles(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles(
        ev, ["event_type"], "value",
        [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)], num_parts=8,
    )


def _q_customers_without_orders(sf_dir: str):
    """Distributed ANTI join (existence check, right payload never
    moves) — TPC-H Q22 flavour: customers with no high-value order.
    The row filter is pushed into the parquet read."""
    import pyarrow.compute as pc
    import ray.data as rd

    from gencore_ray.stages.shuffle import hash_join

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    big_orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=(pc.field("o_totalprice") > 300000.0),
    )
    return hash_join(cust, big_orders, "c_custkey", "o_custkey",
                     num_parts=8, how="anti")


def _q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT) per group: global distinct via one
    user-keyed exchange, then a pre-aggregated count — the two-level
    shape that survives high-cardinality keys at scale."""
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import dedupe_rows

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    distinct = dedupe_rows(ev, ["user_id", "event_type"], num_parts=16)
    return grouped_aggregate(
        distinct, ["event_type"], [("n_users", None, "count")], num_parts=4
    )


def _q_events_hopping_3h(sf_dir: str):
    import ray.data as rd

    from gencore_ray.ops.windows import hopping_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    return hopping_window_agg(ev, width_hours=3, hop_hours=1)


def _q_top_docs_per_lang(sf_dir: str):
    from gencore_ray.ops.relational import top_k_per_group

    docs = _docs(sf_dir).select_columns(["lang", "doc_id", "n_chars"])
    return top_k_per_group(
        docs, ["lang"], ["n_chars", "doc_id"], k=3, descending=[True, False],
        num_parts=4,
    )


def _q_stratified_doc_sample(sf_dir: str):
    """Deterministic per-source sample (multiplicative-hash order) —
    the reproducible-sampling story for curriculum/eval splits."""
    from gencore_ray.ops.relational import stratified_sample

    docs = _docs(sf_dir).select_columns(["source", "doc_id"])
    return stratified_sample(docs, ["source"], "doc_id", n_per_key=5, num_parts=4)


def _q_substring_dup_pairs(sf_dir: str):
    """Exact substring dups: sketch-containment candidates verified by
    a true `shorter in longer` check (north_star's suffix-array pass,
    re-expressed; see ops/substrings.py)."""
    from gencore_ray.ops.substrings import substring_dup_pairs

    return substring_dup_pairs(_docs_as_pages(sf_dir))


def _q_media_decode_real(sf_dir: str):
    """REAL image decode, SQL-verified: every doc gets a deterministic
    PNG (dims and a gradient fill derived from doc_id), the stage
    decodes it through the actual zlib+unfilter path
    (gencore_ray/functions/codecs.py), and the oracle recomputes the
    expected width/height/mean arithmetically — a hash match proves the
    decoder recovered the exact pixels, not just the header."""
    from gencore_ray.functions.codecs import encode_png
    from gencore_ray.ops.multimodal import decode_media

    docs = _docs(sf_dir).select_columns(["doc_id"])

    def to_png(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids:
            w, h = int(did) % 16 + 1, int(did) % 12 + 1
            k = np.arange(w * h * 3, dtype=np.int64)
            px = ((int(did) + k) % 256).astype(np.uint8).reshape(h, w, 3)
            payloads.append(encode_png(px))
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    media = docs.map_batches(to_png, batch_format="pyarrow", zero_copy_batch=True)
    return decode_media(media, strict=True).select_columns(
        ["doc_id", "width", "height", "mean_value"]
    )


def _q_events_asof_click(sf_dir: str):
    """Backward as-of join (SQL ASOF LEFT JOIN): every event enriched
    with the most recent prior-or-equal click value of the same user —
    the event-stream enrichment pattern the Dataset API lacks; one
    user-keyed exchange + vectorized merge_asof per partition."""
    import ray.data as rd

    from gencore_ray.ops.relational import asof_join, grouped_aggregate

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value", "event_type"],
    )
    clicks = grouped_aggregate(
        ev.filter(expr="event_type == 'click'"),
        ["user_id", "ts"], [("prior_click_value", "value", "max")],
        num_parts=8,
    )
    left = ev.select_columns(["event_id", "user_id", "ts", "value"])
    return asof_join(left, clicks, by="user_id", on="ts", num_parts=8)


def _q_events_lag_lead(sf_dir: str):
    """SQL LAG/LEAD window: previous/next event value per user in
    (ts, event_id) order — one user-keyed exchange, vectorized group
    shifts per partition."""
    import ray.data as rd

    from gencore_ray.ops.windows import lag_lead

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return lag_lead(ev, num_parts=8).select_columns(
        ["event_id", "user_id", "ts", "value", "prev_value", "next_value"]
    )


def _q_doc_ranks_per_lang(sf_dir: str):
    """SQL window ranks (ROW_NUMBER/RANK/DENSE_RANK) per language over
    document length — the 'best docs per domain' curation primitive."""
    from gencore_ray.ops.relational import group_ranks

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"])
    return group_ranks(docs, "lang", "n_chars", "doc_id", num_parts=8)


def _q_doc_length_ntile(sf_dir: str):
    """Exact NTILE(8) global equi-depth length tiers without a global
    sort: broadcast cumulative counts per distinct length + one
    length-keyed exchange (see ops/relational.ntile)."""
    from gencore_ray.ops.relational import ntile

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    return ntile(docs, "n_chars", "doc_id", 8, num_parts=8)


def _q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, user_id): all prefix levels + grand
    total from ONE pass over the input (coarser levels re-aggregate the
    compact finest result)."""
    import ray.data as rd

    from gencore_ray.ops.relational import rollup_aggregate

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )
    return rollup_aggregate(
        ev, ["event_type", "user_id"],
        [("n", None, "count"), ("max_value", "value", "max")],
        num_parts=8,
    )


def _q_users_click_purchase_outer(sf_dir: str):
    """FULL OUTER JOIN of per-user click vs purchase counts — users on
    either side survive with nulls on the other (hash_join full_outer
    coalesces the key)."""
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import hash_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    clicks = grouped_aggregate(
        ev.filter(expr="event_type == 'click'"),
        ["user_id"], [("click_n", None, "count")], num_parts=8,
    )
    purchases = grouped_aggregate(
        ev.filter(expr="event_type == 'purchase'"),
        ["user_id"], [("purchase_n", None, "count")], num_parts=8,
    )
    return hash_join(clicks, purchases, "user_id", "user_id",
                     num_parts=8, how="full_outer")


def _q_user_event_pivot(sf_dir: str):
    """Long->wide pivot: per-user count columns per event type
    (conditional aggregation; one slim partial row per key/batch)."""
    import ray.data as rd

    from gencore_ray.ops.relational import pivot_counts

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return pivot_counts(
        ev, "user_id", "event_type",
        ["click", "view", "purchase", "signup", "error"], num_parts=8,
    )


def _q_events_winsorized(sf_dir: str):
    """Per-type winsorization: clip each event value to its type's
    exact [p05, p95] quantiles (broadcast quantile table, map-side
    clip)."""
    import ray.data as rd

    from gencore_ray.ops.relational import winsorize_by_group

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    return winsorize_by_group(ev, "event_type", "value", 0.05, 0.95,
                              num_parts=8)


def _q_repetition_profile(sf_dir: str):
    """Gopher-style repetition filters (dup-line fraction, top-bigram
    fraction) — the standard pre-training quality signals, hash-counted
    in one vectorized pass and SQL-replayed exactly."""
    from gencore_ray.ops.textstats import repetition_profile

    return repetition_profile(_docs(sf_dir))


def _q_curation_pipeline(sf_dir: str):
    """End-to-end curation verdict: exact-dup hash exchange + Gopher
    rules + unigram-LM perplexity threshold, stitched by slim id-keyed
    joins into one keep/reason row per doc (priority: exact_dup >
    gopher rule > high_perplexity).  Every stage is independently
    oracled; this query proves the COMPOSITION."""
    from gencore_ray.pipelines.curate import curate_documents

    return curate_documents(_docs(sf_dir), ppl_threshold=31.0,
                            vocab_cap=1000, num_parts=8)


def _q_line_dedup(sf_dir: str):
    """CCNet-style cross-doc line dedup: every line occurring in >= 3
    distinct docs is boilerplate and removed from all of them; cleaned
    text reassembled in line order.  Two shuffles, no driver state.
    The corpus has no naturally-shared lines, so the query plants a
    deterministic cookie banner (even doc_ids) and footer (doc_id % 3)
    that the SQL oracle replays — the hash match proves removal AND
    byte-exact reassembly of the untouched lines."""
    from gencore_ray.ops.linedup import line_dedup

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        txt = [x or "" for x in t["text"].to_pylist()]
        out = [
            ("cookie banner\n" + s if i % 2 == 0 else s)
            + ("\nsite footer" if i % 3 == 0 else "")
            for i, s in zip(ids, txt)
        ]
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(out, pa.string())})

    return line_dedup(_docs(sf_dir).map_batches(plant, batch_format="pyarrow"),
                      min_docs=3, num_parts=8)


def _q_grouped_line_dedup(sf_dir: str):
    """Domain-scoped boilerplate removal (line_dedup with
    group_col='lang' as the domain proxy): a line must be frequent
    WITHIN its group to be removed — CCNet dedups per shard because
    boilerplate is domain-local.  The planted banner 'promo <lang>' is
    frequent in every lang (removed); 'rare note' is planted sparsely
    (doc_id % 101 < 2) so it stays under the per-lang threshold in
    most languages while its CORPUS-wide count is far above it — the
    exact case a global count gets wrong."""
    from gencore_ray.ops.linedup import line_dedup

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        txt = [x or "" for x in t["text"].to_pylist()]
        out = [
            (f"promo {g}\n" if i % 2 == 0 else "") + s
            + ("\nrare note" if i % 101 < 2 else "")
            for i, g, s in zip(ids, langs, txt)
        ]
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "text": pa.array(out, pa.string())})

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "text"])
    return line_dedup(docs.map_batches(plant, batch_format="pyarrow"),
                      min_docs=3, num_parts=8, group_col="lang")


def _q_nb_lang_classifier(sf_dir: str):
    """Model-based filtering (fasttext-style, dependency-free):
    Gaussian Naive Bayes fit on (text_len, alnum_count, token_count)
    to predict lang='en', then per-doc log-odds scoring.  Closed-form
    fit = one aggregate pass, so the full fit+score path is
    SQL-replayed exactly."""
    import pyarrow.compute as pc
    import ray.data as rd

    from gencore_ray.ops.classifier import gaussian_nb_scores
    from gencore_ray.ops.textstats import text_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    feat = text_stats(docs, with_heuristics=False)

    def label(t: pa.Table) -> pa.Table:
        return t.append_column("is_en", pc.equal(t["lang"], "en"))

    feat = feat.map_batches(label, batch_format="pyarrow")
    return gaussian_nb_scores(
        feat, ["text_len", "alnum_count", "token_count"], "is_en")


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means-bucketed exact near-dup
    pairs — the O(n^2/k) scale path for embedding dedup.  The corpus
    has no true near-identical pairs (max cos 0.513), so the query
    deterministically plants 20 exact duplicates (vec_id+10000 copies
    of vec_id<20) — an augmentation the SQL oracle replays verbatim;
    at threshold 0.95 the output is exactly those 20 pairs, proving
    fit + assign + within-cluster verify end-to-end."""
    import pyarrow.compute as pc
    import ray.data as rd

    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    base = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") < 500),
    )
    dup = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") < 20),
    ).map_batches(
        lambda t: pa.table({"vec_id": pc.add(t["vec_id"], 10000),
                            "embedding": t["embedding"]}),
        batch_format="pyarrow",
    )
    return semantic_dedup_pairs(base.union(dup), threshold=0.95,
                                k=8, iters=5, num_parts=8)


def _q_doc_hash_embeddings(sf_dir: str):
    """Text -> embedding inside a STATEFUL actor pool (ST1: model
    setup in __init__ once per actor, batched inference in __call__ —
    the reference-genome-singleton analogue,
    /root/reference/src/reference.cpp:4-11).  The stand-in model is
    the signed hashing trick over md5-low64 token hashes, integer-
    exact, so the SQL oracle replays it with md5_number_lower.
    Output: first 8 components + the L2^2 norm (all BIGINT)."""
    import numpy as np
    import pandas as pd

    from gencore_ray.functions.embed import embed_texts

    emb = embed_texts(_docs(sf_dir).select_columns(["doc_id", "text"]),
                      dim=64, concurrency=(1, 4))

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 **{f"e{j}": pd.Series(dtype=np.int64)
                                    for j in range(8)},
                                 "norm2": pd.Series(dtype=np.int64)})
        m = np.stack(df["embedding"].to_numpy()).astype(np.int64)
        out = {"doc_id": df["doc_id"].to_numpy()}
        for j in range(8):
            out[f"e{j}"] = m[:, j]
        out["norm2"] = (m * m).sum(axis=1)
        return pd.DataFrame(out)

    return emb.map_batches(widen, batch_format="pandas")


def _q_embed_semantic_dedup(sf_dir: str):
    """The full SemDeDup chain FROM TEXT: actor-pool embed (hashing
    model) -> k-means blocking (probes=2 boundary insurance) ->
    exact within-cluster cosine.  Plants 20 near-identical copies
    (doc_id+100000, one token appended) the SQL oracle replays, then
    brute-forces all pairs >= 0.95 — the blocked engine must find the
    identical pair set.  0.95 is the regime SemDeDup is FOR: at 0.9
    this corpus has borderline pairs that straddle clusters even with
    probes=2 (measured: 15/183 missed), exactly the documented recall
    cliff; at 0.95 probes=3 is measured-exact at both sf0.01 and
    sf0.1 — the oracle keeps the engine honest about where blocking
    is exact."""
    import pyarrow.compute as pc
    import ray.data as rd

    from gencore_ray.functions.embed import embed_texts
    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    base = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    dup = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < 20),
    ).map_batches(
        lambda t: pa.table({
            "doc_id": pc.add(t["doc_id"], 100000),
            "text": pc.binary_join_element_wise(
                pc.cast(t["text"], pa.string()), " zzqx", ""),
        }),
        batch_format="pyarrow",
    )
    emb = embed_texts(base.union(dup), dim=64, concurrency=(1, 4))
    return semantic_dedup_pairs(emb, threshold=0.95, k=8, iters=5,
                                id_col="doc_id", vec_col="embedding",
                                num_parts=8, probes=3)


def _q_curation_adaptive(sf_dir: str):
    """Curation with the ADAPTIVE perplexity gate: the threshold is the
    corpus's own 90th perplexity percentile (CCNet tail-drop form) —
    the SQL oracle recomputes it with quantile_cont."""
    from gencore_ray.pipelines.curate import curate_documents

    return curate_documents(_docs(sf_dir), ppl_threshold=None,
                            ppl_drop_frac=0.1, vocab_cap=1000, num_parts=8)


def _q_snapshot_diff(sf_dir: str):
    """Corpus-version diff (added/removed/changed/unchanged by content
    hash, slim full-outer exchange): the new snapshot is a
    deterministic mutation of documents the SQL oracle replays —
    doc_id%20==0 dropped, doc_id%7==0 text-modified, 10 new ids."""
    import ray.data as rd

    from gencore_ray.ops.relational import snapshot_diff

    old = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])

    def mutate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = ids % 20 != 0
        txt = [x or "" for x in t["text"].to_pylist()]
        out_t = [s + " v2" if i % 7 == 0 else s for i, s in zip(ids, txt)]
        base = pa.table({"doc_id": pa.array(ids[keep]),
                         "text": pa.array([out_t[j] for j in np.flatnonzero(keep)],
                                          pa.string())})
        addmask = ids < 10
        added = pa.table({"doc_id": pa.array(ids[addmask] + 100000),
                          "text": pa.array([txt[j] for j in np.flatnonzero(addmask)],
                                           pa.string())})
        return pa.concat_tables([base, added])

    new = old.map_batches(mutate, batch_format="pyarrow")
    return snapshot_diff(old, new, num_parts=8)


def _q_lang_source_agreement(sf_dir: str):
    """Pair-counting clustering agreement (Rand / Adjusted Rand) between
    the lang and source labelings — the dedup-evaluation primitive
    (score predicted clusters against truth), demonstrated on the two
    categorical labelings the corpus ships."""
    import ray.data as rd

    from gencore_ray.ops.relational import pair_agreement_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])
    return pair_agreement_stats(docs, "lang", "source", num_parts=4)


def _q_ann_ivf_persisted(sf_dir: str):
    """Persisted-IVF retrieval: build the hive-partitioned index into a
    fresh temp dir, query with nprobe == n_clusters — path-pruned read
    must reproduce the exact brute-force top-k (same SQL oracle)."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from gencore_ray.ops.ann import ivf_build, ivf_query

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    q = np.asarray(t.loc[t["vec_id"] == 0, "embedding"].iloc[0],
                   dtype=np.float64)
    idx_dir = tempfile.mkdtemp(prefix="ivfidx_", dir="/tmp")
    ivf_build(emb, idx_dir, n_clusters=8)
    return ivf_query(idx_dir, q, k=10, nprobe=8)


def _q_events_profile(sf_dir: str):
    """Table profiling: per-column rows/nulls/exact-distinct + numeric
    min/max over events — one pass + one slim value-hash exchange."""
    import ray.data as rd

    from gencore_ray.ops.relational import profile_columns

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )
    return profile_columns(ev, ["event_id", "user_id", "event_type", "value"],
                           num_parts=8)


def _q_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail: per-language perplexity tertiles over
    the rounded per-doc perplexity, broadcast-threshold assignment."""
    from gencore_ray.ops.lm import ppl_buckets

    return ppl_buckets(_docs(sf_dir), vocab_cap=1000, num_parts=8)


def _q_span_dedup_rewrite(sf_dir: str):
    """Lee et al. exact-substring dedup as a transform: cut every token
    covered by an 8-gram owned by a smaller doc_id, reassemble the
    survivors (the corpus has ~1000 natural cross-doc 8-grams)."""
    from gencore_ray.ops.substrings import span_dedup_rewrite

    return span_dedup_rewrite(_docs(sf_dir), span_tokens=8, num_parts=8)


def _q_lm_perplexity(sf_dir: str):
    """CCNet-style corpus-LM quality scoring: top-1000-vocab unigram
    LM (add-1 smoothing, <unk> fold) fit by one token-count exchange,
    broadcast once, per-doc perplexity in a pure scoring map."""
    from gencore_ray.ops.lm import lm_unigram_perplexity

    return lm_unigram_perplexity(_docs(sf_dir), vocab_cap=1000, num_parts=8)


def _q_duplicate_span_stats(sf_dir: str):
    """Lee et al. 2022 exact-substring-dedup signal, per doc: fraction
    of 8-token sliding windows whose gram occurs in >= 1 OTHER doc.
    Pure shuffle (gram-keyed then id-keyed exchange), no driver state."""
    from gencore_ray.ops.substrings import duplicate_span_stats

    return duplicate_span_stats(_docs(sf_dir), span_tokens=8, num_parts=8)


def _q_embedding_covariance(sf_dir: str):
    """Distributed PCA's SQL-replayable surface: the d x d sample
    covariance of the embedding table from ONE streaming pass of
    (n, sum, outer-product-sum) partials with 16:1 worker pre-merge —
    the driver folds O(d^2) state, never vectors."""
    import ray.data as rd

    from gencore_ray.ops.pca import embedding_covariance

    return embedding_covariance(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["embedding"]))


def _q_pca_explained_variance(sf_dir: str):
    """Top-8 principal components of the embedding table: eigenvalue
    + explained-variance fraction (driver-side O(d^3) eigh on the
    folded covariance; corpus-size-independent).  Engine-only: the
    eigendecomposition is not SQL-expressible — pinned by
    tests/test_pca.py against direct numpy."""
    import pandas as pd
    import ray.data as rd

    from gencore_ray.ops.pca import pca_fit

    model = pca_fit(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"]),
                    n_components=8)
    import numpy as np

    return pd.DataFrame({
        "component": np.arange(8, dtype=np.int64),
        "eigenvalue": np.round(model["eigenvalues"], 6),
        "explained_frac": np.round(model["explained_frac"], 6),
    })


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training over the documents table:
    40 merges learned from the top-2000-word frequency table (one
    corpus exchange; the merge loop is vocabulary-bounded, i.e.
    corpus-size-independent).  Engine-only: the per-iteration argmax
    loop is not SQL-expressible — pinned by tests/test_bpe.py against
    an independent reference implementation."""
    from gencore_ray.ops.bpe import bpe_train

    return bpe_train(_docs(sf_dir), n_merges=40, top_words=2000,
                     num_parts=8)


def _q_suffix_array_spans(sf_dir: str):
    """The same cross-doc 8-token dup-window signal computed by a
    depth-capped distributed SUFFIX ARRAY (Manber-Myers prefix
    doubling as log2(L) join+group exchanges) instead of window
    hashing — exact token-sequence equality, no hash anywhere above
    single tokens.  Shares duplicate_span_stats' SQL oracle: one
    truth, two algorithms."""
    from gencore_ray.ops.suffix import suffix_array_spans

    return suffix_array_spans(_docs(sf_dir), span_tokens=8, num_parts=8)


def _q_winnow_fingerprints(sf_dir: str):
    """MOSS winnowing fingerprint density per doc (Schleimer et al.
    2003): k=4-token grams, window w=4, min-hash-rightmost-tie
    selection.  Doc-local map, no exchange; selection (including
    tie-breaks) is SQL-replayed exactly via md5_number_lower +
    HUGEINT tie encoding."""
    from gencore_ray.ops.winnow import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir), k=4, w=4)


def _q_winnow_dup_pairs(sf_dir: str):
    """Doc pairs sharing >= 2 winnowing fingerprints (guaranteed to
    catch any shared run of >= k+w-1 = 7 tokens).  Exchange mass is
    ~1/w of the gram count — the slim alternative to the full window
    explode of duplicate_span_stats."""
    from gencore_ray.ops.winnow import winnow_dup_pairs

    return winnow_dup_pairs(_docs(sf_dir), k=4, w=4, min_shared=2,
                            num_parts=8)


def _q_corpus_filter(sf_dir: str):
    """Gopher-rules pre-training corpus filter (Rae et al. 2021 §A1.1):
    per-doc keep/drop verdict + first-failing-rule reason over token
    count, mean word length, alnum ratio, duplicate-line fraction and
    top-bigram fraction — one vectorized map, SQL-replayed exactly."""
    from gencore_ray.ops.textstats import corpus_filter

    return corpus_filter(_docs(sf_dir))


def _q_multimodal_features(sf_dir: str):
    from gencore_ray.ops.multimodal import decode_media

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payload = pa.array(
            [(x or "").encode() for x in t["text"].to_pylist()], pa.binary()
        )
        return pa.table({"doc_id": t["doc_id"], "payload": payload})

    media = docs.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    # SQL-checkable projection (byte_len == octet_length); the full
    # feature schema (content_hash, width, height, n_frames) is covered
    # by tests/test_ops.py::test_multimodal_decode_stub
    return decode_media(media).select_columns(["doc_id", "byte_len"])


def _pages_cache(sf_dir: str) -> str:
    """Deterministic synthesized pages corpus cached under /tmp —
    built on first touch (called from BOTH queries() callables and
    oracle_sql(), so the parquet exists regardless of which side the
    driver evaluates first)."""
    from gencore_ray.corpus import write_pages_corpus

    n = 1500 if "0.01" in sf_dir else 400
    cache = f"/tmp/gencore_pages_{n}_s42_v4"
    if not os.path.exists(os.path.join(cache, "pages.parquet")):
        write_pages_corpus(cache, n_pages=n, seed=42)
    return cache


def _q_pages_dedup_pipeline(sf_dir: str):
    """Full pipeline incl. HTML extraction on the synthesized pages
    corpus (deterministic, cached under /tmp)."""
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.sources import read_pages

    cache = _pages_cache(sf_dir)
    pages = read_pages(os.path.join(cache, "pages.parquet"), need_html=True)
    res = dedup_pages(pages, DedupConfig(), extract_html=True)
    return res.clusters.select_columns(
        ["url", "cluster_id", "cluster_size", "is_representative"]
    )


def _q_pages_dedup_sql(sf_dir: str):
    """The SQL-checkable pages pipeline: HTML extraction + signatures +
    LSH + verify + CC + election with ``simhash_enabled=False`` (the
    Hamming pass is the one non-SQL-expressible edge source).  The
    oracle reads the corpus's ground-truth ``text`` column while the
    engine re-derives text FROM THE HTML — a hash match therefore
    proves byte-identical extraction through the whole pipeline.

    The corpus is synthetic (not derived from the sf tables), and the
    oracle string is fixed at registration time, so BOTH sides pin the
    same 1500-page corpus regardless of sf_dir."""
    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.sources import read_pages

    cache = _pages_cache("/root/testdata/sf0.01")
    pages = read_pages(os.path.join(cache, "pages.parquet"), need_html=True)
    cfg = DedupConfig(simhash_enabled=False)
    res = dedup_pages(pages, cfg, extract_html=True)
    return res.clusters.select_columns(
        ["url", "cluster_id", "cluster_size", "is_representative"]
    )


def _q_dedup_recall(sf_dir: str):
    """The north rule's dup-pair recall >= 0.99 as a first-class
    MEASURED query: flagship clusters (simhash_enabled=False, the
    SQL-expressible config) joined to the corpus ground truth, pair
    counts folded from grouped sizes (sum of C(n,2) per true / engine
    / joint cluster — fully distributed, no pair materialization).
    The oracle recomputes clusters AND the metric in SQL, so a hash
    match certifies the recall number itself, not just the clusters."""
    import pandas as pd
    import ray.data as rd

    from gencore_ray.config import DedupConfig
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.sources import read_pages
    from gencore_ray.stages.shuffle import hash_join

    cache = _pages_cache("/root/testdata/sf0.01")
    pages = read_pages(os.path.join(cache, "pages.parquet"), need_html=True)
    res = dedup_pages(pages, DedupConfig(simhash_enabled=False),
                      extract_html=True)
    clusters = res.clusters.select_columns(["url", "cluster_id"])
    truth = rd.read_parquet(os.path.join(cache, "truth.parquet"),
                            columns=["url", "true_cluster"])
    # clusters' blocks are pandas (elect output) — rename the arrow
    # truth side instead
    j = hash_join(clusters, truth.rename_columns({"url": "u2"}),
                  "url", "u2", num_parts=8).materialize()

    def pair_sum(keys: list[str]) -> int:
        counts = grouped_aggregate(j, keys, [("c", None, "count")],
                                   num_parts=8)

        def comb(t: pa.Table) -> pa.Table:
            import numpy as np

            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"p": [int((c * (c - 1) // 2).sum())]})

        return int(counts.map_batches(comb, batch_format="pyarrow")
                   .sum("p") or 0)

    tp = pair_sum(["true_cluster"])
    ep = pair_sum(["cluster_id"])
    mp = pair_sum(["true_cluster", "cluster_id"])
    return pd.DataFrame(
        {
            "true_pairs": [tp],
            "engine_pairs": [ep],
            "matched_pairs": [mp],
            "recall": [round(mp / tp, 6) if tp else 1.0],
            "pair_precision": [round(mp / ep, 6) if ep else 1.0],
        }
    )


def _q_events_value_corr(sf_dir: str):
    """Per-type second-order profile: count, means, sample stddevs and
    the Pearson correlation of value vs hour-of-day — ONE pass of
    6-number partial sums per (key, batch), closed forms at the merge."""
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_moments

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.hour.astype(np.float64)
        return df

    withh = ev.map_batches(add_hour, batch_format="pandas")
    return grouped_moments(withh, ["event_type"], "value", "hour",
                           num_parts=8)


def _q_tfidf_top_terms(sf_dir: str):
    """Top-5 TF-IDF terms per document (keyword extraction): compact
    DF exchange + broadcast, scoring and per-doc top-k map-side."""
    from gencore_ray.ops.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir).select_columns(["doc_id", "text"]),
                           k=5, num_parts=8)


def _q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day_part): all four grouping sets from
    ONE pass over the input (subsets re-aggregate the compact finest
    level); grouping_id carries SQL GROUPING() bit semantics."""
    import ray.data as rd

    from gencore_ray.ops.relational import cube_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def add_day_part(df: pd.DataFrame) -> pd.DataFrame:
        df["day_part"] = (df["ts"].dt.hour // 6).astype(np.int64)
        return df[["event_type", "day_part", "value"]]

    withp = ev.map_batches(add_day_part, batch_format="pandas")
    return cube_aggregate(
        withp, ["event_type", "day_part"],
        [("n", None, "count"), ("min_value", "value", "min"),
         ("max_value", "value", "max")],
        num_parts=8,
    )


def _q_weighted_doc_sample(sf_dir: str):
    """Deterministic weight-proportional sample (priority sampling):
    200 docs drawn proportionally to length, bit-replayable in SQL."""
    from gencore_ray.ops.relational import priority_sample

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    return priority_sample(docs, "doc_id", "n_chars", k=200)


def _q_props_k_stats(sf_dir: str):
    """Vectorised JSON-field extraction (props -> int k) + bucketed
    aggregate — metadata profiling without a per-row JSON parse."""
    import ray.data as rd

    from gencore_ray.ops.jsonops import json_int_field
    from gencore_ray.ops.relational import grouped_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["props", "value"])
    withk = json_int_field(ev, "props", "k", "k")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["k"].notna()]
        return pd.DataFrame({
            "k_bucket": (df["k"].astype("int64") // 10),
            "value": df["value"],
        })

    b = withk.map_batches(bucket, batch_format="pandas")
    agg = grouped_aggregate(
        b, ["k_bucket"],
        [("n_events", None, "count"), ("avg_value", "value", "mean")],
        num_parts=8,
    )
    return _round_cols(agg, {"avg_value": 6})


def _q_doc_len_quantiles_by_lang(sf_dir: str):
    """EXACT per-language length quantiles via value-count compaction —
    the shuffle moves one row per distinct (lang, n_chars), not per doc."""
    from gencore_ray.ops.relational import grouped_quantiles_compact

    docs = _docs(sf_dir).select_columns(["lang", "n_chars"])
    return grouped_quantiles_compact(
        docs, ["lang"], "n_chars",
        [("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p95", 0.95)],
        num_parts=8,
    )


def _q_bm25_search(sf_dir: str):
    from gencore_ray.ops.search import bm25_topk

    return bm25_topk(_docs(sf_dir), ["hash", "join", "dup"], k=10)


def _q_heavy_hitter_tokens(sf_dir: str):
    # capacity 256 >> the corpus vocabulary, so the MG sketch is exact
    # (max_err == 0) and the SQL GROUP BY replays it; the approximate
    # regime (capacity < vocab) is bound-tested in tests/test_sketch.py
    from gencore_ray.functions.sketch import heavy_hitters

    out = heavy_hitters(
        _docs(sf_dir), "text", capacity=256, k=10, tokenize_text=True
    )
    assert out.attrs["max_err"] == 0
    return out


def _q_train_val_test_split(sf_dir: str):
    """Deterministic train/val/test split by doc_id hash
    (ops/split.py): a pure per-row map — the same key always lands in
    the same split at any cluster size / partitioning — aggregated to
    per-(split, lang) counts.  The CASE twin replays the exact
    md5_number_lower bucket cutoffs."""
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.ops.split import hash_split

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"])
    tagged = hash_split(docs, "doc_id", seed=42)
    return grouped_aggregate(
        tagged,
        ["split", "lang"],
        [("n_docs", None, "count"), ("total_chars", "n_chars", "sum")],
        num_parts=8,
    )


# decomposed-unicode suffix planted on every doc so NFC has real work:
# combining acute (U+0301), angstrom sign (U+212B -> NFC U+00C5), a tab
# and doubled spaces exercise the whitespace collapse + trim
_NORM_SUFFIX = " café noÅrm\tend  "
_NORM_SUFFIX_SQL = (
    "' cafe' || chr(769) || ' no' || chr(8491) || 'rm' || chr(9) || 'end  '"
)


def _q_normalized_text_stats(sf_dir: str):
    """Unicode NFC + whitespace canonicalisation
    (functions/text.normalize_text_arrow): each doc gets a deterministic
    decomposed suffix, is normalized, and the md5 of the normalized
    bytes proves byte-identical cleanup vs DuckDB's nfc_normalize chain
    (the M1-style byte-exactness gate, applied to normalisation)."""
    import hashlib

    from gencore_ray.functions.text import normalize_text_arrow

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        aug = pc.binary_join_element_wise(
            t["text"].cast(pa.string()), _NORM_SUFFIX, ""
        )
        out = normalize_text_arrow(aug)
        md5s = [hashlib.md5(s.encode()).hexdigest() for s in out.to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_md5": pa.array(md5s, pa.string()),
                "norm_bytes": pc.binary_length(out.cast(pa.binary())),
                "changed": pc.not_equal(out, aug),
            }
        )

    return docs.map_batches(norm, batch_format="pyarrow")


def _q_edit_distance_pairs(sf_dir: str):
    """Exact Levenshtein audit (ops/editdist.py) over prefix-blocked
    candidate pairs: docs sharing the same 64-char prefix (the cheap
    blocking key) are paired and scored with the true edit distance on
    the first 240 chars — the reference's re-align-and-count audit of
    grouped reads (/root/reference/src/pair.cpp:70-126), as SQL
    ``levenshtein`` replays byte-for-byte."""
    from gencore_ray.ops.editdist import pair_edit_distances
    from gencore_ray.stages.shuffle import hash_join

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def pfx(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": t["doc_id"],
             "pfx": pc.utf8_slice_codeunits(t["text"], 0, 64)}
        )

    keys = docs.map_batches(pfx, batch_format="pyarrow")
    pairs = hash_join(
        keys.rename_columns({"doc_id": "a"}),
        keys.rename_columns({"doc_id": "b", "pfx": "pfx2"}),
        "pfx", "pfx2", num_parts=8,
    ).filter(expr="a < b").select_columns(["a", "b"])
    return pair_edit_distances(docs, pairs, num_parts=8)


def _q_purchase_graph_pagerank(sf_dir: str):
    """Synchronous PageRank (ops/graph.py) over the customer-supplier
    purchase graph (orders x lineitem, both directions): broadcast rank
    vector + per-block pre-aggregated contributions, one exchange per
    iteration.  The oracle unrolls the 10 synchronous updates as
    chained CTEs — identical algebra, float64, rounded at 6."""
    import ray.data as rd

    from gencore_ray.ops.graph import pagerank
    from gencore_ray.stages.shuffle import hash_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    j = hash_join(li, orders, "l_orderkey", "o_orderkey", num_parts=8)

    def both_dirs(t: pa.Table) -> pa.Table:
        import numpy as np

        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([c * 2, s * 2 + 1])
        dst = np.concatenate([s * 2 + 1, c * 2])
        return pa.table({"src": src, "dst": dst})

    edges = j.map_batches(both_dirs, batch_format="pyarrow")
    ranks = pagerank(edges, damping=0.85, iters=10, num_parts=8)
    return _round_cols(ranks, {"rank": 6})


def _q_doc_chunks(sf_dir: str):
    """Fixed-size token chunking with overlap (ops/chunk.py): each doc
    split into 32-token windows advancing by 28 (4 tokens of shared
    context) — the long-document training/RAG layout.  A pure flat-map
    (no exchange); the oracle replays the exact layout with
    generate_series + list slicing."""
    from gencore_ray.ops.chunk import chunk_documents

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return chunk_documents(docs, chunk_tokens=32, overlap=4)


def _q_events_user_skew(sf_dir: str):
    """Key-skew profile (ops/skew.py) of the events-by-user exchange
    key: hottest-key share, top-10 share and the Herfindahl index from
    ONE per-key count exchange — the measurement that decides whether
    a shuffle key needs salting or capping before the wide op runs."""
    import ray.data as rd

    from gencore_ray.ops.skew import key_skew_profile

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return key_skew_profile(ev, "user_id", top=10, num_parts=8)


def _q_events_asof_join(sf_dir: str):
    """As-of join (ops/asof.py): each purchase event picks up the most
    recent prior-or-simultaneous click of the same user — the temporal
    lookup Ray Data lacks, built as one key-hashed exchange +
    ``pd.merge_asof`` per partition.  Right side pre-aggregated to
    unique (user, ts) so the match is deterministic (the as-of tie
    contract); oracle = DuckDB ``ASOF LEFT JOIN``."""
    import ray.data as rd

    from gencore_ray.ops.asof import asof_join
    from gencore_ray.ops.relational import grouped_aggregate

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts"]
    )
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["user_id", "ts", "value"]
    )
    clicks = grouped_aggregate(
        clicks, ["user_id", "ts"], [("last_click_value", "value", "max")],
        num_parts=16,
    )
    out = asof_join(purchases, clicks, key="user_id", ts_col="ts", num_parts=16)
    out = out.map_batches(
        lambda df: df.rename(columns={"ts_right": "last_click_ts"}),
        batch_format="pandas",
    )
    return _round_cols(out, {"last_click_value": 6})


def _q_events_sliding_1h(sf_dir: str):
    """RANGE-frame sliding window (ops/windows.py::sliding_range_agg):
    per user, count + integer value-sum of the trailing 1 hour at every
    event.  Exact-integer measure (floor(value)) because sliding-frame
    FLOAT sums are accumulation-order-dependent in any engine — the
    fixed-point discipline that makes the window bit-replayable."""
    import ray.data as rd

    from gencore_ray.ops.windows import sliding_range_agg

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = sliding_range_agg(ev, range_width=pd.Timedelta(hours=1), num_parts=16)
    return out.select_columns(["event_id", "win_n", "win_vsum", "win_avg"])


def _q_session_overlap_pairs(sf_dir: str):
    """Interval x interval overlap join (ops/intervals.py::
    interval_overlap_join): sessions (>= 2 events) that were active at
    the same moment as another user's session — domain-binned explode,
    one bin-keyed exchange, max-lo-bin ownership so each pair is
    emitted exactly once (no dedupe pass).  Session ids encoded
    user_id*1e6+session_id; the oracle replays sessionization AND the
    quadratic overlap join."""
    import numpy as np
    import ray.data as rd

    from gencore_ray.ops.intervals import interval_overlap_join
    from gencore_ray.ops.windows import session_windows

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    sess = session_windows(ev, gap=pd.Timedelta(minutes=30))

    def to_intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_events"] >= 2]
        return pd.DataFrame({
            "iv_id": df["user_id"].to_numpy(np.int64) * 1_000_000
            + df["session_id"].to_numpy(np.int64),
            "lo": df["session_start"].astype("datetime64[us]").astype("int64"),
            "hi": df["session_end"].astype("datetime64[us]").astype("int64"),
        })

    iv = sess.map_batches(to_intervals, batch_format="pandas")
    return interval_overlap_join(iv, None, num_parts=16)


def _q_embedding_knn_graph(sf_dir: str):
    """Exact kNN graph (ops/ann.py::knn_graph): per-vector top-5 cosine
    neighbours via block-pair partial top-k + one id-keyed merge
    exchange — per-task output is <= k rows per vector, never the n^2
    pair mass.  Round-6 scores with (score desc, id asc) tie order so a
    ROW_NUMBER window replays the selection exactly."""
    import ray.data as rd

    from gencore_ray.ops.ann import knn_graph

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.filter(expr="vec_id < 500")
    return knn_graph(emb, k=5, num_blocks=4, num_parts=8)


def _q_returned_item_report(sf_dir: str):
    """TPC-H Q10 shape — the multi-way join composition proof: lineitem
    (returned rows, revenue pre-aggregated per order BEFORE the join so
    the exchange carries one slim row per order) hash-joined to the
    date-windowed orders, re-keyed to customer in one partial+final
    aggregate, customer/nation attached by broadcast (small side never
    shuffles), then a global top-20.  Two wide exchanges total for a
    four-table query."""
    import ray.data as rd

    from gencore_ray.ops.relational import broadcast_join, grouped_aggregate, topk
    from gencore_ray.stages.shuffle import hash_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).filter(expr="l_returnflag == 'R'")

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "rev": df["l_extendedprice"].to_numpy()
            * (1.0 - df["l_discount"].to_numpy()),
        })

    li_per_order = grouped_aggregate(
        li.map_batches(rev, batch_format="pandas"),
        ["l_orderkey"], [("order_rev", "rev", "sum")], num_parts=8,
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def in_window(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= "1996-01-01") & (df["o_orderdate"] < "1996-07-01")
        return df.loc[m, ["o_orderkey", "o_custkey"]]

    orders = orders.map_batches(in_window, batch_format="pandas")
    j = hash_join(li_per_order, orders, "l_orderkey", "o_orderkey", num_parts=8)
    per_cust = grouped_aggregate(
        j.select_columns(["o_custkey", "order_rev"]), ["o_custkey"],
        [("revenue", "order_rev", "sum"), ("n_orders", None, "count")],
        num_parts=8,
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "c_name", "n_name"]
    ]
    out = broadcast_join(per_cust, dim, key="o_custkey", small_key="c_custkey")
    out = _round_cols(out, {"revenue": 2}).select_columns(
        ["o_custkey", "c_name", "n_name", "revenue", "n_orders"]
    )
    return topk(out, ["revenue", "o_custkey"], 20, descending=[True, False])


def _q_bpe_encode_stats(sf_dir: str):
    """Tokenizer train+apply end-to-end (ops/bpe.py): 60 BPE merges
    learned from the corpus word table, then the corpus encoded by an
    actor-pool BpeEncoder (ranks loaded once per actor — ST1) emitting
    per-doc word and subword counts.  Engine-only: the per-merge argmax
    loop and greedy adjacent-pair collapse are not SQL-expressible
    (same justification as bpe_merges); correctness pinned by
    tests/test_bpe.py against a sequential-replay reference."""
    from gencore_ray.ops.bpe import bpe_encode, bpe_train

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    merges = bpe_train(docs, n_merges=60, top_words=20_000)
    return bpe_encode(docs, merges, concurrency=(1, 8))


def _q_tfidf_cosine_pairs(sf_dir: str):
    """Sparse TF-IDF cosine pairs (ops/sparse.py): the inverted-index
    join — pairs generated term-by-term so cost is sum(df^2) over the
    df-pruned vocabulary, not n^2; stop terms (df > 20% of docs) are the
    pruning AND the hot-key guard.  Every float (idf, weights, norms,
    dot) replayed by the SQL twin; cosine rounded before the 0.5
    threshold so the cut is exact."""
    from gencore_ray.ops.sparse import tfidf_cosine_pairs

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return tfidf_cosine_pairs(docs, threshold=0.5, max_df=100, num_parts=16)


def _q_events_funnel(sf_dir: str):
    """Ordered conversion funnel (ops/funnel.py): view -> click ->
    purchase per user, each stage's first timestamp gated to be >= the
    previous stage's — one user-keyed exchange, stages as vectorised
    merge+groupby-min passes inside the partition.  Timestamps compare
    exactly, so the SQL chained-min-join twin hash-matches."""
    import ray.data as rd

    from gencore_ray.ops.funnel import funnel_stages

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_stages(ev, ["view", "click", "purchase"], num_parts=16)


def _q_events_quality_report(sf_dir: str):
    """Declarative constraint checking (ops/quality.py): five invariants
    over events verified in one pass + one slim exchange for the
    uniqueness check — violations travel as counters, never rows.
    Includes a deliberately failing accepted-values set and a
    cross-table foreign-key probe (user_id vs customer keys)."""
    import ray.data as rd

    from gencore_ray.ops.quality import constraint_report

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"])["c_custkey"].to_numpy()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet")
    return constraint_report(ev, [
        ("unique", ["event_id"]),
        ("not_null", "props"),
        ("accepted_values", "event_type", ["view", "click", "purchase"]),
        ("range", "value", 0.0, 500.0),
        ("foreign_key", "user_id", cust),
    ], num_parts=8)


def _q_events_customer_skew_join(sf_dir: str):
    """Skew-aware join (ops/skew.py::skew_join): left keys are counted
    first (slim exchange); keys above the threshold take the broadcast
    path (their row mass never rides an exchange), the rest take the
    partitioned hash join — the remedy the key_skew_profile measurement
    decides on.  Threshold deliberately low here so BOTH paths carry
    real rows; the SQL twin is the plain inner join (the split must be
    invisible in the result)."""
    import ray.data as rd

    from gencore_ray.ops.skew import skew_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])
    out = skew_join(ev, cust, "user_id", "c_custkey",
                    hot_threshold=2, num_parts=16)
    return out.select_columns(["event_id", "user_id", "value", "c_acctbal"])


def _q_source_token_divergence(sf_dir: str):
    """Corpus drift monitor (ops/drift.py): pairwise Jensen-Shannon
    divergence between per-source unigram distributions over the
    global top-2000 tokens — one (group, token)-keyed count exchange,
    then a vocabulary-bounded driver fold (the broadcast-LM O(V)
    shape).  Add-1 smoothing makes every log defined; the SQL twin
    replays counts, the deterministic top-V cut, the smoothed
    probabilities and the JS sum itself."""
    from gencore_ray.ops.drift import token_js_divergence

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "source"])
    return token_js_divergence(docs, group_col="source", top_vocab=2000,
                               num_parts=16)


def _q_doc_length_outliers(sf_dir: str):
    """Robust per-language length outliers (ops/relational.py::
    mad_outliers): modified z-score 0.6745*(v-median)/MAD — two exact
    quantile exchanges + broadcast joins, flagging map never
    re-shuffles the table.  Degenerate groups (MAD=0) contractually
    yield NULL mod_z, replayed by the SQL CASE."""
    from gencore_ray.ops.relational import mad_outliers

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"])
    out = mad_outliers(docs, "lang", "n_chars", z=3.5, num_parts=8)
    return out.select_columns(
        ["doc_id", "lang", "n_chars", "med", "mad", "mod_z", "is_outlier"])


def _q_user_retention_cohorts(sf_dir: str):
    """Cohort retention triangle (ops/windows.py::retention_cohorts):
    users bucketed by first-active day, counted per day-offset of later
    activity.  Per-user distinctness resolved inside the key-keyed
    partition (user rows co-locate), then one (cohort, offset) count
    aggregate — two slim exchanges total."""
    import ray.data as rd

    from gencore_ray.ops.windows import retention_cohorts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return retention_cohorts(ev, period="1d", num_parts=16)


def _q_doc_token_entropy(sf_dir: str):
    """Information-density signals (ops/textstats.py::token_entropy):
    per-doc unigram Shannon entropy (nats) + type/token ratio — a pure
    map with a sparse (row, token) unique-count fold per batch, never a
    dense docs x vocab matrix.  Empty docs contractually get zeros."""
    from gencore_ray.ops.textstats import token_entropy

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return token_entropy(docs)


def _q_top_session_paths(sf_dir: str):
    """Event-path mining (ops/funnel.py::top_session_paths): the 20
    most common event-type sequences over 30-min-gap sessions (first 5
    events, (ts, id)-ordered so ties are deterministic) — one user-keyed
    exchange does sessionisation AND path building; only short distinct
    path strings reach the count fold."""
    import ray.data as rd

    from gencore_ray.ops.funnel import top_session_paths

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])
    return top_session_paths(ev, gap=pd.Timedelta(minutes=30), max_len=5,
                             k=20, num_parts=16)


def _q_events_daily_filled(sf_dir: str):
    """Gap-filling resample (ops/windows.py::fill_period_gaps): dense
    per-user daily series with explicit zero rows between each user's
    first and last active day — output mass bounded by per-key
    activity span, never the global time range.  One user-keyed
    exchange; expansion is vectorised repeat/arange."""
    import ray.data as rd

    from gencore_ray.ops.windows import fill_period_gaps

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = fill_period_gaps(ev, period="1d", num_parts=16)
    return _round_cols(out, {"total_value": 6})


def _q_events_zorder_keys(sf_dir: str):
    """Z-order layout keys (ops/zorder.py): Morton-interleave
    (user_id, floor(value)) so a later sort+write co-locates rows close
    in BOTH dimensions — the min/max-pruning file layout for 2-D range
    scans.  Pure integer bit twiddling, replayed in SQL as a 32-term
    shift/mask sum."""
    import ray.data as rd

    from gencore_ray.ops.zorder import zorder_keys

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        # numpy % is floor-mod, SQL % is C-style: they only agree on
        # non-negative inputs, so negatives must fail loudly here
        if (df["user_id"].to_numpy() < 0).any() or (df["value"].to_numpy() < 0).any():
            raise ValueError("events_zorder_keys: negative inputs break "
                             "engine/SQL modulo parity")
        return pd.DataFrame({
            "event_id": df["event_id"],
            "a": df["user_id"].to_numpy() % 65536,
            "b": np.floor(df["value"].to_numpy()).astype(np.int64) % 65536,
        })

    keyed = zorder_keys(ev.map_batches(bucket, batch_format="pandas"),
                        "a", "b")
    return keyed.select_columns(["event_id", "zkey"])


def _q_events_type_hour_chi2(sf_dir: str):
    """Chi-square independence (ops/relational.py): is the event-type
    mix independent of hour-of-day?  One (type, hour)-keyed count
    exchange; the driver folds only the 5 x 24 contingency cells
    (expected counts over the FULL grid, absent cells observed 0)."""
    import ray.data as rd

    from gencore_ray.ops.relational import chi_square_independence

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "hh": df["ts"].dt.hour.astype("int64")})

    return chi_square_independence(
        ev.map_batches(hour, batch_format="pandas"), "event_type", "hh")


def _q_user_value_trends(sf_dir: str):
    """Per-user OLS trend of event value over time (ops/relational.py::
    grouped_linear_trend): closed-form regression from five moment sums
    in ONE partial+final aggregate — no per-group solver.  x is epoch
    hours (double), keeping slope magnitudes round-stable; the oracle
    replays the identical raw-moment formula (not regr_slope, whose
    streaming co-moment accumulation has a different error profile)."""
    import ray.data as rd

    from gencore_ray.ops.relational import grouped_linear_trend

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    REF = pd.Timestamp("2024-01-01").value // 1000  # epoch us

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        # hours since a FIXED recent reference: keeps x (and therefore
        # the intercept's extrapolation point) well-conditioned — epoch-0
        # hours put 50 years of lever arm on every rounding error
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({"user_id": df["user_id"],
                             "x": (us - REF) / 3.6e9,
                             "y": df["value"]})

    return grouped_linear_trend(
        ev.map_batches(xy, batch_format="pandas"), "user_id", "x", "y",
        num_parts=16, min_points=3)


def _q_weighted_jaccard_dups(sf_dir: str):
    """Weighted (multiset) Jaccard pairs (ops/sparse.py::
    weighted_jaccard_pairs): sum(min tf)/sum(max tf) over the df-pruned
    vocabulary via the inverted-index exchange — every intermediate an
    INTEGER (sum_max = tot_a + tot_b - sum_min over shared terms), so
    the single rounded division is the only float in the metric."""
    from gencore_ray.ops.sparse import weighted_jaccard_pairs

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return weighted_jaccard_pairs(docs, threshold=0.5, max_df=0.5,
                                  num_parts=16)


def _q_sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood blocking (ops/neighborhood.py, Hernandez &
    Stolfo): candidates within a 5-rank window under sanitized-prefix
    order — the third blocking strategy beside LSH and the suffix
    array; global rank via the range-partition prefix-sum pattern,
    window pairs owned by the larger rank's block (exactly once).
    Pair mass is n*window, linear by construction."""
    from gencore_ray.ops.neighborhood import sorted_neighborhood_pairs

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return sorted_neighborhood_pairs(docs, window=5, num_parts=16)


def _q_neighborhood_edit_verify(sf_dir: str):
    """Record-linkage composition: sorted-neighborhood blocking
    (ops/neighborhood.py) piped into the exact Levenshtein verifier
    (ops/editdist.py::pair_edit_distances) — blocking and verification
    as freely composable stages, the same two-phase shape as the
    flagship's LSH -> Jaccard pipeline."""
    from gencore_ray.ops.editdist import pair_edit_distances
    from gencore_ray.ops.neighborhood import sorted_neighborhood_pairs

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    pairs = sorted_neighborhood_pairs(docs, window=5, num_parts=16)
    out = pair_edit_distances(docs, pairs.select_columns(["id_a", "id_b"]),
                              a_col="id_a", b_col="id_b", num_parts=16)
    return out


def _q_set_jaccard_join(sf_dir: str):
    """Exact set-similarity self-join (ops/setjoin.py, PPJoin prefix
    filtering): token-SET Jaccard >= 0.5 with 100% recall — the exact
    complement to MinHash-LSH.  Rarest-first prefixes index almost
    nothing per doc; verification counts per-candidate tokens seen
    from both sides over one slim (pair, token) exchange (no token
    list ever rides a join)."""
    from gencore_ray.ops.setjoin import set_similarity_join

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return set_similarity_join(docs, threshold=0.75, num_parts=16)


def _q_events_watermark_lateness(sf_dir: str):
    """The reference's watermark semantics as an operator
    (ops/windows.py::watermark_lateness): processing order = event_id,
    watermark = running max event-time over strictly earlier arrivals
    minus 10 min, an event is late iff its own ts is below it.  One
    arrival-range partition pass + a tiny driver carry round (the
    prefix-scan shape); the SQL twin is a single ROWS-frame running
    max window."""
    import ray.data as rd

    from gencore_ray.ops.windows import watermark_lateness

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts"])
    return watermark_lateness(ev, delay=pd.Timedelta(minutes=10),
                              num_parts=16)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # SQL-checked
        "exact_dedup_docs": _q_exact_dedup_docs,
        "doc_stats_by_lang": _q_doc_stats_by_lang,
        "token_counts_by_source": _q_token_counts_by_source,
        "text_metrics": _q_text_metrics,
        "top_longest_docs": _q_top_longest_docs,
        "events_by_type": _q_events_by_type,
        "events_hourly": _q_events_hourly,
        "lineitem_pricing_summary": _q_lineitem_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "ann_topk": _q_ann_topk,
        "ann_multi_topk": _q_ann_multi_topk,
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_lsh_near_dups": _q_embedding_lsh_near_dups,
        "doc_quality_scores": _q_doc_quality_scores,
        "events_sessions": _q_events_sessions,
        "events_value_buckets": _q_events_value_buckets,
        "user_running_totals": _q_user_running_totals,
        "events_daily_user": _q_events_daily_user,
        "token_profile": _q_token_profile,
        "customers_without_orders": _q_customers_without_orders,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "events_hopping_3h": _q_events_hopping_3h,
        "substring_dup_pairs": _q_substring_dup_pairs,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "stratified_doc_sample": _q_stratified_doc_sample,
        "top_ngrams": _q_top_ngrams,
        "events_value_quantiles": _q_events_value_quantiles,
        # engine-only (rows-only check)
        "dedup_docs_pipeline": _q_dedup_docs_pipeline,
        "incremental_dedup_docs": _q_incremental_dedup_docs,
        "benchmark_contamination": _q_benchmark_contamination,
        "url_canonical_dedup": _q_url_canonical_dedup,
        "pages_domain_stats": _q_pages_domain_stats,
        "pages_domain_cap": _q_pages_domain_cap,
        "pii_redaction": _q_pii_redaction,
        "mixture_token_sample": _q_mixture_token_sample,
        "sequence_packing": _q_sequence_packing,
        "pages_dedup_pipeline": _q_pages_dedup_pipeline,
        "pages_dedup_sql": _q_pages_dedup_sql,
        "dedup_recall": _q_dedup_recall,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "dup_pair_lang_matrix": _q_dup_pair_lang_matrix,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "containment_pairs": _q_containment_pairs,
        "cluster_size_histogram": _q_cluster_size_histogram,
        "cluster_consensus": _q_cluster_consensus,
        "cluster_consensus_ref": _q_cluster_consensus_ref,
        "dsir_logratios": _q_dsir_logratios,
        "soft_dedup_commonness": _q_soft_dedup_commonness,
        "within_doc_line_collapse": _q_within_doc_line_collapse,
        "cluster_safe_split": _q_cluster_safe_split,
        "text_quality_profile": _q_text_quality_profile,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "multimodal_features": _q_multimodal_features,
        "media_decode_real": _q_media_decode_real,
        "repetition_profile": _q_repetition_profile,
        "corpus_filter": _q_corpus_filter,
        "duplicate_span_stats": _q_duplicate_span_stats,
        "suffix_array_spans": _q_suffix_array_spans,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode_stats": _q_bpe_encode_stats,
        "embedding_covariance": _q_embedding_covariance,
        "pca_explained_variance": _q_pca_explained_variance,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_dup_pairs": _q_winnow_dup_pairs,
        "lm_perplexity": _q_lm_perplexity,
        "span_dedup_rewrite": _q_span_dedup_rewrite,
        "ppl_buckets": _q_ppl_buckets,
        "events_profile": _q_events_profile,
        "ann_ivf_persisted": _q_ann_ivf_persisted,
        "lang_source_agreement": _q_lang_source_agreement,
        "snapshot_diff": _q_snapshot_diff,
        "curation_adaptive": _q_curation_adaptive,
        "semantic_dedup_pairs": _q_semantic_dedup,
        "doc_hash_embeddings": _q_doc_hash_embeddings,
        "embed_semantic_dedup": _q_embed_semantic_dedup,
        "nb_lang_classifier": _q_nb_lang_classifier,
        "line_dedup": _q_line_dedup,
        "grouped_line_dedup": _q_grouped_line_dedup,
        "curation_pipeline": _q_curation_pipeline,
        "events_asof_click": _q_events_asof_click,
        "events_lag_lead": _q_events_lag_lead,
        "doc_ranks_per_lang": _q_doc_ranks_per_lang,
        "doc_length_ntile": _q_doc_length_ntile,
        "events_rollup": _q_events_rollup,
        "users_click_purchase_outer": _q_users_click_purchase_outer,
        "user_event_pivot": _q_user_event_pivot,
        "events_winsorized": _q_events_winsorized,
        "events_value_corr": _q_events_value_corr,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "events_cube": _q_events_cube,
        "weighted_doc_sample": _q_weighted_doc_sample,
        "props_k_stats": _q_props_k_stats,
        "doc_len_quantiles_by_lang": _q_doc_len_quantiles_by_lang,
        "bm25_search": _q_bm25_search,
        "heavy_hitter_tokens": _q_heavy_hitter_tokens,
        "train_val_test_split": _q_train_val_test_split,
        "normalized_text_stats": _q_normalized_text_stats,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "purchase_graph_pagerank": _q_purchase_graph_pagerank,
        "doc_chunks": _q_doc_chunks,
        "events_user_skew": _q_events_user_skew,
        "events_asof_join": _q_events_asof_join,
        "events_sliding_1h": _q_events_sliding_1h,
        "session_overlap_pairs": _q_session_overlap_pairs,
        "embedding_knn_graph": _q_embedding_knn_graph,
        "returned_item_report": _q_returned_item_report,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "events_funnel": _q_events_funnel,
        "events_quality_report": _q_events_quality_report,
        "events_customer_skew_join": _q_events_customer_skew_join,
        "source_token_divergence": _q_source_token_divergence,
        "doc_length_outliers": _q_doc_length_outliers,
        "user_retention_cohorts": _q_user_retention_cohorts,
        "doc_token_entropy": _q_doc_token_entropy,
        "top_session_paths": _q_top_session_paths,
        "events_daily_filled": _q_events_daily_filled,
        "events_zorder_keys": _q_events_zorder_keys,
        "events_type_hour_chi2": _q_events_type_hour_chi2,
        "user_value_trends": _q_user_value_trends,
        "weighted_jaccard_dups": _q_weighted_jaccard_dups,
        "sorted_neighborhood_pairs": _q_sorted_neighborhood_pairs,
        "neighborhood_edit_verify": _q_neighborhood_edit_verify,
        "set_jaccard_join": _q_set_jaccard_join,
        "events_watermark_lateness": _q_events_watermark_lateness,
    }


# Shared CTE prefix replicating the engine's shingle semantics in SQL:
# tokens = \w+ over lowered text; texts with 0 < n < 5 tokens yield ONE
# shingle over all tokens; else distinct sliding 5-grams (chr(31) join is
# collision-free over [a-z0-9_] tokens).  Mirrors
# gencore_ray/functions/text.py::shingle_hashes and the inverted-index
# candidate trick of gencore_ray/oracle.py.
_SHINGLE_CTE = (
    "tok AS (SELECT doc_id, text, "
    "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM documents), "
    "shl AS (SELECT doc_id, "
    "CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[]) "
    "WHEN len(toks) < 5 THEN [array_to_string(toks, chr(31))] "
    "ELSE list_distinct([array_to_string(toks[i:i+4], chr(31)) "
    "FOR i IN generate_series(1, len(toks)-4)]) END AS sh FROM tok), "
    "s AS (SELECT doc_id, unnest(sh) AS g FROM shl), "
    "sizes AS (SELECT doc_id, len(sh) AS sz FROM shl), "
    "prs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter "
    "FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "met AS (SELECT ia, ib, inter * 1.0 / (sa.sz + sb.sz - inter) AS jac, "
    "inter * 1.0 / least(sa.sz, sb.sz) AS cont "
    "FROM prs JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib)"
)

# quality formula (identical to the hash-green doc_quality_scores oracle)
_QUALITY_EXPR = (
    "CASE WHEN length(text) = 0 OR len(toks) = 0 THEN 0.0 "
    "ELSE round(0.4 * least(length(text) / 2000.0, 1.0) "
    "+ 0.4 * (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 "
    "/ length(text)) "
    "+ 0.2 * least((length(array_to_string(toks, '')) * 1.0 / len(toks)) "
    "/ 8.0, 1.0), 6) END"
)

# connected components over the (jaccard | containment)-qualified edge
# set via recursive transitive closure, then gencore-style scored
# representative election — the full flagship pipeline in ANSI SQL.
# (SimHash-only edges additionally require a shared shingle in the
# engine, and no such sub-threshold-jaccard edge exists in this corpus,
# so the SQL edge set equals the engine's verified edge set.)
_PIPELINE_CTE = (
    "WITH RECURSIVE " + _SHINGLE_CTE + ", "
    "e AS (SELECT ia, ib FROM met WHERE jac >= 0.7 OR cont >= 0.9), "
    "es AS (SELECT ia AS a, ib AS b FROM e UNION ALL SELECT ib, ia FROM e), "
    "reach(src, dst) AS ("
    "SELECT doc_id, doc_id FROM documents "
    "UNION "
    "SELECT r.src, es.b FROM reach r JOIN es ON r.dst = es.a), "
    "cc AS (SELECT src AS did, min(dst) AS cid FROM reach GROUP BY src), "
    "q AS (SELECT doc_id, length(text) AS tl, " + _QUALITY_EXPR +
    " AS quality FROM tok), "
    "scored AS (SELECT cc.did, cc.cid, q.quality, q.tl, "
    "round(0.5 * least(q.tl / 2000.0, 1.0) + 0.2 * q.quality, 12) AS score "
    "FROM cc JOIN q ON q.doc_id = cc.did)"
)


def _pages_pipeline_sql(cache: str) -> str:
    """Full pages pipeline (extraction proven via hash) in ANSI SQL:
    same shingle/quality/score formulas as the documents pipeline, but
    url-keyed, reading the corpus ground-truth text, and with the
    recency term active (pages carry warc_ts; engine normaliser is
    (ts - 2000-01-01) / 40 years, stages/elect.py)."""
    src = os.path.join(cache, "pages.parquet")
    return (
        "WITH RECURSIVE "
        f"pages AS (SELECT url, warc_ts, text FROM read_parquet('{src}')), "
        "tok AS (SELECT url, text, warc_ts, "
        "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM pages), "
        "shl AS (SELECT url, "
        "CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[]) "
        "WHEN len(toks) < 5 THEN [array_to_string(toks, chr(31))] "
        "ELSE list_distinct([array_to_string(toks[i:i+4], chr(31)) "
        "FOR i IN generate_series(1, len(toks)-4)]) END AS sh FROM tok), "
        "s AS (SELECT url, unnest(sh) AS g FROM shl), "
        "sizes AS (SELECT url, len(sh) AS sz FROM shl), "
        "prs AS (SELECT a.url AS ua, b.url AS ub, count(*) AS inter "
        "FROM s a JOIN s b ON a.g = b.g AND a.url < b.url GROUP BY 1, 2), "
        "met AS (SELECT ua, ub, inter * 1.0 / (sa.sz + sb.sz - inter) AS jac, "
        "inter * 1.0 / least(sa.sz, sb.sz) AS cont "
        "FROM prs JOIN sizes sa ON sa.url = ua JOIN sizes sb ON sb.url = ub), "
        "e AS (SELECT ua, ub FROM met WHERE jac >= 0.7 OR cont >= 0.9), "
        "es AS (SELECT ua AS a, ub AS b FROM e UNION ALL SELECT ub, ua FROM e), "
        "reach(src, dst) AS (SELECT url, url FROM pages UNION "
        "SELECT r.src, es.b FROM reach r JOIN es ON r.dst = es.a), "
        "cc AS (SELECT src AS purl, min(dst) AS cid FROM reach GROUP BY src), "
        "q AS (SELECT url, warc_ts, length(text) AS tl, " + _QUALITY_EXPR +
        " AS quality FROM tok), "
        "scored AS (SELECT cc.purl, cc.cid, "
        "round(0.5 * least(q.tl / 2000.0, 1.0) "
        "+ 0.3 * least(greatest((epoch_us(q.warc_ts) "
        "- epoch_us(TIMESTAMP '2000-01-01')) / 1000000.0 / 1261440000.0, 0), 1) "
        "+ 0.2 * q.quality, 12) AS score "
        "FROM cc JOIN q ON q.url = cc.purl) "
        "SELECT purl AS url, cid AS cluster_id, "
        "count(*) OVER (PARTITION BY cid) AS cluster_size, "
        "(row_number() OVER (PARTITION BY cid "
        "ORDER BY score DESC, purl) = 1) AS is_representative "
        "FROM scored"
    )


def _pagerank_sql(iters: int, damping: float) -> str:
    """Unrolled synchronous-PageRank twin of ops/graph.pagerank over
    the customer-supplier purchase graph: one CTE per iteration, same
    float64 algebra ((1-d)/n + d*inc; this graph has no dangling
    nodes — both directions are emitted — so the engine's dangling
    term is exactly 0.0).  Constants are interpolated from the SAME
    Python floats the engine uses, so decimal-literal parsing cannot
    drift from numpy."""
    t = repr(1.0 - damping)   # e.g. '0.15000000000000002' — bit-equal
    dd = repr(damping)
    parts = [
        "WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, "
        "l_suppkey * 2 + 1 AS dst FROM orders "
        "JOIN lineitem ON l_orderkey = o_orderkey), "
        "edges AS (SELECT src, dst FROM e0 "
        "UNION ALL SELECT dst, src FROM e0), "
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS dg "
        "FROM edges GROUP BY src), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges "
        "UNION SELECT DISTINCT dst FROM edges), "
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), "
        "pr0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f", pr{i} AS (SELECT no.node, "
            f"{t} / nn.n + {dd} * coalesce(inc.s, 0.0) AS rank "
            f"FROM nodes no CROSS JOIN nn LEFT JOIN "
            f"(SELECT e.dst AS node, sum(p.rank / dg.dg) AS s "
            f"FROM pr{i - 1} p JOIN edges e ON e.src = p.node "
            f"JOIN deg dg ON dg.src = p.node GROUP BY e.dst) inc "
            f"ON inc.node = no.node)"
        )
    parts.append(
        f" SELECT node, round(rank, 6) AS rank FROM pr{iters}"
    )
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    from gencore_ray.ops.split import split_sql_case

    # the pages corpus must exist on disk before the driver can run its
    # SQL (idempotent, cached; ~1 s at the correctness scale)
    pages_cache_001 = _pages_cache("/root/testdata/sf0.01")
    d = {
        "pages_dedup_sql": _pages_pipeline_sql(pages_cache_001),
        "exact_dedup_docs": (
            "SELECT min(doc_id) AS doc_id, count(*) AS dup_count "
            "FROM documents GROUP BY text"
        ),
        "doc_stats_by_lang": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "round(avg(n_chars), 6) AS avg_chars FROM documents GROUP BY lang"
        ),
        "token_counts_by_source": (
            "SELECT source, "
            "CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS BIGINT) "
            "AS total_tokens, count(*) AS n_docs FROM documents GROUP BY source"
        ),
        "text_metrics": (
            "SELECT doc_id, length(text) AS text_len, "
            "length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS alnum_count, "
            "CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) "
            "AS token_count FROM documents"
        ),
        "top_longest_docs": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events, "
            "round(sum(value), 6) AS total_value, round(avg(value), 6) AS avg_value "
            "FROM events GROUP BY event_type"
        ),
        "events_hourly": (
            "SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events "
            "FROM events GROUP BY 1"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
            "round(avg(l_quantity), 4) AS avg_qty, "
            "round(avg(l_extendedprice), 4) AS avg_price, "
            "round(avg(l_discount), 4) AS avg_disc, "
            "count(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "revenue_by_nation": (
            "SELECT n_name, round(sum(o_totalprice), 2) AS total_revenue, "
            "count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "ann_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT e FROM q)), 6) AS cos_sim "
            "FROM embeddings ORDER BY cos_sim DESC, vec_id LIMIT 10"
        ),
        "ann_multi_topk": (
            "SELECT query_id, vec_id, cos_sim FROM ("
            "SELECT q.vec_id AS query_id, b.vec_id AS vec_id, "
            "round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6) DESC, b.vec_id) AS rn "
            "FROM embeddings q JOIN embeddings b ON q.vec_id IN (0, 1, 2)"
            ") WHERE rn <= 10"
        ),
        "doc_quality_scores": (
            "WITH t AS (SELECT doc_id, text, "
            "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM documents) "
            "SELECT doc_id, CASE WHEN length(text) = 0 OR len(toks) = 0 THEN 0.0 "
            "ELSE round(0.4 * least(length(text) / 2000.0, 1.0) "
            "+ 0.4 * (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 "
            "/ length(text)) "
            "+ 0.2 * least((length(array_to_string(toks, '')) * 1.0 / len(toks)) "
            "/ 8.0, 1.0), 6) END AS quality FROM t"
        ),
        "events_sessions": (
            "WITH d AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM d) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "min(ts) AS session_start, max(ts) AS session_end "
            "FROM s GROUP BY user_id, session_id"
        ),
        "events_value_buckets": (
            "WITH b(lo, hi, label) AS (VALUES (0.0, 50.0, 'low'), "
            "(50.0, 200.0, 'mid'), (200.0, 1000.0, 'high')) "
            "SELECT label AS bucket, count(*) AS n_events, "
            "round(sum(value), 6) AS total_value "
            "FROM events JOIN b ON value >= lo AND value < hi GROUP BY label"
        ),
        "user_running_totals": (
            "SELECT event_id, user_id, round(sum(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 6) AS running_value "
            "FROM events"
        ),
        "events_daily_user": (
            "SELECT user_id, date_trunc('day', ts) AS window_start, "
            "count(*) AS n_events, round(sum(value), 6) AS total_value "
            "FROM events GROUP BY 1, 2"
        ),
        "stratified_doc_sample": (
            "SELECT source, doc_id FROM ("
            # mod-first form: exact (never overflows) for every id on
            # BOTH sides — see ops/relational.py::stratified_sample
            "SELECT source, doc_id, row_number() OVER (PARTITION BY source "
            "ORDER BY ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761) "
            "% 4294967296, doc_id) AS rn "
            "FROM documents) WHERE rn <= 5"
        ),
        "top_docs_per_lang": (
            "SELECT lang, doc_id, n_chars FROM ("
            "SELECT lang, doc_id, n_chars, row_number() OVER "
            "(PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        "substring_dup_pairs": (
            # TOKEN-granularity containment, boundary-guarded by space
            # padding (mirrors ops/substrings.py exactly)
            "WITH t AS (SELECT doc_id, "
            "' ' || array_to_string(regexp_extract_all(lower(text), "
            "'[a-z0-9_]+'), ' ') || ' ' AS js, "
            "len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS nt "
            "FROM documents) "
            "SELECT printf('doc-%08d', a.doc_id) AS url_a, "
            "printf('doc-%08d', b.doc_id) AS url_b "
            "FROM t a JOIN t b ON a.doc_id < b.doc_id "
            "WHERE a.nt >= 5 AND b.nt >= 5 AND a.js <> b.js "
            "AND (position(a.js IN b.js) > 0 OR position(b.js IN a.js) > 0)"
        ),
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 300000)"
        ),
        "distinct_users_by_type": (
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "events_hopping_3h": (
            "SELECT date_trunc('hour', ts) - to_hours(o) AS window_start, "
            "count(*) AS n_events, round(sum(value), 6) AS total_value "
            "FROM events CROSS JOIN (VALUES (0), (1), (2)) AS t(o) GROUP BY 1"
        ),
        "token_profile": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(coalesce(text, ''), "
            "' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+')) AS BIGINT) "
            "AS bpe_tokens, "
            "CAST(len(regexp_extract_all(coalesce(text, ''), '\\S+')) AS BIGINT) "
            "AS ws_tokens FROM documents"
        ),
        "top_ngrams": (
            "WITH tok AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM documents), "
            "g AS (SELECT unnest([array_to_string(toks[i:i+4], ' ') "
            "FOR i IN generate_series(1, len(toks)-4)]) AS ngram FROM tok) "
            "SELECT ngram, count(*) AS n_occurrences FROM g GROUP BY ngram "
            "ORDER BY n_occurrences DESC, ngram LIMIT 20"
        ),
        "events_value_quantiles": (
            "SELECT event_type, "
            "round(quantile_cont(value, 0.5), 6) AS p50, "
            "round(quantile_cont(value, 0.95), 6) AS p95, "
            "round(quantile_cont(value, 0.99), 6) AS p99 "
            "FROM events GROUP BY event_type"
        ),
        "embedding_lsh_near_dups": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.45"
        ),
        "ngram_jaccard_pairs": (
            "WITH " + _SHINGLE_CTE + " "
            "SELECT printf('doc-%08d', ia) AS url_a, "
            "printf('doc-%08d', ib) AS url_b, round(jac, 6) AS jaccard "
            "FROM met WHERE jac >= 0.7"
        ),
        "dup_pair_lang_matrix": (
            "WITH " + _SHINGLE_CTE + ", "
            "p AS (SELECT ia, ib FROM met WHERE jac >= 0.7), "
            "lp AS (SELECT least(da.lang, db.lang) AS lang_lo, "
            "greatest(da.lang, db.lang) AS lang_hi "
            "FROM p JOIN documents da ON da.doc_id = p.ia "
            "JOIN documents db ON db.doc_id = p.ib) "
            "SELECT lang_lo, lang_hi, CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM lp GROUP BY lang_lo, lang_hi"
        ),
        "containment_pairs": (
            "WITH " + _SHINGLE_CTE + " "
            "SELECT printf('doc-%08d', ia) AS url_a, "
            "printf('doc-%08d', ib) AS url_b, round(cont, 6) AS containment "
            "FROM met WHERE cont >= 0.9"
        ),
        "dedup_docs_pipeline": (
            _PIPELINE_CTE + " "
            "SELECT printf('doc-%08d', did) AS url, "
            "printf('doc-%08d', cid) AS cluster_id, "
            "count(*) OVER (PARTITION BY cid) AS cluster_size, "
            "(row_number() OVER (PARTITION BY cid "
            "ORDER BY score DESC, did) = 1) AS is_representative "
            "FROM scored"
        ),
        "cluster_consensus": (
            _PIPELINE_CTE + ", "
            "r AS (SELECT cid, did, quality, tl, row_number() OVER "
            "(PARTITION BY cid ORDER BY score DESC, did) AS rk FROM scored) "
            "SELECT printf('doc-%08d', cid) AS cluster_id, "
            "count(*) AS cluster_size, "
            "printf('doc-%08d', min(CASE WHEN rk = 1 THEN did END)) AS rep_url, "
            "max(quality) AS max_quality, "
            "CAST(max(tl) AS BIGINT) AS max_text_len, "
            "CAST(sum(tl) AS BIGINT) AS total_text_len "
            "FROM r GROUP BY cid"
        ),
        "cluster_consensus_ref": (
            _PIPELINE_CTE + ", "
            # member texts of multi clusters, whitespace-tokenized with
            # 1-based positions (engine uses 0-based; the amb/ref join
            # is internal to each side, so the base cancels)
            "m AS (SELECT s.cid, s.did, d.text, "
            "count(*) OVER (PARTITION BY s.cid) AS csz "
            "FROM scored s JOIN documents d ON d.doc_id = s.did), "
            "mm AS (SELECT cid, did, coalesce(text, '') AS text "
            "FROM m WHERE csz > 1), "
            "tk AS (SELECT cid, did, "
            "unnest(regexp_extract_all(text, '\\S+')) AS tok, "
            "generate_subscripts(regexp_extract_all(text, '\\S+'), 1) "
            "AS pos FROM mm), "
            # planted substitution (vote input only): token #2 of every
            # did % 7 = 3 member becomes 'refx' — the engine's _plant
            "tv AS (SELECT cid, did, pos, CASE WHEN did % 7 = 3 "
            "AND pos = 2 THEN 'refx' ELSE tok END AS tok FROM tk), "
            "pc AS (SELECT cid, pos, tok, count(*) AS c "
            "FROM tv GROUP BY 1, 2, 3), "
            "ps AS (SELECT cid, pos, max(c) AS maxc, sum(c) AS ncov "
            "FROM pc GROUP BY 1, 2), "
            "amb AS (SELECT cid, pos FROM ps WHERE 2 * maxc <= ncov), "
            # trusted stream per cluster = MIN member doc in the
            # trusted set (every 5th doc); its tokens are already in tk
            "rm AS (SELECT cid, min(did) AS rdid FROM mm "
            "WHERE did % 5 = 0 GROUP BY cid), "
            "rtk AS (SELECT rm.cid, t.pos FROM rm "
            "JOIN tk t ON t.cid = rm.cid AND t.did = rm.rdid), "
            "ov AS (SELECT a.cid, count(*) AS n FROM amb a "
            "JOIN rtk r ON r.cid = a.cid AND r.pos = a.pos GROUP BY 1), "
            "sz AS (SELECT cid, count(*) AS cluster_size "
            "FROM scored GROUP BY cid) "
            "SELECT printf('doc-%08d', sz.cid) AS cluster_id, "
            "sz.cluster_size, "
            "CAST(coalesce(ov.n, 0) AS BIGINT) AS ref_overrides "
            "FROM sz LEFT JOIN ov ON ov.cid = sz.cid"
        ),
        "cluster_safe_split": (
            _PIPELINE_CTE + " "
            "SELECT printf('doc-%08d', did) AS url, "
            "printf('doc-%08d', cid) AS cluster_id, "
            + split_sql_case("printf('doc-%08d', cid)",
                             {"train": 0.8, "val": 0.1, "test": 0.1}, 42)
            + " AS split FROM scored"
        ),
        "within_doc_line_collapse": (
            "WITH aug AS (SELECT doc_id, "
            "'head ' || lang || chr(10) || coalesce(text, '') || "
            "(CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'head ' || lang "
            "ELSE '' END) || "
            "(CASE WHEN doc_id % 5 = 0 THEN chr(10) || coalesce(text, '') "
            "ELSE '' END) AS t FROM documents), "
            "sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM aug), "
            "l AS (SELECT doc_id, unnest([{'ln': i, 'line': ls[i]} "
            "FOR i IN generate_series(1, len(ls))]) AS s FROM sp), "
            "e AS (SELECT doc_id, s.ln AS ln, s.line AS line FROM l), "
            "k AS (SELECT doc_id, ln, line, "
            "min(ln) OVER (PARTITION BY doc_id, line) AS f FROM e) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(count(*) - count(DISTINCT line) AS BIGINT) AS n_collapsed, "
            "coalesce(string_agg(line, chr(10) ORDER BY ln) "
            "FILTER (WHERE ln = f), '') AS clean_text "
            "FROM k GROUP BY doc_id"
        ),
        "soft_dedup_commonness": (
            "WITH tok AS (SELECT doc_id, "
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') "
            "AS ws FROM documents), "
            "g AS (SELECT doc_id, "
            "unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] "
            "FOR i IN generate_series(1, len(ws)-2)]) AS g FROM tok), "
            "bk AS (SELECT DISTINCT doc_id, "
            "CAST(md5_number_lower(g) % 262144 AS BIGINT) AS b FROM g), "
            "df AS (SELECT b, CAST(count(*) AS DOUBLE) AS df "
            "FROM bk GROUP BY b), "
            "n AS (SELECT ln(count(DISTINCT doc_id)) AS ln_n FROM bk) "
            "SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "round(sum(ln(df.df)) / count(*) - any_value(n.ln_n), 6) "
            "AS commonness "
            "FROM bk JOIN df USING (b), n GROUP BY bk.doc_id"
        ),
        "dsir_logratios": (
            "WITH tok AS (SELECT doc_id, lang, "
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') "
            "AS ws FROM documents), "
            "uni AS (SELECT doc_id, lang, unnest(ws) AS g FROM tok), "
            "big AS (SELECT doc_id, lang, "
            "unnest([ws[i] || ' ' || ws[i+1] "
            "FOR i IN generate_series(1, len(ws)-1)]) AS g FROM tok), "
            "bk AS (SELECT doc_id, (lang = 'en') AS tgt, "
            "CAST(md5_number_lower(g) % 65536 AS BIGINT) AS b "
            "FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)), "
            "agg AS (SELECT b, "
            "CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS DOUBLE) AS ct, "
            "CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS DOUBLE) AS cr "
            "FROM bk GROUP BY b), "
            "tots AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM agg), "
            "lr AS (SELECT b, ln((ct + 1.0) / (nt + 65536.0)) "
            "- ln((cr + 1.0) / (nr + 65536.0)) AS w FROM agg, tots) "
            "SELECT bk.doc_id, round(sum(lr.w), 6) AS dsir_logratio "
            "FROM bk JOIN lr USING (b) GROUP BY bk.doc_id"
        ),
        "cluster_size_histogram": (
            _PIPELINE_CTE + " "
            "SELECT cluster_size, count(*) AS n_clusters FROM "
            "(SELECT cid, count(*) AS cluster_size FROM cc GROUP BY cid) "
            "GROUP BY cluster_size"
        ),
        "ann_ivf_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT e FROM q)), 6) AS cos_sim "
            "FROM embeddings ORDER BY cos_sim DESC, vec_id LIMIT 10"
        ),
        "multimodal_features": (
            "SELECT doc_id, CAST(octet_length(encode(coalesce(text, ''))) "
            "AS BIGINT) AS byte_len FROM documents"
        ),
        "events_asof_click": (
            "WITH r AS (SELECT user_id, ts, max(value) AS prior_click_value "
            "FROM events WHERE event_type = 'click' GROUP BY 1, 2) "
            "SELECT l.event_id, l.user_id, l.ts, l.value, "
            "r.prior_click_value "
            "FROM events l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "events_lag_lead": (
            "SELECT event_id, user_id, ts, value, "
            "LAG(value) OVER w AS prev_value, "
            "LEAD(value) OVER w AS next_value FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "doc_ranks_per_lang": (
            "SELECT doc_id, lang, n_chars, "
            "ROW_NUMBER() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC, doc_id) AS row_number, "
            "RANK() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC) AS rank, "
            "DENSE_RANK() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC) AS dense_rank, "
            "round(PERCENT_RANK() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC), 6) AS percent_rank, "
            "round(CUME_DIST() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC), 6) AS cume_dist FROM documents"
        ),
        "doc_length_ntile": (
            "SELECT doc_id, n_chars, "
            "NTILE(8) OVER (ORDER BY n_chars, doc_id) AS bucket "
            "FROM documents"
        ),
        "events_rollup": (
            "SELECT event_type, user_id, COUNT(*) AS n, "
            "max(value) AS max_value, "
            "(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END + "
            "CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS level "
            "FROM events GROUP BY ROLLUP(event_type, user_id)"
        ),
        "users_click_purchase_outer": (
            "WITH c AS (SELECT user_id, COUNT(*) AS click_n FROM events "
            "WHERE event_type = 'click' GROUP BY 1), "
            "p AS (SELECT user_id, COUNT(*) AS purchase_n FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1) "
            "SELECT COALESCE(c.user_id, p.user_id) AS user_id, "
            "c.click_n, p.purchase_n "
            "FROM c FULL OUTER JOIN p ON c.user_id = p.user_id"
        ),
        "user_event_pivot": (
            "SELECT user_id, "
            "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_click, "
            "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_view, "
            "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_purchase, "
            "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_signup, "
            "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_error "
            "FROM events GROUP BY user_id"
        ),
        "events_winsorized": (
            "WITH q AS (SELECT event_type, "
            "round(quantile_cont(value, 0.05), 6) AS lo, "
            "round(quantile_cont(value, 0.95), 6) AS hi "
            "FROM events GROUP BY 1) "
            "SELECT event_id, e.event_type, value, "
            "round(least(greatest(value, lo), hi), 6) AS value_w "
            "FROM events e JOIN q USING (event_type)"
        ),
        "repetition_profile": (
            "WITH l AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), "
            "chr(10))) AS line FROM documents), "
            "lc AS (SELECT doc_id, count(*) AS n_lines, "
            "count(DISTINCT line) AS n_uniq FROM l GROUP BY doc_id), "
            "tok AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'[a-z0-9_]+') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], chr(31)) "
            "FOR i IN generate_series(1, len(toks)-1)]) AS gram FROM tok), "
            "cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM cnt "
            "GROUP BY doc_id) "
            "SELECT lc.doc_id, CAST(lc.n_lines AS BIGINT) AS n_lines, "
            "round((lc.n_lines - lc.n_uniq) * 1.0 / lc.n_lines, 6) "
            "AS dup_line_frac, "
            "coalesce(round(agg.mx * 1.0 / agg.tot, 6), 0.0) AS top_bigram_frac "
            "FROM lc LEFT JOIN agg USING (doc_id)"
        ),
        "corpus_filter": (
            # Gopher-rules filter: same signal definitions as
            # repetition_profile / text_metrics, plus a first-failing-
            # rule CASE chain in the engine's deterministic rule order.
            "WITH t AS (SELECT doc_id, coalesce(text, '') AS text, "
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') AS toks "
            "FROM documents), "
            "base AS (SELECT doc_id, "
            "CAST(len(toks) AS BIGINT) AS n_tokens, "
            "round(length(array_to_string(toks, '')) * 1.0 "
            "/ greatest(len(toks), 1), 6) AS mean_word_len, "
            "round(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 "
            "/ greatest(length(text), 1), 6) AS alnum_ratio FROM t), "
            "l AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), "
            "chr(10))) AS line FROM documents), "
            "lc AS (SELECT doc_id, round((count(*) - count(DISTINCT line)) "
            "* 1.0 / count(*), 6) AS dup_line_frac FROM l GROUP BY doc_id), "
            "g AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], chr(31)) "
            "FOR i IN generate_series(1, len(toks)-1)]) AS gram FROM t), "
            "cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS tb "
            "FROM cnt GROUP BY doc_id), "
            "sig AS (SELECT base.doc_id, n_tokens, mean_word_len, alnum_ratio, "
            "lc.dup_line_frac, coalesce(agg.tb, 0.0) AS top_bigram_frac "
            "FROM base JOIN lc USING (doc_id) LEFT JOIN agg USING (doc_id)) "
            "SELECT doc_id, "
            "CASE WHEN n_tokens < 10 THEN 'too_few_tokens' "
            "WHEN n_tokens > 100000 THEN 'too_many_tokens' "
            "WHEN mean_word_len < 2.0 OR mean_word_len > 12.0 "
            "THEN 'mean_word_len' "
            "WHEN alnum_ratio < 0.5 THEN 'alnum_ratio' "
            "WHEN dup_line_frac > 0.3 THEN 'dup_lines' "
            "WHEN top_bigram_frac > 0.2 THEN 'top_bigram' ELSE 'ok' END "
            "AS reason, "
            "(n_tokens >= 10 AND n_tokens <= 100000 "
            "AND mean_word_len >= 2.0 AND mean_word_len <= 12.0 "
            "AND alnum_ratio >= 0.5 AND dup_line_frac <= 0.3 "
            "AND top_bigram_frac <= 0.2) AS keep, "
            "n_tokens, mean_word_len, alnum_ratio, dup_line_frac, "
            "top_bigram_frac FROM sig"
        ),
        "duplicate_span_stats": (
            # engine counts on uint64 polynomial window hashes; the
            # oracle on chr(31)-joined gram strings (collision-free
            # over [a-z0-9_] tokens) — hash equality proves the window
            # machinery exact.  L = 8 tokens; slice toks[i:i+7] is
            # DuckDB-inclusive, so width 8.
            "WITH tok AS (SELECT doc_id, regexp_extract_all("
            "lower(coalesce(text, '')), '[a-z0-9_]+') AS toks FROM documents), "
            "w AS (SELECT doc_id, unnest([array_to_string(toks[i:i+7], chr(31)) "
            "FOR i IN generate_series(1, len(toks)-7)]) AS g FROM tok), "
            "m AS (SELECT doc_id, g, count(*) AS m FROM w GROUP BY 1, 2), "
            "d AS (SELECT g FROM m GROUP BY g HAVING count(*) >= 2), "
            "dupw AS (SELECT doc_id, sum(m.m) AS dup_windows FROM m "
            "JOIN d USING (g) GROUP BY doc_id), "
            "base AS (SELECT doc_id, greatest(len(toks) - 7, 0) AS n_windows "
            "FROM tok) "
            "SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows, "
            "CAST(coalesce(dup_windows, 0) AS BIGINT) AS dup_windows, "
            "round(coalesce(dup_windows, 0) * 1.0 / greatest(n_windows, 1), 6) "
            "AS dup_span_frac FROM base LEFT JOIN dupw USING (doc_id)"
        ),
        "winnow_fingerprints": (
            # replay the winnowing selection exactly: 4-token gram
            # hashes via md5_number_lower on the chr(31)-joined gram
            # string (== engine md5_low64), window w=4, and the
            # min-hash/rightmost-tie rule encoded injectively as
            # HUGEINT h*2^32 - p (min -> smallest h, then largest p)
            "WITH tok AS (SELECT doc_id, regexp_extract_all("
            "lower(coalesce(text, '')), '[a-z0-9_]+') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest(generate_series(1, len(toks)-3)) AS p, "
            "unnest([md5_number_lower(array_to_string(toks[i:i+3], chr(31))) "
            "FOR i IN generate_series(1, len(toks)-3)]) AS h FROM tok), "
            "s AS (SELECT doc_id, unnest(generate_series(1, len(toks)-6)) AS i "
            "FROM tok), "
            "j AS (SELECT s.doc_id, s.i, g.p, g.h FROM s JOIN g "
            "ON g.doc_id = s.doc_id AND g.p BETWEEN s.i AND s.i+3), "
            "sel AS (SELECT doc_id, i, "
            "arg_min(p, CAST(h AS HUGEINT) * 4294967296 - p) AS p_sel "
            "FROM j GROUP BY doc_id, i), "
            "fpp AS (SELECT DISTINCT doc_id, p_sel FROM sel) "
            "SELECT t.doc_id, "
            "CAST(greatest(len(toks)-6, 0) AS BIGINT) AS n_windows, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n_fingerprints "
            "FROM tok t LEFT JOIN (SELECT doc_id, count(*) AS n FROM fpp "
            "GROUP BY doc_id) c USING (doc_id)"
        ),
        "winnow_dup_pairs": (
            # distinct selected hashes per doc, self-joined: every
            # pair sharing >= 2 fingerprints (doc_a < doc_b)
            "WITH tok AS (SELECT doc_id, regexp_extract_all("
            "lower(coalesce(text, '')), '[a-z0-9_]+') AS toks FROM documents), "
            "g AS (SELECT doc_id, unnest(generate_series(1, len(toks)-3)) AS p, "
            "unnest([md5_number_lower(array_to_string(toks[i:i+3], chr(31))) "
            "FOR i IN generate_series(1, len(toks)-3)]) AS h FROM tok), "
            "s AS (SELECT doc_id, unnest(generate_series(1, len(toks)-6)) AS i "
            "FROM tok), "
            "j AS (SELECT s.doc_id, s.i, g.p, g.h FROM s JOIN g "
            "ON g.doc_id = s.doc_id AND g.p BETWEEN s.i AND s.i+3), "
            "sel AS (SELECT doc_id, i, "
            "arg_min(p, CAST(h AS HUGEINT) * 4294967296 - p) AS p_sel "
            "FROM j GROUP BY doc_id, i), "
            "fph AS (SELECT DISTINCT sel.doc_id, g.h FROM sel JOIN g "
            "ON g.doc_id = sel.doc_id AND g.p = sel.p_sel) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(count(*) AS BIGINT) AS shared_fps "
            "FROM fph a JOIN fph b ON a.h = b.h AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING count(*) >= 2"
        ),
        "span_dedup_rewrite": (
            # owner-doc-keeps policy: gram owner = min doc_id; every
            # window of that gram in a LARGER doc is removed, covered
            # token positions cut, survivors space-joined in order
            "WITH t AS (SELECT doc_id, regexp_extract_all("
            "lower(coalesce(text, '')), '[a-z0-9_]+') AS toks FROM documents), "
            "w AS (SELECT doc_id, "
            "unnest(generate_series(1, len(toks)-7)) AS p, "
            "unnest([array_to_string(toks[i:i+7], chr(31)) "
            "FOR i IN generate_series(1, len(toks)-7)]) AS g FROM t), "
            "own AS (SELECT g, min(doc_id) AS owner FROM w GROUP BY g), "
            "rem AS (SELECT w.doc_id, w.p FROM w JOIN own USING (g) "
            "WHERE w.doc_id > own.owner), "
            "cutd AS (SELECT DISTINCT doc_id, "
            "unnest(generate_series(p, p+7)) AS tp FROM rem), "
            "tokrows AS (SELECT doc_id, "
            "unnest(generate_series(1, len(toks))) AS tp, "
            "unnest(toks) AS tok FROM t), "
            "agg AS (SELECT tr.doc_id, "
            "string_agg(CASE WHEN c.tp IS NULL THEN tr.tok END, ' ' "
            "ORDER BY tr.tp) AS clean_text, "
            "sum(CASE WHEN c.tp IS NULL THEN 0 ELSE 1 END) AS ncut "
            "FROM tokrows tr LEFT JOIN cutd c "
            "ON c.doc_id = tr.doc_id AND c.tp = tr.tp GROUP BY tr.doc_id), "
            "base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens "
            "FROM t) "
            "SELECT b.doc_id, b.n_tokens, "
            "CAST(coalesce(ncut, 0) AS BIGINT) AS n_cut, "
            "coalesce(clean_text, '') AS clean_text "
            "FROM base b LEFT JOIN agg USING (doc_id)"
        ),
        "lm_perplexity": (
            # top-1000-vocab unigram LM with add-1 smoothing; dropped
            # terms fold into one <unk> symbol (count cu), so the model
            # has v+1 symbols and p(w) = (c+1)/(n + (v+1)).  Zero-token
            # docs drop out of the GROUP BY on both sides.
            "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all("
            "lower(coalesce(text, '')), '[a-z0-9_]+')) AS w FROM documents), "
            "cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w), "
            "topv AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 1000), "
            "par AS (SELECT (SELECT coalesce(sum(c), 0) FROM cnt) AS n, "
            "(SELECT count(*) FROM topv) AS v, "
            "(SELECT coalesce(sum(c), 0) FROM cnt) "
            "- (SELECT coalesce(sum(c), 0) FROM topv) AS cu), "
            "sc AS (SELECT t.doc_id, "
            "ln((coalesce(tv.c, (SELECT cu FROM par)) + 1.0) "
            "/ ((SELECT n FROM par) + (SELECT v FROM par) + 1.0)) AS lp "
            "FROM tok t LEFT JOIN topv tv ON t.w = tv.w) "
            "SELECT doc_id, count(*) AS n_tokens, "
            "round(avg(lp), 6) AS avg_logp, "
            "round(exp(-avg(lp)), 6) AS perplexity "
            "FROM sc GROUP BY doc_id"
        ),
        "ppl_buckets": (
            # lm_perplexity's CTEs + per-language tertiles of the
            # ROUNDED perplexity + threshold CASE — CCNet's split
            "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all("
            "lower(coalesce(text, '')), '[a-z0-9_]+')) AS w FROM documents), "
            "cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w), "
            "topv AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 1000), "
            "par AS (SELECT (SELECT coalesce(sum(c), 0) FROM cnt) AS n, "
            "(SELECT count(*) FROM topv) AS v, "
            "(SELECT coalesce(sum(c), 0) FROM cnt) "
            "- (SELECT coalesce(sum(c), 0) FROM topv) AS cu), "
            "sc AS (SELECT t.doc_id, "
            "ln((coalesce(tv.c, (SELECT cu FROM par)) + 1.0) "
            "/ ((SELECT n FROM par) + (SELECT v FROM par) + 1.0)) AS lp "
            "FROM tok t LEFT JOIN topv tv ON t.w = tv.w), "
            "pp AS (SELECT doc_id, round(exp(-avg(lp)), 6) AS perplexity "
            "FROM sc GROUP BY doc_id), "
            "pl AS (SELECT d.doc_id, d.lang, pp.perplexity "
            "FROM documents d JOIN pp USING (doc_id)), "
            "th AS (SELECT lang, "
            "round(quantile_cont(perplexity, 1.0/3), 6) AS p33, "
            "round(quantile_cont(perplexity, 2.0/3), 6) AS p66 "
            "FROM pl GROUP BY lang) "
            "SELECT doc_id, lang, perplexity, "
            "CASE WHEN perplexity <= p33 THEN 'head' "
            "WHEN perplexity <= p66 THEN 'middle' ELSE 'tail' END AS bucket "
            "FROM pl JOIN th USING (lang)"
        ),
        "events_profile": (
            "SELECT 'event_id' AS column, count(*) AS n_rows, "
            "count(*) - count(event_id) AS n_nulls, "
            "count(DISTINCT event_id) AS n_distinct, "
            "round(CAST(min(event_id) AS DOUBLE), 6) AS min_num, "
            "round(CAST(max(event_id) AS DOUBLE), 6) AS max_num FROM events "
            "UNION ALL SELECT 'user_id', count(*), "
            "count(*) - count(user_id), count(DISTINCT user_id), "
            "round(CAST(min(user_id) AS DOUBLE), 6), "
            "round(CAST(max(user_id) AS DOUBLE), 6) FROM events "
            "UNION ALL SELECT 'event_type', count(*), "
            "count(*) - count(event_type), count(DISTINCT event_type), "
            "NULL, NULL FROM events "
            "UNION ALL SELECT 'value', count(*), "
            "count(*) - count(value), count(DISTINCT value), "
            "round(min(value), 6), round(max(value), 6) FROM events"
        ),
        "ann_ivf_persisted": (
            # nprobe == n_clusters: the persisted path-pruned read must
            # reproduce the exact brute-force top-k
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT e FROM q)), 6) AS cos_sim "
            "FROM embeddings ORDER BY cos_sim DESC, vec_id LIMIT 10"
        ),
        "lang_source_agreement": (
            # pair-counting Rand / ARI from the contingency table —
            # all sums are exact integers in double, so the arithmetic
            # is bit-identical on both sides
            "WITH cells AS (SELECT lang, source, count(*) AS c "
            "FROM documents GROUP BY 1, 2), "
            "s AS (SELECT "
            "(SELECT sum(c*(c-1)/2.0) FROM cells) AS sij, "
            "(SELECT sum(n*(n-1)/2.0) FROM "
            "(SELECT sum(c) AS n FROM cells GROUP BY lang)) AS sa, "
            "(SELECT sum(n*(n-1)/2.0) FROM "
            "(SELECT sum(c) AS n FROM cells GROUP BY source)) AS sb, "
            "(SELECT sum(c)*(sum(c)-1)/2.0 FROM cells) AS tot, "
            "(SELECT sum(c) FROM cells) AS n) "
            "SELECT CAST(n AS BIGINT) AS n_rows, "
            "CAST(sa AS BIGINT) AS pairs_a, CAST(sb AS BIGINT) AS pairs_b, "
            "CAST(sij AS BIGINT) AS pairs_both, "
            "round((tot + 2*sij - sa - sb) / tot, 6) AS rand_index, "
            "round((sij - sa*sb/tot) / ((sa+sb)/2.0 - sa*sb/tot), 6) "
            "AS adjusted_rand FROM s"
        ),
        "snapshot_diff": (
            # replay the deterministic mutation, then a full-outer
            # diff by content (string equality — engine compares
            # 64-bit blake2 hashes of the same strings)
            "WITH old AS (SELECT doc_id, coalesce(text, '') AS text "
            "FROM documents), "
            "new AS (SELECT doc_id, "
            "CASE WHEN doc_id % 7 = 0 THEN coalesce(text, '') || ' v2' "
            "ELSE coalesce(text, '') END AS text "
            "FROM documents WHERE doc_id % 20 <> 0 "
            "UNION ALL SELECT doc_id + 100000, coalesce(text, '') "
            "FROM documents WHERE doc_id < 10) "
            "SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            "WHEN n.doc_id IS NULL THEN 'removed' "
            "WHEN o.text = n.text THEN 'unchanged' ELSE 'changed' END "
            "AS status "
            "FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id"
        ),
        "semantic_dedup_pairs": (
            # replay the query's deterministic duplicate augmentation,
            # then the exact all-pairs check at 0.95 — the k-means
            # bucketing must not change the >= 0.95 pair set (planted
            # exact duplicates always share their copy's cluster)
            "WITH aug AS (SELECT vec_id, embedding FROM embeddings "
            "WHERE vec_id < 500 UNION ALL "
            "SELECT vec_id + 10000, embedding FROM embeddings "
            "WHERE vec_id < 20) "
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
            "FROM aug a JOIN aug b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.95"
        ),
        "doc_hash_embeddings": (
            # replay the hashing-trick model exactly: md5_number_lower
            # == python md5 digest[8:16] little-endian; bucket h % 64,
            # sign from (h // 64) % 2; integer sums are engine-exact
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(coalesce(text, '')), "
            "'[a-z0-9_]+')) AS t FROM documents), "
            "hv AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok), "
            "c AS (SELECT doc_id, CAST(h % 64 AS BIGINT) AS j, "
            "CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS s FROM hv), "
            "comp AS (SELECT doc_id, j, CAST(sum(s) AS BIGINT) AS v "
            "FROM c GROUP BY doc_id, j) "
            "SELECT d.doc_id, "
            + ", ".join(
                f"CAST(coalesce(max(CASE WHEN j = {j} THEN v END), 0) "
                f"AS BIGINT) AS e{j}" for j in range(8)) +
            ", CAST(coalesce(sum(v * v), 0) AS BIGINT) AS norm2 "
            "FROM documents d LEFT JOIN comp USING (doc_id) "
            "GROUP BY d.doc_id"
        ),
        "embed_semantic_dedup": (
            # replay the augmentation (doc_id+100000, ' zzqx' appended),
            # the hashing model, then brute-force ALL pairs >= 0.9 —
            # the k-means-blocked engine must find the same set
            "WITH aug AS (SELECT doc_id, coalesce(text, '') AS text "
            "FROM documents UNION ALL "
            "SELECT doc_id + 100000, coalesce(text, '') || ' zzqx' "
            "FROM documents WHERE doc_id < 20), "
            "tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t "
            "FROM aug), "
            "hv AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok), "
            "c AS (SELECT doc_id, CAST(h % 64 AS BIGINT) AS j, "
            "CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS s FROM hv), "
            "comp AS (SELECT doc_id, j, CAST(sum(s) AS DOUBLE) AS v "
            "FROM c GROUP BY doc_id, j), "
            "grid AS (SELECT a.doc_id, r.j FROM "
            "(SELECT DISTINCT doc_id FROM aug) a CROSS JOIN "
            "(SELECT unnest(range(64)) AS j) r), "
            "dense AS (SELECT g.doc_id, "
            "array_agg(coalesce(comp.v, 0.0) ORDER BY g.j) AS emb "
            "FROM grid g LEFT JOIN comp "
            "ON g.doc_id = comp.doc_id AND g.j = comp.j "
            "GROUP BY g.doc_id) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "round(list_cosine_similarity(CAST(a.emb AS DOUBLE[]), "
            "CAST(b.emb AS DOUBLE[])), 6) AS cos_sim "
            "FROM dense a JOIN dense b ON a.doc_id < b.doc_id "
            "WHERE list_cosine_similarity(CAST(a.emb AS DOUBLE[]), "
            "CAST(b.emb AS DOUBLE[])) >= 0.95"
        ),
        "nb_lang_classifier": (
            # mirror the engine's explicit moment formulas (variance =
            # E[x^2] - E[x]^2 + 1e-6), NOT var_pop's internal algorithm
            "WITH f AS (SELECT doc_id, "
            "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, "
            "CAST(length(coalesce(text, '')) AS DOUBLE) AS f1, "
            "CAST(length(regexp_replace(coalesce(text, ''), '[^a-zA-Z0-9]', "
            "'', 'g')) AS DOUBLE) AS f2, "
            "CAST(len(regexp_extract_all(lower(coalesce(text, '')), "
            "'[a-z0-9_]+')) AS DOUBLE) AS f3 FROM documents), "
            "s AS (SELECT y, CAST(count(*) AS DOUBLE) AS n, "
            "sum(f1) AS s1, sum(f1*f1) AS q1, sum(f2) AS s2, "
            "sum(f2*f2) AS q2, sum(f3) AS s3, sum(f3*f3) AS q3 "
            "FROM f GROUP BY y), "
            "m AS (SELECT y, n, s1/n AS m1, greatest(q1/n - (s1/n)*(s1/n), 0) + 1e-6 AS v1, "
            "s2/n AS m2, greatest(q2/n - (s2/n)*(s2/n), 0) + 1e-6 AS v2, "
            "s3/n AS m3, greatest(q3/n - (s3/n)*(s3/n), 0) + 1e-6 AS v3 FROM s), "
            "t AS (SELECT sum(n) AS n FROM s), "
            "sc AS (SELECT f.doc_id, "
            "(ln(a.n / t.n) - 0.5*ln(2*pi()*a.v1) - (f1-a.m1)*(f1-a.m1)/(2*a.v1) "
            "- 0.5*ln(2*pi()*a.v2) - (f2-a.m2)*(f2-a.m2)/(2*a.v2) "
            "- 0.5*ln(2*pi()*a.v3) - (f3-a.m3)*(f3-a.m3)/(2*a.v3)) "
            "- (ln(b.n / t.n) - 0.5*ln(2*pi()*b.v1) - (f1-b.m1)*(f1-b.m1)/(2*b.v1) "
            "- 0.5*ln(2*pi()*b.v2) - (f2-b.m2)*(f2-b.m2)/(2*b.v2) "
            "- 0.5*ln(2*pi()*b.v3) - (f3-b.m3)*(f3-b.m3)/(2*b.v3)) AS lo "
            "FROM f, m a, m b, t WHERE a.y = 1 AND b.y = 0) "
            "SELECT doc_id, round(lo, 6) AS log_odds, lo > 0 AS pred FROM sc"
        ),
        "line_dedup": (
            # engine marks by 64-bit line hash, oracle by line string;
            # parallel unnest of equal-length lists zips (line, line_no)
            "WITH aug AS (SELECT doc_id, "
            "(CASE WHEN doc_id % 2 = 0 THEN 'cookie banner' || chr(10) "
            "ELSE '' END) || coalesce(text, '') || "
            "(CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'site footer' "
            "ELSE '' END) AS text FROM documents), "
            "t AS (SELECT doc_id, string_split(coalesce(text, ''), "
            "chr(10)) AS ls FROM aug), "
            "l AS (SELECT doc_id, unnest(generate_series(1, len(ls))) "
            "AS line_no, unnest(ls) AS line FROM t), "
            "freq AS (SELECT line FROM l GROUP BY line "
            "HAVING count(DISTINCT doc_id) >= 3), "
            "k AS (SELECT l.doc_id, l.line_no, l.line, "
            "f.line IS NOT NULL AS rm FROM l LEFT JOIN freq f USING (line)) "
            "SELECT doc_id, count(*) AS n_lines, "
            "CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, "
            "coalesce(string_agg(CASE WHEN rm THEN NULL ELSE line END, "
            "chr(10) ORDER BY line_no), '') AS clean_text "
            "FROM k GROUP BY doc_id"
        ),
        "curation_pipeline": (
            # composition of the exact-dup, corpus_filter and
            # lm_perplexity oracles; threshold applies to the ROUNDED
            # perplexity on both sides so a boundary doc cannot split
            "WITH t AS (SELECT doc_id, coalesce(text, '') AS text, "
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') AS toks "
            "FROM documents), "
            "dup AS (SELECT doc_id, doc_id <> min(doc_id) OVER "
            "(PARTITION BY text) AS is_dup FROM t), "
            "base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "round(length(array_to_string(toks, '')) * 1.0 "
            "/ greatest(len(toks), 1), 6) AS mean_word_len, "
            "round(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 "
            "/ greatest(length(text), 1), 6) AS alnum_ratio FROM t), "
            "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line "
            "FROM t), "
            "lc AS (SELECT doc_id, round((count(*) - count(DISTINCT line)) "
            "* 1.0 / count(*), 6) AS dup_line_frac FROM l GROUP BY doc_id), "
            "g AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], chr(31)) "
            "FOR i IN generate_series(1, len(toks)-1)]) AS gram FROM t), "
            "cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS tb "
            "FROM cnt GROUP BY doc_id), "
            "gr AS (SELECT base.doc_id, CASE "
            "WHEN n_tokens < 10 THEN 'too_few_tokens' "
            "WHEN n_tokens > 100000 THEN 'too_many_tokens' "
            "WHEN mean_word_len < 2.0 OR mean_word_len > 12.0 "
            "THEN 'mean_word_len' "
            "WHEN alnum_ratio < 0.5 THEN 'alnum_ratio' "
            "WHEN lc.dup_line_frac > 0.3 THEN 'dup_lines' "
            "WHEN coalesce(agg.tb, 0.0) > 0.2 THEN 'top_bigram' "
            "ELSE 'ok' END AS greason FROM base JOIN lc USING (doc_id) "
            "LEFT JOIN agg USING (doc_id)), "
            "wtok AS (SELECT doc_id, unnest(toks) AS w FROM t), "
            "wc AS (SELECT w, count(*) AS c FROM wtok GROUP BY w), "
            "topv AS (SELECT w, c FROM wc ORDER BY c DESC, w LIMIT 1000), "
            "par AS (SELECT (SELECT coalesce(sum(c), 0) FROM wc) AS n, "
            "(SELECT count(*) FROM topv) AS v, "
            "(SELECT coalesce(sum(c), 0) FROM wc) "
            "- (SELECT coalesce(sum(c), 0) FROM topv) AS cu), "
            "sc AS (SELECT wt.doc_id, "
            "ln((coalesce(tv.c, (SELECT cu FROM par)) + 1.0) "
            "/ ((SELECT n FROM par) + (SELECT v FROM par) + 1.0)) AS lp "
            "FROM wtok wt LEFT JOIN topv tv USING (w)), "
            "pp AS (SELECT doc_id, round(exp(-avg(lp)), 6) AS perplexity "
            "FROM sc GROUP BY doc_id), "
            "fin AS (SELECT t.doc_id, dup.is_dup, gr.greason, "
            "coalesce(pp.perplexity, 0.0) AS perplexity FROM t "
            "JOIN dup USING (doc_id) JOIN gr USING (doc_id) "
            "LEFT JOIN pp USING (doc_id)) "
            "SELECT doc_id, "
            "(NOT is_dup AND greason = 'ok' AND perplexity <= 31.0) AS keep, "
            "CASE WHEN is_dup THEN 'exact_dup' "
            "WHEN greason <> 'ok' THEN greason "
            "WHEN perplexity > 31.0 THEN 'high_perplexity' ELSE 'ok' END "
            "AS reason, perplexity FROM fin"
        ),
        "curation_adaptive": (
            # composition of the exact-dup, corpus_filter and
            # lm_perplexity oracles; threshold applies to the ROUNDED
            # perplexity on both sides so a boundary doc cannot split
            "WITH t AS (SELECT doc_id, coalesce(text, '') AS text, "
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') AS toks "
            "FROM documents), "
            "dup AS (SELECT doc_id, doc_id <> min(doc_id) OVER "
            "(PARTITION BY text) AS is_dup FROM t), "
            "base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "round(length(array_to_string(toks, '')) * 1.0 "
            "/ greatest(len(toks), 1), 6) AS mean_word_len, "
            "round(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) * 1.0 "
            "/ greatest(length(text), 1), 6) AS alnum_ratio FROM t), "
            "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line "
            "FROM t), "
            "lc AS (SELECT doc_id, round((count(*) - count(DISTINCT line)) "
            "* 1.0 / count(*), 6) AS dup_line_frac FROM l GROUP BY doc_id), "
            "g AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], chr(31)) "
            "FOR i IN generate_series(1, len(toks)-1)]) AS gram FROM t), "
            "cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS tb "
            "FROM cnt GROUP BY doc_id), "
            "gr AS (SELECT base.doc_id, CASE "
            "WHEN n_tokens < 10 THEN 'too_few_tokens' "
            "WHEN n_tokens > 100000 THEN 'too_many_tokens' "
            "WHEN mean_word_len < 2.0 OR mean_word_len > 12.0 "
            "THEN 'mean_word_len' "
            "WHEN alnum_ratio < 0.5 THEN 'alnum_ratio' "
            "WHEN lc.dup_line_frac > 0.3 THEN 'dup_lines' "
            "WHEN coalesce(agg.tb, 0.0) > 0.2 THEN 'top_bigram' "
            "ELSE 'ok' END AS greason FROM base JOIN lc USING (doc_id) "
            "LEFT JOIN agg USING (doc_id)), "
            "wtok AS (SELECT doc_id, unnest(toks) AS w FROM t), "
            "wc AS (SELECT w, count(*) AS c FROM wtok GROUP BY w), "
            "topv AS (SELECT w, c FROM wc ORDER BY c DESC, w LIMIT 1000), "
            "par AS (SELECT (SELECT coalesce(sum(c), 0) FROM wc) AS n, "
            "(SELECT count(*) FROM topv) AS v, "
            "(SELECT coalesce(sum(c), 0) FROM wc) "
            "- (SELECT coalesce(sum(c), 0) FROM topv) AS cu), "
            "sc AS (SELECT wt.doc_id, "
            "ln((coalesce(tv.c, (SELECT cu FROM par)) + 1.0) "
            "/ ((SELECT n FROM par) + (SELECT v FROM par) + 1.0)) AS lp "
            "FROM wtok wt LEFT JOIN topv tv USING (w)), "
            "pp AS (SELECT doc_id, round(exp(-avg(lp)), 6) AS perplexity "
            "FROM sc GROUP BY doc_id), "
            "fin AS (SELECT t.doc_id, dup.is_dup, gr.greason, "
            "coalesce(pp.perplexity, 0.0) AS perplexity FROM t "
            "JOIN dup USING (doc_id) JOIN gr USING (doc_id) "
            "LEFT JOIN pp USING (doc_id)), "
            "thq AS (SELECT round(quantile_cont(perplexity, 0.9), 6) AS q "
            "FROM fin WHERE perplexity > 0) "
            "SELECT doc_id, "
            "(NOT is_dup AND greason = 'ok' AND perplexity <= (SELECT q FROM thq)) AS keep, "
            "CASE WHEN is_dup THEN 'exact_dup' "
            "WHEN greason <> 'ok' THEN greason "
            "WHEN perplexity > (SELECT q FROM thq) THEN 'high_perplexity' ELSE 'ok' END "
            "AS reason, perplexity FROM fin"
        ),
        "media_decode_real": (
            # expected decode output recomputed in closed form: pixels
            # are (doc_id + k) % 256 for k in 0..N-1, so their sum is
            # full-cycle count * 32640 plus a wrapped arithmetic tail.
            # Equality with the engine proves the zlib+unfilter pixel
            # path inverts the encoder exactly (not just the header).
            "WITH p AS (SELECT doc_id, "
            "(doc_id % 16 + 1) * (doc_id % 12 + 1) * 3 AS n, "
            "doc_id % 256 AS a FROM documents), "
            "q AS (SELECT doc_id, n, a, n // 256 AS fc, n % 256 AS rem FROM p) "
            "SELECT doc_id, "
            "CAST(doc_id % 16 + 1 AS INTEGER) AS width, "
            "CAST(doc_id % 12 + 1 AS INTEGER) AS height, "
            "(fc * 32640 + CASE WHEN a + rem <= 256 "
            "THEN rem * a + (rem * (rem - 1)) // 2 "
            "ELSE ((a + 255) * (256 - a)) // 2 "
            "+ ((rem - 256 + a) * (rem - 256 + a - 1)) // 2 "
            "END) * 1.0 / n AS mean_value "
            "FROM q"
        ),
        "embedding_near_dups": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE a.vec_id < 500 AND b.vec_id < 500 "
            "AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.45"
        ),
        "events_value_corr": (
            "SELECT event_type, count(*) AS n, "
            "round(avg(value), 6) AS x_mean, round(avg(hour), 6) AS y_mean, "
            "round(stddev_samp(value), 6) AS x_std, "
            "round(stddev_samp(hour), 6) AS y_std, "
            "round(corr(value, hour), 6) AS corr_xy "
            "FROM (SELECT event_type, value, "
            "CAST(extract(hour FROM ts) AS DOUBLE) AS hour FROM events) "
            "GROUP BY event_type"
        ),
        "tfidf_top_terms": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), "
            "dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM documents), "
            "scored AS (SELECT doc_id, term, tf, df, "
            "round(tf * ln((SELECT n FROM nn) * 1.0 / df), 6) AS tfidf "
            "FROM tf JOIN dfq USING (term)), "
            "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY tfidf DESC, term) AS rn FROM scored) "
            "SELECT doc_id, term, tf, df, tfidf FROM rk WHERE rn <= 5"
        ),
        "events_cube": (
            "SELECT event_type, day_part, count(*) AS n, "
            "min(value) AS min_value, max(value) AS max_value, "
            "CAST(GROUPING(event_type, day_part) AS BIGINT) AS grouping_id "
            "FROM (SELECT event_type, "
            "CAST(extract(hour FROM ts) AS BIGINT) // 6 AS day_part, value "
            "FROM events) GROUP BY CUBE(event_type, day_part)"
        ),
        "weighted_doc_sample": (
            "SELECT doc_id, n_chars, "
            "(((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761) "
            "% 4294967296 + 1) * 1.0 / n_chars AS priority "
            "FROM documents ORDER BY priority, doc_id LIMIT 200"
        ),
        "props_k_stats": (
            "WITH e AS (SELECT TRY_CAST(regexp_extract(props, "
            "'\"k\"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) AS k, value FROM events) "
            "SELECT k // 10 AS k_bucket, count(*) AS n_events, "
            "round(avg(value), 6) AS avg_value "
            "FROM e WHERE k IS NOT NULL GROUP BY 1"
        ),
        "doc_len_quantiles_by_lang": (
            "SELECT lang, "
            "round(quantile_cont(n_chars, 0.25), 6) AS p25, "
            "round(quantile_cont(n_chars, 0.50), 6) AS p50, "
            "round(quantile_cont(n_chars, 0.75), 6) AS p75, "
            "round(quantile_cont(n_chars, 0.95), 6) AS p95 "
            "FROM documents GROUP BY lang"
        ),
    }
    # the incremental merge must equal the from-scratch pipeline run
    # over the union corpus, so it shares that oracle verbatim
    d["incremental_dedup_docs"] = d["dedup_docs_pipeline"]
    d["url_canonical_dedup"] = (
        "WITH raw AS (SELECT doc_id, "
        "(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTP' END) || '://' || "
        "(CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) || "
        "'Site-' || ((doc_id % 97) % 10) || '.Example' || "
        "(CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END) || "
        "'/a/' || (doc_id % 97) || "
        "(CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) || "
        "(CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&id=' || (doc_id % 97) "
        "ELSE '?id=' || (doc_id % 97) END) || "
        "(CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END) AS url FROM documents), "
        "c1 AS (SELECT url, regexp_replace(url, '#.*$', '') AS u FROM raw), "
        "c2 AS (SELECT url, concat("
        "lower(regexp_extract(u, '^[^:/?#]+://[^/?#]*')), "
        "substr(u, length(regexp_extract(u, '^[^:/?#]+://[^/?#]*')) + 1)) AS u FROM c1), "
        "c3 AS (SELECT url, regexp_replace(u, '://www\\.', '://') AS u FROM c2), "
        "c4 AS (SELECT url, regexp_replace(regexp_replace(u, "
        "'^(http://[^/?#:]*):80(/)', '\\1\\2'), "
        "'^(https://[^/?#:]*):443(/)', '\\1\\2') AS u FROM c3), "
        "c5 AS (SELECT url, regexp_replace(u, 'utm_[a-z_]+=[^&#]*&', '', 'g') AS u FROM c4), "
        "c6 AS (SELECT url, regexp_replace(u, '[?&]utm_[a-z_]+=[^&#]*$', '') AS u FROM c5), "
        "c7 AS (SELECT url, regexp_replace(regexp_replace(u, '/\\?', '?', 'g'), "
        "'/$', '') AS u FROM c6) "
        "SELECT u AS canonical_url, count(*) AS n_variants, "
        "min(url) AS first_url FROM c7 GROUP BY u"
    )
    d["pages_domain_stats"] = (
        "WITH p AS (SELECT url, text FROM read_parquet('"
        + pages_cache_001 + "/pages.parquet')) "
        "SELECT regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) "
        "AS domain, count(*) AS n_pages, "
        "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
        "round(avg(length(text)), 6) AS avg_chars "
        "FROM p GROUP BY 1"
    )
    d["pages_domain_cap"] = (
        "WITH p AS (SELECT url, text FROM read_parquet('"
        + pages_cache_001 + "/pages.parquet')), "
        "e AS (SELECT "
        "regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) "
        "AS domain, url, CAST(length(text) AS BIGINT) AS text_len FROM p) "
        "SELECT domain, url, text_len FROM e "
        "QUALIFY row_number() OVER "
        "(PARTITION BY domain ORDER BY text_len DESC, url) <= 5"
    )
    d["pii_redaction"] = (
        "WITH aug AS (SELECT doc_id, "
        "coalesce(text, '') || ' contact user' || doc_id || '@mail-' || "
        "(doc_id % 7) || '.example.org or 10.' || (doc_id % 200) || '.' || "
        "(doc_id % 97) || '.' || (doc_id % 251) || ' phone +1555' || "
        "lpad(CAST(doc_id AS VARCHAR), 7, '0') AS t FROM documents) "
        "SELECT doc_id, "
        "regexp_replace(regexp_replace(regexp_replace(t, "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
        "'\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'), "
        "'\\+[0-9]{7,15}', '<PHONE>', 'g') AS clean_text, "
        "regexp_matches(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS has_email, "
        "regexp_matches(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b') AS has_ip, "
        "regexp_matches(t, '\\+[0-9]{7,15}') AS has_phone "
        "FROM aug"
    )
    d["mixture_token_sample"] = (
        "WITH t AS (SELECT source, doc_id, "
        "len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tokens "
        "FROM documents), "
        "w AS (SELECT source, doc_id, n_tokens, "
        "coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY "
        "((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761) % 4294967296, "
        "doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS before FROM t) "
        "SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens "
        "FROM w WHERE before < 20000"
    )
    d["sequence_packing"] = (
        "WITH t AS (SELECT doc_id, "
        "len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tokens "
        "FROM documents), "
        "w AS (SELECT doc_id, n_tokens, "
        "coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so FROM t) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(so AS BIGINT) AS start_offset, "
        "CAST(so // 2048 AS BIGINT) AS first_chunk, "
        "CAST((CASE WHEN n_tokens = 0 THEN so ELSE so + n_tokens - 1 END) "
        "// 2048 AS BIGINT) AS last_chunk FROM w"
    )
    d["benchmark_contamination"] = (
        "WITH " + _SHINGLE_CTE + ", "
        "bench AS (SELECT DISTINCT g FROM s WHERE doc_id % 29 = 0), "
        "hits AS (SELECT s.doc_id, count(*) AS n_shared "
        "FROM s JOIN bench USING (g) WHERE s.doc_id % 29 <> 0 "
        "GROUP BY s.doc_id) "
        "SELECT h.doc_id, sz AS n_shingles, n_shared "
        "FROM hits h JOIN sizes ON sizes.doc_id = h.doc_id"
    )
    d["bm25_search"] = (
        # Okapi BM25 (k1=1.2, b=0.75, Lucene ln(1+...) idf) for the
        # query terms {hash, join, dup}; ranking on the ROUNDED score
        # with doc_id tiebreak exactly as gencore_ray/ops/search.py
        "WITH tok AS (SELECT doc_id, "
        "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') AS toks "
        "FROM documents), "
        "dl AS (SELECT doc_id, len(toks) AS dl FROM tok), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM "
        "(SELECT doc_id, unnest(toks) AS tok FROM tok) "
        "WHERE tok IN ('hash', 'join', 'dup') GROUP BY 1, 2), "
        "st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl), "
        "dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
        "sc AS (SELECT tf.doc_id, "
        "round(sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5)) "
        "* tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl "
        "/ (SELECT avgdl FROM st)))), 6) AS score "
        "FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) "
        "GROUP BY tf.doc_id) "
        "SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10"
    )
    d["heavy_hitter_tokens"] = (
        # the MG sketch at capacity >= vocabulary is exact, so the plain
        # GROUP BY count is its precise replay
        "SELECT tok AS token, count(*) AS est_count FROM "
        "(SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), "
        "'[a-z0-9_]+')) AS tok FROM documents) "
        "GROUP BY tok ORDER BY est_count DESC, token LIMIT 10"
    )
    # the suffix-array pass recomputes duplicate_span_stats' semantics
    # by a different algorithm (prefix doubling, no window hashing) —
    # one SQL truth, two engine paths proven against it
    d["suffix_array_spans"] = d["duplicate_span_stats"]
    d["embedding_covariance"] = (
        # engine folds float64 (n, sum, outer-sum) partials; the oracle
        # recomputes sum(a*b) per coordinate pair over the unnested
        # list column (parallel unnests zip in DuckDB).  float32 inputs
        # are exact in float64, so only summation ORDER differs —
        # ~1e-13 absolute, invisible at round 6.
        "WITH e AS (SELECT vec_id, unnest(embedding) AS v, "
        "unnest(range(len(embedding))) AS i FROM embeddings), "
        "n AS (SELECT count(*) AS n FROM embeddings), "
        "s AS (SELECT i, sum(CAST(v AS DOUBLE)) AS sv FROM e GROUP BY i), "
        "p AS (SELECT a.i AS i, b.i AS j, "
        "sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS spp "
        "FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY a.i, b.i) "
        "SELECT p.i, p.j, round((spp - sa.sv * sb.sv / n.n) / (n.n - 1), 6) "
        "AS cov FROM p, n JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j"
    )
    from gencore_ray.ops.split import split_sql_case

    d["train_val_test_split"] = (
        "WITH t AS (SELECT lang, n_chars, "
        + split_sql_case("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, 42)
        + " AS split FROM documents) "
        "SELECT split, lang, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM t GROUP BY split, lang"
    )
    d["normalized_text_stats"] = (
        # the regex literal carries a REAL tab byte (chr 9) — DuckDB
        # string literals pass it through, matching the Arrow kernel
        "WITH aug AS (SELECT doc_id, text || " + _NORM_SUFFIX_SQL + " AS t "
        "FROM documents), "
        "n AS (SELECT doc_id, t, "
        "trim(regexp_replace(nfc_normalize(t), '[ \t]+', ' ', 'g'), ' ') "
        "AS nt FROM aug) "
        "SELECT doc_id, md5(nt) AS norm_md5, "
        "CAST(strlen(nt) AS BIGINT) AS norm_bytes, (nt != t) AS changed "
        "FROM n"
    )
    d["edit_distance_pairs"] = (
        # levenshtein in DuckDB is BYTE-unit; ops/editdist.py matches
        # (similarity denominators are strlen = byte lengths too)
        "WITH k AS (SELECT doc_id, substr(text, 1, 64) AS pfx, "
        "substr(text, 1, 240) AS t240, "
        "strlen(substr(text, 1, 240)) AS bl FROM documents), "
        "p AS (SELECT a.doc_id AS a, b.doc_id AS b, a.t240 AS ta, "
        "b.t240 AS tb, greatest(a.bl, b.bl) AS mx FROM k a "
        "JOIN k b ON a.pfx = b.pfx AND a.doc_id < b.doc_id) "
        "SELECT a, b, levenshtein(ta, tb) AS edit_distance, "
        "round(CASE WHEN mx = 0 THEN 1.0 ELSE "
        "1.0 - levenshtein(ta, tb) / CAST(mx AS DOUBLE) END, 6) "
        "AS edit_similarity FROM p"
    )
    d["purchase_graph_pagerank"] = _pagerank_sql(iters=10, damping=0.85)
    d["dedup_recall"] = (
        "WITH eng AS (" + _pages_pipeline_sql(pages_cache_001) + "), "
        "tr AS (SELECT url, true_cluster FROM "
        f"read_parquet('{pages_cache_001}/truth.parquet')), "
        "j AS (SELECT tr.true_cluster AS tc, eng.cluster_id AS ec "
        "FROM tr JOIN eng ON eng.url = tr.url), "
        "tp AS (SELECT coalesce(sum((c * (c - 1)) // 2), 0) AS v FROM "
        "(SELECT count(*) AS c FROM j GROUP BY tc)), "
        "ep AS (SELECT coalesce(sum((c * (c - 1)) // 2), 0) AS v FROM "
        "(SELECT count(*) AS c FROM j GROUP BY ec)), "
        "mp AS (SELECT coalesce(sum((c * (c - 1)) // 2), 0) AS v FROM "
        "(SELECT count(*) AS c FROM j GROUP BY tc, ec)) "
        "SELECT CAST(tp.v AS BIGINT) AS true_pairs, "
        "CAST(ep.v AS BIGINT) AS engine_pairs, "
        "CAST(mp.v AS BIGINT) AS matched_pairs, "
        "round(CAST(mp.v AS DOUBLE) / tp.v, 6) AS recall, "
        "round(CAST(mp.v AS DOUBLE) / ep.v, 6) AS pair_precision "
        "FROM tp, ep, mp"
    )
    d["grouped_line_dedup"] = (
        "WITH aug AS (SELECT doc_id, lang, "
        "(CASE WHEN doc_id % 2 = 0 THEN 'promo ' || lang || chr(10) "
        "ELSE '' END) || coalesce(text, '') || "
        "(CASE WHEN doc_id % 101 < 2 THEN chr(10) || 'rare note' "
        "ELSE '' END) AS text FROM documents), "
        "t AS (SELECT doc_id, lang, "
        "string_split(coalesce(text, ''), chr(10)) AS ls FROM aug), "
        "l AS (SELECT doc_id, lang, "
        "unnest(generate_series(1, len(ls))) AS line_no, "
        "unnest(ls) AS line FROM t), "
        "freq AS (SELECT lang, line FROM l GROUP BY lang, line "
        "HAVING count(DISTINCT doc_id) >= 3), "
        "k AS (SELECT l.doc_id, l.line_no, l.line, "
        "f.line IS NOT NULL AS rm FROM l LEFT JOIN freq f "
        "ON f.lang = l.lang AND f.line = l.line) "
        "SELECT doc_id, count(*) AS n_lines, "
        "CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, "
        "coalesce(string_agg(CASE WHEN rm THEN NULL ELSE line END, "
        "chr(10) ORDER BY line_no), '') AS clean_text "
        "FROM k GROUP BY doc_id"
    )
    d["doc_chunks"] = (
        # chunk starts 0, 28, 56, ... while start < n_tokens; DuckDB
        # list slicing is 1-based inclusive, hence [start+1 : start+32]
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk "
        "FROM documents), "
        "st AS (SELECT doc_id, tk, "
        "unnest(generate_series(0, len(tk) - 1, 28)) AS s "
        "FROM toks WHERE len(tk) > 0) "
        "SELECT doc_id, CAST(s / 28 AS BIGINT) AS chunk_no, "
        "CAST(len(tk[s + 1 : s + 32]) AS BIGINT) AS n_tokens, "
        "array_to_string(tk[s + 1 : s + 32], ' ') AS chunk_text FROM st"
    )
    d["events_user_skew"] = (
        "WITH c AS (SELECT user_id, count(*) AS cnt FROM events "
        "GROUP BY user_id), "
        "s AS (SELECT count(*) AS n_keys, sum(cnt) AS total, "
        "max(cnt) AS mx, sum(CAST(cnt AS DOUBLE) * cnt) AS ssq FROM c), "
        "t AS (SELECT coalesce(sum(cnt), 0) AS s10 FROM "
        "(SELECT cnt FROM c ORDER BY cnt DESC LIMIT 10)) "
        "SELECT CAST(total AS BIGINT) AS n_rows, "
        "CAST(n_keys AS BIGINT) AS n_keys, CAST(mx AS BIGINT) AS max_count, "
        "round(CAST(mx AS DOUBLE) / total, 6) AS top1_share, "
        "round(CAST(s10 AS DOUBLE) / total, 6) AS top10_share, "
        "round(ssq / (CAST(total AS DOUBLE) * total), 6) AS hhi FROM s, t"
    )
    d["events_asof_join"] = (
        "WITH p AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, max(value) AS cv FROM events "
        "WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts, "
        "round(c.cv, 6) AS last_click_value "
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
    )
    d["events_sliding_1h"] = (
        "SELECT event_id, count(*) OVER w AS win_n, "
        "sum(CAST(floor(value) AS BIGINT)) OVER w AS win_vsum, "
        "(sum(CAST(floor(value) AS BIGINT)) OVER w) * 1.0 "
        "/ (count(*) OVER w) AS win_avg "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    d["session_overlap_pairs"] = (
        "WITH d AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
        "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM d), "
        "g AS (SELECT user_id, session_id, count(*) AS n_events, "
        "min(ts) AS session_start, max(ts) AS session_end "
        "FROM s GROUP BY user_id, session_id), "
        "f AS (SELECT user_id * 1000000 + session_id AS iv_id, "
        "epoch_us(session_start) AS lo, epoch_us(session_end) AS hi "
        "FROM g WHERE n_events >= 2) "
        "SELECT a.iv_id AS id_a, b.iv_id AS id_b FROM f a JOIN f b "
        "ON a.iv_id < b.iv_id AND a.lo <= b.hi AND b.lo <= a.hi"
    )
    d["embedding_knn_graph"] = (
        "WITH p AS (SELECT a.vec_id, b.vec_id AS nbr_id, "
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim "
        "FROM embeddings a JOIN embeddings b "
        "ON a.vec_id < 500 AND b.vec_id < 500 AND a.vec_id <> b.vec_id), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY cos_sim DESC, nbr_id) AS rank FROM p) "
        "SELECT vec_id, nbr_id, cos_sim, rank FROM r WHERE rank <= 5"
    )
    d["returned_item_report"] = (
        "WITH lo AS (SELECT l_orderkey, "
        "sum(l_extendedprice * (1 - l_discount)) AS order_rev "
        "FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey), "
        "j AS (SELECT o.o_custkey, lo.order_rev FROM lo "
        "JOIN orders o ON lo.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1996-07-01'), "
        "pc AS (SELECT o_custkey, round(sum(order_rev), 2) AS revenue, "
        "count(*) AS n_orders FROM j GROUP BY o_custkey) "
        "SELECT pc.o_custkey, c.c_name, n.n_name, pc.revenue, pc.n_orders "
        "FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "ORDER BY pc.revenue DESC, pc.o_custkey LIMIT 20"
    )
    d["tfidf_cosine_pairs"] = (
        "WITH tok AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM documents), "
        "tf AS (SELECT doc_id, md5_number_lower(t) AS th, "
        "CAST(count(*) AS BIGINT) AS tf "
        "FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, th), "
        "dfq AS (SELECT th, count(*) AS df FROM tf GROUP BY th), "
        "v AS (SELECT th, ln((SELECT count(*) FROM documents) * 1.0 / df) AS idf "
        "FROM dfq WHERE df BETWEEN 2 AND "
        "floor(0.2 * (SELECT count(*) FROM documents))), "
        "w AS (SELECT tf.doc_id, tf.th, tf.tf * v.idf AS w "
        "FROM tf JOIN v USING(th)), "
        "nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY doc_id), "
        "p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, sum(a.w*b.w) AS dot "
        "FROM w a JOIN w b ON a.th = b.th AND a.doc_id < b.doc_id "
        "GROUP BY ia, ib) "
        "SELECT ia AS doc_a, ib AS doc_b, "
        "round(dot / (na.nrm * nb.nrm), 6) AS cos_sim "
        "FROM p JOIN nrm na ON p.ia = na.doc_id "
        "JOIN nrm nb ON p.ib = nb.doc_id "
        "WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.5"
    )
    d["events_funnel"] = (
        "WITH v AS (SELECT user_id, min(ts) AS stage_1_ts FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS stage_2_ts FROM events e "
        "JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.ts >= v.stage_1_ts "
        "GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS stage_3_ts FROM events e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts >= c.stage_2_ts "
        "GROUP BY e.user_id) "
        "SELECT v.user_id, v.stage_1_ts, c.stage_2_ts, p.stage_3_ts, "
        "CASE WHEN p.stage_3_ts IS NOT NULL THEN 3 "
        "WHEN c.stage_2_ts IS NOT NULL THEN 2 ELSE 1 END AS stage_reached "
        "FROM v LEFT JOIN c ON v.user_id = c.user_id "
        "LEFT JOIN p ON v.user_id = p.user_id"
    )
    d["events_quality_report"] = (
        "SELECT 'unique(event_id)' AS check_name, "
        "count(*) - count(DISTINCT event_id) AS violations, "
        "count(*) AS n_rows FROM events "
        "UNION ALL SELECT 'not_null(props)', "
        "count(*) FILTER (props IS NULL), count(*) FROM events "
        "UNION ALL SELECT 'accepted_values(event_type)', "
        "count(*) FILTER (event_type IS NOT NULL AND event_type NOT IN "
        "('view', 'click', 'purchase')), count(*) FROM events "
        "UNION ALL SELECT 'range(value,[0.0,500.0))', "
        "count(*) FILTER (value < 0.0 OR value >= 500.0), count(*) FROM events "
        "UNION ALL SELECT 'foreign_key(user_id)', "
        "count(*) FILTER (user_id IS NOT NULL AND user_id NOT IN "
        "(SELECT c_custkey FROM customer)), count(*) FROM events"
    )
    d["events_customer_skew_join"] = (
        "SELECT e.event_id, e.user_id, e.value, c.c_acctbal "
        "FROM events e JOIN customer c ON e.user_id = c.c_custkey"
    )
    d["source_token_divergence"] = (
        "WITH tok AS (SELECT source, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t "
        "FROM documents), "
        "cnt AS (SELECT source, md5_number_lower(t) AS th, "
        "CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY source, th), "
        "tot AS (SELECT th, sum(c) AS tc FROM cnt GROUP BY th), "
        "v AS (SELECT th FROM tot ORDER BY tc DESC, th LIMIT 2000), "
        "nv AS (SELECT count(*) AS n FROM v), "
        "srcs AS (SELECT DISTINCT source FROM documents), "
        "m AS (SELECT v.th, s.source, coalesce(cnt.c, 0) AS c "
        "FROM v CROSS JOIN srcs s "
        "LEFT JOIN cnt ON cnt.th = v.th AND cnt.source = s.source), "
        "g AS (SELECT source, sum(c) AS gn FROM m GROUP BY source), "
        "p AS (SELECT m.th, m.source, "
        "(m.c + 1.0) / (g.gn + (SELECT n FROM nv)) AS pr "
        "FROM m JOIN g ON m.source = g.source) "
        "SELECT a.source AS group_a, b.source AS group_b, "
        "round(sum(0.5 * a.pr * ln(a.pr / ((a.pr + b.pr) / 2)) "
        "+ 0.5 * b.pr * ln(b.pr / ((a.pr + b.pr) / 2))), 6) AS js_divergence "
        "FROM p a JOIN p b ON a.th = b.th AND a.source < b.source "
        "GROUP BY a.source, b.source"
    )
    d["doc_length_outliers"] = (
        "WITH med AS (SELECT lang, round(quantile_cont(n_chars, 0.5), 6) "
        "AS med FROM documents GROUP BY lang), "
        "dev AS (SELECT d.doc_id, d.lang, d.n_chars, m.med, "
        "abs(d.n_chars - m.med) AS ad FROM documents d "
        "JOIN med m ON d.lang = m.lang), "
        "mad AS (SELECT lang, round(quantile_cont(ad, 0.5), 6) AS mad "
        "FROM dev GROUP BY lang) "
        "SELECT dev.doc_id, dev.lang, dev.n_chars, dev.med, mad.mad, "
        "CASE WHEN mad.mad = 0 THEN NULL "
        "ELSE round(0.6745 * (dev.n_chars - dev.med) / mad.mad, 6) END "
        "AS mod_z, "
        "CASE WHEN mad.mad = 0 THEN false "
        "ELSE abs(round(0.6745 * (dev.n_chars - dev.med) / mad.mad, 6)) > 3.5 "
        "END AS is_outlier "
        "FROM dev JOIN mad ON dev.lang = mad.lang"
    )
    d["user_retention_cohorts"] = (
        "WITH p AS (SELECT user_id, date_trunc('day', ts) AS d FROM events), "
        "f AS (SELECT user_id, min(d) AS cohort FROM p GROUP BY user_id), "
        "a AS (SELECT DISTINCT p.user_id, f.cohort, "
        "CAST(date_diff('day', f.cohort, p.d) AS BIGINT) AS period_offset "
        "FROM p JOIN f ON p.user_id = f.user_id) "
        "SELECT cohort, period_offset, count(*) AS n_active "
        "FROM a GROUP BY cohort, period_offset"
    )
    d["doc_token_entropy"] = (
        "WITH tok AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t "
        "FROM documents), "
        "c AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY doc_id, t), "
        "s AS (SELECT doc_id, sum(cnt) AS n FROM c GROUP BY doc_id), "
        "e AS (SELECT c.doc_id, count(*) AS ty, "
        "-sum((c.cnt * 1.0 / s.n) * ln(c.cnt * 1.0 / s.n)) AS ent "
        "FROM c JOIN s ON c.doc_id = s.doc_id GROUP BY c.doc_id) "
        "SELECT d.doc_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_tokens, "
        "round(coalesce(e.ent, 0), 6) AS entropy, "
        "round(coalesce(e.ty * 1.0 / s.n, 0), 6) AS type_token_ratio "
        "FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id "
        "LEFT JOIN e ON d.doc_id = e.doc_id"
    )
    d["top_session_paths"] = (
        "WITH d AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid "
        "FROM d), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid "
        "ORDER BY ts, event_id) AS pos FROM s), "
        "p AS (SELECT user_id, sid, "
        "string_agg(event_type, '->' ORDER BY ts, event_id) AS path "
        "FROM r WHERE pos <= 5 GROUP BY user_id, sid), "
        "c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY path) "
        "SELECT path, n_sessions FROM c "
        "ORDER BY n_sessions DESC, path LIMIT 20"
    )
    d["events_daily_filled"] = (
        "WITH p AS (SELECT user_id, date_trunc('day', ts) AS d, value "
        "FROM events), "
        "g AS (SELECT user_id, d, count(*) AS n_events, "
        "sum(value) AS total_value FROM p GROUP BY user_id, d), "
        "b AS (SELECT user_id, min(d) AS mn, max(d) AS mx FROM g "
        "GROUP BY user_id), "
        "dense AS (SELECT user_id, "
        "unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS period_start "
        "FROM b) "
        "SELECT dense.user_id, dense.period_start, "
        "coalesce(g.n_events, 0) AS n_events, "
        "round(coalesce(g.total_value, 0), 6) AS total_value "
        "FROM dense LEFT JOIN g ON g.user_id = dense.user_id "
        "AND g.d = dense.period_start"
    )
    # 32-term Morton interleave: bit i of each 16-bit bucket lands on
    # bit 2i (user_id) / 2i+1 (floor(value)) — built programmatically,
    # matching ops/zorder.py::morton_key exactly
    d["events_type_hour_chi2"] = (
        "WITH t AS (SELECT event_type AS a, "
        "CAST(extract(hour FROM ts) AS BIGINT) AS b FROM events), "
        "c AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS o "
        "FROM t GROUP BY a, b), "
        "ra AS (SELECT a, sum(o) AS ta FROM c GROUP BY a), "
        "rb AS (SELECT b, sum(o) AS tb FROM c GROUP BY b), "
        "nn AS (SELECT sum(o) AS n FROM c), "
        "grid AS (SELECT ra.a, rb.b, ra.ta, rb.tb FROM ra CROSS JOIN rb), "
        "j AS (SELECT g.a, g.b, coalesce(c.o, 0) AS o, "
        "g.ta * g.tb / (SELECT n FROM nn) AS e "
        "FROM grid g LEFT JOIN c ON g.a = c.a AND g.b = c.b) "
        "SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2, "
        "CAST(((SELECT count(*) FROM ra) - 1) "
        "* ((SELECT count(*) FROM rb) - 1) AS BIGINT) AS dof, "
        "CAST((SELECT n FROM nn) AS BIGINT) AS n_rows FROM j"
    )
    d["user_value_trends"] = (
        "WITH t AS (SELECT user_id, (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3600000000.0 AS x, "
        "value AS y FROM events), "
        "m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
        "sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, "
        "sum(x * y) AS sxy FROM t GROUP BY user_id) "
        "SELECT user_id, n, "
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope, "
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, "
        "6) AS intercept "
        "FROM m WHERE n >= 3 AND (n * sxx - sx * sx) <> 0"
    )
    d["weighted_jaccard_dups"] = (
        "WITH tok AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM documents), "
        "tf AS (SELECT doc_id, md5_number_lower(t) AS th, "
        "CAST(count(*) AS BIGINT) AS tf "
        "FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, th), "
        "dfq AS (SELECT th, count(*) AS df FROM tf GROUP BY th), "
        "v AS (SELECT th FROM dfq WHERE df BETWEEN 2 AND "
        "floor(0.5 * (SELECT count(*) FROM documents))), "
        "tp AS (SELECT tf.doc_id, tf.th, tf.tf FROM tf JOIN v USING(th)), "
        "tot AS (SELECT doc_id, sum(tf) AS tot FROM tp GROUP BY doc_id), "
        "p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, "
        "sum(least(a.tf, b.tf)) AS smin "
        "FROM tp a JOIN tp b ON a.th = b.th AND a.doc_id < b.doc_id "
        "GROUP BY ia, ib) "
        "SELECT ia AS doc_a, ib AS doc_b, "
        "round(smin * 1.0 / (ta.tot + tb.tot - smin), 6) AS w_jaccard "
        "FROM p JOIN tot ta ON p.ia = ta.doc_id "
        "JOIN tot tb ON p.ib = tb.doc_id "
        "WHERE round(smin * 1.0 / (ta.tot + tb.tot - smin), 6) >= 0.5"
    )
    d["sorted_neighborhood_pairs"] = (
        "WITH r AS (SELECT doc_id, substr(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', '', 'g'), 1, 8) AS sk FROM documents), "
        "rn AS (SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) - 1 "
        "AS rn FROM r) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(b.rn - a.rn AS BIGINT) AS rank_dist "
        "FROM rn a JOIN rn b ON b.rn > a.rn AND b.rn - a.rn <= 5"
    )
    d["neighborhood_edit_verify"] = (
        "WITH r AS (SELECT doc_id, substr(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', '', 'g'), 1, 8) AS sk FROM documents), "
        "rn AS (SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) - 1 "
        "AS rn FROM r), "
        "p AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM rn a "
        "JOIN rn b ON b.rn > a.rn AND b.rn - a.rn <= 5), "
        "k AS (SELECT doc_id, substr(text, 1, 240) AS t240, "
        "strlen(substr(text, 1, 240)) AS bl FROM documents) "
        "SELECT p.ia AS id_a, p.ib AS id_b, "
        "levenshtein(ka.t240, kb.t240) AS edit_distance, "
        "round(CASE WHEN greatest(ka.bl, kb.bl) = 0 THEN 1.0 ELSE "
        "1.0 - levenshtein(ka.t240, kb.t240) "
        "/ CAST(greatest(ka.bl, kb.bl) AS DOUBLE) END, 6) "
        "AS edit_similarity "
        "FROM p JOIN k ka ON p.ia = ka.doc_id "
        "JOIN k kb ON p.ib = kb.doc_id"
    )
    d["set_jaccard_join"] = (
        "WITH tok AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks FROM documents), "
        "dtok AS (SELECT DISTINCT doc_id, md5_number_lower(t) AS th "
        "FROM (SELECT doc_id, unnest(toks) AS t FROM tok)), "
        "dfq AS (SELECT th, count(*) AS df FROM dtok GROUP BY th), "
        "rk AS (SELECT d.doc_id, d.th, "
        "row_number() OVER (PARTITION BY d.doc_id ORDER BY q.df, d.th) - 1 "
        "AS pos, count(*) OVER (PARTITION BY d.doc_id) AS sz "
        "FROM dtok d JOIN dfq q ON d.th = q.th), "
        "pfx AS (SELECT doc_id, th, sz FROM rk "
        "WHERE pos < sz - ceil(0.75 * sz) + 1), "
        "cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib, "
        "a.sz AS sa, b.sz AS sb FROM pfx a "
        "JOIN pfx b ON a.th = b.th AND a.doc_id < b.doc_id "
        "WHERE b.sz >= 0.75 * a.sz AND a.sz >= 0.75 * b.sz), "
        "inter AS (SELECT c.ia, c.ib, count(*) AS i FROM cand c "
        "JOIN dtok x ON x.doc_id = c.ia "
        "JOIN dtok y ON y.doc_id = c.ib AND y.th = x.th GROUP BY c.ia, c.ib) "
        "SELECT c.ia AS doc_a, c.ib AS doc_b, "
        "round(i * 1.0 / (c.sa + c.sb - i), 6) AS jaccard "
        "FROM cand c JOIN inter ON c.ia = inter.ia AND c.ib = inter.ib "
        "WHERE round(i * 1.0 / (c.sa + c.sb - i), 6) >= 0.75"
    )
    d["events_watermark_lateness"] = (
        "SELECT event_id, ts, "
        "max(ts) OVER w - INTERVAL 10 MINUTE AS watermark, "
        "coalesce(ts < max(ts) OVER w - INTERVAL 10 MINUTE, false) "
        "AS is_late FROM events "
        "WINDOW w AS (ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    d["events_zorder_keys"] = 'SELECT event_id, ((((user_id % 65536) >> 0) & 1) * 1) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 0) & 1) * 2) + ((((user_id % 65536) >> 1) & 1) * 4) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 1) & 1) * 8) + ((((user_id % 65536) >> 2) & 1) * 16) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 2) & 1) * 32) + ((((user_id % 65536) >> 3) & 1) * 64) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 3) & 1) * 128) + ((((user_id % 65536) >> 4) & 1) * 256) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 4) & 1) * 512) + ((((user_id % 65536) >> 5) & 1) * 1024) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 5) & 1) * 2048) + ((((user_id % 65536) >> 6) & 1) * 4096) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 6) & 1) * 8192) + ((((user_id % 65536) >> 7) & 1) * 16384) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 7) & 1) * 32768) + ((((user_id % 65536) >> 8) & 1) * 65536) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 8) & 1) * 131072) + ((((user_id % 65536) >> 9) & 1) * 262144) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 9) & 1) * 524288) + ((((user_id % 65536) >> 10) & 1) * 1048576) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 10) & 1) * 2097152) + ((((user_id % 65536) >> 11) & 1) * 4194304) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 11) & 1) * 8388608) + ((((user_id % 65536) >> 12) & 1) * 16777216) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 12) & 1) * 33554432) + ((((user_id % 65536) >> 13) & 1) * 67108864) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 13) & 1) * 134217728) + ((((user_id % 65536) >> 14) & 1) * 268435456) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 14) & 1) * 536870912) + ((((user_id % 65536) >> 15) & 1) * 1073741824) + ((((CAST(floor(value) AS BIGINT) % 65536) >> 15) & 1) * 2147483648) AS zkey FROM events'
    return d
