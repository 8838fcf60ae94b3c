"""CLI entry point — EP1/EP2/EP3 parity with the reference binary.

The reference's single real entry point is `gencore <args>`
(/root/reference/src/main.cpp:29-89: cmdline parse -> Options ->
consensus run -> stderr/JSON reports), plus `gencore test` unit
vectors (src/main.cpp:18-22) and `gencore -v` (src/main.cpp:24-27).

    python -m gencore_ray dedup  -i corpus/pages -o /tmp/clusters \
        [--checkpoint-dir D] [--extract-html] [--cc driver|distributed] \
        [--jaccard 0.7] [--bands 32] [--rows 4] [--num-cpus N] ...
    python -m gencore_ray curate -i docs.parquet -o /tmp/verdicts \
        [--emit verdicts|kept] [--ppl-threshold 31] [--min-tokens 10] ...
    python -m gencore_ray semdedup -i vecs.parquet -o /tmp/pairs \
        [--threshold 0.95] [--k auto] [--max-cluster-size 20000]
    python -m gencore_ray profile -i table.parquet [--columns a,b]
    python -m gencore_ray diff --old day0.parquet --new day1.parquet
    python -m gencore_ray test       # reference-style builtin vectors
    python -m gencore_ray -v

Owns its Ray session (the ONLY library-adjacent code that may call
ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _cmd_dedup(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        # --address auto connects to a running cluster (the `ray job
        # submit` deployment shape: `ray start --head` on the cluster,
        # then this CLI as the job script); default runs a private
        # local instance
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.address == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=args.address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = not args.quiet

    from gencore_ray.config import DedupConfig
    from gencore_ray.pipelines.dedup import dedup_pages
    from gencore_ray.sources import read_pages

    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        bands=args.bands,
        rows_per_band=args.rows,
        num_perm=args.bands * args.rows,
        jaccard_threshold=args.jaccard,
        simhash_hamming_max=args.hamming,
        containment_threshold=args.containment,
        min_cluster_size=args.min_cluster_size,
        seed=args.seed,
    )
    t0 = time.monotonic()
    if args.format == "warc":
        from gencore_ray.sources import read_pages_warc

        # WARC records carry html only — text always comes from extraction
        args.extract_html = True
        pages = read_pages_warc(args.input)
    elif args.format == "jsonl":
        from gencore_ray.sources import SchemaError, read_pages_jsonl

        pages = read_pages_jsonl(args.input)
        need = "html" if args.extract_html else "text"
        names = pages.schema().base_schema.names
        if need not in names:
            raise SchemaError(
                f"jsonl input lacks required column {need!r}; has {names}"
            )
    else:
        pages = read_pages(args.input, need_html=args.extract_html)
    res = dedup_pages(
        pages, cfg,
        extract_html=args.extract_html,
        cc_mode=args.cc,
        checkpoint_dir=args.checkpoint_dir,
    )
    if args.output_partitions:
        from gencore_ray.state.sink import write_partitioned

        sink = write_partitioned(
            res.clusters, args.output, "url", num_parts=args.output_partitions
        )
        res.counters["sink_partitions_written"] = sink["written"]
        res.counters["sink_partitions_skipped"] = sink["skipped"]
    else:
        res.clusters.write_parquet(args.output)
    wall = time.monotonic() - t0
    report = {"counters": res.counters, "wall_sec": round(wall, 2),
              "output": args.output, "config_fingerprint": cfg.fingerprint()}
    print(json.dumps(report))
    ray.shutdown()
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    """Training-data curation verdicts (exact-dup + Gopher rules +
    LM-perplexity threshold) over a documents parquet."""
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.address == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=args.address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from gencore_ray.pipelines.curate import curate_documents
    from gencore_ray.stages.shuffle import hash_join

    num_parts = args.num_cpus or int(ray.cluster_resources().get("CPU", 8))
    t0 = time.monotonic()
    docs = rd.read_parquet(args.input)
    verdicts = curate_documents(
        docs, id_col=args.id_col, text_col=args.text_col,
        ppl_threshold=args.ppl_threshold,
        ppl_drop_frac=args.ppl_drop_frac, vocab_cap=args.vocab_cap,
        num_parts=num_parts, min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
    ).materialize()
    if args.emit == "kept":
        kept = verdicts.filter(expr="keep")
        out = hash_join(docs, kept.select_columns([args.id_col, "reason"]),
                        args.id_col, args.id_col, num_parts=num_parts,
                        how="semi")
        out.write_parquet(args.output)
    else:
        verdicts.write_parquet(args.output)
    by_reason = dict(
        verdicts.groupby("reason").count().to_pandas()
        .itertuples(index=False, name=None)
    )
    report = {
        "docs": verdicts.count(),
        "kept": int(by_reason.get("ok", 0)),
        "dropped_by_reason": {k: int(v) for k, v in sorted(by_reason.items())
                              if k != "ok"},
        "wall_sec": round(time.monotonic() - t0, 2),
        "output": args.output,
        "emit": args.emit,
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


def _cmd_semdedup(args: argparse.Namespace) -> int:
    """SemDeDup over an embeddings parquet: k-means blocking + exact
    within-cluster cosine check; pairs to parquet, cap accounting
    (subsampled_clusters / dropped_members) in the JSON report — the
    hot-cluster subsample is visible, never silent."""
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.address == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=args.address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from gencore_ray.ops.kmeans import semantic_dedup_pairs

    num_parts = args.num_cpus or int(ray.cluster_resources().get("CPU", 8))
    t0 = time.monotonic()
    if args.from_text:
        # full chain from a documents parquet: actor-pool embed stage
        # (hashing model) -> k-means blocking -> exact verify
        from gencore_ray.functions.embed import embed_texts

        docs = rd.read_parquet(args.input,
                               columns=[args.id_col, args.text_col])
        vecs = embed_texts(docs, dim=args.embed_dim, id_col=args.id_col,
                           concurrency=(1, max(2, num_parts // 2)),
                           text_col=args.text_col)
        vec_col = "embedding"
    else:
        vecs = rd.read_parquet(args.input,
                               columns=[args.id_col, args.vec_col])
        vec_col = args.vec_col
    counters: dict = {}
    pairs = semantic_dedup_pairs(
        vecs, threshold=args.threshold, k=args.k, iters=args.iters,
        id_col=args.id_col, vec_col=vec_col, num_parts=num_parts,
        max_cluster_size=args.max_cluster_size, counters=counters,
        probes=args.probes,
    ).materialize()
    pairs.write_parquet(args.output)
    report = {
        "pairs": pairs.count(),
        **counters,
        "threshold": args.threshold,
        "wall_sec": round(time.monotonic() - t0, 2),
        "output": args.output,
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


def _cmd_profile(args: argparse.Namespace) -> int:
    """Table profiling: per-column rows/nulls/exact-distincts +
    numeric min/max, printed as one JSON line per column."""
    import ray

    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 **({"num_cpus": args.num_cpus}
                    if args.address == "local" else {}))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from gencore_ray.ops.relational import profile_columns

    ds = rd.read_parquet(args.input)
    cols = args.columns.split(",") if args.columns else (
        ds.schema().base_schema.names)
    out = profile_columns(ds, cols, num_parts=8).to_pandas()
    for rec in out.to_dict("records"):
        rec = {k: (None if isinstance(v, float) and v != v else v)
               for k, v in rec.items()}          # NaN -> null (valid JSON)
        print(json.dumps(rec, default=str))
    ray.shutdown()
    return 0


def _cmd_split(args: argparse.Namespace) -> int:
    """Deterministic train/val/test split: write one partitioned
    parquet dir per split (ops/split.py hash assignment — membership
    is a pure function of the key, stable across runs, cluster sizes
    and repartitions), then one JSON summary line per split."""
    import ray

    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 **({"num_cpus": args.num_cpus}
                    if args.address == "local" else {}))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import os

    import ray.data as rd

    from gencore_ray.ops.split import hash_split, split_cutoffs

    fracs: dict[str, float] = {}
    for part in args.fracs.split(","):
        name, _, f = part.partition("=")
        fracs[name.strip()] = float(f)
    split_cutoffs(fracs)                     # fail fast on bad fractions

    # materialize once: each split filter is a metadata-cheap pass over
    # the same blocks instead of re-reading the input per split
    ds = hash_split(rd.read_parquet(args.input), args.key,
                    fracs=fracs, seed=args.seed).materialize()
    for name in fracs:
        sub_ds = ds.filter(expr=f"split == '{name}'").drop_columns(["split"])
        out = os.path.join(args.output, name)
        sub_ds.write_parquet(out)
        print(json.dumps({"split": name, "rows": sub_ds.count(),
                          "path": out}))
    ray.shutdown()
    return 0


def _cmd_chunk(args: argparse.Namespace) -> int:
    """Fixed-token chunking with overlap (ops/chunk.py): write the
    exploded (doc_id, chunk_no, n_tokens, chunk_text) table and print
    one JSON summary line."""
    import ray

    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 **({"num_cpus": args.num_cpus}
                    if args.address == "local" else {}))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from gencore_ray.ops.chunk import chunk_documents

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    chunks = chunk_documents(
        ds, id_col=args.id_col, text_col=args.text_col,
        chunk_tokens=args.chunk_tokens, overlap=args.overlap,
    ).materialize()
    chunks.write_parquet(args.output)
    n = chunks.count()
    toks = int(chunks.sum("n_tokens") or 0)
    print(json.dumps({"docs": ds.count(), "chunks": n,
                      "total_tokens": toks, "path": args.output}))
    ray.shutdown()
    return 0


def _cmd_diff(args: argparse.Namespace) -> int:
    """Corpus-version diff between two parquet snapshots."""
    import ray

    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 **({"num_cpus": args.num_cpus}
                    if args.address == "local" else {}))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from gencore_ray.ops.relational import snapshot_diff

    d = snapshot_diff(
        rd.read_parquet(args.old), rd.read_parquet(args.new),
        id_col=args.id_col, content_col=args.content_col, num_parts=8,
    ).materialize()
    counts = dict(d.groupby("status").count().to_pandas()
                  .itertuples(index=False, name=None))
    if args.output:
        d.write_parquet(args.output)
    print(json.dumps({"rows": d.count(),
                      **{k: int(v) for k, v in sorted(counts.items())},
                      "output": args.output}))
    ray.shutdown()
    return 0


def _cmd_quality(args: argparse.Namespace) -> int:
    """Declarative constraint checks; one JSON line per constraint.
    With --strict, exits 1 when any constraint has violations (the
    reference's refuse-bad-input-loudly discipline as a CI gate)."""
    import ray

    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 **({"num_cpus": args.num_cpus}
                    if args.address == "local" else {}))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as _pq
    import ray.data as rd

    from gencore_ray.ops.quality import constraint_report

    constraints: list[tuple] = []
    for spec in args.unique or []:
        constraints.append(("unique", spec.split(",")))
    for col in args.not_null or []:
        constraints.append(("not_null", col))
    for spec in args.accepted or []:
        col, _, vals = spec.partition("=")
        constraints.append(("accepted_values", col, vals.split("|")))
    for spec in args.range or []:
        col, _, bounds = spec.partition("=")
        lo, _, hi = bounds.partition(":")
        constraints.append(("range", col, float(lo), float(hi)))
    for spec in args.fk or []:
        col, _, target = spec.partition("=")
        path, _, dim_col = target.rpartition(":")
        keys = _pq.read_table(path, columns=[dim_col])[dim_col].to_numpy()
        constraints.append(("foreign_key", col, keys))
    if not constraints:
        print(json.dumps({"error": "no constraints given"}))
        return 2

    rep = constraint_report(rd.read_parquet(args.input), constraints,
                            num_parts=8).to_pandas()
    total = int(rep["violations"].sum())
    print(json.dumps({
        "input": args.input,
        "checks": rep.to_dict(orient="records"),
        "total_violations": total,
    }, default=int))
    ray.shutdown()
    return 1 if (args.strict and total) else 0


def _cmd_test(_args: argparse.Namespace) -> int:
    """Builtin unit vectors, reference-style (prints PASSED/FAILED)."""
    import numpy as np

    from gencore_ray.extract import extract_text
    from gencore_ray.functions.hashing import popcount64
    from gencore_ray.functions.text import (
        MinHasher, shingle_hashes, token_hashes_for_batch, tokenize,
    )
    from gencore_ray.oracle import union_find_clusters

    ok = True
    ok &= tokenize("Hello, World!") == ["hello", "world"]
    ok &= extract_text("<p>AT&amp;T</p>") == "AT&T"
    ths = token_hashes_for_batch(["a b c d e f", "a b c d e f"])
    mh = MinHasher(32, 42)
    ok &= bool(
        (mh.signature(shingle_hashes(ths[0], 5))
         == mh.signature(shingle_hashes(ths[1], 5))).all()
    )
    ok &= int(popcount64(np.uint64(0b1011))[0]) == 3
    lab = union_find_clusters(list("abc"), [("a", "b", 1.0)])
    ok &= lab == {"a": "a", "b": "a", "c": "c"}
    print("PASSED" if ok else "FAILED")
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-v", "--version"):
        from gencore_ray import __version__

        print(f"gencore_ray {__version__}")
        return 0

    p = argparse.ArgumentParser(prog="gencore_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="near-duplicate detection + clustering")
    d.add_argument("-i", "--input", required=True, help="pages parquet file/dir")
    d.add_argument("-o", "--output", required=True, help="clusters output dir")
    d.add_argument("--checkpoint-dir", default=None)
    d.add_argument("--address", default="local",
                   help="'local' (private instance) or 'auto'/host:port "
                        "to join an existing cluster (ray job submit shape)")
    d.add_argument("--format", choices=["parquet", "warc", "jsonl"],
                   default="parquet")
    d.add_argument("--output-partitions", type=int, default=0,
                   help="write the output as N resumable hash-partitioned "
                        "parquet files (0 = plain write_parquet)")
    d.add_argument("--extract-html", action="store_true")
    d.add_argument("--cc", choices=["auto", "driver", "distributed"], default="auto")
    d.add_argument("--shingle-k", type=int, default=5)
    d.add_argument("--bands", type=int, default=32)
    d.add_argument("--rows", type=int, default=4)
    d.add_argument("--jaccard", type=float, default=0.7)
    d.add_argument("--hamming", type=int, default=3)
    d.add_argument("--containment", type=float, default=0.9)
    d.add_argument("--min-cluster-size", type=int, default=1)
    d.add_argument("--seed", type=int, default=42)
    d.add_argument("--num-cpus", type=int, default=None)
    d.add_argument("--quiet", action="store_true", default=True)
    d.set_defaults(fn=_cmd_dedup)

    c = sub.add_parser("curate", help="training-data curation verdicts "
                       "(exact-dup + Gopher rules + perplexity)")
    c.add_argument("-i", "--input", required=True, help="documents parquet")
    c.add_argument("-o", "--output", required=True, help="output dir")
    c.add_argument("--emit", choices=["verdicts", "kept"], default="verdicts",
                   help="write per-doc verdicts, or only surviving docs")
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--text-col", default="text")
    c.add_argument("--ppl-threshold", type=float, default=31.0)
    c.add_argument("--ppl-drop-frac", type=float, default=None,
                   help="adaptive gate: drop the worst FRAC of the "
                        "corpus's own perplexity tail (overrides "
                        "--ppl-threshold)")
    c.add_argument("--vocab-cap", type=int, default=1000)
    c.add_argument("--min-tokens", type=int, default=10)
    c.add_argument("--max-tokens", type=int, default=100_000)
    c.add_argument("--address", default="local")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=_cmd_curate)

    sd = sub.add_parser("semdedup", help="semantic dedup pairs over an "
                        "embeddings parquet (k-means blocked, counted caps)")
    sd.add_argument("-i", "--input", required=True, help="embeddings parquet")
    sd.add_argument("-o", "--output", required=True, help="pairs output dir")
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--from-text", action="store_true",
                    help="input is a documents parquet: embed text "
                         "first via the actor-pool hashing model")
    sd.add_argument("--text-col", default="text")
    sd.add_argument("--embed-dim", type=int, default=64)
    sd.add_argument("--probes", type=int, default=1,
                    help="assign each vector to its top-p clusters "
                         "(boundary-pair recall insurance)")
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--k", type=int, default=None,
                    help="k-means clusters (default: auto, "
                         "ceil(n/target_cluster_size))")
    sd.add_argument("--iters", type=int, default=5)
    sd.add_argument("--max-cluster-size", type=int, default=20_000)
    sd.add_argument("--address", default="local")
    sd.add_argument("--num-cpus", type=int, default=None)
    sd.set_defaults(fn=_cmd_semdedup)

    pr = sub.add_parser("profile", help="per-column table profile")
    pr.add_argument("-i", "--input", required=True, help="parquet file/dir")
    pr.add_argument("--columns", default=None,
                    help="comma-separated (default: all)")
    pr.add_argument("--address", default="local")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=_cmd_profile)

    df_p = sub.add_parser("diff", help="corpus snapshot diff")
    df_p.add_argument("--old", required=True)
    df_p.add_argument("--new", required=True)
    df_p.add_argument("-o", "--output", default=None,
                      help="optionally write per-id statuses")
    df_p.add_argument("--id-col", default="doc_id")
    df_p.add_argument("--content-col", default="text")
    df_p.add_argument("--address", default="local")
    df_p.add_argument("--num-cpus", type=int, default=None)
    df_p.set_defaults(fn=_cmd_diff)

    sp = sub.add_parser("split", help="deterministic train/val/test "
                        "hash split into per-split parquet dirs")
    sp.add_argument("-i", "--input", required=True, help="parquet file/dir")
    sp.add_argument("-o", "--output", required=True, help="output root dir")
    sp.add_argument("--key", default="doc_id", help="hash key column")
    sp.add_argument("--fracs", default="train=0.8,val=0.1,test=0.1",
                    help="name=frac[,name=frac...] summing to 1")
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--address", default="local")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=_cmd_split)

    ch = sub.add_parser("chunk", help="fixed-token chunking with overlap")
    ch.add_argument("-i", "--input", required=True, help="parquet file/dir")
    ch.add_argument("-o", "--output", required=True, help="chunk table dir")
    ch.add_argument("--id-col", default="doc_id")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--chunk-tokens", type=int, default=64)
    ch.add_argument("--overlap", type=int, default=8)
    ch.add_argument("--address", default="local")
    ch.add_argument("--num-cpus", type=int, default=None)
    ch.set_defaults(fn=_cmd_chunk)

    q = sub.add_parser("quality", help="declarative data-quality "
                       "constraint checks (counters, optional CI gate)")
    q.add_argument("-i", "--input", required=True, help="parquet file/dir")
    q.add_argument("--unique", action="append", metavar="COL[,COL2]",
                   help="uniqueness over the column set (repeatable)")
    q.add_argument("--not-null", action="append", metavar="COL")
    q.add_argument("--accepted", action="append", metavar="COL=V1|V2",
                   help="accepted-values set (repeatable)")
    q.add_argument("--range", action="append", metavar="COL=LO:HI",
                   help="numeric half-open bound [LO, HI) (repeatable)")
    q.add_argument("--fk", action="append", metavar="COL=DIM.parquet:DIMCOL",
                   help="foreign-key containment in a dimension parquet")
    q.add_argument("--strict", action="store_true",
                   help="exit 1 if any constraint is violated")
    q.add_argument("--address", default="local")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=_cmd_quality)

    t = sub.add_parser("test", help="builtin unit vectors (reference EP2)")
    t.set_defaults(fn=_cmd_test)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
