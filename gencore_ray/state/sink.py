"""Resumable partitioned Parquet sink (SURVEY §2.1 S5, scale form).

The reference writes one output BAM stream (/root/reference/src/
writer.cpp); at 100 TB the equivalent must be a DIRECTORY of
key-partitioned Parquet files a failed job can resume into.  Layout::

    out_dir/part-00000.parquet ... part-{P-1:05d}.parquet
    out_dir/_sink_manifest.jsonl   (one record per completed partition)

Each partition is written ATOMICALLY (tmp file + os.replace), so a
file's existence proves the partition completed; a re-run with the
same partitioning (same key, same P → identical deterministic hash
routing) skips the write for every partition already on disk and only
fills the holes.  Output rows land in the partition of
``hash(key) % P`` — the same stable routing every exchange uses, so
the layout is reproducible across runs and machines.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _write_partition(table: pa.Table, out_dir: str, p: int) -> dict:
    import pyarrow.parquet as pq

    final = os.path.join(out_dir, f"part-{p:05d}.parquet")
    if os.path.exists(final):                       # completed earlier — skip
        return {"partition": p, "rows": pq.ParquetFile(final).metadata.num_rows,
                "skipped": True}
    tmp = final + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final)                          # atomic: exists == complete
    return {"partition": p, "rows": table.num_rows, "skipped": False}


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key: str,
    num_parts: int = 64,
) -> dict:
    """Write ``ds`` as ``num_parts`` hash-partitioned Parquet files,
    skipping partitions that already exist; returns summary counters
    and appends per-partition lineage to ``_sink_manifest.jsonl``."""
    from gencore_ray.stages.shuffle import exchange_refs, to_arrow_blocks

    os.makedirs(out_dir, exist_ok=True)
    ds = to_arrow_blocks(ds)
    # guard the skip-if-exists resume: a re-run with a different key,
    # partition count, or schema routes rows differently, so silently
    # skipping existing part files would produce a MIXED, corrupt
    # directory.  The sink config is pinned on first write and any
    # mismatch is a hard error (delete the directory to re-partition).
    cfg = {
        "key": key,
        "num_parts": num_parts,
        "schema": ",".join(
            f"{f.name}:{f.type}" for f in ds.schema().base_schema
        ),
    }
    cfg_path = os.path.join(out_dir, "_sink_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            prev = json.load(f)
        if prev != cfg:
            raise ValueError(
                f"write_partitioned resume mismatch in {out_dir}: existing "
                f"sink was written with {prev}, this run asks for {cfg}; "
                "refusing to mix partitionings — use a fresh directory or "
                "delete the old one"
            )
    else:
        tmp = cfg_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, cfg_path)
    t0 = time.monotonic()
    blocks, _ = exchange_refs(ds, key, num_parts)
    if blocks is None:
        return {"partitions": 0, "rows": 0, "skipped": 0, "written": 0}
    results = ray.get(
        [_write_partition.remote(blocks[p], out_dir, p) for p in range(num_parts)]
    )
    wall = round(time.monotonic() - t0, 3)
    with open(os.path.join(out_dir, "_sink_manifest.jsonl"), "a") as f:
        for r in results:
            f.write(json.dumps({**r, "wall_sec": wall}) + "\n")
    return {
        "partitions": num_parts,
        "rows": sum(r["rows"] for r in results),
        "skipped": sum(r["skipped"] for r in results),
        "written": sum(not r["skipped"] for r in results),
    }


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read a ``write_partitioned`` directory back as a Dataset."""
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    return rd.read_parquet(files)


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_mb: int = 128,
) -> dict:
    """Small-file compaction — the data-lake hygiene op every
    long-running incremental pipeline needs (daily merges leave
    thousands of tiny part files; reads then pay per-file open cost).

    Reads the directory, repartitions to ceil(total_bytes/target), and
    rewrites.  Returns {files_in, files_out, rows, bytes_in}.  The
    write is to a NEW directory (never in place) so a failed compaction
    leaves the source intact — swap directories only after success.
    """
    import ray.data as rd

    files = [
        os.path.join(in_dir, f) for f in sorted(os.listdir(in_dir))
        if f.endswith(".parquet")
    ]
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_in // (target_mb * 1024 * 1024)))
    ds = rd.read_parquet(in_dir)
    rows = ds.count()
    ds.repartition(int(n_out)).write_parquet(out_dir)
    files_out = sum(1 for f in os.listdir(out_dir) if f.endswith(".parquet"))
    return {"files_in": len(files), "files_out": files_out,
            "rows": rows, "bytes_in": bytes_in}
