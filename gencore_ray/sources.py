"""Sources: schema-validated Parquet readers (SURVEY §2.1 S1/S2).

The reference opens one BAM stream and validates its header before
processing (/root/reference/src/gencore.cpp:162-205,179-190).  Here a
read is ``ray.data.read_parquet`` with column pruning — file/row-group
parallelism replaces the single stream — and validation is a cheap
pyarrow schema check against the expected column set before the
pipeline is built.
"""

from __future__ import annotations

import ray.data as rd

PAGES_COLUMNS = {"url", "warc_ts", "html", "text", "lang"}


class SchemaError(ValueError):
    pass


def validate_columns(path: str, required: set[str]) -> None:
    """Fail fast (before any task runs) if required columns are missing.

    Every footer is checked (metadata-only reads, no data I/O), so a
    directory with heterogeneous schemas names the offending file here
    instead of silently losing columns mid-pipeline.
    """
    import pyarrow.parquet as pq
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    if not files:
        raise SchemaError(f"no parquet files under {path}")
    for f in files:
        names = set(pq.ParquetFile(f).schema_arrow.names)
        missing = required - names
        if missing:
            raise SchemaError(
                f"{f} missing required columns {sorted(missing)}; has {sorted(names)}"
            )


def read_pages(
    path: str,
    columns: list[str] | None = None,
    need_html: bool = False,
    **kwargs,
) -> rd.Dataset:
    """Read a pages table with column pruning.

    By default html (the widest column) is pruned at the read — only
    the extraction stage should ever ask for it (need_html=True).
    """
    if columns is None:
        if need_html:
            # extraction derives text from html — text need not exist
            columns = ["url", "warc_ts", "html", "lang"]
        else:
            columns = ["url", "warc_ts", "text", "lang"]
        # warc_ts/lang are optional metadata; require only the essentials
        import pyarrow.parquet as _pq

        validate_columns(path, {"url", "html" if need_html else "text"})
        import glob as _glob
        import os as _os

        probe = path
        if _os.path.isdir(path):
            probe = sorted(_glob.glob(_os.path.join(path, "*.parquet")))[0]
        present = set(_pq.ParquetFile(probe).schema_arrow.names)
        columns = [c for c in columns if c in present]
    else:
        validate_columns(path, set(columns))
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Read one of the driver testdata tables by name."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kw)


# ---------------------------------------------------------------------------
# additional source formats (JSONL / CSV / WARC)
# ---------------------------------------------------------------------------


def read_pages_jsonl(path: str, **kwargs) -> rd.Dataset:
    """Pages from JSON-lines files (one page object per line).

    Ray parallelises per file — shard large corpora.  The html column,
    if present, must be base64 (JSON has no bytes); it is decoded to
    binary here so downstream stages see the parquet-identical schema.
    """
    import base64

    import pyarrow as pa

    ds = rd.read_json(path, **kwargs)

    def fix(t: pa.Table) -> pa.Table:
        if "html" in t.column_names and pa.types.is_string(t["html"].type):
            raw = [
                base64.b64decode(x) if x is not None else None
                for x in t["html"].to_pylist()
            ]
            t = t.drop_columns(["html"]).append_column(
                "html", pa.array(raw, pa.binary())
            )
        if "warc_ts" in t.column_names and pa.types.is_string(t["warc_ts"].type):
            import pandas as pd

            ts = pd.to_datetime(t["warc_ts"].to_pylist(), utc=True).tz_localize(None)
            t = t.drop_columns(["warc_ts"]).append_column(
                "warc_ts", pa.array(ts, pa.timestamp("us"))
            )
        return t

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def write_pages_jsonl(ds: rd.Dataset, out_dir: str, **kwargs) -> None:
    """Inverse of :func:`read_pages_jsonl` — the training-data export
    format (one JSON object per line, one shard file per block).

    JSON has no bytes or timestamp types, so binary columns are
    base64-encoded and timestamp columns ISO-formatted at microsecond
    precision; ``read_pages_jsonl`` reverses both, making the round
    trip table-identical.  Sharding is Ray's native JSON sink — per-
    block writer tasks, no driver materialisation; ``repartition``
    first to control shard count.
    """
    import base64

    import pyarrow as pa
    import pyarrow.compute as pc

    def enc(t: pa.Table) -> pa.Table:
        for i, f in enumerate(t.schema):
            if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
                col = pa.array(
                    [base64.b64encode(x).decode("ascii")
                     if x is not None else None
                     for x in t[f.name].to_pylist()],
                    pa.string(),
                )
                t = t.set_column(i, f.name, col)
            elif pa.types.is_timestamp(f.type):
                # Arrow's %S already carries the fractional digits for
                # sub-second units (%f is unsupported and stays literal)
                t = t.set_column(
                    i, f.name,
                    pc.strftime(t[f.name], format="%Y-%m-%dT%H:%M:%S"),
                )
        return t

    ds.map_batches(enc, batch_format="pyarrow",
                   zero_copy_batch=True).write_json(out_dir, **kwargs)


def read_pages_csv(path: str, **kwargs) -> rd.Dataset:
    """Pages from CSV (text corpora without html payloads)."""
    return rd.read_csv(path, **kwargs)


# --- minimal WARC (Common Crawl's native format) ---------------------------

_WARC_SEP = b"\r\n\r\n"


def _parse_warc_bytes(blob: bytes) -> list[dict]:
    """Parse WARC 'response' records from one file's bytes.

    Implements the subset Common-Crawl WET/WARC pipelines rely on:
    records delimited by header blocks with a Content-Length, payload =
    HTTP response whose body is the page html.  Pure function (unit
    tested); malformed records are skipped, never fatal.
    """
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_WARC_SEP, pos)
        if head_end < 0:
            break
        header = blob[pos:head_end].decode("utf-8", "replace")
        fields: dict[str, str] = {}
        for line in header.split("\r\n")[1:]:      # first line: WARC/1.0
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            clen = 0
        payload = blob[head_end + 4: head_end + 4 + clen]
        pos = head_end + 4 + clen
        # consume the record separator (\r\n\r\n) after the payload
        while pos < n and blob[pos: pos + 2] == b"\r\n":
            pos += 2
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        if not url:                                 # malformed: no identity
            continue
        ts = fields.get("warc-date", "")
        # payload is an HTTP response: body starts after its header block
        body_at = payload.find(_WARC_SEP)
        html = payload[body_at + 4:] if body_at >= 0 else payload
        out.append({"url": url, "warc_date": ts, "html": html})
    return out


def read_pages_warc(path: str, **kwargs) -> rd.Dataset:
    """Pages from WARC files: one read task per file, records exploded
    with a vectorised flat-map; emits (url, warc_ts, html) matching the
    parquet pages schema (text is derived by the extract stage)."""
    import pandas as pd
    import pyarrow as pa

    files = rd.read_binary_files(path, include_paths=False, **kwargs)

    def explode(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list = []
        htmls: list[bytes] = []
        for blob in t["bytes"].to_pylist():
            for rec in _parse_warc_bytes(blob):
                urls.append(rec["url"])
                tss.append(rec["warc_date"] or None)
                htmls.append(rec["html"])
        ts = pd.to_datetime(tss, utc=True, errors="coerce").tz_localize(None)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        })

    return files.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def write_warc(records: list[dict], path: str) -> None:
    """Write (url, warc_ts, html) records as one minimal WARC file
    (test/reference writer for the parser above)."""
    with open(path, "wb") as f:
        for r in records:
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
            ts = r.get("warc_ts")
            ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else ""
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {ts_s}\r\n"
                f"Content-Length: {len(http)}\r\n"
            ).encode()
            f.write(head + b"\r\n" + http + b"\r\n\r\n")
