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
