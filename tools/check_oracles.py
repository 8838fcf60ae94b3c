#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs each ``queries()`` entry and its ``oracle_sql()`` twin over the
same sf dir, then compares row count, column-name set, and values
(columns sorted by name, rows sorted by all columns — the driver's
order-insensitive value-hash proxy).

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd


def _to_df(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, eng: pd.DataFrame, ora: pd.DataFrame) -> str:
    if len(eng) != len(ora):
        return f"ROWS {len(eng)} vs {len(ora)}"
    if sorted(eng.columns) != sorted(ora.columns):
        return f"SCHEMA {sorted(eng.columns)} vs {sorted(ora.columns)}"
    a, b = _norm(eng), _norm(ora)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = (pd.Series(av).fillna("<N>") == pd.Series(bv).fillna("<N>")).all()
        if not ok:
            bad = np.nonzero(~(av == bv))[0][:5] if len(av) else []
            return f"VALUES col={c} first_diffs={[(av[i], bv[i]) for i in bad[:3]]}"
    return "OK"


def _chunked(sf_dir: str, chunk: int) -> None:
    """Run the sweep in batches of ``chunk`` queries, each in a FRESH
    subprocess: a single driver session executing 100+ queries creates
    thousands of datasets and has been observed to segfault inside
    _raylet.so near the end (Ray-internal; every query passes in a
    fresh process).  Chunking bounds each session's dataset count."""
    import subprocess

    import importlib.util

    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    names = [n for n in m.queries() if n in m.oracle_sql()]
    fails = 0
    for i in range(0, len(names), chunk):
        proc = subprocess.run(
            [sys.executable, __file__, sf_dir, *names[i:i + chunk]],
            capture_output=True, text=True)
        sys.stdout.write(proc.stdout)
        fails += proc.returncode != 0
    sys.exit(1 if fails else 0)


def main() -> None:
    if "--chunk" in sys.argv:
        i = sys.argv.index("--chunk")
        chunk = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
        _chunked(sys.argv[1] if len(sys.argv) > 1
                 else "/root/testdata/sf0.01", chunk)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    qs, oras = entry.queries(), entry.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in oras]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    fails = 0
    for n in names:
        if n not in oras:
            print(f"{n:28s} (no oracle)")
            continue
        try:
            eng = _to_df(qs[n](sf_dir))
            ora = con.execute(oras[n]).df()
            verdict = compare(n, eng, ora)
        except Exception as ex:  # pragma: no cover
            verdict = f"ERROR {type(ex).__name__}: {ex}"
        print(f"{n:28s} {verdict}")
        fails += verdict != "OK"
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
