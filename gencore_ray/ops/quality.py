"""Declarative data-quality constraint checking (deequ-style).

The reference refuses bad input loudly at the boundary (header
validation /root/reference/src/gencore.cpp:179-190, sortedness assert
232-241); a pipeline engine needs the same discipline as a first-class
operator: assert table invariants and report violation COUNTS instead
of exploding on row one million.

Every constraint is a single aggregate pass with map-side partial
counts — violations never leave the workers as rows, only as counters:

  unique(cols)           one value-hash exchange (rows - distinct rows)
  not_null(col)          map-side null count
  accepted_values(col)   map-side not-in-set count
  range(col, lo, hi)     map-side out-of-bounds count (nulls don't count)
  foreign_key(col, dim)  broadcast dim-key set, map-side miss count

Output: one row per constraint (check_name, violations, n_rows) — tiny,
driver-safe, SQL-replayable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def constraint_report(
    ds: rd.Dataset,
    constraints: list[tuple],
    num_parts: int = 8,
) -> rd.Dataset:
    """Check ``constraints`` against ``ds`` in ONE pass over the data
    (plus one slim exchange per ``unique`` constraint).

    constraints: list of tuples —
      ("unique", [cols...])
      ("not_null", col)
      ("accepted_values", col, [values...])
      ("range", col, lo, hi)            # violations: value < lo or >= hi
      ("foreign_key", col, key_array)   # key_array: np.ndarray of valid keys
    """
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import grouped_map

    names: list[str] = []
    kinds: list[tuple] = []
    fk_refs = {}
    for c in constraints:
        kind = c[0]
        if kind == "unique":
            names.append(f"unique({','.join(c[1])})")
        elif kind == "not_null":
            names.append(f"not_null({c[1]})")
        elif kind == "accepted_values":
            names.append(f"accepted_values({c[1]})")
        elif kind == "range":
            names.append(f"range({c[1]},[{c[2]},{c[3]}))")
        elif kind == "foreign_key":
            names.append(f"foreign_key({c[1]})")
            fk_refs[len(kinds)] = ray.put(np.asarray(c[2]))
        else:
            raise ValueError(f"unknown constraint kind {kind}")
        kinds.append(c)

    map_idx = [i for i, c in enumerate(kinds) if c[0] != "unique"]
    uniq_idx = [i for i, c in enumerate(kinds) if c[0] == "unique"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        viol = []
        for i in map_idx:
            c = kinds[i]
            if c[0] == "not_null":
                v = int(df[c[1]].isna().sum())
            elif c[0] == "accepted_values":
                col = df[c[1]]
                v = int((~col.isin(c[2]) & col.notna()).sum())
            elif c[0] == "range":
                col = df[c[1]]
                v = int(((col < c[2]) | (col >= c[3])).sum())
            else:  # foreign_key
                valid = ray.get(fk_refs[i])
                col = df[c[1]]
                v = int((~col.isin(valid) & col.notna()).sum())
            viol.append(v)
        return pd.DataFrame({
            "ci": np.asarray(map_idx, dtype=np.int64),
            "violations": np.asarray(viol, dtype=np.int64),
            "n_rows": np.int64(len(df)),
        })

    parts = [grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"), ["ci"],
        [("violations", "violations", "sum"), ("n_rows", "n_rows", "sum")],
        num_parts=1,
    )]

    for i in uniq_idx:
        cols = kinds[i][1]

        def dup_count(df: pd.DataFrame, cols=cols, ci=i) -> pd.DataFrame:
            # rows sharing the key colocate: global duplicate count with
            # no driver state
            d = int(df.duplicated(subset=cols).sum())
            return pd.DataFrame({"ci": [np.int64(ci)],
                                 "violations": [np.int64(d)],
                                 "n_rows": [np.int64(len(df))]})

        per_part = grouped_map(ds.select_columns(cols), cols[0], dup_count,
                               num_parts=num_parts)
        parts.append(grouped_aggregate(
            per_part, ["ci"],
            [("violations", "violations", "sum"), ("n_rows", "n_rows", "sum")],
            num_parts=1,
        ))

    merged = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "check_name": [names[int(i)] for i in df["ci"]],
            "violations": df["violations"].to_numpy(dtype=np.int64),
            "n_rows": df["n_rows"].to_numpy(dtype=np.int64),
        })

    return merged.map_batches(label, batch_format="pandas")
