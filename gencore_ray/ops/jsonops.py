"""Vectorised JSON-field extraction over string columns.

Web-pipeline metadata rides along as small JSON blobs (a WARC record's
headers, an event's properties).  Parsing every blob with a Python
``json.loads`` per row is the classic hot-path row loop; for the
overwhelmingly common case — pull ONE scalar field out of a flat
object — a compiled regex applied by pandas' C engine extracts the
field two orders of magnitude faster and with SQL-replayable
semantics (the oracle uses the same regex via ``regexp_extract``).

Semantics: the FIRST occurrence of ``"key": <value>`` wins; rows
where the key is missing (or the value is not of the requested type)
yield NULL.  Escaped quotes inside keys are not handled — this is a
fast path for machine-written flat JSON, not a conforming parser (use
a real parser stage for nested/adversarial input).
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data as rd


def _int_pattern(key: str) -> re.Pattern:
    return re.compile(r'"' + re.escape(key) + r'"\s*:\s*(-?\d+)')


def json_int_field(
    ds: rd.Dataset, col: str, key: str, out_col: str
) -> rd.Dataset:
    """Adds ``out_col`` (nullable int64) = the integer value of ``key``
    inside the JSON-string column ``col``.  One ``map_batches`` pass;
    the regex runs inside pandas' C extract kernel."""
    pat = _int_pattern(key)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].str.extract(pat, expand=False)
        df[out_col] = pd.to_numeric(s, errors="coerce").astype("Int64")
        return df

    return ds.map_batches(extract, batch_format="pandas")
