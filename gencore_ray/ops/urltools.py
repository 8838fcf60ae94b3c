"""URL canonicalisation + url-variant dedup + per-domain stats.

Web crawls reach the same logical page through many url spellings
(scheme/host case, ``www.``, default ports, utm_* tracking params,
fragments, trailing slashes). Collapsing those BEFORE content dedup
removes the cheapest duplicate class with zero text processing —
gencore's analogue is qname normalisation across a merged pair
(/root/reference/src/bamutil.cpp:338-366): one canonical key per
logical record before grouping.

The rule chain is deliberately RE2-safe (no lookahead/backtracking)
so the DuckDB oracle replays it with ``regexp_replace`` verbatim:

1. strip fragment             ``#.*$``
2. lowercase scheme://host[:port] (prefix up to first ``/?#``)
3. drop ``www.``              ``://www.`` -> ``://``
4. drop default ports         ``http://h:80/`` -> ``http://h/``,
                              ``https://h:443/`` -> ``https://h/``
5. drop utm params            ``utm_x=v&`` (all) then ``[?&]utm_x=v$``
6. collapse ``/?`` -> ``?`` and strip one trailing ``/``

Known limits (documented, not handled): multi-``?`` urls, ``utm_`` as
a literal path substring followed by ``=..&``, percent-encoding
equivalence.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PREFIX_RE = re.compile(r"^[^:/?#]+://[^/?#]*")
_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"#.*$"), ""),
    (re.compile(r"://www\."), "://"),
    (re.compile(r"^(http://[^/?#:]*):80(/)"), r"\1\2"),
    (re.compile(r"^(https://[^/?#:]*):443(/)"), r"\1\2"),
    (re.compile(r"utm_[a-z_]+=[^&#]*&"), ""),
    (re.compile(r"[?&]utm_[a-z_]+=[^&#]*$"), ""),
    (re.compile(r"/\?"), "?"),
    (re.compile(r"/$"), ""),
]


def canonicalize_url(url: str) -> str:
    """Scalar kernel — the rule chain above, in order."""
    m = _PREFIX_RE.match(url)
    if m:
        url = m.group(0).lower() + url[m.end():]
    for pat, repl in _RULES:
        url = pat.sub(repl, url)
    return url


def canonicalize_urls(urls) -> pa.Array:
    """Vectorised kernel: the same rule chain run as Arrow RE2 passes
    (one C++ scan per rule over the whole column instead of eight
    Python-level ``pat.sub`` calls per row).  RE2-safety of the rules
    (module docstring) is what makes this a drop-in: RE2 and ``re``
    agree on every pattern here.  Property-tested char-identical to
    ``canonicalize_url`` (tests/test_webtext_ops.py)."""
    import pyarrow.compute as pc

    a = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(urls), pa.string())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    # rule 2 (lowercase scheme://host[:port]): first-match extract ->
    # utf8_lower -> rejoin with the tail (null extract = no prefix,
    # keep the row untouched)
    pre = pc.extract_regex(a, pattern=r"^(?P<p>[^:/?#]+://[^/?#]*)")
    pre_s = pc.struct_field(pre, "p")
    tail = pc.replace_substring_regex(
        a, pattern=r"^[^:/?#]+://[^/?#]*", replacement="", max_replacements=1
    )
    lowered = pc.binary_join_element_wise(pc.utf8_lower(pre_s), tail, "")
    a = pc.if_else(pc.is_valid(pre_s), lowered, a)
    for pat, repl in _RULES_RE2:
        a = pc.replace_substring_regex(a, pattern=pat, replacement=repl)
    return a


# the same chain as _RULES, as (pattern, rewrite) strings for RE2
# (rule 2 — prefix lowercasing — is handled structurally above)
_RULES_RE2: list[tuple[str, str]] = [
    (r"#.*$", ""),
    (r"://www\.", "://"),
    (r"^(http://[^/?#:]*):80(/)", r"\1\2"),
    (r"^(https://[^/?#:]*):443(/)", r"\1\2"),
    (r"utm_[a-z_]+=[^&#]*&", ""),
    (r"[?&]utm_[a-z_]+=[^&#]*$", ""),
    (r"/\?", "?"),
    (r"/$", ""),
]


def url_variant_dedup(
    ds: rd.Dataset, url_col: str = "url", num_parts: int = 16
) -> rd.Dataset:
    """-> (canonical_url, n_variants, first_url) per logical page.

    One exchange keyed on the canonical url; ``first_url`` (the
    lexicographic min of the raw spellings) is the deterministic
    representative."""
    from gencore_ray.stages.shuffle import grouped_map

    def _canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "canonical_url": canonicalize_urls(t[url_col]),
            "raw_url": t[url_col].cast(pa.string()),
        })

    canon = ds.select_columns([url_col]).map_batches(
        _canon, batch_format="pyarrow", zero_copy_batch=True
    )

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "canonical_url": pd.Series(dtype=str),
                "n_variants": pd.Series(dtype=np.int64),
                "first_url": pd.Series(dtype=str),
            })
        g = df.groupby("canonical_url", sort=False)["raw_url"]
        out = g.agg(n_variants="count", first_url="min").reset_index()
        out["n_variants"] = out["n_variants"].astype(np.int64)
        return out

    return grouped_map(canon, "canonical_url", _agg, num_parts=num_parts)


def domain_stats(
    pages: rd.Dataset,
    url_col: str = "url",
    text_col: str = "text",
    num_parts: int = 8,
) -> rd.Dataset:
    """-> (domain, n_pages, total_chars, avg_chars) — per-host crawl
    profile. Partial per-batch aggregation; one tiny final exchange."""
    from gencore_ray.ops.relational import grouped_aggregate

    def _extract(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dom = pc.fill_null(                      # unmatched rows -> ""
            pc.struct_field(
                pc.extract_regex(
                    pc.utf8_lower(t[url_col].cast(pa.string())),
                    pattern=r"^[a-z][a-z0-9+.-]*://(?P<d>[^/:?#]+)",
                ),
                "d",
            ),
            "",
        )
        tl = pc.fill_null(
            pc.utf8_length(t[text_col].cast(pa.string())), 0).cast(pa.int64())
        return pa.table({"domain": dom, "n_chars": tl})

    per_page = pages.select_columns([url_col, text_col]).map_batches(
        _extract, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_aggregate(
        per_page, ["domain"],
        [("n_pages", None, "count"), ("total_chars", "n_chars", "sum"),
         ("avg_chars", "n_chars", "mean")],
        num_parts=num_parts,
    )
