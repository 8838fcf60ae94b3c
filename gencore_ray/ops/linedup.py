"""Cross-document line deduplication (CCNet-style boilerplate removal).

CCNet (Wenzek et al. 2020) removes duplicated LINES across the corpus
before LM training — nav menus, cookie banners, footers repeat on
thousands of pages and would otherwise dominate the token stream.
This op removes every occurrence of any line that appears in at least
``min_docs`` DISTINCT documents and reassembles the cleaned text.

Scale shape — line TEXT never rides an exchange (same dataflow as
ops/substrings.span_dedup_rewrite):

  1. explode slim (line_hash u64, id, line_no) rows — 20 B/line, the
     line string stays behind;
  2. line-hash-keyed exchange: each partition holds EVERY occurrence
     of its hashes, so a per-partition distinct-doc count is the
     global count; emit only the REMOVED (id, line_no) coordinates
     (in a typical corpus a small fraction of all lines);
  3. id-keyed exchange over only those removal rows: collect each
     doc's removed line numbers into one list row;
  4. one left-outer id join back to the original (id, text) and a
     pure map that splits the original text, drops the removed line
     numbers, and rejoins — byte-exact reassembly from the ORIGINAL
     text, so survivors can't even theoretically be corrupted by a
     round-trip.

Exchange mass: 20 B x corpus lines + ~16 B x removed lines, versus
the naive shape's 2 x corpus text bytes (the previous revision
shipped the line strings through BOTH exchanges).

gencore analogue: the duplicate-fragment drop before consensus
(/root/reference/src/gencore.cpp:319-389 flushes clusters and keeps
one consensus record per group) — here the "group" is a line's
occurrence set and the policy is drop-all-frequent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def line_hash_rows(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
) -> rd.Dataset:
    """Slim (id, line_no, lh[, gh]) explode — one 20 B row per line
    (28 B grouped), no text.  Exposed separately so tests can assert
    the exchanged schema carries no string payload.

    ``group_col`` adds a u64 group hash: the frequency scope becomes
    per-group (CCNet dedups per shard; boilerplate is domain-local —
    a nav menu frequent on one host must not survive just because the
    corpus-wide count stays under the threshold, nor vice versa)."""
    from itertools import chain

    from gencore_ray.functions.hashing import hash_str_array_u64

    cols = [id_col, text_col] + ([group_col] if group_col else [])

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").tolist()
        lists = [t.split("\n") for t in texts]
        lens = np.fromiter(map(len, lists), dtype=np.int64, count=len(lists))
        flat = list(chain.from_iterable(lists))
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        out = {
            id_col: np.repeat(df[id_col].to_numpy(), lens),
            "line_no": np.arange(len(flat), dtype=np.int64) - offs,
            "lh": hash_str_array_u64(flat),
        }
        if group_col:
            gh = hash_str_array_u64(
                df[group_col].fillna("").astype(str).tolist(), seed=7
            )
            out["gh"] = np.repeat(gh, lens)
        return pd.DataFrame(out)

    return ds.select_columns(cols).map_batches(
        _explode, batch_format="pandas")


def line_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    num_parts: int = 16,
    group_col: str | None = None,
) -> rd.Dataset:
    """(id, n_lines, n_removed, clean_text): drop every line occurring
    in >= min_docs distinct docs, rejoin survivors with newline.

    With ``group_col`` the count is per (line, group) — a line must be
    frequent WITHIN its group (domain / shard / language) to be
    removed.  The exchange stays keyed on the line hash alone, so a
    partition still holds every occurrence of its lines and the
    per-(line, group) count stays partition-local."""
    from gencore_ray.stages.shuffle import grouped_map, hash_join

    def _removed(df: pd.DataFrame) -> pd.DataFrame:
        # global distinct-doc count per hash (partition holds ALL
        # occurrences of its hashes), joined back by factorized code;
        # only the frequent lines' coordinates leave this stage
        key = df["lh"].to_numpy().astype(np.uint64, copy=False)
        if group_col:
            # fold the group hash in (odd multiplier keeps u64 bijective)
            with np.errstate(over="ignore"):
                key = key ^ (
                    df["gh"].to_numpy().astype(np.uint64, copy=False)
                    * np.uint64(0x9E3779B97F4A7C15)
                )
        codes, uniq = pd.factorize(key, sort=False)
        pair = pd.DataFrame({"c": codes, "d": df[id_col]}).drop_duplicates()
        nd = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nd, pair["c"].to_numpy(), 1)
        rm = nd[codes] >= min_docs
        return df.loc[rm, [id_col, "line_no"]]

    def _collect(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(id_col, sort=False)["line_no"]
                .agg(lambda s: s.to_numpy().tolist())
                .rename("rm_nos").reset_index())

    removed = grouped_map(
        line_hash_rows(ds, id_col, text_col, group_col=group_col), "lh",
        _removed, num_parts=num_parts)
    per_doc = grouped_map(removed, id_col, _collect, num_parts=num_parts)
    joined = hash_join(ds.select_columns([id_col, text_col]), per_doc,
                       id_col, id_col, num_parts=num_parts,
                       how="left_outer")

    def _rebuild(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").tolist()
        out_text, n_lines, n_removed = [], [], []
        for t, nos in zip(texts, df["rm_nos"].tolist()):
            lines = t.split("\n")
            if nos is None or (isinstance(nos, float) and pd.isna(nos)):
                out_text.append(t)
                n_lines.append(len(lines))
                n_removed.append(0)
                continue
            drop = set(int(x) for x in nos)
            out_text.append("\n".join(
                ln for i, ln in enumerate(lines) if i not in drop))
            n_lines.append(len(lines))
            n_removed.append(len(drop))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_lines": np.asarray(n_lines, dtype=np.int64),
            "n_removed": np.asarray(n_removed, dtype=np.int64),
            "clean_text": out_text,
        })

    return joined.map_batches(_rebuild, batch_format="pandas")


def collapse_repeated_lines(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """WITHIN-document repeated-line collapse: keep the FIRST
    occurrence of every line inside each doc, drop later repeats,
    preserve order.  The in-page complement of the cross-doc
    ``line_dedup`` above — crawler artifacts repeat nav menus /
    banners inside a single page, and Gopher's dup_lines SIGNAL
    (ops/textstats.py) flags them; this op is the corresponding
    TRANSFORM.

    A pure per-row ``map_batches`` — no exchange, no state: the
    cheapest possible scale shape (the 100 TB cost is exactly one
    streaming pass).  Output: (id, n_lines, n_collapsed, clean_text).

    gencore analogue: the within-cluster duplicate drop before
    consensus emission (/root/reference/src/gencore.cpp:319-389) —
    here the cluster is a single document's line multiset.
    """

    def _collapse(df: pd.DataFrame) -> pd.DataFrame:
        n_lines = np.empty(len(df), dtype=np.int64)
        n_collapsed = np.empty(len(df), dtype=np.int64)
        out_text: list[str] = []
        for i, t in enumerate(df[text_col].fillna("").tolist()):
            lines = t.split("\n")
            # dict.fromkeys: first-occurrence order-preserving distinct
            kept = list(dict.fromkeys(lines))
            n_lines[i] = len(lines)
            n_collapsed[i] = len(lines) - len(kept)
            out_text.append("\n".join(kept))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_lines": n_lines,
            "n_collapsed": n_collapsed,
            "clean_text": out_text,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _collapse, batch_format="pandas")
