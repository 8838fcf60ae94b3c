"""Depth-capped distributed suffix array (Manber-Myers prefix
doubling) and the exact-substring dup-span pass built on it — the
literal "suffix-array substring pass" of the north star, as exchanges.

The gram-hash path (``ops/substrings.py``) detects length->=L dup
spans with ONE 24 B/token exchange, but (a) it trusts a 64-bit
polynomial window hash and (b) each L needs its own pass.  This
module instead constructs the classic suffix grouping by prefix
doubling: level-k groups hold the corpus positions whose next k
tokens are IDENTICAL (exact equality — group ids are pairs of
previous-level group ids, so no window hashing anywhere above single
tokens), and one run yields every power-of-two level up to ``depth``
simultaneously.  Prefix doubling is the Manber-Myers construction
(SIAM J. Comput. 1993); the per-level "rank by (rank[i], rank[i+k])"
becomes a uniform self-join plus one grouped exchange.

Cost, stated honestly: log2(depth) levels x (one join + one group
exchange) over ~26 B/position rows — about 6x the gram path's
exchange mass at depth 8.  Buy this op when exactness matters (no
hash-collision window merges) or when several span lengths are
needed from one pass; buy the gram path for a single known L.
The group exchange colocates each (rank, next-rank) group, so a
pathological corpus-wide repeated prefix lands one partition-sized
group on one worker — the same hot-key class the LSH stage caps and
counts (gencore_ray/stages/lsh.py:11-20); partition counts scale
with data bytes via ``scaled_num_parts``.

Position arithmetic: position p of doc d lives at g = d*stride + p
with stride = max_tokens + depth, so every doc owns a contiguous
g-range followed by >= depth unused slots — a suffix never reads
past its own doc (the gap returns no row, which becomes a unique
sentinel "rank", correctly isolating suffixes shorter than the
level).  Requires an INTEGER id column with id*stride < 2^63
(string-keyed corpora should mint dense int ids first).

Level-1 groups come from the 63-bit token hash (vocabulary-birthday
collision odds ~1e-4 at 1e8 distinct tokens); every level above is
exact by induction.

gencore analogue: the reference groups reads by exact (coordinate,
UMI) keys, refining clusters by successively stronger evidence
(/root/reference/src/group.cpp:33-76); prefix doubling is the same
refine-by-pairing discipline over text positions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gencore_ray.functions.hashing import splitmix64

_EMPTY_ROWS = {"g": np.int64, "r": np.int64, "duplev": np.int16}


def _empty(cols: dict) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def _position_rows(ht: rd.Dataset, id_col: str, stride: int) -> rd.Dataset:
    """token_hash_table -> (g, r, duplev) suffix rows: g = id*stride + p,
    r = level-1 group id (63-bit token hash), duplev = 0."""

    def _rows(df: pd.DataFrame) -> pd.DataFrame:
        ths = [np.asarray(x, dtype=np.uint64) for x in df["th"].tolist()]
        lens = np.fromiter(map(len, ths), dtype=np.int64, count=len(ths))
        total = int(lens.sum())
        if not total:
            return _empty(_EMPTY_ROWS)
        ids = df[id_col].to_numpy(dtype=np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("suffix ops need non-negative integer ids")
        base = np.repeat(ids * stride, lens)
        offs = np.cumsum(lens) - lens
        p = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
        flat = np.concatenate([h for h in ths if len(h)])
        return pd.DataFrame({
            "g": base + p,
            "r": (flat >> np.uint64(1)).astype(np.int64),
            "duplev": np.zeros(total, dtype=np.int16),
        })

    return ht.select_columns([id_col, "th"]).map_batches(
        _rows, batch_format="pandas")


def _double(rows: rd.Dataset, k: int, stride: int,
            num_parts: int) -> rd.Dataset:
    """One prefix-doubling level: groups-by-first-k-tokens ->
    groups-by-first-2k-tokens.  A uniform self-join fetches the rank
    k positions ahead; one grouped exchange on the (rank, next-rank)
    pair assigns the new group id (min g of the group — injective
    across groups, stable across partitionings) and ORs the level's
    cross-doc dup flag into ``duplev``."""
    from gencore_ray.stages.shuffle import grouped_map, hash_join

    level = 2 * k

    def _shift(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy(zero_copy_only=False)
        return pa.table({"gm": pa.array(g - k), "rn": t["r"]})

    shifted = rows.map_batches(_shift, batch_format="pyarrow")
    joined = hash_join(rows, shifted, "g", "gm",
                       num_parts=num_parts, how="left_outer")

    def _fill(t: pa.Table) -> pa.Table:
        """Sentinel-fill missing next-ranks (suffix ends before +k:
        the unique negative -g-1 keeps short suffixes in singleton
        groups) and attach the pair-hash partition key."""
        g = t["g"].to_numpy(zero_copy_only=False)
        rn_arr = t["rn"].combine_chunks() if isinstance(
            t["rn"], pa.ChunkedArray) else t["rn"]
        null = pa.compute.is_null(rn_arr).to_numpy(zero_copy_only=False)
        rn = rn_arr.fill_null(0).to_numpy(zero_copy_only=False)
        rn = np.where(null, -g - 1, rn)
        r = t["r"].to_numpy(zero_copy_only=False)
        kh = splitmix64(r.astype(np.uint64)
                        ^ splitmix64(rn.astype(np.uint64)))
        return pa.table({
            "g": t["g"], "r": t["r"], "duplev": t["duplev"],
            "rn": pa.array(rn), "kh": pa.array(kh.view(np.int64)),
        })

    keyed = joined.map_batches(_fill, batch_format="pyarrow")

    def _group(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _empty(_EMPTY_ROWS)
        g = df["g"].to_numpy(dtype=np.int64)
        r = df["r"].to_numpy(dtype=np.int64)
        rn = df["rn"].to_numpy(dtype=np.int64)
        duplev = df["duplev"].to_numpy(dtype=np.int16)
        order = np.lexsort((g, rn, r))
        gs, rs, rns = g[order], r[order], rn[order]
        new_seg = np.r_[True, (rs[1:] != rs[:-1]) | (rns[1:] != rns[:-1])]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        # g ascends within each segment, so the segment's first row
        # holds its min g, and doc = g // stride is nondecreasing
        new_r = gs[starts][seg_id]
        doc = gs // stride
        new_doc = np.r_[True, doc[1:] != doc[:-1]] | new_seg
        ndocs = np.add.reduceat(new_doc.astype(np.int64), starts)
        dup = (ndocs >= 2)[seg_id]
        return pd.DataFrame({
            "g": gs,
            "r": new_r,
            "duplev": np.where(dup, np.int16(level), duplev[order]),
        })

    return grouped_map(keyed, "kh", _group, num_parts=num_parts)


def suffix_group_rows(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    depth: int = 8,
    num_parts: int = 16,
) -> tuple[rd.Dataset, int, rd.Dataset]:
    """Run prefix doubling to ``depth`` (a power of two >= 2) and
    return (rows, stride, token_hash_table): rows = (g, r, duplev)
    where r identifies
    the exact first-``depth``-token group of the suffix at g and
    duplev is the largest power-of-two level at which the suffix's
    prefix occurs in >= 2 distinct docs (0 = none; level 1 untracked).
    """
    from gencore_ray.ops.substrings import token_hash_table
    from gencore_ray.stages.shuffle import scaled_num_parts

    depth = int(depth)
    if depth < 2 or depth & (depth - 1):
        raise ValueError(f"depth must be a power of two >= 2, got {depth}")

    ht = token_hash_table(ds, id_col, text_col)
    max_tok = int(ht.max("n_tokens") or 0)
    total = int(ht.sum("n_tokens") or 0)
    stride = max_tok + depth
    parts = scaled_num_parts(num_parts, total * 40)

    rows = _position_rows(ht, id_col, stride)
    k = 1
    while k < depth:
        rows = _double(rows, k, stride, parts)
        k *= 2
    return rows, stride, ht


def suffix_dup_positions(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    depth: int = 8,
    num_parts: int = 16,
) -> rd.Dataset:
    """(id, p, dup_len): every corpus position whose suffix shares an
    exact prefix of >= 2 tokens with a position in another doc;
    dup_len = the largest power-of-two shared-prefix length <= depth.
    Row-level introspection surface (tests, span auditing)."""
    rows, stride, _ht = suffix_group_rows(ds, id_col, text_col,
                                          depth, num_parts)

    def _out(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy(zero_copy_only=False)
        dl = t["duplev"].to_numpy(zero_copy_only=False)
        keep = dl > 0
        g, dl = g[keep], dl[keep]
        return pa.table({
            id_col: pa.array(g // stride),
            "p": pa.array(g % stride),
            "dup_len": pa.array(dl.astype(np.int64)),
        })

    return rows.map_batches(_out, batch_format="pyarrow")


def suffix_array_spans(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """``duplicate_span_stats`` semantics computed by suffix grouping
    instead of window hashing: per doc, the fraction of its
    ``span_tokens``-token sliding windows whose exact token sequence
    occurs in at least one OTHER doc.  ``span_tokens`` must be a power
    of two (arbitrary L belongs to the gram path, which this op
    cross-checks algorithmically — both are oracled against the same
    SQL).  Output (id, n_windows, dup_windows, dup_span_frac).

    A position with duplev >= L necessarily has >= L real tokens left
    in its doc (shorter suffixes fall into sentinel singleton groups
    before reaching level L), so dup windows are counted directly —
    no validity join."""
    from gencore_ray.ops.relational import grouped_aggregate
    from gencore_ray.stages.shuffle import hash_join

    L = int(span_tokens)
    rows, stride, ht = suffix_group_rows(ds, id_col, text_col,
                                         L, num_parts)

    def _dup_docs(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy(zero_copy_only=False)
        dl = t["duplev"].to_numpy(zero_copy_only=False)
        keep = dl >= L
        return pa.table({id_col: pa.array(g[keep] // stride)})

    dup_pos = rows.map_batches(_dup_docs, batch_format="pyarrow")
    per_doc = grouped_aggregate(dup_pos, [id_col],
                                [("dup_windows", None, "count")],
                                num_parts=num_parts)

    def _base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_windows": np.maximum(
                df["n_tokens"].to_numpy(dtype=np.int64) - L + 1, 0),
        })

    base = ht.select_columns([id_col, "n_tokens"]).map_batches(
        _base, batch_format="pandas")
    joined = hash_join(base, per_doc, id_col, id_col,
                       num_parts=num_parts, how="left_outer")
    p = 10.0 ** round_to

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        nw = df["n_windows"].to_numpy(dtype=np.int64)
        dw = df["dup_windows"].fillna(0).to_numpy(dtype=np.int64)
        frac = np.floor(dw / np.maximum(nw, 1) * p + 0.5) / p
        return pd.DataFrame({id_col: df[id_col], "n_windows": nw,
                             "dup_windows": dw, "dup_span_frac": frac})

    return joined.map_batches(_finish, batch_format="pandas")
