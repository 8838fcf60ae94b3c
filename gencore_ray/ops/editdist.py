"""Exact edit-distance (Levenshtein) audit over candidate pairs.

The reference audits its consensus output by re-aligning each grouped
read against the elected template and counting mismatches
(/root/reference/src/pair.cpp:70-126 scoring, duplicate.cpp grouping);
our analogue scores each candidate duplicate pair with the exact edit
distance between the two texts.  Sketch metrics (MinHash Jaccard,
SimHash Hamming) are estimates — the audit pass is the ground truth
they are checked against, run only on the (tiny) surviving pair set,
never on the corpus.

Dataflow: pairs are slim ``(a, b)`` id rows; the two texts are joined
on via the partitioned ``hash_join`` (ids exchange, text joins in once
per side), then one ``map_batches`` computes the DP per pair.  The DP
is the row-vectorised two-row Levenshtein: O(len_a) numpy operations of
width len_b (the insertion recurrence is closed into a prefix-scan:
``c[j] = j + min(i, cummin(t[k]-k))``), never a per-cell Python loop.
Texts are truncated to ``max_chars`` first — the audit bound the
reference also applies (abToleratedOneMismatch caps comparison work).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance, numpy-vectorised over ``b``.

    Computed over UTF-8 BYTES, not codepoints — that is the unit
    DuckDB's ``levenshtein`` uses (``levenshtein('é','e') = 2``), and
    byte-exact SQL replay outranks codepoint purity here; for ASCII
    web text the two are identical anyway.
    """
    ab, bb = a.encode(), b.encode()
    la, lb = len(ab), len(bb)
    if la == 0 or lb == 0:
        return la or lb
    if ab == bb:
        return 0
    bcodes = np.frombuffer(bb, dtype=np.uint8).astype(np.int64)
    offsets = np.arange(1, lb + 1, dtype=np.int64)
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    for i, ca in enumerate(ab, 1):
        # substitution / deletion are elementwise on the previous row
        t = np.minimum(prev[:-1] + (bcodes != ca), prev[1:] + 1)
        # insertion c[j] = min(t[j-1], c[j-1] + 1) closed into a scan:
        # c[j] = j + min(i, min_{k<=j}(t[k] - k))   (c[0] = i)
        np.subtract(t, offsets, out=t)
        np.minimum.accumulate(t, out=t)
        cur[0] = i
        np.add(np.minimum(t, i), offsets, out=cur[1:])
        prev, cur = cur, prev
    return int(prev[-1])


def levenshtein_batch(ta: list, tb: list, chunk: int = 1024) -> np.ndarray:
    """Exact unit-cost edit distance for MANY pairs at once — the same
    two-row prefix-scan DP as :func:`levenshtein`, vectorised across
    the pair axis: every numpy op covers a (pairs x len_b) matrix, so
    the per-row Python overhead is paid once per CHARACTER POSITION of
    the longest string in a chunk instead of once per (pair, position).

    Pairs are sorted by ``len(a)`` and processed in length-similar
    chunks so a short pair never rides the long pairs' iteration
    count; each pair's result is harvested at its own ``i == len_a``
    row.  Byte semantics identical to :func:`levenshtein` (UTF-8
    bytes, DuckDB's unit).
    """
    n = len(ta)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    ab = [x.encode() for x in ta]
    bb = [y.encode() for y in tb]
    la = np.fromiter((len(x) for x in ab), dtype=np.int64, count=n)
    lb = np.fromiter((len(y) for y in bb), dtype=np.int64, count=n)
    # trivial rows: empty side or equal bytes
    out[la == 0] = lb[la == 0]
    out[lb == 0] = la[lb == 0]
    todo = np.flatnonzero(
        (la > 0) & (lb > 0)
        & np.fromiter((x != y for x, y in zip(ab, bb)), dtype=bool, count=n))
    if not len(todo):
        return out
    # sort by (len_b, len_a): len_b sets the DP matrix WIDTH, so one
    # long b-side outlier must not inflate a whole chunk's matrices;
    # greedy cell budget bounds each chunk's (pairs x len_b) footprint
    # (~48 MB of int32/int16 cells) regardless of length skew
    todo = todo[np.lexsort((la[todo], lb[todo]))]
    CELL_BUDGET = 4 << 20

    spans: list[tuple[int, int]] = []
    s = 0
    nt = len(todo)
    while s < nt:                      # widths ascend, so greedy is tight
        e = s + 1
        while e < nt and e - s < chunk and \
                (e - s + 1) * (int(lb[todo[e]]) + 1) <= CELL_BUDGET:
            e += 1
        spans.append((s, e))
        s = e

    for c0, c1 in spans:
        idx = todo[c0:c1]
        m = len(idx)
        amax = int(la[idx].max())
        bmax = int(lb[idx].max())
        A = np.full((m, amax), -1, dtype=np.int16)
        B = np.full((m, bmax), -2, dtype=np.int16)   # pad != A's pad
        for r, p in enumerate(idx):
            A[r, :la[p]] = np.frombuffer(ab[p], dtype=np.uint8)
            B[r, :lb[p]] = np.frombuffer(bb[p], dtype=np.uint8)
        # int32 DP cells: distances are bounded by max(len) << 2^31,
        # and halving the element width halves the memory traffic of
        # the (pairs x len_b) sweeps
        offsets = np.arange(1, bmax + 1, dtype=np.int32)
        prev = np.broadcast_to(
            np.arange(bmax + 1, dtype=np.int32), (m, bmax + 1)).copy()
        cur = np.empty_like(prev)
        lbi = lb[idx]
        lai = la[idx]
        for i in range(1, amax + 1):
            ca = A[:, i - 1][:, None]
            t = np.minimum(prev[:, :-1] + (B != ca), prev[:, 1:] + 1)
            np.subtract(t, offsets, out=t)
            np.minimum.accumulate(t, axis=1, out=t)
            cur[:, 0] = i
            np.add(np.minimum(t, i), offsets, out=cur[:, 1:])
            done = lai == i
            if done.any():
                rows = np.flatnonzero(done)
                out[idx[rows]] = cur[rows, lbi[rows]]
            prev, cur = cur, prev
    return out


def pair_edit_distances(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a",
    b_col: str = "b",
    max_chars: int = 240,
    num_parts: int = 32,
) -> rd.Dataset:
    """(a, b) id pairs -> (a, b, edit_distance, edit_similarity).

    ``edit_similarity = 1 - dist / max(len_a, len_b)`` over UTF-8 byte
    lengths of the truncated texts (1.0 for two empty texts — SQL twin:
    ``strlen``).  Join shape: docs' (id, truncated text) rides each
    exchange once; the DP map is per-pair and local.
    """
    from gencore_ray.stages.shuffle import hash_join

    def _trunc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: t[id_col],
                "__edt": pc.utf8_slice_codeunits(t[text_col], 0, max_chars),
            }
        )

    slim = docs.map_batches(_trunc, batch_format="pyarrow")
    j = hash_join(pairs, slim.rename_columns({id_col: "__ida", "__edt": "__ta"}),
                  a_col, "__ida", num_parts=num_parts)
    j = hash_join(j, slim.rename_columns({id_col: "__idb", "__edt": "__tb"}),
                  b_col, "__idb", num_parts=num_parts)

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        ta, tb = df["__ta"].tolist(), df["__tb"].tolist()
        dist = levenshtein_batch(
            [x or "" for x in ta], [y or "" for y in tb])
        denom = np.maximum(
            [len((x or "").encode()) for x in ta],
            [len((y or "").encode()) for y in tb],
        ).astype(np.float64)
        sim = np.where(denom > 0, 1.0 - dist / np.maximum(denom, 1.0), 1.0)
        out = df[[a_col, b_col]].copy()
        out["edit_distance"] = dist
        # half-away rounding (DuckDB round()): np.round is banker's and
        # diverges on exact .5 boundaries — 1 - 91/128 = 0.2890625 is
        # representable and DID land on one
        out["edit_similarity"] = np.floor(sim * 1e6 + 0.5) / 1e6
        return out

    return j.map_batches(_score, batch_format="pandas")
