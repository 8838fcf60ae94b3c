"""Cross-document line deduplication (CCNet-style boilerplate removal).

CCNet (Wenzek et al. 2020) removes duplicated LINES across the corpus
before LM training — nav menus, cookie banners, footers repeat on
thousands of pages and would otherwise dominate the token stream.
This op removes every occurrence of any line that appears in at least
``min_docs`` DISTINCT documents and reassembles the cleaned text.

Scale shape — two full-text exchanges, zero driver state:

  1. explode (line_hash, id, line_no, line) rows, one per line;
  2. line-hash-keyed exchange: each partition holds EVERY occurrence
     of its hashes, so a per-partition distinct-doc count is the
     global count; mark occurrences of frequent lines;
  3. id-keyed exchange: reassemble each doc's surviving lines in
     line_no order.

The line text rides both exchanges (~2x corpus bytes) — inherent to
the semantics (the survivor lines must reach their doc's partition);
a broadcast-set variant would bound traffic but put the frequent-line
set on every worker, which at 10^12 docs is NOT guaranteed small.

gencore analogue: the duplicate-fragment drop before consensus
(/root/reference/src/gencore.cpp:319-389 flushes clusters and keeps
one consensus record per group) — here the "group" is a line's
occurrence set and the policy is drop-all-frequent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def line_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    num_parts: int = 16,
) -> rd.Dataset:
    """(id, n_lines, n_removed, clean_text): drop every line occurring
    in >= min_docs distinct docs, rejoin survivors with newline."""
    from itertools import chain

    from gencore_ray.functions.hashing import hash_str_array_u64
    from gencore_ray.stages.shuffle import grouped_map

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").tolist()
        lists = [t.split("\n") for t in texts]
        lens = np.fromiter(map(len, lists), dtype=np.int64, count=len(lists))
        flat = list(chain.from_iterable(lists))
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), lens),
            "line_no": np.arange(len(flat), dtype=np.int64) - offs,
            "line": flat,
            "lh": hash_str_array_u64(flat),
        })

    def _mark(df: pd.DataFrame) -> pd.DataFrame:
        # global distinct-doc count per hash (partition holds ALL
        # occurrences of its hashes), joined back by factorized code
        codes, uniq = pd.factorize(df["lh"], sort=False)
        pair = pd.DataFrame({"c": codes, "d": df[id_col]}).drop_duplicates()
        nd = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nd, pair["c"].to_numpy(), 1)
        return df.assign(rm=nd[codes] >= min_docs)[
            [id_col, "line_no", "line", "rm"]]

    def _rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "line_no"], kind="mergesort")
        ids, idx = np.unique(df[id_col].to_numpy(), return_index=True)
        bounds = np.r_[idx, len(df)]
        lines = df["line"].to_numpy()
        rm = df["rm"].to_numpy(dtype=bool)
        texts, n_lines, n_removed = [], [], []
        for i in range(len(ids)):
            lo, hi = bounds[i], bounds[i + 1]
            keep = ~rm[lo:hi]
            texts.append("\n".join(lines[lo:hi][keep]))
            n_lines.append(hi - lo)
            n_removed.append(int(rm[lo:hi].sum()))
        return pd.DataFrame({
            id_col: ids,
            "n_lines": np.asarray(n_lines, dtype=np.int64),
            "n_removed": np.asarray(n_removed, dtype=np.int64),
            "clean_text": texts,
        })

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pandas")
    marked = grouped_map(exploded, "lh", _mark, num_parts=num_parts)
    return grouped_map(marked, id_col, _rebuild, num_parts=num_parts)
