"""End-to-end corpus curation pipeline (the training-data analogue of
the flagship dedup pipeline's read->stage->verdict shape).

Composes three independently-oracled stages into one per-doc verdict:

  1. **exact dedup** — blake2 text-hash exchange; the smallest doc_id
     per hash survives, every other copy is reason ``exact_dup``
     (same slim-exchange shape as stages/exact.py).
  2. **Gopher rules** — ops/textstats.corpus_filter signals (pure map).
  3. **LM perplexity** — ops/lm.lm_unigram_perplexity (one count
     exchange + broadcast model + scoring map); docs whose ROUNDED
     perplexity exceeds ``ppl_threshold`` are reason
     ``high_perplexity`` (threshold applies to the rounded value so
     the SQL replay can never disagree on a boundary).

Reason priority (first failing wins): exact_dup > gopher rule >
high_perplexity > ok.  Zero-token docs never reach the perplexity
check — they already failed ``too_few_tokens``.

Two slim id-keyed joins stitch the stage outputs; text never rides a
join (the dup check ships hashes, the signals ship scalars).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def curate_documents(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ppl_threshold: float = 31.0,
    vocab_cap: int = 1000,
    num_parts: int = 16,
    **filter_kwargs,
) -> rd.Dataset:
    """(id, keep, reason, perplexity) — one row per doc; ``keep`` iff
    every stage passes.  ``perplexity`` is 0.0 for zero-token docs."""
    from gencore_ray.functions.hashing import hash_str_array_u64
    from gencore_ray.ops.lm import lm_unigram_perplexity
    from gencore_ray.ops.textstats import corpus_filter
    from gencore_ray.stages.shuffle import grouped_map, hash_join

    slim = ds.select_columns([id_col, text_col])

    # --- stage 1: exact dup (slim (hash, id) exchange) ---------------
    def _th(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "th": hash_str_array_u64(df[text_col].fillna("").tolist()),
        })

    def _mark_dup(df: pd.DataFrame) -> pd.DataFrame:
        keep_id = df.groupby("th", sort=False)[id_col].transform("min")
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "is_dup": (df[id_col] != keep_id).to_numpy(),
        })

    dup = grouped_map(slim.map_batches(_th, batch_format="pandas"),
                      "th", _mark_dup, num_parts=num_parts)

    # --- stages 2+3: signals ----------------------------------------
    gopher = corpus_filter(ds, id_col=id_col, text_col=text_col,
                           **filter_kwargs).select_columns(
        [id_col, "reason"]).map_batches(
        lambda df: df.rename(columns={"reason": "gopher_reason"}),
        batch_format="pandas")
    ppl = lm_unigram_perplexity(ds, id_col=id_col, text_col=text_col,
                                vocab_cap=vocab_cap,
                                num_parts=num_parts).select_columns(
        [id_col, "perplexity"])

    j1 = hash_join(dup, gopher, id_col, id_col, num_parts=num_parts)
    j2 = hash_join(j1, ppl, id_col, id_col, num_parts=num_parts,
                   how="left_outer")

    def _verdict(df: pd.DataFrame) -> pd.DataFrame:
        ppl_v = df["perplexity"].fillna(0.0).to_numpy(dtype=np.float64)
        g = df["gopher_reason"].to_numpy(dtype=object)
        is_dup = df["is_dup"].to_numpy(dtype=bool)
        reason = np.where(ppl_v > ppl_threshold, "high_perplexity", "ok")
        gb = g != "ok"
        reason[gb] = g[gb]
        reason[is_dup] = "exact_dup"
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "keep": reason == "ok",
            "reason": reason,
            "perplexity": ppl_v,
        })

    return j2.map_batches(_verdict, batch_format="pandas")
