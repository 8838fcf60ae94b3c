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

The Gopher signals and LM scoring run FUSED in one tokenisation map
(the LM fit's count exchange is the only other pass over the text),
so the whole pipeline is: one slim hash exchange (dup), one
vocabulary exchange (fit), one scoring map, one slim id-keyed join;
text never rides a join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def curate_documents(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ppl_threshold: float | None = 31.0,
    ppl_drop_frac: float | None = None,
    vocab_cap: int = 1000,
    num_parts: int = 16,
    **filter_kwargs,
) -> rd.Dataset:
    """(id, keep, reason, perplexity) — one row per doc; ``keep`` iff
    every stage passes.  ``perplexity`` is 0.0 for zero-token docs.

    The perplexity gate is either ABSOLUTE (``ppl_threshold``) or
    ADAPTIVE (``ppl_drop_frac=0.1`` drops the worst 10% of the
    corpus's own rounded-perplexity distribution — absolute
    thresholds don't transfer between corpora; CCNet's tail-drop is
    the quantile form).  ``ppl_drop_frac`` overrides ``ppl_threshold``
    and costs one extra tiny exchange (exact global quantile over the
    per-doc perplexities)."""
    import ray

    from gencore_ray.functions.hashing import hash_str_array_u64

    # both gates unset == "no perplexity gate": an infinite threshold,
    # not an opaque `ppl_v > None` TypeError inside the remote verdict
    if ppl_threshold is None and ppl_drop_frac is None:
        ppl_threshold = float("inf")
    from gencore_ray.ops.lm import fit_unigram_lm, score_token_lists
    from gencore_ray.ops.textstats import gopher_signals
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

    # --- stages 2+3 fused: gopher signals + LM scoring in ONE
    # tokenisation pass (the fit's count exchange is the only other
    # pass over the text) --------------------------------------------
    model, unk_logp = fit_unigram_lm(ds, text_col=text_col,
                                     vocab_cap=vocab_cap,
                                     num_parts=num_parts)
    model_ref = ray.put(model)

    def _signals(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").tolist()
        reason, sig = gopher_signals(texts, **filter_kwargs)
        lens, avg = score_token_lists(sig["feats"].tok_lists,
                                      ray.get(model_ref), unk_logp)
        ppl = np.where(lens > 0,
                       np.floor(np.exp(-avg) * 1e6 + 0.5) / 1e6, 0.0)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "gopher_reason": reason,
            "perplexity": ppl,
        })

    signals = slim.map_batches(_signals, batch_format="pandas")
    if ppl_drop_frac is not None:
        from gencore_ray.ops.relational import grouped_quantiles

        signals = signals.materialize()

        def _nonzero(df: pd.DataFrame) -> pd.DataFrame:
            sub = df.loc[df["perplexity"] > 0, ["perplexity"]].copy()
            sub["_g"] = 0
            return sub

        th = grouped_quantiles(
            signals.map_batches(_nonzero, batch_format="pandas"),
            ["_g"], "perplexity",
            [("cut", 1.0 - float(ppl_drop_frac))], num_parts=1,
        ).to_pandas()
        ppl_threshold = float(th["cut"].iloc[0]) if len(th) else float("inf")
    j = hash_join(signals, dup, id_col, id_col, num_parts=num_parts)

    def _verdict(df: pd.DataFrame) -> pd.DataFrame:
        ppl_v = df["perplexity"].to_numpy(dtype=np.float64)
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

    return j.map_batches(_verdict, batch_format="pandas")
