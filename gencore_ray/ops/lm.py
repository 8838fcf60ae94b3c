"""Corpus-LM quality scoring (CCNet-style perplexity filtering).

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the
perplexity of a language model trained on a trusted corpus; documents
whose perplexity is far above the corpus norm are boilerplate/gibberish
candidates.  Here the model is a top-V unigram LM with add-alpha
smoothing trained on the corpus itself — the dependency-free analogue
with the same pipeline shape as a real KenLM scorer:

  1. token-count exchange: per-batch ``value_counts`` partials (one row
     per DISTINCT term per batch, never per occurrence), one term-keyed
     ``grouped_map`` sum — vocabulary-sized output, Zipf-small.
  2. model fit on the driver: global top-V terms by (count desc, term
     asc), every dropped term folded into one ``<unk>`` symbol; V+1
     symbol probabilities p(w) = (c(w)+alpha) / (N + alpha*(V+1)).
     The model is O(V) — broadcast once via ``ray.put``.
  3. scoring map: tokenize once per batch, gather log-probs through a
     vectorised hash-map lookup, per-doc mean -> perplexity =
     exp(-mean).  Pure map, no exchange.

The reference's analogous shape is the quality-score map over decoded
reads (/root/reference/src/pair.cpp:70-86): a per-record score from a
small broadcast table, derived once and reused downstream.

Docs with zero tokens are EXCLUDED from the output (no token stream ->
no likelihood; SQL GROUP BY drops them identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def lm_unigram_perplexity(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_cap: int = 1000,
    alpha: float = 1.0,
    num_parts: int = 16,
    round_to: int = 6,
) -> rd.Dataset:
    """(id, n_tokens, avg_logp, perplexity) per doc with >= 1 token.

    ``vocab_cap`` bounds the broadcast model (the 100-TB-safety knob:
    the count exchange is vocabulary-sized, the model top-V-sized);
    ties at the cap break deterministically on term ascending.
    """
    import ray

    from gencore_ray.functions.text import _TOKEN_RE

    model, unk_logp = fit_unigram_lm(ds, text_col=text_col,
                                     vocab_cap=vocab_cap, alpha=alpha,
                                     num_parts=num_parts)
    model_ref = ray.put(model)
    p = 10.0 ** round_to
    slim = ds.select_columns([id_col, text_col])

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        toks = [_TOKEN_RE.findall((t or "").lower())
                for t in df[text_col].tolist()]
        lens, avg = score_token_lists(toks, ray.get(model_ref), unk_logp)
        keep = lens > 0
        if not keep.any():
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "n_tokens": pd.Series(dtype=np.int64),
                                 "avg_logp": pd.Series(dtype=np.float64),
                                 "perplexity": pd.Series(dtype=np.float64)})
        avg = avg[keep]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_tokens": lens[keep],
            "avg_logp": np.sign(avg) * np.floor(np.abs(avg) * p + 0.5) / p,
            "perplexity": np.floor(np.exp(-avg) * p + 0.5) / p,
        })

    return slim.map_batches(_score, batch_format="pandas")


def fit_unigram_lm(
    ds: rd.Dataset,
    text_col: str = "text",
    vocab_cap: int = 1000,
    alpha: float = 1.0,
    num_parts: int = 16,
) -> tuple[pd.Series, float]:
    """One token-count exchange + O(V) driver fit; returns
    (term -> logp Series, unk_logp).  Shared by the perplexity op and
    the fused curation map."""
    from gencore_ray.functions.text import _TOKEN_RE
    from gencore_ray.ops.relational import topk
    from gencore_ray.stages.shuffle import grouped_map

    def _count_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [_TOKEN_RE.findall((t or "").lower())
                for t in df[text_col].tolist()]
        flat = [w for t in toks for w in t]
        if not flat:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        vc = pd.Series(flat).value_counts(sort=False)
        return pd.DataFrame({"term": vc.index, "c": vc.to_numpy()})

    def _count_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", sort=False)["c"].sum().reset_index()

    counts = grouped_map(
        ds.select_columns([text_col]).map_batches(
            _count_partial, batch_format="pandas"),
        "term", _count_final, num_parts=num_parts,
    ).materialize()
    n_total = int(counts.sum("c") or 0)
    topv = topk(counts, ["c", "term"], vocab_cap,
                descending=[True, False]).to_pandas()
    unk_c = n_total - int(topv["c"].sum())
    denom = n_total + alpha * (len(topv) + 1)
    logp = np.log((topv["c"].to_numpy(dtype=np.float64) + alpha) / denom)
    unk_logp = float(np.log((unk_c + alpha) / denom))
    return pd.Series(logp, index=topv["term"].to_numpy()), unk_logp


def score_token_lists(
    tok_lists: list, model: pd.Series, unk_logp: float,
) -> tuple[np.ndarray, np.ndarray]:
    """(token counts, raw mean log-prob per doc); zero-token docs get
    avg 0.0 — callers decide whether to exclude or default them."""
    n = len(tok_lists)
    lens = np.fromiter(map(len, tok_lists), dtype=np.int64, count=n)
    if not int(lens.sum()):
        return lens, np.zeros(n)
    flat = pd.Index([w for t in tok_lists for w in t])
    lp = model.reindex(flat).to_numpy(dtype=np.float64)
    lp[np.isnan(lp)] = unk_logp
    doc_of = np.repeat(np.arange(n), lens)
    sums = np.bincount(doc_of, weights=lp, minlength=n)
    return lens, np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)


def ppl_buckets(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_cap: int = 1000,
    num_parts: int = 16,
) -> rd.Dataset:
    """CCNet's head/middle/tail split: per-language perplexity
    tertiles over the ROUNDED perplexity column (so the SQL replay can
    never disagree on a boundary), then one broadcast threshold lookup.

    (id, lang, perplexity, bucket) per doc with >= 1 token —
    ``head`` = cleanest third of its language, ``tail`` = worst.
    Exchange cost: the lm fit's count exchange + one (lang, ppl)
    quantile exchange; the bucket assignment is a pure map.
    """
    import ray

    from gencore_ray.ops.relational import grouped_quantiles
    from gencore_ray.stages.shuffle import hash_join

    ppl = lm_unigram_perplexity(
        ds, id_col=id_col, text_col=text_col, vocab_cap=vocab_cap,
        num_parts=num_parts,
    ).select_columns([id_col, "perplexity"])

    def _slim_lang(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lid": df[id_col].to_numpy(),
                             lang_col: df[lang_col].to_numpy()})

    langs = ds.select_columns([id_col, lang_col]).map_batches(
        _slim_lang, batch_format="pandas")
    pl = hash_join(ppl, langs, id_col, "lid", num_parts=num_parts)
    th = grouped_quantiles(
        pl, [lang_col], "perplexity",
        [("p33", 1.0 / 3.0), ("p66", 2.0 / 3.0)], num_parts=num_parts,
    ).to_pandas().set_index(lang_col)
    ref = ray.put(th)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        p33 = t["p33"].reindex(df[lang_col]).to_numpy(dtype=np.float64)
        p66 = t["p66"].reindex(df[lang_col]).to_numpy(dtype=np.float64)
        v = df["perplexity"].to_numpy(dtype=np.float64)
        bucket = np.where(v <= p33, "head",
                          np.where(v <= p66, "middle", "tail"))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            lang_col: df[lang_col].to_numpy(),
            "perplexity": v,
            "bucket": bucket.astype(object),
        })

    return pl.map_batches(_bucket, batch_format="pandas")
