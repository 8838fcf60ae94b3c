"""Deterministic synthetic Common-Crawl-style pages corpus.

Shape is the authoritative ``input_hint`` from BASELINE.json:
``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.  Duplicate structure planted per FIXTURES.md §1:
exact dups, near dups, borderline, substring containments,
simhash-only boilerplate, one hot-bucket template, singletons and
empty/short bypass rows.  Seeded — same (seed, n_pages) on any
machine yields byte-identical tables (the analogue of the reference's
deterministic grouping guarantee, /root/reference/src/gencore.cpp:325-385).

A second ``truth`` table (url, true_cluster, kind) carries the hidden
provenance used only by test oracles; it is never an input to the
engine.
"""

from __future__ import annotations

import html as _html_mod
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

_EPOCH = datetime(2024, 1, 1)

_BASE_WORDS = (
    "the of and to in a is that it was for on are as with his they at be this have "
    "from or had by not but what all were when we there can an your which their said "
    "if do will each about how up out them then she many some so these would other "
    "into has more her two like him see time could no make than first been its who "
    "now people my made over did down only way find use may water long little very "
    "after words called just where most know get through back much before go good "
    "new write our used me man too any day same right look think also around another "
    "came come work three word must because does part even place well such here take "
    "why things help put years different away again off went old number great tell "
    "men say small every found still between name should home big give air line set "
    "own under read last never us left end along while might next sound below saw "
    "something thought both few those always looked show large often together asked "
    "house world going want school important until form food keep children feet land "
    "side without boy once animal life enough took four head above kind began almost "
    "live page got earth need far hand high year mother light country father let "
    "night picture being study second soon story since white ever paper hard near "
    "sentence better best across during today however sure knew try told young sun "
    "thing whole hear example heard several change answer room against top turned "
    "learn point city play toward five himself usually money seen car morning"
).split()


def _make_vocab(rng: np.random.RandomState) -> list[str]:
    vocab = list(dict.fromkeys(_BASE_WORDS))
    for i in range(800):
        ln = rng.randint(4, 11)
        letters = rng.choice(list("abcdefghijklmnopqrstuvwxyz"), size=ln)
        vocab.append("".join(letters))
    # a few entity-bearing tokens to exercise HTML escaping round-trips
    vocab += ["AT&T", "a<b", "x>y", 'say"hi"', "R&D", "c&d"]
    return vocab


# Per-language function/common words for the corpus's lang signal.
# Authored INDEPENDENTLY of the detector's stopword table in
# gencore_ray/functions/text.py: drawn from general
# high-frequency vocabulary, ASCII-folded so both the Python \w+
# tokenizer and the SQL oracles' ASCII token class parse them.  Natural
# overlap with the detector's lists is real language, not construction —
# the detector is graded on text it did not define (the round-2
# accuracy evidence was circular; this breaks the loop).  Each list
# also carries words the detector does NOT know, so measured accuracy
# is an honest number, not 1.0 by construction.
_LANG_FUNCTION_WORDS = {
    "en": (
        "and the was were with that this from they have had but not you all "
        "she her his him its our their one who would could should than then "
        "because been being over under after before while where something "
        "nothing everything anyone people really still always never during"
    ).split(),
    "de": (
        "und der die das ein eine nicht ist war sind wir ihr ihm ihn sein "
        "ihre kann muss auch noch schon jetzt hier dort wieder immer sehr "
        "mehr alles etwas nichts durch gegen ohne unter zwischen vielleicht "
        "heute morgen gestern zusammen wirklich natuerlich"
    ).split(),
    "fr": (
        "et le la les des une est sont etait avec pour dans sur sous apres "
        "avant tout tous toute cette ces mais donc quand comme bien tres peu "
        "beaucoup chez entre vers sans notre votre leurs toujours jamais "
        "encore aussi peut etre faire meme autre chose"
    ).split(),
    "es": (
        "y el la los las una es son era con para por sobre despues antes "
        "todo todos esta estos pero cuando como bien muy poco mucho entre "
        "hacia desde nuestro ellos siempre nunca tambien ahora aqui alli "
        "hacer tener decir cosa otro mismo"
    ).split(),
    "it": (
        "e il lo la gli le una di da per sopra sotto dopo prima tutto tutti "
        "questa questi ma quando come bene molto poco tra fra verso senza "
        "nostro vostro loro sempre ancora anche adesso fare avere dire cosa "
        "altro stesso proprio ogni"
    ).split(),
    "pt": (
        "e o a os as uma de em para por sobre depois antes tudo todos esta "
        "estes mas quando como bem muito pouco entre desde nosso eles sempre "
        "nunca tambem agora aqui fazer ter dizer coisa outro mesmo cada "
        "ainda porque assim"
    ).split(),
    "nl": (
        "en de het een van voor door over onder na alles allemaal deze die "
        "maar wanneer zoals goed heel weinig veel tussen vanaf onze jullie "
        "altijd weer nog steeds hier daar samen echt natuurlijk vandaag "
        "morgen gisteren misschien"
    ).split(),
}


# English glue words stripped from the shared base vocab for non-en
# documents (a real de/fr/... page is not three-quarters English
# function words).  Also authored here, independent of the detector.
_EN_FILTER = frozenset(
    _LANG_FUNCTION_WORDS["en"]
    + "the of and to in a is that it was for on are as at be an or by "
      "we there can your which if do will so no my me us he it".split()
)


def _lang_vocab(vocab: list[str], lang: str) -> list[str]:
    """Vocab with the language's function words mixed in at realistic
    density (~25% of tokens), so the `lang` label is reflected in the
    text itself and language-ID has a real signal to recover."""
    words = _LANG_FUNCTION_WORDS.get(lang, [])
    if lang != "en" and words:
        vocab = [w for w in vocab if w.lower() not in _EN_FILTER]
    return vocab + [w for w in words for _ in range(10)]


def _kgram_set(paras: list[list[str]], k: int = 5) -> set[tuple[str, ...]]:
    """Distinct word-5-grams of the flattened doc (plain-Python mirror
    of the engine's shingle set — used only to self-check planted
    near-dup strength at generation time)."""
    toks = [w.lower() for p in paras for w in p]
    if not toks:
        return set()
    if len(toks) < k:
        return {tuple(toks)}
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _kgram_jaccard(a: set, b: set) -> float:
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _sentence(rng: np.random.RandomState, vocab: list[str]) -> list[str]:
    n = rng.randint(5, 16)
    idx = rng.randint(0, len(vocab), size=n)
    return [vocab[i] for i in idx]


def _base_text(rng: np.random.RandomState, vocab: list[str]) -> list[list[str]]:
    """A document as a list of paragraphs, each a list of words."""
    paras = []
    for _ in range(rng.randint(2, 6)):
        words: list[str] = []
        for _ in range(rng.randint(2, 7)):
            words.extend(_sentence(rng, vocab))
        paras.append(words)
    return paras


def _mutate(
    rng: np.random.RandomState, paras: list[list[str]], vocab: list[str], n_swap: int
) -> list[list[str]]:
    """Replace n_swap random word positions with random vocab words."""
    flat = [(pi, wi) for pi, p in enumerate(paras) for wi in range(len(p))]
    out = [list(p) for p in paras]
    if not flat:
        return out
    picks = rng.choice(len(flat), size=min(n_swap, len(flat)), replace=False)
    for k in np.atleast_1d(picks):
        pi, wi = flat[int(k)]
        out[pi][wi] = vocab[rng.randint(0, len(vocab))]
    return out


def _render_text(paras: list[list[str]]) -> str:
    return "\n\n".join(" ".join(p) for p in paras if p)


def _render_html(title: str, paras: list[list[str]], site: str) -> bytes:
    body = "\n".join(
        f"<p>{_html_mod.escape(' '.join(p))}</p>" for p in paras if p
    )
    doc = (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{_html_mod.escape(title)}</title>\n"
        "<style>body { font-family: sans-serif; }</style>\n"
        "<script>var tracked = true; function f(){return 1<2;}</script>\n"
        "</head>\n<body>\n"
        f'<header><nav><a href="/">Home</a> | <a href="/about">About</a></nav></header>\n'
        f"<main>\n{body}\n</main>\n"
        f"<footer>&copy; 2024 {_html_mod.escape(site)} &middot; all rights reserved</footer>\n"
        "</body></html>\n"
    )
    return doc.encode("utf-8")


def generate_pages(
    n_pages: int = 500, seed: int = 42, with_truth: bool = False
) -> pa.Table | tuple[pa.Table, pa.Table]:
    """Build the pages table (and optionally the provenance table)."""
    rng = np.random.RandomState(seed)
    vocab = _make_vocab(rng)

    rows: list[dict] = []  # url, ts_off, paras, lang, cluster, kind
    cluster_id = 0

    def add(paras: list[list[str]], kind: str, cluster: int, lang: str = "en") -> None:
        rows.append({"paras": paras, "kind": kind, "cluster": cluster, "lang": lang})

    # budget the kinds (FIXTURES.md: dup fraction ~ 0.35)
    n_hot = min(500, max(8, n_pages // 12))
    n_exact_c = max(2, n_pages // 40)        # clusters of exact dups
    n_near_c = max(3, n_pages // 25)         # near-dup clusters
    n_border_c = max(2, n_pages // 50)
    n_substr_c = max(2, n_pages // 50)
    n_simhash_c = max(2, n_pages // 60)
    n_empty = max(3, n_pages // 100)

    langs = ["en"] * 8 + ["de", "fr", "es", "it", "pt", "nl"]

    def pick_lang() -> str:
        return langs[rng.randint(0, len(langs))]

    # --- exact-dup clusters ---
    for _ in range(n_exact_c):
        lang = pick_lang()
        base = _base_text(rng, _lang_vocab(vocab, lang))
        size = min(10, 2 + rng.geometric(0.5))
        for _ in range(size):
            add([list(p) for p in base], "exact", cluster_id, lang)
        cluster_id += 1

    # --- near-dup clusters (word swaps per copy, GUARANTEED above the
    # dedup threshold: each copy's 5-gram jaccard vs the base is checked
    # at generation time — a short doc with 3 swaps can genuinely fall
    # below tau=0.7, which would make the truth labels lies) ---
    for _ in range(n_near_c):
        lang = pick_lang()
        lvocab = _lang_vocab(vocab, lang)
        base = _base_text(rng, lvocab)
        while sum(len(p) for p in base) < 100:   # length floor: swaps stay cheap
            base[-1] = base[-1] + _sentence(rng, lvocab)
        bset = _kgram_set(base)
        size = min(10, 2 + rng.geometric(0.5))
        add(base, "near", cluster_id, lang)
        for _ in range(size - 1):
            cand = _mutate(rng, base, vocab, int(rng.randint(1, 4)))
            if _kgram_jaccard(_kgram_set(cand), bset) < 0.9:
                cand = _mutate(rng, base, vocab, 1)   # fall back to one swap
            add(cand, "near", cluster_id, lang)
        cluster_id += 1

    # --- borderline clusters (swap ~12-20% of words -> Jaccard near tau) ---
    envoc = _lang_vocab(vocab, "en")
    for _ in range(n_border_c):
        base = _base_text(rng, envoc)
        total = sum(len(p) for p in base)
        add(base, "borderline", cluster_id)
        n_swap = max(2, int(total * (0.12 + 0.08 * rng.rand())))
        add(_mutate(rng, base, vocab, n_swap), "borderline", cluster_id)
        cluster_id += 1

    # --- substring containment (short page = >=half the long page's paras) ---
    for _ in range(n_substr_c):
        base = _base_text(rng, envoc)
        while len(base) < 3:
            base.append(_sentence(rng, envoc))
        add(base, "substring", cluster_id)
        keep = max(2, (len(base) + 1) // 2)
        start = rng.randint(0, len(base) - keep + 1)
        add([list(p) for p in base[start : start + keep]], "substring", cluster_id)
        cluster_id += 1

    # --- simhash-only boilerplate (short template, one field differs) ---
    for _ in range(n_simhash_c):
        tmpl = _base_text(rng, envoc)[:1]  # one paragraph template
        while len(tmpl[0]) < 24:
            tmpl[0].extend(_sentence(rng, envoc))
        add(tmpl, "simhash", cluster_id)
        var = [list(tmpl[0])]
        var[0][rng.randint(0, len(var[0]))] = vocab[rng.randint(0, len(vocab))]
        add(var, "simhash", cluster_id)
        cluster_id += 1

    # --- hot bucket: one boilerplate instantiated many times ---
    hot_tmpl = _base_text(rng, envoc)
    hot_cluster = cluster_id
    cluster_id += 1
    for _ in range(n_hot):
        inst = _mutate(rng, hot_tmpl, vocab, 1)
        add(inst, "hot", hot_cluster)

    # --- empty / short bypass rows ---
    for i in range(n_empty):
        if i % 2 == 0:
            add([], "empty", cluster_id)
        else:
            add([[vocab[rng.randint(0, len(vocab))] for _ in range(rng.randint(1, 4))]],
                "short", cluster_id)
        cluster_id += 1

    # --- singletons to fill up to n_pages ---
    while len(rows) < n_pages:
        lang = pick_lang()
        add(_base_text(rng, _lang_vocab(vocab, lang)), "singleton", cluster_id, lang)
        cluster_id += 1
    rows = rows[:n_pages]

    # deterministic shuffle so cluster members are scattered across blocks
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]

    urls, tss, htmls, texts, langs_col, clusters, kinds = [], [], [], [], [], [], []
    for i, r in enumerate(rows):
        site = f"site-{r['cluster'] % 97:03d}"
        url = f"https://{site}.example/{r['kind']}/page-{i:06d}"
        ts = _EPOCH + timedelta(seconds=int(rng.randint(0, 365 * 24 * 3600)))
        title = f"{site} {r['kind']} {i}"
        urls.append(url)
        tss.append(ts)
        htmls.append(_render_html(title, r["paras"], site))
        texts.append(_render_text(r["paras"]))
        langs_col.append(r["lang"])
        clusters.append(r["cluster"])
        kinds.append(r["kind"])

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs_col, pa.string()),
        }
    )
    if not with_truth:
        return pages
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "true_cluster": pa.array(clusters, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return pages, truth


def write_pages_corpus(
    out_dir: str, n_pages: int = 500, seed: int = 42, shards: int | None = None
) -> str:
    """Write pages/ (sharded parquet dir) + truth.parquet under out_dir.

    Sharding matters: ray.data issues ONE read task per parquet file,
    so a single big file serialises the read stage no matter how many
    row groups it has.  One file per ~1000 pages keeps the read (and
    everything fused onto it) parallel — the same layout the engine
    itself writes for resumability.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages, truth = generate_pages(n_pages, seed, with_truth=True)
    if shards is None:
        shards = max(1, min(256, n_pages // 1000))
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    per = (n_pages + shards - 1) // shards
    for s in range(shards):
        chunk = pages.slice(s * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(
            chunk, os.path.join(pages_dir, f"part-{s:04d}.parquet"), row_group_size=512
        )
    # single-file convenience copy for small corpora / tests
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"), row_group_size=512)
    pq.write_table(truth, os.path.join(out_dir, "truth.parquet"), row_group_size=8192)
    return out_dir
