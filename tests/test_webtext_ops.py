"""Unit vectors for the training-data hygiene operators:
decontamination (ops/decontam.py), URL canonicalisation
(ops/urltools.py), PII redaction (functions/redact.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from gencore_ray.functions.redact import redact_pii
from gencore_ray.ops.urltools import canonicalize_url


# --- URL canonicalisation (pure kernel, no ray) ----------------------

@pytest.mark.parametrize("raw,canon", [
    ("HTTP://WWW.Site-1.Example:80/a/5?id=5#top",
     "http://site-1.example/a/5?id=5"),
    ("https://Host.example:443/x/", "https://host.example/x"),
    ("http://h.example/a/5/?utm_source=feed&id=5",
     "http://h.example/a/5?id=5"),
    ("http://h.example/a?id=5&utm_campaign=x", "http://h.example/a?id=5"),
    ("http://h.example/a?utm_a=1&utm_b=2&id=3", "http://h.example/a?id=3"),
    ("http://h.example/a?utm_only=1", "http://h.example/a"),
    ("http://h.example:8080/a", "http://h.example:8080/a"),  # non-default port kept
    ("https://h.example:80/a", "https://h.example:80/a"),    # :80 not default for https
])
def test_canonicalize_url_vectors(raw, canon):
    assert canonicalize_url(raw) == canon


def test_canonicalize_idempotent():
    u = "HTTP://WWW.A.Example:80/p/?utm_x=1&id=2#f"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


# --- PII redaction (pure kernel) -------------------------------------

def test_redact_pii_vectors():
    texts = [
        "mail me at jo.doe+x@sub.example.org today",
        "server at 10.0.200.13 went down",
        "call +4915512345678 now",
        "nothing sensitive here 1.2 or a@b",   # not an email (no TLD), not an IP
    ]
    clean, flags = redact_pii(texts)
    assert clean[0] == "mail me at <EMAIL> today"
    assert clean[1] == "server at <IP> went down"
    assert clean[2] == "call <PHONE> now"
    assert clean[3] == texts[3]
    assert flags["email"].tolist() == [True, False, False, False]
    assert flags["ipv4"].tolist() == [False, True, False, False]
    assert flags["phone"].tolist() == [False, False, True, False]


def test_redact_flags_on_original_text():
    # the email contains an IP-shaped host: the ip flag reflects the
    # ORIGINAL text even though the email pattern rewrites it first
    clean, flags = redact_pii(["x 10.1.2.3 and a@b.co y"])
    assert flags["ipv4"][0] and flags["email"][0]
    assert clean[0] == "x <IP> and <EMAIL> y"


# --- decontamination (distributed) -----------------------------------

def test_contamination_check_planted(ray_session):
    from gencore_ray.ops.decontam import contamination_check

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            f"intro words then {shared} and a long unique tail here",
            "completely different content with no overlap at all today",
            "",
        ],
    }))
    bench = rd.from_arrow(pa.table({
        "doc_id": [100],
        "text": [f"benchmark question: {shared}"],
    }))
    out = contamination_check(docs, bench).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert (out["n_shared"] > 0).all()
    assert (out["n_shared"] <= out["n_shingles"]).all()

    # flagged_only=False annotates every doc
    full = contamination_check(docs, bench, flagged_only=False).to_pandas()
    assert sorted(full["doc_id"]) == [1, 2, 3]
    assert full.set_index("doc_id").loc[2, "n_shared"] == 0


def test_url_variant_dedup_collapses(ray_session):
    from gencore_ray.ops.urltools import url_variant_dedup

    urls = [
        "http://a.example/p?id=1",
        "HTTP://WWW.A.Example:80/p?id=1#frag",
        "http://a.example/p/?utm_source=x&id=1",
        "https://b.example/q",
    ]
    out = url_variant_dedup(
        rd.from_arrow(pa.table({"url": urls})), num_parts=2
    ).to_pandas().set_index("canonical_url")
    assert out.loc["http://a.example/p?id=1", "n_variants"] == 3
    assert out.loc["http://a.example/p?id=1", "first_url"] == (
        "HTTP://WWW.A.Example:80/p?id=1#frag"
    )
    assert out.loc["https://b.example/q", "n_variants"] == 1
