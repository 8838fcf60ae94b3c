"""Suffix-array (prefix-doubling) substring pass.

The SA path must agree with two independent references: a pure-Python
all-pairs gram computation, and the production gram-hash operator
(``duplicate_span_stats``) — algorithmic cross-check, both also share
one SQL oracle in the registry.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

DOCS = {
    0: " ".join(f"w{i}" for i in range(20)),               # shares w5..w12
    1: "x y z " + " ".join(f"w{i}" for i in range(5, 13)) + " q r s t",
    2: "unique words only here nothing shared at all ok",   # clean
    3: "short",                                             # < L tokens
    4: "rep rep rep rep rep rep rep rep rep",               # within-doc only
    5: "",                                                  # empty
}


def _ds():
    return rd.from_items([{"doc_id": k, "text": v} for k, v in DOCS.items()])


def _brute(L: int) -> dict[int, tuple[int, int]]:
    """(n_windows, cross-doc dup_windows) per doc, all-pairs Python."""
    from gencore_ray.functions.text import _TOKEN_RE

    grams = {d: [tuple(_TOKEN_RE.findall(t.lower())[i:i + L])
                 for i in range(len(_TOKEN_RE.findall(t.lower())) - L + 1)]
             for d, t in DOCS.items()}
    owners: dict[tuple, set] = {}
    for d, gs in grams.items():
        for g in set(gs):
            owners.setdefault(g, set()).add(d)
    return {d: (len(gs), sum(1 for g in gs if len(owners[g]) >= 2))
            for d, gs in grams.items()}


@pytest.mark.parametrize("L", [2, 4, 8])
def test_suffix_spans_match_brute_force(ray_session, L):
    from gencore_ray.ops.suffix import suffix_array_spans

    got = (suffix_array_spans(_ds(), span_tokens=L, num_parts=4)
           .to_pandas().set_index("doc_id").sort_index())
    exp = _brute(L)
    assert set(got.index) == set(DOCS)
    for d, (nw, dw) in exp.items():
        assert got.loc[d, "n_windows"] == nw, (d, L)
        assert got.loc[d, "dup_windows"] == dw, (d, L)
        assert abs(got.loc[d, "dup_span_frac"]
                   - round(dw / max(nw, 1), 6)) < 1e-9, (d, L)


def test_suffix_spans_equal_gram_path(ray_session):
    """Same corpus, two algorithms (suffix grouping vs window hashing),
    identical output tables."""
    from gencore_ray.ops.substrings import duplicate_span_stats
    from gencore_ray.ops.suffix import suffix_array_spans

    a = (suffix_array_spans(_ds(), span_tokens=4, num_parts=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (duplicate_span_stats(_ds(), span_tokens=4, num_parts=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[b.columns], b, check_dtype=False)


def test_dup_positions_levels(ray_session):
    """duplev is the largest power-of-two shared-prefix length: doc 0
    and doc 1 share exactly the 8-token run w5..w12, so inside doc 0
    only position 5 hosts an 8-token match; 6..9 still fit 4-token
    matches within the run, 10..11 2-token ones, and 12+ nothing."""
    from gencore_ray.ops.suffix import suffix_dup_positions

    got = (suffix_dup_positions(_ds(), depth=8, num_parts=4)
           .to_pandas())
    d0 = got[got["doc_id"] == 0].set_index("p")["dup_len"].to_dict()
    assert d0.get(5) == 8, d0
    for p in range(6, 10):
        assert d0.get(p) == 4, (p, d0)
    for p in (10, 11):
        assert d0.get(p) == 2, (p, d0)
    assert all(p <= 11 for p in d0), d0
    # the clean doc never appears
    assert not (got["doc_id"] == 2).any()
    # within-doc-only repeats never appear (cross-doc contract)
    assert not (got["doc_id"] == 4).any()


def test_depth_validation(ray_session):
    from gencore_ray.ops.suffix import suffix_array_spans

    with pytest.raises(ValueError, match="power of two"):
        suffix_array_spans(_ds(), span_tokens=6, num_parts=2)


def test_negative_ids_rejected(ray_session):
    from gencore_ray.ops.suffix import suffix_array_spans

    bad = rd.from_items([{"doc_id": -1, "text": "a b c d e"}])
    with pytest.raises(Exception, match="non-negative"):
        suffix_array_spans(bad, span_tokens=2, num_parts=2).to_pandas()


def test_suffix_spans_planted_scale(ray_session):
    """120-doc corpus with a planted 12-token banner in every third
    doc: banner windows must be flagged in every carrier, nothing in
    the rest (no hash path exists to produce false positives)."""
    from gencore_ray.ops.suffix import suffix_array_spans

    banner = " ".join(f"b{i}" for i in range(12))
    rows = []
    for d in range(120):
        body = " ".join(f"d{d}x{i}" for i in range(30))
        text = body + " " + banner if d % 3 == 0 else body
        rows.append({"doc_id": d, "text": text})
    got = (suffix_array_spans(rd.from_items(rows), span_tokens=8,
                              num_parts=4)
           .to_pandas().set_index("doc_id"))
    for d in range(120):
        exp = 5 if d % 3 == 0 else 0   # 12-token banner -> 5 8-windows
        assert got.loc[d, "dup_windows"] == exp, d
