"""Property-based tests (hypothesis) for the PURE kernels — no Ray.

Each property pins an invariant the distributed stages rely on:
min-label CC == union-find, partition-local pair generation == brute
force, the batch text features == their scalar definitions, and the
partition join == pandas merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from gencore_ray.config import DedupConfig
from gencore_ray.oracle import union_find_clusters
from gencore_ray.stages.cc import _min_label_cc
from gencore_ray.stages.lsh import _pairs_in_partition
from gencore_ray.stages.verify import _join_part
from gencore_ray.functions.text import TextFeatures, quality_score, tokenize

CFG = DedupConfig()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(2, 40),
    edges=st.lists(st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=80),
)
def test_min_label_cc_equals_union_find(n, edges):
    edges = [(a % n, b % n) for a, b in edges if a % n != b % n]
    ids = [f"n{i:02d}" for i in range(n)]
    want = union_find_clusters(ids, [(ids[a], ids[b], 1.0) for a, b in edges])
    if edges:
        u = np.array([a for a, _ in edges], dtype=np.int64)
        v = np.array([b for _, b in edges], dtype=np.int64)
    else:
        u = v = np.empty(0, dtype=np.int64)
    parent = _min_label_cc(u, v, n)
    got = {ids[i]: ids[parent[i]] for i in range(n)}
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    buckets=st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 8)), min_size=1, max_size=12
    )
)
def test_pairs_in_partition_equals_brute_force(buckets):
    """Small buckets (all under pair_cap): emitted pair set must equal
    the brute-force all-pairs set per bucket, globally deduped."""
    rng = np.random.RandomState(7)
    rows = []
    bucket_members: dict[int, set[int]] = {}
    for bk, size in buckets:
        members = rng.choice(1000, size=size, replace=False) + 1  # avoid uhash 0
        bucket_members.setdefault(bk, set()).update(int(m) for m in members)
        for m in members:
            rows.append((np.uint64(bk * 7919 + 13), np.uint64(m), np.uint64(m % 17)))
    df = pd.DataFrame(
        {"bkey": [r[0] for r in rows], "uh": [r[1] for r in rows],
         "sort32": [np.uint32(r[2]) for r in rows]}
    )
    out = _pairs_in_partition(df, CFG)
    got = {(int(a), int(b)) for a, b in zip(out["ha"], out["hb"]) if a != 0 or b != 0}
    want = set()
    for members in bucket_members.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                want.add((ms[i], ms[j]))
    assert got == want


def test_hard_cap_subsamples_and_counts():
    """Buckets beyond bucket_hard_cap are deterministically subsampled,
    the drop is COUNTED in a sentinel row (never silent), and pair
    volume stays bounded at cap * neighbor_links."""
    from dataclasses import replace

    cfg = replace(CFG, bucket_pair_cap=8, bucket_neighbor_links=3,
                  bucket_hard_cap=50)
    rng = np.random.RandomState(1)
    n = 200
    df = pd.DataFrame({
        "bkey": np.full(n, np.uint64(123456789)),
        "uh": rng.choice(10_000, size=n, replace=False).astype(np.uint64) + 1,
        "sort32": rng.randint(0, 2 ** 31, size=n).astype(np.uint32),
    })
    out = _pairs_in_partition(df, cfg)
    sentinel = out[out["capped"] > 0]
    assert sentinel["capped"].sum() == n - cfg.bucket_hard_cap
    real = out[out["capped"] == 0]
    assert 0 < len(real) <= cfg.bucket_hard_cap * cfg.bucket_neighbor_links
    # deterministic: same input -> same pairs
    out2 = _pairs_in_partition(df, cfg)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out2.reset_index(drop=True)
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
), max_size=8))
def test_text_features_match_scalar_definitions(texts):
    feats = TextFeatures(texts)
    for i, t in enumerate(texts):
        assert feats.token_count[i] == len(tokenize(t))
        assert feats.text_len[i] == len(t)
        assert feats.quality[i] == quality_score(t)
        assert feats.tok_lists[i] == tokenize(t)


@settings(max_examples=40, deadline=None)
@given(
    lk=st.lists(st.integers(0, 6), min_size=0, max_size=20),
    rk=st.lists(st.integers(0, 6), min_size=0, max_size=20),
)
def test_join_part_equals_pandas_merge(lk, rk):
    left = pa.table({
        "k": pa.array(np.array(lk, dtype=np.uint64)),
        "lv": pa.array(np.arange(len(lk))),
    })
    right = pa.table({
        "rk": pa.array(np.array(rk, dtype=np.uint64)),
        "pay": pa.array(np.arange(len(rk)) * 10),
    })
    got = _join_part(left, right, "k", "rk", {"pay": "pay_r"}).to_pandas()
    want = (
        pd.DataFrame({"k": lk, "lv": np.arange(len(lk))})
        .merge(pd.DataFrame({"k": rk, "pay_r": np.arange(len(rk)) * 10}), on="k")
    )
    key = ["k", "lv", "pay_r"]
    assert sorted(map(tuple, got[key].to_numpy().tolist())) == \
        sorted(map(tuple, want[key].to_numpy().tolist()))


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="ab x\n", max_size=50),
                   min_size=1, max_size=8)
)
def test_repetition_signals_match_scalar(texts):
    """The factorized batch kernel behind repetition_profile and
    corpus_filter equals the per-doc scalar definitions on arbitrary
    line/token layouts (empty docs, all-dup lines, 1-token docs)."""
    from collections import Counter

    from gencore_ray.ops.textstats import _repetition_signals

    lens, dup, top, feats = _repetition_signals(texts)
    for i, t in enumerate(texts):
        lines = t.split("\n")
        assert lens[i] == len(lines)
        want_dup = round((len(lines) - len(set(lines))) / len(lines), 6)
        assert abs(dup[i] - want_dup) < 1e-9
        toks = tokenize(t)
        grams = Counter(zip(toks, toks[1:]))
        want_top = (round(max(grams.values()) / sum(grams.values()), 6)
                    if grams else 0.0)
        assert abs(top[i] - want_top) < 1e-9
        assert feats.token_count[i] == len(toks)


@settings(max_examples=50, deadline=None)
@given(
    lens=st.lists(st.integers(0, 12), min_size=1, max_size=6),
    L=st.integers(2, 5),
)
def test_gram_window_coords_invariants(lens, L):
    """Shared window-hash core: window count per doc == max(len-L+1, 0),
    positions in range, hashes equal for equal windows."""
    rng = np.random.RandomState(5)
    tok_hashes = [rng.randint(1, 2**32, size=n).astype(np.uint64)
                  for n in lens]
    from gencore_ray.ops.substrings import _gram_window_coords

    coords = _gram_window_coords(tok_hashes, L)
    want_counts = [max(n - L + 1, 0) for n in lens]
    if sum(want_counts) == 0:
        assert coords is None
        return
    doc_idx, wh, pos = coords
    assert len(doc_idx) == sum(want_counts)
    got_counts = np.bincount(doc_idx, minlength=len(lens))
    assert got_counts.tolist() == want_counts
    for d, p in zip(doc_idx, pos):
        assert 0 <= p <= lens[d] - L
    # identical windows hash identically: duplicate doc 0's stream
    if want_counts[0]:
        coords2 = _gram_window_coords([tok_hashes[0], tok_hashes[0]], L)
        d2, h2, p2 = coords2
        a = h2[d2 == 0]
        b = h2[d2 == 1]
        assert (a == b).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 30),
    seed=st.integers(0, 10_000),
    bin_w=st.integers(1, 500),
)
def test_interval_ownership_rule_is_exactly_once(n, seed, bin_w):
    """The max-lo-bin ownership lemma behind interval_overlap_join:
    for ANY bin width, every overlapping pair has exactly one owner
    bin, and that bin is touched by BOTH intervals."""
    rng = np.random.RandomState(seed)
    lo = rng.randint(0, 1000, size=n).astype(np.int64)
    hi = lo + rng.randint(0, 400, size=n).astype(np.int64)
    for i in range(n):
        for j in range(i + 1, n):
            if not (lo[i] <= hi[j] and lo[j] <= hi[i]):
                continue
            owner = max(lo[i], lo[j]) // bin_w
            # owner bin lies within both intervals' bin ranges
            assert lo[i] // bin_w <= owner <= hi[i] // bin_w
            assert lo[j] // bin_w <= owner <= hi[j] // bin_w
            # and it is unique by construction (a single integer)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(0, 60),
    n_keys=st.integers(1, 5),
    span=st.integers(1, 5_000),
    width=st.integers(0, 2_000),
    seed=st.integers(0, 10_000),
)
def test_range_frame_bounds_equal_bruteforce(n, n_keys, span, width, seed):
    """The offset-encoded searchsorted kernel of sliding_range_agg ==
    per-row brute force, including duplicate timestamps (peers) and
    the [t - w, t] closed boundary."""
    from gencore_ray.ops.windows import _range_frame_bounds

    rng = np.random.RandomState(seed)
    codes = np.sort(rng.randint(0, n_keys, size=n)).astype(np.int64)
    ts0 = np.concatenate([
        np.sort(rng.randint(0, span, size=int((codes == k).sum())))
        for k in range(n_keys)
    ]).astype(np.int64) if n else np.zeros(0, dtype=np.int64)
    lo, hi = _range_frame_bounds(codes, ts0, width)
    for i in range(n):
        in_frame = ((codes == codes[i]) & (ts0 >= ts0[i] - width)
                    & (ts0 <= ts0[i]))
        assert hi[i] - lo[i] == in_frame.sum()
        assert in_frame[lo[i]:hi[i]].all()
