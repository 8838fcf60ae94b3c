"""As-of join, RANGE sliding window, interval-overlap join vs brute force."""

import numpy as np
import pandas as pd

import ray.data as rd

from gencore_ray.ops.asof import asof_join
from gencore_ray.ops.intervals import interval_overlap_join
from gencore_ray.ops.windows import sliding_range_agg


def _rand_events(seed, n, n_keys=7, span_s=86400):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "event_id": np.arange(n),
        "k": rng.randint(0, n_keys, size=n),
        "ts": pd.Timestamp("2024-05-01")
        + pd.to_timedelta(rng.randint(0, span_s, size=n), unit="s"),
        "value": rng.rand(n) * 50,
    })


def test_asof_join_matches_bruteforce(ray_session):
    left = _rand_events(1, 120)[["event_id", "k", "ts"]]
    right = _rand_events(2, 90).rename(columns={"value": "rv"})[["k", "ts", "rv"]]
    right = right.groupby(["k", "ts"], as_index=False)["rv"].max()  # unique (k, ts)
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="k", ts_col="ts", num_parts=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(left)
    for _, row in got.iterrows():
        cand = right[(right["k"] == row["k"]) & (right["ts"] <= row["ts"])]
        if len(cand):
            best = cand.loc[cand["ts"].idxmax()]
            assert row["rv"] == best["rv"] and row["ts_right"] == best["ts"]
        else:
            assert pd.isna(row["rv"]) and pd.isna(row["ts_right"])


def test_asof_join_forward_and_tolerance(ray_session):
    left = pd.DataFrame({"k": [1, 1, 2], "ts": pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 05:00", "2024-01-01 00:00"])})
    right = pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime(
        ["2024-01-01 01:00", "2024-01-01 09:00"]), "rv": [10.0, 20.0]})
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), key="k",
                  ts_col="ts", direction="forward",
                  tolerance=pd.Timedelta(hours=2), num_parts=2)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    # k=1 @00:00 -> 01:00 within 2h; @05:00 -> 09:00 is beyond tolerance
    assert got.loc[0, "rv"] == 10.0
    assert pd.isna(got.loc[1, "rv"]) and pd.isna(got.loc[2, "rv"])


def test_sliding_range_agg_matches_bruteforce(ray_session):
    ev = _rand_events(3, 200, span_s=6 * 3600).rename(columns={"k": "user_id"})
    w = pd.Timedelta(hours=1)
    got = (
        sliding_range_agg(rd.from_pandas(ev), range_width=w, num_parts=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    v = np.floor(ev["value"].to_numpy()).astype(np.int64)
    for _, row in got.iterrows():
        mask = (
            (ev["user_id"] == row["user_id"])
            & (ev["ts"] >= row["ts"] - w) & (ev["ts"] <= row["ts"])
        )
        assert row["win_n"] == int(mask.sum())
        assert row["win_vsum"] == int(v[mask.to_numpy()].sum())
    assert np.allclose(got["win_avg"], got["win_vsum"] / got["win_n"])


def _brute_pairs(a, b=None):
    self_mode = b is None
    b = a if self_mode else b
    out = set()
    for _, x in a.iterrows():
        for _, y in b.iterrows():
            if self_mode and not x["iv_id"] < y["iv_id"]:
                continue
            if x["lo"] <= y["hi"] and y["lo"] <= x["hi"]:
                out.add((x["iv_id"], y["iv_id"]))
    return out


def _rand_intervals(seed, n, id0=0):
    rng = np.random.RandomState(seed)
    lo = rng.randint(0, 10_000, size=n).astype(np.int64)
    return pd.DataFrame({
        "iv_id": np.arange(id0, id0 + n, dtype=np.int64),
        "lo": lo,
        "hi": lo + rng.randint(0, 3_000, size=n).astype(np.int64),
    })


def test_interval_overlap_self_join_exactly_once(ray_session):
    iv = _rand_intervals(4, 80)
    # bin_width far smaller than spans: every pair co-lives in MANY bins,
    # so the ownership rule is what keeps each pair single
    got = interval_overlap_join(rd.from_pandas(iv), None, bin_width=100,
                                num_parts=4).to_pandas()
    pairs = list(zip(got["id_a"], got["id_b"]))
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    assert set(pairs) == _brute_pairs(iv)


def test_interval_overlap_two_sided(ray_session):
    a = _rand_intervals(5, 40)
    b = _rand_intervals(6, 50, id0=1000)
    got = interval_overlap_join(rd.from_pandas(a), rd.from_pandas(b),
                                bin_width=500, num_parts=4).to_pandas()
    pairs = list(zip(got["id_a"], got["id_b"]))
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _brute_pairs(a, b)


def test_interval_overlap_empty_and_touching(ray_session):
    a = pd.DataFrame({"iv_id": [1, 2], "lo": [0, 10], "hi": [10, 20]})
    got = interval_overlap_join(rd.from_pandas(a), None, bin_width=7,
                                num_parts=2).to_pandas()
    # closed intervals: touching at a single point overlaps
    assert set(zip(got["id_a"], got["id_b"])) == {(1, 2)}


def test_knn_graph_matches_bruteforce(ray_session):
    from gencore_ray.ops.ann import knn_graph

    rng = np.random.RandomState(9)
    n, d, k = 120, 16, 4
    vecs = rng.randn(n, d)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(vecs.astype(np.float32))})
    got = (
        knn_graph(rd.from_pandas(df), k=k, num_blocks=5, num_parts=4)
        .to_pandas().sort_values(["vec_id", "rank"]).reset_index(drop=True)
    )
    m = vecs.astype(np.float32).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 6)
    np.fill_diagonal(cos, -np.inf)
    assert len(got) == n * k
    for i in range(n):
        order = np.lexsort((np.arange(n), -cos[i]))[:k]
        sub = got[got["vec_id"] == i]
        assert sub["nbr_id"].tolist() == order.tolist()
        assert np.allclose(sub["cos_sim"].to_numpy(), cos[i][order])
        assert sub["rank"].tolist() == list(range(1, k + 1))


def test_new_ops_partition_invariance(ray_session):
    """Results must not depend on num_parts — THE distributed-
    correctness property for every exchange-based op."""
    from gencore_ray.ops.asof import asof_join
    from gencore_ray.ops.funnel import funnel_stages
    from gencore_ray.ops.setjoin import set_similarity_join
    from gencore_ray.ops.windows import sliding_range_agg

    ev = _rand_events(31, 150).rename(columns={"k": "user_id"})
    ev["event_type"] = np.random.RandomState(32).choice(
        ["view", "click", "purchase"], size=len(ev))

    def norm(df, cols):
        return (df[cols].sort_values(cols, kind="mergesort")
                .reset_index(drop=True))

    # sliding RANGE window
    a = sliding_range_agg(rd.from_pandas(ev), num_parts=1).to_pandas()
    b = sliding_range_agg(rd.from_pandas(ev), num_parts=7).to_pandas()
    cols = ["event_id", "win_n", "win_vsum"]
    pd.testing.assert_frame_equal(norm(a, cols), norm(b, cols))

    # funnel
    a = funnel_stages(rd.from_pandas(ev), ["view", "click", "purchase"],
                      num_parts=1).to_pandas()
    b = funnel_stages(rd.from_pandas(ev), ["view", "click", "purchase"],
                      num_parts=6).to_pandas()
    cols = ["user_id", "stage_reached"]
    pd.testing.assert_frame_equal(norm(a, cols), norm(b, cols))

    # as-of join
    right = (ev[["user_id", "ts", "value"]]
             .groupby(["user_id", "ts"], as_index=False)["value"].max()
             .rename(columns={"value": "rv"}))
    left = ev[["event_id", "user_id", "ts"]]
    a = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="user_id", ts_col="ts", num_parts=1).to_pandas()
    b = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="user_id", ts_col="ts", num_parts=5).to_pandas()
    cols = ["event_id", "rv"]
    pd.testing.assert_frame_equal(norm(a, cols), norm(b, cols))

    # exact set-similarity join
    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": [" ".join(f"tok{(i * 7 + j) % 30}" for j in range(12))
                 for i in range(40)],
    })
    a = set_similarity_join(rd.from_pandas(docs), threshold=0.5,
                            num_parts=1).to_pandas()
    b = set_similarity_join(rd.from_pandas(docs), threshold=0.5,
                            num_parts=9).to_pandas()
    cols = ["doc_a", "doc_b", "jaccard"]
    pd.testing.assert_frame_equal(norm(a, cols), norm(b, cols))
    assert len(a) > 0          # the rotating-vocab docs do overlap
