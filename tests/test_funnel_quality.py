"""Funnel stages and constraint report vs in-process ground truth."""

import numpy as np
import pandas as pd

import ray.data as rd

from gencore_ray.ops.funnel import funnel_stages
from gencore_ray.ops.quality import constraint_report


def _events():
    rows = [
        # u1: full funnel in order
        (1, "2024-01-01 00:00", "view"), (1, "2024-01-01 01:00", "click"),
        (1, "2024-01-01 02:00", "purchase"),
        # u2: purchase BEFORE click — stops at stage 2
        (2, "2024-01-01 00:00", "view"), (2, "2024-01-01 03:00", "click"),
        (2, "2024-01-01 01:00", "purchase"),
        # u3: click before view — the later click (after view) counts
        (3, "2024-01-01 01:00", "click"), (3, "2024-01-01 02:00", "view"),
        (3, "2024-01-01 03:00", "click"), (3, "2024-01-01 04:00", "purchase"),
        # u4: view only
        (4, "2024-01-01 00:00", "view"),
        # u5: never viewed — absent from output
        (5, "2024-01-01 00:00", "click"), (5, "2024-01-01 01:00", "purchase"),
        # u6: click at the SAME instant as view (>= boundary)
        (6, "2024-01-01 00:00", "view"), (6, "2024-01-01 00:00", "click"),
    ]
    return pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
        "event_type": [r[2] for r in rows],
    })


def test_funnel_stages_semantics(ray_session):
    got = (
        funnel_stages(rd.from_pandas(_events()),
                      ["view", "click", "purchase"], num_parts=3)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 2, 3, 4, 6]
    assert got["stage_reached"].tolist() == [3, 2, 3, 1, 2]
    t = pd.Timestamp
    assert got.loc[0, "stage_3_ts"] == t("2024-01-01 02:00")
    # u2's purchase predates the click: no stage 3
    assert pd.isna(got.loc[1, "stage_3_ts"])
    # u3: the pre-view click is ignored; the 03:00 click gates the funnel
    assert got.loc[2, "stage_2_ts"] == t("2024-01-01 03:00")
    assert got.loc[2, "stage_3_ts"] == t("2024-01-01 04:00")
    # u6: same-instant events satisfy >=
    assert got.loc[4, "stage_2_ts"] == t("2024-01-01 00:00")


def test_constraint_report_counts(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 2, 3, 4, 4],            # 2 duplicate rows
        "v": [0.5, -1.0, 3.0, 10.0, np.nan, 2.0],
        "cat": ["a", "b", "zz", "a", None, "qq"],
        "fk": [10, 10, 20, 99, 10, 98],      # 99, 98 miss
    })
    got = (
        constraint_report(rd.from_pandas(df), [
            ("unique", ["id"]),
            ("not_null", "v"),
            ("accepted_values", "cat", ["a", "b"]),
            ("range", "v", 0.0, 5.0),
            ("foreign_key", "fk", np.array([10, 20])),
        ], num_parts=3)
        .to_pandas().set_index("check_name")
    )
    assert got.loc["unique(id)", "violations"] == 2
    assert got.loc["not_null(v)", "violations"] == 1
    assert got.loc["accepted_values(cat)", "violations"] == 2  # zz, qq; null skipped
    # range: -1.0 and 10.0 out of [0,5); NaN comparisons are False -> not counted
    assert got.loc["range(v,[0.0,5.0))", "violations"] == 2
    assert got.loc["foreign_key(fk)", "violations"] == 2
    assert (got["n_rows"] == 6).all()


def test_skew_join_equals_plain_join(ray_session):
    from gencore_ray.ops.skew import skew_join
    from gencore_ray.stages.shuffle import hash_join

    rng = np.random.RandomState(11)
    # key 7 is pathologically hot on the left; right side is dim-like
    keys = np.concatenate([rng.randint(0, 20, size=300),
                           np.full(500, 7, dtype=np.int64)])
    left = pd.DataFrame({"k": keys.astype(np.int64),
                         "x": np.arange(len(keys), dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 15, dtype=np.int64),
                          "name": [f"n{i}" for i in range(15)]})

    got = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                    "k", "rk", hot_threshold=100, num_parts=4).to_pandas()
    want = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     "k", "rk", num_parts=4).to_pandas()
    key_cols = ["k", "x", "name"]
    a = got[key_cols].sort_values(key_cols).reset_index(drop=True)
    b = want[key_cols].sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # the hot path actually engaged (key 7 exceeds the threshold)
    assert (left["k"] == 7).sum() > 100


def test_skew_join_no_hot_keys_delegates(ray_session):
    from gencore_ray.ops.skew import skew_join
    from gencore_ray.stages.shuffle import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]})
    right = pd.DataFrame({"rk": [2, 3, 4], "name": ["b", "c", "d"]})
    got = skew_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
                    hot_threshold=100, num_parts=2).to_pandas()
    want = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
                     num_parts=2).to_pandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))


def test_token_js_divergence_properties(ray_session):
    from gencore_ray.ops.drift import token_js_divergence

    docs = pd.DataFrame({
        "doc_id": range(6),
        "source": ["a", "a", "b", "b", "c", "c"],
        # a and b share a dialect; c is disjoint vocabulary
        "text": ["cats chase mice in barns", "mice hide from cats in barns",
                 "cats chase mice around barns", "mice flee cats near barns",
                 "quantum flux capacitors resonate", "flux resonates in capacitors"],
    })
    got = (token_js_divergence(rd.from_pandas(docs), top_vocab=100,
                               num_parts=2)
           .to_pandas().set_index(["group_a", "group_b"]))
    ab = got.loc[("a", "b"), "js_divergence"]
    ac = got.loc[("a", "c"), "js_divergence"]
    bc = got.loc[("b", "c"), "js_divergence"]
    assert 0.0 <= ab < ac <= np.log(2) + 1e-9
    assert 0.0 <= ab < bc <= np.log(2) + 1e-9
    assert len(got) == 3  # one row per unordered pair


def test_mad_outliers_flags_planted_extremes(ray_session):
    from gencore_ray.ops.relational import mad_outliers

    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.normal(100, 5, size=200),
                           [500.0, -300.0]])       # planted extremes
    df = pd.DataFrame({"doc_id": np.arange(len(vals)),
                       "lang": ["en"] * len(vals), "v": vals})
    # a degenerate group: >50% identical values -> MAD 0 -> never flagged
    dg = pd.DataFrame({"doc_id": np.arange(1000, 1006),
                       "lang": ["de"] * 6,
                       "v": [7.0, 7.0, 7.0, 7.0, 7.0, 9999.0]})
    got = (mad_outliers(rd.from_pandas(pd.concat([df, dg])), "lang", "v",
                        z=3.5, num_parts=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    en = got[got["lang"] == "en"]
    assert bool(en.loc[en["doc_id"] == 200, "is_outlier"].iloc[0])
    assert bool(en.loc[en["doc_id"] == 201, "is_outlier"].iloc[0])
    assert en["is_outlier"].sum() <= 6          # robust: bulk not flagged
    de = got[got["lang"] == "de"]
    assert (~de["is_outlier"]).all() and de["mod_z"].isna().all()
    # median/MAD are per-group exact
    assert np.isclose(de["med"].iloc[0], 7.0) and np.isclose(de["mad"].iloc[0], 0.0)


def test_retention_cohorts_matches_pandas(ray_session):
    from gencore_ray.ops.windows import retention_cohorts

    rng = np.random.RandomState(13)
    n = 300
    ev = pd.DataFrame({
        "user_id": rng.randint(0, 25, size=n),
        "ts": pd.Timestamp("2024-06-01")
        + pd.to_timedelta(rng.randint(0, 86400 * 10, size=n), unit="s"),
    })
    got = (retention_cohorts(rd.from_pandas(ev), period="1d", num_parts=4)
           .to_pandas().sort_values(["cohort", "period_offset"])
           .reset_index(drop=True))
    d = ev.assign(day=ev["ts"].dt.floor("1d"))
    first = d.groupby("user_id")["day"].transform("min")
    act = d.assign(cohort=first,
                   period_offset=((d["day"] - first)
                                  / pd.Timedelta("1d")).astype(np.int64))
    act = act[["user_id", "cohort", "period_offset"]].drop_duplicates()
    want = (act.groupby(["cohort", "period_offset"]).size()
            .rename("n_active").reset_index()
            .sort_values(["cohort", "period_offset"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # offset 0 row per cohort == cohort sizes (everyone is active on day 0)
    day0 = got[got["period_offset"] == 0].set_index("cohort")["n_active"]
    sizes = act[act["period_offset"] == 0].groupby("cohort").size()
    assert (day0 == sizes).all()


def test_token_entropy_known_values(ray_session):
    from gencore_ray.ops.textstats import token_entropy

    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                         "text": ["a a b", "", "x y z w", "t t t t"]})
    got = (token_entropy(rd.from_pandas(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want0 = -(2 / 3 * np.log(2 / 3) + 1 / 3 * np.log(1 / 3))
    assert np.isclose(got.loc[0, "entropy"], round(want0, 6))
    assert got.loc[0, "n_tokens"] == 3
    assert np.isclose(got.loc[0, "type_token_ratio"], round(2 / 3, 6))
    assert got.loc[1, "entropy"] == 0.0 and got.loc[1, "n_tokens"] == 0
    assert np.isclose(got.loc[2, "entropy"], round(np.log(4), 6))  # uniform
    assert got.loc[3, "entropy"] == 0.0                            # constant
    assert np.isclose(got.loc[3, "type_token_ratio"], 0.25)


def test_top_session_paths_matches_pandas(ray_session):
    from gencore_ray.ops.funnel import top_session_paths

    rng = np.random.RandomState(17)
    n = 400
    ev = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.randint(0, 12, size=n),
        "ts": pd.Timestamp("2024-07-01")
        + pd.to_timedelta(rng.randint(0, 86400, size=n), unit="s"),
        "event_type": rng.choice(["a", "b", "c"], size=n),
    })
    gap = pd.Timedelta(minutes=30)
    got = (top_session_paths(rd.from_pandas(ev), gap=gap, max_len=3, k=10,
                             num_parts=4).to_pandas())
    d = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    prev = d.groupby("user_id")["ts"].shift()
    brk = (prev.isna() | ((d["ts"] - prev) > gap)).astype(np.int64)
    d = d.assign(sid=brk.groupby(d["user_id"]).cumsum())
    d = d.assign(pos=d.groupby(["user_id", "sid"]).cumcount())
    p = (d[d["pos"] < 3].groupby(["user_id", "sid"])["event_type"]
         .agg("->".join).rename("path").reset_index())
    want = (p.groupby("path").size().rename("n_sessions").reset_index()
            .sort_values(["n_sessions", "path"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["path", "n_sessions"]],
        want[["path", "n_sessions"]], check_dtype=False)


def test_fill_period_gaps_dense_series(ray_session):
    from gencore_ray.ops.windows import fill_period_gaps

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 05:00", "2024-01-01 09:00",
                              "2024-01-04 12:00", "2024-02-10 00:00"]),
        "value": [10.0, 5.0, 2.0, 7.0],
    })
    got = (fill_period_gaps(rd.from_pandas(ev), period="1d", num_parts=2)
           .to_pandas().sort_values(["user_id", "period_start"])
           .reset_index(drop=True))
    u1 = got[got["user_id"] == 1]
    # Jan 1..4 inclusive: 4 rows, gaps Jan 2-3 explicit zeros
    assert len(u1) == 4
    assert u1["n_events"].tolist() == [2, 0, 0, 1]
    assert u1["total_value"].tolist() == [15.0, 0.0, 0.0, 2.0]
    u2 = got[got["user_id"] == 2]
    assert len(u2) == 1 and u2["n_events"].iloc[0] == 1
    # span is PER KEY: u2's single day doesn't inherit u1's range
    assert u2["period_start"].iloc[0] == pd.Timestamp("2024-02-10")


def test_morton_key_properties(ray_session):
    from gencore_ray.ops.zorder import morton_key, zorder_keys

    # interleave correctness on known values
    assert morton_key(np.array([0]), np.array([0]))[0] == 0
    assert morton_key(np.array([1]), np.array([0]))[0] == 1   # a -> even bits
    assert morton_key(np.array([0]), np.array([1]))[0] == 2   # b -> odd bits
    assert morton_key(np.array([3]), np.array([3]))[0] == 15  # 0b1111
    # bijectivity over a grid: 32x32 distinct pairs -> distinct keys
    a, b = np.meshgrid(np.arange(32), np.arange(32))
    keys = morton_key(a.ravel(), b.ravel())
    assert len(np.unique(keys)) == 32 * 32
    # locality: nearby cells share high bits more than far cells
    k00 = morton_key(np.array([5]), np.array([5]))[0]
    k01 = morton_key(np.array([5]), np.array([6]))[0]
    kff = morton_key(np.array([500]), np.array([900]))[0]
    assert abs(k01 - k00) < abs(kff - k00)
    # dataset op adds the column and rejects negatives
    df = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    out = zorder_keys(rd.from_pandas(df), "a", "b").to_pandas()
    assert (out["zkey"] == morton_key(df["a"].to_numpy(),
                                      df["b"].to_numpy())).all()
    import pytest as _pytest
    with _pytest.raises(Exception):
        zorder_keys(rd.from_pandas(pd.DataFrame({"a": [-1], "b": [0]})),
                    "a", "b").to_pandas()


def test_chi_square_independence_known_values(ray_session):
    from gencore_ray.ops.relational import chi_square_independence

    # perfectly independent 2x2: chi2 == 0
    ind = pd.DataFrame({"a": ["x"] * 40 + ["y"] * 40,
                        "b": (["p"] * 20 + ["q"] * 20) * 2})
    got = chi_square_independence(rd.from_pandas(ind), "a", "b").to_pandas()
    assert got["chi2"].iloc[0] == 0.0 and got["dof"].iloc[0] == 1
    assert got["n_rows"].iloc[0] == 80

    # hand-computed dependent table: [[30, 10], [10, 30]]
    dep = pd.DataFrame({
        "a": ["x"] * 40 + ["y"] * 40,
        "b": ["p"] * 30 + ["q"] * 10 + ["p"] * 10 + ["q"] * 30,
    })
    got = chi_square_independence(rd.from_pandas(dep), "a", "b").to_pandas()
    o = np.array([[30.0, 10.0], [10.0, 30.0]])
    e = np.outer(o.sum(1), o.sum(0)) / o.sum()
    want = ((o - e) ** 2 / e).sum()
    assert np.isclose(got["chi2"].iloc[0], round(want, 6))

    # absent cells count as observed zero (y never sees q)
    sparse = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"]})
    got = chi_square_independence(rd.from_pandas(sparse), "a", "b").to_pandas()
    o = np.array([[1.0, 1.0], [1.0, 0.0]])
    e = np.outer(o.sum(1), o.sum(0)) / o.sum()
    want = ((o - e) ** 2 / e).sum()
    assert np.isclose(got["chi2"].iloc[0], round(want, 6))


def test_grouped_linear_trend_recovers_planted_lines(ray_session):
    from gencore_ray.ops.relational import grouped_linear_trend

    rng = np.random.RandomState(21)
    frames = []
    truth = {1: (2.5, 10.0), 2: (-1.0, 100.0), 3: (0.0, 7.0)}
    for k, (m, b) in truth.items():
        x = rng.rand(60) * 50
        frames.append(pd.DataFrame({"k": k, "x": x, "y": m * x + b}))
    # a 1-point group and a zero-variance-x group: both dropped
    frames.append(pd.DataFrame({"k": [4], "x": [1.0], "y": [5.0]}))
    frames.append(pd.DataFrame({"k": [5] * 4, "x": [2.0] * 4,
                                "y": [1.0, 2.0, 3.0, 4.0]}))
    df = pd.concat(frames, ignore_index=True)
    got = (grouped_linear_trend(rd.from_pandas(df), "k", "x", "y",
                                num_parts=3, min_points=2)
           .to_pandas().set_index("k"))
    assert set(got.index) == {1, 2, 3}
    for k, (m, b) in truth.items():
        assert np.isclose(got.loc[k, "slope"], m, atol=1e-5)
        assert np.isclose(got.loc[k, "intercept"], b, atol=1e-4)
        assert got.loc[k, "n"] == 60


def test_compression_ratio_signal(ray_session):
    import zlib

    from gencore_ray.ops.textstats import compression_ratio

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["spam " * 400,                       # hyper-repetitive
                 "".join(chr(c) for c in
                         np.random.RandomState(0).randint(33, 123, 2000)),
                 ""],
    })
    got = (compression_ratio(rd.from_pandas(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(docs["text"]):
        b = t.encode()
        want = round(len(zlib.compress(b, 6)) / len(b), 6) if b else 1.0
        assert np.isclose(got.loc[i, "zlib_ratio"], want)
        assert got.loc[i, "raw_bytes"] == len(b)
    # repetitive text compresses far better than high-entropy text
    assert got.loc[0, "zlib_ratio"] < 0.05 < 0.5 < got.loc[1, "zlib_ratio"]


def test_watermark_lateness_matches_sequential(ray_session):
    from gencore_ray.ops.windows import watermark_lateness

    rng = np.random.RandomState(41)
    n = 300
    # event-time with out-of-order arrivals: arrival order is event_id
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-09-01")
        + pd.to_timedelta(np.arange(n) * 60
                          + rng.randint(-1200, 1200, size=n), unit="s"),
    })
    delay = pd.Timedelta(minutes=10)
    got = (watermark_lateness(rd.from_pandas(ev), delay=delay, num_parts=5)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(got) == n
    run = None
    n_late = 0
    for i in range(n):
        if run is None:
            assert pd.isna(got.loc[i, "watermark"])
            assert not got.loc[i, "is_late"]
        else:
            wm = run - delay
            assert got.loc[i, "watermark"] == wm
            assert bool(got.loc[i, "is_late"]) == bool(ev.loc[i, "ts"] < wm)
            n_late += int(ev.loc[i, "ts"] < wm)
        t = ev.loc[i, "ts"]
        run = t if run is None or t > run else run
    assert n_late > 0   # the jitter actually produces late events
