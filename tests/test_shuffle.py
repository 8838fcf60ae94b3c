"""grouped_map / hash_join / dedupe_rows against pandas ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gencore_ray.stages.shuffle import dedupe_rows, grouped_map, hash_join


@pytest.fixture
def kv(ray_session):
    rng = np.random.RandomState(7)
    return pd.DataFrame(
        {"k": rng.randint(0, 50, size=500), "v": rng.rand(500)}
    )


def test_grouped_map_sees_complete_groups(kv):
    ds = rd.from_pandas(kv)

    def per_part(df):
        # per-key sums; complete groups means these equal global sums
        return df.groupby("k", as_index=False)["v"].sum()

    got = (
        grouped_map(ds, "k", per_part, num_parts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = kv.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_grouped_map_string_keys(ray_session):
    df = pd.DataFrame({"k": ["a", "b", "a", "c", "b"], "v": [1, 2, 3, 4, 5]})
    got = (
        grouped_map(rd.from_pandas(df), "k", lambda d: d.groupby("k", as_index=False)["v"].max(), num_parts=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got.to_dict("list") == {"k": ["a", "b", "c"], "v": [3, 5, 4]}


def test_hash_join_inner_matches_pandas(ray_session):
    left = pd.DataFrame({"lk": ["a", "b", "c", "a"], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"rk": ["a", "b", "d"], "rv": [10, 20, 40]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "lk", "rk", num_parts=4)
        .to_pandas().sort_values(["lk", "lv"]).reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="lk", right_on="rk").drop(columns=["rk"])
        .sort_values(["lk", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_hash_join_left_outer(ray_session):
    left = pd.DataFrame({"lk": ["a", "x"], "lv": [1, 2]})
    right = pd.DataFrame({"rk": ["a"], "rv": [10]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "lk", "rk",
                  num_parts=4, how="left_outer")
        .to_pandas().sort_values("lk").reset_index(drop=True)
    )
    assert got["lk"].tolist() == ["a", "x"]
    assert got["rv"].tolist()[0] == 10
    assert pd.isna(got["rv"].tolist()[1])


def test_hash_join_binary_payload(ray_session):
    left = rd.from_arrow(pa.table({"lk": ["a", "b"], "n": [1, 2]}))
    right = rd.from_arrow(
        pa.table({"rk": ["a", "b"], "buf": pa.array([b"\x01\x02", b"\x03"], pa.binary())})
    )
    got = hash_join(left, right, "lk", "rk", num_parts=2).to_pandas()
    got = got.sort_values("lk").reset_index(drop=True)
    assert got["buf"].tolist() == [b"\x01\x02", b"\x03"]


def test_hash_join_overlap_rejected(ray_session):
    l = rd.from_items([{"k": "a", "v": 1}])
    r = rd.from_items([{"k2": "a", "v": 2}])
    with pytest.raises(ValueError, match="overlap"):
        hash_join(l, r, "k", "k2", num_parts=2)


def test_dedupe_rows(ray_session):
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": [1, 1, 2], "extra": [9, 9, 8]})
    got = dedupe_rows(rd.from_pandas(df), ["a", "b"], num_parts=4).to_pandas()
    assert len(got) == 2


def test_exchange_public_api_fallback(ray_session, monkeypatch):
    """Round-2 VERDICT #6: with the `ray.data._internal` fast-assembly
    probe forced OFF, every exchange/join must produce identical results
    through the public from_arrow_refs path."""
    import numpy as np

    import gencore_ray.stages.shuffle as sh
    from gencore_ray.stages.verify import verified_edges  # noqa: F401

    df = pd.DataFrame({
        "k": np.arange(200) % 17, "v": np.arange(200),
        "s": [f"s{i%5}" for i in range(200)],
    })

    def run():
        ex = sh.hash_exchange(rd.from_pandas(df), "k", 4).to_pandas()
        j = sh.hash_join(
            rd.from_pandas(df.rename(columns={"v": "lv"})[["k", "lv"]]),
            rd.from_pandas(pd.DataFrame({"rk": np.arange(17), "rv": np.arange(17) * 10})),
            "k", "rk", num_parts=4,
        ).to_pandas()
        return (
            ex.sort_values(["k", "v"]).reset_index(drop=True),
            j.sort_values(["k", "lv"]).reset_index(drop=True),
        )

    fast_ex, fast_j = run()
    monkeypatch.setattr(sh, "_INTERNAL_OK", False)
    assert sh._use_internal() is False
    slow_ex, slow_j = run()
    pd.testing.assert_frame_equal(fast_ex, slow_ex)
    pd.testing.assert_frame_equal(fast_j, slow_j)


def test_dedup_pipeline_survives_without_internal_api(ray_session, monkeypatch):
    """The flagship pipeline end to end on the public-API-only path."""
    import gencore_ray.stages.shuffle as sh
    from gencore_ray.config import DedupConfig
    from gencore_ray.corpus import generate_pages
    from gencore_ray.pipelines.dedup import dedup_pages

    tbl, _ = generate_pages(150, 42, with_truth=True)
    pages = rd.from_arrow(tbl.select(["url", "warc_ts", "text", "lang"]))
    fast = dedup_pages(pages, DedupConfig()).clusters.to_pandas()
    monkeypatch.setattr(sh, "_INTERNAL_OK", False)
    slow = dedup_pages(pages, DedupConfig()).clusters.to_pandas()
    key = ["url", "cluster_id", "cluster_size", "is_representative"]
    pd.testing.assert_frame_equal(
        fast[key].sort_values("url").reset_index(drop=True),
        slow[key].sort_values("url").reset_index(drop=True),
    )
