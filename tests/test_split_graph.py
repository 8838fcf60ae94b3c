"""Round-4 operators: deterministic hash split (ops/split.py), unicode
normalisation (functions/text.normalize_text_arrow), exact edit
distance (ops/editdist.py), and PageRank (ops/graph.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gencore_ray.functions.text import normalize_text_arrow
from gencore_ray.ops.editdist import levenshtein, pair_edit_distances
from gencore_ray.ops.graph import pagerank
from gencore_ray.ops.split import assign_split, hash_split, split_cutoffs


# --- hash split (pure kernel + ray op) --------------------------------

def test_split_cutoffs_and_validation():
    cuts = split_cutoffs({"train": 0.8, "val": 0.1, "test": 0.1})
    assert cuts == [("train", 800000), ("val", 900000), ("test", 1000000)]
    with pytest.raises(ValueError):
        split_cutoffs({"a": 0.5, "b": 0.4})        # doesn't sum to 1
    with pytest.raises(ValueError):
        split_cutoffs({"a": 1.2, "b": -0.2})       # non-positive
    with pytest.raises(ValueError):
        split_cutoffs({})


def test_assign_split_deterministic_and_fractions():
    cuts = split_cutoffs({"train": 0.8, "val": 0.1, "test": 0.1})
    keys = [f"doc-{i}" for i in range(20000)]
    a = assign_split(keys, cuts, seed=42)
    b = assign_split(keys, cuts, seed=42)
    assert (a == b).all()                          # stable across calls
    # same key in any order / duplication -> same split
    assert (assign_split(keys[::-1], cuts, 42) == a[::-1]).all()
    frac = {n: (a == n).mean() for n in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.01
    assert abs(frac["val"] - 0.1) < 0.01
    # different seed reshuffles membership
    c = assign_split(keys, cuts, seed=7)
    assert (a != c).mean() > 0.1


def test_assign_split_matches_duckdb_case():
    from gencore_ray.ops.split import split_sql_case

    fracs = {"train": 0.6, "val": 0.2, "test": 0.2}
    cuts = split_cutoffs(fracs)
    keys = [str(i * 37) for i in range(500)]
    eng = assign_split(keys, cuts, seed=9).tolist()
    con = duckdb.connect()
    case = split_sql_case("k", fracs, 9)
    ora = [
        r[0]
        for r in con.execute(
            f"SELECT {case} FROM (SELECT unnest(?) AS k)", [keys]
        ).fetchall()
    ]
    assert eng == ora


def test_hash_split_is_pure_map(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    )
    out = hash_split(ds, "doc_id").to_pandas()
    # partitioning must not affect membership
    out2 = (
        hash_split(ds.repartition(7), "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out.sort_values("doc_id").reset_index(drop=True) == out2).all().all()
    assert set(out["split"]) == {"train", "val", "test"}


# --- unicode normalisation --------------------------------------------

def test_normalize_text_arrow_parity_with_duckdb():
    cases = pa.array(
        ["café  x", " aÅb\t\tc ", "plain", "", None,
         "ffiﬃ ligature kept by NFC", "éé"]
    )
    eng = normalize_text_arrow(cases).to_pylist()
    con = duckdb.connect()
    ora = [
        r[0]
        for r in con.execute(
            "SELECT trim(regexp_replace(nfc_normalize(t), '[ \t]+', ' ', "
            "'g'), ' ') FROM (SELECT unnest(?) AS t)",
            [cases.to_pylist()],
        ).fetchall()
    ]
    assert eng == ora
    assert eng[0] == "café x"                 # composed, collapsed


# --- levenshtein -------------------------------------------------------

def test_levenshtein_matches_duckdb_bytes():
    import random

    random.seed(3)
    con = duckdb.connect()
    cases = [("kitten", "sitting"), ("", "abc"), ("abc", ""), ("s", "s"),
             ("café x", "cafe x"), ("日本", "x")]
    for _ in range(150):
        a = "".join(random.choice("abcd é") for _ in range(random.randint(0, 25)))
        b = "".join(random.choice("abcde") for _ in range(random.randint(0, 25)))
        cases.append((a, b))
    for a, b in cases:
        assert levenshtein(a, b) == con.execute(
            "SELECT levenshtein(?, ?)", [a, b]
        ).fetchone()[0], (a, b)


def test_levenshtein_batch_equals_scalar():
    """The chunked pair-axis DP must equal the scalar kernel byte for
    byte — including empty sides, equal strings, multibyte UTF-8, and
    length skew across a chunk boundary."""
    from gencore_ray.ops.editdist import levenshtein, levenshtein_batch

    rng = np.random.default_rng(11)
    alpha = list("abcdeé ")
    pairs = [("", ""), ("", "abc"), ("xyz", ""), ("same", "same"),
             ("kitten", "sitting"), ("é", "e")]
    for _ in range(300):
        x = "".join(rng.choice(alpha, size=rng.integers(0, 40)))
        y = "".join(rng.choice(alpha, size=rng.integers(0, 40)))
        pairs.append((x, y))
    # one huge-b outlier among short pairs: the cell-budget chunking
    # must isolate it instead of inflating every chunk's matrices
    pairs.append(("short a side", "x" * 20000))
    ta = [p[0] for p in pairs]
    tb = [p[1] for p in pairs]
    got = levenshtein_batch(ta, tb, chunk=64)   # force chunk boundaries
    want = np.array([levenshtein(x, y) for x, y in pairs])
    np.testing.assert_array_equal(got, want)


def test_pair_edit_distances_end_to_end(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    ["hello world", "hello w0rld", "", "completely different"]
                ),
            }
        )
    )
    pairs = rd.from_arrow(
        pa.table({"a": pa.array([1, 3], pa.int64()),
                  "b": pa.array([2, 4], pa.int64())})
    )
    out = (
        pair_edit_distances(docs, pairs, num_parts=2)
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert out.loc[0, "edit_distance"] == 1
    assert out.loc[0, "edit_similarity"] == pytest.approx(1 - 1 / 11)
    assert out.loc[1, "edit_distance"] == len("completely different")
    assert out.loc[1, "edit_similarity"] == 0.0


# --- pagerank -----------------------------------------------------------

def _pagerank_numpy(E: np.ndarray, iters: int, d: float = 0.85) -> dict:
    Eu = np.unique(E, axis=0)
    nodes = np.unique(Eu)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _t in Eu:
        deg[idx[s]] += 1
    r = np.full(n, 1 / n)
    for _ in range(iters):
        inc = np.zeros(n)
        for s, t in Eu:
            inc[idx[t]] += r[idx[s]] / deg[idx[s]]
        dang = r[deg == 0].sum()
        r = (1 - d) / n + d * (inc + dang / n)
    return {int(v): r[i] for v, i in idx.items()}


def test_pagerank_matches_reference_with_dangling(ray_session):
    rng = np.random.default_rng(1)
    E = rng.integers(0, 40, size=(300, 2)).astype(np.int64)
    E = np.vstack([E, [[5, 777], [9, 777]]])       # 777 is dangling
    edges = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]}))
    got = pagerank(edges, iters=8, num_parts=4).to_pandas()
    want = _pagerank_numpy(E, iters=8)
    assert len(got) == len(want)
    for node, rank in zip(got["node"], got["rank"]):
        assert rank == pytest.approx(want[int(node)], abs=1e-12)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)  # stochastic


def test_pagerank_distributed_equals_broadcast(ray_session):
    """The doc-scale joined-rank-table regime must reproduce the
    broadcast regime to float round-off, including dangling mass, and
    the auto switch must take it when |V| exceeds the threshold."""
    rng = np.random.default_rng(7)
    E = rng.integers(0, 60, size=(400, 2)).astype(np.int64)
    E = np.vstack([E, [[3, 888], [11, 888]]])      # 888 is dangling
    edges = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]}))
    bc = pagerank(edges, iters=6, num_parts=4, mode="broadcast") \
        .to_pandas().set_index("node").sort_index()
    di = pagerank(edges, iters=6, num_parts=3, mode="distributed") \
        .to_pandas().set_index("node").sort_index()
    assert list(bc.index) == list(di.index)
    np.testing.assert_allclose(bc["rank"], di["rank"], rtol=0, atol=1e-12)
    assert di["rank"].sum() == pytest.approx(1.0, abs=1e-9)
    # auto switch: |V|=61 > 10 forces the distributed path
    au = pagerank(edges, iters=6, num_parts=4, mode="auto",
                  max_broadcast_nodes=10) \
        .to_pandas().set_index("node").sort_index()
    np.testing.assert_allclose(bc["rank"], au["rank"], rtol=0, atol=1e-12)


def test_pagerank_empty(ray_session):
    edges = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    assert pagerank(edges, iters=3, num_parts=2).count() == 0
