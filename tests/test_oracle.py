"""Union-find / oracle unit vectors (FIXTURES.md §3: chains, stars,
late-joined components — the umiDiff/isDuplex spirit of
/root/reference/src/cluster.cpp:275-288)."""

from gencore_ray.config import DedupConfig
from gencore_ray.oracle import oracle_edges, union_find_clusters


def _uf(ids, edges):
    return union_find_clusters(ids, [(a, b, 1.0) for a, b in edges])


def test_chain():
    lab = _uf(list("abcd"), [("a", "b"), ("b", "c"), ("c", "d")])
    assert set(lab.values()) == {"a"}


def test_star():
    lab = _uf(list("abcde"), [("c", "a"), ("c", "b"), ("c", "d"), ("c", "e")])
    assert set(lab.values()) == {"a"}


def test_two_components_joined_late():
    ids = list("abcdef")
    edges = [("a", "b"), ("c", "d"), ("e", "f")]
    lab = _uf(ids, edges)
    assert lab["a"] == lab["b"] == "a"
    assert lab["c"] == lab["d"] == "c"
    assert lab["e"] == lab["f"] == "e"
    lab2 = _uf(ids, edges + [("b", "f"), ("d", "e")])
    assert set(lab2.values()) == {"a"}


def test_singletons_self_labelled():
    lab = _uf(list("xyz"), [])
    assert lab == {"x": "x", "y": "y", "z": "z"}


def test_label_is_min_id_regardless_of_edge_order():
    edges = [("m", "z"), ("z", "a")]
    lab = _uf(list("amz"), edges)
    assert set(lab.values()) == {"a"}
    lab2 = _uf(list("amz"), list(reversed(edges)))
    assert lab == lab2


def test_oracle_edges_exact_dup_and_threshold():
    cfg = DedupConfig()
    t = " ".join(f"w{i}" for i in range(80))
    ids = ["u1", "u2", "u3"]
    texts = [t, t, " ".join(f"q{i}" for i in range(80))]
    edges = oracle_edges(ids, texts, cfg)
    assert [(a, b) for a, b, _ in edges] == [("u1", "u2")]
    assert edges[0][2] == 1.0


def test_oracle_min_shingles_bypass():
    cfg = DedupConfig()
    edges = oracle_edges(["e1", "e2"], ["", ""], cfg)
    assert edges == []


def test_distributed_cc_random_graphs(ray_session):
    """Vectorised large-star/small-star equals union-find on random graphs."""
    import numpy as np
    import ray.data as rd

    from gencore_ray.stages.cc import distributed_cc

    rng = np.random.RandomState(7)
    for trial in range(3):
        n, m = 200, 150
        nodes = [f"n{i:04d}" for i in range(n)]
        ea = rng.randint(0, n, size=m)
        eb = rng.randint(0, n, size=m)
        edges = [(nodes[a], nodes[b]) for a, b in zip(ea, eb) if a != b]
        ds = rd.from_items([{"url_a": a, "url_b": b} for a, b in edges])
        labels = distributed_cc(ds, num_parts=4).to_pandas()
        got = dict(zip(labels["url"], labels["label"]))
        want = union_find_clusters(nodes, [(a, b, 1.0) for a, b in edges])
        # distributed labels cover only nodes that appear in edges
        touched = {x for e in edges for x in e}
        for u in touched:
            assert got.get(u, u) == want[u], (trial, u)
