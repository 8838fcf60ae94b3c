"""Driver-contract invariants for __ray_entry__.py — pure-import
checks (no Ray session, no testdata): the driver's correctness gate
keys oracles by query name, so a typo in either dict silently drops a
query from the gate.  These assertions make that a test failure."""

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_under_test", os.path.join(HERE, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    sys.path.insert(0, HERE)
    try:
        spec.loader.exec_module(m)
    finally:
        sys.path.pop(0)
    return m


def test_every_oracle_has_a_query_and_every_query_is_callable():
    m = _entry_module()
    q, o = m.queries(), m.oracle_sql()
    missing = sorted(set(o) - set(q))
    assert not missing, f"oracle keys without a query: {missing}"
    not_callable = sorted(n for n, fn in q.items() if not callable(fn))
    assert not_callable == []
    empty = sorted(n for n, s in o.items()
                   if not isinstance(s, str) or not s.strip())
    assert empty == []
    # the engine-only remainder is a deliberate, documented set — a new
    # query landing here unintentionally means its oracle never got
    # registered (the driver then records only the weak rows-only check)
    engine_only = sorted(set(q) - set(o))
    assert engine_only == [
        "bpe_encode_stats", "bpe_merges", "pages_dedup_pipeline",
        "pca_explained_variance", "simhash_near_pairs",
        "text_quality_profile",
    ], f"unexpected engine-only queries: {engine_only}"


def test_bench_side_queries_exist_in_registry():
    m = _entry_module()
    import importlib.util as iu

    spec = iu.spec_from_file_location("bench_under_test",
                                      os.path.join(HERE, "bench.py"))
    b = iu.module_from_spec(spec)
    # bench.py guards execution under __main__; loading it only binds
    # QUERY_NAMES and helpers
    spec.loader.exec_module(b)
    q = m.queries()
    missing = sorted(n for n in b.QUERY_NAMES if n not in q)
    assert not missing, f"bench names not in registry: {missing}"
