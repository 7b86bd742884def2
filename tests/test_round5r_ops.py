"""Semantic pins for the Q21-shape/apriori/anti-join/disorder family
beyond oracle parity: the merge inversion counter against brute force,
blame qualification on a hand-built micro case, triple counts vs the
pairwise association op, and anti-join totals closure.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_inversion_counter_brute_force():
    from ray_extract.functions.inversions import (
        count_inversions,
        inversions_with_tiebreak,
    )

    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(0, 500))
        a = rng.permutation(n).astype(np.int64)
        iu, ju = np.triu_indices(n, 1)
        want = int(np.sum(a[iu] > a[ju])) if n > 1 else 0
        assert count_inversions(a) == want
    # ties in the primary are NOT inversions
    p = np.array([3, 3, 1, 3], np.int64)
    assert inversions_with_tiebreak(p, np.arange(4)) == 2  # both 3>1 pairs


def test_event_inversions_sorted_stream_is_zero(ray_session):
    import duckdb

    from ray_extract.pipelines.events import event_inversion_count

    df = event_inversion_count(SF).to_pandas()
    # totals cover every event exactly once
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["n_events"].sum()) == n
    # inversions bounded by n*(n-1)/2 per user
    assert (
        df["n_inversions"] <= df["n_events"] * (df["n_events"] - 1) // 2
    ).all()


def test_blame_micro_case(ray_session):
    # order with 2 suppliers, exactly one late -> blamed; order with both
    # late -> nobody; single-supplier order -> never blamed
    import pandas as pd

    from ray_extract.pipelines.relational import sole_late_supplier_blame

    got = sole_late_supplier_blame(SF).to_pandas()
    import duckdb

    want = duckdb.sql(f"""
      WITH j AS (SELECT l.l_orderkey ok, l.l_suppkey sk,
                  max(CASE WHEN l.l_shipdate > o.o_orderdate
                       + INTERVAL 60 DAY THEN 1 ELSE 0 END) late
           FROM '{SF}/lineitem.parquet' l
           JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1, 2)
      SELECT count(*) FROM (
        SELECT ok FROM j GROUP BY ok
        HAVING count(*) >= 2 AND count(*) FILTER (WHERE late = 1) = 1)
    """).fetchone()[0]
    assert int(got["n_blamed_orders"].sum()) == want


def test_triples_consistent_with_support(ray_session):
    from ray_extract.pipelines.relational import frequent_brand_triples

    df = frequent_brand_triples(SF, min_support=3).to_pandas()
    assert (df["n_orders"] >= 3).all()
    assert (df["brand_a"] < df["brand_b"]).all()
    assert (df["brand_b"] < df["brand_c"]).all()
    # raising support only shrinks the result, monotonically
    df5 = frequent_brand_triples(SF, min_support=5).to_pandas()
    assert len(df5) <= len(df)
    assert (df5["n_orders"] >= 5).all()


def test_parts_never_shipped_closure(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import parts_never_shipped

    df = parts_never_shipped(SF).to_pandas()
    tot = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/part.parquet'"
    ).fetchone()[0]
    used = duckdb.sql(
        f"SELECT count(DISTINCT l_partkey) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    assert int(df["n_parts"].sum()) == tot
    assert int(df["n_never_shipped"].sum()) == tot - used
    assert (df["n_never_shipped"] <= df["n_parts"]).all()
