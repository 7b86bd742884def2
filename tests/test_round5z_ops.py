"""Semantic pins for the prefix-scan relational batch beyond oracle
parity: the vectorized per-part cumsum rebase equals a pandas replay,
and SLA banding is the whole-order max (a row-level filter would
disagree).
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_stock_balance_matches_pandas_replay(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import stock_dip_audit

    got = stock_dip_audit(SF).to_pandas()
    raw = duckdb.sql(
        f"SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, "
        f"l_quantity, l_returnflag FROM '{SF}/lineitem.parquet' "
        "ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber"
    ).df()
    qty = np.floor(raw["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    s = np.where(raw["l_returnflag"].to_numpy() == "R", -qty, qty)
    raw["s"] = s
    n_dip = 0
    final_sum = 0
    for _, g in raw.groupby("l_partkey"):
        bal = np.cumsum(g["s"].to_numpy(np.int64))
        n_dip += int(bal.min() < 0)
        final_sum += int(bal[-1])
    assert int(got["n_dip_parts"].sum()) == n_dip
    assert int(got["final_balance_sum"].sum()) == final_sum


def test_sla_band_counts_orders_once(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import sla_band_by_priority

    df = sla_band_by_priority(SF).to_pandas()
    n_orders_with_items = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    assert int(df["n_orders"].sum()) == n_orders_with_items
    assert set(df["band"]).issubset({0, 1, 2, 3})
