"""Unit tests for the relational join / grouped-statistics pipelines.

The oracle-parity slice (test_oracle_parity.py) covers the end-to-end
match at sf0.001; these pin the semantics that could silently drift:
the quantile rank rule vs DuckDB's quantile_disc on adversarial shapes,
the integer cents rounding, and the tfidf tokenizer's empty-token filter.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_quantile_rank_rule_matches_duckdb_quantile_disc():
    """Our rank = ceil(p*n/100) via (p*n+99)//100 must pick the same element
    as DuckDB quantile_disc for every n in 1..40 and p in the used set."""
    con = duckdb.connect()
    rng = np.random.RandomState(7)
    for n in [1, 2, 3, 4, 5, 7, 10, 16, 33, 40]:
        vals = np.sort(rng.randint(0, 9, size=n))
        lit = ",".join(f"({int(v)})" for v in vals)
        for p in (25, 50, 75, 90, 99):
            want = con.execute(
                f"SELECT quantile_disc(x, {p / 100}) FROM (VALUES {lit}) t(x)"
            ).fetchone()[0]
            rank = (p * n + 99) // 100
            cum = np.arange(1, n + 1)
            got = int(vals[np.searchsorted(cum, rank)])
            assert got == int(want), (n, p, vals)


def test_cents_rounding_half_up():
    from ray_extract.pipelines.relational import _cents

    col = pa.chunked_array([pa.array([0.005, 0.004, 1.115, 2.675, 10.0])])
    # floor(x*100 + 0.5): half-up, immune to float repr of .5 ties the way
    # Python round() (banker's) is not
    assert _cents(col).tolist() == [1, 0, 112, 268, 1000]


def test_group_quantiles_values(ray_session):
    from ray_extract.pipelines.relational import group_quantiles

    got = group_quantiles(SF).to_pandas().set_index("l_returnflag").sort_index()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT l_returnflag, count(*) AS n_items,
                   CAST(quantile_disc(l_quantity, 0.5) AS BIGINT) AS p50_qty,
                   CAST(quantile_disc(l_quantity, 0.9) AS BIGINT) AS p90_qty
            FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).df().set_index("l_returnflag").sort_index()
    assert (got["n_items"] == want["n_items"]).all()
    assert (got["p50_qty"] == want["p50_qty"]).all()
    assert (got["p90_qty"] == want["p90_qty"]).all()


def test_revenue_join_row_counts(ray_session):
    """Inner-join semantics: every order priority present, revenue positive,
    and the big-big join did not duplicate or drop orders revenue."""
    from ray_extract.pipelines.relational import revenue_by_priority

    df = revenue_by_priority(SF).to_pandas()
    assert len(df) == 5  # TPC-H priorities
    assert (df["revenue_x10000"] > 0).all()
    con = duckdb.connect()
    total = con.execute(
        f"""SELECT SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                        * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)))
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"""
    ).fetchone()[0]
    assert int(df["revenue_x10000"].sum()) == int(total)


def test_tfidf_explode_handles_empty_tokens(ray_session):
    """Consecutive/leading spaces produce empty split tokens; both sides
    filter them, so no term is ever the empty string."""
    from ray_extract.pipelines.text import tfidf_top_terms

    df = tfidf_top_terms(SF).to_pandas()
    assert (df["term"] != "").all()
    assert df["rnk"].max() <= 5
    # per-source ranks are 1..k without gaps
    for _, g in df.groupby("source"):
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1))


def test_stratified_sample_rates(ray_session):
    """Sampled fraction per stratum tracks its permille rate (binomial
    tolerance), and the decision is reproducible across runs."""
    from ray_extract.pipelines.text import stratified_sample

    a = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["slot"] < a["rate_permille"]).all()


def test_top_order_per_priority_argmax_and_ties(ray_session):
    """Packed argmax must pick (max cents, then max orderkey) per priority."""
    from ray_extract.pipelines.relational import top_order_per_priority

    got = (
        top_order_per_priority(SF)
        .to_pandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    con = duckdb.connect()
    want = con.execute(
        f"""WITH o AS (SELECT o_orderpriority, o_orderkey,
                  CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS cents
                  FROM '{SF}/orders.parquet'),
            r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY cents DESC, o_orderkey DESC) rk FROM o)
            SELECT o_orderpriority, o_orderkey AS top_orderkey,
                   cents AS top_price_cents FROM r WHERE rk = 1"""
    ).df().set_index("o_orderpriority").sort_index()
    assert (got["top_orderkey"] == want["top_orderkey"]).all()
    assert (got["top_price_cents"] == want["top_price_cents"]).all()


def test_rollup_levels_are_consistent(ray_session):
    """ALL rows must equal the sum of their finer-grain children."""
    from ray_extract.pipelines.relational import rollup_revenue

    df = rollup_revenue(SF).to_pandas()
    fine = df[(df.l_returnflag != "ALL") & (df.l_linestatus != "ALL")]
    lvl1 = df[(df.l_returnflag != "ALL") & (df.l_linestatus == "ALL")]
    lvl0 = df[(df.l_returnflag == "ALL") & (df.l_linestatus == "ALL")]
    assert len(lvl0) == 1
    assert int(lvl0["revenue_x10000"].iloc[0]) == int(fine["revenue_x10000"].sum())
    assert int(lvl0["n_items"].iloc[0]) == int(fine["n_items"].sum())
    by_flag = fine.groupby("l_returnflag")["revenue_x10000"].sum()
    got_lvl1 = lvl1.set_index("l_returnflag")["revenue_x10000"]
    assert (by_flag.sort_index() == got_lvl1.sort_index()).all()


def test_top_revenue_orders_k_and_order(ray_session):
    """Result is exactly k rows, sorted by (revenue desc, orderkey asc)."""
    from ray_extract.pipelines.relational import top_revenue_orders

    df = top_revenue_orders(SF, k=5).to_pandas()
    assert len(df) == 5
    rev = df["revenue_x10000"].to_numpy()
    key = list(zip(-rev, df["o_orderkey"].to_numpy()))
    assert key == sorted(key)


def test_pricing_summary_filter_applied(ray_session):
    from ray_extract.pipelines.relational import pricing_summary

    df = pricing_summary(SF).to_pandas()
    con = duckdb.connect()
    n = con.execute(
        f"""SELECT count(*) FROM '{SF}/lineitem.parquet'
            WHERE l_shipdate <= TIMESTAMP '1999-01-01'"""
    ).fetchone()[0]
    assert int(df["n_items"].sum()) == n


def test_promo_share_sums_to_million(ray_session):
    from ray_extract.pipelines.relational import promo_revenue_share

    df = promo_revenue_share(SF).to_pandas()
    # floor division loses at most |types|-1 ppm
    assert 1_000_000 - len(df) < int(df["share_ppm"].sum()) <= 1_000_000
    assert (df["share_ppm"] >= 0).all()


def test_group_moments_satisfy_cauchy_schwarz(ray_session):
    """(sum qp)^2 <= sum q2 * sum p2 per group — a structural invariant the
    moment sums must obey if they were accumulated consistently."""
    from ray_extract.pipelines.relational import group_moments

    df = group_moments(SF).to_pandas()
    for _, r in df.iterrows():
        assert r["sum_qty_price"] ** 2 <= r["sum_qty2"] * r["sum_price2"]
        # variance non-negative: n*sum_x2 >= (sum_x)^2
        assert r["n"] * r["sum_qty2"] >= r["sum_qty"] ** 2
        assert r["n"] * r["sum_price2"] >= r["sum_price"] ** 2


def test_monthly_growth_telescopes(ray_session):
    """Deltas telescope: sum(delta) == last month's revenue - 0, and prev
    of month k equals revenue of month k-1."""
    from ray_extract.pipelines.relational import monthly_revenue_growth

    df = (
        monthly_revenue_growth(SF)
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert int(df["delta_cents"].sum()) == int(df["revenue_cents"].iloc[-1])
    assert (df["prev_revenue_cents"].iloc[1:].to_numpy()
            == df["revenue_cents"].iloc[:-1].to_numpy()).all()
    assert df["prev_revenue_cents"].iloc[0] == 0


def test_bloom_prefilter_keeps_all_true_matches(ray_session):
    """The bloom-prefiltered result must EQUAL the plain exact semi-join
    (no false negatives by construction; false positives die in the
    verification join) — including with a tiny, collision-heavy filter."""
    import duckdb

    from ray_extract.pipelines.relational import bloom_semi_join

    want = duckdb.sql(
        f"""SELECT count(*) AS n,
               CAST(SUM(CAST(floor(l.l_extendedprice*100+0.5) AS BIGINT)
                        * (100 - CAST(floor(l.l_discount*100+0.5) AS BIGINT)))
                    AS BIGINT) AS rev
            FROM '{SF}/lineitem.parquet' l
            WHERE l.l_orderkey IN (
              SELECT o_orderkey FROM '{SF}/orders.parquet'
              WHERE o_orderpriority = '1-URGENT')"""
    ).fetchone()
    for m_bits in (1 << 20, 1 << 10):  # second one forces false positives
        df = bloom_semi_join(SF, m_bits=m_bits).to_pandas()
        assert int(df["n_items"].iloc[0]) == want[0], m_bits
        assert int(df["revenue_x10000"].iloc[0]) == want[1], m_bits


def test_order_priority_returned_totals(ray_session):
    """Per-priority EXISTS counts must sum to the distinct R-order count."""
    from ray_extract.pipelines.relational import order_priority_returned

    df = order_priority_returned(SF).to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(DISTINCT l_orderkey) FROM '{SF}/lineitem.parquet'
            WHERE l_returnflag = 'R'"""
    ).fetchone()[0]
    assert int(df["n_orders"].sum()) == int(want)
    assert df["o_orderpriority"].is_unique


def test_large_volume_orders_threshold_and_join(ray_session):
    """Every surviving order exceeds the HAVING threshold and carries the
    right customer key (both hops are broadcast probes, never a shuffle)."""
    from ray_extract.pipelines.relational import large_volume_orders

    df = large_volume_orders(SF).to_pandas()
    assert (df["total_qty"] > 300).all()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet'
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM '{SF}/lineitem.parquet'
              GROUP BY l_orderkey
              HAVING sum(CAST(floor(l_quantity+0.5) AS BIGINT)) > 300)"""
    ).df()
    assert set(df["o_orderkey"]) == set(want["o_orderkey"])
    m = want.set_index("o_orderkey")["o_custkey"].sort_index()
    got = df.set_index("o_orderkey")["c_custkey"].sort_index()
    assert (got.values == m.values).all()


def test_returned_revenue_topk_set(ray_session):
    """Partial-top-k + final cut must equal the global ORDER BY LIMIT set,
    with the (revenue desc, custkey asc) tiebreak."""
    from ray_extract.pipelines.relational import returned_revenue_by_customer

    df = returned_revenue_by_customer(SF, k=7).to_pandas()
    assert len(df) == 7
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT o.o_custkey, CAST(SUM(CAST(floor(l.l_extendedprice*100+0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount*100+0.5) AS BIGINT))) AS BIGINT) rev
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_returnflag = 'R' GROUP BY 1
            ORDER BY rev DESC, o.o_custkey ASC LIMIT 7"""
    ).df()
    assert set(df["c_custkey"]) == set(want["o_custkey"])


def test_avg_order_gap_invariants(ray_session):
    """n_gaps = n_orders - 1; sentinel -1 exactly when a customer has one
    order; sums reproduce one spot-checked customer."""
    from ray_extract.pipelines.relational import avg_order_gap

    df = avg_order_gap(SF).to_pandas()
    assert (df["n_gaps"] == df["n_orders"] - 1).all()
    single = df["n_orders"] == 1
    assert (df.loc[single, "sum_gap_us"] == -1).all()
    assert (df.loc[~single, "sum_gap_us"] >= 0).all()
    con = duckdb.connect()
    ck = int(df["custkey"].iloc[0])
    want = con.execute(
        f"""WITH w AS (SELECT epoch_us(o_orderdate)
              - lag(epoch_us(o_orderdate)) OVER (ORDER BY o_orderdate, o_orderkey) d
              FROM '{SF}/orders.parquet' WHERE o_custkey = {ck})
            SELECT CAST(coalesce(sum(d),-1) AS BIGINT),
                   CAST(coalesce(max(d),-1) AS BIGINT) FROM w"""
    ).fetchone()
    row = df[df["custkey"] == ck].iloc[0]
    assert int(row["sum_gap_us"]) == int(want[0])
    assert int(row["max_gap_us"]) == int(want[1])


def test_orders_profile_exact_cardinalities(ray_session):
    """Row counts equal the table size for every column; key columns are
    unique where expected."""
    import duckdb

    from ray_extract.pipelines.relational import orders_profile

    df = orders_profile(SF).to_pandas().set_index("column")
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}/orders.parquet'").fetchone()[0]
    assert (df["n_rows"] == int(n)).all()
    assert int(df.loc["o_orderkey", "n_distinct"]) == int(n)  # primary key
    assert int(df.loc["o_orderpriority", "n_distinct"]) == 5


def test_part_price_deviation_mass(ray_session):
    """Per-type item counts sum to the joined lineitem count."""
    import duckdb

    from ray_extract.pipelines.relational import part_price_deviation

    df = part_price_deviation(SF).to_pandas()
    n = duckdb.sql(
        f"""SELECT count(*) FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey"""
    ).fetchone()[0]
    assert int(df["n_items"].sum()) == int(n)


def test_nation_pair_volume_excludes_local_pairs(ray_session):
    """Q7 shape: no same-nation pair appears, and the pair total plus the
    Q5 local total equals all-lineitem revenue (the two partitions of the
    supp-nation x cust-nation space)."""
    from ray_extract.pipelines.relational import (
        local_supplier_volume,
        nation_pair_volume,
    )

    pairs = nation_pair_volume(SF).to_pandas()
    assert (pairs["supp_nation"] != pairs["cust_nation"]).all()
    local = local_supplier_volume(SF).to_pandas()
    con = duckdb.connect()
    total = con.execute(
        f"""SELECT SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)))
            FROM '{SF}/lineitem.parquet'
            JOIN '{SF}/orders.parquet' ON l_orderkey = o_orderkey"""
    ).fetchone()[0]
    assert int(pairs["revenue_x10000"].sum()) + int(
        local["revenue_x10000"].sum()
    ) == int(total)


def test_market_share_numerator_bounded(ray_session):
    from ray_extract.pipelines.relational import market_share

    df = market_share(SF).to_pandas()
    assert len(df) > 0
    assert (df["nation_x10000"] <= df["total_x10000"]).all()
    assert (df["share_ppm"] >= 0).all() and (df["share_ppm"] <= 1_000_000).all()


def test_product_profit_name_filter_is_subset(ray_session):
    """Filtering to a rarer token can only shrink per-group profit mass."""
    from ray_extract.pipelines.relational import product_profit

    wide = product_profit(SF, name_like="widget").to_pandas()
    narrow = product_profit(SF, name_like="blue widget").to_pandas()
    assert set(map(tuple, narrow[["n_name", "o_year"]].values)) <= set(
        map(tuple, wide[["n_name", "o_year"]].values)
    )


def test_small_qty_revenue_threshold_monotone(ray_session):
    """A stricter brand filter (nonexistent brand) matches nothing; the
    default brand matches a positive count at this sf."""
    from ray_extract.pipelines.relational import small_qty_revenue

    got = small_qty_revenue(SF).to_pandas()
    assert int(got["matched_rows"].iloc[0]) > 0
    assert int(got["avg_yearly_cents"].iloc[0]) == int(
        got["total_cents"].iloc[0]
    ) // 7
    none = small_qty_revenue(SF, brand="Brand#none").to_pandas()
    assert int(none["matched_rows"].iloc[0]) == 0
    assert int(none["total_cents"].iloc[0]) == 0


def test_top_supplier_is_argmax_with_ties(ray_session):
    from ray_extract.pipelines.relational import top_supplier

    df = top_supplier(SF).to_pandas()
    assert len(df) >= 1
    assert df["total_revenue_x10000"].nunique() == 1
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT max(r) FROM (
              SELECT SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS r
              FROM '{SF}/lineitem.parquet'
              WHERE l_shipdate >= DATE '1998-01-01'
                AND l_shipdate < DATE '1998-04-01'
              GROUP BY l_suppkey)"""
    ).fetchone()[0]
    assert int(df["total_revenue_x10000"].iloc[0]) == int(want)


def test_weighted_median_is_exact_vs_brute_force(ray_session):
    import pandas as pd

    from ray_extract.pipelines.relational import weighted_median_price

    df = weighted_median_price(SF).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li["price"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    li["w"] = np.floor(li["l_quantity"] + 0.5).astype(np.int64)
    for rf, g in li.groupby("l_returnflag"):
        g = g.sort_values("price")
        cum = g["w"].to_numpy().cumsum()
        total = int(cum[-1])
        want = int(g["price"].to_numpy()[np.searchsorted(cum, (total + 1) // 2)])
        assert int(df.loc[rf, "wmedian_cents"]) == want
        assert int(df.loc[rf, "total_weight"]) == total


def test_weighted_median_bucket_width_invariant(ray_session):
    """The two-pass selection must give the same answer at any bucket
    granularity (including width 1 = pure counting selection)."""
    from ray_extract.pipelines.relational import weighted_median_price

    a = weighted_median_price(SF).to_pandas()
    b = weighted_median_price(SF, bucket_cents=1 << 22).to_pandas()
    assert a.equals(b)


def test_cube_revenue_grains_consistent(ray_session):
    from ray_extract.pipelines.relational import cube_revenue

    df = cube_revenue(SF).to_pandas()
    total = df[
        (df.o_orderpriority == "ALL") & (df.l_returnflag == "ALL")
    ]["revenue_x10000"].iloc[0]
    fine = df[(df.o_orderpriority != "ALL") & (df.l_returnflag != "ALL")]
    by_p = df[(df.o_orderpriority != "ALL") & (df.l_returnflag == "ALL")]
    by_r = df[(df.o_orderpriority == "ALL") & (df.l_returnflag != "ALL")]
    assert int(fine["revenue_x10000"].sum()) == int(total)
    assert int(by_p["revenue_x10000"].sum()) == int(total)
    assert int(by_r["revenue_x10000"].sum()) == int(total)
