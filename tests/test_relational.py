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
