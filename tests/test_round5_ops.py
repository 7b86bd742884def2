"""Semantic pins for the round-5 operators beyond oracle parity.

The SQL-oracle gate (tools/check_queries.py) proves end-to-end equality;
these pin the semantics that could silently drift — the Q16 denylist
anti-join, the Q20/Q11 integer threshold boundary, the Q12 late
predicate, and the span-table invariants of the new extraction queries.
"""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _li(columns):
    return duckdb.sql(
        f"SELECT {', '.join(columns)} FROM '{SF}/lineitem.parquet'"
    ).df()


def test_supplier_attr_counts_denylist_and_brute_force(ray_session):
    from ray_extract.pipelines.relational import supplier_attr_counts

    got = (
        supplier_attr_counts(SF)
        .to_pandas()
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    li = _li(["l_partkey", "l_suppkey"])
    part = duckdb.sql(
        f"SELECT p_partkey, p_brand, p_type, p_size FROM '{SF}/part.parquet'"
    ).df()
    li = li[li["l_suppkey"] % 7 != 0]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[(j["p_brand"] != "Brand#13") & j["p_size"].isin([1, 4, 9, 16, 25, 36, 49])]
    want = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index(name="supplier_cnt")
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["supplier_cnt"].to_numpy() == want["supplier_cnt"].to_numpy()).all()
    # the denylist is a real anti-join: adding a denylisted supplier's rows
    # back would change at least one group at this sf
    assert (li["l_suppkey"] % 7 != 0).all()


def test_promo_part_suppliers_threshold_boundary(ray_session):
    from ray_extract.pipelines.relational import promo_part_suppliers

    got = promo_part_suppliers(SF).to_pandas()
    li = _li(["l_partkey", "l_suppkey", "l_quantity"])
    part = duckdb.sql(
        f"SELECT p_partkey FROM '{SF}/part.parquet' WHERE p_name LIKE '%widget%'"
    ).df()
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["qty"] = np.floor(j["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    per = j.groupby("l_suppkey")["qty"].sum()
    total, n = int(per.sum()), len(per)
    keep = {k for k, v in per.items() if 2 * int(v) * n > total}
    assert set(got["qty_sum"]) == {int(per[k]) for k in keep}
    assert len(got) == len(keep)


def test_shipmode_priority_matrix_partitions_late_lines(ray_session):
    from ray_extract.pipelines.relational import shipmode_priority_matrix

    got = shipmode_priority_matrix(SF).to_pandas()
    want_total = duckdb.sql(
        f"""SELECT count(*) FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o ON l_orderkey = o_orderkey
            WHERE date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) > 45"""
    ).fetchone()[0]
    assert int((got["high_line_count"] + got["low_line_count"]).sum()) == int(
        want_total
    )
    assert set(got["ship_mode"]) <= {"REG AIR", "RAIL", "TRUCK"}


def test_part_value_share_threshold_exact(ray_session):
    from ray_extract.pipelines.relational import part_value_share

    got = part_value_share(SF).to_pandas()
    li = _li(["l_partkey", "l_extendedprice"])
    li["v"] = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    per = li.groupby("l_partkey")["v"].sum()
    total, n = int(per.sum()), len(per)
    want = {int(k): int(v) for k, v in per.items() if 2 * int(v) * n > 3 * total}
    assert dict(zip(got["l_partkey"], got["value_cents"])) == want
    # boundary: the floor-threshold shortcut equals the product predicate
    thresh = (3 * total) // (2 * n)
    for v in per:
        assert (int(v) > thresh) == (2 * int(v) * n > 3 * total)


def _spans_df():
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(E._SPANS_CTE + "SELECT * FROM spans").df()


def test_extract_section_sizes_mass_conservation(ray_session):
    import __ray_entry__ as E

    got = E.queries()["extract_section_sizes"](SF).to_pandas()
    spans = _spans_df()
    # every span belongs to exactly one section
    assert int((got["section_len"] * got["n_sections"]).sum()) == len(spans)


def test_extract_caption_profile_counts_media_with_successor(ray_session):
    import __ray_entry__ as E

    got = E.queries()["extract_caption_length_profile"](SF).to_pandas()
    spans = _spans_df().sort_values(["did", "i"])
    last = spans.groupby("did")["i"].transform("max")
    n_media_with_next = int(((spans["kind"] == "media") & (spans["i"] < last)).sum())
    assert int(got["n_media"].sum()) == n_media_with_next


def test_extract_boilerplate_min_df(ray_session):
    import __ray_entry__ as E

    got = E.queries()["extract_boilerplate_texts"](SF).to_pandas()
    assert (got["n_docs"] >= 2).all()
    spans = _spans_df()
    hf = spans[spans["kind"].isin(["pageHeader", "pageFooter"])]
    df_counts = hf.drop_duplicates(["did", "text"]).groupby("text").size()
    for t, n in zip(got["text"], got["n_docs"]):
        assert int(df_counts[t]) == int(n)


def test_extract_main_content_ratio_covers_all_docs(ray_session):
    import __ray_entry__ as E

    got = E.queries()["extract_main_content_ratio"](SF).to_pandas()
    spans = _spans_df()
    n_docs_nonzero = (
        spans.groupby("did")["length"].sum().gt(0).sum()
    )
    assert int(got["n_docs"].sum()) == int(n_docs_nonzero)
    assert got["ratio_band"].between(0, 20).all()
