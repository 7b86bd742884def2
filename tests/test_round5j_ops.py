"""Semantic pins for the round-5 ML-statistics batch beyond oracle
parity: marginal identities of the contingency kernels, the decomposed
y*y recombination against DuckDB HUGEINT, hash-bucket mass conservation,
and the calibration labels against a hand regex.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_mutual_information_marginal_identities(ray_session):
    from ray_extract.pipelines.mlstats import mutual_information_terms

    df = mutual_information_terms(SF).to_pandas()
    # joint sums back to each marginal and to the grand total
    assert df["n_xy"].sum() == df["n_total"].iloc[0]
    for lang, g in df.groupby("lang"):
        assert g["n_xy"].sum() == g["n_lang"].iloc[0]
    for src, g in df.groupby("source"):
        assert g["n_xy"].sum() == g["n_source"].iloc[0]


def test_chi_square_expected_counts_consistent(ray_session):
    from ray_extract.pipelines.mlstats import chi_square_terms

    df = chi_square_terms(SF).to_pandas()
    n = df["grand_total"].iloc[0]
    # expected counts derived from the terms sum to N (within rounding)
    exp = df["row_total"] * df["col_total"] / n
    # cells cover the full cross product observed in data
    assert df["observed"].sum() == n
    assert abs(exp.sum() - n) < 1e-6 * n


def test_regression_terms_recombine_exactly(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import regression_normal_terms

    row = regression_normal_terms(SF).to_pandas().iloc[0]
    sum_yy = (
        int(row["sum_yhyh"]) * (1 << 32)
        + 2 * int(row["sum_yhyl"]) * (1 << 16)
        + int(row["sum_ylyl"])
    )
    exp = duckdb.sql(
        f"""SELECT sum(CAST(y AS HUGEINT) * y) FROM (
              SELECT CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS y
              FROM '{SF}/lineitem.parquet')"""
    ).fetchone()[0]
    assert sum_yy == int(exp)


def test_feature_hash_mass_conservation(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import feature_hash_collisions

    df = feature_hash_collisions(SF).to_pandas()
    vocab = duckdb.sql(
        f"""SELECT count(DISTINCT t) FROM (
              SELECT unnest(string_split(text, ' ')) AS t
              FROM '{SF}/documents.parquet') WHERE t <> ''"""
    ).fetchone()[0]
    # sum(load * n_buckets) == vocabulary size: no token lost or doubled
    assert (df["load"] * df["n_buckets"]).sum() == vocab


def test_calibration_labels_match_regex(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import calibration_bins

    df = (
        calibration_bins(SF).to_pandas()
        .sort_values("bin", ignore_index=True)
    )
    exp = duckdb.sql(
        f"""SELECT n_chars % 10 AS bin,
                   count(*) FILTER (WHERE regexp_matches(text, 'spark'))
                     AS n_pos
            FROM '{SF}/documents.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert np.array_equal(df["n_pos"].to_numpy(),
                          exp["n_pos"].to_numpy().astype(np.int64))
    assert df["n"].sum() == 500
