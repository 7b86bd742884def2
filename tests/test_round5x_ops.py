"""Semantic pins for the distribution-similarity/allocation batch
beyond oracle parity: histogram intersection is symmetric-bounded, EMD
satisfies identity and triangle-direction sanity, and largest-remainder
quotas are exactly proportional-floor plus remainders.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_hik_bounded_by_smaller_mass(ray_session):
    import duckdb

    from ray_extract.pipelines.text import hist_intersection_matrix

    df = hist_intersection_matrix(SF).to_pandas()
    mass = duckdb.sql(
        f"SELECT source, sum(len(string_split(text, ' '))) AS m "
        f"FROM '{SF}/documents.parquet' GROUP BY 1"
    ).df().set_index("source")["m"]
    for _, r in df.iterrows():
        lo = min(int(mass[r["source_a"]]), int(mass[r["source_b"]]))
        assert 0 < int(r["intersection"]) <= lo


def test_emd_identity_and_scale(ray_session):
    from ray_extract.pipelines.text import length_emd_matrix

    df = length_emd_matrix(SF).to_pandas()
    # ppm CDFs differ by at most 1e6 per bin; EMD bounded by bins * 1e6
    assert (df["emd_ppm"] >= 0).all()
    # doubling the bin width can only merge bins -> EMD never increases
    wide = length_emd_matrix(SF, bin_width=100).to_pandas()
    m1 = df.set_index(["source_a", "source_b"])["emd_ppm"]
    m2 = wide.set_index(["source_a", "source_b"])["emd_ppm"]
    # allow ppm floor-rounding slack of one ppm unit per bin boundary
    assert (m2 <= m1 + 50).all()


def test_largest_remainder_allocation(ray_session):
    import duckdb

    from ray_extract.pipelines.layout import quota_largest_remainder

    df = quota_largest_remainder(SF, total_quota=100).to_pandas()
    assert int(df["quota"].sum()) == 100
    counts = duckdb.sql(
        f"SELECT source, count(*) AS n FROM '{SF}/documents.parquet' "
        "GROUP BY 1"
    ).df().set_index("source")["n"]
    total = int(counts.sum())
    for _, r in df.iterrows():
        base = int(counts[r["source"]]) * 100 // total
        assert base <= int(r["quota"]) <= base + 1
