"""Semantic pins for the projection/band-join/purity batch beyond
oracle parity: projection weights vs a pandas recompute, quartile
boundaries are true rank cut points, and purity ppm is the exact
integer share.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_projection_weights_match_pandas(ray_session):
    import duckdb

    from ray_extract.pipelines.events import bipartite_projection_weights

    got = (
        bipartite_projection_weights(SF)
        .to_pandas()
        .set_index(["type_a", "type_b"])["n_users"]
    )
    ut = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type "
        f"FROM '{SF}/events.parquet'"
    ).df()
    want = {}
    for _, g in ut.groupby("user_id"):
        ts = sorted(g["event_type"])
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                want[(ts[i], ts[j])] = want.get((ts[i], ts[j]), 0) + 1
    assert dict(got) == want


def test_quartile_boundaries_are_rank_cuts(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import brand_quartile_band_join

    df = brand_quartile_band_join(SF).to_pandas()
    # every brand contributes <= 4 quartile rows and full lineitem mass
    assert df.groupby("p_brand")["quartile"].nunique().max() <= 4
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    assert int(df["n_items"].sum()) == n
    # quartile 0 is never empty: the minimum-price part of each brand
    # always classifies as 0 (cents <= q1)
    assert set(df[df["quartile"] == 0]["p_brand"]) == set(df["p_brand"])


def test_purity_ppm_exact(ray_session):
    import duckdb

    from ray_extract.pipelines.text import source_lang_purity

    df = source_lang_purity(SF).to_pandas()
    raw = duckdb.sql(
        f"SELECT source, lang FROM '{SF}/documents.parquet'"
    ).df()
    for _, r in df.iterrows():
        g = raw[raw["source"] == r["source"]]
        counts = g["lang"].value_counts()
        top_n = int(counts.max())
        assert int(r["majority_n"]) == top_n
        assert int(r["n_docs"]) == len(g)
        assert int(r["purity_ppm"]) == top_n * 1_000_000 // len(g)
        # lexicographic tiebreak
        tied = sorted(counts[counts == top_n].index)
        assert r["majority_lang"] == tied[0]
