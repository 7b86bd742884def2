"""Semantic pins for the cross-modal (documents x embeddings) batch
beyond oracle parity: contingency marginals equal each table's own
counts, coverage closure, and Pearson terms reproduce the correlation
computed directly in pandas.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_contingency_marginals(ray_session):
    import duckdb

    from ray_extract.pipelines.similarity import label_source_contingency

    df = label_source_contingency(SF).to_pandas()
    by_label = df.groupby("label")["n_docs"].sum()
    want = duckdb.sql(
        f"SELECT label, count(*) AS n FROM '{SF}/embeddings.parquet' "
        "GROUP BY 1"
    ).df().set_index("label")["n"]
    assert dict(by_label) == {int(k): int(v) for k, v in want.items()}
    by_source = df.groupby("source")["n_docs"].sum()
    want2 = duckdb.sql(
        f"SELECT source, count(*) AS n FROM '{SF}/documents.parquet' "
        "GROUP BY 1"
    ).df().set_index("source")["n"]
    assert dict(by_source) == {k: int(v) for k, v in want2.items()}


def test_coverage_closure(ray_session):
    from ray_extract.pipelines.similarity import embedding_coverage_audit

    df = embedding_coverage_audit(SF).to_pandas()
    assert (df["n_missing"] <= df["n_docs"]).all()
    # with no quarantined label nothing is missing (ids align 1:1)
    none = embedding_coverage_audit(SF, quarantined_label=-1).to_pandas()
    assert int(none["n_missing"].sum()) == 0


def test_corr_terms_reproduce_pearson(ray_session):
    import duckdb

    from ray_extract.pipelines.similarity import textlen_label_corr_terms

    t = textlen_label_corr_terms(SF).to_pandas().iloc[0]
    j = duckdb.sql(
        f"SELECT d.n_chars AS x, e.label AS y "
        f"FROM '{SF}/documents.parquet' d "
        f"JOIN '{SF}/embeddings.parquet' e ON d.doc_id = e.vec_id"
    ).df()
    n = int(t["n"])
    num = n * int(t["sum_xy"]) - int(t["sum_x"]) * int(t["sum_y"])
    den_x = n * int(t["sum_xx"]) - int(t["sum_x"]) ** 2
    den_y = n * int(t["sum_yy"]) - int(t["sum_y"]) ** 2
    r = num / np.sqrt(den_x * den_y)
    want = np.corrcoef(j["x"], j["y"])[0, 1]
    assert abs(r - want) < 1e-12
