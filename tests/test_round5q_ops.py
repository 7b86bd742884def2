"""Semantic pins for the pipeline-support statistics family beyond
oracle parity: join stats equal the naive pandas join, k-fold strata are
balanced within one doc, fold leakage is symmetric in construction, and
id-gap mass reconstructs max - min - (n - 1).
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_join_stats_equal_naive(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import join_stats_audit

    got = join_stats_audit(SF).to_pandas().iloc[0]
    o = duckdb.sql(
        f"SELECT o_orderkey FROM '{SF}/orders.parquet'"
    ).df()["o_orderkey"]
    li = duckdb.sql(
        f"SELECT l_orderkey FROM '{SF}/lineitem.parquet'"
    ).df()["l_orderkey"]
    nl = o.value_counts()
    nr = li.value_counts()
    both = nl.index.intersection(nr.index)
    assert int(got["n_keys_left"]) == len(nl)
    assert int(got["n_keys_right"]) == len(nr)
    assert int(got["n_keys_both"]) == len(both)
    fan = (nl[both] * nr[both]).astype(np.int64)
    assert int(got["join_rows"]) == int(fan.sum())
    assert int(got["max_fanout"]) == int(fan.max())
    # TPC-H invariant: every lineitem belongs to an order
    assert int(got["n_right_only"]) == 0
    # join_rows equals the true inner-join cardinality
    assert int(got["join_rows"]) == len(li[li.isin(set(o))])


def test_kfold_strata_balanced(ray_session):
    from ray_extract.pipelines.mlstats import stratified_kfold_assign

    df = stratified_kfold_assign(SF, k=5).to_pandas()
    for lang, g in df.groupby("lang"):
        counts = g.set_index("fold")["n_docs"]
        # round-robin: fold sizes differ by at most 1 within a stratum
        assert counts.max() - counts.min() <= 1, lang
        # fold ids are exactly 0..min(k, n)-1
        assert sorted(g["fold"]) == list(range(len(g)))


def test_fold_leakage_matches_recompute(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import fold_leakage_audit

    got = (
        fold_leakage_audit(SF, k=3)
        .to_pandas()
        .set_index(["fold_a", "fold_b"])["n_shared"]
    )
    raw = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet' "
        "ORDER BY lang, doc_id"
    ).df()
    raw["fold"] = raw.groupby("lang").cumcount() % 3
    fold_sets = {f: set() for f in range(3)}
    for _, r in raw.iterrows():
        w = r["text"].split(" ")
        for i in range(len(w) - 2):
            fold_sets[r["fold"]].add(" ".join(w[i : i + 3]))
    for a in range(3):
        for b in range(a + 1, 3):
            want = len(fold_sets[a] & fold_sets[b])
            have = int(got.get((a, b), 0))
            assert have == want, (a, b, have, want)


def test_id_gap_mass_identity(ray_session):
    from ray_extract.pipelines.mlstats import id_gap_audit

    df = id_gap_audit(SF).to_pandas()
    # sum of gaps == span minus dense count (ids unique per source)
    span = df["max_id"] - df["min_id"] + 1
    assert (df["sum_gap"] == span - df["n_docs"]).all()


def test_fertility_totals_match_bpe_op(ray_session):
    from ray_extract.pipelines.mlstats import tokenizer_fertility_terms
    from ray_extract.pipelines.text import bpe_token_counts

    fert = tokenizer_fertility_terms(SF).to_pandas()
    per_doc = bpe_token_counts(SF).to_pandas()
    assert int(fert["sum_bpe_tokens"].sum()) == int(
        per_doc["n_bpe_tokens"].sum()
    )
    assert int(fert["sum_ws_tokens"].sum()) == int(
        per_doc["n_ws_tokens"].sum()
    )
