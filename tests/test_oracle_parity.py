"""Fast pytest slice of the driver's query-vs-SQL-oracle gate.

The exhaustive check is tools/check_queries.py; this keeps a representative
subset inside `pytest -x -q` so oracle-parity regressions fail CI quickly.
"""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
SUBSET = [
    "extract_spans",
    "extract_kind_counts",
    "extract_main_content_ratio",
    "shipmode_priority_matrix",
    "dedup_exact",
    "dedup_simhash",
    "ann_lsh",
    "ann_recall",
    "text_tokens",
    "lang_id",
    "html_main_content",
    "top_docs_by_tokens",
    "events_asof_join",
    "sentence_dedup",
    "top_docs_per_source",
    "bigram_counts",
    "approx_distinct_hll",
    "revenue_by_priority",
    "revenue_by_nation",
    "group_quantiles",
    "tfidf_top_terms",
    "stratified_sample",
    "customers_without_orders",
    "events_cumulative",
    "stopword_scrub",
    "bpe_token_counts",
    "sequence_pack",
    "distinct_users_by_type",
    "revenue_by_quantity_band",
    "events_lag_rolling",
    "dedup_clusters",
    "source_vocab_overlap",
    "zscore_outliers",
    "markov_transitions",
    "customer_spend_ntile",
    "blocked_linkage",
    "nation_pair_volume",
    "market_share",
    "small_qty_revenue",
    "top_supplier",
    "revenue_trend",
    "order_reconciliation",
    "core_vocabulary",
    "order_width_histogram",
    "revenue_concentration",
    "top_parts_by_quantity",
    "acctbal_band_profile",
    "supplier_balance_leader",
    "supplier_wait_ranking",
    "idle_capital_by_nation",
    "min_cost_supplier_per_part",
    "gopher_rules_profile",
    "duplicate_ngram_coverage",
    "extract_media_context",
    "extract_page_kind_mix",
    "simhash_distance_histogram",
    "typo_neighbor_pairs",
    "user_resurrections",
    "gap_hour_histogram",
    "value_autocorr_terms",
    "word_length_histogram",
    "allcaps_ratio",
    "lexical_density",
    "vocab_growth",
    "dominant_dim_histogram",
    "dim_sign_profile",
    "ship_delay_profile",
    "regional_customer_value",
    "tax_discount_matrix",
    "supplier_part_coverage",
    "orders_per_weekday",
    "char_class_profile",
    "extract_media_refs",
    "extract_offset_audit",
    "extract_page_density",
    "customer_supplier_diversity",
    "monthly_active_customers",
    "part_name_token_revenue",
    "rfm_segments",
    "basket_supplier_pairs",
    "extract_kind_transitions",
    "extract_media_position",
    "extract_kind_sets",
    "user_streaks",
    "user_growth_curve",
    "peak_concurrency",
    "quantity_mode",
    "nation_rank_change",
    "readability_terms",
    "repeated_substring_topk",
    "embedding_covariance_terms",
    "benford_profile",
    "seasonality_matrix",
    "revenue_pareto_curve",
    "gap_hour_quantiles",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "orders", "lineitem",
              "customer", "nation", "supplier", "part", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, oracle_con, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    import pandas as pd

    res = E.queries()[name](SF)
    got = _norm(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _norm(oracle_con.execute(E.oracle_sql()[name]).df())
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert np.array_equal(got[c].values, want[c].values), c
