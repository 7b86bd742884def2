"""Partitioning-invariance property: bucketed operators must produce
identical results for ANY bucket count — the result may never depend on
how work was sharded. Pins the in-bucket finishing logic (np.unique /
reduceat folds) against hash-layout changes, the exact failure mode of
a wrong partitioning assumption at cluster scale.
"""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _assert_bucket_invariant(fn, **kw):
    a = _norm(fn(SF, num_buckets=3, **kw).to_pandas())
    b = _norm(fn(SF, num_buckets=64, **kw).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_user_streaks_bucket_invariant(ray_session):
    from ray_extract.pipelines.events import user_streaks

    _assert_bucket_invariant(user_streaks)


def test_basket_supplier_pairs_bucket_invariant(ray_session):
    from ray_extract.pipelines.relational import basket_supplier_pairs

    _assert_bucket_invariant(basket_supplier_pairs)


def test_supplier_part_coverage_bucket_invariant(ray_session):
    from ray_extract.pipelines.relational import supplier_part_coverage

    _assert_bucket_invariant(supplier_part_coverage)


def test_repeated_substring_topk_bucket_invariant(ray_session):
    from ray_extract.pipelines.text import repeated_substring_topk

    _assert_bucket_invariant(repeated_substring_topk)


def test_dominant_bigram_bucket_invariant(ray_session):
    from ray_extract.pipelines.text import dominant_bigram_per_source

    _assert_bucket_invariant(dominant_bigram_per_source)


def test_repeat_revenue_share_bucket_invariant(ray_session):
    from ray_extract.pipelines.relational import repeat_revenue_share

    _assert_bucket_invariant(repeat_revenue_share)


def test_burstiness_terms_bucket_invariant(ray_session):
    from ray_extract.pipelines.events import burstiness_terms

    _assert_bucket_invariant(burstiness_terms)


def test_value_ascent_streaks_bucket_invariant(ray_session):
    from ray_extract.pipelines.events import value_ascent_streaks

    _assert_bucket_invariant(value_ascent_streaks)


def test_linenumber_density_audit_bucket_invariant(ray_session):
    from ray_extract.pipelines.relational import linenumber_density_audit

    _assert_bucket_invariant(linenumber_density_audit)
