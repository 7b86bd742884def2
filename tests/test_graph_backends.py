"""Dup-graph ops: the dataset-resident (join) backends must produce exactly
the broadcast backends' results (the broadcast paths are oracle-verified by
the driver; these tests force the 100-TB join paths over the same input).
"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _norm(x):
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    return x.sort_values(list(x.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_duplicate_clusters_join_backend_matches_broadcast():
    from ray_extract.pipelines.dedup import duplicate_clusters

    b = _norm(duplicate_clusters(SF, label_backend="broadcast"))
    j = _norm(duplicate_clusters(SF, label_backend="join"))
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, j)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_join_backend_matches_broadcast():
    from ray_extract.pipelines.dedup import pagerank_dup_graph

    b = _norm(pagerank_dup_graph(SF, edge_backend="broadcast"))
    j = _norm(pagerank_dup_graph(SF, edge_backend="join"))
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, j)


@pytest.mark.usefixtures("ray_session")
def test_pairs_memo_matches_fresh():
    from ray_extract.pipelines import dedup

    fresh = _norm(dedup.simhash_pairs(SF).to_pandas())
    memo1 = _norm(dedup.simhash_pairs_cached(SF).to_pandas())
    pd.testing.assert_frame_equal(fresh, memo1)
    # second call must return the SAME materialized dataset (no rebuild)
    assert dedup.simhash_pairs_cached(SF) is dedup.simhash_pairs_cached(SF)
    # params participate in the key
    assert dedup.simhash_pairs_cached(SF) is not dedup.simhash_pairs_cached(
        SF, max_hamming=2
    )


@pytest.mark.usefixtures("ray_session")
def test_clusters_memo_matches_fresh():
    from ray_extract.pipelines import dedup

    fresh = dedup.duplicate_clusters(SF).to_pandas()
    memo = dedup.duplicate_clusters_cached(SF).to_pandas()
    pd.testing.assert_frame_equal(
        fresh.sort_values("doc_id").reset_index(drop=True),
        memo.sort_values("doc_id").reset_index(drop=True),
    )
    # second call must return the SAME table (no re-propagation)
    assert dedup.duplicate_clusters_cached(SF) is \
        dedup.duplicate_clusters_cached(SF)
    # params participate in the key
    assert dedup.duplicate_clusters_cached(SF) is not \
        dedup.duplicate_clusters_cached(SF, max_iters=1)


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_join_backend_matches_broadcast():
    from ray_extract.pipelines.dedup import triangle_count

    b = _norm(triangle_count(SF, closure_backend="broadcast"))
    j = _norm(triangle_count(SF, closure_backend="join"))
    assert b["n_triangles"][0] > 0
    pd.testing.assert_frame_equal(b, j)
