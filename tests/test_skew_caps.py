"""Hot-key skew caps: blocked_linkage.max_block_df and tfidf's distributed
vocabulary join — the knobs that keep adversarial/web-scale corpora from
making one bucket quadratic or one node vocabulary-resident.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def hot_prefix_corpus(tmp_path_factory):
    """30 docs share one boilerplate prefix + word set (the adversarial hot
    block); 6 docs form three genuine near-pair groups under other
    prefixes."""
    d = tmp_path_factory.mktemp("hot_prefix")
    rows = []
    for i in range(30):
        rows.append((i, f"BOILERPL shared words alpha beta gamma tail{i}"))
    for j, p in enumerate(["aardvark", "brontosa", "cassowar"]):
        rows.append((100 + 2 * j, f"{p} unique pair text {p}"))
        rows.append((101 + 2 * j, f"{p} unique pair text {p}"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_blocked_linkage_hot_block_cap(hot_prefix_corpus):
    from ray_extract.pipelines.dedup import blocked_linkage

    uncapped = blocked_linkage(hot_prefix_corpus).to_pandas()
    # the boilerplate block pairs quadratically: C(30,2) = 435 hot pairs
    hot = uncapped[uncapped["doc_a"] < 100]
    assert len(hot) == 435
    capped = blocked_linkage(hot_prefix_corpus, max_block_df=10).to_pandas()
    # hot (prefix, word) keys (df=30 > 10) are dropped before pairing;
    # the three genuine pairs (df=2 per key) survive untouched
    assert (capped["doc_a"] >= 100).all()
    want = uncapped[uncapped["doc_a"] >= 100]
    got = capped.sort_values("doc_a").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("doc_a").reset_index(drop=True)
    )
    assert len(got) == 3


@pytest.mark.usefixtures("ray_session")
def test_tfidf_join_backend_matches_broadcast():
    from ray_extract.pipelines.text import tfidf_top_terms

    def norm(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    b = norm(tfidf_top_terms("/root/testdata/sf0.001", vocab_backend="broadcast"))
    j = norm(tfidf_top_terms("/root/testdata/sf0.001", vocab_backend="join"))
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, j)


@pytest.mark.usefixtures("ray_session")
def test_web_scale_profile_one_switch(hot_prefix_corpus):
    """The single profile switch must flip BOTH the skew caps and the
    graph backends without any per-call keyword."""
    from ray_extract import profile
    from ray_extract.pipelines.dedup import blocked_linkage, duplicate_clusters

    sf = "/root/testdata/sf0.001"
    exact_clusters = duplicate_clusters(sf).to_pandas()
    try:
        profile.set_profile("web")
        assert profile.active_profile().name == "web"
        # caps ON by default: the 30-doc boilerplate block (df=30 < the web
        # default 1000) still pairs, but an explicit low-cap profile drops it
        profile.set_profile(profile.ScaleProfile(
            "web-tight", max_shingle_df=10, max_block_df=10,
            graph_backend="join"))
        capped = blocked_linkage(hot_prefix_corpus).to_pandas()
        assert (capped["doc_a"] >= 100).all() and len(capped) == 3
        # backends forced to join: same cluster labels, no broadcast state
        web_clusters = duplicate_clusters(sf).to_pandas()
    finally:
        profile.set_profile(None)
    assert profile.active_profile().name == "exact"

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(exact_clusters), norm(web_clusters))
