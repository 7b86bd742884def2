"""Operator-level pipeline tests: dedup / similarity / events over tiny data.

The exhaustive pipeline-vs-SQL-oracle comparison lives in
tools/check_queries.py (the driver's gate); these tests pin key semantic
properties cheaply in the regular pytest run.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_exact_dedup_groups(ray_session):
    from ray_extract.pipelines.dedup import exact_dedup

    df = exact_dedup(SF).to_pandas()
    # sf documents are unique -> every group size 1, keep_id = the doc itself
    assert len(df) == 500
    assert (df.n_dups == 1).all()


def test_ngram_jaccard_symmetric_and_thresholded(ray_session):
    from ray_extract.pipelines.dedup import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(SF).to_pandas()
    assert (df.doc_a < df.doc_b).all()
    assert (2 * df.inter >= df.uni).all()
    assert (df.inter <= df.uni).all()


def test_minhash_candidates_superset_check(ray_session):
    from ray_extract.pipelines.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    cand = minhash_lsh_pairs(SF).to_pandas()
    assert (cand.doc_a < cand.doc_b).all()
    # high-Jaccard pairs should be recalled by LSH banding on this corpus
    exact = ngram_jaccard_pairs(SF, num=4, den=5).to_pandas()  # J >= 0.8
    cand_set = set(zip(cand.doc_a, cand.doc_b))
    for a, b in zip(exact.doc_a, exact.doc_b):
        assert (a, b) in cand_set


def test_ngram_shingle_df_cap_reduces_pairs(ray_session, tmp_path):
    """A stopword-heavy corpus pair-explodes through hot shingles; the
    document-frequency cap drops those shingles before pairing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ray_extract.pipelines.dedup import ngram_jaccard_pairs

    hot = "the cat sat"  # shared trigram across every doc
    docs = [f"{hot} unique{i} word{i} tail{i} more{i}" for i in range(12)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(12), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        tmp_path / "documents.parquet",
    )
    uncapped = ngram_jaccard_pairs(str(tmp_path), num=1, den=100).to_pandas()
    capped = ngram_jaccard_pairs(str(tmp_path), num=1, den=100, max_shingle_df=4).to_pandas()
    # every pair shares only the hot shingle -> uncapped finds all 66 pairs,
    # the df-cap (4 << 12 docs) removes it and with it every candidate
    assert len(uncapped) == 66
    assert len(capped) == 0


def test_simhash_hamming_bound(ray_session):
    from ray_extract.pipelines.dedup import simhash_pairs

    df = simhash_pairs(SF, max_hamming=2).to_pandas()
    assert (df.hamming <= 2).all()
    assert (df.doc_a < df.doc_b).all()


def test_ann_bruteforce_topk(ray_session):
    from ray_extract.pipelines.similarity import ann_bruteforce

    df = ann_bruteforce(SF, n_queries=3, k=4).to_pandas()
    assert set(df.query_id) == {0, 1, 2}
    for q in (0, 1, 2):
        g = df[df.query_id == q]
        assert list(g["rank"]) == [1, 2, 3, 4]
        assert q not in set(g.neighbor_id)  # self excluded


def test_ann_lsh_subset_of_corpus(ray_session):
    from ray_extract.pipelines.similarity import ann_lsh

    df = ann_lsh(SF, n_queries=5, k=3).to_pandas()
    assert (df["rank"] >= 1).all() and (df["rank"] <= 3).all()


def test_sessionize_gap_semantics(ray_session):
    import pandas as pd

    from ray_extract.pipelines.events import sessionize

    df = sessionize(SF, gap_minutes=30).to_pandas()
    assert (df.n_events >= 1).all()
    assert (df.end_ts >= df.start_ts).all()
    # sessions of one user are disjoint and separated by > gap
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("session_id")
        assert list(g.session_id) == list(range(1, len(g) + 1))
        prev_end = None
        for _, r in g.iterrows():
            if prev_end is not None:
                assert r.start_ts - prev_end > pd.Timedelta(minutes=30)
            prev_end = r.end_ts


def test_media_decoder_stub(ray_session):
    import pyarrow as pa
    import pytest

    from ray_extract.pipelines.media import MediaDecoder

    dec = MediaDecoder()
    batch = pa.table(
        {"doc_id": ["d"], "ord": pa.array([7], type=pa.int32()), "media_ref": ["media://d/7"]}
    )
    out = dec(batch)
    assert out.column("feature_hash").to_pylist()[0] == __import__("hashlib").md5(
        b"media://d/7"
    ).hexdigest()
    assert out.column("width").to_pylist()[0] == 64 + len("media://d/7") % 32
    with pytest.raises(NotImplementedError):
        dec.decode_bytes(b"\x89PNG")


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    from ray_extract.pipelines.similarity import ann_bruteforce, ann_ivf

    exact = ann_bruteforce(SF, n_queries=5, k=3).to_pandas()
    approx = ann_ivf(SF, n_queries=5, k=3, n_probe=4).to_pandas()
    assert (approx["rank"] >= 1).all() and (approx["rank"] <= 3).all()
    # deterministic: same result twice
    again = ann_ivf(SF, n_queries=5, k=3, n_probe=4).to_pandas()
    assert approx.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    # probing more buckets recovers at least some exact neighbors
    exact_set = set(zip(exact.query_id, exact.neighbor_id))
    approx_set = set(zip(approx.query_id, approx.neighbor_id))
    assert len(exact_set & approx_set) > 0


def test_asof_join_semantics(ray_session):
    """Every matched view is the latest view at-or-before the click, per user."""
    import pandas as pd

    from ray_extract.pipelines.events import asof_join

    df = asof_join(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ev[ev.event_type == "click"]
    views = ev[ev.event_type == "view"]
    assert len(df) == len(clicks)
    matched = df[df.view_id >= 0]
    assert (matched.view_ts <= matched.click_ts).all()
    # spot-check 20 rows against a brute-force per-row argmax
    for row in matched.head(20).itertuples():
        prior = views[(views.user_id == row.user_id) & (views.ts <= row.click_ts)]
        assert row.view_ts == prior.ts.max()
    # sentinel rows = users with no earlier view
    for row in df[df.view_id < 0].head(10).itertuples():
        prior = views[(views.user_id == row.user_id) & (views.ts <= row.click_ts)]
        assert prior.empty


def test_sentence_dedup_conservation(ray_session):
    """Kept chunks across the corpus == distinct chunks; per-doc totals add up."""
    from ray_extract.pipelines.dedup import sentence_dedup

    df = sentence_dedup(SF).to_pandas()
    assert len(df) == 500
    assert (df.n_kept <= df.n_chunks).all()
    # reassembled text uses only surviving chunks, in order: empty iff n_kept=0
    assert ((df.text_clean == "") == (df.n_kept == 0)).all()
    # global conservation: total kept == number of distinct chunks in corpus
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    chunks = set()
    for t in docs.text:
        ws = t.split(" ")
        for i in range(0, len(ws), 10):
            chunks.add(" ".join(ws[i : i + 10]))
    assert df.n_kept.sum() == len(chunks)


def test_bigram_counts_total(ray_session):
    from ray_extract.pipelines.text import bigram_counts

    df = bigram_counts(SF, k=10_000).to_pandas()
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    total = sum(len(t.split(" ")) - 1 for t in docs.text)
    assert df.n.sum() == total
    # deterministic ordering: n desc then bigram asc
    assert (df.n.values[:-1] >= df.n.values[1:]).all()


def test_top_docs_per_source_rank(ray_session):
    from ray_extract.pipelines.text import top_docs_per_source

    df = top_docs_per_source(SF).to_pandas()
    for src, g in df.groupby("source"):
        g = g.sort_values("rk")
        assert list(g.rk) == list(range(1, len(g) + 1))
        assert (g.n_tokens.values[:-1] >= g.n_tokens.values[1:]).all()


def test_range_window_matches_rows_window_when_gap_huge(ray_session):
    """With a window far wider than the data span, the RANGE window equals
    the user's full running prefix (peers included) at every event."""
    import duckdb

    from ray_extract.pipelines.events import range_window_stats

    sf = "/root/testdata/sf0.001"
    got = (
        range_window_stats(sf, gap_minutes=60 * 24 * 366)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""SELECT event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS win_n
            FROM '{sf}/events.parquet'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 400 DAY PRECEDING
                         AND CURRENT ROW)
            ORDER BY event_id"""
    ).df()
    assert (got["win_n"].to_numpy() == want["win_n"].to_numpy()).all()


def test_session_stats_consistent_with_sessionize(ray_session):
    from ray_extract.pipelines.events import session_stats, sessionize

    sf = "/root/testdata/sf0.001"
    sess = sessionize(sf).to_pandas()
    stats = session_stats(sf).to_pandas().set_index("user_id")
    by_user = sess.groupby("user_id")
    assert (stats["n_sessions"].sort_index()
            == by_user.size().sort_index()).all()
    assert (stats["n_events"].sort_index()
            == by_user["n_events"].sum().sort_index()).all()
    assert (stats["max_session_events"].sort_index()
            == by_user["n_events"].max().sort_index()).all()


def test_hopping_windows_double_count_events(ray_session):
    """Every event lands in exactly size/hop = 2 windows, so the total
    n_events across windows is exactly 2x the event count."""
    import pyarrow.parquet as pq

    from ray_extract.pipelines.events import hopping_window_counts

    sf = "/root/testdata/sf0.001"
    df = hopping_window_counts(sf).to_pandas()
    n_events = pq.read_metadata(f"{sf}/events.parquet").num_rows
    assert int(df["n_events"].sum()) == 2 * n_events
    # window starts are aligned to the 30-minute hop
    us = df["window_start"].astype("int64")
    assert (us % (30 * 60 * 1_000_000) == 0).all()


def test_degree_distribution_counts_pairs(ray_session):
    """Sum(degree * n_docs) must equal 2x the pair count (handshake)."""
    from ray_extract.pipelines.dedup import degree_distribution, simhash_pairs

    sf = "/root/testdata/sf0.001"
    n_pairs = simhash_pairs(sf).count()
    df = degree_distribution(sf).to_pandas()
    assert int((df["degree"] * df["n_docs"]).sum()) == 2 * n_pairs


def test_knn_classify_votes_bounds(ray_session):
    from ray_extract.pipelines.similarity import knn_classify

    sf = "/root/testdata/sf0.001"
    df = knn_classify(sf, n_queries=10, k=5).to_pandas()
    assert len(df) == 10
    assert (df["votes"] >= 1).all() and (df["votes"] <= 5).all()


def test_embedding_norm_stats_totals(ray_session):
    import pyarrow.parquet as pq

    from ray_extract.pipelines.similarity import embedding_norm_stats

    sf = "/root/testdata/sf0.001"
    df = embedding_norm_stats(sf).to_pandas()
    n = pq.read_metadata(f"{sf}/embeddings.parquet").num_rows
    assert int(df["n_vecs"].sum()) == n
    assert (df["max_qsq"] * df["n_vecs"] >= df["sum_qsq"]).all()


def test_hour_profile_covers_all_events(ray_session):
    import pyarrow.parquet as pq

    from ray_extract.pipelines.events import hour_of_day_profile

    sf = "/root/testdata/sf0.001"
    df = hour_of_day_profile(sf).to_pandas()
    n = pq.read_metadata(f"{sf}/events.parquet").num_rows
    assert int(df["n_events"].sum()) == n
    assert df["hour"].between(0, 23).all()


def test_funnel_is_monotone_and_windowed(ray_session):
    """Stage counts can only shrink down the funnel, and a huge window
    reduces to the pure sequence pattern (>= windowed counts)."""
    from ray_extract.pipelines.events import funnel_counts

    sf = "/root/testdata/sf0.001"
    tight = (
        funnel_counts(sf, window_hours=24)
        .to_pandas().set_index("stage_idx").sort_index()
    )
    assert (tight["n_users"].diff().dropna() <= 0).all()
    wide = (
        funnel_counts(sf, window_hours=24 * 365)
        .to_pandas().set_index("stage_idx").sort_index()
    )
    assert (wide["n_users"] >= tight["n_users"]).all()


def test_period_retention_matches_python(ray_session):
    import pyarrow.parquet as pq

    from ray_extract.pipelines.events import period_retention

    sf = "/root/testdata/sf0.001"
    got = (
        period_retention(sf).to_pandas().set_index("period").sort_index()
    )
    t = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "ts"])
    import collections

    active = collections.defaultdict(set)
    for u, ts in zip(t.column("user_id").to_pylist(), t.column("ts").to_pylist()):
        active[u].add(int(ts.timestamp() * 1_000_000) // 3_600_000_000)
    want = collections.Counter()
    for u, periods in active.items():
        for p in periods:
            if p + 1 in periods:
                want[p] += 1
    assert dict(got["n_retained"]) == dict(want)


def test_value_outliers_threshold_per_type(ray_session):
    import duckdb

    from ray_extract.pipelines.events import value_outliers

    sf = "/root/testdata/sf0.001"
    df = value_outliers(sf).to_pandas()
    thr = duckdb.sql(
        f"""SELECT event_type,
               CAST(quantile_disc(CAST(floor(value*100+0.5) AS BIGINT), 0.99)
                    AS BIGINT) AS thr
            FROM '{sf}/events.parquet' GROUP BY 1"""
    ).df().set_index("event_type")["thr"]
    for et, sub in df.groupby("event_type"):
        assert (sub["thr_cents"] == thr[et]).all()
        assert (sub["value_cents"] > thr[et]).all()


def test_markov_transition_totals(ray_session):
    """Each user contributes (n_events - 1) transitions: the global total
    must be n_events - n_users, and every (prev, curr) count positive."""
    import duckdb

    from ray_extract.pipelines.events import markov_transitions

    sf = "/root/testdata/sf0.001"
    df = markov_transitions(sf).to_pandas()
    n_ev, n_us = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()
    assert int(df["n"].sum()) == int(n_ev) - int(n_us)
    assert (df["n"] > 0).all()


def test_wau_rolling_spot_weeks(ray_session):
    """The trailing-4-week distinct count must equal a direct DISTINCT over
    the window, for every emitted week."""
    import duckdb

    from ray_extract.pipelines.events import wau_rolling

    sf = "/root/testdata/sf0.001"
    df = wau_rolling(sf).to_pandas().set_index("week")["wau"]
    want = duckdb.sql(
        f"""WITH uw AS (SELECT DISTINCT user_id,
                 epoch_us(ts)//CAST(604800000000 AS BIGINT) w
                 FROM '{sf}/events.parquet')
            SELECT a.w + 3 AS week, count(DISTINCT b.user_id) wau
            FROM (SELECT DISTINCT w FROM uw) a
            JOIN uw b ON b.w BETWEEN a.w AND a.w + 3
            GROUP BY 1"""
    ).df().set_index("week")["wau"]
    for wk, v in want.items():
        assert int(df[wk]) == int(v)


def test_props_extraction_exact(ray_session):
    """RE2 extraction must hit every row and reproduce DuckDB's json sums."""
    import duckdb

    from ray_extract.pipelines.events import props_value_stats

    sf = "/root/testdata/sf0.001"
    df = props_value_stats(sf).to_pandas()
    assert (df["n"] == df["n_extracted"]).all()
    want = duckdb.sql(
        f"""SELECT event_type, CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) s
            FROM '{sf}/events.parquet' GROUP BY 1"""
    ).df().set_index("event_type")["s"]
    got = df.set_index("event_type")["sum_k"]
    for et, v in want.items():
        assert int(got[et]) == int(v)


def test_customer_spend_ntile_tile_sizes(ray_session):
    """Tile sizes follow DuckDB's NTILE rule (first n%t tiles get one
    extra) and tiles are ordered by spend."""
    from ray_extract.pipelines.relational import customer_spend_ntile

    sf = "/root/testdata/sf0.001"
    df = customer_spend_ntile(sf).to_pandas()
    n = len(df)
    q, r = divmod(n, 4)
    sizes = df.groupby("quartile").size()
    for t in range(1, 5):
        assert sizes[t] == q + (1 if t <= r else 0)
    # max spend of tile t never exceeds min spend of tile t+1
    mx = df.groupby("quartile")["spend_cents"].max()
    mn = df.groupby("quartile")["spend_cents"].min()
    for t in range(1, 4):
        assert mx[t] <= mn[t + 1]


def test_pivot_hour_type_mass(ray_session):
    """24 rows; the wide counts sum to the event count."""
    import duckdb

    from ray_extract.pipelines.events import pivot_hour_type

    sf = "/root/testdata/sf0.001"
    df = pivot_hour_type(sf).to_pandas()
    assert len(df) == 24
    total = int(df.drop(columns=["hour"]).to_numpy().sum())
    want = duckdb.sql(f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    assert total == int(want)


def test_time_to_first_purchase_semantics(ray_session):
    """delta_us is -1 exactly for users with no purchase; non-negative
    otherwise; one row per user."""
    import duckdb

    from ray_extract.pipelines.events import time_to_first_purchase

    sf = "/root/testdata/sf0.001"
    df = time_to_first_purchase(sf).to_pandas()
    n_users, n_buyers = duckdb.sql(
        f"""SELECT count(DISTINCT user_id),
               count(DISTINCT user_id) FILTER (event_type = 'purchase')
            FROM '{sf}/events.parquet'"""
    ).fetchone()
    assert len(df) == int(n_users)
    assert int((df["delta_us"] >= 0).sum()) == int(n_buyers)
    assert ((df["delta_us"] >= 0) | (df["delta_us"] == -1)).all()


def test_zscore_outliers_exact_predicate(ray_session):
    """Flag set must equal the exact integer predicate
    (n*v - s)^2 > 4*(n*m2 - s^2) evaluated in Python bigints."""
    import duckdb

    from ray_extract.pipelines.events import zscore_outliers

    sf = "/root/testdata/sf0.001"
    got = set(zscore_outliers(sf).to_pandas()["event_id"])
    rows = duckdb.sql(
        f"""SELECT event_id, event_type, CAST(floor(value*100+0.5) AS BIGINT)
            FROM '{sf}/events.parquet'"""
    ).fetchall()
    from collections import defaultdict
    mom = defaultdict(lambda: [0, 0, 0])
    for _, et, vc in rows:
        m = mom[et]
        m[0] += 1
        m[1] += int(vc)
        m[2] += int(vc) * int(vc)
    want = {
        eid
        for eid, et, vc in rows
        if (mom[et][0] * int(vc) - mom[et][1]) ** 2
        > 4 * (mom[et][0] * mom[et][2] - mom[et][1] ** 2)
    }
    assert got == want
    assert len(want) > 0


def test_triangle_count_bounds(ray_session):
    """Wedge/triangle invariants on the real dup graph: every triangle is a
    closed wedge, wedges = sum over apexes of C(out_degree, 2)."""
    from ray_extract.pipelines.dedup import triangle_count

    sf = "/root/testdata/sf0.001"
    row = triangle_count(sf).to_pandas().iloc[0]
    assert 0 < row["n_triangles"] <= row["n_wedges"]
    assert row["n_edges"] > 0


def test_approx_quantiles_hist_brackets_exact(ray_session):
    """Each sketch estimate must be within one bin width below the exact
    quantile (lower bin edge rule)."""
    import duckdb

    from ray_extract.pipelines.events import approx_quantiles_hist

    sf = "/root/testdata/sf0.001"
    df = approx_quantiles_hist(sf).to_pandas().set_index("event_type")
    for p in (50, 90, 99):
        exact = duckdb.sql(
            f"""SELECT event_type,
                   CAST(quantile_disc(CAST(floor(value*100+0.5) AS BIGINT),
                        {p / 100}) AS BIGINT) q
                FROM '{sf}/events.parquet' GROUP BY 1"""
        ).df().set_index("event_type")["q"]
        for et in df.index:
            est = int(df.loc[et, f"p{p}_cents"])
            assert est <= int(exact[et]) < est + 8, (et, p, est, exact[et])


def test_session_conversion_consistent_with_sessionize(ray_session):
    """Session totals must match sessionize; converting <= total; sum of
    converting equals sessions containing a purchase (python recheck)."""
    import pandas as pd

    from ray_extract.pipelines.events import session_conversion, sessionize

    sf = "/root/testdata/sf0.001"
    df = session_conversion(sf).to_pandas().set_index("user_id")
    sess = sessionize(sf).to_pandas().groupby("user_id").size()
    assert (df["n_sessions"].sort_index().values == sess.sort_index().values).all()
    assert (df["n_converting"] <= df["n_sessions"]).all()
    # brute-force one user
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    uid = int(df.index[0])
    g = ev[ev.user_id == uid].sort_values("ts")
    sid, prev, conv = 0, None, set()
    for r in g.itertuples():
        if prev is None or (r.ts - prev).total_seconds() > 1800:
            sid += 1
        if r.event_type == "purchase":
            conv.add(sid)
        prev = r.ts
    assert int(df.loc[uid, "n_sessions"]) == sid
    assert int(df.loc[uid, "n_converting"]) == len(conv)


def test_norm_minmax_bounds(ray_session):
    """Scaled values span [0, 1000); per-label min maps to 0 and max to
    (range*1000)//range = 1000 only when qsq == mx exactly."""
    from ray_extract.pipelines.similarity import norm_minmax_scaled

    sf = "/root/testdata/sf0.001"
    df = norm_minmax_scaled(sf).to_pandas()
    assert (df["scaled_permille"] >= 0).all()
    assert (df["scaled_permille"] <= 1000).all()
    for lab, g in df.groupby("label"):
        mn, mx = g["qsq"].min(), g["qsq"].max()
        assert int(g.loc[g["qsq"] == mn, "scaled_permille"].iloc[0]) == 0
        if mx > mn:
            assert int(g.loc[g["qsq"] == mx, "scaled_permille"].iloc[0]) == 1000


def test_nation_actor_counts_mass(ray_session):
    """Customer and supplier totals are conserved through the union."""
    import duckdb

    from ray_extract.pipelines.relational import nation_actor_counts

    sf = "/root/testdata/sf0.001"
    df = nation_actor_counts(sf).to_pandas()
    nc, ns = duckdb.sql(
        f"""SELECT (SELECT count(*) FROM '{sf}/customer.parquet'),
                   (SELECT count(*) FROM '{sf}/supplier.parquet')"""
    ).fetchone()
    assert int(df["n_customers"].sum()) == int(nc)
    assert int(df["n_suppliers"].sum()) == int(ns)
    assert df["n_nationkey"].is_unique


def test_blocked_linkage_within_blocks_only(ray_session):
    """Linked pairs share the 8-char blocking prefix, pass the length
    filter, and meet the exact Jaccard threshold."""
    import pandas as pd

    from ray_extract.pipelines.dedup import blocked_linkage

    sf = "/root/testdata/sf0.001"
    df = blocked_linkage(sf).to_pandas()
    assert (df["doc_a"] < df["doc_b"]).all()
    assert (2 * df["inter"] >= df["uni"]).all()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    for r in df.head(25).itertuples():
        ta, tb = docs.loc[r.doc_a, "text"], docs.loc[r.doc_b, "text"]
        assert ta[:8] == tb[:8]
        wa, wb = set(ta.split(" ")), set(tb.split(" "))
        assert abs(len(wa) - len(wb)) <= 2
        assert len(wa & wb) == r.inter
        assert len(wa | wb) == r.uni


def test_forecast_revenue_matches_brute(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import forecast_revenue

    sf = "/root/testdata/sf0.001"
    row = forecast_revenue(sf).to_pandas().iloc[0]
    n, rev = duckdb.sql(
        f"""SELECT count(*), CAST(coalesce(sum(
               CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
               * CAST(floor(l_discount*100+0.5) AS BIGINT)), 0) AS BIGINT)
            FROM '{sf}/lineitem.parquet'
            WHERE l_quantity < 24
              AND CAST(floor(l_discount*100+0.5) AS BIGINT) BETWEEN 5 AND 7"""
    ).fetchone()
    assert int(row["n_items"]) == int(n)
    assert int(row["revenue_x10000"]) == int(rev)


def test_dense_hourly_series_contiguous(ray_session):
    """Rows cover every hour between min and max with no gaps; counts sum
    to the event count."""
    import duckdb

    from ray_extract.pipelines.events import dense_hourly_series

    sf = "/root/testdata/sf0.001"
    df = dense_hourly_series(sf).to_pandas().sort_values("window_start")
    deltas = df["window_start"].diff().dropna().dt.total_seconds()
    assert (deltas == 3600).all()
    n = duckdb.sql(f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    assert int(df["n_events"].sum()) == int(n)
    assert (df["n_events"] == 0).any() or len(df) > 0


def test_pagerank_mass_and_floor(ray_session):
    """Every rank >= the damping floor 150000; hub nodes (higher degree of
    high-rank neighbors) rank above the floor; deterministic across runs."""
    from ray_extract.pipelines.dedup import pagerank_dup_graph

    sf = "/root/testdata/sf0.001"
    df = pagerank_dup_graph(sf).to_pandas()
    assert (df["rank"] >= 150000).all()
    assert (df["rank"] > 150000).any()
    again = pagerank_dup_graph(sf).to_pandas()
    key = ["doc_id"]
    assert df.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_dwell_times_sentinels(ray_session):
    """Each user has exactly one -1 dwell (their last event); non-negative
    otherwise; next_type empty iff dwell is -1."""
    import duckdb

    from ray_extract.pipelines.events import dwell_times

    sf = "/root/testdata/sf0.001"
    df = dwell_times(sf).to_pandas()
    last = df[df["dwell_us"] == -1]
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    assert len(last) == int(n_users)
    assert ((df["next_type"] == "") == (df["dwell_us"] == -1)).all()
    assert (df.loc[df["dwell_us"] != -1, "dwell_us"] >= 0).all()


def test_session_paths_chars_and_counts(ray_session):
    """Paths use only the five type initials, lengths capped at 8, and the
    top path count is bounded by the session count."""
    from ray_extract.pipelines.events import session_paths, sessionize

    sf = "/root/testdata/sf0.001"
    df = session_paths(sf, k=50).to_pandas()
    assert (df["path"].str.len() <= 8).all()
    assert df["path"].str.match(r"^[cepsv]+$").all()
    n_sessions = len(sessionize(sf).to_pandas())
    assert df["n_sessions"].sum() <= n_sessions
    assert df["n_sessions"].max() >= 1


def test_brand_band_disjunction(ray_session):
    """Only the three named brands appear, and each count matches a direct
    per-brand band query."""
    import duckdb

    from ray_extract.pipelines.relational import brand_band_revenue

    sf = "/root/testdata/sf0.001"
    df = brand_band_revenue(sf).to_pandas().set_index("p_brand")
    assert set(df.index) <= {"Brand#1", "Brand#2", "Brand#3"}
    for brand, lo, hi in (("Brand#1", 1, 11), ("Brand#2", 10, 20),
                          ("Brand#3", 20, 30)):
        n = duckdb.sql(
            f"""SELECT count(*) FROM '{sf}/lineitem.parquet' l
                JOIN '{sf}/part.parquet' p ON p.p_partkey = l.l_partkey
                WHERE p.p_brand = '{brand}'
                  AND l.l_quantity BETWEEN {lo} AND {hi}"""
        ).fetchone()[0]
        if int(n):
            assert int(df.loc[brand, "n_items"]) == int(n)


def test_gram_matrix_symmetry_and_diag(ray_session):
    """Diagonal entries are sums of squares (non-negative); the pair grid
    is the full upper triangle per label."""
    from ray_extract.pipelines.similarity import embedding_gram_pairs

    sf = "/root/testdata/sf0.001"
    df = embedding_gram_pairs(sf).to_pandas()
    diag = df[df["i"] == df["j"]]
    assert (diag["sum_qq"] >= 0).all()
    for _, g in df.groupby("label"):
        assert len(g) == 36  # C(8,2) + 8


def test_canonical_selection_quality_rule(ray_session):
    """The kept doc has the max token count in its cluster (doc_id breaks
    ties); member counts sum to the clustered-doc total."""
    import pandas as pd

    from ray_extract.pipelines.dedup import canonical_selection, duplicate_clusters

    sf = "/root/testdata/sf0.001"
    df = canonical_selection(sf).to_pandas()
    cl = duplicate_clusters(sf).to_pandas()
    assert int(df["n_members"].sum()) == len(cl)
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    toks = docs["text"].str.split(" ").str.len()
    merged = cl.merge(df, on="cluster_id")
    for cid, g in merged.groupby("cluster_id"):
        keep = int(g["keep_id"].iloc[0])
        best = toks[g["doc_id"]].max()
        assert toks[keep] == best
        winners = [d for d in g["doc_id"] if toks[d] == best]
        assert keep == min(winners)


def test_session_assignment_consistent_with_sessionize(ray_session):
    """Per-user max session_id equals sessionize's session count; every
    event is assigned."""
    import duckdb

    from ray_extract.pipelines.events import session_assignment, sessionize

    sf = "/root/testdata/sf0.001"
    df = session_assignment(sf).to_pandas()
    n = duckdb.sql(f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    assert len(df) == int(n)
    per_user = df.groupby("user_id")["session_id"].max()
    want = sessionize(sf).to_pandas().groupby("user_id").size()
    assert (per_user.sort_index().values == want.sort_index().values).all()


def test_frame_sampler_stride_and_bounds(ray_session):
    """Sampled frame indices step by stride and stay below the per-ref
    frame count; frame_ref encodes the index."""
    import pyarrow as pa

    from ray_extract.pipelines.media import FrameSampler

    s = FrameSampler(stride=3)
    batch = pa.table(
        {
            "doc_id": ["a", "b"],
            "ord": pa.array([1, 2], type=pa.int32()),
            "media_ref": ["media://a/1", "media://bb/2x"],
        }
    )
    out = s(batch).to_pandas()
    for ref, g in out.groupby("media_ref"):
        nf = 8 + len(ref) % 8
        idx = sorted(g["frame_idx"])
        assert idx == list(range(0, nf, 3))
        for r in g.itertuples():
            assert r.frame_ref == f"{ref}#f{r.frame_idx}"
            assert r.pts_ms == r.frame_idx * 40


def test_winsorized_stats_bounds(ray_session):
    """Winsorized sum lies between n*lo and n*hi; clamp counts match the
    direct threshold comparison."""
    import duckdb

    from ray_extract.pipelines.events import winsorized_stats

    sf = "/root/testdata/sf0.001"
    df = winsorized_stats(sf).to_pandas().set_index("event_type")
    assert (df["sum_wins_cents"] >= df["n"] * df["lo_cents"]).all()
    assert (df["sum_wins_cents"] <= df["n"] * df["hi_cents"]).all()
    for et, r in df.iterrows():
        nlo, nhi = duckdb.sql(
            f"""SELECT count(*) FILTER (CAST(floor(value*100+0.5) AS BIGINT)
                   < {int(r['lo_cents'])}),
                   count(*) FILTER (CAST(floor(value*100+0.5) AS BIGINT)
                   > {int(r['hi_cents'])})
                FROM '{sf}/events.parquet' WHERE event_type = '{et}'"""
        ).fetchone()
        assert int(r["n_clamped_lo"]) == int(nlo)
        assert int(r["n_clamped_hi"]) == int(nhi)


def test_jaccard_prefix_equals_full_index(ray_session):
    """The prefix-filtered join must produce EXACTLY the inverted-index
    pipeline's result (completeness of prefix filtering under a global
    hash order)."""
    from ray_extract.pipelines.dedup import jaccard_prefix_join, ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    key = ["doc_a", "doc_b"]
    a = jaccard_prefix_join(sf).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        ngram_jaccard_pairs(sf).to_pandas()[["doc_a", "doc_b", "inter", "uni"]]
        .sort_values(key).reset_index(drop=True)
    )
    assert a.equals(b)


def test_cohort_matrix_mass(ray_session):
    """weeks_since=0 row counts every user once; totals equal distinct
    (user, week) pairs."""
    import duckdb

    from ray_extract.pipelines.events import cohort_matrix

    sf = "/root/testdata/sf0.001"
    df = cohort_matrix(sf).to_pandas()
    n_users, n_pairs = duckdb.sql(
        f"""SELECT count(DISTINCT user_id),
               count(DISTINCT (user_id, epoch_us(ts)//CAST(604800000000 AS BIGINT)))
            FROM '{sf}/events.parquet'"""
    ).fetchone()
    assert int(df.loc[df["weeks_since"] == 0, "n_users"].sum()) == int(n_users)
    assert int(df["n_users"].sum()) == int(n_pairs)
    assert (df["weeks_since"] >= 0).all()


def test_longest_run_brute_force_one_user(ray_session):
    """Engine's longest run matches a per-user python re-derivation."""
    import pandas as pd

    from ray_extract.pipelines.events import longest_type_run

    sf = "/root/testdata/sf0.001"
    df = longest_type_run(sf).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    for uid in list(df.index)[:5]:
        g = ev[ev.user_id == uid].sort_values(["ts", "event_id"])
        best_len, best_type, cur_len, cur_type = 0, None, 0, None
        for t in g["event_type"]:
            cur_len = cur_len + 1 if t == cur_type else 1
            cur_type = t
            if cur_len > best_len:
                best_len, best_type = cur_len, t
        assert int(df.loc[uid, "run_len"]) == best_len
        assert df.loc[uid, "run_type"] == best_type


def test_centroid_spread_identity(ray_session):
    """spread_xn2 / n^2 equals the brute-force sum of squared distances to
    the quantized centroid (checked in exact rational arithmetic)."""
    import pandas as pd
    from fractions import Fraction

    from ray_extract.pipelines.similarity import centroid_spread

    sf = "/root/testdata/sf0.001"
    df = centroid_spread(sf).to_pandas().set_index("label")
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    for lab in list(df.index)[:3]:
        vs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in
             emb.loc[emb.label == lab, "embedding"]]
        )
        q = np.floor(vs * 1000.0 + 0.5).astype(object)  # exact python ints
        n = len(q)
        cent = [Fraction(int(sum(q[:, i])), n) for i in range(q.shape[1])]
        brute = sum(
            sum((Fraction(int(q[v, i])) - cent[i]) ** 2
                for i in range(q.shape[1]))
            for v in range(n)
        )
        assert Fraction(int(df.loc[lab, "spread_xn2"]), n * n) == brute
        assert int(df.loc[lab, "n_vecs"]) == n


def test_attribution_pairs_cover_all_users(ray_session):
    """Every user contributes exactly one (first, last) pair."""
    import pandas as pd

    from ray_extract.pipelines.events import attribution_first_last

    sf = "/root/testdata/sf0.001"
    df = attribution_first_last(sf).to_pandas()
    n_users = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])[
        "user_id"
    ].nunique()
    assert int(df["n_users"].sum()) == n_users


def test_bounce_rate_bounded_and_counts_sessions(ray_session):
    from ray_extract.pipelines.events import bounce_rate, sessionize

    sf = "/root/testdata/sf0.001"
    df = bounce_rate(sf).to_pandas()
    assert (df["n_bounces"] <= df["n_sessions"]).all()
    assert (df["bounce_ppm"] <= 1_000_000).all()
    sess = sessionize(sf).to_pandas()
    assert int(df["n_sessions"].sum()) == len(sess)
    assert int(df["n_bounces"].sum()) == int((sess["n_events"] == 1).sum())


def test_zipf_profile_rank_is_monotone(ray_session):
    from ray_extract.pipelines.text import zipf_profile

    df = zipf_profile("/root/testdata/sf0.001").to_pandas()
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    assert (np.diff(df["n"].to_numpy()) <= 0).all()


def test_hapax_ratio_brute_force_one_source(ray_session):
    from ray_extract.pipelines.text import hapax_ratio

    sf = "/root/testdata/sf0.001"
    df = hapax_ratio(sf).to_pandas().set_index("source")
    import pandas as pd
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["source", "text"])
    src = df.index[0]
    from collections import Counter

    c = Counter(
        w for t in docs.loc[docs.source == src, "text"] for w in t.split(" ")
    )
    assert int(df.loc[src, "n_vocab"]) == len(c)
    assert int(df.loc[src, "n_hapax"]) == sum(1 for v in c.values() if v == 1)


def test_kmeans_update_consistent_with_assign(ray_session):
    """The update step's member counts must equal the assign step's, and
    component sums must be bounded by clip * n."""
    from ray_extract.pipelines.similarity import kmeans_assign, kmeans_update

    sf = "/root/testdata/sf0.001"
    upd = kmeans_update(sf).to_pandas()
    asg = kmeans_assign(sf).to_pandas().set_index("centroid_id")
    per_c = upd.groupby("centroid_id")["n_assigned"].first()
    for cid, n in per_c.items():
        assert int(asg.loc[cid, "n_assigned"]) == int(n)
    assert (upd["sum_q"].abs() <= 31 * upd["n_assigned"]).all()


def test_bigram_novelty_first_doc_is_fully_novel(ray_session):
    """The smallest doc_id sees every one of its bigrams first."""
    from ray_extract.pipelines.text import bigram_novelty

    df = bigram_novelty(SF).to_pandas().sort_values("doc_id")
    first = df.iloc[0]
    assert int(first["n_novel"]) == int(first["n_bigrams"])
    assert int(first["novelty_ppm"]) == 1_000_000
    assert (df["n_novel"] <= df["n_bigrams"]).all()


def test_source_mixture_weights_rebalance(ray_session):
    """weight * share ~= 1e6/k for every source (exact up to floor)."""
    from ray_extract.pipelines.text import source_mixture_weights

    df = source_mixture_weights(SF).to_pandas()
    k = len(df)
    total = int(df["n_docs"].sum())
    for _, r in df.iterrows():
        assert int(r["weight_ppm"]) == total * 1_000_000 // (k * int(r["n_docs"]))
    assert abs(int(df["share_ppm"].sum()) - 1_000_000) < k


def test_late_event_stats_brute_force_one_user(ray_session):
    import pandas as pd

    from ray_extract.pipelines.events import late_event_stats

    df = late_event_stats(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    n_late = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("event_id")
        prev = g["ts"].cummax().shift(1)
        n_late += int((g["ts"] < prev).sum())
    assert int(df["n_late"].sum()) == n_late
    assert int(df["n_events"].sum()) == len(ev)


def test_event_dedup_hourly_cells_bounded(ray_session):
    import pandas as pd

    from ray_extract.pipelines.events import event_dedup_hourly

    df = event_dedup_hourly(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert int(df["n_events"].sum()) == len(ev)
    assert (df["n_cells"] <= df["n_events"]).all()
    want = (
        ev.assign(hour=ev["ts"].astype("int64") // 3_600_000_000)
        .groupby("event_type")
        .apply(lambda g: g[["user_id", "hour"]].drop_duplicates().shape[0],
               include_groups=False)
    )
    got = df.set_index("event_type")["n_cells"]
    for t_, v in want.items():
        assert int(got[t_]) == int(v)


def test_nation_share_sums_to_million_per_region(ray_session):
    from ray_extract.pipelines.relational import nation_share_in_region

    df = nation_share_in_region(SF).to_pandas()
    for _, g in df.groupby("r_name"):
        # floor division loses at most |nations-in-region|-1 ppm
        assert 1_000_000 - len(g) < int(g["share_ppm"].sum()) <= 1_000_000


def test_supplier_hhi_bounds(ray_session):
    """HHI in ppm is at most 1e6 (monopoly) and at least 1e6/n."""
    from ray_extract.pipelines.relational import supplier_hhi

    df = supplier_hhi(SF).to_pandas()
    for _, r in df.iterrows():
        n = int(r["n_suppliers"])
        assert int(r["hhi_ppm"]) <= 1_000_000
        assert int(r["hhi_ppm"]) >= 1_000_000 // n - n  # floor slack


def test_anomalous_days_trailing_sums(ray_session):
    import pandas as pd

    from ray_extract.pipelines.events import anomalous_days

    df = anomalous_days(SF).to_pandas().sort_values("day").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    daily = (
        ev["ts"].astype("int64").floordiv(86_400_000_000).value_counts().sort_index()
    )
    dense = daily.reindex(
        range(daily.index.min(), daily.index.max() + 1), fill_value=0
    )
    vals = dense.to_numpy()
    cs = np.r_[0, np.cumsum(vals)]
    for i, (_, r) in enumerate(df.iterrows()):
        j = i + 7
        assert int(r["n_events"]) == int(vals[j])
        assert int(r["trailing_sum"]) == int(cs[j] - cs[j - 7])
        assert int(r["is_anomaly"]) == int(vals[j] * 7 > 2 * (cs[j] - cs[j - 7]))


def test_label_centroid_similarity_selfconsistent(ray_session):
    from ray_extract.pipelines.similarity import label_centroid_similarity

    df = label_centroid_similarity(SF).to_pandas()
    assert (df["label_a"] < df["label_b"]).all()
    assert (df["cos2_ppb"] >= 0).all() and (df["cos2_ppb"] <= 1_000_000_000).all()
    k = df["label_a"].nunique() + 1
    assert len(df) == k * (k - 1) // 2


def test_segment_recency_ordering_invariants(ray_session):
    from ray_extract.pipelines.relational import segment_recency

    df = segment_recency(SF).to_pandas()
    assert (df["min_days"] <= df["avg_days"]).all()
    assert (df["avg_days"] <= df["max_days"]).all()
    assert int(df["min_days"].min()) == 0  # some segment holds the latest order


def test_user_activity_quartiles_partition_users(ray_session):
    import pandas as pd

    from ray_extract.pipelines.events import user_activity_quartiles

    df = user_activity_quartiles(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    assert int(df["n_users"].sum()) == ev["user_id"].nunique()
    assert int(df["n_events"].sum()) == len(ev)
    assert int(df["n_purchases"].sum()) == int((ev["event_type"] == "purchase").sum())
    # later quartiles hold more-active users: per-user mean activity rises
    mean_act = df["n_events"] / df["n_users"]
    assert (np.diff(mean_act.to_numpy()) >= 0).all()


def test_pair_cosine_profile_counts_all_pairs(ray_session):
    import pandas as pd

    from ray_extract.pipelines.similarity import pair_cosine_profile

    df = pair_cosine_profile(SF).to_pandas()
    n_vecs = len(pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id"]))
    assert int(df["n_pairs"].sum()) == n_vecs // 2
    assert df["bucket"].between(-100, 100).all()


def test_time_weighted_value_mass(ray_session):
    """Total dwell mass equals sum of (n_i - 1) gaps over users, and the
    weighted average sits inside the per-type cents range."""
    import pandas as pd

    from ray_extract.pipelines.events import time_weighted_value

    df = time_weighted_value(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    n_users = ev["user_id"].nunique()
    assert int(df["n_weighted"].sum()) == len(ev) - n_users
    total_span = (
        ev.groupby("user_id")["ts"].agg(lambda s: s.max() - s.min()).sum()
    )
    assert int(df["sum_dwell_us"].sum()) * 1000 == int(total_span.value)
