"""Semantic pins for the shuffle/sampling-audit batch beyond oracle
parity: negative draws cover k per anchor, the bucket-carry rank is a
true permutation, and identity ordering yields zero displacement.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_negative_draws_exactly_k(ray_session):
    import duckdb

    from ray_extract.pipelines.layout import negative_sampling_audit

    df = negative_sampling_audit(SF, k=4).to_pandas()
    counts = duckdb.sql(
        f"SELECT source, count(*) AS n FROM '{SF}/documents.parquet' "
        "GROUP BY 1"
    ).df().set_index("source")["n"]
    for _, r in df.iterrows():
        assert int(r["n_negatives"]) == int(counts[r["source"]]) * 4
        assert 0 <= int(r["n_self"]) <= int(r["n_negatives"])
        assert int(r["n_same_source"]) <= int(r["n_negatives"])


def test_shuffle_rank_is_permutation(ray_session):
    import duckdb

    from ray_extract.pipelines.layout import shuffle_displacement_audit

    df = shuffle_displacement_audit(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert int(df["n_docs"].sum()) == n
    # a real shuffle moves mass: average displacement should be a large
    # fraction of n (uniform permutation expectation is n/3)
    assert int(df["sum_displacement"].sum()) > n * n // 10
    assert int(df["max_displacement"].max()) < n


def test_top_spenders_includes_all_ties(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import nation_top_spenders_ties

    df = nation_top_spenders_ties(SF).to_pandas()
    # one or more rows per nation; all rows of a nation share the max
    for nk, g in df.groupby("nationkey"):
        assert g["spend_cents"].nunique() == 1
    # the global maximum spender is present
    top = duckdb.sql(f"""
      SELECT o_custkey FROM (SELECT o_custkey,
        sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS s
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY s DESC LIMIT 1)
    """).fetchone()[0]
    assert top in set(df["c_custkey"])


def test_k_anonymity_closure(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import k_anonymity_audit

    df = k_anonymity_audit(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/customer.parquet'"
    ).fetchone()[0]
    assert int(df["n_customers"].sum()) == n
    # at-risk mass only appears in bands whose sizes can be < k=5
    assert (df[df["size_band"] >= 3]["at_risk"] == 0).all()


def test_l_diversity_closure(ray_session):
    import duckdb

    from ray_extract.pipelines.mlstats import l_diversity_audit

    df = l_diversity_audit(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/customer.parquet'"
    ).fetchone()[0]
    assert int(df["n_customers"].sum()) == n
    segs = duckdb.sql(
        f"SELECT count(DISTINCT c_mktsegment) "
        f"FROM '{SF}/customer.parquet'"
    ).fetchone()[0]
    assert int(df["n_segments"].max()) <= segs


def test_venn_regions_partition_shingle_union(ray_session):
    import duckdb

    from ray_extract.pipelines.text import vocab_venn_counts

    df = vocab_venn_counts(SF).to_pandas()
    assert set(df["mask"]).issubset(set(range(1, 8)))
    union = duckdb.sql(f"""
      WITH d AS (SELECT string_split(text,' ') AS ws
                 FROM '{SF}/documents.parquet'
                 WHERE source IN ('src0','src1','src2'))
      SELECT count(DISTINCT array_to_string(ws[u.i:u.i+2],' '))
      FROM d, unnest(range(1, len(ws)-1)) AS u(i)
    """).fetchone()[0]
    assert int(df["n_tokens"].sum()) == union


def test_orphans_complement_window_join(ray_session):
    from ray_extract.pipelines.events import (
        orphan_purchase_counts,
        purchase_click_window,
    )

    orphans = orphan_purchase_counts(SF).to_pandas()
    hist = purchase_click_window(SF).to_pandas()
    zero_bucket = hist[hist["n_preceding_clicks"] == 0]["n_purchases"]
    want = int(zero_bucket.iloc[0]) if len(zero_bucket) else 0
    assert int(orphans["n_orphans"].sum()) == want
    total = int(hist["n_purchases"].sum())
    assert int(orphans["n_purchases"].sum()) == total


def test_dispersion_terms_reconstruct_vmr(ray_session):
    import duckdb

    from ray_extract.pipelines.events import arrival_dispersion_terms

    df = arrival_dispersion_terms(SF).to_pandas()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["sum_events"].sum()) == n_events
    # variance-to-mean from the terms is finite and positive
    for _, r in df.iterrows():
        n, s, ss = int(r["n_hours"]), int(r["sum_events"]), int(
            r["sum_sq_events"]
        )
        mean = s / n
        var = ss / n - mean * mean
        assert var >= 0 and mean > 0


def test_max_burst_dominates_tumbling(ray_session):
    import duckdb

    from ray_extract.pipelines.events import max_burst_window

    df = max_burst_window(SF).to_pandas()
    # the sliding max is >= the best tumbling-hour count for every type
    tumb = duckdb.sql(f"""
      SELECT event_type, max(n) AS m FROM (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
               count(*) AS n
        FROM '{SF}/events.parquet' GROUP BY 1, 2)
      GROUP BY 1
    """).df().set_index("event_type")["m"]
    for _, r in df.iterrows():
        assert int(r["max_burst"]) >= int(tumb[r["event_type"]])
    # day-bucket decomposition is exact even with tiny windows: a
    # 60-second window run must still match a serial recompute
    small = max_burst_window(SF, window_seconds=60).to_pandas()
    raw = duckdb.sql(f"""
      WITH e AS (SELECT event_type,
        epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
        FROM '{SF}/events.parquet'),
      c AS (SELECT event_type, count(*) OVER (PARTITION BY event_type
        ORDER BY sec RANGE BETWEEN CURRENT ROW AND 59 FOLLOWING) AS cnt
        FROM e)
      SELECT event_type, max(cnt) AS m FROM c GROUP BY 1
    """).df().set_index("event_type")["m"]
    for _, r in small.iterrows():
        assert int(r["max_burst"]) == int(raw[r["event_type"]])


def test_duplicate_line_audit_mass(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import duplicate_line_audit

    df = duplicate_line_audit(SF).to_pandas()
    # total duplicated lines equal raw rows minus distinct triples
    raw, distinct, orders = duckdb.sql(f"""
      SELECT count(*), count(DISTINCT (l_orderkey, l_partkey, l_suppkey)),
             count(DISTINCT l_orderkey)
      FROM '{SF}/lineitem.parquet'
    """).fetchone()
    assert int((df["n_dup_lines"] * df["n_orders"]).sum()) == raw - distinct
    # every order appears exactly once (0 bucket included)
    assert int(df["n_orders"].sum()) == orders


def test_leadlag_zero_lag_is_plain_inner_product(ray_session):
    import duckdb

    from ray_extract.pipelines.events import leadlag_xcorr_terms

    df = leadlag_xcorr_terms(SF).to_pandas().set_index("lag")
    daily = duckdb.sql(f"""
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             count(*) AS n
      FROM '{SF}/events.parquet'
      WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
    """).df()
    a = daily[daily["event_type"] == "click"].set_index("day")["n"]
    b = daily[daily["event_type"] == "purchase"].set_index("day")["n"]
    want = int(sum(int(a[d]) * int(b[d]) for d in a.index if d in b.index))
    assert int(df.loc[0, "sum_ab"]) == want
    # symmetric day-window sizes
    assert int(df.loc[3, "n_days"]) == int(df.loc[-3, "n_days"])


def test_incremental_plan_consistent_with_compaction(ray_session):
    from ray_extract.pipelines.layout import (
        compaction_plan,
        incremental_rebuild_plan,
    )

    plan = incremental_rebuild_plan(SF).to_pandas().set_index("source")
    groups = compaction_plan(SF).to_pandas().groupby("source").size()
    for src, n in groups.items():
        assert int(plan.loc[src, "n_groups_total"]) == int(n)
    assert (plan["n_groups_dirty"] <= plan["n_groups_total"]).all()
    # the delta rule touches ~10% of docs
    assert int(plan["n_docs_changed"].sum()) > 0


def test_split_balance_consistent_with_split(ray_session):
    from ray_extract.pipelines.text import (
        deterministic_split,
        split_balance_audit,
    )

    audit = split_balance_audit(SF).to_pandas()
    split = deterministic_split(SF).to_pandas()
    want = split["split"].value_counts()
    got = audit.groupby("split")["n_obs"].sum()
    assert dict(got) == {k: int(v) for k, v in want.items()}
    assert (audit.groupby("source")["n_obs"].sum().to_numpy()
            == audit.groupby("source")["n_source"].first().to_numpy()).all()


def test_mp4_walker_rejects_bad_box_size():
    import pytest
    import struct

    from ray_extract.functions.mediameta import mp4_build, mp4_walk

    blob = bytearray(mp4_build(13))
    good = mp4_walk(bytes(blob))
    assert good["timescale"] == 1000 + 13 % 9000
    assert good["n_traks"] == 1 + 13 % 3
    # corrupt the moov size field: containment must fail loudly
    ftyp_size = struct.unpack(">I", blob[0:4])[0]
    blob[ftyp_size:ftyp_size + 4] = struct.pack(
        ">I", struct.unpack(">I", blob[ftyp_size:ftyp_size + 4])[0] + 4
    )
    with pytest.raises(ValueError):
        mp4_walk(bytes(blob))


def test_gif_parser_rejects_bad_signature_and_truncation():
    import pytest

    from ray_extract.functions.mediameta import gif_build, gif_parse

    blob = gif_build(34)
    r = gif_parse(blob)
    assert r["width"] == 10 + 34 % 300
    assert r["n_palette"] == 1 << (2 + 34 % 3)
    with pytest.raises(ValueError):
        gif_parse(b"NOTGIF" + blob[6:])
    with pytest.raises(ValueError):
        gif_parse(blob[:-2])  # trailer gone -> truncated table check


def test_ico_parser_rejects_escaping_payload():
    import pytest
    import struct

    from ray_extract.functions.mediameta import ico_build, ico_parse

    blob = bytearray(ico_build(19))
    good = ico_parse(bytes(blob))
    assert good["n_images"] == 1 + 19 % 4
    # inflate the last entry's size so its payload escapes the file
    n = struct.unpack("<H", blob[4:6])[0]
    size_off = 6 + 16 * (n - 1) + 8
    size = struct.unpack("<I", blob[size_off:size_off + 4])[0]
    blob[size_off:size_off + 4] = struct.pack("<I", size + 1)
    with pytest.raises(ValueError):
        ico_parse(bytes(blob))
