"""Semantic pins for the layout/curation-planning family beyond oracle
parity: compaction groups respect the byte budget and never split the
doc_id order, stitch-pair counting equals the naive pair enumeration,
and nearest-hub assignment is the true integer argmin.
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_compaction_groups_respect_budget(ray_session):
    from ray_extract.pipelines.layout import compaction_plan

    df = compaction_plan(SF, target_chars=4096).to_pandas()
    # group ids are contiguous from 0 within each source
    for src, g in df.groupby("source"):
        gids = np.sort(g["group_id"].to_numpy())
        assert gids[0] == 0
        assert np.all(np.diff(gids) == 1), src
        # every group except possibly the last crosses the budget once
        # its last doc lands: total >= target for all but the final group
        totals = g.sort_values("group_id")["total_chars"].to_numpy()
        assert np.all(totals[:-1] + 4096 > 4096)  # positive sizes
    # replay the greedy cumsum on the raw table and compare group counts
    import duckdb

    raw = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM '{SF}/documents.parquet' "
        "ORDER BY source, doc_id"
    ).df()
    for src, g in raw.groupby("source"):
        sz = g["n_chars"].to_numpy(np.int64)
        before = np.cumsum(sz) - sz
        n_groups = len(np.unique(before // 4096))
        assert n_groups == (df["source"] == src).sum(), src


def test_doc_stitch_pairs_equals_naive(ray_session):
    from ray_extract.pipelines.layout import doc_stitch_pairs

    got = (
        doc_stitch_pairs(SF)
        .to_pandas()
        .set_index(["source_a", "source_b"])["n_pairs"]
    )
    import duckdb

    raw = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).df()
    keys = []
    for _, r in raw.iterrows():
        w = r["text"].split(" ")
        if len(w) >= 2:
            keys.append(
                (r["doc_id"], r["source"], " ".join(w[:2]), " ".join(w[-2:]))
            )
    naive = {}
    for a_id, a_src, _, a_tail in keys:
        for b_id, b_src, b_head, _ in keys:
            if a_id != b_id and a_tail == b_head:
                k = (a_src, b_src)
                naive[k] = naive.get(k, 0) + 1
    assert dict(got) == naive


def test_nearest_hub_is_true_argmin(ray_session):
    from ray_extract.pipelines.layout import _HUBS, nearest_hub_assign

    got = nearest_hub_assign(SF).to_pandas()
    import duckdb

    ck = duckdb.sql(
        f"SELECT c_custkey FROM '{SF}/customer.parquet'"
    ).df()["c_custkey"].to_numpy(np.int64)
    x = (ck * 2654435761) % 1024
    y = (ck * 40503) % 1024
    hx = np.array([h[1] for h in _HUBS])
    hy = np.array([h[2] for h in _HUBS])
    d = (x[:, None] - hx) ** 2 + (y[:, None] - hy) ** 2
    best = d.argmin(axis=1)
    dist = d[np.arange(len(ck)), best]
    want = (
        pd.DataFrame({"hub_id": best, "dist": dist})
        .groupby("hub_id")
        .agg(n_customers=("dist", "size"), sum_sqdist=("dist", "sum"))
    )
    for _, r in got.iterrows():
        w = want.loc[int(r["hub_id"])]
        assert int(r["n_customers"]) == int(w["n_customers"])
        assert int(r["sum_sqdist"]) == int(w["sum_sqdist"])
    assert int(got["n_customers"].sum()) == len(ck)


def test_shard_skew_covers_all_docs(ray_session):
    from ray_extract.pipelines.layout import shard_skew_audit

    df = shard_skew_audit(SF, n_shards=64).to_pandas()
    import duckdb

    tot = duckdb.sql(
        f"SELECT count(*) AS n, sum(n_chars) AS c "
        f"FROM '{SF}/documents.parquet'"
    ).df()
    assert int(df["n_docs"].sum()) == int(tot["n"][0])
    assert int(df["total_chars"].sum()) == int(tot["c"][0])
    assert df["shard"].between(0, 63).all()


def test_source_report_card_token_semantics(ray_session):
    from ray_extract.pipelines.layout import source_report_card

    df = source_report_card(SF).to_pandas()
    import duckdb

    raw = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).df()
    # split(' ') semantics incl. the empty-string -> 1 token edge
    toks = raw["text"].map(lambda t: len(t.split(" ")))
    want = toks.groupby(raw["source"]).sum()
    got = df.set_index("source")["total_tokens"]
    assert dict(got) == {k: int(v) for k, v in want.items()}
