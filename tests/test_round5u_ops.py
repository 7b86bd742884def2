"""Semantic pins for the LWW-tombstone/zone-map/router batch beyond
oracle parity: packed argmax decodes the true last writer, prune
counts close over the partition set, and routing is first-match-wins
with claim exclusivity.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_lww_winner_is_true_last_writer(ray_session):
    import duckdb

    from ray_extract.pipelines.events import lww_merge_audit

    got = lww_merge_audit(SF).to_pandas().iloc[0]
    raw = duckdb.sql(
        f"SELECT event_id, user_id, event_type, value "
        f"FROM '{SF}/events.parquet' ORDER BY event_id"
    ).df()
    last = raw.groupby("user_id").tail(1)
    live = last[last["event_type"] != "error"]
    assert int(got["n_keys"]) == raw["user_id"].nunique()
    assert int(got["n_live"]) == len(live)
    assert int(got["n_deleted"]) == len(last) - len(live)
    cents = np.floor(live["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    assert int(got["sum_live_cents"]) == int(cents.sum())


def test_prune_closure(ray_session):
    from ray_extract.pipelines.events import partition_prune_audit

    got = partition_prune_audit(SF).to_pandas().iloc[0]
    assert int(got["n_scanned"]) + int(got["n_pruned"]) == int(
        got["n_partitions"]
    )
    assert int(got["rows_scanned"]) <= int(got["rows_total"])
    # a predicate wider than the whole domain prunes nothing
    full = partition_prune_audit(
        SF, lo_cents=0, hi_cents=1 << 40
    ).to_pandas().iloc[0]
    assert int(full["n_pruned"]) == 0
    assert int(full["rows_scanned"]) == int(full["rows_total"])


def test_router_first_match_wins(ray_session):
    import duckdb

    from ray_extract.pipelines.text import regex_route_counts

    df = regex_route_counts(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert int(df["n_docs"].sum()) == n  # every doc routed exactly once
    # a doc containing both 'spark' and 'scan' must be in route 'spark':
    both = duckdb.sql(
        f"SELECT source, count(*) AS n FROM '{SF}/documents.parquet' "
        "WHERE regexp_matches(text, 'spark') GROUP BY 1"
    ).df().set_index("source")["n"]
    spark_routed = df[df["route"] == "spark"].set_index("source")["n_docs"]
    for src, cnt in both.items():
        assert int(spark_routed.get(src, 0)) == int(cnt)
