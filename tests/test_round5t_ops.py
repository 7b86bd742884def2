"""Semantic pins for the SCD2/debounce/watermark batch beyond oracle
parity: interval chains are gap-free per user, debounce never fires
twice in a window, and the distributed prefix-max carry equals a
single-process replay.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_scd2_interval_chain(ray_session):
    from ray_extract.pipelines.events import scd2_intervals

    df = scd2_intervals(SF).to_pandas()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("valid_from", kind="mergesort")
        # consecutive intervals chain exactly: valid_to == next valid_from
        vto = g["valid_to"].to_numpy()[:-1]
        vfrom = g["valid_from"].to_numpy()[1:]
        assert (vto == vfrom).all(), uid
        # adjacent runs differ in segment
        seg = g["segment"].to_numpy()
        assert (seg[1:] != seg[:-1]).all(), uid
        # closed intervals are well-ordered
        assert (
            g["valid_from"].to_numpy() <= g["valid_to"].to_numpy()
        ).all(), uid


def test_debounce_alert_rate_bound(ray_session):
    from ray_extract.pipelines.events import alert_debounce_tumbling

    df = alert_debounce_tumbling(SF).to_pandas()
    assert (df["n_alerts"] >= 1).all()
    assert (df["n_alerts"] <= df["n_qualifying"]).all()
    # the stream spans ~30 days -> at most ceil(30/7)+1 weekly windows
    assert (df["n_alerts"] <= 6).all()


def test_watermark_drop_matches_serial_replay(ray_session):
    import duckdb

    from ray_extract.pipelines.events import watermark_drop_audit

    # tiny bucket size forces many carry hand-offs: distributed result
    # must equal the single-process replay regardless of bucketing
    got = (
        watermark_drop_audit(SF, delay_seconds=3600, bucket_size=128)
        .to_pandas()
        .set_index("event_type")["n_dropped"]
    )
    raw = duckdb.sql(
        f"SELECT event_id, event_type, ts FROM '{SF}/events.parquet' "
        "ORDER BY event_id"
    ).df()
    us = raw["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    prefix = np.r_[np.int64(-(1 << 62)), np.maximum.accumulate(us)[:-1]]
    dropped = us < prefix - 3600 * 1_000_000
    want = (
        raw.assign(d=dropped).groupby("event_type")["d"].sum().astype(int)
    )
    assert dict(got) == dict(want)
