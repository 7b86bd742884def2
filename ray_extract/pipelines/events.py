"""Windowed aggregation over the ``events`` stream table.

Tumbling event-time windows as a batch computation: window key computed per
batch (vectorized timestamp floor), PARTIAL aggregation inside map_batches
(one row per (event_type, window) per batch), then a small groupby over the
partials — the shuffle moves pre-aggregated rows, not events (the
combiner-before-shuffle pattern for 100 TB inputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def windowed_counts(sf_dir: str, window: str = "hour"):
    """(event_type, window_start) -> n_events, sum_value (rounded to 4 dp)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=window)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": win,
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "v": batch.column("value"),
            }
        )
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("n", "sum"), ("v", "sum")]
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_sum", alias_name="n_events"), Sum("v_sum", alias_name="sum_value")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                # us precision: floor_temporal yields timestamp[s]; pandas
                # would surface datetime64[s] vs the oracle's datetime64[us]
                "window_start": pc.cast(
                    t.column("window_start"), pa.timestamp("us")
                ),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "sum_value": pa.array(np.round(t.column("sum_value").to_numpy(), 4)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def asof_join(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "view",
    num_buckets: int = 64,
):
    """As-of join: each ``left_type`` event matched to the most recent
    ``right_type`` event of the SAME user at-or-before its timestamp
    (attribution-style temporal join — an operator Ray Data lacks natively).

    Scale shape: one pruned scan with an ``event_type IN (l, r)`` filter, then
    a SINGLE shuffle on hash(user_id) % num_buckets — both sides of the join
    land in the same bucket, so the temporal match is bucket-local. Inside a
    bucket one vectorized ``pandas.merge_asof`` (sorted merge, C speed)
    handles every user at once; no per-user Python calls, no broadcast of
    either side, no driver materialization. Buckets bound peak memory to
    corpus_size / num_buckets regardless of user skew (a hot user still fits:
    the bucket holds its events contiguously for one sorted merge).

    Right-side ties (same user, same timestamp) are collapsed to the max
    event_id BEFORE the merge so the match is deterministic — mirrored in the
    SQL oracle (group by user_id, ts with max(event_id)), which keeps DuckDB's
    ASOF JOIN tie behavior out of the comparison.

    Output: (event_id, user_id, click_ts, view_id, view_ts); a left event
    with no earlier right-side event keeps its row with the no-match
    sentinels view_id = -1, view_ts = epoch (ASOF LEFT JOIN semantics with
    deterministic, hash-stable null encoding).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def bucket_stage(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type]
        right = g[g["event_type"] == right_type]
        # deterministic tie collapse: one right row per (user_id, ts)
        right = (
            right.groupby(["user_id", "ts"], as_index=False)["event_id"].max()
            .rename(columns={"event_id": "view_id"})
        )
        left = left.sort_values("ts", kind="mergesort")
        right = right.sort_values("ts", kind="mergesort")
        right["view_ts"] = right["ts"]
        out = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["user_id", "ts", "view_id", "view_ts"]],
            on="ts",
            by="user_id",
            direction="backward",
        )
        # no-match sentinels (-1 / epoch) instead of nulls: NaN floats and
        # NaT hash differently between Arrow->pandas and DuckDB->pandas, and
        # a bucket with no right-side rows would emit object-dtype columns
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64").to_numpy(),
                "user_id": out["user_id"].astype("int64").to_numpy(),
                "click_ts": pd.to_datetime(out["ts"]),
                "view_id": out["view_id"].fillna(-1).astype("int64").to_numpy(),
                "view_ts": pd.to_datetime(out["view_ts"]).fillna(
                    pd.Timestamp("1970-01-01")
                ),
            }
        )

    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin([left_type, right_type]),
    )
    return (
        strip_schema_metadata(ds)
        .map_batches(bucket_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def sessionize(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 64):
    """Gap-based session windows per user (the streaming-shaped workload as a
    batch computation). A new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes``.

    Scale shape: users are HASH-BUCKETED into ``num_buckets`` integer keys
    (the one shuffle — a single-int group key, not one group per user), and
    each bucket is sessionized in ONE vectorized pass: sort by (user_id, ts),
    session boundaries = user change OR gap exceeded, segment ids by cumsum,
    aggregates by a C-speed int-key groupby. The previous per-user map_groups
    paid one Python call + pandas sort PER USER (the same disease the
    bucketed merge fix cured for documents — merge.py).

    Output: (user_id, session_id [1-based per user], n_events, start_ts,
    end_ts). Only intra-user order matters, established by the in-bucket sort.
    """
    import pandas as pd
    import ray.data as rd

    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = (uid * np.int64(2654435761)) % np.int64(num_buckets)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "bucket": pa.array(np.abs(bucket)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.zeros(n, dtype=bool)
        if n > 1:
            gap_break[1:] = (ts[1:] - ts[:-1]) > np.timedelta64(gap.value, "ns")
        new_sess = new_user | gap_break
        seg = np.cumsum(new_sess) - 1  # 0-based segment id within the bucket
        # 1-based session rank within each user: segment index minus the
        # index of the user's first segment
        seg_first_idx = np.nonzero(new_sess)[0]  # row index of each segment start
        seg_new_user = new_user[seg_first_idx]
        seg_idx = np.arange(len(seg_first_idx), dtype=np.int64)
        user_seg_start = np.maximum.accumulate(np.where(seg_new_user, seg_idx, 0))
        session_id = seg_idx - user_seg_start + 1
        counts = np.bincount(seg, minlength=len(seg_first_idx))
        seg_end_idx = np.concatenate([seg_first_idx[1:] - 1, [n - 1]])
        return pd.DataFrame(
            {
                "user_id": uid[seg_first_idx],
                "session_id": session_id,
                "n_events": counts.astype(np.int64),
                "start_ts": ts[seg_first_idx],
                "end_ts": ts[seg_end_idx],
            }
        )

    from ..functions.tables import strip_schema_metadata

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return (
        strip_schema_metadata(ds)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def cumulative_stats(sf_dir: str, num_buckets: int = 64):
    """Per-user RUNNING aggregates — SQL window functions
    (``SUM(...) OVER (PARTITION BY user ORDER BY ts ROWS UNBOUNDED
    PRECEDING)``) as a distributed batch computation, an operator Ray Data
    has no native form of.

    Scale shape: same as sessionize — users are hash-bucketed into
    ``num_buckets`` int keys (the one shuffle; per-bucket memory is
    corpus/num_buckets regardless of user skew), and each bucket computes
    every user's running count/sum in ONE vectorized pass: lexsort by
    (user, ts, event_id) — a total order, event_id is unique — then a
    global cumsum with per-user segment rebasing (subtract the prefix at
    each user's first row). No per-user Python calls. Money is integer
    cents so the DuckDB window-function oracle is exact.

    Output: (event_id, user_id, run_n, run_value_cents) — one row per
    event carrying its user's running event count and running value sum
    at-and-including that event.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "ts": batch.column("ts"),
                "cents": pa.array(cents),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        cents = g["cents"].to_numpy()[order]
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        seg_first = np.flatnonzero(new_user)
        counts = np.diff(np.r_[seg_first, n])
        csum = np.cumsum(cents)
        base = np.repeat(csum[seg_first] - cents[seg_first], counts)
        run_n = np.arange(n, dtype=np.int64) - np.repeat(seg_first, counts) + 1
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "run_n": run_n,
                "run_value_cents": csum - base,
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
    )
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def distinct_users_by_type(sf_dir: str, num_buckets: int = 64):
    """Exact COUNT(DISTINCT user_id) per event_type — the exact counterpart
    of approx_distinct_hll, shaped for scale.

    1. combiner: per-batch DISTINCT (event_type, user_id) via an Arrow
       group_by — the shuffle moves one row per distinct pair per block,
       not one per event.
    2. ONE shuffle on hash(user_id): every copy of a (type, user) pair
       lands in the same bucket, so a bucket-local distinct is globally
       exact. Inside the bucket: factorize type, pack (user, type_code)
       into one int64, np.unique, then a tiny per-type partial count.
    3. final groupby(event_type) sums n_buckets partials per type.

    No stage holds more than (distinct pairs / num_buckets) rows.
    Output: (event_type, n_users).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            }
        ).group_by(["event_type", "user_id"]).aggregate([])
        uid = t.column("user_id").to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return t.append_column("bucket", pa.array(bucket))

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        codes, types = pd.factorize(g["event_type"], sort=False)
        uid = g["user_id"].to_numpy()
        packed = uid * np.int64(len(types)) + codes
        _, first = np.unique(packed, return_index=True)
        n_per_type = np.bincount(codes[first], minlength=len(types))
        return pd.DataFrame(
            {"event_type": types, "n": n_per_type.astype(np.int64)}
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
    )
    agg = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_users": pc.cast(t.column("n_users"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def lag_rolling_stats(sf_dir: str, window_rows: int = 4, num_buckets: int = 64):
    """LAG + fixed-row ROLLING window aggregates per user — completes the
    window-function family (cumulative_stats = UNBOUNDED PRECEDING,
    asof_join = temporal, sessionize = gap windows; this is LAG(ts) and
    SUM OVER (... ROWS window_rows-1 PRECEDING)).

    Scale shape identical to cumulative_stats: one hash(user) shuffle,
    then per bucket ONE vectorized pass — lexsort by (user, ts, event_id),
    lag via a shifted array with user-boundary masking, rolling sum via
    cumsum difference clipped at each user's segment start. No per-user
    Python calls, bucket memory = corpus/num_buckets.

    Output: (event_id, user_id, prev_delta_us [-1 for a user's first
    event], roll_n, roll_value_cents) where roll_* cover the trailing
    ``window_rows`` events including the current one, truncated at the
    user's start.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "ts": batch.column("ts"),
                "cents": pa.array(cents),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        cents = g["cents"].to_numpy()[order]
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        # LAG(ts): microsecond delta to the previous event of the same user
        delta = np.full(n, -1, dtype=np.int64)
        if n > 1:
            d = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
            keep = ~new_user[1:]
            delta[1:][keep] = d[keep]
        # rolling over the trailing window_rows rows, truncated at the
        # user's first row: windowed cumsum difference
        seg_first = np.flatnonzero(new_user)
        counts = np.diff(np.r_[seg_first, n])
        pos_in_user = np.arange(n, dtype=np.int64) - np.repeat(seg_first, counts)
        win_start_local = np.maximum(pos_in_user - (window_rows - 1), 0)
        win_start = win_start_local + np.repeat(seg_first, counts)
        csum = np.cumsum(cents)
        # a window never crosses a user boundary (win_start >= seg_first);
        # rows whose window starts at global index 0 subtract nothing
        base = np.where(win_start > 0, csum[win_start - 1], 0)
        roll_value = csum - base
        roll_n = pos_in_user - win_start_local + 1
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "prev_delta_us": delta,
                "roll_n": roll_n,
                "roll_value_cents": roll_value,
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
    )
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def range_window_stats(sf_dir: str, gap_minutes: int = 60, num_buckets: int = 64):
    """TIME-based rolling window per user — SQL's ``RANGE BETWEEN INTERVAL
    g PRECEDING AND CURRENT ROW`` (vs the ROWS frame of lag_rolling_stats):
    for each event, the count and value-sum of the same user's events in
    the trailing ``gap_minutes`` wall-clock window, peers (equal ts)
    included, exactly like the SQL RANGE frame.

    Scale shape: one hash(user) shuffle, then per bucket ONE vectorized
    pass with NO per-user calls: sort by (user, ts), then build a single
    monotone composite axis ``comp = (ts - ts_min) + seg_id * OFFSET`` with
    ``OFFSET > ts_range + gap`` so a binary search for ``comp - gap`` can
    NEVER land in a previous user's segment — both window edges for every
    row come from two global ``np.searchsorted`` calls, and the sums from a
    cumsum difference. Bound: segments_per_bucket x (ts_range + gap) must
    fit int64 — at 10^6 users/bucket and a 10-year range that is ~3*10^20,
    so shard wider or rebase ts per segment beyond that.

    Output: (event_id, user_id, win_n, win_value_cents).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "ts": batch.column("ts"),
                "cents": pa.array(cents),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts_us, uid))
        uid, ts_us, eid = uid[order], ts_us[order], eid[order]
        cents = g["cents"].to_numpy()[order]
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        seg_id = np.cumsum(new_user) - 1
        ts0 = ts_us - ts_us.min()
        offset = np.int64(ts0.max()) + gap_us + 1
        comp = ts0 + seg_id * offset
        lo = np.searchsorted(comp, comp - gap_us, side="left")
        hi = np.searchsorted(comp, comp, side="right")
        csum = np.cumsum(cents)
        base = np.where(lo > 0, csum[lo - 1], 0)
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "win_n": (hi - lo).astype(np.int64),
                "win_value_cents": csum[hi - 1] - base,
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
    )
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def session_stats(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 64):
    """Per-user session summary built ON TOP of the sessionize pipeline
    (operator composition: the session table never materializes on the
    driver — it flows straight into a partial-agg + small groupby).

    All of a user's events share a hash bucket, so every session is
    complete before aggregation; the per-batch combiner cuts the shuffle
    to one row per (user, block). Durations are integer microseconds.

    Output: (user_id, n_sessions, n_events, max_session_events,
    total_session_dur_us).
    """
    from ray.data.aggregate import Max, Sum

    sess = sessionize(sf_dir, gap_minutes=gap_minutes, num_buckets=num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        dur = (
            batch.column("end_ts").to_numpy().astype("datetime64[us]").astype(np.int64)
            - batch.column("start_ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "ns": pa.array(np.ones(len(batch), dtype=np.int64)),
                "ne": pc.cast(batch.column("n_events"), pa.int64()),
                "maxe": pc.cast(batch.column("n_events"), pa.int64()),
                "dur": pa.array(dur),
            }
        )
        return t.group_by("user_id").aggregate(
            [("ns", "sum"), ("ne", "sum"), ("maxe", "max"), ("dur", "sum")]
        )

    agg = (
        sess.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("ns_sum", alias_name="n_sessions"),
            Sum("ne_sum", alias_name="n_events"),
            Max("maxe_max", alias_name="max_session_events"),
            Sum("dur_sum", alias_name="total_session_dur_us"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        out = {"user_id": pc.cast(t.column("user_id"), pa.int64())}
        for c in ["n_sessions", "n_events", "max_session_events",
                  "total_session_dur_us"]:
            out[c] = pc.cast(t.column(c), pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window_counts(sf_dir: str, size_minutes: int = 60,
                          hop_minutes: int = 30):
    """HOPPING (sliding) event-time windows: size 60 min, hop 30 min —
    every event contributes to size/hop (= 2) overlapping windows, unlike
    the tumbling windows of windowed_counts.

    Scale shape: the fan-out happens INSIDE map_batches (each batch emits
    size/hop pre-aggregated partial rows per (type, window), not per
    event), so the shuffle moves |types| x |windows| partials per block.
    Window starts are integer slot arithmetic on epoch-microseconds —
    exact, no timestamp-rounding ambiguity, and identical to the SQL
    oracle's epoch_us // hop formula.

    Output: (event_type, window_start, n_events, sum_cents).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    assert size_minutes % hop_minutes == 0
    fan = size_minutes // hop_minutes
    hop_us = np.int64(hop_minutes) * 60_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        slot = ts_us // hop_us
        et = batch.column("event_type")
        parts = []
        for k in range(fan):
            parts.append(
                pa.table(
                    {
                        "event_type": et,
                        "wslot": pa.array(slot - k),
                        "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                        "cents": pa.array(cents),
                    }
                )
            )
        t = pa.concat_tables(parts)
        return t.group_by(["event_type", "wslot"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "wslot"])
        .aggregate(Sum("n_sum", alias_name="n_events"),
                   Sum("cents_sum", alias_name="sum_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        wslot = pc.cast(t.column("wslot"), pa.int64()).to_numpy()
        ws = (wslot * hop_us).astype("datetime64[us]")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": pa.array(ws),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "sum_cents": pc.cast(t.column("sum_cents"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hour_of_day_profile(sf_dir: str):
    """Event-count matrix by (event_type, hour-of-day) — the activity
    heatmap behind any event dashboard, in long form.

    Scale shape: hour is integer arithmetic on epoch-microseconds
    ((us // 3600e6) % 24 — identical to SQL date_part on UTC timestamps),
    pre-aggregated per batch to |types| x 24 rows before the one shuffle.

    Output: (event_type, hour, n_events, sum_cents).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        hour = (ts_us // 3_600_000_000) % 24
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": pa.array(hour),
                "n": pa.array(np.ones(len(hour), dtype=np.int64)),
                "cents": pa.array(cents),
            }
        )
        return t.group_by(["event_type", "hour"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_sum", alias_name="n_events"),
                   Sum("cents_sum", alias_name="sum_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.cast(t.column("hour"), pa.int64()),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "sum_cents": pc.cast(t.column("sum_cents"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def funnel_counts(sf_dir: str, stages: tuple = ("view", "click", "purchase"),
                  window_hours: int = 24, num_buckets: int = 64):
    """Time-boxed funnel analysis: how many users complete each stage of
    ``stages`` where each step must happen STRICTLY AFTER the previous
    step's first completion and within ``window_hours`` of it (the product
    analytics primitive; order + window is what makes it a sequence
    pattern rather than three independent counts).

    Scale shape: one scan with an ``event_type IN stages`` pushdown, then
    a single hash(user) shuffle; inside a bucket every stage resolves with
    C-speed pandas column ops (per-user min of stage-1, merge onto
    stage-2's rows, windowed filter, per-user min again — no Python loop
    over users), and only |stages| partial-count rows per bucket reach the
    final groupby.

    Output: (stage, stage_idx, n_users).
    """
    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    win = np.timedelta64(window_hours * 3600 * 1_000_000, "us")

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cur = (
            g[g["event_type"] == stages[0]]
            .groupby("user_id")["ts"].min()
        )
        counts = [len(cur)]
        for stage in stages[1:]:
            rows = g[g["event_type"] == stage][["user_id", "ts"]]
            prev = cur.rename("t_prev")
            rows = rows.join(prev, on="user_id", how="inner")
            ok = (rows["ts"] > rows["t_prev"]) & (
                rows["ts"] <= rows["t_prev"] + win
            )
            cur = rows[ok].groupby("user_id")["ts"].min()
            counts.append(len(cur))
        return pd.DataFrame(
            {
                "stage": list(stages),
                "stage_idx": np.arange(len(stages), dtype=np.int64),
                "n": np.array(counts, dtype=np.int64),
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"],
            filter=pads.field("event_type").isin(list(stages)),
        )
    )
    agg = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["stage", "stage_idx"])
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "stage": t.column("stage"),
                "stage_idx": pc.cast(t.column("stage_idx"), pa.int64()),
                "n_users": pc.cast(t.column("n_users"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def period_retention(sf_dir: str, period_seconds: int = 3600,
                     num_buckets: int = 64):
    """Consecutive-period retention: for each activity period p, how many
    users active in p were ALSO active in p+1 (cohort-retention shape; the
    period defaults to an hour because the synthetic stream is dense —
    daily/weekly are the same integer arithmetic).

    Scale shape: per-batch DISTINCT (user, period) combiner -> ONE
    hash(user) shuffle (all of a user's periods co-locate, so the
    consecutive-pair check is bucket-local and exact) -> per bucket one
    vectorized pass (np.unique over packed (user, period), adjacent-diff
    equality) -> per-period partial counts -> small groupby.

    Output: (period, n_retained) for periods with at least one retained
    user.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    per_us = np.int64(period_seconds) * 1_000_000

    def pair_partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        ts_us = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        period = ts_us // per_us
        t = pa.table(
            {"user_id": pa.array(uid), "period": pa.array(period)}
        ).group_by(["user_id", "period"]).aggregate([])
        u = t.column("user_id").to_numpy()
        bucket = np.abs((u * np.int64(2654435761)) % np.int64(num_buckets))
        return t.append_column("bucket", pa.array(bucket))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        per = g["period"].to_numpy()
        # global distinct within the bucket, sorted by (user, period)
        packed = np.unique(uid * np.int64(1 << 22) + per)  # period < 2^22 hrs ~ 478y
        u2, p2 = packed >> 22, packed & ((1 << 22) - 1)
        same_user = u2[1:] == u2[:-1]
        consec = p2[1:] == p2[:-1] + 1
        hit = p2[:-1][same_user & consec]
        vals, counts = np.unique(hit, return_counts=True)
        return pd.DataFrame(
            {"period": vals.astype(np.int64), "n": counts.astype(np.int64)}
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    )
    agg = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("period")
        .aggregate(Sum("n", alias_name="n_retained"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "period": pc.cast(t.column("period"), pa.int64()),
                "n_retained": pc.cast(t.column("n_retained"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def value_outliers(sf_dir: str, permille: int = 990):
    """Per-type outlier events: value strictly above the event_type's
    p{permille/10} — the GROUPED scalar-subquery pattern (vs the global
    scalar of percentile_length_filter): thresholds derived per group,
    then broadcast into a second streaming pass.

    Pass 1 computes each type's EXACT percentile by counting selection
    over the bounded cents domain (per-batch (type, cents) count partials
    -> small groupby -> per-type cumulative-histogram walk); the threshold
    table is O(|types|) rows, ray.put once. Pass 2 re-scans and resolves
    every row with one zero-copy ``pa.Table.join`` against the broadcast
    dimension — no shuffle. Rank rule = DuckDB quantile_disc
    (ceil(p*n/1000), integer arithmetic).

    Output: (event_id, event_type, value_cents, thr_cents).
    """
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def counts(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents),
                "n": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        )
        return t.group_by(["event_type", "cents"]).aggregate([("n", "sum")])

    def select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        rank = (permille * n + 999) // 1000
        thr = int(g["cents"].to_numpy()[np.searchsorted(cum, rank)])
        return pd.DataFrame(
            {"event_type": g["event_type"].iloc[:1].to_numpy(),
             "thr_cents": np.array([thr], dtype=np.int64)}
        )

    hist = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["event_type", "value"]
            )
        )
        .map_batches(counts, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n_sum", alias_name="n"))
        .groupby("event_type")
        .map_groups(select, batch_format="pandas")
    )
    thr_tbl = pa.Table.from_pandas(hist.to_pandas()).replace_schema_metadata(None)
    thr_ref = ray.put(thr_tbl)  # O(|event types|) rows

    def flt(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "event_type": pc.cast(batch.column("event_type"), pa.string()),
                "value_cents": pa.array(cents),
            }
        ).join(ray.get(thr_ref), keys="event_type", join_type="inner")
        return t.filter(
            pc.greater(t.column("value_cents"), t.column("thr_cents"))
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
    )
    return ds.map_batches(flt, batch_format="pyarrow")


def markov_transitions(sf_dir: str, num_buckets: int = 64):
    """Consecutive event-type transition counts per user — the bigram model
    of user behaviour (SQL: LAG(event_type) OVER (PARTITION BY user ORDER BY
    ts, event_id), then GROUP BY (prev, curr)).

    Scale shape: one hash(user) shuffle, then per bucket ONE vectorized
    pass — lexsort by (user, ts, event_id), the predecessor type via a
    shifted array with user-boundary masking, pair counts via factorize +
    np.unique so the global groupby receives at most |types|^2 rows per
    bucket. No per-user Python calls.

    Output: (prev_type, event_type, n).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        codes, types = pd.factorize(g["event_type"])
        codes = codes[order].astype(np.int64)
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {"prev_type": np.array([], dtype=object),
                 "event_type": np.array([], dtype=object),
                 "n": np.array([], dtype=np.int64)}
            )
        same_user = uid[1:] == uid[:-1]
        prev_c = codes[:-1][same_user]
        curr_c = codes[1:][same_user]
        k = len(types)
        pair, counts = np.unique(prev_c * k + curr_c, return_counts=True)
        return pd.DataFrame(
            {
                "prev_type": types.to_numpy()[pair // k],
                "event_type": types.to_numpy()[pair % k],
                "n": counts.astype(np.int64),
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        )
    )
    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(["prev_type", "event_type"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "prev_type": out.column("prev_type"),
                "event_type": out.column("event_type"),
                "n": pc.cast(out.column("n_sum"), pa.int64()),
            }
        )

    # the per-bucket partials are bounded by |types|^2 rows each, so the
    # cross-bucket reduce is metadata-scale: one repartition(1) + a single
    # Arrow C++ group_by beats spinning up a hash-aggregator pool
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


_WEEK_US = 604800000000  # 7 * 24 * 3600 * 1e6


def wau_rolling(sf_dir: str, trailing_weeks: int = 4):
    """Trailing-N-week active users per week — the rolling COUNT(DISTINCT)
    that naive windowing cannot stream.

    Scale shape: the distinct is decomposed so no stage ever holds a user
    set. Per batch: distinct (user, week) pairs (packed into one int64 —
    epoch-week < 2^12 for any timestamp before year 2049, user < 2^51).
    Each pair then FANS OUT to the ``trailing_weeks`` target weeks it
    contributes to (a x4 expansion of already-deduplicated rows, not of
    events), a global groupby on the packed (user, target_week) key
    collapses cross-batch duplicates, and a per-batch partial count per
    week feeds the final small groupby. Shuffles move one row per distinct
    (user, week-ish) — at 100 TB that is the lower bound for an exact
    rolling distinct.

    Output: (week, wau) for every week in [first_active, last_active + N - 1]
    that has at least one contributing user.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def distinct_expand(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        week = ts // _WEEK_US
        pack = np.unique(uid * np.int64(1 << 12) + week)
        # fan out each distinct (user, week) to its trailing target weeks
        reps = np.repeat(pack, trailing_weeks)
        offs = np.tile(np.arange(trailing_weeks, dtype=np.int64), len(pack))
        return pa.table(
            {"pack2": pa.array(reps + offs),
             "one": pa.array(np.ones(len(reps), dtype=np.int64))}
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    )
    dedup = (
        ds.map_batches(distinct_expand, batch_format="pyarrow")
        .groupby("pack2")
        .aggregate(Sum("one", alias_name="dup"))
    )

    def week_partial(t: pa.Table) -> pa.Table:
        pack2 = t.column("pack2").to_numpy()
        week = pack2 % np.int64(1 << 12)
        w, c = np.unique(week, return_counts=True)
        return pa.table({"week": pa.array(w), "n": pa.array(c.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by("week").aggregate([("n", "sum")])
        return pa.table(
            {
                "week": pc.cast(out.column("week"), pa.int64()),
                "wau": pc.cast(out.column("n_sum"), pa.int64()),
            }
        )

    # week partials are bounded by the calendar (one row per epoch-week per
    # block): the final reduce is metadata-scale — repartition(1) + one
    # Arrow group_by instead of a second hash-aggregator pool
    return (
        dedup.map_batches(week_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def props_value_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    ``props`` column with ONE vectorized RE2 pass (pyarrow extract_regex —
    same engine family as DuckDB's regexp_extract, so the oracle is exact),
    then aggregate per event_type.

    Scale shape: pure map + partial-agg + 5-row groupby; the JSON string
    never leaves the scan stage.

    Output: (event_type, n, n_extracted, sum_k, max_k).
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..functions.tables import strip_schema_metadata, try_cast_int64

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch.column("props"), r'"k": (?P<k>-?\d+)')
        karr = try_cast_int64(pc.struct_field(ex, "k"))
        ok = pc.is_valid(karr).to_numpy(zero_copy_only=False)
        kk = pc.fill_null(karr, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "ok": pa.array(ok.astype(np.int64)),
                "k": pa.array(kk),
                "kmax": pa.array(np.where(ok, kk, np.int64(-(1 << 62)))),
            }
        )
        return t.group_by("event_type").aggregate(
            [("n", "sum"), ("ok", "sum"), ("k", "sum"), ("kmax", "max")]
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "props"])
    )
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_sum", alias_name="n"),
            Sum("ok_sum", alias_name="n_extracted"),
            Sum("k_sum", alias_name="sum_k"),
            Max("kmax_max", alias_name="max_k"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pc.cast(t.column("n"), pa.int64()),
                "n_extracted": pc.cast(t.column("n_extracted"), pa.int64()),
                "sum_k": pc.cast(t.column("sum_k"), pa.int64()),
                "max_k": pc.cast(t.column("max_k"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_hour_type(sf_dir: str, types: tuple = PIVOT_TYPES):
    """PIVOT: long (hour, event_type) counts to a WIDE table — one row per
    hour-of-day, one int64 column per event type (the spreadsheet shape
    downstream BI tools want).

    The column set must be known up front for a stable schema (standard
    pivot contract — SQL PIVOT needs IN (...) too); pass ``types`` for a
    different corpus. Scale shape: per-batch 24 x |types| partial count
    matrix (pure integer epoch arithmetic), and since the domain is bounded
    by the calendar x the type list, the cross-block reduce is
    metadata-scale: repartition(1) + one vectorized merge.

    Output: (hour, <type...>) — 24 rows.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    type_list = list(types)
    code = {t: i for i, t in enumerate(type_list)}
    k = len(type_list)

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        hour = (us // 3600000000) % 24
        tcodes = (
            pc.index_in(batch.column("event_type"),
                        pa.array(type_list, type=pa.string()))
            .to_numpy(zero_copy_only=False)
        )
        keep = ~np.isnan(tcodes.astype(np.float64)) if tcodes.dtype != np.int64 \
            else np.ones(len(tcodes), dtype=bool)
        tc = np.nan_to_num(tcodes.astype(np.float64)).astype(np.int64)
        counts = np.bincount(
            (hour[keep] * k + tc[keep]).astype(np.int64), minlength=24 * k
        ).reshape(24, k)
        cols = {"hour": pa.array(np.arange(24, dtype=np.int64))}
        for i, t in enumerate(type_list):
            cols[t] = pa.array(counts[:, i].astype(np.int64))
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        hour = t.column("hour").to_numpy()
        cols = {"hour": pa.array(np.arange(24, dtype=np.int64))}
        for name in type_list:
            v = t.column(name).to_numpy()
            cols[name] = pa.array(np.bincount(hour, weights=v, minlength=24)
                                  .astype(np.int64))
        return pa.table(cols)

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


_TS_INF = np.int64(1 << 62)


def time_to_first_purchase(sf_dir: str, target_type: str = "purchase"):
    """Per-user latency from first activity to first ``target_type`` event —
    the activation-funnel metric (conditional MIN aggregate).

    Scale shape: per-batch partial with TWO mins (overall, and the target
    type via a +inf sentinel), one groupby(user) with Min aggregates, and a
    pure finishing map. Timestamps stay integer microseconds throughout, so
    the oracle is exact; users who never convert get delta_us = -1.

    Output: (user_id, first_ts, delta_us).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        is_t = pc.equal(batch.column("event_type"), target_type).to_numpy(
            zero_copy_only=False
        )
        pus = np.where(is_t, us, _TS_INF)
        t = pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "mn": pa.array(us),
                "mp": pa.array(pus),
            }
        )
        return t.group_by("user_id").aggregate([("mn", "min"), ("mp", "min")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("mn_min", alias_name="mn"),
                   Min("mp_min", alias_name="mp"))
    )

    def finish(t: pa.Table) -> pa.Table:
        mn = pc.cast(t.column("mn"), pa.int64()).to_numpy()
        mp = pc.cast(t.column("mp"), pa.int64()).to_numpy()
        delta = np.where(mp >= _TS_INF, np.int64(-1), mp - mn)
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "first_ts": pa.array(mn.astype("datetime64[us]")),
                "delta_us": pa.array(delta),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def zscore_outliers(sf_dir: str, k_sigma: int = 2):
    """Moment-based outlier flagging: events more than ``k_sigma`` standard
    deviations from their type's mean (the z-score filter every feature
    pipeline runs before training) — companion to value_outliers, which
    uses the percentile rule.

    Exactness: |v - mean| > k*sigma is squared into the all-integer
    identity (n*v - s)^2 > k^2 * (n*m2 - s^2) over cents (sigma =
    sqrt(n*m2 - s^2)/n, so both sides scale by n^2). The tiny
    per-type moment table reduces on the driver, which converts the
    inequality into plain integer CENT BOUNDS per type (Python bigints +
    isqrt — exact even where n*m2 would overflow int64 at 10^12 rows), so
    the distributed second pass is a broadcast searchsorted-free compare.
    The DuckDB oracle evaluates the squared form directly in HUGEINT —
    mathematically the same predicate.

    Scale shape: two scans (moments with per-batch combiner; then a
    stateless filter with the 5-row bound table in the task closure) — the
    same two-pass broadcast-scalar pattern as value_outliers/oov vocab.

    Output: (event_id, event_type, value_cents).
    """
    import math

    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def cents(col) -> np.ndarray:
        return np.floor(col.to_numpy() * 100.0 + 0.5).astype(np.int64)

    def moments_partial(batch: pa.Table) -> pa.Table:
        v = cents(batch.column("value"))
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
                "s": pa.array(v),
                "m2": pa.array(v * v),
            }
        )
        return t.group_by("event_type").aggregate(
            [("n", "sum"), ("s", "sum"), ("m2", "sum")]
        )

    mom = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
        )
        .map_batches(moments_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_sum", alias_name="n"),
                   Sum("s_sum", alias_name="s"),
                   Sum("m2_sum", alias_name="m2"))
        .to_pandas()  # bounded domain: one row per event type
    )

    # exact integer bounds per type: flag iff v > hi or v < lo, where
    # |n*v - s| > t, t = isqrt(k^2 * (n*m2 - s^2))  (x^2 > R <=> |x| > isqrt(R))
    bounds: dict[str, tuple[int, int]] = {}
    for _, r in mom.iterrows():
        n, s, m2 = int(r["n"]), int(r["s"]), int(r["m2"])
        t = math.isqrt(k_sigma * k_sigma * (n * m2 - s * s))
        hi = (s + t) // n  # flag iff v >= hi + 1
        lo = -((-(s - t)) // n)  # ceil((s-t)/n); flag iff v <= lo - 1
        bounds[str(r["event_type"])] = (lo, hi)

    types = sorted(bounds)
    lo_arr = np.array([bounds[t][0] for t in types], dtype=np.int64)
    hi_arr = np.array([bounds[t][1] for t in types], dtype=np.int64)
    type_arr = pa.array(types, type=pa.string())

    def flag(batch: pa.Table) -> pa.Table:
        v = cents(batch.column("value"))
        idx = pc.index_in(batch.column("event_type"), type_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        keep = (v > hi_arr[idx]) | (v < lo_arr[idx])
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "event_type": batch.column("event_type"),
                "value_cents": pa.array(v),
            }
        ).filter(pa.array(keep))

    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_id", "event_type", "value"])
    ).map_batches(flag, batch_format="pyarrow")


def approx_quantiles_hist(sf_dir: str, bin_cents: int = 8, n_bins: int = 4096,
                          percentiles: tuple = (50, 90, 99)):
    """Histogram-sketch quantiles — the mergeable approximate-quantile
    pattern (fixed-width integer bins play the role of a t-digest, but with
    a DETERMINISTIC estimator, so the oracle is exact about the sketch).

    Scale shape: each batch emits one dense ``n_bins``-long int64 histogram
    per event type (a fixed-size mergeable sketch — the whole point: block
    partials are O(bins), independent of row count), the cross-block merge
    is a metadata-scale repartition(1) + vector sum, and the estimate for
    percentile p is the LOWER EDGE of the first bin whose cumulative count
    reaches rank ceil(p*n/100) — the same counting-selection rank rule as
    group_quantiles, on bins instead of values.

    Output: (event_type, n, p50_cents, p90_cents, p99_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        b = np.clip(v // bin_cents, 0, n_bins - 1)
        types, codes = np.unique(
            batch.column("event_type").to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        hist = np.zeros((len(types), n_bins), dtype=np.int64)
        np.add.at(hist, (codes, b), 1)
        return pa.table(
            {
                "event_type": pa.array(types.astype(str)),
                "hist": pa.array(list(hist)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        hists = t.column("hist").combine_chunks()
        flat = hists.flatten().to_numpy(zero_copy_only=False).reshape(
            len(t), n_bins
        )
        types, codes = np.unique(et, return_inverse=True)
        total = np.zeros((len(types), n_bins), dtype=np.int64)
        np.add.at(total, codes, flat)
        n = total.sum(axis=1)
        cum = total.cumsum(axis=1)
        cols = {"event_type": pa.array(types.astype(str)),
                "n": pa.array(n)}
        for p in percentiles:
            rank = (p * n + 99) // 100
            idx = np.array(
                [np.searchsorted(cum[i], rank[i]) for i in range(len(types))],
                dtype=np.int64,
            )
            cols[f"p{p}_cents"] = pa.array(idx * bin_cents)
        return pa.table(cols)

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def session_conversion(sf_dir: str, gap_minutes: int = 30,
                       target_type: str = "purchase", num_buckets: int = 64):
    """Per-user session conversion: how many of a user's gap-sessions
    contain a ``target_type`` event (the conversion-rate denominator and
    numerator of a funnel dashboard).

    Scale shape: identical to sessionize — ONE hash(user) shuffle, then a
    single vectorized per-bucket pass (lexsort, gap-break cumsum segments,
    per-segment max of the target flag via np.maximum.reduceat, per-user
    counts via reduceat over user segment starts). Tie order within equal
    timestamps cannot change the result: a zero gap never breaks a session
    and the flag max is order-free.

    Output: (user_id, n_sessions, n_converting).
    """
    import pandas as pd
    import ray.data as rd

    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        flag = pc.equal(batch.column("event_type"), target_type).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "conv": pa.array(flag.astype(np.int64)),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        conv = g["conv"].to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts, conv = uid[order], ts[order], conv[order]
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user.copy()
        if n > 1:
            new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sess_first = np.flatnonzero(new_sess)
        sess_conv = np.minimum(np.maximum.reduceat(conv, sess_first), 1)
        # per-user reduction over the per-session rows
        user_of_sess = uid[sess_first]
        first_sess_of_user = np.ones(len(sess_first), dtype=bool)
        first_sess_of_user[1:] = user_of_sess[1:] != user_of_sess[:-1]
        u_starts = np.flatnonzero(first_sess_of_user)
        n_sessions = np.diff(np.r_[u_starts, len(sess_first)])
        n_converting = np.add.reduceat(sess_conv, u_starts)
        return pd.DataFrame(
            {
                "user_id": user_of_sess[u_starts],
                "n_sessions": n_sessions.astype(np.int64),
                "n_converting": n_converting.astype(np.int64),
            }
        )

    from ..functions.tables import strip_schema_metadata

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def dense_hourly_series(sf_dir: str):
    """Gap-filled hourly event series — time-series DENSIFICATION: every
    hour between the corpus min and max appears, zero-filled when no event
    landed in it (the shape a forecasting model or charting layer needs;
    a plain groupby silently drops empty windows).

    Scale shape: per-batch partial counts per hour slot (bounded by the
    time range, not the row count), one metadata-scale repartition(1)
    merge that densifies with an arange over [min_slot, max_slot]. The
    time range is data-derived — no driver pre-pass needed.

    Output: (window_start, n_events) — one row per hour in range.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    _HOUR_US = 3600000000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        slot = us // _HOUR_US
        s, c = np.unique(slot, return_counts=True)
        return pa.table(
            {"slot": pa.array(s), "n": pa.array(c.astype(np.int64))}
        )

    def densify(t: pa.Table) -> pa.Table:
        slot = t.column("slot").to_numpy()
        n = t.column("n").to_numpy()
        lo, hi = int(slot.min()), int(slot.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        np.add.at(dense, slot - lo, n)
        slots = np.arange(lo, hi + 1, dtype=np.int64)
        return pa.table(
            {
                "window_start": pa.array(
                    (slots * _HOUR_US).astype("datetime64[us]")
                ),
                "n_events": pa.array(dense),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(densify, batch_format="pyarrow")
    )


def dwell_times(sf_dir: str, num_buckets: int = 64):
    """Per-event dwell time — LEAD(ts): microseconds until the SAME user's
    next event (-1 for a user's last event), plus the next event's type —
    the engagement metric behind bounce analysis (and the forward twin of
    lag_rolling_stats' LAG).

    Scale shape: identical single hash(user) shuffle + one vectorized
    per-bucket pass (lexsort, forward-shifted arrays with user-boundary
    masking). Output: (event_id, user_id, dwell_us, next_type).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, et = uid[order], ts[order], eid[order], et[order]
        n = len(g)
        dwell = np.full(n, -1, dtype=np.int64)
        nxt = np.full(n, "", dtype=object)
        if n > 1:
            same = uid[:-1] == uid[1:]
            dwell[:-1][same] = (ts[1:] - ts[:-1])[same]
            nxt[:-1][same] = et[1:][same]
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "dwell_us": dwell,
                "next_type": nxt.astype(str),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "event_type"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def session_paths(sf_dir: str, gap_minutes: int = 30, max_events: int = 8,
                  k: int = 15, num_buckets: int = 64):
    """Top-k session paths — the sequence-mining operator behind funnel
    discovery: each gap-session becomes the string of its first
    ``max_events`` event-type initials in time order, and paths are
    counted corpus-wide.

    Scale shape: one hash(user) shuffle; inside a bucket the paths are
    built with ZERO per-session Python — events lexsorted by (user, ts,
    event_id), session segments via the gap-break cumsum, each kept event
    contributes one initial byte, and the per-session strings materialize
    directly from (offsets, data) buffers via Arrow from_buffers. Path
    counts pre-aggregate per bucket (an Arrow C++ group_by), the global
    reduce is one path-keyed groupby of partials, top-k is the usual
    partial + k-row cut.

    Output: (path, n_sessions), ordered (n desc, path asc).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        # event-type initial as one byte (types have distinct initials here;
        # widen to 2 bytes for corpora where they collide)
        initial = pc.utf8_slice_codeunits(
            pc.cast(batch.column("event_type"), pa.string()), 0, 1
        )
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "ch": initial,
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        ch = g["ch"].to_numpy().astype("U1")
        order = np.lexsort((eid, ts, uid))
        uid, ts, ch = uid[order], ts[order], ch[order]
        n = len(g)
        new_sess = np.ones(n, dtype=bool)
        new_sess[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        sess_start = np.flatnonzero(new_sess)
        sess_of = np.cumsum(new_sess) - 1
        pos = np.arange(n) - sess_start[sess_of]
        keep = pos < max_events
        kept_sess = sess_of[keep]
        data = ch[keep].astype("S1").tobytes()
        lens = np.bincount(kept_sess, minlength=len(sess_start))
        offsets = np.zeros(len(sess_start) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        paths = pa.Array.from_buffers(
            pa.string(), len(sess_start),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
        )
        t = pa.table({"path": paths})
        part = t.group_by("path").aggregate([("path", "count")])
        return pa.table(
            {
                "path": part.column("path"),
                "n": pc.cast(part.column("path_count"), pa.int64()),
            }
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "event_type"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_sessions"))
    )

    def topk(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "path": t.column("path"),
                "n_sessions": pc.cast(t.column("n_sessions"), pa.int64()),
            }
        )
        idx = pc.sort_indices(
            out, sort_keys=[("n_sessions", "descending"), ("path", "ascending")]
        )
        return out.take(idx[: min(k, len(out))])

    return (
        agg.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow")
    )


def session_assignment(sf_dir: str, gap_minutes: int = 30,
                       num_buckets: int = 64):
    """Event-level session enrichment: every event tagged with its
    (1-based per-user) session id — the JOIN-back form of sessionize that
    downstream per-event features need (sessionize returns one row per
    session; this returns one per event).

    Same single hash(user) shuffle and vectorized gap-break pass; the
    per-user session counter is a cumsum over break flags re-based per
    user. Output: (event_id, user_id, session_id).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user.copy()
        if n > 1:
            brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sess_global = np.cumsum(brk)
        # re-base to 1 per user: subtract the session count before the user
        user_first = np.flatnonzero(new_user)
        base = sess_global[user_first] - 1
        counts = np.diff(np.r_[user_first, n])
        session_id = sess_global - np.repeat(base, counts)
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "session_id": session_id.astype(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def winsorized_stats(sf_dir: str, lo_permille: int = 10, hi_permille: int = 990):
    """Winsorized per-type value statistics: values clamped to each type's
    [p1, p99] before aggregating — the robust-mean cleaning step that
    keeps heavy tails from dominating a feature.

    Pass 1 derives BOTH clamp thresholds per type with the same exact
    counting-selection walk as value_outliers (one (type, cents) histogram
    shuffle serves both percentiles); pass 2 is a stateless re-scan with
    the O(|types|) clamp table in the task closure, partial-aggregated
    per batch. Output stays integer cents, so the DuckDB quantile_disc +
    CASE-clamp oracle is exact.

    Output: (event_type, n, lo_cents, hi_cents, sum_wins_cents,
    n_clamped_lo, n_clamped_hi).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def counts(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents),
                "n": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        )
        return t.group_by(["event_type", "cents"]).aggregate([("n", "sum")])

    def select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        vals = g["cents"].to_numpy()
        out = {}
        for name, pm in (("lo_cents", lo_permille), ("hi_cents", hi_permille)):
            rank = (pm * n + 999) // 1000
            out[name] = int(vals[np.searchsorted(cum, rank)])
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[:1].to_numpy(),
                "lo_cents": np.array([out["lo_cents"]], dtype=np.int64),
                "hi_cents": np.array([out["hi_cents"]], dtype=np.int64),
            }
        )

    thr = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
        )
        .map_batches(counts, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n_sum", alias_name="n"))
        .groupby("event_type")
        .map_groups(select, batch_format="pandas")
        .to_pandas()  # bounded domain: one row per type
    ).sort_values("event_type")
    types = thr["event_type"].to_numpy().astype(str)
    lo = thr["lo_cents"].to_numpy().astype(np.int64)
    hi = thr["hi_cents"].to_numpy().astype(np.int64)
    type_arr = pa.array(list(types), type=pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        idx = pc.index_in(batch.column("event_type"), type_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        clo, chi = lo[idx], hi[idx]
        wins = np.clip(cents, clo, chi)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(cents), dtype=np.int64)),
                "s": pa.array(wins),
                "cl": pa.array((cents < clo).astype(np.int64)),
                "ch": pa.array((cents > chi).astype(np.int64)),
            }
        )
        return t.group_by("event_type").aggregate(
            [("n", "sum"), ("s", "sum"), ("cl", "sum"), ("ch", "sum")]
        )

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by("event_type").aggregate(
            [("n_sum", "sum"), ("s_sum", "sum"), ("cl_sum", "sum"),
             ("ch_sum", "sum")]
        )
        et = out.column("event_type")
        idx = pc.index_in(et, type_arr).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": et,
                "n": pc.cast(out.column("n_sum_sum"), pa.int64()),
                "lo_cents": pa.array(lo[idx]),
                "hi_cents": pa.array(hi[idx]),
                "sum_wins_cents": pc.cast(out.column("s_sum_sum"), pa.int64()),
                "n_clamped_lo": pc.cast(out.column("cl_sum_sum"), pa.int64()),
                "n_clamped_hi": pc.cast(out.column("ch_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def cohort_matrix(sf_dir: str, num_partitions: int | None = None):
    """Cohort retention matrix: users grouped by FIRST-ACTIVE week, counted
    in each subsequent week — the (cohort_week, weeks_since) table behind
    every retention chart (period_retention's adjacent-pair check is one
    diagonal of this).

    Scale shape: pass 1 reduces events to each user's first-week (min
    aggregate with per-batch combiner); pass 2 reduces events to distinct
    (user, week) pairs (packed np.unique per batch + one dedup groupby);
    the two user-keyed tables hash-join natively, and the (cohort, k)
    counts pre-aggregate per batch into the final bounded-domain groupby
    (weeks x weeks rows at most).

    Output: (cohort_week, weeks_since, n_users).
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..functions.tables import strip_schema_metadata

    def first_partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        t = pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "w": pa.array(us // _WEEK_US),
            }
        )
        return t.group_by("user_id").aggregate([("w", "min")])

    ev = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    )

    first_week = (
        ev.map_batches(first_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("w_min", alias_name="w0"))
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        pack = np.unique(uid * np.int64(1 << 12) + us // _WEEK_US)
        return pa.table(
            {
                "puser": pa.array(pack >> 12),
                "week": pa.array(pack & ((1 << 12) - 1)),
                "one": pa.array(np.ones(len(pack), dtype=np.int64)),
            }
        )

    pairs = (
        ev.map_batches(distinct_pairs, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {
                    "pack": pa.array(
                        t.column("puser").to_numpy() * np.int64(1 << 12)
                        + t.column("week").to_numpy()
                    ),
                    "one": t.column("one"),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("pack")
        .aggregate(Sum("one", alias_name="dup"))
        .map_batches(
            lambda t: pa.table(
                {
                    "puser": pa.array(
                        pc.cast(t.column("pack"), pa.int64()).to_numpy() >> 12
                    ),
                    "week": pa.array(
                        pc.cast(t.column("pack"), pa.int64()).to_numpy()
                        & ((1 << 12) - 1)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    from .relational import _join_partitions, _multi_join_args

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))
    joined = pairs.join(
        first_week,
        join_type="inner",
        num_partitions=num_partitions,
        on=("puser",),
        right_on=("user_id",),
        aggregator_ray_remote_args=agg_args,
    )

    def cohort_partial(t: pa.Table) -> pa.Table:
        w0 = pc.cast(t.column("w0"), pa.int64()).to_numpy()
        wk = pc.cast(t.column("week"), pa.int64()).to_numpy()
        out = pa.table(
            {
                "cohort_week": pa.array(w0),
                "weeks_since": pa.array(wk - w0),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        return out.group_by(["cohort_week", "weeks_since"]).aggregate(
            [("n", "sum")]
        )

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(["cohort_week", "weeks_since"]).aggregate(
            [("n_sum", "sum")]
        )
        return pa.table(
            {
                "cohort_week": pc.cast(out.column("cohort_week"), pa.int64()),
                "weeks_since": pc.cast(out.column("weeks_since"), pa.int64()),
                "n_users": pc.cast(out.column("n_sum_sum"), pa.int64()),
            }
        )

    # bounded domain (weeks x weeks): repartition(1) + one Arrow group_by
    return (
        joined.map_batches(cohort_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def longest_type_run(sf_dir: str, num_buckets: int = 64):
    """Longest consecutive same-event-type run per user — the
    gaps-and-islands pattern (SQL: row_number difference grouping), as one
    vectorized bucketed pass: lexsort by (user, ts, event_id), run breaks =
    user change OR type change, run lengths by reduceat, per-user argmax
    with (length, earliest-run) tiebreak via packed max.

    Output: (user_id, run_type, run_len).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        codes, types = pd.factorize(g["event_type"])
        order = np.lexsort((eid, ts, uid))
        uid, codes = uid[order], codes[order].astype(np.int64)
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_run = new_user.copy()
        new_run[1:] |= codes[1:] != codes[:-1]
        run_start = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[run_start, n])
        run_user = uid[run_start]
        run_code = codes[run_start]
        # per-user argmax with earliest-run tiebreak: runs are in time
        # order per user, so pack (len, reverse run index) and take max
        run_idx_in_user = np.arange(len(run_start), dtype=np.int64)
        first_run_of_user = np.ones(len(run_start), dtype=bool)
        first_run_of_user[1:] = run_user[1:] != run_user[:-1]
        u_starts = np.flatnonzero(first_run_of_user)
        seg_of = np.cumsum(first_run_of_user) - 1
        local_idx = run_idx_in_user - u_starts[seg_of]
        BIG = np.int64(1 << 20)
        packed = run_len * BIG * BIG + (BIG - 1 - local_idx) * BIG + run_code
        best = np.maximum.reduceat(packed, u_starts)
        return pd.DataFrame(
            {
                "user_id": run_user[u_starts],
                "run_type": types.to_numpy()[(best % BIG).astype(np.int64)],
                "run_len": (best // (BIG * BIG)).astype(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "event_type"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def attribution_first_last(sf_dir: str, num_buckets: int = 64):
    """First-touch x last-touch attribution: for every user, the type of
    their first and last event (ordered by ts, event_id), counted per
    (first_type, last_type) pair — the marketing-attribution contingency
    table (SQL: two ROW_NUMBER picks joined on user).

    Scale shape: one hash(user) shuffle; per bucket one vectorized pass —
    lexsort by (user, ts, event_id), user boundaries give first/last rows
    directly, pairs count via a packed np.unique. Each bucket emits at most
    |types|^2 rows, so the cross-bucket reduce is metadata-scale.

    Output: (first_type, last_type, n_users).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        codes, types = pd.factorize(g["event_type"])
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        codes_s = codes[order].astype(np.int64)
        first_mask = np.r_[True, uid_s[1:] != uid_s[:-1]]
        last_mask = np.r_[uid_s[1:] != uid_s[:-1], True]
        k = max(len(types), 1)
        pair, counts = np.unique(
            codes_s[first_mask] * k + codes_s[last_mask], return_counts=True
        )
        tarr = types.to_numpy()
        return pd.DataFrame(
            {
                "first_type": tarr[pair // k],
                "last_type": tarr[pair % k],
                "n_users": counts.astype(np.int64),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(["first_type", "last_type"]).aggregate(
            [("n_users", "sum")]
        )
        return pa.table(
            {
                "first_type": out.column("first_type"),
                "last_type": out.column("last_type"),
                "n_users": pc.cast(out.column("n_users_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|types|^2) rows per bucket by construction
        .map_batches(merge, batch_format="pyarrow")
    )


def bounce_rate(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 64):
    """Bounce rate by session entry type: share (ppm) of sessions that
    contain exactly one event, grouped by the type of the session's first
    event (ordered by ts, event_id). Same 30-minute-gap session rule as
    ``sessionize``.

    Scale shape: one hash(user) shuffle; per bucket one vectorized pass —
    session starts = user boundary OR gap exceeded, entry rows are the
    starts themselves, a bounce is a start whose next row is also a start.
    Bounded |types| partials per bucket; exact integer ppm on the final
    block.

    Output: (entry_type, n_sessions, n_bounces, bounce_ppm).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        codes, types = pd.factorize(g["event_type"])
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        codes_s = codes[order].astype(np.int64)
        new_user = np.r_[True, uid_s[1:] != uid_s[:-1]]
        gap_hit = np.r_[True, (ts_s[1:] - ts_s[:-1]) > gap_us]
        start = new_user | gap_hit
        entry_c = codes_s[start]
        # a session bounces iff the row after its start is another start
        # (or the start is the last row of the bucket)
        nxt = np.r_[start[1:], True]
        bounce = nxt[start]
        k = max(len(types), 1)
        uniq, counts = np.unique(entry_c * 2 + bounce, return_counts=True)
        tarr = types.to_numpy()
        return pd.DataFrame(
            {
                "entry_type": tarr[uniq // 2],
                "is_bounce": (uniq % 2).astype(np.int64),
                "n": counts.astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["entry_type", "is_bounce"]).aggregate([("n", "sum")])
        et = g.column("entry_type").to_pylist()
        ib = pc.cast(g.column("is_bounce"), pa.int64()).to_pylist()
        n = pc.cast(g.column("n_sum"), pa.int64()).to_pylist()
        tot: dict = {}
        bnc: dict = {}
        for e, b, c in zip(et, ib, n):
            tot[e] = tot.get(e, 0) + c
            if b:
                bnc[e] = bnc.get(e, 0) + c
        keys = sorted(tot)
        return pa.table(
            {
                "entry_type": pa.array(keys, pa.string()),
                "n_sessions": pa.array([tot[k] for k in keys], pa.int64()),
                "n_bounces": pa.array([bnc.get(k, 0) for k in keys], pa.int64()),
                "bounce_ppm": pa.array(
                    [bnc.get(k, 0) * 1_000_000 // tot[k] for k in keys],
                    pa.int64(),
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(2|types|) rows per bucket by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def late_event_stats(sf_dir: str, num_buckets: int = 64):
    """Out-of-order arrival rate per event type: an event is LATE when its
    timestamp is behind the running maximum of the same user's earlier
    events in arrival (event_id) order — the watermark-lag signal a
    streaming ingester alarms on.

    Scale shape: one hash(user) shuffle; per bucket one vectorized pass —
    sort by (user, event_id), running max via pandas' Cython groupby
    cummax, boundary-masked shift; |types|-row partials per bucket.

    Output: (event_type, n_events, n_late, late_ppm).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], kind="mergesort")
        cm = g.groupby("user_id", sort=False)["ts"].cummax()
        prev = cm.shift(1)
        first = g["user_id"].to_numpy() != np.r_[np.int64(-1),
                                                 g["user_id"].to_numpy()[:-1]]
        late = (g["ts"].to_numpy() < prev.to_numpy()) & ~first
        out = pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                            "late": late.astype(np.int64)})
        agg = out.groupby("event_type", sort=False)["late"].agg(["count", "sum"])
        return pd.DataFrame(
            {
                "event_type": agg.index.to_numpy(),
                "n_events": agg["count"].to_numpy().astype(np.int64),
                "n_late": agg["sum"].to_numpy().astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n_events", "sum"), ("n_late", "sum")]
        )
        et = g.column("event_type").to_pylist()
        ne = pc.cast(g.column("n_events_sum"), pa.int64()).to_pylist()
        nl = pc.cast(g.column("n_late_sum"), pa.int64()).to_pylist()
        order = sorted(range(len(et)), key=lambda i: et[i])
        return pa.table(
            {
                "event_type": pa.array([et[i] for i in order], pa.string()),
                "n_events": pa.array([ne[i] for i in order], pa.int64()),
                "n_late": pa.array([nl[i] for i in order], pa.int64()),
                "late_ppm": pa.array(
                    [nl[i] * 1_000_000 // ne[i] for i in order], pa.int64()
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|types|) rows per bucket by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def event_dedup_hourly(sf_dir: str):
    """Telemetry dedup audit: collapse events to distinct (user, type,
    hour) cells and report the per-type duplication rate — the volume a
    windowed streaming dedup would drop.

    Scale shape: a per-batch combiner first reduces each batch to its
    distinct (packed user-hour, type) cells, so the one native groupby
    (packed int64 + type string composite key) moves one row per distinct
    cell per batch; per-type counts then reduce on the metadata-scale
    final block. The hour is packed modulo 2^20 (covers ~120 years of
    hours), mirrored exactly in the SQL oracle.

    Output: (event_type, n_events, n_cells, dup_ppm).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    _HOUR_US = np.int64(3_600_000_000)
    _MOD = np.int64(1 << 20)

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cell = uid * _MOD + (ts // _HOUR_US) % _MOD
        t = pa.table(
            {
                "cell": pa.array(cell),
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(cell), np.int64)),
            }
        )
        return t.group_by(["cell", "event_type"]).aggregate([("n", "sum")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "ts", "event_type"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["cell", "event_type"])
        .aggregate(Sum("n_sum", alias_name="n_events"))
    )

    def type_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "ne": pc.cast(t.column("n_events"), pa.int64()),
                "nc": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ).group_by("event_type").aggregate([("ne", "sum"), ("nc", "sum")])
        return g

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("ne_sum", "sum"), ("nc_sum", "sum")]
        )
        et = g.column("event_type").to_pylist()
        ne = pc.cast(g.column("ne_sum_sum"), pa.int64()).to_pylist()
        nc = pc.cast(g.column("nc_sum_sum"), pa.int64()).to_pylist()
        order = sorted(range(len(et)), key=lambda i: et[i])
        return pa.table(
            {
                "event_type": pa.array([et[i] for i in order], pa.string()),
                "n_events": pa.array([ne[i] for i in order], pa.int64()),
                "n_cells": pa.array([nc[i] for i in order], pa.int64()),
                "dup_ppm": pa.array(
                    [(ne[i] - nc[i]) * 1_000_000 // ne[i] for i in order],
                    pa.int64(),
                ),
            }
        )

    return (
        agg.map_batches(type_partial, batch_format="pyarrow")
        .repartition(1)  # O(|types|) rows per block by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def anomalous_days(sf_dir: str, factor: int = 2, trailing: int = 7):
    """Days whose event count exceeds ``factor`` x the trailing-N-day
    average — the volume-anomaly alarm. The comparison is exact-integer:
    n > factor * sum_prev / window  <=>  n * window > factor * sum_prev,
    where window counts only days with a full trailing history.

    Scale shape: per-batch (day -> count) combiner; the day domain is
    calendar-bounded, so the rolling pass is one vectorized scan over the
    O(|days|) final block (dense day axis, cumsum differences).

    Output: (day, n_events, trailing_sum, is_anomaly) for days with a
    full trailing window.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    _DAY_US = np.int64(86_400_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        day = ts // _DAY_US
        uniq, counts = np.unique(day, return_counts=True)
        return pa.table(
            {"day": pa.array(uniq), "n": pa.array(counts.astype(np.int64))}
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("n", "sum")])
        day = pc.cast(g.column("day"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum"), pa.int64()).to_numpy()
        order = np.argsort(day)
        day, n = day[order], n[order]
        # dense axis so "trailing 7 days" includes zero-count days
        lo, hi = day[0], day[-1]
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[day - lo] = n
        cs = np.r_[0, np.cumsum(dense)]
        # trailing sum of the `trailing` days BEFORE each day
        idx = np.arange(trailing, len(dense))
        trail = cs[idx] - cs[idx - trailing]
        cnt = dense[idx]
        is_anom = (cnt * np.int64(trailing)
                   > np.int64(factor) * trail).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(
                    ((idx + lo) * _DAY_US).astype("datetime64[us]")
                ),
                "n_events": pa.array(cnt),
                "trailing_sum": pa.array(trail),
                "is_anomaly": pa.array(is_anom),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|days|) rows per partial by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def user_activity_quartiles(sf_dir: str, tiles: int = 4,
                            bucket_size: int = 16):
    """Power-user concentration: users tiled into activity quartiles by
    global NTILE over (event count, user_id), with each tile's share of
    purchase events — who generates the conversions.

    Scale shape: the global rank reuses the range-partitioned two-pass of
    ``customer_spend_ntile`` (value buckets -> metadata-scale prefix sum ->
    in-bucket rebase); per-user (events, purchases) is a combiner + one
    native groupby; the tile reduce is O(tiles).

    Output: (quartile, n_users, n_events, n_purchases, purchase_ppm).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        purch = pc.cast(
            pc.equal(batch.column("event_type"), "purchase"), pa.int64()
        )
        return (
            pa.table(
                {
                    "user_id": uid,
                    "ne": pa.array(np.ones(batch.num_rows, np.int64)),
                    "np_": purch,
                }
            )
            .group_by("user_id")
            .aggregate([("ne", "sum"), ("np_", "sum")])
        )

    per_user = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("ne_sum", alias_name="n_events"),
                   Sum("np__sum", alias_name="n_purchases"))
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": pc.cast(t.column("user_id"), pa.int64()),
                    "n_events": pc.cast(t.column("n_events"), pa.int64()),
                    "n_purchases": pc.cast(t.column("n_purchases"), pa.int64()),
                    "vbucket": pc.cast(
                        pc.divide(pc.cast(t.column("n_events"), pa.int64()),
                                  bucket_size),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused by the count pass and the rank pass
    )

    counts = (
        per_user.map_batches(
            lambda t: t.select(["vbucket"]).group_by("vbucket").aggregate(
                [("vbucket", "count")]
            ),
            batch_format="pyarrow",
        )
        .groupby("vbucket")
        .aggregate(Sum("vbucket_count", alias_name="n"))
        .to_pandas()  # metadata scale: one row per activity-value bucket
        .sort_values("vbucket")
    )
    n_total = int(counts["n"].sum())
    csum = counts["n"].to_numpy().cumsum()
    offsets = dict(zip(counts["vbucket"].to_numpy().tolist(),
                       np.r_[0, csum[:-1]].tolist()))
    q, r = divmod(n_total, tiles)
    starts = np.array(
        [t * q + min(t, r) for t in range(1, tiles + 1)], dtype=np.int64
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ne = g["n_events"].to_numpy()
        uid = g["user_id"].to_numpy()
        npur = g["n_purchases"].to_numpy()
        order = np.lexsort((uid, ne))
        rank = int(offsets[int(g["vbucket"].iloc[0])]) + np.arange(
            len(g), dtype=np.int64
        )
        tile = np.searchsorted(starts, rank, side="right") + 1
        out = pd.DataFrame(
            {"quartile": tile, "ne": ne[order], "npur": npur[order]}
        )
        return (
            out.groupby("quartile", as_index=False)
            .agg(n_users=("ne", "size"), n_events=("ne", "sum"),
                 n_purchases=("npur", "sum"))
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("quartile").aggregate(
            [("n_users", "sum"), ("n_events", "sum"), ("n_purchases", "sum")]
        )
        qt = pc.cast(g.column("quartile"), pa.int64()).to_pylist()
        nu = pc.cast(g.column("n_users_sum"), pa.int64()).to_pylist()
        ne = pc.cast(g.column("n_events_sum"), pa.int64()).to_pylist()
        npr = pc.cast(g.column("n_purchases_sum"), pa.int64()).to_pylist()
        order = sorted(range(len(qt)), key=lambda i: qt[i])
        return pa.table(
            {
                "quartile": pa.array([qt[i] for i in order], pa.int64()),
                "n_users": pa.array([nu[i] for i in order], pa.int64()),
                "n_events": pa.array([ne[i] for i in order], pa.int64()),
                "n_purchases": pa.array([npr[i] for i in order], pa.int64()),
                "purchase_ppm": pa.array(
                    [npr[i] * 1_000_000 // ne[i] for i in order], pa.int64()
                ),
            }
        )

    return (
        per_user.groupby("vbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(tiles) rows per bucket by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def time_weighted_value(sf_dir: str, num_buckets: int = 64):
    """Time-weighted average event value per type: each event's value
    (cents) weighted by its dwell time (microseconds until the same user's
    next event, arrival order ts, event_id); users' last events carry no
    dwell and are excluded — the session-intensity metric that plain AVG
    misses.

    Scale shape: one hash(user) shuffle, per bucket one vectorized pass
    (lexsort + forward shift with boundary masking); |types|-row weighted
    sums per bucket; the final divide runs with Python bigints (value x
    dwell products overflow int64 at extreme scale; the partials note the
    decimal128 upgrade path).

    Output: (event_type, n_weighted, sum_dwell_us, twavg_cents).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        cents = g["cents"].to_numpy()
        codes, types = pd.factorize(g["event_type"])
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        cents_s, codes_s = cents[order], codes[order].astype(np.int64)
        same = uid_s[1:] == uid_s[:-1]
        dwell = (ts_s[1:] - ts_s[:-1])[same]
        c = cents_s[:-1][same]
        k = codes_s[:-1][same]
        out = pd.DataFrame(
            {"code": k, "wv": c * dwell, "w": dwell,
             "n": np.ones(len(k), np.int64)}
        ).groupby("code", as_index=False).sum()
        return pd.DataFrame(
            {
                "event_type": types.to_numpy()[out["code"].to_numpy()],
                "wv": out["wv"].to_numpy().astype(np.int64),
                "w": out["w"].to_numpy().astype(np.int64),
                "n": out["n"].to_numpy().astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("wv", "sum"), ("w", "sum"), ("n", "sum")]
        )
        et = g.column("event_type").to_pylist()
        wv = pc.cast(g.column("wv_sum"), pa.int64()).to_pylist()
        w = pc.cast(g.column("w_sum"), pa.int64()).to_pylist()
        n = pc.cast(g.column("n_sum"), pa.int64()).to_pylist()
        order = sorted(range(len(et)), key=lambda i: et[i])
        return pa.table(
            {
                "event_type": pa.array([et[i] for i in order], pa.string()),
                "n_weighted": pa.array([n[i] for i in order], pa.int64()),
                "sum_dwell_us": pa.array([w[i] for i in order], pa.int64()),
                "twavg_cents": pa.array(
                    [wv[i] // w[i] if w[i] else 0 for i in order], pa.int64()
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type", "value"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|types|) rows per bucket by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def user_resurrections(sf_dir: str, gap_days: int = 2, num_buckets: int = 64):
    """Resurrection histogram: per user, count consecutive-event gaps
    longer than ``gap_days`` (ordered by ts then event_id), then histogram
    users by resurrection count — the churn-and-return profile.

    Scale shape: one hash(user) bucket shuffle, ONE vectorized pass per
    bucket (lexsort + shifted-delta mask), and the histogram fold is a
    bounded-domain repartition(1) reduce over per-bucket partials.

    Output: (n_resurrections, n_users).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    gap_us = np.int64(gap_days) * 86_400_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = uid[1:] == uid[:-1]
        delta = np.zeros(n, dtype=np.int64)
        if n > 1:
            delta[1:] = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(
                np.int64
            )
        res = (same & (delta > gap_us)).astype(np.int64)
        # per-user resurrection counts via segment sums
        seg_first = np.flatnonzero(~same)
        csum = np.r_[0, np.cumsum(res)]
        ends = np.r_[seg_first[1:], n]
        per_user = csum[ends] - csum[seg_first]
        cnt = np.bincount(per_user)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame(
            {"n_resurrections": nz.astype(np.int64),
             "n_users": cnt[nz].astype(np.int64)}
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_resurrections").aggregate([("n_users", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_resurrections", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_resurrections": pc.cast(g.column("n_resurrections"),
                                           pa.int64()),
                "n_users": pc.cast(g.column("n_users_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|distinct counts| x buckets) rows
        .map_batches(finish, batch_format="pyarrow")
    )


def gap_hour_histogram(sf_dir: str, num_buckets: int = 64):
    """Inter-event gap histogram: hours between a user's consecutive
    events (any type), keyed by the LATER event's type — the arrival-
    process profile behind session-gap tuning.

    Scale shape: hash(user) bucket shuffle, one vectorized lexsort pass
    per bucket, bounded (type x gap-hour) domain folds via repartition(1).

    Output: (event_type, gap_hours, n_gaps).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": pc.cast(batch.column("event_type"), pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = uid[1:] == uid[:-1]
        delta = np.zeros(n, dtype=np.int64)
        if n > 1:
            delta[1:] = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(
                np.int64
            )
        keep = same
        gh = delta[keep] // 3_600_000_000
        out = pd.DataFrame({"event_type": et[keep], "gap_hours": gh})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "gap_hours"], as_index=False)[
            "n"
        ].sum()

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "gap_hours"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("event_type", "ascending"),
                          ("gap_hours", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "gap_hours": pc.cast(g.column("gap_hours"), pa.int64()),
                "n_gaps": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|types| x |gap hours|) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def value_autocorr_terms(sf_dir: str, num_buckets: int = 64):
    """Lag-1 autocorrelation SUFFICIENT STATISTICS of event value per
    event type, over consecutive events of the same (user, type): pair
    count and exact-integer sums (x=prev cents, y=current cents) of x, y,
    xy, xx, yy — everything Pearson r needs, computed without a single
    float so the oracle is exact. (At extreme corpus scale the xx/xy sums
    need rescaled units — cents keep int64 headroom through ~1e8 pairs.)

    Scale shape: hash(user) bucket shuffle, one lexsort pass per bucket,
    bounded |types| fold via repartition(1).

    Output: (event_type, n_pairs, sum_x, sum_y, sum_xy, sum_xx, sum_yy).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": pc.cast(batch.column("event_type"), pa.string()),
                "cents": pa.array(cents),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        v = g["cents"].to_numpy()
        # sequence key is (user, type): lexsort puts each sequence
        # contiguous, time-ordered
        order = np.lexsort((eid, ts, et, uid))
        uid, et, v = uid[order], et[order], v[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        x = np.roll(v, 1)
        keep = same
        xt, yt, tt = x[keep], v[keep], et[keep]
        out = pd.DataFrame(
            {
                "event_type": tt,
                "n_pairs": np.int64(1),
                "sum_x": xt,
                "sum_y": yt,
                "sum_xy": xt * yt,
                "sum_xx": xt * xt,
                "sum_yy": yt * yt,
            }
        )
        return out.groupby("event_type", as_index=False).sum()

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n_pairs", "sum"), ("sum_x", "sum"), ("sum_y", "sum"),
             ("sum_xy", "sum"), ("sum_xx", "sum"), ("sum_yy", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("event_type", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_pairs": pc.cast(g.column("n_pairs_sum"), pa.int64()),
                "sum_x": pc.cast(g.column("sum_x_sum"), pa.int64()),
                "sum_y": pc.cast(g.column("sum_y_sum"), pa.int64()),
                "sum_xy": pc.cast(g.column("sum_xy_sum"), pa.int64()),
                "sum_xx": pc.cast(g.column("sum_xx_sum"), pa.int64()),
                "sum_yy": pc.cast(g.column("sum_yy_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type", "value"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|types| x buckets) partial rows
        .map_batches(finish, batch_format="pyarrow")
    )


def event_type_affinity(sf_dir: str, num_buckets: int = 64):
    """Type co-engagement: for every unordered event-type pair, how many
    users did BOTH — the feature-affinity matrix behind cross-sell and
    funnel design.

    Scale shape: per-batch distinct (user, type) pairs combine before ONE
    pair-dedup shuffle; pair generation is a per-user-bucket vectorized
    triangular expansion (types per user are bounded by the type domain);
    the (type, type) matrix folds on its bounded domain.

    Output: (type_a, type_b, n_users) with type_a < type_b.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def distinct_partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "event_type": pc.cast(batch.column("event_type"),
                                      pa.string()),
            }
        ).group_by(["user_id", "event_type"]).aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows, np.int64)))

    pairs = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
        )
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("one", alias_name="one"))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_type": t.column("event_type"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((et, uid))
        uid, et = uid[order], et[order]
        n = len(g)
        first = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.flatnonzero(first)
        sizes = np.diff(np.r_[seg, n])
        # triangular expansion: for each user segment of size s, all (i<j)
        reps = sizes * (sizes - 1) // 2
        if reps.sum() == 0:
            return pd.DataFrame(
                {"type_a": pd.Series(dtype="object"),
                 "type_b": pd.Series(dtype="object"),
                 "n": pd.Series(dtype="int64")}
            )
        # vectorize by distinct segment size (bounded by |type domain|):
        # one triu template per size, broadcast over all same-size users
        ai, bi = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            starts = seg[sizes == s]
            iu, ju = np.triu_indices(int(s), k=1)
            ai.append((starts[:, None] + iu[None, :]).ravel())
            bi.append((starts[:, None] + ju[None, :]).ravel())
        ai = np.concatenate(ai)
        bi = np.concatenate(bi)
        out = pd.DataFrame({"type_a": et[ai], "type_b": et[bi]})
        out["n"] = np.int64(1)
        return out.groupby(["type_a", "type_b"], as_index=False)["n"].sum()

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["type_a", "type_b"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("type_a", "ascending"), ("type_b", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "type_a": g.column("type_a"),
                "type_b": g.column("type_b"),
                "n_users": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |types|^2 rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def gap_hour_quantiles(sf_dir: str, num_buckets: int = 64):
    """Exact discrete quartiles (p25/p50/p75, SQL quantile_disc rule:
    element at rank floor((n-1)*q)) of hour-quantized inter-event gaps
    per event type — distributed GROUP-WISE QUANTILES from a bounded
    histogram instead of a global sort.

    Scale shape: hash(user) bucket shuffle + one lexsort pass per bucket
    produce (type, gap_hour) histogram partials; quartiles are read off
    the cumulative histogram in the bounded final block.

    Output: (event_type, n_gaps, p25_hours, p50_hours, p75_hours).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "event_type": pc.cast(batch.column("event_type"),
                                      pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = uid[1:] == uid[:-1]
        delta = np.zeros(n, dtype=np.int64)
        if n > 1:
            delta[1:] = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(
                np.int64
            )
        gh = delta[same] // 3_600_000_000
        out = pd.DataFrame({"event_type": et[same], "gap_h": gh})
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "gap_h"], as_index=False)["n"].sum()

    def finish(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["event_type", "gap_h"])
            .aggregate([("n", "sum")])
            .sort_by([("event_type", "ascending"), ("gap_h", "ascending")])
        )
        et = g.column("event_type").to_pylist()
        gh = pc.cast(g.column("gap_h"), pa.int64()).to_numpy()
        cnt = pc.cast(g.column("n_sum"), pa.int64()).to_numpy()
        rows = {"event_type": [], "n_gaps": [], "p25_hours": [],
                "p50_hours": [], "p75_hours": []}
        i = 0
        while i < len(et):
            j = i
            while j < len(et) and et[j] == et[i]:
                j += 1
            c = cnt[i:j]
            v = gh[i:j]
            total = int(c.sum())
            csum = np.cumsum(c)
            rows["event_type"].append(et[i])
            rows["n_gaps"].append(total)
            for q, col in ((1, "p25_hours"), (2, "p50_hours"),
                           (3, "p75_hours")):
                rank = (total - 1) * q // 4  # floor((n-1)*q) with q=k/4
                rows[col].append(int(v[np.searchsorted(csum, rank,
                                                       side="right")]))
            i = j
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "n_gaps": pa.array(rows["n_gaps"], pa.int64()),
                "p25_hours": pa.array(rows["p25_hours"], pa.int64()),
                "p50_hours": pa.array(rows["p50_hours"], pa.int64()),
                "p75_hours": pa.array(rows["p75_hours"], pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded (type x gap-hour) histogram
        .map_batches(finish, batch_format="pyarrow")
    )


def seasonality_matrix(sf_dir: str):
    """Event seasonality matrix: counts and value mass per (weekday,
    hour-of-day) cell — the 7x24 heatmap behind capacity planning.
    Weekday is integer epoch-day arithmetic (Sunday=0, matching SQL
    dayofweek; the epoch was a Thursday).

    Scale shape: single-scan bounded-domain (168-cell) combiner +
    repartition(1) fold; no shuffle of raw events.

    Output: (dow, hour, n_events, sum_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy()
        days = ts.astype("datetime64[D]").astype(np.int64)
        hours = ts.astype("datetime64[h]").astype(np.int64) % 24
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "dow": pa.array((days + 4) % 7),
                "hour": pa.array(hours),
                "n": pa.array(np.ones(len(days), np.int64)),
                "v": pa.array(cents),
            }
        )
        return t.group_by(["dow", "hour"]).aggregate(
            [("n", "sum"), ("v", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["dow", "hour"]).aggregate(
            [("n_sum", "sum"), ("v_sum", "sum")]
        )
        idx = pc.sort_indices(
            g, sort_keys=[("dow", "ascending"), ("hour", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "dow": pc.cast(g.column("dow"), pa.int64()),
                "hour": pc.cast(g.column("hour"), pa.int64()),
                "n_events": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_cents": pc.cast(g.column("v_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # 7 x 24 rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def user_streaks(sf_dir: str, num_buckets: int = 64):
    """Longest consecutive-day activity streak per user, histogrammed —
    the engagement-streak profile (gaps-and-islands over epoch days).

    Scale shape: batch-local distinct (user, day) combines before ONE
    hash(user) bucket shuffle; each bucket runs a single vectorized
    pass (lexsort -> island starts -> run lengths via flat cumsum ->
    per-user max via maximum.reduceat) and emits a bounded-domain
    (streak length) histogram partial folded by repartition(1).

    Output: (streak_days, n_users).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    day_us = np.int64(86_400_000_000)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        day = batch.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        ) // day_us
        # batch-local distinct via packed key (epoch day < 2^21)
        packed = np.unique(uid * (np.int64(1) << np.int64(21)) + day)
        u = packed >> np.int64(21)
        bucket = np.abs((u * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "uid": pa.array(u),
                "day": pa.array(packed & ((np.int64(1) << np.int64(21)) - 1)),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["uid"].to_numpy()
        day = g["day"].to_numpy()
        packed = np.unique(uid * (np.int64(1) << np.int64(21)) + day)
        uid = packed >> np.int64(21)
        day = packed & ((np.int64(1) << np.int64(21)) - 1)
        n = len(packed)
        if n == 0:
            return pd.DataFrame({"streak_days": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_run = new_user | np.r_[False, (day[1:] - day[:-1]) != 1]
        run_start = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[run_start, n])
        user_seg = np.flatnonzero(new_user[run_start])
        best = np.maximum.reduceat(run_len, user_seg)
        cnt = np.bincount(best)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"streak_days": nz.astype(np.int64),
                             "n_users": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("streak_days").aggregate([("n_users", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("streak_days", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "streak_days": pc.cast(g.column("streak_days"), pa.int64()),
                "n_users": pc.cast(g.column("n_users_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|streak lengths|) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def user_growth_curve(sf_dir: str, num_buckets: int = 64):
    """Daily new-user onsets and the cumulative user-base curve: each
    user's first-event day, counted per day, with a running total.

    Scale shape: batch-local per-user min-day partials combine before
    ONE hash(user) bucket shuffle; buckets finish the min and emit
    bounded (day, n_new) partials; the cumulative sum folds on the
    bounded day domain via repartition(1).

    Output: (day, n_new_users, cum_users) — day is the epoch-day index.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    day_us = np.int64(86_400_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        day = batch.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        ) // day_us
        g = pa.table({"uid": pa.array(uid), "day": pa.array(day)}).group_by(
            "uid"
        ).aggregate([("day", "min")])
        u = pc.cast(g.column("uid"), pa.int64()).to_numpy()
        bucket = np.abs((u * np.int64(2654435761)) % np.int64(num_buckets))
        return g.append_column("bucket", pa.array(bucket))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("uid", sort=False)["day_min"].min().to_numpy()
        day, n = np.unique(first, return_counts=True)
        return pd.DataFrame({"day": day.astype(np.int64),
                             "n": n.astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("day", "ascending")])
        g = g.take(idx)
        n = pc.cast(g.column("n_sum"), pa.int64()).to_numpy()
        return pa.table(
            {
                "day": pc.cast(g.column("day"), pa.int64()),
                "n_new_users": pa.array(n),
                "cum_users": pa.array(np.cumsum(n).astype(np.int64)),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|days|) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def peak_concurrency(sf_dir: str, ttl_seconds: int = 300):
    """Peak concurrent activity per event type, treating each event as
    a half-open activity interval [ts, ts + ttl) — the classic interval
    sweep (+1 at start, -1 at end, ends before starts at equal instants)
    reduced to its running-sum maximum.

    Scale shape: the sweep needs each type's boundaries in time order,
    so the partition key IS the event type (bounded domain); each group
    is one vectorized boundary sort + cumsum. At web scale a hot type's
    sweep is inherently sequential — the engine bounds it by the type
    domain, mirroring the sessionize partitioning assumption.

    Output: (event_type, peak_concurrent).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ttl_us = np.int64(ttl_seconds) * np.int64(1_000_000)

    def to_bounds(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        et = batch.column("event_type")
        n = len(ts)
        return pa.table(
            {
                "event_type": pa.concat_arrays(
                    [et.combine_chunks(), et.combine_chunks()]
                ),
                "t": pa.array(np.r_[ts, ts + ttl_us]),
                "d": pa.array(np.r_[np.ones(n, np.int64),
                                    -np.ones(n, np.int64)]),
            }
        )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        t = g["t"].to_numpy()
        d = g["d"].to_numpy()
        order = np.lexsort((d, t))  # -1 before +1 at equal t: half-open
        peak = int(np.cumsum(d[order]).max()) if len(d) else 0
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "peak_concurrent": np.array([peak], np.int64)}
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
        )
        .map_batches(to_bounds, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(per_type, batch_format="pandas")
    )


def burstiness_terms(sf_dir: str, num_buckets: int = 64):
    """Inter-arrival burstiness sufficient statistics per event type:
    count, sum, and sum-of-squares of consecutive same-(user, type)
    gaps in whole minutes — the integer inputs to a CV^2 dispersion
    monitor (regular vs bursty traffic) with no float on the wire.

    Scale shape: ONE hash(user) bucket shuffle keeps every user's
    per-type timeline whole; each bucket is a single lexsort +
    shifted-delta pass; the statistics fold on the bounded |types|
    domain via repartition(1). Minutes (not microseconds) keep the
    squared sums inside int64 at petabyte scale.

    Output: (event_type, n_gaps, sum_gap_min, sum_gap2_min).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    minute_us = np.int64(60_000_000)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "event_type": batch.column("event_type"),
                "ts": batch.column("ts"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        # bucket-local type codes (stable within this one array) keep the
        # lexsort integer-only; output still carries the real strings
        et_all = g["event_type"].to_numpy()
        _, codes = np.unique(et_all, return_inverse=True)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, codes, uid))
        uid, et, ts = uid[order], et_all[order], ts[order]
        codes = codes[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (codes[1:] == codes[:-1])
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap[1:] = (ts[1:] - ts[:-1]) // minute_us
        out = pd.DataFrame({"event_type": et[same], "g": gap[same]})
        out["n"] = np.int64(1)
        out["g2"] = out["g"] * out["g"]
        return out.groupby("event_type", as_index=False).agg(
            n_gaps=("n", "sum"), s=("g", "sum"), s2=("g2", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n_gaps", "sum"), ("s", "sum"), ("s2", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("event_type", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_gaps": pc.cast(g.column("n_gaps_sum"), pa.int64()),
                "sum_gap_min": pc.cast(g.column("s_sum"), pa.int64()),
                "sum_gap2_min": pc.cast(g.column("s2_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "event_type",
                                     "ts"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |types| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def daily_mix_divergence(sf_dir: str):
    """Per-day L1 divergence of the event-type mix from the corpus-wide
    mix, in exact integer cross-multiplied form: D(day) = sum over
    types |obs(day,type) * N_total - n(day) * N_type| — the drift
    monitor that flags days whose traffic composition shifted, with no
    ratio ever computed. Exact while cell*total < 2^63 (holds through
    ~3e9 events with 1e9-event cells); beyond that, pre-scale the grid
    (e.g. counts // 1024) before cross-multiplying.

    Scale shape: both grids are bounded (|days| x |types|), so
    per-batch count partials combine and the divergence is a two-stage
    repartition(1) fold (global type totals derived from the same
    bounded grid — one pass, no second scan).

    Output: (day, n_events, l1_divergence).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    day_us = np.int64(86_400_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        ) // day_us
        g = pa.table(
            {
                "day": pa.array(day),
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(day), np.int64)),
            }
        )
        return g.group_by(["day", "event_type"]).aggregate([("n", "sum")])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["day", "event_type"], as_index=False)["n_sum"].sum()
        piv = g.pivot_table(index="day", columns="event_type",
                            values="n_sum", aggfunc="sum",
                            fill_value=0).sort_index()
        m = piv.to_numpy().astype(np.int64)
        n_day = m.sum(axis=1)
        n_type = m.sum(axis=0)
        total = int(m.sum())
        div = np.abs(m * total - n_day[:, None] * n_type[None, :]).sum(
            axis=1
        )
        return pd.DataFrame(
            {
                "day": piv.index.to_numpy().astype(np.int64),
                "n_events": n_day.astype(np.int64),
                "l1_divergence": div.astype(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |days| x |types| grid per partial
        .map_batches(finish, batch_format="pandas")
    )


def props_value_corr_terms(sf_dir: str):
    """Cross-column correlation between the semi-structured props.k
    field and the event value, per type: exact integer Pearson terms
    (n, Sk, Sv, Skv, Skk, Svv with v = value cents) over rows where k
    extracts — the does-the-metadata-predict-the-metric probe.

    Scale shape: one vectorized RE2 extract + one bounded |types|
    combiner per batch; repartition(1) fold.

    Output: (event_type, n, sum_k, sum_v, sum_kv, sum_kk, sum_vv).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata, try_cast_int64

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch.column("props"), r'"k": (?P<k>-?\d+)')
        karr = try_cast_int64(pc.struct_field(ex, "k"))
        ok = pc.is_valid(karr).to_numpy(zero_copy_only=False)
        k = pc.fill_null(karr, 0).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = np.floor(
            batch.column("value").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        k, v = k[ok], v[ok]
        et = batch.column("event_type").to_numpy(zero_copy_only=False)[ok]
        t = pa.table(
            {
                "event_type": pa.array(et),
                "n": pa.array(np.ones(len(k), np.int64)),
                "sk": pa.array(k),
                "sv": pa.array(v),
                "skv": pa.array(k * v),
                "skk": pa.array(k * k),
                "svv": pa.array(v * v),
            }
        )
        return t.group_by("event_type").aggregate(
            [("n", "sum"), ("sk", "sum"), ("sv", "sum"), ("skv", "sum"),
             ("skk", "sum"), ("svv", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n_sum", "sum"), ("sk_sum", "sum"), ("sv_sum", "sum"),
             ("skv_sum", "sum"), ("skk_sum", "sum"), ("svv_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("event_type", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_k": pc.cast(g.column("sk_sum_sum"), pa.int64()),
                "sum_v": pc.cast(g.column("sv_sum_sum"), pa.int64()),
                "sum_kv": pc.cast(g.column("skv_sum_sum"), pa.int64()),
                "sum_kk": pc.cast(g.column("skk_sum_sum"), pa.int64()),
                "sum_vv": pc.cast(g.column("svv_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props", "value"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |types| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def value_ascent_streaks(sf_dir: str, num_buckets: int = 64):
    """Longest strictly-increasing value run per user (events in (ts,
    event_id) order), histogrammed — the monotone-trend variant of
    gaps-and-islands (momentum detection).

    Scale shape: ONE hash(user) bucket shuffle; each bucket is a single
    lexsort + shifted-compare pass (runs break on user change or
    non-increase), per-user max via maximum.reduceat; the bounded
    streak-length histogram folds via repartition(1).

    Output: (streak_len, n_users).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pa.array(uid),
                "ts": batch.column("ts"),
                "value": batch.column("value"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, val = uid[order], val[order]
        n = len(g)
        if n == 0:
            return pd.DataFrame({"streak_len": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        ascent = np.r_[False, val[1:] > val[:-1]]
        new_run = new_user | ~ascent
        run_start = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[run_start, n])
        user_seg = np.flatnonzero(new_user[run_start])
        best = np.maximum.reduceat(run_len, user_seg)
        cnt = np.bincount(best)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"streak_len": nz.astype(np.int64),
                             "n_users": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("streak_len").aggregate([("n_users", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("streak_len", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "streak_len": pc.cast(g.column("streak_len"), pa.int64()),
                "n_users": pc.cast(g.column("n_users_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |streak lengths| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def purchase_click_window(sf_dir: str, window_seconds: int = 86400,
                          num_buckets: int = 64):
    """Stream-stream WINDOW JOIN: for every purchase, the number of
    same-user clicks in the preceding ``window_seconds`` (default 24 h,
    second granularity, strictly before the purchase), histogrammed —
    the conversion-attribution window count.

    Scale shape: ONE hash(user) bucket shuffle co-locates both streams;
    inside a bucket the join is two np.searchsorted calls on a packed
    (uid << 31 | epoch_sec) axis — user blocks sit 2^31 apart so the
    window can never bleed across users — with no pairwise
    expansion ever materialized; the bounded count histogram folds via
    repartition(1).

    Output: (n_preceding_clicks, n_purchases) — zero-click purchases
    included.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    # 40-bit seconds field: epoch seconds stay below 2^40 until year ~36812
    # (a 31-bit field would wrap on 2038-01-19 and bleed clicks across user
    # blocks); uid must then fit 23 bits (< 8.4M) for the packed int64 —
    # both bounds asserted per batch below. Pre-1970 (negative) seconds are
    # rejected by the same assert.
    SHIFT = np.int64(1) << np.int64(40)
    win = np.int64(window_seconds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "click")
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()[keep]
        sec = (batch.column("ts").to_numpy().astype("datetime64[us]")
               .astype(np.int64) // np.int64(1_000_000))[keep]
        if len(sec):
            assert 0 <= sec.min() and sec.max() < int(SHIFT) - window_seconds, \
                "epoch seconds outside packed 40-bit window field"
            assert 0 <= uid.min() and uid.max() < (1 << 23), \
                "user_id outside packed 23-bit field"
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "key": pa.array(uid * SHIFT + sec),
                "is_purchase": pa.array(et[keep] == "purchase"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        isp = g["is_purchase"].to_numpy()
        ck = np.sort(key[~isp])
        pk = key[isp]
        if len(pk) == 0:
            return pd.DataFrame(
                {"n_preceding_clicks": pd.Series(dtype="int64"),
                 "n_purchases": pd.Series(dtype="int64")})
        hi = np.searchsorted(ck, pk, side="left")
        lo = np.searchsorted(ck, pk - win, side="left")
        cnt = np.bincount(hi - lo)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"n_preceding_clicks": nz.astype(np.int64),
                             "n_purchases": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_preceding_clicks").aggregate([("n_purchases",
                                                         "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("n_preceding_clicks", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "n_preceding_clicks": pc.cast(
                    g.column("n_preceding_clicks"), pa.int64()),
                "n_purchases": pc.cast(g.column("n_purchases_sum"),
                                       pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |click counts| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def drift_psi_terms(sf_dir: str, n_bins: int = 10):
    """Distribution-drift terms (PSI-style): split the event stream at its
    temporal midpoint, cut the REFERENCE half's value distribution into
    ``n_bins`` decile bins, and count both halves per bin. The population
    stability index is sum((cur%-ref%)*ln(cur%/ref%)) over these counts —
    emitting the integer bin counts keeps the oracle exact (no float log)
    and leaves the smoothing/threshold policy to the consumer.

    Determinism pins: values are compared in half-up CENTS; bin edges are
    DuckDB ``quantile_disc`` elements — the smallest value whose
    cumulative distribution reaches q, i.e. expanded index ceil(n*q)-1 of
    the sorted reference multiset (verified against DuckDB at tie-heavy
    sizes) — computed from a cumsum over the count-compressed
    distribution; bin id = number of edges strictly below the value.

    Scale shape: one Min/Max aggregate for the midpoint, then ONE
    count-compression shuffle — batches emit (cents, n_ref, n_cur)
    partials, the groupby reduces to one row per distinct cent value, and
    ONLY that compressed distribution (bounded by the value domain, not
    the event count — the take_all below is over distinct cent values)
    reaches the driver for the edge scan.

    Output: (bin, n_ref, n_cur), all int64.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def us_col(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.timestamp("us")).to_numpy()
        return pa.table({"us": us.astype("datetime64[us]").astype(np.int64)})

    mm = ds.map_batches(us_col, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    cut = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def partial(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.timestamp("us")).to_numpy()
        us = us.astype("datetime64[us]").astype(np.int64)
        v = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        is_ref = us < cut
        t = pa.table(
            {
                "v": pa.array(v),
                "n_ref": pa.array(is_ref.astype(np.int64)),
                "n_cur": pa.array((~is_ref).astype(np.int64)),
            }
        )
        return t.group_by("v").aggregate([("n_ref", "sum"), ("n_cur", "sum")])

    comp = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n_ref_sum", alias_name="n_ref"),
                   Sum("n_cur_sum", alias_name="n_cur"))
    )
    # bounded: one row per distinct cent value (value domain, not corpus)
    rows = comp.sort("v").take_all()
    v = np.array([r["v"] for r in rows], dtype=np.int64)
    nr = np.array([r["n_ref"] for r in rows], dtype=np.int64)
    nc = np.array([r["n_cur"] for r in rows], dtype=np.int64)
    cum = np.cumsum(nr)
    n = int(cum[-1]) if len(cum) else 0
    edges = []
    import math

    for b in range(1, n_bins):
        q = b / n_bins
        # quantile_disc: smallest value with cume_dist >= q -> rank ceil(n*q)
        rank = math.ceil(n * q)
        edges.append(int(v[np.searchsorted(cum, rank, side="left")]))
    edges_arr = np.array(edges, dtype=np.int64)
    bins = np.searchsorted(edges_arr, v, side="left")  # edges strictly < v
    out_ref = np.bincount(bins, weights=nr, minlength=n_bins).astype(np.int64)
    out_cur = np.bincount(bins, weights=nc, minlength=n_bins).astype(np.int64)
    keep = (out_ref > 0) | (out_cur > 0)
    return pa.table(
        {
            "bin": pa.array(np.arange(n_bins, dtype=np.int64)[keep]),
            "n_ref": pa.array(out_ref[keep]),
            "n_cur": pa.array(out_cur[keep]),
        }
    )


# --------------------------------------------------- CUSUM change-point terms
def cusum_changepoint_terms(sf_dir: str):
    """Exact CUSUM change-point statistic per event type: over the type's
    events in (ts, event_id) order, the maximum deviation of the running
    value sum from its expected straight line, as the INTEGER
    dev_t = |n * cum_t - t * tot| (the mean-centered cumulative sum scaled
    by n so no float ever appears; D = dev/n in cents). The drift alarm
    for a metrics stream: a level shift in a type's value distribution
    puts the max near the shift index, reported as t_at_max (first index
    on ties).

    Scale shape — a two-pass distributed prefix scan, no global sort:
      pass 1: per-batch (type, day) partials -> one bounded groupby ->
        shard-scale driver fold computing each (type, day) shard's
        exclusive (count, sum) offsets plus per-type (n, tot);
      pass 2: one (type, day) groupby; each shard lexsorts ITS OWN rows,
        local-cumsums, rebases with the broadcast offsets, and emits a
        single (max dev, argmax) row; the final reduce is shard-scale.
    Shards follow the calendar (bounded), never the corpus. int64
    headroom: n * cum_t caps at ~9.2e18 — fine to ~1e8 events of ~1e6
    cents per type; beyond that pre-scale cents (document the quantum) or
    lift to object ints in the shard kernel.

    Output: (event_type, n_events, tot_cents, cusum_num, t_at_max) —
    int64 except the type; D = cusum_num / n_events (cents).
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def shard_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us"))
        day = pc.cast(pc.floor_temporal(ts, unit="day"), pa.int64())
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "s": pa.array(cents),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )

    ev = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
    )
    shards = (
        ev.map_batches(shard_partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum(["n_sum", "s_sum"])
        .to_pandas()  # bounded: |types| x |days|
    )
    shards = shards.sort_values(["event_type", "day"], kind="mergesort")
    off: dict[tuple, tuple] = {}
    for typ, grp in shards.groupby("event_type", sort=False):
        nc = grp["sum(n_sum)"].to_numpy().astype(np.int64)
        sc = grp["sum(s_sum)"].to_numpy().astype(np.int64)
        n_t, tot_t = int(nc.sum()), int(sc.sum())
        off_c = np.r_[0, np.cumsum(nc)[:-1]]
        off_s = np.r_[0, np.cumsum(sc)[:-1]]
        for d, oc, os_ in zip(grp["day"].to_numpy(), off_c, off_s):
            off[(typ, int(d))] = (int(oc), int(os_), n_t, tot_t)
    off_ref = ray.put(off)

    def add_shard_key(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us"))
        day = pc.cast(pc.floor_temporal(ts, unit="day"), pa.int64())
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "ts": ts,
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "cents": pa.array(cents),
            }
        )

    def shard_kernel(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        typ = g["event_type"].iloc[0]
        oc, os_, n_t, tot_t = o[(typ, int(g["day"].iloc[0]))]
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["ts"].to_numpy())
        )
        lc = np.cumsum(g["cents"].to_numpy()[order])
        idx = oc + np.arange(1, len(lc) + 1, dtype=np.int64)
        dev = np.abs(n_t * (os_ + lc) - idx * tot_t)
        j = int(np.argmax(dev))  # first max — ties resolve to smallest t
        return pd.DataFrame(
            {
                "event_type": [typ],
                "n_events": np.array([n_t], dtype=np.int64),
                "tot_cents": np.array([tot_t], dtype=np.int64),
                "dev": np.array([int(dev[j])], dtype=np.int64),
                "t": np.array([int(idx[j])], dtype=np.int64),
            }
        )

    per_shard = (
        ev.map_batches(add_shard_key, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .map_groups(shard_kernel, batch_format="pandas")
        .to_pandas()  # shard-scale
    )
    rows = []
    for typ, grp in per_shard.groupby("event_type", sort=True):
        mx = int(grp["dev"].max())
        t_at = int(grp.loc[grp["dev"] == mx, "t"].min())
        rows.append(
            (typ, int(grp["n_events"].iloc[0]),
             int(grp["tot_cents"].iloc[0]), mx, t_at)
        )
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], type=pa.string()),
            "n_events": pa.array([r[1] for r in rows], type=pa.int64()),
            "tot_cents": pa.array([r[2] for r in rows], type=pa.int64()),
            "cusum_num": pa.array([r[3] for r in rows], type=pa.int64()),
            "t_at_max": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def user_day_impurity_terms(sf_dir: str, num_buckets: int = 64):
    """Behavioral-diversity impurity: treat every (user, calendar-day)
    block as a mini-session and compute the exact integer Gini-impurity
    terms of its event-type mix — per block size n, how many blocks exist
    and the summed sum-of-squared-type-counts. Gini impurity of a block
    is 1 - ssq/n^2; blocks near 0 are single-purpose (bots, scrapers),
    blocks near the max are exploratory humans — emitting the integer
    terms keeps the oracle exact and leaves the float to the consumer.

    Scale shape: each batch pre-aggregates to (user, day, type, count)
    rows (bounded by distinct triples per batch, far below row count),
    then ONE hash(user, day) bucket shuffle co-locates every block's
    partials; the per-bucket kernel is two vectorized pandas groupbys,
    and the bounded (n_events, ...) histogram folds via repartition(1).

    Output: (n_events, n_user_days, sum_ssq), all int64.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        day = (batch.column("ts").to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "day": day, "event_type": et})
        g = df.groupby(["user_id", "day", "event_type"], as_index=False,
                       sort=False).size()
        key = g["user_id"].to_numpy() * np.int64(1 << 20) + g["day"].to_numpy()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy()),
                "day": pa.array(g["day"].to_numpy()),
                "event_type": pa.array(g["event_type"].to_numpy()),
                "c": pa.array(g["size"].to_numpy().astype(np.int64)),
                "bucket": pa.array(
                    (key * np.int64(2654435761)) % np.int64(num_buckets)
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["user_id", "day", "event_type"], as_index=False,
                      sort=False)["c"].sum()
        t["csq"] = t["c"] * t["c"]
        b = t.groupby(["user_id", "day"], as_index=False, sort=False).agg(
            n=("c", "sum"), ssq=("csq", "sum")
        )
        h = b.groupby("n", as_index=False).agg(
            n_user_days=("n", "size"), sum_ssq=("ssq", "sum")
        )
        return pd.DataFrame(
            {
                "n_events": h["n"].to_numpy().astype(np.int64),
                "n_user_days": h["n_user_days"].to_numpy().astype(np.int64),
                "sum_ssq": h["sum_ssq"].to_numpy().astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_events").aggregate(
            [("n_user_days", "sum"), ("sum_ssq", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("n_events", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_events": pc.cast(g.column("n_events"), pa.int64()),
                "n_user_days": pc.cast(g.column("n_user_days_sum"),
                                       pa.int64()),
                "sum_ssq": pc.cast(g.column("sum_ssq_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |distinct n| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def interval_coverage(sf_dir: str, duration_seconds: int = 30,
                      num_buckets: int = 64):
    """Interval-UNION coverage per user: extend every event to a
    [ts, ts + duration) activity interval, merge overlapping-or-touching
    intervals (sweep-line), and report per user the exact covered
    seconds, the interval count, and the merged-island count — the
    active-time metric that naive sum(duration) double-counts whenever
    events burst. The companion to peak_concurrency (max overlap) on the
    other classic interval primitive (union length).

    Scale shape: ONE hash(user) bucket shuffle; inside a bucket the sweep
    is fully vectorized pandas — sort by (user, start), grouped running
    max of interval ends (cummax) shifted by one row, island ids by
    cumsum of gap breaks, two groupbys for island extents and user
    totals. Per-user output rows (users are corpus-scale/1000s, not
    event-scale).

    Output: (user_id, n_intervals, n_islands, covered_seconds), int64.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    dur = np.int64(duration_seconds)

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        sec = (batch.column("ts").to_numpy().astype("datetime64[us]")
               .astype(np.int64) // np.int64(1_000_000))
        return pa.table(
            {
                "user_id": uid,
                "s": sec,
                "bucket": (uid * np.int64(2654435761))
                % np.int64(num_buckets),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "s"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        s = g["s"].to_numpy()
        e = s + dur
        first = np.r_[True, uid[1:] != uid[:-1]]
        df = pd.DataFrame({"uid": uid, "s": s, "e": e})
        # prev interval end = grouped running max of e, shifted one row;
        # the shift bleeding across user boundaries is harmless because
        # `first` forces a break there anyway
        prev_max = df.groupby("uid", sort=False)["e"].cummax().shift(1)
        # strict >: touching intervals (s == prev end) merge
        brk = first | (s > prev_max.to_numpy())
        isl = np.cumsum(brk)
        df["isl"] = isl
        ext = df.groupby("isl", sort=False).agg(
            uid=("uid", "first"), lo=("s", "min"), hi=("e", "max"),
            n=("s", "size")
        )
        out = ext.assign(cov=ext["hi"] - ext["lo"]).groupby(
            "uid", sort=False
        ).agg(
            n_intervals=("n", "sum"), n_islands=("cov", "size"),
            covered_seconds=("cov", "sum")
        )
        return pd.DataFrame(
            {
                "user_id": out.index.to_numpy().astype(np.int64),
                "n_intervals": out["n_intervals"].to_numpy().astype(np.int64),
                "n_islands": out["n_islands"].to_numpy().astype(np.int64),
                "covered_seconds": out["covered_seconds"].to_numpy()
                .astype(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def event_inversion_count(sf_dir: str, num_buckets: int = 256):
    """Stream-disorder audit: per user, the number of event pairs that
    ARRIVED out of event-time order — pairs (a, b) with a.event_id <
    b.event_id (arrival order) but a.ts > b.ts (event time). Equal
    timestamps are in order. This is the "how late/shuffled is my
    ingest" readout that sizes watermark allowances.

    Scale shape: one hash(user) bucket shuffle of three light columns;
    the per-user kernel is the vectorized O(n log^2 n) merge inversion
    counter (functions/inversions.py) — never a pairwise expansion.

    Output: (user_id, n_events, n_inversions).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.inversions import inversions_with_tiebreak
    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "sec": pc.cast(
                    pc.cast(batch.column("ts"), pa.timestamp("us")),
                    pa.int64(),
                ),
                "bucket": pc.cast(
                    pc.bit_wise_and(uid, num_buckets - 1), pa.int64()
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uids, n_ev, n_inv = [], [], []
        for uid, grp in g.groupby("user_id", sort=True):
            order = np.argsort(grp["event_id"].to_numpy(np.int64),
                               kind="mergesort")
            ts = grp["sec"].to_numpy(np.int64)[order]
            uids.append(int(uid))
            n_ev.append(len(ts))
            n_inv.append(
                inversions_with_tiebreak(
                    ts, np.arange(len(ts), dtype=np.int64)
                )
            )
        return pd.DataFrame(
            {
                "user_id": np.array(uids, np.int64),
                "n_events": np.array(n_ev, np.int64),
                "n_inversions": np.array(n_inv, np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def decayed_event_mass(sf_dir: str, horizon_days: int = 30):
    """Time-decayed activity mass per event type: each event within
    ``horizon_days`` of the stream's last day contributes
    2^(horizon - age_days) — an exponentially-decayed counter kept in
    EXACT integer arithmetic (the value is the decayed mass scaled by
    2^horizon, so no floats cross the wire and the oracle is exact).

    Scale shape: one tiny max(ts) aggregate pins the anchor day (a
    scalar on the driver), then a pure vectorized map + bounded |type|
    fold. At 100 TB the anchor would come from stream metadata instead
    of a scan; the shape is otherwise unchanged.

    Output: (event_type, n_events, n_recent, decayed_mass).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
    )
    anchor = np.datetime64(ds.max("ts"), "D").astype(np.int64)
    hd = np.int64(horizon_days)

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        age = anchor - day
        recent = age <= hd
        mass = np.where(recent, np.int64(1) << (hd - np.minimum(age, hd)),
                        np.int64(0))
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_events": pa.array(np.ones(len(day), np.int64)),
                "n_recent": pa.array(recent.astype(np.int64)),
                "decayed_mass": pa.array(mass),
            }
        )
        return t.group_by("event_type").aggregate(
            [("n_events", "sum"), ("n_recent", "sum"),
             ("decayed_mass", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n_events_sum", "sum"), ("n_recent_sum", "sum"),
             ("decayed_mass_sum", "sum")]
        )
        g = g.take(
            pc.sort_indices(g, sort_keys=[("event_type", "ascending")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_events": pc.cast(g.column("n_events_sum_sum"),
                                     pa.int64()),
                "n_recent": pc.cast(g.column("n_recent_sum_sum"),
                                    pa.int64()),
                "decayed_mass": pc.cast(
                    g.column("decayed_mass_sum_sum"), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |event_type| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def value_log2_histogram(sf_dir: str):
    """Log2-bucketed value histogram per event type: bucket b holds
    events whose value in cents satisfies 2^b <= cents < 2^(b+1)
    (cents = 0 events land in bucket -1) — the heavy-tail readout that
    decides quantile-sketch bin layouts, computed with EXACT integer
    bucket edges (a searchsorted against the power-of-two table, never a
    float log).

    Scale shape: pure vectorized map + bounded |type x 41| fold.

    Output: (event_type, bucket, n_events, sum_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    powers = np.int64(1) << np.arange(41, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("value").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        bucket = np.searchsorted(powers, cents, side="right") - 1
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "bucket": pa.array(bucket.astype(np.int64)),
                "n_events": pa.array(np.ones(len(cents), np.int64)),
                "sum_cents": pa.array(cents),
            }
        )
        return t.group_by(["event_type", "bucket"]).aggregate(
            [("n_events", "sum"), ("sum_cents", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "bucket"]).aggregate(
            [("n_events_sum", "sum"), ("sum_cents_sum", "sum")]
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("event_type", "ascending"),
                           ("bucket", "ascending")],
            )
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "bucket": pc.cast(g.column("bucket"), pa.int64()),
                "n_events": pc.cast(g.column("n_events_sum_sum"),
                                    pa.int64()),
                "sum_cents": pc.cast(g.column("sum_cents_sum_sum"),
                                     pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["event_type", "value"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |type| x 41 buckets
        .map_batches(finish, batch_format="pyarrow")
    )


def scd2_intervals(sf_dir: str, num_buckets: int = 256):
    """Slowly-changing-dimension (type-2) history build: each user's
    event stream is banded into a value segment (cents // 2000, capped
    at 4) and collapsed into validity intervals — one row per run of
    equal segments, valid_from = first event of the run, valid_to =
    first event of the NEXT run (the change point; the open last run
    closes at the user's final event). This is the warehouse CDC
    operator that turns an event log into a dimension history.

    Scale shape: one hash(user) bucket shuffle of light columns; the
    per-user kernel is a sort + one change-point diff, fully vectorized
    per bucket.

    Output: (user_id, segment, valid_from, valid_to).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        cents = np.floor(
            batch.column("value").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": uid,
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "us": pc.cast(
                    pc.cast(batch.column("ts"), pa.timestamp("us")),
                    pa.int64(),
                ),
                "seg": pa.array(np.minimum(cents // 2000, 4)),
                "bucket": pc.cast(
                    pc.bit_wise_and(uid, num_buckets - 1), pa.int64()
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        seg = g["seg"].to_numpy(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        change = new_user | np.r_[True, seg[1:] != seg[:-1]]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(g)]
        # valid_to: next run's first ts within the same user, else the
        # user's last event ts
        nxt_start_us = np.where(
            ends < len(g), us[np.minimum(ends, len(g) - 1)], 0
        )
        same_user_next = (ends < len(g)) & (
            uid[np.minimum(ends, len(g) - 1)] == uid[starts]
        )
        # last event index of each user run-block
        last_us = us[ends - 1]
        # find each user's overall last ts: per run, the last run of the
        # user closes at that user's max ts == us[ends-1] of the user's
        # final run; since runs are contiguous per user, for non-final
        # runs valid_to is next run start
        valid_to = np.where(same_user_next, nxt_start_us, last_us)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "segment": seg[starts],
                "valid_from": us[starts].astype("datetime64[us]"),
                "valid_to": valid_to.astype("datetime64[us]"),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "value"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def alert_debounce_tumbling(sf_dir: str, threshold_cents: int = 5000,
                            window_seconds: int = 604800,
                            num_buckets: int = 256):
    """Debounced alerting: events whose value crosses the threshold fire
    at most ONE alert per user per tumbling cooldown window (epoch-
    aligned) — the alert-storm suppression a monitoring pipeline applies
    before paging.

    Scale shape: one hash(user) bucket shuffle of light columns; alerts
    are the per-(user, window) minimum (ts, event_id) among qualifying
    events, a vectorized group-min per bucket.

    Output: (user_id, n_qualifying, n_alerts, first_alert_sec).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    win = np.int64(window_seconds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        cents = np.floor(
            batch.column("value").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        sec = (batch.column("ts").to_numpy().astype("datetime64[us]")
               .astype(np.int64) // np.int64(1_000_000))
        t = pa.table(
            {
                "user_id": uid,
                "sec": pa.array(sec),
                "qual": pa.array((cents >= threshold_cents)
                                 .astype(np.int64)),
                "bucket": pc.cast(
                    pc.bit_wise_and(uid, num_buckets - 1), pa.int64()
                ),
            }
        )
        return t.filter(pc.equal(t.column("qual"), 1))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["window"] = g["sec"].to_numpy(np.int64) // win
        alerts = g.groupby(["user_id", "window"], as_index=False).agg(
            alert_sec=("sec", "min")
        )
        out = alerts.groupby("user_id", as_index=False).agg(
            n_alerts=("alert_sec", "size"),
            first_alert_sec=("alert_sec", "min"),
        )
        nq = g.groupby("user_id", as_index=False).agg(
            n_qualifying=("sec", "size")
        )
        out = out.merge(nq, on="user_id")
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(np.int64),
                "n_qualifying": out["n_qualifying"].to_numpy(np.int64),
                "n_alerts": out["n_alerts"].to_numpy(np.int64),
                "first_alert_sec": out["first_alert_sec"]
                .to_numpy(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "ts", "value"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def watermark_drop_audit(sf_dir: str, delay_seconds: int = 3600,
                         bucket_size: int = 1 << 16):
    """Watermark drop simulation: replaying the stream in ARRIVAL order
    (event_id), an event is dropped when its event time lags the
    high-water mark (max event time seen strictly before it) by more
    than ``delay_seconds`` — the exact count a streaming engine with
    that allowed-lateness would discard, per event type.

    Scale shape: a distributed PREFIX-MAX scan. Pass A folds per-batch
    (arrival-bucket, max event time) partials into one bounded carry
    table (bucket count = n / bucket_size; size bucket_size so the
    carry stays metadata-scale, documented); the exclusive running max
    over bucket maxima broadcasts in the closure; pass B re-buckets rows
    once and applies carry + an in-bucket cumulative max. No global
    sort, no row-scale driver pull.

    Output: (event_type, n_events, n_dropped).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    w_us = np.int64(delay_seconds) * np.int64(1_000_000)

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "ts"],
        )
    )

    def partial_max(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch.column("event_id"), pa.int64()).to_numpy()
        us = (batch.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        t = pa.table(
            {
                "abucket": pa.array(eid // np.int64(bucket_size)),
                "max_us": pa.array(us),
            }
        )
        return t.group_by("abucket").aggregate([("max_us", "max")])

    # pass A: bounded carry table (one row per arrival bucket)
    maxima = (
        ds.map_batches(partial_max, batch_format="pyarrow")
        .groupby("abucket")
        .max("max_us_max")
        .to_pandas()  # bounded: n_events / bucket_size rows
        .sort_values("abucket")
    )
    buckets = maxima["abucket"].to_numpy(np.int64)
    bmax = maxima["max(max_us_max)"].to_numpy(np.int64)
    run = np.maximum.accumulate(bmax)
    # sentinel well below any timestamp but with headroom so the later
    # ``prefix - w_us`` cannot wrap int64
    carry_vals = np.r_[np.int64(-(1 << 62)), run[:-1]]

    def add_bucket(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch.column("event_id"), pa.int64()).to_numpy()
        us = (batch.column("ts").to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        return pa.table(
            {
                "event_id": pa.array(eid),
                "event_type": batch.column("event_type"),
                "us": pa.array(us),
                "abucket": pa.array(eid // np.int64(bucket_size)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        us = g["us"].to_numpy(np.int64)
        b = int(g["abucket"].iloc[0])
        carry = carry_vals[np.searchsorted(buckets, b)]
        prefix = np.r_[carry, np.maximum.accumulate(us)[:-1]]
        prefix = np.maximum(prefix, carry)
        dropped = us < prefix - w_us
        out = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy(),
             "n_events": np.ones(len(g), np.int64),
             "n_dropped": dropped.astype(np.int64)}
        )
        return out.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), n_dropped=("n_dropped", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n_events", "sum"), ("n_dropped", "sum")]
        )
        g = g.take(
            pc.sort_indices(g, sort_keys=[("event_type", "ascending")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_events": pc.cast(g.column("n_events_sum"), pa.int64()),
                "n_dropped": pc.cast(g.column("n_dropped_sum"), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("abucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |event_type| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def lww_merge_audit(sf_dir: str):
    """Last-writer-wins merge WITH TOMBSTONES (merge-on-read compaction):
    the event log is a CDC stream keyed by user — 'error' events are
    deletes, everything else upserts the user's value — and the merged
    state keeps each key's highest event_id. The audit reports the
    compacted table's shape, the delete/live split, and the surviving
    value mass.

    Scale shape: the winning row rides a PACKED ARGMAX through an
    ordinary max aggregate (event_id dominant, tombstone bit + cents in
    the low bits), so the merge is a per-batch combiner + ONE key
    shuffle, never a sort. Packing bounds asserted per batch.

    Output: one row (n_keys, n_live, n_deleted, sum_live_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch.column("event_id"), pa.int64()).to_numpy()
        cents = np.floor(
            batch.column("value").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        tomb = (et == "error").astype(np.int64)
        if len(eid):
            assert 0 <= eid.min() and eid.max() < (1 << 42), \
                "event_id outside packed 42-bit field"
            assert 0 <= cents.min() and cents.max() < (1 << 19), \
                "cents outside packed 19-bit field"
        pack = eid * (np.int64(1) << 20) + tomb * (np.int64(1) << 19) + cents
        t = pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "pack": pa.array(pack),
            }
        )
        return t.group_by("user_id").aggregate([("pack", "max")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("pack_max", "max")])
        pack = pc.cast(g.column("pack_max_max"), pa.int64()).to_numpy()
        tomb = (pack >> 19) & 1
        cents = pack & ((np.int64(1) << 19) - 1)
        live = tomb == 0
        return pa.table(
            {
                "n_keys": pa.array([np.int64(len(pack))]),
                "n_live": pa.array([np.int64(live.sum())]),
                "n_deleted": pa.array([np.int64((~live).sum())]),
                "sum_live_cents": pa.array([np.int64(cents[live].sum())]),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "event_type", "value"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # one packed row per distinct user per block
        .map_batches(finish, batch_format="pyarrow")
    )


def partition_prune_audit(sf_dir: str, lo_cents: int = 2000,
                          hi_cents: int = 2500):
    """Zone-map pruning audit: with the stream laid out in daily
    partitions, each partition's (min, max) value statistics decide
    whether a range predicate [lo, hi] needs to scan it at all — the
    file-skipping arithmetic every lakehouse reader runs against its
    manifest. The audit reports how many partitions and rows the zone
    maps save.

    Scale shape: per-batch per-day min/max/count combiner (bounded by
    the calendar, not the row count), one bounded fold computing the
    overlap test per partition.

    Output: one row (n_partitions, n_scanned, n_pruned, rows_scanned,
    rows_total).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        cents = np.floor(
            batch.column("value").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "day": pa.array(day),
                "mn": pa.array(cents),
                "mx": pa.array(cents),
                "n": pa.array(np.ones(len(day), np.int64)),
            }
        )
        return t.group_by("day").aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate(
            [("mn_min", "min"), ("mx_max", "max"), ("n_sum", "sum")]
        )
        mn = pc.cast(g.column("mn_min_min"), pa.int64()).to_numpy()
        mx = pc.cast(g.column("mx_max_max"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_numpy()
        scanned = (mx >= lo_cents) & (mn <= hi_cents)
        return pa.table(
            {
                "n_partitions": pa.array([np.int64(len(mn))]),
                "n_scanned": pa.array([np.int64(scanned.sum())]),
                "n_pruned": pa.array([np.int64((~scanned).sum())]),
                "rows_scanned": pa.array([np.int64(n[scanned].sum())]),
                "rows_total": pa.array([np.int64(n.sum())]),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "value"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |days| rows per block
        .map_batches(finish, batch_format="pyarrow")
    )


def bipartite_projection_weights(sf_dir: str, num_buckets: int = 256):
    """Bipartite projection: the user/event-type graph projected onto
    event types, edge weight = number of users exhibiting BOTH types —
    the co-engagement graph a recommender bootstraps from. Unordered
    type pairs, types compared lexicographically.

    Scale shape: per-batch distinct (user, type) combiner, one
    hash(user) bucket shuffle, per-user pair enumeration over <= |types|
    codes (bounded), bounded |types|^2 fold.

    Output: (type_a, type_b, n_users) with type_a < type_b.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        t = pa.table(
            {"user_id": uid, "event_type": batch.column("event_type")}
        )
        t = t.group_by(["user_id", "event_type"]).aggregate([])
        u = pc.cast(t.column("user_id"), pa.int64())
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(u, num_buckets - 1),
                              pa.int64())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # type-presence bitmask per user, then each type pair counts
        # masks carrying both bits — no per-user Python loop
        g = g.drop_duplicates(["user_id", "event_type"])
        types = sorted(g["event_type"].unique())
        code = {t: i for i, t in enumerate(types)}
        bit = np.int64(1) << g["event_type"].map(code).to_numpy(np.int64)
        mask = pd.Series(bit).groupby(
            g["user_id"].to_numpy()
        ).sum().to_numpy(np.int64)
        ta, tb, n = [], [], []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                both = np.int64((1 << i) | (1 << j))
                cnt = int(((mask & both) == both).sum())
                if cnt:
                    ta.append(types[i])
                    tb.append(types[j])
                    n.append(cnt)
        return pd.DataFrame(
            {
                "type_a": ta,
                "type_b": tb,
                "n_users": np.array(n, np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["type_a", "type_b"]).aggregate([("n_users", "sum")])
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("type_a", "ascending"), ("type_b", "ascending")],
            )
        )
        return pa.table(
            {
                "type_a": g.column("type_a"),
                "type_b": g.column("type_b"),
                "n_users": pc.cast(g.column("n_users_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "event_type"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |types|^2 rows
        .map_batches(finish, batch_format="pyarrow")
    )


def orphan_purchase_counts(sf_dir: str, window_seconds: int = 86400,
                           num_buckets: int = 64):
    """ANTI window join: purchases with NO same-user click in the
    preceding ``window_seconds`` — the negation of
    ``purchase_click_window`` (cold conversions that attribution cannot
    explain), reported per user.

    Scale shape: identical to the window join — one hash(user) bucket
    shuffle, packed (uid << 40 | sec) searchsorted — except the
    predicate keeps the ZERO-match purchases; per-user counts are the
    bounded output.

    Output: (user_id, n_purchases, n_orphans).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    SHIFT = np.int64(1) << np.int64(40)
    win = np.int64(window_seconds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "click")
        uid = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()[keep]
        sec = (batch.column("ts").to_numpy().astype("datetime64[us]")
               .astype(np.int64) // np.int64(1_000_000))[keep]
        if len(sec):
            assert 0 <= sec.min() and sec.max() < int(SHIFT) - window_seconds
            assert 0 <= uid.min() and uid.max() < (1 << 23)
        bucket = np.abs((uid * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "key": pa.array(uid * SHIFT + sec),
                "is_purchase": pa.array(et[keep] == "purchase"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        isp = g["is_purchase"].to_numpy()
        ck = np.sort(key[~isp])
        pk = key[isp]
        if len(pk) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "n_purchases": pd.Series(dtype="int64"),
                 "n_orphans": pd.Series(dtype="int64")})
        hi = np.searchsorted(ck, pk, side="left")
        lo = np.searchsorted(ck, pk - win, side="left")
        orphan = (hi - lo) == 0
        uid = (pk // int(SHIFT)).astype(np.int64)
        out = pd.DataFrame(
            {"user_id": uid, "n_purchases": np.ones(len(uid), np.int64),
             "n_orphans": orphan.astype(np.int64)}
        )
        return out.groupby("user_id", as_index=False).agg(
            n_purchases=("n_purchases", "sum"),
            n_orphans=("n_orphans", "sum"),
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "ts", "event_type"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def arrival_dispersion_terms(sf_dir: str):
    """Poisson-dispersion sufficient statistics for the arrival process:
    per event type, the per-hour arrival counts' (n_hours, sum, sum of
    squares) over the DENSE hour range — variance/mean >> 1 means bursty
    arrivals and invalidates Poisson capacity planning. Dense hours
    matter: empty hours are real observations of zero.

    Scale shape: per-batch bounded (type, hour-slot) combiner, one
    bounded fold that densifies against the global [min, max] slot range
    (terms for empty slots contribute n_hours only).

    Output: (event_type, n_hours, sum_events, sum_sq_events).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        hour = (batch.column("ts").to_numpy().astype("datetime64[h]")
                .astype(np.int64))
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "slot": pa.array(hour),
                "n": pa.array(np.ones(len(hour), np.int64)),
            }
        )
        return t.group_by(["event_type", "slot"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby(["event_type", "slot"], as_index=False)[
            "n_sum"
        ].sum()
        lo, hi = int(g["slot"].min()), int(g["slot"].max())
        n_hours = np.int64(hi - lo + 1)
        agg = g.groupby("event_type").agg(
            sum_events=("n_sum", "sum"),
            sum_sq_events=("n_sum", lambda s: int((s.to_numpy(np.int64)
                                                   ** 2).sum())),
        )
        agg = agg.sort_index()
        return pa.table(
            {
                "event_type": pa.array(agg.index, pa.string()),
                "n_hours": pa.array(
                    np.full(len(agg), n_hours, np.int64)
                ),
                "sum_events": pa.array(
                    agg["sum_events"].to_numpy(np.int64)
                ),
                "sum_sq_events": pa.array(
                    agg["sum_sq_events"].to_numpy(np.int64)
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |type| x |hours| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def max_burst_window(sf_dir: str, window_seconds: int = 3600):
    """Maximum-burst detection: per event type, the largest number of
    events in ANY ``window_seconds`` sliding window (window starts at an
    event, closed-open [s, s+w)) and the earliest second achieving it —
    the capacity-planning number a tumbling histogram underestimates
    (bursts straddle tumbling boundaries).

    Scale shape: events bucket by (type, day) with each bucket also
    reading the FIRST ``window_seconds`` of the next day (a window
    starting on day d ends strictly inside d+1, so the overlap makes
    every bucket self-contained); the per-bucket kernel is two
    searchsorted calls; bounded (type, day)-local maxima fold to the
    global answer. Window ownership is by start day, so no double
    counting.

    Output: (event_type, max_burst, first_start_sec).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    w = np.int64(window_seconds)
    DAY = np.int64(86400)

    def fan_out(batch: pa.Table) -> pa.Table:
        sec = (batch.column("ts").to_numpy().astype("datetime64[us]")
               .astype(np.int64) // np.int64(1_000_000))
        et = batch.column("event_type")
        day = sec // DAY
        # each event belongs to its own day AND (when inside the first
        # window of a day) to the previous day's overlap region
        own = pa.table(
            {"event_type": et, "sec": pa.array(sec),
             "day": pa.array(day),
             "is_start": pa.array(np.ones(len(sec), np.int64))}
        )
        in_overlap = (sec % DAY) < w
        ov = pa.table(
            {"event_type": et, "sec": pa.array(sec),
             "day": pa.array(day - 1),
             "is_start": pa.array(np.zeros(len(sec), np.int64))}
        ).filter(pa.array(in_overlap))
        return pa.concat_tables([own, ov])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_t, out_c, out_s = [], [], []
        for et, grp in g.groupby("event_type"):
            allsec = np.sort(grp["sec"].to_numpy(np.int64))
            starts = np.sort(
                grp[grp["is_start"] == 1]["sec"].to_numpy(np.int64)
            )
            if len(starts) == 0:
                continue
            lo = np.searchsorted(allsec, starts, side="left")
            hi = np.searchsorted(allsec, starts + w, side="left")
            cnt = hi - lo
            best = int(cnt.max())
            out_t.append(et)
            out_c.append(best)
            out_s.append(int(starts[cnt == best].min()))
        return pd.DataFrame(
            {"event_type": out_t,
             "max_burst": np.array(out_c, np.int64),
             "first_start_sec": np.array(out_s, np.int64)}
        )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        mx = df.groupby("event_type")["max_burst"].max()
        rows = []
        for et, m in mx.items():
            cand = df[(df["event_type"] == et) & (df["max_burst"] == m)]
            rows.append((et, int(m), int(cand["first_start_sec"].min())))
        rows.sort()
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "max_burst": pa.array([r[1] for r in rows], pa.int64()),
                "first_start_sec": pa.array([r[2] for r in rows],
                                            pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
            )
        )
        .map_batches(fan_out, batch_format="pyarrow")
        .groupby("day")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |type| x |days| local maxima
        .map_batches(finish, batch_format="pyarrow")
    )


def leadlag_xcorr_terms(sf_dir: str, type_a: str = "click",
                        type_b: str = "purchase", max_lag: int = 3):
    """Lead-lag cross-correlation terms between two event types' DAILY
    series: for each lag in [-max_lag, +max_lag], the exact integer
    inner product sum_d a(d) * b(d + lag) plus the marginal sums — does
    click volume lead purchase volume, and by how many days? The float
    correlation is one driver expression away.

    Scale shape: per-batch bounded (type, day) combiner; the day-domain
    is calendar-bounded so the lag products fold on one node.

    Output: (lag, n_days, sum_ab, sum_a, sum_b).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        keep = (et == type_a) | (et == type_b)
        day = (batch.column("ts").to_numpy().astype("datetime64[D]")
               .astype(np.int64))[keep]
        t = pa.table(
            {
                "event_type": pa.array(et[keep]),
                "day": pa.array(day),
                "n": pa.array(np.ones(len(day), np.int64)),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["event_type", "day"], as_index=False)["n_sum"].sum()
        lo, hi = int(g["day"].min()), int(g["day"].max())
        n_days = hi - lo + 1
        a = np.zeros(n_days, np.int64)
        b = np.zeros(n_days, np.int64)
        for _, r in g.iterrows():
            (a if r["event_type"] == type_a else b)[
                int(r["day"]) - lo
            ] = int(r["n_sum"])
        lags, sab, sa, sb, nd = [], [], [], [], []
        for lag in range(-max_lag, max_lag + 1):
            if lag >= 0:
                av, bv = a[: n_days - lag], b[lag:]
            else:
                av, bv = a[-lag:], b[: n_days + lag]
            lags.append(lag)
            nd.append(len(av))
            sab.append(int((av * bv).sum()))
            sa.append(int(av.sum()))
            sb.append(int(bv.sum()))
        return pa.table(
            {
                "lag": pa.array(np.array(lags, np.int64)),
                "n_days": pa.array(np.array(nd, np.int64)),
                "sum_ab": pa.array(np.array(sab, np.int64)),
                "sum_a": pa.array(np.array(sa, np.int64)),
                "sum_b": pa.array(np.array(sb, np.int64)),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |type| x |days| rows
        .map_batches(finish, batch_format="pyarrow")
    )
