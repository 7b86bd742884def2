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
                "window_start": t.column("window_start"),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "sum_value": pa.array(np.round(t.column("sum_value").to_numpy(), 4)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based session windows per user (the streaming-shaped workload as a
    batch computation): events are partitioned by user (the one shuffle) and
    each group is sessionized over its time-sorted events with pandas. A new
    session starts when the gap to the previous event exceeds ``gap_minutes``.

    Output: (user_id, session_id [1-based per user], n_events, start_ts,
    end_ts). Ordering assumption: only intra-user order matters, established
    by the in-group sort.
    """
    import pandas as pd
    import ray.data as rd

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        new_session = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        g["session_id"] = new_session.cumsum().astype("int64")
        out = (
            g.groupby("session_id")
            .agg(n_events=("ts", "size"), start_ts=("ts", "min"), end_ts=("ts", "max"))
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from ..functions.tables import strip_schema_metadata

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return strip_schema_metadata(ds).groupby("user_id").map_groups(
        per_user, batch_format="pandas"
    )
