"""Relational join / grouped-statistics pipelines over the TPC-H-shaped
tables (``lineitem``, ``orders``, ``customer``, ``nation``).

These exercise the two join strategies a 100-TB engine needs, explicitly:

- **Big-big join** -> Ray Data's native hash-shuffle ``Dataset.join``
  (both sides exchanged on the key across ``num_partitions`` aggregators;
  no side is materialized on the driver). The fact side is ALWAYS
  pre-aggregated per key inside ``map_batches`` first (combiner before the
  exchange), so the shuffle moves one row per (key, block) instead of one
  per fact row.
- **Big-small join** -> broadcast: the dimension table is ``ray.put`` into
  the object store ONCE and every map task does a zero-copy ``ray.get`` +
  ``pyarrow.Table.join`` per batch (an Arrow hash join in C++, not a Python
  dict probe). No shuffle at all for the dimension hop.

All money arithmetic is integer (prices/discounts scaled to cents with
``floor(x*100 + 0.5)`` — half-up on both sides, avoiding Python/SQL
banker's-rounding divergence), so every query has an exact DuckDB value
oracle. At 10^12-row scale the int64 revenue accumulators would need a
decimal128 upgrade; the structure (partial-agg -> hash join -> partial-agg
-> small groupby) is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    """floor(x*100 + 0.5) as int64 — matches SQL CAST(floor(x*100+0.5) AS BIGINT)."""
    return np.floor(col.to_numpy() * 100.0 + 0.5).astype(np.int64)


def _join_partitions(num_partitions: int | None) -> int:
    """Cluster-aware default for hash-shuffle join partition count.

    The aggregator pool is a FIXED per-join cost (actor spawn + schema
    dissemination) that grows with num_partitions: measured at sf0.1/32
    cpus, one join at 16 partitions costs 4.4 s vs 2.9 s at 4; a later
    interleaved A/B (round 5, 3 rounds each) put revenue_by_priority at
    3.69 / 3.09 / 2.84 s and top_revenue_orders at 5.12 / 4.92 / 4.34 s
    median for 8 / 4 / 2 partitions. Partition count should track cluster
    size (cpus // 8, floor 2), not be a constant — at 4096 cluster CPUs
    that is 512 partitions, at a 32-cpu dev box 4. The divisor trades the
    fixed spawn cost against per-aggregator shuffle volume; callers with
    known-large shuffles pin it explicitly.
    """
    if num_partitions is not None:
        return num_partitions
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 8)


def revenue_by_priority(sf_dir: str, num_partitions: int | None = None):
    """Revenue per order priority: lineitem JOIN orders (big-big).

    Scale shape: lineitem batches are reduced to per-orderkey partial
    revenue sums BEFORE the join (one row per (orderkey, block) — for TPC-H
    ~4 lineitems/order this is a 4x cut on top of the block-local dedup of
    repeated keys), then a native hash-shuffle join against the pruned
    orders projection, then a per-batch partial aggregation by priority so
    the final groupby moves ~5 rows per block. Revenue unit is
    cents x (100 - discount_pct), i.e. price x 10^4, exact in int64.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata
    num_partitions = _join_partitions(num_partitions)

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "rev": pa.array(rev),
            }
        )
        return t.group_by("l_orderkey").aggregate([("rev", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def prio_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "rev": pc.cast(batch.column("rev_sum"), pa.int64()),
            }
        )
        return t.group_by("o_orderpriority").aggregate([("rev", "sum")])

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("rev_sum", alias_name="revenue_x10000"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "revenue_x10000": pc.cast(t.column("revenue_x10000"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(sf_dir: str, num_partitions: int | None = None):
    """Order revenue per customer nation: orders JOIN customer (big-big,
    native hash-shuffle) then nation (25 rows) as a BROADCAST Arrow join.

    Scale shape: orders are partially summed per custkey inside each batch
    (combiner), hash-join against the (c_custkey, c_nationkey) projection,
    and the nation-name hop never shuffles — the dimension lives in the
    object store once (``ray.put``) and each batch does a zero-copy
    ``ray.get`` + ``pa.Table.join``. Output: (n_name, revenue_cents).
    """
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata
    num_partitions = _join_partitions(num_partitions)

    def ord_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("o_custkey").aggregate([("rev", "sum")])

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    ).map_batches(ord_partial, batch_format="pyarrow")

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat = pa.table(
        {
            "c_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat.replace_schema_metadata(None))

    def nation_partial(batch: pa.Table) -> pa.Table:
        dim = ray.get(nat_ref)  # zero-copy from the local object store
        t = pa.table(
            {
                "c_nationkey": batch.column("c_nationkey"),
                "rev": pc.cast(batch.column("rev_sum"), pa.int64()),
            }
        ).join(dim, keys="c_nationkey", join_type="inner")
        return t.group_by("n_name").aggregate([("rev", "sum")])

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_sum", alias_name="revenue_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t.column("n_name"),
                "revenue_cents": pc.cast(t.column("revenue_cents"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def group_quantiles(sf_dir: str, percentiles: tuple[int, ...] = (50, 90)):
    """EXACT per-group discrete quantiles without a global sort: the
    counting-selection pattern for bounded-domain columns.

    ``l_quantity`` takes ~50 integer values, so the exact quantile is
    recoverable from per-(group, value) counts: a per-batch combiner
    (group_by count inside map_batches) reduces each block to <= |groups| x
    |domain| rows, the shuffle moves only those tiny partials, and the final
    per-group pass walks the cumulative histogram. At 100 TB the exchanged
    state is STILL |groups| x |domain| x |blocks| — independent of row
    count — where a sort-based quantile would shuffle every row.

    Rank rule matches DuckDB ``quantile_disc(x, p/100)``: the smallest value
    whose cumulative count reaches ``ceil(p*n/100)`` (integer arithmetic:
    ``(p*n + 99) // 100`` — no float rank, no ceil-of-float hazard).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "qty": pc.cast(batch.column("l_quantity"), pa.int64()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["l_returnflag", "qty"]).aggregate([("n", "sum")])

    counts = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty"])
        .aggregate(Sum("n_sum", alias_name="n"))
    )

    def select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("qty")
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        qty = g["qty"].to_numpy()
        row = {"l_returnflag": g["l_returnflag"].iloc[0], "n_items": np.int64(n)}
        for p in percentiles:
            rank = (p * n + 99) // 100
            row[f"p{p}_qty"] = np.int64(qty[np.searchsorted(cum, rank)])
        return pd.DataFrame([row])

    return counts.groupby("l_returnflag").map_groups(select, batch_format="pandas")


def customers_without_orders(
    sf_dir: str, priority: str = "1-URGENT", num_partitions: int | None = None
):
    """Customers with no order of the given priority — the distributed
    ANTI-JOIN (the "which documents have no near-duplicate / no label / no
    embedding" shape of a training-data pipeline, exercised on the TPC-H
    pair; every customer has SOME order in the synthetic data, so the
    predicate keeps the result non-trivial).

    Scale shape: the orders side is filtered AT THE READ (predicate
    pushdown — only matching row groups leave storage) and reduced to
    per-batch DISTINCT custkeys inside map_batches (combiner — the shuffle
    moves one row per distinct key per block, not one per order), then Ray
    Data's native hash-shuffle ``left_anti`` join partitions BOTH sides on
    the key across ``num_partitions`` aggregators. No side is broadcast or
    materialized on the driver, so it holds when both sides are 100-TB
    tables. Money is integer cents (floor(x*100+0.5)) for an exact SQL
    oracle.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata
    num_partitions = _join_partitions(num_partitions)

    def cust_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "nationkey": pc.cast(batch.column("c_nationkey"), pa.int64()),
                "acctbal_cents": pa.array(_cents(batch.column("c_acctbal"))),
            }
        )

    def orders_keys(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"o_custkey": pc.cast(batch.column("o_custkey"), pa.int64())}
        )
        return t.group_by("o_custkey").aggregate([])  # block-local distinct

    cust = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
    ).map_batches(cust_prep, batch_format="pyarrow")

    import pyarrow.dataset as pads

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pads.field("o_orderpriority") == priority,
        )
    ).map_batches(orders_keys, batch_format="pyarrow")

    return cust.join(
        orders,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


# quantity bands for the broadcast range join: (lo, hi) inclusive, label.
# Deliberately non-uniform so searchsorted is doing real work.
QTY_BANDS = [(1, 5, "tiny"), (6, 15, "small"), (16, 30, "mid"), (31, 50, "bulk")]


def revenue_by_quantity_band(sf_dir: str):
    """Revenue per quantity band — the BROADCAST RANGE JOIN (non-equi):
    every lineitem row matched to the band whose [lo, hi] contains its
    quantity, then revenue aggregated per band.

    Scale shape: the interval side is tiny and static, so the right
    strategy is NOT a shuffle join but a broadcast + vectorized interval
    probe — band edges ship in the task closure (``ray.put`` for bigger
    interval tables) and each batch resolves every row with ONE
    ``np.searchsorted`` against the sorted lower edges (intervals here are
    contiguous and non-overlapping; overlapping intervals would emit one
    row per match instead). Per-batch partial aggregation means the final
    groupby moves ~4 rows per block. Money in cents x (100 - disc_pct),
    exact int64.

    Output: (band, n_items, revenue_x10000).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    lo_edges = np.array([b[0] for b in QTY_BANDS], dtype=np.int64)
    labels = np.array([b[2] for b in QTY_BANDS])

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.int64()).to_numpy()
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        band_idx = np.searchsorted(lo_edges, qty, side="right") - 1
        t = pa.table(
            {
                "band": pa.array(labels[band_idx]),
                "n": pa.array(np.ones(len(qty), dtype=np.int64)),
                "rev": pa.array(rev),
            }
        )
        return t.group_by("band").aggregate([("n", "sum"), ("rev", "sum")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_quantity", "l_extendedprice", "l_discount"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            Sum("n_sum", alias_name="n_items"),
            Sum("rev_sum", alias_name="revenue_x10000"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band": t.column("band"),
                "n_items": pc.cast(t.column("n_items"), pa.int64()),
                "revenue_x10000": pc.cast(t.column("revenue_x10000"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def pricing_summary(sf_dir: str, cutoff: str = "1999-01-01"):
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) sums of
    quantity, base price, discounted price and charge over lineitems shipped
    at-or-before ``cutoff``.

    Scale shape: the date predicate is pushed INTO the parquet read (row
    groups outside the cutoff never leave storage), all four sums are
    computed per batch into <= |flag x status| (~6) partial rows, and the
    final groupby moves only those partials. Money is integer all the way:
    cents, cents x (100 - disc_pct), cents x (100 - disc) x (100 + tax) —
    exact in int64 up to ~10^5 x TPC-H-SF1000 row counts.

    Output: (l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_x10000, sum_charge_x1000000, n_items).
    """
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        tax = _cents(batch.column("l_tax"))
        disc_price = cents * (100 - disc)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pc.cast(batch.column("l_quantity"), pa.int64()),
                "base": pa.array(cents),
                "disc_price": pa.array(disc_price),
                "charge": pa.array(disc_price * (100 + tax)),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc_price", "sum"),
             ("charge", "sum"), ("n", "sum")]
        )

    import datetime

    cut = datetime.datetime.fromisoformat(cutoff)
    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=[
                    "l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
                ],
                filter=pads.field("l_shipdate") <= cut,
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_sum", alias_name="sum_qty"),
            Sum("base_sum", alias_name="sum_base_cents"),
            Sum("disc_price_sum", alias_name="sum_disc_x10000"),
            Sum("charge_sum", alias_name="sum_charge_x1000000"),
            Sum("n_sum", alias_name="n_items"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = ["sum_qty", "sum_base_cents", "sum_disc_x10000",
                "sum_charge_x1000000", "n_items"]
        out = {"l_returnflag": t.column("l_returnflag"),
               "l_linestatus": t.column("l_linestatus")}
        for c in cols:
            out[c] = pc.cast(t.column(c), pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def top_order_per_priority(sf_dir: str):
    """Distributed ARGMAX per group: for each order priority, the single
    order with the highest total price (ties broken by the larger orderkey),
    WITHOUT a sort — the (value, id) pair is packed into one int64
    (``cents * 2^32 + orderkey``: lexicographic max == packed max), reduced
    per batch to <= 5 partial rows, then a tiny Max groupby. At 100 TB the
    shuffle moves |priorities| rows per block; a sort-based top-1 would move
    every row. Valid while cents < 2^31 and orderkey < 2^32 (TPC-H SF1000
    fits; beyond that the pack widens to decimal128).

    Output: (o_orderpriority, top_orderkey, top_price_cents).
    """
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("o_totalprice"))
        okey = pc.cast(batch.column("o_orderkey"), pa.int64()).to_numpy()
        packed = cents * np.int64(1 << 32) + okey
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "packed": pa.array(packed),
            }
        )
        return t.group_by("o_orderpriority").aggregate([("packed", "max")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Max("packed_max", alias_name="packed"))
    )

    def finish(t: pa.Table) -> pa.Table:
        packed = pc.cast(t.column("packed"), pa.int64()).to_numpy()
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "top_orderkey": pa.array(packed % np.int64(1 << 32)),
                "top_price_cents": pa.array(packed // np.int64(1 << 32)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rollup_revenue(sf_dir: str):
    """Multi-level ROLLUP aggregate — revenue at (returnflag, linestatus),
    (returnflag, ALL) and (ALL, ALL) grain in one pass.

    Scale shape: only the FINEST grain is computed distributed (per-batch
    partials -> small groupby); the coarser levels are derived FROM the
    finest aggregate, which is bounded by the key domain (|flags| x
    |statuses| ~ 6 rows) — never by data size — so the single-partition
    rollup step is O(domain) regardless of input scale. The 'ALL' sentinel
    replaces SQL's NULL grouping keys (deterministic hash compare).

    Output: (l_returnflag, l_linestatus, revenue_x10000, n_items) at all
    three grains.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "rev": pa.array(rev),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("rev", "sum"), ("n", "sum")]
        )

    fine = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_returnflag", "l_linestatus",
                         "l_extendedprice", "l_discount"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("rev_sum", alias_name="rev"), Sum("n_sum", alias_name="n"))
        # the aggregate is O(key domain) rows — single block by construction
        .repartition(1)
    )

    def rollup(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "l_returnflag": t.column("l_returnflag").to_pylist(),
                "l_linestatus": t.column("l_linestatus").to_pylist(),
                "rev": pc.cast(t.column("rev"), pa.int64()).to_numpy(),
                "n": pc.cast(t.column("n"), pa.int64()).to_numpy(),
            }
        )
        lvl1 = df.groupby("l_returnflag", as_index=False)[["rev", "n"]].sum()
        lvl1["l_linestatus"] = "ALL"
        lvl0 = pd.DataFrame(
            {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
             "rev": [df["rev"].sum()], "n": [df["n"].sum()]}
        )
        out = pd.concat([df, lvl1, lvl0], ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], type=pa.string()),
                "l_linestatus": pa.array(out["l_linestatus"], type=pa.string()),
                "revenue_x10000": pa.array(out["rev"].to_numpy().astype(np.int64)),
                "n_items": pa.array(out["n"].to_numpy().astype(np.int64)),
            }
        )

    return fine.map_batches(rollup, batch_format="pyarrow")


def _multi_join_args(num_partitions: int) -> tuple[int, dict]:
    """Partition count + aggregator resource override for DAGs with SEVERAL
    concurrent hash-shuffle joins.

    Ray's default sizes each join's aggregator pool at up to 50% of cluster
    CPUs — two joins in one DAG then reserve 100% and the map/read tasks
    feeding them starve (observed deadlock at 4 CPUs). Cap each pool at
    ~1/8 of the cluster instead so N joins + task stages always co-run.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(2, min(num_partitions, cpus * 2))
    per_agg = max(0.05, cpus / (8.0 * min(nparts, cpus)))
    return nparts, {"num_cpus": per_agg}


def top_revenue_orders(sf_dir: str, segment: str = "BUILDING",
                       date: str = "1998-01-01", k: int = 10,
                       num_partitions: int | None = None):
    """TPC-H Q3-shaped: top-k unshipped-revenue orders for one market
    segment — customer(filtered) |><| orders(filtered) |><| lineitem(filtered),
    then a global top-k by (revenue desc, orderkey asc).

    Scale shape: all three inputs are pruned AT THE READ (column projection
    + predicate pushdown), both joins are native hash-shuffle joins (no side
    broadcast or driver-side), the lineitem side is pre-summed per orderkey
    inside map_batches before its join, and the top-k is a per-batch partial
    top-k (sort only within a block) followed by one k-row final cut — no
    global sort of the join result. Revenue is cents x (100 - disc_pct).

    Output: (o_orderkey, o_orderdate, revenue_x10000).
    """
    import datetime

    import pyarrow.dataset as pads
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    d = datetime.datetime.fromisoformat(date)
    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    cust = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
            filter=pads.field("c_mktsegment") == segment,
        )
    ).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=pads.field("o_orderdate") < d,
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "o_orderdate": t.column("o_orderdate"),
            }
        ),
        batch_format="pyarrow",
    )

    ord_cust = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "rev": pa.array(rev),
            }
        )
        return t.group_by("l_orderkey").aggregate([("rev", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=pads.field("l_shipdate") > d,
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    joined = (
        li.join(
            ord_cust,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
            aggregator_ray_remote_args=agg_args,
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t.column("l_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                    "rev": pc.cast(t.column("rev_sum"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["o_orderkey", "o_orderdate"])
        .aggregate(Sum("rev", alias_name="revenue_x10000"))
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("revenue_x10000", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx[: min(k, len(t))])

    return (
        joined.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t.column("o_orderkey"),
                    # timestamp[us] to match the oracle's pandas dtype
                    # (timestamp[s] surfaces as datetime64[s])
                    "o_orderdate": pc.cast(
                        t.column("o_orderdate"), pa.timestamp("us")
                    ),
                    "revenue_x10000": pc.cast(
                        t.column("revenue_x10000"), pa.int64()
                    ),
                }
            ).take(
                pc.sort_indices(
                    t,
                    sort_keys=[("revenue_x10000", "descending"),
                               ("o_orderkey", "ascending")],
                )[:k]
            ),
            batch_format="pyarrow",
        )
    )


def promo_revenue_share(sf_dir: str, promo_type: str = "PROMO",
                        num_partitions: int | None = None):
    """Revenue share per part type (TPC-H Q14 generalized): lineitem |><|
    part on partkey (the second big-big join KEY in the schema), revenue
    per p_type, plus each type's share of total as integer ppm.

    Scale shape: lineitem pre-summed per partkey inside map_batches (the
    combiner collapses the join's left side to one row per (partkey,
    block)), native hash-shuffle join against the pruned part projection,
    per-batch partials by p_type, small groupby — then the SHARE is
    derived from the finished per-type aggregate, which is O(|types|)
    rows, on a single block (the same bounded-domain trick as
    rollup_revenue; no second pass over the data for the denominator).

    Output: (p_type, revenue_x10000, share_ppm).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata
    num_partitions = _join_partitions(num_partitions)

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "rev": pa.array(rev),
            }
        )
        return t.group_by("l_partkey").aggregate([("rev", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    part = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "p_type": pc.cast(t.column("p_type"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    agg = (
        li.join(
            part,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_partkey",),
            right_on=("p_partkey",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "p_type": t.column("p_type"),
                    "rev": pc.cast(t.column("rev_sum"), pa.int64()),
                }
            ).group_by("p_type").aggregate([("rev", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("p_type")
        .aggregate(Sum("rev_sum", alias_name="revenue_x10000"))
        .repartition(1)  # O(|p_type|) rows by construction
    )

    def share(t: pa.Table) -> pa.Table:
        rev = pc.cast(t.column("revenue_x10000"), pa.int64()).to_numpy()
        total = rev.sum()
        # ppm via Python int (unbounded) — rev * 10^6 can exceed int64
        ppm = np.array([int(r) * 1_000_000 // int(total) for r in rev],
                       dtype=np.int64)
        return pa.table(
            {
                "p_type": t.column("p_type"),
                "revenue_x10000": pa.array(rev),
                "share_ppm": pa.array(ppm),
            }
        )

    return agg.map_batches(share, batch_format="pyarrow")


def group_moments(sf_dir: str):
    """Per-group statistical moments (the building blocks of
    variance/covariance/correlation) as EXACT integers: per returnflag the
    sums of qty, price (whole dollars, floor(x+0.5)), their squares and
    the cross term. Downstream, corr/var are one driver-side formula away;
    keeping the moments integer avoids every float-summation-order hazard
    and makes the op embarrassingly combinable (moments are additive —
    the per-batch partials ARE the algebra of the final answer).

    Output: (l_returnflag, n, sum_qty, sum_price, sum_qty2, sum_price2,
    sum_qty_price). int64-safe through TPC-H SF1000 (price < 10^5 dollars,
    price^2 < 10^10, 10^10 x 10^10 rows overflows — shard to decimal128
    beyond that).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.int64()).to_numpy()
        price = np.floor(
            batch.column("l_extendedprice").to_numpy() + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "n": pa.array(np.ones(len(qty), dtype=np.int64)),
                "q": pa.array(qty),
                "p": pa.array(price),
                "q2": pa.array(qty * qty),
                "p2": pa.array(price * price),
                "qp": pa.array(qty * price),
            }
        )
        return t.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("q", "sum"), ("p", "sum"),
             ("q2", "sum"), ("p2", "sum"), ("qp", "sum")]
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_returnflag", "l_quantity", "l_extendedprice"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_sum", alias_name="n"),
            Sum("q_sum", alias_name="sum_qty"),
            Sum("p_sum", alias_name="sum_price"),
            Sum("q2_sum", alias_name="sum_qty2"),
            Sum("p2_sum", alias_name="sum_price2"),
            Sum("qp_sum", alias_name="sum_qty_price"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        out = {"l_returnflag": t.column("l_returnflag")}
        for c in ["n", "sum_qty", "sum_price", "sum_qty2", "sum_price2",
                  "sum_qty_price"]:
            out[c] = pc.cast(t.column(c), pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def monthly_revenue_growth(sf_dir: str):
    """Monthly revenue time series with month-over-month delta — the
    window-function-OVER-an-aggregate composition (LAG on a groupby
    result).

    Scale shape: the heavy part (per-month revenue) is a combiner +
    small groupby; the LAG runs on the O(|months|) aggregate, which is
    bounded by the calendar, not the data — one block by construction, so
    the sorted diff is a single vectorized pass. Month arithmetic is
    integer months-since-epoch (numpy datetime64[M] == SQL date_trunc).

    Output: (month, revenue_cents, prev_revenue_cents, delta_cents) with
    prev = 0 for the first month (sentinel instead of NULL for hash-stable
    compares).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        months = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        t = pa.table(
            {
                "m": pa.array(months),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("m").aggregate([("rev", "sum")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("m")
        .aggregate(Sum("rev_sum", alias_name="rev"))
        .repartition(1)  # O(|months|) rows by construction
    )

    def lag(t: pa.Table) -> pa.Table:
        m = pc.cast(t.column("m"), pa.int64()).to_numpy()
        rev = pc.cast(t.column("rev"), pa.int64()).to_numpy()
        order = np.argsort(m)
        m, rev = m[order], rev[order]
        prev = np.r_[0, rev[:-1]]
        return pa.table(
            {
                "month": pa.array(m.astype("datetime64[M]").astype("datetime64[us]")),
                "revenue_cents": pa.array(rev),
                "prev_revenue_cents": pa.array(prev),
                "delta_cents": pa.array(rev - prev),
            }
        )

    return agg.map_batches(lag, batch_format="pyarrow")


def _bloom_hashes(keys: np.ndarray, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Two deterministic multiply-shift hash positions per key (k=2),
    computed in wrapping uint64 arithmetic."""
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = k * np.uint64(0x9E3779B97F4A7C15)
        h2 = k * np.uint64(0xC2B2AE3D27D4EB4F) + np.uint64(0x165667B19E3779F9)
    m = np.uint64(m_bits)
    return (h1 % m).astype(np.int64), (h2 % m).astype(np.int64)


def bloom_semi_join(sf_dir: str, priority: str = "1-URGENT",
                    m_bits: int = 1 << 20, num_partitions: int | None = None):
    """Revenue of lineitems belonging to ``priority`` orders, computed with
    a BROADCAST BLOOM PREFILTER in front of the exact hash-shuffle join —
    the standard 100-TB semi-join optimization: the probe side drops
    (1 - fp_rate) of its non-matching rows BEFORE the shuffle, and the
    exact join over the survivors removes the false positives, so the
    result is EXACT regardless of the filter (Bloom filters have no false
    negatives).

    Scale shape: the build side streams into per-block partial bitmaps
    (uint64 words, two multiply-shift hashes per key) that OR together —
    the driver holds only ``m_bits/8`` bytes x #blocks transiently (tree-
    or actor-reduce the OR at extreme block counts); the merged filter is
    ``ray.put`` once and probed vectorized (two gathers + bit tests per
    batch). The shuffle then moves only surviving pre-aggregated rows.

    Output: one row (n_items, revenue_x10000).
    """
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)
    n_words = m_bits // 64

    def build_partial(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch.column("o_orderkey"), pa.int64()).to_numpy()
        p1, p2 = _bloom_hashes(keys, m_bits)
        bits = np.zeros(n_words, dtype=np.uint64)
        for p in (p1, p2):
            np.bitwise_or.at(bits, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.large_binary())})

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey"],
            filter=pads.field("o_orderpriority") == priority,
        )
    )
    partials = orders.map_batches(build_partial, batch_format="pyarrow").take_all()
    bloom = np.zeros(n_words, dtype=np.uint64)
    for row in partials:  # O(#blocks) small bitmaps; tree-reduce at extreme scale
        bloom |= np.frombuffer(row["bits"], dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def probe_partial(batch: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)  # zero-copy numpy view from the object store
        keys = pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy()
        p1, p2 = _bloom_hashes(keys, m_bits)
        hit = (
            (bl[p1 // 64] >> (p1 % 64).astype(np.uint64)) & np.uint64(1)
        ).astype(bool) & (
            (bl[p2 // 64] >> (p2 % 64).astype(np.uint64)) & np.uint64(1)
        ).astype(bool)
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_orderkey": pa.array(keys[hit]),
                "rev": pa.array(rev[hit]),
                "n": pa.array(np.ones(int(hit.sum()), dtype=np.int64)),
            }
        )
        return t.group_by("l_orderkey").aggregate([("rev", "sum"), ("n", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
    ).map_batches(probe_partial, batch_format="pyarrow")

    # exact verification join: false positives die here
    joined = li.join(
        orders.map_batches(
            lambda t: pa.table(
                {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def total_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n": pa.array(
                    [int(pc.sum(t.column("n_sum")).as_py() or 0)], type=pa.int64()
                ),
                "rev": pa.array(
                    [int(pc.sum(t.column("rev_sum")).as_py() or 0)], type=pa.int64()
                ),
            }
        )

    agg = (
        joined.map_batches(total_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n_items"),
                   Sum("rev", alias_name="revenue_x10000"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pc.cast(t.column("n_items"), pa.int64()),
                "revenue_x10000": pc.cast(t.column("revenue_x10000"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def order_priority_returned(sf_dir: str, num_partitions: int | None = None):
    """TPC-H Q4-shaped EXISTS semi-join: count orders per priority that
    have at least one returned ('R') lineitem.

    Scale shape: the EXISTS is decomposed as filter -> per-batch distinct
    -> global one-row-per-key groupby (the dedup shuffle moves at most one
    row per (orderkey, block)) -> native hash-shuffle join against the
    pruned orders projection -> per-batch partial count by priority so the
    final groupby moves ~5 rows per block. Contrast with bloom_semi_join,
    which solves the same shape probabilistically without the key shuffle
    when the filter side fits a broadcast bitmap.

    Output: (o_orderpriority, n_orders).
    """
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def distinct_keys(batch: pa.Table) -> pa.Table:
        keys = np.unique(pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy())
        return pa.table({"l_orderkey": pa.array(keys), "one": pa.array(
            np.ones(len(keys), dtype=np.int64))})

    li_keys = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_returnflag"],
                filter=pads.field("l_returnflag") == "R",
            )
        )
        .map_batches(distinct_keys, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("one", alias_name="dup"))
    )

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li_keys.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def prio_partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        return out.group_by("o_orderpriority").aggregate([("n", "sum")])

    agg = (
        joined.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_sum", alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def large_volume_orders(sf_dir: str, min_qty: int = 300):
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds
    ``min_qty``, with their customer.

    Scale shape: the heavy side (lineitem) is reduced to per-orderkey
    partial sums inside map_batches, then one global groupby; the
    survivors of the HAVING filter are a tiny set (TPC-H Q18 yields
    ~0.3% of orders), so BOTH remaining hops are broadcast probes — the
    matched aggregate is ``ray.put`` once and each orders/customer batch
    does an Arrow C++ hash join against it. No row of orders or customer
    is ever shuffled.

    Output: (c_custkey, c_name, o_orderkey, total_qty).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def qty_partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch.column("l_quantity").to_numpy() + 0.5).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "q": pa.array(qty),
            }
        )
        return t.group_by("l_orderkey").aggregate([("q", "sum")])

    heavy = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
            )
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q_sum", alias_name="total_qty"))
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("total_qty"), min_qty)),
            batch_format="pyarrow",
        )
    )
    parts = heavy.take_all()  # tiny: HAVING survivors only
    matched = pa.Table.from_pylist(
        parts,
        schema=pa.schema(
            [("l_orderkey", pa.int64()), ("total_qty", pa.int64())]
        ),
    )
    matched_ref = ray.put(matched)

    def probe_orders(batch: pa.Table) -> pa.Table:
        small = ray.get(matched_ref)
        t = pa.table(
            {
                "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            }
        )
        return t.join(small, keys=["o_orderkey"], right_keys=["l_orderkey"],
                      join_type="inner")

    matched_orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(probe_orders, batch_format="pyarrow")

    ord_parts = matched_orders.take_all()  # still tiny (1:1 with matched)
    ord_tbl = pa.Table.from_pylist(
        ord_parts,
        schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("total_qty", pa.int64()),
            ]
        ),
    )
    ord_ref = ray.put(ord_tbl)

    def probe_customer(batch: pa.Table) -> pa.Table:
        small = ray.get(ord_ref)
        t = pa.table(
            {
                "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "c_name": batch.column("c_name"),
            }
        )
        out = t.join(small, keys=["c_custkey"], right_keys=["o_custkey"],
                     join_type="inner")
        return out.select(["c_custkey", "c_name", "o_orderkey", "total_qty"])

    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_name"])
    ).map_batches(probe_customer, batch_format="pyarrow")


def returned_revenue_by_customer(sf_dir: str, k: int = 20,
                                 num_partitions: int | None = None):
    """TPC-H Q10-shaped: top-k customers by revenue on returned items.

    Scale shape: lineitem is filtered at the read (l_returnflag = 'R'
    pushed into the parquet scan) and pre-summed per orderkey, the
    orders hop is a native hash-shuffle join, revenue is re-aggregated
    per custkey (partial -> global), and the top-k is per-batch partial
    top-k + one k-row final cut — never a global sort. Only the final k
    winners touch the customer table, via an IN-list filtered scan.

    Output: (c_custkey, c_name, revenue_x10000).
    """
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "rev": pa.array(rev),
            }
        )
        return t.group_by("l_orderkey").aggregate([("rev", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
            filter=pads.field("l_returnflag") == "R",
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def cust_partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "rev": pc.cast(t.column("rev_sum"), pa.int64()),
            }
        )
        return out.group_by("o_custkey").aggregate([("rev", "sum")])

    per_cust = (
        li.join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
            aggregator_ray_remote_args=agg_args,
        )
        .map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_sum", alias_name="revenue_x10000"))
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("revenue_x10000", "descending"), ("o_custkey", "ascending")]
        )
        return t.take(idx[: min(k, len(t))])

    winners_rows = (
        per_cust.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial_topk, batch_format="pyarrow")
        .take_all()
    )
    winners = pa.Table.from_pylist(
        winners_rows,
        schema=pa.schema([("o_custkey", pa.int64()),
                          ("revenue_x10000", pa.int64())]),
    )

    keys = winners.column("o_custkey").to_pylist()

    def attach_names(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "c_name": batch.column("c_name"),
            }
        )
        out = t.join(winners, keys=["c_custkey"], right_keys=["o_custkey"],
                     join_type="inner")
        return out.select(["c_custkey", "c_name", "revenue_x10000"])

    return strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filter=pads.field("c_custkey").isin(keys),
        )
    ).map_batches(attach_names, batch_format="pyarrow")


def avg_order_gap(sf_dir: str, num_buckets: int = 64):
    """Per-customer inter-order gap statistics — LAG over order dates.

    Scale shape: same as events.lag_rolling_stats — ONE hash(custkey)
    shuffle, then per bucket a single vectorized pass (lexsort by
    (custkey, orderdate, orderkey), gap via a shifted array with
    customer-boundary masking, per-customer sums via np.add.reduceat).
    No per-customer Python calls; gaps stay integer microseconds so the
    oracle is exact.

    Output: (custkey, n_orders, n_gaps, sum_gap_us, max_gap_us) with -1
    sentinels for single-order customers.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        bucket = np.abs((ck * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "o_custkey": pa.array(ck),
                "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
                "o_orderdate": batch.column("o_orderdate"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy()
        ts = g["o_orderdate"].to_numpy()
        ok = g["o_orderkey"].to_numpy()
        order = np.lexsort((ok, ts, ck))
        ck, ts = ck[order], ts[order]
        n = len(g)
        new_cust = np.ones(n, dtype=bool)
        new_cust[1:] = ck[1:] != ck[:-1]
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            d = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
            keep = ~new_cust[1:]
            gap[1:][keep] = d[keep]
        seg_first = np.flatnonzero(new_cust)
        counts = np.diff(np.r_[seg_first, n])
        sum_gap = np.add.reduceat(gap, seg_first)
        max_gap = np.maximum.reduceat(gap, seg_first)
        no_gap = counts == 1
        return pd.DataFrame(
            {
                "custkey": ck[seg_first],
                "n_orders": counts,
                "n_gaps": counts - 1,
                "sum_gap_us": np.where(no_gap, -1, sum_gap),
                "max_gap_us": np.where(no_gap, -1, max_gap),
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
    )
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def customer_spend_ntile(sf_dir: str, tiles: int = 4,
                         bucket_cents: int = 1 << 20):
    """Global NTILE over customer spend — the distributed global-rank
    pattern (SQL: NTILE(t) OVER (ORDER BY spend, custkey)).

    Scale shape: a global rank normally means a global sort; here it is a
    RANGE-PARTITIONED two-pass instead — (1) per-customer spend aggregate
    (one shuffle), rows assigned to coarse spend-value buckets;
    (2) bucket counts reduce to metadata scale (one row per value bucket),
    the exclusive prefix sum over bucket counts runs on the driver, and
    each bucket then ranks only its own rows (lexsort by (spend, custkey))
    rebased on its global offset. NTILE boundaries use DuckDB's rule: the
    first n%t tiles get one extra row.

    Output: (custkey, spend_cents, quartile) — 1-based tile ids.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def spend_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "spend": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("custkey").aggregate([("spend", "sum")])

    spend = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
        )
        .map_batches(spend_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Sum("spend_sum", alias_name="spend_cents"))
        .map_batches(
            lambda t: pa.table(
                {
                    "custkey": pc.cast(t.column("custkey"), pa.int64()),
                    "spend_cents": pc.cast(t.column("spend_cents"), pa.int64()),
                    "vbucket": pc.cast(
                        pc.divide(pc.cast(t.column("spend_cents"), pa.int64()),
                                  bucket_cents),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused by the count pass and the rank pass
    )

    counts = (
        spend.map_batches(
            lambda t: t.select(["vbucket"]).group_by("vbucket").aggregate(
                [("vbucket", "count")]
            ),
            batch_format="pyarrow",
        )
        .groupby("vbucket")
        .aggregate(Sum("vbucket_count", alias_name="n"))
        .to_pandas()  # metadata scale: one row per spend-value bucket
        .sort_values("vbucket")
    )
    n_total = int(counts["n"].sum())
    csum = counts["n"].to_numpy().cumsum()
    offsets = dict(zip(counts["vbucket"].to_numpy().tolist(),
                       np.r_[0, csum[:-1]].tolist()))
    # DuckDB NTILE boundaries: first r tiles take q+1 rows
    q, r = divmod(n_total, tiles)
    starts = np.array(
        [t * q + min(t, r) for t in range(1, tiles + 1)], dtype=np.int64
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sp = g["spend_cents"].to_numpy()
        ck = g["custkey"].to_numpy()
        order = np.lexsort((ck, sp))
        rank = int(offsets[int(g["vbucket"].iloc[0])]) + np.arange(
            len(g), dtype=np.int64
        )
        tile = np.searchsorted(starts, rank, side="right") + 1
        return pd.DataFrame(
            {
                "custkey": ck[order],
                "spend_cents": sp[order],
                "quartile": tile,
            }
        )

    return spend.groupby("vbucket").map_groups(per_bucket, batch_format="pandas")


def nation_actor_counts(sf_dir: str, num_partitions: int | None = None):
    """Customers and suppliers per nation — the multi-source UNION
    aggregate (two fact scans merged into one keyed reduction, the
    portfolio-rollup shape).

    Scale shape: each scan pre-aggregates per nationkey inside map_batches
    with a source tag column (0=customer, 1=supplier), the union of the two
    partial streams feeds ONE small groupby (25 nation rows), and names
    attach via the broadcast 25-row dimension probe. Neither fact table
    shuffles raw rows; union here concatenates block lists — no barrier.

    Output: (n_nationkey, n_name, n_customers, n_suppliers).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(key_col: str, tag: int):
        def f(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "nk": pc.cast(batch.column(key_col), pa.int64()),
                    "nc": pa.array(
                        np.full(len(batch), 1 - tag, dtype=np.int64)
                    ),
                    "ns": pa.array(np.full(len(batch), tag, dtype=np.int64)),
                }
            )
            return t.group_by("nk").aggregate([("nc", "sum"), ("ns", "sum")])

        return f

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    ).map_batches(partial("c_nationkey", 0), batch_format="pyarrow")
    supp = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
    ).map_batches(partial("s_nationkey", 1), batch_format="pyarrow")

    agg = (
        cust.union(supp)
        .groupby("nk")
        .aggregate(Sum("nc_sum", alias_name="n_customers"),
                   Sum("ns_sum", alias_name="n_suppliers"))
    )

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table(
        {
            "n_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat)

    def attach(t: pa.Table) -> pa.Table:
        dim = ray.get(nat_ref)
        out = pa.table(
            {
                "n_nationkey": pc.cast(t.column("nk"), pa.int64()),
                "n_customers": pc.cast(t.column("n_customers"), pa.int64()),
                "n_suppliers": pc.cast(t.column("n_suppliers"), pa.int64()),
            }
        ).join(dim, keys=["n_nationkey"], join_type="inner")
        return out.select(
            ["n_nationkey", "n_name", "n_customers", "n_suppliers"]
        )

    return agg.map_batches(attach, batch_format="pyarrow")


def forecast_revenue(sf_dir: str, qty_below: int = 24,
                     disc_lo_cents: int = 5, disc_hi_cents: int = 7):
    """TPC-H Q6-shaped: revenue delta from a discount policy change — the
    SCAN-ONLY aggregate (filter + sum, no join, no groupby): the contrast
    case showing the engine does not pay a shuffle when none is needed.

    Scale shape: predicate pushed into the parquet scan where the format
    allows (quantity), residual discount-band filter vectorized in the
    batch, one-row partials, repartition(1) sum. Revenue =
    price_cents * disc_cents (exact int64).

    Output: one row (n_items, revenue_x10000).
    """
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        disc = _cents(batch.column("l_discount"))
        keep = (disc >= disc_lo_cents) & (disc <= disc_hi_cents)
        price = _cents(batch.column("l_extendedprice"))[keep]
        rev = price * disc[keep]
        return pa.table(
            {
                "n": pa.array([int(keep.sum())], type=pa.int64()),
                "rev": pa.array([int(rev.sum())], type=pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pa.array(
                    [int(pc.sum(t.column("n")).as_py() or 0)], type=pa.int64()
                ),
                "revenue_x10000": pa.array(
                    [int(pc.sum(t.column("rev")).as_py() or 0)], type=pa.int64()
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_quantity", "l_discount", "l_extendedprice"],
                filter=pads.field("l_quantity") < qty_below,
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


BRAND_BANDS = (
    ("Brand#1", 1, 11),
    ("Brand#2", 10, 20),
    ("Brand#3", 20, 30),
)


def brand_band_revenue(sf_dir: str, bands: tuple = BRAND_BANDS):
    """TPC-H Q19-shaped disjunctive join: revenue from lineitems whose part
    is one of a few brands AND whose quantity falls in that brand's band —
    the OR-of-ANDs predicate that defeats simple pushdown.

    Scale shape: the part side filtered to the named brands is a sliver of
    the table, so the join is a broadcast probe (``ray.put`` of the
    (partkey, band) sliver, Arrow C++ hash join per lineitem batch), the
    band check is one vectorized gather + compare, and the per-brand
    partials are bounded-domain — repartition(1) merge. Only the filtered
    scan of lineitem does real work.

    Output: (p_brand, n_items, revenue_x10000).
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    brands = [b[0] for b in bands]
    lo = np.array([b[1] for b in bands], dtype=np.int64)
    hi = np.array([b[2] for b in bands], dtype=np.int64)
    brand_arr = pa.array(brands, type=pa.string())

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"],
        filters=pads.field("p_brand").isin(brands),
    )
    part = pa.table(
        {
            "p_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
            "band": pc.cast(
                pc.index_in(part.column("p_brand"), brand_arr), pa.int64()
            ),
        }
    )
    part_ref = ray.put(part)

    def probe(batch: pa.Table) -> pa.Table:
        sliver = ray.get(part_ref)
        qty = np.floor(batch.column("l_quantity").to_numpy() + 0.5).astype(
            np.int64
        )
        rev = _cents(batch.column("l_extendedprice")) * (
            100 - _cents(batch.column("l_discount"))
        )
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "qty": pa.array(qty),
                "rev": pa.array(rev),
            }
        ).join(sliver, keys=["l_partkey"], right_keys=["p_partkey"],
               join_type="inner")
        band = t.column("band").to_numpy()
        q = t.column("qty").to_numpy()
        keep = (q >= lo[band]) & (q <= hi[band])
        kept_band = band[keep]
        kept_rev = t.column("rev").to_numpy()[keep]
        n = np.bincount(kept_band, minlength=len(bands)).astype(np.int64)
        r = np.zeros(len(bands), dtype=np.int64)
        np.add.at(r, kept_band, kept_rev)
        return pa.table(
            {
                "p_brand": brand_arr,
                "n": pa.array(n),
                "rev": pa.array(r),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by("p_brand").aggregate([("n", "sum"), ("rev", "sum")])
        res = pa.table(
            {
                "p_brand": out.column("p_brand"),
                "n_items": pc.cast(out.column("n_sum"), pa.int64()),
                "revenue_x10000": pc.cast(out.column("rev_sum"), pa.int64()),
            }
        )
        return res.filter(pc.greater(res.column("n_items"), 0))

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount"],
            )
        )
        .map_batches(probe, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


PROFILE_COLUMNS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def orders_profile(sf_dir: str, columns: tuple = PROFILE_COLUMNS):
    """Single-pass data profiling: row and EXACT distinct counts for several
    columns of one table at once — the schema-drift / cardinality audit a
    pipeline runs before trusting a new data drop.

    Scale shape: every batch emits per-column DISTINCT value strings
    (np.unique per column — the combiner), all columns share ONE
    (column, value)-keyed dedup shuffle, and per-column counts reduce at
    metadata scale. Exactness comes from deduping on the value itself,
    not a hash (no collision caveat); values canonicalize as strings the
    same way SQL CAST does for ints and text.

    Output: (column, n_rows, n_distinct).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    col_list = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        n = len(batch)
        for c in col_list:
            v = pc.cast(batch.column(c), pa.string()).to_numpy(
                zero_copy_only=False
            )
            u = np.unique(v)
            cols.append(np.full(len(u), c, dtype=object))
            vals.append(u)
        # distinct-value rows (nr = 0) plus one row-count partial per
        # column, tagged with a sentinel value no real cast produces —
        # both ride the same (col, val) dedup shuffle
        distinct_rows = pa.table(
            {
                "col": pa.array(np.concatenate(cols).astype(str)),
                "val": pa.array(np.concatenate(vals).astype(str)),
                "nr": pa.array(
                    np.zeros(sum(len(v) for v in vals), dtype=np.int64)
                ),
            }
        )
        count_rows = pa.table(
            {
                "col": pa.array(list(col_list)),
                "val": pa.array(["\x00rows"] * len(col_list)),
                "nr": pa.array(np.full(len(col_list), n, dtype=np.int64)),
            }
        )
        return pa.concat_tables([distinct_rows, count_rows])

    dedup = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet", columns=col_list)
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["col", "val"])
        .aggregate(Sum("nr", alias_name="nr"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        is_rows = pc.equal(t.column("val"), "\x00rows").to_numpy(
            zero_copy_only=False
        )
        col = t.column("col").to_numpy(zero_copy_only=False)
        nr = pc.cast(t.column("nr"), pa.int64()).to_numpy()
        names, codes = np.unique(col, return_inverse=True)
        n_distinct = np.bincount(
            codes, weights=(~is_rows).astype(np.int64), minlength=len(names)
        ).astype(np.int64)
        n_rows = np.zeros(len(names), dtype=np.int64)
        np.add.at(n_rows, codes[is_rows], nr[is_rows])
        return pa.table(
            {
                "column": pa.array(names.astype(str)),
                "n_rows": pa.array(n_rows),
                "n_distinct": pa.array(n_distinct),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by("column").aggregate(
            [("n_rows", "sum"), ("n_distinct", "sum")]
        )
        return pa.table(
            {
                "column": out.column("column"),
                "n_rows": pc.cast(out.column("n_rows_sum"), pa.int64()),
                "n_distinct": pc.cast(out.column("n_distinct_sum"), pa.int64()),
            }
        )

    return (
        dedup.map_batches(count_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def part_price_deviation(sf_dir: str, num_partitions: int | None = None):
    """Average sale-vs-list price deviation per part type — lineitem |><|
    part on PARTKEY (the one TPC-H join key the other operators don't
    exercise big-big).

    Scale shape: lineitem pre-aggregates per partkey inside map_batches
    (count + price-cents sum — one row per (partkey, block)), the native
    hash-shuffle join attaches each part's list price and type, and the
    deviation partials reduce over the bounded type domain. Deviation =
    sum(l_extendedprice_cents) - n * p_retailprice_cents, exact int64.

    Output: (p_type, n_items, deviation_cents).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "price": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        )
        return t.group_by("l_partkey").aggregate([("n", "sum"), ("price", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_extendedprice"])
    ).map_batches(li_partial, batch_format="pyarrow")

    part = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_type", "p_retailprice"])
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "p_type": t.column("p_type"),
                "list_cents": pa.array(_cents(t.column("p_retailprice"))),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        part,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def dev_partial(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_sum"), pa.int64()).to_numpy()
        price = pc.cast(t.column("price_sum"), pa.int64()).to_numpy()
        lst = pc.cast(t.column("list_cents"), pa.int64()).to_numpy()
        out = pa.table(
            {
                "p_type": t.column("p_type"),
                "n": pa.array(n),
                "dev": pa.array(price - n * lst),
            }
        )
        return out.group_by("p_type").aggregate([("n", "sum"), ("dev", "sum")])

    agg = (
        joined.map_batches(dev_partial, batch_format="pyarrow")
        .groupby("p_type")
        .aggregate(Sum("n_sum", alias_name="n_items"),
                   Sum("dev_sum", alias_name="deviation_cents"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "p_type": t.column("p_type"),
                "n_items": pc.cast(t.column("n_items"), pa.int64()),
                "deviation_cents": pc.cast(t.column("deviation_cents"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def order_count_distribution(sf_dir: str, num_partitions: int | None = None):
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed exactly k orders — INCLUDING the zero-order customers
    only a left join surfaces.

    Scale shape: order counts are pre-combined per custkey inside each
    batch (the shuffle moves one row per distinct custkey per block), the
    customer projection LEFT-joins them natively (big-big hash shuffle,
    nulls -> 0), and the final histogram is a bounded-domain reduce:
    per-batch bincounts, repartition(1), one Arrow group_by over <= a few
    hundred distinct counts.

    Output: (c_count, custdist).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def oc_partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy(),
            return_counts=True,
        )
        return pa.table({"o_custkey": keys, "n": counts.astype(np.int64)})

    from ray.data.aggregate import Sum

    oc = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        )
        .map_batches(oc_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n_orders"))
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    joined = cust.join(
        oc,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_orders"), pa.int64()).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        vals, counts = np.unique(n, return_counts=True)
        return pa.table({"c_count": vals, "custdist": counts.astype(np.int64)})

    return (
        joined.map_batches(hist_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "c_count": pc.cast(g.column("c_count"), pa.int64()),
                        "custdist": pc.cast(g.column("custdist_sum"), pa.int64()),
                    }
                )
            )(t.group_by("c_count").aggregate([("custdist", "sum")])),
            batch_format="pyarrow",
        )
    )


def local_supplier_volume(sf_dir: str, num_partitions: int | None = None):
    """Revenue from lineitems whose supplier and ordering customer share a
    nation (TPC-H Q5 shape), per region and nation.

    Scale shape: supplier (tiny) and nation+region (bounded) are broadcast
    dimensions resolved inside map_batches; the two big-big hops —
    lineitem |><| orders on orderkey and the result |><| customer on
    custkey — are native hash-shuffle joins with per-batch combiners
    feeding them. The c_nationkey = s_nationkey locality filter runs
    per joined batch before the bounded (region, nation) reduce.

    Output: (r_name, n_name, revenue_x10000).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(sup.column("s_nationkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    sup_ref = ray.put(sup)

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    nr = pa.table(
        {
            "nk": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
            "rk": pc.cast(nat.column("n_regionkey"), pa.int64()),
        }
    ).join(
        pa.table(
            {
                "rk": pc.cast(reg.column("r_regionkey"), pa.int64()),
                "r_name": pc.cast(reg.column("r_name"), pa.string()),
            }
        ),
        keys="rk",
    ).replace_schema_metadata(None)
    nr_ref = ray.put(nr)

    def li_partial(batch: pa.Table) -> pa.Table:
        dim = ray.get(sup_ref)
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "rev": pa.array(price * (100 - disc)),
            }
        ).join(dim, keys="l_suppkey", join_type="inner")
        return t.group_by(["l_orderkey", "s_nationkey"]).aggregate(
            [("rev", "sum")]
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def local_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.equal(t.column("s_nationkey"), t.column("c_nationkey"))
        )
        dim = ray.get(nr_ref)
        j = pa.table(
            {
                "nk": t.column("s_nationkey"),
                "rev": pc.cast(t.column("rev_sum"), pa.int64()),
            }
        ).join(dim, keys="nk", join_type="inner")
        return j.group_by(["r_name", "n_name"]).aggregate([("rev", "sum")])

    return (
        joined.map_batches(local_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "r_name": g.column("r_name"),
                        "n_name": g.column("n_name"),
                        "revenue_x10000": pc.cast(
                            g.column("rev_sum_sum"), pa.int64()
                        ),
                    }
                )
            )(t.group_by(["r_name", "n_name"]).aggregate([("rev_sum", "sum")])),
            batch_format="pyarrow",
        )
    )


def global_sales_opportunity(sf_dir: str, n_codes: int = 7,
                             num_partitions: int | None = None):
    """Wealthy-but-inactive customers per country code (TPC-H Q22 shape):
    customers whose balance beats the average POSITIVE balance and who
    never placed a 1-URGENT order (this synthetic corpus gives every
    customer SOME order, so plain no-orders is vacuous), grouped by
    country code (c_nationkey modulo ``n_codes`` stands in for the phone
    prefix).

    Scale shape: the global (count, sum) over positive balances is a
    two-int aggregate (bounded driver pull); the above-average test is
    exact integer arithmetic (bal * n > total, no float average); the
    no-orders condition is a native LEFT ANTI hash join against the
    order custkeys (pre-deduped per batch); the final rollup is a
    bounded-domain reduce over ``n_codes`` rows.

    Output: (cntrycode, numcust, totacctbal_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def bal_partial(t: pa.Table) -> pa.Table:
        bal = _cents(t.column("c_acctbal"))
        pos = bal[bal > 0]
        return pa.table(
            {
                "n": pa.array([len(pos)], type=pa.int64()),
                "s": pa.array([int(pos.sum())], type=pa.int64()),
            }
        )

    cust_raw = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    )
    stats = (
        cust_raw.map_batches(bal_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array([int(pc.sum(t.column("n")).as_py() or 0)],
                                  type=pa.int64()),
                    "s": pa.array([int(pc.sum(t.column("s")).as_py() or 0)],
                                  type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .take(1)[0]
    )
    n_pos, s_pos = int(stats["n"]), int(stats["s"])

    def rich(t: pa.Table) -> pa.Table:
        bal = _cents(t.column("c_acctbal"))
        keep = bal * n_pos > s_pos
        return pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64())
                .to_numpy()[keep],
                "code": pc.cast(t.column("c_nationkey"), pa.int64())
                .to_numpy()[keep] % n_codes,
                "bal": bal[keep],
            }
        )

    def ok_partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("o_orderpriority"), "1-URGENT")
        return pa.table(
            {
                "o_custkey": np.unique(
                    pc.cast(t.column("o_custkey"), pa.int64())
                    .filter(keep)
                    .to_numpy()
                )
            }
        )

    ordered = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    ).map_batches(ok_partial, batch_format="pyarrow")

    anti = cust_raw.map_batches(rich, batch_format="pyarrow").join(
        ordered,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def code_partial(t: pa.Table) -> pa.Table:
        return t.group_by("code").aggregate(
            [("c_custkey", "count"), ("bal", "sum")]
        )

    return (
        anti.map_batches(code_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "cntrycode": pc.cast(g.column("code"), pa.int64()),
                        "numcust": pc.cast(
                            g.column("c_custkey_count_sum"), pa.int64()
                        ),
                        "totacctbal_cents": pc.cast(
                            g.column("bal_sum_sum"), pa.int64()
                        ),
                    }
                )
            )(t.group_by("code").aggregate(
                [("c_custkey_count", "sum"), ("bal_sum", "sum")]
            )),
            batch_format="pyarrow",
        )
    )


def daily_revenue_rolling7(sf_dir: str):
    """Daily order revenue with a dense 7-day rolling sum — the time-series
    rollup (gap-filled calendar, trailing window) every ops dashboard runs.

    Scale shape: per-batch (day, revenue) combiners — the shuffle carries
    one row per distinct day per block, and the calendar domain is bounded
    (years, not rows) — then one repartition(1) kernel builds the dense
    day series and computes the rolling sum as a prefix-sum difference.

    Output: (day, rev_cents, rolling7_cents) for every calendar day
    between the first and last order date.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(
                pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
                unit="day",
            ),
            pa.int64(),
        ).to_numpy() // 86_400_000_000
        t = pa.table(
            {
                "day": pa.array(day),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("day").aggregate([("rev", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("rev_sum", "sum")])
        day = pc.cast(g.column("day"), pa.int64()).to_numpy()
        rev = pc.cast(g.column("rev_sum_sum"), pa.int64()).to_numpy()
        lo, hi = int(day.min()), int(day.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[day - lo] = rev
        cs = np.cumsum(dense)
        roll = cs - np.r_[np.zeros(min(7, len(cs)), dtype=np.int64), cs[:-7]]
        days = (np.arange(lo, hi + 1) * 86_400_000_000).astype(
            "datetime64[us]"
        )
        return pa.table(
            {
                "day": pa.array(days),
                "rev_cents": pa.array(dense),
                "rolling7_cents": pa.array(roll),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def priority_share_by_month(sf_dir: str):
    """Order-priority mix per calendar month — the composition-over-time
    rollup (did URGENT share drift?) behind data-quality monitoring.

    Scale shape: per-batch (month, priority, n) combiners; the domain is
    bounded (months x 5 priorities), so the final reduce is one
    repartition(1) Arrow group_by plus a vectorized share computation
    against per-month totals.

    Output: (month, priority, n_orders, share_ppm).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(
            pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
            unit="month",
        )
        t = pa.table(
            {
                "month": pc.cast(month, pa.timestamp("us")),
                "priority": batch.column("o_orderpriority"),
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return t.group_by(["month", "priority"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["month", "priority"]).aggregate([("n_sum", "sum")])
        month = pc.cast(g.column("month"), pa.timestamp("us"))
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_numpy()
        mkey = pc.cast(month, pa.int64()).to_numpy()
        uniq, inv = np.unique(mkey, return_inverse=True)
        totals = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table(
            {
                "month": month,
                "priority": g.column("priority"),
                "n_orders": pa.array(n),
                "share_ppm": pa.array(n * 1_000_000 // totals[inv]),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_orderpriority"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def _years(col: pa.ChunkedArray) -> np.ndarray:
    """Calendar year per row as int64 (numpy datetime64[Y] arithmetic)."""
    return col.to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970


def nation_pair_volume(sf_dir: str, num_partitions: int | None = None):
    """Shipping volume between every (supplier nation, customer nation) pair
    per ship-year, cross-nation pairs only (TPC-H Q7 generalized from one
    nation pair to all of them).

    Scale shape: supplier and nation are broadcast dims resolved inside
    ``map_batches``; lineitem is pre-aggregated to (orderkey, supp_nation,
    year) before the two native hash joins (orders, then customer), so the
    exchanges move one row per (order, nation, year) instead of one per
    lineitem. The final reduce domain is |nations|^2 x |years| — bounded by
    the calendar and the nation table, not the data.

    Reference behavior source: TPC-H Q7 (volume shipping) re-expressed over
    the columns present in the synthetic tables (no ps_supplycost here).

    Output: (supp_nation, cust_nation, l_year, revenue_x10000).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(sup.column("s_nationkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    sup_ref = ray.put(sup)

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    names = pa.table(
        {
            "nk": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    ).replace_schema_metadata(None)
    nat_ref = ray.put(names)

    def li_partial(batch: pa.Table) -> pa.Table:
        dim = ray.get(sup_ref)
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "l_year": pa.array(_years(batch.column("l_shipdate"))),
                "rev": pa.array(price * (100 - disc)),
            }
        ).join(dim, keys="l_suppkey", join_type="inner")
        return t.group_by(["l_orderkey", "s_nationkey", "l_year"]).aggregate(
            [("rev", "sum")]
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount", "l_shipdate"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.not_equal(t.column("s_nationkey"), t.column("c_nationkey"))
        )
        dim = ray.get(nat_ref)
        dim_s = dim.rename_columns(["nk", "supp_nation"])
        dim_c = dim.rename_columns(["ck", "cust_nation"])
        j = (
            pa.table(
                {
                    "nk": t.column("s_nationkey"),
                    "ck": t.column("c_nationkey"),
                    "l_year": t.column("l_year"),
                    "rev": pc.cast(t.column("rev_sum"), pa.int64()),
                }
            )
            .join(dim_s, keys="nk", join_type="inner")
            .join(dim_c, keys="ck", join_type="inner")
        )
        return j.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("rev", "sum")]
        )

    return (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .repartition(1)  # O(|nations|^2 x |years|) rows by construction
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "supp_nation": g.column("supp_nation"),
                        "cust_nation": g.column("cust_nation"),
                        "l_year": pc.cast(g.column("l_year"), pa.int64()),
                        "revenue_x10000": pc.cast(g.column("rev_sum_sum"),
                                                  pa.int64()),
                    }
                )
            )(
                t.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
                    [("rev_sum", "sum")]
                )
            ),
            batch_format="pyarrow",
        )
    )


def market_share(sf_dir: str, nation: str = "NATION_3", region: str = "ASIA",
                 ptype: str = "PROMO", num_partitions: int | None = None):
    """Per-order-year market share (ppm) of one nation's suppliers within a
    region's customers for one part type (TPC-H Q8 shape).

    Scale shape: the type-filtered part subset is the broadcast semi-join
    side (|part|/|types| keys; switch to a native partkey join past the
    broadcast budget); supplier and nation/region are broadcast dims. The
    two big-big hops (orders, customer) are native hash joins fed by a
    per-(orderkey, is_nation) combiner. Share arithmetic is exact integer
    ppm computed on the O(|years|) final block with Python bigints (the
    x10000 revenue sums exceed int64 when multiplied by 1e6).

    Output: (o_year, total_x10000, nation_x10000, share_ppm).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    keep = part.filter(pc.equal(part.column("p_type"), ptype))
    pk = pa.table(
        {"l_partkey": pc.cast(keep.column("p_partkey"), pa.int64())}
    ).replace_schema_metadata(None)
    pk_ref = ray.put(pk)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(sup.column("s_nationkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    sup_ref = ray.put(sup)

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = reg.filter(pc.equal(reg.column("r_name"), region)).column("r_regionkey")
    region_nations = nat.filter(
        pc.is_in(nat.column("n_regionkey"), value_set=rk.combine_chunks())
    )
    cnk = pa.table(
        {"c_nationkey": pc.cast(region_nations.column("n_nationkey"), pa.int64())}
    ).replace_schema_metadata(None)
    cnk_ref = ray.put(cnk)
    target = nat.filter(pc.equal(nat.column("n_name"), nation))
    target_nk = (
        pc.cast(target.column("n_nationkey"), pa.int64()).to_pylist() or [-1]
    )[0]

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "rev": pa.array(price * (100 - disc)),
            }
        )
        t = t.join(ray.get(pk_ref), keys="l_partkey", join_type="inner")
        t = t.join(ray.get(sup_ref), keys="l_suppkey", join_type="inner")
        is_nat = pc.cast(
            pc.equal(t.column("s_nationkey"), pa.scalar(target_nk, pa.int64())),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "is_nation": is_nat,
                "rev": t.column("rev"),
            }
        )
        return t.group_by(["l_orderkey", "is_nation"]).aggregate([("rev", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "o_year": pa.array(_years(t.column("o_orderdate"))),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def year_partial(t: pa.Table) -> pa.Table:
        t = t.join(ray.get(cnk_ref), keys="c_nationkey", join_type="inner")
        rev = pc.cast(t.column("rev_sum"), pa.int64())
        nat_rev = pc.multiply(rev, t.column("is_nation"))
        return (
            pa.table(
                {
                    "o_year": t.column("o_year"),
                    "total": rev,
                    "nat": nat_rev,
                }
            )
            .group_by("o_year")
            .aggregate([("total", "sum"), ("nat", "sum")])
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("o_year").aggregate(
            [("total_sum", "sum"), ("nat_sum", "sum")]
        )
        years = pc.cast(g.column("o_year"), pa.int64()).to_pylist()
        tot = pc.cast(g.column("total_sum_sum"), pa.int64()).to_pylist()
        nt = pc.cast(g.column("nat_sum_sum"), pa.int64()).to_pylist()
        ppm = [n * 1_000_000 // t if t else 0 for n, t in zip(nt, tot)]
        return pa.table(
            {
                "o_year": pa.array(years, pa.int64()),
                "total_x10000": pa.array(tot, pa.int64()),
                "nation_x10000": pa.array(nt, pa.int64()),
                "share_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return (
        joined.map_batches(year_partial, batch_format="pyarrow")
        .repartition(1)  # O(|years|) rows by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def product_profit(sf_dir: str, name_like: str = "widget",
                   num_partitions: int | None = None):
    """Profit proxy by supplier nation and order year for parts whose name
    contains a token (TPC-H Q9 shape with p_retailprice standing in for
    ps_supplycost, which these tables don't carry).

    profit_x10000 = extended_cents*(100-disc) - 100*retail_cents*quantity.

    Scale shape: the name-filtered part subset joins natively on partkey
    (big-big: part grows with the corpus), orders joins natively on
    orderkey; supplier/nation resolve by broadcast. Lineitem is combined to
    (partkey, orderkey, nation) partials before either exchange. Final
    reduce domain |nations| x |years| is calendar-bounded.

    Output: (n_name, o_year, profit_x10000).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(sup.column("s_nationkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    sup_ref = ray.put(sup)

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    names = pa.table(
        {
            "s_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    ).replace_schema_metadata(None)
    nat_ref = ray.put(names)

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        qty = np.floor(
            batch.column("l_quantity").to_numpy() + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "rev": pa.array(price * (100 - disc)),
                "qty": pa.array(qty),
            }
        ).join(ray.get(sup_ref), keys="l_suppkey", join_type="inner")
        return t.group_by(["l_partkey", "l_orderkey", "s_nationkey"]).aggregate(
            [("rev", "sum"), ("qty", "sum")]
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    def part_map(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t.column("p_name"), name_like)
        t = t.filter(m)
        return pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "retail_cents": pa.array(_cents(t.column("p_retailprice"))),
            }
        )

    part = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_name", "p_retailprice"])
    ).map_batches(part_map, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_year": pa.array(_years(t.column("o_orderdate"))),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        part,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def profit_partial(t: pa.Table) -> pa.Table:
        profit = pc.subtract(
            pc.cast(t.column("rev_sum"), pa.int64()),
            pc.multiply(
                pc.multiply(pc.cast(t.column("qty_sum"), pa.int64()),
                            pa.scalar(100, pa.int64())),
                t.column("retail_cents"),
            ),
        )
        j = pa.table(
            {
                "s_nationkey": t.column("s_nationkey"),
                "o_year": t.column("o_year"),
                "profit": profit,
            }
        ).join(ray.get(nat_ref), keys="s_nationkey", join_type="inner")
        return j.group_by(["n_name", "o_year"]).aggregate([("profit", "sum")])

    return (
        joined.map_batches(profit_partial, batch_format="pyarrow")
        .repartition(1)  # O(|nations| x |years|) rows by construction
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "n_name": g.column("n_name"),
                        "o_year": pc.cast(g.column("o_year"), pa.int64()),
                        "profit_x10000": pc.cast(g.column("profit_sum_sum"),
                                                 pa.int64()),
                    }
                )
            )(t.group_by(["n_name", "o_year"]).aggregate([("profit_sum", "sum")])),
            batch_format="pyarrow",
        )
    )


def small_qty_revenue(sf_dir: str, brand: str = "Brand#13"):
    """Revenue lost to small-quantity lineitems of one brand's parts: rows
    whose quantity is under 20% of that part's corpus-wide average quantity
    (TPC-H Q17 shape; the average is over ALL lineitems of the part).

    The 0.2*avg comparison is exact-integer: qty < sum/(5*cnt) <=>
    5*qty*cnt < sum, with quantities rounded half-up once on both sides.

    Scale shape: the brand's partkey set is a broadcast semi-join filter
    (|part|/|brands| keys); per-part (sum, cnt) stats come from a combiner
    + native groupby on partkey. The stats table is one row per brand part,
    so the second pass resolves it by broadcast rather than a native join —
    Ray 2.49's hash join mis-disseminates schemas when the build side
    starts with an empty block (small key domains from groupby outputs),
    and the brand-part domain is exactly that shape; past the broadcast
    budget, salt-and-join on partkey instead.

    Output: one row (matched_rows, total_cents, avg_yearly_cents).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    keep = part.filter(pc.equal(part.column("p_brand"), brand))
    pk = pa.table(
        {"l_partkey": pc.cast(keep.column("p_partkey"), pa.int64())}
    ).replace_schema_metadata(None)
    pk_ref = ray.put(pk)

    def stats_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "qty": pa.array(
                    np.floor(batch.column("l_quantity").to_numpy() + 0.5)
                    .astype(np.int64)
                ),
                "one": pa.array(
                    np.ones(batch.num_rows, np.int64)
                ),
            }
        ).join(ray.get(pk_ref), keys="l_partkey", join_type="inner")
        return t.group_by("l_partkey").aggregate([("qty", "sum"), ("one", "sum")])

    from ray.data.aggregate import Sum

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols[:2])
        )
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("qty_sum", alias_name="qs"), Sum("one_sum", alias_name="cnt"))
    )
    # One row per part of ONE brand — bounded, collected as Arrow refs and
    # re-broadcast (see docstring for the join-landmine rationale).
    refs = stats.to_arrow_refs()
    parts = [t for t in ray.get(refs) if t.num_rows]
    if parts:
        stats_tbl = pa.concat_tables(parts, promote_options="default")
    else:
        stats_tbl = pa.table(
            {
                "l_partkey": pa.array([], pa.int64()),
                "qs": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    stats_tbl = (
        stats_tbl.select(["l_partkey", "qs", "cnt"])
        .replace_schema_metadata(None)
    )
    stats_ref = ray.put(stats_tbl)

    def match_partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch.column("l_quantity").to_numpy() + 0.5).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "qty": pa.array(qty),
                "cents": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        ).join(ray.get(stats_ref), keys="l_partkey", join_type="inner")
        ok = pc.less(
            pc.multiply(
                pc.multiply(t.column("qty"), pa.scalar(5, pa.int64())),
                pc.cast(t.column("cnt"), pa.int64()),
            ),
            pc.cast(t.column("qs"), pa.int64()),
        )
        t = t.filter(ok)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "cents": pa.array(
                    [pc.sum(t.column("cents")).as_py() or 0], pa.int64()
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.sum(t.column("n")).as_py() or 0
        cents = pc.sum(t.column("cents")).as_py() or 0
        return pa.table(
            {
                "matched_rows": pa.array([n], pa.int64()),
                "total_cents": pa.array([cents], pa.int64()),
                "avg_yearly_cents": pa.array([cents // 7], pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
        )
        .map_batches(match_partial, batch_format="pyarrow")
        .repartition(1)  # O(|blocks|) single-row partials
        .map_batches(finish, batch_format="pyarrow")
    )


def top_supplier(sf_dir: str, start: str = "1998-01-01", end: str = "1998-04-01"):
    """Supplier(s) with the maximum revenue over a ship-date window, ties
    kept (TPC-H Q15 shape, the CREATE VIEW + max subquery flattened).

    Scale shape: a per-batch (suppkey -> revenue) combiner feeds one native
    groupby; the per-supplier aggregate is materialized once (one row per
    active supplier in a 3-month window) and scanned twice — once for the
    global max (partial max per block, tiny final), once for the equality
    filter. Winner names resolve from the supplier dim by broadcast.

    Output: (s_suppkey, s_name, total_revenue_x10000).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    lo = np.datetime64(start).astype("datetime64[us]")
    hi = np.datetime64(end).astype("datetime64[us]")

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    sup = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_name": pc.cast(sup.column("s_name"), pa.string()),
        }
    ).replace_schema_metadata(None)
    sup_ref = ray.put(sup)

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy()
        mask = (d >= lo) & (d < hi)
        batch = batch.filter(pa.array(mask))
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        return (
            pa.table(
                {
                    "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by("l_suppkey")
            .aggregate([("rev", "sum")])
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_sum", alias_name="total_revenue_x10000"))
        .materialize()  # one row per active supplier in the window
    )

    best = agg.max("total_revenue_x10000")

    def winners(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.equal(
                pc.cast(t.column("total_revenue_x10000"), pa.int64()),
                pa.scalar(best, pa.int64()),
            )
        )
        j = pa.table(
            {
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "total_revenue_x10000": pc.cast(
                    t.column("total_revenue_x10000"), pa.int64()
                ),
            }
        ).join(ray.get(sup_ref), keys="l_suppkey", join_type="inner")
        return pa.table(
            {
                "s_suppkey": j.column("l_suppkey"),
                "s_name": j.column("s_name"),
                "total_revenue_x10000": j.column("total_revenue_x10000"),
            }
        )

    return agg.map_batches(winners, batch_format="pyarrow")


def nation_share_in_region(sf_dir: str, num_partitions: int | None = None):
    """Each nation's share (ppm) of its region's total revenue — the
    percent-of-total window over an aggregate (SQL: SUM() OVER
    (PARTITION BY region) on a GROUP BY result).

    Scale shape: revenue keys on the customer nation, so the topology is
    a per-orderkey combiner feeding two native hash joins (lineitem
    |><| orders, then |><| customer), nation/region resolved by
    broadcast; the percent-of-total math runs on the O(|nations|) final
    block with exact integers.

    Output: (r_name, n_name, revenue_x10000, share_ppm).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    nr = pa.table(
        {
            "c_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
            "rk": pc.cast(nat.column("n_regionkey"), pa.int64()),
        }
    ).join(
        pa.table(
            {
                "rk": pc.cast(reg.column("r_regionkey"), pa.int64()),
                "r_name": pc.cast(reg.column("r_name"), pa.string()),
            }
        ),
        keys="rk",
    ).replace_schema_metadata(None)
    nr_ref = ray.put(nr)

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        return (
            pa.table(
                {
                    "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("rev", "sum")])
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def nation_partial(t: pa.Table) -> pa.Table:
        j = pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "rev": pc.cast(t.column("rev_sum"), pa.int64()),
            }
        ).join(ray.get(nr_ref), keys="c_nationkey", join_type="inner")
        return j.group_by(["r_name", "n_name"]).aggregate([("rev", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["r_name", "n_name"]).aggregate([("rev_sum", "sum")])
        r = g.column("r_name").to_pylist()
        n = g.column("n_name").to_pylist()
        rev = pc.cast(g.column("rev_sum_sum"), pa.int64()).to_pylist()
        region_total: dict = {}
        for rn, v in zip(r, rev):
            region_total[rn] = region_total.get(rn, 0) + v
        order = sorted(range(len(r)), key=lambda i: (r[i], n[i]))
        return pa.table(
            {
                "r_name": pa.array([r[i] for i in order], pa.string()),
                "n_name": pa.array([n[i] for i in order], pa.string()),
                "revenue_x10000": pa.array([rev[i] for i in order], pa.int64()),
                "share_ppm": pa.array(
                    [rev[i] * 1_000_000 // region_total[r[i]] for i in order],
                    pa.int64(),
                ),
            }
        )

    return (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .repartition(1)  # O(|nations|) rows by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def supplier_hhi(sf_dir: str, num_partitions: int | None = None):
    """Herfindahl–Hirschman concentration index of supplier revenue within
    each supplier nation: sum over suppliers of (ppm share)^2, reported in
    ppm-of-ppm (// 1e6) — the market-concentration audit.

    Scale shape: per-batch (suppkey -> revenue) combiner, one native
    groupby on suppkey, nation resolved by broadcast; the squared-share
    math runs on the per-supplier aggregate (one row per supplier — the
    bounded post-agg table), with exact Python bigints on the final
    block.

    Output: (n_name, n_suppliers, revenue_x10000, hhi_ppm).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    dim = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(sup.column("s_nationkey"), pa.int64()),
        }
    ).join(
        pa.table(
            {
                "s_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
                "n_name": pc.cast(nat.column("n_name"), pa.string()),
            }
        ),
        keys="s_nationkey",
    ).replace_schema_metadata(None)
    dim_ref = ray.put(dim)

    def partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        return (
            pa.table(
                {
                    "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by("l_suppkey")
            .aggregate([("rev", "sum")])
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_suppkey", "l_extendedprice", "l_discount"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_sum", alias_name="rev"))
    )

    def finish(t: pa.Table) -> pa.Table:
        j = pa.table(
            {
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "rev": pc.cast(t.column("rev"), pa.int64()),
            }
        ).join(ray.get(dim_ref), keys="l_suppkey", join_type="inner")
        names = j.column("n_name").to_pylist()
        rev = pc.cast(j.column("rev"), pa.int64()).to_pylist()
        total: dict = {}
        cnt: dict = {}
        for nm, v in zip(names, rev):
            total[nm] = total.get(nm, 0) + v
            cnt[nm] = cnt.get(nm, 0) + 1
        hhi: dict = {}
        for nm, v in zip(names, rev):
            share = v * 1_000_000 // total[nm]
            hhi[nm] = hhi.get(nm, 0) + share * share
        keys = sorted(total)
        return pa.table(
            {
                "n_name": pa.array(keys, pa.string()),
                "n_suppliers": pa.array([cnt[k] for k in keys], pa.int64()),
                "revenue_x10000": pa.array([total[k] for k in keys], pa.int64()),
                "hhi_ppm": pa.array([hhi[k] // 1_000_000 for k in keys],
                                    pa.int64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def segment_recency(sf_dir: str, num_partitions: int | None = None):
    """Customer recency by market segment: days between each customer's
    LAST order and the corpus's latest order date, reduced to per-segment
    min / integer-average / max — the CRM churn panel.

    Scale shape: per-customer last-order is a combiner + one native
    groupby on custkey; segment resolves via a native join against the
    customer table (big-big: customers grow with the corpus). The final
    block holds only per-segment sufficient statistics (n, sum, min, max
    of last-order microseconds), so the global-max subtraction happens
    once, exactly, at metadata scale: avg_days = (n*gm - sum) // (n*DAY).

    Output: (c_mktsegment, n_customers, min_days, avg_days, max_days).
    """
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))
    _DAY_US = 86_400_000_000

    def last_partial(batch: pa.Table) -> pa.Table:
        ts = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return (
            pa.table(
                {
                    "custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                    "last_us": pa.array(ts),
                }
            )
            .group_by("custkey")
            .aggregate([("last_us", "max")])
        )

    last = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])
        )
        .map_batches(last_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Max("last_us_max", alias_name="last_us"))
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_mktsegment": pc.cast(t.column("c_mktsegment"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = last.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def seg_partial(t: pa.Table) -> pa.Table:
        lu = pc.cast(t.column("last_us"), pa.int64())
        return (
            pa.table(
                {
                    "c_mktsegment": t.column("c_mktsegment"),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "s": lu,
                    "mn": lu,
                    "mx": lu,
                }
            )
            .group_by("c_mktsegment")
            .aggregate([("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")])
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate(
            [("n_sum", "sum"), ("s_sum", "sum"),
             ("mn_min", "min"), ("mx_max", "max")]
        )
        seg = g.column("c_mktsegment").to_pylist()
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_pylist()
        s = pc.cast(g.column("s_sum_sum"), pa.int64()).to_pylist()
        mn = pc.cast(g.column("mn_min_min"), pa.int64()).to_pylist()
        mx = pc.cast(g.column("mx_max_max"), pa.int64()).to_pylist()
        gm = max(mx)
        order = sorted(range(len(seg)), key=lambda i: seg[i])
        return pa.table(
            {
                "c_mktsegment": pa.array([seg[i] for i in order], pa.string()),
                "n_customers": pa.array([n[i] for i in order], pa.int64()),
                "min_days": pa.array(
                    [(gm - mx[i]) // _DAY_US for i in order], pa.int64()
                ),
                "avg_days": pa.array(
                    [(n[i] * gm - s[i]) // (n[i] * _DAY_US) for i in order],
                    pa.int64(),
                ),
                "max_days": pa.array(
                    [(gm - mn[i]) // _DAY_US for i in order], pa.int64()
                ),
            }
        )

    return (
        joined.map_batches(seg_partial, batch_format="pyarrow")
        .repartition(1)  # O(|segments|) rows per partial by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def weighted_median_price(sf_dir: str, bucket_cents: int = 1 << 16):
    """Exact quantity-weighted median of the extended price per return
    flag — distributed weighted selection WITHOUT a sort: pass 1 builds a
    coarse value-bucket weight histogram (metadata-scale exchange), the
    driver locates each group's median bucket and residual rank, pass 2
    re-scans ONLY that bucket's rows for the exact value. The exchanged
    state is O(|groups| x |buckets|) + O(|groups| x bucket_width) —
    independent of row count, where a sort-based median shuffles every row.

    Rule: smallest price with cumulative weight >= ceil(W/2), weights =
    half-up-rounded quantities (matches the SQL window oracle exactly).

    Output: (l_returnflag, total_weight, wmedian_cents).
    """
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def hist_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        w = np.floor(batch.column("l_quantity").to_numpy() + 0.5).astype(np.int64)
        return (
            pa.table(
                {
                    "rf": batch.column("l_returnflag"),
                    "b": pa.array(price // bucket_cents),
                    "w": pa.array(w),
                }
            )
            .group_by(["rf", "b"])
            .aggregate([("w", "sum")])
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
    )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .repartition(1)  # O(|groups| x |price buckets|) rows by construction
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "rf": g.column("rf"),
                        "b": pc.cast(g.column("b"), pa.int64()),
                        "w": pc.cast(g.column("w_sum_sum"), pa.int64()),
                    }
                )
            )(t.group_by(["rf", "b"]).aggregate([("w_sum", "sum")])),
            batch_format="pyarrow",
        )
        .to_pandas()  # metadata scale (see above)
    )

    targets: dict[str, tuple[int, int, int]] = {}
    for rf, g in hist.groupby("rf"):
        g = g.sort_values("b")
        cum = g["w"].to_numpy().cumsum()
        total = int(cum[-1])
        thresh = (total + 1) // 2
        i = int(np.searchsorted(cum, thresh))
        before = int(cum[i - 1]) if i else 0
        targets[rf] = (int(g["b"].iloc[i]), thresh - before, total)
    tref = ray.put(targets)

    def exact_partial(batch: pa.Table) -> pa.Table:
        tg = ray.get(tref)
        price = _cents(batch.column("l_extendedprice"))
        w = np.floor(batch.column("l_quantity").to_numpy() + 0.5).astype(np.int64)
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        b = price // bucket_cents
        keep = np.zeros(len(rf), dtype=bool)
        for flag, (bb, _, _) in tg.items():
            keep |= (rf == flag) & (b == bb)
        t = pa.table(
            {
                "rf": pa.array(rf[keep]),
                "price": pa.array(price[keep]),
                "w": pa.array(w[keep]),
            }
        )
        return t.group_by(["rf", "price"]).aggregate([("w", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        tg = ray.get(tref)
        g = t.group_by(["rf", "price"]).aggregate([("w_sum", "sum")])
        rf = g.column("rf").to_numpy(zero_copy_only=False)
        price = pc.cast(g.column("price"), pa.int64()).to_numpy()
        w = pc.cast(g.column("w_sum_sum"), pa.int64()).to_numpy()
        out_rf, out_tw, out_med = [], [], []
        for flag in sorted(tg):
            _, resid, total = tg[flag]
            m = rf == flag
            p_, w_ = price[m], w[m]
            order = np.argsort(p_)
            cum = w_[order].cumsum()
            out_rf.append(flag)
            out_tw.append(total)
            out_med.append(int(p_[order][np.searchsorted(cum, resid)]))
        return pa.table(
            {
                "l_returnflag": pa.array(out_rf, pa.string()),
                "total_weight": pa.array(out_tw, pa.int64()),
                "wmedian_cents": pa.array(out_med, pa.int64()),
            }
        )

    return (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .repartition(1)  # O(|groups| x bucket_width) rows by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def cube_revenue(sf_dir: str, num_partitions: int | None = None):
    """CUBE-grain revenue over (order priority, return flag): all four
    grains — (p, r), (p), (r), () — with 'ALL' placeholders, every coarse
    grain derived from the bounded finest aggregate instead of re-scanning
    (the GROUPING SETS evaluation strategy for bounded dimensions).

    Scale shape: one per-(orderkey, returnflag) combiner feeds the single
    native join with orders; the finest (priority x flag) aggregate is
    O(|p| x |r|) and every other grain folds from it on the final block.

    Output: (o_orderpriority, l_returnflag, revenue_x10000) with 'ALL'
    sentinels, matching GROUP BY CUBE + COALESCE.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        return (
            pa.table(
                {
                    "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                    "l_returnflag": batch.column("l_returnflag"),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by(["l_orderkey", "l_returnflag"])
            .aggregate([("rev", "sum")])
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag",
                     "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_orderpriority": pc.cast(t.column("o_orderpriority"),
                                           pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def fine_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "o_orderpriority": t.column("o_orderpriority"),
                    "l_returnflag": t.column("l_returnflag"),
                    "rev": pc.cast(t.column("rev_sum"), pa.int64()),
                }
            )
            .group_by(["o_orderpriority", "l_returnflag"])
            .aggregate([("rev", "sum")])
        )

    def cube(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderpriority", "l_returnflag"]).aggregate(
            [("rev_sum", "sum")]
        )
        p = g.column("o_orderpriority").to_pylist()
        r = g.column("l_returnflag").to_pylist()
        v = pc.cast(g.column("rev_sum_sum"), pa.int64()).to_pylist()
        rows: dict = {}
        for pp, rr, vv in zip(p, r, v):
            for key in [(pp, rr), (pp, "ALL"), ("ALL", rr), ("ALL", "ALL")]:
                rows[key] = rows.get(key, 0) + vv
        keys = sorted(rows)
        return pa.table(
            {
                "o_orderpriority": pa.array([k[0] for k in keys], pa.string()),
                "l_returnflag": pa.array([k[1] for k in keys], pa.string()),
                "revenue_x10000": pa.array([rows[k] for k in keys], pa.int64()),
            }
        )

    return (
        joined.map_batches(fine_partial, batch_format="pyarrow")
        .repartition(1)  # O(|priorities| x |flags|) rows by construction
        .map_batches(cube, batch_format="pyarrow")
    )


def revenue_trend(sf_dir: str):
    """Exact-integer least-squares trend over the monthly revenue series:
    slope and intercept of revenue ~ month-index as EXACT rationals
    (numerators/denominator from the normal equations — no float in the
    fit), plus the next month's floor-evaluated projection.

    slope = (n*Sxy - Sx*Sy) / D, intercept = (Sy*Sxx - Sx*Sxy) / D,
    D = n*Sxx - Sx^2; projection = (slope_num*x + icept_num) // D.

    Scale shape: the monthly series is a combiner + calendar-bounded
    groupby; the normal-equation sums and the projection run on the
    O(|months|) final block with Python bigints (month-index x cents
    products overflow int64 at corpus scale).

    Output: one row (n_months, slope_num, icept_num, denom,
    next_month_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        months = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        return (
            pa.table(
                {
                    "m": pa.array(months),
                    "rev": pa.array(_cents(batch.column("o_totalprice"))),
                }
            )
            .group_by("m")
            .aggregate([("rev", "sum")])
        )

    def fit(t: pa.Table) -> pa.Table:
        g = t.group_by("m").aggregate([("rev_sum", "sum")])
        m = pc.cast(g.column("m"), pa.int64()).to_numpy()
        y = pc.cast(g.column("rev_sum_sum"), pa.int64()).to_numpy()
        order = np.argsort(m)
        m, y = m[order], y[order]
        # month index relative to the first month keeps magnitudes small
        x = [int(v - m[0]) for v in m]
        yy = [int(v) for v in y]
        n = len(x)
        sx, sy = sum(x), sum(yy)
        sxx = sum(v * v for v in x)
        sxy = sum(a * b for a, b in zip(x, yy))
        denom = n * sxx - sx * sx
        slope_num = n * sxy - sx * sy
        icept_num = sy * sxx - sx * sxy
        nxt = (slope_num * (x[-1] + 1) + icept_num) // denom if denom else 0
        return pa.table(
            {
                "n_months": pa.array([n], pa.int64()),
                "slope_num": pa.array([slope_num], pa.int64()),
                "icept_num": pa.array([icept_num], pa.int64()),
                "denom": pa.array([denom], pa.int64()),
                "next_month_cents": pa.array([nxt], pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|months|) rows by construction
        .map_batches(fit, batch_format="pyarrow")
    )


def order_reconciliation(sf_dir: str, tol_pct: int = 25,
                         num_partitions: int | None = None):
    """Data-quality reconciliation: per order status, how many orders'
    lineitem revenue (sum of extprice x (1-disc), cents) agrees with the
    order's own o_totalprice within ``tol_pct`` percent — the referential
    consistency audit every warehouse runs after ingest. Exact integer
    test: |sum*100 - total*100| * 100 <= total*100 * tol_pct.

    Scale shape: per-orderkey lineitem combiner feeds ONE native hash
    join with orders; after the join a single hash(orderkey) bucket pass
    finishes each order's sum (reduceat), applies the verdict, and emits
    bounded per-status partials — status/total ride along as
    functionally dependent columns; the final fold is repartition(1).

    Output: (o_orderstatus, n_orders, n_within_tol, within_ppm).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        return (
            pa.table(
                {
                    "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("rev", "sum")])
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_orderstatus": pc.cast(t.column("o_orderstatus"), pa.string()),
                "total": pa.array(_cents(t.column("o_totalprice"))),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    import pandas as pd

    # fold the per-batch lineitem partials: one hash(orderkey) bucket
    # shuffle, then each bucket finishes the per-order sum (reduceat —
    # Ray's sort-aggregate would loop Python over |orders| groups),
    # applies the tolerance verdict, and emits a bounded per-status
    # partial in the same vectorized pass. status/total are functionally
    # dependent on the key and ride along.
    num_vbuckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        bucket = np.abs((k * np.int64(2654435761)) % np.int64(num_vbuckets))
        return pa.table(
            {
                "k": pa.array(k),
                "o_orderstatus": t.column("o_orderstatus"),
                "total": t.column("total"),
                "rev": pc.cast(t.column("rev_sum"), pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def verdict_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy()
        order = np.argsort(k, kind="stable")
        k = k[order]
        rev = g["rev"].to_numpy()[order]
        total = g["total"].to_numpy()[order]
        status = g["o_orderstatus"].to_numpy()[order]
        seg = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        rsum = np.add.reduceat(rev, seg)
        tot = total[seg]
        st = status[seg]
        # rev is x10000 (cents x discount-percent); totals are cents
        diff = np.abs(rsum - tot * 100)
        ok = (diff * 100 <= tot * 100 * tol_pct).astype(np.int64)
        out = pd.DataFrame({"o_orderstatus": st, "w": ok})
        out["n"] = np.int64(1)
        agg = out.groupby("o_orderstatus", as_index=False).agg(
            n_sum=("n", "sum"), w_sum=("w", "sum")
        )
        return agg

    per_status = (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verdict_bucket, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderstatus").aggregate(
            [("n_sum", "sum"), ("w_sum", "sum")]
        )
        st = g.column("o_orderstatus").to_pylist()
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_pylist()
        w = pc.cast(g.column("w_sum_sum"), pa.int64()).to_pylist()
        order = sorted(range(len(st)), key=lambda i: st[i])
        return pa.table(
            {
                "o_orderstatus": pa.array([st[i] for i in order], pa.string()),
                "n_orders": pa.array([n[i] for i in order], pa.int64()),
                "n_within_tol": pa.array([w[i] for i in order], pa.int64()),
                "within_ppm": pa.array(
                    [w[i] * 1_000_000 // n[i] for i in order], pa.int64()
                ),
            }
        )

    return (
        per_status
        .repartition(1)  # O(|statuses|) rows per bucket by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def order_width_histogram(sf_dir: str):
    """Distribution of order "width" (lineitems per order) with the revenue
    carried at each width — the fact-table shape profile that drives join
    fan-out planning.

    Scale shape: per-batch (orderkey -> count, revenue) partials combine
    before the ONE orderkey shuffle; the width histogram itself is a
    bounded-domain (1..7 lines in TPC-H-ish data) per-block partial fold +
    repartition(1) final reduce — no second wide shuffle.

    Output: (n_lines, n_orders, sum_rev_cents).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "n": pa.array(np.ones(len(batch), np.int64)),
                "rev": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        )
        return t.group_by("k").aggregate([("n", "sum"), ("rev", "sum")])

    per_order = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n_sum", alias_name="n_lines"),
                   Sum("rev_sum", alias_name="rev"))
    )

    def width_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "n_lines": pc.cast(t.column("n_lines"), pa.int64()),
                "o": pa.array(np.ones(t.num_rows, np.int64)),
                "rev": pc.cast(t.column("rev"), pa.int64()),
            }
        )
        return g.group_by("n_lines").aggregate([("o", "sum"), ("rev", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_lines").aggregate([("o_sum", "sum"),
                                             ("rev_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_lines", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_lines": pc.cast(g.column("n_lines"), pa.int64()),
                "n_orders": pc.cast(g.column("o_sum_sum"), pa.int64()),
                "sum_rev_cents": pc.cast(g.column("rev_sum_sum"), pa.int64()),
            }
        )

    return (
        per_order.map_batches(width_partial, batch_format="pyarrow")
        .repartition(1)  # O(|distinct widths|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def revenue_concentration(sf_dir: str, top_pct: int = 1,
                          bucket_cents: int = 1 << 20):
    """Revenue concentration: what share (ppm) of total customer spend the
    top ``top_pct`` percent of customers hold (k = ceil(n * pct/100),
    ordered by spend desc then custkey) — the Pareto/inequality audit.

    Scale shape: a naive version global-sorts all customers; this is the
    two-pass bucket-selection pattern instead — (1) per-customer spend
    (ONE shuffle) tagged with a coarse spend-value bucket; bucket
    (count, sum) pairs reduce to metadata scale and the driver walks them
    from the top to find the cutoff bucket + residual rank; (2) ONLY the
    cutoff bucket's rows are rescanned and sorted (bounded by bucket
    width, same contract as weighted_median_price).

    Output: one row (n_customers, top_k, top_spend_cents,
    total_spend_cents, share_ppm).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def spend_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "spend": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("custkey").aggregate([("spend", "sum")])

    spend = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
        )
        .map_batches(spend_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Sum("spend_sum", alias_name="spend_cents"))
        .map_batches(
            lambda t: pa.table(
                {
                    "custkey": pc.cast(t.column("custkey"), pa.int64()),
                    "spend_cents": pc.cast(t.column("spend_cents"),
                                           pa.int64()),
                    "vbucket": pc.cast(
                        pc.divide(pc.cast(t.column("spend_cents"),
                                          pa.int64()),
                                  bucket_cents),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused by the histogram pass and the rescan
    )

    hist = (
        spend.map_batches(
            lambda t: pa.table(
                {
                    "vbucket": t.column("vbucket"),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "s": t.column("spend_cents"),
                }
            ).group_by("vbucket").aggregate([("n", "sum"), ("s", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("vbucket")
        .aggregate(Sum("n_sum", alias_name="n"), Sum("s_sum", alias_name="s"))
        .to_pandas()  # metadata scale: one row per spend-value bucket
        .sort_values("vbucket", ascending=False)
    )
    n_total = int(hist["n"].sum())
    total = int(hist["s"].sum())
    k = -(-n_total * top_pct // 100)  # ceil

    taken = 0
    top_sum = 0
    cutoff_bucket = None
    residual = 0
    for vb, n, s in zip(hist["vbucket"], hist["n"], hist["s"]):
        if taken + int(n) <= k:
            taken += int(n)
            top_sum += int(s)
            if taken == k:
                break
        else:
            cutoff_bucket, residual = int(vb), k - taken
            break

    if cutoff_bucket is not None and residual > 0:
        # rescan ONLY the cutoff bucket (bounded by bucket value width)
        part = spend.filter(
            expr=f"vbucket == {cutoff_bucket}"
        ).to_pandas()
        order = np.lexsort(
            (part["custkey"].to_numpy(), -part["spend_cents"].to_numpy())
        )
        top_sum += int(part["spend_cents"].to_numpy()[order][:residual].sum())

    return pa.table(
        {
            "n_customers": pa.array([n_total], pa.int64()),
            "top_k": pa.array([k], pa.int64()),
            "top_spend_cents": pa.array([top_sum], pa.int64()),
            "total_spend_cents": pa.array([total], pa.int64()),
            "share_ppm": pa.array([top_sum * 1_000_000 // total], pa.int64()),
        }
    )


def top_parts_by_quantity(sf_dir: str, k: int = 20):
    """Top-k parts by total shipped quantity, annotated with the part
    dimension (brand, type) — the hot-SKU report.

    Scale shape: per-batch (partkey -> qty, revenue) partials combine
    before the ONE partkey shuffle; top-k is per-block partial top-k then
    a k-row final cut (never a global sort); the dimension attach is a
    PRUNED read of part.parquet with a partkey-IN pushdown filter over the
    k surviving keys — the big dimension never loads.

    Output: (partkey, p_brand, p_type, qty_x100, rev_cents).
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "qty": pa.array(_cents(batch.column("l_quantity"))),
                "rev": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        )
        return t.group_by("partkey").aggregate([("qty", "sum"),
                                                ("rev", "sum")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_quantity", "l_extendedprice"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("partkey")
        .aggregate(Sum("qty_sum", alias_name="qty_x100"),
                   Sum("rev_sum", alias_name="rev_cents"))
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("qty_x100", "descending"), ("partkey", "ascending")]
        )
        return t.take(idx[:k])

    top = (
        agg.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)  # O(k x blocks) rows by construction
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray

    from ..functions.tables import concat_nonempty

    tt = concat_nonempty(
        ray.get(top),
        {"partkey": pa.int64(), "qty_x100": pa.int64(),
         "rev_cents": pa.int64()},
    )
    keys = pc.cast(tt.column("partkey"), pa.int64()).to_pylist()
    dim = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type"],
        filters=pads.field("p_partkey").isin(keys),
    )
    dim = pa.table(
        {
            "partkey": pc.cast(dim.column("p_partkey"), pa.int64()),
            "p_brand": pc.cast(dim.column("p_brand"), pa.string()),
            "p_type": pc.cast(dim.column("p_type"), pa.string()),
        }
    )
    out = pa.table(
        {
            "partkey": pc.cast(tt.column("partkey"), pa.int64()),
            "qty_x100": pc.cast(tt.column("qty_x100"), pa.int64()),
            "rev_cents": pc.cast(tt.column("rev_cents"), pa.int64()),
        }
    ).join(dim, keys=["partkey"], join_type="inner")
    return out.select(["partkey", "p_brand", "p_type", "qty_x100",
                       "rev_cents"])


def acctbal_band_profile(sf_dir: str, band_cents: int = 100_000):
    """Customer account-balance profile: per (market segment, balance
    band) customer count and balance mass — the credit-exposure rollup.

    Balances can be negative; the band uses an offset so integer division
    is pure truncation on non-negatives in BOTH numpy and SQL (floor vs
    trunc never diverges): band = (bal + 10*band) // band - 10.

    Scale shape: single-table scan, per-batch combiner on the bounded
    (segment x band) domain, repartition(1) final fold — no wide shuffle.

    Output: (c_mktsegment, band, n_customers, sum_bal_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    off = 10 * band_cents

    def partial(batch: pa.Table) -> pa.Table:
        bal = _cents(batch.column("c_acctbal"))
        band = (bal + off) // band_cents - 10
        t = pa.table(
            {
                "c_mktsegment": pc.cast(batch.column("c_mktsegment"),
                                        pa.string()),
                "band": pa.array(band),
                "n": pa.array(np.ones(len(bal), np.int64)),
                "bal": pa.array(bal),
            }
        )
        return t.group_by(["c_mktsegment", "band"]).aggregate(
            [("n", "sum"), ("bal", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment", "band"]).aggregate(
            [("n_sum", "sum"), ("bal_sum", "sum")]
        )
        idx = pc.sort_indices(
            g, sort_keys=[("c_mktsegment", "ascending"), ("band", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "band": pc.cast(g.column("band"), pa.int64()),
                "n_customers": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_bal_cents": pc.cast(g.column("bal_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_mktsegment", "c_acctbal"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|segments| x |bands|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def supplier_balance_leader(sf_dir: str):
    """Per-nation supplier with the highest account balance (ties broken
    by lowest suppkey) — the distributed ARGMAX-per-group pattern.

    Scale shape: per-batch partials keep ONE candidate row per nation
    (max balance, then min suppkey among that batch's maxima), so only
    O(|nations| x blocks) rows reach the repartition(1) final fold; nation
    names attach via the broadcast 25-row dimension probe.

    Output: (n_name, nationkey, suppkey, bal_cents).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def candidate(t: pa.Table) -> pa.Table:
        nk = pc.cast(t.column("nationkey"), pa.int64()).to_numpy()
        bal = pc.cast(t.column("bal"), pa.int64()).to_numpy()
        sk = pc.cast(t.column("suppkey"), pa.int64()).to_numpy()
        # lexsort: nation asc, bal desc, suppkey asc -> first row per nation
        order = np.lexsort((sk, -bal, nk))
        nk, bal, sk = nk[order], bal[order], sk[order]
        first = np.r_[True, nk[1:] != nk[:-1]]
        return pa.table(
            {
                "nationkey": pa.array(nk[first]),
                "bal": pa.array(bal[first]),
                "suppkey": pa.array(sk[first]),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        return candidate(
            pa.table(
                {
                    "nationkey": pc.cast(batch.column("s_nationkey"),
                                         pa.int64()),
                    "bal": pa.array(_cents(batch.column("s_acctbal"))),
                    "suppkey": pc.cast(batch.column("s_suppkey"), pa.int64()),
                }
            )
        )

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table(
        {
            "nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat)

    def finish(t: pa.Table) -> pa.Table:
        w = candidate(t)
        out = w.join(ray.get(nat_ref), keys=["nationkey"], join_type="inner")
        out = out.select(["n_name", "nationkey", "suppkey", "bal"])
        idx = pc.sort_indices(out, sort_keys=[("nationkey", "ascending")])
        out = out.take(idx)
        return pa.table(
            {
                "n_name": out.column("n_name"),
                "nationkey": out.column("nationkey"),
                "suppkey": out.column("suppkey"),
                "bal_cents": out.column("bal"),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/supplier.parquet",
                columns=["s_nationkey", "s_acctbal", "s_suppkey"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|nations| x blocks) candidate rows
        .map_batches(finish, batch_format="pyarrow")
    )


def ship_delay_profile(sf_dir: str, num_partitions: int | None = None):
    """Order-to-ship latency histogram: calendar days between an order's
    date and each lineitem's ship date, with the revenue carried at each
    delay — the fulfillment-SLA profile.

    Scale shape: lineitem combines per (orderkey, ship-day) inside
    map_batches before the ONE native hash join with orders (both sides
    pruned at the read); the delay histogram folds on a bounded day
    domain via repartition(1).

    Output: (delay_days, n_items, rev_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("l_shipdate")
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        t = pa.table(
            {
                "k": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "ship_day": pa.array(day),
                "n": pa.array(np.ones(len(day), np.int64)),
                "rev": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        )
        return t.group_by(["k", "ship_day"]).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_shipdate", "l_extendedprice"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_day": pa.array(
                    t.column("o_orderdate")
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("k",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def delay_partial(t: pa.Table) -> pa.Table:
        delay = (
            pc.cast(t.column("ship_day"), pa.int64()).to_numpy()
            - pc.cast(t.column("o_day"), pa.int64()).to_numpy()
        )
        g = pa.table(
            {
                "delay_days": pa.array(delay),
                "n": pc.cast(t.column("n_sum"), pa.int64()),
                "rev": pc.cast(t.column("rev_sum"), pa.int64()),
            }
        )
        return g.group_by("delay_days").aggregate([("n", "sum"),
                                                   ("rev", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("delay_days").aggregate([("n_sum", "sum"),
                                                ("rev_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("delay_days", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "delay_days": pc.cast(g.column("delay_days"), pa.int64()),
                "n_items": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "rev_cents": pc.cast(g.column("rev_sum_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(delay_partial, batch_format="pyarrow")
        .repartition(1)  # O(|delay days|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def regional_customer_value(sf_dir: str, num_partitions: int | None = None):
    """Order revenue by (region, market segment) — the star-schema rollup
    (fact -> customer -> nation -> region) that every BI layer runs.

    Scale shape: ONE native hash join (orders |><| customer on custkey);
    nation->region is a broadcast 25-row dimension map applied inside the
    bounded post-join fold. Neither dimension hop shuffles the fact.

    Output: (r_name, c_mktsegment, n_orders, rev_cents).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "rev": pa.array(_cents(t.column("o_totalprice"))),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_mktsegment"],
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "nk": pc.cast(t.column("c_nationkey"), pa.int64()),
                "seg": pc.cast(t.column("c_mktsegment"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    # nation -> region-name broadcast map (25 rows by construction)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    dim = pa.table(
        {
            "nk": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "rk": pc.cast(nat.column("n_regionkey"), pa.int64()),
        }
    ).join(
        pa.table(
            {
                "rk": pc.cast(reg.column("r_regionkey"), pa.int64()),
                "r_name": pc.cast(reg.column("r_name"), pa.string()),
            }
        ),
        keys=["rk"],
        join_type="inner",
    ).select(["nk", "r_name"])
    dim_ref = ray.put(dim)

    def fold(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "nk": pc.cast(t.column("nk"), pa.int64()),
                "seg": t.column("seg"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "rev": pc.cast(t.column("rev"), pa.int64()),
            }
        ).group_by(["nk", "seg"]).aggregate([("n", "sum"), ("rev", "sum")])
        g = g.join(ray.get(dim_ref), keys=["nk"], join_type="inner")
        return g.group_by(["r_name", "seg"]).aggregate(
            [("n_sum", "sum"), ("rev_sum", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["r_name", "seg"]).aggregate(
            [("n_sum_sum", "sum"), ("rev_sum_sum", "sum")]
        )
        idx = pc.sort_indices(
            g, sort_keys=[("r_name", "ascending"), ("seg", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "r_name": g.column("r_name"),
                "c_mktsegment": g.column("seg"),
                "n_orders": pc.cast(g.column("n_sum_sum_sum"), pa.int64()),
                "rev_cents": pc.cast(g.column("rev_sum_sum_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(fold, batch_format="pyarrow")
        .repartition(1)  # O(|regions| x |segments|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def tax_discount_matrix(sf_dir: str):
    """Joint (discount pct, tax pct) pricing matrix: item count, base
    revenue, and discounted revenue at every observed combination — the
    pricing-policy audit grid.

    Scale shape: single-scan, per-batch combiner over a bounded
    (|discounts| x |taxes|) domain, repartition(1) final fold.

    Output: (disc_pct, tax_pct, n_items, base_cents, disc_price_x10000).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        tax = _cents(batch.column("l_tax"))
        t = pa.table(
            {
                "disc_pct": pa.array(disc),
                "tax_pct": pa.array(tax),
                "n": pa.array(np.ones(len(price), np.int64)),
                "base": pa.array(price),
                "dp": pa.array(price * (100 - disc)),
            }
        )
        return t.group_by(["disc_pct", "tax_pct"]).aggregate(
            [("n", "sum"), ("base", "sum"), ("dp", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["disc_pct", "tax_pct"]).aggregate(
            [("n_sum", "sum"), ("base_sum", "sum"), ("dp_sum", "sum")]
        )
        idx = pc.sort_indices(
            g, sort_keys=[("disc_pct", "ascending"), ("tax_pct", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "disc_pct": pc.cast(g.column("disc_pct"), pa.int64()),
                "tax_pct": pc.cast(g.column("tax_pct"), pa.int64()),
                "n_items": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "base_cents": pc.cast(g.column("base_sum_sum"), pa.int64()),
                "disc_price_x10000": pc.cast(g.column("dp_sum_sum"),
                                             pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_extendedprice", "l_discount", "l_tax"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|discounts| x |taxes|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def supplier_part_coverage(sf_dir: str, num_buckets: int = 64):
    """Supplier catalog-breadth histogram: distinct parts each supplier
    ships, histogrammed over suppliers — the distributed COUNT(DISTINCT)
    per key + distribution shape.

    Scale shape: per-batch distinct (suppkey, partkey) pairs pack into
    one int64 and combine before ONE hash(supplier) bucket shuffle —
    a supplier's pairs land whole, so the bucket finishes the dedup
    (np.unique), the per-supplier distinct count (reduceat), AND the
    histogram partial in one vectorized pass (Ray's per-group
    sort-aggregate would loop Python over |pairs| groups); the count
    histogram folds on its bounded domain.

    Output: (n_parts, n_suppliers).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    SHIFT = np.int64(1) << np.int64(31)  # partkey < 2^31 through sf~10^4

    def pair_partial(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column("l_suppkey"), pa.int64()).to_numpy()
        p = pc.cast(batch.column("l_partkey"), pa.int64()).to_numpy()
        sp = np.unique(s * SHIFT + p)
        bucket = np.abs(((sp // SHIFT) * np.int64(2654435761))
                        % np.int64(num_buckets))
        return pa.table({"sp": pa.array(sp), "bucket": pa.array(bucket)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sp = np.unique(g["sp"].to_numpy())  # finish the pair dedup
        s = sp // SHIFT
        seg = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        n_parts = np.diff(np.r_[seg, len(sp)])
        cnt, n = np.unique(n_parts, return_counts=True)
        return pd.DataFrame({"n_parts": cnt.astype(np.int64),
                             "c_sum": n.astype(np.int64)})

    per_supp_hist = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_parts").aggregate([("c_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_parts", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_parts": pc.cast(g.column("n_parts"), pa.int64()),
                "n_suppliers": pc.cast(g.column("c_sum_sum"), pa.int64()),
            }
        )

    return (
        per_supp_hist
        .repartition(1)  # O(|distinct counts|) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def orders_per_weekday(sf_dir: str):
    """Order count and revenue by (weekday, status) — the calendar
    seasonality rollup (Sunday=0 .. Saturday=6, matching SQL dayofweek).

    Scale shape: single-scan bounded-domain (7 x |statuses|) combiner +
    repartition(1) fold; weekday is integer epoch-day arithmetic
    ((days + 4) % 7 — the epoch was a Thursday), no calendar library.

    Output: (dow, o_orderstatus, n_orders, rev_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        days = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        dow = (days + 4) % 7
        t = pa.table(
            {
                "dow": pa.array(dow),
                "o_orderstatus": pc.cast(batch.column("o_orderstatus"),
                                         pa.string()),
                "n": pa.array(np.ones(len(dow), np.int64)),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by(["dow", "o_orderstatus"]).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["dow", "o_orderstatus"]).aggregate(
            [("n_sum", "sum"), ("rev_sum", "sum")]
        )
        idx = pc.sort_indices(
            g, sort_keys=[("dow", "ascending"), ("o_orderstatus", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "dow": pc.cast(g.column("dow"), pa.int64()),
                "o_orderstatus": g.column("o_orderstatus"),
                "n_orders": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "rev_cents": pc.cast(g.column("rev_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderdate", "o_orderstatus", "o_totalprice"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # 7 x |statuses| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def customer_supplier_diversity(sf_dir: str,
                                num_partitions: int | None = None):
    """Supplier-nation diversity per customer: how many distinct supplier
    nations each customer has bought from, histogrammed — the multi-hop
    DISTINCT-through-a-star shape (lineitem |><| orders, supplier-nation
    broadcast, two pair-dedup shuffles, count-of-counts).

    Scale shape: lineitem combines to distinct (orderkey, suppkey) pairs
    per batch before the ONE native join with orders; suppkey->nationkey
    is a broadcast of the supplier dimension (TPC-H's smallest — at true
    web scale swap for a native join); (custkey, nation) pairs dedup via
    a keyed groupby, per-customer counts via a second, and the histogram
    folds on the bounded count domain.

    Output: (n_nations, n_customers).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "sk": pc.cast(batch.column("l_suppkey"), pa.int64()),
            }
        )
        return t.group_by(["k", "sk"]).aggregate([])

    li = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey"])
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "ck": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = pc.cast(supp.column("s_suppkey"), pa.int64()).to_numpy()
    nk = pc.cast(supp.column("s_nationkey"), pa.int64()).to_numpy()
    lut = np.zeros(int(sk.max()) + 1, dtype=np.int64)
    lut[sk] = nk
    lut_ref = ray.put(lut)

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("k",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        nkv = ray.get(lut_ref)[pc.cast(t.column("sk"), pa.int64()).to_numpy()]
        g = pa.table(
            {
                "ck": pc.cast(t.column("ck"), pa.int64()),
                "nk": pa.array(nkv),
            }
        ).group_by(["ck", "nk"]).aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows, np.int64)))

    pairs = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["ck", "nk"])
        .aggregate(Sum("one", alias_name="one"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "ck": pc.cast(t.column("ck"), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by("ck").aggregate([("n", "sum")])

    per_cust = (
        pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("n_sum", alias_name="n_nations"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "n_nations": pc.cast(t.column("n_nations"), pa.int64()),
                "c": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by("n_nations").aggregate([("c", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_nations").aggregate([("c_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_nations", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_nations": pc.cast(g.column("n_nations"), pa.int64()),
                "n_customers": pc.cast(g.column("c_sum_sum"), pa.int64()),
            }
        )

    return (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .repartition(1)  # O(|nations|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def monthly_active_customers(sf_dir: str):
    """Distinct ordering customers per calendar month — the MAU shape
    (distinct-count per period) on the orders fact.

    Scale shape: per-batch distinct (month, custkey) pairs combine before
    ONE pair-key dedup shuffle; per-month counts fold on the bounded
    month domain via repartition(1). Months are integer months-since-
    epoch — no calendar library, no string keys.

    Output: (epoch_month, n_active).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        m = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        g = pa.table(
            {
                "m": pa.array(m),
                "ck": pc.cast(batch.column("o_custkey"), pa.int64()),
            }
        ).group_by(["m", "ck"]).aggregate([])
        return g.append_column("one", pa.array(np.ones(g.num_rows, np.int64)))

    pairs = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_custkey"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["m", "ck"])
        .aggregate(Sum("one", alias_name="one"))
    )

    def month_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "m": pc.cast(t.column("m"), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by("m").aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("m").aggregate([("n_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("m", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "epoch_month": pc.cast(g.column("m"), pa.int64()),
                "n_active": pc.cast(g.column("n_sum_sum"), pa.int64()),
            }
        )

    return (
        pairs.map_batches(month_partial, batch_format="pyarrow")
        .repartition(1)  # O(|months|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def part_name_token_revenue(sf_dir: str, num_partitions: int | None = None):
    """Revenue attribution to part-NAME tokens: every token of p_name
    inherits its part's lineitem revenue — the fact-to-dimension-text
    join (search-merchandising's "which words sell").

    Scale shape: lineitem combines per partkey before the ONE native
    hash join with part (both sides pruned at the read); token explosion
    happens AFTER the join on already-aggregated rows; token totals fold
    on the bounded name-vocabulary domain via repartition(1).

    Output: (token, n_parts, rev_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pk": pc.cast(batch.column("l_partkey"), pa.int64()),
                "rev": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        )
        return t.group_by("pk").aggregate([("rev", "sum")])

    from ray.data.aggregate import Sum

    li = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice"])
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("rev_sum", alias_name="rev"))
    )

    parts = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_name"])
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "p_name": pc.cast(t.column("p_name"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("pk",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def token_partial(t: pa.Table) -> pa.Table:
        names = pc.cast(t.column("p_name").combine_chunks(), pa.string())
        toks = pc.split_pattern(names, " ")
        counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
        rev = pc.cast(t.column("rev"), pa.int64()).to_numpy()
        g = pa.table(
            {
                "token": pc.list_flatten(toks),
                "n": pa.array(np.ones(int(counts.sum()), np.int64)),
                "rev": pa.array(np.repeat(rev, counts)),
            }
        )
        return g.group_by("token").aggregate([("n", "sum"), ("rev", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("n_sum", "sum"),
                                           ("rev_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("token", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "token": g.column("token"),
                "n_parts": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "rev_cents": pc.cast(g.column("rev_sum_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(token_partial, batch_format="pyarrow")
        .repartition(1)  # O(|name vocabulary|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def rfm_segments(sf_dir: str, recency_band_days: int = 30,
                 freq_cap: int = 5, monetary_band_cents: int = 10_000_000):
    """RFM (recency / frequency / monetary) customer segmentation grid:
    per-customer last-order recency (days vs the corpus max date, banded),
    order count (capped), and lifetime spend (banded), counted per cell —
    the classic marketing rollup as one keyed reduce + bounded grid fold.

    Scale shape: per-batch per-customer partials (max day, count, cents)
    combine before the ONE custkey shuffle; the reference date comes from
    parquet row-group STATISTICS (no extra scan); the grid folds via
    repartition(1) on a bounded (r, f, m) domain.

    Output: (r_band, f_band, m_band, n_customers, mon_cents).
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..functions.tables import strip_schema_metadata

    meta = pq.ParquetFile(f"{sf_dir}/orders.parquet")
    col = [f.name for f in meta.schema_arrow].index("o_orderdate")
    mx_ts = max(
        meta.metadata.row_group(i).column(col).statistics.max
        for i in range(meta.metadata.num_row_groups)
    )
    mx_day = int(np.datetime64(mx_ts, "D").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        days = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        t = pa.table(
            {
                "ck": pc.cast(batch.column("o_custkey"), pa.int64()),
                "d": pa.array(days),
                "f": pa.array(np.ones(len(days), np.int64)),
                "mon": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("ck").aggregate(
            [("d", "max"), ("f", "sum"), ("mon", "sum")]
        )

    per_cust = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_orderdate", "o_totalprice"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Max("d_max", alias_name="last_day"),
                   Sum("f_sum", alias_name="f"),
                   Sum("mon_sum", alias_name="mon"))
    )

    def band_partial(t: pa.Table) -> pa.Table:
        rec = mx_day - pc.cast(t.column("last_day"), pa.int64()).to_numpy()
        f = pc.cast(t.column("f"), pa.int64()).to_numpy()
        mon = pc.cast(t.column("mon"), pa.int64()).to_numpy()
        g = pa.table(
            {
                "r_band": pa.array(rec // recency_band_days),
                "f_band": pa.array(np.minimum(f, freq_cap)),
                "m_band": pa.array(mon // monetary_band_cents),
                "n": pa.array(np.ones(len(f), np.int64)),
                "mon": pa.array(mon),
            }
        )
        return g.group_by(["r_band", "f_band", "m_band"]).aggregate(
            [("n", "sum"), ("mon", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["r_band", "f_band", "m_band"]).aggregate(
            [("n_sum", "sum"), ("mon_sum", "sum")]
        )
        idx = pc.sort_indices(
            g,
            sort_keys=[("r_band", "ascending"), ("f_band", "ascending"),
                       ("m_band", "ascending")],
        )
        g = g.take(idx)
        return pa.table(
            {
                "r_band": pc.cast(g.column("r_band"), pa.int64()),
                "f_band": pc.cast(g.column("f_band"), pa.int64()),
                "m_band": pc.cast(g.column("m_band"), pa.int64()),
                "n_customers": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "mon_cents": pc.cast(g.column("mon_sum_sum"), pa.int64()),
            }
        )

    return (
        per_cust.map_batches(band_partial, batch_format="pyarrow")
        .repartition(1)  # bounded (r, f, m) grid per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def basket_supplier_pairs(sf_dir: str, num_buckets: int = 64):
    """Market-basket histogram over suppliers: for every unordered pair
    of suppliers co-occurring in an order, count the orders, then
    histogram pairs by co-occurrence count — the association-mining
    co-occurrence shape with a bounded count-of-counts output.

    Scale shape: TWO single-int64-key exchanges total. Batch-local
    distinct (orderkey, suppkey) packs into one int64 and combines
    before the order-hash bucket shuffle; inside each bucket (orders are
    whole — bucket key is the orderkey hash) one np.unique finishes the
    dedup, a triangular expansion grouped by basket size emits pairs,
    and the same pass pre-counts packed (sa, sb) keys tagged with a
    pair-hash bucket. The global pair reduce + histogram fold happen in
    ONE vectorized pass per pair bucket (np.unique reduceat — Ray's
    sort-aggregate would loop Python per group over |S|^2/2 pair keys),
    then the bounded count domain folds via repartition(1).

    Output: (n_orders_together, n_pairs).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    # suppkey < 2^20 holds through TPC-H sf~100 (suppkey = sf*10k); the
    # packed key (orderkey << 20 | suppkey) keeps every exchange single-int64.
    SHIFT = np.int64(1) << np.int64(20)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy()
        s = pc.cast(batch.column("l_suppkey"), pa.int64()).to_numpy()
        ks = np.unique(k * SHIFT + s)
        bucket = np.abs(((ks // SHIFT) * np.int64(2654435761))
                        % np.int64(num_buckets))
        return pa.table({"ks": pa.array(ks), "bucket": pa.array(bucket)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(g["ks"].to_numpy())  # finish the (k, s) dedup
        k = ks // SHIFT
        s = ks % SHIFT
        n = len(ks)
        first = np.r_[True, k[1:] != k[:-1]]
        seg = np.flatnonzero(first)
        sizes = np.diff(np.r_[seg, n])
        ai, bi = [], []
        for sz in np.unique(sizes):
            if sz < 2:
                continue
            starts = seg[sizes == sz]
            iu, ju = np.triu_indices(int(sz), k=1)
            ai.append((starts[:, None] + iu[None, :]).ravel())
            bi.append((starts[:, None] + ju[None, :]).ravel())
        if not ai:
            return pd.DataFrame({"pair": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64"),
                                 "pbucket": pd.Series(dtype="int64")})
        ai = np.concatenate(ai)
        bi = np.concatenate(bi)
        pair, c = np.unique(s[ai] * SHIFT + s[bi], return_counts=True)
        pbucket = np.abs((pair * np.int64(-7046029254386353131))
                         % np.int64(num_buckets))
        return pd.DataFrame({"pair": pair, "c": c.astype(np.int64),
                             "pbucket": pbucket})

    def per_pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # every partial of a pair lands here: finish the per-pair sum
        # (sorted reduceat), then fold this bucket's histogram partial.
        pair = g["pair"].to_numpy()
        c = g["c"].to_numpy()
        order = np.argsort(pair, kind="stable")
        pair, c = pair[order], c[order]
        seg = np.flatnonzero(np.r_[True, pair[1:] != pair[:-1]])
        totals = np.add.reduceat(c, seg)
        cnt, n = np.unique(totals, return_counts=True)
        return pd.DataFrame({"n_orders_together": cnt.astype(np.int64),
                             "p": n.astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_orders_together").aggregate([("p", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_orders_together",
                                             "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_orders_together": pc.cast(g.column("n_orders_together"),
                                             pa.int64()),
                "n_pairs": pc.cast(g.column("p_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey"])
        )
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(per_pair_bucket, batch_format="pandas")
        .repartition(1)  # O(|distinct counts|) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def price_discount_corr_terms(sf_dir: str,
                              num_partitions: int | None = None):
    """Quantity-vs-discount correlation sufficient statistics per part
    type (exact integer Pearson terms: n, Sq, Sd, Sqd, Sqq, Sdd with
    q = quantity x100, d = discount pct) — the price-elasticity probe
    computed through a big-big join without a single float.

    Scale shape: lineitem carries only (partkey, q, d) into ONE native
    hash join with part's (partkey, p_type); the statistics fold on the
    bounded |p_type| domain via repartition(1).

    Output: (p_type, n_items, sum_q, sum_d, sum_qd, sum_qq, sum_dd).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_discount"],
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "pk": pc.cast(t.column("l_partkey"), pa.int64()),
                "q": pa.array(_cents(t.column("l_quantity"))),
                "d": pa.array(_cents(t.column("l_discount"))),
            }
        ),
        batch_format="pyarrow",
    )

    parts = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_type"])
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "p_type": pc.cast(t.column("p_type"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("pk",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t.column("q"), pa.int64()).to_numpy()
        d = pc.cast(t.column("d"), pa.int64()).to_numpy()
        g = pa.table(
            {
                "p_type": t.column("p_type"),
                "n": pa.array(np.ones(len(q), np.int64)),
                "sq": pa.array(q),
                "sd": pa.array(d),
                "sqd": pa.array(q * d),
                "sqq": pa.array(q * q),
                "sdd": pa.array(d * d),
            }
        )
        return g.group_by("p_type").aggregate(
            [("n", "sum"), ("sq", "sum"), ("sd", "sum"), ("sqd", "sum"),
             ("sqq", "sum"), ("sdd", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("p_type").aggregate(
            [("n_sum", "sum"), ("sq_sum", "sum"), ("sd_sum", "sum"),
             ("sqd_sum", "sum"), ("sqq_sum", "sum"), ("sdd_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("p_type", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "p_type": g.column("p_type"),
                "n_items": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_q": pc.cast(g.column("sq_sum_sum"), pa.int64()),
                "sum_d": pc.cast(g.column("sd_sum_sum"), pa.int64()),
                "sum_qd": pc.cast(g.column("sqd_sum_sum"), pa.int64()),
                "sum_qq": pc.cast(g.column("sqq_sum_sum"), pa.int64()),
                "sum_dd": pc.cast(g.column("sdd_sum_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(stats_partial, batch_format="pyarrow")
        .repartition(1)  # O(|p_type|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def order_gap_histogram(sf_dir: str, num_buckets: int = 64):
    """Histogram of days between a customer's consecutive orders
    (ordered by date then orderkey) — the repurchase-cadence profile.

    Scale shape: hash(custkey) bucket shuffle, ONE vectorized lexsort
    pass per bucket (shifted-delta with customer-boundary mask), bounded
    day-domain repartition(1) fold.

    Output: (gap_days, n_gaps).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        bucket = np.abs((ck * np.int64(2654435761)) % np.int64(num_buckets))
        day = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "ck": pa.array(ck),
                "day": pa.array(day),
                "k": pc.cast(batch.column("o_orderkey"), pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy()
        day = g["day"].to_numpy()
        k = g["k"].to_numpy()
        order = np.lexsort((k, day, ck))
        ck, day = ck[order], day[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = ck[1:] == ck[:-1]
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap[1:] = day[1:] - day[:-1]
        gaps = gap[same]
        cnt = np.bincount(gaps) if len(gaps) else np.zeros(0, np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame(
            {"gap_days": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)}
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("gap_days").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("gap_days", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "gap_days": pc.cast(g.column("gap_days"), pa.int64()),
                "n_gaps": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_orderdate", "o_orderkey"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(|gap days|) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def nation_part_type_matrix(sf_dir: str, num_partitions: int | None = None):
    """Revenue matrix by (supplier nation, part type) — the two-dimension
    fact enrichment: one big-big native join for the part attribute, one
    broadcast LUT for the supplier attribute, bounded matrix fold.

    Scale shape: lineitem carries (partkey, suppkey, rev) into ONE native
    hash join with part's (partkey, p_type); suppkey->nationkey is a
    dense broadcast array probe (supplier is TPC-H's smallest dimension —
    at true web scale swap for a second native join); nation names attach
    in the bounded (25 x |p_type|) final fold.

    Output: (n_name, p_type, n_items, rev_cents).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "pk": pc.cast(t.column("l_partkey"), pa.int64()),
                "sk": pc.cast(t.column("l_suppkey"), pa.int64()),
                "rev": pa.array(_cents(t.column("l_extendedprice"))),
            }
        ),
        batch_format="pyarrow",
    )

    parts = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_type"])
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "p_type": pc.cast(t.column("p_type"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = pc.cast(supp.column("s_suppkey"), pa.int64()).to_numpy()
    nk = pc.cast(supp.column("s_nationkey"), pa.int64()).to_numpy()
    lut = np.zeros(int(sk.max()) + 1, dtype=np.int64)
    lut[sk] = nk
    lut_ref = ray.put(lut)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table(
        {
            "nk": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat)

    joined = li.join(
        parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("pk",),
        right_on=("p_partkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def fold(t: pa.Table) -> pa.Table:
        nkv = ray.get(lut_ref)[pc.cast(t.column("sk"), pa.int64()).to_numpy()]
        g = pa.table(
            {
                "nk": pa.array(nkv),
                "p_type": t.column("p_type"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "rev": pc.cast(t.column("rev"), pa.int64()),
            }
        )
        return g.group_by(["nk", "p_type"]).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["nk", "p_type"]).aggregate(
            [("n_sum", "sum"), ("rev_sum", "sum")]
        )
        g = g.join(ray.get(nat_ref), keys=["nk"], join_type="inner")
        idx = pc.sort_indices(
            g, sort_keys=[("n_name", "ascending"), ("p_type", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "n_name": g.column("n_name"),
                "p_type": g.column("p_type"),
                "n_items": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "rev_cents": pc.cast(g.column("rev_sum_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(fold, batch_format="pyarrow")
        .repartition(1)  # bounded (|nations| x |p_type|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def revenue_pareto_curve(sf_dir: str, deciles: int = 10,
                         bucket_cents: int = 1 << 20):
    """Customer-spend Pareto curve: customers ranked by lifetime spend
    (asc, ties by custkey) and split into rank deciles (decile =
    rank * 10 // n); per decile, customer count, spend mass, and share
    ppm — decile 9 is the top spenders.

    Scale shape: the global rank is the two-pass range-partition pattern
    (customer_spend_ntile): per-customer spend (ONE shuffle) tagged with
    coarse value buckets, bucket counts reduce to metadata scale, the
    driver prefix-sums bucket offsets, and each bucket ranks only its own
    rows — rank -> decile is then pure arithmetic, no boundary rescan.

    Output: (decile, n_customers, spend_cents, share_ppm).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def spend_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "spend": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("custkey").aggregate([("spend", "sum")])

    spend = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
        )
        .map_batches(spend_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Sum("spend_sum", alias_name="spend_cents"))
        .map_batches(
            lambda t: pa.table(
                {
                    "custkey": pc.cast(t.column("custkey"), pa.int64()),
                    "spend_cents": pc.cast(t.column("spend_cents"),
                                           pa.int64()),
                    "vbucket": pc.cast(
                        pc.divide(pc.cast(t.column("spend_cents"),
                                          pa.int64()),
                                  bucket_cents),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused by the count pass and the rank pass
    )

    counts = (
        spend.map_batches(
            lambda t: t.select(["vbucket"]).group_by("vbucket").aggregate(
                [("vbucket", "count")]
            ),
            batch_format="pyarrow",
        )
        .groupby("vbucket")
        .aggregate(Sum("vbucket_count", alias_name="n"))
        .to_pandas()  # metadata scale: one row per spend-value bucket
        .sort_values("vbucket")
    )
    n_total = int(counts["n"].sum())
    csum = counts["n"].to_numpy().cumsum()
    offsets = dict(zip(counts["vbucket"].to_numpy().tolist(),
                       np.r_[0, csum[:-1]].tolist()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sp = g["spend_cents"].to_numpy()
        ck = g["custkey"].to_numpy()
        order = np.lexsort((ck, sp))
        sp = sp[order]
        rank = int(offsets[int(g["vbucket"].iloc[0])]) + np.arange(
            len(g), dtype=np.int64
        )
        dec = rank * deciles // n_total
        out = pd.DataFrame({"decile": dec, "spend": sp})
        out["n"] = np.int64(1)
        return out.groupby("decile", as_index=False).agg(
            n=("n", "sum"), spend=("spend", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("decile").aggregate([("n", "sum"), ("spend", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("decile", "ascending")])
        g = g.take(idx)
        sp = pc.cast(g.column("spend_sum"), pa.int64()).to_numpy()
        tot = int(sp.sum())
        # per-decile share in Python ints: spend * 1e6 wraps int64 once total
        # corpus spend exceeds ~9.2e12 cents (TPC-H sf ~4+); the oracle casts
        # to HUGEINT for the same expression. O(deciles) rows, loop is free.
        share = [int(s) * 1_000_000 // tot for s in sp]
        return pa.table(
            {
                "decile": pc.cast(g.column("decile"), pa.int64()),
                "n_customers": pc.cast(g.column("n_sum"), pa.int64()),
                "spend_cents": pa.array(sp),
                "share_ppm": pa.array(share, type=pa.int64()),
            }
        )

    return (
        spend.groupby("vbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # O(deciles) rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def part_size_price_profile(sf_dir: str):
    """Part-catalog price profile per size: count, total, min and max
    retail price — the dimension-table health check (MIN/MAX distributed
    aggregates alongside SUM).

    Scale shape: single dimension scan, bounded |sizes| combiner with
    min/max partials, repartition(1) fold.

    Output: (p_size, n_parts, sum_price_cents, min_price_cents,
    max_price_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("p_retailprice"))
        t = pa.table(
            {
                "p_size": pc.cast(batch.column("p_size"), pa.int64()),
                "n": pa.array(np.ones(len(price), np.int64)),
                "s": pa.array(price),
                "mn": pa.array(price),
                "mx": pa.array(price),
            }
        )
        return t.group_by("p_size").aggregate(
            [("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("p_size").aggregate(
            [("n_sum", "sum"), ("s_sum", "sum"), ("mn_min", "min"),
             ("mx_max", "max")]
        )
        idx = pc.sort_indices(g, sort_keys=[("p_size", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "p_size": pc.cast(g.column("p_size"), pa.int64()),
                "n_parts": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_price_cents": pc.cast(g.column("s_sum_sum"), pa.int64()),
                "min_price_cents": pc.cast(g.column("mn_min_min"),
                                           pa.int64()),
                "max_price_cents": pc.cast(g.column("mx_max_max"),
                                           pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_size", "p_retailprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sizes|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def quantity_mode(sf_dir: str):
    """Modal order quantity per (returnflag, linestatus) — exact mode
    with deterministic ties (smallest quantity wins).

    Scale shape: the count matrix is bounded (|flags| x |status| x
    |quantities| ~ 300 cells), so per-batch Arrow count partials
    combine before a repartition(1) fold that finishes the argmax —
    no row ever crosses the wire unaggregated.

    Output: (l_returnflag, l_linestatus, mode_qty, n_items).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy().astype(np.int64)
        g = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qty),
                "n": pa.array(np.ones(len(qty), np.int64)),
            }
        )
        return g.group_by(["l_returnflag", "l_linestatus", "qty"]).aggregate(
            [("n", "sum")]
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus", "qty"],
                       as_index=False)["n_sum"].sum()
        g = g.sort_values(
            ["l_returnflag", "l_linestatus", "n_sum", "qty"],
            ascending=[True, True, False, True],
            kind="mergesort",
        )
        top = g.groupby(["l_returnflag", "l_linestatus"],
                        as_index=False).first()
        return pd.DataFrame(
            {
                "l_returnflag": top["l_returnflag"],
                "l_linestatus": top["l_linestatus"],
                "mode_qty": top["qty"].astype(np.int64),
                "n_items": top["n_sum"].astype(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_returnflag", "l_linestatus", "l_quantity"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded count-matrix per partial
        .map_batches(finish, batch_format="pandas")
    )


def nation_rank_change(sf_dir: str, num_partitions: int | None = None):
    """Month-over-month movement in each customer nation's revenue
    rank: rank nations by order revenue inside every month, then track
    each nation's rank against its previous appearing month (rank-delta
    leaderboard; first month reports prev_rank = 0).

    Scale shape: orders fold to per-custkey (month, revenue) partials
    before the single big-big hash join with customer; the nation hop
    is a ray.put broadcast; the final rank/lag window runs on the
    bounded |nations| x |months| grid after a repartition(1) fold.

    Output: (month, n_name, rnk, prev_rank).
    """
    import pyarrow.parquet as pq

    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    def ord_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy().astype("datetime64[M]")
        month = (d.astype(np.int64) + np.int64(1970 * 12))
        t = pa.table(
            {
                "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "month": pa.array(month),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by(["o_custkey", "month"]).aggregate([("rev", "sum")])

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
    ).map_batches(ord_partial, batch_format="pyarrow")

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table(
        {
            "c_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat.replace_schema_metadata(None))

    def nation_partial(batch: pa.Table) -> pa.Table:
        dim = ray.get(nat_ref)
        t = pa.table(
            {
                "c_nationkey": batch.column("c_nationkey"),
                "month": pc.cast(batch.column("month"), pa.int64()),
                "rev": pc.cast(batch.column("rev_sum"), pa.int64()),
            }
        ).join(dim, keys="c_nationkey", join_type="inner")
        return t.group_by(["n_name", "month"]).aggregate([("rev", "sum")])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["n_name", "month"], as_index=False)["rev_sum"].sum()
        g = g.sort_values(["month", "rev_sum", "n_name"],
                          ascending=[True, False, True], kind="mergesort")
        g["rnk"] = g.groupby("month").cumcount() + 1
        g = g.sort_values(["n_name", "month"], kind="mergesort")
        prev = g.groupby("n_name")["rnk"].shift(1)
        g["prev_rank"] = prev.fillna(0).astype(np.int64)
        out = g.sort_values(["month", "rnk"], kind="mergesort")
        return pd.DataFrame(
            {
                "month": out["month"].astype(np.int64),
                "n_name": out["n_name"],
                "rnk": out["rnk"].astype(np.int64),
                "prev_rank": out["prev_rank"],
            }
        )

    return (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .repartition(1)  # bounded |nations| x |months| grid per partial
        .map_batches(finish, batch_format="pandas")
    )


def benford_profile(sf_dir: str):
    """Leading-digit distribution of order totals (Benford's-law fraud
    probe) — the count of orders whose total, in cents, starts with
    each digit 1-9.

    Scale shape: the leading digit falls out of a vectorized
    divide-until-single-digit loop (<= 13 whole-array passes — no
    string or float round trip), the 9-cell histogram combines per
    batch and folds via repartition(1).

    Output: (leading_digit, n_orders).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("o_totalprice"))
        x = np.abs(x)
        while True:
            big = x >= 10
            if not big.any():
                break
            x = np.where(big, x // 10, x)
        cnt = np.bincount(x, minlength=10)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "leading_digit": pa.array(nz.astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("leading_digit").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("leading_digit", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "leading_digit": pc.cast(g.column("leading_digit"),
                                         pa.int64()),
                "n_orders": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # 9 rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def acctbal_gini_terms(sf_dir: str, num_buckets: int = 8):
    """Integer Gini sufficient statistics of customer account balances
    per nation: the sorted-rank weighted sum G_num = sum((2i - n - 1) *
    x_(i)) plus n and sum(x) — inequality-of-wealth per market without
    floats (balances in cents, shifted non-negative downstream).

    Scale shape: ONE hash(nation) bucket shuffle (nations are bounded,
    several nations share a bucket); each bucket lexsorts (nation,
    balance) once and computes every nation's rank-weighted sum in one
    vectorized pass; output is the bounded |nations| grid.

    Output: (c_nationkey, n_customers, sum_cents, gini_numerator).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch.column("c_nationkey"), pa.int64()).to_numpy()
        bucket = np.abs((nk * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "nk": pa.array(nk),
                "bal": pa.array(_cents(batch.column("c_acctbal"))),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nk = g["nk"].to_numpy()
        bal = g["bal"].to_numpy()
        order = np.lexsort((bal, nk))
        nk, bal = nk[order], bal[order]
        n = len(g)
        seg = np.flatnonzero(np.r_[True, nk[1:] != nk[:-1]])
        sizes = np.diff(np.r_[seg, n])
        # within-nation rank i (1-based): position - segment start + 1
        pos = np.arange(n, dtype=np.int64)
        i = pos - np.repeat(seg, sizes) + 1
        w = 2 * i - np.repeat(sizes, sizes) - 1
        csum = np.r_[0, np.cumsum(w * bal)]
        bsum = np.r_[0, np.cumsum(bal)]
        ends = np.r_[seg[1:], n]
        return pd.DataFrame(
            {
                "c_nationkey": nk[seg],
                "n_customers": sizes.astype(np.int64),
                "sum_cents": (bsum[ends] - bsum[seg]).astype(np.int64),
                "gini_numerator": (csum[ends] - csum[seg]).astype(np.int64),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey", "c_acctbal"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def name_key_audit(sf_dir: str):
    """String-parse referential audit: extract the numeric id embedded
    in c_name ("Customer#000000042") with one vectorized RE2 pass and
    check it against c_custkey, per market segment — the
    parse-and-validate shape of ingestion-time data contracts.

    Scale shape: pure vectorized map, bounded |segments| combiner +
    repartition(1) fold; nothing unaggregated crosses the wire.

    Output: (c_mktsegment, n_customers, n_consistent).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata, try_cast_int64

    def partial(batch: pa.Table) -> pa.Table:
        name = pc.cast(batch.column("c_name").combine_chunks(), pa.string())
        ex = pc.extract_regex(name, r"#(?P<id>[0-9]+)$")
        ids = pc.struct_field(ex, "id")
        parsed = try_cast_int64(ids)
        ck = pc.cast(batch.column("c_custkey"), pa.int64())
        ok = pc.fill_null(pc.equal(parsed, ck), False)
        t = pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "c": pc.cast(ok, pa.int64()),
            }
        )
        return t.group_by("c_mktsegment").aggregate([("n", "sum"),
                                                     ("c", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate(
            [("n_sum", "sum"), ("c_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("c_mktsegment", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "n_customers": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "n_consistent": pc.cast(g.column("c_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_name", "c_custkey", "c_mktsegment"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |segments| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def status_consistency_matrix(sf_dir: str, num_partitions: int | None = None):
    """Order-status vs line-status contingency matrix across the
    orders |><| lineitem join — the cross-table lifecycle-consistency
    audit (every F-order should carry F lines, O-orders O lines).

    Scale shape: lineitem pre-folds to per-orderkey linestatus counts
    (bounded |statuses| columns) before the single big-big hash join
    with the (orderkey, orderstatus) projection; the bounded matrix
    folds via repartition(1).

    Output: (o_orderstatus, l_linestatus, n_lineitems).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "l_linestatus": batch.column("l_linestatus"),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return t.group_by(["l_orderkey", "l_linestatus"]).aggregate(
            [("n", "sum")]
        )

    li = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_linestatus"])
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderstatus"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_orderstatus": t.column("o_orderstatus"),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def matrix_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "l_linestatus": t.column("l_linestatus"),
                "n": pc.cast(t.column("n_sum"), pa.int64()),
            }
        )
        return g.group_by(["o_orderstatus", "l_linestatus"]).aggregate(
            [("n", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "l_linestatus"]).aggregate(
            [("n_sum", "sum")]
        )
        idx = pc.sort_indices(
            g,
            sort_keys=[("o_orderstatus", "ascending"),
                       ("l_linestatus", "ascending")],
        )
        g = g.take(idx)
        return pa.table(
            {
                "o_orderstatus": g.column("o_orderstatus"),
                "l_linestatus": g.column("l_linestatus"),
                "n_lineitems": pc.cast(g.column("n_sum_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(matrix_partial, batch_format="pyarrow")
        .repartition(1)  # bounded status matrix per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def price_ending_histogram(sf_dir: str):
    """Cents-ending distribution of order totals (the .00/.99
    psychological-pricing audit): order counts per final-two-digit
    cents value.

    Scale shape: a 100-cell histogram combines per batch (one modulo +
    bincount) and folds via repartition(1).

    Output: (cents_ending, n_orders).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("o_totalprice")) % 100
        cnt = np.bincount(x, minlength=100)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cents_ending": pa.array(nz.astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("cents_ending").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("cents_ending", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "cents_ending": pc.cast(g.column("cents_ending"), pa.int64()),
                "n_orders": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # <= 100 rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def price_qty_heatmap(sf_dir: str, band_cents: int = 500_000):
    """2-D (quantity x price-band) order-line heat matrix — the hexbin
    feed for pricing visualizations, exact and integer.

    Scale shape: one vectorized 2-D bincount per batch on the packed
    (qty, band) key, bounded-grid repartition(1) fold; quantities and
    bands are both bounded domains.

    Output: (l_quantity, price_band, n_items).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy().astype(np.int64)
        band = _cents(batch.column("l_extendedprice")) // np.int64(band_cents)
        packed = qty * np.int64(1 << 20) + band
        keys, counts = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "l_quantity": pa.array(keys >> np.int64(20)),
                "price_band": pa.array(keys & np.int64((1 << 20) - 1)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_quantity", "price_band"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("l_quantity", "ascending"),
                          ("price_band", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "l_quantity": pc.cast(g.column("l_quantity"), pa.int64()),
                "price_band": pc.cast(g.column("price_band"), pa.int64()),
                "n_items": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_extendedprice"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded qty x band grid per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def discount_curve(sf_dir: str):
    """Revenue and volume per discount level — the discount
    effectiveness curve (does a deeper cut actually move more units?).

    Scale shape: the discount domain is bounded (0-10 percent), so
    per-batch 3-sum partials combine on it and fold via repartition(1).

    Output: (discount_pct, n_items, sum_qty, revenue_cents).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        disc = _cents(batch.column("l_discount"))  # pct: 0.05 -> 5
        price = _cents(batch.column("l_extendedprice"))
        qty = batch.column("l_quantity").to_numpy().astype(np.int64)
        rev = price * (100 - disc) // 100
        g = pa.table(
            {
                "discount_pct": pa.array(disc),
                "n": pa.array(np.ones(len(disc), np.int64)),
                "q": pa.array(qty),
                "r": pa.array(rev),
            }
        )
        return g.group_by("discount_pct").aggregate(
            [("n", "sum"), ("q", "sum"), ("r", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("discount_pct").aggregate(
            [("n_sum", "sum"), ("q_sum", "sum"), ("r_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("discount_pct", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "discount_pct": pc.cast(g.column("discount_pct"), pa.int64()),
                "n_items": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_qty": pc.cast(g.column("q_sum_sum"), pa.int64()),
                "revenue_cents": pc.cast(g.column("r_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_discount", "l_extendedprice",
                                     "l_quantity"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |discount levels| per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def part_region_division(sf_dir: str, num_partitions: int | None = None):
    """Relational DIVISION: how many parts reach customers in exactly
    k of the regions (k = 1..5) — "parts sold everywhere" is the
    n_regions = |regions| row.

    Scale shape: lineitem pre-distincts (orderkey, partkey) per batch
    before the orderkey |><| orders join; customer resolves by a second
    native hash join; the 25-row nation->region map rides as a ray.put
    broadcast inside the probe. Distinct (part, region) packs into one
    int64 and finishes inside a part-hash bucket pass that also folds
    the bounded (n_regions) histogram.

    Output: (n_regions, n_parts).
    """
    import pyarrow.parquet as pq

    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))
    num_buckets = 64

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    nat = pa.table(
        {
            "c_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "regionkey": pc.cast(nat.column("n_regionkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    nat_ref = ray.put(nat)

    def li_partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy()
        p = pc.cast(batch.column("l_partkey"), pa.int64()).to_numpy()
        kp = np.unique(k * (np.int64(1) << np.int64(31)) + p)
        return pa.table(
            {
                "l_orderkey": pa.array(kp >> np.int64(31)),
                "l_partkey": pa.array(kp & np.int64((1 << 31) - 1)),
            }
        )

    li = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_partkey"])
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    j1 = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )
    j2 = j1.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def pr_partial(t: pa.Table) -> pa.Table:
        dim = ray.get(nat_ref)
        t = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "c_nationkey": t.column("c_nationkey"),
            }
        ).join(dim, keys="c_nationkey", join_type="inner")
        p = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()
        r = pc.cast(t.column("regionkey"), pa.int64()).to_numpy()
        pr = np.unique(p * np.int64(8) + r)
        bucket = np.abs(((pr // np.int64(8)) * np.int64(2654435761))
                        % np.int64(num_buckets))
        return pa.table({"pr": pa.array(pr), "bucket": pa.array(bucket)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pr = np.unique(g["pr"].to_numpy())
        p = pr // 8
        seg = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        nreg = np.diff(np.r_[seg, len(pr)])
        cnt, n = np.unique(nreg, return_counts=True)
        return pd.DataFrame({"n_regions": cnt.astype(np.int64),
                             "n_parts": n.astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_regions").aggregate([("n_parts", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_regions", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_regions": pc.cast(g.column("n_regions"), pa.int64()),
                "n_parts": pc.cast(g.column("n_parts_sum"), pa.int64()),
            }
        )

    return (
        j2.map_batches(pr_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # <= |regions| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def orphan_audit(sf_dir: str, num_partitions: int | None = None):
    """Bidirectional referential-orphan audit between orders and
    lineitem: keys on each side with no partner on the other (the
    both-ways FK check a warehouse runs after ingest).

    Scale shape: both sides pre-distinct their keys per batch, then two
    native left_anti hash joins count survivors; the 2-row verdict
    folds at metadata scale.

    Output: (side, n_keys, n_orphans).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def distinct_keys(path: str, col: str, out: str):
        def partial(batch: pa.Table) -> pa.Table:
            k = np.unique(pc.cast(batch.column(col), pa.int64()).to_numpy())
            return pa.table({out: pa.array(k)})

        return strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/{path}.parquet", columns=[col])
        ).map_batches(partial, batch_format="pyarrow")

    # each side feeds an anti-join AND a distinct count — materialize so
    # the parquet scan + batch dedup runs once, not three times
    ok = distinct_keys("orders", "o_orderkey", "ok").materialize()
    lk = distinct_keys("lineitem", "l_orderkey", "lk").materialize()

    # batch-level distinct still leaves cross-batch dups; anti-join is
    # set-semantics so dups only change counts. Exact distinct counts
    # finish inside key-hash buckets (a key's copies land together),
    # then metadata-scale partial counts sum.
    def count_distinct(ds, col):
        import pandas as pd

        def add_bucket(t: pa.Table) -> pa.Table:
            k = np.unique(pc.cast(t.column(col), pa.int64()).to_numpy())
            bucket = np.abs((k * np.int64(2654435761)) % np.int64(64))
            return pa.table({"k": pa.array(k), "bucket": pa.array(bucket)})

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"c": np.array([len(np.unique(g["k"].to_numpy()))],
                               np.int64)}
            )

        return int(
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .sum("c")
            or 0
        )

    o_orphans = ok.join(
        lk,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("ok",),
        right_on=("lk",),
        aggregator_ray_remote_args=agg_args,
    )
    l_orphans = lk.join(
        ok,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("lk",),
        right_on=("ok",),
        aggregator_ray_remote_args=agg_args,
    )

    rows = [
        ("orders_without_lineitems", count_distinct(ok, "ok"),
         count_distinct(o_orphans, "ok")),
        ("lineitems_without_orders", count_distinct(lk, "lk"),
         count_distinct(l_orphans, "lk")),
    ]
    return pa.table(
        {
            "side": pa.array([r[0] for r in rows], pa.string()),
            "n_keys": pa.array([r[1] for r in rows], pa.int64()),
            "n_orphans": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def customer_trend_signs(sf_dir: str, num_partitions: int | None = None,
                         num_buckets: int = 64):
    """Per-customer spend-trend direction, folded per market segment:
    each customer's integer least-squares slope sign over (epoch-day,
    order-cents) points — the per-entity regression fold (numerator
    n*Sxy - Sx*Sy needs no division, so the verdict is exact).

    Scale shape: orders pre-fold per (custkey) sufficient statistics
    (n, Sx, Sy, Sxy) inside each batch via arrow groupby, ONE native
    hash join attaches the segment, and a customer-hash bucket pass
    finishes the sums and signs; the |segments| x 3 grid folds via
    repartition(1).

    Output: (c_mktsegment, trend, n_customers) with trend in
    (-1, 0, 1); single-order customers count as 0 (flat).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def ord_partial(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        x = (batch.column("o_orderdate").to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        y = _cents(batch.column("o_totalprice"))
        t = pa.table(
            {
                "o_custkey": pa.array(ck),
                "n": pa.array(np.ones(len(ck), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
            }
        )
        return t.group_by("o_custkey").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum")]
        )

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    ).map_batches(ord_partial, batch_format="pyarrow")

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_mktsegment": t.column("c_mktsegment"),
            }
        ),
        batch_format="pyarrow",
    )

    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        ck = pc.cast(t.column("o_custkey"), pa.int64()).to_numpy()
        bucket = np.abs((ck * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "ck": pa.array(ck),
                "c_mktsegment": t.column("c_mktsegment"),
                "n": pc.cast(t.column("n_sum"), pa.int64()),
                "sx": pc.cast(t.column("sx_sum"), pa.int64()),
                "sy": pc.cast(t.column("sy_sum"), pa.int64()),
                "sxy": pc.cast(t.column("sxy_sum"), pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy()
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        seg = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        n = np.add.reduceat(g["n"].to_numpy()[order], seg)
        sx = np.add.reduceat(g["sx"].to_numpy()[order], seg)
        sy = np.add.reduceat(g["sy"].to_numpy()[order], seg)
        sxy = np.add.reduceat(g["sxy"].to_numpy()[order], seg)
        # days are ~2e4, cents ~5e7: n*Sxy <= 40 * 2e4*5e7*40 ~ 1.6e15 — int64 safe
        num = n * sxy - sx * sy
        trend = np.sign(num).astype(np.int64)
        out = pd.DataFrame(
            {"c_mktsegment": g["c_mktsegment"].to_numpy()[order][seg],
             "trend": trend}
        )
        out["n_customers"] = np.int64(1)
        return out.groupby(["c_mktsegment", "trend"], as_index=False)[
            "n_customers"].sum()

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment", "trend"]).aggregate(
            [("n_customers", "sum")]
        )
        idx = pc.sort_indices(
            g, sort_keys=[("c_mktsegment", "ascending"),
                          ("trend", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "trend": pc.cast(g.column("trend"), pa.int64()),
                "n_customers": pc.cast(g.column("n_customers_sum"),
                                       pa.int64()),
            }
        )

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |segments| x 3 grid per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def region_trade_imbalance(sf_dir: str, num_partitions: int | None = None):
    """Directional trade-flow matrix between customer regions and
    supplier regions with the net imbalance per unordered pair — the
    who-ships-to-whom rollup (TPC-H Q7's shape lifted to regions, plus
    the antisymmetric net).

    Scale shape: lineitem folds (orderkey, suppkey)-> revenue partials
    per batch, ONE native orderkey join attaches custkey, customer
    resolves by a second native join; both nation->region maps ride as
    ray.put broadcasts. The flow matrix is bounded (|regions|^2), so it
    folds via repartition(1); the net is derived in the final block.

    Output: (region_a, region_b, flow_ab_cents, flow_ba_cents,
    net_cents) for region_a < region_b, plus (r, r) rows with net 0.
    """
    import pyarrow.parquet as pq

    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    n2r = pa.table(
        {
            "nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "regionkey": pc.cast(nat.column("n_regionkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    n2r_ref = ray.put(n2r)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    s2n = pa.table(
        {
            "l_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "nationkey": pc.cast(sup.column("s_nationkey"), pa.int64()),
        }
    ).replace_schema_metadata(None)
    s2n_ref = ray.put(s2n)

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "rev": pa.array(price * (100 - disc) // 100),
            }
        ).join(ray.get(s2n_ref), keys="l_suppkey", join_type="inner")
        t = t.join(
            ray.get(n2r_ref).rename_columns(["nationkey", "supp_region"]),
            keys="nationkey", join_type="inner",
        )
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "supp_region": t.column("supp_region"),
                "rev": t.column("rev"),
            }
        )
        return g.group_by(["l_orderkey", "supp_region"]).aggregate(
            [("rev", "sum")]
        )

    li = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey",
                                 "l_extendedprice", "l_discount"])
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    cust = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    j1 = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )
    j2 = j1.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def flow_partial(t: pa.Table) -> pa.Table:
        dim = ray.get(n2r_ref).rename_columns(["c_nationkey", "cust_region"])
        t = pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "supp_region": t.column("supp_region"),
                "rev": pc.cast(t.column("rev_sum"), pa.int64()),
            }
        ).join(dim, keys="c_nationkey", join_type="inner")
        g = pa.table(
            {
                "cust_region": t.column("cust_region"),
                "supp_region": t.column("supp_region"),
                "rev": t.column("rev"),
            }
        )
        return g.group_by(["cust_region", "supp_region"]).aggregate(
            [("rev", "sum")]
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cust_region", "supp_region"],
                       as_index=False)["rev_sum"].sum()
        flow = {(int(r.cust_region), int(r.supp_region)): int(r.rev_sum)
                for r in g.itertuples()}
        regions = sorted({k for pair in flow for k in pair})
        rows = []
        for i, a in enumerate(regions):
            for b in regions[i:]:
                ab = flow.get((a, b), 0)
                ba = flow.get((b, a), 0)
                rows.append((a, b, ab, ba, ab - ba))
        return pd.DataFrame(
            rows,
            columns=["region_a", "region_b", "flow_ab_cents",
                     "flow_ba_cents", "net_cents"],
        ).astype(np.int64)

    return (
        j2.map_batches(flow_partial, batch_format="pyarrow")
        .repartition(1)  # bounded |regions|^2 grid per partial
        .map_batches(finish, batch_format="pandas")
    )


def repeat_revenue_share(sf_dir: str, num_partitions: int | None = None,
                         num_buckets: int = 64):
    """Monthly revenue split between first-time and repeat customers —
    the retention-economics rollup. An order is "repeat" if its
    customer has an earlier order (strictly earlier date, or same date
    with a smaller orderkey).

    Scale shape: all of a customer's orders land in ONE hash(custkey)
    bucket (orders carry (custkey, date, orderkey, cents) only); the
    bucket lexsorts once, marks the per-customer first order by
    boundary mask, and emits bounded (month, flag) partials folded via
    repartition(1). No join — the "dimension" (first order) is derived
    in the same pass that consumes it.

    Output: (month, n_orders, repeat_orders, revenue_cents,
    repeat_revenue_cents).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        d = batch.column("o_orderdate").to_numpy().astype("datetime64[D]")
        day = d.astype(np.int64)
        month = d.astype("datetime64[M]").astype(np.int64) + 1970 * 12
        bucket = np.abs((ck * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "ck": pa.array(ck),
                "day": pa.array(day),
                "month": pa.array(month),
                "k": pc.cast(batch.column("o_orderkey"), pa.int64()),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy()
        day = g["day"].to_numpy()
        k = g["k"].to_numpy()
        order = np.lexsort((k, day, ck))
        ck = ck[order]
        month = g["month"].to_numpy()[order]
        rev = g["rev"].to_numpy()[order]
        first = np.r_[True, ck[1:] != ck[:-1]]
        repeat = (~first).astype(np.int64)
        out = pd.DataFrame({"month": month, "repeat": repeat, "rev": rev})
        out["n"] = np.int64(1)
        out["rrev"] = out["rev"] * out["repeat"]
        return out.groupby("month", as_index=False).agg(
            n=("n", "sum"), r=("repeat", "sum"),
            rev=("rev", "sum"), rrev=("rrev", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("month").aggregate(
            [("n", "sum"), ("r", "sum"), ("rev", "sum"), ("rrev", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("month", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "month": pc.cast(g.column("month"), pa.int64()),
                "n_orders": pc.cast(g.column("n_sum"), pa.int64()),
                "repeat_orders": pc.cast(g.column("r_sum"), pa.int64()),
                "revenue_cents": pc.cast(g.column("rev_sum"), pa.int64()),
                "repeat_revenue_cents": pc.cast(g.column("rrev_sum"),
                                                pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey", "o_totalprice"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |months| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def supplier_margin_per_nation(sf_dir: str):
    """Winner's margin per nation: the account-balance gap between each
    nation's top two suppliers (ties broken by smaller suppkey winning
    the higher slot) — the top-2 ARGMAX fold, strictly harder than
    argmax because partials must carry TWO candidates.

    Scale shape: each batch keeps only its per-nation top-2 (a valid
    partial: the global top-2 is within the union of block top-2s);
    the bounded |nations| x 2 candidate set folds via repartition(1).

    Output: (s_nationkey, top_suppkey, top_cents, runner_suppkey,
    runner_cents, margin_cents) — nations with one supplier report the
    runner as -1/0 and margin = top_cents.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def top2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["nk", "bal", "sk"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("nk", as_index=False).head(2)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "nk": pc.cast(batch.column("s_nationkey"),
                              pa.int64()).to_numpy(),
                "sk": pc.cast(batch.column("s_suppkey"),
                              pa.int64()).to_numpy(),
                "bal": _cents(batch.column("s_acctbal")),
            }
        )
        return pa.Table.from_pandas(top2(df), preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        t = top2(df)
        rows = []
        for nk, sub in t.groupby("nk", sort=True):
            s = sub.reset_index(drop=True)
            top_sk, top_b = int(s.loc[0, "sk"]), int(s.loc[0, "bal"])
            if len(s) > 1:
                run_sk, run_b = int(s.loc[1, "sk"]), int(s.loc[1, "bal"])
            else:
                run_sk, run_b = -1, 0
            rows.append((int(nk), top_sk, top_b, run_sk, run_b,
                         top_b - run_b))
        return pd.DataFrame(
            rows,
            columns=["s_nationkey", "top_suppkey", "top_cents",
                     "runner_suppkey", "runner_cents", "margin_cents"],
        ).astype(np.int64)

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_nationkey", "s_suppkey",
                                     "s_acctbal"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # <= |nations| x 2 rows per partial
        .map_batches(finish, batch_format="pandas")
    )


def linenumber_density_audit(sf_dir: str, num_buckets: int = 64):
    """Line-number contract audit: per order width, how many orders
    carry a dense 1..n l_linenumber sequence (max == count == width,
    no gaps) — the ingestion invariant that detects dropped or
    duplicated lines.

    Scale shape: per-batch (orderkey -> count, max, sum) partials
    combine before ONE hash(orderkey) bucket pass that finishes the
    per-order fold and tests density arithmetically (count == max AND
    sum == max*(max+1)/2 — no sort needed); the bounded width
    histogram folds via repartition(1).

    Output: (n_lines, n_orders, n_dense).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "ln": pc.cast(batch.column("l_linenumber"), pa.int64()),
                "s": pc.cast(batch.column("l_linenumber"), pa.int64()),
            }
        )
        g = t.group_by("k").aggregate(
            [("n", "sum"), ("ln", "max"), ("s", "sum")]
        )
        k = pc.cast(g.column("k"), pa.int64()).to_numpy()
        bucket = np.abs((k * np.int64(2654435761)) % np.int64(num_buckets))
        return g.append_column("bucket", pa.array(bucket))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy()
        order = np.argsort(k, kind="stable")
        k = k[order]
        seg = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        n = np.add.reduceat(g["n_sum"].to_numpy()[order], seg)
        mx = np.maximum.reduceat(g["ln_max"].to_numpy()[order], seg)
        s = np.add.reduceat(g["s_sum"].to_numpy()[order], seg)
        dense = ((n == mx) & (2 * s == mx * (mx + 1))).astype(np.int64)
        out = pd.DataFrame({"n_lines": n.astype(np.int64), "dense": dense})
        out["n_orders"] = np.int64(1)
        return out.groupby("n_lines", as_index=False).agg(
            n_orders=("n_orders", "sum"), n_dense=("dense", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_lines").aggregate(
            [("n_orders", "sum"), ("n_dense", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("n_lines", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_lines": pc.cast(g.column("n_lines"), pa.int64()),
                "n_orders": pc.cast(g.column("n_orders_sum"), pa.int64()),
                "n_dense": pc.cast(g.column("n_dense_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |widths| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def order_value_band_transition(sf_dir: str, band_cents: int = 10_000_000,
                                num_buckets: int = 64):
    """Markov transition counts between consecutive order-value bands
    per customer (orders in (date, orderkey) order, totals bucketed to
    ``band_cents``) — does a big order follow a big order?

    Scale shape: ONE hash(custkey) bucket shuffle keeps each customer's
    order history whole; one lexsort + shifted-pair pass per bucket;
    the bounded |bands|^2 matrix folds via repartition(1).

    Output: (band_from, band_to, n_transitions).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        day = (batch.column("o_orderdate").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        band = _cents(batch.column("o_totalprice")) // np.int64(band_cents)
        bucket = np.abs((ck * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "ck": pa.array(ck),
                "day": pa.array(day),
                "k": pc.cast(batch.column("o_orderkey"), pa.int64()),
                "band": pa.array(band),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy()
        day = g["day"].to_numpy()
        k = g["k"].to_numpy()
        band = g["band"].to_numpy()
        order = np.lexsort((k, day, ck))
        ck, band = ck[order], band[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = ck[1:] == ck[:-1]
        prev = np.roll(band, 1)
        pair = prev[same] * np.int64(1 << 20) + band[same]
        keys, cnt = np.unique(pair, return_counts=True)
        return pd.DataFrame(
            {
                "band_from": (keys >> np.int64(20)).astype(np.int64),
                "band_to": (keys & np.int64((1 << 20) - 1)).astype(np.int64),
                "n": cnt.astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["band_from", "band_to"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("band_from", "ascending"), ("band_to",
                                                       "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "band_from": pc.cast(g.column("band_from"), pa.int64()),
                "band_to": pc.cast(g.column("band_to"), pa.int64()),
                "n_transitions": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey", "o_totalprice"])
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |bands|^2 rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def supplier_wait_ranking(
    sf_dir: str,
    slow_days: int = 90,
    num_buckets: int = 256,
    topk: int = 25,
):
    """Suppliers who were the SOLE slow shipper on a multi-supplier order
    (TPC-H Q21 adapted to this schema: "slow" = the supplier's latest
    lineitem shipped more than ``slow_days`` after the order date, on
    'F'-status orders) — the EXISTS / NOT-EXISTS double-correlated shape.

    Scale shape: both fact scans reduce BEFORE the exchange — orders are
    pruned at the read (status filter pushed down) to (orderkey, day),
    lineitem combines per (orderkey, suppkey) -> max ship-day inside
    map_batches — then ONE tagged-union hash-bucket groupby on orderkey
    co-locates each order's rows; the per-bucket kernel is all-numpy
    (searchsorted date probe, lexsort + maximum.reduceat pair reduction,
    add.reduceat per-order counts). Final ranking folds |suppliers| rows
    (dimension-scale) through repartition(1).

    Output: (s_suppkey, s_name, numwait) — top ``topk`` by numwait desc,
    suppkey asc.
    """
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def ord_partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column("o_orderkey"), pa.int64()).to_numpy()
        day = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "k": pa.array(k),
                "sk": pa.array(np.full(len(k), -1, np.int64)),
                "day": pa.array(day),
                "bucket": pa.array(
                    np.abs((k * np.int64(2654435761)) % np.int64(num_buckets))
                ),
            }
        )

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "sk": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "day": pa.array(
                    batch.column("l_shipdate")
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype(np.int64)
                ),
            }
        )
        g = t.group_by(["k", "sk"]).aggregate([("day", "max")])
        k = g.column("k").to_numpy()
        return pa.table(
            {
                "k": pa.array(k),
                "sk": g.column("sk"),
                "day": pc.cast(g.column("day_max"), pa.int64()),
                "bucket": pa.array(
                    np.abs((k * np.int64(2654435761)) % np.int64(num_buckets))
                ),
            }
        )

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
            filter=pads.field("o_orderstatus") == "F",
        )
    ).map_batches(ord_partial, batch_format="pyarrow")

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    import pandas as pd

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sk = g["sk"].to_numpy()
        is_ord = sk == -1
        ok = np.sort(g["k"].to_numpy()[is_ord])
        od = g["day"].to_numpy()[is_ord][np.argsort(g["k"].to_numpy()[is_ord],
                                                    kind="stable")]
        lk = g["k"].to_numpy()[~is_ord]
        ls = sk[~is_ord]
        ld = g["day"].to_numpy()[~is_ord]
        if len(lk) == 0 or len(ok) == 0:
            return pd.DataFrame({"sk": pd.Series([], dtype=np.int64),
                                 "waits": pd.Series([], dtype=np.int64)})
        # global per-(orderkey, suppkey) max over the block partials
        order = np.lexsort((ls, lk))
        lk, ls, ld = lk[order], ls[order], ld[order]
        new = np.empty(len(lk), bool)
        new[0] = True
        np.not_equal(lk[1:], lk[:-1], out=new[1:])
        np.logical_or(new[1:], ls[1:] != ls[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        pk = lk[starts]
        ps = ls[starts]
        pmax = np.maximum.reduceat(ld, starts)
        # inner probe against the F-order dates
        pos = np.searchsorted(ok, pk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == pk
        pk, ps, pmax, pos_c = pk[hit], ps[hit], pmax[hit], pos_c[hit]
        if len(pk) == 0:
            return pd.DataFrame({"sk": pd.Series([], dtype=np.int64),
                                 "waits": pd.Series([], dtype=np.int64)})
        slow = pmax > od[pos_c] + np.int64(slow_days)
        # per-order supplier count and slow count (pk already sorted)
        ostarts = np.flatnonzero(
            np.concatenate(([True], pk[1:] != pk[:-1]))
        )
        n_supp = np.diff(np.append(ostarts, len(pk)))
        n_slow = np.add.reduceat(slow.astype(np.int64), ostarts)
        grp = np.repeat(np.arange(len(ostarts)), n_supp)
        keep = slow & (n_supp[grp] >= 2) & (n_slow[grp] == 1)
        win = ps[keep]
        if len(win) == 0:
            return pd.DataFrame({"sk": pd.Series([], dtype=np.int64),
                                 "waits": pd.Series([], dtype=np.int64)})
        u, c = np.unique(win, return_counts=True)
        return pd.DataFrame({"sk": u, "waits": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    counts = (
        orders.union(li)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("sk")
        .aggregate(Sum("waits", alias_name="numwait"))
    )

    import pyarrow.parquet as pq

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    supp = pa.table(
        {
            "s_suppkey": pc.cast(supp.column("s_suppkey"), pa.int64()),
            "s_name": pc.cast(supp.column("s_name"), pa.string()),
        }
    )
    supp_ref = ray.put(supp)

    def finish(t: pa.Table) -> pa.Table:
        dim = ray.get(supp_ref)
        out = pa.table(
            {
                "s_suppkey": pc.cast(t.column("sk"), pa.int64()),
                "numwait": pc.cast(t.column("numwait"), pa.int64()),
            }
        ).join(dim, keys=["s_suppkey"], join_type="inner")
        idx = pc.sort_indices(
            out,
            sort_keys=[("numwait", "descending"), ("s_suppkey", "ascending")],
        )
        out = out.take(idx[:topk])
        return out.select(["s_suppkey", "s_name", "numwait"])

    # one row per supplier survives the groupby — dimension-scale fold
    return counts.repartition(1).map_batches(finish, batch_format="pyarrow")


def idle_capital_by_nation(sf_dir: str, priority: str = "1-URGENT",
                           num_partitions: int | None = None):
    """Nations ranked by "idle capital": account balances of customers who
    are richer than the positive-balance average yet placed no order of the
    given priority (TPC-H Q22 adapted: nationkey stands in for the phone
    country code; the priority filter keeps the anti-join non-trivial in a
    corpus where every customer has SOME order).

    Scale shape: the threshold is a 2-int global aggregate (sum + count of
    positive balances — metadata-scale, computed by Ray's own aggregate and
    broadcast into the probe closure); the no-orders test is the native
    hash-shuffle LEFT-ANTI join against per-block-distinct custkeys; the
    nation rollup is a bounded 25-row groupby. The average comparison is
    exact-integer both sides: bal_cents * n_pos > sum_pos_cents.

    Output: (n_nationkey, n_name, n_idle_customers, idle_capital_cents).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    def pos_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal"))
        pos = cents[cents > 0]
        return pa.table(
            {
                "one": pa.array(np.zeros(1, np.int64)),
                "s": pa.array(np.array([pos.sum()], np.int64)),
                "n": pa.array(np.array([len(pos)], np.int64)),
            }
        )

    cust_raw = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
    )

    thr = (
        cust_raw.map_batches(pos_partial, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .take_all()
    )  # exactly one metadata-scale row
    sum_pos = int(thr[0]["s"])
    n_pos = int(thr[0]["n"])

    def cust_prep(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal"))
        keep = cents * n_pos > sum_pos  # bal > avg(positive), exact-integer
        t = pa.table(
            {
                "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "nk": pc.cast(batch.column("c_nationkey"), pa.int64()),
                "bal_cents": pa.array(cents),
            }
        )
        return t.filter(pa.array(keep))

    def orders_keys(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"o_custkey": pc.cast(batch.column("o_custkey"), pa.int64())}
        )
        return t.group_by("o_custkey").aggregate([])

    import pyarrow.dataset as pads

    cust = cust_raw.map_batches(cust_prep, batch_format="pyarrow")
    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pads.field("o_orderpriority") == priority,
        )
    ).map_batches(orders_keys, batch_format="pyarrow")

    idle = cust.join(
        orders,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "nk": batch.column("nk"),
                "n1": pa.array(np.ones(len(batch), np.int64)),
                "bal": batch.column("bal_cents"),
            }
        )
        return t.group_by("nk").aggregate([("n1", "sum"), ("bal", "sum")])

    agg = (
        idle.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("n1_sum", alias_name="n_idle_customers"),
                   Sum("bal_sum", alias_name="idle_capital_cents"))
    )

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table(
        {
            "n_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat)

    def attach(t: pa.Table) -> pa.Table:
        dim = ray.get(nat_ref)
        out = pa.table(
            {
                "n_nationkey": pc.cast(t.column("nk"), pa.int64()),
                "n_idle_customers": pc.cast(t.column("n_idle_customers"),
                                            pa.int64()),
                "idle_capital_cents": pc.cast(t.column("idle_capital_cents"),
                                              pa.int64()),
            }
        ).join(dim, keys=["n_nationkey"], join_type="inner")
        return out.select(["n_nationkey", "n_name", "n_idle_customers",
                           "idle_capital_cents"])

    return agg.map_batches(attach, batch_format="pyarrow")


# price fits 24 bits of cents (< $167k), suppkey fits 32: packed argmin is a
# single combiner-friendly Min aggregate instead of a sort or window.
_PACK_SHIFT = np.int64(1) << np.int64(32)


def min_cost_supplier_per_part(sf_dir: str):
    """Which nation's suppliers win the "cheapest offer per part" contest
    (TPC-H Q2 adapted: lineitem extendedprice stands in for partsupp
    supplycost) — the ARGMIN-PER-KEY shape done as a pure Min aggregate.

    Scale shape: argmin-with-deterministic-tiebreak is packed into one
    int64 (price_cents * 2^32 + suppkey; min == lowest price, then lowest
    suppkey) so the per-part reduction is a combiner-friendly
    ``groupby.Min`` — no sort, no window, no map_groups. Winner counts per
    supplier fold through a second small groupby and the 25-row nation
    dimension attaches by broadcast.

    Output: (n_name, parts_won, winner_suppliers).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..functions.tables import strip_schema_metadata

    def li_partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch.column("l_extendedprice"))
        sk = pc.cast(batch.column("l_suppkey"), pa.int64()).to_numpy()
        assert price.max(initial=0) < (1 << 24) and sk.max(initial=0) < (
            1 << 32
        ), "packed argmin key out of range"
        t = pa.table(
            {
                "pk": pc.cast(batch.column("l_partkey"), pa.int64()),
                "packed": pa.array(price * _PACK_SHIFT + sk),
            }
        )
        return t.group_by("pk").aggregate([("packed", "min")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    wins = li.groupby("pk").aggregate(Min("packed_min", alias_name="packed"))

    def unpack_partial(batch: pa.Table) -> pa.Table:
        packed = pc.cast(batch.column("packed"), pa.int64()).to_numpy()
        t = pa.table(
            {
                "sk": pa.array(packed % _PACK_SHIFT),
                "parts": pa.array(np.ones(len(packed), np.int64)),
            }
        )
        return t.group_by("sk").aggregate([("parts", "sum")])

    per_supp = (
        wins.map_batches(unpack_partial, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("parts_sum", alias_name="parts"))
    )

    import pyarrow.parquet as pq

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    dim = pa.table(
        {
            "sk": pc.cast(supp.column("s_suppkey"), pa.int64()),
            "nk": pc.cast(supp.column("s_nationkey"), pa.int64()),
        }
    ).join(
        pa.table(
            {
                "nk": pc.cast(nat.column("n_nationkey"), pa.int64()),
                "n_name": pc.cast(nat.column("n_name"), pa.string()),
            }
        ),
        keys=["nk"],
        join_type="inner",
    ).select(["sk", "n_name"])
    dim_ref = ray.put(dim)

    def attach_partial(t: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        out = pa.table(
            {
                "sk": pc.cast(t.column("sk"), pa.int64()),
                "parts": pc.cast(t.column("parts"), pa.int64()),
            }
        ).join(d, keys=["sk"], join_type="inner")
        g = pa.table(
            {
                "n_name": out.column("n_name"),
                "parts": out.column("parts"),
                "w1": pa.array(np.ones(out.num_rows, np.int64)),
            }
        )
        return g.group_by("n_name").aggregate([("parts", "sum"),
                                               ("w1", "sum")])

    agg = (
        per_supp.map_batches(attach_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("parts_sum", alias_name="parts_won"),
                   Sum("w1_sum", alias_name="winner_suppliers"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t.column("n_name"),
                "parts_won": pc.cast(t.column("parts_won"), pa.int64()),
                "winner_suppliers": pc.cast(t.column("winner_suppliers"),
                                            pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def supplier_attr_counts(sf_dir: str, excl_brand: str = "Brand#13",
                         sizes: tuple = (1, 4, 9, 16, 25, 36, 49)):
    """Distinct suppliers per part-attribute group (TPC-H Q16 shape): for
    parts outside one brand and within a size list, how many DISTINCT
    suppliers shipped them — with a denylist anti-join (suppkey % 7 == 0
    standing in for Q16's complaint-comment filter; this schema has no
    comment column).

    Scale shape: lineitem reduces to per-batch DISTINCT (partkey, suppkey)
    pairs inside map_batches (combiner), the filtered part sliver
    broadcasts once (``ray.put`` + Arrow C++ hash join per batch), and the
    global supplier-distinct is ONE hash-bucket shuffle on
    (attrs, suppkey) — each pair lands in exactly one bucket, so the
    per-bucket dedup + per-attr partial count is exact and the final fold
    runs on the bounded (brand x type x size) domain.

    Reference behavior source: TPC-H Q16 (supplier relationship query)
    re-expressed over lineitem as the part-supplier bridge.

    Output: (p_brand, p_type, p_size, supplier_cnt).
    """
    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.hashing import hash62_batch
    from ..functions.tables import strip_schema_metadata

    num_buckets = 64

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filters=(pads.field("p_brand") != excl_brand)
        & pads.field("p_size").isin(list(sizes)),
    )
    part = pa.table(
        {
            "p_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
            "p_brand": part.column("p_brand"),
            "p_type": part.column("p_type"),
            "p_size": pc.cast(part.column("p_size"), pa.int64()),
        }
    )
    part_ref = ray.put(part)

    def pairs(batch: pa.Table) -> pa.Table:
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "l_suppkey": pa.array(sk),
            }
        )
        # denylist anti-join (tiny predicate, vectorized; numpy mod —
        # pyarrow.compute has no modulo kernel)
        t = t.filter(pa.array(sk % 7 != 0))
        # per-batch DISTINCT combiner before the broadcast probe
        t = t.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        t = t.join(ray.get(part_ref), keys=["l_partkey"],
                   right_keys=["p_partkey"], join_type="inner")
        key = [
            f"{b}\x1f{ty}\x1f{s}\x1f{k}"
            for b, ty, s, k in zip(
                t.column("p_brand").to_pylist(),
                t.column("p_type").to_pylist(),
                t.column("p_size").to_pylist(),
                t.column("l_suppkey").to_pylist(),
            )
        ]
        h = hash62_batch(key)
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "p_type": t.column("p_type"),
                "p_size": t.column("p_size"),
                "l_suppkey": t.column("l_suppkey"),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
        c = (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return c

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "p_brand": g.column("p_brand"),
                "p_type": g.column("p_type"),
                "p_size": pc.cast(g.column("p_size"), pa.int64()),
                "supplier_cnt": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_suppkey"],
            )
        )
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |brand x type x size| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def promo_part_suppliers(sf_dir: str, token: str = "widget"):
    """Above-average suppliers of one part family (TPC-H Q20 shape): per
    supplier, total shipped quantity of parts whose name contains a token;
    keep suppliers above HALF the mean per-supplier total (integer-exact:
    2 * qty * n_suppliers > total). The availqty>half-of-shipped predicate
    of Q20 becomes a share-of-mean predicate — this schema has no partsupp.

    Scale shape: the token-filtered part sliver broadcasts once; lineitem
    combines per-suppkey quantity partials inside map_batches; the
    per-supplier fold is bounded by the supplier domain (|suppliers| <<
    |lineitem|, the same bound supplier_hhi documents); mean + filter run
    in the single-partition finish; the supplier-name hop is a second tiny
    broadcast probe.

    Output: (s_name, qty_sum).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    keep = pc.match_substring(part.column("p_name"), token)
    pk = pa.table(
        {"p_partkey": pc.cast(part.column("p_partkey"), pa.int64())}
    ).filter(keep)
    pk_ref = ray.put(pk)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    sup = pa.table(
        {
            "s_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_name": sup.column("s_name"),
        }
    )
    sup_ref = ray.put(sup)

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch.column("l_quantity").to_numpy() + 0.5).astype(
            np.int64
        )
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "qty": pa.array(qty),
            }
        ).join(ray.get(pk_ref), keys=["l_partkey"],
               right_keys=["p_partkey"], join_type="inner")
        return t.group_by("l_suppkey").aggregate([("qty", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("l_suppkey").aggregate([("qty_sum", "sum")])
        q = g.column("qty_sum_sum").to_numpy()
        n = len(q)
        if n == 0:
            return pa.table({"s_name": pa.array([], pa.string()),
                             "qty_sum": pa.array([], pa.int64())})
        total = int(q.sum())  # Python int — no int64 product headroom risk
        keep = np.array([2 * int(v) * n > total for v in q])
        kept = g.filter(pa.array(keep)).join(
            ray.get(sup_ref), keys=["l_suppkey"], right_keys=["s_suppkey"],
            join_type="inner",
        )
        return pa.table(
            {
                "s_name": kept.column("s_name"),
                "qty_sum": pc.cast(kept.column("qty_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_suppkey", "l_quantity"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |suppliers| rows per block
        .map_batches(finish, batch_format="pyarrow")
    )


_SHIP_MODES = ("REG AIR", "RAIL", "TRUCK")


def shipmode_priority_matrix(sf_dir: str, late_days: int = 45,
                             num_partitions: int | None = None):
    """Late-shipment mode x priority matrix (TPC-H Q12 shape): lineitems
    shipped more than ``late_days`` after their order's date, split by a
    derived ship mode (l_linenumber % 3 — this schema has no shipmode
    column) and by high ('1-URGENT'/'2-HIGH') vs low priority.

    Scale shape: lineitem combines per (orderkey, mode, ship_day) inside
    map_batches before the ONE native hash join with the pruned orders
    projection (Q12's join); the late predicate is vectorized post-join
    and the matrix folds on its bounded |modes| x 2 domain.

    Output: (ship_mode, high_line_count, low_line_count) — late lines only.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions, agg_args = _multi_join_args(
        _join_partitions(num_partitions)
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("l_shipdate")
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        mode = batch.column("l_linenumber").to_numpy().astype(np.int64) % 3
        t = pa.table(
            {
                "k": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "mode": pa.array(mode),
                "ship_day": pa.array(day),
                "n": pa.array(np.ones(len(day), np.int64)),
            }
        )
        return t.group_by(["k", "mode", "ship_day"]).aggregate([("n", "sum")])

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_shipdate"],
        )
    ).map_batches(li_partial, batch_format="pyarrow")

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_day": pa.array(
                    t.column("o_orderdate")
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype(np.int64)
                ),
                "high": pc.cast(
                    pc.is_in(
                        t.column("o_orderpriority"),
                        value_set=pa.array(["1-URGENT", "2-HIGH"]),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("k",),
        right_on=("o_orderkey",),
        aggregator_ray_remote_args=agg_args,
    )

    def late_partial(t: pa.Table) -> pa.Table:
        late = (
            pc.cast(t.column("ship_day"), pa.int64()).to_numpy()
            - pc.cast(t.column("o_day"), pa.int64()).to_numpy()
        ) > late_days
        mode = pc.cast(t.column("mode"), pa.int64()).to_numpy()[late]
        n = pc.cast(t.column("n_sum"), pa.int64()).to_numpy()[late]
        high = pc.cast(t.column("high"), pa.int64()).to_numpy()[late]
        hi = np.zeros(3, np.int64)
        lo = np.zeros(3, np.int64)
        np.add.at(hi, mode, n * high)
        np.add.at(lo, mode, n * (1 - high))
        return pa.table(
            {
                "mode": pa.array(np.arange(3, dtype=np.int64)),
                "hi": pa.array(hi),
                "lo": pa.array(lo),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("mode").aggregate([("hi", "sum"), ("lo", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("mode", "ascending")])
        g = g.take(idx)
        names = pa.array(
            [_SHIP_MODES[m] for m in g.column("mode").to_pylist()]
        )
        out = pa.table(
            {
                "ship_mode": names,
                "high_line_count": pc.cast(g.column("hi_sum"), pa.int64()),
                "low_line_count": pc.cast(g.column("lo_sum"), pa.int64()),
            }
        )
        # a mode with no late lines does not appear in the SQL GROUP BY
        return out.filter(
            pc.greater(
                pc.add(out.column("high_line_count"),
                       out.column("low_line_count")),
                0,
            )
        )

    return (
        joined.map_batches(late_partial, batch_format="pyarrow")
        .repartition(1)  # 3 mode rows per block
        .map_batches(finish, batch_format="pyarrow")
    )


def part_value_share(sf_dir: str):
    """High-value parts (TPC-H Q11 shape): per-part total lineitem value
    (extendedprice cents), keeping parts worth more than 1.5x the mean
    per-part value (integer-exact: 2 * value * n_parts > 3 * total) — Q11's
    have-a-minimum-share-of-global-value structure with lineitem standing
    in for partsupp.

    Scale shape: per-partkey partials combine inside map_batches; the
    per-part fold is one hash groupby; the global total is a driver-side
    SCALAR (``Dataset.sum``) broadcast into the filter — no second
    shuffle, and only the tiny above-threshold survivor set leaves the
    final filter.

    Output: (l_partkey, value_cents), survivors only.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                "v": pa.array(_cents(batch.column("l_extendedprice"))),
            }
        )
        return t.group_by("l_partkey").aggregate([("v", "sum")])

    per_part = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_extendedprice"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("v_sum", alias_name="value_cents"))
        .materialize()  # reused for the scalar total AND the filter pass
    )

    total = int(per_part.sum("value_cents"))
    n_parts = int(per_part.count())

    # exact integer predicate: for integer v, 2*v*n > 3*total is
    # equivalent to v > floor(3*total / (2*n)) whether or not 2n divides
    # 3*total — the threshold is a Python int, so no per-row product and
    # no int64 overflow regardless of corpus value totals
    thresh = (3 * total) // (2 * n_parts) if n_parts else 0

    def keep(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column("value_cents"), pa.int64())
        return pa.table(
            {
                "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "value_cents": v,
            }
        ).filter(pc.greater(v, thresh))

    return per_part.map_batches(keep, batch_format="pyarrow")


def order_burst_counts(sf_dir: str, window_days: int = 30,
                       num_buckets: int = 64):
    """Per-order BURST count — a self RANGE JOIN: for every order, how many
    OTHER orders the same customer placed within ±``window_days`` of it,
    reduced to a histogram (burst_count -> n_orders). The range-join shape
    (each row probes an interval of its own table) is what order-velocity
    fraud checks and demand-spike detectors run; it is not expressible as
    an equi-join.

    Scale shape: ONE hash(custkey) shuffle, then per bucket a single
    vectorized pass — rows are packed into one sorted int64 key
    (custkey << 31 | seconds-since-bucket-min, range-asserted) so BOTH
    window edges per row come from two np.searchsorted calls against the
    bucket's own sorted keys; no per-customer Python, no pairwise
    materialization (the count is hi-lo-1, the matching rows are never
    built). The histogram is pre-counted per bucket (np.unique) so the
    final shuffle moves one row per (bucket, burst value).

    Window semantics are integer-exact: both sides compare
    abs(epoch-second delta) <= window_days*86400 inclusive, so the DuckDB
    date_diff('second', ...) oracle matches bit-for-bit.

    Output: (burst_count, n_orders), both int64.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    win_s = np.int64(window_days) * 86400

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        bucket = np.abs((ck * np.int64(2654435761)) % np.int64(num_buckets))
        sec = batch.column("o_orderdate").cast(pa.timestamp("us")).to_numpy()
        sec = sec.astype("datetime64[us]").astype(np.int64) // 1_000_000
        return pa.table(
            {"ck": pa.array(ck), "sec": pa.array(sec),
             "bucket": pa.array(bucket)}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy()
        sec = g["sec"].to_numpy()
        rel = sec - sec.min()
        # packed-key headroom: rel spans the bucket's date range in seconds
        # (TPC-H ~7 years ~ 2.2e8); the window probe adds win_s more
        assert rel.max() + win_s < np.int64(1) << 31, "date range too wide for pack"
        key = (ck << 31) | rel
        key.sort()
        kq = (ck << 31) + rel
        lo = np.searchsorted(key, (ck << 31) + np.maximum(rel - win_s, 0), "left")
        hi = np.searchsorted(key, kq + win_s, "right")
        burst = hi - lo - 1
        vals, cnts = np.unique(burst, return_counts=True)
        return pd.DataFrame(
            {"burst_count": vals.astype(np.int64),
             "n_orders": cnts.astype(np.int64)}
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
    )
    agg = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("burst_count")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "burst_count": pc.cast(t.column("burst_count"), pa.int64()),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def theil_sen_trend(sf_dir: str, num_partitions: int | None = None):
    """Theil–Sen robust trend of monthly revenue per nation — the median of
    all pairwise month-to-month slopes. Unlike the OLS terms
    (``revenue_trend``), the estimator tolerates ~29% outlier months
    (one promo blowout month doesn't bend the trend), which is why it's
    the standard robust drift detector for revenue series.

    Exactness: the slope is kept as an integer RATIONAL (num = revenue
    delta in cents, den = month delta); pairs are ordered by
    (num/den as float64, num, den) — both sides compute the identical
    IEEE-754 division, and the integer tiebreak pins ties — and the LOWER
    median pair (index (n_pairs-1)//2) is emitted, so the output never
    contains a derived float.

    Scale shape: orders partial-agg per (custkey, month) inside batches,
    one hash join to customer, nation hop broadcast, groupby
    (nation, month) sum — then the pair enumeration runs per NATION GROUP
    over ~O(months) rows (bounded by the calendar, not the corpus), so
    the quadratic step is over at most a few thousand pairs per group.

    Output: (n_name, n_months, n_pairs, med_num_cents, med_den_months);
    nations with a single month have no pairs and are omitted.
    """
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    def ord_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.timestamp("us"))
        yr = pc.year(ts).to_numpy().astype(np.int64)
        mo = pc.month(ts).to_numpy().astype(np.int64)
        t = pa.table(
            {
                "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "m": pa.array(yr * 12 + mo - 1),
                "rev": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by(["o_custkey", "m"]).aggregate([("rev", "sum")])

    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
    ).map_batches(ord_partial, batch_format="pyarrow")

    cust = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = pa.table(
        {
            "c_nationkey": pc.cast(nat.column("n_nationkey"), pa.int64()),
            "n_name": pc.cast(nat.column("n_name"), pa.string()),
        }
    )
    nat_ref = ray.put(nat.replace_schema_metadata(None))

    def nation_partial(batch: pa.Table) -> pa.Table:
        dim = ray.get(nat_ref)
        t = pa.table(
            {
                "c_nationkey": batch.column("c_nationkey"),
                "m": pc.cast(batch.column("m"), pa.int64()),
                "rev": pc.cast(batch.column("rev_sum"), pa.int64()),
            }
        ).join(dim, keys="c_nationkey", join_type="inner")
        return t.group_by(["n_name", "m"]).aggregate([("rev", "sum")])

    monthly = (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby(["n_name", "m"])
        .aggregate(Sum("rev_sum", alias_name="rev"))
    )

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        m = g["m"].to_numpy().astype(np.int64)
        r = g["rev"].to_numpy().astype(np.int64)
        order = np.argsort(m, kind="mergesort")
        m, r = m[order], r[order]
        n = len(m)
        if n < 2:
            return pd.DataFrame(
                {"n_name": pd.Series([], dtype=object),
                 "n_months": pd.Series([], dtype=np.int64),
                 "n_pairs": pd.Series([], dtype=np.int64),
                 "med_num_cents": pd.Series([], dtype=np.int64),
                 "med_den_months": pd.Series([], dtype=np.int64)}
            )
        iu, ju = np.triu_indices(n, k=1)
        num = r[ju] - r[iu]
        den = m[ju] - m[iu]
        ratio = num.astype(np.float64) / den.astype(np.float64)
        sel = np.lexsort((den, num, ratio))[(len(num) - 1) // 2]
        return pd.DataFrame(
            {
                "n_name": [g["n_name"].iloc[0]],
                "n_months": [n],
                "n_pairs": [len(num)],
                "med_num_cents": [int(num[sel])],
                "med_den_months": [int(den[sel])],
            }
        )

    return monthly.groupby("n_name").map_groups(
        per_nation, batch_format="pandas"
    )


def skyline_parts(sf_dir: str):
    """2-D skyline (Pareto frontier) over the part catalog: every part for
    which no other part is at-least-as-cheap AND at-least-as-large with one
    strict improvement (minimize p_retailprice, maximize p_size). The
    classic "undominated offers" query — a naive engine answers it with a
    quadratic NOT EXISTS; here it is the textbook distributed skyline:
    local skylines per block, then one exact merge pass.

    Scale shape (zero shuffles): each block's local skyline is a SUPERSET
    filter — a globally undominated row is undominated in its own block, so
    dropping block-dominated rows loses nothing — and collapses a block to
    O(distinct prices on its frontier) rows. The survivors concatenate
    through ``repartition(1)`` (frontier-scale, not corpus-scale) and the
    same kernel run once more is exact. Ties are kept: parts with identical
    (price, size) on the frontier all survive, matching the
    strict-dominance oracle.

    Kernel: lexsort by (price asc, size desc); within an equal-price group
    only rows equal to the group-max size survive; across groups a prefix
    running-max of group-max size drops anything a strictly-cheaper group
    already beats. O(n log n), fully vectorized.

    Output: (p_partkey, price_cents, p_size) — all int64.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def _skyline_np(key: np.ndarray, price: np.ndarray, size: np.ndarray):
        order = np.lexsort((-size, price))
        key, price, size = key[order], price[order], size[order]
        new_group = np.r_[True, price[1:] != price[:-1]]
        gid = np.cumsum(new_group) - 1
        group_max = size[new_group]            # size desc within each group
        best_before = np.r_[np.iinfo(np.int64).min,
                            np.maximum.accumulate(group_max)[:-1]]
        keep = (size == group_max[gid]) & (size > best_before[gid])
        return key[keep], price[keep], size[keep]

    def _pack(key, price, size) -> pa.Table:
        return pa.table(
            {"p_partkey": pa.array(key, type=pa.int64()),
             "price_cents": pa.array(price, type=pa.int64()),
             "p_size": pa.array(size, type=pa.int64())}
        )

    def local_skyline(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _pack([], [], [])
        return _pack(*_skyline_np(
            pc.cast(batch.column("p_partkey"), pa.int64()).to_numpy(),
            np.asarray(_cents(batch.column("p_retailprice")), dtype=np.int64),
            pc.cast(batch.column("p_size"), pa.int64()).to_numpy(),
        ))

    def merge_skyline(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _pack([], [], [])
        return _pack(*_skyline_np(
            batch.column("p_partkey").to_numpy(),
            batch.column("price_cents").to_numpy(),
            batch.column("p_size").to_numpy(),
        ))

    parts = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_retailprice", "p_size"])
    )
    return (
        parts.map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_skyline, batch_format="pyarrow")
    )


def km_repeat_terms(sf_dir: str):
    """Kaplan–Meier survival TERMS for time-to-repeat-purchase: per
    distinct duration d (days from a customer's first order date to their
    second DISTINCT order date), the count of repeat events at d, of
    right-censored customers at d (single-date customers, censored at the
    corpus's last order date), and the at-risk count (customers whose
    duration >= d). The retention readout marketing actually uses — the
    survival curve itself is the running product of
    (1 - n_event/n_at_risk), assembled from these exact integers by the
    caller.

    Scale shape: per-batch combiner keeps each customer's two smallest
    DISTINCT order dates (all KM needs), one customer groupby merges
    partials with the same two-smallest fold, durations count-compress
    per (duration, event) cell inside batches, and the at-risk suffix-sum
    folds on the driver over the calendar-bounded compressed table.

    Output: (d_days, n_event, n_censored, n_at_risk) — all int64.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    SENT = np.iinfo(np.int64).max

    def two_smallest(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        day = (
            batch.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy()
            // 86_400_000_000
        )
        order = np.lexsort((day, ck))
        ck, day = ck[order], day[order]
        # distinct (custkey, day), sorted: first row per key = d1, next = d2
        first = np.r_[True, (ck[1:] != ck[:-1]) | (day[1:] != day[:-1])]
        ck, day = ck[first], day[first]
        newk = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.flatnonzero(newk)
        cnt = np.diff(np.r_[starts, len(ck)])
        d1 = day[starts]
        d2 = np.where(cnt > 1, day[np.minimum(starts + 1, len(day) - 1)],
                      SENT)
        return pa.table(
            {"o_custkey": pa.array(ck[starts]),
             "d1": pa.array(d1.astype(np.int64)),
             "d2": pa.array(d2.astype(np.int64))}
        )

    def merge_customer(g: "pd.DataFrame") -> "pd.DataFrame":
        # fold partials: global two smallest distinct days across batches
        days = np.unique(np.r_[g["d1"].to_numpy(), g["d2"].to_numpy()])
        days = days[days != SENT]
        d1 = int(days[0])
        d2 = int(days[1]) if len(days) > 1 else SENT
        return pd.DataFrame(
            {"o_custkey": [int(g["o_custkey"].iloc[0])],
             "d1": np.array([d1], dtype=np.int64),
             "d2": np.array([d2], dtype=np.int64)}
        )

    per_cust = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])
        )
        .map_batches(two_smallest, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(merge_customer, batch_format="pandas")
    )

    orders_max = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
    ).max("o_orderdate")
    horizon = int(pd.Timestamp(orders_max).value // 86_400_000_000_000)

    def dur_partial(batch: pa.Table) -> pa.Table:
        d1 = batch.column("d1").to_numpy()
        d2 = batch.column("d2").to_numpy()
        ev = (d2 != SENT).astype(np.int64)
        dur = np.where(ev == 1, d2 - d1, -d1 - 2)  # censored encodes -d1-2
        t = pa.table(
            {"dur": pa.array(dur.astype(np.int64)),
             "ev": pa.array(ev),
             "n": pa.array(np.ones(len(d1), dtype=np.int64))}
        )
        return t.group_by(["dur", "ev"]).aggregate([("n", "sum")])

    body = (
        per_cust.map_batches(dur_partial, batch_format="pyarrow")
        .to_pandas()  # count-compressed: calendar-bounded (dur, ev) cells
        .groupby(["dur", "ev"], as_index=False)["n_sum"].sum()
    )
    return _km_fold(
        body["dur"].to_numpy().astype(np.int64),
        body["ev"].to_numpy().astype(bool),
        body["n_sum"].to_numpy().astype(np.int64),
        horizon,
    )


def _km_fold(dur: np.ndarray, ev: np.ndarray, w: np.ndarray,
             horizon: int) -> pa.Table:
    """Driver-side calendar-bounded weighted fold shared with the test
    suite: decode censored encodings (-d1-2), build the KM table."""
    cen_dur = horizon - (-(dur[~ev] + 2))
    all_dur = np.r_[dur[ev], cen_dur]
    all_ev_w = np.r_[w[ev], np.zeros(int((~ev).sum()), dtype=np.int64)]
    all_w = np.r_[w[ev], w[~ev]]
    order = np.argsort(all_dur, kind="stable")
    all_dur = all_dur[order]
    all_ev_w, all_w = all_ev_w[order], all_w[order]
    starts = np.r_[0, np.flatnonzero(all_dur[1:] != all_dur[:-1]) + 1]
    uniq = all_dur[starts]
    n_event = np.add.reduceat(all_ev_w, starts)
    tot = np.add.reduceat(all_w, starts)
    n_cens = tot - n_event
    at_risk = tot[::-1].cumsum()[::-1]
    return pa.table(
        {
            "d_days": pa.array(uniq.astype(np.int64)),
            "n_event": pa.array(n_event.astype(np.int64)),
            "n_censored": pa.array(n_cens.astype(np.int64)),
            "n_at_risk": pa.array(at_risk.astype(np.int64)),
        }
    )


def spearman_rank_terms(sf_dir: str):
    """Exact integer Spearman rank-correlation TERMS between line-item
    quantity and extended price: every row is ranked with AVERAGE tie
    ranks doubled to stay integer (rx = 2*min_rank + ties - 1), and the
    six Pearson-on-ranks sums are emitted — rho is one consumer-side
    division. The monotone-association probe that Pearson
    (price_discount_corr_terms) misses when the relation is nonlinear.

    Scale shape: NO global sort. Both rank maps are count-compressed —
    pass 1 folds per-batch (value, count) histograms (distinct
    cents-quantized values are DOMAIN-bounded: ~50 quantities, price
    grid), min-ranks come from one cumsum over each sorted histogram,
    and the maps broadcast via ray.put for pass 2's searchsorted +
    per-batch term partials. The driver folds partials with PYTHON ints
    (sum(rx*ry) ~ 4n^3 wraps int64 near sf~1; per-batch partials stay
    under it, the fold must not), emitting BIGINT like the oracle's
    HUGEINT-internal/BIGINT-out convention.

    Output: one row (n, sum_rx, sum_ry, sum_rxy, sum_rxx, sum_ryy).
    """
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def hist_partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("l_quantity"))
        y = _cents(batch.column("l_extendedprice"))
        ux, cx = np.unique(x, return_counts=True)
        uy, cy = np.unique(y, return_counts=True)
        return pa.table(
            {
                "which": np.r_[np.zeros(len(ux), np.int64),
                               np.ones(len(uy), np.int64)],
                "val": np.r_[ux, uy],
                "cnt": np.r_[cx, cy].astype(np.int64),
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_quantity", "l_extendedprice"])
    ).materialize()  # scanned by both passes

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()  # domain-bounded distinct values
        .groupby(["which", "val"], as_index=False)["cnt"].sum()
    )

    def rank_map(h):
        h = h.sort_values("val")
        v = h["val"].to_numpy()
        c = h["cnt"].to_numpy().astype(np.int64)
        min_rank = 1 + np.r_[0, np.cumsum(c)[:-1]]
        return v, 2 * min_rank + c - 1  # doubled average tie rank

    vx, rx = rank_map(hist[hist["which"] == 0])
    vy, ry = rank_map(hist[hist["which"] == 1])
    maps_ref = ray.put((vx, rx, vy, ry))

    def term_partial(batch: pa.Table) -> pa.Table:
        vx_, rx_, vy_, ry_ = ray.get(maps_ref)
        a = rx_[np.searchsorted(vx_, _cents(batch.column("l_quantity")))]
        b = ry_[np.searchsorted(vy_, _cents(batch.column("l_extendedprice")))]
        return pa.table(
            {
                "n": pa.array([len(a)], pa.int64()),
                "sum_rx": pa.array([int(a.sum())], pa.int64()),
                "sum_ry": pa.array([int(b.sum())], pa.int64()),
                "sum_rxy": pa.array([int((a * b).sum())], pa.int64()),
                "sum_rxx": pa.array([int((a * a).sum())], pa.int64()),
                "sum_ryy": pa.array([int((b * b).sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(term_partial, batch_format="pyarrow").to_pandas()
    cols = ["n", "sum_rx", "sum_ry", "sum_rxy", "sum_rxx", "sum_ryy"]
    # Python-int fold: per-batch partials fit int64, the corpus total may not
    return pa.table(
        {c: pa.array([int(sum(int(v) for v in parts[c]))], pa.int64())
         for c in cols}
    )


def association_rules(sf_dir: str, min_co: int = 3, num_buckets: int = 64):
    """Market-basket ASSOCIATION RULES over parts: every unordered part
    pair co-occurring in >= ``min_co`` orders, with each side's own order
    support attached — the (support, confidence, lift) terms of classic
    frequent-itemset mining, integer-exact.

    Scale shape: batch-local distinct (orderkey, partkey) packs into one
    int64 and combines BEFORE the order-hash bucket shuffle; inside each
    bucket (orders are whole) a triangular expansion grouped by basket
    size emits pair partials — order width is bounded (7 lines in TPC-H),
    so expansion is O(rows x width), never quadratic in parts. The
    ``min_co`` HAVING cut runs distributed; only the surviving RULE SET
    (the miner's actual output, bounded by min_co) is collected. Side
    supports are then counted in a second pruned pass that filters to
    surviving parts via one broadcast set (ray.put once, read per task) —
    no |parts|-scale state ever reaches the driver.

    Output: (part_a, part_b, co_orders, n_orders_a, n_orders_b).
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    # partkey < 2^24 holds through TPC-H sf~80 (partkey = sf*200k); the
    # packed keys (orderkey*2^24 + partkey) and (a*2^24 + b) stay int64
    # for orderkey < 2^39. Both bounds asserted in the partials.
    SHIFT = np.int64(1) << np.int64(24)

    def read_distinct():
        return strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_partkey"],
            )
        )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy()
        p = pc.cast(batch.column("l_partkey"), pa.int64()).to_numpy()
        if len(k):
            assert k.max() < (1 << 39) and 0 <= p.min() \
                and p.max() < int(SHIFT), "packed key field overflow"
        ks = np.unique(k * SHIFT + p)
        bucket = np.abs(((ks // SHIFT) * np.int64(2654435761))
                        % np.int64(num_buckets))
        return pa.table({"ks": pa.array(ks), "bucket": pa.array(bucket)})

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(g["ks"].to_numpy())  # finish the (okey, part) dedup
        k = ks // SHIFT
        p = ks % SHIFT
        n = len(ks)
        first = np.r_[True, k[1:] != k[:-1]]
        seg = np.flatnonzero(first)
        sizes = np.diff(np.r_[seg, n])
        ai, bi = [], []
        for sz in np.unique(sizes):
            if sz < 2:
                continue
            starts = seg[sizes == sz]
            iu, ju = np.triu_indices(int(sz), k=1)
            ai.append((starts[:, None] + iu[None, :]).ravel())
            bi.append((starts[:, None] + ju[None, :]).ravel())
        if not ai:
            return pd.DataFrame({"pair": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        ai = np.concatenate(ai)
        bi = np.concatenate(bi)
        # parts are sorted within an order (np.unique), so p[ai] < p[bi]
        pair, c = np.unique(p[ai] * SHIFT + p[bi], return_counts=True)
        pbucket = np.abs((pair * np.int64(-7046029254386353131))
                         % np.int64(num_buckets))
        return pd.DataFrame({"pair": pair, "c": c.astype(np.int64),
                             "pbucket": pbucket})

    def cut_per_pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # every order-bucket partial of a pair lands here (pbucket keys on
        # the pair), so the sum is GLOBAL and the min_co HAVING cut is
        # exact — one sorted reduceat pass, no per-group Python
        pair = g["pair"].to_numpy()
        c = g["c"].to_numpy()
        order = np.argsort(pair, kind="stable")
        pair, c = pair[order], c[order]
        first = np.r_[True, pair[1:] != pair[:-1]]
        seg = np.flatnonzero(first)
        co = np.add.reduceat(c, seg)
        keep = co >= min_co
        return pd.DataFrame({"pair": pair[seg][keep],
                             "co": co[keep].astype(np.int64)})

    # Two exchanges: order-hash buckets make baskets whole; pair-hash
    # buckets make pair counts whole so min_co cuts distributed. What
    # survives IS the rule set — the miner's output, bounded by min_co.
    surv = (
        read_distinct()
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_per_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(cut_per_pair_bucket, batch_format="pandas")
        .take_all()  # rule-set scale (min_co-bounded), see docstring
    )
    pairs = np.array([r["pair"] for r in surv], dtype=np.int64)
    cos = np.array([r["co"] for r in surv], dtype=np.int64)
    order = np.argsort(pairs)
    pairs, cos = pairs[order], cos[order]
    part_a = pairs // SHIFT
    part_b = pairs % SHIFT
    surviving = np.unique(np.concatenate([part_a, part_b])) \
        if len(pairs) else np.empty(0, np.int64)
    surv_ref = ray.put(surviving)  # sorted int64 array, shipped once

    def support_partial(batch: pa.Table) -> pa.Table:
        want = ray.get(surv_ref)  # zero-copy object-store read per task
        k = pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy()
        p = pc.cast(batch.column("l_partkey"), pa.int64()).to_numpy()
        keep = np.isin(p, want) if len(want) else np.zeros(len(p), bool)
        ks = np.unique(k[keep] * SHIFT + p[keep])
        bucket = np.abs((ks * np.int64(-7046029254386353131))
                        % np.int64(num_buckets))
        return pa.table({"ks": pa.array(ks), "bucket": pa.array(bucket)})

    def support_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks = np.unique(g["ks"].to_numpy())  # finish the global dedup
        part, n = np.unique(ks % SHIFT, return_counts=True)
        return pd.DataFrame({"part": part, "n": n.astype(np.int64)})

    sup_rows = (
        read_distinct()
        .map_batches(support_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(support_per_bucket, batch_format="pandas")
        .take_all()  # surviving-parts scale (<= 2 x |rules|)
    )
    sup: dict[int, int] = {}
    for r in sup_rows:
        sup[int(r["part"])] = sup.get(int(r["part"]), 0) + int(r["n"])

    return pa.table(
        {
            "part_a": pa.array(part_a, pa.int64()),
            "part_b": pa.array(part_b, pa.int64()),
            "co_orders": pa.array(cos, pa.int64()),
            "n_orders_a": pa.array(
                [sup[int(x)] for x in part_a], pa.int64()),
            "n_orders_b": pa.array(
                [sup[int(x)] for x in part_b], pa.int64()),
        }
    )


def seasonal_naive_error(sf_dir: str):
    """Seasonal-naive forecast backtest: predict each day's order revenue
    with the revenue of the SAME WEEKDAY one week earlier, and fold the
    absolute error per weekday — the MASE-denominator terms every
    demand-forecast evaluation starts from, integer-exact in cents.

    Scale shape: the only exchange is a per-batch (day -> cents) combiner
    followed by a repartition(1) fold of the bounded date domain (~2.4k
    days for TPC-H, O(years) for any corpus) — no row-level shuffle, no
    window sort; the lag-7 alignment is one searchsorted on the folded
    date axis.

    Output: (weekday, n_days, sum_abs_err_cents) — weekday = epoch-day
    mod 7, days counted only when day-7 exists in the data.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    DAY_US = np.int64(86_400_000_000)

    def day_partial(batch: pa.Table) -> pa.Table:
        day = (batch.column("o_orderdate").to_numpy()
               .astype("datetime64[us]").astype(np.int64) // DAY_US)
        cents = _cents(batch.column("o_totalprice"))
        return (
            pa.table({"day": pa.array(day), "c": pa.array(cents)})
            .group_by("day")
            .aggregate([("c", "sum")])
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("c_sum", "sum")])
        day = pc.cast(g.column("day"), pa.int64()).to_numpy()
        c = pc.cast(g.column("c_sum_sum"), pa.int64()).to_numpy()
        order = np.argsort(day)
        day, c = day[order], c[order]
        pos = np.searchsorted(day, day - 7)
        has = (pos < len(day)) & (day[pos.clip(max=len(day) - 1)] == day - 7)
        err = np.abs(c[has] - c[pos[has]])
        wd = day[has] % 7
        out_wd = np.arange(7, dtype=np.int64)
        n_days = np.bincount(wd, minlength=7).astype(np.int64)
        # Python-int fold per weekday (7 groups): float64 bincount would
        # lose exactness past 2^53 total cents
        sums_exact = np.zeros(7, dtype=np.int64)
        for w in range(7):
            sums_exact[w] = sum(int(e) for e in err[wd == w])
        keep = n_days > 0
        return pa.table(
            {
                "weekday": pa.array(out_wd[keep]),
                "n_days": pa.array(n_days[keep]),
                "sum_abs_err_cents": pa.array(sums_exact[keep]),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderdate", "o_totalprice"],
            )
        )
        .map_batches(day_partial, batch_format="pyarrow")
        .repartition(1)  # bounded date domain (~2.4k days)
        .map_batches(finish, batch_format="pyarrow")
    )


def partition_boundaries(sf_dir: str, n_parts: int = 16,
                         bucket_cents: int = 1 << 16):
    """EXACT equi-depth range-partition boundaries for l_extendedprice —
    the split points a distributed sort / range-repartition of the column
    would use, computed WITHOUT sorting any data: pass 1 folds a coarse
    value-bucket histogram (metadata-scale), the driver locates each of
    the n_parts-1 target ranks' bucket + residual, pass 2 re-scans only
    those buckets for the exact order statistics. This generalizes
    weighted_median_price's two-pass selection to a full quantile vector —
    the planning step of every scale-out sort.

    Rule: boundary(q) = the ceil(q*N/n_parts)-th smallest value (1-based),
    q = 1..n_parts-1 — identical to a row_number window over the sorted
    column picking rank (q*N + n_parts - 1) // n_parts.

    Output: (q, boundary_cents), n_parts-1 rows.
    """
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def hist_partial(batch: pa.Table) -> pa.Table:
        b = _cents(batch.column("l_extendedprice")) // bucket_cents
        bb, n = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(bb), "n": pa.array(n.astype(np.int64))})

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_extendedprice"])
    )
    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("b")
        .sum("n")
        .to_pandas()  # O(|price range| / bucket_cents) rows — metadata scale
        .sort_values("b")
    )
    bb = hist["b"].to_numpy()
    cnt = hist["sum(n)"].to_numpy().astype(np.int64)
    cum = cnt.cumsum()
    total = int(cum[-1])
    # (bucket, residual rank within bucket) per boundary
    targets: list[tuple[int, int, int]] = []
    for q in range(1, n_parts):
        rank = (q * total + n_parts - 1) // n_parts
        i = int(np.searchsorted(cum, rank))
        before = int(cum[i - 1]) if i else 0
        targets.append((q, int(bb[i]), rank - before))
    needed = np.unique(np.array([b for _, b, _ in targets], np.int64))
    need_ref = ray.put(needed)

    def exact_partial(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        v = _cents(batch.column("l_extendedprice"))
        v = v[np.isin(v // bucket_cents, need)]
        vv, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vv), "n": pa.array(n.astype(np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("v").aggregate([("n", "sum")])
        v = pc.cast(g.column("v"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum"), pa.int64()).to_numpy()
        order = np.argsort(v)
        v, n = v[order], n[order]
        b = v // bucket_cents
        qs, bounds = [], []
        for q, bkt, resid in targets:
            m = b == bkt
            cum_b = n[m].cumsum()
            qs.append(q)
            bounds.append(int(v[m][np.searchsorted(cum_b, resid)]))
        return pa.table(
            {"q": pa.array(qs, pa.int64()),
             "boundary_cents": pa.array(bounds, pa.int64())}
        )

    return (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .repartition(1)  # O(|needed buckets| x bucket width) value rows
        .map_batches(finish, batch_format="pyarrow")
    )


def sole_late_supplier_blame(sf_dir: str, grace_days: int = 60,
                             num_partitions: int | None = None):
    """TPC-H Q21-shaped blame query (adapted to this schema's columns):
    for multi-supplier orders where EXACTLY ONE supplier shipped late
    (l_shipdate more than ``grace_days`` after o_orderdate), charge that
    supplier — aggregated to the supplier's nation. The
    exists/not-exists pair of the classic query becomes a per-order
    group qualification.

    Scale shape: lineitem JOIN orders is the native hash-shuffle big-big
    join; per-(order, supplier) lateness collapses in a per-batch
    combiner BEFORE the order-bucket shuffle; the per-order
    qualification is a vectorized bucket kernel; supplier -> nation is a
    dimension broadcast (ray.put once); bounded |nation| fold.

    Output: (n_name, n_blamed_orders).
    """
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
    )
    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
        )
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    supp_ref = ray.put(
        pa.table(
            {
                "sk": pc.cast(supp.column("s_suppkey"), pa.int64()),
                "nk": pc.cast(supp.column("s_nationkey"), pa.int64()),
            }
        )
    )
    nation_names = dict(
        zip(
            pc.cast(nation.column("n_nationkey"), pa.int64()).to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    )

    def late_partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        od = batch.column("o_orderdate").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        ok = pc.cast(batch.column("l_orderkey"), pa.int64()).to_numpy()
        t = pa.table(
            {
                "ok": pa.array(ok),
                "sk": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "late": pa.array((ship > od + grace_days).astype(np.int64)),
            }
        )
        g = t.group_by(["ok", "sk"]).aggregate([("late", "max")])
        okk = pc.cast(g.column("ok"), pa.int64()).to_numpy()
        return g.append_column(
            "kbucket", pa.array((okk * np.int64(2654435761)) % 256)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # per-batch partials may repeat (ok, sk): re-collapse, then
        # qualify orders with >= 2 suppliers and exactly one late
        d = g.groupby(["ok", "sk"], as_index=False)["late_max"].max()
        ns = d.groupby("ok")["sk"].nunique()
        late = d[d["late_max"] > 0]
        nl = late.groupby("ok")["sk"].nunique()
        blamed = late.groupby("ok")["sk"].min()
        qual = ns.index[(ns >= 2)].intersection(nl.index[nl == 1])
        sk = blamed[qual].to_numpy(np.int64)
        out = pd.DataFrame({"sk": sk})
        out["n"] = np.int64(1)
        return out.groupby("sk", as_index=False).agg(n=("n", "sum"))

    def finish(t: pa.Table) -> pa.Table:
        sliver = ray.get(supp_ref)
        g = t.group_by("sk").aggregate([("n", "sum")])
        sk = pc.cast(g.column("sk"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum"), pa.int64()).to_numpy()
        ssk = pc.cast(sliver.column("sk"), pa.int64()).to_numpy()
        snk = pc.cast(sliver.column("nk"), pa.int64()).to_numpy()
        order = np.argsort(ssk, kind="mergesort")
        pos = order[np.searchsorted(ssk[order], sk)]
        names = np.array(
            [nation_names[int(k)] for k in snk[pos]], dtype=object
        )
        out = pd.DataFrame({"n_name": names, "n_blamed_orders": n})
        out = out.groupby("n_name", as_index=False).agg(
            n_blamed_orders=("n_blamed_orders", "sum")
        )
        out = out.sort_values("n_name", kind="mergesort")
        return pa.table(
            {
                "n_name": pa.array(out["n_name"], pa.string()),
                "n_blamed_orders": pa.array(
                    out["n_blamed_orders"].to_numpy(np.int64)
                ),
            }
        )

    return (
        joined.map_batches(late_partial, batch_format="pyarrow")
        .groupby("kbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |suppliers-with-blame| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def frequent_brand_triples(sf_dir: str, min_support: int = 3):
    """Frequent 3-itemsets over per-order brand baskets: brand triples
    co-purchased in at least ``min_support`` orders — the apriori step
    beyond the pairwise association_rules op.

    Scale shape: part is a dimension broadcast (ray.put of the
    partkey -> brand code map, Arrow index_in probe per batch);
    per-order distinct brands collapse in a per-batch combiner before
    the one order-bucket shuffle; triple enumeration is per order over
    <= |brands-per-order| codes (tiny), and the triple domain is bounded
    by C(|brands|, 3) so the fold is bounded.

    Output: (brand_a, brand_b, brand_c, n_orders), support >= min_support.
    """
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    brands = sorted(set(part.column("p_brand").to_pylist()))
    brand_arr = pa.array(brands, type=pa.string())
    dim_ref = ray.put(
        pa.table(
            {
                "pk": pc.cast(part.column("p_partkey"), pa.int64()),
                "code": pc.cast(
                    pc.index_in(part.column("p_brand"), brand_arr),
                    pa.int64(),
                ),
            }
        )
    )

    def probe(batch: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        pk = pc.cast(batch.column("l_partkey"), pa.int64())
        code = pc.take(
            dim.column("code"),
            pc.index_in(pk, dim.column("pk").combine_chunks()),
        )
        ok = pc.cast(batch.column("l_orderkey"), pa.int64())
        t = pa.table({"ok": ok, "code": code})
        t = t.group_by(["ok", "code"]).aggregate([])  # block-local distinct
        okk = pc.cast(t.column("ok"), pa.int64()).to_numpy()
        return t.append_column(
            "kbucket", pa.array((okk * np.int64(2654435761)) % 256)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from itertools import combinations

        d = g.drop_duplicates(["ok", "code"]).sort_values(
            ["ok", "code"], kind="mergesort"
        )
        counts: dict = {}
        for _, grp in d.groupby("ok"):
            codes = grp["code"].to_numpy(np.int64)
            for tri in combinations(codes.tolist(), 3):
                counts[tri] = counts.get(tri, 0) + 1
        ks = sorted(counts)
        return pd.DataFrame(
            {
                "a": np.array([x[0] for x in ks], np.int64),
                "b": np.array([x[1] for x in ks], np.int64),
                "c": np.array([x[2] for x in ks], np.int64),
                "n": np.array([counts[x] for x in ks], np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["a", "b", "c"]).aggregate([("n", "sum")])
        g = g.filter(
            pc.greater_equal(g.column("n_sum"), min_support)
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("a", "ascending"), ("b", "ascending"),
                           ("c", "ascending")],
            )
        )
        names = np.array(brands, dtype=object)
        return pa.table(
            {
                "brand_a": pa.array(
                    names[pc.cast(g.column("a"), pa.int64()).to_numpy()],
                    pa.string(),
                ),
                "brand_b": pa.array(
                    names[pc.cast(g.column("b"), pa.int64()).to_numpy()],
                    pa.string(),
                ),
                "brand_c": pa.array(
                    names[pc.cast(g.column("c"), pa.int64()).to_numpy()],
                    pa.string(),
                ),
                "n_orders": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey"],
        )
    )
    return (
        li.map_batches(probe, batch_format="pyarrow")
        .groupby("kbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded C(|brands|,3) triple domain
        .map_batches(finish, batch_format="pyarrow")
    )


def parts_never_shipped(sf_dir: str, num_partitions: int | None = None):
    """Catalog dead-stock audit: per brand, how many parts never appear
    in any lineitem — the distributed ANTI-JOIN on the part side (the
    "which records have no usage" shape), with per-brand totals from the
    same dimension scan.

    Scale shape: the lineitem side reduces to block-local DISTINCT
    partkeys before Ray Data's native hash-shuffle ``left_anti`` join;
    brand totals are a bounded combiner off the part scan; both bounded
    tables union into one |brand| fold.

    Output: (p_brand, n_parts, n_never_shipped).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    part = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
    )
    li_keys = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
        )
    ).map_batches(
        lambda b: pa.table(
            {"l_partkey": pc.cast(b.column("l_partkey"), pa.int64())}
        ).group_by("l_partkey").aggregate([]),
        batch_format="pyarrow",
    )

    def part_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": pc.cast(batch.column("p_partkey"), pa.int64()),
                "p_brand": batch.column("p_brand"),
            }
        )

    never = part.map_batches(part_prep, batch_format="pyarrow").join(
        li_keys,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("p_partkey",),
        right_on=("l_partkey",),
    )

    def count_never(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_brand": batch.column("p_brand"),
                "n_parts": pa.array(np.zeros(batch.num_rows, np.int64)),
                "n_never_shipped": pa.array(
                    np.ones(batch.num_rows, np.int64)
                ),
            }
        )
        return t.group_by("p_brand").aggregate(
            [("n_parts", "sum"), ("n_never_shipped", "sum")]
        )

    def count_total(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_brand": batch.column("p_brand"),
                "n_parts": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_never_shipped": pa.array(
                    np.zeros(batch.num_rows, np.int64)
                ),
            }
        )
        return t.group_by("p_brand").aggregate(
            [("n_parts", "sum"), ("n_never_shipped", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("p_brand").aggregate(
            [("n_parts_sum", "sum"), ("n_never_shipped_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("p_brand", "ascending")]))
        return pa.table(
            {
                "p_brand": g.column("p_brand"),
                "n_parts": pc.cast(g.column("n_parts_sum_sum"), pa.int64()),
                "n_never_shipped": pc.cast(
                    g.column("n_never_shipped_sum_sum"), pa.int64()
                ),
            }
        )

    totals = part.map_batches(count_total, batch_format="pyarrow")
    return (
        never.map_batches(count_never, batch_format="pyarrow")
        .union(totals)
        .repartition(1)  # bounded |brand| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def brand_quartile_band_join(sf_dir: str):
    """Two-phase stats-then-probe BAND JOIN: phase 1 computes each
    brand's retail-price quartile boundaries from the part dimension
    (exact rank-based cut points: sorted index floor((n-1) * q)); phase
    2 classifies every lineitem into its part's brand quartile by a
    broadcast probe and folds revenue per (brand, quartile) — the
    "bucket facts by dimension statistics" shape that at 100 TB must
    broadcast the bounded stats table, never shuffle the facts twice.

    Scale shape: the dimension is read once (driver, bounded), the
    (partkey -> brand, cents) map and the |brand| x 3 boundary table are
    ray.put once; lineitem streams through one vectorized probe; bounded
    |brand| x 4 fold.

    Output: (p_brand, quartile, n_items, revenue_cents).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"],
    )
    brands = sorted(set(part.column("p_brand").to_pylist()))
    brand_arr = pa.array(brands, type=pa.string())
    code = pc.cast(pc.index_in(part.column("p_brand"), brand_arr),
                   pa.int64()).to_numpy()
    cents = _cents(part.column("p_retailprice"))
    # exact rank-based quartile boundaries per brand code
    bounds = np.zeros((len(brands), 3), np.int64)
    for b in range(len(brands)):
        v = np.sort(cents[code == b])
        n = len(v)
        bounds[b] = [v[(n - 1) * 1 // 4], v[(n - 1) * 2 // 4],
                     v[(n - 1) * 3 // 4]]
    dim_ref = ray.put(
        pa.table(
            {
                "pk": pc.cast(part.column("p_partkey"), pa.int64()),
                "code": pa.array(code),
                "cents": pa.array(cents),
            }
        )
    )
    bounds_ref = ray.put(bounds)

    def probe(batch: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        bnd = ray.get(bounds_ref)
        idx = pc.index_in(
            pc.cast(batch.column("l_partkey"), pa.int64()),
            dim.column("pk").combine_chunks(),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bcode = pc.cast(dim.column("code"), pa.int64()).to_numpy()[idx]
        pcents = pc.cast(dim.column("cents"), pa.int64()).to_numpy()[idx]
        b = bnd[bcode]
        quart = (
            (pcents > b[:, 0]).astype(np.int64)
            + (pcents > b[:, 1]).astype(np.int64)
            + (pcents > b[:, 2]).astype(np.int64)
        )
        rev = _cents(batch.column("l_extendedprice"))
        t = pa.table(
            {
                "code": pa.array(bcode),
                "quartile": pa.array(quart),
                "n_items": pa.array(np.ones(len(bcode), np.int64)),
                "revenue_cents": pa.array(rev),
            }
        )
        return t.group_by(["code", "quartile"]).aggregate(
            [("n_items", "sum"), ("revenue_cents", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["code", "quartile"]).aggregate(
            [("n_items_sum", "sum"), ("revenue_cents_sum", "sum")]
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("code", "ascending"), ("quartile", "ascending")],
            )
        )
        names = np.array(brands, dtype=object)
        return pa.table(
            {
                "p_brand": pa.array(
                    names[pc.cast(g.column("code"), pa.int64()).to_numpy()],
                    pa.string(),
                ),
                "quartile": pc.cast(g.column("quartile"), pa.int64()),
                "n_items": pc.cast(g.column("n_items_sum_sum"), pa.int64()),
                "revenue_cents": pc.cast(
                    g.column("revenue_cents_sum_sum"), pa.int64()
                ),
            }
        )

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice"],
        )
    )
    return (
        li.map_batches(probe, batch_format="pyarrow")
        .repartition(1)  # bounded |brand| x 4 rows
        .map_batches(finish, batch_format="pyarrow")
    )


def quantile_sketch_error_audit(sf_dir: str, bin_cents: int = 8192,
                                quantiles: tuple = (25, 50, 75, 90, 99)):
    """Quantile-sketch quality gate (the ann_recall pattern applied to
    quantiles): order totals are summarized into fixed ``bin_cents``
    histogram bins, each requested quantile is answered from the sketch
    (upper edge of the covering bin), and the audit reports the EXACT
    rank error of that answer in ppm — the error bound a planner needs
    before trusting sketch-served percentiles.

    Scale shape: per-batch bounded histogram combiner, one bounded fold;
    the rank of the sketch answer IS the histogram's own cumulative
    count at the covering bin, so no second scan is needed.

    Output: (q, approx_value_cents, target_rank, achieved_rank,
    rank_error_ppm).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("o_totalprice"))
        t = pa.table(
            {
                "bin": pa.array(cents // np.int64(bin_cents)),
                "n": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        return t.group_by("bin").aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("bin").aggregate([("n_sum", "sum")])
        g = g.take(pc.sort_indices(g, sort_keys=[("bin", "ascending")]))
        bins = pc.cast(g.column("bin"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_numpy()
        cum = np.cumsum(n)
        total = int(cum[-1])
        qs, vals, targets, achieved, errs = [], [], [], [], []
        for q in quantiles:
            target = (total - 1) * q // 100 + 1  # 1-based target rank
            i = int(np.searchsorted(cum, target))
            qs.append(q)
            vals.append(int((bins[i] + 1) * bin_cents - 1))
            targets.append(target)
            achieved.append(int(cum[i]))
            errs.append(
                abs(int(cum[i]) - target) * 1_000_000 // total
            )
        return pa.table(
            {
                "q": pa.array(np.array(qs, np.int64)),
                "approx_value_cents": pa.array(np.array(vals, np.int64)),
                "target_rank": pa.array(np.array(targets, np.int64)),
                "achieved_rank": pa.array(np.array(achieved, np.int64)),
                "rank_error_ppm": pa.array(np.array(errs, np.int64)),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |bins| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def stock_dip_audit(sf_dir: str, num_buckets: int = 256):
    """Running-balance sweep per part: lineitems replay in ship order
    (returns subtract, shipments add) and the audit reports, per brand,
    how many parts ever dip to a negative running balance plus the final
    balance mass — the inventory-consistency scan that needs a per-key
    ORDERED prefix sum, not just an aggregate.

    Scale shape: one hash(part) bucket shuffle of light columns; the
    per-bucket kernel sorts once by (part, shipdate, orderkey,
    linenumber) and takes ONE cumsum with per-part rebasing (vectorized
    via the subtract-offset trick, no per-part Python loop); brand comes
    from a ray.put dimension broadcast; bounded |brand| fold.

    Output: (p_brand, n_parts, n_dip_parts, final_balance_sum).
    """
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    brands = sorted(set(part.column("p_brand").to_pylist()))
    brand_arr = pa.array(brands, type=pa.string())
    dim_ref = ray.put(
        pa.table(
            {
                "pk": pc.cast(part.column("p_partkey"), pa.int64()),
                "code": pc.cast(
                    pc.index_in(part.column("p_brand"), brand_arr),
                    pa.int64(),
                ),
            }
        )
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        pk = pc.cast(batch.column("l_partkey"), pa.int64()).to_numpy()
        qty = np.floor(
            batch.column("l_quantity").to_numpy() + 0.5
        ).astype(np.int64)
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        signed = np.where(rf == "R", -qty, qty)
        day = batch.column("l_shipdate").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(pk),
                "day": pa.array(day),
                "ok": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "ln": pc.cast(batch.column("l_linenumber"), pa.int64()),
                "signed": pa.array(signed),
                "bucket": pa.array(
                    (pk * np.int64(2654435761)) % np.int64(num_buckets)
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pk", "day", "ok", "ln"], kind="mergesort")
        pk = g["pk"].to_numpy(np.int64)
        s = g["signed"].to_numpy(np.int64)
        cum = np.cumsum(s)
        # rebase each part's prefix: subtract the cumsum just before the
        # part's first row (vectorized per-part prefix sums)
        starts = np.r_[0, np.flatnonzero(pk[1:] != pk[:-1]) + 1]
        reps = np.diff(np.r_[starts, len(s)])
        part_base = np.repeat(np.r_[0, cum[starts[1:] - 1]], reps)
        bal = cum - part_base
        ends = np.r_[starts[1:], len(s)] - 1
        final = bal[ends]
        dip = (
            pd.Series(bal < 0).groupby(np.repeat(np.arange(len(starts)),
                                                 reps)).any()
        ).to_numpy()
        return pd.DataFrame(
            {
                "pk": pk[starts],
                "final": final,
                "dip": dip.astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        pk = pc.cast(t.column("pk"), pa.int64())
        code = pc.take(
            dim.column("code"),
            pc.index_in(pk, dim.column("pk").combine_chunks()),
        )
        g = pa.table(
            {
                "code": pc.cast(code, pa.int64()),
                "n_parts": pa.array(np.ones(t.num_rows, np.int64)),
                "n_dip_parts": pc.cast(t.column("dip"), pa.int64()),
                "final_balance_sum": pc.cast(t.column("final"), pa.int64()),
            }
        ).group_by("code").aggregate(
            [("n_parts", "sum"), ("n_dip_parts", "sum"),
             ("final_balance_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("code", "ascending")]))
        names = np.array(brands, dtype=object)
        return pa.table(
            {
                "p_brand": pa.array(
                    names[pc.cast(g.column("code"), pa.int64()).to_numpy()],
                    pa.string(),
                ),
                "n_parts": pc.cast(g.column("n_parts_sum"), pa.int64()),
                "n_dip_parts": pc.cast(g.column("n_dip_parts_sum"),
                                       pa.int64()),
                "final_balance_sum": pc.cast(
                    g.column("final_balance_sum_sum"), pa.int64()
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_quantity", "l_returnflag",
                         "l_shipdate", "l_orderkey", "l_linenumber"],
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # one row per part -> bounded after brand fold
        .map_batches(finish, batch_format="pyarrow")
    )


def sla_band_by_priority(sf_dir: str, num_partitions: int | None = None):
    """Order-level SLA banding with an ALL-ITEMS qualification: an order
    lands in the band of its WORST lineitem delay (ship minus order
    date: <=30, <=60, <=90, >90 days) — the whole-group max that a
    row-level filter cannot express, folded per priority.

    Scale shape: lineitem JOIN orders native hash join; the per-order
    max delay rides a per-batch (order, max) combiner then one bounded
    groupby; priority x 4 bands fold.

    Output: (o_orderpriority, band, n_orders).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    num_partitions = _join_partitions(num_partitions)

    li = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_shipdate"],
        )
    )
    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def delay_partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        od = batch.column("o_orderdate").to_numpy().astype(
            "datetime64[D]"
        ).astype(np.int64)
        t = pa.table(
            {
                "ok": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "prio": batch.column("o_orderpriority"),
                "delay": pa.array(ship - od),
            }
        )
        g = t.group_by(["ok", "prio"]).aggregate([("delay", "max")])
        okk = pc.cast(g.column("ok"), pa.int64()).to_numpy()
        return g.append_column(
            "kbucket", pa.array((okk * np.int64(2654435761)) % 256)
        )

    def band_fold(g):
        import pandas as pd

        # re-collapse per order across input blocks, then band
        d = g.groupby(["ok", "prio"], as_index=False)["delay_max"].max()
        delay = d["delay_max"].to_numpy(np.int64)
        band = (
            (delay > 30).astype(np.int64)
            + (delay > 60).astype(np.int64)
            + (delay > 90).astype(np.int64)
        )
        out = pd.DataFrame(
            {
                "o_orderpriority": d["prio"].to_numpy(),
                "band": band,
                "n_orders": np.ones(len(delay), np.int64),
            }
        )
        return out.groupby(["o_orderpriority", "band"],
                           as_index=False).agg(n_orders=("n_orders",
                                                         "sum"))

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderpriority", "band"]).aggregate(
            [("n_orders", "sum")]
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("o_orderpriority", "ascending"),
                           ("band", "ascending")],
            )
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "band": pc.cast(g.column("band"), pa.int64()),
                "n_orders": pc.cast(g.column("n_orders_sum"),
                                    pa.int64()),
            }
        )

    return (
        joined.map_batches(delay_partial, batch_format="pyarrow")
        .groupby("kbucket")  # 256 order buckets, NOT one group per order
        .map_groups(band_fold, batch_format="pandas")
        .repartition(1)  # bounded |priority| x 4 bands
        .map_batches(finish, batch_format="pyarrow")
    )


def nation_top_spenders_ties(sf_dir: str):
    """Per-nation top spender WITH TIES (RANK() = 1, not ROW_NUMBER):
    every customer tied at the nation's maximum total spend survives —
    the argmax-with-ties shape the packed-argmax trick cannot express,
    done as the two-pass broadcast pattern: (1) per-nation max spend is
    a bounded fold, (2) the bounded max table broadcasts into a filter
    pass over the same per-customer partials.

    Scale shape: per-batch per-customer spend combiner, one hash
    shuffle to per-customer totals, bounded |nation| max fold, broadcast
    filter — no sort, no row_number over the corpus.

    Output: (nationkey, c_custkey, spend_cents).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    cust = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        )
    )
    orders = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
        )
    )

    def spend_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "spend": pa.array(_cents(batch.column("o_totalprice"))),
            }
        )
        return t.group_by("o_custkey").aggregate([("spend", "sum")])

    joined = orders.map_batches(spend_partial, batch_format="pyarrow").join(
        cust.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
                    "nationkey": pc.cast(b.column("c_nationkey"),
                                         pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=4,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        # re-collapse per customer across blocks (order partials split)
        d = g.groupby(["o_custkey", "nationkey"], as_index=False)[
            "spend_sum"
        ].sum()
        return pd.DataFrame(
            {
                "c_custkey": d["o_custkey"].to_numpy(np.int64),
                "nationkey": d["nationkey"].to_numpy(np.int64),
                "spend_cents": d["spend_sum"].to_numpy(np.int64),
            }
        )

    def add_cbucket(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
        return batch.append_column(
            "cbucket", pa.array((ck * np.int64(2654435761)) % 256)
        )

    per_customer = (
        joined.map_batches(add_cbucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(per_cust, batch_format="pandas")
    )
    # pass 1: bounded per-nation max
    maxes = (
        per_customer.map_batches(
            lambda b: pa.table(
                {
                    "nationkey": b.column("nationkey"),
                    "mx": b.column("spend_cents"),
                }
            ).group_by("nationkey").aggregate([("mx", "max")]),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .max("mx_max")
        .to_pandas()  # bounded |nation| rows
    )
    import ray

    max_map = dict(
        zip(
            maxes["nationkey"].to_numpy(np.int64).tolist(),
            maxes["max(mx_max)"].to_numpy(np.int64).tolist(),
        )
    )
    max_ref = ray.put(max_map)

    def filt(batch: pa.Table) -> pa.Table:
        mm = ray.get(max_ref)
        nk = pc.cast(batch.column("nationkey"), pa.int64()).to_numpy()
        sp = pc.cast(batch.column("spend_cents"), pa.int64()).to_numpy()
        thr = np.array([mm[int(k)] for k in nk], np.int64)
        keep = sp == thr
        t = pa.table(
            {
                "nationkey": pa.array(nk[keep]),
                "c_custkey": pc.cast(batch.column("c_custkey"),
                                     pa.int64()).filter(pa.array(keep)),
                "spend_cents": pa.array(sp[keep]),
            }
        )
        return t

    def finish(t: pa.Table) -> pa.Table:
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[("nationkey", "ascending"),
                           ("c_custkey", "ascending")],
            )
        )

    return (
        per_customer.map_batches(filt, batch_format="pyarrow")
        .repartition(1)  # survivors: <= |nation| x ties rows
        .map_batches(finish, batch_format="pyarrow")
    )


def duplicate_line_audit(sf_dir: str):
    """Order integrity audit: lineitems that repeat the same
    (part, supplier) within one order are suspect double-entries; the
    audit histograms ALL orders by how many duplicated lines they carry
    (the 0 bucket counts clean orders, so the result is never empty).

    Scale shape: per-batch (order, part, supp) count combiner, one
    order-bucket shuffle, vectorized per-bucket dup counting, bounded
    histogram fold.

    Output: (n_dup_lines, n_orders) including n_dup_lines = 0.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "ok": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "pk": pc.cast(batch.column("l_partkey"), pa.int64()),
                "sk": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        g = t.group_by(["ok", "pk", "sk"]).aggregate([("n", "sum")])
        okk = pc.cast(g.column("ok"), pa.int64()).to_numpy()
        return g.append_column(
            "kbucket", pa.array((okk * np.int64(2654435761)) % 256)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["ok", "pk", "sk"], as_index=False)["n_sum"].sum()
        d["dups"] = d["n_sum"].to_numpy(np.int64) - 1
        per_order = d.groupby("ok")["dups"].sum()
        counts = per_order.value_counts()
        return pd.DataFrame(
            {
                "n_dup_lines": counts.index.to_numpy(np.int64),
                "n_orders": counts.to_numpy(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_dup_lines").aggregate([("n_orders", "sum")])
        g = g.take(
            pc.sort_indices(g, sort_keys=[("n_dup_lines", "ascending")])
        )
        return pa.table(
            {
                "n_dup_lines": pc.cast(g.column("n_dup_lines"), pa.int64()),
                "n_orders": pc.cast(g.column("n_orders_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_partkey", "l_suppkey"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("kbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded histogram
        .map_batches(finish, batch_format="pyarrow")
    )
