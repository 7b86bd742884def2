"""Corpus-layout and curation-planning operators — the "how do I lay
100 TB out on disk and stitch shards back together" family a lakehouse
ingest job runs after extraction: small-file compaction planning,
hash-shard skew audits, cross-document stitch detection (shard-boundary
continuation), broadcast nearest-hub assignment for data placement, and
the per-source corpus report card.

All outputs are integer-exact (counts / integer sums), matching this
repo's oracle convention: every value has an exact DuckDB oracle.

Reference parity note: the reference repo batches documents into fixed
API-sized groups (azure-pdf-parser ``split_into_batches``); these
operators generalize that planning step to byte-budgeted compaction and
skew-aware shard layout, re-expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tables import strip_schema_metadata


def _read(sf_dir: str, table: str, columns):
    import ray.data as rd

    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    )


def compaction_plan(sf_dir: str, target_chars: int = 4096):
    """Small-file compaction plan: within each source, documents ordered
    by doc_id are packed into output groups so each group starts a new
    file once the running byte budget crosses ``target_chars`` — group
    id = (running sum BEFORE this doc) // target. The plan itself is
    what a compaction job would execute; this query returns its audit.

    Scale shape: one hash(source) shuffle co-locates each source; the
    per-source kernel is a vectorized cumsum. Sources are the natural
    compaction unit (one directory per source at 100 TB); a source too
    large for one group-kernel would pre-split on doc_id ranges, which
    preserves the same group ids because the cumsum is order-prefix
    additive.

    Output: (source, group_id, n_docs, total_chars).
    """

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        sz = g["n_chars"].to_numpy(np.int64)
        before = np.cumsum(sz) - sz
        grp = before // np.int64(target_chars)
        out = pd.DataFrame(
            {"source": g["source"].to_numpy(), "group_id": grp, "sz": sz}
        )
        agg = out.groupby(["source", "group_id"], as_index=False).agg(
            n_docs=("sz", "size"), total_chars=("sz", "sum")
        )
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg

    return (
        _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .groupby("source")
        .map_groups(per_source, batch_format="pandas")
    )


def shard_skew_audit(sf_dir: str, n_shards: int = 64):
    """Hash-shard layout audit: every document is assigned a shard by a
    multiplicative hash of doc_id and the audit reports per-shard doc
    and byte totals — the skew readout a placement planner checks before
    committing a layout (a hot shard means repartitioning by a salted
    key instead).

    Scale shape: pure vectorized map + bounded |shards| fold.

    Output: (shard, n_docs, total_chars).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        sz = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        # id * 2654435761 wraps int64 above 2^31 ids (DuckDB promotes to
        # HUGEINT); assert the packed bound like the events packed keys do
        if len(ids):
            assert 0 <= ids.min() and ids.max() < (1 << 31), \
                "doc_id outside 31-bit multiplicative-hash domain"
        shard = (ids * np.int64(2654435761)) % np.int64(n_shards)
        t = pa.table(
            {
                "shard": pa.array(shard),
                "n_docs": pa.array(np.ones(len(ids), np.int64)),
                "total_chars": pa.array(sz),
            }
        )
        return t.group_by("shard").aggregate(
            [("n_docs", "sum"), ("total_chars", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("shard").aggregate(
            [("n_docs_sum", "sum"), ("total_chars_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("shard", "ascending")]))
        return pa.table(
            {
                "shard": pc.cast(g.column("shard"), pa.int64()),
                "n_docs": pc.cast(g.column("n_docs_sum_sum"), pa.int64()),
                "total_chars": pc.cast(
                    g.column("total_chars_sum_sum"), pa.int64()
                ),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |shards| rows per input block
        .map_batches(finish, batch_format="pyarrow")
    )


def doc_stitch_pairs(sf_dir: str):
    """Cross-document stitch detection: ordered pairs (a, b) where the
    last two whitespace words of a equal the first two words of b — the
    shard-boundary continuation probe a re-assembly job runs when
    documents may have been split across ingest shards. Counted per
    (source_a, source_b) WITHOUT ever materializing pairs: per stitch
    key k, pairs(sa, sb) = tails(k, sa) x heads(k, sb), minus the
    diagonal docs whose own tail equals their own head (a doc never
    stitches to itself). Documents with fewer than two words carry no
    key and never pair.

    Scale shape: vectorized RE2 key extraction, per-batch (key, source)
    count combiner, one hash(key) shuffle, per-key bounded cross of
    source-count vectors, bounded (source x source) fold. No pair
    blow-up: the join ships counts, not documents.

    Output: (source_a, source_b, n_pairs) with n_pairs > 0.
    """

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        src = batch.column("source")
        head = pc.struct_field(
            pc.extract_regex(txt, r"^(?P<k>\S+ \S+)"), "k"
        )
        tail = pc.struct_field(
            pc.extract_regex(txt, r"(?P<k>\S+ \S+)$"), "k"
        )
        n1 = pa.array(np.ones(len(txt), np.int64))
        parts = [
            pa.table(
                {
                    "key": head,
                    "source": src,
                    "ht": pa.array(["h"] * len(txt), pa.string()),
                    "n": n1,
                }
            ),
            pa.table(
                {
                    "key": tail,
                    "source": src,
                    "ht": pa.array(["t"] * len(txt), pa.string()),
                    "n": n1,
                }
            ),
        ]
        diag = pc.and_(
            pc.and_(pc.is_valid(head), pc.is_valid(tail)),
            pc.equal(head, tail),
        )
        d = pa.table({"key": head, "source": src}).filter(diag)
        if d.num_rows:
            parts.append(
                pa.table(
                    {
                        "key": d.column("key"),
                        "source": d.column("source"),
                        "ht": pa.array(["d"] * d.num_rows, pa.string()),
                        "n": pa.array(np.ones(d.num_rows, np.int64)),
                    }
                )
            )
        t = pa.concat_tables(parts)
        t = t.filter(pc.is_valid(t.column("key")))
        t = t.group_by(["key", "source", "ht"]).aggregate([("n", "sum")])
        kb = (
            pd.util.hash_pandas_object(
                t.column("key").to_pandas(), index=False
            ).to_numpy(np.uint64)
            % 256
        ).astype(np.int64)
        return t.append_column("kbucket", pa.array(kb))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # many keys per bucket: one vectorized key-equi merge of the
        # tail counts against the head counts (never one call per key)
        g = g.groupby(["key", "source", "ht"], as_index=False)[
            "n_sum"
        ].sum()
        tails = g[g["ht"] == "t"][["key", "source", "n_sum"]]
        heads = g[g["ht"] == "h"][["key", "source", "n_sum"]]
        diag = g[g["ht"] == "d"]
        m = tails.merge(heads, on="key", suffixes=("_a", "_b"))
        out = pd.DataFrame(
            {
                "source_a": m["source_a"].to_numpy(),
                "source_b": m["source_b"].to_numpy(),
                "n_pairs": (
                    m["n_sum_a"].to_numpy(np.int64)
                    * m["n_sum_b"].to_numpy(np.int64)
                ),
            }
        )
        if not diag.empty:
            d = pd.DataFrame(
                {
                    "source_a": diag["source"].to_numpy(),
                    "source_b": diag["source"].to_numpy(),
                    "n_pairs": -diag["n_sum"].to_numpy(np.int64),
                }
            )
            out = pd.concat([out, d], ignore_index=True)
        return out.groupby(["source_a", "source_b"], as_index=False).agg(
            n_pairs=("n_pairs", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["source_a", "source_b"]).aggregate(
            [("n_pairs", "sum")]
        )
        g = g.filter(pc.greater(g.column("n_pairs_sum"), 0))
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("source_a", "ascending"),
                    ("source_b", "ascending"),
                ],
            )
        )
        return pa.table(
            {
                "source_a": g.column("source_a"),
                "source_b": g.column("source_b"),
                "n_pairs": pc.cast(g.column("n_pairs_sum"), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("kbucket")  # 256 buckets, NOT one group per stitch key
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |source|^2 rows
        .map_batches(finish, batch_format="pyarrow")
    )


# Fixed placement hubs on the synthetic 1024x1024 integer grid: the
# "regions" a placement planner assigns customers to. Deterministic and
# replicated verbatim in the oracle.
_HUBS = [
    (0, 128, 128),
    (1, 128, 896),
    (2, 896, 128),
    (3, 896, 896),
    (4, 512, 512),
    (5, 128, 512),
    (6, 896, 512),
    (7, 512, 128),
]


def nearest_hub_assign(sf_dir: str):
    """Broadcast nearest-hub assignment: each customer maps to a point
    on a 1024x1024 integer grid (multiplicative hash of custkey) and is
    assigned the nearest of 8 fixed placement hubs by exact integer
    squared Euclidean distance (ties -> lowest hub id) — the
    data-placement primitive (route a record to its closest region)
    with the small side broadcast, never shuffled.

    Scale shape: hubs are a constant broadcast inside the map; pure
    vectorized argmin per batch + bounded |hubs| fold.

    Output: (hub_id, n_customers, sum_sqdist).
    """
    hx = np.array([h[1] for h in _HUBS], np.int64)
    hy = np.array([h[2] for h in _HUBS], np.int64)
    hid = np.array([h[0] for h in _HUBS], np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ck = pc.cast(batch.column("c_custkey"), pa.int64()).to_numpy()
        if len(ck):
            assert 0 <= ck.min() and ck.max() < (1 << 31), \
                "c_custkey outside 31-bit multiplicative-hash domain"
        x = (ck * np.int64(2654435761)) % np.int64(1024)
        y = (ck * np.int64(40503)) % np.int64(1024)
        d = (x[:, None] - hx[None, :]) ** 2 + (y[:, None] - hy[None, :]) ** 2
        best = np.argmin(d, axis=1)  # argmin takes FIRST min -> lowest id
        t = pa.table(
            {
                "hub_id": pa.array(hid[best]),
                "n_customers": pa.array(np.ones(len(ck), np.int64)),
                "sum_sqdist": pa.array(d[np.arange(len(ck)), best]),
            }
        )
        return t.group_by("hub_id").aggregate(
            [("n_customers", "sum"), ("sum_sqdist", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("hub_id").aggregate(
            [("n_customers_sum", "sum"), ("sum_sqdist_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("hub_id", "ascending")]))
        return pa.table(
            {
                "hub_id": pc.cast(g.column("hub_id"), pa.int64()),
                "n_customers": pc.cast(
                    g.column("n_customers_sum_sum"), pa.int64()
                ),
                "sum_sqdist": pc.cast(
                    g.column("sum_sqdist_sum_sum"), pa.int64()
                ),
            }
        )

    return (
        _read(sf_dir, "customer", ["c_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |hubs| rows per input block
        .map_batches(finish, batch_format="pyarrow")
    )


def source_report_card(sf_dir: str):
    """Per-source corpus report card: the dataset-card summary a
    curation job publishes per ingest source — document count, total
    characters, total whitespace tokens, distinct languages, and the
    longest document (in tokens).

    Scale shape: vectorized per-batch combiner (token counts via
    np.char.count), bounded |source x lang| partials, bounded fold.

    Output: (source, n_docs, total_chars, total_tokens, n_langs,
    max_tokens).
    """

    def partial(batch: pa.Table) -> pa.Table:
        # len(split(' ')) semantics: spaces + 1, including empty string -> 1
        toks = pc.add(
            pc.cast(pc.count_substring(batch.column("text"), " "),
                    pa.int64()),
            1,
        )
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
                "total_chars": pc.cast(batch.column("n_chars"), pa.int64()),
                "total_tokens": toks,
                "max_tokens": toks,
            }
        )
        return t.group_by(["source", "lang"]).aggregate(
            [
                ("n_docs", "sum"),
                ("total_chars", "sum"),
                ("total_tokens", "sum"),
                ("max_tokens", "max"),
            ]
        )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_docs_sum", "sum"),
            total_chars=("total_chars_sum", "sum"),
            total_tokens=("total_tokens_sum", "sum"),
            n_langs=("lang", "nunique"),
            max_tokens=("max_tokens_max", "max"),
        )
        g = g.sort_values("source", kind="mergesort")
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "total_chars": pa.array(g["total_chars"].to_numpy(np.int64)),
                "total_tokens": pa.array(
                    g["total_tokens"].to_numpy(np.int64)
                ),
                "n_langs": pa.array(g["n_langs"].to_numpy(np.int64)),
                "max_tokens": pa.array(g["max_tokens"].to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "documents", ["text", "source", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |source| x |lang| rows per block
        .map_batches(finish, batch_format="pyarrow")
    )


def quota_largest_remainder(sf_dir: str, total_quota: int = 100):
    """Largest-remainder proportional allocation: a fixed sampling
    budget of ``total_quota`` documents is split across sources in
    proportion to their sizes — floor shares first, then the leftover
    seats go to the largest remainders (ties to the lexicographically
    smaller source). The survey-sampling allocation that hash quotas
    cannot make exactly proportional.

    Scale shape: one bounded |source| count fold; the apportionment
    itself is driver-side arithmetic over the bounded table.

    Output: (source, n_docs, quota).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return t.group_by("source").aggregate([("n_docs", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n_docs_sum", "sum")])
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        n = pc.cast(g.column("n_docs_sum_sum"), pa.int64()).to_numpy()
        srcs = g.column("source").to_pylist()
        total = int(n.sum())
        base = (n * np.int64(total_quota)) // total
        rem = (n * np.int64(total_quota)) % total
        leftover = total_quota - int(base.sum())
        # seats to largest remainders; ties broken by source ascending
        order = np.lexsort((np.array(srcs, dtype=object), -rem))
        quota = base.copy()
        quota[order[:leftover]] += 1
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n_docs": pa.array(n),
                "quota": pa.array(quota),
            }
        )

    return (
        _read(sf_dir, "documents", ["source"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |source| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def negative_sampling_audit(sf_dir: str, k: int = 4,
                            num_partitions: int = 4):
    """Deterministic negative-sampling quality audit: every document
    draws ``k`` pseudo-random negatives (a fixed LCG over the dense id
    space) and the audit reports how often a negative collides with the
    anchor itself or lands in the anchor's own source — the
    contrastive-training sanity check (same-source negatives are often
    too easy or accidentally positive).

    Scale shape: negatives generate vectorized per batch; resolving each
    negative's source is a native hash join against the corpus (never a
    broadcast of the full table); bounded |source| fold.

    Output: (source, n_negatives, n_same_source, n_self).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    n_total = docs.count()

    def gen(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        src = np.asarray(
            batch.column("source").to_numpy(zero_copy_only=False),
            dtype=object,
        )
        anchors = np.repeat(ids, k)
        a_src = np.repeat(src, k)
        j = np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids))
        neg = (anchors * np.int64(48271)
               + j * np.int64(2654435761)) % np.int64(n_total)
        return pa.table(
            {
                "anchor_source": pa.array(a_src, pa.string()),
                "neg_id": pa.array(neg),
                "is_self": pa.array((neg == anchors).astype(np.int64)),
            }
        )

    negs = docs.map_batches(gen, batch_format="pyarrow")
    resolved = negs.join(
        docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                    "neg_source": b.column("source"),
                }
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("neg_id",),
        right_on=("doc_id",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        same = pc.cast(
            pc.equal(batch.column("anchor_source"),
                     batch.column("neg_source")),
            pa.int64(),
        )
        t = pa.table(
            {
                "source": batch.column("anchor_source"),
                "n_negatives": pa.array(
                    np.ones(batch.num_rows, np.int64)
                ),
                "n_same_source": same,
                "n_self": pc.cast(batch.column("is_self"), pa.int64()),
            }
        )
        return t.group_by("source").aggregate(
            [("n_negatives", "sum"), ("n_same_source", "sum"),
             ("n_self", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_negatives_sum", "sum"), ("n_same_source_sum", "sum"),
             ("n_self_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        return pa.table(
            {
                "source": g.column("source"),
                "n_negatives": pc.cast(g.column("n_negatives_sum_sum"),
                                       pa.int64()),
                "n_same_source": pc.cast(
                    g.column("n_same_source_sum_sum"), pa.int64()
                ),
                "n_self": pc.cast(g.column("n_self_sum_sum"), pa.int64()),
            }
        )

    return (
        resolved.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |source| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def shuffle_displacement_audit(sf_dir: str, bucket_shift: int = 22):
    """Global-shuffle quality audit: documents are re-ordered by a
    multiplicative hash (the deterministic pre-training shuffle) and the
    audit reports, per source, the total and maximum displacement
    |original position - shuffled position| — near-zero displacement
    means the "shuffle" left the corpus in ingest order (the correlation
    a training run must not see).

    Scale shape: the shuffled GLOBAL rank decomposes into bounded
    hash-range buckets — per-batch bucket histograms fold to one carry
    table of exclusive prefix counts (metadata-scale, broadcast in the
    closure), then one bucket shuffle assigns in-bucket ranks by sorted
    (hash, id). Original position is the dense doc_id itself.

    Output: (source, n_docs, sum_displacement, max_displacement).
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def hash_of(ids: np.ndarray) -> np.ndarray:
        return (ids * np.int64(2654435761)) % np.int64(1 << 31)

    def hist(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        hb = hash_of(ids) >> np.int64(bucket_shift)
        t = pa.table(
            {
                "hbucket": pa.array(hb),
                "n": pa.array(np.ones(len(ids), np.int64)),
            }
        )
        return t.group_by("hbucket").aggregate([("n", "sum")])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("hbucket")
        .sum("n_sum")
        .to_pandas()  # bounded: 2^31 >> bucket_shift buckets (512)
        .sort_values("hbucket")
    )
    buckets = counts["hbucket"].to_numpy(np.int64)
    carry = np.r_[np.int64(0), np.cumsum(
        counts["sum(n_sum)"].to_numpy(np.int64)
    )[:-1]]

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        h = hash_of(ids)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": batch.column("source"),
                "h": pa.array(h),
                "hbucket": pa.array(h >> np.int64(bucket_shift)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        b = int(g["hbucket"].iloc[0])
        base = carry[np.searchsorted(buckets, b)]
        rank = base + np.arange(len(g), dtype=np.int64)
        disp = np.abs(rank - g["doc_id"].to_numpy(np.int64))
        out = pd.DataFrame(
            {"source": g["source"].to_numpy(), "disp": disp}
        )
        agg = out.groupby("source", as_index=False).agg(
            n_docs=("disp", "size"),
            sum_displacement=("disp", "sum"),
            max_displacement=("disp", "max"),
        )
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_docs", "sum"), ("sum_displacement", "sum"),
             ("max_displacement", "max")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": pc.cast(g.column("n_docs_sum"), pa.int64()),
                "sum_displacement": pc.cast(
                    g.column("sum_displacement_sum"), pa.int64()
                ),
                "max_displacement": pc.cast(
                    g.column("max_displacement_max"), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |source| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def incremental_rebuild_plan(sf_dir: str, target_chars: int = 4096):
    """Incremental-materialization planning: given the CDC delta rule
    (documents with doc_id % 10 == 3 changed — the same derived delta
    upsert_merge uses), which byte-budget compaction groups are DIRTY
    and must rebuild? The ratio of dirty to total groups is the payoff
    readout of incremental recompute vs full rebuild.

    Scale shape: identical to compaction_plan — one hash(source)
    shuffle, vectorized cumsum group assignment — plus a per-group any()
    over the changed flag; bounded |source| fold.

    Output: (source, n_groups_total, n_groups_dirty, n_docs_changed).
    """

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        sz = g["n_chars"].to_numpy(np.int64)
        before = np.cumsum(sz) - sz
        grp = before // np.int64(target_chars)
        changed = (ids % 10 == 3)
        out = pd.DataFrame(
            {"group_id": grp, "changed": changed.astype(np.int64)}
        )
        agg = out.groupby("group_id")["changed"].agg(["max", "sum"])
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_groups_total": np.array([len(agg)], np.int64),
                "n_groups_dirty": np.array(
                    [int(agg["max"].sum())], np.int64
                ),
                "n_docs_changed": np.array(
                    [int(agg["sum"].sum())], np.int64
                ),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .groupby("source")
        .map_groups(per_source, batch_format="pandas")
    )
