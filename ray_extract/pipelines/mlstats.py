"""ML-statistics operators — the integer-exact sufficient statistics a
training-data pipeline computes before/while fitting models: mutual
information and chi-square contingency terms, feature-hashing collision
audits, normal-equation regression terms, and calibration (reliability
diagram) bins.

All outputs are INTEGER terms (counts / integer sums / decomposed
products), matching this repo's ``*_terms`` convention: the float
statistic is one driver-side expression away, but nothing lossy crosses
the wire and every value has an exact DuckDB oracle.
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


def _contingency(ds, col_a: str, col_b: str, names):
    """Shared kernel for bounded-domain contingency tables: per-batch
    combiner on (a, b), one bounded fold, marginals DERIVED from the
    folded joint (no second scan)."""
    a_out, b_out, n_xy, n_a, n_b, n_tot = names

    def partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "a": batch.column(col_a),
                    "b": batch.column(col_b),
                    "n": pa.array(np.ones(batch.num_rows, np.int64)),
                }
            )
            .group_by(["a", "b"])
            .aggregate([("n", "sum")])
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["a", "b"]).aggregate([("n_sum", "sum")])
        df = g.to_pandas()
        df = df.rename(columns={"n_sum_sum": "n"})
        ra = df.groupby("a")["n"].sum()
        rb = df.groupby("b")["n"].sum()
        tot = int(df["n"].sum())
        df = df.sort_values(["a", "b"], ignore_index=True)
        return pa.table(
            {
                a_out: pa.array(df["a"], pa.string()),
                b_out: pa.array(df["b"], pa.string()),
                n_xy: pa.array(df["n"].to_numpy(np.int64)),
                n_a: pa.array(ra[df["a"]].to_numpy(np.int64)),
                n_b: pa.array(rb[df["b"]].to_numpy(np.int64)),
                n_tot: pa.array(np.full(len(df), tot, np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # joint domain is |A| x |B| — bounded
        .map_batches(finish, batch_format="pyarrow")
    )


def mutual_information_terms(sf_dir: str):
    """Mutual-information sufficient statistics for the (lang, source)
    feature pair: the joint contingency count with both marginals and the
    grand total attached per cell — MI = sum n_xy/N * log(N*n_xy /
    (n_lang*n_source)) is one float expression over these integers.

    Scale shape: per-batch combiner on the bounded (lang, source) grid,
    one metadata-scale fold, marginals derived from the folded joint
    (zero extra passes).

    Output: (lang, source, n_xy, n_lang, n_source, n_total).
    """
    return _contingency(
        _read(sf_dir, "documents", ["lang", "source"]),
        "lang",
        "source",
        ("lang", "source", "n_xy", "n_lang", "n_source", "n_total"),
    )


def chi_square_terms(sf_dir: str):
    """Chi-square independence-test terms for order priority vs status:
    observed cell counts with row/column marginals and the grand total —
    expected(cell) = row*col/N and the statistic follow by one float
    expression.

    Output: (priority, status, observed, row_total, col_total,
    grand_total).
    """
    return _contingency(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]),
        "o_orderpriority",
        "o_orderstatus",
        ("priority", "status", "observed", "row_total", "col_total",
         "grand_total"),
    )


def feature_hash_collisions(sf_dir: str, n_buckets: int = 256):
    """Feature-hashing collision audit: the corpus vocabulary (distinct
    whitespace tokens) is hashed into ``n_buckets`` by an
    oracle-reproducible byte hash (len*37 + first_byte*101 + last_byte),
    and the readout is the bucket-load histogram — how many buckets carry
    1, 2, ... distinct features, i.e. the collision mass a hashed
    featurizer would silently merge.

    Scale shape: per-batch token dedup BEFORE the one exchange (keyed by
    bucket, so each group holds one bucket's candidate tokens); bucket
    loads then fold on an ``n_buckets``-bounded domain. Token bytes are
    inspected via the zero-copy flat-buffer view (functions/encodings.py
    flat_bytes) — no per-token Python in the hash.

    Output: (load, n_buckets).
    """
    from ..functions.encodings import flat_bytes

    def tokenize_partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            batch.column("text").combine_chunks(), pattern=" "
        )
        flat = pc.list_flatten(parts)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        toks = pc.unique(flat)
        data, offs = flat_bytes(toks)
        lens = offs[1:] - offs[:-1]
        first = data[offs[:-1]].astype(np.int64)
        last = data[offs[1:] - 1].astype(np.int64)
        bucket = (lens * 37 + first * 101 + last) % n_buckets
        return pa.table({"bucket": pa.array(bucket), "token": toks})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "load": [np.int64(g["token"].nunique())],
                "one": [np.int64(1)],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("load").aggregate([("one", "sum")])
        g = g.take(pc.sort_indices(g, sort_keys=[("load", "ascending")]))
        return pa.table(
            {
                "load": pc.cast(g.column("load"), pa.int64()),
                "n_buckets": pc.cast(g.column("one_sum"), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["text"])
        .map_batches(tokenize_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # n_buckets rows
        .map_batches(finish, batch_format="pyarrow")
    )


def regression_normal_terms(sf_dir: str):
    """Normal-equation sufficient statistics for the linear model
    price_cents ~ quantity + discount_pct over lineitem: X'X and X'y in
    exact integers. The y*y term would overflow int64 under summation
    (price_cents^2 ~ 1.2e14 per row), so it ships DECOMPOSED via
    y = yh*2^16 + yl: sum(yh*yh), sum(yh*yl), sum(yl*yl) — each bounded
    (yh < 2^8 for TPC-H prices) and recombinable as
    sum_yy = s_hh*2^32 + 2*s_hl*2^16 + s_ll with Python ints. Everything
    else fits int64 with >=10^3x headroom at sf1.

    Scale shape: one vectorized per-batch pass folding to a single
    12-column row; global fold is a repartition(1) reduce over
    one-row partials.

    Output: one row (n, sum_q, sum_d, sum_y, sum_qq, sum_qd, sum_dd,
    sum_qy, sum_dy, sum_yhyh, sum_yhyl, sum_ylyl).
    """
    from .relational import _cents

    COLS = ["n", "sum_q", "sum_d", "sum_y", "sum_qq", "sum_qd", "sum_dd",
            "sum_qy", "sum_dy", "sum_yhyh", "sum_yhyl", "sum_ylyl"]

    def partial(batch: pa.Table) -> pa.Table:
        q = pc.cast(batch.column("l_quantity"), pa.int64()).to_numpy()
        d = np.floor(
            batch.column("l_discount").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        y = _cents(batch.column("l_extendedprice"))
        yh, yl = y >> 16, y & 0xFFFF
        vals = [
            len(q), q.sum(), d.sum(), y.sum(), (q * q).sum(),
            (q * d).sum(), (d * d).sum(), (q * y).sum(), (d * y).sum(),
            (yh * yh).sum(), (yh * yl).sum(), (yl * yl).sum(),
        ]
        return pa.table(
            {c: pa.array([np.int64(v)]) for c, v in zip(COLS, vals)}
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: pa.array([int(pc.sum(t.column(c)).as_py())], pa.int64())
             for c in COLS}
        )

    return (
        _read(sf_dir, "lineitem",
              ["l_quantity", "l_discount", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # one-row partials
        .map_batches(finish, batch_format="pyarrow")
    )


def calibration_bins(sf_dir: str):
    """Reliability-diagram (calibration) bins: a deterministic score bin
    (n_chars % 10) against a real label predicate (document mentions
    'spark'), yielding per-bin totals and positives — the integer terms
    of expected-calibration-error.

    Scale shape: vectorized per-batch combiner + 10-bin bounded fold.

    Output: (bin, n, n_pos).
    """

    def partial(batch: pa.Table) -> pa.Table:
        b = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy() % 10
        pos = pc.match_substring(
            batch.column("text"), "spark"
        ).to_numpy(zero_copy_only=False)
        n = np.bincount(b, minlength=10).astype(np.int64)
        npos = np.bincount(b[pos], minlength=10).astype(np.int64)
        keep = n > 0
        bins = np.arange(10, dtype=np.int64)
        return pa.table(
            {
                "bin": pa.array(bins[keep]),
                "n": pa.array(n[keep]),
                "n_pos": pa.array(npos[keep]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("bin").aggregate([("n", "sum"), ("n_pos", "sum")])
        g = g.take(pc.sort_indices(g, sort_keys=[("bin", "ascending")]))
        return pa.table(
            {
                "bin": pc.cast(g.column("bin"), pa.int64()),
                "n": pc.cast(g.column("n_sum"), pa.int64()),
                "n_pos": pc.cast(g.column("n_pos_sum"), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["n_chars", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def spatial_grid_bin(sf_dir: str, cell_micro: int = 10_000_000):
    """Spatial grid partitioning terms: each document gets a
    deterministic point in OFFSET micro-degrees (lat in [0, 180e6),
    lon in [0, 360e6) — kept non-negative because DuckDB's ``//``
    truncates while numpy floors), binned into 10-degree grid cells,
    with per-cell counts, centroid sums, and how many points fall within
    a 30-degree square-distance radius of the grid center — the
    partition-pruning readout of a spatial join.

    Scale shape: pure vectorized map + bounded 18x36-cell fold.

    Output: (cell_lat, cell_lon, n_points, sum_lat, sum_lon, n_near).
    """
    CLAT, CLON = 90_000_000, 180_000_000
    R2 = (30_000_000) ** 2

    def partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        lat = (ids * 7_777_777) % 180_000_000
        lon = (ids * 12_345_679) % 360_000_000
        cl = lat // cell_micro
        cn = lon // cell_micro
        near = ((lat - CLAT) ** 2 + (lon - CLON) ** 2 <= R2).astype(np.int64)
        key = cl * 64 + cn
        order = np.argsort(key, kind="stable")
        k, lat, lon, near = key[order], lat[order], lon[order], near[order]
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        return pa.table(
            {
                "cell_lat": pa.array(k[starts] // 64),
                "cell_lon": pa.array(k[starts] % 64),
                "n_points": pa.array(np.diff(np.r_[starts, len(k)])
                                     .astype(np.int64)),
                "sum_lat": pa.array(np.add.reduceat(lat, starts)),
                "sum_lon": pa.array(np.add.reduceat(lon, starts)),
                "n_near": pa.array(np.add.reduceat(near, starts)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["cell_lat", "cell_lon"]).aggregate(
            [("n_points", "sum"), ("sum_lat", "sum"), ("sum_lon", "sum"),
             ("n_near", "sum")]
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("cell_lat", "ascending"),
                           ("cell_lon", "ascending")],
            )
        )
        return pa.table(
            {
                "cell_lat": pc.cast(g.column("cell_lat"), pa.int64()),
                "cell_lon": pc.cast(g.column("cell_lon"), pa.int64()),
                "n_points": pc.cast(g.column("n_points_sum"), pa.int64()),
                "sum_lat": pc.cast(g.column("sum_lat_sum"), pa.int64()),
                "sum_lon": pc.cast(g.column("sum_lon_sum"), pa.int64()),
                "n_near": pc.cast(g.column("n_near_sum"), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # 18x36 bounded cell domain
        .map_batches(finish, batch_format="pyarrow")
    )


def zorder_locality_audit(sf_dir: str, bucket_shift: int = 4):
    """Z-order (Morton) space-filling-curve audit: the spatial grid cells
    of spatial_grid_bin are bit-interleaved into a Morton key (6 bits per
    axis), and points are folded per z-bucket (key >> bucket_shift) with
    the count of DISTINCT cells each bucket covers — the locality readout
    that tells a layout planner how well curve-contiguous buckets map to
    spatially-contiguous cells. The oracle replays the interleave with
    explicit power-of-two arithmetic.

    Scale shape: pure vectorized map (bit ops) + bounded z-bucket fold.

    Output: (zbucket, n_points, n_cells).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        lat = (ids * 7_777_777) % 180_000_000
        lon = (ids * 12_345_679) % 360_000_000
        cl = lat // 10_000_000  # 0..17 (5 bits used, 6 allocated)
        cn = lon // 10_000_000  # 0..35 (6 bits)
        z = np.zeros(len(ids), np.int64)
        for b in range(6):
            z |= ((cl >> b) & 1) << (2 * b)
            z |= ((cn >> b) & 1) << (2 * b + 1)
        zb = z >> bucket_shift
        cell = cl * 64 + cn
        key = zb * 4096 + cell  # distinct (bucket, cell) pre-dedup
        order = np.argsort(z, kind="stable")
        zs = zb[order]
        starts = np.r_[0, np.flatnonzero(zs[1:] != zs[:-1]) + 1]
        ucells = np.unique(key)
        ub = ucells // 4096
        ub_u, ub_c = np.unique(ub, return_counts=True)
        n_pts = np.diff(np.r_[starts, len(zs)]).astype(np.int64)
        out_b = zs[starts]
        # align cell counts to out_b (both sorted unique bucket lists)
        cells = ub_c[np.searchsorted(ub_u, out_b)].astype(np.int64)
        return pa.table(
            {
                "zbucket": pa.array(out_b),
                "n_points": pa.array(n_pts),
                "n_cells": pa.array(cells),
                # distinct cells must re-dedup across batches: ship keys
                "cellkeys": pa.array(
                    [ucells[ub == b_].tolist() for b_ in out_b],
                    pa.list_(pa.int64()),
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        pts = df.groupby("zbucket")["n_points"].sum()
        cells = (
            df.explode("cellkeys").groupby("zbucket")["cellkeys"].nunique()
        )
        zb = np.array(sorted(pts.index), np.int64)
        return pa.table(
            {
                "zbucket": pa.array(zb),
                "n_points": pa.array(pts[zb].to_numpy(np.int64)),
                "n_cells": pa.array(cells[zb].to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # z-bucket x cell bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


def join_stats_audit(sf_dir: str):
    """Join-planner statistics for the orders JOIN lineitem key: per-side
    key counts, overlap, and exact fanout mass (sum over shared keys of
    n_left x n_right = the join's output cardinality) plus the worst
    single-key fanout — the stats a distributed planner consults before
    choosing broadcast vs shuffle and before salting hot keys.

    Scale shape: per-batch per-key count combiners on EACH side (nothing
    row-scale crosses the wire), one hash(key) shuffle of (key, side
    counts), vectorized per-key stats, bounded single-row fold.

    Output: one row (n_keys_left, n_keys_right, n_keys_both, n_left_only,
    n_right_only, join_rows, max_fanout).
    """

    def _partial(col: str, is_left: bool):
        def partial(batch: pa.Table) -> pa.Table:
            key = pc.cast(batch.column(col), pa.int64())
            one = pa.array(np.ones(batch.num_rows, np.int64))
            zero = pa.array(np.zeros(batch.num_rows, np.int64))
            t = pa.table(
                {
                    "key": key,
                    "nl": one if is_left else zero,
                    "nr": zero if is_left else one,
                }
            )
            g = t.group_by("key").aggregate([("nl", "sum"), ("nr", "sum")])
            kb = pc.cast(g.column("key"), pa.int64()).to_numpy()
            return g.append_column(
                "kbucket", pa.array((kb * np.int64(2654435761)) % 256)
            )

        return partial

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        nl = g.groupby("key")["nl_sum"].sum().to_numpy(np.int64)
        nr = g.groupby("key")["nr_sum"].sum().to_numpy(np.int64)
        both = (nl > 0) & (nr > 0)
        return pd.DataFrame(
            {
                "n_keys_left": [int((nl > 0).sum())],
                "n_keys_right": [int((nr > 0).sum())],
                "n_keys_both": [int(both.sum())],
                "n_left_only": [int(((nl > 0) & (nr == 0)).sum())],
                "n_right_only": [int(((nl == 0) & (nr > 0)).sum())],
                "join_rows": [int((nl[both] * nr[both]).sum())],
                "max_fanout": [
                    int((nl[both] * nr[both]).max()) if both.any() else 0
                ],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        cols = {}
        for c in t.column_names:
            arr = pc.cast(t.column(c), pa.int64())
            agg = pc.max(arr) if c == "max_fanout" else pc.sum(arr)
            cols[c] = pa.array([agg.as_py() or 0], pa.int64())
        return pa.table(cols)

    import ray.data as rd

    left = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        _partial("o_orderkey", True), batch_format="pyarrow"
    )
    right = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        _partial("l_orderkey", False), batch_format="pyarrow"
    )
    return (
        left.union(right)
        .groupby("kbucket")  # 256 buckets, NOT one group per key
        .map_groups(per_key, batch_format="pandas")
        .repartition(1)  # one stats row per key-bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def stratified_kfold_assign(sf_dir: str, k: int = 5):
    """Deterministic stratified k-fold assignment: within each language
    stratum documents are ranked by doc_id and dealt round-robin into k
    folds — every fold gets an equal share of every stratum (the
    cross-validation split that hash-based assignment cannot guarantee).

    Scale shape: one hash(lang) shuffle of LIGHT columns only (doc_id,
    lang, n_chars — never text); per-stratum kernel is a sort + arange.
    A stratum too large for one kernel pre-splits on doc_id ranges and
    offsets the round-robin by the prefix count, which this rule keeps
    exact because rank is order-prefix additive.

    Output: (lang, fold, n_docs, total_chars).
    """

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        fold = np.arange(len(g), dtype=np.int64) % np.int64(k)
        out = pd.DataFrame(
            {
                "lang": g["lang"].to_numpy(),
                "fold": fold,
                "sz": g["n_chars"].to_numpy(np.int64),
            }
        )
        agg = out.groupby(["lang", "fold"], as_index=False).agg(
            n_docs=("sz", "size"), total_chars=("sz", "sum")
        )
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg

    return (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .groupby("lang")
        .map_groups(per_lang, batch_format="pandas")
    )


def tokenizer_fertility_terms(sf_dir: str):
    """Tokenizer fertility per language: whitespace-word and BPE-ish
    pre-token totals with the fertility ratio in ppm (BPE tokens per
    million whitespace words) — the "how much does tokenization inflate
    this language" readout that sizes a training run's token budget.

    Scale shape: vectorized per-batch combiner (two RE2/substring counts),
    bounded |lang| fold; the ppm ratio is computed in Python ints so
    corpus-scale token sums never wrap int64 when multiplied by 1e6.

    Output: (lang, n_docs, sum_ws_tokens, sum_bpe_tokens, fertility_ppm).
    """
    from .text import BPE_PATTERN

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        n_ws = pc.add(
            pc.cast(pc.count_substring(text, " "), pa.int64()), 1
        )
        n_bpe = pc.cast(
            pc.count_substring_regex(text, BPE_PATTERN), pa.int64()
        )
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
                "sum_ws_tokens": n_ws,
                "sum_bpe_tokens": n_bpe,
            }
        )
        return t.group_by("lang").aggregate(
            [("n_docs", "sum"), ("sum_ws_tokens", "sum"),
             ("sum_bpe_tokens", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate(
            [("n_docs_sum", "sum"), ("sum_ws_tokens_sum", "sum"),
             ("sum_bpe_tokens_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("lang", "ascending")]))
        ws = pc.cast(g.column("sum_ws_tokens_sum_sum"), pa.int64()).to_pylist()
        bpe = pc.cast(
            g.column("sum_bpe_tokens_sum_sum"), pa.int64()
        ).to_pylist()
        ppm = [b * 1_000_000 // w for b, w in zip(bpe, ws)]
        return pa.table(
            {
                "lang": g.column("lang"),
                "n_docs": pc.cast(g.column("n_docs_sum_sum"), pa.int64()),
                "sum_ws_tokens": pa.array(ws, pa.int64()),
                "sum_bpe_tokens": pa.array(bpe, pa.int64()),
                "fertility_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |lang| rows per block
        .map_batches(finish, batch_format="pyarrow")
    )


def fold_leakage_audit(sf_dir: str, k: int = 3):
    """Cross-fold leakage audit: after the stratified k-fold assignment,
    the number of DISTINCT 3-word shingles shared by each fold pair —
    the train/validation contamination check a curation job runs before
    trusting a held-out score.

    Scale shape: fold ids are computed over light columns via one
    hash(lang) shuffle, joined back to text by a native hash join on
    doc_id (big-big, never broadcast); shingles dedup per (shingle,
    fold) in a per-batch combiner, one hash(shingle) shuffle emits the
    bounded fold-pair matrix.

    Output: (fold_a, fold_b, n_shared) for fold_a < fold_b.
    """
    from ..functions.hashing import word_shingles_batch

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "fold": np.arange(len(g), dtype=np.int64) % np.int64(k),
            }
        )

    folds = (
        _read(sf_dir, "documents", ["doc_id", "lang"])
        .groupby("lang")
        .map_groups(per_lang, batch_format="pandas")
    )
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    joined = docs.join(
        folds, join_type="inner", num_partitions=4, on=("doc_id",)
    )

    def shingle_partial(batch: pa.Table) -> pa.Table:
        idx, sh, _ = word_shingles_batch(batch.column("text"), k=3)
        fold = pc.cast(batch.column("fold"), pa.int64()).to_numpy()
        t = pa.table({"shingle": sh, "fold": pa.array(fold[idx])})
        t = t.group_by(["shingle", "fold"]).aggregate([])
        sb = (
            pd.util.hash_pandas_object(
                t.column("shingle").to_pandas(), index=False
            ).to_numpy(np.uint64)
            % 256
        ).astype(np.int64)
        return t.append_column("sbucket", pa.array(sb))

    def per_shingle(g: pd.DataFrame) -> pd.DataFrame:
        # fold-presence bitmask per shingle (dedup across input batches),
        # then each fold pair counts masks carrying both bits — fully
        # vectorized, no per-shingle Python loop
        g = g.drop_duplicates(["shingle", "fold"])
        bit = (np.int64(1) << g["fold"].to_numpy(np.int64))
        mask = pd.Series(bit).groupby(g["shingle"].to_numpy()).sum()
        m = mask.to_numpy(np.int64)
        fa, fb, n = [], [], []
        for a in range(k):
            for b in range(a + 1, k):
                both = np.int64((1 << a) | (1 << b))
                cnt = int(((m & both) == both).sum())
                if cnt:
                    fa.append(a)
                    fb.append(b)
                    n.append(cnt)
        return pd.DataFrame(
            {
                "fold_a": np.array(fa, np.int64),
                "fold_b": np.array(fb, np.int64),
                "n_shared": np.array(n, np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["fold_a", "fold_b"]).aggregate([("n_shared", "sum")])
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("fold_a", "ascending"), ("fold_b", "ascending")],
            )
        )
        return pa.table(
            {
                "fold_a": pc.cast(g.column("fold_a"), pa.int64()),
                "fold_b": pc.cast(g.column("fold_b"), pa.int64()),
                "n_shared": pc.cast(g.column("n_shared_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(shingle_partial, batch_format="pyarrow")
        .groupby("sbucket")  # 256 buckets, NOT one group per shingle
        .map_groups(per_shingle, batch_format="pandas")
        .repartition(1)  # bounded k*(k-1)/2 rows
        .map_batches(finish, batch_format="pyarrow")
    )


def id_gap_audit(sf_dir: str):
    """Doc-id continuity audit per source: min/max id, gap count and gap
    mass in the sorted id sequence — the frame-of-reference readout an
    index layout uses to decide between delta and dense encoding.

    Scale shape: one hash(source) shuffle of (doc_id, source) only;
    per-source kernel is a sort + one diff.

    Output: (source, n_docs, min_id, max_id, n_gaps, sum_gap).
    """

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        d = np.diff(ids)
        gaps = d - 1
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": np.array([len(ids)], np.int64),
                "min_id": np.array([ids[0]], np.int64),
                "max_id": np.array([ids[-1]], np.int64),
                "n_gaps": np.array([(gaps > 0).sum()], np.int64),
                "sum_gap": np.array([gaps[gaps > 0].sum()], np.int64),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "source"])
        .groupby("source")
        .map_groups(per_source, batch_format="pandas")
    )


def k_anonymity_audit(sf_dir: str, k: int = 5, band_cents: int = 100000):
    """k-anonymity audit over the customer quasi-identifiers
    (nation, account-balance band): an equivalence class smaller than
    ``k`` re-identifies its members — the privacy gate a release
    pipeline runs before publishing joined aggregates. Reports the
    class-size histogram (log2 bands) and the at-risk population.

    Scale shape: per-batch QI-class count combiner, one bounded fold
    (class domain = |nation| x |balance bands|).

    Output: (size_band, n_classes, n_customers, at_risk) where
    size_band = floor(log2(class size)) and at_risk marks bands whose
    classes are all below k.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch.column("c_nationkey"), pa.int64()).to_numpy()
        bal = np.floor(
            batch.column("c_acctbal").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        # offset keeps the dividend non-negative: numpy floors negative
        # division while DuckDB truncates toward zero (the repo's
        # division-semantics guard, cf. spatial_grid_bin)
        assert len(bal) == 0 or bal.min() >= -band_cents, \
            "acctbal below the non-negativity offset"
        band = (bal + np.int64(band_cents)) // np.int64(band_cents)
        t = pa.table(
            {
                "nationkey": pa.array(nk),
                "band": pa.array(band),
                "n": pa.array(np.ones(len(nk), np.int64)),
            }
        )
        return t.group_by(["nationkey", "band"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["nationkey", "band"]).aggregate([("n_sum", "sum")])
        sz = pc.cast(g.column("n_sum_sum"), pa.int64()).to_numpy()
        powers = np.int64(1) << np.arange(41, dtype=np.int64)
        size_band = np.searchsorted(powers, sz, side="right") - 1
        out = pa.table(
            {
                "size_band": pa.array(size_band.astype(np.int64)),
                "n_classes": pa.array(np.ones(len(sz), np.int64)),
                "n_customers": pa.array(sz),
                "at_risk": pa.array((sz < k).astype(np.int64) * sz),
            }
        )
        o = out.group_by("size_band").aggregate(
            [("n_classes", "sum"), ("n_customers", "sum"),
             ("at_risk", "sum")]
        )
        o = o.take(pc.sort_indices(o, sort_keys=[("size_band",
                                                  "ascending")]))
        return pa.table(
            {
                "size_band": pc.cast(o.column("size_band"), pa.int64()),
                "n_classes": pc.cast(o.column("n_classes_sum"), pa.int64()),
                "n_customers": pc.cast(o.column("n_customers_sum"),
                                       pa.int64()),
                "at_risk": pc.cast(o.column("at_risk_sum"), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded QI-class domain
        .map_batches(finish, batch_format="pyarrow")
    )


def l_diversity_audit(sf_dir: str, band_cents: int = 100000):
    """l-diversity audit: within each quasi-identifier class (nation,
    balance band), how diverse is the sensitive attribute (market
    segment)? Classes where one segment dominates leak membership even
    when k-anonymous. Reports per diversity level (distinct segments in
    the class) the class count and population.

    Scale shape: per-batch (QI, segment) count combiner, one bounded
    fold over |nation| x |bands| x |segments|.

    Output: (n_segments, n_classes, n_customers).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch.column("c_nationkey"), pa.int64()).to_numpy()
        bal = np.floor(
            batch.column("c_acctbal").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        assert len(bal) == 0 or bal.min() >= -band_cents, \
            "acctbal below the non-negativity offset"
        t = pa.table(
            {
                "nationkey": pa.array(nk),
                "band": pa.array(
                    (bal + np.int64(band_cents)) // np.int64(band_cents)
                ),
                "seg": batch.column("c_mktsegment"),
                "n": pa.array(np.ones(len(nk), np.int64)),
            }
        )
        return t.group_by(["nationkey", "band", "seg"]).aggregate(
            [("n", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby(["nationkey", "band", "seg"], as_index=False)[
            "n_sum"
        ].sum()
        cls = g.groupby(["nationkey", "band"]).agg(
            n_segments=("seg", "nunique"), n_customers=("n_sum", "sum")
        )
        out = cls.groupby("n_segments", as_index=False).agg(
            n_classes=("n_customers", "size"),
            n_customers=("n_customers", "sum"),
        )
        out = out.sort_values("n_segments", kind="mergesort")
        return pa.table(
            {
                "n_segments": pa.array(
                    out["n_segments"].to_numpy(np.int64)
                ),
                "n_classes": pa.array(
                    out["n_classes"].to_numpy(np.int64)
                ),
                "n_customers": pa.array(
                    out["n_customers"].to_numpy(np.int64)
                ),
            }
        )

    return (
        _read(sf_dir, "customer",
              ["c_nationkey", "c_acctbal", "c_mktsegment"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded QI x segment domain
        .map_batches(finish, batch_format="pyarrow")
    )
