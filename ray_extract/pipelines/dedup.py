"""Deduplication pipelines over the ``documents`` table.

Four strategies, each Ray-Data-native and each with a deterministic DuckDB
oracle (see ``__ray_entry__.oracle_sql``):

- exact: content-hash groupby, first-wins (min doc_id).
- n-gram Jaccard: inverted-index candidate generation (groupby on shingle) +
  exact verification — complete for any Jaccard threshold > 0 because a pair
  with J > 0 shares at least one shingle.
- MinHash + LSH: md5-based minhash signatures (hex-string min, reproducible in
  SQL), banded into buckets; pairs sharing a band bucket are candidates.
- SimHash: 32-bit tf-weighted signature over rolling-hashed tokens; pairs
  within a Hamming-distance threshold.

Scale notes (100 TB): the shingle groupby is the one all-to-all exchange; hot
shingles (stopword trigrams) create pair-explosion skew — production would
drop shingles with document frequency above a cap before pairing (the cap is a
parameter here, disabled in tests so the SQL oracle stays exhaustive). SimHash
pair-finding broadcasts the signature vector (8 bytes/doc — 8 GB per 10^9
docs, sharded by prefix at larger scale) and compares blocks against it with
vectorized XOR+popcount.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    lsh_bands,
    md5_bytes,
    md5_str,
    minhash_signature,
    simhash32_batch,
    word_shingles_batch,
)
from ..profile import resolve


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------- exact dedup
def exact_dedup(sf_dir: str):
    """Hash-partitioned exact dedup: md5(text) groups, keep min doc_id."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [md5_str(t) for t in batch.column("text").to_pylist()]
        # strip source-parquet schema metadata (pandas-written files carry a
        # b'pandas' dict that breaks Ray's schema-hash dedup in the shuffle)
        return batch.replace_schema_metadata(None).append_column(
            "content_hash", pa.array(hashes, type=pa.string())
        )

    ds = _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------- n-gram Jaccard
def _shingle_stage(k: int):
    def shingles(batch: pa.Table) -> pa.Table:
        # all-Arrow distinct k-shingles for the whole batch (functions/
        # hashing.word_shingles_batch) — ~2x the per-row Python loop
        doc_u, sh, n_sh = word_shingles_batch(batch.column("text"), k)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_u]),
                "shingle": sh,
                "n_sh": pa.array(n_sh[doc_u]),
            }
        )

    return shingles


def _add_bucket(key_col: str, num_buckets: int):
    """Deterministic hash bucket for a string key column (vectorized)."""

    def bucket(df):
        import pandas as pd

        df = df.copy()
        df["bucket"] = (
            pd.util.hash_pandas_object(df[key_col], index=False) % num_buckets
        ).astype("int64")
        return df

    return bucket


def _bucket_pairs(join_cols: list[str], carry: list[str], max_key_df: int | None = None):
    """Vectorized within-bucket self-join: all (doc_a < doc_b) pairs sharing
    the join_cols value. One pandas merge per BUCKET (a few dozen calls total)
    instead of one Python call per distinct key (tens of thousands).

    ``max_key_df``: drop keys occurring in more than this many documents
    before pairing (the hot-shingle document-frequency cap — stopword-like
    shingles otherwise pair-explode). The bucket holds EVERY occurrence of
    each of its keys (the shuffle partitions by key hash), so the per-bucket
    count is the exact global document frequency — no extra shuffle needed.
    None disables the cap (keeps the SQL oracle exhaustive)."""

    def _names(c: str) -> tuple[str, str]:
        return ("na", "nb") if c == "n_sh" else (c + "_a", c + "_b")

    def pairs(g):
        import pandas as pd

        # NOTE: input arrives as pandas (the sort/groupby machinery), but the
        # output is a metadata-free Arrow table: pandas->Arrow conversion via
        # from_pandas attaches pandas schema metadata, and metadata-carrying
        # schemas are UNHASHABLE (hash(pa.Schema) raises on the metadata
        # dict), which makes every downstream shuffle log schema-dedup
        # warnings and defeats block-schema caching.
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                **{
                    name: pa.array([], type=pa.int64())
                    for c in carry
                    for name in _names(c)
                },
            }
        )
        n = len(g)
        if n < 2:
            return empty
        # factorize string keys to int codes; sort once; equal-key segments
        # then pair via triangular index arithmetic — work and memory are
        # proportional to the candidate PAIR count, no pandas hash-join
        key_codes = []
        for c in join_cols:
            col = g[c]
            if col.dtype == object or str(col.dtype) in ("string", "large_string"):
                codes, _ = pd.factorize(col, sort=False)
                key_codes.append(codes.astype(np.int64))
            else:
                key_codes.append(col.to_numpy().astype(np.int64))
        order = np.lexsort(key_codes[::-1])
        keys = [k[order] for k in key_codes]
        ids = g["doc_id"].to_numpy().astype(np.int64)[order]
        carried = {c: g[c].to_numpy()[order] for c in carry}
        new_seg = np.zeros(n, dtype=bool)
        new_seg[0] = True
        for k in keys:
            new_seg[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        if max_key_df is not None:
            keep_rows = cnt[seg_of] <= max_key_df
            if not keep_rows.all():
                ids = ids[keep_rows]
                carried = {c: v[keep_rows] for c, v in carried.items()}
                new_seg = new_seg[keep_rows].copy()
                n = len(ids)
                if n < 2:
                    return empty
                new_seg[0] = True
                starts = np.flatnonzero(new_seg)
                seg_of = np.cumsum(new_seg) - 1
                cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local  # pairs where this row is the left side
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        b_idx = np.arange(total) - np.repeat(block_start, reps) + a_idx + 1
        da, db = ids[a_idx], ids[b_idx]
        valid = da != db  # same doc sharing a key twice is not a pair
        if not valid.all():
            a_idx, b_idx = a_idx[valid], b_idx[valid]
            da, db = da[valid], db[valid]
        swap = da > db  # orient carry columns with (doc_a < doc_b)
        out = {"doc_a": np.where(swap, db, da), "doc_b": np.where(swap, da, db)}
        for c in carry:
            va, vb = carried[c][a_idx], carried[c][b_idx]
            name_a, name_b = _names(c)
            out[name_a] = np.where(swap, vb, va)
            out[name_b] = np.where(swap, va, vb)
        return pa.table(out)

    return pairs


def ngram_jaccard_pairs(sf_dir: str, k: int = 3, num: int = 1, den: int = 2,
                        num_buckets: int = 64,
                        max_shingle_df="profile"):
    """Pairs with Jaccard(shingles_a, shingles_b) >= num/den (default 1/2),
    verified exactly with integer arithmetic (no float thresholds).

    Candidate generation is an inverted-index self-join: shingles are hash-
    bucketed (the one shuffle) and each bucket does a single vectorized merge.
    Complete for any threshold > 0 (a pair with J > 0 shares a shingle).
    ``max_shingle_df`` caps shingle document frequency before pairing (the
    hot-shingle skew guard for stopword-heavy corpora — makes the result
    approximate); the default resolves from the active scale profile
    (exact: None/uncapped; web: capped — see ``ray_extract.profile``)."""
    max_shingle_df = resolve(max_shingle_df, "max_shingle_df")
    sh = _docs(sf_dir).map_batches(_shingle_stage(k), batch_format="pyarrow")
    sh = sh.map_batches(_add_bucket("shingle", num_buckets), batch_format="pandas")
    pairs = sh.groupby("bucket").map_groups(
        _bucket_pairs(["shingle"], ["n_sh"], max_key_df=max_shingle_df),
        batch_format="pandas",
    )

    # count shared shingles per pair. A multi-key groupby().aggregate() was
    # measured at 360s for 1.3M pair rows (Ray's sort-aggregate over a two-
    # column key); hash-bucketing the PAIR key and aggregating vectorized
    # inside 64 groups does the same in seconds.
    def pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = ((a * np.uint64(2654435761) + b)
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return batch.append_column("pbucket", pa.array(h.astype(np.int64)))

    def agg_bucket(g):
        import pandas as pd

        # shared-shingle count per pair via np.unique on a packed int64 pair
        # key (doc ids < 2^31); na/nb are per-doc constants so any occurrence
        # serves. No pandas multi-key groupby.
        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        key = a * (1 << 31) + b
        _, first, inter = np.unique(key, return_index=True, return_counts=True)
        na = g["na"].to_numpy().astype(np.int64)[first]
        nb = g["nb"].to_numpy().astype(np.int64)[first]
        uni = na + nb - inter
        keep = den * inter >= num * uni
        return pd.DataFrame(
            {
                "doc_a": a[first][keep],
                "doc_b": b[first][keep],
                "inter": inter[keep].astype(np.int64),
                "uni": uni[keep],
            }
        )

    return (
        pairs.map_batches(pair_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pbucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------- MinHash + LSH
def minhash_lsh_pairs(sf_dir: str, k: int = 3, num_perm: int = 16, band_rows: int = 4):
    """Candidate near-duplicate pairs sharing at least one LSH band bucket.

    The signature kernel runs in DuckDB (functions/duck.py): ``num_perm`` x
    n_shingles md5 digests per batch computed in C++ instead of per-shingle
    Python hashlib calls (the old kernel was the second-slowest bench stage).
    Values are identical to the scalar ``minhash_signature``/``lsh_bands``
    spec — pinned by tests/test_hash_batch.py."""
    n_bands = num_perm // band_rows
    # a document with no shingles (< k words) has the constant all-empty
    # signature; its band sigs are the same constant for every band
    empty_band_sigs = lsh_bands(minhash_signature(set(), num_perm), band_rows)

    def band_stage(batch: pa.Table) -> pa.Table:
        from ..functions.duck import duck

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        doc_u, shingles, n_sh = word_shingles_batch(batch.column("text"), k)
        empty_docs = np.flatnonzero(n_sh == 0).tolist()
        parts: list[pa.Table] = []
        if len(doc_u):
            sh = pa.table(
                {
                    "doc_idx": pa.array(doc_u),
                    "shingle": shingles,
                }
            )
            con = duck()
            con.register("sh_tbl", sh)
            res = con.execute(
                f"""
                WITH mh AS (
                  SELECT s.doc_idx, r.j,
                         min(md5(CAST(r.j AS VARCHAR) || ':' || s.shingle)) AS h
                  FROM sh_tbl s CROSS JOIN range({num_perm}) r(j)
                  GROUP BY s.doc_idx, r.j
                )
                SELECT doc_idx, CAST(j // {band_rows} AS BIGINT) AS band_id,
                       md5(string_agg(h, '|' ORDER BY j)) AS band_sig
                FROM mh GROUP BY doc_idx, band_id
                """
            ).arrow()
            con.unregister("sh_tbl")
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids[res.column("doc_idx").to_numpy()]),
                        "band_id": pa.array(
                            res.column("band_id").to_numpy().astype(np.int64)
                        ),
                        "band_sig": res.column("band_sig").cast(pa.string()),
                    }
                )
            )
        if empty_docs:
            ed = np.asarray(empty_docs, dtype=np.int64)
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(np.repeat(ids[ed], n_bands)),
                        "band_id": pa.array(
                            np.tile(np.arange(n_bands, dtype=np.int64), len(ed))
                        ),
                        "band_sig": pa.array(
                            empty_band_sigs * len(ed), type=pa.string()
                        ),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "band_id": pa.array([], type=pa.int64()),
                    "band_sig": pa.array([], type=pa.string()),
                }
            )
        return pa.concat_tables(parts)

    bands = _docs(sf_dir).map_batches(band_stage, batch_format="pyarrow")
    bands = bands.map_batches(_add_bucket("band_sig", 64), batch_format="pandas")
    pairs = bands.groupby("bucket").map_groups(
        _bucket_pairs(["band_id", "band_sig"], []), batch_format="pandas"
    )

    # distinct pairs (a pair can collide in several bands): bucketed distinct
    # on a packed int64 pair key via np.unique (multi-key groupby aggregates
    # are slow; doc ids < 2^31)
    def pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = ((a * np.uint64(2654435761) + b)
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        return batch.append_column("pbucket", pa.array(h.astype(np.int64)))

    def distinct_pairs(g):
        import pandas as pd

        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        _, idx = np.unique(a * (1 << 31) + b, return_index=True)
        return pd.DataFrame({"doc_a": a[idx], "doc_b": b[idx]})

    return (
        pairs.map_batches(pair_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pbucket")
        .map_groups(distinct_pairs, batch_format="pandas")
    )


# ------------------------------------------------------------------- SimHash
def simhash_pairs(sf_dir: str, max_hamming: int = 3, n_bands: int | None = None):
    """Pairs of documents whose 32-bit simhash signatures differ in at most
    ``max_hamming`` bits.

    Banded LSH, no broadcast: the 32-bit signature is sliced into
    ``max_hamming + 1`` disjoint bit-bands (default 4 bands of 8 bits). By
    pigeonhole, a pair within Hamming distance ``max_hamming`` agrees EXACTLY
    on at least one band, so bucketing on (band_id, band_value) — the one
    shuffle — finds every qualifying pair; the within-bucket verify computes
    exact Hamming distance with vectorized XOR + popcount and the cross-band
    duplicate pairs collapse in a bucketed distinct. Total compare work is
    ~n^2/2^band_bits per band instead of the n^2 of broadcast-all-compare; at
    larger corpora, widen the signature (64-bit) or the bands so buckets stay
    small — no stage here materializes the corpus on the driver.
    """
    n_bands = n_bands or (max_hamming + 1)
    if n_bands < max_hamming + 1:
        # pigeonhole completeness needs >= max_hamming + 1 disjoint bands: a
        # pair within distance d can differ in every one of <= d bands
        raise ValueError(
            f"n_bands={n_bands} < max_hamming + 1 = {max_hamming + 1}: "
            "banded LSH would miss qualifying pairs"
        )
    # disjoint bit ranges covering all 32 bits
    edges = np.linspace(0, 32, n_bands + 1).astype(np.int64)

    def band_stage(batch: pa.Table) -> pa.Table:
        sigs = simhash32_batch(batch.column("text").to_pylist()).astype(np.uint32)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        n = len(ids)
        out_id = np.repeat(ids, n_bands)
        out_sig = np.repeat(sigs.astype(np.int64), n_bands)
        keys = np.empty((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            lo, hi = int(edges[b]), int(edges[b + 1])
            val = (sigs >> lo) & np.uint32((1 << (hi - lo)) - 1)
            # band_key encodes (band_id, band_value) in one int group key
            keys[:, b] = b * (1 << 32) + val.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "sig": pa.array(out_sig),
                "band_key": pa.array(keys.ravel()),
            }
        )

    def verify_pairs(g):
        # all pairs within each band_key segment, generated as pure numpy
        # index arithmetic (sort -> segment bounds -> triangular repeat):
        # no pandas hash-join, no per-band-key Python calls. Work and memory
        # are proportional to the CANDIDATE pair count of this bucket.
        # Output is a metadata-free Arrow table (pandas-converted blocks
        # carry unhashable schema metadata into the next shuffle).
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        bk = g["band_key"].to_numpy()
        n = len(bk)
        if n < 2:
            return empty
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        ids = g["doc_id"].to_numpy().astype(np.int64)[order]
        sigs = g["sig"].to_numpy().astype(np.int64).astype(np.uint32)[order]
        new_seg = np.r_[True, bk[1:] != bk[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local  # pairs where this row is the left side
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        b_idx = np.arange(total) - np.repeat(block_start, reps) + a_idx + 1
        x = sigs[a_idx] ^ sigs[b_idx]
        # SWAR popcount: ~75x faster than unpackbits and no 32x memory blowup
        x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
        x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2)) & np.uint32(0x33333333))
        ham = (
            ((x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F))
            * np.uint32(0x01010101)
        ) >> np.uint32(24)
        keep = ham <= max_hamming
        da, db = ids[a_idx[keep]], ids[b_idx[keep]]
        return pa.table(
            {
                "doc_a": np.minimum(da, db),
                "doc_b": np.maximum(da, db),
                "hamming": ham[keep].astype(np.int64),
            }
        )

    def add_vbucket(batch: pa.Table) -> pa.Table:
        bk = batch.column("band_key").to_numpy().astype(np.uint64)
        h = (bk * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(256)
        return batch.append_column("vbucket", pa.array(h.astype(np.int64)))

    bands = _docs(sf_dir).map_batches(band_stage, batch_format="pyarrow")
    pairs = (
        bands.map_batches(add_vbucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("vbucket")
        .map_groups(verify_pairs, batch_format="pandas")
    )

    # a pair within distance d can collide in up to n_bands - d bands: bucketed
    # distinct on the pair key (hamming is identical across copies). The pair
    # key packs (doc_a, doc_b) into one int64 (doc ids < 2^31 — at larger id
    # spaces widen to a 128-bit key or hash pair text ids).
    def pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = ((a * np.uint64(2654435761) + b)
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(256)
        return batch.append_column("pbucket", pa.array(h.astype(np.int64)))

    def distinct_pairs(g):
        import pandas as pd

        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        ham = g["hamming"].to_numpy().astype(np.int64)
        _, idx = np.unique(a * (1 << 31) + b, return_index=True)
        return pd.DataFrame(
            {"doc_a": a[idx], "doc_b": b[idx], "hamming": ham[idx]}
        )

    return (
        pairs.map_batches(pair_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pbucket")
        .map_groups(distinct_pairs, batch_format="pandas")
    )


# ----------------------------------------------------- memoized pair table
# duplicate_clusters / degree_distribution / triangle_count /
# pagerank_dup_graph all consume the SAME simhash pair table, and building it
# dominates each query (~2.5 s at sf0.1). Memoize the MATERIALIZED pairs
# Dataset per Ray session so one bench/driver run generates pairs once; the
# key includes the Ray job id so a fresh ray.init invalidates stale object
# refs naturally. Pair tables are pair-scale (far smaller than the corpus),
# so keeping a few pinned in the object store is cheap; the memo is bounded.
_PAIRS_MEMO: dict = {}
_PAIRS_MEMO_LIMIT = 8


def simhash_pairs_cached(sf_dir: str, max_hamming: int = 3,
                         n_bands: int | None = None):
    """Materialized ``simhash_pairs`` Dataset, memoized per (Ray session,
    sf_dir, params). Returns the same rows as a fresh build (pinned by
    tests/test_graph_backends.py::test_pairs_memo_matches_fresh)."""
    import ray

    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    key = (job, sf_dir, max_hamming, n_bands)
    ds = _PAIRS_MEMO.get(key)
    if ds is None:
        ds = simhash_pairs(sf_dir, max_hamming=max_hamming,
                           n_bands=n_bands).materialize()
        if len(_PAIRS_MEMO) >= _PAIRS_MEMO_LIMIT:
            _PAIRS_MEMO.pop(next(iter(_PAIRS_MEMO)))
        _PAIRS_MEMO[key] = ds
    return ds


# -------------------------------------------------------- sentence-level dedup
def sentence_dedup(sf_dir: str, chunk_words: int = 10, num_buckets: int = 64):
    """C4-style GLOBAL sentence/paragraph dedup: documents are split into
    fixed 10-word chunks (the deterministic stand-in for sentences in the
    synthetic corpus), every chunk that appeared earlier anywhere in the
    corpus — first occurrence = min (doc_id, chunk_idx) — is dropped, and
    each document is reassembled from its surviving chunks.

    Scale shape (two bounded shuffles, nothing on the driver):
      1. map_batches (all-Arrow): split_pattern -> chunk ListArray rebuilt
         from boundary offsets -> binary_join, one row per chunk, bucketed by
         hash62(chunk) — a fine-grained exchange proportional to corpus
         tokens, the irreducible cost of global sentence dedup.
      2. groupby(chunk-hash bucket): first-occurrence marking is one
         vectorized sort + duplicated() pass per bucket; collision-free
         because grouping compares chunk TEXT (the hash only routes).
      3. groupby(doc-hash bucket): reassembly sorts (doc_id, ci) once per
         bucket and joins kept chunks via an Arrow ListArray binary_join —
         no per-document Python calls.

    Output: (doc_id, n_chunks, n_kept, text_clean); text_clean = '' when every
    chunk of the document was seen earlier.
    """
    import pandas as pd

    from ..functions.hashing import hash62_batch

    def chunk_stage(batch: pa.Table) -> pa.Table:
        # pin to 32-bit-offset string: split_pattern on large_string would
        # yield int64 list offsets and break ListArray.from_arrays below
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        offs = words.offsets.to_numpy()
        counts = np.diff(offs)
        n = len(flat)
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        pos = np.arange(n) - np.repeat(offs[:-1], counts)
        starts = np.nonzero(pos % chunk_words == 0)[0]
        new_offsets = np.concatenate([starts, [n]]).astype(np.int32)
        chunk_list = pa.ListArray.from_arrays(pa.array(new_offsets), flat)
        chunk_text = pc.binary_join(chunk_list, " ")
        cdoc = doc_idx[starts]
        ci = (pos[starts] // chunk_words).astype(np.int64)
        doc_ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        h = hash62_batch(chunk_text.to_pylist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[cdoc]),
                "ci": pa.array(ci),
                "chunk": chunk_text,
                "bucket": pa.array((h % num_buckets).astype(np.int64)),
            }
        )

    def mark_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["chunk", "doc_id", "ci"], kind="mergesort")
        kept = ~g["chunk"].duplicated(keep="first")
        did = g["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": did,
                "ci": g["ci"].to_numpy(),
                "chunk": g["chunk"].to_numpy(),
                "kept": kept.to_numpy(),
                "dbucket": np.abs((did * np.int64(2654435761)) % np.int64(num_buckets)),
            }
        )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "ci"], kind="mergesort")
        did = g["doc_id"].to_numpy()
        n = len(g)
        change = np.ones(n, dtype=bool)
        change[1:] = did[1:] != did[:-1]
        seg = np.cumsum(change) - 1
        n_segs = seg[-1] + 1 if n else 0
        doc_of_seg = did[change]
        kept_mask = g["kept"].to_numpy()
        n_chunks = np.bincount(seg, minlength=n_segs).astype(np.int64)
        n_kept = np.bincount(seg, weights=kept_mask, minlength=n_segs).astype(np.int64)
        texts = np.full(n_segs, "", dtype=object)
        kg_chunk = g["chunk"].to_numpy()[kept_mask]
        kdid = did[kept_mask]
        if len(kdid):
            kchange = np.ones(len(kdid), dtype=bool)
            kchange[1:] = kdid[1:] != kdid[:-1]
            kstarts = np.nonzero(kchange)[0]
            koffs = np.concatenate([kstarts, [len(kdid)]]).astype(np.int32)
            joined = pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(koffs), pa.array(kg_chunk, type=pa.string())
                ),
                " ",
            ).to_pylist()
            idx = np.searchsorted(doc_of_seg, kdid[kstarts])
            texts[idx] = joined
        return pd.DataFrame(
            {
                "doc_id": doc_of_seg,
                "n_chunks": n_chunks,
                "n_kept": n_kept,
                "text_clean": texts,
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(chunk_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark_first, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(reassemble, batch_format="pandas")
    )


# ------------------------------------------------- duplicate-cluster resolve
def _clusters_label_join(edges, max_iters: int):
    """Connected components with DATASET-RESIDENT labels — the 100-TB path.

    No node-scale array ever touches the driver: labels live in a
    (node, label) Dataset; each round is one hash join (edges |><| labels
    on src, partial-min combiner per dst inside map_batches) unioned with
    the previous labels and reduced by one groupby-min. The driver sees
    only the per-round changed-count (a single int). Rounds are bounded by
    the cluster diameter, as in the broadcast path.
    """
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Count, Min

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(None))
    sent = np.iinfo(np.int64).max

    def node_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"node": np.unique(batch.column("src").to_numpy())})

    labels = (
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="n_"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t.column("node"), pa.int64()),
                    "label": pc.cast(t.column("node"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def prop(t: pa.Table) -> pa.Table:
        # partial min label per dst inside the batch: combiner before the
        # groupby so the shuffle moves one row per (batch, dst)
        dst = t.column("dst").to_numpy()
        lab = t.column("label").to_numpy()
        order = np.argsort(dst, kind="stable")
        d, l_ = dst[order], lab[order]
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        return pa.table(
            {
                "node": d[starts],
                "cand": np.minimum.reduceat(l_, starts),
                "old": np.full(len(starts), sent, dtype=np.int64),
            }
        )

    def carry_old(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "cand": t.column("label"),
                "old": t.column("label"),
            }
        )

    for _ in range(max_iters):
        j = edges.join(
            labels,
            join_type="inner",
            num_partitions=nparts,
            on=("src",),
            right_on=("node",),
            aggregator_ray_remote_args=agg_args,
        )
        agg = (
            j.map_batches(prop, batch_format="pyarrow")
            .union(labels.map_batches(carry_old, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Min("cand", alias_name="new"),
                       Min("old", alias_name="old_l"))
            .materialize()
        )

        def changed_partial(t: pa.Table) -> pa.Table:
            nw = pc.cast(t.column("new"), pa.int64()).to_numpy()
            ol = pc.cast(t.column("old_l"), pa.int64()).to_numpy()
            return pa.table({"c": pa.array([int((nw < ol).sum())],
                                           type=pa.int64())})

        changed = agg.map_batches(
            changed_partial, batch_format="pyarrow"
        ).sum("c")
        labels = agg.map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t.column("node"), pa.int64()),
                    "label": pc.cast(t.column("new"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("node"),
                "cluster_id": t.column("label"),
                "is_canonical": pc.cast(
                    pc.equal(t.column("node"), t.column("label")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def duplicate_clusters(sf_dir: str, max_iters: int = 64,
                       label_backend: str = "profile",
                       broadcast_node_limit: int = 50_000_000):
    """Connected components over the simhash near-duplicate pair graph —
    the cluster-resolution step a real dedup pipeline runs AFTER pair
    generation (pairs only say "a~b"; keeping one doc per duplicate GROUP
    needs the transitive closure).

    Algorithm: iterative min-label propagation until fixpoint (labels start
    as doc ids; each round every node takes the min label among itself and
    its neighbors; at convergence label = component minimum = canonical
    doc). Iterations are bounded by the cluster diameter — near-dup
    clusters are shallow, so this converges in a handful of rounds.

    Scale shape: the EDGE table (pair-scale) stays distributed and is
    materialized once, then every round is one map_batches over edges — a
    vectorized searchsorted lookup against the broadcast (ray.put) node->
    label array, with a per-batch partial min per destination (sort +
    minimum.reduceat combiner). Node ids ship once (one ray.put before the
    loop); each round re-puts only the label array, and the return leg is
    DELTA-ONLY — batches emit just the (node, cand) rows that improve on
    the node's current label, so driver traffic decays with convergence
    instead of staying node-scale every round. Convergence = an empty
    delta. For node tables
    too large to broadcast, swap the lookup stage for a co-partitioned
    join and keep the same iteration structure (or use pointer-jumping to
    cut rounds to O(log diameter)).

    ``label_backend`` picks the label-lookup strategy: "broadcast" (above —
    fastest while the clustered-node set fits a worker), "join" (fully
    dataset-resident labels, one hash join per round, nothing node-scale on
    the driver — see ``_clusters_label_join``), or "auto" (broadcast below
    ``broadcast_node_limit`` symmetric edge rows, join above).

    Output: (doc_id, cluster_id, is_canonical) for every doc that appears
    in at least one qualifying pair; cluster_id = min doc_id of the
    component, is_canonical = 1 for the doc that would be KEPT.
    """
    import ray

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    edges = (
        simhash_pairs_cached(sf_dir)
        .map_batches(sym, batch_format="pyarrow")
        .materialize()  # pair-scale, reused every round
    )

    label_backend = resolve(label_backend, "graph_backend")
    if label_backend == "auto":
        label_backend = (
            "broadcast" if edges.count() <= broadcast_node_limit else "join"
        )
    if label_backend == "join":
        return _clusters_label_join(edges, max_iters)

    def node_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"node": np.unique(batch.column("src").to_numpy())})

    nodes = np.unique(
        edges.map_batches(node_partial, batch_format="pyarrow")
        .to_pandas()["node"]
        .to_numpy()
    )
    labels = nodes.copy()

    nodes_ref = ray.put(nodes)  # node ids never change: ship once, not per round

    for _ in range(max_iters):
        labels_ref = ray.put(labels)

        def prop(batch: pa.Table, labels_ref=labels_ref) -> pa.Table:
            nds = ray.get(nodes_ref)
            lab = ray.get(labels_ref)
            src = batch.column("src").to_numpy()
            dst = batch.column("dst").to_numpy()
            lsrc = lab[np.searchsorted(nds, src)]
            order = np.argsort(dst, kind="stable")
            dst_s, lsrc_s = dst[order], lsrc[order]
            starts = np.r_[0, np.flatnonzero(dst_s[1:] != dst_s[:-1]) + 1]
            node = dst_s[starts]
            cand = np.minimum.reduceat(lsrc_s, starts)
            # delta pull: only labels that IMPROVE on the node's current
            # label return to the driver — per-round driver traffic decays
            # with convergence instead of staying node-scale every round
            keep = cand < lab[np.searchsorted(nds, node)]
            return pa.table({"node": node[keep], "cand": cand[keep]})

        parts = edges.map_batches(prop, batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        cand = parts.groupby("node")["cand"].min()
        new = labels.copy()
        idx = np.searchsorted(nodes, cand.index.to_numpy())
        np.minimum.at(new, idx, cand.to_numpy())
        if (new == labels).all():
            break
        labels = new

    return pa.table(
        {
            "doc_id": pa.array(nodes),
            "cluster_id": pa.array(labels),
            "is_canonical": pa.array((nodes == labels).astype(np.int64)),
        }
    )


# Label memo, same contract as _PAIRS_MEMO above: six queries consume the
# SAME component labels (canonical selection, cluster histograms, BFS
# seeds, curation funnel, two-hop reach) and label propagation dominates
# each (~5 s at sf0.1); one bench/driver session should pay it once. Only
# the driver-side pa.Table (broadcast/profile backends) is cached — the
# join-backend Dataset passes through uncached (lazy, already shareable).
_CLUSTERS_MEMO: dict = {}
_CLUSTERS_MEMO_LIMIT = 8


def duplicate_clusters_cached(sf_dir: str, max_iters: int = 64,
                              label_backend: str = "profile"):
    """Memoized ``duplicate_clusters`` per (Ray session, sf_dir, params).
    Returns the same table as a fresh run (pinned by
    tests/test_graph_backends.py::test_clusters_memo_matches_fresh)."""
    import ray

    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    key = (job, sf_dir, max_iters, label_backend)
    res = _CLUSTERS_MEMO.get(key)
    if res is None:
        res = duplicate_clusters(sf_dir, max_iters=max_iters,
                                 label_backend=label_backend)
        if not isinstance(res, pa.Table):
            return res
        if len(_CLUSTERS_MEMO) >= _CLUSTERS_MEMO_LIMIT:
            _CLUSTERS_MEMO.pop(next(iter(_CLUSTERS_MEMO)))
        _CLUSTERS_MEMO[key] = res
    return res


def degree_distribution(sf_dir: str, max_hamming: int = 3):
    """Degree histogram of the simhash near-duplicate pair graph — the
    standard sanity check before cluster resolution (a heavy-tailed degree
    distribution means a template/boilerplate blob is about to collapse
    half the corpus into one cluster).

    Scale shape: pairs stream out of simhash_pairs (already bucketed);
    degrees are per-batch partial counts per node (symmetrized edges), one
    small groupby(node), then the histogram is another partial-count +
    groupby(degree) — both shuffles are pair-scale and pre-combined, never
    corpus-scale.

    Output: (degree, n_docs).
    """
    import ray.data as rd  # noqa: F401  (kept for parity with siblings)
    from ray.data.aggregate import Sum

    def sym_counts(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        nodes, counts = np.unique(np.r_[a, b], return_counts=True)
        return pa.table({"node": nodes, "d": counts.astype(np.int64)})

    deg = (
        simhash_pairs_cached(sf_dir, max_hamming=max_hamming)
        .map_batches(sym_counts, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="degree"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("degree"), pa.int64()).to_numpy()
        vals, counts = np.unique(d, return_counts=True)
        return pa.table({"degree": vals, "n": counts.astype(np.int64)})

    agg = (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n", alias_name="n_docs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "degree": pc.cast(t.column("degree"), pa.int64()),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _triangle_join(pairs, n_edges: int, num_buckets: int):
    """Triangle closure via a wedge |><| edge hash join — the 100-TB path.

    Nothing graph-scale touches the driver or a single worker: wedges are
    enumerated per apex bucket (same triangular arithmetic as the
    broadcast path) and emitted as packed (b << 31 | c) keys with
    per-bucket multiplicity, then CLOSED by an inner hash join against the
    packed edge-key dataset; n_triangles = sum of matched wedge
    multiplicities. The wedge count itself needs no enumeration at all:
    n_wedges = sum over apexes of C(out_degree, 2).
    """
    import pandas as pd
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(None))

    def edge_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(
                    (t.column("doc_a").to_numpy().astype(np.int64) << 31)
                    | t.column("doc_b").to_numpy().astype(np.int64)
                )
            }
        )

    ek = pairs.map_batches(edge_keys, batch_format="pyarrow").materialize()

    # n_wedges from the out-degree distribution (oriented doc_a < doc_b)
    def outdeg_partial(t: pa.Table) -> pa.Table:
        nodes, counts = np.unique(t.column("doc_a").to_numpy(),
                                  return_counts=True)
        return pa.table({"apex": nodes, "d": counts.astype(np.int64)})

    n_wedges = int(
        pairs.map_batches(outdeg_partial, batch_format="pyarrow")
        .groupby("apex")
        .aggregate(Sum("d", alias_name="deg"))
        .map_batches(
            lambda t: pa.table(
                {
                    "w": pa.array(
                        [
                            int(
                                (
                                    lambda d: (d * (d - 1) // 2).sum()
                                )(pc.cast(t.column("deg"), pa.int64())
                                  .to_numpy())
                            )
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("w")
        or 0
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        bucket = np.abs((a * np.int64(2654435761)) % np.int64(num_buckets))
        return t.append_column("bucket", pa.array(bucket))

    def wedge_keys(g):
        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        n = len(a)
        if n < 2:
            return pd.DataFrame({"k": np.array([], dtype=np.int64),
                                 "w": np.array([], dtype=np.int64)})
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"k": np.array([], dtype=np.int64),
                                 "w": np.array([], dtype=np.int64)})
        i_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        j_idx = np.arange(total) - np.repeat(block_start, reps) + i_idx + 1
        cand = (b[i_idx] << 31) | b[j_idx]
        # combiner: one row per distinct wedge key per bucket
        keys, w = np.unique(cand, return_counts=True)
        return pd.DataFrame({"k": keys, "w": w.astype(np.int64)})

    closed = (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedge_keys, batch_format="pandas")
        .join(
            ek,
            join_type="inner",
            num_partitions=nparts,
            on=("k",),
            right_on=("k",),
            aggregator_ray_remote_args=agg_args,
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "t": pa.array(
                        [int(pc.sum(t.column("w")).as_py() or 0)],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("t")
        or 0
    )

    return pa.table(
        {
            "n_edges": pa.array([n_edges], type=pa.int64()),
            "n_wedges": pa.array([n_wedges], type=pa.int64()),
            "n_triangles": pa.array([int(closed)], type=pa.int64()),
        }
    )


def triangle_count(sf_dir: str, num_buckets: int = 64,
                   closure_backend: str = "profile",
                   broadcast_edge_limit: int = 20_000_000):
    """Triangle count over the near-duplicate pair graph — the graph-shaped
    aggregate (clustering-coefficient numerator) that complements
    duplicate_clusters / degree_distribution.

    Algorithm: with every edge oriented (doc_a < doc_b), each triangle
    a < b < c is counted exactly once as a WEDGE (b, c) in a's neighbor
    list closed by the edge (b, c). Scale shape: edges are hash-bucketed by
    the wedge apex (one shuffle of the edge list, which is sparse —
    near-dup graphs are far smaller than the corpus), each bucket
    enumerates its apexes' neighbor pairs with the same triangular index
    arithmetic as _bucket_pairs (work proportional to the wedge count),
    and closure checks against the packed edge set. ``closure_backend``
    picks the closure strategy: "broadcast" (packed edge keys via
    ``ray.put``, in-kernel binary search — fastest while the EDGE LIST
    fits a worker), "join" (wedge keys |><| edge keys hash join, nothing
    graph-scale on any single node — see ``_triangle_join``), or "auto"
    (broadcast below ``broadcast_edge_limit`` edges, join above).
    Packing assumes doc ids < 2^31.

    Output: one row (n_edges, n_wedges, n_triangles).
    """
    import ray
    import ray.data as rd

    pairs = simhash_pairs_cached(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    ).materialize()  # reused: closure set/join + wedge enumeration

    closure_backend = resolve(closure_backend, "graph_backend")
    if closure_backend == "auto":
        closure_backend = (
            "broadcast" if pairs.count() <= broadcast_edge_limit else "join"
        )
    if closure_backend == "join":
        return _triangle_join(pairs, pairs.count(), num_buckets)

    edge_refs = pairs.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(
                    (t.column("doc_a").to_numpy() << 31)
                    | t.column("doc_b").to_numpy()
                )
            }
        ),
        batch_format="pyarrow",
    ).to_arrow_refs()  # sparse edge list only — never the corpus; Arrow
    # blocks, not take_all's per-row Python dicts (6x faster at 450k edges)
    from ..functions.tables import concat_nonempty

    packed = np.sort(
        concat_nonempty(
            ray.get(edge_refs), {"k": pa.int64()}
        ).column("k").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    packed_ref = ray.put(packed)
    n_edges = len(packed)

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        bucket = np.abs((a * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g):
        import pandas as pd

        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        n = len(a)
        out = pa.table(
            {"n_wedges": pa.array([0], type=pa.int64()),
             "n_triangles": pa.array([0], type=pa.int64())}
        )
        if n < 2:
            return out
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return out
        i_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        j_idx = np.arange(total) - np.repeat(block_start, reps) + i_idx + 1
        # neighbor lists are sorted ascending, so (b[i], b[j]) is oriented
        cand = (b[i_idx] << 31) | b[j_idx]
        edges = ray.get(packed_ref)
        pos = np.searchsorted(edges, cand)
        closed = (pos < len(edges)) & (edges[np.minimum(pos, len(edges) - 1)]
                                       == cand)
        return pa.table(
            {
                "n_wedges": pa.array([total], type=pa.int64()),
                "n_triangles": pa.array([int(closed.sum())], type=pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_edges": pa.array([n_edges], type=pa.int64()),
                "n_wedges": pa.array(
                    [int(pc.sum(t.column("n_wedges")).as_py() or 0)],
                    type=pa.int64(),
                ),
                "n_triangles": pa.array(
                    [int(pc.sum(t.column("n_triangles")).as_py() or 0)],
                    type=pa.int64(),
                ),
            }
        )

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def blocked_linkage(sf_dir: str, prefix_chars: int = 8, max_len_diff: int = 2,
                    num: int = 1, den: int = 2, num_buckets: int = 64,
                    max_block_df="profile"):
    """Blocked record linkage — the classic entity-resolution join: only
    documents sharing a BLOCKING KEY (text prefix) are compared, candidates
    within the block must also pass a cheap length filter
    (|distinct words delta| <= ``max_len_diff``) before the exact
    word-set-Jaccard >= num/den verification.

    Contrast with dedup_ngram_jaccard (inverted-index candidates over ALL
    shared shingles): blocking trades recall (cross-prefix matches are
    invisible — the standard linkage trade) for a candidate count bounded
    by block sizes. Scale shape: one shuffle on hash(prefix) — all
    occurrences of a block land together — then the same triangular pair
    enumeration and packed-key np.unique aggregation as the jaccard
    pipeline; integer-only verification. ``max_block_df`` caps the hot
    blocks: a (prefix, word) key shared by more than this many documents
    is dropped before pairing (a boilerplate prefix over 1% of a 100-TB
    corpus otherwise makes one block quadratic) — the same per-bucket
    exact-global-df cap as ngram_jaccard's max_shingle_df; None keeps the
    SQL oracle exhaustive and MUST be set for adversarial corpora at
    scale.

    Output: (doc_a, doc_b, inter, uni) for linked pairs.
    """
    import pandas as pd
    import ray.data as rd

    max_block_df = resolve(max_block_df, "max_block_df")

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        pref = pc.utf8_slice_codeunits(text, 0, prefix_chars)
        words = pc.split_pattern(text, " ")
        flat = words.flatten()
        offsets = words.offsets.to_numpy()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offsets))
        codes, uniq_words = pd.factorize(flat.to_numpy(zero_copy_only=False))
        # per-doc DISTINCT words: dedupe (doc, word-code) pairs
        key = doc_idx * np.int64(len(uniq_words) + 1) + codes
        ukey = np.unique(key)
        u_doc = ukey // np.int64(len(uniq_words) + 1)
        u_code = ukey % np.int64(len(uniq_words) + 1)
        n_w = np.bincount(u_doc, minlength=len(batch)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[u_doc]),
                "prefix": pc.take(pref, pa.array(u_doc)),
                "word": pa.array(
                    np.asarray(uniq_words, dtype=object)[u_code].astype(str)
                ),
                "n_sh": pa.array(n_w[u_doc]),
            }
        )

    sh = _docs(sf_dir).map_batches(explode, batch_format="pyarrow")
    sh = sh.map_batches(_add_bucket("prefix", num_buckets),
                        batch_format="pandas")
    pairs = sh.groupby("bucket").map_groups(
        _bucket_pairs(["prefix", "word"], ["n_sh"], max_key_df=max_block_df),
        batch_format="pandas",
    )

    def pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = ((a * np.uint64(2654435761) + b)
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return batch.append_column("pbucket", pa.array(h.astype(np.int64)))

    def agg_bucket(g):
        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        key = a * (1 << 31) + b
        _, first, inter = np.unique(key, return_index=True, return_counts=True)
        na = g["na"].to_numpy().astype(np.int64)[first]
        nb = g["nb"].to_numpy().astype(np.int64)[first]
        uni = na + nb - inter
        keep = (np.abs(na - nb) <= max_len_diff) & (den * inter >= num * uni)
        return pd.DataFrame(
            {
                "doc_a": a[first][keep],
                "doc_b": b[first][keep],
                "inter": inter[keep].astype(np.int64),
                "uni": uni[keep],
            }
        )

    return (
        pairs.map_batches(pair_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pbucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


def _pagerank_join(pairs, n_iter: int):
    """PageRank with the adjacency as a DATASET — the 100-TB path.

    The edge list never leaves the object store: degrees come from one
    groupby, (src, dst, deg) is materialized once, and each power-iteration
    step is a ranks |><| edges hash join (contribution = r // deg computed
    per joined row, partial-summed per dst inside the batch) followed by
    the dst-keyed groupby every distributed PageRank pays.
    """
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(None))

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes, counts = np.unique(batch.column("src").to_numpy(),
                                  return_counts=True)
        return pa.table({"node": nodes, "d": counts.astype(np.int64)})

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t.column("node"), pa.int64()),
                    "deg": pc.cast(t.column("deg"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    edges_deg = (
        edges.join(
            deg,
            join_type="inner",
            num_partitions=nparts,
            on=("src",),
            right_on=("node",),
            aggregator_ray_remote_args=agg_args,
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "deg": t.column("deg"),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused every iteration
    )

    ranks = deg.map_batches(
        lambda t: pa.table(
            {
                "rnode": t.column("node"),
                "r": pa.array(np.full(len(t), 1_000_000, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def contribute(t: pa.Table) -> pa.Table:
        dst = t.column("dst").to_numpy()
        c = t.column("r").to_numpy() // t.column("deg").to_numpy()
        order = np.argsort(dst, kind="stable")
        d, cs = dst[order], c[order]
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        return pa.table(
            {"node": d[starts], "c": np.add.reduceat(cs, starts)}
        )

    for _ in range(n_iter):
        ranks = (
            edges_deg.join(
                ranks,
                join_type="inner",
                num_partitions=nparts,
                on=("src",),
                right_on=("rnode",),
                aggregator_ray_remote_args=agg_args,
            )
            .map_batches(contribute, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="s"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "rnode": pc.cast(t.column("node"), pa.int64()),
                        "r": pa.array(
                            150_000
                            + (85 * pc.cast(t.column("s"), pa.int64())
                               .to_numpy()) // 100
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("rnode"),
                "rank": pc.cast(t.column("r"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def pagerank_dup_graph(sf_dir: str, n_iter: int = 3,
                       edge_backend: str = "profile",
                       broadcast_edge_limit: int = 20_000_000):
    """PageRank over the (undirected) near-dup pair graph — the ITERATIVE
    distributed algorithm the engine otherwise lacks: each of ``n_iter``
    power-iteration steps is one broadcast-adjacency contribution fan-out
    plus one dst-keyed groupby (the per-iteration shuffle PageRank always
    pays), with ranks re-materialized between steps.

    All arithmetic is integer fixed-point so the unrolled SQL oracle is
    exact: r0 = 10^6; r_{k+1}(v) = 150000 + (85 * sum over in-edges of
    (r_k(u) // deg(u))) // 100. ``edge_backend`` picks the adjacency
    strategy: "broadcast" (src-sorted edge arrays + degrees via ``ray.put``
    — fastest while the sparse edge list fits a worker), "join" (adjacency
    stays a Dataset, one ranks |><| edges hash join per iteration — see
    ``_pagerank_join``), or "auto" (broadcast below
    ``broadcast_edge_limit`` edges, join above).

    Output: (doc_id, rank) after ``n_iter`` iterations.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    pairs = simhash_pairs_cached(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )
    edge_backend = resolve(edge_backend, "graph_backend")
    if edge_backend != "broadcast":
        pairs = pairs.materialize()
        if edge_backend == "auto":
            edge_backend = (
                "broadcast" if pairs.count() <= broadcast_edge_limit
                else "join"
            )
        if edge_backend == "join":
            return _pagerank_join(pairs, n_iter)
    edge_refs = pairs.to_arrow_refs()
    from ..functions.tables import concat_nonempty

    et = concat_nonempty(
        ray.get(edge_refs), {"doc_a": pa.int64(), "doc_b": pa.int64()}
    )
    a = et.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = et.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    src = np.r_[a, b]
    dst = np.r_[b, a]
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    nodes, deg = np.unique(src, return_counts=True)
    starts = np.searchsorted(src, nodes)
    adj_ref = ray.put((nodes, deg, starts, dst))

    ranks = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes),
                "r": pa.array(np.full(len(nodes), 1_000_000, dtype=np.int64)),
            }
        )
    )

    def contribute(batch: pa.Table) -> pa.Table:
        nd, dg, st, ds_arr = ray.get(adj_ref)
        node = batch.column("node").to_numpy()
        r = batch.column("r").to_numpy()
        i = np.searchsorted(nd, node)
        d = dg[i]
        lo = st[i]
        contrib = r // d
        total = int(d.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(d) - d, d)
        pos = np.repeat(lo, d) + offs
        t = pa.table(
            {
                "node": pa.array(ds_arr[pos]),
                "c": pa.array(np.repeat(contrib, d)),
            }
        )
        return t.group_by("node").aggregate([("c", "sum")])

    for _ in range(n_iter):
        ranks = (
            ranks.map_batches(contribute, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c_sum", alias_name="s"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": pc.cast(t.column("node"), pa.int64()),
                        "r": pa.array(
                            150_000
                            + (85 * pc.cast(t.column("s"), pa.int64())
                               .to_numpy()) // 100
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("node"), pa.int64()),
                "rank": pc.cast(t.column("r"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def canonical_selection(sf_dir: str, num_partitions: int | None = None):
    """Pick the canonical document per near-dup cluster by QUALITY (most
    tokens, doc_id as tiebreak) — the "which copy do we keep" step that
    turns pair detection into an actual dedup policy (contrast with
    duplicate_clusters' min-id convention).

    Scale shape: the cluster map (one row per clustered doc) hash-joins
    the per-doc token counts on doc_id (both sides big in general — a
    native shuffle join), then the winner per cluster is the packed-argmax
    trick through an ordinary max aggregate: max(n_tokens * 2^31 +
    (2^31 - 1 - doc_id)) encodes (most tokens, smallest id) in one int64.

    Output: (cluster_id, keep_id, keep_tokens, n_members).
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from .relational import _join_partitions, _multi_join_args

    cl_tbl = duplicate_clusters_cached(sf_dir)  # pa.Table (cluster-scale)
    clusters = rd.from_arrow(
        pa.table(
            {
                "doc_id": pc.cast(cl_tbl.column("doc_id"), pa.int64()),
                "cluster_id": pc.cast(cl_tbl.column("cluster_id"), pa.int64()),
            }
        )
    )

    def tokens_stage(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        nt = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        return pa.table(
            {
                "tdoc": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_tokens": pa.array(nt),
            }
        )

    toks = _docs(sf_dir).map_batches(tokens_stage, batch_format="pyarrow")
    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    joined = clusters.join(
        toks,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
        right_on=("tdoc",),
        aggregator_ray_remote_args=agg_args,
    )

    def pack_stage(t: pa.Table) -> pa.Table:
        nt = t.column("n_tokens").to_numpy()
        did = t.column("doc_id").to_numpy()
        packed = nt * np.int64(1 << 31) + (np.int64((1 << 31) - 1) - did)
        out = pa.table(
            {
                "cluster_id": t.column("cluster_id"),
                "packed": pa.array(packed),
                "one": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        return out.group_by("cluster_id").aggregate(
            [("packed", "max"), ("one", "sum")]
        )

    agg = (
        joined.map_batches(pack_stage, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Max("packed_max", alias_name="packed"),
                   Sum("one_sum", alias_name="n_members"))
    )

    def finish(t: pa.Table) -> pa.Table:
        packed = pc.cast(t.column("packed"), pa.int64()).to_numpy()
        return pa.table(
            {
                "cluster_id": pc.cast(t.column("cluster_id"), pa.int64()),
                "keep_id": pa.array(
                    np.int64((1 << 31) - 1) - (packed % np.int64(1 << 31))
                ),
                "keep_tokens": pa.array(packed // np.int64(1 << 31)),
                "n_members": pc.cast(t.column("n_members"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def jaccard_prefix_join(sf_dir: str, k: int = 3, num: int = 1, den: int = 2,
                        num_buckets: int = 64,
                        num_partitions: int | None = None):
    """Set-similarity join with PPJoin-style PREFIX FILTERING — same result
    as dedup_ngram_jaccard (the oracle is literally shared), but candidate
    generation indexes only each document's PREFIX under a global shingle
    order instead of every shingle.

    Theory: order shingles by any fixed global total order (here: their
    62-bit hash — no frequency pass needed, still a valid order). For
    Jaccard >= num/den, two sets must share an element among their first
    p = n - ceil(n*num/den) + 1 smallest-hash shingles, so indexing only
    prefixes is COMPLETE while shrinking the inverted index ~(1 - t)x and
    the candidate pair count far more (the quadratic term).

    Scale shape: prefix rows bucket by shingle hash and pair with the
    triangular kernel, cross-bucket duplicate candidates collapse in a
    bucketed distinct, each side's full shingle-hash set rides as a packed
    binary blob through two native hash joins, and verification is a
    vectorized all-rows-at-once two-pointer merge of the pre-sorted runs.

    Honest A/B (sf0.1, 32 cpus, warm): full inverted-index pre-count
    ~2.8 s vs prefix-join ~12 s — on THIS corpus (short docs, ~60
    shingles, heavy duplication) the candidate reduction does not pay for
    the two set-carrying joins. The prefix path wins when sets are large
    and qualifying pairs sparse (long documents, high threshold), where
    the full index's per-shingle pair enumeration is the quadratic term;
    both paths produce identical results, so callers can switch on corpus
    shape.

    Output: (doc_a, doc_b, inter, uni) — identical to dedup_ngram_jaccard.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..functions.hashing import hash62_batch
    from .relational import _join_partitions, _multi_join_args

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def shingle_stage(batch: pa.Table):
        doc_u, sh, n_sh = word_shingles_batch(batch.column("text"), k)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        h = hash62_batch(sh.to_pylist())
        return ids, doc_u, h, n_sh

    def sets_stage(batch: pa.Table) -> pa.Table:
        ids, doc_u, h, n_sh = shingle_stage(batch)
        order = np.lexsort((h, doc_u))
        du, hs = doc_u[order], h[order]
        present = np.unique(du)
        starts = np.searchsorted(du, present)
        ends = np.r_[starts[1:], len(du)]
        blobs = [hs[s:e].tobytes() for s, e in zip(starts, ends)]
        return pa.table(
            {
                "sdoc": pa.array(ids[present]),
                "ns": pa.array(n_sh[present]),
                "blob": pa.array(blobs, type=pa.large_binary()),
            }
        )

    def prefix_stage(batch: pa.Table) -> pa.Table:
        ids, doc_u, h, n_sh = shingle_stage(batch)
        order = np.lexsort((h, doc_u))
        du, hs = doc_u[order], h[order]
        n = len(du)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = du[1:] != du[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        pos = np.arange(n) - starts[seg_of]
        nsh = n_sh[du]
        plen = nsh - ((nsh * num + den - 1) // den) + 1
        keep = pos < plen
        return pa.table(
            {
                "doc_id": pa.array(ids[du[keep]]),
                "sh": pa.array(hs[keep]),
            }
        )

    docs = _docs(sf_dir)
    sets = docs.map_batches(sets_stage, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t.column("sh").to_numpy()
        b = (h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            num_buckets
        )
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def pair_bucket(g: pd.DataFrame) -> pa.Table:
        h = g["sh"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        n = len(g)
        empty = pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64())}
        )
        if n < 2:
            return empty
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        b_idx = np.arange(total) - np.repeat(block_start, reps) + a_idx + 1
        da, db = ids[a_idx], ids[b_idx]
        keep = da != db
        da, db = da[keep], db[keep]
        lo = np.minimum(da, db)
        hi = np.maximum(da, db)
        # local distinct only — cross-bucket duplicates verify twice and
        # collapse in the final distinct
        u = np.unique(lo * (1 << 31) + hi)
        return pa.table(
            {"doc_a": pa.array(u >> 31), "doc_b": pa.array(u & ((1 << 31) - 1))}
        )

    raw_cands = (
        docs.map_batches(prefix_stage, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair_bucket, batch_format="pandas")
    )

    # GLOBAL candidate dedup before the verify joins: near-dup clusters
    # share whole prefixes, so the same pair arrives from up to p shingle
    # buckets — without this the verify work amplifies ~p-fold (measured
    # 30-50 s vs ~6 s at sf0.1). Bucketed map_groups (sort shuffle, typed
    # empty blocks) rather than groupby().aggregate feeding a join — see
    # the Ray 2.49 schema-dissemination caveat in relational.py.
    def pack_pairs(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        pack = np.unique(a * (1 << 31) + b)
        pb = (pack.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            num_buckets
        )
        return pa.table(
            {"pack": pa.array(pack), "pbucket": pa.array(pb.astype(np.int64))}
        )

    def distinct_bucket(g: pd.DataFrame) -> pa.Table:
        u = np.unique(g["pack"].to_numpy().astype(np.int64))
        return pa.table(
            {"doc_a": pa.array(u >> 31), "doc_b": pa.array(u & ((1 << 31) - 1))}
        )

    cands = (
        raw_cands.map_batches(pack_pairs, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(distinct_bucket, batch_format="pandas")
    )

    with_a = cands.join(
        sets,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("sdoc",),
        aggregator_ray_remote_args=agg_args,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "na": pc.cast(t.column("ns"), pa.int64()),
                "blob_a": t.column("blob"),
            }
        ),
        batch_format="pyarrow",
    )
    with_ab = with_a.join(
        sets,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=("sdoc",),
        aggregator_ray_remote_args=agg_args,
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()),
                 "doc_b": pa.array([], type=pa.int64()),
                 "inter": pa.array([], type=pa.int64()),
                 "uni": pa.array([], type=pa.int64())}
            )
        # zero-copy blob decode: large_binary buffers -> int64 hash arrays
        # (blob lengths are multiples of 8 by construction, so the element
        # view is aligned); NO per-row Python
        def decode(col):
            arr = col.combine_chunks()
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            elems = data[offs[0] : offs[-1]].view(np.int64)
            lens = np.diff(offs) // 8
            return elems, lens

        ea, la = decode(t.column("blob_a"))
        eb, lb = decode(t.column("blob"))
        # both runs are sorted (sets_stage sorts per doc), so intersection
        # is a VECTORIZED TWO-POINTER merge across all rows at once —
        # max(la)+max(lb) passes of O(n) vector ops (measured 16x faster
        # than a global (row, hash) lexsort at 600k pairs x 120 hashes)
        oa = np.r_[0, np.cumsum(la)]
        ob = np.r_[0, np.cumsum(lb)]
        ia, ib = oa[:-1].copy(), ob[:-1].copy()
        enda, endb = oa[1:], ob[1:]
        inter = np.zeros(len(t), dtype=np.int64)
        active = (ia < enda) & (ib < endb)
        while active.any():
            av = ea[np.minimum(ia, enda - 1)]
            bv = eb[np.minimum(ib, endb - 1)]
            eq = active & (av == bv)
            lt = active & (av < bv)
            gt = active & (av > bv)
            inter += eq
            ia += eq + lt
            ib += eq + gt
            active = (ia < enda) & (ib < endb)
        na = pc.cast(t.column("na"), pa.int64()).to_numpy()
        nb = pc.cast(t.column("ns"), pa.int64()).to_numpy()
        uni = na + nb - inter
        keep = den * inter >= num * uni
        return pa.table(
            {
                "doc_a": pc.cast(t.column("doc_a"), pa.int64()).to_numpy()[keep],
                "doc_b": pc.cast(t.column("doc_b"), pa.int64()).to_numpy()[keep],
                "inter": pa.array(inter[keep]),
                "uni": pa.array(uni[keep]),
            }
        )

    verified = with_ab.map_batches(verify, batch_format="pyarrow")

    def pack_stage(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        pack = a * (1 << 31) + b
        iu = t.column("inter").to_numpy() * (np.int64(1) << 31) + t.column(
            "uni"
        ).to_numpy()
        return pa.table({"pack": pa.array(pack), "iu": pa.array(iu)})

    final = (
        verified.map_batches(pack_stage, batch_format="pyarrow")
        .groupby("pack")
        .aggregate(Max("iu", alias_name="iu"))
    )

    def finish(t: pa.Table) -> pa.Table:
        pack = pc.cast(t.column("pack"), pa.int64()).to_numpy()
        iu = pc.cast(t.column("iu"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_a": pa.array(pack >> 31),
                "doc_b": pa.array(pack & ((1 << 31) - 1)),
                "inter": pa.array(iu >> 31),
                "uni": pa.array(iu & ((1 << 31) - 1)),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def contamination_check(sf_dir: str, bench_source: str = "src0", k: int = 3):
    """Benchmark decontamination — the pre-training hygiene op: for every
    corpus document, how many distinct word k-shingles it shares with a
    held-out benchmark set (here: all documents of ``bench_source``), and a
    contaminated flag. Docs with n-gram overlap against eval sets must be
    dropped before training.

    Scale shape: shingles explode once per side (all-Arrow, distinct per
    doc); the benchmark side is reduced to a globally-distinct shingle set
    by one groupby (benchmark sets are corpus-small but NOT assumed
    driver-small: the overlap test is a native hash-shuffle semi-join on
    the shingle, never a broadcast); hit counts per doc pre-combine inside
    batches, and zero-hit docs surface via a union with a zero row per doc
    instead of a second join.

    Output: (doc_id, n_shared, contaminated) over all non-benchmark docs.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(None))

    def explode(batch: pa.Table) -> pa.Table:
        doc_u, sh, _n = word_shingles_batch(batch.column("text"), k)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        src = batch.column("source").combine_chunks()
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_u]),
                "source": pc.take(src, pa.array(doc_u)),
                "shingle": sh,
            }
        )

    sh = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow")
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # scanned twice (benchmark side + corpus side)
    )

    bench = (
        sh.filter(expr=f"source == '{bench_source}'")
        .groupby("shingle")
        .aggregate(Count(alias_name="bn_"))
        .map_batches(
            lambda t: pa.table(
                {"bshingle": pc.cast(t.column("shingle"), pa.string())}
            ),
            batch_format="pyarrow",
        )
    )

    corpus = sh.filter(expr=f"source != '{bench_source}'")

    def hit_partial(t: pa.Table) -> pa.Table:
        ids, counts = np.unique(
            pc.cast(t.column("doc_id"), pa.int64()).to_numpy(),
            return_counts=True,
        )
        return pa.table({"doc_id": ids, "n": counts.astype(np.int64)})

    hits = (
        corpus.select_columns(["doc_id", "shingle"])
        .join(
            bench,
            join_type="inner",
            num_partitions=nparts,
            on=("shingle",),
            right_on=("bshingle",),
            aggregator_ray_remote_args=agg_args,
        )
        .map_batches(hit_partial, batch_format="pyarrow")
    )

    def zero_rows(t: pa.Table) -> pa.Table:
        # from the RAW doc table, not the exploded shingles: docs shorter
        # than k words have no shingles but must still report n_shared = 0
        keep = pc.not_equal(t.column("source"), bench_source)
        ids = pc.cast(t.column("doc_id"), pa.int64()).filter(keep).to_numpy()
        return pa.table(
            {"doc_id": ids, "n": np.zeros(len(ids), dtype=np.int64)}
        )

    zeros = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(zero_rows, batch_format="pyarrow")

    return (
        hits.union(zeros)
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_shared"))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                    "n_shared": pc.cast(t.column("n_shared"), pa.int64()),
                    "contaminated": pc.cast(
                        pc.greater(
                            pc.cast(t.column("n_shared"), pa.int64()), 0
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def cross_source_dup_matrix(sf_dir: str, fingerprint_words: int = 5):
    """Cross-source near-duplicate matrix: for every source pair, how many
    distinct document FINGERPRINTS (md5 of the first ``fingerprint_words``
    words — the cheap head-prefix fingerprint) occur in BOTH — the mixing
    diagnostic run before weighting corpus sources (a high shared count
    means two "sources" are substantially the same crawl).

    Scale shape: one shuffle on the fingerprint hash carrying
    per-batch-distinct (hash, source) rows; each fingerprint group emits
    its C(s, 2) source pairs (s <= |sources|, bounded); pair counts
    pre-combine per batch and finish in a bounded-domain repartition(1)
    reduce over <= |sources|^2 rows.

    Output: (source_a, source_b, n_shared_texts) with source_a < source_b.
    """
    import pandas as pd
    import ray.data as rd

    def add_hash(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        prefix = pc.binary_join(
            pc.list_slice(words, 0, fingerprint_words), " "
        )
        offs = np.frombuffer(prefix.buffers()[1], dtype=np.int32)[
            prefix.offset : prefix.offset + len(prefix) + 1
        ]
        data = memoryview(prefix.buffers()[2])
        hashes = [
            md5_bytes(data[offs[i] : offs[i + 1]])
            for i in range(len(prefix))
        ]
        t = pa.table(
            {
                "content_hash": pa.array(hashes, type=pa.string()),
                "source": batch.column("source").combine_chunks(),
            }
        )
        # per-batch distinct (hash, source)
        return t.group_by(["content_hash", "source"]).aggregate([])

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # g: all (hash, source) rows of one hash partition
        g = g.drop_duplicates(["content_hash", "source"])
        g = g.sort_values(["content_hash", "source"], kind="mergesort")
        h = g["content_hash"].to_numpy()
        s = g["source"].to_numpy()
        n = len(g)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "source_a": pd.Series([], dtype=object),
                    "source_b": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        i_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        j_idx = np.arange(total) - np.repeat(block_start, reps) + i_idx + 1
        df = pd.DataFrame({"source_a": s[i_idx], "source_b": s[j_idx]})
        out = df.groupby(["source_a", "source_b"], sort=False).size()
        out = out.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["text", "source"])
        .map_batches(add_hash, batch_format="pyarrow")
        .map_batches(_add_bucket("content_hash", 64), batch_format="pandas")
        .groupby("bucket")
        .map_groups(group_pairs, batch_format="pandas")
    )

    return (
        ds.repartition(1)
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "source_a": g.column("source_a"),
                        "source_b": g.column("source_b"),
                        "n_shared_texts": pc.cast(g.column("n_sum"),
                                                  pa.int64()),
                    }
                )
            )(t.group_by(["source_a", "source_b"]).aggregate([("n", "sum")])),
            batch_format="pyarrow",
        )
    )


def source_dedup_rate(sf_dir: str):
    """Within-source exact-duplicate rate — the per-source health metric a
    mixing plan reads next to cross_source_dup_matrix: how much of each
    source is redundant BEFORE weighting it.

    Scale shape: one shuffle on (content hash, source) carrying per-batch
    combined counts; group sizes reduce to distinct/total per source in a
    second bounded groupby (|sources| rows).

    Output: (source, n_docs, n_unique, dup_permille).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def add_hash(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        offs = np.frombuffer(text.buffers()[1], dtype=np.int32)[
            text.offset : text.offset + len(text) + 1
        ]
        data = memoryview(text.buffers()[2])
        hashes = [
            md5_bytes(data[offs[i] : offs[i + 1]]) for i in range(len(text))
        ]
        t = pa.table(
            {
                "content_hash": pa.array(hashes, type=pa.string()),
                "source": batch.column("source").combine_chunks(),
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return t.group_by(["content_hash", "source"]).aggregate([("n", "sum")])

    per_hash = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["text", "source"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby(["content_hash", "source"])
        .aggregate(Sum("n_sum", alias_name="n"))
    )

    def src_partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "source": t.column("source"),
                "docs": pc.cast(t.column("n"), pa.int64()),
                "uniq": np.ones(len(t), dtype=np.int64),
            }
        )
        return out.group_by("source").aggregate(
            [("docs", "sum"), ("uniq", "sum")]
        )

    return (
        per_hash.map_batches(src_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: (
                lambda g: pa.table(
                    {
                        "source": g.column("source"),
                        "n_docs": pc.cast(g.column("docs_sum_sum"),
                                          pa.int64()),
                        "n_unique": pc.cast(g.column("uniq_sum_sum"),
                                            pa.int64()),
                        "dup_permille": pa.array(
                            (
                                (
                                    pc.cast(g.column("docs_sum_sum"),
                                            pa.int64()).to_numpy()
                                    - pc.cast(g.column("uniq_sum_sum"),
                                              pa.int64()).to_numpy()
                                )
                                * 1000
                            )
                            // pc.cast(g.column("docs_sum_sum"),
                                       pa.int64()).to_numpy()
                        ),
                    }
                )
            )(t.group_by("source").aggregate(
                [("docs_sum", "sum"), ("uniq_sum", "sum")]
            )),
            batch_format="pyarrow",
        )
    )


def minhash_estimate_audit(sf_dir: str, k: int = 3, num_perm: int = 16,
                           band_rows: int = 4,
                           num_partitions: int | None = None):
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of agreeing signature slots) next to the
    TRUE shingle Jaccard — the verification a pipeline runs before trusting
    a sketch-only dedup at scale.

    Scale shape: full signatures are one row per doc (the same DuckDB md5
    kernel as minhash_lsh_pairs, aggregated to a packed 'h0|h1|...' string);
    candidates come from the banded LSH shuffle; signatures attach to the
    pairs via TWO native hash joins (doc-scale sides stay datasets); slot
    agreement is counted vectorized on the split signature lists; the true
    (inter, uni) comes from the inverted-index pair machinery with the
    acceptance threshold disabled, LEFT-joined so candidates sharing no
    shingle read as jaccard 0.

    Output: (doc_a, doc_b, est_permille, true_permille, err_permille).
    """
    import ray.data as rd

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def sig_stage(batch: pa.Table) -> pa.Table:
        from ..functions.duck import duck

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        doc_u, shingles, n_sh = word_shingles_batch(batch.column("text"), k)
        if not len(doc_u):
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.string()),
                    "n_sh": pa.array([], type=pa.int64()),
                }
            )
        sh = pa.table({"doc_idx": pa.array(doc_u), "shingle": shingles})
        con = duck()
        con.register("sh_tbl", sh)
        res = con.execute(
            f"""
            WITH mh AS (
              SELECT s.doc_idx, r.j,
                     min(md5(CAST(r.j AS VARCHAR) || ':' || s.shingle)) AS h
              FROM sh_tbl s CROSS JOIN range({num_perm}) r(j)
              GROUP BY s.doc_idx, r.j
            )
            SELECT doc_idx, string_agg(h, '|' ORDER BY j) AS sig
            FROM mh GROUP BY doc_idx
            """
        ).arrow()
        con.unregister("sh_tbl")
        di = res.column("doc_idx").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[di]),
                "sig": res.column("sig").cast(pa.string()),
                "n_sh": pa.array(n_sh[di]),
            }
        )

    sigs = _docs(sf_dir).map_batches(sig_stage, batch_format="pyarrow")
    sigs_a = sigs.map_batches(
        lambda t: pa.table(
            {"da": t.column("doc_id"), "sig_a": t.column("sig"),
             "na": t.column("n_sh")}
        ),
        batch_format="pyarrow",
    )
    sigs_b = sigs.map_batches(
        lambda t: pa.table(
            {"db": t.column("doc_id"), "sig_b": t.column("sig"),
             "nb": t.column("n_sh")}
        ),
        batch_format="pyarrow",
    )

    def pack(t: pa.Table) -> pa.Table:
        pk = (
            pc.cast(t.column("doc_a"), pa.int64()).to_numpy() * (1 << 31)
            + pc.cast(t.column("doc_b"), pa.int64()).to_numpy()
        )
        return t.append_column("pk", pa.array(pk))

    cand = minhash_lsh_pairs(sf_dir, k=k, num_perm=num_perm,
                             band_rows=band_rows).map_batches(
        pack, batch_format="pyarrow"
    )
    truth = ngram_jaccard_pairs(sf_dir, k=k, num=0, den=1).map_batches(
        lambda t: pa.table(
            {
                "pkt": pc.cast(t.column("doc_a"), pa.int64()).to_numpy()
                * (1 << 31)
                + pc.cast(t.column("doc_b"), pa.int64()).to_numpy(),
                "inter": pc.cast(t.column("inter"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = (
        cand.join(
            sigs_a,
            join_type="inner",
            num_partitions=nparts,
            on=("doc_a",),
            right_on=("da",),
            aggregator_ray_remote_args=agg_args,
        )
        .join(
            sigs_b,
            join_type="inner",
            num_partitions=nparts,
            on=("doc_b",),
            right_on=("db",),
            aggregator_ray_remote_args=agg_args,
        )
        .join(
            truth,
            join_type="left_outer",
            num_partitions=nparts,
            on=("pk",),
            right_on=("pkt",),
            aggregator_ray_remote_args=agg_args,
        )
    )

    def score(t: pa.Table) -> pa.Table:
        sa = pc.split_pattern(
            pc.cast(t.column("sig_a").combine_chunks(), pa.string()), "|"
        )
        sb = pc.split_pattern(
            pc.cast(t.column("sig_b").combine_chunks(), pa.string()), "|"
        )
        eq = pc.equal(pc.list_flatten(sa), pc.list_flatten(sb)).to_numpy(
            zero_copy_only=False
        )
        per_row = np.add.reduceat(
            eq.astype(np.int64), sa.offsets.to_numpy()[:-1]
        ) if len(t) else np.array([], dtype=np.int64)
        est = per_row * 1000 // num_perm
        inter = (
            pc.cast(t.column("inter"), pa.int64())
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
        )
        na = pc.cast(t.column("na"), pa.int64()).to_numpy()
        nb = pc.cast(t.column("nb"), pa.int64()).to_numpy()
        uni = na + nb - inter
        true_pm = np.where(uni > 0, inter * 1000 // np.maximum(uni, 1), 1000)
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "est_permille": pa.array(est),
                "true_permille": pa.array(true_pm),
                "err_permille": pa.array(np.abs(est - true_pm)),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def shingle_containment_pairs(sf_dir: str, k: int = 3, num: int = 9,
                              den: int = 10, num_buckets: int = 64,
                              max_shingle_df="profile"):
    """Asymmetric near-duplicate detection by shingle CONTAINMENT: pairs
    where the smaller document's shingle set is >= num/den contained in
    the larger's (inter >= num/den * min(|A|, |B|)) — catches quote-and-
    extend and boilerplate-wrapping duplicates that symmetric Jaccard
    misses (a small doc fully inside a big one has low Jaccard but 100%
    containment).

    Same scale shape as ngram_jaccard_pairs (dedup.py:195): inverted-
    index candidates via ONE shingle-hash bucket shuffle, packed-key
    np.unique pair aggregation in 64 pair buckets, integer threshold —
    only the keep rule differs (min-side containment, not union Jaccard).

    Output: (doc_a, doc_b, inter, na, nb).
    """
    max_shingle_df = resolve(max_shingle_df, "max_shingle_df")
    sh = _docs(sf_dir).map_batches(_shingle_stage(k), batch_format="pyarrow")
    sh = sh.map_batches(_add_bucket("shingle", num_buckets),
                        batch_format="pandas")
    pairs = sh.groupby("bucket").map_groups(
        _bucket_pairs(["shingle"], ["n_sh"], max_key_df=max_shingle_df),
        batch_format="pandas",
    )

    def pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = ((a * np.uint64(2654435761) + b)
             * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return batch.append_column("pbucket", pa.array(h.astype(np.int64)))

    def agg_bucket(g):
        import pandas as pd

        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        key = a * (1 << 31) + b
        _, first, inter = np.unique(key, return_index=True,
                                    return_counts=True)
        na = g["na"].to_numpy().astype(np.int64)[first]
        nb = g["nb"].to_numpy().astype(np.int64)[first]
        keep = den * inter >= num * np.minimum(na, nb)
        return pd.DataFrame(
            {
                "doc_a": a[first][keep],
                "doc_b": b[first][keep],
                "inter": inter[keep].astype(np.int64),
                "na": na[keep],
                "nb": nb[keep],
            }
        )

    return (
        pairs.map_batches(pair_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pbucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


def simhash_distance_histogram(sf_dir: str, max_hamming: int = 3):
    """Hamming-distance histogram of the near-duplicate candidate graph —
    the tuning signal for the simhash threshold (how sharply pair volume
    grows with each admitted bit of distance).

    Scale shape: rides the per-session memoized pair Dataset
    (``simhash_pairs_cached`` — built once across the dup-graph query
    family), then a bounded-domain (<= max_hamming + 1 rows) count fold.

    Output: (hamming, n_pairs).
    """
    from ray.data.aggregate import Sum

    pairs = simhash_pairs_cached(sf_dir, max_hamming=max_hamming)

    def partial(t: pa.Table) -> pa.Table:
        h = pc.cast(t.column("hamming"), pa.int64()).to_numpy()
        vals, counts = np.unique(h, return_counts=True)
        return pa.table({"hamming": vals, "n": counts.astype(np.int64)})

    agg = (
        pairs.map_batches(partial, batch_format="pyarrow")
        .groupby("hamming")
        .aggregate(Sum("n", alias_name="n_pairs"))
    )

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("hamming", "ascending")])
        t = t.take(idx)
        return pa.table(
            {
                "hamming": pc.cast(t.column("hamming"), pa.int64()),
                "n_pairs": pc.cast(t.column("n_pairs"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def typo_neighbor_pairs(sf_dir: str, num_buckets: int = 256,
                        max_name_len: int = 64):
    """Edit-distance-1 name linkage — the SymSpell deletion-neighborhood
    join: all pairs of distinct names (customer names + part names +
    document vocabulary) within Levenshtein distance 1, WITHOUT the n^2
    compare of a naive fuzzy join.

    Scale shape: each name explodes into its <= len deletion variants plus
    itself (a bounded ~W-fold blowup, Arrow slice kernels per position);
    candidates meet in ONE hash-bucket groupby on the variant string
    (pigeonhole: any lev-1 pair shares a variant — the substitution pair
    shares the deletion at its mismatch position, the insert/delete pair
    shares the shorter name itself); the in-bucket verify is all-numpy on
    padded byte matrices (hamming for equal length, prefix+suffix
    cumprod for length +/- 1); cross-bucket duplicate pairs collapse in a
    final distinct groupby. Result scale is |lev-1 pairs|.

    Output: (name_a, name_b), name_a < name_b.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.hashing import hash62_batch

    def distinct_names(col: str):
        def f(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {"name": pc.cast(batch.column(col).combine_chunks(),
                                 pa.string())}
            )
            return t.group_by("name").aggregate([])

        return f

    def doc_words(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.cast(batch.column("text").combine_chunks(), pa.string()), " "
        )
        t = pa.table({"name": words.values})
        return t.group_by("name").aggregate([])

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_name"]
    ).map_batches(distinct_names("c_name"), batch_format="pyarrow")
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    ).map_batches(distinct_names("p_name"), batch_format="pyarrow")
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(doc_words, batch_format="pyarrow")

    # no global name-distinct barrier: each scan dedupes per batch, the few
    # cross-block duplicate names survive into the variant explode and
    # collapse in the in-bucket pair dedupe (pairs (X, X) drop at ia != ib,
    # duplicated (X, Y) at the packed np.unique) — one less all-to-all
    names = cust.union(part).union(docs).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )

    def explode_variants(batch: pa.Table) -> pa.Table:
        nm = pc.cast(batch.column("name").combine_chunks(), pa.string())
        ln = pc.utf8_length(nm).to_numpy().astype(np.int64)
        w = int(ln.max(initial=0))
        out_var, out_name = [nm], [nm]  # identity variant
        for p in range(min(w, max_name_len)):
            valid = pa.array(ln > p)
            sub = nm.filter(valid)
            pre = pc.utf8_slice_codeunits(sub, 0, p)
            suf = pc.utf8_slice_codeunits(sub, p + 1, 1 << 30)
            out_var.append(pc.binary_join_element_wise(pre, suf, ""))
            out_name.append(sub)
        var = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_var]
        )
        name = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_name]
        )
        h = hash62_batch(var.to_pylist())
        t = pa.table(
            {
                "variant": var,
                "name": name,
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )
        # same name can yield the same variant from several positions
        return t.group_by(["variant", "name", "bucket"]).aggregate([])

    variants = names.map_batches(explode_variants, batch_format="pyarrow")

    def _byte_mats(uniq: np.ndarray):
        w = max(len(s) for s in uniq)
        m = np.frombuffer(
            np.array([s.encode() for s in uniq], dtype=f"S{w}").tobytes(),
            dtype=np.uint8,
        ).reshape(len(uniq), w)
        ln = np.array([len(s) for s in uniq], dtype=np.int64)
        col = ln[:, None] - 1 - np.arange(w)[None, :]
        rmat = np.where(
            col >= 0, m[np.arange(len(uniq))[:, None], np.maximum(col, 0)], 0
        ).astype(np.uint8)
        return m, rmat, ln

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"name_a": pd.Series([], dtype=object),
                              "name_b": pd.Series([], dtype=object),
                              "pb": pd.Series([], dtype=np.int64)})
        v = g["variant"].to_numpy()
        nm = g["name"].to_numpy()
        order = np.lexsort((nm, v))
        v, nm = v[order], nm[order]
        n = len(v)
        if n < 2:
            return empty
        new_seg = np.r_[True, v[1:] != v[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        b_idx = np.arange(total) - np.repeat(block_start, reps) + a_idx + 1
        # map candidate names to a per-bucket byte matrix
        uniq, inv = np.unique(nm, return_inverse=True)
        m, rmat, ln = _byte_mats(uniq)
        ia, ib = inv[a_idx], inv[b_idx]
        keep = ia != ib
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return empty
        # dedupe candidate pairs within the bucket before verifying
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        packed = np.unique(lo * np.int64(len(uniq)) + hi)
        lo, hi = packed // len(uniq), packed % len(uniq)
        la, lb = ln[lo], ln[hi]
        diff = np.abs(la - lb)
        ok = np.zeros(len(lo), bool)
        eq = diff == 0
        if eq.any():
            ok[eq] = (m[lo[eq]] != m[hi[eq]]).sum(axis=1) <= 1
        d1 = diff == 1
        if d1.any():
            big = np.where(la[d1] > lb[d1], lo[d1], hi[d1])
            sml = np.where(la[d1] > lb[d1], hi[d1], lo[d1])
            pref = (m[big] == m[sml]).cumprod(axis=1).sum(axis=1)
            suf = (rmat[big] == rmat[sml]).cumprod(axis=1).sum(axis=1)
            ok[d1] = pref + suf >= ln[sml]
        lo, hi = lo[ok], hi[ok]
        if len(lo) == 0:
            return empty
        na, nb = uniq[lo], uniq[hi]
        swap = na > nb
        na2 = np.where(swap, nb, na)
        nb2 = np.where(swap, na, nb)
        joined = np.char.add(np.char.add(na2.astype(str), "|"),
                             nb2.astype(str))
        pb = np.abs(hash62_batch(joined.tolist())) % np.int64(64)
        return pd.DataFrame({"name_a": na2, "name_b": nb2, "pb": pb})

    def pair_distinct(g: pd.DataFrame) -> pd.DataFrame:
        # a lev-1 pair shares exactly one variant STRING (the deletion at
        # the mismatch position, or the shorter name itself), so duplicates
        # can only arise within one bucket — this pass enforces it anyway,
        # cheaply, on the int-bucketed pair stream (a string-pair groupby
        # here measured ~10x the cost of the whole candidate join)
        a = g["name_a"].to_numpy()
        b = g["name_b"].to_numpy()
        joined = np.char.add(np.char.add(a.astype(str), "|"), b.astype(str))
        _, first = np.unique(joined, return_index=True)
        first.sort()
        return pd.DataFrame({"name_a": a[first], "name_b": b[first]})

    pairs = (
        variants.groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("pb")  # cross-bucket duplicates collapse (int-key shuffle)
        .map_groups(pair_distinct, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("name_a", "ascending"), ("name_b", "ascending")]
        )
        t = t.take(idx)
        return pa.table(
            {
                "name_a": pc.cast(t.column("name_a"), pa.string()),
                "name_b": pc.cast(t.column("name_b"), pa.string()),
            }
        )

    # result scale = |lev-1 pairs| (linkage output, not corpus scale)
    return pairs.repartition(1).map_batches(finish, batch_format="pyarrow")


def cluster_size_histogram(sf_dir: str, max_iters: int = 64,
                           label_backend: str = "profile"):
    """Duplicate-cluster SIZE histogram — the capacity-planning readout of
    cluster resolution: how many 2-doc near-dup pairs vs how many
    template blobs about to collapse hundreds of docs into one canonical.
    Composes over ``duplicate_clusters`` (same memoized pair table, same
    label backend selection), so it adds only node-scale work.

    Output: (cluster_size, n_clusters), both int64.
    """
    labels = duplicate_clusters_cached(sf_dir, max_iters=max_iters,
                                       label_backend=label_backend)
    if isinstance(labels, pa.Table):
        # broadcast backend: node-scale driver table (clustered docs only)
        _, sizes = np.unique(
            labels.column("cluster_id").to_numpy(), return_counts=True
        )
        vals, cnts = np.unique(sizes, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(vals.astype(np.int64)),
                "n_clusters": pa.array(cnts.astype(np.int64)),
            }
        )
    # join backend: labels are dataset-resident; two small groupbys
    from ray.data.aggregate import Count

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster_size": pc.cast(t.column("n_"), pa.int64()),
                "n_clusters": pc.cast(t.column("n_c"), pa.int64()),
            }
        )

    return (
        labels.groupby("cluster_id")
        .aggregate(Count(alias_name="n_"))
        .groupby("n_")
        .aggregate(Count(alias_name="n_c"))
        .map_batches(finish, batch_format="pyarrow")
    )


def clustering_coefficient(sf_dir: str, num_buckets: int = 64):
    """Per-node local-clustering readout over the near-duplicate pair graph:
    the joint (degree, triangles-through-node) histogram. Kept integer on
    purpose — local clustering coefficient is 2*n_tri/(degree*(degree-1)),
    and emitting the integer terms keeps the oracle exact while letting
    the consumer bin the ratio however it wants.

    Scale shape: same apex-bucketed wedge enumeration as ``triangle_count``
    (one shuffle of the sparse edge list, triangular-index wedge expansion,
    packed-edge binary-search closure), but each CLOSED wedge credits all
    three corners, so buckets emit per-node partial triangle counts
    (np.unique-compressed). Degrees ride the same union as zero-triangle
    carriers; one groupby-sum per node, then a pre-counted histogram
    shuffle of one row per (bucket, degree, n_tri).

    Output: (degree, n_tri, n_nodes), all int64.
    """
    import ray
    from ray.data.aggregate import Sum

    pairs = simhash_pairs_cached(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    ).materialize()

    from ..functions.tables import concat_nonempty

    edge_refs = pairs.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(
                    (t.column("doc_a").to_numpy() << 31)
                    | t.column("doc_b").to_numpy()
                )
            }
        ),
        batch_format="pyarrow",
    ).to_arrow_refs()
    packed = np.sort(
        concat_nonempty(
            ray.get(edge_refs), {"k": pa.int64()}
        ).column("k").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    packed_ref = ray.put(packed)

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        bucket = np.abs((a * np.int64(2654435761)) % np.int64(num_buckets))
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g):
        import pandas as pd

        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        # degree partials: each oriented edge credits both endpoints
        dn, dc = np.unique(np.r_[a, b], return_counts=True)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        n = len(a)
        tri_nodes = np.array([], dtype=np.int64)
        if n >= 2:
            new_seg = np.ones(n, dtype=bool)
            new_seg[1:] = a[1:] != a[:-1]
            starts = np.flatnonzero(new_seg)
            seg_of = np.cumsum(new_seg) - 1
            cnt = np.diff(np.r_[starts, n])
            local = np.arange(n) - starts[seg_of]
            reps = cnt[seg_of] - 1 - local
            total = int(reps.sum())
            if total:
                i_idx = np.repeat(np.arange(n), reps)
                block_start = np.r_[0, np.cumsum(reps)[:-1]]
                j_idx = np.arange(total) - np.repeat(block_start, reps) + i_idx + 1
                cand = (b[i_idx] << 31) | b[j_idx]
                edges = ray.get(packed_ref)
                pos = np.searchsorted(edges, cand)
                closed = (pos < len(edges)) & (
                    edges[np.minimum(pos, len(edges) - 1)] == cand
                )
                # a closed wedge (apex, bi, bj) is one triangle; credit all
                # three corners — each triangle a<b<c is enumerated exactly
                # once (at apex a), so corner credits are exact
                tri_nodes = np.r_[
                    a[i_idx][closed], b[i_idx][closed], b[j_idx][closed]
                ]
        tn, tc = np.unique(tri_nodes, return_counts=True)
        node = np.r_[dn, tn]
        return pd.DataFrame(
            {
                "node": node,
                "deg": np.r_[dc.astype(np.int64), np.zeros(len(tn), np.int64)],
                "tri": np.r_[np.zeros(len(dn), np.int64), tc.astype(np.int64)],
                # second-stage routing key: all partials of a node co-locate
                "nbucket": np.abs(
                    (node * np.int64(2654435761)) % np.int64(num_buckets)
                ),
            }
        )

    def per_node_bucket(g):
        # per-node sums + histogram partial in ONE vectorized pass — avoids
        # a node-scale sort-based aggregate (measured 3x slower at sf0.1)
        import pandas as pd

        node = g["node"].to_numpy()
        order = np.argsort(node, kind="mergesort")
        node = node[order]
        deg = g["deg"].to_numpy()[order]
        tri = g["tri"].to_numpy()[order]
        new = np.ones(len(node), dtype=bool)
        new[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(new)
        d_sum = np.add.reduceat(deg, starts)
        t_sum = np.add.reduceat(tri, starts)
        key = (d_sum << 32) + t_sum  # per-node tri < 2^32
        vals, cnts = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "degree": vals >> 32,
                "n_tri": vals & ((np.int64(1) << 32) - 1),
                "n": cnts.astype(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "degree": pc.cast(t.column("degree"), pa.int64()),
                "n_tri": pc.cast(t.column("n_tri"), pa.int64()),
                "n_nodes": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("nbucket")
        .map_groups(per_node_bucket, batch_format="pandas")
        .groupby(["degree", "n_tri"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(finish, batch_format="pyarrow")
    )


def dup_graph_bfs_depths(sf_dir: str, max_iters: int = 64):
    """Multi-source BFS depth histogram over the near-duplicate graph: the
    hop distance from every clustered doc to its cluster's CANONICAL
    (min-id) doc. This is the radius readout of cluster resolution — depth
    1 means direct near-dups of the canonical; a long tail means chained
    templates that transitively collapsed (and that a pairwise-only dedup
    would have missed).

    Algorithm: distance relaxation — seeds (canonicals, from the same
    min-label closure as ``duplicate_clusters``) start at 0, every round
    each edge proposes dist[src]+1 to dst, rounds are bounded by the graph
    diameter. Scale shape mirrors the CC broadcast backend: the edge table
    stays distributed and is scanned once per round; node ids ship once;
    the return leg is DELTA-ONLY (batches emit just improvements), so
    driver traffic decays as the frontier empties; convergence = an empty
    delta. Every clustered node is reachable from its canonical by
    construction, so all depths are finite.

    Output: (depth, n_nodes), both int64.
    """
    import ray

    labels = duplicate_clusters_cached(sf_dir, max_iters=max_iters,
                                       label_backend="broadcast")
    nodes = labels.column("doc_id").to_numpy()
    canon = labels.column("cluster_id").to_numpy()
    order = np.argsort(nodes)
    nodes, canon = nodes[order], canon[order]
    sent = np.iinfo(np.int64).max
    dist = np.where(nodes == canon, 0, sent).astype(np.int64)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    edges = (
        simhash_pairs_cached(sf_dir)
        .map_batches(sym, batch_format="pyarrow")
        .materialize()
    )
    nodes_ref = ray.put(nodes)

    for _ in range(max_iters):
        dist_ref = ray.put(dist)

        def prop(batch: pa.Table, dist_ref=dist_ref) -> pa.Table:
            nds = ray.get(nodes_ref)
            dst_arr = ray.get(dist_ref)
            src = batch.column("src").to_numpy()
            dst = batch.column("dst").to_numpy()
            d_src = dst_arr[np.searchsorted(nds, src)]
            ok = d_src < sent  # only settled sources propose
            src, dst, d_src = src[ok], dst[ok], d_src[ok]
            if len(dst) == 0:
                return pa.table(
                    {"node": pa.array([], type=pa.int64()),
                     "cand": pa.array([], type=pa.int64())}
                )
            order = np.argsort(dst, kind="stable")
            d, c = dst[order], d_src[order] + 1
            starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
            node = d[starts]
            cand = np.minimum.reduceat(c, starts)
            keep = cand < dst_arr[np.searchsorted(nds, node)]
            return pa.table({"node": node[keep], "cand": cand[keep]})

        parts = edges.map_batches(prop, batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        cand = parts.groupby("node")["cand"].min()
        idx = np.searchsorted(nodes, cand.index.to_numpy())
        new = dist.copy()
        np.minimum.at(new, idx, cand.to_numpy())
        if (new == dist).all():
            break
        dist = new

    vals, cnts = np.unique(dist, return_counts=True)
    return pa.table(
        {
            "depth": pa.array(vals.astype(np.int64)),
            "n_nodes": pa.array(cnts.astype(np.int64)),
        }
    )


# ------------------------------------------- blocked edit-distance histogram
def name_edit_histogram(sf_dir: str, max_group_names: int | None = None):
    """Within-brand Levenshtein distance histogram over part names: for
    every unordered pair of parts sharing a brand (the blocking key), the
    unit-cost edit distance between their names, reduced to
    (dist, n_pairs). The linkage-tuning readout that complements
    ``typo_neighbor_pairs`` (which ENUMERATES distance-1 pairs): this one
    shows the whole distance mass so a threshold can be chosen.

    Scale shape — value compression before the quadratic step: names are
    first collapsed to DISTINCT (brand, name, count) rows (per-batch
    combiner + one bounded groupby; the distinct-name domain is
    vocabulary-scale, not corpus-scale), so the pair kernel runs over
    distinct-name pairs weighted by count products: cnt_a*cnt_b for
    cross-name pairs, C(cnt,2) at distance 0 for same-name pairs. A brand
    with D distinct names costs O(D^2 * L^2 / 8) vectorized cells
    regardless of how many million parts carry those names.
    ``max_group_names`` caps D per brand for adversarial vocabularies
    (None = exact, the oracle default; capped mode drops the
    LEAST-frequent names first, deterministically tie-broken by name).

    Kernel: batched DP — one (n_pairs,)-wide vector per DP cell, iterating
    the (len_a x len_b) grid of the two padded byte matrices; ~L^2
    vectorized steps per brand, never a Python loop over pairs.

    Output: (dist, n_pairs) — both int64.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"brand": batch.column("p_brand"),
             "name": batch.column("p_name"),
             "cnt": pa.array(np.ones(len(batch), dtype=np.int64))}
        )
        return t.group_by(["brand", "name"]).aggregate([("cnt", "sum")])

    names = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_name"])
        )
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(["brand", "name"])
        .aggregate(Sum("cnt_sum", alias_name="cnt"))
    )

    def per_brand(g: "pd.DataFrame") -> "pd.DataFrame":
        name = g["name"].to_numpy()
        cnt = g["cnt"].to_numpy().astype(np.int64)
        if max_group_names is not None and len(name) > max_group_names:
            keep = np.lexsort((name, -cnt))[:max_group_names]
            name, cnt = name[keep], cnt[keep]
        # distance-0 mass: same-name unordered pairs
        out = {0: int((cnt * (cnt - 1) // 2).sum())}
        n = len(name)
        if n > 1:
            enc = [s.encode("utf-8") for s in name]
            maxlen = max(len(b) for b in enc)
            mat = np.zeros((n, maxlen), dtype=np.uint8)
            lens = np.empty(n, dtype=np.int64)
            for i, b in enumerate(enc):
                mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
                lens[i] = len(b)
            iu, ju = np.triu_indices(n, k=1)
            a, b = mat[iu], mat[ju]
            la, lb = lens[iu], lens[ju]
            npairs = len(iu)
            prev = np.broadcast_to(
                np.arange(maxlen + 1, dtype=np.int32), (npairs, maxlen + 1)
            ).copy()
            res = np.empty(npairs, dtype=np.int64)
            res[la == 0] = lb[la == 0]  # degenerate: empty left string
            for i in range(1, maxlen + 1):
                cur = np.empty_like(prev)
                cur[:, 0] = i
                ai = a[:, i - 1][:, None]
                cost = (ai != b).astype(np.int32)
                for j in range(1, maxlen + 1):
                    cur[:, j] = np.minimum(
                        np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                        prev[:, j - 1] + cost[:, j - 1],
                    )
                hit = la == i
                if hit.any():
                    res[hit] = cur[hit, lb[hit]]
                prev = cur
            w = cnt[iu] * cnt[ju]
            order = np.argsort(res, kind="stable")
            r, wsorted = res[order], w[order]
            starts = np.r_[0, np.flatnonzero(r[1:] != r[:-1]) + 1]
            for d, s in zip(r[starts], np.add.reduceat(wsorted, starts)):
                out[int(d)] = out.get(int(d), 0) + int(s)
        if out.get(0, 0) == 0:
            out.pop(0, None)
        ds = sorted(out)
        return pd.DataFrame(
            {"dist": pd.Series(ds, dtype=np.int64),
             "n_pairs": pd.Series([out[d] for d in ds], dtype=np.int64)}
        )

    return (
        names.groupby("brand")
        .map_groups(per_brand, batch_format="pandas")
        .groupby("dist")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


# ---------------------------------------------------- bounded k-core peeling
def kcore_peel_counts(sf_dir: str, k: int = 2, rounds: int = 3):
    """Bounded k-core peeling over the near-duplicate graph: ``rounds``
    synchronous rounds of removing every node whose REMAINING degree is
    below ``k``, reporting how many nodes each round peels and how many
    survive. The dense-core detector: nodes surviving 2-core peeling sit
    in cycles of mutual near-duplication (template families), while peeled
    nodes hang off the core in chains — exactly the split a curator wants
    before deciding which cluster members to keep.

    Semantics are BOUNDED-ROUND by construction (not peel-to-fixpoint):
    both this implementation and the oracle run exactly ``rounds`` peel
    steps, so the two are comparable even on adversarial chain graphs
    where fixpoint depth is O(n).

    Scale shape (mirrors the CC/BFS broadcast backend): the symmetrized
    edge table stays distributed and is scanned once per round; the node
    id vector ships once; each round ships one alive-bitmap broadcast
    (1 bit/node) and pulls batch-compressed (node, partial-degree) rows.
    Driver state is node-scale — above the ~20M-node threshold the
    join-backend analog of ``_clusters_label_join`` applies (degrees via
    dataset groupby, removal via semi-join), at the cost of one extra
    shuffle per round.

    Output: (stage, n_nodes), both int64 — stage r in 1..rounds = nodes
    peeled in round r, stage 0 = survivors after the final round.
    """
    import ray

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    edges = (
        simhash_pairs_cached(sf_dir)
        .map_batches(sym, batch_format="pyarrow")
        .materialize()
    )

    def node_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"node": np.unique(batch.column("src").to_numpy())})

    nodes_df = edges.map_batches(node_partial, batch_format="pyarrow").to_pandas()
    nodes = np.unique(nodes_df["node"].to_numpy()) if len(nodes_df) else \
        np.array([], dtype=np.int64)
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    alive = np.ones(n, dtype=bool)
    peeled = np.zeros(rounds, dtype=np.int64)
    for r in range(rounds):
        if n == 0 or not alive.any():
            break
        alive_ref = ray.put(alive)

        def deg_partial(batch: pa.Table, alive_ref=alive_ref) -> pa.Table:
            nds = ray.get(nodes_ref)
            alv = ray.get(alive_ref)
            src = batch.column("src").to_numpy()
            dst = batch.column("dst").to_numpy()
            ia = np.searchsorted(nds, src)
            ib = np.searchsorted(nds, dst)
            ok = alv[ia] & alv[ib]
            ia = ia[ok]
            if len(ia) == 0:
                return pa.table(
                    {"idx": pa.array([], type=pa.int64()),
                     "c": pa.array([], type=pa.int64())}
                )
            idx, c = np.unique(ia, return_counts=True)
            return pa.table({"idx": idx.astype(np.int64),
                             "c": c.astype(np.int64)})

        parts = edges.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
        deg = np.zeros(n, dtype=np.int64)
        if len(parts):
            np.add.at(deg, parts["idx"].to_numpy(), parts["c"].to_numpy())
        rm = alive & (deg < k)
        peeled[r] = int(rm.sum())
        if peeled[r] == 0:
            break
        alive &= ~rm

    stages = np.r_[np.arange(1, rounds + 1), 0].astype(np.int64)
    counts = np.r_[peeled, int(alive.sum()) if n else 0].astype(np.int64)
    return pa.table({"stage": pa.array(stages), "n_nodes": pa.array(counts)})


# ------------------------------------------------- degree assortativity terms
def assortativity_terms(sf_dir: str):
    """Degree-assortativity TERMS of the near-duplicate graph: the exact
    integer sums from which the Pearson degree-degree correlation is
    assembled (r = (m*Sxy - Sx^2) / (m*Sxx - Sx^2) over directed edges;
    by symmetry the x- and y-marginals coincide, so three sums suffice).
    Positive r = big template families link to each other (one dense blob
    to cut); negative r = hub-and-spoke near-dup topology. Terms stay
    integer so the oracle comparison is exact — assembling the float is
    one driver-side division the caller does.

    Scale shape: two scans of the distributed symmetrized edge table — one
    for batch-compressed degree partials (node-scale driver fold, one
    broadcast back, same 20M-node threshold argument as the CC broadcast
    backend with the join analog above it), one for the per-batch term
    partials, which reduce to a single row.

    Output: one row (m_edges, sum_deg, sum_deg_sq, sum_deg_prod), int64.
    """
    import ray

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table({"src": np.r_[a, b], "dst": np.r_[b, a]})

    edges = (
        simhash_pairs_cached(sf_dir)
        .map_batches(sym, batch_format="pyarrow")
        .materialize()
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        idx, c = np.unique(batch.column("src").to_numpy(), return_counts=True)
        return pa.table({"node": idx.astype(np.int64),
                         "c": c.astype(np.int64)})

    parts = edges.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        z = pa.array([0], type=pa.int64())
        return pa.table({"m_edges": z, "sum_deg": z,
                         "sum_deg_sq": z, "sum_deg_prod": z})
    agg = parts.groupby("node")["c"].sum()
    nodes = agg.index.to_numpy()
    deg = agg.to_numpy().astype(np.int64)
    nodes_ref = ray.put(nodes)
    deg_ref = ray.put(deg)

    def term_partial(batch: pa.Table) -> pa.Table:
        nds, dg = ray.get(nodes_ref), ray.get(deg_ref)
        x = dg[np.searchsorted(nds, batch.column("src").to_numpy())]
        y = dg[np.searchsorted(nds, batch.column("dst").to_numpy())]
        return pa.table(
            {
                "m_edges": pa.array([len(x)], type=pa.int64()),
                "sum_deg": pa.array([int(x.sum())], type=pa.int64()),
                "sum_deg_sq": pa.array([int((x * x).sum())], type=pa.int64()),
                "sum_deg_prod": pa.array([int((x * y).sum())],
                                         type=pa.int64()),
            }
        )

    tot = edges.map_batches(term_partial, batch_format="pyarrow").sum(
        ["m_edges", "sum_deg", "sum_deg_sq", "sum_deg_prod"]
    )
    return pa.table(
        {k: pa.array([int(tot[f"sum({k})"])], type=pa.int64())
         for k in ("m_edges", "sum_deg", "sum_deg_sq", "sum_deg_prod")}
    )


# --------------------------------------------- cluster density joint histogram
def cluster_density_histogram(sf_dir: str):
    """Joint (cluster size, internal edge count) histogram over the
    near-duplicate clusters: how many clusters of n members carry m pair
    edges. The shape readout that separates CLIQUE-like template families
    (m = n(n-1)/2 — every member pairwise similar, safe to keep one) from
    CHAIN-like drift clusters (m = n-1 — transitive collapse of gradually
    mutated docs, where keeping one canonical may lose content).

    Scale shape: cluster labels come from ``duplicate_clusters`` (its own
    backends handle scale); the pair table is scanned once with a
    broadcast node->cluster lookup (both endpoints of a pair share a
    cluster by CC construction, so only doc_a is looked up), per-batch
    edge counts combine by cluster, and the driver folds cluster-scale
    partials into the bounded joint histogram.

    Output: (size, n_edges, n_clusters) — all int64.
    """
    import ray

    labels = duplicate_clusters_cached(sf_dir)
    nodes = labels.column("doc_id").to_numpy()
    cl = labels.column("cluster_id").to_numpy()
    order = np.argsort(nodes)
    nodes, cl = nodes[order], cl[order]
    nodes_ref, cl_ref = ray.put(nodes), ray.put(cl)

    def edge_partial(batch: pa.Table) -> pa.Table:
        nds, cls = ray.get(nodes_ref), ray.get(cl_ref)
        c = cls[np.searchsorted(nds, batch.column("doc_a").to_numpy())]
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"cluster_id": u.astype(np.int64),
                         "n": cnt.astype(np.int64)})

    parts = (
        simhash_pairs_cached(sf_dir)
        .map_batches(edge_partial, batch_format="pyarrow")
        .to_pandas()  # cluster-scale, batch-combined
    )
    edges = parts.groupby("cluster_id")["n"].sum()
    sz_id, sz = np.unique(cl, return_counts=True)
    n_edges = edges.reindex(sz_id).to_numpy().astype(np.int64)
    joint = {}
    for s, m in zip(sz, n_edges):
        joint[(int(s), int(m))] = joint.get((int(s), int(m)), 0) + 1
    keys = sorted(joint)
    return pa.table(
        {
            "size": pa.array([k[0] for k in keys], type=pa.int64()),
            "n_edges": pa.array([k[1] for k in keys], type=pa.int64()),
            "n_clusters": pa.array([joint[k] for k in keys],
                                   type=pa.int64()),
        }
    )


# ------------------------------------------------- cross-language dup matrix
def cross_lang_dup_pairs(sf_dir: str):
    """Language matrix of the near-duplicate pairs: for every simhash pair,
    the (lang_a, lang_b) of its endpoints' METADATA language, folded into
    an unordered histogram. Off-diagonal mass is the translated-template
    signal (the same boilerplate shipped in two languages — a dedup pass
    keyed on text alone catches it only when the template swamps the
    translation, which is exactly what this readout quantifies).

    Scale shape: the pair table joins to the documents' (doc_id, lang)
    column twice via the NATIVE hash-shuffle join (pair- and corpus-scale
    sides both stay distributed — no doc-scale broadcast), then the
    bounded lang x lang histogram reduces via per-batch combiners.

    Output: (lang_a, lang_b, n_pairs) with lang_a <= lang_b, int64 count.
    """
    import ray.data as rd

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(None))

    langs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "lang": pc.cast(t.column("lang"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    pairs = simhash_pairs_cached(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_a": pc.cast(t.column("doc_a"), pa.int64()),
                "doc_b": pc.cast(t.column("doc_b"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    withb = pairs.join(
        langs,
        join_type="inner",
        num_partitions=nparts,
        on=("doc_b",),
        right_on=("doc_id",),
        aggregator_ray_remote_args=agg_args,
    ).map_batches(
        lambda t: pa.table(
            {"doc_a": t.column("doc_a"), "lang_b": t.column("lang")}
        ),
        batch_format="pyarrow",
    )

    both = withb.join(
        langs,
        join_type="inner",
        num_partitions=nparts,
        on=("doc_a",),
        right_on=("doc_id",),
        aggregator_ray_remote_args=agg_args,
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        la = batch.column("lang").to_numpy(zero_copy_only=False)
        lb = batch.column("lang_b").to_numpy(zero_copy_only=False)
        lo = np.minimum(la, lb)
        hi = np.maximum(la, lb)
        t = pa.table(
            {
                "lang_a": pa.array(lo, type=pa.string()),
                "lang_b": pa.array(hi, type=pa.string()),
                "n_pairs": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["lang_a", "lang_b"]).aggregate([("n_pairs", "sum")])

    from ray.data.aggregate import Sum

    return (
        both.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang_a", "lang_b"])
        .aggregate(Sum("n_pairs_sum", alias_name="n_pairs"))
    )


# ----------------------------------------------- incremental dedup vs index
def incremental_dedup_matches(sf_dir: str, max_hamming: int = 3,
                              n_bands: int | None = None,
                              new_fraction: float = 0.1):
    """Dedup-against-index — the INCREMENTAL ingestion op a production
    pipeline runs on every new batch: which incoming documents are
    near-duplicates of the EXISTING corpus, without regenerating the full
    pair graph. The corpus split is deterministic: the top
    ``new_fraction`` of the doc_id range plays the incoming batch,
    everything below is the standing index.

    Same banded-LSH completeness contract as ``simhash_pairs`` (pigeonhole
    over max_hamming+1 disjoint bands, exact Hamming verify), but the
    bucket kernel compares NEW x OLD only — never old-vs-old, which is the
    whole point: work is proportional to the incoming batch's candidate
    count, not the standing corpus's pair count. At scale the index side
    is a persisted (band_key, sig) parquet the batch probes into; here
    both sides derive from the one documents table so the oracle can
    replay the split.

    Output: (new_doc, matched_old, n_old_matches) — matched_old = the
    minimum matching index doc, n_old_matches = distinct index docs within
    the Hamming radius sharing >= 1 band. New docs with no match are
    absent (the caller's anti-join keeps them as genuinely-new).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    n_bands = n_bands or (max_hamming + 1)
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"n_bands={n_bands} < max_hamming + 1 = {max_hamming + 1}"
        )
    edges = np.linspace(0, 32, n_bands + 1).astype(np.int64)

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(lambda t: t.replace_schema_metadata(None),
                  batch_format="pyarrow")
    max_id = int(docs.max("doc_id"))
    cut = (max_id + 1) * (100 - int(new_fraction * 100)) // 100

    def band_stage(batch: pa.Table) -> pa.Table:
        sigs = simhash32_batch(batch.column("text").to_pylist()).astype(
            np.uint32
        )
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        n = len(ids)
        keys = np.empty((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            lo, hi = int(edges[b]), int(edges[b + 1])
            val = (sigs >> lo) & np.uint32((1 << (hi - lo)) - 1)
            keys[:, b] = b * (1 << 32) + val.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_bands)),
                "sig": pa.array(np.repeat(sigs.astype(np.int64), n_bands)),
                "is_new": pa.array(
                    np.repeat((ids >= cut).astype(np.int64), n_bands)
                ),
                "band_key": pa.array(keys.ravel()),
            }
        )

    def probe_bucket(g) -> pa.Table:
        empty = pa.table(
            {"new_doc": pa.array([], type=pa.int64()),
             "old_doc": pa.array([], type=pa.int64())}
        )
        bk = g["band_key"].to_numpy()
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        ids = g["doc_id"].to_numpy().astype(np.int64)[order]
        sigs = g["sig"].to_numpy().astype(np.int64).astype(np.uint32)[order]
        new = g["is_new"].to_numpy().astype(bool)[order]
        out_a, out_b = [], []
        seg_starts = np.r_[0, np.flatnonzero(bk[1:] != bk[:-1]) + 1]
        seg_ends = np.r_[seg_starts[1:], len(bk)]
        for s, e in zip(seg_starts, seg_ends):
            nn = np.flatnonzero(new[s:e]) + s
            oo = np.flatnonzero(~new[s:e]) + s
            if len(nn) == 0 or len(oo) == 0:
                continue
            ai = np.repeat(nn, len(oo))
            bi = np.tile(oo, len(nn))
            x = sigs[ai] ^ sigs[bi]
            x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
            x = (x & np.uint32(0x33333333)) + (
                (x >> np.uint32(2)) & np.uint32(0x33333333)
            )
            ham = (
                ((x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F))
                * np.uint32(0x01010101)
            ) >> np.uint32(24)
            keep = ham <= max_hamming
            out_a.append(ids[ai[keep]])
            out_b.append(ids[bi[keep]])
        if not out_a:
            return empty
        return pa.table(
            {"new_doc": pa.array(np.concatenate(out_a)),
             "old_doc": pa.array(np.concatenate(out_b))}
        )

    matches = (
        docs.map_batches(band_stage, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(probe_bucket, batch_format="pandas")
        # a pair found in k shared bands appears k times: collapse first
        .groupby(["new_doc", "old_doc"])
        .aggregate(Count(alias_name="_b"))
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "new_doc": batch.column("new_doc"),
                "matched_old": batch.column("old_doc"),
                "n_old_matches": pa.array(
                    np.ones(len(batch), dtype=np.int64)
                ),
            }
        )
        return t.group_by("new_doc").aggregate(
            [("matched_old", "min"), ("n_old_matches", "sum")]
        )

    from ray.data.aggregate import Sum

    return (
        matches.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("new_doc")
        .aggregate(
            Min("matched_old_min", alias_name="matched_old"),
            Sum("n_old_matches_sum", alias_name="n_old_matches"),
        )
    )




# ----------------------------------------- packed-bitset component kernels
# two_hop_reach / edge_support_histogram / component_diameter_histogram all
# run a per-component kernel after the same (label-tag -> groupby(cluster))
# co-location. Dense float matmuls are the wrong kernel once a template
# family reaches thousands of members (an n^3 sgemm on the sf0.1 giant
# component measured ~50 s single-threaded); these helpers give the
# bitset forms — n x ceil(n/64) uint64 adjacency rows, SWAR popcount, and
# a chunked grouped-OR (the one BFS/semiring primitive all three need) —
# which replace n^3 FLOPs with n*m/64 word-ops and bound per-chunk memory.


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no unpackbits blowup)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _pack_adjacency(ia: np.ndarray, ib: np.ndarray, n: int) -> np.ndarray:
    """(n, ceil(n/64)) uint64 adjacency bitset from undirected edge index
    pairs (no self bits)."""
    w = (n + 63) // 64
    adj = np.zeros((n, w), dtype=np.uint64)
    rows = np.r_[ia, ib]
    cols = np.r_[ib, ia]
    bits = np.left_shift(np.uint64(1), (cols % 64).astype(np.uint64))
    np.bitwise_or.at(adj, (rows, cols // 64), bits)
    return adj


def _or_groups(mat: np.ndarray, dsts: np.ndarray, starts: np.ndarray,
               chunk: int = 262144) -> np.ndarray:
    """OR of mat[dsts] rows per group (groups delimited by ``starts`` into
    ``dsts``), gathering at most ~chunk rows at a time so the fancy-index
    copy stays bounded regardless of component size."""
    res = np.empty((len(starts), mat.shape[1]), dtype=np.uint64)
    i = 0
    total = len(dsts)
    while i < len(starts):
        j = i + 1
        while j < len(starts) and (starts[j] - starts[i]) < chunk:
            j += 1
        end = starts[j] if j < len(starts) else total
        res[i:j] = np.bitwise_or.reduceat(
            mat[dsts[starts[i]:end]], starts[i:j] - starts[i], axis=0
        )
        i = j
    return res


def _component_index(g) -> tuple[np.ndarray, np.ndarray, int]:
    """Local (ia, ib, n) edge index for one component DataFrame."""
    a = g["a"].to_numpy()
    b = g["b"].to_numpy()
    loc = np.unique(np.r_[a, b])
    return np.searchsorted(loc, a), np.searchsorted(loc, b), len(loc)


def _grouped_edges(ia: np.ndarray, ib: np.ndarray):
    """Symmetrized edges sorted by source: (srcs_unique, starts, dsts)."""
    s = np.r_[ia, ib]
    t = np.r_[ib, ia]
    order = np.argsort(s, kind="mergesort")
    s, t = s[order], t[order]
    us, starts = np.unique(s, return_index=True)
    return us, starts, t


# ------------------------------------------------- two-hop reach histogram
def two_hop_reach(sf_dir: str):
    """Friends-of-friends reach over the near-duplicate graph: for every
    node, the number of DISTINCT nodes within <= 2 hops (self excluded),
    histogrammed. The template-family blast-radius profile: a node whose
    2-hop reach vastly exceeds its degree sits one step from a dense
    cluster — the docs a curator must also inspect when pulling it.

    Scale shape: reach never crosses a connected component, and dup
    components are dense template families — enumerating wedges
    (sum(deg^2): 339M at sf0.1, measured) is the WRONG shape, and so is a
    dense n^3 matmul once a family hits thousands of members. Component
    labels come from the memoized ``duplicate_clusters_cached``, each
    edge is tagged via the broadcast node->cluster lookup (both endpoints
    share the label by CC construction), ONE groupby(cluster) co-locates
    each component, and the kernel is a packed-bitset semiring step:
    R_i = A_i | OR_{j in N(i)} A_j (one chunked grouped-OR), reach =
    popcount(R_i minus the self bit) — O(m * n/64) word-ops. The bounded
    (reach, count) histogram folds via repartition(1).

    Output: (reach, n_nodes), both int64, one row per distinct reach.
    """
    import pandas as pd
    import ray

    labels = duplicate_clusters_cached(sf_dir)
    nodes = labels.column("doc_id").to_numpy()
    cl = labels.column("cluster_id").to_numpy()
    order = np.argsort(nodes)
    nodes_ref = ray.put(nodes[order])
    cl_ref = ray.put(cl[order])

    def tag(batch: pa.Table) -> pa.Table:
        nds, cls = ray.get(nodes_ref), ray.get(cl_ref)
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {"cluster_id": cls[np.searchsorted(nds, a)], "a": a, "b": b}
        )

    def component_reach(g: pd.DataFrame) -> pd.DataFrame:
        ia, ib, n = _component_index(g)
        adj = _pack_adjacency(ia, ib, n)
        us, starts, dsts = _grouped_edges(ia, ib)
        r = _or_groups(adj, dsts, starts)  # OR of neighbor rows per node
        r |= adj[us]
        idx = np.arange(n)
        r[idx, idx // 64] &= ~np.left_shift(
            np.uint64(1), (idx % 64).astype(np.uint64)
        )
        reach = _popcount64(r).sum(axis=1).astype(np.int64)
        u, cnt = np.unique(reach, return_counts=True)
        return pd.DataFrame({"reach": u, "n": cnt.astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("reach").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("reach", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "reach": pc.cast(g.column("reach"), pa.int64()),
                "n_nodes": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        simhash_pairs_cached(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(component_reach, batch_format="pandas")
        .repartition(1)  # bounded |distinct reach values| rows per cluster
        .map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------ edge-support (truss) histogram
def edge_support_histogram(sf_dir: str):
    """Per-edge triangle support over the near-duplicate graph: for every
    pair edge (a, b), the number of COMMON neighbors, histogrammed — the
    k-truss building block. Support ~ deg on both ends means the edge sits
    inside a clique-like template family (safe transitive collapse);
    support 0 flags a bridge between families, exactly the edge a curator
    should NOT collapse across.

    Scale shape: same label-tag -> groupby(cluster) co-location as
    two_hop_reach; support for a component's edges is
    popcount(adj_row_a & adj_row_b) over packed uint64 bitsets, chunked
    so the per-edge AND buffer stays bounded — O(m * n/64) word-ops,
    never a wedge materialization or an n^3 matmul. Bounded histogram
    folds via repartition(1).

    Output: (support, n_edges), both int64; one row per distinct support.
    """
    import pandas as pd
    import ray

    labels = duplicate_clusters_cached(sf_dir)
    nodes = labels.column("doc_id").to_numpy()
    cl = labels.column("cluster_id").to_numpy()
    order = np.argsort(nodes)
    nodes_ref = ray.put(nodes[order])
    cl_ref = ray.put(cl[order])

    def tag(batch: pa.Table) -> pa.Table:
        nds, cls = ray.get(nodes_ref), ray.get(cl_ref)
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {"cluster_id": cls[np.searchsorted(nds, a)], "a": a, "b": b}
        )

    def component_support(g: pd.DataFrame) -> pd.DataFrame:
        ia, ib, n = _component_index(g)
        adj = _pack_adjacency(ia, ib, n)
        sup = np.empty(len(ia), dtype=np.int64)
        step = max(1, 262144 // max(1, adj.shape[1]))
        for c in range(0, len(ia), step):
            sup[c:c + step] = _popcount64(
                adj[ia[c:c + step]] & adj[ib[c:c + step]]
            ).sum(axis=1)
        u, cnt = np.unique(sup, return_counts=True)
        return pd.DataFrame({"support": u, "n": cnt.astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("support").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("support", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "support": pc.cast(g.column("support"), pa.int64()),
                "n_edges": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        simhash_pairs_cached(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(component_support, batch_format="pandas")
        .repartition(1)  # bounded |distinct support values| rows per cluster
        .map_batches(finish, batch_format="pyarrow")
    )


# --------------------------------------------- component diameter histogram
def component_diameter_histogram(sf_dir: str, rounds: int = 8):
    """BFS diameter of every near-duplicate component, bounded at
    ``rounds`` (components still expanding after ``rounds`` report
    ``rounds`` — the same bounded-round-by-construction contract as
    kcore_peel_counts, keeping the Ray and SQL sides comparable on
    adversarial chain graphs), histogrammed. The cluster-TOPOLOGY
    readout that complements cluster_density_histogram's edge counts:
    diameter 1 = clique (template family, keep one), diameter at the cap
    = drift chain (transitive collapse loses content between the ends).

    Scale shape: per-component DELTA-FRONTIER BFS over packed bitsets —
    row i holds the set of nodes that have reached i; each synchronous
    round pulls, via one chunked grouped-OR, only over edges whose
    source row changed last round, so work decays with convergence
    exactly like the CC label loop. A row's eccentricity is the round
    its bitset fills; diameter = max eccentricity (cap if any row is
    unfilled after ``rounds``). O(rounds * m * n/64) word-ops worst
    case, a fraction of that on dense families that fill in 2-3 rounds.
    Labels ride the memoized cluster table; the bounded histogram folds
    via repartition(1).

    Output: (diameter, n_components), both int64.
    """
    import pandas as pd
    import ray

    labels = duplicate_clusters_cached(sf_dir)
    nodes = labels.column("doc_id").to_numpy()
    cl = labels.column("cluster_id").to_numpy()
    order = np.argsort(nodes)
    nodes_ref = ray.put(nodes[order])
    cl_ref = ray.put(cl[order])

    def tag(batch: pa.Table) -> pa.Table:
        nds, cls = ray.get(nodes_ref), ray.get(cl_ref)
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {"cluster_id": cls[np.searchsorted(nds, a)], "a": a, "b": b}
        )

    def component_diameter(g: pd.DataFrame) -> pd.DataFrame:
        ia, ib, n = _component_index(g)
        w = (n + 63) // 64
        reached = np.zeros((n, w), dtype=np.uint64)
        idx = np.arange(n)
        bit = np.left_shift(np.uint64(1), (idx % 64).astype(np.uint64))
        reached[idx, idx // 64] = bit
        full = np.full(w, np.uint64(0xFFFFFFFFFFFFFFFF))
        if n % 64:
            full[-1] = (np.uint64(1) << np.uint64(n % 64)) - np.uint64(1)
        srcs = np.r_[ia, ib]
        dsts = np.r_[ib, ia]
        ecc = np.full(n, -1, dtype=np.int64)
        changed = np.ones(n, dtype=bool)
        k = 0
        while k < rounds and changed.any():
            live = changed[dsts]
            if not live.any():
                break
            es, ed = srcs[live], dsts[live]
            o = np.argsort(es, kind="mergesort")
            es, ed = es[o], ed[o]
            us, starts = np.unique(es, return_index=True)
            contrib = _or_groups(reached, ed, starts)
            old = reached[us].copy()
            reached[us] |= contrib
            row_changed = (reached[us] != old).any(axis=1)
            changed = np.zeros(n, dtype=bool)
            changed[us[row_changed]] = True
            k += 1
            isfull = (reached[us] == full).all(axis=1)
            newly = us[isfull & (ecc[us] < 0)]
            ecc[newly] = k
            if (ecc >= 0).all():
                break
        dia = np.int64(rounds) if (ecc < 0).any() else np.int64(ecc.max())
        return pd.DataFrame({"diameter": [dia], "n": [np.int64(1)]})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("diameter").aggregate([("n", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("diameter", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "diameter": pc.cast(g.column("diameter"), pa.int64()),
                "n_components": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        simhash_pairs_cached(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(component_diameter, batch_format="pandas")
        .repartition(1)  # one row per component before the bounded fold
        .map_batches(finish, batch_format="pyarrow")
    )


# -------------------------------------------------------- modularity terms
def modularity_terms(sf_dir: str):
    """Newman modularity TERMS of the connected-component partition over
    the near-duplicate graph: per cluster the internal edge count and
    the degree sum, plus the global edge count riding in every row — the
    exact integers behind Q = sum_c(e_c/m - (deg_c/2m)^2). For a CC
    partition every edge is internal (e_c sums to m), so Q here reads
    as a null-model baseline: a cluster whose deg_c^2/4m^2 term swamps
    e_c/m is a hub-family that LOOKS cohesive only because it is big —
    the one to re-split before canonical selection. Terms stay integer
    so the oracle comparison is exact; the float Q is one consumer-side
    fold.

    Scale shape: labels ride the memoized cluster table (one broadcast
    lookup); ONE scan of the pair table emits batch-combined per-cluster
    (edges, degree) partials; cluster-scale fold on the driver, same
    node-scale threshold argument as the CC backends.

    Output: (cluster_id, n_intra_edges, sum_deg, m_edges), all int64.
    """
    import ray

    labels = duplicate_clusters_cached(sf_dir)
    nodes = labels.column("doc_id").to_numpy()
    cl = labels.column("cluster_id").to_numpy()
    order = np.argsort(nodes)
    nodes_s, cl_s = nodes[order], cl[order]
    nodes_ref, cl_ref = ray.put(nodes_s), ray.put(cl_s)

    def partial(batch: pa.Table) -> pa.Table:
        nds, cls = ray.get(nodes_ref), ray.get(cl_ref)
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        ca = cls[np.searchsorted(nds, a)]
        # both endpoints share the cluster by CC construction; each edge
        # contributes 1 intra edge and 2 degree to its cluster
        u, cnt = np.unique(ca, return_counts=True)
        return pa.table(
            {
                "cluster_id": u.astype(np.int64),
                "e": cnt.astype(np.int64),
                "d": (2 * cnt).astype(np.int64),
            }
        )

    parts = (
        simhash_pairs_cached(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # cluster-scale, batch-combined
    )
    agg = parts.groupby("cluster_id")[["e", "d"]].sum().sort_index()
    m = int(agg["e"].sum())
    return pa.table(
        {
            "cluster_id": pa.array(agg.index.to_numpy(), pa.int64()),
            "n_intra_edges": pa.array(agg["e"].to_numpy(), pa.int64()),
            "sum_deg": pa.array(agg["d"].to_numpy(), pa.int64()),
            "m_edges": pa.array(np.full(len(agg), m), pa.int64()),
        }
    )


# --------------------------------------------- label-propagation communities
def lpa_community_histogram(sf_dir: str, rounds: int = 2,
                            num_buckets: int = 64):
    """Frequency label-propagation communities over the near-duplicate
    graph, bounded at ``rounds`` synchronous rounds (the
    bounded-round-by-construction contract of kcore_peel_counts): labels
    start as node ids, each round every node adopts its neighbors' most
    frequent PREVIOUS-round label (ties -> smallest label), and the final
    community sizes are histogrammed. Unlike connected components
    (duplicate_clusters), LPA can SPLIT a weakly-bridged component —
    exactly the hub-family re-split that modularity_terms flags.

    Scale shape: per round, one edge-table scan emits batch-combined
    (node, label, count) votes, ONE hash(node) bucket groupby resolves
    each node's argmax vote vectorized (sort + drop_duplicates), and
    only the NODE-scale label table returns to the driver for the next
    round's ray.put broadcast — votes never accumulate driver-side. Same
    node-scale threshold argument as the CC broadcast backend.

    Output: (size, n_communities), both int64.
    """
    import pandas as pd
    import ray

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        src = np.r_[a, b]
        return pa.table(
            {
                "src": src,
                "dst": np.r_[b, a],
                "bucket": (src * np.int64(2654435761)) % np.int64(num_buckets),
            }
        )

    edges = (
        simhash_pairs_cached(sf_dir)
        .map_batches(sym, batch_format="pyarrow")
        .materialize()  # scanned once per round
    )

    nodes_df = edges.map_batches(
        lambda t: pa.table({"node": np.unique(t.column("src").to_numpy())}),
        batch_format="pyarrow",
    ).to_pandas()
    nodes = np.unique(nodes_df["node"].to_numpy()) if len(nodes_df) else \
        np.array([], dtype=np.int64)
    nodes_ref = ray.put(nodes)
    labels = nodes.copy()  # l0(v) = v

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["src", "lab"], as_index=False, sort=False)["c"].sum()
        t = t.sort_values(["src", "c", "lab"],
                          ascending=[True, False, True], kind="mergesort")
        t = t.drop_duplicates("src", keep="first")
        return pd.DataFrame(
            {"node": t["src"].to_numpy(), "lab": t["lab"].to_numpy()}
        )

    for _ in range(rounds):
        lab_ref = ray.put(labels)

        def vote(batch: pa.Table, lab_ref=lab_ref) -> pa.Table:
            nds, lbs = ray.get(nodes_ref), ray.get(lab_ref)
            src = batch.column("src").to_numpy()
            lab = lbs[np.searchsorted(nds, batch.column("dst").to_numpy())]
            df = pd.DataFrame({"src": src, "lab": lab})
            g = df.groupby(["src", "lab"], as_index=False, sort=False).size()
            return pa.table(
                {
                    "src": g["src"].to_numpy(),
                    "lab": g["lab"].to_numpy(),
                    "c": g["size"].to_numpy().astype(np.int64),
                    "bucket": (g["src"].to_numpy() * np.int64(2654435761))
                    % np.int64(num_buckets),
                }
            )

        res = (
            edges.map_batches(vote, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(resolve, batch_format="pandas")
            .to_pandas()  # node-scale label table
        )
        new = labels.copy()
        pos = np.searchsorted(nodes, res["node"].to_numpy())
        new[pos] = res["lab"].to_numpy()
        labels = new

    _, sizes = np.unique(labels, return_counts=True)
    u, cnt = np.unique(sizes, return_counts=True)
    return pa.table(
        {
            "size": pa.array(u.astype(np.int64)),
            "n_communities": pa.array(cnt.astype(np.int64)),
        }
    )
