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
    md5_str,
    minhash_signature,
    simhash32,
    word_shingles,
)


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------- exact dedup
def exact_dedup(sf_dir: str):
    """Hash-partitioned exact dedup: md5(text) groups, keep min doc_id."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [md5_str(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("content_hash", pa.array(hashes, type=pa.string()))

    ds = _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------- n-gram Jaccard
def _shingle_stage(k: int):
    def shingles(batch: pa.Table) -> pa.Table:
        doc_ids, shs, sizes = [], [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            s = word_shingles(text, k)
            for sh in s:
                doc_ids.append(did)
                shs.append(sh)
                sizes.append(len(s))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "shingle": pa.array(shs, type=pa.string()),
                "n_sh": pa.array(sizes, type=pa.int64()),
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


def _bucket_pairs(join_cols: list[str], carry: list[str]):
    """Vectorized within-bucket self-join: all (doc_a < doc_b) pairs sharing
    the join_cols value. One pandas merge per BUCKET (a few dozen calls total)
    instead of one Python call per distinct key (tens of thousands)."""

    def pairs(g):
        import pandas as pd

        left = g[join_cols + ["doc_id"] + carry]
        m = left.merge(left, on=join_cols, suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = pd.DataFrame(
            {"doc_a": m["doc_id_a"].to_numpy(), "doc_b": m["doc_id_b"].to_numpy()}
        )
        for c in carry:
            out["na" if c == "n_sh" else c + "_a"] = m[c + "_a"].to_numpy()
            out["nb" if c == "n_sh" else c + "_b"] = m[c + "_b"].to_numpy()
        if out.empty:
            out = out.astype("int64", errors="ignore")
        return out

    return pairs


def ngram_jaccard_pairs(sf_dir: str, k: int = 3, num: int = 1, den: int = 2,
                        num_buckets: int = 64):
    """Pairs with Jaccard(shingles_a, shingles_b) >= num/den (default 1/2),
    verified exactly with integer arithmetic (no float thresholds).

    Candidate generation is an inverted-index self-join: shingles are hash-
    bucketed (the one shuffle) and each bucket does a single vectorized merge.
    Complete for any threshold > 0 (a pair with J > 0 shares a shingle).
    Scale note: stopword-like shingles with huge document frequency explode
    the pair count — production sweeps would cap shingle document frequency
    before pairing (disabled here so the SQL oracle stays exhaustive)."""
    sh = _docs(sf_dir).map_batches(_shingle_stage(k), batch_format="pyarrow")
    sh = sh.map_batches(_add_bucket("shingle", num_buckets), batch_format="pandas")
    pairs = sh.groupby("bucket").map_groups(
        _bucket_pairs(["shingle"], ["n_sh"]), batch_format="pandas"
    )

    # count shared shingles per pair. A multi-key groupby().aggregate() was
    # measured at 360s for 1.3M pair rows (Ray's sort-aggregate over a two-
    # column key); hash-bucketing the PAIR key and aggregating vectorized
    # inside 64 groups does the same in seconds.
    def pair_bucket(df):
        import pandas as pd

        df = df.copy()
        df["pbucket"] = (
            pd.util.hash_pandas_object(
                df["doc_a"] * 2654435761 + df["doc_b"], index=False
            )
            % num_buckets
        ).astype("int64")
        return df

    def agg_bucket(g):
        out = (
            g.groupby(["doc_a", "doc_b"], sort=False)
            .agg(inter=("na", "size"), na=("na", "first"), nb=("nb", "first"))
            .reset_index()
        )
        uni = out["na"] + out["nb"] - out["inter"]
        keep = den * out["inter"] >= num * uni
        out = out[keep]
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_a": out["doc_a"].astype("int64").to_numpy(),
                "doc_b": out["doc_b"].astype("int64").to_numpy(),
                "inter": out["inter"].astype("int64").to_numpy(),
                "uni": uni[keep].astype("int64").to_numpy(),
            }
        )

    return (
        pairs.map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------- MinHash + LSH
def minhash_lsh_pairs(sf_dir: str, k: int = 3, num_perm: int = 16, band_rows: int = 4):
    """Candidate near-duplicate pairs sharing at least one LSH band bucket."""
    def band_stage(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_sigs = [], [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = minhash_signature(word_shingles(text, k), num_perm)
            for b, bs in enumerate(lsh_bands(sig, band_rows)):
                doc_ids.append(did)
                band_ids.append(b)
                band_sigs.append(bs)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band_id": pa.array(band_ids, type=pa.int64()),
                "band_sig": pa.array(band_sigs, type=pa.string()),
            }
        )

    bands = _docs(sf_dir).map_batches(band_stage, batch_format="pyarrow")
    bands = bands.map_batches(_add_bucket("band_sig", 64), batch_format="pandas")
    pairs = bands.groupby("bucket").map_groups(
        _bucket_pairs(["band_id", "band_sig"], []), batch_format="pandas"
    )

    # distinct pairs (a pair can collide in several bands): single-key bucket
    # + vectorized drop_duplicates (multi-key groupby aggregates are slow)
    def pair_bucket(df):
        import pandas as pd

        df = df.copy()
        df["pbucket"] = (
            pd.util.hash_pandas_object(
                df["doc_a"] * 2654435761 + df["doc_b"], index=False
            )
            % 64
        ).astype("int64")
        return df

    return (
        pairs.map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(
            lambda g: g[["doc_a", "doc_b"]].drop_duplicates(), batch_format="pandas"
        )
    )


# ------------------------------------------------------------------- SimHash
def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Pairs of documents whose 32-bit simhash signatures differ in at most
    ``max_hamming`` bits. Signatures are broadcast (ray.put) once; each batch
    compares its rows against the full vector with vectorized XOR + popcount."""
    import ray

    def sig_stage(batch: pa.Table) -> pa.Table:
        sigs = [simhash32(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "sig": pa.array(sigs, type=pa.int64()),
            }
        )

    sig_ds = _docs(sf_dir).map_batches(sig_stage, batch_format="pyarrow")
    # small side: n_docs x 12 bytes — materialize once and broadcast
    sig_tbl = pa.concat_tables(ray.get(sig_ds.to_arrow_refs()))
    ids = sig_tbl.column("doc_id").to_numpy()
    sigs = sig_tbl.column("sig").to_numpy().astype(np.uint32)
    order = np.argsort(ids, kind="stable")
    ref = ray.put((ids[order], sigs[order]))

    def pair_stage(batch: pa.Table) -> pa.Table:
        all_ids, all_sigs = ray.get(ref)
        a_ids = batch.column("doc_id").to_numpy()
        a_sigs = batch.column("sig").to_numpy().astype(np.uint32)
        x = a_sigs[:, None] ^ all_sigs[None, :]
        ham = np.unpackbits(x.view(np.uint8), axis=-1).reshape(len(a_ids), len(all_ids), -1).sum(-1)
        keep = (ham <= max_hamming) & (a_ids[:, None] < all_ids[None, :])
        ai, bi = np.nonzero(keep)
        return pa.table(
            {
                "doc_a": pa.array(a_ids[ai], type=pa.int64()),
                "doc_b": pa.array(all_ids[bi], type=pa.int64()),
                "hamming": pa.array(ham[ai, bi].astype(np.int64)),
            }
        )

    return sig_ds.map_batches(pair_stage, batch_format="pyarrow")
