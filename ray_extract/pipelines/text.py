"""Text-analysis pipelines over the ``documents`` table: token counting,
quality scoring, language identification, document fingerprinting.

All thresholds are integer-arithmetic (no float comparisons) and all hashes
are SQL-reproducible, so every query here has an exact DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash62_batch, md5_str
from ..functions.language import MARKER_WORDS, detect_languages_arrow, marker_pattern

STOPWORD_PATTERN = marker_pattern(MARKER_WORDS[0][1])  # en markers as stopwords


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def token_stats(sf_dir: str):
    """Per-document token/char counts (whitespace tokenization)."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_tokens = pc.add(pc.count_substring(text, " "), 1)
        n_chars = pc.utf8_length(text)
        nt = n_tokens.to_numpy().astype(np.int64)
        nc = n_chars.to_numpy().astype(np.int64)
        # ratios as integer parts-per-million: exact in both numpy and SQL
        # (float rounding has banker's-rounding tie hazards; integers don't)
        avg_ppm = (nc - (nt - 1)) * 1_000_000 // nt
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_tokens": pa.array(nt),
                "n_chars": pa.array(nc),
                "avg_token_len_ppm": pa.array(avg_ppm),
            }
        )

    return _docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def quality_scores(sf_dir: str):
    """Quality heuristics: stopword hits, length bounds; integer thresholds
    (is_quality: 15 <= n_tokens <= 120 AND stop_hits * 20 >= n_tokens)."""

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        nt = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        stop = pc.count_substring_regex(text, STOPWORD_PATTERN).to_numpy().astype(np.int64)
        digits = pc.count_substring_regex(text, r"[0-9]").to_numpy().astype(np.int64)
        nc = pc.utf8_length(text).to_numpy().astype(np.int64)
        quality = (nt >= 15) & (nt <= 120) & (stop * 20 >= nt)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_tokens": pa.array(nt),
                "stop_hits": pa.array(stop),
                "digit_chars": pa.array(digits),
                "stop_ratio_ppm": pa.array(stop * 1_000_000 // nt),
                "digit_ratio_ppm": pa.array(digits * 1_000_000 // nc),
                "is_quality": pa.array(quality),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def language_id(sf_dir: str):
    """Marker-word language identification (see functions.language)."""

    def lid(batch: pa.Table) -> pa.Table:
        langs = detect_languages_arrow(batch.column("text").combine_chunks())
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "pred_lang": pa.array(langs, type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(lid, batch_format="pyarrow")


def deterministic_split(sf_dir: str, train_permille: int = 800, val_permille: int = 900):
    """Deterministic train/val/test assignment — the held-out-split operator
    a training-data pipeline needs. The split key is the 62-bit rolling hash
    of the STRING doc id modulo 1000 (content-independent, stable under
    re-sharding, reproducible in SQL — hash parity is pinned by the
    fingerprint oracle): < train_permille -> train, < val_permille -> val,
    else test. Pure map stage: no shuffle, no state, embarrassingly parallel
    at any scale."""

    def assign(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        slots = hash62_batch([str(i) for i in ids.to_pylist()]) % 1000
        split = np.where(
            slots < train_permille, "train",
            np.where(slots < val_permille, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": ids,
                "split_slot": pa.array(slots),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(assign, batch_format="pyarrow")


def quality_filter(sf_dir: str, lang: str = "en", num_buckets: int = 64):
    """Composite C4-style cleaning pipeline: quality rules + language
    selection + exact-dedup first-wins, composed as one streaming pipeline.

    Stage 1 (map_batches, vectorized): score quality (the quality_scores
    rules) and language (marker detector), FILTER failures — so the shuffle
    only carries surviving documents (pre-filter-before-shuffle: at 100 TB
    the dedup exchange is proportional to the clean subset, typically a
    small fraction of the corpus).
    Stage 2 (hash-bucketed dedup): md5(text) exact duplicates collapse to
    the min doc_id, via the int-bucket groupby + vectorized per-bucket
    first-wins (same pattern as merge_bucketed — no per-group Python calls).

    Output: (doc_id, n_tokens, pred_lang) of surviving documents.
    """

    def score_filter(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        nt = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        stop = pc.count_substring_regex(text, STOPWORD_PATTERN).to_numpy().astype(np.int64)
        langs = detect_languages_arrow(text.combine_chunks())
        keep = (nt >= 15) & (nt <= 120) & (stop * 20 >= nt) & (langs == lang)
        idx = np.nonzero(keep)[0]
        texts = text.combine_chunks().take(pa.array(idx))
        hashes = np.array([md5_str(t) for t in texts.to_pylist()], dtype=object)
        bucket = np.array(
            [int(h[:8], 16) % num_buckets for h in hashes], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()).take(pa.array(idx)),
                "n_tokens": pa.array(nt[idx]),
                "pred_lang": pa.array(langs[idx], type=pa.string()),
                "content_hash": pa.array(hashes, type=pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def first_wins(g):
        import pandas as pd

        g = g.sort_values(["content_hash", "doc_id"], kind="mergesort")
        keep = g.drop_duplicates("content_hash", keep="first")
        return pd.DataFrame(
            {
                "doc_id": keep["doc_id"].astype("int64").to_numpy(),
                "n_tokens": keep["n_tokens"].astype("int64").to_numpy(),
                "pred_lang": keep["pred_lang"].to_numpy(),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(score_filter, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_wins, batch_format="pandas")
    )


def top_docs_by_tokens(sf_dir: str, k: int = 20):
    """Distributed sort + limit: top-k documents by token count with a
    deterministic tiebreak (n_tokens desc, doc_id asc)."""
    return (
        token_stats(sf_dir)
        .sort(["n_tokens", "doc_id"], descending=[True, False])
        .limit(k)
        .map_batches(
            lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow"
        )
    )


def distinct_sources(sf_dir: str):
    """Distinct values of one column (ds.unique -> shuffle)."""
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    vals = sorted(strip_schema_metadata(ds).unique("source"))
    import pyarrow as pa_

    return pa_.table({"source": pa_.array(vals, type=pa_.string())})


def corpus_stats(sf_dir: str):
    """Per-source multi-aggregate groupby with a partial-agg combiner: counts
    and sums computed inside map_batches, then a small groupby over partials
    (the pre-aggregate-before-shuffle pattern)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        nt = pc.add(pc.count_substring(batch.column("text"), " "), 1)
        t = pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "tok": pc.cast(nt, pa.int64()),
                "chars": pc.cast(batch.column("n_chars"), pa.int64()),
            }
        )
        return t.group_by("source").aggregate(
            [("n", "sum"), ("tok", "sum"), ("chars", "sum"), ("chars", "max"), ("chars", "min")]
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text", "n_chars"]
    )
    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("source").aggregate(
        Sum("n_sum", alias_name="n_docs"),
        Sum("tok_sum", alias_name="total_tokens"),
        Sum("chars_sum", alias_name="total_chars"),
        Max("chars_max", alias_name="max_chars"),
        Min("chars_min", alias_name="min_chars"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
                "total_tokens": pc.cast(t.column("total_tokens"), pa.int64()),
                "total_chars": pc.cast(t.column("total_chars"), pa.int64()),
                "max_chars": pc.cast(t.column("max_chars"), pa.int64()),
                "min_chars": pc.cast(t.column("min_chars"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def fingerprints(sf_dir: str):
    """Document fingerprints: 62-bit polynomial rolling hash + md5."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                # vectorized rolling hash (functions/hashing.hash62_batch);
                # md5 stays hashlib — ONE C call per document is not a hot loop
                "fp62": pa.array(hash62_batch(texts), type=pa.int64()),
                "fp_md5": pa.array([md5_str(t) for t in texts], type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")
