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
from ..profile import resolve

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


def top_docs_per_source(sf_dir: str, k: int = 3):
    """Grouped top-k: the k longest documents (by token count) PER source,
    with rank — the per-group analogue of top_docs_by_tokens.

    Scale shape: the per-batch combiner keeps only k rows per source per
    batch (vectorized sort + groupby.head, no Python per group), so the
    shuffle moves at most k x n_sources x n_blocks tiny rows; the final
    per-source reduction is over <= k x n_blocks candidates. Tiebreak is
    deterministic: n_tokens desc, doc_id asc (matches the SQL row_number
    ordering)."""
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["text"].str.count(" ").to_numpy() + 1
        out = pd.DataFrame(
            {
                "source": df["source"],
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": nt.astype("int64"),
            }
        )
        out = out.sort_values(
            ["source", "n_tokens", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        return out.groupby("source", sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "doc_id", "n_tokens", "rk"]]

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return (
        strip_schema_metadata(ds)
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


def bigram_counts(sf_dir: str, k: int = 50):
    """Global top-k bigram counts — the canonical combiner-before-shuffle
    aggregation: bigrams are formed and PARTIALLY counted inside each batch
    (all-Arrow: split_pattern -> boundary mask -> binary_join_element_wise ->
    group_by count, zero Python string ops), so the shuffle moves one row per
    distinct bigram per batch, not one per occurrence. The global reduce is a
    small groupby-sum; top-k with a deterministic tiebreak (n desc, bigram
    asc) via distributed sort + limit over the aggregated (tiny) table."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        # positions j where word j+1 starts a new document are NOT bigrams
        offsets = words.offsets.to_numpy()[1:-1]  # starts of docs 1..D-1
        mask = np.ones(n - 1, dtype=bool)
        mask[offsets - 1] = False
        mask_arr = pa.array(mask)
        left = flat.slice(0, n - 1).filter(mask_arr)
        right = flat.slice(1, n - 1).filter(mask_arr)
        bigram = pc.binary_join_element_wise(left, right, " ")
        t = pa.table({"bigram": bigram})
        part = t.group_by("bigram").aggregate([("bigram", "count")])
        return pa.table(
            {
                "bigram": part.column("bigram"),
                "n": pc.cast(part.column("bigram_count"), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"bigram": t.column("bigram"), "n": pc.cast(t.column("n"), pa.int64())}
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


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


def approx_distinct_hll(sf_dir: str, p: int = 6):
    """HyperLogLog approximate-distinct over md5(text) — the sketch aggregate
    a 100-TB pipeline uses where exact distinct would shuffle every row.

    Scale shape: each batch reduces to AT MOST m = 2**p register rows
    (reg, rho_max) — the sketch is the combiner, so the shuffle moves
    O(m x n_blocks) tiny rows and the final groupby is over m keys. The
    estimate itself is audited against the EXACT distinct count (bucketed
    hash groupby, the dedup_exact path) recall-gate style: the output is one
    row (exact_n, est_n, err_ppm), so correctness of the sketch math — not
    just row plumbing — is oracle-checked.

    Determinism note (why this has an EXACT SQL oracle): registers use the
    top p bits of the first 64 md5 bits; rho = leading-zeros + 1 of the
    remaining 58 bits (integer searchsorted, no float log); the harmonic sum
    is kept as the INTEGER sum of 2**(59 - rho), so the only float ops are
    one multiply chain and one division, written in the same literal order
    here and in SQL (IEEE-deterministic), with floor(x + 0.5) rounding on
    both sides (Python round() is banker's; SQL round() is half-away).
    Raw HLL estimate, no small-range linear-counting correction — documented
    bias below ~2.5m distincts is part of the pinned semantics.
    """
    import hashlib

    from ray.data.aggregate import Max

    m = 1 << p
    shift = 64 - p
    powers = np.uint64(1) << np.arange(shift, dtype=np.uint64)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        digs = b"".join(hashlib.md5(t.encode()).digest()[:8] for t in texts)
        h64 = np.frombuffer(digs, dtype=">u8").astype(np.uint64)
        reg = (h64 >> np.uint64(shift)).astype(np.int64)
        rem = h64 & np.uint64((1 << shift) - 1)
        bitlen = np.searchsorted(powers, rem, side="right")
        rho = (shift + 1 - bitlen).astype(np.int64)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, reg, rho)
        present = regs > 0
        return pa.table(
            {
                "reg": pa.array(np.arange(m, dtype=np.int64)[present]),
                "rho": pa.array(regs[present]),
            }
        )

    hll = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
    )
    regs_df = hll.to_pandas()  # <= m rows reach the driver
    from .dedup import exact_dedup

    exact_n = exact_dedup(sf_dir).count()
    ssum = int(sum(1 << (shift + 1 - int(r)) for r in regs_df["rho"]))
    nregs = len(regs_df)
    denom = ssum + (m - nregs) * (1 << (shift + 1))
    scale = float(1 << (shift + 1))
    est_n = int(np.floor(0.709 * (m * m) * scale / float(denom) + 0.5))
    err_ppm = abs(est_n - exact_n) * 1_000_000 // exact_n
    return pa.table(
        {
            "exact_n": pa.array([exact_n], type=pa.int64()),
            "est_n": pa.array([est_n], type=pa.int64()),
            "err_ppm": pa.array([err_ppm], type=pa.int64()),
        }
    )


def tfidf_top_terms(sf_dir: str, k: int = 5, vocab_backend: str = "profile",
                    broadcast_vocab_limit: int = 20_000_000):
    """Top-k TF-IDF-scored terms per source — the vocabulary-building /
    keyword-extraction operator of a training-data pipeline.

    score_ppm = tf(source, term) * 10^6 // df(term): term frequency within
    the source, penalized by the term's corpus-wide document frequency.
    Integer arithmetic only (no log / float idf), so the DuckDB oracle is
    exact.

    Scale shape, stage by stage:
    1. map_batches (all-Arrow): explode words (split_pattern -> offsets ->
       take), then TWO per-batch combiners — occurrence counts per
       (source, term) and distinct-doc counts per (source, term). Because a
       document never spans batches and has exactly one source, summing
       per-batch distinct-doc counts over batches AND sources gives the
       exact global df. The shuffle moves one row per distinct (source,
       term) per block, never one per occurrence.
    2. One groupby (source, term) -> exact tf and per-source df partials.
       The result is vocabulary-sized (|terms| x |sources| upper bound,
       zipf-bounded in practice) — materialized ONCE so the df reduction
       and the join don't recompute the corpus scan.
    3. groupby(term) over that aggregate -> df(term), joined back onto the
       distributed (source, term, tf) aggregate. ``vocab_backend`` picks
       the join strategy: "broadcast" (df table via ``ray.put`` once,
       zero-copy ``ray.get`` + Arrow hash join per batch — a zipf-small
       vocabulary beats a shuffle), "join" (a native hash-shuffle
       ``Dataset.join`` on the term — the path for web-scale vocabularies
       that exceed driver/worker RAM; NOTHING vocabulary-scale is ever
       collected), or "auto" (broadcast below ``broadcast_vocab_limit``
       (source x term) aggregate rows, join above).
       (Ray 2.49 join edge, relevant to tiny inputs only: the join schema
       reaches aggregators with each input's first block, and groupby
       outputs can START with an empty block — partitions that then
       receive no rows can finalize column-less. Ample vocabularies —
       exactly when "join" is selected — populate every partition.)
    4. Grouped top-k with the same combiner shape as top_docs_per_source:
       per-batch head(k) per source, final per-source reduction over
       <= k x n_blocks candidate rows. Tiebreak: score desc, term asc.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def explode_partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        per_doc = np.diff(words.offsets.to_numpy())
        idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), per_doc))
        t = pa.table(
            {
                "doc": pc.take(pc.cast(batch.column("doc_id"), pa.int64()), idx),
                "source": pc.take(batch.column("source").combine_chunks(), idx),
                "w": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        tf = t.group_by(["source", "w"]).aggregate([("w", "count")])
        dfp = (
            t.group_by(["doc", "source", "w"])
            .aggregate([])
            .group_by(["source", "w"])
            .aggregate([("doc", "count")])
        )
        both = tf.join(dfp, keys=["source", "w"], join_type="inner")
        return pa.table(
            {
                "source": both.column("source"),
                "w": both.column("w"),
                "tf": pc.cast(both.column("w_count"), pa.int64()),
                "df": pc.cast(both.column("doc_count"), pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    agg = (
        strip_schema_metadata(ds)
        .map_batches(explode_partial, batch_format="pyarrow")
        .groupby(["source", "w"])
        .aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
        .materialize()  # vocabulary-sized aggregate, NOT the corpus
    )
    import ray

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score_ppm", "term"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "term", "tf", "df", "score_ppm", "rnk"]]

    vocab_backend = resolve(vocab_backend, "graph_backend")
    if vocab_backend == "auto":
        vocab_backend = (
            "broadcast" if agg.count() <= broadcast_vocab_limit else "join"
        )
    if vocab_backend == "join":
        from .relational import _join_partitions, _multi_join_args

        nparts, agg_args = _multi_join_args(_join_partitions(None))
        voc = (
            agg.groupby("w")
            .aggregate(Sum("df", alias_name="df_total"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "wv": pc.cast(t.column("w"), pa.string()),
                        "df_total": pc.cast(t.column("df_total"), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def score_joined(batch: pa.Table) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "source": batch.column("source").to_pandas(),
                    "term": pc.cast(batch.column("w"), pa.string()).to_pandas(),
                    "tf": pc.cast(batch.column("tf"), pa.int64()).to_numpy(),
                    "df": pc.cast(batch.column("df_total"), pa.int64())
                    .to_numpy(),
                }
            )
            out["score_ppm"] = out["tf"] * 1_000_000 // out["df"]
            out = out.sort_values(
                ["source", "score_ppm", "term"],
                ascending=[True, False, True], kind="mergesort",
            )
            return out.groupby("source", sort=False).head(k)

        return (
            agg.select_columns(["source", "w", "tf"])
            .join(
                voc,
                join_type="inner",
                num_partitions=nparts,
                on=("w",),
                right_on=("wv",),
                aggregator_ray_remote_args=agg_args,
            )
            .map_batches(score_joined, batch_format="pyarrow")
            .groupby("source")
            .map_groups(final, batch_format="pandas")
        )

    voc_pd = agg.groupby("w").aggregate(Sum("df", alias_name="df_total")).to_pandas()
    voc_tbl = pa.table(
        {
            "w": pa.array(voc_pd["w"], type=pa.string()),
            "df_total": pa.array(voc_pd["df_total"].to_numpy().astype(np.int64)),
        }
    )
    voc_ref = ray.put(voc_tbl)

    _EMPTY = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype="int64"),
            "df": pd.Series([], dtype="int64"),
            "score_ppm": pd.Series([], dtype="int64"),
        }
    )

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        if batch.num_columns == 0 or len(batch) == 0:
            return _EMPTY
        dim = ray.get(voc_ref)  # zero-copy from the local object store
        j = pa.table(
            {
                "source": pc.cast(batch.column("source"), pa.string()),
                "w": pc.cast(batch.column("w"), pa.string()),
                "tf": pc.cast(batch.column("tf"), pa.int64()),
            }
        ).join(dim, keys="w", join_type="inner")
        out = pd.DataFrame(
            {
                "source": j.column("source").to_pandas(),
                "term": j.column("w").to_pandas(),
                "tf": j.column("tf").to_numpy(),
                "df": j.column("df_total").to_numpy(),
            }
        )
        out["score_ppm"] = out["tf"] * 1_000_000 // out["df"]
        out = out.sort_values(
            ["source", "score_ppm", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        return out.groupby("source", sort=False).head(k)

    joined = agg.select_columns(["source", "w", "tf"])

    return (
        joined.map_batches(score_partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


def stratified_sample(sf_dir: str):
    """Deterministic per-stratum sampling: each source keeps a different,
    content-independent fraction of its documents — the data-mixing /
    re-weighting operator of a training-data pipeline (e.g. downsample web
    crawl, keep all of wikipedia).

    The keep decision is a pure function of the row: 62-bit rolling hash of
    the salted doc id, modulo 1000, kept iff below the stratum's permille
    rate; the rate itself derives from the source id
    (``(sid * 37) % 900 + 50`` — every stratum keeps 5%..94.9%). Pure
    filter map: no shuffle, no state, stable under re-sharding, and the
    SAME rows survive at any scale or partitioning (exactly reproducible in
    SQL). Output: surviving (doc_id, source, slot, rate_permille).
    """

    def sample(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        src = batch.column("source").combine_chunks()
        slots = hash62_batch(["s:" + str(i) for i in ids.to_pylist()]) % 1000
        sid = pc.cast(pc.utf8_slice_codeunits(src, 3, 32), pa.int64()).to_numpy()
        rate = (sid * 37) % 900 + 50
        keep = pa.array(slots < rate)
        return pa.table(
            {
                "doc_id": ids,
                "source": src,
                "slot": pa.array(slots),
                "rate_permille": pa.array(rate),
            }
        ).filter(keep)

    return _docs_with_source(sf_dir).map_batches(sample, batch_format="pyarrow")


def _docs_with_source(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )


# stopwords scrubbed by stopword_scrub; \b word boundaries are RE2 semantics
# in BOTH pyarrow (replace_substring_regex) and DuckDB (regexp_replace 'g')
STOPWORD_PATTERN = r"\b(the|a|and|of|to|in|is|it|on|for)\b"


def stopword_scrub(sf_dir: str):
    """Stopword removal + whitespace normalization — the text-cleaning
    operator of a training-data pipeline (boilerplate/stopword scrubbing
    before tokenization), fully vectorized and SQL-reproducible.

    Three RE2 kernels per batch, all in Arrow C++ (zero Python string ops):
    count matches (n_removed), global-replace stopwords with '', collapse
    runs of spaces, trim. DuckDB's regexp_* functions are RE2 with identical
    semantics, so the oracle reproduces the cleaned text byte-for-byte.
    Pure per-row map: no shuffle, trivially partition-parallel at any scale.

    Output: (doc_id, clean_text, n_removed, clean_chars).
    """

    def scrub(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        n_removed = pc.count_substring_regex(text, STOPWORD_PATTERN)
        cleaned = pc.replace_substring_regex(text, STOPWORD_PATTERN, "")
        cleaned = pc.replace_substring_regex(cleaned, " {2,}", " ")
        cleaned = pc.utf8_trim(cleaned, " ")
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "clean_text": cleaned,
                "n_removed": pc.cast(n_removed, pa.int64()),
                "clean_chars": pc.cast(pc.utf8_length(cleaned), pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(scrub, batch_format="pyarrow")


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs, each
# optionally glued to one leading space (the GPT-2 pre-tokenizer shape,
# lowercase-ASCII simplified so RE2 behavior is identical in Arrow + DuckDB)
BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def bpe_token_counts(sf_dir: str):
    """Per-document token counts under two tokenizers — whitespace and a
    BPE-ish regex pre-tokenizer (the "how many tokens will training see"
    estimator). Non-overlapping leftmost-first matching is identical
    between pyarrow's count_substring_regex and DuckDB's
    regexp_extract_all, so the oracle is exact. Pure per-row map.

    Output: (doc_id, n_ws_tokens, n_bpe_tokens, bpe_per_100_ws).
    """

    def count(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        n_ws = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        n_bpe = pc.count_substring_regex(text, BPE_PATTERN).to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_ws_tokens": pa.array(n_ws),
                "n_bpe_tokens": pa.array(n_bpe),
                "bpe_per_100_ws": pa.array(n_bpe * 100 // n_ws),
            }
        )

    return _docs(sf_dir).map_batches(count, batch_format="pyarrow")


def sequence_pack(sf_dir: str, bin_tokens: int = 512, shard_docs: int = 256):
    """Greedy sequence packing for training: documents are laid end-to-end
    in doc_id order and cut into fixed ``bin_tokens`` bins — each doc gets
    its global token offset and bin id (the "pack short docs into training
    sequences" operator; a doc starting in bin b at offset o occupies
    [o, o + n_tokens)).

    This is a distributed GLOBAL PREFIX SUM — the one pattern here that
    needs two passes by construction:
    1. combiner pass: per-batch (shard, token_sum) partials, where
       shard = doc_id // shard_docs; the groupby reduces to ONE ROW PER
       SHARD (corpus_size / shard_docs rows — metadata-scale, e.g. 4M rows
       for 10^9 docs at the default).
    2. The exclusive cumsum over shard sums runs on the driver — O(#shards)
       metadata, NOT O(rows); the offsets array ships to stage 3 in the
       task closure (at larger shard counts, ``ray.put`` it).
    3. groupby(shard).map_groups: each shard sorts its docs by doc_id and
       rebases a local cumsum on the shard's global offset. One vectorized
       pass per shard, no per-doc Python.

    Output: (doc_id, n_tokens, offset_start, bin_id); exact int arithmetic
    (oracle = SUM OVER (ORDER BY doc_id)).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def tokens_stage(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        nt = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(nt),
                "shard": pa.array(ids // shard_docs),
            }
        )

    toks = strip_schema_metadata(_docs(sf_dir)).map_batches(
        tokens_stage, batch_format="pyarrow"
    )
    # executed once; reused by the shard-sum pass and the final pass
    toks = toks.materialize()

    def shard_partial(batch: pa.Table) -> pa.Table:
        return batch.select(["shard", "n_tokens"]).group_by("shard").aggregate(
            [("n_tokens", "sum")]
        )

    shard_sums = (
        toks.map_batches(shard_partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_tokens_sum", alias_name="tok"))
        .to_pandas()  # metadata-scale: one row per shard
        .sort_values("shard")
    )
    csum = shard_sums["tok"].to_numpy().cumsum()
    offsets = dict(
        zip(
            shard_sums["shard"].to_numpy().tolist(),
            np.r_[0, csum[:-1]].tolist(),
        )
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        nt = g["n_tokens"].to_numpy()
        start = int(offsets[int(g["shard"].iloc[0])]) + np.r_[0, nt[:-1].cumsum()]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": nt,
                "offset_start": start,
                "bin_id": start // bin_tokens,
            }
        )

    return toks.groupby("shard").map_groups(per_shard, batch_format="pandas")


def source_vocab_overlap(sf_dir: str, num_buckets: int = 64):
    """Pairwise vocabulary Jaccard between sources — the corpus-mixing
    analysis of a training-data pipeline (which sources carry the same
    content / should be down-weighted together).

    Scale shape:
    1. map_batches combiner: per-batch DISTINCT (source, word) via
       dictionary_encode + packed np.unique (one row per distinct pair per
       block, never one per occurrence).
    2. ONE shuffle on hash(word): every copy of a (source, word) pair lands
       in the same bucket, so the bucket-local distinct + within-word
       source pairing (the same triangular machinery as ``_bucket_pairs``)
       is globally exact. Emits one row per (word, source pair).
    3. Pair counts reduce via a packed-key combiner; per-source vocabulary
       sizes come from a tiny separate aggregate (|sources| rows). The
       final assembly is |sources|^2/2 rows — driver-scale by definition.

    Output: (source_a, source_b, inter, uni, jaccard_ppm), source_a <
    source_b lexicographically; jaccard_ppm = inter * 10^6 // uni.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def distinct_pairs_stage(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = words.values
        per_doc = np.diff(words.offsets.to_numpy())
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), per_doc)
        src_codes, src_vals = pd.factorize(
            batch.column("source").to_pandas(), sort=False
        )
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy().astype(np.int64)
        vocab = enc.dictionary
        keep = pc.not_equal(vocab, "").to_numpy(zero_copy_only=False)
        ok = keep[codes]
        codes, doc_idx = codes[ok], doc_idx[ok]
        src_of = src_codes[doc_idx].astype(np.int64)
        packed = src_of * np.int64(len(vocab)) + codes
        u = np.unique(packed)
        return pa.table(
            {
                "source": pa.array(np.asarray(src_vals)[(u // len(vocab))]),
                "w": pc.take(vocab, pa.array(u % len(vocab))),
            }
        )

    sw = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["source", "text"]
            )
        )
        .map_batches(distinct_pairs_stage, batch_format="pyarrow")
        .map_batches(_bucket_on_word, batch_format="pandas")
    )

    def word_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # bucket-local distinct, then all (source_a < source_b) pairs per word
        g = g.drop_duplicates(["source", "w"])
        codes, words_u = pd.factorize(g["w"], sort=False)
        src = g["source"].to_numpy()
        order = np.argsort(codes, kind="stable")
        codes, src = codes[order], src[order]
        n = len(codes)
        if n < 2:
            return pd.DataFrame({"sa": [], "sb": []}).astype(str)
        new_seg = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"sa": [], "sb": []}).astype(str)
        a_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        b_idx = np.arange(total) - np.repeat(block_start, reps) + a_idx + 1
        sa, sb = src[a_idx], src[b_idx]
        swap = sa > sb
        return pd.DataFrame(
            {"sa": np.where(swap, sb, sa), "sb": np.where(swap, sa, sb)}
        )

    pair_rows = (
        sw.groupby("bucket").map_groups(word_pairs, batch_format="pandas")
    )

    def pair_count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return pa.table(
                {
                    "sa": pa.array([], type=pa.string()),
                    "sb": pa.array([], type=pa.string()),
                    "inter": pa.array([], type=pa.int64()),
                }
            )
        t = pa.table(
            {
                "sa": pc.cast(batch.column("sa"), pa.string()),
                "sb": pc.cast(batch.column("sb"), pa.string()),
            }
        ).group_by(["sa", "sb"]).aggregate([("sa", "count")])
        return pa.table(
            {
                "sa": t.column("sa"),
                "sb": t.column("sb"),
                "inter": pc.cast(t.column("sa_count"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    inter = (
        pair_rows.map_batches(pair_count_partial, batch_format="pyarrow")
        .groupby(["sa", "sb"])
        .aggregate(Sum("inter", alias_name="inter"))
        .to_pandas()  # |sources|^2 / 2 rows
    )

    # per-source vocabulary sizes: bucket-local distinct is global (stage 2)
    sizes = (
        sw.groupby("bucket")
        .map_groups(
            lambda g: g.drop_duplicates(["source", "w"])
            .groupby("source", sort=False)
            .size()
            .rename("nv")
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source")["nv"]
        .sum()
    )

    na = sizes.loc[inter["sa"]].to_numpy().astype(np.int64)
    nb = sizes.loc[inter["sb"]].to_numpy().astype(np.int64)
    iv = inter["inter"].to_numpy().astype(np.int64)
    uni = na + nb - iv
    out = pa.table(
        {
            "source_a": pa.array(inter["sa"], type=pa.string()),
            "source_b": pa.array(inter["sb"], type=pa.string()),
            "inter": pa.array(iv),
            "uni": pa.array(uni),
            "jaccard_ppm": pa.array(iv * 1_000_000 // uni),
        }
    )
    return out


def _bucket_on_word(df):
    import pandas as pd

    df = df.copy()
    df["bucket"] = (
        pd.util.hash_pandas_object(df["w"], index=False) % 64
    ).astype("int64")
    return df


def doc_length_histogram(sf_dir: str, bucket_chars: int = 64):
    """Per-(lang, length-bucket) histogram of document sizes — the
    "what does my corpus look like" profiling query. Bucket = n_chars //
    bucket_chars (integer floor, exact both sides).

    Scale shape: classic combiner — per-batch group_by collapses each block
    to |langs| x |buckets| partial rows before the one small shuffle.

    Output: (lang, bucket_lo, n_docs, sum_tokens).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        nc = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        nt = (
            pc.add(pc.count_substring(batch.column("text"), " "), 1)
            .to_numpy()
            .astype(np.int64)
        )
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "bucket_lo": pa.array((nc // bucket_chars) * bucket_chars),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "tok": pa.array(nt),
            }
        )
        return t.group_by(["lang", "bucket_lo"]).aggregate(
            [("n", "sum"), ("tok", "sum")]
        )

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["lang", "n_chars", "text"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "bucket_lo"])
        .aggregate(Sum("n_sum", alias_name="n_docs"),
                   Sum("tok_sum", alias_name="sum_tokens"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "bucket_lo": pc.cast(t.column("bucket_lo"), pa.int64()),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
                "sum_tokens": pc.cast(t.column("sum_tokens"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def type_token_ratio(sf_dir: str):
    """Per-document vocabulary richness: distinct-word count and
    type/token ratio (integer ppm) — a standard corpus-quality signal
    (low TTR = repetitive/boilerplate text).

    Scale shape: a pure per-batch map (no shuffle at all). The per-doc
    distinct count is ONE vectorized pass over the whole batch: Arrow
    split_pattern -> flat word array -> pandas factorize (C hash table)
    -> pack (row, word_code) into int64 -> np.unique. No Python loop over
    rows or words, and exact (real words, not hashes — no collision risk).

    Output: (doc_id, n_tokens, n_distinct, ttr_ppm).
    """
    import pandas as pd

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(pc.cast(text, pa.string()), " ")
        offsets = words.offsets.to_numpy()
        flat = words.values.to_pandas()  # flat word column
        codes, uniques = pd.factorize(flat, sort=False)
        n = len(batch)
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        packed = row * np.int64(len(uniques) + 1) + codes
        uniq = np.unique(packed)
        n_distinct = np.bincount((uniq // np.int64(len(uniques) + 1)).astype(np.int64),
                                 minlength=n)
        n_tokens = np.diff(offsets).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_tokens": pa.array(n_tokens),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "ttr_ppm": pa.array(n_distinct * 1_000_000 // n_tokens),
            }
        )

    return _docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def keyword_search(sf_dir: str, keyword: str = "spark"):
    """Substring-search hit rate per source: how many documents of each
    source mention ``keyword`` (vectorized Arrow match_substring — the
    same semantics as SQL LIKE '%kw%'), with the hit rate as integer ppm.

    Scale shape: per-batch combiner (|sources| partial rows per block) +
    small groupby; the text column never survives past the first stage.

    Output: (source, n_docs, n_match, match_ppm).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        hit = pc.cast(
            pc.match_substring(batch.column("text"), keyword), pa.int64()
        )
        t = pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "m": hit,
            }
        )
        return t.group_by("source").aggregate([("n", "sum"), ("m", "sum")])

    agg = (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["source", "text"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_sum", alias_name="n_docs"),
                   Sum("m_sum", alias_name="n_match"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_docs"), pa.int64()).to_numpy()
        m = pc.cast(t.column("n_match"), pa.int64()).to_numpy()
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": pa.array(n),
                "n_match": pa.array(m),
                "match_ppm": pa.array(m * 1_000_000 // n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def percentile_length_filter(sf_dir: str, permille: int = 950):
    """Filter documents ABOVE the corpus-wide p{permille/10} token count —
    the scalar-subquery pattern (threshold derived from the data itself)
    done scale-safe in two streaming passes:

    1. EXACT global percentile by counting selection: per-batch value
       counts of n_tokens (bounded domain) -> small groupby -> an
       O(|domain|) histogram on the driver -> one int threshold. No sort,
       no full materialization — the driver holds |distinct n_tokens| rows.
    2. A second pruned scan filters with the broadcast scalar (task
       closure; ``ray.put`` for wider threshold tables).

    Rank rule = DuckDB quantile_disc: smallest value whose cumulative
    count reaches ceil(permille * n / 1000) (pure integer arithmetic).

    Output: (doc_id, n_tokens, thr_tokens).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def counts(batch: pa.Table) -> pa.Table:
        nt = pc.add(pc.count_substring(batch.column("text"), " "), 1)
        t = pa.table(
            {
                "nt": pc.cast(nt, pa.int64()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by("nt").aggregate([("n", "sum")])

    hist = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        )
        .map_batches(counts, batch_format="pyarrow")
        .groupby("nt")
        .aggregate(Sum("n_sum", alias_name="n"))
        .take_all()  # O(|token-count domain|) rows, NOT O(corpus)
    )
    vals = np.array(sorted(h["nt"] for h in hist), dtype=np.int64)
    cnts = np.array([h["n"] for h in sorted(hist, key=lambda h: h["nt"])],
                    dtype=np.int64)
    cum = np.cumsum(cnts)
    total = int(cum[-1])
    rank = (permille * total + 999) // 1000
    thr = int(vals[np.searchsorted(cum, rank)])

    def flt(batch: pa.Table) -> pa.Table:
        nt = pc.add(pc.count_substring(batch.column("text"), " "), 1)
        nt = pc.cast(nt, pa.int64())
        keep = pc.greater_equal(nt, thr)
        t = pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_tokens": nt,
                "thr_tokens": pa.array(
                    np.full(len(batch), thr, dtype=np.int64)
                ),
            }
        )
        return t.filter(keep)

    return _docs(sf_dir).map_batches(flt, batch_format="pyarrow")


def char_trigram_profile(sf_dir: str, prefix_chars: int = 64, k: int = 10):
    """Top-k character trigrams per language — the n-gram profile behind
    classical language-ID models (Cavnar-Trenkle), computed over each
    document's first ``prefix_chars`` characters (ASCII corpus; byte ==
    codepoint — a UTF-8 corpus would slice codepoints first).

    Scale shape: trigram extraction is a ZERO-LOOP byte kernel — the Arrow
    string column's raw (offsets, data) buffers become numpy arrays, every
    window position in the batch is generated with repeat/arange
    arithmetic, and each trigram packs into one int32 (b0<<16|b1<<8|b2).
    Counting is np.unique over (lang_code << 24 | tri) packed keys; the
    only Python loop decodes the batch's UNIQUE trigrams (bounded by the
    alphabet, not the corpus). Shuffle moves (lang, tri) partial counts;
    the final top-k is a per-lang sort of <= |alphabet|^3 rows.

    Output: (lang, tri, n) — k rows per language, ties broken (n desc,
    tri asc).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        arr = pc.utf8_slice_codeunits(pc.cast(text, pa.string()), 0, prefix_chars)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset: arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lens = np.diff(offs)
        n_win = np.maximum(lens - 2, 0)
        total = int(n_win.sum())
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), n_win)
        base = np.repeat(offs[:-1], n_win)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_win) - n_win, n_win
        )
        pos = base + within
        tri = (
            (data[pos].astype(np.int64) << 16)
            + (data[pos + 1].astype(np.int64) << 8)
            + data[pos + 2]
        )
        codes, langs = pd.factorize(batch.column("lang").to_pandas(), sort=False)
        packed = (codes[doc_idx].astype(np.int64) << 24) + tri
        uniq, counts = np.unique(packed, return_counts=True)
        u_tri = uniq & 0xFFFFFF
        # decode loop over UNIQUE trigrams only (alphabet-bounded)
        tris = [
            bytes([(v >> 16) & 255, (v >> 8) & 255, v & 255]).decode("ascii")
            for v in u_tri
        ]
        return pa.table(
            {
                "lang": pa.array(langs[(uniq >> 24).astype(np.int64)],
                                 type=pa.string()),
                "tri": pa.array(tris, type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    counts = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "tri"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["n", "tri"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "lang": g["lang"].to_numpy(),
                "tri": g["tri"].to_numpy(),
                "n": g["n"].astype("int64").to_numpy(),
            }
        )

    return counts.groupby("lang").map_groups(topk, batch_format="pandas")


def oov_bigram_rate(sf_dir: str, vocab_k: int = 500):
    """Out-of-vocabulary bigram rate per document — a cheap fluency /
    domain-shift score (the n-gram-LM idea with integer arithmetic): pass 1
    builds the corpus top-``vocab_k`` bigram vocabulary, pass 2 scores
    every document by the fraction of its bigrams NOT in that vocabulary.

    Scale shape: the vocabulary is the ALREADY-AGGREGATED top-k result
    (``bigram_counts`` — combiner-before-shuffle, deterministic tiebreak),
    so the driver holds k rows, never corpus-scale state; it is broadcast
    once via ``ray.put`` and pass 2 is a pure map stage whose membership
    test is Arrow ``is_in`` (C hash set) with per-doc counts from
    np.bincount over the flat bigram->doc index. Docs with no bigram
    (single-word) emit no row, mirroring the SQL join semantics.

    Output: (doc_id, n_bigrams, n_oov, oov_ppm).
    """
    import ray

    vocab = bigram_counts(sf_dir, k=vocab_k).to_pandas()["bigram"]
    vref = ray.put(pa.array(vocab, type=pa.string()))

    def score(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        offs = words.offsets.to_numpy()
        lens = np.diff(offs)
        n = len(flat)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_bigrams": pa.array([], type=pa.int64()),
                "n_oov": pa.array([], type=pa.int64()),
                "oov_ppm": pa.array([], type=pa.int64()),
            }
        )
        if n < 2:
            return empty
        mask = np.ones(n - 1, dtype=bool)
        mask[offs[1:-1] - 1] = False
        m = pa.array(mask)
        bigrams = pc.binary_join_element_wise(
            flat.slice(0, n - 1).filter(m), flat.slice(1, n - 1).filter(m), " "
        )
        nb = np.maximum(lens - 1, 0)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), nb)
        in_vocab = pc.is_in(bigrams, value_set=ray.get(vref)).to_numpy(
            zero_copy_only=False
        )
        n_oov = np.bincount(doc_idx[~in_vocab], minlength=len(lens)).astype(
            np.int64
        )
        keep = nb >= 1
        nbk, noovk = nb[keep].astype(np.int64), n_oov[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_bigrams": pa.array(nbk),
                "n_oov": pa.array(noovk),
                "oov_ppm": pa.array(noovk * 1_000_000 // nbk),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def repetition_profile(sf_dir: str):
    """Per-document bigram repetition profile — the Gopher-style "repetition
    signal" for training-data quality filtering (a doc whose top bigram
    dominates is boilerplate or spam).

    Scale shape: entirely batch-local (a document's bigrams never leave the
    map task — two chained Arrow C++ group_bys per batch produce one output
    row per doc), so there is NO shuffle at all. Kernel is all-Arrow:
    split_pattern -> offsets boundary mask -> binary_join_element_wise,
    zero Python string ops.

    Output: (doc_id, n_bigrams, top_cnt, n_distinct) for docs with >= 2
    words.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def per_doc(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        did = pc.cast(batch.column("doc_id"), pa.int64())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        n = len(flat)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_bigrams": pa.array([], type=pa.int64()),
                "top_cnt": pa.array([], type=pa.int64()),
                "n_distinct": pa.array([], type=pa.int64()),
            }
        )
        if n < 2:
            return empty
        offsets = words.offsets.to_numpy()
        starts = offsets[:-1]
        # word index -> doc index (vectorized repeat over list lengths)
        doc_idx = np.repeat(
            np.arange(len(batch), dtype=np.int64), np.diff(offsets)
        )
        mask = np.ones(n - 1, dtype=bool)
        mask[starts[1:] - 1] = False  # pairs that straddle a doc boundary
        if not mask.any():
            return empty
        mask_arr = pa.array(mask)
        left = flat.slice(0, n - 1).filter(mask_arr)
        right = flat.slice(1, n - 1).filter(mask_arr)
        bigram = pc.binary_join_element_wise(left, right, " ")
        d_ids = did.to_numpy()[doc_idx[:-1][mask]]
        t = pa.table({"doc_id": pa.array(d_ids), "bigram": bigram})
        per_bg = t.group_by(["doc_id", "bigram"]).aggregate([("bigram", "count")])
        out = per_bg.group_by("doc_id").aggregate(
            [("bigram_count", "sum"), ("bigram_count", "max"),
             ("bigram_count", "count")]
        )
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "n_bigrams": pc.cast(out.column("bigram_count_sum"), pa.int64()),
                "top_cnt": pc.cast(out.column("bigram_count_max"), pa.int64()),
                "n_distinct": pc.cast(out.column("bigram_count_count"), pa.int64()),
            }
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )
    return ds.map_batches(per_doc, batch_format="pyarrow")


def prefix_cluster_sizes(sf_dir: str, prefix_chars: int = 16):
    """Cluster-size histogram of exact text-prefix groups — the cheapest
    near-duplicate signal (URL boilerplate, templated pages share prefixes).

    Scale shape: per-batch partial count per prefix (combiner), global
    groupby on the prefix (the only shuffle, one row per distinct prefix
    per block), then a per-batch histogram partial and a tiny final
    groupby on cluster size. Prefix slicing is codepoint-based on both
    sides (ASCII corpus: identical to SQL substr).

    Output: (cluster_size, n_clusters).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        pref = pc.utf8_slice_codeunits(text, 0, prefix_chars)
        t = pa.table({"p": pref})
        part = t.group_by("p").aggregate([("p", "count")])
        return pa.table(
            {"p": part.column("p"),
             "n": pc.cast(part.column("p_count"), pa.int64())}
        )

    clusters = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("n", alias_name="sz"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        sz = pc.cast(t.column("sz"), pa.int64()).to_numpy()
        s, c = np.unique(sz, return_counts=True)
        return pa.table(
            {"cluster_size": pa.array(s), "n": pa.array(c.astype(np.int64))}
        )

    agg = (
        clusters.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n", alias_name="n_clusters"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "cluster_size": pc.cast(t.column("cluster_size"), pa.int64()),
                "n_clusters": pc.cast(t.column("n_clusters"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def weighted_sample(sf_dir: str, scale_chars: int = 512):
    """Deterministic length-weighted document sampling — importance
    sampling for training-mix construction (longer docs kept with
    probability proportional to length, capped at 99.9%).

    The draw is the same content-independent 62-bit rolling hash of the
    STRING doc id used by deterministic_split (% 1000), compared against
    the per-doc weight min(999, n_chars * 1000 / scale_chars) — fully
    reproducible in SQL, stable under re-sharding, and a pure map stage:
    no shuffle, no state, embarrassingly parallel at any scale.

    Output: (doc_id, n_chars, slot) for kept documents.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        nch = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        slots = hash62_batch([str(i) for i in ids.to_pylist()]) % 1000
        w = np.minimum(999, nch * 1000 // scale_chars)
        mask = pa.array(slots < w)
        return pa.table(
            {
                "doc_id": ids,
                "n_chars": pa.array(nch),
                "slot": pa.array(slots),
            }
        ).filter(mask)

    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"])
    ).map_batches(keep, batch_format="pyarrow")


def cms_heavy_hitters(sf_dir: str, width: int = 1024, depth: int = 2,
                      k: int = 20):
    """Count-Min-Sketch heavy-hitter audit: exact top-k words vs their CMS
    estimate — the mergeable-sketch counting pattern (companion to
    approx_distinct_hll and approx_quantiles_hist) with the sketch's
    one-sided error (estimate >= exact) surfaced as data.

    Sketch path (NO shuffle): each batch folds its local word counts into a
    depth x width int64 counter matrix via the salted 62-bit rolling hash
    (h_j(word) = hash62(str(j) + ':' + word) % width — the salt string
    keeps the whole construction SQL-reproducible); counters are pure sums,
    so block-boundary placement cannot change the result, and the
    cross-block merge is a metadata-scale repartition(1) vector sum.
    Exact path (the contrast): per-batch partial counts -> one word-keyed
    shuffle -> partial top-k -> k-row final cut.
    The k-row estimate lookup happens on the driver against the tiny
    merged sketch.

    Output: (word, exact_n, cms_estimate) for the exact top-k; by CMS
    construction cms_estimate >= exact_n always.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata

    def word_counts(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        flat = pc.list_flatten(pc.split_pattern(text, " "))
        t = pa.table({"word": flat})
        part = t.group_by("word").aggregate([("word", "count")])
        return pa.table(
            {
                "word": part.column("word"),
                "n": pc.cast(part.column("word_count"), pa.int64()),
            }
        )

    counted = _docs(sf_dir).map_batches(
        word_counts, batch_format="pyarrow"
    ).materialize()  # reused by the sketch fold and the exact reduce

    def fold_cms(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        n = t.column("n").to_numpy()
        rows = []
        for j in range(depth):
            idx = hash62_batch([f"{j}:{w}" for w in words]) % width
            row = np.zeros(width, dtype=np.int64)
            np.add.at(row, idx, n)
            rows.append(row)
        return pa.table(
            {
                "j": pa.array(np.arange(depth, dtype=np.int64)),
                "counters": pa.array(rows),
            }
        )

    cms_rows = (
        counted.map_batches(fold_cms, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "j": pa.array(np.arange(depth, dtype=np.int64)),
                    "counters": pa.array(
                        [
                            t.filter(pc.equal(t.column("j"), j))
                            .column("counters")
                            .combine_chunks()
                            .flatten()
                            .to_numpy(zero_copy_only=False)
                            .reshape(-1, width)
                            .sum(axis=0)
                            .astype(np.int64)
                            for j in range(depth)
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()  # depth rows of width ints: the merged sketch is tiny
    )
    cms = np.stack([np.asarray(r["counters"], dtype=np.int64)
                    for r in sorted(cms_rows, key=lambda r: r["j"])])

    def topk_partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("word", "ascending")]
        )
        return t.take(idx[: min(k, len(t))])

    top = (
        counted.groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {"word": t.column("word"), "n": pc.cast(t.column("n"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .map_batches(topk_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk_partial, batch_format="pyarrow")
        .take_all()  # k rows
    )
    words = [r["word"] for r in top]
    exact = np.array([r["n"] for r in top], dtype=np.int64)
    est = np.full(len(words), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        idx = hash62_batch([f"{j}:{w}" for w in words]) % width
        est = np.minimum(est, cms[j][idx])
    return pa.table(
        {
            "word": pa.array(words, type=pa.string()),
            "exact_n": pa.array(exact),
            "cms_estimate": pa.array(est),
        }
    )


def co_occurrence_topk(sf_dir: str, k: int = 25, num_buckets: int = 64):
    """Top-k word pairs by document co-occurrence — the co-occurrence-matrix
    builder behind PMI / word-association features.

    Scale shape: a document's DISTINCT words pair up inside the map task
    (triangular enumeration — work is sum of per-doc distinct-word-count
    squared, the irreducible output size), pairs are packed into one int64
    via per-batch factorized codes and pre-counted before the single
    pair-keyed shuffle; top-k is partial + k-row final. The pair string
    columns are materialized only for the pre-counted partials, never per
    occurrence.

    Output: (word_a, word_b, n_docs) with word_a < word_b, ordered by
    (n_docs desc, word_a, word_b) ties broken lexically.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = words.flatten()
        offsets = words.offsets.to_numpy()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            np.diff(offsets))
        codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False))
        nv = np.int64(len(uniq) + 1)
        ukey = np.unique(doc_idx * nv + codes)  # distinct (doc, word)
        u_doc = ukey // nv
        u_code = (ukey % nv).astype(np.int64)
        # triangular pair enumeration within each doc's sorted distinct set
        n = len(ukey)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = u_doc[1:] != u_doc[:-1]
        starts = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        cnt = np.diff(np.r_[starts, n])
        local = np.arange(n) - starts[seg_of]
        reps = cnt[seg_of] - 1 - local
        total = int(reps.sum())
        if total == 0:
            return pa.table(
                {"word_a": pa.array([], type=pa.string()),
                 "word_b": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        i_idx = np.repeat(np.arange(n), reps)
        block_start = np.r_[0, np.cumsum(reps)[:-1]]
        j_idx = np.arange(total) - np.repeat(block_start, reps) + i_idx + 1
        # u_code ascending within a segment (np.unique sorted the pack), and
        # factorize codes are NOT lexical — sort pair ends lexically below
        pair = u_code[i_idx] * nv + u_code[j_idx]
        upair, pcount = np.unique(pair, return_counts=True)
        wa = np.asarray(uniq, dtype=object)[(upair // nv)].astype(str)
        wb = np.asarray(uniq, dtype=object)[(upair % nv)].astype(str)
        swap = wa > wb
        lo = np.where(swap, wb, wa)
        hi = np.where(swap, wa, wb)
        t = pa.table(
            {"word_a": pa.array(lo), "word_b": pa.array(hi),
             "n": pa.array(pcount.astype(np.int64))}
        )
        # collapse (a,b)/(b,a) partials produced by differing code order
        out = t.group_by(["word_a", "word_b"]).aggregate([("n", "sum")])
        return pa.table(
            {"word_a": out.column("word_a"), "word_b": out.column("word_b"),
             "n": pc.cast(out.column("n_sum"), pa.int64())}
        )

    agg = (
        _docs(sf_dir)
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["word_a", "word_b"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )

    def topk_partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "word_a": t.column("word_a"),
                "word_b": t.column("word_b"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            }
        )
        idx = pc.sort_indices(
            out,
            sort_keys=[("n_docs", "descending"), ("word_a", "ascending"),
                       ("word_b", "ascending")],
        )
        return out.take(idx[: min(k, len(out))])

    return (
        agg.map_batches(topk_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk_partial, batch_format="pyarrow")
    )


def quota_sample(sf_dir: str, per_lang: int = 50):
    """Per-group quota sampling: for each language, keep the ``per_lang``
    documents with the smallest deterministic hash — the per-strata LIMIT
    that balances a training mix (grouped top-n where the "score" is the
    reshard-stable 62-bit rolling hash, so the sample is pseudo-random but
    exactly reproducible).

    Scale shape: the group domain (languages) is bounded, so this is the
    partial-top-k pattern per group: each batch keeps at most
    |langs| x per_lang rows (one lexsort), and the final cut is a
    metadata-scale repartition(1) + one more lexsort. No shuffle of the
    corpus, no per-group tasks.

    Output: (doc_id, lang, rank) with rank 1..per_lang by (hash, doc_id).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        h = hash62_batch([str(i) for i in ids])
        order = np.lexsort((ids, h, langs))
        ids, langs, h = ids[order], langs[order], h[order]
        # keep first per_lang rows of each language segment
        new_seg = np.ones(len(ids), dtype=bool)
        new_seg[1:] = langs[1:] != langs[:-1]
        seg_start = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        pos = np.arange(len(ids)) - seg_start[seg_of]
        keep = pos < per_lang
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "lang": pa.array(langs[keep].astype(str)),
                "h": pa.array(h[keep]),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy()
        order = np.lexsort((ids, h, langs))
        ids, langs, h = ids[order], langs[order], h[order]
        new_seg = np.ones(len(ids), dtype=bool)
        new_seg[1:] = langs[1:] != langs[:-1]
        seg_start = np.flatnonzero(new_seg)
        seg_of = np.cumsum(new_seg) - 1
        pos = np.arange(len(ids)) - seg_start[seg_of]
        keep = pos < per_lang
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "lang": pa.array(langs[keep].astype(str)),
                "rank": pa.array((pos[keep] + 1).astype(np.int64)),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )


def upsert_merge(sf_dir: str):
    """MERGE/upsert — the CDC pattern: fold a delta stream (updates + new
    rows) into a base corpus, latest version wins per key. The delta here
    is DERIVED deterministically from the base (doc_id % 10 == 3 rows get
    updated text at version 2; every 50th doc spawns a brand-new id at
    +1000000) so the operator needs no external input and the oracle can
    re-derive it.

    Scale shape: base and delta are two tagged streams; the union feeds a
    per-batch PACKED-ARGMAX combiner (max of version * 2^40 + n_chars
    carries the winning row's payload through an ordinary max aggregate)
    and one key shuffle — the same argmax-through-groupby trick as
    top_order_per_priority, which is how latest-wins merges stay one-pass
    at any scale.

    Output: (doc_id, version, n_chars) of the merged corpus.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata
    from ray.data.aggregate import Max

    def base_stage(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        nch = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "packed": pa.array(np.int64(1) * (1 << 40) + nch),
            }
        )

    def delta_stage(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        nch = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        upd = ids % 10 == 3
        new = ids % 50 == 0
        # updated rows: version 2, text grows by the 8-char ' updated' suffix
        out_ids = np.r_[ids[upd], ids[new] + 1_000_000]
        out_pack = np.r_[
            np.int64(2) * (1 << 40) + nch[upd] + 8,
            np.int64(1) * (1 << 40) + nch[new],
        ]
        return pa.table(
            {"doc_id": pa.array(out_ids), "packed": pa.array(out_pack)}
        )

    def reader():
        return strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
        )

    base = reader().map_batches(base_stage, batch_format="pyarrow")
    delta = reader().map_batches(delta_stage, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        return t.group_by("doc_id").aggregate([("packed", "max")]).rename_columns(
            ["doc_id", "packed"]
        )

    merged = (
        base.union(delta)
        .map_batches(combine, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Max("packed", alias_name="packed"))
    )

    def finish(t: pa.Table) -> pa.Table:
        packed = pc.cast(t.column("packed"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "version": pa.array(packed >> 40),
                "n_chars": pa.array(packed & ((1 << 40) - 1)),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def lang_confusion(sf_dir: str):
    """Language-detector confusion matrix: metadata lang x predicted lang
    with counts — the detector-quality audit a multilingual pipeline runs
    before trusting language routing.

    Scale shape: one scan (detector + metadata in the same batch — no
    join), per-batch partial counts over the bounded |langs|^2 domain,
    repartition(1) + one Arrow group_by merge.

    Output: (meta_lang, pred_lang, n).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        pred = detect_languages_arrow(batch.column("text").combine_chunks())
        t = pa.table(
            {
                "meta_lang": pc.cast(batch.column("lang"), pa.string()),
                "pred_lang": pa.array(pred, type=pa.string()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["meta_lang", "pred_lang"]).aggregate([("n", "sum")])

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(["meta_lang", "pred_lang"]).aggregate([("n_sum", "sum")])
        return pa.table(
            {
                "meta_lang": out.column("meta_lang"),
                "pred_lang": out.column("pred_lang"),
                "n": pc.cast(out.column("n_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text", "lang"])
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def unigram_surprisal(sf_dir: str, scale: int = 1_000_000,
                      num_partitions: int | None = None):
    """Per-document unigram-surprisal quality score — the LM-free perplexity
    proxy a training-data pipeline uses to rank documents: rare-word-heavy
    docs score high, boilerplate scores low. Integer-exact: score =
    sum over token occurrences of (scale // df(word)).

    Scale shape: one corpus scan emits per-batch (doc, word, count) rows
    (a document never spans batches) AND per-batch distinct-doc partials
    for df; df(word) comes from one vocabulary-sized groupby; the score
    hop is a native hash-shuffle join on the word (vocab never collected
    anywhere), then one groupby(doc) with per-batch combiners.

    Output: (doc_id, n_tokens, surprisal).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.tables import strip_schema_metadata
    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        per_doc = np.diff(words.offsets.to_numpy())
        idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64),
                                 per_doc))
        t = pa.table(
            {
                "doc": pc.take(pa.array(ids), idx),
                "w": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        return t.group_by(["doc", "w"]).aggregate([("w", "count")])

    occ = (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
        )
        .map_batches(explode, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {
                    "doc": t.column("doc"),
                    "w": t.column("w"),
                    "c": pc.cast(t.column("w_count"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # (doc, word) distinct rows — scanned twice
    )

    def df_partial(t: pa.Table) -> pa.Table:
        # occ rows are distinct per (doc, w) within a batch; docs never
        # span batches, so counting rows per w gives exact df partials
        return pa.table(
            {"w": t.column("w"),
             "d": np.ones(len(t), dtype=np.int64)}
        ).group_by("w").aggregate([("d", "sum")])

    df = (
        occ.map_batches(df_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("d_sum", alias_name="df"))
        .map_batches(
            lambda t: pa.table(
                {
                    "wv": pc.cast(t.column("w"), pa.string()),
                    "df": pc.cast(t.column("df"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def score_partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy()
        d = t.column("df").to_numpy()
        out = pa.table(
            {
                "doc_id": t.column("doc"),
                "n": pa.array(c),
                "s": pa.array(c * (scale // d)),
            }
        )
        return out.group_by("doc_id").aggregate([("n", "sum"), ("s", "sum")])

    return (
        occ.join(
            df,
            join_type="inner",
            num_partitions=nparts,
            on=("w",),
            right_on=("wv",),
            aggregator_ray_remote_args=agg_args,
        )
        .map_batches(score_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_sum", alias_name="n_tokens"),
                   Sum("s_sum", alias_name="surprisal"))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                    "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
                    "surprisal": pc.cast(t.column("surprisal"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def skew_report(sf_dir: str):
    """Key-skew diagnostic over the categorical document columns — the
    pre-shuffle check a partitioning plan needs: per column, how many
    distinct values, and how concentrated the top value is.

    Scale shape: per-batch partial counts per (column, value) — the
    shuffle moves one row per distinct value per block — then a
    bounded-domain repartition(1) reduce (categorical domains are small
    by definition; a high-cardinality column would use the CMS/heavy-
    hitter pipeline instead).

    Output: (col, n_distinct, total, top_value, top_n, top_share_ppm);
    top value ties break on the smaller value string.
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for col in ("source", "lang"):
            t = pa.table(
                {
                    "col": pa.array([col] * len(batch)),
                    "val": pc.cast(batch.column(col), pa.string()),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            outs.append(
                t.group_by(["col", "val"]).aggregate([("n", "sum")])
            )
        return pa.concat_tables(outs)

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["col", "val"]).aggregate([("n_sum", "sum")])
        import pandas as pd

        df = g.to_pandas()
        df = df.rename(columns={"n_sum_sum": "n"})
        rows = []
        for col, grp in df.groupby("col"):
            total = int(grp["n"].sum())
            top = grp.sort_values(["n", "val"],
                                  ascending=[False, True]).iloc[0]
            rows.append(
                (col, len(grp), total, top["val"], int(top["n"]),
                 int(top["n"]) * 1_000_000 // total)
            )
        rows.sort()
        return pa.table(
            {
                "col": pa.array([r[0] for r in rows]),
                "n_distinct": pa.array([r[1] for r in rows],
                                       type=pa.int64()),
                "total": pa.array([r[2] for r in rows], type=pa.int64()),
                "top_value": pa.array([r[3] for r in rows]),
                "top_n": pa.array([r[4] for r in rows], type=pa.int64()),
                "top_share_ppm": pa.array([r[5] for r in rows],
                                          type=pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def kwic_extract(sf_dir: str, keyword: str | None = None, window: int = 2):
    """Keyword-in-context extraction: every occurrence of ``keyword`` with
    its +/- ``window``-word context — the concordance/snippet op behind
    corpus inspection and targeted filtering. ``keyword`` defaults to a
    high-frequency term of the synthetic corpus vocabulary; in practice
    callers pass their term of interest.

    Scale shape: pure map — occurrences are found vectorized on the
    flattened word array (one numpy equality over the batch); context
    assembly touches only the (sparse) match positions. No shuffle at all;
    output order is normalized downstream by the comparator.

    Output: (doc_id, pos, context) with pos the 1-based word index.
    """
    import ray.data as rd

    kw = keyword if keyword is not None else "window"

    def find(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        words = pc.split_pattern(text, " ")
        offs = words.offsets.to_numpy()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        hit = np.flatnonzero(flat == kw)
        if len(hit) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                    "context": pa.array([], type=pa.string()),
                }
            )
        doc_idx = np.searchsorted(offs, hit, side="right") - 1
        pos = hit - offs[doc_idx] + 1
        lo = np.maximum(hit - window, offs[doc_idx])
        hi = np.minimum(hit + window + 1, offs[doc_idx + 1])
        ctx = [" ".join(flat[a:b]) for a, b in zip(lo, hi)]
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx]),
                "pos": pa.array(pos.astype(np.int64)),
                "context": pa.array(ctx, type=pa.string()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(find, batch_format="pyarrow")


def zipf_profile(sf_dir: str, k: int = 50):
    """Rank-frequency (Zipf) profile of the corpus: the top-k words by
    count with their 1-based rank, deterministic tiebreak (n desc, word
    asc) — the vocabulary health-check that catches boilerplate floods.

    Scale shape: per-batch partial counts (all-Arrow split + group_by)
    before the one vocabulary shuffle; top-k over the aggregated table via
    distributed sort + limit; ranks assigned on the final k-row block.

    Output: (rank, word, n).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        flat = pc.list_flatten(pc.split_pattern(text, " "))
        t = pa.table({"word": flat})
        part = t.group_by("word").aggregate([("word", "count")])
        return pa.table(
            {
                "word": part.column("word"),
                "n": pc.cast(part.column("word_count"), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def rank(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("word", "ascending")]
        )
        t = t.take(idx)
        return pa.table(
            {
                "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
                "word": t.column("word"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return (
        agg.map_batches(
            lambda t: pa.table(
                {"word": t.column("word"), "n": pc.cast(t.column("n"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
        .repartition(1)  # k rows by construction
        .map_batches(rank, batch_format="pyarrow")
    )


def hapax_ratio(sf_dir: str):
    """Per-source hapax legomena ratio: the share (ppm) of each source's
    vocabulary that occurs exactly once — a standard corpus-quality /
    OCR-noise signal (noisy extraction inflates one-off tokens).

    Scale shape: per-batch (source, word) partial counts feed ONE native
    groupby; the post-groupby rows are final per (source, word), so each
    block reduces to |sources| partial rows and the ppm math runs on the
    final metadata-scale block with exact integers.

    Output: (source, n_vocab, n_hapax, hapax_ppm).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        src = pa.array(
            np.repeat(
                pc.cast(batch.column("source"), pa.string()).to_numpy(
                    zero_copy_only=False
                ),
                counts,
            )
        )
        t = pa.table({"source": src, "word": pc.list_flatten(words)})
        part = t.group_by(["source", "word"]).aggregate([("word", "count")])
        return pa.table(
            {
                "source": part.column("source"),
                "word": part.column("word"),
                "n": pc.cast(part.column("word_count"), pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "word"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def vocab_partial(t: pa.Table) -> pa.Table:
        one = pc.cast(pc.equal(t.column("n"), pa.scalar(1, pa.int64())),
                      pa.int64())
        g = pa.table(
            {
                "source": t.column("source"),
                "v": pa.array(np.ones(t.num_rows, np.int64)),
                "h": one,
            }
        ).group_by("source").aggregate([("v", "sum"), ("h", "sum")])
        return g

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("v_sum", "sum"), ("h_sum", "sum")])
        src = g.column("source").to_pylist()
        v = pc.cast(g.column("v_sum_sum"), pa.int64()).to_pylist()
        h = pc.cast(g.column("h_sum_sum"), pa.int64()).to_pylist()
        order = np.argsort(np.asarray(src, dtype=object))
        return pa.table(
            {
                "source": pa.array([src[i] for i in order], pa.string()),
                "n_vocab": pa.array([v[i] for i in order], pa.int64()),
                "n_hapax": pa.array([h[i] for i in order], pa.int64()),
                "hapax_ppm": pa.array(
                    [h[i] * 1_000_000 // v[i] if v[i] else 0 for i in order],
                    pa.int64(),
                ),
            }
        )

    return (
        agg.map_batches(vocab_partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per block by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def bigram_novelty(sf_dir: str):
    """Per-document bigram novelty in doc_id order: the share (ppm) of a
    document's distinct bigrams whose FIRST corpus occurrence (minimum
    doc_id) is this document — the incremental-crawl novelty signal that
    separates fresh content from recombined boilerplate.

    Scale shape: distinct (bigram, doc) pairs are formed per batch
    (all-Arrow, same kernel family as bigram_counts); one native groupby
    computes min(doc_id) per bigram; re-deriving the per-doc pairs joins
    against that aggregate natively on the bigram key (big-big: the
    bigram vocabulary grows with the corpus). Counts reduce per doc.

    Output: (doc_id, n_bigrams, n_novel, novelty_ppm).
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..functions.tables import strip_schema_metadata

    def pairs(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64())}
            )
        offsets = words.offsets.to_numpy()
        starts = offsets[1:-1]
        mask = np.ones(n - 1, dtype=bool)
        mask[starts - 1] = False
        mask_arr = pa.array(mask)
        left = flat.slice(0, n - 1).filter(mask_arr)
        right = flat.slice(1, n - 1).filter(mask_arr)
        bigram = pc.binary_join_element_wise(left, right, " ")
        # bigram row j belongs to the doc whose word range contains j
        doc_idx = np.searchsorted(offsets[1:], np.flatnonzero(mask),
                                  side="right")
        t = pa.table({"bigram": bigram, "doc_id": pa.array(ids[doc_idx])})
        # distinct within batch (combiner for both downstream aggregates)
        return t.group_by(["bigram", "doc_id"]).aggregate([]).select(
            ["bigram", "doc_id"]
        )

    docs = strip_schema_metadata(_docs(sf_dir))
    pair_ds = docs.map_batches(pairs, batch_format="pyarrow")

    first = pair_ds.groupby("bigram").aggregate(Min("doc_id", alias_name="first_doc"))

    from .relational import _join_partitions, _multi_join_args

    num_partitions, agg_args = _multi_join_args(_join_partitions(None))
    joined = pair_ds.join(
        first,
        join_type="inner",
        num_partitions=num_partitions,
        on=("bigram",),
        right_on=("bigram",),
        aggregator_ray_remote_args=agg_args,
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        novel = pc.cast(
            pc.equal(pc.cast(t.column("doc_id"), pa.int64()),
                     pc.cast(t.column("first_doc"), pa.int64())),
            pa.int64(),
        )
        g = pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "b": pa.array(np.ones(t.num_rows, np.int64)),
                "nv": novel,
            }
        ).group_by("doc_id").aggregate([("b", "sum"), ("nv", "sum")])
        return g

    agg = (
        joined.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("b_sum", alias_name="n_bigrams"),
                   Sum("nv_sum", alias_name="n_novel"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nb = pc.cast(t.column("n_bigrams"), pa.int64()).to_numpy()
        nv = pc.cast(t.column("n_novel"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_bigrams": pa.array(nb),
                "n_novel": pa.array(nv),
                "novelty_ppm": pa.array(
                    np.where(nb > 0, nv * 1_000_000 // np.maximum(nb, 1), 0)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def source_mixture_weights(sf_dir: str):
    """Per-source resampling weights that would rebalance the corpus to a
    uniform source mixture — the domain-mixing knob of LLM data recipes
    (weight_ppm = 1e6 * target_share / actual_share, exact integers).

    Scale shape: a per-batch source-count combiner, one metadata-scale
    reduce (|sources| rows).

    Output: (source, n_docs, share_ppm, weight_ppm).
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"source": pc.cast(batch.column("source"), pa.string())})
            .group_by("source")
            .aggregate([("source", "count")])
        )
        return pa.table(
            {
                "source": g.column("source"),
                "n": pc.cast(g.column("source_count"), pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n", "sum")])
        src = g.column("source").to_pylist()
        n = pc.cast(g.column("n_sum"), pa.int64()).to_pylist()
        total = sum(n)
        k = len(src)
        order = sorted(range(k), key=lambda i: src[i])
        return pa.table(
            {
                "source": pa.array([src[i] for i in order], pa.string()),
                "n_docs": pa.array([n[i] for i in order], pa.int64()),
                "share_ppm": pa.array(
                    [n[i] * 1_000_000 // total for i in order], pa.int64()
                ),
                # uniform target: each source should hold total/k docs
                "weight_ppm": pa.array(
                    [total * 1_000_000 // (k * n[i]) for i in order],
                    pa.int64(),
                ),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per partial by construction
        .map_batches(finish, batch_format="pyarrow")
    )


def rag_chunk(sf_dir: str, size: int = 32, stride: int = 24):
    """RAG-style overlapping chunking: every document explodes into word
    windows of ``size`` words at ``stride`` spacing (the last window may be
    short) — the retrieval-corpus building step. Emits chunk geometry plus
    the exact joined-text character count so the oracle verifies content,
    not just shape.

    Scale shape: shuffle-free — one all-Arrow pass per batch: chunk counts
    from list lengths, flat per-word char-length prefix sums give every
    chunk's character total as two gathers (no string is materialized per
    chunk).

    Output: (doc_id, chunk_id, start_word, n_words, n_chars).
    """
    import ray.data as rd

    def chunks(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        words = pc.split_pattern(text, " ")
        W = pc.list_value_length(words).to_numpy().astype(np.int64)
        n_chunks = (W + stride - 1) // stride
        doc_idx = np.repeat(np.arange(len(ids)), n_chunks)
        # within-doc chunk ordinals
        ends = np.cumsum(n_chunks)
        chunk_id = np.arange(ends[-1] if len(ends) else 0, dtype=np.int64) - (
            np.repeat(ends - n_chunks, n_chunks)
        )
        start = chunk_id * stride
        n_words = np.minimum(size, W[doc_idx] - start)
        # exact chunk char counts from flat word-length prefix sums
        flat_len = pc.utf8_length(pc.list_flatten(words)).to_numpy().astype(
            np.int64
        )
        P = np.r_[0, np.cumsum(flat_len)]
        offsets = words.offsets.to_numpy().astype(np.int64)[:-1]
        lo = offsets[doc_idx] + start
        n_chars = P[lo + n_words] - P[lo] + (n_words - 1)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx]),
                "chunk_id": pa.array(chunk_id),
                "start_word": pa.array(start),
                "n_words": pa.array(n_words),
                "n_chars": pa.array(n_chars),
            }
        )

    return _docs(sf_dir).map_batches(chunks, batch_format="pyarrow")


def word_dominance_filter(sf_dir: str, threshold_pct: int = 10):
    """Gopher-style quality rule: the share of a document taken by its
    single most frequent word; documents over ``threshold_pct`` flag as
    repetitious boilerplate.

    Scale shape: shuffle-free — two chained Arrow group_bys per batch
    ((doc, word) counts, then per-doc max/sum), zero Python in the loop.

    Output: (doc_id, n_words, top_count, dominance_ppm, flagged).
    """
    import ray.data as rd

    def dominance(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts)),
                "word": pc.list_flatten(words),
            }
        )
        c = t.group_by(["doc_id", "word"]).aggregate([("word", "count")])
        m = (
            pa.table(
                {
                    "doc_id": c.column("doc_id"),
                    "n": pc.cast(c.column("word_count"), pa.int64()),
                }
            )
            .group_by("doc_id")
            .aggregate([("n", "max"), ("n", "sum")])
        )
        top = pc.cast(m.column("n_max"), pa.int64())
        tot = pc.cast(m.column("n_sum"), pa.int64())
        dom = pc.divide(pc.multiply(top, pa.scalar(1_000_000, pa.int64())), tot)
        flagged = pc.cast(
            pc.greater(
                pc.multiply(top, pa.scalar(100, pa.int64())),
                pc.multiply(tot, pa.scalar(threshold_pct, pa.int64())),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": pc.cast(m.column("doc_id"), pa.int64()),
                "n_words": tot,
                "top_count": top,
                "dominance_ppm": dom,
                "flagged": flagged,
            }
        )

    return _docs(sf_dir).map_batches(dominance, batch_format="pyarrow")


def core_vocabulary(sf_dir: str):
    """Vocabulary core: words present in EVERY source (the K-way distinct
    set intersection), with their corpus-wide counts — boilerplate
    detection across domains.

    Scale shape: per-batch distinct (source, word) pairs + total counts
    combine before the ONE word-key shuffle; a word's source count and
    total fold in the same groupby; the |sources| threshold comes from a
    bounded side-aggregate.

    Output: (word, n_sources, total_n) for core words only.
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    # |sources| is a dimension-table read (bounded domain by construction)
    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
    n_sources = len(pc.unique(src.column("source")))

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        t = pa.table(
            {
                "source": pa.array(
                    np.repeat(
                        batch.column("source").to_numpy(zero_copy_only=False),
                        counts,
                    )
                ),
                "word": pc.list_flatten(words),
            }
        )
        d = t.group_by(["source", "word"]).aggregate([("word", "count")])
        return pa.table(
            {
                "word": d.column("word"),
                "source": d.column("source"),
                "n": pc.cast(d.column("word_count"), pa.int64()),
            }
        )

    # second combiner: per-batch (word -> distinct-source count, total)
    def word_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["word", "source"]).aggregate([("n", "sum")])
        w = pa.table(
            {
                "word": g.column("word"),
                "s": pa.array(np.ones(g.num_rows, np.int64)),
                "n": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )
        return w.group_by("word").aggregate([("s", "sum"), ("n", "sum")])

    # NOTE: the (source, word) pair must be GLOBALLY distinct before source
    # counting, so the shuffle keys on (word, source) first, then words fold
    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["word", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(word_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("s_sum", alias_name="n_sources"),
                   Sum("n_sum", alias_name="total_n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.cast(t.column("n_sources"), pa.int64()),
            pa.scalar(n_sources, pa.int64()),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "word": t.column("word"),
                "n_sources": pc.cast(t.column("n_sources"), pa.int64()),
                "total_n": pc.cast(t.column("total_n"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def word_length_histogram(sf_dir: str):
    """Corpus-wide token-length histogram — the cheapest corpus shape
    profile (tokenizer sanity check: a fat tail of 40-char "words" means
    markup leaked through extraction).

    Scale shape: per-batch split + length + groupby combiner; the global
    fold is a bounded-domain (token lengths) repartition(1) reduce.

    Output: (wlen, n_words).
    """

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.cast(batch.column("text").combine_chunks(), pa.string()), " "
        )
        lens = pc.utf8_length(pc.list_flatten(words))
        t = pa.table(
            {
                "wlen": pc.cast(lens, pa.int64()),
                "n": pa.array(np.ones(len(lens), np.int64)),
            }
        )
        return t.group_by("wlen").aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("wlen").aggregate([("n_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("wlen", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "wlen": pc.cast(g.column("wlen"), pa.int64()),
                "n_words": pc.cast(g.column("n_sum_sum"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|distinct lengths|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def allcaps_ratio(sf_dir: str):
    """Per-source ALL-CAPS token rate (>=2 uppercase ASCII letters) —
    the shouting/headline/boilerplate signal used in quality filtering.

    Scale shape: vectorized regex over flattened tokens, per-batch
    (source) combiner, bounded |sources| repartition(1) fold.

    Output: (source, n_allcaps, n_tokens, allcaps_ppm).
    """

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        caps = pc.cast(
            pc.match_substring_regex(flat, r"^[A-Z]{2,}$"), pa.int64()
        )
        t = pa.table(
            {
                "source": pa.array(
                    np.repeat(
                        batch.column("source").to_numpy(zero_copy_only=False),
                        counts,
                    )
                ),
                "caps": caps,
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        return t.group_by("source").aggregate([("caps", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("caps_sum", "sum"),
                                            ("n_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        caps = pc.cast(g.column("caps_sum_sum"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_numpy()
        return pa.table(
            {
                "source": g.column("source"),
                "n_allcaps": pa.array(caps),
                "n_tokens": pa.array(n),
                "allcaps_ppm": pa.array(caps * 1_000_000 // n),
            }
        )

    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def lexical_density(sf_dir: str):
    """Per-source stopword density (lowercased exact match against the
    en marker-word list) — high density reads as natural prose, low as
    listings/markup; a standard quality-filter feature.

    Scale shape: vectorized set-membership over flattened tokens,
    per-batch combiner, bounded |sources| repartition(1) fold.

    Output: (source, n_stopwords, n_tokens, stopword_ppm).
    """
    stop = pa.array(list(MARKER_WORDS[0][1]), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.utf8_lower(pc.list_flatten(words))
        hit = pc.cast(pc.is_in(flat, value_set=stop), pa.int64())
        t = pa.table(
            {
                "source": pa.array(
                    np.repeat(
                        batch.column("source").to_numpy(zero_copy_only=False),
                        counts,
                    )
                ),
                "s": hit,
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        return t.group_by("source").aggregate([("s", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("s_sum", "sum"),
                                            ("n_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        s = pc.cast(g.column("s_sum_sum"), pa.int64()).to_numpy()
        n = pc.cast(g.column("n_sum_sum"), pa.int64()).to_numpy()
        return pa.table(
            {
                "source": g.column("source"),
                "n_stopwords": pa.array(s),
                "n_tokens": pa.array(n),
                "stopword_ppm": pa.array(s * 1_000_000 // n),
            }
        )

    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def vocab_growth(sf_dir: str, n_slices: int = 10):
    """Vocabulary-growth (Heaps-law proxy): bucket every word's FIRST
    appearance (min doc_id) into ``n_slices`` equal doc-id slices and
    count new words per slice — how fast the corpus stops surprising you.

    Scale shape: per-batch (word -> min doc_id) combiner before the ONE
    word-key shuffle with a Min aggregate; the slice histogram folds on
    the bounded ``n_slices`` domain; the doc-id upper bound comes from
    parquet row-group STATISTICS (no data scan).

    Output: (slice_idx, n_new_words).
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Min

    # max doc_id from parquet metadata only — zero data read
    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    col = [f.name for f in meta.schema_arrow].index("doc_id")
    mx = max(
        meta.metadata.row_group(i).column(col).statistics.max
        for i in range(meta.metadata.num_row_groups)
    )

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        t = pa.table(
            {
                "word": pc.list_flatten(words),
                "fd": pa.array(
                    np.repeat(
                        pc.cast(batch.column("doc_id"), pa.int64()).to_numpy(),
                        counts,
                    )
                ),
            }
        )
        return t.group_by("word").aggregate([("fd", "min")])

    def slice_partial(t: pa.Table) -> pa.Table:
        fd = pc.cast(t.column("fd_min"), pa.int64()).to_numpy()
        s = fd * n_slices // (mx + 1)
        g = pa.table(
            {"slice_idx": pa.array(s),
             "n": pa.array(np.ones(len(s), np.int64))}
        )
        return g.group_by("slice_idx").aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("slice_idx").aggregate([("n_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("slice_idx", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "slice_idx": pc.cast(g.column("slice_idx"), pa.int64()),
                "n_new_words": pc.cast(g.column("n_sum_sum"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Min("fd_min", alias_name="fd_min"))
        .map_batches(slice_partial, batch_format="pyarrow")
        .repartition(1)  # O(n_slices) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def char_class_profile(sf_dir: str):
    """Per-source character-class census (digits, uppercase, lowercase,
    spaces, other) — the raw signal behind markup/code/prose
    classification in extraction quality filters.

    Scale shape: vectorized regex-count kernels per batch, per-source
    combiner, bounded |sources| repartition(1) fold.

    Output: (source, n_digits, n_upper, n_lower, n_space, n_other,
    n_chars).
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        total = pc.utf8_length(text).to_numpy().astype(np.int64)
        dig = pc.count_substring_regex(text, "[0-9]").to_numpy().astype(np.int64)
        up = pc.count_substring_regex(text, "[A-Z]").to_numpy().astype(np.int64)
        lo = pc.count_substring_regex(text, "[a-z]").to_numpy().astype(np.int64)
        sp = pc.count_substring(text, " ").to_numpy().astype(np.int64)
        t = pa.table(
            {
                "source": batch.column("source"),
                "d": pa.array(dig),
                "u": pa.array(up),
                "l": pa.array(lo),
                "s": pa.array(sp),
                "o": pa.array(total - dig - up - lo - sp),
                "t": pa.array(total),
            }
        )
        return t.group_by("source").aggregate(
            [("d", "sum"), ("u", "sum"), ("l", "sum"), ("s", "sum"),
             ("o", "sum"), ("t", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("d_sum", "sum"), ("u_sum", "sum"), ("l_sum", "sum"),
             ("s_sum", "sum"), ("o_sum", "sum"), ("t_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "source": g.column("source"),
                "n_digits": pc.cast(g.column("d_sum_sum"), pa.int64()),
                "n_upper": pc.cast(g.column("u_sum_sum"), pa.int64()),
                "n_lower": pc.cast(g.column("l_sum_sum"), pa.int64()),
                "n_space": pc.cast(g.column("s_sum_sum"), pa.int64()),
                "n_other": pc.cast(g.column("o_sum_sum"), pa.int64()),
                "n_chars": pc.cast(g.column("t_sum_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def readability_terms(sf_dir: str):
    """Per-source readability sufficient statistics (Flesch-style, all
    integer): doc count, word count, sentence-mark count, and
    vowel-group count (the deterministic syllable proxy) — downstream
    consumers derive words/sentence and syllables/word without the
    engine ever emitting a float.

    Scale shape: vectorized RE2 count kernels per batch, per-source
    combiner, bounded |sources| repartition(1) fold.

    Output: (source, n_docs, n_words, n_sentence_marks, n_vowel_groups).
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(
            np.int64
        )
        sents = pc.count_substring_regex(text, "[.!?]+").to_numpy().astype(
            np.int64
        )
        vg = pc.count_substring_regex(text, "[aeiouAEIOU]+").to_numpy().astype(
            np.int64
        )
        t = pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "w": pa.array(words),
                "s": pa.array(sents),
                "v": pa.array(vg),
            }
        )
        return t.group_by("source").aggregate(
            [("n", "sum"), ("w", "sum"), ("s", "sum"), ("v", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_sum", "sum"), ("w_sum", "sum"), ("s_sum", "sum"),
             ("v_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "n_words": pc.cast(g.column("w_sum_sum"), pa.int64()),
                "n_sentence_marks": pc.cast(g.column("s_sum_sum"), pa.int64()),
                "n_vowel_groups": pc.cast(g.column("v_sum_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def repeated_substring_topk(sf_dir: str, width: int = 16, k: int = 20,
                            num_buckets: int = 64):
    """Corpus-wide repeated-substring fingerprint: the top-k most
    frequent fixed-width character windows (every overlapping position,
    multiplicity counted) — the boilerplate/plagiarism detector core.

    Scale shape: per-batch sliding byte windows (stride-tricks view ->
    one np.unique) pre-count before the single key-hash bucket shuffle;
    buckets finish counts and keep only their local top-k (a window's
    total lands in exactly one bucket, so pruning is lossless); the
    global top-k folds k*num_buckets rows on the driver-side
    repartition(1). Ties break by substring ascending. ASCII corpus
    assumed (byte windows == char windows); non-ASCII would need a
    codepoint decode first.

    Output: (s16, n_occurrences) — k rows, count > 1 only.
    """
    import pandas as pd
    import ray.data as rd
    from numpy.lib.stride_tricks import sliding_window_view

    if width % 8 != 0:
        raise ValueError(
            f"width must be a multiple of 8 (int64 bucket hash), got {width}"
        )

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        views = []
        for s in texts:
            b = np.frombuffer(s.encode("ascii"), np.uint8)
            if len(b) >= width:
                views.append(
                    sliding_window_view(b, width).copy().view(f"V{width}")
                    .ravel()
                )
        if not views:
            return pa.table({"key": pa.array([], pa.binary(width)),
                             "n": pa.array([], pa.int64())})
        keys, counts = np.unique(np.concatenate(views), return_counts=True)
        raw = keys.tobytes()
        ka = pa.Array.from_buffers(
            pa.binary(width), len(keys),
            [None, pa.py_buffer(raw)],
        )
        h = np.bitwise_xor.reduce(
            np.frombuffer(raw, np.int64).reshape(-1, width // 8), axis=1
        )
        return pa.table(
            {
                "key": ka,
                "n": pa.array(counts.astype(np.int64)),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        n = g["n"].to_numpy().astype(np.int64)
        order = np.argsort(key, kind="stable")  # bytes sort ascending
        key, n = key[order], n[order]
        seg = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tot = np.add.reduceat(n, seg)
        uk = key[seg]
        keep = tot > 1
        uk, tot = uk[keep], tot[keep]
        # local top-k: count desc, key asc (lossless — totals are final here)
        return (
            pd.DataFrame({"key": uk, "n": tot})
            .sort_values(["n", "key"], ascending=[False, True],
                         kind="mergesort")
            .head(k)
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "key"], ascending=[False, True],
                            kind="mergesort").head(k)
        return pd.DataFrame(
            {
                "s16": [bytes(b).decode("ascii") for b in df["key"]],
                "n_occurrences": df["n"].astype(np.int64).to_numpy(),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # k rows per bucket
        .map_batches(finish, batch_format="pandas")
    )


def char_class_transitions(sf_dir: str):
    """Character-class transition matrix per source (digit/upper/lower/
    space/other adjacency counts) — the byte-level structure signal
    behind markup-vs-prose and table-vs-text classifiers.

    Scale shape: zero-loop byte kernel (lookup-table classify on the
    raw concatenated UTF-8 buffer, one 25-cell bincount per doc batch
    via packed class pairs), per-source combiner, bounded
    |sources| x 25 repartition(1) fold. ASCII corpus assumed.

    Output: (source, class_from, class_to, n_transitions) with classes
    0=digit 1=upper 2=lower 3=space 4=other.
    """
    import ray.data as rd

    lut = np.full(256, 4, np.int64)
    lut[np.arange(48, 58)] = 0
    lut[np.arange(65, 91)] = 1
    lut[np.arange(97, 123)] = 2
    lut[32] = 3

    def partial(batch: pa.Table) -> pa.Table:
        srcs, codes, counts = [], [], []
        sv = pc.cast(batch.column("source").combine_chunks(), pa.string())
        texts = batch.column("text").to_pylist()
        # group docs by source within the batch, then one buffer per group
        import collections

        groups = collections.defaultdict(list)
        for s, t in zip(sv.to_pylist(), texts):
            groups[s].append(t)
        for s, ts in groups.items():
            cls = [lut[np.frombuffer(t.encode("ascii"), np.uint8)]
                   for t in ts if len(t) >= 2]
            if not cls:
                continue
            pair = np.concatenate([c[:-1] * 5 + c[1:] for c in cls])
            cnt = np.bincount(pair, minlength=25)
            nz = np.flatnonzero(cnt)
            srcs.append(np.repeat(np.array([s], object), len(nz)))
            codes.append(nz.astype(np.int64))
            counts.append(cnt[nz].astype(np.int64))
        if not srcs:
            return pa.table({"source": pa.array([], pa.string()),
                             "code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table(
            {
                "source": pa.array(np.concatenate(srcs)),
                "code": pa.array(np.concatenate(codes)),
                "n": pa.array(np.concatenate(counts)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "code"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("source", "ascending"), ("code", "ascending")]
        )
        g = g.take(idx)
        code = pc.cast(g.column("code"), pa.int64()).to_numpy()
        return pa.table(
            {
                "source": g.column("source"),
                "class_from": pa.array(code // 5),
                "class_to": pa.array(code % 5),
                "n_transitions": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |sources| x 25 rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def dominant_bigram_per_source(sf_dir: str, num_buckets: int = 64):
    """Most frequent bigram per source (argmax over an UNBOUNDED key
    domain): unlike the bounded-grid folds, the candidate space here is
    |vocab|^2, so totals are finished inside composite-key hash buckets
    and only one champion row per (source, bucket) survives to the
    final fold.

    Scale shape: all-Arrow per-batch bigram partial counts (shared
    kernel shape with bigram_counts) -> ONE (source, bigram)-hash
    bucket shuffle -> per-bucket total + per-source champion (count
    desc, bigram asc — a valid argmax partial because every key's
    total completes inside its bucket) -> |sources| x num_buckets rows
    fold. Ties break deterministically by bigram ascending.

    Output: (source, top_bigram, n_occurrences).
    """
    import pandas as pd
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        n = len(flat)
        if n < 2:
            return pa.table({"source": pa.array([], pa.string()),
                             "bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        offsets = words.offsets.to_numpy()
        doc_starts = offsets[1:-1]
        mask = np.ones(n - 1, dtype=bool)
        mask[doc_starts - 1] = False
        mask_arr = pa.array(mask)
        left = flat.slice(0, n - 1).filter(mask_arr)
        right = flat.slice(1, n - 1).filter(mask_arr)
        bigram = pc.binary_join_element_wise(left, right, " ")
        # source of each bigram = source of its doc
        lens = np.diff(offsets)
        src_per_word = np.repeat(
            batch.column("source").to_numpy(zero_copy_only=False), lens
        )
        src = pa.array(src_per_word[:-1][mask])
        t = pa.table({"source": src, "bigram": bigram})
        part = t.group_by(["source", "bigram"]).aggregate(
            [("bigram", "count")]
        )
        key = pc.binary_join_element_wise(
            part.column("source"), part.column("bigram"), "\x1f"
        )
        h = hash62_batch(key.to_pylist())
        return pa.table(
            {
                "source": part.column("source"),
                "bigram": part.column("bigram"),
                "n": pc.cast(part.column("bigram_count"), pa.int64()),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["source", "bigram"], as_index=False)["n"].sum()
        tot = tot.sort_values(["source", "n", "bigram"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return tot.groupby("source", as_index=False).first()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n", "bigram"],
                            ascending=[True, False, True], kind="mergesort")
        top = df.groupby("source", as_index=False).first()
        return pd.DataFrame(
            {
                "source": top["source"],
                "top_bigram": top["bigram"],
                "n_occurrences": top["n"].astype(np.int64),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # |sources| rows per bucket
        .map_batches(finish, batch_format="pandas")
    )


def sentence_length_histogram(sf_dir: str):
    """Corpus sentence-length distribution: word counts of non-empty
    sentences (split on runs of .!?), histogrammed — the readability
    companion that catches run-on extraction artifacts.

    Scale shape: one vectorized RE2 split per batch (list offsets give
    per-sentence word counts with no Python per sentence), bounded
    length-domain partials, repartition(1) fold.

    Output: (n_words, n_sentences).
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        sents = pc.split_pattern_regex(text, "[.!?]+")
        flat = pc.list_flatten(sents)
        # space-only trim — matches DuckDB trim()'s default charset
        trimmed = pc.utf8_trim(flat, characters=" ")
        nonempty = pc.not_equal(trimmed, "")
        kept = trimmed.filter(nonempty)
        # words per sentence: spaces + 1 on the trimmed sentence
        n_words = pc.add(pc.count_substring(kept, " "), 1).to_numpy().astype(
            np.int64
        )
        cnt = np.bincount(n_words)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "n_words": pa.array(nz.astype(np.int64)),
                "c": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_words").aggregate([("c", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_words", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_words": pc.cast(g.column("n_words"), pa.int64()),
                "n_sentences": pc.cast(g.column("c_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |lengths| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def snapshot_diff(sf_dir: str, num_partitions: int | None = None):
    """CDC-style snapshot diff: derive two deterministic "versions" of
    the corpus (v1 = doc_id%10 < 6; v2 = doc_id%10 >= 4 with the %10==5
    slice rewritten to uppercase — so removals, adds, changes, and
    unchanged rows all occur), hash-diff them with ONE native FULL
    OUTER join, and report per-category counts — the
    change-data-capture audit between ingest snapshots.

    Scale shape: each side reduces to (key, content-hash) per batch
    before the single full_outer hash exchange; the 4-row verdict folds
    from per-batch bounded partials.

    Guarantee note: changed/unchanged is decided by comparing 62-bit
    non-cryptographic rolling hashes of the two texts, not the full
    text — a hash collision between old and new content misreports a
    changed doc as unchanged with probability ~2^-62 per compared pair.
    That is the standard CDC-audit trade (shipping full text through
    the join defeats the reduction); where collision margin matters
    more than the hash throughput, swap ``hash62_batch`` for
    ``functions.hashing.md5_bytes`` (128-bit, per-row stdlib).

    Output: (change_type, n_docs) — zero-count categories omitted.
    """
    import ray.data as rd

    from ..functions.hashing import hash62_batch
    from ..functions.tables import strip_schema_metadata
    from ..pipelines.relational import _join_partitions, _multi_join_args

    num_partitions, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def side(v2: bool, key: str, h: str):
        def prep(batch: pa.Table) -> pa.Table:
            did = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
            m = did % 10
            keep = (m >= 4) if v2 else (m < 6)
            # filter FIRST — hashing is the dominant per-batch cost and
            # each side drops ~half the corpus
            batch = batch.filter(pa.array(keep))
            text = batch.column("text")
            if v2:
                text = pc.if_else(pa.array(m[keep] == 5),
                                  pc.utf8_upper(text), text)
            hv = hash62_batch(text.to_pylist())
            return pa.table(
                {
                    key: pa.array(did[keep]),
                    h: pa.array(np.asarray(hv)),
                }
            )

        return strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
        ).map_batches(prep, batch_format="pyarrow")

    v1 = side(False, "k1", "h1")
    v2 = side(True, "k2", "h2")

    joined = v1.join(
        v2,
        join_type="full_outer",
        num_partitions=num_partitions,
        on=("k1",),
        right_on=("k2",),
        aggregator_ray_remote_args=agg_args,
    )

    def verdict(t: pa.Table) -> pa.Table:
        # int64 hashes exceed float53 — compare in Arrow, never via a
        # NaN-padded numpy float cast
        only1 = pc.is_null(t.column("h2")).to_numpy(zero_copy_only=False)
        only2 = pc.is_null(t.column("h1")).to_numpy(zero_copy_only=False)
        both = ~(only1 | only2)
        eq = pc.fill_null(
            pc.equal(t.column("h1"), t.column("h2")), False
        ).to_numpy(zero_copy_only=False)
        changed = both & ~eq
        unchanged = both & eq
        return pa.table(
            {
                "change_type": pa.array(
                    ["added", "removed", "changed", "unchanged"]
                ),
                "n": pa.array(
                    np.array([only2.sum(), only1.sum(), changed.sum(),
                              unchanged.sum()], np.int64)
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("change_type").aggregate([("n", "sum")])
        g = g.filter(pc.greater(g.column("n_sum"), 0))
        idx = pc.sort_indices(g, sort_keys=[("change_type", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "change_type": g.column("change_type"),
                "n_docs": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        joined.map_batches(verdict, batch_format="pyarrow")
        .repartition(1)  # 4 rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


KEYWORD_SET = ("data", "query", "stream", "merge", "vector",
               "window", "hash", "batch", "join", "scan")


class _KeywordSpotter:
    """Warm actor-pool keyword spotter: the compiled pattern set is
    actor state built ONCE in __init__ (the stateful-stage contract:
    setup per actor, work per batch), mirroring how a real lexicon or
    automaton (Aho-Corasick, FlashText) would be held warm."""

    def __init__(self, keywords: tuple[str, ...] = KEYWORD_SET):
        self.keywords = keywords
        self.patterns = [rf"\b{k}\b" for k in keywords]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        ks, docs, occ = [], [], []
        for k, pat in zip(self.keywords, self.patterns):
            c = pc.count_substring_regex(text, pat).to_numpy().astype(
                np.int64
            )
            ks.append(k)
            docs.append(int((c > 0).sum()))
            occ.append(int(c.sum()))
        return pa.table(
            {
                "keyword": pa.array(ks, pa.string()),
                "d": pa.array(np.array(docs, np.int64)),
                "o": pa.array(np.array(occ, np.int64)),
            }
        )


def keyword_spotting(sf_dir: str, concurrency: int = 2):
    """Corpus keyword-spotting through a WARM ACTOR POOL: per keyword,
    how many documents match and how many occurrences exist (word
    boundaries) — the lexicon-scan stage of a filtering pipeline, with
    the pattern set compiled once per actor, not once per batch.

    Scale shape: bounded |keywords| partials per batch, repartition(1)
    fold; the pool is the point — at 100 TB the lexicon is large and
    actor reuse amortizes its build.

    Output: (keyword, n_docs_matched, n_occurrences).
    """
    import ray.data as rd

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("keyword").aggregate([("d", "sum"), ("o", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("keyword", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "keyword": g.column("keyword"),
                "n_docs_matched": pc.cast(g.column("d_sum"), pa.int64()),
                "n_occurrences": pc.cast(g.column("o_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(_KeywordSpotter, concurrency=concurrency,
                     num_cpus=0.5, batch_format="pyarrow")
        .repartition(1)  # bounded |keywords| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def source_sentence_dup_rate(sf_dir: str, num_buckets: int = 64):
    """Within-source sentence duplication: per source, total sentences
    and occurrences of sentences seen more than once in that source —
    the boilerplate-contamination rate behind C4-style sentence dedup.

    Scale shape: per-batch (source, sentence) counts combine (all-Arrow
    split + group_by) before ONE composite-hash bucket shuffle; buckets
    finish each sentence's per-source total and fold (total, dup)
    partials per source; the bounded |sources| grid reduces via
    repartition(1). Sentence = space-trimmed non-empty [.!?]+ segment.

    Output: (source, n_sentences, n_dup_occurrences).
    """
    import pandas as pd
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        sents = pc.split_pattern_regex(text, "[.!?]+")
        flat = pc.list_flatten(sents)
        trimmed = pc.utf8_trim(flat, characters=" ")
        lens = np.diff(sents.offsets.to_numpy())
        src = np.repeat(
            batch.column("source").to_numpy(zero_copy_only=False), lens
        )
        keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        t = pa.table(
            {"source": pa.array(src[keep]),
             "sent": trimmed.filter(pa.array(keep))}
        )
        part = t.group_by(["source", "sent"]).aggregate([("sent", "count")])
        key = pc.binary_join_element_wise(
            part.column("source"), part.column("sent"), "\x1f"
        )
        h = hash62_batch(key.to_pylist())
        return pa.table(
            {
                "source": part.column("source"),
                "n": pc.cast(part.column("sent_count"), pa.int64()),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
                "key": key,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        n = g["n"].to_numpy().astype(np.int64)
        order = np.argsort(key, kind="stable")
        key, n = key[order], n[order]
        src = g["source"].to_numpy()[order]
        seg = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tot = np.add.reduceat(n, seg)
        s = src[seg]
        dup = np.where(tot > 1, tot, 0)
        out = pd.DataFrame({"source": s, "t": tot, "d": dup})
        return out.groupby("source", as_index=False).agg(
            t=("t", "sum"), d=("d", "sum")
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("t", "sum"), ("d", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "source": g.column("source"),
                "n_sentences": pc.cast(g.column("t_sum"), pa.int64()),
                "n_dup_occurrences": pc.cast(g.column("d_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |sources| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


# English function words plus the corpus's own high-frequency connectives —
# the synthetic vocabulary carries few true English stopwords, so the rule
# would otherwise be constant-fail and the oracle check vacuous.
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "data", "order", "line")


def gopher_rules_profile(
    sf_dir: str,
    min_words: int = 15,
    max_words: int = 800,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    min_stopword_types: int = 2,
):
    """Per-source Gopher-style quality-rule failure counts — the four
    document-level repetition-free rules of the Gopher/MassiveText cleaning
    recipe (word-count bounds, mean-word-length bounds, stopword presence,
    alpha-word ratio), each exact-integer so the oracle is bit-identical:
    mean-length bounds compare ``sum_len`` against ``bound * n_words`` and
    the 80%-alpha rule compares ``5 * n_alpha < 4 * n_words``.

    Scale shape: one pruned scan, all-Arrow per-batch kernel (regex count
    kernels + one split for the per-word alpha/stopword masks folded with
    add.reduceat over the list offsets), per-source combiner, bounded
    |sources| fold.

    Output: (source, n_docs, fail_wordcount, fail_meanlen, fail_stopword,
    fail_alpha, fail_any).
    """
    import ray.data as rd

    sw_set = set(GOPHER_STOPWORDS)

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        n_words = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(
            np.int64
        )
        sum_len = (
            pc.utf8_length(text).to_numpy().astype(np.int64) - (n_words - 1)
        )
        words = pc.split_pattern(text, " ")
        offs = words.offsets.to_numpy()
        flat = words.values
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        )
        n_alpha = np.add.reduceat(
            np.r_[alpha.astype(np.int64), 0], offs[:-1]
        ) * (np.diff(offs) > 0)
        # distinct stopword TYPES present: one boolean per (doc, stopword)
        enc = pc.dictionary_encode(flat)
        vocab = enc.dictionary.to_pylist()
        sw_codes = np.array(
            [i for i, w in enumerate(vocab) if w in sw_set], dtype=np.int64
        )
        codes = enc.indices.to_numpy().astype(np.int64)
        is_sw = np.isin(codes, sw_codes)
        doc_of = np.repeat(np.arange(len(text), dtype=np.int64),
                           np.diff(offs))
        if is_sw.any():
            pairs = np.unique(
                doc_of[is_sw] * np.int64(len(vocab)) + codes[is_sw]
            )
            sw_types = np.bincount(
                (pairs // np.int64(len(vocab))).astype(np.int64),
                minlength=len(text),
            ).astype(np.int64)
        else:
            sw_types = np.zeros(len(text), np.int64)

        f_wc = (n_words < min_words) | (n_words > max_words)
        f_ml = (sum_len < min_mean_len * n_words) | (
            sum_len > max_mean_len * n_words
        )
        f_sw = sw_types < min_stopword_types
        f_al = 5 * n_alpha < 4 * n_words
        t = pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array(np.ones(len(text), np.int64)),
                "wc": pa.array(f_wc.astype(np.int64)),
                "ml": pa.array(f_ml.astype(np.int64)),
                "sw": pa.array(f_sw.astype(np.int64)),
                "al": pa.array(f_al.astype(np.int64)),
                "anyf": pa.array(
                    (f_wc | f_ml | f_sw | f_al).astype(np.int64)
                ),
            }
        )
        return t.group_by("source").aggregate(
            [("n", "sum"), ("wc", "sum"), ("ml", "sum"), ("sw", "sum"),
             ("al", "sum"), ("anyf", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_sum", "sum"), ("wc_sum", "sum"), ("ml_sum", "sum"),
             ("sw_sum", "sum"), ("al_sum", "sum"), ("anyf_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "fail_wordcount": pc.cast(g.column("wc_sum_sum"), pa.int64()),
                "fail_meanlen": pc.cast(g.column("ml_sum_sum"), pa.int64()),
                "fail_stopword": pc.cast(g.column("sw_sum_sum"), pa.int64()),
                "fail_alpha": pc.cast(g.column("al_sum_sum"), pa.int64()),
                "fail_any": pc.cast(g.column("anyf_sum_sum"), pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|sources|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def duplicate_ngram_coverage(sf_dir: str, k: int = 5,
                             num_partitions: int | None = None):
    """Per-source duplicated-k-gram coverage — the RefinedWeb / Gopher
    "fraction of n-gram positions whose n-gram occurs >= 2 times in the
    corpus" dedup signal, with multiplicity preserved (a doc repeating its
    own boilerplate counts, unlike the distinct-shingle dedup ops).

    Scale shape: positions explode once and materialize (scanned twice);
    the duplicated-gram set comes from ONE groupby count (pre-combined
    per batch), and the coverage test is a native hash-shuffle semi-join
    on the gram — the dup-gram side is corpus-derived and never assumed
    driver-small. Totals fold per source from the same materialized scan.

    Output: (source, n_grams, n_dup_grams).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.hashing import word_shingle_positions_batch
    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def explode(batch: pa.Table) -> pa.Table:
        doc_idx, sh = word_shingle_positions_batch(batch.column("text"), k)
        src = batch.column("source").combine_chunks()
        return pa.table(
            {"source": pc.take(src, pa.array(doc_idx)), "gram": sh}
        )

    pos = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow")
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # scanned twice (count side + probe side)
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "gram": t.column("gram"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by("gram").aggregate([("n", "sum")])

    dup = (
        pos.map_batches(count_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n_sum", alias_name="n"))
        .filter(expr="n >= 2")
        .map_batches(
            lambda t: pa.table(
                {"dgram": pc.cast(t.column("gram"), pa.string())}
            ),
            batch_format="pyarrow",
        )
    )

    def src_partial(tag_col: str):
        def f(t: pa.Table) -> pa.Table:
            g = pa.table(
                {
                    "source": t.column("source"),
                    "ng": pa.array(
                        np.full(t.num_rows, 1 - ("d" == tag_col), np.int64)
                    ),
                    "nd": pa.array(
                        np.full(t.num_rows, 1 * ("d" == tag_col), np.int64)
                    ),
                }
            )
            return g.group_by("source").aggregate([("ng", "sum"),
                                                   ("nd", "sum")])

        return f

    totals = pos.map_batches(src_partial("t"), batch_format="pyarrow")
    hits = pos.join(
        dup,
        join_type="inner",
        num_partitions=nparts,
        on=("gram",),
        right_on=("dgram",),
        aggregator_ray_remote_args=agg_args,
    ).map_batches(src_partial("d"), batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("ng_sum", "sum"),
                                            ("nd_sum", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "source": g.column("source"),
                "n_grams": pc.cast(g.column("ng_sum_sum"), pa.int64()),
                "n_dup_grams": pc.cast(g.column("nd_sum_sum"), pa.int64()),
            }
        )

    return (
        totals.union(hits)
        .repartition(1)  # O(|sources|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def mad_outliers(sf_dir: str):
    """Per-source robust length outliers — median-absolute-deviation gate,
    the outlier rule that survives the heavy-tailed length distributions a
    z-score breaks on (one 100x boilerplate blob inflates sigma until
    nothing is an outlier; the MAD doesn't move).

    Integer-exact end to end: the median is the LOWER median
    (sorted[(n-1)//2], DuckDB's quantile_disc(0.5) semantics — verified
    element selection, no interpolation), deviations of integer n_chars
    from an integer median are integers, and so is the MAD. The outlier
    predicate (dev > 3*MAD) therefore never touches a float.

    Scale shape: lengths are pre-compressed to (source, n_chars) -> count
    inside each batch (Arrow group_by combiner), so the shuffle and the
    per-source median pass run over DISTINCT length values with weights —
    bounded by the length-value cardinality, not the corpus. Weighted
    lower-medians come from one cumsum + searchsorted per source.

    Output: (source, n_docs, med_chars, mad_chars, n_outliers), ints.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "n_chars": pc.cast(batch.column("n_chars"), pa.int64()),
            }
        )
        g = t.group_by(["source", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table(
            {
                "source": g.column("source"),
                "n_chars": g.column("n_chars"),
                "cnt": pc.cast(g.column("n_chars_count"), pa.int64()),
            }
        )

    def _wmedian_lower(vals: np.ndarray, wts: np.ndarray) -> int:
        # lower median of the expanded multiset: element at index (n-1)//2
        order = np.argsort(vals, kind="mergesort")
        v, w = vals[order], wts[order]
        cum = np.cumsum(w)
        idx = (cum[-1] - 1) // 2
        return int(v[np.searchsorted(cum, idx + 1, side="left")])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy().astype(np.int64)
        w = g["cnt"].to_numpy().astype(np.int64)
        med = _wmedian_lower(v, w)
        dev = np.abs(v - med)
        mad = _wmedian_lower(dev, w)
        n_out = int(w[dev > 3 * mad].sum())
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": [int(w.sum())],
                "med_chars": [med],
                "mad_chars": [mad],
                "n_outliers": [n_out],
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("source")
        .map_groups(per_source, batch_format="pandas")
    )


def collocation_pmi_terms(sf_dir: str, min_count: int = 5,
                          num_partitions: int | None = None):
    """Collocation-detection TERMS — for every bigram seen >= ``min_count``
    times, the exact integer counts PMI needs: the bigram count, both
    unigram counts, and the corpus totals. PMI itself is
    log(n_ab*N / (n_a*n_b)) — emitting the integer terms keeps the oracle
    exact (no float log) and lets the consumer pick base/normalization
    (PMI, NPMI, t-score all derive from these five numbers).

    Scale shape: bigram and unigram counts are both combiner-first (Arrow
    group_by inside each batch, one row per distinct gram per batch on the
    wire); the frequency filter shrinks the bigram side BEFORE the two
    hash joins that attach unigram counts, and the joins are native
    dataset joins — the unigram vocabulary never has to fit anywhere.

    Output: (bigram, n_ab, n_left, n_right, n_pairs, n_words), ints.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .relational import _join_partitions, _multi_join_args

    nparts, agg_args = _multi_join_args(_join_partitions(num_partitions))

    def bigram_partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        offsets = words.offsets.to_numpy()[1:-1]
        mask = np.ones(n - 1, dtype=bool)
        mask[offsets - 1] = False
        mask_arr = pa.array(mask)
        left = flat.slice(0, n - 1).filter(mask_arr)
        right = flat.slice(1, n - 1).filter(mask_arr)
        bigram = pc.binary_join_element_wise(left, right, " ")
        g = pa.table({"bigram": bigram}).group_by("bigram").aggregate(
            [("bigram", "count")]
        )
        return pa.table(
            {
                "bigram": g.column("bigram"),
                "n": pc.cast(g.column("bigram_count"), pa.int64()),
            }
        )

    def unigram_partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        flat = pc.list_flatten(pc.split_pattern(text, " "))
        g = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")]
        )
        return pa.table(
            {
                "word": g.column("word"),
                "n": pc.cast(g.column("word_count"), pa.int64()),
            }
        )

    docs = _docs(sf_dir)
    big = (
        docs.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n_ab"))
        .materialize()  # reused for the total AND the filtered join input
    )
    uni = (
        docs.map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n_w"))
        .materialize()  # reused for both join sides AND the token total
    )
    n_pairs = int(big.sum("n_ab"))
    n_words = int(uni.sum("n_w"))

    def split_filter(t: pa.Table) -> pa.Table:
        n_ab = pc.cast(t.column("n_ab"), pa.int64())
        keep = pc.greater_equal(n_ab, min_count)
        t = pa.table({"bigram": t.column("bigram"), "n_ab": n_ab}).filter(keep)
        parts = pc.split_pattern(t.column("bigram").combine_chunks(), " ")
        flat = pc.list_flatten(parts)
        return pa.table(
            {
                "bigram": t.column("bigram"),
                "n_ab": t.column("n_ab"),
                "lw": flat.take(np.arange(0, 2 * len(t), 2)),
                "rw": flat.take(np.arange(1, 2 * len(t), 2)),
            }
        )

    def uni_as(name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"{name}_w": t.column("word"),
                    f"n_{name}": pc.cast(t.column("n_w"), pa.int64()),
                }
            )

        return fn

    fb = big.map_batches(split_filter, batch_format="pyarrow")
    j1 = fb.join(
        uni.map_batches(uni_as("left"), batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts,
        on=("lw",), right_on=("left_w",),
        aggregator_ray_remote_args=agg_args,
    )
    j2 = j1.join(
        uni.map_batches(uni_as("right"), batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts,
        on=("rw",), right_on=("right_w",),
        aggregator_ray_remote_args=agg_args,
    )

    def finish(t: pa.Table) -> pa.Table:
        k = len(t)
        return pa.table(
            {
                "bigram": t.column("bigram"),
                "n_ab": pc.cast(t.column("n_ab"), pa.int64()),
                "n_left": pc.cast(t.column("n_left"), pa.int64()),
                "n_right": pc.cast(t.column("n_right"), pa.int64()),
                "n_pairs": pa.array(np.full(k, n_pairs, dtype=np.int64)),
                "n_words": pa.array(np.full(k, n_words, dtype=np.int64)),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def winnowing_fingerprints(sf_dir: str, k: int = 3, window: int = 4):
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS algorithm): per document, hash every k-word shingle,
    slide a ``window`` over the hash sequence, select the minimum of each
    window (ties -> leftmost position), and count the DISTINCT selected
    fingerprints. The winnowing guarantee — any match of length >=
    window+k-1 words shares a selected fingerprint — is what makes the
    selected set a valid sub-linear index for near-dup/plagiarism search.

    Determinism pins: the shingle hash is the shared rolling31/MULT_A
    polynomial (SQL-reproducible), packed as hash*2^20 + 1-based position
    so the per-window argmin (and its tie rule) is a single integer min;
    documents shorter than a full window still select the minimum of what
    they have (the standard boundary convention), so every doc with >= k
    words yields >= 1 fingerprint.

    Scale shape: zero shuffles — documents are row-complete in their
    batch, so shingling (all-Arrow), hashing (one vectorized codepoint
    pass), the sliding min (``window`` shifted-array minimums with
    doc-boundary sentinels) and the distinct count (one lexsort) are all
    batch-local.

    Output: (doc_id, n_grams, n_selected), all int64.
    """
    import ray.data as rd

    from ..functions.hashing import MULT_A, rolling31_batch, word_shingle_positions_batch

    sent = np.iinfo(np.int64).max

    def per_batch(batch: pa.Table) -> pa.Table:
        doc_ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        doc_idx, sh = word_shingle_positions_batch(batch.column("text"), k)
        n_docs = len(doc_ids)
        n_grams = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        n_sel = np.zeros(n_docs, dtype=np.int64)
        total = len(doc_idx)
        if total:
            h31 = rolling31_batch(sh.to_pylist(), MULT_A)
            # 1-based position within the doc (matches the SQL oracle's i)
            starts = np.r_[0, np.cumsum(n_grams[n_grams > 0])[:-1]]
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                starts, n_grams[n_grams > 0]
            ) + 1
            assert pos.max() < (1 << 20), "doc too long for winnowing pack"
            pk = h31 * (np.int64(1) << 20) + pos
            # window min with doc-boundary + end-of-array sentinels
            wmin = pk.copy()
            for s in range(1, window):
                shifted = np.full(total, sent, dtype=np.int64)
                shifted[: total - s] = pk[s:]
                shifted[: total - s][doc_idx[s:] != doc_idx[: total - s]] = sent
                np.minimum(wmin, shifted, out=wmin)
            # valid window starts: pos <= max(n_grams - (window-1), 1)
            lim = np.maximum(n_grams[doc_idx] - (window - 1), 1)
            keep = pos <= lim
            d_k, w_k = doc_idx[keep], wmin[keep]
            order = np.lexsort((w_k, d_k))
            d_s, w_s = d_k[order], w_k[order]
            new = np.ones(len(d_s), dtype=bool)
            new[1:] = (d_s[1:] != d_s[:-1]) | (w_s[1:] != w_s[:-1])
            np.add.at(n_sel, d_s[new], 1)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "n_grams": pa.array(n_grams),
                "n_selected": pa.array(n_sel),
            }
        )

    return _docs(sf_dir).map_batches(per_batch, batch_format="pyarrow")


# ----------------------------------------------------------- curation funnel
def curation_funnel(sf_dir: str, lang: str = "en", num_buckets: int = 64,
                    bench_source: str = "src0"):
    """The whole training-data curation pipeline as ONE funnel readout: how
    many documents survive each cumulative stage —

      1 raw corpus
      2 + quality rules (the ``quality_filter`` gates)
      3 + language selection (detected ``lang``)
      4 + exact dedup (doc is the global min-doc_id for its md5(text))
      5 + near-dup dedup (doc is not a simhash-cluster loser;
          cluster resolution from ``duplicate_clusters``)
      6 + decontamination (doc is not of ``bench_source`` and shares no
          word 3-shingle with it, per ``contamination_check``)

    Dedup winners are corpus-GLOBAL (the standard order: resolve duplicate
    clusters on the raw corpus, then intersect with the filter funnel), so
    every stage is an independent per-doc predicate and the funnel is a
    cumulative conjunction — which is what makes the whole thing one
    streaming pass plus the dedup stages' own bounded shuffles.

    Scale shape: one map computes the per-doc quality/lang flags and tags
    near-dup losers via a broadcast of the (cluster-member-scale) loser id
    array; the exact-winner flag rides the md5-bucket groupby (shuffle 1);
    the contamination flag arrives as sparse (doc_id, 1) rows unioned in
    and merged by a doc_id groupby (shuffle 2 — union-then-merge instead
    of a second join, the repo's zero-hit pattern); the funnel itself
    reduces to six integers via per-batch partial sums.

    Output: (stage, n_docs), both int64, 6 rows.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .dedup import contamination_check, duplicate_clusters_cached

    labels = duplicate_clusters_cached(sf_dir)
    lose_ids = np.sort(
        labels.column("doc_id").to_numpy()[
            labels.column("doc_id").to_numpy()
            != labels.column("cluster_id").to_numpy()
        ]
    )
    lose_ref = ray.put(lose_ids)

    FLAGS = ["base", "q", "en", "exact", "not_loser", "not_bench", "cont"]

    def base_flags(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        nt = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        stop = pc.count_substring_regex(text, STOPWORD_PATTERN).to_numpy().astype(np.int64)
        langs = detect_languages_arrow(text.combine_chunks())
        q = (nt >= 15) & (nt <= 120) & (stop * 20 >= nt)
        hashes = np.array(
            [md5_str(t) for t in text.to_pylist()], dtype=object
        )
        bucket = np.array(
            [int(h[:8], 16) % num_buckets for h in hashes], dtype=np.int64
        )
        losers = ray.get(lose_ref)
        pos = np.searchsorted(losers, ids)
        is_loser = (pos < len(losers)) & (losers[np.minimum(pos, max(len(losers) - 1, 0))] == ids) \
            if len(losers) else np.zeros(len(ids), dtype=bool)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "bucket": pa.array(bucket),
                "content_hash": pa.array(hashes, type=pa.string()),
                "base": pa.array(np.ones(len(ids), dtype=np.int64)),
                "q": pa.array(q.astype(np.int64)),
                "en": pa.array((langs == lang).astype(np.int64)),
                "not_loser": pa.array((~is_loser).astype(np.int64)),
                "not_bench": pa.array((src != bench_source).astype(np.int64)),
            }
        )

    def mark_exact(g):
        import pandas as pd

        g = g.sort_values(["content_hash", "doc_id"], kind="mergesort")
        exact = ~g["content_hash"].duplicated(keep="first")
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64").to_numpy(),
                "exact": exact.astype("int64").to_numpy(),
                "cont": np.zeros(len(g), dtype=np.int64),
            }
        )
        for c in ("base", "q", "en", "not_loser", "not_bench"):
            out[c] = g[c].astype("int64").to_numpy()
        return out[["doc_id"] + FLAGS]

    flagged = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "source"],
        )
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow")
        .map_batches(base_flags, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark_exact, batch_format="pandas")
        # rejoin the arrow world so the union with cont is homogeneous
        .map_batches(lambda t: t, batch_format="pyarrow")
    )

    def cont_rows(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("contaminated"), 1)
        ids = pc.filter(pc.cast(batch.column("doc_id"), pa.int64()), keep)
        z = np.zeros(len(ids), dtype=np.int64)
        cols = {"doc_id": ids}
        for c in FLAGS:
            cols[c] = pa.array(z if c != "cont"
                               else np.ones(len(ids), dtype=np.int64))
        return pa.table(cols)

    cont = contamination_check(sf_dir, bench_source=bench_source).map_batches(
        cont_rows, batch_format="pyarrow"
    )

    merged = flagged.union(cont).groupby("doc_id").aggregate(
        *[Sum(c, alias_name=c) for c in FLAGS]
    )

    def partial_funnel(batch: pa.Table) -> pa.Table:
        f = {c: batch.column(c).to_numpy() > 0 for c in FLAGS}
        s2 = f["q"]
        s3 = s2 & f["en"]
        s4 = s3 & f["exact"]
        s5 = s4 & f["not_loser"]
        s6 = s5 & f["not_bench"] & ~f["cont"]
        return pa.table(
            {
                "s1": pa.array([len(batch)], type=pa.int64()),
                "s2": pa.array([int(s2.sum())]),
                "s3": pa.array([int(s3.sum())]),
                "s4": pa.array([int(s4.sum())]),
                "s5": pa.array([int(s5.sum())]),
                "s6": pa.array([int(s6.sum())]),
            }
        )

    tot = merged.map_batches(partial_funnel, batch_format="pyarrow").sum(
        ["s1", "s2", "s3", "s4", "s5", "s6"]
    )
    return pa.table(
        {
            "stage": pa.array(np.arange(1, 7, dtype=np.int64)),
            "n_docs": pa.array(
                np.array([tot[f"sum(s{i})"] for i in range(1, 7)],
                         dtype=np.int64)
            ),
        }
    )


# ------------------------------------------------ two-sample KS drift terms
def ks_drift_terms(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov statistic of each source's
    document-length distribution against the REST of the corpus, as an
    integer rational: D = d_num / d_den with
    d_num = max over values v of |cdf_src(v)*n_rest - cdf_rest(v)*n_src|
    scaled by d_den = n_src * n_rest. The drift gate a mixture-weighted
    corpus needs: a source whose length CDF walks away from the blend is
    re-weighted or re-cleaned. Integer form means no float CDFs anywhere —
    both engines compare exact products.

    Scale shape: lengths count-compress per (source, n_chars) inside
    batches before one bounded groupby (the domain is |sources| x
    |distinct lengths| — value-scale, not corpus-scale), then the CDF walk
    is a driver-side numpy cumsum over that bounded table. Corpora with
    unbounded value domains would quantize lengths first (the same move
    drift_psi_terms makes with its quantile bins).

    Output: (source, n_s, d_num, d_den) — n_s/d_num/d_den int64.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "v": pc.cast(batch.column("n_chars"), pa.int64()),
                "cnt": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["source", "v"]).aggregate([("cnt", "sum")])

    counts = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
        )
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow")
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("cnt_sum", alias_name="cnt"))
        .to_pandas()  # bounded: |sources| x |distinct lengths|
    )

    src_codes, src_names = counts["source"].factorize(sort=True)
    vals = np.sort(counts["v"].unique())
    vpos = np.searchsorted(vals, counts["v"].to_numpy())
    cnt = counts["cnt"].to_numpy().astype(np.int64)
    n_src = len(src_names)
    grid = np.zeros((n_src, len(vals)), dtype=np.int64)
    np.add.at(grid, (src_codes, vpos), cnt)
    cum = np.cumsum(grid, axis=1)
    tot_cum = cum.sum(axis=0)
    n_s = grid.sum(axis=1)
    n = int(n_s.sum())
    rows = []
    for i in range(n_src):
        rest = n - n_s[i]
        gap = np.abs(cum[i] * rest - (tot_cum - cum[i]) * n_s[i])
        rows.append((str(src_names[i]), int(n_s[i]), int(gap.max()),
                     int(n_s[i] * rest)))
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], type=pa.string()),
            "n_s": pa.array([r[1] for r in rows], type=pa.int64()),
            "d_num": pa.array([r[2] for r in rows], type=pa.int64()),
            "d_den": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


# ------------------------------------------------------- BM25 term stats
def bm25_terms(sf_dir: str,
               terms: tuple[str, ...] = ("scan", "merge", "window", "spark"),
               k: int = 50):
    """BM25 scoring terms for a fixed query: per (query term, document)
    the exact term frequency and document length, plus the term's corpus
    document frequency — every integer the BM25 formula consumes
    (idf(df), tf, dl/avgdl) — limited to the top ``k`` docs per term by
    (tf DESC, doc_id ASC). Emitting the integer terms keeps the oracle
    exact; the float score assembly (k1, b, log) is one consumer-side
    expression.

    Scale shape: the query is tiny and rides inside the closure; each
    batch runs |terms| vectorized RE2 word-boundary counts
    (pc.count_substring_regex) and reduces to a BOUNDED partial — its
    local top-k rows per term (merge-safe for global top-k under the
    same total order) plus one df partial row per term — so the
    repartition(1) fold sees O(|terms| * k) rows per block and nothing
    row-scale ever shuffles.

    Output: (term, doc_id, tf, dl, df), tf > 0, top-k per term.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        did = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        dl = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy()
        out = []
        for term in terms:
            tf = pc.count_substring_regex(
                text, rf"\b{term}\b"
            ).to_numpy().astype(np.int64)
            nz = np.nonzero(tf > 0)[0]
            top = nz[np.lexsort((did[nz], -tf[nz]))[:k]]
            out.append(pd.DataFrame(
                {
                    "term": term,
                    "doc_id": did[top],
                    "tf": tf[top],
                    "dl": dl[top].astype(np.int64),
                    "dfp": np.int64(0),
                }
            ))
            # df partial: how many docs in THIS batch contain the term
            out.append(pd.DataFrame(
                {
                    "term": [term],
                    "doc_id": np.int64(-1),
                    "tf": np.int64(0),
                    "dl": np.int64(0),
                    "dfp": np.int64(len(nz)),
                }
            ))
        return pa.Table.from_pandas(
            pd.concat(out, ignore_index=True), preserve_index=False
        ).replace_schema_metadata(None)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        dfs = df[df["doc_id"] < 0].groupby("term")["dfp"].sum()
        cand = df[df["doc_id"] >= 0]
        rows = []
        for term, g in cand.groupby("term", sort=True):
            order = np.lexsort((g["doc_id"].to_numpy(),
                                -g["tf"].to_numpy()))[:k]
            g = g.iloc[order]
            rows.append(pd.DataFrame(
                {
                    "term": term,
                    "doc_id": g["doc_id"].to_numpy(),
                    "tf": g["tf"].to_numpy(),
                    "dl": g["dl"].to_numpy(),
                    "df": np.int64(dfs[term]),
                }
            ))
        if not rows:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64()),
                 "dl": pa.array([], pa.int64()),
                 "df": pa.array([], pa.int64())}
            )
        return pa.Table.from_pandas(
            pd.concat(rows, ignore_index=True), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|terms| * k) rows per block by construction
        .map_batches(finish, batch_format="pyarrow")
    )


# --------------------------------------- Misra-Gries deterministic top-k
def misra_gries_heavy_hitters(sf_dir: str, k: int = 39):
    """Deterministic heavy hitters via a mergeable Misra-Gries summary:
    words whose EXACT corpus frequency strictly exceeds total/(k+1),
    with exact counts. The deterministic counterpart of
    cms_heavy_hitters: MG with k counters guarantees every such word
    survives the sketch (no hash collisions, no randomness), so the
    sketch pass yields a candidate SUPERSET and one exact counting pass
    over the candidates makes the output exact — the two-pass
    sketch-then-verify pattern at its cheapest.

    Scale shape: batch word-count partials reduce to <= k MG counters
    each (subtract the (k+1)-th largest count, keep positive — the
    Agarwal et al. mergeable-summaries merge); the repartition(1) fold
    merges summaries the same way, so nothing vocabulary-scale leaves a
    block. The verify pass re-scans the materialized per-batch counts
    with the <= k candidates broadcast in the closure.

    Output: (word, n_occurrences), n*(k+1) > total, sorted n DESC, word.
    """
    import ray.data as rd

    def word_counts(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        flat = pc.list_flatten(pc.split_pattern(text, " "))
        part = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")]
        )
        return pa.table(
            {
                "word": part.column("word"),
                "n": pc.cast(part.column("word_count"), pa.int64()),
            }
        )

    counted = _docs(sf_dir).map_batches(
        word_counts, batch_format="pyarrow"
    ).materialize()  # scanned by the sketch fold, the total, and verify

    def mg_reduce(t: pa.Table) -> pa.Table:
        w = t.column("word")
        n = t.column("n").to_numpy()
        if len(n) > k:
            thr = np.partition(n, -(k + 1))[-(k + 1)]
            keep = n - thr > 0
            return pa.table(
                {"word": w.filter(pa.array(keep)),
                 "n": pa.array(n[keep] - thr)}
            )
        return t

    def mg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("word").aggregate([("n", "sum")])
        return mg_reduce(pa.table(
            {"word": g.column("word"),
             "n": pc.cast(g.column("n_sum"), pa.int64())}
        ))

    summary = (
        counted.map_batches(mg_reduce, batch_format="pyarrow")
        .repartition(1)  # <= k rows per block by construction
        .map_batches(mg_merge, batch_format="pyarrow")
        .take_all()  # <= k candidate rows: the merged sketch is tiny
    )
    cand = {r["word"] for r in summary}
    total = int(counted.sum("n") or 0)

    def exact_partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("word"),
                        value_set=pa.array(sorted(cand), pa.string()))
        return t.filter(keep)

    if not cand or total == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "n_occurrences": pa.array([], pa.int64())})
    ex = (
        counted.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .to_pandas()
    )
    n = ex["sum(n)"].to_numpy().astype(np.int64)
    keep = n * (k + 1) > total
    ex = ex[keep]
    n = n[keep]
    order = np.lexsort((ex["word"].to_numpy(), -n))
    return pa.table(
        {
            "word": pa.array(ex["word"].to_numpy()[order], pa.string()),
            "n_occurrences": pa.array(n[order], pa.int64()),
        }
    )


# ----------------------------------------------------- heavy-hitter drift
def heavy_hitter_drift(sf_dir: str, k: int = 20):
    """Top-k vocabulary drift between the two doc_id-parity halves of the
    corpus: every word in EITHER half's exact top-k (count DESC, word
    ASC), with its exact count in both halves — the shift detector a
    crawl-over-crawl ingest runs before retraining a tokenizer (a word
    entering/leaving the head of the distribution is the actionable
    signal; the KS/PSI ops cover the body).

    Scale shape: per-batch (half, word, count) combiners -> ONE
    vocabulary-scale groupby(word) producing the (word, n_even, n_odd)
    table, materialized once; each half's top-k then reduces via bounded
    per-block top-k partials (merge-safe under the same total order) and
    the <= 2k winner words filter the same materialized table — no second
    vocabulary shuffle, nothing vocabulary-scale on the driver.

    Output: (word, n_even, n_odd), counts int64 (0 = absent from half).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def word_counts(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text").combine_chunks(), pa.string())
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        offs = words.offsets.to_numpy()
        half = (pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
                % 2).astype(np.int64)
        per_word_half = np.repeat(half, np.diff(offs))
        t = pa.table({"word": flat, "h": pa.array(per_word_half)})
        g = t.group_by(["word", "h"]).aggregate([("h", "count")])
        n = pc.cast(g.column("h_count"), pa.int64()).to_numpy()
        h = g.column("h").to_numpy()
        return pa.table(
            {
                "word": g.column("word"),
                "n_even": pa.array(np.where(h == 0, n, 0)),
                "n_odd": pa.array(np.where(h == 1, n, 0)),
            }
        )

    counts = (
        _docs(sf_dir)
        .map_batches(word_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n_even", alias_name="n_even"),
                   Sum("n_odd", alias_name="n_odd"))
        .materialize()  # scanned by both top-k passes and the final filter
    )

    def topk_partial(col):
        def part(t: pa.Table) -> pa.Table:
            # a word absent from this half never ranks in its top-k
            t = t.filter(pc.greater(t.column(col), 0))
            idx = pc.sort_indices(
                t, sort_keys=[(col, "descending"), ("word", "ascending")]
            )
            return t.take(idx[: min(k, len(t))])
        return part

    winners: set[str] = set()
    for col in ("n_even", "n_odd"):
        top = (
            counts.map_batches(topk_partial(col), batch_format="pyarrow")
            .repartition(1)  # <= k rows per block by construction
            .map_batches(topk_partial(col), batch_format="pyarrow")
            .take_all()  # <= k winner rows
        )
        winners |= {r["word"] for r in top}

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t.column("word"),
                     value_set=pa.array(sorted(winners), pa.string()))
        )

    out = counts.map_batches(keep, batch_format="pyarrow").to_pandas()
    out = out.sort_values("word", kind="mergesort")
    return pa.table(
        {
            "word": pa.array(out["word"].to_numpy(), pa.string()),
            "n_even": pa.array(out["n_even"].to_numpy(), pa.int64()),
            "n_odd": pa.array(out["n_odd"].to_numpy(), pa.int64()),
        }
    )


# RE2-compatible PII patterns — identical semantics in pyarrow
# (count/replace_substring_regex) and DuckDB (regexp_extract_all /
# regexp_replace 'g'); both embed RE2, so greedy-with-give-back matching
# of the dotted-host email pattern is bit-identical across engines.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\+1-555-[0-9]{4}"


def pii_scrub_stats(sf_dir: str):
    """PII scrubbing audit — the redaction pass every LLM training-data
    pipeline runs before tokenization. The synthetic corpus is PII-free
    word soup, so each document is first LACED deterministically with
    synthetic contact strings (an email + a US-555 phone per doc, a second
    email on every third doc), then a REAL regex scrub runs: count the
    matches and measure the characters removed by replacing them with
    <EMAIL> / <PHONE> tags. The oracle re-laces the same text in SQL and
    scrubs with DuckDB's RE2 — any drift in pattern semantics or
    replacement accounting breaks equality.

    Scale shape: pure vectorized map (compiled RE2 kernels over Arrow
    string batches, no Python per-row loop) + a 20-key combiner groupby —
    scale-safe at any corpus size; this is the exact shape a production
    scrub stage has, minus nothing.

    Output per source: (source, n_docs, n_emails, n_phones,
    chars_removed) sorted by source.
    """

    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def scrub(batch: pa.Table) -> pa.Table:
        ids_np = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids_s = pa.array(ids_np.astype(str))
        mod7 = pa.array((ids_np % 7).astype(str))
        pad4 = pc.utf8_lpad(pa.array((ids_np % 10000).astype(str)), 4, "0")
        laced = pc.binary_join_element_wise(
            batch.column("text").combine_chunks(),
            " contact user", ids_s, "@mail", mod7,
            ".example.com or call +1-555-", pad4,
            "",
        )
        extra = pc.binary_join_element_wise(
            " alt.x", ids_s, "@test.org", "")
        laced = pc.if_else(
            pa.array(ids_np % 3 == 0),
            pc.binary_join_element_wise(laced, extra, ""),
            laced,
        )
        n_email = pc.count_substring_regex(laced, PII_EMAIL_PATTERN)
        n_phone = pc.count_substring_regex(laced, PII_PHONE_PATTERN)
        red = pc.replace_substring_regex(laced, PII_EMAIL_PATTERN, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_PHONE_PATTERN, "<PHONE>")
        removed = pc.subtract(
            pc.utf8_length(laced), pc.utf8_length(red))
        return (
            pa.table(
                {
                    "source": batch.column("source"),
                    "n_docs": pa.array(
                        np.ones(len(ids_np), np.int64)),
                    "n_emails": pc.cast(n_email, pa.int64()),
                    "n_phones": pc.cast(n_phone, pa.int64()),
                    "chars_removed": pc.cast(removed, pa.int64()),
                }
            )
            .group_by("source")
            .aggregate(
                [("n_docs", "sum"), ("n_emails", "sum"),
                 ("n_phones", "sum"), ("chars_removed", "sum")]
            )
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_docs_sum", "sum"), ("n_emails_sum", "sum"),
             ("n_phones_sum", "sum"), ("chars_removed_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        return pa.table(
            {
                "source": g.column("source"),
                "n_docs": pc.cast(g.column("n_docs_sum_sum"), pa.int64()),
                "n_emails": pc.cast(g.column("n_emails_sum_sum"), pa.int64()),
                "n_phones": pc.cast(g.column("n_phones_sum_sum"), pa.int64()),
                "chars_removed": pc.cast(
                    g.column("chars_removed_sum_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        )
        .map_batches(scrub, batch_format="pyarrow")
        .repartition(1)  # 20 sources x 5 int cols — metadata scale
        .map_batches(finish, batch_format="pyarrow")
    )


def text_diff_stats(sf_dir: str):
    """CDC text diffing with a REAL diff algorithm: each document's v2 is
    the original with tokens at positions (doc_id + pos) % 7 == 0
    substituted by out-of-vocabulary markers, and a Myers O(ND) LCS walk
    (functions/diff.py — difflib.SequenceMatcher is NOT LCS and
    undercounts on repetitive inputs) recovers the equal/changed token
    split from the two texts alone. Substitutes match nothing, so the LCS
    mass must equal exactly n_tokens - n_substituted — the oracle
    recomputes that from the generative formula.

    Scale shape: per-doc diff in a map stage (diff is inherently
    per-document; cost O((n+m)·d), linear in the change count), 20-source
    bounded fold.

    Output: (source, n_docs, n_equal_tokens, n_changed_tokens).
    """
    import ray.data as rd

    from ..functions.diff import lcs_length

    from ..functions.tables import strip_schema_metadata

    def diff_partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        agg: dict[str, np.ndarray] = {}
        for did, src, t in zip(ids, srcs, texts):
            did = int(did)
            v1 = t.split(" ")
            v2 = [
                f"qq{(did + p) % 3}" if (did + p) % 7 == 0 else w
                for p, w in enumerate(v1)
            ]
            eq = lcs_length(v1, v2)
            row = agg.setdefault(src, np.zeros(3, np.int64))
            row += (1, eq, len(v1) - eq)
        keys = sorted(agg)
        m = np.array([agg[k] for k in keys], np.int64).reshape(-1, 3)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array(m[:, 0]),
                "n_equal_tokens": pa.array(m[:, 1]),
                "n_changed_tokens": pa.array(m[:, 2]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        cols = ["n_docs", "n_equal_tokens", "n_changed_tokens"]
        g = t.group_by("source").aggregate([(c, "sum") for c in cols])
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        out = {"source": g.column("source")}
        for c in cols:
            out[c] = pc.cast(g.column(f"{c}_sum"), pa.int64())
        return pa.table(out)

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "source"],
            )
        )
        .map_batches(diff_partial, batch_format="pyarrow")
        .repartition(1)  # 20-source bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


def dictionary_compression_audit(sf_dir: str, dict_size: int = 16):
    """Dictionary-coding audit — the build-table -> broadcast -> encode
    shape of every columnar dictionary encoder: phase 1 counts tokens per
    source and takes each source's top ``dict_size`` (count desc, token
    asc — fully deterministic); phase 2 broadcasts the per-source
    dictionaries once and counts dictionary hits vs literals per source.

    Scale shape: phase-1 counts combine per batch before the exchange and
    the dictionary table is (sources x dict_size)-bounded; phase 2 is a
    pure vectorized map (pc.is_in against the source's value set).

    Output: (source, n_dict_hits, n_literals).
    """
    import ray
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def count_partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            batch.column("text").combine_chunks(), pattern=" "
        )
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy()
        srcs = np.asarray(batch.column("source").to_pylist(), dtype=object)
        return (
            pa.table(
                {
                    "source": pa.array(srcs[parent], pa.string()),
                    "token": flat,
                    "n": pa.array(np.ones(len(flat), np.int64)),
                }
            )
            .group_by(["source", "token"])
            .aggregate([("n", "sum")])
        )

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "source"]
        )
    )
    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .sum("n_sum")
        .to_pandas()  # (sources x vocab)-bounded — metadata scale
    )
    counts = counts.sort_values(
        ["source", "sum(n_sum)", "token"],
        ascending=[True, False, True],
        ignore_index=True,
    )
    top = counts.groupby("source").head(dict_size)
    dicts = {
        src: set(g["token"]) for src, g in top.groupby("source")
    }
    dicts_ref = ray.put(dicts)

    def encode_partial(batch: pa.Table) -> pa.Table:
        dct = ray.get(dicts_ref)
        parts = pc.split_pattern(
            batch.column("text").combine_chunks(), pattern=" "
        )
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy()
        srcs = np.asarray(batch.column("source").to_pylist(), dtype=object)
        tok_src = srcs[parent]
        hits = np.zeros(len(tok_src), bool)
        for src in np.unique(tok_src):
            m = tok_src == src
            vs = pa.array(sorted(dct.get(src, ())), pa.string())
            hits[m] = pc.is_in(
                flat.filter(pa.array(m)), value_set=vs
            ).to_numpy(zero_copy_only=False)
        agg: dict[str, np.ndarray] = {}
        for src in np.unique(tok_src):
            m = tok_src == src
            agg[src] = np.array(
                [int(hits[m].sum()), int((~hits[m]).sum())], np.int64
            )
        keys = sorted(agg)
        m2 = np.array([agg[k] for k in keys], np.int64).reshape(-1, 2)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_dict_hits": pa.array(m2[:, 0]),
                "n_literals": pa.array(m2[:, 1]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_dict_hits", "sum"), ("n_literals", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        return pa.table(
            {
                "source": g.column("source"),
                "n_dict_hits": pc.cast(g.column("n_dict_hits_sum"),
                                       pa.int64()),
                "n_literals": pc.cast(g.column("n_literals_sum"),
                                      pa.int64()),
            }
        )

    return (
        ds.map_batches(encode_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


class RegexRouter:
    """Actor-pool first-match-wins document router: the route patterns
    compile ONCE per actor in __init__ (the stateful-stage showcase —
    setup cost amortizes over every batch the actor sees), and each
    batch is classified with vectorized RE2 matches cascaded so earlier
    routes claim their documents first."""

    ROUTES = ("spark", "window", "join", "scan")

    def __init__(self):
        self.patterns = list(self.ROUTES)  # RE2 literals, pre-validated

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        n = batch.num_rows
        route = np.full(n, "none", dtype=object)
        unclaimed = np.ones(n, dtype=bool)
        for pat in self.patterns:
            hit = pc.match_substring_regex(txt, pat).to_numpy(
                zero_copy_only=False
            )
            take = unclaimed & hit
            route[take] = pat
            unclaimed &= ~hit
        t = pa.table(
            {
                "source": batch.column("source"),
                "route": pa.array(route, pa.string()),
                "n_docs": pa.array(np.ones(n, np.int64)),
            }
        )
        return t.group_by(["source", "route"]).aggregate([("n_docs", "sum")])


def regex_route_counts(sf_dir: str):
    """Multi-pattern document routing: every document goes to the FIRST
    route whose regex matches (spark > window > join > scan > none) —
    the content-based fan-out step in front of per-route pipelines,
    with the pattern set compiled once per actor.

    Scale shape: actor-pool map (compile-once state), per-batch
    combiner, bounded |source x route| fold.

    Output: (source, route, n_docs).
    """

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "route"]).aggregate([("n_docs_sum",
                                                        "sum")])
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("source", "ascending"), ("route", "ascending")],
            )
        )
        return pa.table(
            {
                "source": g.column("source"),
                "route": g.column("route"),
                "n_docs": pc.cast(g.column("n_docs_sum_sum"), pa.int64()),
            }
        )

    import ray.data as rd

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "source"]
        )
        .map_batches(RegexRouter, batch_format="pyarrow",
                     batch_size=256, concurrency=2)
        .repartition(1)  # bounded |source| x |route| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def source_lang_purity(sf_dir: str):
    """Source language purity: per ingest source, the majority
    language's share in ppm (integer arithmetic) — the "is this feed
    monolingual" gate a curation pipeline applies before routing a
    source to language-specific cleaning.

    Scale shape: per-batch bounded |source x lang| combiner, bounded
    fold; the majority pick is an argmax over the folded counts.

    Output: (source, n_docs, majority_lang, majority_n, purity_ppm).
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return t.group_by(["source", "lang"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby(["source", "lang"], as_index=False)["n_sum"].sum()
        # majority lang with lexicographic tiebreak: sort by (count desc,
        # lang asc) and take the first row per source
        g = g.sort_values(["source", "n_sum", "lang"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("source", as_index=False).first()
        tot = g.groupby("source", as_index=False)["n_sum"].sum().rename(
            columns={"n_sum": "n_docs"}
        )
        out = top.merge(tot, on="source").sort_values(
            "source", kind="mergesort"
        )
        maj = out["n_sum"].to_numpy(np.int64)
        tot_n = out["n_docs"].to_numpy(np.int64)
        ppm = np.array(
            [int(m) * 1_000_000 // int(n) for m, n in zip(maj, tot_n)],
            np.int64,
        )
        return pa.table(
            {
                "source": pa.array(out["source"], pa.string()),
                "n_docs": pa.array(tot_n),
                "majority_lang": pa.array(out["lang"], pa.string()),
                "majority_n": pa.array(maj),
                "purity_ppm": pa.array(ppm),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |source| x |lang| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def hist_intersection_matrix(sf_dir: str, num_buckets: int = 256):
    """Histogram-intersection kernel between sources' unigram count
    distributions: HIK(a, b) = sum over tokens of min(count_a, count_b)
    — the corpus-mix similarity readout (how much of source a's token
    mass source b reproduces).

    Scale shape: per-batch (token, source) count combiner, one
    hash(token) shuffle, per-bucket pairwise min-sum over a bounded
    |token-in-bucket| x |source| pivot, bounded |source|^2 fold. Pair
    arithmetic happens on counts, never rows.

    Output: (source_a, source_b, intersection) with source_a < source_b.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        src = batch.column("source")
        words = pc.split_pattern(pc.cast(txt, pa.string()), " ")
        n_words = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        srcs = np.asarray(
            src.to_numpy(zero_copy_only=False), dtype=object
        ).repeat(n_words)
        t = pa.table(
            {
                "t": flat,
                "source": pa.array(srcs, pa.string()),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        t = t.group_by(["t", "source"]).aggregate([("n", "sum")])
        sb = (
            pd.util.hash_pandas_object(
                t.column("t").to_pandas(), index=False
            ).to_numpy(np.uint64)
            % num_buckets
        ).astype(np.int64)
        return t.append_column("tbucket", pa.array(sb))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["t", "source"], as_index=False)["n_sum"].sum()
        pivot = g.pivot_table(
            index="t", columns="source", values="n_sum", fill_value=0
        )
        srcs = sorted(pivot.columns)
        m = pivot[srcs].to_numpy(np.int64)
        sa, sb_, inter = [], [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                v = int(np.minimum(m[:, i], m[:, j]).sum())
                if v:
                    sa.append(srcs[i])
                    sb_.append(srcs[j])
                    inter.append(v)
        return pd.DataFrame(
            {
                "source_a": sa,
                "source_b": sb_,
                "intersection": np.array(inter, np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["source_a", "source_b"]).aggregate(
            [("intersection", "sum")]
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("source_a", "ascending"),
                           ("source_b", "ascending")],
            )
        )
        return pa.table(
            {
                "source_a": g.column("source_a"),
                "source_b": g.column("source_b"),
                "intersection": pc.cast(
                    g.column("intersection_sum"), pa.int64()
                ),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["text", "source"]
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |source|^2 rows
        .map_batches(finish, batch_format="pyarrow")
    )


def length_emd_matrix(sf_dir: str, bin_width: int = 50, n_bins: int = 64):
    """1-D earth-mover's distance between sources' document-length
    distributions: lengths bin at ``bin_width`` chars into a FIXED
    ``n_bins`` grid (top bin absorbs the tail), each source's cumulative
    share is held in exact ppm integers, and EMD(a, b) = sum over bins
    |cum_a - cum_b| — the distribution-drift matrix in integer
    arithmetic (1-D EMD equals the area between CDFs; the fixed grid
    keeps the bin domain constant for oracle and engine alike).

    Scale shape: per-batch bounded (source, bin) combiner, one bounded
    fold that densifies to the fixed grid and does the pairwise
    cumulative-difference sums on a |source| x |bins| matrix.

    Output: (source_a, source_b, emd_ppm) with source_a < source_b.
    """
    import pandas as pd
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    def partial(batch: pa.Table) -> pa.Table:
        sz = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        t = pa.table(
            {
                "source": batch.column("source"),
                "bin": pa.array(
                    np.minimum(sz // np.int64(bin_width), n_bins - 1)
                ),
                "n": pa.array(np.ones(len(sz), np.int64)),
            }
        )
        return t.group_by(["source", "bin"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["source", "bin"], as_index=False)["n_sum"].sum()
        srcs = sorted(g["source"].unique())
        m = np.zeros((len(srcs), n_bins), np.int64)
        sidx = {s: i for i, s in enumerate(srcs)}
        for _, r in g.iterrows():
            m[sidx[r["source"]], int(r["bin"])] = int(r["n_sum"])
        tot = m.sum(axis=1)
        cum = np.cumsum(m, axis=1)
        cum_ppm = (cum * np.int64(1_000_000)) // tot[:, None]
        sa, sb_, emd = [], [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                sa.append(srcs[i])
                sb_.append(srcs[j])
                emd.append(int(np.abs(cum_ppm[i] - cum_ppm[j]).sum()))
        return pa.table(
            {
                "source_a": pa.array(sa, pa.string()),
                "source_b": pa.array(sb_, pa.string()),
                "emd_ppm": pa.array(np.array(emd, np.int64)),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["source", "n_chars"],
            )
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |source| x |bins| rows
        .map_batches(finish, batch_format="pyarrow")
    )


def cdc_chunk_stats(sf_dir: str, window: int = 4, modulus: int = 32):
    """Content-defined chunking (CDC): a rolling ``window``-byte sum
    marks a chunk boundary wherever it hits 0 mod ``modulus`` — the
    storage-dedup primitive that keeps chunk boundaries stable under
    insertions (unlike fixed-size blocks). Reports each document's chunk
    count and first boundary.

    Scale shape: ONE pass over the batch's flat Arrow byte buffer — the
    rolling sums, the boundary mask, and the per-doc counts (bincount /
    unique over the offsets) are all whole-batch numpy; no per-document
    Python. Boundaries are only valid strictly inside a document
    (window fully contained, not at the last byte).

    Output: (doc_id, n_chunks, first_boundary) — first_boundary is the
    0-based index of the first boundary byte, -1 when the doc has none.
    """
    import ray.data as rd

    def kernel(batch: pa.Table) -> pa.Table:
        arr = pc.cast(batch.column("text").combine_chunks(),
                      pa.large_string())
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        off_buf = np.frombuffer(arr.buffers()[1], np.int64)
        off = off_buf[arr.offset:arr.offset + len(arr) + 1].copy()
        buf = np.frombuffer(arr.buffers()[2], np.uint8)[
            off[0]:off[-1]
        ].astype(np.int64)
        off = off - off[0]
        n_docs = len(ids)
        lens = np.diff(off)
        if len(buf) < window:
            w4 = np.zeros(0, np.int64)
        else:
            w4 = np.zeros(len(buf) - window + 1, np.int64)
            for k in range(window):
                w4 += buf[k:len(buf) - window + 1 + k]
        # global index of the window END byte
        end_idx = np.arange(window - 1, len(buf), dtype=np.int64)
        hit = (w4 % modulus) == 0
        ends = end_idx[hit]
        # doc owning each boundary; valid iff the window starts inside
        # the same doc AND the boundary is not the doc's final byte
        d = np.searchsorted(off, ends, side="right") - 1
        start_ok = (ends - (window - 1)) >= off[d]
        not_last = ends < off[d + 1] - 1
        keep = start_ok & not_last
        ends, d = ends[keep], d[keep]
        counts = np.bincount(d, minlength=n_docs).astype(np.int64)
        first = np.full(n_docs, -1, np.int64)
        ud, first_pos = np.unique(d, return_index=True)
        first[ud] = ends[first_pos] - off[ud]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chunks": pa.array(counts + 1),
                "first_boundary": pa.array(first),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(kernel, batch_format="pyarrow")


def prefix_trie_fanout(sf_dir: str, max_len: int = 3):
    """Trie fanout profile of the corpus vocabulary: for each prefix
    length 1..``max_len``, how many distinct prefixes exist, how many
    distinct words they cover, and the largest single-prefix fanout —
    the statistics an autocomplete / prefix-index planner sizes nodes
    with. Words shorter than the prefix length count under their full
    spelling.

    Scale shape: per-batch distinct-word combiner, one hash(word)
    shuffle for the global distinct, bounded per-prefix fold (prefix
    domain <= alphabet^max_len).

    Output: (prefix_len, n_prefixes, n_words, max_fanout).
    """
    import pandas as pd
    import ray.data as rd

    def words_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(
                pc.cast(batch.column("text"), pa.string()), " "
            )
        )
        t = pa.table({"w": flat})
        t = t.group_by("w").aggregate([])  # block-local distinct
        h = (
            pd.util.hash_pandas_object(
                t.column("w").to_pandas(), index=False
            ).to_numpy(np.uint64)
            % 64
        ).astype(np.int64)
        return t.append_column("wbucket", pa.array(h))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        words = g["w"].drop_duplicates()
        out = []
        for plen in range(1, max_len + 1):
            pref = words.str.slice(0, plen)
            counts = pref.value_counts()
            out.append(
                pd.DataFrame(
                    {
                        "prefix_len": np.int64(plen),
                        "prefix": counts.index,
                        "fanout": counts.to_numpy(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["prefix_len", "prefix"], as_index=False)[
            "fanout"
        ].sum()
        agg = g.groupby("prefix_len").agg(
            n_prefixes=("prefix", "size"),
            n_words=("fanout", "sum"),
            max_fanout=("fanout", "max"),
        )
        agg = agg.sort_index()
        return pa.table(
            {
                "prefix_len": pa.array(
                    agg.index.to_numpy(np.int64)
                ),
                "n_prefixes": pa.array(agg["n_prefixes"]
                                       .to_numpy(np.int64)),
                "n_words": pa.array(agg["n_words"].to_numpy(np.int64)),
                "max_fanout": pa.array(agg["max_fanout"]
                                       .to_numpy(np.int64)),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(words_partial, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded prefix domain
        .map_batches(finish, batch_format="pyarrow")
    )


def vocab_venn_counts(sf_dir: str, sources: tuple = ("src0", "src1",
                                                     "src2")):
    """Three-way SHINGLE Venn decomposition: every distinct 3-word
    shingle is classified by WHICH of the three chosen sources contain
    it (a 3-bit membership mask) and the audit returns the size of each
    non-empty region — the exact inclusion/exclusion a corpus-mixing
    plan needs (pairwise overlaps alone cannot give the triple).
    Shingles, not unigrams: the tiny shared vocabulary makes unigram
    regions degenerate while shingle regions discriminate.

    Scale shape: per-batch distinct (shingle, source-bit) combiner, one
    hash(shingle) shuffle folding bits by OR, bounded 7-row fold.

    Output: (mask, n_tokens) where bit i of mask = shingle in
    sources[i].
    """
    from ..functions.hashing import word_shingles_batch
    import pandas as pd
    import ray.data as rd

    src_bit = {s: 1 << i for i, s in enumerate(sources)}

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("source"),
            value_set=pa.array(list(sources), pa.string()),
        )
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table(
                {"w": pa.array([], pa.string()),
                 "bit": pa.array([], pa.int64()),
                 "wbucket": pa.array([], pa.int64())}
            )
        idx, flat, _ = word_shingles_batch(b.column("text"), k=3)
        bits = np.array(
            [src_bit[s] for s in
             b.column("source").to_numpy(zero_copy_only=False)],
            np.int64,
        )[idx]
        t = pa.table({"w": flat, "bit": pa.array(bits)})
        t = t.group_by(["w", "bit"]).aggregate([])
        h = (
            pd.util.hash_pandas_object(
                t.column("w").to_pandas(), index=False
            ).to_numpy(np.uint64)
            % 64
        ).astype(np.int64)
        return t.append_column("wbucket", pa.array(h))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["w", "bit"])
        mask = g.groupby("w")["bit"].sum()  # bits distinct per word -> OR
        counts = mask.value_counts()
        return pd.DataFrame(
            {
                "mask": counts.index.to_numpy(np.int64),
                "n_tokens": counts.to_numpy(np.int64),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("mask").aggregate([("n_tokens", "sum")])
        g = g.take(pc.sort_indices(g, sort_keys=[("mask", "ascending")]))
        return pa.table(
            {
                "mask": pc.cast(g.column("mask"), pa.int64()),
                "n_tokens": pc.cast(g.column("n_tokens_sum"), pa.int64()),
            }
        )

    import ray.data as rd

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "source"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # 7 rows
        .map_batches(finish, batch_format="pyarrow")
    )


def split_balance_audit(sf_dir: str, train_permille: int = 800,
                        val_permille: int = 900):
    """Split-bias audit: does the deterministic train/val/test hash
    split preserve each source's share? Per (source, split) the observed
    count plus the source and split marginals — the chi-square
    independence terms that catch a biased split before training sees
    it (same contingency-terms convention as mutual_information_terms).

    Scale shape: one pure map reusing deterministic_split's hash rule,
    bounded |source| x 3 combiner + fold; marginals derived from the
    folded joint.

    Output: (source, split, n_obs, n_source, n_split, n_total).
    """
    import ray.data as rd

    def assign(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        slots = hash62_batch([str(i) for i in ids.to_pylist()]) % 1000
        split = np.where(
            slots < train_permille, "train",
            np.where(slots < val_permille, "val", "test"),
        )
        t = pa.table(
            {
                "source": batch.column("source"),
                "split": pa.array(split, pa.string()),
                "n": pa.array(np.ones(len(ids), np.int64)),
            }
        )
        return t.group_by(["source", "split"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby(["source", "split"], as_index=False)["n_sum"].sum()
        g = g.rename(columns={"n_sum": "n_obs"})
        ms = g.groupby("source")["n_obs"].sum()
        mp = g.groupby("split")["n_obs"].sum()
        tot = int(g["n_obs"].sum())
        g = g.sort_values(["source", "split"], ignore_index=True)
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "split": pa.array(g["split"], pa.string()),
                "n_obs": pa.array(g["n_obs"].to_numpy(np.int64)),
                "n_source": pa.array(ms[g["source"]].to_numpy(np.int64)),
                "n_split": pa.array(mp[g["split"]].to_numpy(np.int64)),
                "n_total": pa.array(np.full(len(g), tot, np.int64)),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
        .map_batches(assign, batch_format="pyarrow")
        .repartition(1)  # bounded |source| x 3 rows
        .map_batches(finish, batch_format="pyarrow")
    )
