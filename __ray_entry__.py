"""Driver contract: entry() smoke, queries() vs oracle_sql() correctness gate.

Ray is initialised by the driver BEFORE this module is imported — nothing here
calls ray.init()/ray.shutdown().

The extraction queries run the FULL Ray pipeline (synthesize SPDF payloads
from documents.text by the deterministic rules in ray_extract/derive.py ->
decode -> page-range split -> actor-pool layout parse -> groupby(doc_id)
merge -> vectorized convert) and flatten the result; the oracle SQL
reconstructs the expected span sequence from the same rules in pure SQL.
Training-data queries (dedup / text / similarity / events) run over the
driver tables directly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------- shared SQL

# Derivation rules (ray_extract/derive.py) in SQL: spans + per-doc language.
_SPANS_CTE = """
WITH docs AS (
  SELECT source || '.' || CAST(doc_id AS VARCHAR) AS did,
         string_split(text, ' ') AS ws
  FROM documents
),
spans0 AS (
  SELECT did, CAST(u.i AS BIGINT) AS i,
         array_to_string(ws[(u.i*4+1):(u.i*4+4)], ' ') AS wtext
  FROM docs, unnest(range(0, CAST(ceil(len(ws)/4.0) AS BIGINT))) AS u(i)
),
spans1 AS (
  SELECT did, i,
    CASE WHEN i = 0 THEN 'title'
         WHEN i % 13 = 5 THEN 'sectionHeading'
         WHEN i % 11 = 7 THEN 'media'
         WHEN i % 7 = 3 THEN 'TableCell'
         WHEN i % 19 = 17 THEN 'pageHeader'
         WHEN i % 23 = 21 THEN 'pageFooter'
         ELSE 'Text' END AS kind,
    wtext
  FROM spans0
),
spans AS (
  SELECT did, i, kind,
    CASE WHEN kind = 'media' THEN '' ELSE wtext END AS text,
    CASE WHEN kind = 'media' THEN 'media://' || did || '/' || CAST(i AS VARCHAR)
         ELSE '' END AS media_ref,
    CAST(COALESCE(SUM(CASE WHEN kind = 'media' THEN 0 ELSE length(wtext) END + 1)
         OVER (PARTITION BY did ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS "offset",
    CAST(length(CASE WHEN kind = 'media' THEN '' ELSE wtext END) AS BIGINT) AS length,
    i // 6 AS page_number
  FROM spans1
),
langjoin AS (
  SELECT did, string_agg(trim(text), ' ' ORDER BY i) AS joined FROM spans GROUP BY did
),
langscore AS (
  SELECT did,
    len(regexp_extract_all(joined, '\\b(the|and|of|to|is|a)\\b')) AS s_en,
    len(regexp_extract_all(joined, '\\b(der|die|und|ist|das|nicht|ein)\\b')) AS s_de,
    len(regexp_extract_all(joined, '\\b(le|les|et|est|une|dans|que)\\b')) AS s_fr,
    len(regexp_extract_all(joined, '\\b(el|los|las|es|una|por|con)\\b')) AS s_es,
    CASE WHEN regexp_matches(joined, '[一-鿿]') THEN 1 ELSE 0 END AS cjk
  FROM langjoin
),
lang AS (
  SELECT did,
    CASE WHEN cjk = 1 THEN 'zh'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS language
  FROM langscore
)
"""

_NGRAM_CTE = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[u.i:u.i+2], ' ') AS shingle
  FROM docs, unnest(range(1, len(ws) - 1)) AS u(i)
)
"""

# --- ANN oracles: the three top-k pipelines share structure. The LSH planes
# are md5-derived +/-1 signs (ray_extract/pipelines/similarity.py det_planes)
# and the IVF codebook is the first-16 corpus vectors, so both approximate
# methods are bit-reproducible in SQL (dim=64, n_planes=8, k=5, 10 queries).
_ANN_EXACT_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS sc
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.qid
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rk
  FROM s
)
SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank, vec_id AS neighbor_id
FROM r WHERE rk <= 5
"""

_ANN_LSH_SQL = """
WITH planes AS (
  SELECT CAST(p.p AS BIGINT) AS p, CAST(d.d AS BIGINT) AS d,
         CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d.d AS VARCHAR)), 1, 1)
              IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END AS s
  FROM unnest(range(0, 8)) AS p(p), unnest(range(0, 64)) AS d(d)
),
proj AS (
  SELECT e.vec_id, pl.p, sum(pl.s * CAST(e.embedding[pl.d + 1] AS DOUBLE)) AS pr
  FROM embeddings e, planes pl GROUP BY e.vec_id, pl.p
),
bkt AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM proj GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
cand AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS sc
  FROM q
  JOIN bkt qb ON qb.vec_id = q.qid
  JOIN bkt eb ON eb.bucket = qb.bucket AND eb.vec_id != q.qid
  JOIN embeddings e ON e.vec_id = eb.vec_id
),
r AS (
  SELECT qid, vec_id, sc,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rk
  FROM cand
)
SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank, vec_id AS neighbor_id,
       round(sc, 6) AS score
FROM r WHERE rk <= 5
"""

_ANN_IVF_SQL = """
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16
),
assign0 AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC,
                    c.cid
         ) AS rk
  FROM embeddings e CROSS JOIN cent c
),
a1 AS (SELECT vec_id, cid FROM assign0 WHERE rk = 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
qprobe AS (
  SELECT q.qid, c.cid,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(q.qe::DOUBLE[], c.ce::DOUBLE[]) DESC, c.cid
         ) AS rk
  FROM q CROSS JOIN cent c
),
qp AS (SELECT qid, cid FROM qprobe WHERE rk <= 3),
cand AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS sc
  FROM q
  JOIN qp ON qp.qid = q.qid
  JOIN a1 ON a1.cid = qp.cid
  JOIN embeddings e ON e.vec_id = a1.vec_id AND e.vec_id != q.qid
),
r AS (
  SELECT qid, vec_id, sc,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rk
  FROM cand
)
SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank, vec_id AS neighbor_id,
       round(sc, 6) AS score
FROM r WHERE rk <= 5
"""

_ANN_RECALL_SQL = f"""
WITH ex AS ({_ANN_EXACT_SQL}),
iv AS ({_ANN_IVF_SQL}),
ls AS ({_ANN_LSH_SQL}),
sel AS (
  SELECT 'ivf' AS method, query_id, neighbor_id FROM iv
  UNION ALL SELECT 'lsh', query_id, neighbor_id FROM ls
),
j AS (
  SELECT s.method, CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM sel s LEFT JOIN ex e
    ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
)
SELECT m.method,
       CAST(count(j.hit) AS BIGINT) AS n_returned,
       CAST(coalesce(sum(j.hit), 0) AS BIGINT) AS hits,
       CAST(coalesce(sum(j.hit), 0) * 1000000 // 50 AS BIGINT) AS recall_ppm
FROM (VALUES ('ivf'), ('lsh')) m(method)
LEFT JOIN j ON j.method = m.method
GROUP BY m.method
"""

# Banded-LSH embedding near-dup: 32 deterministic planes in 8 bands of 4;
# candidates share >= 1 band's sign pattern, verified by exact cosine (the
# engine's embedding_dedup mode="banded" — ray_extract/pipelines/similarity.py).
_EMB_BANDED_SQL = """
WITH planes AS (
  SELECT CAST(p.p AS BIGINT) AS p, CAST(d.d AS BIGINT) AS d,
         CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d.d AS VARCHAR)), 1, 1)
              IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END AS s
  FROM unnest(range(0, 32)) AS p(p), unnest(range(0, 64)) AS d(d)
),
proj AS (
  SELECT e.vec_id, pl.p, sum(pl.s * CAST(e.embedding[pl.d + 1] AS DOUBLE)) AS pr
  FROM embeddings e, planes pl GROUP BY e.vec_id, pl.p
),
bands AS (
  SELECT vec_id, p // 4 AS band_id,
         CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << (p % 4)) ELSE 0 END)
              AS BIGINT) AS band_val
  FROM proj GROUP BY vec_id, p // 4
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
              AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)
         AS cos_sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= 0.4
"""

_EMB_RECALL_SQL = f"""
WITH banded AS ({_EMB_BANDED_SQL}),
exact AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b
    ON a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
)
SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT count(*) FROM banded) AS BIGINT) AS n_banded,
       CAST(CASE WHEN (SELECT count(*) FROM exact) = 0 THEN 1000000
            ELSE (SELECT count(*) FROM banded) * 1000000 // (SELECT count(*) FROM exact)
            END AS BIGINT) AS recall_ppm
"""

_ROLL = (
    "(list_reduce(list_transform(split({col}, ''), x -> unicode(x)::BIGINT),"
    " (a, b) -> (a * 1000003 + b) % 2147483647) * 2147483648"
    " + list_reduce(list_transform(split({col}, ''), x -> unicode(x)::BIGINT),"
    " (a, b) -> (a * 999983 + b) % 2147483647))"
)


def _i64(t, cols):
    import pyarrow as pa
    import pyarrow.compute as pc

    arrays, names = [], []
    for name in t.column_names:
        col = t.column(name)
        if name in cols:
            col = pc.cast(col, pa.int64())
        arrays.append(col)
        names.append(name)
    return pa.table(dict(zip(names, arrays)))


def _extract_flat(sf_dir: str):
    from ray_extract.pipelines.extract import (
        ExtractConfig,
        extract_from_payloads,
        flatten_blocks,
    )
    from ray_extract.sources.synth import synth_dataset

    out = extract_from_payloads(
        synth_dataset(f"{sf_dir}/documents.parquet"), ExtractConfig()
    )
    return out, out.map_batches(flatten_blocks, batch_format="pyarrow")


# ------------------------------------------------------------------- queries


def _q_extract_spans(sf_dir: str):
    _, flat = _extract_flat(sf_dir)
    return flat.map_batches(
        lambda t: _i64(t, {"ord", "offset", "length", "page_number"}),
        batch_format="pyarrow",
    )


def _q_pdf_real_extract(sf_dir: str):
    """Real-PDF text extraction over the reference's own committed PDFs
    (tests/data/sample-one-page.pdf, sample-two-page.pdf) through the DEFAULT
    pipeline — the content-stream kernel in functions/pdftext.py replacing the
    reference's Azure round-trip (azure_wrapper.py:32-61). The oracle is the
    committed golden block sequence (the reference pins extraction the same
    way with its golden JSON fixtures). Input is fixed, independent of sf."""
    import pyarrow as pa

    from ray_extract.functions.hashing import md5_str
    from ray_extract.pipelines.extract import (
        ExtractConfig,
        extract_from_payloads,
        flatten_blocks,
    )
    from ray_extract.sources.files import read_document_dir

    ds = read_document_dir("/root/reference/tests/data", suffix=".pdf")
    flat = extract_from_payloads(ds, ExtractConfig()).map_batches(
        flatten_blocks, batch_format="pyarrow"
    )

    def summarize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = t.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ord": pc.cast(t.column("ord"), pa.int64()),
                "kind": t.column("kind"),
                "page_number": pc.cast(t.column("page_number"), pa.int64()),
                "n_chars": pa.array([len(s) for s in text], type=pa.int64()),
                "text_md5": pa.array([md5_str(s) for s in text]),
                "text_prefix": pa.array([s[:48] for s in text]),
            }
        )

    return flat.map_batches(summarize, batch_format="pyarrow")


def _q_extract_media_refs(sf_dir: str):
    """Per-document media-span profile over the interleaved span table:
    how many media spans each doc carries and where they sit in reading
    order. Doc partials combine per batch; the cross-block fold is a
    doc-keyed reduce of 1-row-per-(doc, block) partials."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "media"))
        g = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "o": pc.cast(t.column("ord"), pa.int64()),
            }
        )
        return g.group_by("doc_id").aggregate(
            [("n", "sum"), ("o", "min"), ("o", "max")]
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_sum", alias_name="n_media"),
            Min("o_min", alias_name="first_media_ord"),
            Max("o_max", alias_name="last_media_ord"),
        )
        .map_batches(
            lambda t: _i64(t, {"n_media", "first_media_ord",
                               "last_media_ord"}),
            batch_format="pyarrow",
        )
    )


def _q_extract_offset_audit(sf_dir: str):
    """Span-offset integrity audit: per doc, span count, summed text
    length, and the final character extent max(offset + length) — the
    invariant the merge stage must preserve (extent = sum of non-media
    (length+1) minus the trailing separator)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "ln": pc.cast(t.column("length"), pa.int64()),
                "ext": pc.cast(
                    pc.add(t.column("offset"), t.column("length")), pa.int64()
                ),
            }
        )
        return g.group_by("doc_id").aggregate(
            [("n", "sum"), ("ln", "sum"), ("ext", "max")]
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_sum", alias_name="n_spans"),
            Sum("ln_sum", alias_name="sum_length"),
            Max("ext_max", alias_name="final_extent"),
        )
        .map_batches(
            lambda t: _i64(t, {"n_spans", "sum_length", "final_extent"}),
            batch_format="pyarrow",
        )
    )


def _q_extract_page_density(sf_dir: str):
    """Corpus-wide span density per page index: spans and text mass at
    each page position — the layout-skew profile that sizes page-range
    splits. Bounded page domain -> combiner + repartition(1) fold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "page_number": pc.cast(t.column("page_number"), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "ln": pc.cast(t.column("length"), pa.int64()),
            }
        )
        return g.group_by("page_number").aggregate(
            [("n", "sum"), ("ln", "sum")]
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("page_number").aggregate(
            [("n_sum", "sum"), ("ln_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("page_number", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "page_number": pc.cast(g.column("page_number"), pa.int64()),
                "n_spans": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "sum_text_len": pc.cast(g.column("ln_sum_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # O(|page indices|) rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_kind_transitions(sf_dir: str):
    """Reading-order span-kind transition matrix (Markov counts over the
    interleaved span sequence) — layout-grammar profile of the corpus.
    Docs are hash-bucketed (vectorized string hash) so each doc's span
    sequence is contiguous in ONE bucket pass; the (kind, kind) matrix
    folds on its bounded domain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash62_batch(t.column("doc_id").to_pylist())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ord": pc.cast(t.column("ord"), pa.int64()),
                "kind": t.column("kind"),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        o = g["ord"].to_numpy()
        kind = g["kind"].to_numpy()
        order = np.lexsort((o, did))
        did, kind = did[order], kind[order]
        n = len(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = did[1:] == did[:-1]
        prev = np.roll(kind, 1)
        out = pd.DataFrame({"kind_from": prev[same], "kind_to": kind[same]})
        out["n"] = np.int64(1)
        return out.groupby(["kind_from", "kind_to"], as_index=False)["n"].sum()

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["kind_from", "kind_to"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("kind_from", "ascending"), ("kind_to", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "kind_from": g.column("kind_from"),
                "kind_to": g.column("kind_to"),
                "n_transitions": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |kinds|^2 rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _span_doc_bucket(t, num_buckets: int = 64):
    """Shared doc-hash bucketing projection for span-table queries that
    need each doc's reading order whole: (doc_id, ord, is_media,
    bucket)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    h = hash62_batch(t.column("doc_id").to_pylist())
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "ord": pc.cast(t.column("ord"), pa.int64()),
            "is_media": pc.equal(t.column("kind"), "media"),
            "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
        }
    )


def _q_extract_media_position(sf_dir: str):
    """Where media sits in reading order: decile position (ord*10 //
    doc_span_count) of every media span, histogrammed — the text/media
    interleaving profile of the corpus. Doc-hash bucket shuffle keeps
    each doc whole for the per-doc total; the decile histogram folds on
    its bounded domain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)
    add_bucket = _span_doc_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        o = g["ord"].to_numpy()
        m = g["is_media"].to_numpy()
        order = np.argsort(did, kind="stable")
        did, o, m = did[order], o[order], m[order]
        n = len(g)
        seg = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        tot = np.diff(np.r_[seg, n])
        tot_per_row = np.repeat(tot, tot)
        dec = (o[m] * 10) // tot_per_row[m]
        cnt = np.bincount(dec, minlength=10)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"decile": nz.astype(np.int64),
                             "n_media": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("decile").aggregate([("n_media", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("decile", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "decile": pc.cast(g.column("decile"), pa.int64()),
                "n_media": pc.cast(g.column("n_media_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # 10 rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_media_context(sf_dir: str):
    """Layout context of media: the (previous kind, next kind) pair around
    every media span in reading order — the media-placement grammar
    (BOS/EOS mark document boundaries). Doc-hash bucket shuffle keeps each
    doc's sequence whole; the pair matrix folds on its bounded
    (|kinds|+1)^2 domain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash62_batch(t.column("doc_id").to_pylist())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ord": pc.cast(t.column("ord"), pa.int64()),
                "kind": t.column("kind"),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        o = g["ord"].to_numpy()
        kind = g["kind"].to_numpy()
        order = np.lexsort((o, did))
        did, kind = did[order], kind[order]
        n = len(g)
        first = np.r_[True, did[1:] != did[:-1]]
        last = np.r_[did[1:] != did[:-1], True]
        prev = np.roll(kind, 1).astype(object)
        nxt = np.roll(kind, -1).astype(object)
        prev[first] = "BOS"
        nxt[last] = "EOS"
        m = kind == "media"
        out = pd.DataFrame({"prev_kind": prev[m], "next_kind": nxt[m]})
        out["n"] = np.int64(1)
        return out.groupby(["prev_kind", "next_kind"], as_index=False)[
            "n"
        ].sum()

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["prev_kind", "next_kind"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            g,
            sort_keys=[("prev_kind", "ascending"), ("next_kind", "ascending")],
        )
        g = g.take(idx)
        return pa.table(
            {
                "prev_kind": g.column("prev_kind"),
                "next_kind": g.column("next_kind"),
                "n_media": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded (|kinds|+1)^2 rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_page_kind_mix(sf_dir: str):
    """Layout mix by page position: span-kind counts per within-doc page
    index — how the title/header/table/media composition shifts from a
    document's first page to its tail. Purely vectorized (no doc
    contiguity needed): per-batch (page, kind) combiner, bounded-domain
    fold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "page_number": pc.cast(t.column("page_number"), pa.int64()),
                "kind": t.column("kind"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by(["page_number", "kind"]).aggregate([("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["page_number", "kind"]).aggregate([("n_sum", "sum")])
        idx = pc.sort_indices(
            g, sort_keys=[("page_number", "ascending"), ("kind", "ascending")]
        )
        g = g.take(idx)
        return pa.table(
            {
                "page_number": pc.cast(g.column("page_number"), pa.int64()),
                "kind": g.column("kind"),
                "n_spans": pc.cast(g.column("n_sum_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |pages| x |kinds| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


_KIND_BITS = {
    "title": 1,
    "sectionHeading": 2,
    "media": 4,
    "TableCell": 8,
    "pageHeader": 16,
    "pageFooter": 32,
    "Text": 64,
}


def _q_extract_kind_sets(sf_dir: str):
    """Layout-vocabulary combinations: the set of span kinds each doc
    contains, encoded as a fixed bitmask, histogrammed across the
    corpus — which layout grammars actually occur. Batch-local distinct
    (doc, kind-bit) partials OR-combine per doc inside one doc-hash
    bucket pass; the mask histogram folds on its bounded (2^7) domain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def partial(t: pa.Table) -> pa.Table:
        # vectorized kind->bit: unknown kinds fall into the Text bucket
        # (64), matching the oracle's ELSE arm
        kinds = list(_KIND_BITS)
        vals = np.array([_KIND_BITS[k] for k in kinds] + [64], np.int64)
        idx = pc.fill_null(
            pc.index_in(t.column("kind"), value_set=pa.array(kinds)),
            len(kinds),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bits = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bit": pa.array(vals[idx]),
            }
        ).group_by(["doc_id", "bit"]).aggregate([])
        h = hash62_batch(bits.column("doc_id").to_pylist())
        return bits.append_column(
            "bucket", pa.array(np.abs(h) % np.int64(num_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        bit = g["bit"].to_numpy()
        order = np.argsort(did, kind="stable")
        did, bit = did[order], bit[order]
        seg = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        mask = np.bitwise_or.reduceat(bit, seg)
        m, n = np.unique(mask, return_counts=True)
        return pd.DataFrame({"kind_mask": m.astype(np.int64),
                             "n_docs": n.astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("kind_mask").aggregate([("n_docs", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("kind_mask", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "kind_mask": pc.cast(g.column("kind_mask"), pa.int64()),
                "n_docs": pc.cast(g.column("n_docs_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # <= 2^7 rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_length_quartiles(sf_dir: str):
    """Exact span-length quartiles per kind (smallest length whose
    cumulative count reaches ceil(q*n)) — the layout-geometry profile
    that sizes text-block truncation. Lengths live on a bounded domain,
    so per-(kind, length) count partials combine per batch and the
    quartile pick is a driver-side fold over the bounded histogram."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "kind": t.column("kind"),
                "length": pc.cast(t.column("length"), pa.int64()),
                "c": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by(["kind", "length"]).aggregate([("c", "sum")])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["kind", "length"], as_index=False)["c_sum"].sum()
        g = g.sort_values(["kind", "length"], kind="mergesort")
        rows = []
        for kind, sub in g.groupby("kind", sort=True):
            c = sub["c_sum"].to_numpy()
            ln = sub["length"].to_numpy()
            n = int(c.sum())
            cc = np.cumsum(c)
            qs = [(n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4]
            picks = [int(ln[np.searchsorted(cc, t_)]) for t_ in qs]
            rows.append((kind, n, *picks))
        return pd.DataFrame(
            rows,
            columns=["kind", "n_spans", "q1_len", "median_len", "q3_len"],
        ).astype({"n_spans": np.int64, "q1_len": np.int64,
                  "median_len": np.int64, "q3_len": np.int64})

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded (kind, length) histogram per partial
        .map_batches(finish, batch_format="pandas")
    )


def _q_extract_ref_integrity(sf_dir: str):
    """URI-parse referential audit over the interleaved span table:
    every media_ref embeds its own doc and ordinal
    ("media://<did>/<i>") — parse each ref with one vectorized RE2
    pass and count round-trip-consistent refs per source prefix of the
    doc id. Pure map + bounded combiner; nothing unaggregated moves."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "media"))
        ref = pc.cast(t.column("media_ref").combine_chunks(), pa.string())
        ex = pc.extract_regex(ref, r"^media://(?P<d>.+)/(?P<i>[0-9]+)$")
        d = pc.struct_field(ex, "d")
        i = pc.cast(pc.struct_field(ex, "i"), pa.int64())
        ok = pc.and_(
            pc.fill_null(pc.equal(d, t.column("doc_id")), False),
            pc.fill_null(pc.equal(i, pc.cast(t.column("ord"), pa.int64())),
                         False),
        )
        src = pc.replace_substring_regex(
            pc.cast(t.column("doc_id"), pa.string()), r"\..*$", ""
        )
        g = pa.table(
            {
                "source": src,
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "c": pc.cast(ok, pa.int64()),
            }
        )
        return g.group_by("source").aggregate([("n", "sum"), ("c", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_sum", "sum"), ("c_sum", "sum")]
        )
        idx = pc.sort_indices(g, sort_keys=[("source", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "source": g.column("source"),
                "n_media_refs": pc.cast(g.column("n_sum_sum"), pa.int64()),
                "n_consistent": pc.cast(g.column("c_sum_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |sources| rows per partial
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_revenue_trend(sf_dir: str):
    from ray_extract.pipelines.relational import revenue_trend

    return revenue_trend(sf_dir)


def _q_order_reconciliation(sf_dir: str):
    from ray_extract.pipelines.relational import order_reconciliation

    return order_reconciliation(sf_dir)


def _q_core_vocabulary(sf_dir: str):
    from ray_extract.pipelines.text import core_vocabulary

    return core_vocabulary(sf_dir)


def _q_order_width_histogram(sf_dir: str):
    from ray_extract.pipelines.relational import order_width_histogram

    return order_width_histogram(sf_dir)


def _q_revenue_concentration(sf_dir: str):
    from ray_extract.pipelines.relational import revenue_concentration

    return revenue_concentration(sf_dir)


def _q_top_parts_by_quantity(sf_dir: str):
    from ray_extract.pipelines.relational import top_parts_by_quantity

    return top_parts_by_quantity(sf_dir)


def _q_acctbal_band_profile(sf_dir: str):
    from ray_extract.pipelines.relational import acctbal_band_profile

    return acctbal_band_profile(sf_dir)


def _q_supplier_balance_leader(sf_dir: str):
    from ray_extract.pipelines.relational import supplier_balance_leader

    return supplier_balance_leader(sf_dir)


def _q_user_resurrections(sf_dir: str):
    from ray_extract.pipelines.events import user_resurrections

    return user_resurrections(sf_dir)


def _q_gap_hour_histogram(sf_dir: str):
    from ray_extract.pipelines.events import gap_hour_histogram

    return gap_hour_histogram(sf_dir)


def _q_value_autocorr_terms(sf_dir: str):
    from ray_extract.pipelines.events import value_autocorr_terms

    return value_autocorr_terms(sf_dir)


def _q_word_length_histogram(sf_dir: str):
    from ray_extract.pipelines.text import word_length_histogram

    return word_length_histogram(sf_dir)


def _q_allcaps_ratio(sf_dir: str):
    from ray_extract.pipelines.text import allcaps_ratio

    return allcaps_ratio(sf_dir)


def _q_lexical_density(sf_dir: str):
    from ray_extract.pipelines.text import lexical_density

    return lexical_density(sf_dir)


def _q_vocab_growth(sf_dir: str):
    from ray_extract.pipelines.text import vocab_growth

    return vocab_growth(sf_dir)


def _q_dominant_dim_histogram(sf_dir: str):
    from ray_extract.pipelines.similarity import dominant_dim_histogram

    return dominant_dim_histogram(sf_dir)


def _q_dim_sign_profile(sf_dir: str):
    from ray_extract.pipelines.similarity import dim_sign_profile

    return dim_sign_profile(sf_dir)


def _q_ship_delay_profile(sf_dir: str):
    from ray_extract.pipelines.relational import ship_delay_profile

    return ship_delay_profile(sf_dir)


def _q_regional_customer_value(sf_dir: str):
    from ray_extract.pipelines.relational import regional_customer_value

    return regional_customer_value(sf_dir)


def _q_tax_discount_matrix(sf_dir: str):
    from ray_extract.pipelines.relational import tax_discount_matrix

    return tax_discount_matrix(sf_dir)


def _q_supplier_part_coverage(sf_dir: str):
    from ray_extract.pipelines.relational import supplier_part_coverage

    return supplier_part_coverage(sf_dir)


def _q_orders_per_weekday(sf_dir: str):
    from ray_extract.pipelines.relational import orders_per_weekday

    return orders_per_weekday(sf_dir)


def _q_char_class_profile(sf_dir: str):
    from ray_extract.pipelines.text import char_class_profile

    return char_class_profile(sf_dir)


def _q_customer_supplier_diversity(sf_dir: str):
    from ray_extract.pipelines.relational import customer_supplier_diversity

    return customer_supplier_diversity(sf_dir)


def _q_monthly_active_customers(sf_dir: str):
    from ray_extract.pipelines.relational import monthly_active_customers

    return monthly_active_customers(sf_dir)


def _q_part_name_token_revenue(sf_dir: str):
    from ray_extract.pipelines.relational import part_name_token_revenue

    return part_name_token_revenue(sf_dir)


def _q_rfm_segments(sf_dir: str):
    from ray_extract.pipelines.relational import rfm_segments

    return rfm_segments(sf_dir)


def _q_event_type_affinity(sf_dir: str):
    from ray_extract.pipelines.events import event_type_affinity

    return event_type_affinity(sf_dir)


def _q_basket_supplier_pairs(sf_dir: str):
    from ray_extract.pipelines.relational import basket_supplier_pairs

    return basket_supplier_pairs(sf_dir)


def _q_price_discount_corr_terms(sf_dir: str):
    from ray_extract.pipelines.relational import price_discount_corr_terms

    return price_discount_corr_terms(sf_dir)


def _q_order_gap_histogram(sf_dir: str):
    from ray_extract.pipelines.relational import order_gap_histogram

    return order_gap_histogram(sf_dir)


def _q_user_streaks(sf_dir: str):
    from ray_extract.pipelines.events import user_streaks

    return user_streaks(sf_dir)


def _q_user_growth_curve(sf_dir: str):
    from ray_extract.pipelines.events import user_growth_curve

    return user_growth_curve(sf_dir)


def _q_peak_concurrency(sf_dir: str):
    from ray_extract.pipelines.events import peak_concurrency

    return peak_concurrency(sf_dir)


def _q_quantity_mode(sf_dir: str):
    from ray_extract.pipelines.relational import quantity_mode

    return quantity_mode(sf_dir)


def _q_nation_rank_change(sf_dir: str):
    from ray_extract.pipelines.relational import nation_rank_change

    return nation_rank_change(sf_dir)


def _q_extract_kind_divergence(sf_dir: str):
    """Per-source layout-mix drift over the interleaved span table:
    L1 divergence of each source's span-kind mix from the corpus-wide
    mix, exact integer cross-multiplied (same no-ratio form as
    daily_mix_divergence) — flags sources whose extraction grammar
    shifted. Both grids bounded (|sources| x |kinds|): per-batch count
    partials, one repartition(1) fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        src = pc.replace_substring_regex(
            pc.cast(t.column("doc_id"), pa.string()), r"\..*$", ""
        )
        g = pa.table(
            {
                "source": src,
                "kind": t.column("kind"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return g.group_by(["source", "kind"]).aggregate([("n", "sum")])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "kind"], as_index=False)["n_sum"].sum()
        piv = g.pivot_table(index="source", columns="kind", values="n_sum",
                            aggfunc="sum", fill_value=0).sort_index()
        m = piv.to_numpy().astype(np.int64)
        n_src = m.sum(axis=1)
        n_kind = m.sum(axis=0)
        total = int(m.sum())
        div = np.abs(m * total - n_src[:, None] * n_kind[None, :]).sum(axis=1)
        return pd.DataFrame(
            {
                "source": piv.index.to_numpy(),
                "n_spans": n_src.astype(np.int64),
                "l1_divergence": div.astype(np.int64),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # bounded |sources| x |kinds| grid per partial
        .map_batches(finish, batch_format="pandas")
    )


def _q_extract_section_histogram(sf_dir: str):
    """Sections per document (title + sectionHeading spans),
    histogrammed — the document-structure complexity profile. Per-doc
    partial counts combine per batch; a doc-hash bucket pass finishes
    the per-doc sum and folds the bounded histogram."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def partial(t: pa.Table) -> pa.Table:
        is_sec = pc.is_in(
            t.column("kind"),
            value_set=pa.array(["title", "sectionHeading"]),
        )
        g = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "s": pc.cast(is_sec, pa.int64()),
            }
        ).group_by("doc_id").aggregate([("s", "sum")])
        h = hash62_batch(g.column("doc_id").to_pylist())
        return g.append_column(
            "bucket", pa.array(np.abs(h) % np.int64(num_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("doc_id", sort=False)["s_sum"].sum().to_numpy()
        cnt = np.bincount(tot.astype(np.int64))
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"n_sections": nz.astype(np.int64),
                             "n_docs": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("n_sections").aggregate([("n_docs", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("n_sections", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "n_sections": pc.cast(g.column("n_sections"), pa.int64()),
                "n_docs": pc.cast(g.column("n_docs_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |section counts| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_text_run_histogram(sf_dir: str):
    """Interleaving granularity: lengths of maximal runs of non-media
    spans (reading order, per doc), histogrammed — how much contiguous
    text sits between media anchors. Gaps-and-islands over the span
    table: one doc-hash bucket shuffle, one lexsort + boundary-mask
    pass per bucket, bounded run-length histogram fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    _, flat = _extract_flat(sf_dir)
    add_bucket = _span_doc_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        o = g["ord"].to_numpy()
        m = g["is_media"].to_numpy()
        order = np.lexsort((o, did))
        did, m = did[order], m[order]
        n = len(g)
        text = ~m
        new_doc = np.r_[True, did[1:] != did[:-1]]
        # a text run starts at a text span that begins a doc or follows
        # a media span (or a doc boundary)
        prev_text = np.r_[False, text[:-1]]
        run_start = text & (new_doc | ~prev_text)
        run_id = np.cumsum(run_start)
        run_id[~text] = 0
        lens = np.bincount(run_id[text])[1:]
        cnt = np.bincount(lens) if len(lens) else np.zeros(0, np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"run_len": nz.astype(np.int64),
                             "n_runs": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("run_len").aggregate([("n_runs", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("run_len", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "run_len": pc.cast(g.column("run_len"), pa.int64()),
                "n_runs": pc.cast(g.column("n_runs_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |run lengths| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_section_sizes(sf_dir: str):
    """Section segmentation: spans per section (a section = a heading
    span plus everything until the next heading, per doc, in reading
    order), histogrammed — the section-granularity profile of the
    corpus. Doc-hash bucket shuffle keeps each doc whole; one lexsort +
    cumsum segment pass per bucket; bounded size histogram fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash62_batch(t.column("doc_id").to_pylist())
        is_heading = pc.is_in(
            t.column("kind"),
            value_set=pa.array(["title", "sectionHeading"]),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ord": pc.cast(t.column("ord"), pa.int64()),
                "is_heading": is_heading,
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        o = g["ord"].to_numpy()
        h = g["is_heading"].to_numpy()
        order = np.lexsort((o, did))
        did, h = did[order], h[order]
        # a segment starts at a doc boundary or at a heading span (the
        # heading belongs to ITS section, matching the SQL running-sum
        # partitioned by did)
        start = np.r_[True, did[1:] != did[:-1]] | h
        seg_id = np.cumsum(start)
        sizes = np.bincount(seg_id)[1:]
        cnt = np.bincount(sizes)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"section_len": nz.astype(np.int64),
                             "n_sections": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("section_len").aggregate([("n_sections", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("section_len", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "section_len": pc.cast(g.column("section_len"), pa.int64()),
                "n_sections": pc.cast(g.column("n_sections_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |section sizes| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_caption_length_profile(sf_dir: str):
    """Caption-candidate lengths: for every media span, the text length
    of the span immediately AFTER it in reading order (the caption
    heuristic figure-parsers use), bucketed by length//8 — a windowed
    lead() over the interleaved span table. Doc-hash bucket shuffle
    keeps each doc whole; media at end-of-doc has no successor and is
    dropped (SQL lead() NULL semantics)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash62_batch(t.column("doc_id").to_pylist())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ord": pc.cast(t.column("ord"), pa.int64()),
                "is_media": pc.equal(t.column("kind"), "media"),
                "length": pc.cast(t.column("length"), pa.int64()),
                "bucket": pa.array(np.abs(h) % np.int64(num_buckets)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        o = g["ord"].to_numpy()
        m = g["is_media"].to_numpy()
        ln = g["length"].to_numpy()
        order = np.lexsort((o, did))
        did, m, ln = did[order], m[order], ln[order]
        last = np.r_[did[1:] != did[:-1], True]
        next_len = np.roll(ln, -1)
        sel = m & ~last
        cnt = np.bincount(next_len[sel] // 8) if sel.any() else np.zeros(0, np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"len_bucket": nz.astype(np.int64),
                             "n_media": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("len_bucket").aggregate([("n_media", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("len_bucket", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "len_bucket": pc.cast(g.column("len_bucket"), pa.int64()),
                "n_media": pc.cast(g.column("n_media_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # bounded |length buckets| rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_extract_boilerplate_texts(sf_dir: str):
    """Corpus-level boilerplate detection by document frequency: header/
    footer span texts that repeat across >= 3 DISTINCT documents — the
    classic common-line boilerplate-strip signal, expressed as one
    text-hash bucket shuffle. Bucketing on hash(text) co-locates every
    occurrence of a text, so the per-bucket pass dedups (text, doc)
    pairs AND finishes the exact distinct-doc count locally — no second
    shuffle. Skew note: a boilerplate text shared by billions of docs
    concentrates its pairs in one bucket; at scale, pre-dedup (text,
    doc) inside map_batches first (same pattern as dedup.py's
    max_block_df cap)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 256
    min_docs = 2

    def add_bucket(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(
                t.column("kind"),
                value_set=pa.array(["pageHeader", "pageFooter"]),
            ),
            pc.not_equal(t.column("text"), ""),
        )
        t = t.filter(keep)
        # per-batch (text, doc) dedup before the shuffle (combiner)
        g = pa.table(
            {"text": t.column("text"), "doc_id": t.column("doc_id")}
        ).group_by(["text", "doc_id"]).aggregate([])
        h = hash62_batch(g.column("text").to_pylist())
        return g.append_column(
            "bucket", pa.array(np.abs(h) % np.int64(num_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["text", "doc_id"])
        c = d.groupby("text", sort=False).size()
        c = c[c >= min_docs]
        return pd.DataFrame(
            {"text": c.index.to_numpy(),
             "n_docs": c.to_numpy().astype(np.int64)}
        )

    return (
        flat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _q_extract_main_content_ratio(sf_dir: str):
    """Main-content share per document: text length in body 'Text' spans
    over total text length (titles/headings/headers/footers/cells are
    chrome), in ppm, histogrammed into 50k-ppm bands — the
    boilerplate-vs-content profile the HTML main-content strip tunes
    against. Per-batch per-doc partial sums combine before the one
    doc-hash bucket shuffle; bounded band histogram fold. int64
    headroom: ppm product needs doc text length < 9.2e12 chars."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.functions.hashing import hash62_batch

    _, flat = _extract_flat(sf_dir)
    num_buckets = 64

    def partial(t: pa.Table) -> pa.Table:
        ln = pc.cast(t.column("length"), pa.int64())
        is_text = pc.cast(pc.equal(t.column("kind"), "Text"), pa.int64())
        g = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tl": pc.multiply(ln, is_text),
                "tot": ln,
            }
        ).group_by("doc_id").aggregate([("tl", "sum"), ("tot", "sum")])
        h = hash62_batch(g.column("doc_id").to_pylist())
        return g.append_column(
            "bucket", pa.array(np.abs(h) % np.int64(num_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", sort=False).agg(
            tl=("tl_sum", "sum"), tot=("tot_sum", "sum")
        )
        tl, tot = s["tl"].to_numpy(), s["tot"].to_numpy()
        nzdoc = tot > 0
        band = (tl[nzdoc] * 1_000_000 // tot[nzdoc]) // 50_000
        cnt = np.bincount(band) if len(band) else np.zeros(0, np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"ratio_band": nz.astype(np.int64),
                             "n_docs": cnt[nz].astype(np.int64)})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("ratio_band").aggregate([("n_docs", "sum")])
        idx = pc.sort_indices(g, sort_keys=[("ratio_band", "ascending")])
        g = g.take(idx)
        return pa.table(
            {
                "ratio_band": pc.cast(g.column("ratio_band"), pa.int64()),
                "n_docs": pc.cast(g.column("n_docs_sum"), pa.int64()),
            }
        )

    return (
        flat.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)  # <= 21 band rows per bucket
        .map_batches(finish, batch_format="pyarrow")
    )


def _q_supplier_attr_counts(sf_dir: str):
    from ray_extract.pipelines.relational import supplier_attr_counts

    return supplier_attr_counts(sf_dir)


def _q_promo_part_suppliers(sf_dir: str):
    from ray_extract.pipelines.relational import promo_part_suppliers

    return promo_part_suppliers(sf_dir)


def _q_shipmode_priority_matrix(sf_dir: str):
    from ray_extract.pipelines.relational import shipmode_priority_matrix

    return shipmode_priority_matrix(sf_dir)


def _q_part_value_share(sf_dir: str):
    from ray_extract.pipelines.relational import part_value_share

    return part_value_share(sf_dir)


def _q_snapshot_diff(sf_dir: str):
    from ray_extract.pipelines.text import snapshot_diff

    return snapshot_diff(sf_dir)


def _q_props_value_corr_terms(sf_dir: str):
    from ray_extract.pipelines.events import props_value_corr_terms

    return props_value_corr_terms(sf_dir)


def _q_order_value_band_transition(sf_dir: str):
    from ray_extract.pipelines.relational import order_value_band_transition

    return order_value_band_transition(sf_dir)


def _q_source_sentence_dup_rate(sf_dir: str):
    from ray_extract.pipelines.text import source_sentence_dup_rate

    return source_sentence_dup_rate(sf_dir)


def _q_purchase_click_window(sf_dir: str):
    from ray_extract.pipelines.events import purchase_click_window

    return purchase_click_window(sf_dir)


def _q_linenumber_density_audit(sf_dir: str):
    from ray_extract.pipelines.relational import linenumber_density_audit

    return linenumber_density_audit(sf_dir)


def _q_value_ascent_streaks(sf_dir: str):
    from ray_extract.pipelines.events import value_ascent_streaks

    return value_ascent_streaks(sf_dir)


def _q_keyword_spotting(sf_dir: str):
    from ray_extract.pipelines.text import keyword_spotting

    return keyword_spotting(sf_dir)


def _q_supplier_margin_per_nation(sf_dir: str):
    from ray_extract.pipelines.relational import supplier_margin_per_nation

    return supplier_margin_per_nation(sf_dir)


def _q_region_trade_imbalance(sf_dir: str):
    from ray_extract.pipelines.relational import region_trade_imbalance

    return region_trade_imbalance(sf_dir)


def _q_repeat_revenue_share(sf_dir: str):
    from ray_extract.pipelines.relational import repeat_revenue_share

    return repeat_revenue_share(sf_dir)


def _q_customer_trend_signs(sf_dir: str):
    from ray_extract.pipelines.relational import customer_trend_signs

    return customer_trend_signs(sf_dir)


def _q_sentence_length_histogram(sf_dir: str):
    from ray_extract.pipelines.text import sentence_length_histogram

    return sentence_length_histogram(sf_dir)


def _q_daily_mix_divergence(sf_dir: str):
    from ray_extract.pipelines.events import daily_mix_divergence

    return daily_mix_divergence(sf_dir)


def _q_part_region_division(sf_dir: str):
    from ray_extract.pipelines.relational import part_region_division

    return part_region_division(sf_dir)


def _q_orphan_audit(sf_dir: str):
    from ray_extract.pipelines.relational import orphan_audit

    return orphan_audit(sf_dir)


def _q_dominant_bigram_per_source(sf_dir: str):
    from ray_extract.pipelines.text import dominant_bigram_per_source

    return dominant_bigram_per_source(sf_dir)


def _q_discount_curve(sf_dir: str):
    from ray_extract.pipelines.relational import discount_curve

    return discount_curve(sf_dir)


def _q_char_class_transitions(sf_dir: str):
    from ray_extract.pipelines.text import char_class_transitions

    return char_class_transitions(sf_dir)


def _q_price_qty_heatmap(sf_dir: str):
    from ray_extract.pipelines.relational import price_qty_heatmap

    return price_qty_heatmap(sf_dir)


def _q_burstiness_terms(sf_dir: str):
    from ray_extract.pipelines.events import burstiness_terms

    return burstiness_terms(sf_dir)


def _q_price_ending_histogram(sf_dir: str):
    from ray_extract.pipelines.relational import price_ending_histogram

    return price_ending_histogram(sf_dir)


def _q_acctbal_gini_terms(sf_dir: str):
    from ray_extract.pipelines.relational import acctbal_gini_terms

    return acctbal_gini_terms(sf_dir)


def _q_name_key_audit(sf_dir: str):
    from ray_extract.pipelines.relational import name_key_audit

    return name_key_audit(sf_dir)


def _q_status_consistency_matrix(sf_dir: str):
    from ray_extract.pipelines.relational import status_consistency_matrix

    return status_consistency_matrix(sf_dir)


def _q_readability_terms(sf_dir: str):
    from ray_extract.pipelines.text import readability_terms

    return readability_terms(sf_dir)


def _q_repeated_substring_topk(sf_dir: str):
    from ray_extract.pipelines.text import repeated_substring_topk

    return repeated_substring_topk(sf_dir)


def _q_embedding_covariance_terms(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_covariance_terms

    return embedding_covariance_terms(sf_dir)


def _q_benford_profile(sf_dir: str):
    from ray_extract.pipelines.relational import benford_profile

    return benford_profile(sf_dir)


def _q_shingle_containment(sf_dir: str):
    from ray_extract.pipelines.dedup import shingle_containment_pairs

    return shingle_containment_pairs(sf_dir)


def _q_gap_hour_quantiles(sf_dir: str):
    from ray_extract.pipelines.events import gap_hour_quantiles

    return gap_hour_quantiles(sf_dir)


def _q_nation_part_type_matrix(sf_dir: str):
    from ray_extract.pipelines.relational import nation_part_type_matrix

    return nation_part_type_matrix(sf_dir)


def _q_seasonality_matrix(sf_dir: str):
    from ray_extract.pipelines.events import seasonality_matrix

    return seasonality_matrix(sf_dir)


def _q_revenue_pareto_curve(sf_dir: str):
    from ray_extract.pipelines.relational import revenue_pareto_curve

    return revenue_pareto_curve(sf_dir)


def _q_part_size_price_profile(sf_dir: str):
    from ray_extract.pipelines.relational import part_size_price_profile

    return part_size_price_profile(sf_dir)


def _q_rag_chunk(sf_dir: str):
    from ray_extract.pipelines.text import rag_chunk

    return rag_chunk(sf_dir)


def _q_word_dominance_filter(sf_dir: str):
    from ray_extract.pipelines.text import word_dominance_filter

    return word_dominance_filter(sf_dir)


def _q_time_weighted_value(sf_dir: str):
    from ray_extract.pipelines.events import time_weighted_value

    return time_weighted_value(sf_dir)


def _q_weighted_median_price(sf_dir: str):
    from ray_extract.pipelines.relational import weighted_median_price

    return weighted_median_price(sf_dir)


def _q_cube_revenue(sf_dir: str):
    from ray_extract.pipelines.relational import cube_revenue

    return cube_revenue(sf_dir)


def _q_segment_recency(sf_dir: str):
    from ray_extract.pipelines.relational import segment_recency

    return segment_recency(sf_dir)


def _q_user_activity_quartiles(sf_dir: str):
    from ray_extract.pipelines.events import user_activity_quartiles

    return user_activity_quartiles(sf_dir)


def _q_pair_cosine_profile(sf_dir: str):
    from ray_extract.pipelines.similarity import pair_cosine_profile

    return pair_cosine_profile(sf_dir)


def _q_nation_share_in_region(sf_dir: str):
    from ray_extract.pipelines.relational import nation_share_in_region

    return nation_share_in_region(sf_dir)


def _q_supplier_hhi(sf_dir: str):
    from ray_extract.pipelines.relational import supplier_hhi

    return supplier_hhi(sf_dir)


def _q_anomalous_days(sf_dir: str):
    from ray_extract.pipelines.events import anomalous_days

    return anomalous_days(sf_dir)


def _q_label_centroid_similarity(sf_dir: str):
    from ray_extract.pipelines.similarity import label_centroid_similarity

    return label_centroid_similarity(sf_dir)


def _q_bigram_novelty(sf_dir: str):
    from ray_extract.pipelines.text import bigram_novelty

    return bigram_novelty(sf_dir)


def _q_source_mixture_weights(sf_dir: str):
    from ray_extract.pipelines.text import source_mixture_weights

    return source_mixture_weights(sf_dir)


def _q_late_event_stats(sf_dir: str):
    from ray_extract.pipelines.events import late_event_stats

    return late_event_stats(sf_dir)


def _q_event_dedup_hourly(sf_dir: str):
    from ray_extract.pipelines.events import event_dedup_hourly

    return event_dedup_hourly(sf_dir)


def _q_attribution_first_last(sf_dir: str):
    from ray_extract.pipelines.events import attribution_first_last

    return attribution_first_last(sf_dir)


def _q_bounce_rate(sf_dir: str):
    from ray_extract.pipelines.events import bounce_rate

    return bounce_rate(sf_dir)


def _q_zipf_profile(sf_dir: str):
    from ray_extract.pipelines.text import zipf_profile

    return zipf_profile(sf_dir)


def _q_hapax_ratio(sf_dir: str):
    from ray_extract.pipelines.text import hapax_ratio

    return hapax_ratio(sf_dir)


def _q_kmeans_update(sf_dir: str):
    from ray_extract.pipelines.similarity import kmeans_update

    return kmeans_update(sf_dir)


def _q_nation_pair_volume(sf_dir: str):
    from ray_extract.pipelines.relational import nation_pair_volume

    return nation_pair_volume(sf_dir)


def _q_market_share(sf_dir: str):
    from ray_extract.pipelines.relational import market_share

    return market_share(sf_dir)


def _q_product_profit(sf_dir: str):
    from ray_extract.pipelines.relational import product_profit

    return product_profit(sf_dir)


def _q_small_qty_revenue(sf_dir: str):
    from ray_extract.pipelines.relational import small_qty_revenue

    return small_qty_revenue(sf_dir)


def _q_top_supplier(sf_dir: str):
    from ray_extract.pipelines.relational import top_supplier

    return top_supplier(sf_dir)


def _q_order_count_distribution(sf_dir: str):
    from ray_extract.pipelines.relational import order_count_distribution

    return order_count_distribution(sf_dir)


def _q_local_supplier_volume(sf_dir: str):
    from ray_extract.pipelines.relational import local_supplier_volume

    return local_supplier_volume(sf_dir)


def _q_global_sales_opportunity(sf_dir: str):
    from ray_extract.pipelines.relational import global_sales_opportunity

    return global_sales_opportunity(sf_dir)


def _q_kmeans_assign(sf_dir: str):
    from ray_extract.pipelines.similarity import kmeans_assign

    return kmeans_assign(sf_dir)


def _q_contamination_check(sf_dir: str):
    from ray_extract.pipelines.dedup import contamination_check

    return contamination_check(sf_dir)


def _q_cross_source_dup_matrix(sf_dir: str):
    from ray_extract.pipelines.dedup import cross_source_dup_matrix

    return cross_source_dup_matrix(sf_dir)


def _q_unigram_surprisal(sf_dir: str):
    from ray_extract.pipelines.text import unigram_surprisal

    return unigram_surprisal(sf_dir)


def _q_skew_report(sf_dir: str):
    from ray_extract.pipelines.text import skew_report

    return skew_report(sf_dir)


def _q_kwic_extract(sf_dir: str):
    from ray_extract.pipelines.text import kwic_extract

    return kwic_extract(sf_dir)


def _q_source_dedup_rate(sf_dir: str):
    from ray_extract.pipelines.dedup import source_dedup_rate

    return source_dedup_rate(sf_dir)


def _q_daily_revenue_rolling7(sf_dir: str):
    from ray_extract.pipelines.relational import daily_revenue_rolling7

    return daily_revenue_rolling7(sf_dir)


def _q_ann_filtered(sf_dir: str):
    from ray_extract.pipelines.similarity import ann_filtered

    return ann_filtered(sf_dir)


def _q_minhash_estimate_audit(sf_dir: str):
    from ray_extract.pipelines.dedup import minhash_estimate_audit

    return minhash_estimate_audit(sf_dir)


def _q_priority_share_by_month(sf_dir: str):
    from ray_extract.pipelines.relational import priority_share_by_month

    return priority_share_by_month(sf_dir)


def _q_extract_spans_routed(sf_dir: str):
    """Same result as extract_spans, but through the ROUTED topology (the
    production path: payload corpus on disk, two filtered reads, small docs
    bypass the shuffle)."""
    import os

    from ray_extract.pipelines.extract import (
        ExtractConfig,
        extract_routed,
        flatten_blocks,
    )
    from ray_extract.sources.synth import materialize_corpus

    tag = sf_dir.strip("/").replace("/", "_")
    corpus = f"/tmp/ray_extract_gate/corpus_{tag}"
    done_marker = os.path.join(corpus, "_COMPLETE")
    if not os.path.isfile(done_marker):
        # materialize into a temp dir and rename into place so a crash
        # mid-materialize can't leave a partial corpus that later runs
        # silently treat as complete
        import shutil

        os.makedirs("/tmp/ray_extract_gate", exist_ok=True)
        shutil.rmtree(corpus, ignore_errors=True)
        tmp = corpus + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        materialize_corpus(f"{sf_dir}/documents.parquet", tmp, num_files=8)
        with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
            f.write("ok")
        os.rename(tmp, corpus)
    out = extract_routed(corpus, ExtractConfig())
    flat = out.map_batches(flatten_blocks, batch_format="pyarrow")
    return flat.map_batches(
        lambda t: _i64(t, {"ord", "offset", "length", "page_number"}),
        batch_format="pyarrow",
    )


def _q_extract_page_metadata(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    out, _ = _extract_flat(sf_dir)

    def flat_pages(batch: pa.Table) -> pa.Table:
        pm = batch.column("page_metadata").combine_chunks()
        counts = pc.list_value_length(pm).to_numpy().astype(np.int64)
        parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        f = pm.flatten()
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks().take(pa.array(parent)),
                "page_number": pc.cast(f.field("page_number"), pa.int64()),
                "width": f.field("width"),
                "height": f.field("height"),
            }
        )

    return out.map_batches(flat_pages, batch_format="pyarrow")


def _q_extract_doc_stats(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    out, _ = _extract_flat(sf_dir)

    def stats(batch: pa.Table) -> pa.Table:
        langs = batch.column("languages").combine_chunks()
        # row-aligned first element (list_flatten would DROP null/empty rows)
        first_lang = pa.array(
            [l[0] if l else None for l in langs.to_pylist()], type=pa.string()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_pages": pc.cast(batch.column("n_pages"), pa.int64()),
                "n_blocks": pc.cast(batch.column("n_text_blocks"), pa.int64()),
                "language": first_lang,
            }
        )

    return out.map_batches(stats, batch_format="pyarrow")


def _q_extract_table_cells(sf_dir: str):
    """Flatten the experimental table blocks: one row per surviving cell."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    out, _ = _extract_flat(sf_dir)

    def flat_cells(batch: pa.Table) -> pa.Table:
        tb = batch.column("table_blocks").combine_chunks()
        t_counts = pc.list_value_length(tb).to_numpy().astype(np.int64)
        t_parent = np.repeat(np.arange(len(batch), dtype=np.int64), t_counts)
        tables = tb.flatten()
        cells_list = tables.field("cells")
        c_counts = pc.list_value_length(cells_list).to_numpy().astype(np.int64)
        c_parent_tab = np.repeat(np.arange(len(tables), dtype=np.int64), c_counts)
        cells = cells_list.flatten()
        doc_ids = batch.column("doc_id").combine_chunks()
        return pa.table(
            {
                "doc_id": doc_ids.take(pa.array(t_parent[c_parent_tab])),
                "table_id": tables.field("table_id").take(pa.array(c_parent_tab)),
                "row_count": pc.cast(
                    tables.field("row_count").take(pa.array(c_parent_tab)), pa.int64()
                ),
                "cell_type": cells.field("cell_type"),
                "row_index": pc.cast(cells.field("row_index"), pa.int64()),
                "column_index": pc.cast(cells.field("column_index"), pa.int64()),
                "content": cells.field("content"),
                "page_number": pc.cast(cells.field("page_number"), pa.int64()),
            }
        )

    return out.map_batches(flat_cells, batch_format="pyarrow")


def _q_extract_join_meta(sf_dir: str):
    """Broadcast join: per-doc extraction stats joined with the documents
    table's metadata (small side shipped once via ray.put, probed per batch —
    no shuffle; the 100 TB pattern for dimension-table joins)."""
    import pyarrow as pa
    import ray

    import duckdb

    meta_tbl = duckdb.sql(
        f"select source || '.' || cast(doc_id as varchar) as doc_id, "
        f"lang as meta_lang, cast(n_chars as bigint) as meta_chars "
        f"from '{sf_dir}/documents.parquet'"
    ).arrow()
    # broadcast the dimension table ONCE as Arrow; each batch probes it with
    # pyarrow's native hash-join (C++), not a Python dict per row
    ref = ray.put(meta_tbl)

    def join(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        # row order within a batch may change (hash-join output order is
        # unspecified) — fine: every consumer and the oracle compare sort
        return batch.join(dim, keys="doc_id", join_type="left outer")

    return _q_extract_doc_stats(sf_dir).map_batches(join, batch_format="pyarrow")


def _q_extract_parser_output_meta(sf_dir: str):
    """ParserOutput identity/metadata surface (M7): the full pipeline with the
    ParserInput metadata columns attached; documents whose cdn_object fails
    the non-null + .pdf validation (reference convert.py:261-268) dead-letter
    with zero blocks."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    from ray_extract.sources.synth import synth_dataset

    out = extract_from_payloads(
        synth_dataset(f"{sf_dir}/documents.parquet", with_meta=True), ExtractConfig()
    )

    def sel(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "document_name": batch.column("document_name"),
                "document_description": batch.column("document_description"),
                "source_url": batch.column("source_url"),
                "cdn_object": batch.column("cdn_object"),
                "content_type": batch.column("content_type"),
                "slug": batch.column("slug"),
                "translated": batch.column("translated"),
                "status": batch.column("status"),
                "n_blocks": pc.cast(batch.column("n_text_blocks"), pa.int64()),
            }
        )

    return out.map_batches(sel, batch_format="pyarrow")


def _q_extract_kind_counts(sf_dir: str):
    from ray.data.aggregate import Count

    _, flat = _extract_flat(sf_dir)
    return flat.groupby("kind").aggregate(Count(alias_name="n"))


def _q_media_decode(sf_dir: str):
    from ray_extract.pipelines.media import media_features

    return media_features(sf_dir)


def _q_media_decode_png(sf_dir: str):
    """REAL PNG decode end-to-end: deterministic grayscale PNGs synthesized
    per sampled doc, then actually decoded (zlib inflate, chunk CRC verify,
    all five scanline filters) by an actor pool; the oracle recomputes the
    pixel statistics from the generative formula, so any codec defect
    breaks value equality."""
    from ray_extract.pipelines.media import media_decode_png

    return media_decode_png(sf_dir)


def _q_dedup_exact(sf_dir: str):
    from ray_extract.pipelines.dedup import exact_dedup

    return exact_dedup(sf_dir)


def _q_dedup_ngram_jaccard(sf_dir: str):
    from ray_extract.pipelines.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(sf_dir)


def _q_dedup_minhash_lsh(sf_dir: str):
    from ray_extract.pipelines.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(sf_dir)


def _q_dedup_simhash(sf_dir: str):
    from ray_extract.pipelines.dedup import simhash_pairs_cached as simhash_pairs

    return simhash_pairs(sf_dir)


def _q_text_tokens(sf_dir: str):
    from ray_extract.pipelines.text import token_stats

    return token_stats(sf_dir)


def _q_text_quality(sf_dir: str):
    from ray_extract.pipelines.text import quality_scores

    return quality_scores(sf_dir)


def _q_lang_id(sf_dir: str):
    from ray_extract.pipelines.text import language_id

    return language_id(sf_dir)


def _q_fingerprint(sf_dir: str):
    from ray_extract.pipelines.text import fingerprints

    return fingerprints(sf_dir)


def _q_ann_topk(sf_dir: str):
    from ray_extract.pipelines.similarity import ann_bruteforce

    return ann_bruteforce(sf_dir)


def _q_ann_lsh(sf_dir: str):
    from ray_extract.pipelines.similarity import ann_lsh

    return ann_lsh(sf_dir)


def _q_ann_ivf(sf_dir: str):
    from ray_extract.pipelines.similarity import ann_ivf

    return ann_ivf(sf_dir)


def _q_ann_recall(sf_dir: str):
    from ray_extract.pipelines.similarity import ann_recall

    return ann_recall(sf_dir)


def _q_events_window(sf_dir: str):
    from ray_extract.pipelines.events import windowed_counts

    return windowed_counts(sf_dir)


def _q_events_sessionize(sf_dir: str):
    from ray_extract.pipelines.events import sessionize

    return sessionize(sf_dir)


def _q_events_asof_join(sf_dir: str):
    from ray_extract.pipelines.events import asof_join

    return asof_join(sf_dir)


def _q_sentence_dedup(sf_dir: str):
    from ray_extract.pipelines.dedup import sentence_dedup

    return sentence_dedup(sf_dir)


def _q_top_docs_per_source(sf_dir: str):
    from ray_extract.pipelines.text import top_docs_per_source

    return top_docs_per_source(sf_dir)


def _q_bigram_counts(sf_dir: str):
    from ray_extract.pipelines.text import bigram_counts

    return bigram_counts(sf_dir)


def _q_approx_distinct_hll(sf_dir: str):
    from ray_extract.pipelines.text import approx_distinct_hll

    return approx_distinct_hll(sf_dir)


def _q_html_main_content(sf_dir: str):
    from ray_extract.pipelines.html import html_main_content

    return html_main_content(sf_dir)


def _q_embedding_dedup(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_dedup

    return embedding_dedup(sf_dir)  # mode="banded" (the scale path)


def _q_embedding_dedup_recall(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_dedup_recall

    return embedding_dedup_recall(sf_dir)


def _q_deterministic_split(sf_dir: str):
    from ray_extract.pipelines.text import deterministic_split

    return deterministic_split(sf_dir)


def _q_quality_filter(sf_dir: str):
    from ray_extract.pipelines.text import quality_filter

    return quality_filter(sf_dir)


def _q_top_docs_by_tokens(sf_dir: str):
    from ray_extract.pipelines.text import top_docs_by_tokens

    return top_docs_by_tokens(sf_dir)


def _q_distinct_sources(sf_dir: str):
    from ray_extract.pipelines.text import distinct_sources

    return distinct_sources(sf_dir)


def _q_corpus_stats(sf_dir: str):
    from ray_extract.pipelines.text import corpus_stats

    return corpus_stats(sf_dir)


def _q_revenue_by_priority(sf_dir: str):
    from ray_extract.pipelines.relational import revenue_by_priority

    return revenue_by_priority(sf_dir)


def _q_revenue_by_nation(sf_dir: str):
    from ray_extract.pipelines.relational import revenue_by_nation

    return revenue_by_nation(sf_dir)


def _q_group_quantiles(sf_dir: str):
    from ray_extract.pipelines.relational import group_quantiles

    return group_quantiles(sf_dir)


def _q_tfidf_top_terms(sf_dir: str):
    from ray_extract.pipelines.text import tfidf_top_terms

    return tfidf_top_terms(sf_dir)


def _q_stratified_sample(sf_dir: str):
    from ray_extract.pipelines.text import stratified_sample

    return stratified_sample(sf_dir)


def _q_customers_without_orders(sf_dir: str):
    from ray_extract.pipelines.relational import customers_without_orders

    return customers_without_orders(sf_dir)


def _q_events_cumulative(sf_dir: str):
    from ray_extract.pipelines.events import cumulative_stats

    return cumulative_stats(sf_dir)


def _q_stopword_scrub(sf_dir: str):
    from ray_extract.pipelines.text import stopword_scrub

    return stopword_scrub(sf_dir)


def _q_bpe_token_counts(sf_dir: str):
    from ray_extract.pipelines.text import bpe_token_counts

    return bpe_token_counts(sf_dir)


def _q_sequence_pack(sf_dir: str):
    from ray_extract.pipelines.text import sequence_pack

    return sequence_pack(sf_dir)


def _q_distinct_users_by_type(sf_dir: str):
    from ray_extract.pipelines.events import distinct_users_by_type

    return distinct_users_by_type(sf_dir)


def _q_revenue_by_quantity_band(sf_dir: str):
    from ray_extract.pipelines.relational import revenue_by_quantity_band

    return revenue_by_quantity_band(sf_dir)


def _q_events_lag_rolling(sf_dir: str):
    from ray_extract.pipelines.events import lag_rolling_stats

    return lag_rolling_stats(sf_dir)


def _q_dedup_clusters(sf_dir: str):
    from ray_extract.pipelines.dedup import duplicate_clusters

    return duplicate_clusters(sf_dir)


def _q_source_vocab_overlap(sf_dir: str):
    from ray_extract.pipelines.text import source_vocab_overlap

    return source_vocab_overlap(sf_dir)


def _q_pricing_summary(sf_dir: str):
    from ray_extract.pipelines.relational import pricing_summary

    return pricing_summary(sf_dir)


def _q_top_order_per_priority(sf_dir: str):
    from ray_extract.pipelines.relational import top_order_per_priority

    return top_order_per_priority(sf_dir)


def _q_rollup_revenue(sf_dir: str):
    from ray_extract.pipelines.relational import rollup_revenue

    return rollup_revenue(sf_dir)


def _q_top_revenue_orders(sf_dir: str):
    from ray_extract.pipelines.relational import top_revenue_orders

    return top_revenue_orders(sf_dir)


def _q_events_range_window(sf_dir: str):
    from ray_extract.pipelines.events import range_window_stats

    return range_window_stats(sf_dir)


def _q_session_stats(sf_dir: str):
    from ray_extract.pipelines.events import session_stats

    return session_stats(sf_dir)


def _q_events_hopping(sf_dir: str):
    from ray_extract.pipelines.events import hopping_window_counts

    return hopping_window_counts(sf_dir)


def _q_doc_length_histogram(sf_dir: str):
    from ray_extract.pipelines.text import doc_length_histogram

    return doc_length_histogram(sf_dir)


def _q_type_token_ratio(sf_dir: str):
    from ray_extract.pipelines.text import type_token_ratio

    return type_token_ratio(sf_dir)


def _q_keyword_search(sf_dir: str):
    from ray_extract.pipelines.text import keyword_search

    return keyword_search(sf_dir)


def _q_percentile_length_filter(sf_dir: str):
    from ray_extract.pipelines.text import percentile_length_filter

    return percentile_length_filter(sf_dir)


def _q_degree_distribution(sf_dir: str):
    from ray_extract.pipelines.dedup import degree_distribution

    return degree_distribution(sf_dir)


def _q_embedding_norm_stats(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_norm_stats

    return embedding_norm_stats(sf_dir)


def _q_knn_classify(sf_dir: str):
    from ray_extract.pipelines.similarity import knn_classify

    return knn_classify(sf_dir)


def _q_promo_revenue_share(sf_dir: str):
    from ray_extract.pipelines.relational import promo_revenue_share

    return promo_revenue_share(sf_dir)


def _q_group_moments(sf_dir: str):
    from ray_extract.pipelines.relational import group_moments

    return group_moments(sf_dir)


def _q_hour_of_day_profile(sf_dir: str):
    from ray_extract.pipelines.events import hour_of_day_profile

    return hour_of_day_profile(sf_dir)


def _q_char_trigram_profile(sf_dir: str):
    from ray_extract.pipelines.text import char_trigram_profile

    return char_trigram_profile(sf_dir)


def _q_funnel_counts(sf_dir: str):
    from ray_extract.pipelines.events import funnel_counts

    return funnel_counts(sf_dir)


def _q_period_retention(sf_dir: str):
    from ray_extract.pipelines.events import period_retention

    return period_retention(sf_dir)


def _q_oov_bigram_rate(sf_dir: str):
    from ray_extract.pipelines.text import oov_bigram_rate

    return oov_bigram_rate(sf_dir)


def _q_value_outliers(sf_dir: str):
    from ray_extract.pipelines.events import value_outliers

    return value_outliers(sf_dir)


def _q_monthly_revenue_growth(sf_dir: str):
    from ray_extract.pipelines.relational import monthly_revenue_growth

    return monthly_revenue_growth(sf_dir)


def _q_bloom_semi_join(sf_dir: str):
    from ray_extract.pipelines.relational import bloom_semi_join

    return bloom_semi_join(sf_dir)


def _q_order_priority_returned(sf_dir: str):
    from ray_extract.pipelines.relational import order_priority_returned

    return order_priority_returned(sf_dir)


def _q_large_volume_orders(sf_dir: str):
    from ray_extract.pipelines.relational import large_volume_orders

    return large_volume_orders(sf_dir)


def _q_returned_revenue_by_customer(sf_dir: str):
    from ray_extract.pipelines.relational import returned_revenue_by_customer

    return returned_revenue_by_customer(sf_dir)


def _q_avg_order_gap(sf_dir: str):
    from ray_extract.pipelines.relational import avg_order_gap

    return avg_order_gap(sf_dir)


def _q_markov_transitions(sf_dir: str):
    from ray_extract.pipelines.events import markov_transitions

    return markov_transitions(sf_dir)


def _q_wau_rolling(sf_dir: str):
    from ray_extract.pipelines.events import wau_rolling

    return wau_rolling(sf_dir)


def _q_props_value_stats(sf_dir: str):
    from ray_extract.pipelines.events import props_value_stats

    return props_value_stats(sf_dir)


def _q_repetition_profile(sf_dir: str):
    from ray_extract.pipelines.text import repetition_profile

    return repetition_profile(sf_dir)


def _q_prefix_cluster_sizes(sf_dir: str):
    from ray_extract.pipelines.text import prefix_cluster_sizes

    return prefix_cluster_sizes(sf_dir)


def _q_embedding_quantize_stats(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_quantize_stats

    return embedding_quantize_stats(sf_dir)


def _q_customer_spend_ntile(sf_dir: str):
    from ray_extract.pipelines.relational import customer_spend_ntile

    return customer_spend_ntile(sf_dir)


def _q_pivot_hour_type(sf_dir: str):
    from ray_extract.pipelines.events import pivot_hour_type

    return pivot_hour_type(sf_dir)


def _q_time_to_first_purchase(sf_dir: str):
    from ray_extract.pipelines.events import time_to_first_purchase

    return time_to_first_purchase(sf_dir)


def _q_zscore_outliers(sf_dir: str):
    from ray_extract.pipelines.events import zscore_outliers

    return zscore_outliers(sf_dir)


def _q_triangle_count(sf_dir: str):
    from ray_extract.pipelines.dedup import triangle_count

    return triangle_count(sf_dir)


def _q_weighted_sample(sf_dir: str):
    from ray_extract.pipelines.text import weighted_sample

    return weighted_sample(sf_dir)


def _q_approx_quantiles_hist(sf_dir: str):
    from ray_extract.pipelines.events import approx_quantiles_hist

    return approx_quantiles_hist(sf_dir)


def _q_session_conversion(sf_dir: str):
    from ray_extract.pipelines.events import session_conversion

    return session_conversion(sf_dir)


def _q_norm_minmax_scaled(sf_dir: str):
    from ray_extract.pipelines.similarity import norm_minmax_scaled

    return norm_minmax_scaled(sf_dir)


def _q_nation_actor_counts(sf_dir: str):
    from ray_extract.pipelines.relational import nation_actor_counts

    return nation_actor_counts(sf_dir)


def _q_forecast_revenue(sf_dir: str):
    from ray_extract.pipelines.relational import forecast_revenue

    return forecast_revenue(sf_dir)


def _q_blocked_linkage(sf_dir: str):
    from ray_extract.pipelines.dedup import blocked_linkage

    return blocked_linkage(sf_dir)


def _q_cms_heavy_hitters(sf_dir: str):
    from ray_extract.pipelines.text import cms_heavy_hitters

    return cms_heavy_hitters(sf_dir)


def _q_co_occurrence_topk(sf_dir: str):
    from ray_extract.pipelines.text import co_occurrence_topk

    return co_occurrence_topk(sf_dir)


def _q_quota_sample(sf_dir: str):
    from ray_extract.pipelines.text import quota_sample

    return quota_sample(sf_dir)


def _q_dense_hourly_series(sf_dir: str):
    from ray_extract.pipelines.events import dense_hourly_series

    return dense_hourly_series(sf_dir)


def _q_pagerank_dup_graph(sf_dir: str):
    from ray_extract.pipelines.dedup import pagerank_dup_graph

    return pagerank_dup_graph(sf_dir)


def _q_dwell_times(sf_dir: str):
    from ray_extract.pipelines.events import dwell_times

    return dwell_times(sf_dir)


def _q_upsert_merge(sf_dir: str):
    from ray_extract.pipelines.text import upsert_merge

    return upsert_merge(sf_dir)


def _q_session_paths(sf_dir: str):
    from ray_extract.pipelines.events import session_paths

    return session_paths(sf_dir)


def _q_brand_band_revenue(sf_dir: str):
    from ray_extract.pipelines.relational import brand_band_revenue

    return brand_band_revenue(sf_dir)


def _q_embedding_gram_pairs(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_gram_pairs

    return embedding_gram_pairs(sf_dir)


def _q_canonical_selection(sf_dir: str):
    from ray_extract.pipelines.dedup import canonical_selection

    return canonical_selection(sf_dir)


def _q_session_assignment(sf_dir: str):
    from ray_extract.pipelines.events import session_assignment

    return session_assignment(sf_dir)


def _q_media_frame_sample(sf_dir: str):
    from ray_extract.pipelines.media import media_frame_sample

    return media_frame_sample(sf_dir)


def _q_winsorized_stats(sf_dir: str):
    from ray_extract.pipelines.events import winsorized_stats

    return winsorized_stats(sf_dir)


def _q_jaccard_prefix_join(sf_dir: str):
    from ray_extract.pipelines.dedup import jaccard_prefix_join

    return jaccard_prefix_join(sf_dir)


def _q_cohort_matrix(sf_dir: str):
    from ray_extract.pipelines.events import cohort_matrix

    return cohort_matrix(sf_dir)


def _q_longest_type_run(sf_dir: str):
    from ray_extract.pipelines.events import longest_type_run

    return longest_type_run(sf_dir)


def _q_lang_confusion(sf_dir: str):
    from ray_extract.pipelines.text import lang_confusion

    return lang_confusion(sf_dir)


def _q_orders_profile(sf_dir: str):
    from ray_extract.pipelines.relational import orders_profile

    return orders_profile(sf_dir)


def _q_part_price_deviation(sf_dir: str):
    from ray_extract.pipelines.relational import part_price_deviation

    return part_price_deviation(sf_dir)


def _q_centroid_spread(sf_dir: str):
    from ray_extract.pipelines.similarity import centroid_spread

    return centroid_spread(sf_dir)


def _q_supplier_wait_ranking(sf_dir: str):
    from ray_extract.pipelines.relational import supplier_wait_ranking

    return supplier_wait_ranking(sf_dir)


def _q_idle_capital_by_nation(sf_dir: str):
    from ray_extract.pipelines.relational import idle_capital_by_nation

    return idle_capital_by_nation(sf_dir)


def _q_min_cost_supplier_per_part(sf_dir: str):
    from ray_extract.pipelines.relational import min_cost_supplier_per_part

    return min_cost_supplier_per_part(sf_dir)


def _q_typo_neighbor_pairs(sf_dir: str):
    from ray_extract.pipelines.dedup import typo_neighbor_pairs

    return typo_neighbor_pairs(sf_dir)


def _q_simhash_distance_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import simhash_distance_histogram

    return simhash_distance_histogram(sf_dir)


def _q_gopher_rules_profile(sf_dir: str):
    from ray_extract.pipelines.text import gopher_rules_profile

    return gopher_rules_profile(sf_dir)


def _q_duplicate_ngram_coverage(sf_dir: str):
    from ray_extract.pipelines.text import duplicate_ngram_coverage

    return duplicate_ngram_coverage(sf_dir)


def _q_order_burst_counts(sf_dir: str):
    from ray_extract.pipelines.relational import order_burst_counts

    return order_burst_counts(sf_dir)


def _q_mad_outliers(sf_dir: str):
    from ray_extract.pipelines.text import mad_outliers

    return mad_outliers(sf_dir)


def _q_collocation_pmi_terms(sf_dir: str):
    from ray_extract.pipelines.text import collocation_pmi_terms

    return collocation_pmi_terms(sf_dir)


def _q_cluster_size_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import cluster_size_histogram

    return cluster_size_histogram(sf_dir)


def _q_clustering_coefficient(sf_dir: str):
    from ray_extract.pipelines.dedup import clustering_coefficient

    return clustering_coefficient(sf_dir)


def _q_winnowing_fingerprints(sf_dir: str):
    from ray_extract.pipelines.text import winnowing_fingerprints

    return winnowing_fingerprints(sf_dir)


def _q_theil_sen_trend(sf_dir: str):
    from ray_extract.pipelines.relational import theil_sen_trend

    return theil_sen_trend(sf_dir)


def _q_drift_psi_terms(sf_dir: str):
    from ray_extract.pipelines.events import drift_psi_terms

    return drift_psi_terms(sf_dir)


def _q_rank_fusion_terms(sf_dir: str):
    from ray_extract.pipelines.similarity import rank_fusion_terms

    return rank_fusion_terms(sf_dir)


def _q_dup_graph_bfs_depths(sf_dir: str):
    from ray_extract.pipelines.dedup import dup_graph_bfs_depths

    return dup_graph_bfs_depths(sf_dir)


def _q_skyline_parts(sf_dir: str):
    from ray_extract.pipelines.relational import skyline_parts

    return skyline_parts(sf_dir)


def _q_name_edit_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import name_edit_histogram

    return name_edit_histogram(sf_dir)


def _q_kcore_peel_counts(sf_dir: str):
    from ray_extract.pipelines.dedup import kcore_peel_counts

    return kcore_peel_counts(sf_dir)


def _q_curation_funnel(sf_dir: str):
    from ray_extract.pipelines.text import curation_funnel

    return curation_funnel(sf_dir)


def _q_assortativity_terms(sf_dir: str):
    from ray_extract.pipelines.dedup import assortativity_terms

    return assortativity_terms(sf_dir)


def _q_ks_drift_terms(sf_dir: str):
    from ray_extract.pipelines.text import ks_drift_terms

    return ks_drift_terms(sf_dir)


def _q_cusum_changepoint_terms(sf_dir: str):
    from ray_extract.pipelines.events import cusum_changepoint_terms

    return cusum_changepoint_terms(sf_dir)


def _q_cluster_density_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import cluster_density_histogram

    return cluster_density_histogram(sf_dir)


def _q_cross_lang_dup_pairs(sf_dir: str):
    from ray_extract.pipelines.dedup import cross_lang_dup_pairs

    return cross_lang_dup_pairs(sf_dir)


def _q_incremental_dedup_matches(sf_dir: str):
    from ray_extract.pipelines.dedup import incremental_dedup_matches

    return incremental_dedup_matches(sf_dir)


def _q_km_repeat_terms(sf_dir: str):
    from ray_extract.pipelines.relational import km_repeat_terms

    return km_repeat_terms(sf_dir)


def _q_two_hop_reach(sf_dir: str):
    from ray_extract.pipelines.dedup import two_hop_reach

    return two_hop_reach(sf_dir)


def _q_user_day_impurity_terms(sf_dir: str):
    from ray_extract.pipelines.events import user_day_impurity_terms

    return user_day_impurity_terms(sf_dir)


def _q_bm25_terms(sf_dir: str):
    from ray_extract.pipelines.text import bm25_terms

    return bm25_terms(sf_dir)


def _q_misra_gries_heavy_hitters(sf_dir: str):
    from ray_extract.pipelines.text import misra_gries_heavy_hitters

    return misra_gries_heavy_hitters(sf_dir)


def _q_pq_code_histogram(sf_dir: str):
    from ray_extract.pipelines.similarity import pq_code_histogram

    return pq_code_histogram(sf_dir)


def _q_edge_support_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import edge_support_histogram

    return edge_support_histogram(sf_dir)


def _q_component_diameter_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import component_diameter_histogram

    return component_diameter_histogram(sf_dir)


def _q_interval_coverage(sf_dir: str):
    from ray_extract.pipelines.events import interval_coverage

    return interval_coverage(sf_dir)


def _q_heavy_hitter_drift(sf_dir: str):
    from ray_extract.pipelines.text import heavy_hitter_drift

    return heavy_hitter_drift(sf_dir)


def _q_modularity_terms(sf_dir: str):
    from ray_extract.pipelines.dedup import modularity_terms

    return modularity_terms(sf_dir)


def _q_lpa_community_histogram(sf_dir: str):
    from ray_extract.pipelines.dedup import lpa_community_histogram

    return lpa_community_histogram(sf_dir)


def _q_spearman_rank_terms(sf_dir: str):
    from ray_extract.pipelines.relational import spearman_rank_terms

    return spearman_rank_terms(sf_dir)


def _q_embedding_pca_power_terms(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_pca_power_terms

    return embedding_pca_power_terms(sf_dir)


def _q_media_decode_wav(sf_dir: str):
    """REAL WAV decode end-to-end: deterministic PCM-16 RIFF blobs
    synthesized per sampled doc, then actually decoded (chunk walk, fmt
    parse, frame extraction) by an actor pool; the oracle recomputes the
    waveform statistics from the generative formula."""
    from ray_extract.pipelines.media import media_decode_wav

    return media_decode_wav(sf_dir)


def _q_pii_scrub_stats(sf_dir: str):
    from ray_extract.pipelines.text import pii_scrub_stats

    return pii_scrub_stats(sf_dir)


def _q_association_rules(sf_dir: str):
    from ray_extract.pipelines.relational import association_rules

    return association_rules(sf_dir)


def _q_seasonal_naive_error(sf_dir: str):
    from ray_extract.pipelines.relational import seasonal_naive_error

    return seasonal_naive_error(sf_dir)


def _q_partition_boundaries(sf_dir: str):
    from ray_extract.pipelines.relational import partition_boundaries

    return partition_boundaries(sf_dir)


def _q_link_graph_degrees(sf_dir: str):
    from ray_extract.pipelines.web import link_graph_degrees

    return link_graph_degrees(sf_dir)


def _q_url_frontier_dedup(sf_dir: str):
    from ray_extract.pipelines.web import url_frontier_dedup

    return url_frontier_dedup(sf_dir)


def _q_charset_audit(sf_dir: str):
    from ray_extract.pipelines.web import charset_audit

    return charset_audit(sf_dir)


def _q_heading_outline(sf_dir: str):
    from ray_extract.pipelines.web import heading_outline

    return heading_outline(sf_dir)


def _q_redirect_resolve(sf_dir: str):
    from ray_extract.pipelines.web import redirect_resolve

    return redirect_resolve(sf_dir)


def _q_warc_extract(sf_dir: str):
    from ray_extract.pipelines.containers import warc_extract

    return warc_extract(sf_dir)


def _q_zip_directory_walk(sf_dir: str):
    from ray_extract.pipelines.containers import zip_directory_walk

    return zip_directory_walk(sf_dir)


def _q_base64_audit(sf_dir: str):
    from ray_extract.pipelines.containers import base64_audit

    return base64_audit(sf_dir)


def _q_robots_rules(sf_dir: str):
    from ray_extract.pipelines.containers import robots_rules

    return robots_rules(sf_dir)


def _q_varint_posting_decode(sf_dir: str):
    from ray_extract.pipelines.containers import varint_posting_decode

    return varint_posting_decode(sf_dir)


def _q_mutual_information_terms(sf_dir: str):
    from ray_extract.pipelines.mlstats import mutual_information_terms

    return mutual_information_terms(sf_dir)


def _q_chi_square_terms(sf_dir: str):
    from ray_extract.pipelines.mlstats import chi_square_terms

    return chi_square_terms(sf_dir)


def _q_feature_hash_collisions(sf_dir: str):
    from ray_extract.pipelines.mlstats import feature_hash_collisions

    return feature_hash_collisions(sf_dir)


def _q_regression_normal_terms(sf_dir: str):
    from ray_extract.pipelines.mlstats import regression_normal_terms

    return regression_normal_terms(sf_dir)


def _q_calibration_bins(sf_dir: str):
    from ray_extract.pipelines.mlstats import calibration_bins

    return calibration_bins(sf_dir)


def _q_sitemap_parse(sf_dir: str):
    from ray_extract.pipelines.web import sitemap_parse

    return sitemap_parse(sf_dir)


def _q_http_header_parse(sf_dir: str):
    from ray_extract.pipelines.web import http_header_parse

    return http_header_parse(sf_dir)


def _q_anchor_text_index(sf_dir: str):
    from ray_extract.pipelines.web import anchor_text_index

    return anchor_text_index(sf_dir)


def _q_canonical_meta_dedup(sf_dir: str):
    from ray_extract.pipelines.web import canonical_meta_dedup

    return canonical_meta_dedup(sf_dir)


def _q_gzip_transfer_decode(sf_dir: str):
    from ray_extract.pipelines.containers import gzip_transfer_decode

    return gzip_transfer_decode(sf_dir)


def _q_csv_dialect_parse(sf_dir: str):
    from ray_extract.pipelines.formats import csv_dialect_parse

    return csv_dialect_parse(sf_dir)


def _q_log_line_parse(sf_dir: str):
    from ray_extract.pipelines.formats import log_line_parse

    return log_line_parse(sf_dir)


def _q_ini_config_parse(sf_dir: str):
    from ray_extract.pipelines.formats import ini_config_parse

    return ini_config_parse(sf_dir)


def _q_markdown_structure(sf_dir: str):
    from ray_extract.pipelines.formats import markdown_structure

    return markdown_structure(sf_dir)


def _q_parquet_footer_audit(sf_dir: str):
    from ray_extract.pipelines.formats import parquet_footer_audit

    return parquet_footer_audit(sf_dir)


def _q_media_decode_bmp(sf_dir: str):
    from ray_extract.pipelines.media import media_decode_bmp

    return media_decode_bmp(sf_dir)


def _q_media_jpeg_dimensions(sf_dir: str):
    from ray_extract.pipelines.media import media_jpeg_dimensions

    return media_jpeg_dimensions(sf_dir)


def _q_media_tiff_ifd(sf_dir: str):
    from ray_extract.pipelines.media import media_tiff_ifd

    return media_tiff_ifd(sf_dir)


def _q_media_mp3_frames(sf_dir: str):
    from ray_extract.pipelines.media import media_mp3_frames

    return media_mp3_frames(sf_dir)


def _q_media_id3_tags(sf_dir: str):
    from ray_extract.pipelines.media import media_id3_tags

    return media_id3_tags(sf_dir)


def _q_spatial_grid_bin(sf_dir: str):
    from ray_extract.pipelines.mlstats import spatial_grid_bin

    return spatial_grid_bin(sf_dir)


def _q_xor_parity_blocks(sf_dir: str):
    from ray_extract.pipelines.containers import xor_parity_blocks

    return xor_parity_blocks(sf_dir)


def _q_content_manifest_digest(sf_dir: str):
    from ray_extract.pipelines.containers import content_manifest_digest

    return content_manifest_digest(sf_dir)


def _q_rle_run_audit(sf_dir: str):
    from ray_extract.pipelines.formats import rle_run_audit

    return rle_run_audit(sf_dir)


def _q_text_diff_stats(sf_dir: str):
    from ray_extract.pipelines.text import text_diff_stats

    return text_diff_stats(sf_dir)


def _q_dictionary_compression_audit(sf_dir: str):
    from ray_extract.pipelines.text import dictionary_compression_audit

    return dictionary_compression_audit(sf_dir)


def _q_zorder_locality_audit(sf_dir: str):
    from ray_extract.pipelines.mlstats import zorder_locality_audit

    return zorder_locality_audit(sf_dir)


def _q_compaction_plan(sf_dir: str):
    from ray_extract.pipelines.layout import compaction_plan

    return compaction_plan(sf_dir)


def _q_shard_skew_audit(sf_dir: str):
    from ray_extract.pipelines.layout import shard_skew_audit

    return shard_skew_audit(sf_dir)


def _q_doc_stitch_pairs(sf_dir: str):
    from ray_extract.pipelines.layout import doc_stitch_pairs

    return doc_stitch_pairs(sf_dir)


def _q_nearest_hub_assign(sf_dir: str):
    from ray_extract.pipelines.layout import nearest_hub_assign

    return nearest_hub_assign(sf_dir)


def _q_source_report_card(sf_dir: str):
    from ray_extract.pipelines.layout import source_report_card

    return source_report_card(sf_dir)


def _q_join_stats_audit(sf_dir: str):
    from ray_extract.pipelines.mlstats import join_stats_audit

    return join_stats_audit(sf_dir)


def _q_stratified_kfold_assign(sf_dir: str):
    from ray_extract.pipelines.mlstats import stratified_kfold_assign

    return stratified_kfold_assign(sf_dir)


def _q_tokenizer_fertility_terms(sf_dir: str):
    from ray_extract.pipelines.mlstats import tokenizer_fertility_terms

    return tokenizer_fertility_terms(sf_dir)


def _q_fold_leakage_audit(sf_dir: str):
    from ray_extract.pipelines.mlstats import fold_leakage_audit

    return fold_leakage_audit(sf_dir)


def _q_id_gap_audit(sf_dir: str):
    from ray_extract.pipelines.mlstats import id_gap_audit

    return id_gap_audit(sf_dir)


def _q_sole_late_supplier_blame(sf_dir: str):
    from ray_extract.pipelines.relational import sole_late_supplier_blame

    return sole_late_supplier_blame(sf_dir)


def _q_frequent_brand_triples(sf_dir: str):
    from ray_extract.pipelines.relational import frequent_brand_triples

    return frequent_brand_triples(sf_dir)


def _q_parts_never_shipped(sf_dir: str):
    from ray_extract.pipelines.relational import parts_never_shipped

    return parts_never_shipped(sf_dir)


def _q_event_inversion_count(sf_dir: str):
    from ray_extract.pipelines.events import event_inversion_count

    return event_inversion_count(sf_dir)


def _q_tar_member_walk(sf_dir: str):
    from ray_extract.pipelines.containers import tar_member_walk

    return tar_member_walk(sf_dir)


def _q_decayed_event_mass(sf_dir: str):
    from ray_extract.pipelines.events import decayed_event_mass

    return decayed_event_mass(sf_dir)


def _q_value_log2_histogram(sf_dir: str):
    from ray_extract.pipelines.events import value_log2_histogram

    return value_log2_histogram(sf_dir)


def _q_scd2_intervals(sf_dir: str):
    from ray_extract.pipelines.events import scd2_intervals

    return scd2_intervals(sf_dir)


def _q_alert_debounce_tumbling(sf_dir: str):
    from ray_extract.pipelines.events import alert_debounce_tumbling

    return alert_debounce_tumbling(sf_dir)


def _q_watermark_drop_audit(sf_dir: str):
    from ray_extract.pipelines.events import watermark_drop_audit

    return watermark_drop_audit(sf_dir)


def _q_lww_merge_audit(sf_dir: str):
    from ray_extract.pipelines.events import lww_merge_audit

    return lww_merge_audit(sf_dir)


def _q_partition_prune_audit(sf_dir: str):
    from ray_extract.pipelines.events import partition_prune_audit

    return partition_prune_audit(sf_dir)


def _q_regex_route_counts(sf_dir: str):
    from ray_extract.pipelines.text import regex_route_counts

    return regex_route_counts(sf_dir)


def _q_label_source_contingency(sf_dir: str):
    from ray_extract.pipelines.similarity import label_source_contingency

    return label_source_contingency(sf_dir)


def _q_embedding_coverage_audit(sf_dir: str):
    from ray_extract.pipelines.similarity import embedding_coverage_audit

    return embedding_coverage_audit(sf_dir)


def _q_textlen_label_corr_terms(sf_dir: str):
    from ray_extract.pipelines.similarity import textlen_label_corr_terms

    return textlen_label_corr_terms(sf_dir)


def _q_bipartite_projection_weights(sf_dir: str):
    from ray_extract.pipelines.events import bipartite_projection_weights

    return bipartite_projection_weights(sf_dir)


def _q_brand_quartile_band_join(sf_dir: str):
    from ray_extract.pipelines.relational import brand_quartile_band_join

    return brand_quartile_band_join(sf_dir)


def _q_source_lang_purity(sf_dir: str):
    from ray_extract.pipelines.text import source_lang_purity

    return source_lang_purity(sf_dir)


def _q_hist_intersection_matrix(sf_dir: str):
    from ray_extract.pipelines.text import hist_intersection_matrix

    return hist_intersection_matrix(sf_dir)


def _q_length_emd_matrix(sf_dir: str):
    from ray_extract.pipelines.text import length_emd_matrix

    return length_emd_matrix(sf_dir)


def _q_quota_largest_remainder(sf_dir: str):
    from ray_extract.pipelines.layout import quota_largest_remainder

    return quota_largest_remainder(sf_dir)


def _q_cdc_chunk_stats(sf_dir: str):
    from ray_extract.pipelines.text import cdc_chunk_stats

    return cdc_chunk_stats(sf_dir)


def _q_prefix_trie_fanout(sf_dir: str):
    from ray_extract.pipelines.text import prefix_trie_fanout

    return prefix_trie_fanout(sf_dir)


def _q_quantile_sketch_error_audit(sf_dir: str):
    from ray_extract.pipelines.relational import quantile_sketch_error_audit

    return quantile_sketch_error_audit(sf_dir)


def _q_stock_dip_audit(sf_dir: str):
    from ray_extract.pipelines.relational import stock_dip_audit

    return stock_dip_audit(sf_dir)


def _q_sla_band_by_priority(sf_dir: str):
    from ray_extract.pipelines.relational import sla_band_by_priority

    return sla_band_by_priority(sf_dir)


def _q_negative_sampling_audit(sf_dir: str):
    from ray_extract.pipelines.layout import negative_sampling_audit

    return negative_sampling_audit(sf_dir)


def _q_shuffle_displacement_audit(sf_dir: str):
    from ray_extract.pipelines.layout import shuffle_displacement_audit

    return shuffle_displacement_audit(sf_dir)


def _q_nation_top_spenders_ties(sf_dir: str):
    from ray_extract.pipelines.relational import nation_top_spenders_ties

    return nation_top_spenders_ties(sf_dir)


def _q_k_anonymity_audit(sf_dir: str):
    from ray_extract.pipelines.mlstats import k_anonymity_audit

    return k_anonymity_audit(sf_dir)


def _q_l_diversity_audit(sf_dir: str):
    from ray_extract.pipelines.mlstats import l_diversity_audit

    return l_diversity_audit(sf_dir)


def _q_vocab_venn_counts(sf_dir: str):
    from ray_extract.pipelines.text import vocab_venn_counts

    return vocab_venn_counts(sf_dir)


def _q_orphan_purchase_counts(sf_dir: str):
    from ray_extract.pipelines.events import orphan_purchase_counts

    return orphan_purchase_counts(sf_dir)


def _q_arrival_dispersion_terms(sf_dir: str):
    from ray_extract.pipelines.events import arrival_dispersion_terms

    return arrival_dispersion_terms(sf_dir)


def _q_max_burst_window(sf_dir: str):
    from ray_extract.pipelines.events import max_burst_window

    return max_burst_window(sf_dir)


def _q_duplicate_line_audit(sf_dir: str):
    from ray_extract.pipelines.relational import duplicate_line_audit

    return duplicate_line_audit(sf_dir)


def _q_leadlag_xcorr_terms(sf_dir: str):
    from ray_extract.pipelines.events import leadlag_xcorr_terms

    return leadlag_xcorr_terms(sf_dir)


def _q_incremental_rebuild_plan(sf_dir: str):
    from ray_extract.pipelines.layout import incremental_rebuild_plan

    return incremental_rebuild_plan(sf_dir)


def _q_split_balance_audit(sf_dir: str):
    from ray_extract.pipelines.text import split_balance_audit

    return split_balance_audit(sf_dir)


def _q_media_mp4_boxes(sf_dir: str):
    from ray_extract.pipelines.media import media_mp4_boxes

    return media_mp4_boxes(sf_dir)


def _q_media_gif_headers(sf_dir: str):
    from ray_extract.pipelines.media import media_gif_headers

    return media_gif_headers(sf_dir)


def _q_media_ico_directory(sf_dir: str):
    from ray_extract.pipelines.media import media_ico_directory

    return media_ico_directory(sf_dir)


def entry() -> Any:
    """Flagship: full extraction pipeline at sf0.001, flattened blocks."""
    return _q_extract_spans("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_spans": _q_extract_spans,
        "extract_spans_routed": _q_extract_spans_routed,
        "extract_page_metadata": _q_extract_page_metadata,
        "extract_doc_stats": _q_extract_doc_stats,
        "extract_kind_counts": _q_extract_kind_counts,
        "extract_parser_output_meta": _q_extract_parser_output_meta,
        "extract_table_cells": _q_extract_table_cells,
        "extract_join_meta": _q_extract_join_meta,
        "pdf_real_extract": _q_pdf_real_extract,
        "extract_media_refs": _q_extract_media_refs,
        "extract_offset_audit": _q_extract_offset_audit,
        "extract_page_density": _q_extract_page_density,
        "extract_kind_transitions": _q_extract_kind_transitions,
        "extract_media_position": _q_extract_media_position,
        "extract_kind_sets": _q_extract_kind_sets,
        "extract_media_context": _q_extract_media_context,
        "extract_page_kind_mix": _q_extract_page_kind_mix,
        "extract_section_sizes": _q_extract_section_sizes,
        "extract_caption_length_profile": _q_extract_caption_length_profile,
        "extract_boilerplate_texts": _q_extract_boilerplate_texts,
        "extract_main_content_ratio": _q_extract_main_content_ratio,
        "supplier_attr_counts": _q_supplier_attr_counts,
        "promo_part_suppliers": _q_promo_part_suppliers,
        "shipmode_priority_matrix": _q_shipmode_priority_matrix,
        "part_value_share": _q_part_value_share,
        "supplier_wait_ranking": _q_supplier_wait_ranking,
        "idle_capital_by_nation": _q_idle_capital_by_nation,
        "min_cost_supplier_per_part": _q_min_cost_supplier_per_part,
        "gopher_rules_profile": _q_gopher_rules_profile,
        "duplicate_ngram_coverage": _q_duplicate_ngram_coverage,
        "simhash_distance_histogram": _q_simhash_distance_histogram,
        "typo_neighbor_pairs": _q_typo_neighbor_pairs,
        "revenue_trend": _q_revenue_trend,
        "order_reconciliation": _q_order_reconciliation,
        "core_vocabulary": _q_core_vocabulary,
        "order_width_histogram": _q_order_width_histogram,
        "revenue_concentration": _q_revenue_concentration,
        "top_parts_by_quantity": _q_top_parts_by_quantity,
        "acctbal_band_profile": _q_acctbal_band_profile,
        "supplier_balance_leader": _q_supplier_balance_leader,
        "user_resurrections": _q_user_resurrections,
        "gap_hour_histogram": _q_gap_hour_histogram,
        "value_autocorr_terms": _q_value_autocorr_terms,
        "word_length_histogram": _q_word_length_histogram,
        "allcaps_ratio": _q_allcaps_ratio,
        "lexical_density": _q_lexical_density,
        "vocab_growth": _q_vocab_growth,
        "dominant_dim_histogram": _q_dominant_dim_histogram,
        "dim_sign_profile": _q_dim_sign_profile,
        "ship_delay_profile": _q_ship_delay_profile,
        "regional_customer_value": _q_regional_customer_value,
        "tax_discount_matrix": _q_tax_discount_matrix,
        "supplier_part_coverage": _q_supplier_part_coverage,
        "orders_per_weekday": _q_orders_per_weekday,
        "char_class_profile": _q_char_class_profile,
        "customer_supplier_diversity": _q_customer_supplier_diversity,
        "monthly_active_customers": _q_monthly_active_customers,
        "part_name_token_revenue": _q_part_name_token_revenue,
        "rfm_segments": _q_rfm_segments,
        "event_type_affinity": _q_event_type_affinity,
        "basket_supplier_pairs": _q_basket_supplier_pairs,
        "price_discount_corr_terms": _q_price_discount_corr_terms,
        "order_gap_histogram": _q_order_gap_histogram,
        "user_streaks": _q_user_streaks,
        "user_growth_curve": _q_user_growth_curve,
        "peak_concurrency": _q_peak_concurrency,
        "quantity_mode": _q_quantity_mode,
        "nation_rank_change": _q_nation_rank_change,
        "readability_terms": _q_readability_terms,
        "repeated_substring_topk": _q_repeated_substring_topk,
        "embedding_covariance_terms": _q_embedding_covariance_terms,
        "benford_profile": _q_benford_profile,
        "extract_length_quartiles": _q_extract_length_quartiles,
        "acctbal_gini_terms": _q_acctbal_gini_terms,
        "name_key_audit": _q_name_key_audit,
        "status_consistency_matrix": _q_status_consistency_matrix,
        "burstiness_terms": _q_burstiness_terms,
        "price_ending_histogram": _q_price_ending_histogram,
        "char_class_transitions": _q_char_class_transitions,
        "price_qty_heatmap": _q_price_qty_heatmap,
        "extract_ref_integrity": _q_extract_ref_integrity,
        "dominant_bigram_per_source": _q_dominant_bigram_per_source,
        "discount_curve": _q_discount_curve,
        "part_region_division": _q_part_region_division,
        "orphan_audit": _q_orphan_audit,
        "customer_trend_signs": _q_customer_trend_signs,
        "sentence_length_histogram": _q_sentence_length_histogram,
        "daily_mix_divergence": _q_daily_mix_divergence,
        "snapshot_diff": _q_snapshot_diff,
        "extract_section_histogram": _q_extract_section_histogram,
        "extract_text_run_histogram": _q_extract_text_run_histogram,
        "props_value_corr_terms": _q_props_value_corr_terms,
        "extract_kind_divergence": _q_extract_kind_divergence,
        "region_trade_imbalance": _q_region_trade_imbalance,
        "repeat_revenue_share": _q_repeat_revenue_share,
        "keyword_spotting": _q_keyword_spotting,
        "supplier_margin_per_nation": _q_supplier_margin_per_nation,
        "linenumber_density_audit": _q_linenumber_density_audit,
        "value_ascent_streaks": _q_value_ascent_streaks,
        "purchase_click_window": _q_purchase_click_window,
        "order_value_band_transition": _q_order_value_band_transition,
        "source_sentence_dup_rate": _q_source_sentence_dup_rate,
        "shingle_containment": _q_shingle_containment,
        "gap_hour_quantiles": _q_gap_hour_quantiles,
        "nation_part_type_matrix": _q_nation_part_type_matrix,
        "seasonality_matrix": _q_seasonality_matrix,
        "revenue_pareto_curve": _q_revenue_pareto_curve,
        "part_size_price_profile": _q_part_size_price_profile,
        "rag_chunk": _q_rag_chunk,
        "word_dominance_filter": _q_word_dominance_filter,
        "time_weighted_value": _q_time_weighted_value,
        "weighted_median_price": _q_weighted_median_price,
        "cube_revenue": _q_cube_revenue,
        "segment_recency": _q_segment_recency,
        "user_activity_quartiles": _q_user_activity_quartiles,
        "pair_cosine_profile": _q_pair_cosine_profile,
        "nation_share_in_region": _q_nation_share_in_region,
        "supplier_hhi": _q_supplier_hhi,
        "anomalous_days": _q_anomalous_days,
        "label_centroid_similarity": _q_label_centroid_similarity,
        "bigram_novelty": _q_bigram_novelty,
        "source_mixture_weights": _q_source_mixture_weights,
        "late_event_stats": _q_late_event_stats,
        "event_dedup_hourly": _q_event_dedup_hourly,
        "attribution_first_last": _q_attribution_first_last,
        "bounce_rate": _q_bounce_rate,
        "zipf_profile": _q_zipf_profile,
        "hapax_ratio": _q_hapax_ratio,
        "kmeans_update": _q_kmeans_update,
        "nation_pair_volume": _q_nation_pair_volume,
        "market_share": _q_market_share,
        "product_profit": _q_product_profit,
        "small_qty_revenue": _q_small_qty_revenue,
        "top_supplier": _q_top_supplier,
        "kmeans_assign": _q_kmeans_assign,
        "contamination_check": _q_contamination_check,
        "cross_source_dup_matrix": _q_cross_source_dup_matrix,
        "order_count_distribution": _q_order_count_distribution,
        "local_supplier_volume": _q_local_supplier_volume,
        "global_sales_opportunity": _q_global_sales_opportunity,
        "unigram_surprisal": _q_unigram_surprisal,
        "skew_report": _q_skew_report,
        "kwic_extract": _q_kwic_extract,
        "source_dedup_rate": _q_source_dedup_rate,
        "daily_revenue_rolling7": _q_daily_revenue_rolling7,
        "ann_filtered": _q_ann_filtered,
        "minhash_estimate_audit": _q_minhash_estimate_audit,
        "priority_share_by_month": _q_priority_share_by_month,
        "media_decode": _q_media_decode,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_simhash": _q_dedup_simhash,
        "text_tokens": _q_text_tokens,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "ann_topk": _q_ann_topk,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "ann_recall": _q_ann_recall,
        "embedding_dedup": _q_embedding_dedup,
        "embedding_dedup_recall": _q_embedding_dedup_recall,
        "events_window": _q_events_window,
        "events_sessionize": _q_events_sessionize,
        "events_asof_join": _q_events_asof_join,
        "sentence_dedup": _q_sentence_dedup,
        "top_docs_per_source": _q_top_docs_per_source,
        "bigram_counts": _q_bigram_counts,
        "approx_distinct_hll": _q_approx_distinct_hll,
        "html_main_content": _q_html_main_content,
        "quality_filter": _q_quality_filter,
        "deterministic_split": _q_deterministic_split,
        "top_docs_by_tokens": _q_top_docs_by_tokens,
        "distinct_sources": _q_distinct_sources,
        "corpus_stats": _q_corpus_stats,
        "revenue_by_priority": _q_revenue_by_priority,
        "revenue_by_nation": _q_revenue_by_nation,
        "group_quantiles": _q_group_quantiles,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "stratified_sample": _q_stratified_sample,
        "customers_without_orders": _q_customers_without_orders,
        "events_cumulative": _q_events_cumulative,
        "stopword_scrub": _q_stopword_scrub,
        "bpe_token_counts": _q_bpe_token_counts,
        "sequence_pack": _q_sequence_pack,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "revenue_by_quantity_band": _q_revenue_by_quantity_band,
        "events_lag_rolling": _q_events_lag_rolling,
        "dedup_clusters": _q_dedup_clusters,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "pricing_summary": _q_pricing_summary,
        "top_order_per_priority": _q_top_order_per_priority,
        "rollup_revenue": _q_rollup_revenue,
        "top_revenue_orders": _q_top_revenue_orders,
        "events_range_window": _q_events_range_window,
        "session_stats": _q_session_stats,
        "events_hopping": _q_events_hopping,
        "doc_length_histogram": _q_doc_length_histogram,
        "type_token_ratio": _q_type_token_ratio,
        "keyword_search": _q_keyword_search,
        "percentile_length_filter": _q_percentile_length_filter,
        "degree_distribution": _q_degree_distribution,
        "embedding_norm_stats": _q_embedding_norm_stats,
        "knn_classify": _q_knn_classify,
        "promo_revenue_share": _q_promo_revenue_share,
        "group_moments": _q_group_moments,
        "hour_of_day_profile": _q_hour_of_day_profile,
        "char_trigram_profile": _q_char_trigram_profile,
        "funnel_counts": _q_funnel_counts,
        "period_retention": _q_period_retention,
        "oov_bigram_rate": _q_oov_bigram_rate,
        "value_outliers": _q_value_outliers,
        "monthly_revenue_growth": _q_monthly_revenue_growth,
        "bloom_semi_join": _q_bloom_semi_join,
        "order_priority_returned": _q_order_priority_returned,
        "large_volume_orders": _q_large_volume_orders,
        "returned_revenue_by_customer": _q_returned_revenue_by_customer,
        "avg_order_gap": _q_avg_order_gap,
        "markov_transitions": _q_markov_transitions,
        "wau_rolling": _q_wau_rolling,
        "props_value_stats": _q_props_value_stats,
        "repetition_profile": _q_repetition_profile,
        "prefix_cluster_sizes": _q_prefix_cluster_sizes,
        "embedding_quantize_stats": _q_embedding_quantize_stats,
        "customer_spend_ntile": _q_customer_spend_ntile,
        "pivot_hour_type": _q_pivot_hour_type,
        "time_to_first_purchase": _q_time_to_first_purchase,
        "zscore_outliers": _q_zscore_outliers,
        "triangle_count": _q_triangle_count,
        "weighted_sample": _q_weighted_sample,
        "approx_quantiles_hist": _q_approx_quantiles_hist,
        "session_conversion": _q_session_conversion,
        "norm_minmax_scaled": _q_norm_minmax_scaled,
        "nation_actor_counts": _q_nation_actor_counts,
        "forecast_revenue": _q_forecast_revenue,
        "blocked_linkage": _q_blocked_linkage,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "co_occurrence_topk": _q_co_occurrence_topk,
        "quota_sample": _q_quota_sample,
        "dense_hourly_series": _q_dense_hourly_series,
        "pagerank_dup_graph": _q_pagerank_dup_graph,
        "dwell_times": _q_dwell_times,
        "upsert_merge": _q_upsert_merge,
        "session_paths": _q_session_paths,
        "brand_band_revenue": _q_brand_band_revenue,
        "embedding_gram_pairs": _q_embedding_gram_pairs,
        "canonical_selection": _q_canonical_selection,
        "session_assignment": _q_session_assignment,
        "media_frame_sample": _q_media_frame_sample,
        "media_decode_png": _q_media_decode_png,
        "winsorized_stats": _q_winsorized_stats,
        "jaccard_prefix_join": _q_jaccard_prefix_join,
        "cohort_matrix": _q_cohort_matrix,
        "longest_type_run": _q_longest_type_run,
        "lang_confusion": _q_lang_confusion,
        "orders_profile": _q_orders_profile,
        "part_price_deviation": _q_part_price_deviation,
        "centroid_spread": _q_centroid_spread,
        "order_burst_counts": _q_order_burst_counts,
        "mad_outliers": _q_mad_outliers,
        "collocation_pmi_terms": _q_collocation_pmi_terms,
        "cluster_size_histogram": _q_cluster_size_histogram,
        "clustering_coefficient": _q_clustering_coefficient,
        "winnowing_fingerprints": _q_winnowing_fingerprints,
        "theil_sen_trend": _q_theil_sen_trend,
        "drift_psi_terms": _q_drift_psi_terms,
        "rank_fusion_terms": _q_rank_fusion_terms,
        "dup_graph_bfs_depths": _q_dup_graph_bfs_depths,
        "skyline_parts": _q_skyline_parts,
        "name_edit_histogram": _q_name_edit_histogram,
        "kcore_peel_counts": _q_kcore_peel_counts,
        "curation_funnel": _q_curation_funnel,
        "assortativity_terms": _q_assortativity_terms,
        "ks_drift_terms": _q_ks_drift_terms,
        "cusum_changepoint_terms": _q_cusum_changepoint_terms,
        "cluster_density_histogram": _q_cluster_density_histogram,
        "cross_lang_dup_pairs": _q_cross_lang_dup_pairs,
        "incremental_dedup_matches": _q_incremental_dedup_matches,
        "km_repeat_terms": _q_km_repeat_terms,
        "two_hop_reach": _q_two_hop_reach,
        "user_day_impurity_terms": _q_user_day_impurity_terms,
        "bm25_terms": _q_bm25_terms,
        "misra_gries_heavy_hitters": _q_misra_gries_heavy_hitters,
        "pq_code_histogram": _q_pq_code_histogram,
        "edge_support_histogram": _q_edge_support_histogram,
        "component_diameter_histogram": _q_component_diameter_histogram,
        "interval_coverage": _q_interval_coverage,
        "heavy_hitter_drift": _q_heavy_hitter_drift,
        "modularity_terms": _q_modularity_terms,
        "lpa_community_histogram": _q_lpa_community_histogram,
        "spearman_rank_terms": _q_spearman_rank_terms,
        "embedding_pca_power_terms": _q_embedding_pca_power_terms,
        "media_decode_wav": _q_media_decode_wav,
        "pii_scrub_stats": _q_pii_scrub_stats,
        "association_rules": _q_association_rules,
        "seasonal_naive_error": _q_seasonal_naive_error,
        "partition_boundaries": _q_partition_boundaries,
        "link_graph_degrees": _q_link_graph_degrees,
        "url_frontier_dedup": _q_url_frontier_dedup,
        "charset_audit": _q_charset_audit,
        "heading_outline": _q_heading_outline,
        "redirect_resolve": _q_redirect_resolve,
        "warc_extract": _q_warc_extract,
        "zip_directory_walk": _q_zip_directory_walk,
        "base64_audit": _q_base64_audit,
        "robots_rules": _q_robots_rules,
        "varint_posting_decode": _q_varint_posting_decode,
        "mutual_information_terms": _q_mutual_information_terms,
        "chi_square_terms": _q_chi_square_terms,
        "feature_hash_collisions": _q_feature_hash_collisions,
        "regression_normal_terms": _q_regression_normal_terms,
        "calibration_bins": _q_calibration_bins,
        "sitemap_parse": _q_sitemap_parse,
        "http_header_parse": _q_http_header_parse,
        "anchor_text_index": _q_anchor_text_index,
        "canonical_meta_dedup": _q_canonical_meta_dedup,
        "gzip_transfer_decode": _q_gzip_transfer_decode,
        "csv_dialect_parse": _q_csv_dialect_parse,
        "log_line_parse": _q_log_line_parse,
        "ini_config_parse": _q_ini_config_parse,
        "markdown_structure": _q_markdown_structure,
        "parquet_footer_audit": _q_parquet_footer_audit,
        "media_decode_bmp": _q_media_decode_bmp,
        "media_jpeg_dimensions": _q_media_jpeg_dimensions,
        "media_tiff_ifd": _q_media_tiff_ifd,
        "media_mp3_frames": _q_media_mp3_frames,
        "media_id3_tags": _q_media_id3_tags,
        "spatial_grid_bin": _q_spatial_grid_bin,
        "xor_parity_blocks": _q_xor_parity_blocks,
        "content_manifest_digest": _q_content_manifest_digest,
        "rle_run_audit": _q_rle_run_audit,
        "text_diff_stats": _q_text_diff_stats,
        "dictionary_compression_audit": _q_dictionary_compression_audit,
        "zorder_locality_audit": _q_zorder_locality_audit,
        "compaction_plan": _q_compaction_plan,
        "shard_skew_audit": _q_shard_skew_audit,
        "doc_stitch_pairs": _q_doc_stitch_pairs,
        "nearest_hub_assign": _q_nearest_hub_assign,
        "source_report_card": _q_source_report_card,
        "join_stats_audit": _q_join_stats_audit,
        "stratified_kfold_assign": _q_stratified_kfold_assign,
        "tokenizer_fertility_terms": _q_tokenizer_fertility_terms,
        "fold_leakage_audit": _q_fold_leakage_audit,
        "id_gap_audit": _q_id_gap_audit,
        "sole_late_supplier_blame": _q_sole_late_supplier_blame,
        "frequent_brand_triples": _q_frequent_brand_triples,
        "parts_never_shipped": _q_parts_never_shipped,
        "event_inversion_count": _q_event_inversion_count,
        "tar_member_walk": _q_tar_member_walk,
        "decayed_event_mass": _q_decayed_event_mass,
        "value_log2_histogram": _q_value_log2_histogram,
        "scd2_intervals": _q_scd2_intervals,
        "alert_debounce_tumbling": _q_alert_debounce_tumbling,
        "watermark_drop_audit": _q_watermark_drop_audit,
        "lww_merge_audit": _q_lww_merge_audit,
        "partition_prune_audit": _q_partition_prune_audit,
        "regex_route_counts": _q_regex_route_counts,
        "label_source_contingency": _q_label_source_contingency,
        "embedding_coverage_audit": _q_embedding_coverage_audit,
        "textlen_label_corr_terms": _q_textlen_label_corr_terms,
        "bipartite_projection_weights": _q_bipartite_projection_weights,
        "brand_quartile_band_join": _q_brand_quartile_band_join,
        "source_lang_purity": _q_source_lang_purity,
        "hist_intersection_matrix": _q_hist_intersection_matrix,
        "length_emd_matrix": _q_length_emd_matrix,
        "quota_largest_remainder": _q_quota_largest_remainder,
        "cdc_chunk_stats": _q_cdc_chunk_stats,
        "prefix_trie_fanout": _q_prefix_trie_fanout,
        "quantile_sketch_error_audit": _q_quantile_sketch_error_audit,
        "stock_dip_audit": _q_stock_dip_audit,
        "sla_band_by_priority": _q_sla_band_by_priority,
        "negative_sampling_audit": _q_negative_sampling_audit,
        "shuffle_displacement_audit": _q_shuffle_displacement_audit,
        "nation_top_spenders_ties": _q_nation_top_spenders_ties,
        "k_anonymity_audit": _q_k_anonymity_audit,
        "l_diversity_audit": _q_l_diversity_audit,
        "vocab_venn_counts": _q_vocab_venn_counts,
        "orphan_purchase_counts": _q_orphan_purchase_counts,
        "arrival_dispersion_terms": _q_arrival_dispersion_terms,
        "max_burst_window": _q_max_burst_window,
        "duplicate_line_audit": _q_duplicate_line_audit,
        "leadlag_xcorr_terms": _q_leadlag_xcorr_terms,
        "incremental_rebuild_plan": _q_incremental_rebuild_plan,
        "split_balance_audit": _q_split_balance_audit,
        "media_mp4_boxes": _q_media_mp4_boxes,
        "media_gif_headers": _q_media_gif_headers,
        "media_ico_directory": _q_media_ico_directory,
    }


def oracle_sql() -> dict[str, str]:
    roll_text = _ROLL.format(col="text")
    roll_w = _ROLL.format(col="w")
    roll_id = _ROLL.format(col="CAST(doc_id AS VARCHAR)")
    d = {
        "supplier_wait_ranking": """
WITH f AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
  FROM orders WHERE o_orderstatus = 'F'
),
ls AS (
  SELECT l_orderkey AS k, l_suppkey AS sk,
         max(CAST(l_shipdate AS DATE)) AS ms
  FROM lineitem GROUP BY 1, 2
),
j AS (
  SELECT ls.k, ls.sk, (ms > od + INTERVAL 90 DAY) AS slow
  FROM ls JOIN f ON ls.k = f.o_orderkey
),
g AS (
  SELECT k, count(*) AS n_supp,
         sum(CASE WHEN slow THEN 1 ELSE 0 END) AS n_slow
  FROM j GROUP BY k
),
w AS (
  SELECT j.sk FROM j JOIN g USING (k)
  WHERE j.slow AND g.n_supp >= 2 AND g.n_slow = 1
)
SELECT CAST(sk AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM w JOIN supplier ON sk = s_suppkey
GROUP BY sk, s_name
ORDER BY numwait DESC, s_suppkey ASC LIMIT 25
""",
        "idle_capital_by_nation": """
WITH t AS (
  SELECT SUM(CASE WHEN bal > 0 THEN bal ELSE 0 END) AS s,
         SUM(CASE WHEN bal > 0 THEN 1 ELSE 0 END) AS n
  FROM (SELECT CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal
        FROM customer)
),
idle AS (
  SELECT c_nationkey AS nk,
         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal
  FROM customer, t
  WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) * t.n > t.s
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
)
SELECT CAST(nk AS BIGINT) AS n_nationkey, n_name,
       CAST(count(*) AS BIGINT) AS n_idle_customers,
       CAST(SUM(bal) AS BIGINT) AS idle_capital_cents
FROM idle JOIN nation ON nk = n_nationkey
GROUP BY nk, n_name
""",
        "min_cost_supplier_per_part": """
WITH m AS (
  SELECT l_partkey AS pk,
         min(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * 4294967296
             + l_suppkey) AS packed
  FROM lineitem GROUP BY 1
),
w AS (SELECT packed % 4294967296 AS sk, count(*) AS parts FROM m GROUP BY 1)
SELECT n_name, CAST(SUM(parts) AS BIGINT) AS parts_won,
       CAST(count(*) AS BIGINT) AS winner_suppliers
FROM w
JOIN supplier ON sk = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
        "extract_media_context": _SPANS_CTE
        + """
, ctx AS (
  SELECT did, i, kind,
         COALESCE(lag(kind) OVER (PARTITION BY did ORDER BY i), 'BOS')
           AS prev_kind,
         COALESCE(lead(kind) OVER (PARTITION BY did ORDER BY i), 'EOS')
           AS next_kind
  FROM spans
)
SELECT prev_kind, next_kind, CAST(count(*) AS BIGINT) AS n_media
FROM ctx WHERE kind = 'media'
GROUP BY prev_kind, next_kind
ORDER BY prev_kind, next_kind
""",
        "extract_page_kind_mix": _SPANS_CTE
        + """
SELECT page_number, kind, CAST(count(*) AS BIGINT) AS n_spans
FROM spans GROUP BY page_number, kind
ORDER BY page_number, kind
""",
        "typo_neighbor_pairs": """
WITH n AS (
  SELECT DISTINCT c_name AS name FROM customer
  UNION SELECT DISTINCT p_name FROM part
  UNION SELECT DISTINCT w FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
)
SELECT a.name AS name_a, b.name AS name_b
FROM n a JOIN n b
  ON a.name < b.name AND levenshtein(a.name, b.name) <= 1
ORDER BY name_a, name_b
""",
        "gopher_rules_profile": """
WITH d AS (
  SELECT source,
         len(string_split(text, ' ')) AS nw,
         length(text) - (len(string_split(text, ' ')) - 1) AS sl,
         len(list_distinct(list_intersect(string_split(text, ' '),
             ['the','a','of','and','to','data','order','line']))) AS swt,
         len(list_filter(string_split(text, ' '),
             x -> regexp_matches(x, '[a-zA-Z]'))) AS na
  FROM documents
),
r AS (
  SELECT source,
         CASE WHEN nw < 15 OR nw > 800 THEN 1 ELSE 0 END AS fwc,
         CASE WHEN sl < 3*nw OR sl > 10*nw THEN 1 ELSE 0 END AS fml,
         CASE WHEN swt < 2 THEN 1 ELSE 0 END AS fsw,
         CASE WHEN 5*na < 4*nw THEN 1 ELSE 0 END AS fal
  FROM d
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(fwc) AS BIGINT) AS fail_wordcount,
       CAST(SUM(fml) AS BIGINT) AS fail_meanlen,
       CAST(SUM(fsw) AS BIGINT) AS fail_stopword,
       CAST(SUM(fal) AS BIGINT) AS fail_alpha,
       CAST(SUM(CASE WHEN fwc + fml + fsw + fal > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS fail_any
FROM r GROUP BY source
""",
        "duplicate_ngram_coverage": """
WITH docs AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT source, array_to_string(ws[u.i:u.i+4], ' ') AS g5
  FROM docs, unnest(range(1, len(ws) - 3)) AS u(i)
),
c AS (SELECT g5, count(*) AS n FROM g GROUP BY g5)
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams
FROM g JOIN c USING (g5) GROUP BY source
""",
        "extract_spans": _SPANS_CTE
        + """
SELECT s.did AS doc_id, s.i AS ord, CAST(s.i AS VARCHAR) AS block_id, s.kind,
       s.text, s.media_ref, s."offset" AS "offset", s.length AS length,
       s.page_number AS page_number, l.language AS language
FROM spans s JOIN lang l ON s.did = l.did
""",
        "extract_spans_routed": _SPANS_CTE
        + """
SELECT s.did AS doc_id, s.i AS ord, CAST(s.i AS VARCHAR) AS block_id, s.kind,
       s.text, s.media_ref, s."offset" AS "offset", s.length AS length,
       s.page_number AS page_number, l.language AS language
FROM spans s JOIN lang l ON s.did = l.did
""",
        "extract_page_metadata": """
WITH docs AS (
  SELECT source || '.' || CAST(doc_id AS VARCHAR) AS did,
         CAST(ceil(ceil(len(string_split(text, ' '))/4.0)/6.0) AS BIGINT) AS np
  FROM documents
)
SELECT did AS doc_id, CAST(u.i AS BIGINT) AS page_number,
       612.0 AS width, 792.0 AS height
FROM docs, unnest(range(0, np)) AS u(i)
""",
        "extract_doc_stats": _SPANS_CTE
        + """
SELECT s.did AS doc_id,
       CAST(ceil(count(*)/6.0) AS BIGINT) AS n_pages,
       count(*) AS n_blocks,
       max(l.language) AS language
FROM spans s JOIN lang l ON s.did = l.did
GROUP BY s.did
""",
        "extract_kind_counts": _SPANS_CTE
        + """
SELECT kind, count(*) AS n FROM spans GROUP BY kind
""",
        "extract_parser_output_meta": """
WITH d AS (
  SELECT source || '.' || CAST(doc_id AS VARCHAR) AS did, source, doc_id, text,
         doc_id % 53 = 13 AS bad
  FROM documents
)
SELECT did AS doc_id,
       'Document ' || did AS document_name,
       'Synthetic document ' || did AS document_description,
       'https://docs.example.org/' || source || '/' || CAST(doc_id AS VARCHAR)
         AS source_url,
       'corpus/' || did || CASE WHEN bad THEN '.bin' ELSE '.pdf' END AS cdn_object,
       'application/pdf' AS content_type,
       source || '-' || CAST(doc_id AS VARCHAR) AS slug,
       false AS translated,
       CASE WHEN bad THEN 'error' ELSE 'ok' END AS status,
       CAST(CASE WHEN bad THEN 0
            ELSE ceil(len(string_split(text, ' '))/4.0) END AS BIGINT) AS n_blocks
FROM d
""",
        "extract_join_meta": _SPANS_CTE
        + """
, stats AS (
  SELECT s.did, CAST(ceil(count(*)/6.0) AS BIGINT) AS n_pages,
         count(*) AS n_blocks, max(l.language) AS language
  FROM spans s JOIN lang l ON s.did = l.did GROUP BY s.did
)
SELECT st.did AS doc_id, st.n_pages, st.n_blocks, st.language,
       d.lang AS meta_lang, CAST(d.n_chars AS BIGINT) AS meta_chars
FROM stats st
JOIN (SELECT source || '.' || CAST(doc_id AS VARCHAR) AS did, lang, n_chars
      FROM documents) d ON d.did = st.did
""",
        "extract_table_cells": _SPANS_CTE
        + """
SELECT did AS doc_id,
       CAST(dense_rank() OVER (PARTITION BY did ORDER BY page_number) - 1
            AS VARCHAR) AS table_id,
       count(*) OVER (PARTITION BY did, page_number) AS row_count,
       'content' AS cell_type,
       row_number() OVER (PARTITION BY did, page_number ORDER BY i) - 1 AS row_index,
       CAST(0 AS BIGINT) AS column_index,
       text AS content,
       page_number
FROM spans WHERE kind = 'TableCell'
""",
        "media_decode": _SPANS_CTE
        + """
SELECT did AS doc_id, i AS ord, media_ref, md5(media_ref) AS feature_hash,
       64 + length(media_ref) % 32 AS width,
       64 + length(media_ref) % 17 AS height
FROM spans WHERE kind = 'media'
""",
        "media_frame_sample": _SPANS_CTE
        + """
, m AS (
  SELECT did, i AS ord, media_ref,
         8 + length(media_ref) % 8 AS nf
  FROM spans WHERE kind = 'media'
)
SELECT did AS doc_id, ord, media_ref,
       CAST(u.f AS BIGINT) AS frame_idx,
       media_ref || '#f' || CAST(u.f AS VARCHAR) AS frame_ref,
       CAST(u.f * 40 AS BIGINT) AS pts_ms
FROM m, unnest(range(0, nf, 2)) AS u(f)
""",
        "media_decode_png": """
SELECT d.doc_id,
       CAST(16 + d.doc_id % 16 AS BIGINT) AS width,
       CAST(8 + d.doc_id % 8 AS BIGINT) AS height,
       CAST(SUM((3 * d.doc_id + x.x + 7 * y.y) % 251) AS BIGINT) AS pixel_sum,
       CAST(MIN((3 * d.doc_id + x.x + 7 * y.y) % 251) AS BIGINT) AS pixel_min,
       CAST(MAX((3 * d.doc_id + x.x + 7 * y.y) % 251) AS BIGINT) AS pixel_max
FROM documents d, generate_series(0, 30) x(x), generate_series(0, 14) y(y)
WHERE d.doc_id % 17 = 0
  AND x.x < 16 + d.doc_id % 16 AND y.y < 8 + d.doc_id % 8
GROUP BY d.doc_id
""",
        "dedup_exact": """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
""",
        "dedup_ngram_jaccard": _NGRAM_CTE
        + """
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS uni
FROM p
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 2 * inter >= (sa.n + sb.n - inter)
""",
        "dedup_minhash_lsh": _NGRAM_CTE
        + """
, mh AS (
  SELECT doc_id, u.j AS j, min(md5(CAST(u.j AS VARCHAR) || ':' || shingle)) AS h
  FROM sh, unnest(range(0, 16)) AS u(j) GROUP BY doc_id, u.j
),
bands AS (
  SELECT doc_id, j // 4 AS band_id, md5(string_agg(h, '|' ORDER BY j)) AS band_sig
  FROM mh GROUP BY doc_id, j // 4
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
            AND a.doc_id < b.doc_id
""",
        "dedup_simhash": f"""
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tok AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY doc_id, w),
h AS (SELECT doc_id, c, {roll_w} AS hv FROM tok),
bits AS (
  SELECT doc_id, u.k AS k,
    CASE WHEN sum(CASE WHEN (hv >> u.k) & 1 = 1 THEN c ELSE -c END) > 0
         THEN (CAST(1 AS BIGINT) << u.k) ELSE 0 END AS bv
  FROM h, unnest(range(0, 32)) AS u(k) GROUP BY doc_id, u.k
),
sig AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS s FROM bits GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= 3
""",
        "text_tokens": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) * 1000000)
         // len(string_split(text, ' ')) AS avg_token_len_ppm
FROM documents
""",
        "text_quality": """
WITH q AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '\\b(the|and|of|to|is|a)\\b')) AS BIGINT) AS stop_hits,
    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit_chars,
    CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, stop_hits, digit_chars,
       (stop_hits * 1000000) // n_tokens AS stop_ratio_ppm,
       (digit_chars * 1000000) // n_chars AS digit_ratio_ppm,
       (n_tokens >= 15 AND n_tokens <= 120 AND stop_hits * 20 >= n_tokens) AS is_quality
FROM q
""",
        "lang_id": """
WITH s AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\\b(the|and|of|to|is|a)\\b')) AS s_en,
    len(regexp_extract_all(text, '\\b(der|die|und|ist|das|nicht|ein)\\b')) AS s_de,
    len(regexp_extract_all(text, '\\b(le|les|et|est|une|dans|que)\\b')) AS s_fr,
    len(regexp_extract_all(text, '\\b(el|los|las|es|una|por|con)\\b')) AS s_es,
    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 1 ELSE 0 END AS cjk
  FROM documents
)
SELECT doc_id,
  CASE WHEN cjk = 1 THEN 'zh'
       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS pred_lang
FROM s
""",
        "fingerprint": f"""
SELECT doc_id, CAST({roll_text} AS BIGINT) AS fp62, md5(text) AS fp_md5
FROM documents
""",
        "ann_topk": _ANN_EXACT_SQL,
        "ann_lsh": _ANN_LSH_SQL,
        "ann_ivf": _ANN_IVF_SQL,
        "ann_recall": _ANN_RECALL_SQL,
        "events_window": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
""",
        "events_sessionize": """
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM s GROUP BY 1, 2
""",
        "events_asof_join": """
WITH c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
v AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, c.ts AS click_ts,
       coalesce(v.view_id, -1) AS view_id,
       coalesce(v.ts, TIMESTAMP '1970-01-01') AS view_ts
FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
""",
        "sentence_dedup": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[CAST(u.i AS INTEGER)] AS w
  FROM d, unnest(range(1, len(ws) + 1)) AS u(i)
),
c AS (
  SELECT doc_id, (i - 1) // 10 AS ci, string_agg(w, ' ' ORDER BY i) AS chunk
  FROM w GROUP BY doc_id, (i - 1) // 10
),
f AS (
  SELECT doc_id, ci, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) AS rk
  FROM c
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (rk = 1) AS BIGINT) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY ci) FILTER (rk = 1), '') AS text_clean
FROM f GROUP BY doc_id
""",
        "top_docs_per_source": """
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS rk
  FROM t
)
SELECT source, doc_id, n_tokens, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 3
""",
        "bigram_counts": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[CAST(u.i AS INTEGER)] AS w
  FROM d, unnest(range(1, len(ws) + 1)) AS u(i)
)
SELECT a.w || ' ' || b.w AS bigram, CAST(count(*) AS BIGINT) AS n
FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50
""",
        "approx_distinct_hll": """
WITH h AS (
  SELECT md5(text) AS hx,
         CAST(concat('0x', substr(md5(text), 1, 16)) AS UBIGINT) AS h64
  FROM documents
),
r AS (
  SELECT h64 // 288230376151711744 AS reg,
         h64 % 288230376151711744 AS rem
  FROM h
),
rr AS (
  SELECT reg,
         CASE WHEN rem = 0 THEN 59 ELSE 59 - length(bin(rem)) END AS rho
  FROM r
),
mx AS (SELECT reg, max(rho) AS rho FROM rr GROUP BY reg),
s AS (
  SELECT sum(1::HUGEINT << (59 - rho)) AS ssum, count(*) AS nregs FROM mx
),
e AS (
  SELECT CAST((SELECT count(DISTINCT hx) FROM h) AS BIGINT) AS exact_n,
         CAST(floor(
           CAST(0.709 AS DOUBLE) * 4096 * 576460752303423488
           / CAST(ssum + (64 - nregs) * (1::HUGEINT << 59) AS DOUBLE)
           + 0.5) AS BIGINT) AS est_n
  FROM s
)
SELECT exact_n, est_n,
       CAST(abs(est_n - exact_n) * 1000000 // exact_n AS BIGINT) AS err_ppm
FROM e
""",
        "embedding_dedup": _EMB_BANDED_SQL,
        "embedding_dedup_recall": _EMB_RECALL_SQL,
        "html_main_content": """
SELECT doc_id, text AS main_text FROM documents
""",
        "deterministic_split": f"""
WITH h AS (SELECT doc_id, CAST({roll_id} AS BIGINT) % 1000 AS slot FROM documents)
SELECT doc_id, slot AS split_slot,
       CASE WHEN slot < 800 THEN 'train'
            WHEN slot < 900 THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
        "quality_filter": """
WITH q AS (
  SELECT doc_id, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '\\b(the|and|of|to|is|a)\\b')) AS BIGINT) AS stop_hits,
    len(regexp_extract_all(text, '\\b(the|and|of|to|is|a)\\b')) AS s_en,
    len(regexp_extract_all(text, '\\b(der|die|und|ist|das|nicht|ein)\\b')) AS s_de,
    len(regexp_extract_all(text, '\\b(le|les|et|est|une|dans|que)\\b')) AS s_fr,
    len(regexp_extract_all(text, '\\b(el|los|las|es|una|por|con)\\b')) AS s_es,
    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 1 ELSE 0 END AS cjk
  FROM documents
),
l AS (
  SELECT doc_id, text, n_tokens, stop_hits,
    CASE WHEN cjk = 1 THEN 'zh'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS pred_lang
  FROM q
),
f AS (
  SELECT * FROM l
  WHERE n_tokens >= 15 AND n_tokens <= 120 AND stop_hits * 20 >= n_tokens
    AND pred_lang = 'en'
),
d AS (SELECT md5(text) AS h, min(doc_id) AS keep FROM f GROUP BY 1)
SELECT f.doc_id, f.n_tokens, f.pred_lang
FROM f JOIN d ON md5(f.text) = d.h AND f.doc_id = d.keep
""",
        "top_docs_by_tokens": """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
ORDER BY n_tokens DESC, doc_id
LIMIT 20
""",
        "distinct_sources": """
SELECT DISTINCT source FROM documents
""",
        "corpus_stats": """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars
FROM documents GROUP BY source
""",
        "ann_filtered": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
           FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS sc
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.qid AND e.label = q.ql
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rk
  FROM s
)
SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank, vec_id AS neighbor_id
FROM r WHERE rk <= 5
""",
        "minhash_estimate_audit": """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(ws[u.i:u.i+2], ' ') AS shingle
       FROM docs, unnest(range(1, len(ws) - 1)) AS u(i)),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
mh AS (SELECT doc_id, u.j AS j,
              min(md5(CAST(u.j AS VARCHAR) || ':' || shingle)) AS h
       FROM sh, unnest(range(0, 16)) AS u(j) GROUP BY doc_id, u.j),
bands AS (SELECT doc_id, j // 4 AS band_id,
                 md5(string_agg(h, '|' ORDER BY j)) AS band_sig
          FROM mh GROUP BY doc_id, j // 4),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id),
ag AS (SELECT c.doc_a, c.doc_b,
              CAST(count(*) FILTER (ma.h = mb.h) AS BIGINT) AS est
       FROM cand c
       JOIN mh ma ON ma.doc_id = c.doc_a
       JOIN mh mb ON mb.doc_id = c.doc_b AND mb.j = ma.j
       GROUP BY 1, 2),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle
                             AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT ag.doc_a, ag.doc_b,
       CAST(ag.est * 1000 // 16 AS BIGINT) AS est_permille,
       CAST(CASE WHEN sa.n + sb.n - coalesce(i.i, 0) > 0
                 THEN coalesce(i.i, 0) * 1000
                      // (sa.n + sb.n - coalesce(i.i, 0))
                 ELSE 1000 END AS BIGINT) AS true_permille,
       CAST(abs(ag.est * 1000 // 16
                - CASE WHEN sa.n + sb.n - coalesce(i.i, 0) > 0
                       THEN coalesce(i.i, 0) * 1000
                            // (sa.n + sb.n - coalesce(i.i, 0))
                       ELSE 1000 END) AS BIGINT) AS err_permille
FROM ag
JOIN sizes sa ON sa.doc_id = ag.doc_a
JOIN sizes sb ON sb.doc_id = ag.doc_b
LEFT JOIN inter i ON i.doc_a = ag.doc_a AND i.doc_b = ag.doc_b
""",
        "priority_share_by_month": """
WITH g AS (SELECT date_trunc('month', o_orderdate) AS month,
                  o_orderpriority AS priority,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1, 2)
SELECT CAST(month AS TIMESTAMP) AS month, priority, n_orders,
       CAST(n_orders * 1000000
            // CAST(SUM(n_orders) OVER (PARTITION BY month) AS BIGINT)
            AS BIGINT) AS share_ppm
FROM g
""",
        "unigram_surprisal": """
WITH w0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents),
w AS (SELECT * FROM w0 WHERE w <> ''),
df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM w GROUP BY 1),
occ AS (SELECT doc_id, w.w AS w, CAST(count(*) AS BIGINT) AS c
        FROM w GROUP BY 1, 2)
SELECT occ.doc_id,
       CAST(sum(occ.c) AS BIGINT) AS n_tokens,
       CAST(sum(occ.c * (1000000 // df.df)) AS BIGINT) AS surprisal
FROM occ JOIN df ON occ.w = df.w
GROUP BY occ.doc_id
""",
        "skew_report": """
WITH s AS (SELECT 'lang' AS col, lang AS val FROM documents
           UNION ALL
           SELECT 'source', source FROM documents),
g AS (SELECT col, val, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2),
r AS (SELECT col, val, n,
             CAST(count(*) OVER (PARTITION BY col) AS BIGINT) AS n_distinct,
             CAST(sum(n) OVER (PARTITION BY col) AS BIGINT) AS total,
             row_number() OVER (PARTITION BY col
                                ORDER BY n DESC, val ASC) AS rn
      FROM g)
SELECT col, n_distinct, total, val AS top_value, n AS top_n,
       CAST(n * 1000000 // total AS BIGINT) AS top_share_ppm
FROM r WHERE rn = 1
""",
        "kwic_extract": """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
hits AS (SELECT doc_id, ws, u.i AS pos
         FROM docs, unnest(range(1, len(ws) + 1)) AS u(i)
         WHERE ws[i] = 'window')
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(ws[greatest(pos - 2, 1):pos + 2], ' ') AS context
FROM hits
""",
        "source_dedup_rate": """
WITH h AS (SELECT source, md5(text) AS ch, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST((sum(n) - count(*)) * 1000 // sum(n) AS BIGINT) AS dup_permille
FROM h GROUP BY source
""",
        "daily_revenue_rolling7": """
WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
cal AS (SELECT CAST(unnest(generate_series(
                 (SELECT min(day) FROM d),
                 (SELECT max(day) FROM d),
                 INTERVAL 1 DAY)) AS DATE) AS day),
j AS (SELECT cal.day, CAST(coalesce(d.rev, 0) AS BIGINT) AS rev
      FROM cal LEFT JOIN d ON cal.day = d.day)
SELECT CAST(day AS TIMESTAMP) AS day, rev AS rev_cents,
       CAST(SUM(rev) OVER (ORDER BY day
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling7_cents
FROM j
""",
        "kmeans_assign": """
WITH dims AS (
  SELECT vec_id, u.i AS i,
         least(greatest(CAST(floor(CAST(embedding[i] AS DOUBLE) * 127 + 0.5)
                             AS BIGINT), -31), 31) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cids AS (SELECT vec_id AS cid FROM embeddings ORDER BY vec_id LIMIT 8),
cent AS (SELECT cids.cid, d.i, d.q AS cq
         FROM dims d JOIN cids ON d.vec_id = cids.cid),
dist AS (SELECT d.vec_id, c.cid,
                CAST(SUM((d.q - c.cq) * (d.q - c.cq)) AS BIGINT) AS d2
         FROM dims d JOIN cent c ON d.i = c.i GROUP BY 1, 2),
best AS (SELECT vec_id, cid, d2,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2 ASC, cid ASC) AS rn
         FROM dist)
SELECT CAST(cid AS BIGINT) AS centroid_id,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(sum(d2) AS BIGINT) AS sum_d2,
       CAST(min(d2) AS BIGINT) AS min_d2,
       CAST(max(d2) AS BIGINT) AS max_d2
FROM best WHERE rn = 1 GROUP BY cid
""",
        "contamination_check": """
WITH docs AS (SELECT doc_id, source, string_split(text, ' ') AS ws
              FROM documents),
sh AS (SELECT DISTINCT doc_id, source,
              array_to_string(ws[u.i:u.i+2], ' ') AS shingle
       FROM docs, unnest(range(1, len(ws) - 1)) AS u(i)),
bs AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
hits AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n
         FROM sh s JOIN bs USING (shingle)
         WHERE s.source <> 'src0' GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared,
       CAST(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
LEFT JOIN hits h ON d.doc_id = h.doc_id
""",
        "cross_source_dup_matrix": """
WITH d AS (SELECT DISTINCT
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS h,
             source
           FROM documents),
p AS (SELECT a.source AS source_a, b.source AS source_b
      FROM d a JOIN d b ON a.h = b.h AND a.source < b.source)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared_texts
FROM p GROUP BY 1, 2
""",
        "extract_media_refs": _SPANS_CTE
        + """
SELECT did AS doc_id, CAST(count(*) AS BIGINT) AS n_media,
       CAST(min(i) AS BIGINT) AS first_media_ord,
       CAST(max(i) AS BIGINT) AS last_media_ord
FROM spans WHERE kind = 'media' GROUP BY 1
""",
        "extract_offset_audit": _SPANS_CTE
        + """
SELECT did AS doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(SUM(length) AS BIGINT) AS sum_length,
       CAST(max("offset" + length) AS BIGINT) AS final_extent
FROM spans GROUP BY 1
""",
        "extract_page_density": _SPANS_CTE
        + """
SELECT page_number, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(SUM(length) AS BIGINT) AS sum_text_len
FROM spans GROUP BY 1
""",
        "extract_kind_transitions": _SPANS_CTE
        + """
, t AS (SELECT did, kind,
          lag(kind) OVER (PARTITION BY did ORDER BY i) AS prev
        FROM spans)
SELECT prev AS kind_from, kind AS kind_to,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM t WHERE prev IS NOT NULL GROUP BY 1, 2
""",
        "extract_media_position": _SPANS_CTE
        + """
, tot AS (SELECT did, count(*) AS n FROM spans GROUP BY did)
SELECT CAST((s.i * 10) // t.n AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_media
FROM spans s JOIN tot t USING (did)
WHERE s.kind = 'media' GROUP BY 1
""",
        "extract_kind_sets": _SPANS_CTE
        + """
, m AS (
  SELECT did,
         bit_or(CASE kind WHEN 'title' THEN 1 WHEN 'sectionHeading' THEN 2
                WHEN 'media' THEN 4 WHEN 'TableCell' THEN 8
                WHEN 'pageHeader' THEN 16 WHEN 'pageFooter' THEN 32
                ELSE 64 END) AS kind_mask
  FROM spans GROUP BY did
)
SELECT CAST(kind_mask AS BIGINT) AS kind_mask,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m GROUP BY 1
""",
        "seasonality_matrix": """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1, 2
""",
        "revenue_trend": """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mo,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1),
x AS (SELECT CAST(date_diff('month', (SELECT min(mo) FROM m), mo) AS HUGEINT)
               AS xi,
             CAST(rev AS HUGEINT) AS yi
      FROM m),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n, SUM(xi) AS sx, SUM(yi) AS sy,
             SUM(xi * xi) AS sxx, SUM(xi * yi) AS sxy,
             max(xi) AS xmax
      FROM x)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(sy * sxx - sx * sxy AS BIGINT) AS icept_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS denom,
       CAST(((n * sxy - sx * sy) * (xmax + 1) + (sy * sxx - sx * sxy))
            // (n * sxx - sx * sx) AS BIGINT) AS next_month_cents
FROM s
""",
        "order_reconciliation": """
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
              * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o_orderstatus, rev,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 100 AS total
  FROM li JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE abs(rev - total) * 100 <= total * 25)
            AS BIGINT) AS n_within_tol,
       CAST(count(*) FILTER (WHERE abs(rev - total) * 100 <= total * 25)
            * 1000000 // count(*) AS BIGINT) AS within_ppm
FROM j GROUP BY 1
""",
        "core_vocabulary": """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
c AS (SELECT word, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(*) AS BIGINT) AS total_n
      FROM w GROUP BY 1),
k AS (SELECT count(DISTINCT source) AS ns FROM documents)
SELECT word, n_sources, total_n FROM c, k WHERE n_sources = ns
""",
        "order_width_histogram": """
WITH o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
  CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(rev) AS BIGINT) AS sum_rev_cents
FROM o GROUP BY 1
""",
        "revenue_concentration": """
WITH s AS (SELECT o_custkey,
  CAST(SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY 1),
k AS (SELECT CAST(count(*) AS BIGINT) AS n,
  CAST((count(*) + 99) // 100 AS BIGINT) AS k,
  CAST(SUM(spend) AS BIGINT) AS total FROM s),
r AS (SELECT spend, row_number() OVER (ORDER BY spend DESC, o_custkey) AS rn
      FROM s),
t AS (SELECT CAST(SUM(r.spend) AS BIGINT) AS top_sum FROM r, k
      WHERE r.rn <= k.k)
SELECT k.n AS n_customers, k.k AS top_k, t.top_sum AS top_spend_cents,
       k.total AS total_spend_cents,
       CAST(CAST(t.top_sum AS HUGEINT) * 1000000 // k.total AS BIGINT)
         AS share_ppm
FROM k, t
""",
        "top_parts_by_quantity": """
WITH q AS (SELECT l_partkey,
  CAST(SUM(CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT) AS qty_x100,
  CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT)
    AS rev_cents
  FROM lineitem GROUP BY 1),
t AS (SELECT * FROM q ORDER BY qty_x100 DESC, l_partkey LIMIT 20)
SELECT CAST(t.l_partkey AS BIGINT) AS partkey, p.p_brand, p.p_type,
       t.qty_x100, t.rev_cents
FROM t JOIN part p ON p.p_partkey = t.l_partkey
""",
        "acctbal_band_profile": """
WITH c AS (SELECT c_mktsegment,
  (CAST(floor(c_acctbal*100+0.5) AS BIGINT) + 1000000) // 100000 - 10 AS band,
  CAST(floor(c_acctbal*100+0.5) AS BIGINT) AS bal FROM customer)
SELECT c_mktsegment, CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal) AS BIGINT) AS sum_bal_cents
FROM c GROUP BY 1, 2
""",
        "supplier_balance_leader": """
WITH s AS (SELECT s_nationkey,
             CAST(floor(s_acctbal*100+0.5) AS BIGINT) AS bal, s_suppkey
           FROM supplier),
m AS (SELECT s_nationkey, max(bal) AS best FROM s GROUP BY 1),
w AS (SELECT s.s_nationkey, m.best AS bal_cents,
             CAST(min(s.s_suppkey) AS BIGINT) AS suppkey
      FROM s JOIN m ON s.s_nationkey = m.s_nationkey AND s.bal = m.best
      GROUP BY 1, 2)
SELECT n.n_name, CAST(w.s_nationkey AS BIGINT) AS nationkey, w.suppkey,
       w.bal_cents
FROM w JOIN nation n ON n.n_nationkey = w.s_nationkey
""",
        "user_resurrections": """
WITH g AS (SELECT user_id, ts,
  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events),
u AS (SELECT user_id,
  CAST(count(*) FILTER (WHERE pts IS NOT NULL AND
        date_diff('microsecond', pts, ts) > 172800000000) AS BIGINT) AS nr
  FROM g GROUP BY 1)
SELECT nr AS n_resurrections, CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
""",
        "gap_hour_histogram": """
WITH g AS (SELECT event_type, ts,
  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events)
SELECT event_type,
       CAST(date_diff('microsecond', pts, ts) // 3600000000 AS BIGINT)
         AS gap_hours,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM g WHERE pts IS NOT NULL GROUP BY 1, 2
""",
        "value_autocorr_terms": """
WITH g AS (SELECT event_type,
  CAST(floor(value*100+0.5) AS BIGINT) AS y,
  lag(CAST(floor(value*100+0.5) AS BIGINT)) OVER
    (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS x
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(CAST(x AS HUGEINT) * y) AS BIGINT) AS sum_xy,
       CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sum_xx,
       CAST(SUM(CAST(y AS HUGEINT) * y) AS BIGINT) AS sum_yy
FROM g WHERE x IS NOT NULL GROUP BY 1
""",
        "word_length_histogram": """
SELECT CAST(length(word) AS BIGINT) AS wlen,
       CAST(count(*) AS BIGINT) AS n_words
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY 1
""",
        "allcaps_ratio": """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
a AS (SELECT source,
  CAST(count(*) FILTER (WHERE regexp_matches(word, '^[A-Z]{2,}$'))
       AS BIGINT) AS n_allcaps,
  CAST(count(*) AS BIGINT) AS n_tokens
  FROM w GROUP BY 1)
SELECT source, n_allcaps, n_tokens,
       CAST(n_allcaps * 1000000 // n_tokens AS BIGINT) AS allcaps_ppm
FROM a
""",
        "lexical_density": """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
a AS (SELECT source,
  CAST(count(*) FILTER (WHERE lower(word) IN
       ('the','and','of','to','is','a')) AS BIGINT) AS n_stopwords,
  CAST(count(*) AS BIGINT) AS n_tokens
  FROM w GROUP BY 1)
SELECT source, n_stopwords, n_tokens,
       CAST(n_stopwords * 1000000 // n_tokens AS BIGINT) AS stopword_ppm
FROM a
""",
        "vocab_growth": """
WITH b AS (SELECT max(doc_id) AS mx FROM documents),
f AS (SELECT word, min(doc_id) AS fd FROM
  (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1)
SELECT CAST(fd * 10 // (mx + 1) AS BIGINT) AS slice_idx,
       CAST(count(*) AS BIGINT) AS n_new_words
FROM f, b GROUP BY 1
""",
        "dominant_dim_histogram": """
SELECT CAST(list_position(embedding, list_max(embedding)) - 1 AS BIGINT)
         AS dim,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM embeddings GROUP BY 1
""",
        "dim_sign_profile": """
WITH s AS (SELECT unnest(embedding) AS v,
                  unnest(range(len(embedding))) AS i
           FROM embeddings)
SELECT CAST(i AS BIGINT) AS dim,
       CAST(count(*) FILTER (WHERE v < 0) AS BIGINT) AS n_neg,
       CAST(count(*) FILTER (WHERE v = 0) AS BIGINT) AS n_zero,
       CAST(count(*) FILTER (WHERE v > 0) AS BIGINT) AS n_pos
FROM s GROUP BY 1
""",
        "ship_delay_profile": """
WITH j AS (SELECT date_diff('day', o_orderdate, l_shipdate) AS delay_days,
  CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT CAST(delay_days AS BIGINT) AS delay_days,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(rev) AS BIGINT) AS rev_cents
FROM j GROUP BY 1
""",
        "regional_customer_value": """
WITH j AS (SELECT c.c_nationkey AS nk, c.c_mktsegment AS seg,
  CAST(floor(o.o_totalprice*100+0.5) AS BIGINT) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT r.r_name, j.seg AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(j.rev) AS BIGINT) AS rev_cents
FROM j JOIN nation n ON n.n_nationkey = j.nk
       JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1, 2
""",
        "tax_discount_matrix": """
WITH l AS (SELECT CAST(floor(l_discount*100+0.5) AS BIGINT) AS disc_pct,
  CAST(floor(l_tax*100+0.5) AS BIGINT) AS tax_pct,
  CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS base
  FROM lineitem)
SELECT disc_pct, tax_pct, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(base) AS BIGINT) AS base_cents,
       CAST(SUM(base * (100 - disc_pct)) AS BIGINT) AS disc_price_x10000
FROM l GROUP BY 1, 2
""",
        "supplier_part_coverage": """
WITH d AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts
      FROM d GROUP BY 1)
SELECT n_parts, CAST(count(*) AS BIGINT) AS n_suppliers
FROM c GROUP BY 1
""",
        "orders_per_weekday": """
SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders GROUP BY 1, 2
""",
        "char_class_profile": """
WITH c AS (SELECT source,
  CAST(length(text) AS BIGINT) AS t,
  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS d,
  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS u,
  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS l,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS s
  FROM documents)
SELECT source, CAST(SUM(d) AS BIGINT) AS n_digits,
       CAST(SUM(u) AS BIGINT) AS n_upper,
       CAST(SUM(l) AS BIGINT) AS n_lower,
       CAST(SUM(s) AS BIGINT) AS n_space,
       CAST(SUM(t - d - u - l - s) AS BIGINT) AS n_other,
       CAST(SUM(t) AS BIGINT) AS n_chars
FROM c GROUP BY 1
""",
        "customer_supplier_diversity": """
WITH d AS (SELECT DISTINCT o_custkey AS ck, s_nationkey AS nk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON s_suppkey = l_suppkey),
c AS (SELECT ck, CAST(count(*) AS BIGINT) AS n_nations FROM d GROUP BY 1)
SELECT n_nations, CAST(count(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1
""",
        "monthly_active_customers": """
WITH d AS (SELECT DISTINCT
  CAST(date_diff('month', TIMESTAMP '1970-01-01', o_orderdate) AS BIGINT)
    AS m,
  o_custkey FROM orders)
SELECT m AS epoch_month, CAST(count(*) AS BIGINT) AS n_active
FROM d GROUP BY 1
""",
        "part_name_token_revenue": """
WITH pr AS (SELECT l_partkey,
  CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1),
j AS (SELECT p.p_name, pr.rev FROM pr
      JOIN part p ON p.p_partkey = pr.l_partkey),
t AS (SELECT unnest(string_split(p_name, ' ')) AS token, rev FROM j)
SELECT token, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS rev_cents
FROM t GROUP BY 1
""",
        "rfm_segments": """
WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
c AS (SELECT o_custkey,
  date_diff('day', max(o_orderdate), (SELECT m FROM mx)) AS rec,
  CAST(count(*) AS BIGINT) AS f,
  CAST(SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY 1)
SELECT CAST(rec // 30 AS BIGINT) AS r_band,
       CAST(LEAST(f, 5) AS BIGINT) AS f_band,
       CAST(mon // 10000000 AS BIGINT) AS m_band,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(mon) AS BIGINT) AS mon_cents
FROM c GROUP BY 1, 2, 3
""",
        "event_type_affinity": """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
""",
        "basket_supplier_pairs": """
WITH d AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
p AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, count(*) AS c
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2)
SELECT CAST(c AS BIGINT) AS n_orders_together,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1
""",
        "price_discount_corr_terms": """
WITH j AS (SELECT p.p_type,
  CAST(floor(l_quantity*100+0.5) AS BIGINT) AS q,
  CAST(floor(l_discount*100+0.5) AS BIGINT) AS d
  FROM lineitem JOIN part p ON p.p_partkey = l_partkey)
SELECT p_type, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(SUM(d) AS BIGINT) AS sum_d,
       CAST(SUM(CAST(q AS HUGEINT) * d) AS BIGINT) AS sum_qd,
       CAST(SUM(CAST(q AS HUGEINT) * q) AS BIGINT) AS sum_qq,
       CAST(SUM(CAST(d AS HUGEINT) * d) AS BIGINT) AS sum_dd
FROM j GROUP BY 1
""",
        "order_gap_histogram": """
WITH g AS (SELECT o_custkey, o_orderdate,
  lag(o_orderdate) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS pd
  FROM orders)
SELECT CAST(date_diff('day', pd, o_orderdate) AS BIGINT) AS gap_days,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM g WHERE pd IS NOT NULL GROUP BY 1
""",
        "user_streaks": """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // CAST(86400000000 AS BIGINT) AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS isl
  FROM d
),
runs AS (SELECT user_id, count(*) AS len FROM r GROUP BY user_id, isl),
mx AS (SELECT user_id, max(len) AS streak_days FROM runs GROUP BY user_id)
SELECT CAST(streak_days AS BIGINT) AS streak_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM mx GROUP BY streak_days
""",
        "user_growth_curve": """
WITH f AS (
  SELECT user_id,
         min(epoch_us(ts) // CAST(86400000000 AS BIGINT)) AS day
  FROM events GROUP BY user_id
),
g AS (SELECT day, count(*) AS n FROM f GROUP BY day)
SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n_new_users,
       CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM g
""",
        "peak_concurrency": """
WITH b AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + 300000000 AS t, -1 AS d FROM events
),
rs AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS c
  FROM b
)
SELECT event_type, CAST(max(c) AS BIGINT) AS peak_concurrent
FROM rs GROUP BY event_type
""",
        "quantity_mode": """
WITH c AS (
  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty,
         count(*) AS n
  FROM lineitem GROUP BY ALL
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                               ORDER BY n DESC, qty ASC) AS rn
  FROM c
)
SELECT l_returnflag, l_linestatus, qty AS mode_qty, CAST(n AS BIGINT) AS n_items
FROM r WHERE rn = 1
""",
        "nation_rank_change": """
WITH rev AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS month,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
rk AS (
  SELECT month, n_name, r,
         ROW_NUMBER() OVER (PARTITION BY month
                            ORDER BY r DESC, n_name ASC) AS rnk
  FROM rev
)
SELECT month, n_name, CAST(rnk AS BIGINT) AS rnk,
       CAST(COALESCE(lag(rnk) OVER (PARTITION BY n_name ORDER BY month), 0)
            AS BIGINT) AS prev_rank
FROM rk
""",
        "readability_terms": """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
         AS n_sentence_marks,
       CAST(SUM(len(regexp_extract_all(text, '[aeiouAEIOU]+'))) AS BIGINT)
         AS n_vowel_groups
FROM documents GROUP BY source
""",
        "repeated_substring_topk": """
WITH s AS (
  SELECT substr(text, CAST(u.i AS INT), 16) AS s16
  FROM documents, unnest(range(1, length(text) - 14)) AS u(i)
),
c AS (SELECT s16, count(*) AS n FROM s GROUP BY s16 HAVING count(*) > 1)
SELECT s16, CAST(n AS BIGINT) AS n_occurrences
FROM c ORDER BY n DESC, s16 ASC LIMIT 20
""",
        "embedding_covariance_terms": """
WITH qe AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1048576) AS BIGINT) AS q0,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 1048576) AS BIGINT) AS q1,
         CAST(floor(CAST(embedding[3] AS DOUBLE) * 1048576) AS BIGINT) AS q2,
         CAST(floor(CAST(embedding[4] AS DOUBLE) * 1048576) AS BIGINT) AS q3
  FROM embeddings
),
pairs AS (
  SELECT 0 AS i, 0 AS j, SUM(q0) AS si, SUM(q0) AS sj, SUM(q0*q0) AS sij, count(*) AS n FROM qe
  UNION ALL SELECT 0, 1, SUM(q0), SUM(q1), SUM(q0*q1), count(*) FROM qe
  UNION ALL SELECT 0, 2, SUM(q0), SUM(q2), SUM(q0*q2), count(*) FROM qe
  UNION ALL SELECT 0, 3, SUM(q0), SUM(q3), SUM(q0*q3), count(*) FROM qe
  UNION ALL SELECT 1, 1, SUM(q1), SUM(q1), SUM(q1*q1), count(*) FROM qe
  UNION ALL SELECT 1, 2, SUM(q1), SUM(q2), SUM(q1*q2), count(*) FROM qe
  UNION ALL SELECT 1, 3, SUM(q1), SUM(q3), SUM(q1*q3), count(*) FROM qe
  UNION ALL SELECT 2, 2, SUM(q2), SUM(q2), SUM(q2*q2), count(*) FROM qe
  UNION ALL SELECT 2, 3, SUM(q2), SUM(q3), SUM(q2*q3), count(*) FROM qe
  UNION ALL SELECT 3, 3, SUM(q3), SUM(q3), SUM(q3*q3), count(*) FROM qe
)
SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
       CAST(n AS BIGINT) AS n_vecs, CAST(si AS BIGINT) AS sum_qi,
       CAST(sj AS BIGINT) AS sum_qj, CAST(sij AS BIGINT) AS sum_qiqj
FROM pairs
""",
        "benford_profile": """
SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
            1, 1) AS BIGINT) AS leading_digit,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
""",
        "extract_section_histogram": _SPANS_CTE
        + """
, s AS (
  SELECT did,
         count(*) FILTER (WHERE kind IN ('title', 'sectionHeading')) AS ns
  FROM spans GROUP BY did
)
SELECT CAST(ns AS BIGINT) AS n_sections, CAST(count(*) AS BIGINT) AS n_docs
FROM s GROUP BY ns
""",
        "extract_text_run_histogram": _SPANS_CTE
        + """
, t AS (
  SELECT did, i,
         i - ROW_NUMBER() OVER (PARTITION BY did ORDER BY i) AS grp
  FROM spans WHERE kind <> 'media'
),
runs AS (SELECT count(*) AS run_len FROM t GROUP BY did, grp)
SELECT CAST(run_len AS BIGINT) AS run_len,
       CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1
""",
        "extract_section_sizes": _SPANS_CTE
        + """
, sec AS (
  SELECT did, i,
         SUM(CASE WHEN kind IN ('title', 'sectionHeading') THEN 1 ELSE 0 END)
           OVER (PARTITION BY did ORDER BY i) AS sec_id
  FROM spans
),
sizes AS (SELECT count(*) AS section_len FROM sec GROUP BY did, sec_id)
SELECT CAST(section_len AS BIGINT) AS section_len,
       CAST(count(*) AS BIGINT) AS n_sections
FROM sizes GROUP BY 1
""",
        "extract_caption_length_profile": _SPANS_CTE
        + """
, nx AS (
  SELECT did, kind,
         lead(length) OVER (PARTITION BY did ORDER BY i) AS next_len
  FROM spans
)
SELECT CAST(next_len // 8 AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_media
FROM nx WHERE kind = 'media' AND next_len IS NOT NULL GROUP BY 1
""",
        "extract_boilerplate_texts": _SPANS_CTE
        + """
, hf AS (
  SELECT DISTINCT did, text FROM spans
  WHERE kind IN ('pageHeader', 'pageFooter') AND text <> ''
),
c AS (SELECT text, count(*) AS n_docs FROM hf GROUP BY text)
SELECT text, CAST(n_docs AS BIGINT) AS n_docs FROM c WHERE n_docs >= 2
""",
        "extract_main_content_ratio": _SPANS_CTE
        + """
, r AS (
  SELECT did,
         SUM(CASE WHEN kind = 'Text' THEN length ELSE 0 END) AS tl,
         SUM(length) AS tot
  FROM spans GROUP BY did
)
SELECT CAST((tl * 1000000 // tot) // 50000 AS BIGINT) AS ratio_band,
       CAST(count(*) AS BIGINT) AS n_docs
FROM r WHERE tot > 0 GROUP BY 1
""",
        "supplier_attr_counts": """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey % 7 <> 0
GROUP BY 1, 2, 3
""",
        "promo_part_suppliers": """
WITH tp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
sq AS (
  SELECT l_suppkey, SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty
  FROM lineitem JOIN tp ON l_partkey = p_partkey GROUP BY 1
),
tot AS (SELECT SUM(qty) AS t, count(*) AS n FROM sq)
SELECT s.s_name, CAST(sq.qty AS BIGINT) AS qty_sum
FROM sq, tot, supplier s
WHERE sq.l_suppkey = s.s_suppkey AND 2 * sq.qty * tot.n > tot.t
""",
        "shipmode_priority_matrix": """
WITH li AS (
  SELECT l_orderkey, CAST(l_linenumber % 3 AS BIGINT) AS mode,
         CAST(l_shipdate AS DATE) AS sd
  FROM lineitem
)
SELECT CASE mode WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'RAIL' ELSE 'TRUCK' END
         AS ship_mode,
       CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (WHERE o_orderpriority NOT IN
         ('1-URGENT', '2-HIGH')) AS BIGINT) AS low_line_count
FROM li JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE), sd) > 45
GROUP BY mode
""",
        "part_value_share": """
WITH v AS (
  SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
           AS value_cents
  FROM lineitem GROUP BY 1
),
t AS (SELECT SUM(value_cents) AS tot, count(*) AS n FROM v)
SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents
FROM v, t WHERE 2 * value_cents * n > 3 * tot
""",
        "keyword_spotting": """
WITH kw AS (
  SELECT unnest(['batch', 'data', 'hash', 'join', 'merge', 'query',
                 'scan', 'stream', 'vector', 'window']) AS keyword
),
hits AS (
  SELECT kw.keyword,
         len(regexp_extract_all(d.text, '\\b' || kw.keyword || '\\b')) AS c
  FROM kw CROSS JOIN documents d
)
SELECT keyword,
       CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_docs_matched,
       CAST(SUM(c) AS BIGINT) AS n_occurrences
FROM hits GROUP BY keyword
""",
        "order_value_band_transition": """
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 10000000 AS band,
         lag(CAST(round(o_totalprice * 100) AS BIGINT) // 10000000)
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
)
SELECT CAST(prev AS BIGINT) AS band_from, CAST(band AS BIGINT) AS band_to,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
""",
        "source_sentence_dup_rate": """
WITH s AS (
  SELECT source, trim(u.s) AS sent
  FROM documents, unnest(string_split_regex(text, '[.!?]+')) AS u(s)
),
c AS (SELECT source, sent, count(*) AS n FROM s WHERE sent <> ''
      GROUP BY 1, 2)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_sentences,
       CAST(COALESCE(SUM(n) FILTER (WHERE n > 1), 0) AS BIGINT)
         AS n_dup_occurrences
FROM c GROUP BY source
""",
        "purchase_click_window": """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS t
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS t
  FROM events WHERE event_type = 'click'
),
j AS (
  SELECT p.event_id, count(c.t) AS k
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id AND c.t >= p.t - 86400 AND c.t < p.t
  GROUP BY p.event_id
)
SELECT CAST(k AS BIGINT) AS n_preceding_clicks,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM j GROUP BY k
""",
        "linenumber_density_audit": """
WITH o AS (
  SELECT l_orderkey, count(*) AS n,
         CAST(max(l_linenumber) AS BIGINT) AS mx,
         CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS s
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(n AS BIGINT) AS n_lines, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE n = mx AND 2 * s = mx * (mx + 1))
            AS BIGINT) AS n_dense
FROM o GROUP BY n
""",
        "value_ascent_streaks": """
WITH e AS (
  SELECT user_id,
         ROW_NUMBER() OVER w AS rn,
         CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY rn
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM e
),
runs AS (SELECT user_id, count(*) AS len FROM r GROUP BY user_id, run_id),
mx AS (SELECT user_id, max(len) AS streak_len FROM runs GROUP BY user_id)
SELECT CAST(streak_len AS BIGINT) AS streak_len,
       CAST(count(*) AS BIGINT) AS n_users
FROM mx GROUP BY 1
""",
        "supplier_margin_per_nation": """
WITH r AS (
  SELECT s_nationkey, s_suppkey,
         CAST(round(s_acctbal * 100) AS BIGINT) AS bal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY round(s_acctbal * 100) DESC,
                                     s_suppkey ASC) AS rn
  FROM supplier
)
SELECT CAST(a.s_nationkey AS BIGINT) AS s_nationkey,
       CAST(a.s_suppkey AS BIGINT) AS top_suppkey,
       CAST(a.bal AS BIGINT) AS top_cents,
       CAST(COALESCE(b.s_suppkey, -1) AS BIGINT) AS runner_suppkey,
       CAST(COALESCE(b.bal, 0) AS BIGINT) AS runner_cents,
       CAST(a.bal - COALESCE(b.bal, 0) AS BIGINT) AS margin_cents
FROM r a LEFT JOIN r b ON a.s_nationkey = b.s_nationkey AND b.rn = 2
WHERE a.rn = 1
""",
        "region_trade_imbalance": """
WITH f AS (
  SELECT cn.n_regionkey AS cust_region, sn.n_regionkey AS supp_region,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)) // 100)
              AS BIGINT) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
),
regs AS (
  SELECT cust_region AS rk FROM f UNION SELECT supp_region FROM f
),
pairs AS (
  SELECT a.rk AS region_a, b.rk AS region_b
  FROM regs a JOIN regs b ON a.rk <= b.rk
)
SELECT CAST(region_a AS BIGINT) AS region_a,
       CAST(region_b AS BIGINT) AS region_b,
       CAST(COALESCE(fab.rev, 0) AS BIGINT) AS flow_ab_cents,
       CAST(COALESCE(fba.rev, 0) AS BIGINT) AS flow_ba_cents,
       CAST(COALESCE(fab.rev, 0) - COALESCE(fba.rev, 0) AS BIGINT)
         AS net_cents
FROM pairs
LEFT JOIN f fab ON fab.cust_region = region_a AND fab.supp_region = region_b
LEFT JOIN f fba ON fba.cust_region = region_b AND fba.supp_region = region_a
""",
        "repeat_revenue_share": """
WITH r AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS month,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rev,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS repeat_orders,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST(COALESCE(SUM(rev) FILTER (WHERE rn > 1), 0) AS BIGINT)
         AS repeat_revenue_cents
FROM r GROUP BY month
""",
        "props_value_corr_terms": """
WITH e AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) AS k,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k, CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(k * v) AS BIGINT) AS sum_kv,
       CAST(SUM(k * k) AS BIGINT) AS sum_kk,
       CAST(SUM(v * v) AS BIGINT) AS sum_vv
FROM e WHERE k IS NOT NULL GROUP BY event_type
""",
        "extract_kind_divergence": _SPANS_CTE
        + """
, c AS (
  SELECT regexp_replace(did, '\\..*$', '') AS source, kind,
         CAST(count(*) AS BIGINT) AS n
  FROM spans GROUP BY 1, 2
),
s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns FROM c GROUP BY source),
k AS (SELECT kind, CAST(SUM(n) AS BIGINT) AS nk FROM c GROUP BY kind),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM c),
cell AS (
  SELECT s.source, k.kind, COALESCE(c.n, 0) AS n, s.ns, k.nk, tot.grand
  FROM s CROSS JOIN k CROSS JOIN tot
  LEFT JOIN c ON c.source = s.source AND c.kind = k.kind
)
SELECT source, CAST(ANY_VALUE(ns) AS BIGINT) AS n_spans,
       CAST(SUM(ABS(n * grand - ns * nk)) AS BIGINT) AS l1_divergence
FROM cell GROUP BY source
""",
        "snapshot_diff": """
WITH v1 AS (SELECT doc_id AS k, text FROM documents WHERE doc_id % 10 < 6),
v2 AS (
  SELECT doc_id AS k,
         CASE WHEN doc_id % 10 = 5 THEN upper(text) ELSE text END AS text
  FROM documents WHERE doc_id % 10 >= 4
),
j AS (
  SELECT v1.text AS t1, v2.text AS t2
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n_docs FROM (
  SELECT CASE WHEN t1 IS NULL THEN 'added'
              WHEN t2 IS NULL THEN 'removed'
              WHEN t1 <> t2 THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM j) GROUP BY 1
""",
        "customer_trend_signs": """
WITH s AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(datediff('day', DATE '1970-01-01', o_orderdate))
              AS BIGINT) AS sx,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(SUM(CAST(datediff('day', DATE '1970-01-01', o_orderdate)
                       AS BIGINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sxy
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment, CAST(sign(n * sxy - sx * sy) AS BIGINT) AS trend,
       CAST(count(*) AS BIGINT) AS n_customers
FROM s JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
""",
        "sentence_length_histogram": """
WITH s AS (
  SELECT trim(u.s) AS sent
  FROM documents, unnest(string_split_regex(text, '[.!?]+')) AS u(s)
),
k AS (SELECT len(string_split(sent, ' ')) AS n_words
      FROM s WHERE sent <> '')
SELECT CAST(n_words AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_sentences
FROM k GROUP BY 1
""",
        "daily_mix_divergence": """
WITH c AS (
  SELECT epoch_us(ts) // CAST(86400000000 AS BIGINT) AS day, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
d AS (SELECT day, CAST(SUM(n) AS BIGINT) AS nd FROM c GROUP BY day),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt
      FROM c GROUP BY event_type),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM c),
cell AS (
  SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n, d.nd, t.nt, tot.grand
  FROM d CROSS JOIN t CROSS JOIN tot
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(ANY_VALUE(nd) AS BIGINT) AS n_events,
       CAST(SUM(ABS(n * grand - nd * nt)) AS BIGINT) AS l1_divergence
FROM cell GROUP BY day
""",
        "part_region_division": """
WITH prs AS (
  SELECT DISTINCT l_partkey AS pk, n_regionkey AS rk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
),
c AS (SELECT pk, count(*) AS nr FROM prs GROUP BY pk)
SELECT CAST(nr AS BIGINT) AS n_regions, CAST(count(*) AS BIGINT) AS n_parts
FROM c GROUP BY nr
""",
        "orphan_audit": """
SELECT 'orders_without_lineitems' AS side,
       CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
         AS n_keys,
       CAST((SELECT count(*) FROM (
          SELECT DISTINCT o_orderkey FROM orders
          WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)))
         AS BIGINT) AS n_orphans
UNION ALL
SELECT 'lineitems_without_orders',
       CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM (
          SELECT DISTINCT l_orderkey FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)))
         AS BIGINT)
""",
        "dominant_bigram_per_source": """
WITH docs AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT source,
         ws[CAST(u.i AS INT)] || ' ' || ws[CAST(u.i + 1 AS INT)] AS bigram
  FROM docs, unnest(range(1, len(ws))) AS u(i)
),
c AS (SELECT source, bigram, count(*) AS n FROM b GROUP BY 1, 2),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY n DESC, bigram ASC) AS rn
  FROM c
)
SELECT source, bigram AS top_bigram, CAST(n AS BIGINT) AS n_occurrences
FROM r WHERE rn = 1
""",
        "discount_curve": """
SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)) // 100)
            AS BIGINT) AS revenue_cents
FROM lineitem GROUP BY 1
""",
        "char_class_transitions": """
WITH p AS (
  SELECT source, substr(text, CAST(u.i AS INT), 2) AS pr
  FROM documents, unnest(range(1, length(text))) AS u(i)
),
c AS (
  SELECT source,
    CASE WHEN pr[1:1] BETWEEN '0' AND '9' THEN 0
         WHEN pr[1:1] BETWEEN 'A' AND 'Z' THEN 1
         WHEN pr[1:1] BETWEEN 'a' AND 'z' THEN 2
         WHEN pr[1:1] = ' ' THEN 3 ELSE 4 END AS class_from,
    CASE WHEN pr[2:2] BETWEEN '0' AND '9' THEN 0
         WHEN pr[2:2] BETWEEN 'A' AND 'Z' THEN 1
         WHEN pr[2:2] BETWEEN 'a' AND 'z' THEN 2
         WHEN pr[2:2] = ' ' THEN 3 ELSE 4 END AS class_to
  FROM p
)
SELECT source, CAST(class_from AS BIGINT) AS class_from,
       CAST(class_to AS BIGINT) AS class_to,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM c GROUP BY 1, 2, 3
""",
        "price_qty_heatmap": """
SELECT CAST(l_quantity AS BIGINT) AS l_quantity,
       CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 500000 AS BIGINT)
         AS price_band,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY 1, 2
""",
        "extract_ref_integrity": _SPANS_CTE
        + """
SELECT regexp_replace(did, '\\..*$', '') AS source,
       CAST(count(*) AS BIGINT) AS n_media_refs,
       CAST(count(*) FILTER (
         WHERE media_ref = 'media://' || did || '/' || CAST(i AS VARCHAR))
         AS BIGINT) AS n_consistent
FROM spans WHERE kind = 'media' GROUP BY 1
""",
        "extract_length_quartiles": _SPANS_CTE
        + """
, h AS (SELECT kind, length, count(*) AS c FROM spans GROUP BY 1, 2),
tot AS (SELECT kind, SUM(c) AS n FROM h GROUP BY kind),
cum AS (SELECT kind, length,
               SUM(c) OVER (PARTITION BY kind ORDER BY length) AS cc
        FROM h)
SELECT cum.kind, CAST(tot.n AS BIGINT) AS n_spans,
       CAST(MIN(length) FILTER (WHERE cc >= (tot.n + 3) // 4) AS BIGINT)
         AS q1_len,
       CAST(MIN(length) FILTER (WHERE cc >= (tot.n + 1) // 2) AS BIGINT)
         AS median_len,
       CAST(MIN(length) FILTER (WHERE cc >= (3 * tot.n + 3) // 4) AS BIGINT)
         AS q3_len
FROM cum JOIN tot ON cum.kind = tot.kind
GROUP BY cum.kind, tot.n
""",
        "acctbal_gini_terms": """
WITH r AS (
  SELECT c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY round(c_acctbal * 100)) AS i,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_customers,
       CAST(SUM(bal) AS BIGINT) AS sum_cents,
       CAST(SUM((2 * i - n - 1) * bal) AS BIGINT) AS gini_numerator
FROM r GROUP BY c_nationkey
""",
        "name_key_audit": """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) FILTER (
         WHERE TRY_CAST(regexp_extract(c_name, '#([0-9]+)$', 1) AS BIGINT)
               = c_custkey) AS BIGINT) AS n_consistent
FROM customer GROUP BY c_mktsegment
""",
        "status_consistency_matrix": """
SELECT o_orderstatus, l_linestatus, CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
""",
        "burstiness_terms": """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts, event_id)) // CAST(60000000 AS BIGINT) AS gap
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_min,
       CAST(SUM(gap * gap) AS BIGINT) AS sum_gap2_min
FROM g WHERE gap IS NOT NULL GROUP BY event_type
""",
        "price_ending_histogram": """
SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS BIGINT)
         AS cents_ending,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
""",
        "shingle_containment": _NGRAM_CTE
        + """
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb
FROM p
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 10 * inter >= 9 * LEAST(sa.n, sb.n)
""",
        "gap_hour_quantiles": """
WITH g AS (SELECT event_type,
  date_diff('microsecond',
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
            ts) // 3600000000 AS gh
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gh, 0.25) AS BIGINT) AS p25_hours,
       CAST(quantile_disc(gh, 0.50) AS BIGINT) AS p50_hours,
       CAST(quantile_disc(gh, 0.75) AS BIGINT) AS p75_hours
FROM g WHERE gh IS NOT NULL GROUP BY 1
""",
        "nation_part_type_matrix": """
WITH j AS (SELECT s.s_nationkey AS nk, p.p_type,
  CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS rev
  FROM lineitem
  JOIN part p ON p.p_partkey = l_partkey
  JOIN supplier s ON s.s_suppkey = l_suppkey)
SELECT n.n_name, j.p_type, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(j.rev) AS BIGINT) AS rev_cents
FROM j JOIN nation n ON n.n_nationkey = j.nk
GROUP BY 1, 2
""",
        "revenue_pareto_curve": """
WITH s AS (SELECT o_custkey,
  CAST(SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY 1),
k AS (SELECT count(*) AS n, CAST(SUM(spend) AS BIGINT) AS total FROM s),
r AS (SELECT spend,
  (row_number() OVER (ORDER BY spend, o_custkey) - 1) AS rn FROM s)
SELECT CAST(rn * 10 // k.n AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(spend) AS BIGINT) AS spend_cents,
       CAST(CAST(SUM(spend) AS HUGEINT) * 1000000 // k.total AS BIGINT)
         AS share_ppm
FROM r, k GROUP BY 1, k.n, k.total
""",
        "part_size_price_profile": """
WITH p AS (SELECT p_size,
  CAST(floor(p_retailprice*100+0.5) AS BIGINT) AS price FROM part)
SELECT CAST(p_size AS BIGINT) AS p_size,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(price) AS BIGINT) AS sum_price_cents,
       CAST(min(price) AS BIGINT) AS min_price_cents,
       CAST(max(price) AS BIGINT) AS max_price_cents
FROM p GROUP BY 1
""",
        "rag_chunk": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
ch AS (SELECT doc_id,
              CAST(u.c - 1 AS BIGINT) AS chunk_id,
              CAST((u.c - 1) * 24 AS BIGINT) AS start_word,
              CAST(least(32, len(ws) - (u.c - 1) * 24) AS BIGINT) AS n_words,
              CAST(len(array_to_string(
                     ws[(u.c - 1) * 24 + 1 :
                        (u.c - 1) * 24
                        + least(32, len(ws) - (u.c - 1) * 24)],
                     ' ')) AS BIGINT) AS n_chars
       FROM d, unnest(range(1, (len(ws) + 23) // 24 + 1)) AS u(c))
SELECT doc_id, chunk_id, start_word, n_words, n_chars FROM ch
""",
        "word_dominance_filter": """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2),
m AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS top_count,
             CAST(sum(n) AS BIGINT) AS n_words
      FROM c GROUP BY 1)
SELECT doc_id, n_words, top_count,
       CAST(top_count * 1000000 // n_words AS BIGINT) AS dominance_ppm,
       CAST(CASE WHEN top_count * 100 > n_words * 10 THEN 1 ELSE 0 END
            AS BIGINT) AS flagged
FROM m
""",
        "time_weighted_value": """
WITH o AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dwell
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_weighted,
       CAST(SUM(dwell) AS BIGINT) AS sum_dwell_us,
       CAST(SUM(CAST(cents AS HUGEINT) * dwell)
            // SUM(CAST(dwell AS HUGEINT)) AS BIGINT) AS twavg_cents
FROM o WHERE dwell IS NOT NULL GROUP BY 1
""",
        "weighted_median_price": """
WITH base AS (SELECT l_returnflag AS rf,
                     CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS price,
                     CAST(floor(l_quantity+0.5) AS BIGINT) AS w
              FROM lineitem),
agg AS (SELECT rf, price, CAST(SUM(w) AS BIGINT) AS w FROM base GROUP BY 1, 2),
c AS (SELECT rf, price,
             SUM(w) OVER (PARTITION BY rf ORDER BY price) AS cw,
             SUM(w) OVER (PARTITION BY rf) AS tw
      FROM agg)
SELECT rf AS l_returnflag,
       CAST(min(tw) AS BIGINT) AS total_weight,
       CAST(min(price) FILTER (WHERE cw >= (tw + 1) // 2) AS BIGINT)
         AS wmedian_cents
FROM c GROUP BY rf
""",
        "cube_revenue": """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)))
            AS BIGINT) AS revenue_x10000
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY CUBE (o_orderpriority, l_returnflag)
""",
        "segment_recency": """
WITH l AS (
  SELECT o_custkey, max(o_orderdate) AS last_d FROM orders GROUP BY 1),
j AS (SELECT c_mktsegment, epoch_us(last_d) AS lu
      FROM l JOIN customer ON o_custkey = c_custkey),
gm AS (SELECT max(lu) AS g FROM j)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST((g - max(lu)) // 86400000000 AS BIGINT) AS min_days,
       CAST((CAST(count(*) AS HUGEINT) * g - sum(CAST(lu AS HUGEINT)))
            // (CAST(count(*) AS HUGEINT) * 86400000000) AS BIGINT)
         AS avg_days,
       CAST((g - min(lu)) // 86400000000 AS BIGINT) AS max_days
FROM j, gm GROUP BY c_mktsegment, g
""",
        "user_activity_quartiles": """
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS ne,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS np
  FROM events GROUP BY 1),
t AS (SELECT ne, np, ntile(4) OVER (ORDER BY ne, user_id) AS quartile
      FROM pu)
SELECT CAST(quartile AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(ne) AS BIGINT) AS n_events,
       CAST(sum(np) AS BIGINT) AS n_purchases,
       CAST(sum(np) * 1000000 // sum(ne) AS BIGINT) AS purchase_ppm
FROM t GROUP BY 1
""",
        "pair_cosine_profile": """
WITH q AS (
  SELECT vec_id, u.i AS i,
         least(greatest(CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 127 + 0.5)
                             AS BIGINT), -31), 31) AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
p AS (
  SELECT a.vec_id // 2 AS pid,
         CAST(SUM(a.qv * b.qv) AS BIGINT) AS dot,
         CAST(SUM(a.qv * a.qv) AS BIGINT) AS n2a,
         CAST(SUM(b.qv * b.qv) AS BIGINT) AS n2b
  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
  WHERE a.vec_id % 2 = 0
  GROUP BY 1),
v AS (
  SELECT (CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1 ELSE 0 END)
         * (CASE WHEN n2a * n2b > 0
                 THEN (100 * dot * dot) // (n2a * n2b) ELSE 0 END) AS bucket
  FROM p)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_pairs
FROM v GROUP BY 1
""",
        "nation_share_in_region": """
WITH nr AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
              * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT)
           AS revenue_x10000
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2)
SELECT r_name, n_name, revenue_x10000,
       CAST(CAST(revenue_x10000 AS HUGEINT) * 1000000
            // SUM(CAST(revenue_x10000 AS HUGEINT))
               OVER (PARTITION BY r_name) AS BIGINT) AS share_ppm
FROM nr
""",
        "supplier_hhi": """
WITH s AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
              * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY 1),
j AS (SELECT n_name, rev,
             CAST(CAST(rev AS HUGEINT) * 1000000
                  // SUM(CAST(rev AS HUGEINT)) OVER (PARTITION BY n_name)
                  AS BIGINT) AS share
      FROM s
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev) AS BIGINT) AS revenue_x10000,
       CAST(SUM(CAST(share AS HUGEINT) * share) // 1000000 AS BIGINT)
         AS hhi_ppm
FROM j GROUP BY 1
""",
        "anomalous_days": """
WITH d AS (
  SELECT epoch_us(ts) // CAST(86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
dense AS (
  SELECT u.day AS day, COALESCE(d.n, 0) AS n
  FROM (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds) u
  LEFT JOIN d ON u.day = d.day),
r AS (
  SELECT day, n,
         SUM(n) OVER (ORDER BY day
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail,
         row_number() OVER (ORDER BY day) AS rn
  FROM dense)
SELECT make_timestamp(day * CAST(86400000000 AS BIGINT)) AS day,
       CAST(n AS BIGINT) AS n_events,
       CAST(trail AS BIGINT) AS trailing_sum,
       CAST(CASE WHEN n * 7 > 2 * trail THEN 1 ELSE 0 END AS BIGINT)
         AS is_anomaly
FROM r WHERE rn > 7
""",
        "label_centroid_similarity": """
WITH q AS (
  SELECT CAST(label AS BIGINT) AS label, u.i AS i,
         least(greatest(CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 127 + 0.5)
                             AS BIGINT), -31), 31) AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
s AS (SELECT label, i, CAST(SUM(qv) AS BIGINT) AS sv FROM q GROUP BY 1, 2),
p AS (SELECT a.label AS label_a, b.label AS label_b,
             SUM(CAST(a.sv AS HUGEINT) * b.sv) AS dot,
             SUM(CAST(a.sv AS HUGEINT) * a.sv) AS n2a,
             SUM(CAST(b.sv AS HUGEINT) * b.sv) AS n2b
      FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
      GROUP BY 1, 2)
SELECT label_a, label_b,
       CAST(CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS dot_sign,
       CAST(CASE WHEN n2a = 0 OR n2b = 0 THEN 0
                 ELSE (CAST(1000000000 AS HUGEINT) * dot * dot)
                      // (n2a * n2b) END AS BIGINT) AS cos2_ppb
FROM p
""",
        "bigram_novelty": """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pairs AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[u.i:u.i+1], ' ') AS bigram
  FROM docs, unnest(range(1, len(ws))) AS u(i)),
first AS (SELECT bigram, min(doc_id) AS first_doc FROM pairs GROUP BY 1)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(*) FILTER (WHERE p.doc_id = f.first_doc) AS BIGINT)
         AS n_novel,
       CAST(count(*) FILTER (WHERE p.doc_id = f.first_doc) * 1000000
            // count(*) AS BIGINT) AS novelty_ppm
FROM pairs p JOIN first f USING (bigram)
GROUP BY 1
""",
        "source_mixture_weights": """
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS k FROM c)
SELECT source, n_docs,
       CAST(n_docs * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(t.total * 1000000 // (t.k * n_docs) AS BIGINT) AS weight_ppm
FROM c, t
""",
        "late_event_stats": """
WITH o AS (
  SELECT event_type, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE prev_max IS NOT NULL AND ts < prev_max)
            AS BIGINT) AS n_late,
       CAST(count(*) FILTER (WHERE prev_max IS NOT NULL AND ts < prev_max)
            * 1000000 // count(*) AS BIGINT) AS late_ppm
FROM o GROUP BY 1
""",
        "event_dedup_hourly": """
WITH cells AS (
  SELECT DISTINCT
         user_id * CAST(1048576 AS BIGINT)
           + (epoch_us(ts) // CAST(3600000000 AS BIGINT))
             % CAST(1048576 AS BIGINT) AS cell,
         event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((sum(n) - count(*)) * 1000000 // sum(n) AS BIGINT) AS dup_ppm
FROM cells GROUP BY 1
""",
        "attribution_first_last": """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events),
f AS (SELECT user_id, event_type AS first_type FROM o WHERE rn = 1),
l AS (SELECT user_id, event_type AS last_type FROM o WHERE rn = cnt)
SELECT first_type, last_type, CAST(count(*) AS BIGINT) AS n_users
FROM f JOIN l USING (user_id) GROUP BY 1, 2
""",
        "bounce_rate": """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o),
r AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, sid) AS n_ev
  FROM s)
SELECT event_type AS entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n_ev = 1) AS BIGINT) AS n_bounces,
       CAST(count(*) FILTER (WHERE n_ev = 1) * 1000000 // count(*) AS BIGINT)
         AS bounce_ppm
FROM r WHERE rn = 1 GROUP BY 1
""",
        "zipf_profile": """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS BIGINT) AS "rank",
       word, n
FROM c ORDER BY n DESC, word LIMIT 50
""",
        "hapax_ratio": """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
c AS (SELECT source, word, count(*) AS n FROM w GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS n_vocab,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax,
       CAST(count(*) FILTER (WHERE n = 1) * 1000000 // count(*) AS BIGINT)
         AS hapax_ppm
FROM c GROUP BY 1
""",
        "kmeans_update": """
WITH dims AS (
  SELECT vec_id, u.i AS i,
         least(greatest(CAST(floor(CAST(embedding[i] AS DOUBLE) * 127 + 0.5)
                             AS BIGINT), -31), 31) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cids AS (SELECT vec_id AS cid FROM embeddings ORDER BY vec_id LIMIT 8),
cent AS (SELECT cids.cid, d.i, d.q AS cq
         FROM dims d JOIN cids ON d.vec_id = cids.cid),
dist AS (SELECT d.vec_id, c.cid,
                CAST(SUM((d.q - c.cq) * (d.q - c.cq)) AS BIGINT) AS d2
         FROM dims d JOIN cent c ON d.i = c.i GROUP BY 1, 2),
best AS (SELECT vec_id, cid, d2,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2 ASC, cid ASC) AS rn
         FROM dist)
SELECT CAST(b.cid AS BIGINT) AS centroid_id,
       CAST(d.i AS BIGINT) AS dim,
       CAST(SUM(d.q) AS BIGINT) AS sum_q,
       CAST(count(*) AS BIGINT) AS n_assigned
FROM best b JOIN dims d ON b.vec_id = d.vec_id
WHERE b.rn = 1
GROUP BY 1, 2
""",
        "nation_pair_volume": """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT)
           AS revenue_x10000
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE s_nationkey <> c_nationkey
GROUP BY 1, 2, 3
""",
        "market_share": """
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)) AS rev,
         s_nationkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n ON c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(SUM(rev) AS BIGINT) AS total_x10000,
       CAST(COALESCE(SUM(rev) FILTER (WHERE s_nationkey =
            (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')), 0)
            AS BIGINT) AS nation_x10000,
       CAST((CAST(COALESCE(SUM(rev) FILTER (WHERE s_nationkey =
            (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')), 0)
            AS HUGEINT) * 1000000) // CAST(SUM(rev) AS HUGEINT) AS BIGINT)
           AS share_ppm
FROM j GROUP BY o_year
""",
        "product_profit": """
SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))
                - 100 * CAST(floor(p_retailprice*100+0.5) AS BIGINT)
                  * CAST(floor(l_quantity+0.5) AS BIGINT)) AS BIGINT)
         AS profit_x10000
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
""",
        "small_qty_revenue": """
WITH st AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(floor(l_quantity+0.5) AS BIGINT)) AS BIGINT) AS qs,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
  GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS matched_rows,
       CAST(COALESCE(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)), 0)
            AS BIGINT) AS total_cents,
       CAST(COALESCE(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)), 0) // 7
            AS BIGINT) AS avg_yearly_cents
FROM lineitem JOIN st ON l_partkey = st.pk
WHERE 5 * CAST(floor(l_quantity+0.5) AS BIGINT) * st.cnt < st.qs
""",
        "top_supplier": """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT)
           AS total_revenue_x10000
  FROM lineitem
  WHERE l_shipdate >= DATE '1998-01-01' AND l_shipdate < DATE '1998-04-01'
  GROUP BY 1)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue_x10000
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_x10000 = (SELECT max(total_revenue_x10000) FROM r)
""",
        "order_count_distribution": """
WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1),
d AS (SELECT c.c_custkey, coalesce(oc.n, 0) AS c_count
      FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM d GROUP BY c_count
""",
        "local_supplier_volume": """
SELECT r_name, n_name,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_x10000
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
""",
        "global_sales_opportunity": """
WITH pos AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                         AS BIGINT) AS s
             FROM customer WHERE c_acctbal > 0),
c AS (SELECT c_custkey, CAST(c_nationkey % 7 AS BIGINT) AS code,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
      FROM customer),
f AS (SELECT c.* FROM c, pos
      WHERE c.bal * pos.n > pos.s
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT'))
SELECT code AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal) AS BIGINT) AS totacctbal_cents
FROM f GROUP BY code
""",
        "pdf_real_extract": """
WITH g(doc_id, ord, kind, page_number, n_chars, text_md5, text_prefix) AS (VALUES
  ('sample-one-page', 0, 'sectionHeading', 0, 48, 'a8ce6b915d49918d4a4324c10012e126', 'UNITED STATES SECURITIES AND EXCHANGE COMMISSION'),
  ('sample-one-page', 1, 'sectionHeading', 0, 22, '6fcfeb648db2a02847276d4d4db246d4', 'Washington, D.C. 20549'),
  ('sample-one-page', 2, 'sectionHeading', 0, 9, '474a4b5890951613a008911af22f99f3', 'FORM 10-Q'),
  ('sample-one-page', 3, 'sectionHeading', 0, 89, '47afae05cc67294ae78333ab87c97ebf', '☒ QUARTERLY REPORT PURSUANT TO SECTION 13 OR 15('),
  ('sample-one-page', 4, 'Text', 0, 45, '0a1d792a1d307f5a86d1792c5ae07f39', 'For the Quarterly Period Ended March 31, 2020'),
  ('sample-one-page', 5, 'sectionHeading', 0, 2, '1d00e7dce692e8dc3f6877f035e3a616', 'OR'),
  ('sample-one-page', 6, 'sectionHeading', 0, 90, '86c3dd0d7a3467cb6d522fdbc84d4ccb', '☐ TRANSITION REPORT PURSUANT TO SECTION 13 OR 15'),
  ('sample-one-page', 7, 'Text', 0, 33, 'b08f336205d28945d0f986556e139800', 'For the Transition Period From to'),
  ('sample-one-page', 8, 'Text', 0, 32, '952004247d5bd0c9615d338d887c0d2f', 'Commission File Number 001-37845'),
  ('sample-one-page', 9, 'title', 0, 21, '8dbba7c72d247462907b162d95b97b51', 'MICROSOFT CORPORATION'),
  ('sample-one-page', 10, 'Text', 0, 58, '02f7e98b43fbeae59dd8417df3349157', 'WASHINGTON 91-1144442 (STATE OF INCORPORATION) ('),
  ('sample-one-page', 11, 'Text', 0, 91, '06106267b312a406a9b841aceb1e74c5', 'ONE MICROSOFT WAY, REDMOND, WASHINGTON 98052-639'),
  ('sample-one-page', 12, 'Text', 0, 59, '5388eadb9139006f32ed69e752dfee9a', 'Securities registered pursuant to Section 12(b) '),
  ('sample-one-page', 13, 'Text', 0, 71, '7f0387597214c21fa44afa618a2cd145', 'Title of each class Trading Symbol Name of excha'),
  ('sample-one-page', 14, 'Text', 0, 219, '373794d6b70c6d009fb4a0f1d2e487b9', 'Common stock, $0.00000625 par value per share MS'),
  ('sample-one-page', 15, 'Text', 0, 1027, 'd63a19500b4bed11577582442ba1d4e5', 'NONE Indicate by check mark whether the registra'),
  ('sample-one-page', 16, 'Text', 0, 367, '0b6dd006b135f0ea1d2e68a868c98c9a', 'Large accelerated filer ☒ Accelerated filer Non-'),
  ('sample-one-page', 17, 'Text', 0, 249, 'e2755e8e775568d5aab50e01f72a6b47', 'Indicate by check mark whether the registrant is'),
  ('sample-one-page', 18, 'sectionHeading', 0, 105, '7f6f11bbbbb835d84ac3bcc1a6afeca8', 'Class Outstanding as of April 24, 2020 Common St'),
  ('sample-two-page', 0, 'title', 0, 17, '85dd1ebd329374f4618fd195147c9bb7', 'A Simple PDF File'),
  ('sample-two-page', 1, 'Text', 0, 41, '47b454ea4d41f89c12dda7e8182f4f25', 'This is a small demonstration .pdf file -'),
  ('sample-two-page', 2, 'Text', 0, 119, 'eb986e486be22d3421d03e8d6b6704e3', 'just for use in the Virtual Mechanics tutorials.'),
  ('sample-two-page', 3, 'Text', 0, 239, '896a259775725b714a1bb1a8a4558a0d', 'And more text. And more text. And more text. And'),
  ('sample-two-page', 4, 'Text', 0, 139, '4ce78b501d1e78b6b551d6fd6cd9c5d5', 'And more text. And more text. And more text. And'),
  ('sample-two-page', 5, 'sectionHeading', 1, 17, 'efcd4aeb85c214908dcaabbb233696aa', 'Simple PDF File 2'),
  ('sample-two-page', 6, 'Text', 1, 341, 'bcba2a69e8798516196f58b0b9090d46', '...continued from page 1. Yet more text. And mor'))
SELECT doc_id, CAST(ord AS BIGINT) AS ord, kind,
       CAST(page_number AS BIGINT) AS page_number,
       CAST(n_chars AS BIGINT) AS n_chars, text_md5, text_prefix
FROM g
""",
        "revenue_by_priority": """
SELECT o_orderpriority,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_x10000
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
        "revenue_by_nation": """
SELECT n_name, CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "group_quantiles": """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
       CAST(quantile_disc(l_quantity, 0.50) AS BIGINT) AS p50_qty,
       CAST(quantile_disc(l_quantity, 0.90) AS BIGINT) AS p90_qty
FROM lineitem GROUP BY l_returnflag
""",
        "tfidf_top_terms": """
WITH w0 AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents),
w AS (SELECT * FROM w0 WHERE w <> ''),
tf AS (SELECT source, w, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM w GROUP BY 1),
s AS (SELECT tf.source, tf.w AS term, tf.tf, df.df,
             tf.tf * 1000000 // df.df AS score_ppm
      FROM tf JOIN df ON tf.w = df.w),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score_ppm DESC, term ASC) AS rnk
      FROM s)
SELECT source, term, tf, df, score_ppm, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5
""",
        "stratified_sample": f"""
WITH d AS (SELECT doc_id, source,
                  {_ROLL.format(col="'s:' || CAST(doc_id AS VARCHAR)")} % 1000 AS slot,
                  (CAST(substr(source, 4) AS BIGINT) * 37) % 900 + 50 AS rate_permille
           FROM documents)
SELECT doc_id, source, slot, rate_permille FROM d WHERE slot < rate_permille
""",
        "customers_without_orders": """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
        "events_cumulative": """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS run_n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
         AS run_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
        "stopword_scrub": r"""
WITH c AS (SELECT doc_id,
  trim(regexp_replace(regexp_replace(
      text, '\b(the|a|and|of|to|in|is|it|on|for)\b', '', 'g'),
      ' {2,}', ' ', 'g'), ' ') AS clean_text,
  CAST(len(regexp_extract_all(
      text, '\b(the|a|and|of|to|in|is|it|on|for)\b')) AS BIGINT) AS n_removed
  FROM documents)
SELECT doc_id, clean_text, n_removed,
       CAST(length(clean_text) AS BIGINT) AS clean_chars
FROM c
""",
        "bpe_token_counts": """
WITH t AS (SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
    AS BIGINT) AS n_bpe_tokens
  FROM documents)
SELECT doc_id, n_ws_tokens, n_bpe_tokens,
       n_bpe_tokens * 100 // n_ws_tokens AS bpe_per_100_ws
FROM t
""",
        "sequence_pack": """
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM t)
SELECT doc_id, n_tokens, cum - n_tokens AS offset_start,
       (cum - n_tokens) // 512 AS bin_id
FROM c
""",
        "distinct_users_by_type": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
        "revenue_by_quantity_band": """
WITH bands(lo, hi, band) AS (
  VALUES (1, 5, 'tiny'), (6, 15, 'small'), (16, 30, 'mid'), (31, 50, 'bulk'))
SELECT band, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_x10000
FROM lineitem JOIN bands ON l_quantity BETWEEN lo AND hi
GROUP BY band
""",
        "events_lag_rolling": """
SELECT event_id, user_id,
       CAST(coalesce(date_diff('microsecond', LAG(ts) OVER w, ts), -1)
            AS BIGINT) AS prev_delta_us,
       CAST(COUNT(*) OVER w4 AS BIGINT) AS roll_n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w4 AS BIGINT)
         AS roll_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       w4 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
        "source_vocab_overlap": """
WITH w0 AS (SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents),
sw AS (SELECT DISTINCT source, w FROM w0 WHERE w <> ''),
p AS (SELECT a.source sa, b.source sb, CAST(count(*) AS BIGINT) inter
      FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2),
n AS (SELECT source, CAST(count(*) AS BIGINT) nv FROM sw GROUP BY 1)
SELECT sa AS source_a, sb AS source_b, inter,
       na.nv + nb.nv - inter AS uni,
       inter * 1000000 // (na.nv + nb.nv - inter) AS jaccard_ppm
FROM p JOIN n na ON p.sa = na.source JOIN n nb ON p.sb = nb.source
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS sum_disc_x10000,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS sum_charge_x1000000,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-01-01'
GROUP BY l_returnflag, l_linestatus
""",
        "top_order_per_priority": """
WITH p AS (
  SELECT o_orderpriority,
         max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 4294967296
             + o_orderkey) AS packed
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(packed % 4294967296 AS BIGINT) AS top_orderkey,
       CAST(packed // 4294967296 AS BIGINT) AS top_price_cents
FROM p
""",
        "rollup_revenue": """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_x10000,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
        "top_revenue_orders": """
WITH rev AS (
  SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS revenue_x10000
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
)
SELECT o_orderkey, o_orderdate, revenue_x10000
FROM rev ORDER BY revenue_x10000 DESC, o_orderkey ASC LIMIT 10
""",
        "events_range_window": """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
         AS win_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW)
""",
        "events_hopping": """
WITH e AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) // 1800000000 AS slot
  FROM events
),
x AS (
  SELECT event_type, cents, slot - u.k AS wslot
  FROM e, unnest(range(0, 2)) AS u(k)
)
SELECT event_type, make_timestamp(wslot * 1800000000) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM x GROUP BY 1, 2
""",
        "doc_length_histogram": """
SELECT lang, (n_chars // 64) * 64 AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
FROM documents GROUP BY 1, 2
""",
        "type_token_ratio": """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_distinct
  FROM documents
)
SELECT doc_id, n_tokens, n_distinct,
       n_distinct * 1000000 // n_tokens AS ttr_ppm
FROM t
""",
        "keyword_search": """
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_match, n_match * 1000000 // n_docs AS match_ppm
FROM s
""",
        "percentile_length_filter": """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
q AS (SELECT CAST(quantile_disc(n_tokens, 0.95) AS BIGINT) AS thr FROM t)
SELECT doc_id, n_tokens, q.thr AS thr_tokens
FROM t, q WHERE n_tokens >= q.thr
""",
        "embedding_norm_stats": """
WITH v AS (
  SELECT label,
         CAST(list_sum(list_transform(embedding::DOUBLE[],
              x -> CAST(floor(x*1000+0.5) AS BIGINT)
                   * CAST(floor(x*1000+0.5) AS BIGINT))) AS BIGINT) AS qsq
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(qsq) AS BIGINT) AS sum_qsq, CAST(max(qsq) AS BIGINT) AS max_qsq
FROM v GROUP BY label
""",
        "knn_classify": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.qid, e.vec_id, e.label,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS sc
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.qid
),
r AS (
  SELECT qid, vec_id, label,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rk
  FROM s
),
v AS (
  SELECT qid, label, CAST(count(*) AS BIGINT) AS c
  FROM r WHERE rk <= 5 GROUP BY qid, label
),
w AS (
  SELECT qid, label, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, label ASC) AS rk2
  FROM v
)
SELECT qid AS query_id, CAST(label AS BIGINT) AS pred_label, c AS votes
FROM w WHERE rk2 = 1
""",
        "promo_revenue_share": """
WITH r AS (
  SELECT p.p_type,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_type
)
SELECT p_type, rev AS revenue_x10000,
       CAST(rev * 1000000 // (SELECT sum(rev) FROM r) AS BIGINT) AS share_ppm
FROM r
""",
        "group_moments": """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS sum_qty2,
       CAST(SUM(CAST(floor(l_extendedprice + 0.5) AS BIGINT)
                * CAST(floor(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price2,
       CAST(SUM(CAST(l_quantity AS BIGINT)
                * CAST(floor(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_qty_price
FROM lineitem GROUP BY l_returnflag
""",
        "hour_of_day_profile": """
SELECT event_type,
       CAST(date_part('hour', ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1, 2
""",
        "char_trigram_profile": """
WITH d AS (SELECT lang, substr(text, 1, 64) AS p FROM documents),
t AS (
  SELECT lang, substr(p, CAST(u.i AS INTEGER), 3) AS tri
  FROM d, unnest(range(1, CAST(length(p) AS BIGINT) - 1)) AS u(i)
),
c AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
r AS (
  SELECT lang, tri, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri ASC) AS rk
  FROM c
)
SELECT lang, tri, n FROM r WHERE rk <= 10
""",
        "funnel_counts": """
WITH a AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > a.t
        AND e.ts <= a.t + INTERVAL 24 HOUR GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN b ON b.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.t
        AND e.ts <= b.t + INTERVAL 24 HOUR GROUP BY 1)
SELECT 'view' AS stage, CAST(0 AS BIGINT) AS stage_idx,
       CAST((SELECT count(*) FROM a) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST(1 AS BIGINT), CAST((SELECT count(*) FROM b) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST(2 AS BIGINT), CAST((SELECT count(*) FROM c) AS BIGINT)
""",
        "period_retention": """
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // CAST(3600000000 AS BIGINT) AS period
  FROM events
)
SELECT a.period, CAST(count(*) AS BIGINT) AS n_retained
FROM uw a JOIN uw b ON a.user_id = b.user_id AND b.period = a.period + 1
GROUP BY a.period
""",
        "oov_bigram_rate": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[CAST(u.i AS INTEGER)] AS w
  FROM d, unnest(range(1, len(ws) + 1)) AS u(i)
),
bg AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS bigram
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
vocab AS (
  SELECT bigram FROM (
    SELECT bigram, count(*) AS n FROM bg GROUP BY 1
    ORDER BY n DESC, bigram LIMIT 500
  ) t
),
s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN bigram IN (SELECT bigram FROM vocab)
                       THEN 0 ELSE 1 END) AS BIGINT) AS noov
  FROM bg GROUP BY doc_id
)
SELECT doc_id, nb AS n_bigrams, noov AS n_oov,
       noov * 1000000 // nb AS oov_ppm
FROM s
""",
        "value_outliers": """
WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
q AS (
  SELECT event_type, CAST(quantile_disc(cents, 0.99) AS BIGINT) AS thr
  FROM e GROUP BY 1
)
SELECT e.event_id, e.event_type, e.cents AS value_cents, q.thr AS thr_cents
FROM e JOIN q USING (event_type) WHERE e.cents > q.thr
""",
        "monthly_revenue_growth": """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT month, revenue_cents,
       CAST(coalesce(LAG(revenue_cents) OVER (ORDER BY month), 0) AS BIGINT)
         AS prev_revenue_cents,
       CAST(revenue_cents
            - coalesce(LAG(revenue_cents) OVER (ORDER BY month), 0) AS BIGINT)
         AS delta_cents
FROM m
""",
        "bloom_semi_join": """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_x10000
FROM lineitem l
WHERE l.l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
        "order_priority_returned": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderpriority
""",
        "large_volume_orders": """
WITH s AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, s.total_qty
FROM s
JOIN orders o ON o.o_orderkey = s.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE s.total_qty > 300
""",
        "returned_revenue_by_customer": """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS revenue_x10000
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
),
topk AS (
  SELECT o_custkey, revenue_x10000 FROM rev
  ORDER BY revenue_x10000 DESC, o_custkey ASC LIMIT 20
)
SELECT c.c_custkey, c.c_name, t.revenue_x10000
FROM topk t JOIN customer c ON c.c_custkey = t.o_custkey
""",
        "avg_order_gap": """
WITH w AS (
  SELECT o_custkey,
         epoch_us(o_orderdate)
           - lag(epoch_us(o_orderdate)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS d
  FROM orders
)
SELECT o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(d) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(d), -1) AS BIGINT) AS sum_gap_us,
       CAST(coalesce(max(d), -1) AS BIGINT) AS max_gap_us
FROM w GROUP BY o_custkey
""",
        "markov_transitions": """
WITH w AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
FROM w WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
        "wau_rolling": """
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // CAST(604800000000 AS BIGINT) AS w
  FROM events
),
ex AS (
  SELECT user_id, w + u.i AS tw FROM uw, unnest(range(0, 4)) AS u(i)
)
SELECT CAST(tw AS BIGINT) AS week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM ex GROUP BY tw
""",
        "props_value_stats": """
WITH e AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_extracted,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(coalesce(max(k), -4611686018427387904) AS BIGINT) AS max_k
FROM e GROUP BY event_type
""",
        "repetition_profile": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
  FROM d, unnest(range(1, len(ws))) AS u(i)
),
c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY doc_id, bg)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       CAST(max(cnt) AS BIGINT) AS top_cnt,
       CAST(count(*) AS BIGINT) AS n_distinct
FROM c GROUP BY doc_id
""",
        "prefix_cluster_sizes": """
WITH c AS (SELECT substr(text, 1, 16) AS p, count(*) AS n
           FROM documents GROUP BY 1)
SELECT CAST(n AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM c GROUP BY n
""",
        "embedding_quantize_stats": """
WITH q AS (
  SELECT label,
         least(greatest(CAST(floor(CAST(u.x AS DOUBLE) * 127 + 0.5) AS BIGINT),
                        -31), 31) AS qv,
         CAST(floor(CAST(u.x AS DOUBLE) * 127 + 0.5) AS BIGINT) AS raw,
         vec_id
  FROM embeddings, unnest(embedding) AS u(x)
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
       CAST(sum(qv) AS BIGINT) AS sum_q,
       CAST(count(*) FILTER (raw != qv) AS BIGINT) AS n_clipped,
       CAST(coalesce(sum(abs(raw - qv)), 0) AS BIGINT) AS sum_clip_loss
FROM q GROUP BY label
""",
        "customer_spend_ntile": """
WITH s AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey AS custkey, spend_cents,
       CAST(ntile(4) OVER (ORDER BY spend_cents, o_custkey) AS BIGINT)
         AS quartile
FROM s
""",
        "pivot_hour_type": """
SELECT CAST(h.i AS BIGINT) AS hour,
       CAST(count(*) FILTER (e.event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (e.event_type = 'error') AS BIGINT) AS error,
       CAST(count(*) FILTER (e.event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (e.event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (e.event_type = 'view') AS BIGINT) AS view
FROM unnest(range(0, 24)) AS h(i)
LEFT JOIN events e ON (epoch_us(e.ts) // 3600000000) % 24 = h.i
GROUP BY h.i
""",
        "time_to_first_purchase": """
SELECT user_id,
       make_timestamp(min(epoch_us(ts))) AS first_ts,
       CAST(coalesce(min(epoch_us(ts)) FILTER (event_type = 'purchase')
                     - min(epoch_us(ts)), -1) AS BIGINT) AS delta_us
FROM events GROUP BY user_id
""",
        "zscore_outliers": """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
m AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(vc) AS HUGEINT) AS s,
         CAST(sum(vc * vc) AS HUGEINT) AS m2
  FROM ev GROUP BY event_type
)
SELECT ev.event_id, ev.event_type, ev.vc AS value_cents
FROM ev JOIN m USING (event_type)
WHERE (m.n * ev.vc - m.s) * (m.n * ev.vc - m.s)
      > 4 * (m.n * m.m2 - m.s * m.s)
""",
    }
    # connected components over the simhash pair graph: recursive min-label
    # closure composed over the dedup_simhash oracle (kept as one source of
    # truth for the pair semantics)
    d["dedup_clusters"] = f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
cc(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, cc.label FROM edges e JOIN cc ON cc.node = e.b
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN min(label) = node THEN 1 ELSE 0 END AS BIGINT)
         AS is_canonical
FROM cc GROUP BY node
"""
    # canonical doc per cluster by quality, composed over dedup_clusters
    d["canonical_selection"] = f"""
WITH cl AS (SELECT doc_id, cluster_id FROM ({d["dedup_clusters"]}) t),
tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
j AS (
  SELECT cl.cluster_id, cl.doc_id, tok.n_tokens
  FROM cl JOIN tok USING (doc_id)
),
r AS (
  SELECT cluster_id, doc_id, n_tokens,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS nm
  FROM j
)
SELECT cluster_id, doc_id AS keep_id,
       CAST(n_tokens AS BIGINT) AS keep_tokens,
       CAST(nm AS BIGINT) AS n_members
FROM r WHERE rn = 1
"""
    # per-user session summary composed over the sessionize oracle (one
    # source of truth for the gap-window semantics)
    d["session_stats"] = f"""
WITH base AS ({d["events_sessionize"]})
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(sum(date_diff('microsecond', start_ts, end_ts)) AS BIGINT)
         AS total_session_dur_us
FROM base GROUP BY user_id
"""
    # the prefix-filtered join computes EXACTLY dedup_ngram_jaccard's result
    d["jaccard_prefix_join"] = d["dedup_ngram_jaccard"]
    d["centroid_spread"] = """
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, u.i AS i,
         CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
s AS (
  SELECT label, i, CAST(sum(qv) AS BIGINT) AS sv,
         CAST(sum(qv * qv) AS BIGINT) AS q2
  FROM q GROUP BY label, i
),
n AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
  FROM embeddings GROUP BY 1
)
SELECT n.label, n.n AS n_vecs,
       CAST(n.n * n.n * sum(s.q2) - n.n * sum(s.sv * s.sv) AS BIGINT)
         AS spread_xn2
FROM s JOIN n USING (label)
GROUP BY n.label, n.n
"""
    d["part_price_deviation"] = """
SELECT p.p_type,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS deviation_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_type
"""
    d["orders_profile"] = """
SELECT 'o_orderkey' AS column, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
UNION ALL
SELECT 'o_custkey', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
"""
    # confusion matrix composed over the lang_id detector oracle
    d["lang_confusion"] = f"""
WITH pred AS ({d["lang_id"]})
SELECT d.lang AS meta_lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2
"""
    d["cohort_matrix"] = """
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // CAST(604800000000 AS BIGINT) AS w
  FROM events
),
w0 AS (SELECT user_id, min(w) AS w0 FROM uw GROUP BY user_id)
SELECT CAST(w0.w0 AS BIGINT) AS cohort_week,
       CAST(uw.w - w0.w0 AS BIGINT) AS weeks_since,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN w0 USING (user_id)
GROUP BY 1, 2
"""
    d["longest_type_run"] = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rt
  FROM events
),
runs AS (
  SELECT user_id, event_type, count(*) AS len, min(rn) AS start_rn
  FROM o GROUP BY user_id, event_type, rn - rt
),
best AS (
  SELECT user_id, event_type, len,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_rn ASC) AS k
  FROM runs
)
SELECT user_id, event_type AS run_type, CAST(len AS BIGINT) AS run_len
FROM best WHERE k = 1
"""
    d["winsorized_stats"] = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
thr AS (
  SELECT event_type,
         CAST(quantile_disc(vc, 0.01) AS BIGINT) AS lo_cents,
         CAST(quantile_disc(vc, 0.99) AS BIGINT) AS hi_cents
  FROM ev GROUP BY event_type
)
SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(t.lo_cents) AS BIGINT) AS lo_cents,
       CAST(max(t.hi_cents) AS BIGINT) AS hi_cents,
       CAST(sum(least(greatest(ev.vc, t.lo_cents), t.hi_cents)) AS BIGINT)
         AS sum_wins_cents,
       CAST(count(*) FILTER (ev.vc < t.lo_cents) AS BIGINT) AS n_clamped_lo,
       CAST(count(*) FILTER (ev.vc > t.hi_cents) AS BIGINT) AS n_clamped_hi
FROM ev JOIN thr t USING (event_type)
GROUP BY ev.event_type
"""
    d["session_assignment"] = """
WITH o AS (
  SELECT event_id, user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM o
"""
    d["brand_band_revenue"] = """
WITH f AS (
  SELECT p.p_brand,
         CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS qty,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(rev) AS BIGINT) AS revenue_x10000
FROM f
WHERE (p_brand = 'Brand#1' AND qty BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND qty BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND qty BETWEEN 20 AND 30)
GROUP BY p_brand
"""
    d["embedding_gram_pairs"] = """
WITH q AS (
  SELECT label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x*1000+0.5) AS BIGINT)) AS ql
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(i.i AS BIGINT) AS i,
       CAST(j.j AS BIGINT) AS j,
       CAST(sum(ql[i.i + 1] * ql[j.j + 1]) AS BIGINT) AS sum_qq
FROM q, range(8) AS i(i), range(8) AS j(j)
WHERE j.j >= i.i
GROUP BY 1, 2, 3
"""
    d["session_paths"] = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sid
                               ORDER BY ts, event_id) AS rn
  FROM s
),
p AS (
  SELECT user_id, sid,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS path
  FROM r WHERE rn <= 8 GROUP BY user_id, sid
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path ORDER BY n_sessions DESC, path ASC LIMIT 15
"""
    d["dwell_times"] = """
WITH w AS (
  SELECT event_id, user_id,
         lead(epoch_us(ts)) OVER win - epoch_us(ts) AS d,
         lead(event_type) OVER win AS nt
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, CAST(coalesce(d, -1) AS BIGINT) AS dwell_us,
       coalesce(nt, '') AS next_type
FROM w
"""
    d["upsert_merge"] = """
WITH base AS (
  SELECT doc_id, 1 AS version, CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
),
delta AS (
  SELECT doc_id, 2 AS version, CAST(n_chars + 8 AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT doc_id + 1000000, 1, CAST(n_chars AS BIGINT)
  FROM documents WHERE doc_id % 50 = 0
),
u AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
m AS (
  SELECT doc_id,
         CAST(max(CAST(version AS BIGINT) * 1099511627776 + n_chars)
              AS BIGINT) AS packed
  FROM u GROUP BY doc_id
)
SELECT doc_id, CAST(packed // 1099511627776 AS BIGINT) AS version,
       CAST(packed % 1099511627776 AS BIGINT) AS n_chars
FROM m
"""
    # per-language quota sample ranked by the reshard-stable rolling hash
    d["quota_sample"] = f"""
WITH h AS (
  SELECT doc_id, lang, {roll_id} AS hv FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rank
  FROM h
)
SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 50
"""
    d["dense_hourly_series"] = """
WITH b AS (
  SELECT epoch_us(ts) // 3600000000 AS slot, count(*) AS n
  FROM events GROUP BY 1
),
r AS (
  SELECT unnest(range((SELECT min(slot) FROM b),
                      (SELECT max(slot) FROM b) + 1)) AS slot
)
SELECT make_timestamp(r.slot * 3600000000) AS window_start,
       CAST(coalesce(b.n, 0) AS BIGINT) AS n_events
FROM r LEFT JOIN b ON b.slot = r.slot
"""
    d["co_occurrence_topk"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
),
e AS (SELECT doc_id, unnest(ws) AS w FROM d),
p AS (
  SELECT a.w AS wa, b.w AS wb, count(*) AS n
  FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
)
SELECT wa AS word_a, wb AS word_b, CAST(n AS BIGINT) AS n_docs
FROM p ORDER BY n DESC, wa, wb LIMIT 25
"""
    # CMS heavy-hitter audit: salted rolling-hash cells, min over depth rows
    roll_jw = _ROLL.format(col="CAST(j.j AS VARCHAR) || ':' || word")
    roll_jt = _ROLL.format(col="CAST(j.j AS VARCHAR) || ':' || t.word")
    d["cms_heavy_hitters"] = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
cnt AS (SELECT word, count(*) AS n FROM w GROUP BY word),
topk AS (SELECT word, n FROM cnt ORDER BY n DESC, word ASC LIMIT 20),
cells AS (
  SELECT j.j AS j, {roll_jw} % 1024 AS cell, CAST(sum(n) AS BIGINT) AS c
  FROM cnt, range(2) AS j(j)
  GROUP BY 1, 2
),
est AS (
  SELECT t.word, t.n, j.j AS j, {roll_jt} % 1024 AS cell
  FROM topk t CROSS JOIN range(2) AS j(j)
)
SELECT e.word, CAST(e.n AS BIGINT) AS exact_n,
       CAST(min(c.c) AS BIGINT) AS cms_estimate
FROM est e JOIN cells c ON c.j = e.j AND c.cell = e.cell
GROUP BY e.word, e.n
"""
    d["blocked_linkage"] = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 8) AS p,
         list_distinct(string_split(text, ' ')) AS ws
  FROM documents
),
e AS (SELECT doc_id, p, len(ws) AS nw, unnest(ws) AS w FROM d),
pr AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.nw AS na, b.nw AS nb,
         count(*) AS inter
  FROM e a JOIN e b ON a.p = b.p AND a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT da AS doc_a, db AS doc_b, CAST(inter AS BIGINT) AS inter,
       CAST(na + nb - inter AS BIGINT) AS uni
FROM pr WHERE abs(na - nb) <= 2 AND 2 * inter >= na + nb - inter
"""
    d["forecast_revenue"] = """
WITH f AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_cents
  FROM lineitem WHERE l_quantity < 24
)
SELECT CAST(count(*) FILTER (disc_cents BETWEEN 5 AND 7) AS BIGINT) AS n_items,
       CAST(coalesce(sum(price_cents * disc_cents)
                     FILTER (disc_cents BETWEEN 5 AND 7), 0) AS BIGINT)
         AS revenue_x10000
FROM f
"""
    d["session_conversion"] = """
WITH o AS (
  SELECT user_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, event_type,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
a AS (
  SELECT user_id, sid,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM s GROUP BY user_id, sid
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(conv) AS BIGINT) AS n_converting
FROM a GROUP BY user_id
"""
    d["norm_minmax_scaled"] = """
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(list_sum(list_transform(embedding::DOUBLE[],
              x -> CAST(floor(x*1000+0.5) AS BIGINT)
                   * CAST(floor(x*1000+0.5) AS BIGINT))) AS BIGINT) AS qsq
  FROM embeddings
),
s AS (SELECT label, min(qsq) AS mn, max(qsq) AS mx FROM q GROUP BY label)
SELECT q.vec_id, q.label, q.qsq,
       CAST(CASE WHEN s.mx > s.mn
                 THEN (q.qsq - s.mn) * 1000 // (s.mx - s.mn)
                 ELSE 0 END AS BIGINT) AS scaled_permille
FROM q JOIN s USING (label)
"""
    d["nation_actor_counts"] = """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY 1),
s AS (SELECT s_nationkey AS nk, count(*) AS n FROM supplier GROUP BY 1),
k AS (SELECT nk FROM c UNION SELECT nk FROM s)
SELECT CAST(k.nk AS BIGINT) AS n_nationkey, n.n_name,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_suppliers
FROM k JOIN nation n ON n.n_nationkey = k.nk
LEFT JOIN c ON c.nk = k.nk
LEFT JOIN s ON s.nk = k.nk
"""
    # length-weighted deterministic sampling: same 62-bit rolling hash draw
    # as deterministic_split, weight = min(999, n_chars*1000/512)
    d["weighted_sample"] = f"""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         {roll_id} % 1000 AS slot
  FROM documents
)
SELECT doc_id, n_chars, CAST(slot AS BIGINT) AS slot
FROM s WHERE slot < least(999, n_chars * 1000 // 512)
"""
    d["approx_quantiles_hist"] = """
WITH ev AS (
  SELECT event_type,
         greatest(least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 8, 4095), 0)
           AS b
  FROM events
),
h AS (SELECT event_type, b, count(*) AS c FROM ev GROUP BY event_type, b),
cum AS (
  SELECT event_type, b,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b) AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM h
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(min(b) FILTER (cc >= (50 * n + 99) // 100) * 8 AS BIGINT) AS p50_cents,
       CAST(min(b) FILTER (cc >= (90 * n + 99) // 100) * 8 AS BIGINT) AS p90_cents,
       CAST(min(b) FILTER (cc >= (99 * n + 99) // 100) * 8 AS BIGINT) AS p99_cents
FROM cum GROUP BY event_type
"""
    # integer fixed-point PageRank over the simhash graph, 3 unrolled
    # power iterations (r' = 150000 + (85 * sum(r//deg)) // 100)
    _pr_iters = ""
    _prev = "r0"
    for _i in (1, 2, 3):
        _pr_iters += f""",
r{_i} AS (
  SELECT e.dst AS node,
         150000 + (85 * SUM({_prev}.r // g.d)) // 100 AS r
  FROM edges e
  JOIN {_prev} ON {_prev}.node = e.src
  JOIN deg g ON g.src = e.src
  GROUP BY e.dst
)"""
        _prev = f"r{_i}"
    d["simhash_distance_histogram"] = f"""
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
FROM ({d["dedup_simhash"]}) t
GROUP BY hamming ORDER BY hamming
"""
    d["pagerank_dup_graph"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg){_pr_iters}
SELECT node AS doc_id, CAST(r AS BIGINT) AS rank FROM r3
"""
    # triangles in the same simhash pair graph: every triangle a<b<c is one
    # wedge (b,c) at apex a closed by edge (b,c)
    d["triangle_count"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
w AS (
  SELECT e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1 JOIN pairs e2
    ON e2.doc_a = e1.doc_a AND e1.doc_b < e2.doc_b
)
SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_wedges,
       CAST(count(*) FILTER (EXISTS (
         SELECT 1 FROM pairs e3 WHERE e3.doc_a = w.b AND e3.doc_b = w.c
       )) AS BIGINT) AS n_triangles
FROM w
"""
    # degree histogram over the same simhash pair graph as dedup_clusters
    d["degree_distribution"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
edges AS (SELECT doc_a AS node FROM pairs
          UNION ALL SELECT doc_b FROM pairs),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY node)
SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree
"""
    # component-size histogram composed over the dedup_clusters closure
    d["cluster_size_histogram"] = f"""
WITH cc AS ({d["dedup_clusters"]}),
sz AS (SELECT cluster_id, count(*) AS s FROM cc GROUP BY 1)
SELECT CAST(s AS BIGINT) AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY 1
"""
    # per-node (degree, triangles) joint histogram over the simhash pair
    # graph; pairs are oriented doc_a < doc_b so each triangle a<b<c is
    # counted once and credits all three corners
    d["clustering_coefficient"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
  JOIN pairs e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
),
tn AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
       UNION ALL SELECT c FROM tri),
tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM tn GROUP BY 1),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b FROM pairs)
        GROUP BY 1)
SELECT deg.degree, CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg LEFT JOIN tc USING (node) GROUP BY 1, 2
"""
    d["order_burst_counts"] = """
WITH b AS (
  SELECT o1.o_orderkey, count(o2.o_orderkey) AS burst
  FROM orders o1 LEFT JOIN orders o2
    ON o2.o_custkey = o1.o_custkey AND o2.o_orderkey <> o1.o_orderkey
   AND abs(date_diff('second', o1.o_orderdate, o2.o_orderdate)) <= 2592000
  GROUP BY 1)
SELECT CAST(burst AS BIGINT) AS burst_count,
       CAST(count(*) AS BIGINT) AS n_orders
FROM b GROUP BY 1
"""
    # quantile_disc(0.5) = LOWER median (element at (n-1)//2): matches the
    # kernel's weighted lower-median exactly — integer end to end
    d["mad_outliers"] = """
WITH med AS (SELECT source, quantile_disc(n_chars, 0.5) AS m
             FROM documents GROUP BY 1),
dev AS (SELECT d.source, abs(d.n_chars - med.m) AS dv, med.m AS m
        FROM documents d JOIN med USING (source)),
mad AS (SELECT source, quantile_disc(dv, 0.5) AS md, any_value(m) AS m
        FROM dev GROUP BY 1)
SELECT dev.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(mad.m AS BIGINT) AS med_chars, CAST(mad.md AS BIGINT) AS mad_chars,
       CAST(count(*) FILTER (dev.dv > 3 * mad.md) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (source) GROUP BY 1, 3, 4
"""
    d["collocation_pmi_terms"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[CAST(u.i AS INTEGER)] AS w
      FROM d, unnest(range(1, len(ws) + 1)) AS u(i)),
bg AS (SELECT a.w || ' ' || b.w AS bigram, a.w AS lw, b.w AS rw,
              CAST(count(*) AS BIGINT) AS n_ab
       FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       GROUP BY 1, 2, 3),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_pairs FROM bg),
wtot AS (SELECT CAST(count(*) AS BIGINT) AS n_words FROM w)
SELECT bg.bigram, bg.n_ab, ul.n AS n_left, ur.n AS n_right,
       tot.n_pairs, wtot.n_words
FROM bg JOIN uni ul ON ul.w = bg.lw JOIN uni ur ON ur.w = bg.rw, tot, wtot
WHERE bg.n_ab >= 5
"""
    # winnowing (SIGMOD'03): per-window packed argmin (hash*2^20 + 1-based
    # position) over rolling31/MULT_A k-gram hashes; short docs clip the
    # window at the doc end (greatest(n_kg-3, 1) start bound)
    d["winnowing_fingerprints"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[CAST(u.i AS INTEGER)] AS w
      FROM d, unnest(range(1, len(ws) + 1)) AS u(i)),
kg AS (SELECT a.doc_id, a.i, a.w || ' ' || b.w || ' ' || c.w AS kgram
       FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
h AS (SELECT doc_id, i,
             list_reduce(list_transform(split(kgram, ''),
                                        x -> unicode(x)::BIGINT),
                         (a, b) -> (a * 1000003 + b) % 2147483647)
               * 1048576 + i AS pk,
             count(*) OVER (PARTITION BY doc_id) AS n_kg
      FROM kg),
win AS (SELECT doc_id, n_kg, i,
               min(pk) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM h),
sel AS (SELECT doc_id, any_value(n_kg) AS n_kg,
               count(DISTINCT wmin) AS n_sel
        FROM win WHERE i <= greatest(n_kg - 3, 1) GROUP BY doc_id)
SELECT doc.doc_id,
       CAST(COALESCE(sel.n_kg, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(sel.n_sel, 0) AS BIGINT) AS n_selected
FROM documents doc LEFT JOIN sel ON sel.doc_id = doc.doc_id
"""
    # Theil-Sen: LOWER-median pairwise slope kept as an integer rational;
    # ordering (double ratio, num, den) is bit-identical on both sides
    d["theil_sen_trend"] = """
WITH rev AS (
  SELECT n.n_name,
         CAST(date_part('year', o.o_orderdate) * 12
              + date_part('month', o.o_orderdate) - 1 AS BIGINT) AS m,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS r
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2),
sl AS (SELECT a.n_name, b.r - a.r AS num, b.m - a.m AS den
       FROM rev a JOIN rev b ON b.n_name = a.n_name AND b.m > a.m),
rk AS (SELECT n_name, num, den,
              row_number() OVER (PARTITION BY n_name
                 ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn,
              count(*) OVER (PARTITION BY n_name) AS np
       FROM sl),
st AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_months
       FROM rev GROUP BY 1)
SELECT rk.n_name, st.n_months, CAST(rk.np AS BIGINT) AS n_pairs,
       CAST(rk.num AS BIGINT) AS med_num_cents,
       CAST(rk.den AS BIGINT) AS med_den_months
FROM rk JOIN st USING (n_name)
WHERE rk.rn = (rk.np - 1) // 2 + 1
"""
    # PSI drift bins: quantile_disc = smallest value with cume_dist >= q
    # (rank ceil(n*q)); bin id counts edges STRICTLY below the cent value
    d["drift_psi_terms"] = """
WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  epoch_us(ts) AS us FROM events),
cut AS (SELECT (min(us) + max(us)) // 2 AS c FROM e),
ref AS (SELECT v FROM e, cut WHERE us < cut.c),
cur AS (SELECT v FROM e, cut WHERE us >= cut.c),
b AS (SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
      FROM ref),
rb AS (SELECT len(list_filter(b.bs, x -> r.v > x)) AS bin, 1 AS is_ref
       FROM ref r, b),
cb AS (SELECT len(list_filter(b.bs, x -> c2.v > x)) AS bin, 0 AS is_ref
       FROM cur c2, b),
ab AS (SELECT * FROM rb UNION ALL SELECT * FROM cb)
SELECT CAST(bin AS BIGINT) AS bin, CAST(sum(is_ref) AS BIGINT) AS n_ref,
       CAST(count(*) - sum(is_ref) AS BIGINT) AS n_cur
FROM ab GROUP BY 1
"""
    # hybrid-search RRF terms: candidates = union of top-5 under exact
    # cosine and under the 6-bit quantized dot; both GLOBAL ranks emitted
    d["rank_fusion_terms"] = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < 10),
base AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS sc,
         list_dot_product(
            list_transform(q.qe, x -> greatest(-31.0, least(31.0,
                                       floor(x::DOUBLE * 127 + 0.5)))),
            list_transform(e.embedding, x -> greatest(-31.0, least(31.0,
                                       floor(x::DOUBLE * 127 + 0.5))))
         ) AS sq
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
r AS (SELECT qid, vec_id,
        row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rc,
        row_number() OVER (PARTITION BY qid ORDER BY sq DESC, vec_id) AS rq
      FROM base)
SELECT qid AS query_id, vec_id AS neighbor_id,
       CAST(rc AS BIGINT) AS rank_cos, CAST(rq AS BIGINT) AS rank_q8
FROM r WHERE rc <= 5 OR rq <= 5
"""
    # multi-source BFS from each cluster's canonical over the dup graph;
    # UNION (set) recursion + min(d) = hop distance, capped at 64 rounds
    d["dup_graph_bfs_depths"] = f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
cc AS ({d["dedup_clusters"]}),
bfs(node, dd) AS (
  SELECT DISTINCT cluster_id, 0 FROM cc
  UNION
  SELECT e.b, bfs.dd + 1 FROM bfs JOIN edges e ON e.a = bfs.node
  WHERE bfs.dd < 64
),
md AS (SELECT node, CAST(min(dd) AS BIGINT) AS depth FROM bfs GROUP BY node)
SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes FROM md GROUP BY 1
"""
    # 2-D skyline: strict-dominance NOT EXISTS over cents-quantized price
    # (both engines compare the identical int64 cents, never raw doubles)
    d["skyline_parts"] = """
WITH p AS (SELECT p_partkey,
                  CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                      AS price_cents,
                  CAST(p_size AS BIGINT) AS p_size
           FROM part)
SELECT a.p_partkey, a.price_cents, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
"""
    # within-brand pairwise Levenshtein mass (quadratic oracle; the Ray
    # side is count-compressed over distinct names)
    d["name_edit_histogram"] = """
SELECT CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
GROUP BY 1
"""
    # bounded 2-core peeling, exactly 3 synchronous rounds (chained CTEs
    # mirror the Ray rounds; stage 0 = survivors)
    d["kcore_peel_counts"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       UNION ALL SELECT doc_b, doc_a FROM pairs),
n0 AS (SELECT DISTINCT a AS node FROM e0),
d1 AS (SELECT a AS node, count(*) AS c FROM e0 GROUP BY 1),
rm1 AS (SELECT n0.node FROM n0 LEFT JOIN d1 USING (node)
        WHERE coalesce(c, 0) < 2),
n1 AS (SELECT node FROM n0 WHERE node NOT IN (SELECT node FROM rm1)),
e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT node FROM n1)
                             AND b IN (SELECT node FROM n1)),
d2 AS (SELECT a AS node, count(*) AS c FROM e1 GROUP BY 1),
rm2 AS (SELECT n1.node FROM n1 LEFT JOIN d2 USING (node)
        WHERE coalesce(c, 0) < 2),
n2 AS (SELECT node FROM n1 WHERE node NOT IN (SELECT node FROM rm2)),
e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT node FROM n2)
                             AND b IN (SELECT node FROM n2)),
d3 AS (SELECT a AS node, count(*) AS c FROM e2 GROUP BY 1),
rm3 AS (SELECT n2.node FROM n2 LEFT JOIN d3 USING (node)
        WHERE coalesce(c, 0) < 2),
n3 AS (SELECT node FROM n2 WHERE node NOT IN (SELECT node FROM rm3)),
u AS (SELECT 1 AS stage, count(*) AS n_nodes FROM rm1
      UNION ALL SELECT 2, count(*) FROM rm2
      UNION ALL SELECT 3, count(*) FROM rm3
      UNION ALL SELECT 0, count(*) FROM n3)
SELECT CAST(stage AS BIGINT) AS stage, CAST(n_nodes AS BIGINT) AS n_nodes
FROM u
"""
    # the whole curation pipeline as one cumulative funnel; dedup winners
    # are corpus-global (composed over dedup_clusters / contamination_check)
    d["curation_funnel"] = f"""
WITH m AS (
  SELECT doc_id, text, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    len(regexp_extract_all(text, '\\b(the|and|of|to|is|a)\\b')) AS s_en,
    len(regexp_extract_all(text,
        '\\b(der|die|und|ist|das|nicht|ein)\\b')) AS s_de,
    len(regexp_extract_all(text,
        '\\b(le|les|et|est|une|dans|que)\\b')) AS s_fr,
    len(regexp_extract_all(text,
        '\\b(el|los|las|es|una|por|con)\\b')) AS s_es,
    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 1 ELSE 0 END AS cjk
  FROM documents
),
l AS (
  SELECT doc_id, text, source, n_tokens, s_en AS stop_hits,
    CASE WHEN cjk = 1 THEN 'zh'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS pred_lang
  FROM m
),
ew AS (SELECT md5(text) AS h, min(doc_id) AS keep FROM documents GROUP BY 1),
nl AS (SELECT doc_id FROM ({d["dedup_clusters"]}) c
       WHERE doc_id <> cluster_id),
ct AS (SELECT doc_id FROM ({d["contamination_check"]}) t
       WHERE contaminated = 1),
f AS (
  SELECT l.doc_id,
    (n_tokens >= 15 AND n_tokens <= 120
     AND stop_hits * 20 >= n_tokens) AS ok_q,
    (pred_lang = 'en') AS ok_l,
    (ew.keep = l.doc_id) AS ok_e,
    (l.doc_id NOT IN (SELECT doc_id FROM nl)) AS ok_n,
    (l.source <> 'src0'
     AND l.doc_id NOT IN (SELECT doc_id FROM ct)) AS ok_c
  FROM l JOIN ew ON md5(l.text) = ew.h
)
SELECT CAST(stage AS BIGINT) AS stage, CAST(n AS BIGINT) AS n_docs FROM (
  SELECT 1 AS stage, count(*) AS n FROM f
  UNION ALL SELECT 2, count_if(ok_q) FROM f
  UNION ALL SELECT 3, count_if(ok_q AND ok_l) FROM f
  UNION ALL SELECT 4, count_if(ok_q AND ok_l AND ok_e) FROM f
  UNION ALL SELECT 5, count_if(ok_q AND ok_l AND ok_e AND ok_n) FROM f
  UNION ALL SELECT 6,
    count_if(ok_q AND ok_l AND ok_e AND ok_n AND ok_c) FROM f) u
"""
    # integer degree-degree correlation terms over the directed dup edges
    d["assortativity_terms"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
d AS (SELECT a AS node, count(*) AS deg FROM e GROUP BY 1),
j AS (SELECT da.deg AS x, db.deg AS y
      FROM e JOIN d da ON e.a = da.node JOIN d db ON e.b = db.node)
SELECT CAST(count(*) AS BIGINT) AS m_edges,
       CAST(sum(x) AS BIGINT) AS sum_deg,
       CAST(sum(x * x) AS BIGINT) AS sum_deg_sq,
       CAST(sum(x * y) AS BIGINT) AS sum_deg_prod
FROM j
"""
    # exact integer two-sample KS per source vs rest over n_chars
    d["ks_drift_terms"] = """
WITH c AS (SELECT source, n_chars AS v, count(*) AS cnt
           FROM documents GROUP BY 1, 2),
vs AS (SELECT v, sum(cnt) AS cv FROM c GROUP BY 1),
tv AS (SELECT v, sum(cv) OVER (ORDER BY v) AS ct FROM vs),
tot AS (SELECT source, sum(cnt) AS n_s FROM c GROUP BY 1),
nn AS (SELECT sum(cnt) AS n FROM c),
grid AS (SELECT t.source, v.v FROM tot t CROSS JOIN vs v),
j AS (SELECT g.source, g.v, coalesce(c.cnt, 0) AS cnt
      FROM grid g LEFT JOIN c ON c.source = g.source AND c.v = g.v),
cum AS (SELECT source, v,
               sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cs
        FROM j),
x AS (SELECT cum.source, tot.n_s,
             abs(cs * (nn.n - tot.n_s) - (tv.ct - cs) * tot.n_s) AS gap
      FROM cum JOIN tv USING (v) JOIN tot USING (source) CROSS JOIN nn)
SELECT source, CAST(n_s AS BIGINT) AS n_s,
       CAST(max(gap) AS BIGINT) AS d_num,
       CAST(n_s * ((SELECT n FROM nn) - n_s) AS BIGINT) AS d_den
FROM x GROUP BY source, n_s
"""
    # exact integer CUSUM max deviation per event type: dev_t =
    # |n*cum_t - t*tot| over (ts, event_id) order; first index on ties
    d["cusum_changepoint_terms"] = """
WITH e AS (SELECT event_type, ts, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
w AS (SELECT event_type, cents,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY ts, event_id) AS i,
        sum(cents) OVER (PARTITION BY event_type
                         ORDER BY ts, event_id) AS cum
      FROM e),
t AS (SELECT event_type, count(*) AS n, sum(cents) AS tot
      FROM e GROUP BY 1),
x AS (SELECT w.event_type, w.i, abs(t.n * w.cum - w.i * t.tot) AS dev
      FROM w JOIN t USING (event_type)),
m AS (SELECT event_type, max(dev) AS mx FROM x GROUP BY 1)
SELECT t.event_type, CAST(t.n AS BIGINT) AS n_events,
       CAST(t.tot AS BIGINT) AS tot_cents,
       CAST(m.mx AS BIGINT) AS cusum_num,
       CAST((SELECT min(i) FROM x
             WHERE x.event_type = t.event_type AND x.dev = m.mx)
            AS BIGINT) AS t_at_max
FROM t JOIN m USING (event_type)
"""
    # joint (cluster size, internal edges) histogram over dup clusters
    d["cluster_density_histogram"] = f"""
WITH cl AS (SELECT doc_id, cluster_id FROM ({d["dedup_clusters"]}) t),
sz AS (SELECT cluster_id, count(*) AS size FROM cl GROUP BY 1),
pe AS (SELECT cl.cluster_id, count(*) AS n_edges
       FROM ({d["dedup_simhash"]}) p JOIN cl ON p.doc_a = cl.doc_id
       GROUP BY 1)
SELECT CAST(sz.size AS BIGINT) AS size,
       CAST(pe.n_edges AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM sz JOIN pe USING (cluster_id)
GROUP BY 1, 2
"""
    # unordered metadata-language matrix of the near-dup pairs
    d["cross_lang_dup_pairs"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
j AS (SELECT la.lang AS xa, lb.lang AS xb
      FROM pairs p
      JOIN documents la ON p.doc_a = la.doc_id
      JOIN documents lb ON p.doc_b = lb.doc_id)
SELECT least(xa, xb) AS lang_a, greatest(xa, xb) AS lang_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1, 2
"""
    # incremental dedup vs index: new = top 10% of the doc_id range; a
    # match is any simhash pair straddling the cut
    d["incremental_dedup_matches"] = f"""
WITH p AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
cutv AS (SELECT (max(doc_id) + 1) * 90 // 100 AS c FROM documents),
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION ALL SELECT doc_b, doc_a FROM p)
SELECT a AS new_doc, CAST(min(b) AS BIGINT) AS matched_old,
       CAST(count(*) AS BIGINT) AS n_old_matches
FROM e, cutv WHERE a >= cutv.c AND b < cutv.c
GROUP BY 1
"""
    # Kaplan-Meier terms for time-to-repeat-purchase; censoring at the
    # corpus's last order date, durations over DISTINCT order dates
    d["km_repeat_terms"] = """
WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt FROM orders),
mx AS (SELECT max(dt) AS m FROM o),
f1 AS (SELECT o_custkey, min(dt) AS t1 FROM o GROUP BY 1),
f2 AS (SELECT o.o_custkey, min(o.dt) AS t2
       FROM o JOIN f1 USING (o_custkey) WHERE o.dt > f1.t1 GROUP BY 1),
u AS (SELECT f1.o_custkey,
        CASE WHEN f2.t2 IS NULL THEN date_diff('day', f1.t1, mx.m)
             ELSE date_diff('day', f1.t1, f2.t2) END AS dur,
        CASE WHEN f2.t2 IS NULL THEN 0 ELSE 1 END AS ev
      FROM f1 LEFT JOIN f2 USING (o_custkey) CROSS JOIN mx),
c AS (SELECT dur, sum(ev) AS n_event,
             count(*) - sum(ev) AS n_censored, count(*) AS n
      FROM u GROUP BY 1)
SELECT CAST(dur AS BIGINT) AS d_days,
       CAST(n_event AS BIGINT) AS n_event,
       CAST(n_censored AS BIGINT) AS n_censored,
       CAST(sum(n) OVER (ORDER BY dur
                         ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_at_risk
FROM c
"""
    # friends-of-friends: distinct nodes within <= 2 hops, self excluded
    # (UNION is a set union, so dist-1 and dist-2 mates dedup together)
    d["two_hop_reach"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
two AS (
  SELECT e1.a AS node, e2.b AS mate
  FROM e e1 JOIN e e2 ON e1.b = e2.a WHERE e2.b <> e1.a
  UNION
  SELECT a, b FROM e
),
r AS (SELECT node, count(*) AS reach FROM two GROUP BY 1)
SELECT CAST(reach AS BIGINT) AS reach, CAST(count(*) AS BIGINT) AS n_nodes
FROM r GROUP BY 1
"""
    # exact Gini-impurity terms of the per-(user, day) event-type mix
    d["user_day_impurity_terms"] = """
WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type,
                  count(*) AS c
           FROM events GROUP BY 1, 2, 3),
g AS (SELECT user_id, d, sum(c) AS n, sum(c * c) AS ssq
      FROM c GROUP BY 1, 2)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_user_days,
       CAST(sum(ssq) AS BIGINT) AS sum_ssq
FROM g GROUP BY 1
"""
    # integer BM25 terms for a fixed query, top-50 docs per term by
    # (tf DESC, doc_id); tf = RE2 word-boundary match count
    d["bm25_terms"] = """
WITH t(term) AS (SELECT unnest(['merge', 'scan', 'spark', 'window'])),
s AS (SELECT t.term, d.doc_id,
        CAST(len(regexp_extract_all(
            d.text, '\\b' || t.term || '\\b')) AS BIGINT) AS tf,
        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS dl
      FROM documents d CROSS JOIN t),
nz AS (SELECT * FROM s WHERE tf > 0),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM nz GROUP BY 1),
r AS (SELECT nz.term, nz.doc_id, nz.tf, nz.dl, df.df,
        row_number() OVER (PARTITION BY nz.term
                           ORDER BY nz.tf DESC, nz.doc_id) AS rk
      FROM nz JOIN df USING (term))
SELECT term, doc_id, tf, dl, df FROM r WHERE rk <= 50
"""
    # exact heavy hitters above total/40 (MG k=39 guarantees the Ray
    # sketch pass yields a candidate superset; verify pass is exact)
    d["misra_gries_heavy_hitters"] = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM c)
SELECT word, n AS n_occurrences FROM c, t WHERE n * 40 > tot
"""
    # PQ code usage: 4 x 16-dim subspaces, codebook = first-8 vectors,
    # exact int64 L2 on floor(x*1000 + 0.5)-quantized elements
    d["pq_code_histogram"] = """
WITH cb AS (SELECT vec_id AS code, embedding FROM embeddings
            WHERE vec_id < 8),
el AS (
  SELECT e.vec_id, s.s AS subspace, cb.code,
    CAST(floor(CAST(e.embedding[s.s * 16 + u.d + 1] AS DOUBLE)
               * 1000 + 0.5) AS BIGINT) AS x,
    CAST(floor(CAST(cb.embedding[s.s * 16 + u.d + 1] AS DOUBLE)
               * 1000 + 0.5) AS BIGINT) AS y
  FROM embeddings e CROSS JOIN cb,
       unnest(range(0, 4)) AS s(s), unnest(range(0, 16)) AS u(d)),
d0 AS (SELECT vec_id, subspace, code, sum((x - y) * (x - y)) AS dist
       FROM el GROUP BY 1, 2, 3),
a AS (SELECT vec_id, subspace, code,
        row_number() OVER (PARTITION BY vec_id, subspace
                           ORDER BY dist, code) AS rk
      FROM d0)
SELECT CAST(subspace AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM a WHERE rk = 1 GROUP BY 1, 2
"""
    # per-edge common-neighbor (triangle support) count, histogrammed;
    # LEFT JOINs keep support-0 edges
    d["edge_support_histogram"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
sup AS (
  SELECT p.doc_a, p.doc_b, count(y.b) AS s
  FROM pairs p
  LEFT JOIN e x ON x.a = p.doc_a
  LEFT JOIN e y ON y.a = p.doc_b AND y.b = x.b
  GROUP BY 1, 2)
SELECT CAST(s AS BIGINT) AS support, CAST(count(*) AS BIGINT) AS n_edges
FROM sup GROUP BY 1
"""
    # bounded 8-round BFS diameter per component: chained level CTEs
    # (walk sets, DISTINCT per level — a recursive UNION on (src, node,
    # dd) multiplies states along cycles and is ~100x slower); a src
    # that has not reached its whole component by round 8 caps at 8
    d["component_diameter_histogram"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
n0 AS (SELECT DISTINCT a AS node FROM e),
s1 AS (SELECT DISTINCT a AS src, b AS node FROM e),
s2 AS (SELECT DISTINCT s.src, e.b AS node FROM s1 s JOIN e ON e.a = s.node),
s3 AS (SELECT DISTINCT s.src, e.b AS node FROM s2 s JOIN e ON e.a = s.node),
s4 AS (SELECT DISTINCT s.src, e.b AS node FROM s3 s JOIN e ON e.a = s.node),
s5 AS (SELECT DISTINCT s.src, e.b AS node FROM s4 s JOIN e ON e.a = s.node),
s6 AS (SELECT DISTINCT s.src, e.b AS node FROM s5 s JOIN e ON e.a = s.node),
s7 AS (SELECT DISTINCT s.src, e.b AS node FROM s6 s JOIN e ON e.a = s.node),
s8 AS (SELECT DISTINCT s.src, e.b AS node FROM s7 s JOIN e ON e.a = s.node),
lv AS (SELECT node AS src, node, 0 AS dd FROM n0
       UNION ALL SELECT src, node, 1 FROM s1
       UNION ALL SELECT src, node, 2 FROM s2
       UNION ALL SELECT src, node, 3 FROM s3
       UNION ALL SELECT src, node, 4 FROM s4
       UNION ALL SELECT src, node, 5 FROM s5
       UNION ALL SELECT src, node, 6 FROM s6
       UNION ALL SELECT src, node, 7 FROM s7
       UNION ALL SELECT src, node, 8 FROM s8),
md AS (SELECT src, node, min(dd) AS dd FROM lv GROUP BY 1, 2),
cc AS (SELECT doc_id, cluster_id FROM ({d["dedup_clusters"]}) c),
sz AS (SELECT cluster_id, count(*) AS size FROM cc GROUP BY 1),
ecc AS (SELECT md.src, cc.cluster_id,
          CASE WHEN count(*) < max(sz.size) THEN 8
               ELSE max(md.dd) END AS ecc
        FROM md JOIN cc ON cc.doc_id = md.src
        JOIN sz ON sz.cluster_id = cc.cluster_id
        GROUP BY 1, 2),
dia AS (SELECT cluster_id, max(ecc) AS diameter FROM ecc GROUP BY 1)
SELECT CAST(diameter AS BIGINT) AS diameter,
       CAST(count(*) AS BIGINT) AS n_components
FROM dia GROUP BY 1
"""
    # interval-union sweep: gaps-and-islands over [ts, ts+30s) per user;
    # touching intervals (s = prev running max end) merge
    d["interval_coverage"] = """
WITH x AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                  CAST(floor(epoch(ts)) AS BIGINT) + 30 AS e
           FROM events),
o AS (SELECT user_id, s, e,
        max(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS pmax
      FROM x),
f AS (SELECT user_id, s, e,
        CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
      FROM o),
g AS (SELECT user_id, s, e,
        sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS isl
      FROM f),
i AS (SELECT user_id, isl, max(e) - min(s) AS cov, count(*) AS n
      FROM g GROUP BY 1, 2)
SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(cov) AS BIGINT) AS covered_seconds
FROM i GROUP BY 1
"""
    # union of both halves' exact top-20 words with both exact counts
    d["heavy_hitter_drift"] = """
WITH w AS (SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS word
           FROM documents),
c AS (SELECT half, word, CAST(count(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
r AS (SELECT half, word, n,
        row_number() OVER (PARTITION BY half
                           ORDER BY n DESC, word) AS rk
      FROM c),
top AS (SELECT DISTINCT word FROM r WHERE rk <= 20)
SELECT t.word,
       CAST(coalesce(sum(CASE WHEN half = 0 THEN n END), 0) AS BIGINT)
           AS n_even,
       CAST(coalesce(sum(CASE WHEN half = 1 THEN n END), 0) AS BIGINT)
           AS n_odd
FROM top t LEFT JOIN c ON c.word = t.word
GROUP BY 1
"""
    # Newman modularity integer terms over the CC partition (every edge
    # internal by construction, so deg_c = 2 * e_c)
    d["modularity_terms"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
cc AS (SELECT doc_id, cluster_id FROM ({d["dedup_clusters"]}) c),
t AS (SELECT cc.cluster_id, count(*) AS e
      FROM pairs p JOIN cc ON cc.doc_id = p.doc_a GROUP BY 1),
m AS (SELECT sum(e) AS m FROM t)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(e AS BIGINT) AS n_intra_edges,
       CAST(2 * e AS BIGINT) AS sum_deg,
       CAST(m.m AS BIGINT) AS m_edges
FROM t, m
"""
    # bounded 2-round frequency label propagation; argmax vote with
    # (count DESC, label ASC) tie-break each round
    d["lpa_community_histogram"] = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({d["dedup_simhash"]}) t),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
c1 AS (SELECT e.a AS v, e.b AS lab, count(*) AS c FROM e GROUP BY 1, 2),
r1 AS (SELECT v, lab FROM (
         SELECT v, lab, row_number() OVER (PARTITION BY v
                                           ORDER BY c DESC, lab) AS rk
         FROM c1) t WHERE rk = 1),
c2 AS (SELECT e.a AS v, r1.lab AS lab, count(*) AS c
       FROM e JOIN r1 ON r1.v = e.b GROUP BY 1, 2),
r2 AS (SELECT v, lab FROM (
         SELECT v, lab, row_number() OVER (PARTITION BY v
                                           ORDER BY c DESC, lab) AS rk
         FROM c2) t WHERE rk = 1),
sz AS (SELECT lab, count(*) AS size FROM r2 GROUP BY 1)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_communities
FROM sz GROUP BY 1
"""
    # doubled-average-rank Spearman terms; rx = 2*min_rank + ties - 1
    d["spearman_rank_terms"] = """
WITH q AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
           FROM lineitem),
r AS (SELECT
        2 * rank() OVER (ORDER BY x)
            + count(*) OVER (PARTITION BY x) - 1 AS rx,
        2 * rank() OVER (ORDER BY y)
            + count(*) OVER (PARTITION BY y) - 1 AS ry
      FROM q)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(rx) AS BIGINT) AS sum_rx,
       CAST(sum(ry) AS BIGINT) AS sum_ry,
       CAST(sum(rx * ry) AS BIGINT) AS sum_rxy,
       CAST(sum(rx * rx) AS BIGINT) AS sum_rxx,
       CAST(sum(ry * ry) AS BIGINT) AS sum_ryy
FROM r
"""
    # two exact-integer power iterations from the all-ones vector; each
    # iterate rescales by TRUNCATING division by 2^20 (sign * abs-div)
    d["embedding_pca_power_terms"] = """
WITH q AS (SELECT vec_id, CAST(u.d AS BIGINT) AS dim,
             CAST(floor(CAST(embedding[u.d + 1] AS DOUBLE)
                        * 1000 + 0.5) AS BIGINT) AS qv
           FROM embeddings, unnest(range(0, 64)) AS u(d)),
w1 AS (SELECT vec_id, sum(qv) AS w FROM q GROUP BY 1),
v1 AS (SELECT q.dim, sum(q.qv * w1.w) AS v
       FROM q JOIN w1 USING (vec_id) GROUP BY 1),
v1s AS (SELECT dim, CASE WHEN v >= 0 THEN v // 1048576
                         ELSE -((-v) // 1048576) END AS v FROM v1),
w2 AS (SELECT q.vec_id, sum(q.qv * v1s.v) AS w
       FROM q JOIN v1s USING (dim) GROUP BY 1),
v2 AS (SELECT q.dim, sum(q.qv * w2.w) AS v
       FROM q JOIN w2 USING (vec_id) GROUP BY 1)
SELECT dim, CAST(CASE WHEN v >= 0 THEN v // 1048576
                      ELSE -((-v) // 1048576) END AS BIGINT) AS v
FROM v2
"""
    d["media_decode_wav"] = """
SELECT d.doc_id,
       CAST(8000 + (d.doc_id % 5) * 1000 AS BIGINT) AS sample_rate,
       CAST(200 + d.doc_id % 257 AS BIGINT) AS n_samples,
       CAST(MAX(ABS((7 * d.doc_id + 31 * i.i) % 4001 - 2000)) AS BIGINT) AS peak_abs,
       CAST(SUM(ABS((7 * d.doc_id + 31 * i.i) % 4001 - 2000)) AS BIGINT) AS sum_abs,
       CAST(COUNT(*) FILTER (WHERE (7 * d.doc_id + 31 * i.i) % 4001 - 2000 < 0)
            AS BIGINT) AS n_neg
FROM documents d, generate_series(0, 456) i(i)
WHERE d.doc_id % 13 = 0 AND i.i < 200 + d.doc_id % 257
GROUP BY d.doc_id
"""
    d["pii_scrub_stats"] = r"""
WITH laced AS (
  SELECT source,
    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
         || CAST(doc_id % 7 AS VARCHAR) || '.example.com or call +1-555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || CASE WHEN doc_id % 3 = 0
                 THEN ' alt.x' || CAST(doc_id AS VARCHAR) || '@test.org'
                 ELSE '' END AS t
  FROM documents
),
s AS (
  SELECT source,
    len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}')) AS ne,
    len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS np,
    length(t) - length(
      regexp_replace(
        regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
        '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS removed
  FROM laced
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ne) AS BIGINT) AS n_emails,
       CAST(sum(np) AS BIGINT) AS n_phones,
       CAST(sum(removed) AS BIGINT) AS chars_removed
FROM s GROUP BY source
"""
    d["association_rules"] = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS co
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
s AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1)
SELECT CAST(p.part_a AS BIGINT) AS part_a, CAST(p.part_b AS BIGINT) AS part_b,
       CAST(p.co AS BIGINT) AS co_orders,
       CAST(sa.n AS BIGINT) AS n_orders_a, CAST(sb.n AS BIGINT) AS n_orders_b
FROM p
JOIN s sa ON sa.l_partkey = p.part_a
JOIN s sb ON sb.l_partkey = p.part_b
"""
    d["seasonal_naive_error"] = """
WITH daily AS (
  SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
  FROM orders GROUP BY 1
)
SELECT CAST(a.day % 7 AS BIGINT) AS weekday,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(a.c - b.c)) AS BIGINT) AS sum_abs_err_cents
FROM daily a JOIN daily b ON b.day = a.day - 7
GROUP BY 1
"""
    d["partition_boundaries"] = """
WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
           FROM lineitem),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS n
      FROM c)
SELECT CAST(q.q AS BIGINT) AS q, r.v AS boundary_cents
FROM generate_series(1, 15) q(q)
JOIN r ON r.rn = (q.q * r.n + 15) // 16
"""
    d["link_graph_degrees"] = """
SELECT CAST((d.doc_id * 7 + k.k * 13) % 101 AS BIGINT) AS host_id,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_src_docs
FROM documents d JOIN generate_series(0, 4) k(k) ON k.k <= d.doc_id % 5
GROUP BY 1
"""
    d["url_frontier_dedup"] = """
WITH raw AS (
  SELECT doc_id % 53 AS h,
         'https://Host' || CAST(doc_id % 53 AS VARCHAR)
           || '.Example.COM/item/' || CAST(doc_id % 499 AS VARCHAR) AS u
  FROM documents
  UNION ALL
  SELECT doc_id % 53,
         'http://host' || CAST(doc_id % 53 AS VARCHAR)
           || '.example.com/item/' || CAST(doc_id % 499 AS VARCHAR) || '/'
  FROM documents
  UNION ALL
  SELECT doc_id % 53,
         'https://host' || CAST(doc_id % 53 AS VARCHAR)
           || '.example.com/item/' || CAST(doc_id % 499 AS VARCHAR)
           || '?utm_source=feed'
  FROM documents
  UNION ALL
  SELECT doc_id % 53,
         'https://host' || CAST(doc_id % 53 AS VARCHAR)
           || '.example.com/about'
  FROM documents WHERE doc_id % 2 = 0
),
c AS (
  SELECT h,
         regexp_replace(
           replace(replace(lower(u), 'http://', 'https://'),
                   '?utm_source=feed', ''),
           '/$', '') AS cu
  FROM raw
)
SELECT CAST(h AS BIGINT) AS host_id, CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT cu) AS BIGINT) AS n_canonical
FROM c GROUP BY 1
"""
    d["charset_audit"] = """
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) FILTER (WHERE doc_id % 4 = 1) AS BIGINT) AS n_bom_utf8,
  CAST(count(*) FILTER (WHERE doc_id % 4 = 2) AS BIGINT) AS n_bom_utf16,
  CAST(count(*) FILTER (WHERE doc_id % 4 = 0) AS BIGINT) AS n_plain_utf8,
  CAST(count(*) FILTER (WHERE doc_id % 4 = 3) AS BIGINT) AS n_latin1,
  CAST(sum(CASE WHEN doc_id % 4 = 3 THEN strlen(text) + 2
                ELSE length(text) END) AS BIGINT) AS n_chars
FROM documents GROUP BY source
"""
    d["heading_outline"] = """
WITH h AS (
  SELECT d.doc_id, d.source, j.j,
         1 + (d.doc_id * 3 + j.j * j) % 3 AS lvl
  FROM documents d JOIN generate_series(0, 8) j(j) ON j.j < 3 + d.doc_id % 7
),
p AS (
  SELECT source, doc_id, lvl,
         lead(lvl) OVER (PARTITION BY doc_id ORDER BY j) AS nxt
  FROM h
),
m AS (
  SELECT source, doc_id, max(lvl) AS ml, count(*) AS nh,
         sum(CASE WHEN nxt > lvl + 1 THEN 1 ELSE 0 END) AS viol
  FROM p GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nh) AS BIGINT) AS n_headings,
       CAST(sum(ml) AS BIGINT) AS sum_max_level,
       CAST(sum(viol) AS BIGINT) AS n_violations
FROM m GROUP BY 1
"""
    d["redirect_resolve"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
r AS (
  SELECT d.doc_id AS u, d.doc_id AS cur, 0 AS hops FROM documents d
  UNION ALL
  SELECT r.u, CAST((r.cur * 31 + 7) % nn.n AS BIGINT), r.hops + 1
  FROM r, nn JOIN documents c ON c.doc_id = r.cur
  WHERE length(c.text) % 3 = 0 AND r.hops < 8
),
t AS (
  SELECT u, cur, hops,
         row_number() OVER (PARTITION BY u ORDER BY hops DESC) AS rn
  FROM r
)
SELECT CAST(hops AS BIGINT) AS hops, CAST(count(*) AS BIGINT) AS n_chains,
       CAST(sum(cur) AS BIGINT) AS terminal_sum
FROM t WHERE rn = 1 GROUP BY 1
"""
    d["warc_extract"] = """
SELECT CAST(doc_id % 53 AS BIGINT) AS host_id,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(strlen(text)) AS BIGINT) AS body_bytes
FROM documents GROUP BY 1
"""
    d["zip_directory_walk"] = """
SELECT CAST(doc_id // 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(count(*) FILTER (WHERE doc_id % 64 <> 7 OR strlen(text) = 0)
            AS BIGINT) AS n_crc_ok
FROM documents GROUP BY 1
"""
    d["base64_audit"] = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS decoded_bytes,
       CAST(sum(length(text) - length(replace(text, 'e', ''))) AS BIGINT)
         AS n_e_bytes
FROM documents GROUP BY source
"""
    d["robots_rules"] = """
WITH p AS (SELECT doc_id % 53 AS h, doc_id % 10 AS pf FROM documents)
SELECT CAST(h AS BIGINT) AS host_id,
  CAST(sum((CASE WHEN h % 7 = 0 THEN 0 ELSE 1 END)
         + (CASE WHEN h % 3 = 0 AND pf = 3 THEN 1 ELSE 0 END)) AS BIGINT)
    AS n_allowed,
  CAST(sum((CASE WHEN h % 7 = 0 THEN 1 ELSE 0 END)
         + (CASE WHEN h % 3 = 0 AND pf = 3 THEN 0 ELSE 1 END)) AS BIGINT)
    AS n_blocked
FROM p GROUP BY 1
"""
    d["varint_posting_decode"] = """
SELECT d.source, CAST(count(*) AS BIGINT) AS n_vals,
       CAST(sum((d.doc_id * 97 + k.k * 31) % 5000 + 1) AS BIGINT) AS sum_vals
FROM documents d JOIN generate_series(0, 6) k(k) ON k.k < d.doc_id % 6 + 2
GROUP BY 1
"""
    d["mutual_information_terms"] = """
WITH j AS (SELECT lang, source, count(*) AS n_xy FROM documents
           GROUP BY 1, 2),
l AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
s AS (SELECT source, count(*) AS n_source FROM documents GROUP BY 1)
SELECT j.lang, j.source, CAST(j.n_xy AS BIGINT) AS n_xy,
       CAST(l.n_lang AS BIGINT) AS n_lang,
       CAST(s.n_source AS BIGINT) AS n_source,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_total
FROM j JOIN l USING (lang) JOIN s USING (source)
"""
    d["chi_square_terms"] = """
WITH j AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
                  count(*) AS observed
           FROM orders GROUP BY 1, 2),
r AS (SELECT o_orderpriority AS priority, count(*) AS row_total
      FROM orders GROUP BY 1),
c AS (SELECT o_orderstatus AS status, count(*) AS col_total
      FROM orders GROUP BY 1)
SELECT j.priority, j.status, CAST(j.observed AS BIGINT) AS observed,
       CAST(r.row_total AS BIGINT) AS row_total,
       CAST(c.col_total AS BIGINT) AS col_total,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS grand_total
FROM j JOIN r USING (priority) JOIN c USING (status)
"""
    d["feature_hash_collisions"] = """
WITH toks AS (
  SELECT DISTINCT t
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
b AS (
  SELECT (length(t) * 37 + unicode(left(t, 1)) * 101
          + unicode(right(t, 1))) % 256 AS bucket,
         count(*) AS load
  FROM toks GROUP BY 1
)
SELECT CAST(load AS BIGINT) AS load, CAST(count(*) AS BIGINT) AS n_buckets
FROM b GROUP BY 1
"""
    d["regression_normal_terms"] = """
WITH t AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(sum(q) AS BIGINT) AS sum_q, CAST(sum(d) AS BIGINT) AS sum_d,
  CAST(sum(y) AS BIGINT) AS sum_y,
  CAST(sum(q * q) AS BIGINT) AS sum_qq,
  CAST(sum(q * d) AS BIGINT) AS sum_qd,
  CAST(sum(d * d) AS BIGINT) AS sum_dd,
  CAST(sum(q * y) AS BIGINT) AS sum_qy,
  CAST(sum(d * y) AS BIGINT) AS sum_dy,
  CAST(sum((y // 65536) * (y // 65536)) AS BIGINT) AS sum_yhyh,
  CAST(sum((y // 65536) * (y % 65536)) AS BIGINT) AS sum_yhyl,
  CAST(sum((y % 65536) * (y % 65536)) AS BIGINT) AS sum_ylyl
FROM t
"""
    d["calibration_bins"] = """
SELECT CAST(n_chars % 10 AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE text LIKE '%spark%') AS BIGINT) AS n_pos
FROM documents GROUP BY 1
"""
    d["sitemap_parse"] = """
SELECT CAST(doc_id % 53 AS BIGINT) AS host_id,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(max(19000 + doc_id % 365) AS BIGINT) AS max_lastmod_day,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids
FROM documents GROUP BY 1
"""
    d["http_header_parse"] = """
WITH h AS (
  SELECT CASE WHEN doc_id % 29 = 0 THEN 301
              WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS status,
         (doc_id % 7) * 3600 AS ma,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS u8
  FROM documents
)
SELECT CAST(status AS BIGINT) AS status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(ma) AS BIGINT) AS sum_max_age,
       CAST(sum(u8) AS BIGINT) AS n_utf8
FROM h GROUP BY 1
"""
    d["anchor_text_index"] = """
SELECT string_split(d.text, ' ')[
         CAST((d.doc_id + k.k) % len(string_split(d.text, ' ')) AS INT) + 1
       ] AS token,
       CAST((d.doc_id * 7 + k.k * 13) % 101 AS BIGINT) AS host_id,
       CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN generate_series(0, 4) k(k) ON k.k <= d.doc_id % 5
GROUP BY 1, 2
"""
    d["canonical_meta_dedup"] = """
WITH c AS (SELECT doc_id % 201 AS t, count(*) AS sz FROM documents
           GROUP BY 1)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM c GROUP BY 1
"""
    d["gzip_transfer_decode"] = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE doc_id % 31 <> 0) AS BIGINT) AS n_ok,
       CAST(count(*) FILTER (WHERE doc_id % 31 = 0) AS BIGINT) AS n_corrupt,
       CAST(coalesce(sum(strlen(text)) FILTER (WHERE doc_id % 31 <> 0), 0)
            AS BIGINT) AS decoded_bytes
FROM documents GROUP BY source
"""
    d["csv_dialect_parse"] = """
SELECT CAST(doc_id // 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id % 1000) AS BIGINT) AS sum_val,
       CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
         AS n_quoted_commas,
       CAST(sum(CASE WHEN doc_id % 5 = 0
                     THEN 13 + length(CAST(doc_id AS VARCHAR))
                     ELSE 5 END) AS BIGINT) AS sum_note_len
FROM documents GROUP BY 1
"""
    d["log_line_parse"] = """
WITH l AS (
  SELECT CASE WHEN doc_id % 23 = 0 THEN 500
              WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS status,
         '10.' || CAST(doc_id % 3 AS VARCHAR) || '.'
           || CAST(doc_id % 5 AS VARCHAR) || '.'
           || CAST(doc_id % 7 AS VARCHAR) AS ip,
         n_chars
  FROM documents
)
SELECT CAST(status AS BIGINT) AS status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_bytes,
       CAST(count(DISTINCT ip) AS BIGINT) AS n_ips
FROM l GROUP BY 1
"""
    d["ini_config_parse"] = """
WITH s AS (
  SELECT d.doc_id, j.j
  FROM documents d JOIN generate_series(0, 2) j(j) ON j.j <= d.doc_id % 3
),
k AS (
  SELECT 'sec' || CAST(s.j AS VARCHAR) AS section,
         (s.doc_id * 7 + s.j * 13 + i.i * 31) % 100 AS v
  FROM s JOIN generate_series(0, 3) i(i) ON i.i < (s.doc_id + s.j) % 4
)
SELECT section, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(v) AS BIGINT) AS sum_val
FROM k GROUP BY 1
"""
    d["markdown_structure"] = """
SELECT source,
       CAST(sum(doc_id % 4 + 1) AS BIGINT) AS n_headings,
       CAST(count(*) FILTER (WHERE doc_id % 2 = 0) AS BIGINT)
         AS n_code_blocks,
       CAST(coalesce(sum(doc_id % 6 + 2) FILTER (WHERE doc_id % 2 = 0), 0)
            AS BIGINT) AS n_code_lines
FROM documents GROUP BY source
"""
    d["parquet_footer_audit"] = """
SELECT 'l_extendedprice' AS col_name,
       CAST(floor(min(l_extendedprice) * 100 + 0.5) AS BIGINT) AS min_cents,
       CAST(floor(max(l_extendedprice) * 100 + 0.5) AS BIGINT) AS max_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
UNION ALL
SELECT 'l_quantity',
       CAST(floor(min(l_quantity) * 100 + 0.5) AS BIGINT),
       CAST(floor(max(l_quantity) * 100 + 0.5) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM lineitem
"""
    d["media_decode_bmp"] = """
SELECT d.doc_id,
       CAST(3 + d.doc_id % 6 AS BIGINT) AS width,
       CAST(2 + d.doc_id % 5 AS BIGINT) AS height,
       CAST(sum((d.doc_id + 3 * x.x + 7 * y.y) % 256) AS BIGINT) AS sum_b,
       CAST(sum((2 * d.doc_id + x.x) % 256) AS BIGINT) AS sum_g,
       CAST(sum((x.x * y.y + d.doc_id) % 256) AS BIGINT) AS sum_r
FROM documents d
JOIN generate_series(0, 8) x(x) ON x.x < 3 + d.doc_id % 6
JOIN generate_series(0, 6) y(y) ON y.y < 2 + d.doc_id % 5
WHERE d.doc_id % 11 = 0
GROUP BY 1
"""
    d["media_jpeg_dimensions"] = """
SELECT doc_id, CAST(100 + doc_id % 900 AS BIGINT) AS width,
       CAST(50 + doc_id % 450 AS BIGINT) AS height,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_segments
FROM documents WHERE doc_id % 19 = 0
"""
    d["media_tiff_ifd"] = """
SELECT doc_id, CAST(16 + doc_id % 1000 AS BIGINT) AS width,
       CAST(16 + doc_id % 800 AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 16 ELSE 8 END AS BIGINT) AS bits,
       CAST(doc_id % 2 AS BIGINT) AS big_endian
FROM documents WHERE doc_id % 23 = 0
"""
    d["media_mp3_frames"] = """
WITH fr AS (
  SELECT d.doc_id,
    ([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320])
      [2 + (d.doc_id + f.f) % 14] AS br,
    ([44100,48000,32000])[1 + d.doc_id % 3] AS sr,
    (d.doc_id + f.f) % 2 AS pad
  FROM documents d JOIN generate_series(0, 7) f(f) ON f.f <= d.doc_id % 8
  WHERE d.doc_id % 29 = 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(br) AS BIGINT) AS kbps_sum,
       CAST(sum(144 * br * 1000 // sr + pad) AS BIGINT) AS total_bytes
FROM fr GROUP BY 1
"""
    d["media_id3_tags"] = """
SELECT doc_id,
       CAST(35 + length(CAST(doc_id AS VARCHAR))
            + length(CAST(doc_id % 50 AS VARCHAR)) AS BIGINT) AS tag_size,
       CAST(2 AS BIGINT) AS n_frames,
       CAST(6 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS title_len,
       CAST(7 + length(CAST(doc_id % 50 AS VARCHAR)) AS BIGINT)
         AS artist_len
FROM documents WHERE doc_id % 37 = 0
"""
    d["spatial_grid_bin"] = """
WITH p AS (
  SELECT (doc_id * 7777777) % 180000000 AS lat,
         (doc_id * 12345679) % 360000000 AS lon
  FROM documents
)
SELECT CAST(lat // 10000000 AS BIGINT) AS cell_lat,
       CAST(lon // 10000000 AS BIGINT) AS cell_lon,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(lat) AS BIGINT) AS sum_lat,
       CAST(sum(lon) AS BIGINT) AS sum_lon,
       CAST(count(*) FILTER (
         WHERE (lat - 90000000) * (lat - 90000000)
             + (lon - 180000000) * (lon - 180000000)
             <= CAST(30000000 AS BIGINT) * 30000000) AS BIGINT) AS n_near
FROM p GROUP BY 1, 2
"""
    d["xor_parity_blocks"] = """
SELECT CAST(doc_id // 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(strlen(text)) AS BIGINT) AS parity_len,
       CAST(bit_xor(unicode(left(text, 1))) AS BIGINT) AS parity_first_byte
FROM documents GROUP BY 1
"""
    d["content_manifest_digest"] = """
SELECT CAST(doc_id // 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(md5(text), '' ORDER BY doc_id)) AS digest
FROM documents GROUP BY 1
"""
    d["rle_run_audit"] = """
WITH o AS (
  SELECT o_orderstatus AS f,
         lag(o_orderstatus) OVER (ORDER BY o_orderkey) AS pf
  FROM orders
)
SELECT f AS flag,
       CAST(count(*) FILTER (WHERE pf IS NULL OR pf <> f) AS BIGINT)
         AS n_runs,
       CAST(count(*) AS BIGINT) AS n_rows
FROM o GROUP BY 1
"""
    d["text_diff_stats"] = """
WITH t AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n
           FROM documents),
p AS (
  SELECT t.source, t.doc_id, t.n,
         count(*) FILTER (WHERE (t.doc_id + g.g) % 7 = 0) AS ch
  FROM t JOIN generate_series(0, 511) g(g) ON g.g < t.n
  GROUP BY 1, 2, 3
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n - ch) AS BIGINT) AS n_equal_tokens,
       CAST(sum(ch) AS BIGINT) AS n_changed_tokens
FROM p GROUP BY 1
"""
    d["dictionary_compression_audit"] = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
             FROM documents),
cnt AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
top AS (
  SELECT source, t FROM (
    SELECT source, t,
           row_number() OVER (PARTITION BY source
                              ORDER BY c DESC, t) AS rn
    FROM cnt
  ) WHERE rn <= 16
)
SELECT tok.source,
       CAST(count(*) FILTER (WHERE top.t IS NOT NULL) AS BIGINT)
         AS n_dict_hits,
       CAST(count(*) FILTER (WHERE top.t IS NULL) AS BIGINT) AS n_literals
FROM tok LEFT JOIN top ON top.source = tok.source AND top.t = tok.t
GROUP BY 1
"""
    d["zorder_locality_audit"] = """
WITH p AS (
  SELECT ((doc_id * 7777777) % 180000000) // 10000000 AS cl,
         ((doc_id * 12345679) % 360000000) // 10000000 AS cn
  FROM documents
),
z AS (
  SELECT cl, cn,
    ((cl // 1) % 2) * 1 + ((cn // 1) % 2) * 2
    + ((cl // 2) % 2) * 4 + ((cn // 2) % 2) * 8
    + ((cl // 4) % 2) * 16 + ((cn // 4) % 2) * 32
    + ((cl // 8) % 2) * 64 + ((cn // 8) % 2) * 128
    + ((cl // 16) % 2) * 256 + ((cn // 16) % 2) * 512
    + ((cl // 32) % 2) * 1024 + ((cn // 32) % 2) * 2048 AS zkey
  FROM p
)
SELECT CAST(zkey // 16 AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT cl * 64 + cn) AS BIGINT) AS n_cells
FROM z GROUP BY 1
"""
    d["compaction_plan"] = """
WITH s AS (
  SELECT source, n_chars,
         COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM documents)
SELECT source, CAST(before // 4096 AS BIGINT) AS group_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY 1, 2
"""
    d["shard_skew_audit"] = """
SELECT CAST((doc_id * 2654435761) % 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""
    d["doc_stitch_pairs"] = r"""
WITH k AS (
  SELECT source,
         regexp_extract(text, '^(\S+ \S+)', 1) AS head,
         regexp_extract(text, '(\S+ \S+)$', 1) AS tail
  FROM documents),
h AS (SELECT head AS key, source, count(*) AS n FROM k
      WHERE head <> '' GROUP BY 1, 2),
t AS (SELECT tail AS key, source, count(*) AS n FROM k
      WHERE tail <> '' GROUP BY 1, 2),
d AS (SELECT source, count(*) AS n FROM k
      WHERE head <> '' AND head = tail GROUP BY 1),
x AS (SELECT t.source AS source_a, h.source AS source_b,
             SUM(t.n * h.n) AS np
      FROM t JOIN h ON t.key = h.key GROUP BY 1, 2)
SELECT source_a, source_b, CAST(SUM(np) AS BIGINT) AS n_pairs FROM (
  SELECT * FROM x UNION ALL SELECT source, source, -n FROM d
) GROUP BY 1, 2 HAVING SUM(np) > 0
"""
    d["nearest_hub_assign"] = """
WITH p AS (SELECT c_custkey, (c_custkey * 2654435761) % 1024 AS x,
                  (c_custkey * 40503) % 1024 AS y FROM customer),
hubs(hub_id, hx, hy) AS (VALUES
  (0,128,128),(1,128,896),(2,896,128),(3,896,896),
  (4,512,512),(5,128,512),(6,896,512),(7,512,128)),
d AS (SELECT p.c_custkey, h.hub_id,
             (x-hx)*(x-hx) + (y-hy)*(y-hy) AS dist
      FROM p CROSS JOIN hubs h),
best AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY c_custkey
                               ORDER BY dist, hub_id) AS rn FROM d
) WHERE rn = 1)
SELECT CAST(hub_id AS BIGINT) AS hub_id,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(dist) AS BIGINT) AS sum_sqdist
FROM best GROUP BY 1
"""
    d["source_report_card"] = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents GROUP BY 1
"""
    d["join_stats_audit"] = """
WITH l AS (SELECT o_orderkey AS key, count(*) AS nl FROM orders GROUP BY 1),
r AS (SELECT l_orderkey AS key, count(*) AS nr FROM lineitem GROUP BY 1),
f AS (SELECT COALESCE(l.key, r.key) AS key, COALESCE(nl, 0) AS nl,
             COALESCE(nr, 0) AS nr
      FROM l FULL OUTER JOIN r ON l.key = r.key)
SELECT CAST(count(*) FILTER (WHERE nl > 0) AS BIGINT) AS n_keys_left,
       CAST(count(*) FILTER (WHERE nr > 0) AS BIGINT) AS n_keys_right,
       CAST(count(*) FILTER (WHERE nl > 0 AND nr > 0) AS BIGINT)
         AS n_keys_both,
       CAST(count(*) FILTER (WHERE nl > 0 AND nr = 0) AS BIGINT)
         AS n_left_only,
       CAST(count(*) FILTER (WHERE nl = 0 AND nr > 0) AS BIGINT)
         AS n_right_only,
       CAST(COALESCE(sum(nl * nr) FILTER (WHERE nl > 0 AND nr > 0), 0)
         AS BIGINT) AS join_rows,
       CAST(COALESCE(max(nl * nr) FILTER (WHERE nl > 0 AND nr > 0), 0)
         AS BIGINT) AS max_fanout
FROM f
"""
    d["stratified_kfold_assign"] = """
WITH d AS (SELECT lang, n_chars,
  (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 5 AS fold
  FROM documents)
SELECT lang, CAST(fold AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM d GROUP BY 1, 2
"""
    d["tokenizer_fertility_terms"] = """
WITH t AS (SELECT lang,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
  CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
    AS BIGINT) AS bpe
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ws) AS BIGINT) AS sum_ws_tokens,
       CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
       CAST(sum(bpe) * 1000000 // sum(ws) AS BIGINT) AS fertility_ppm
FROM t GROUP BY 1
"""
    d["fold_leakage_audit"] = """
WITH d AS (SELECT doc_id, text,
  (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 3 AS fold
  FROM documents),
ws AS (SELECT fold, string_split(text, ' ') AS w FROM d),
sh AS (SELECT DISTINCT fold, array_to_string(w[u.i:u.i+2], ' ') AS shingle
       FROM ws, unnest(range(1, len(w) - 1)) AS u(i))
SELECT CAST(a.fold AS BIGINT) AS fold_a, CAST(b.fold AS BIGINT) AS fold_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.fold < b.fold
GROUP BY 1, 2
"""
    d["id_gap_audit"] = """
WITH d AS (SELECT source, doc_id,
  doc_id - lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) - 1 AS gap
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id,
       CAST(count(*) FILTER (WHERE gap > 0) AS BIGINT) AS n_gaps,
       CAST(COALESCE(sum(gap) FILTER (WHERE gap > 0), 0) AS BIGINT)
         AS sum_gap
FROM d GROUP BY 1
"""
    d["sole_late_supplier_blame"] = """
WITH j AS (SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
            max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS late
     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
     GROUP BY 1, 2),
b AS (SELECT ok, min(sk) FILTER (WHERE late = 1) AS blamed
      FROM j GROUP BY ok
      HAVING count(*) >= 2 AND count(*) FILTER (WHERE late = 1) = 1)
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_blamed_orders
FROM b JOIN supplier s ON b.blamed = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""
    d["frequent_brand_triples"] = """
WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, c.p_brand AS brand_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
          JOIN ob c ON a.l_orderkey = c.l_orderkey AND b.p_brand < c.p_brand
GROUP BY 1, 2, 3 HAVING count(*) >= 3
"""
    d["parts_never_shipped"] = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
  CAST(count(*) FILTER (WHERE p_partkey NOT IN
    (SELECT l_partkey FROM lineitem)) AS BIGINT) AS n_never_shipped
FROM part GROUP BY 1
"""
    d["event_inversion_count"] = """
WITH inv AS (
 SELECT a.user_id, count(*) AS n_inv
 FROM events a JOIN events b ON a.user_id = b.user_id
   AND a.event_id < b.event_id AND a.ts > b.ts
 GROUP BY 1)
SELECT CAST(e.user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(COALESCE(max(i.n_inv), 0) AS BIGINT) AS n_inversions
FROM events e LEFT JOIN inv i ON e.user_id = i.user_id GROUP BY 1
"""
    d["tar_member_walk"] = """
WITH m AS (
  SELECT d.doc_id, s.m, 10 + (d.doc_id * 7 + s.m * 13) % 90 AS size
  FROM documents d JOIN generate_series(0, 3) s(m) ON s.m < 1 + d.doc_id % 4
  WHERE d.doc_id % 7 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_members,
  CAST(sum(size) AS BIGINT) AS total_payload,
  CAST(sum(size * ((doc_id + m) % 256)) AS BIGINT) AS payload_byte_sum,
  CAST(sum(doc_id * 100 + m) AS BIGINT) AS mtime_sum
FROM m GROUP BY 1
"""
    d["decayed_event_mass"] = """
WITH a AS (SELECT CAST(max(ts) AS DATE) AS anchor FROM events),
e AS (SELECT event_type, date_diff('day', CAST(ts AS DATE), anchor) AS age
      FROM events, a)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(*) FILTER (WHERE age <= 30) AS BIGINT) AS n_recent,
  CAST(COALESCE(sum(1::BIGINT << (30 - age)) FILTER (WHERE age <= 30), 0)
    AS BIGINT) AS decayed_mass
FROM e GROUP BY 1
"""
    d["value_log2_histogram"] = """
WITH e AS (SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
b AS (SELECT event_type,
        CASE WHEN cents < 1 THEN -1 ELSE s.b END AS bucket, cents
      FROM e LEFT JOIN generate_series(0, 40) s(b)
        ON cents >= (1::BIGINT << s.b) AND cents < (1::BIGINT << (s.b + 1))
      WHERE cents < 1 OR s.b IS NOT NULL)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY 1, 2
"""
    d["scd2_intervals"] = """
WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(ts AS TIMESTAMP) AS ts, event_id,
             LEAST(CAST(floor(value * 100 + 0.5) AS BIGINT) // 2000, 4)
               AS seg FROM events),
o AS (SELECT *, lag(seg) OVER (PARTITION BY user_id
        ORDER BY ts, event_id) AS prev_seg FROM e),
s AS (SELECT *, count(*) FILTER (WHERE prev_seg IS NULL
        OR seg <> prev_seg)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS run_id FROM o),
r AS (SELECT user_id, run_id, min(seg) AS segment,
             min(ts) AS valid_from, max(ts) AS run_last
      FROM s GROUP BY 1, 2)
SELECT user_id, CAST(segment AS BIGINT) AS segment, valid_from,
       COALESCE(lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY run_id), run_last)
         AS valid_to
FROM r
"""
    d["alert_debounce_tumbling"] = """
WITH q AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
           FROM events
           WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) >= 5000),
a AS (SELECT user_id, sec // 604800 AS w, min(sec) AS alert_sec
      FROM q GROUP BY 1, 2)
SELECT q2.user_id, CAST(q2.n_qualifying AS BIGINT) AS n_qualifying,
       CAST(a2.n_alerts AS BIGINT) AS n_alerts,
       CAST(a2.first_alert_sec AS BIGINT) AS first_alert_sec
FROM (SELECT user_id, count(*) AS n_qualifying FROM q GROUP BY 1) q2
JOIN (SELECT user_id, count(*) AS n_alerts,
             min(alert_sec) AS first_alert_sec FROM a GROUP BY 1) a2
USING (user_id)
"""
    d["watermark_drop_audit"] = """
WITH p AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
             max(CAST(ts AS TIMESTAMP)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(*) FILTER (WHERE wm IS NOT NULL
    AND ts < wm - INTERVAL 3600 SECOND) AS BIGINT) AS n_dropped
FROM p GROUP BY 1
"""
    d["lww_merge_audit"] = """
WITH last AS (SELECT user_id, event_type,
  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
 CAST(count(*) FILTER (WHERE event_type <> 'error') AS BIGINT) AS n_live,
 CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_deleted,
 CAST(COALESCE(sum(cents) FILTER (WHERE event_type <> 'error'), 0)
   AS BIGINT) AS sum_live_cents
FROM last WHERE rn = 1
"""
    d["partition_prune_audit"] = """
WITH z AS (SELECT CAST(ts AS DATE) AS day,
             min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS mn,
             max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS mx,
             count(*) AS n
           FROM events GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_partitions,
 CAST(count(*) FILTER (WHERE mx >= 2000 AND mn <= 2500) AS BIGINT)
   AS n_scanned,
 CAST(count(*) FILTER (WHERE NOT (mx >= 2000 AND mn <= 2500)) AS BIGINT)
   AS n_pruned,
 CAST(COALESCE(sum(n) FILTER (WHERE mx >= 2000 AND mn <= 2500), 0)
   AS BIGINT) AS rows_scanned,
 CAST(sum(n) AS BIGINT) AS rows_total
FROM z
"""
    d["regex_route_counts"] = """
SELECT source,
  CASE WHEN regexp_matches(text, 'spark') THEN 'spark'
       WHEN regexp_matches(text, 'window') THEN 'window'
       WHEN regexp_matches(text, 'join') THEN 'join'
       WHEN regexp_matches(text, 'scan') THEN 'scan'
       ELSE 'none' END AS route,
  CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""
    d["label_source_contingency"] = """
SELECT d.source, CAST(e.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY 1, 2
"""
    d["embedding_coverage_audit"] = """
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) FILTER (WHERE d.doc_id NOT IN
    (SELECT vec_id FROM embeddings WHERE label <> 9)) AS BIGINT)
    AS n_missing
FROM documents d GROUP BY 1
"""
    d["textlen_label_corr_terms"] = """
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(sum(d.n_chars) AS BIGINT) AS sum_x,
  CAST(sum(e.label) AS BIGINT) AS sum_y,
  CAST(sum(d.n_chars * e.label) AS BIGINT) AS sum_xy,
  CAST(sum(d.n_chars * d.n_chars) AS BIGINT) AS sum_xx,
  CAST(sum(e.label * e.label) AS BIGINT) AS sum_yy
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""
    d["bipartite_projection_weights"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM ut a JOIN ut b ON a.user_id = b.user_id
  AND a.event_type < b.event_type
GROUP BY 1, 2
"""
    d["brand_quartile_band_join"] = """
WITH p AS (SELECT p_partkey, p_brand,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
           FROM part),
r AS (SELECT p_brand, cents,
        row_number() OVER (PARTITION BY p_brand ORDER BY cents) - 1 AS rk,
        count(*) OVER (PARTITION BY p_brand) AS n FROM p),
b AS (SELECT p_brand,
        max(CASE WHEN rk = (n - 1) * 1 // 4 THEN cents END) AS q1,
        max(CASE WHEN rk = (n - 1) * 2 // 4 THEN cents END) AS q2,
        max(CASE WHEN rk = (n - 1) * 3 // 4 THEN cents END) AS q3
      FROM r GROUP BY 1),
j AS (SELECT p.p_brand,
        (CASE WHEN p.cents > b.q1 THEN 1 ELSE 0 END
         + CASE WHEN p.cents > b.q2 THEN 1 ELSE 0 END
         + CASE WHEN p.cents > b.q3 THEN 1 ELSE 0 END) AS quartile,
        CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS rev
      FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey
      JOIN b ON p.p_brand = b.p_brand)
SELECT p_brand, CAST(quartile AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(rev) AS BIGINT) AS revenue_cents
FROM j GROUP BY 1, 2
"""
    d["source_lang_purity"] = """
WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
t AS (SELECT source, sum(n) AS n_docs FROM c GROUP BY 1),
m AS (SELECT source, lang AS majority_lang, n AS majority_n,
        row_number() OVER (PARTITION BY source
                           ORDER BY n DESC, lang ASC) AS rn FROM c)
SELECT m.source, CAST(t.n_docs AS BIGINT) AS n_docs, m.majority_lang,
       CAST(m.majority_n AS BIGINT) AS majority_n,
       CAST(m.majority_n * 1000000 // t.n_docs AS BIGINT) AS purity_ppm
FROM m JOIN t USING (source) WHERE rn = 1
"""
    d["hist_intersection_matrix"] = """
WITH c AS (
  SELECT source, u.t AS t, count(*) AS n
  FROM (SELECT source, string_split(text, ' ') AS w FROM documents),
       unnest(w) AS u(t)
  GROUP BY 1, 2)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum(least(a.n, b.n)) AS BIGINT) AS intersection
FROM c a JOIN c b ON a.t = b.t AND a.source < b.source
GROUP BY 1, 2
"""
    d["length_emd_matrix"] = """
WITH h AS (SELECT source, least(n_chars // 50, 63) AS bin, count(*) AS n
           FROM documents GROUP BY 1, 2),
d AS (SELECT s.source, g.b AS bin, COALESCE(h.n, 0) AS n
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN generate_series(0, 63) g(b)
      LEFT JOIN h ON h.source = s.source AND h.bin = g.b),
c AS (SELECT source, bin,
        (sum(n) OVER (PARTITION BY source ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) * 1000000)
        // (sum(n) OVER (PARTITION BY source)) AS cum_ppm
      FROM d)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum(abs(a.cum_ppm - b.cum_ppm)) AS BIGINT) AS emd_ppm
FROM c a JOIN c b ON a.bin = b.bin AND a.source < b.source
GROUP BY 1, 2
"""
    d["quota_largest_remainder"] = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
t AS (SELECT sum(n) AS total FROM c),
a AS (SELECT source, n, (n * 100) // total AS base,
             (n * 100) % total AS rem FROM c, t),
l AS (SELECT 100 - sum(base) AS leftover FROM a),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
      FROM a)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                        THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
"""
    d["cdc_chunk_stats"] = """
WITH pos AS (
  SELECT doc_id, u.i AS i, ascii(substr(text, u.i + 1, 1)) AS c,
         len(text) AS n
  FROM documents, unnest(range(0, len(text))) AS u(i)),
w AS (SELECT doc_id, i, n,
        c + lag(c, 1) OVER ww + lag(c, 2) OVER ww + lag(c, 3) OVER ww AS s
      FROM pos WINDOW ww AS (PARTITION BY doc_id ORDER BY i)),
b AS (SELECT doc_id, i FROM w
      WHERE i >= 3 AND i < n - 1 AND s % 32 = 0)
SELECT d.doc_id,
       CAST(count(b.i) + 1 AS BIGINT) AS n_chunks,
       CAST(COALESCE(min(b.i), -1) AS BIGINT) AS first_boundary
FROM documents d LEFT JOIN b ON d.doc_id = b.doc_id
GROUP BY 1
"""
    d["prefix_trie_fanout"] = """
WITH words AS (SELECT DISTINCT u.w AS w
  FROM (SELECT string_split(text, ' ') AS ws FROM documents),
       unnest(ws) AS u(w)),
p AS (SELECT g.l AS prefix_len, substr(w, 1, g.l) AS prefix
      FROM words CROSS JOIN generate_series(1, 3) g(l)),
c AS (SELECT prefix_len, prefix, count(*) AS fanout
      FROM p GROUP BY 1, 2)
SELECT CAST(prefix_len AS BIGINT) AS prefix_len,
       CAST(count(*) AS BIGINT) AS n_prefixes,
       CAST(sum(fanout) AS BIGINT) AS n_words,
       CAST(max(fanout) AS BIGINT) AS max_fanout
FROM c GROUP BY 1
"""
    d["quantile_sketch_error_audit"] = """
WITH h AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 8192
             AS bin, count(*) AS n FROM orders GROUP BY 1),
c AS (SELECT bin, sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        AS cum FROM h),
t AS (SELECT sum(n) AS total FROM h),
q AS (SELECT unnest([25, 50, 75, 90, 99]) AS q),
tr AS (SELECT q.q, (t.total - 1) * q.q // 100 + 1 AS target FROM q, t),
best AS (SELECT tr.q, tr.target, min(c.bin) AS bin
         FROM tr JOIN c ON c.cum >= tr.target GROUP BY 1, 2),
j AS (SELECT b.q, b.target, b.bin, c.cum FROM best b
      JOIN c ON c.bin = b.bin)
SELECT CAST(j.q AS BIGINT) AS q,
       CAST((j.bin + 1) * 8192 - 1 AS BIGINT) AS approx_value_cents,
       CAST(j.target AS BIGINT) AS target_rank,
       CAST(j.cum AS BIGINT) AS achieved_rank,
       CAST(abs(j.cum - j.target) * 1000000 // t.total AS BIGINT)
         AS rank_error_ppm
FROM j, t
"""
    d["stock_dip_audit"] = """
WITH l AS (SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
             CASE WHEN l_returnflag = 'R'
                  THEN -CAST(floor(l_quantity + 0.5) AS BIGINT)
                  ELSE CAST(floor(l_quantity + 0.5) AS BIGINT) END AS s
           FROM lineitem),
r AS (SELECT l_partkey, s,
        sum(s) OVER (PARTITION BY l_partkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS bal
      FROM l),
p AS (SELECT l_partkey, min(bal) AS min_bal,
             sum(s) AS final FROM r GROUP BY 1)
SELECT pt.p_brand, CAST(count(*) AS BIGINT) AS n_parts,
  CAST(count(*) FILTER (WHERE p.min_bal < 0) AS BIGINT) AS n_dip_parts,
  CAST(sum(p.final) AS BIGINT) AS final_balance_sum
FROM p JOIN part pt ON p.l_partkey = pt.p_partkey
GROUP BY 1
"""
    d["sla_band_by_priority"] = """
WITH d AS (SELECT l.l_orderkey, o.o_orderpriority,
             max(date_diff('day', o.o_orderdate, l.l_shipdate)) AS delay
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1, 2)
SELECT o_orderpriority,
  CAST((CASE WHEN delay > 30 THEN 1 ELSE 0 END
      + CASE WHEN delay > 60 THEN 1 ELSE 0 END
      + CASE WHEN delay > 90 THEN 1 ELSE 0 END) AS BIGINT) AS band,
  CAST(count(*) AS BIGINT) AS n_orders
FROM d GROUP BY 1, 2
"""
    d["negative_sampling_audit"] = """
WITH t AS (SELECT count(*) AS n FROM documents),
neg AS (SELECT d.doc_id, d.source AS anchor_source,
          (d.doc_id * 48271 + g.j * 2654435761) % t.n AS neg_id
        FROM documents d CROSS JOIN generate_series(1, 4) g(j), t),
r AS (SELECT neg.anchor_source, neg.neg_id,
        CASE WHEN neg.neg_id = neg.doc_id THEN 1 ELSE 0 END AS is_self,
        CASE WHEN d2.source = neg.anchor_source THEN 1 ELSE 0 END AS same
      FROM neg JOIN documents d2 ON neg.neg_id = d2.doc_id)
SELECT anchor_source AS source, CAST(count(*) AS BIGINT) AS n_negatives,
  CAST(sum(same) AS BIGINT) AS n_same_source,
  CAST(sum(is_self) AS BIGINT) AS n_self
FROM r GROUP BY 1
"""
    d["shuffle_displacement_audit"] = """
WITH h AS (SELECT doc_id, source,
             (doc_id * 2654435761) % 2147483648 AS hv FROM documents),
r AS (SELECT source, doc_id,
        row_number() OVER (ORDER BY hv, doc_id) - 1 AS rank FROM h)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(abs(rank - doc_id)) AS BIGINT) AS sum_displacement,
  CAST(max(abs(rank - doc_id)) AS BIGINT) AS max_displacement
FROM r GROUP BY 1
"""
    d["nation_top_spenders_ties"] = """
WITH s AS (SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             AS BIGINT)) AS BIGINT) AS spend FROM orders GROUP BY 1),
j AS (SELECT c.c_nationkey AS nationkey, s.o_custkey AS c_custkey,
             s.spend FROM s JOIN customer c ON s.o_custkey = c.c_custkey),
r AS (SELECT *, rank() OVER (PARTITION BY nationkey
                             ORDER BY spend DESC) AS rk FROM j)
SELECT CAST(nationkey AS BIGINT) AS nationkey,
       CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(spend AS BIGINT) AS spend_cents
FROM r WHERE rk = 1
"""
    d["k_anonymity_audit"] = """
WITH c AS (SELECT c_nationkey,
    (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) // 100000
      AS band,
    count(*) AS n FROM customer GROUP BY 1, 2),
sb AS (SELECT c.n, s.b FROM c JOIN generate_series(0, 40) s(b)
        ON c.n >= (1::BIGINT << s.b) AND c.n < (1::BIGINT << (s.b + 1)))
SELECT CAST(b AS BIGINT) AS size_band,
 CAST(count(*) AS BIGINT) AS n_classes,
 CAST(sum(n) AS BIGINT) AS n_customers,
 CAST(COALESCE(sum(n) FILTER (WHERE n < 5), 0) AS BIGINT) AS at_risk
FROM sb GROUP BY 1
"""
    d["l_diversity_audit"] = """
WITH c AS (SELECT c_nationkey,
    (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) // 100000
      AS band,
    c_mktsegment, count(*) AS n FROM customer GROUP BY 1, 2, 3),
cls AS (SELECT c_nationkey, band,
    count(DISTINCT c_mktsegment) AS n_segments,
    sum(n) AS n_customers FROM c GROUP BY 1, 2)
SELECT CAST(n_segments AS BIGINT) AS n_segments,
 CAST(count(*) AS BIGINT) AS n_classes,
 CAST(sum(n_customers) AS BIGINT) AS n_customers
FROM cls GROUP BY 1
"""
    d["vocab_venn_counts"] = """
WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents
          WHERE source IN ('src0', 'src1', 'src2')),
w AS (SELECT DISTINCT array_to_string(ws[u.i:u.i+2], ' ') AS w, source
      FROM d, unnest(range(1, len(ws) - 1)) AS u(i)),
m AS (SELECT w, sum(CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 2
                    WHEN 'src2' THEN 4 END) AS mask
      FROM w GROUP BY 1)
SELECT CAST(mask AS BIGINT) AS mask,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM m GROUP BY 1
"""
    d["orphan_purchase_counts"] = """
WITH e AS (SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
           FROM events WHERE event_type IN ('purchase', 'click')),
p AS (SELECT user_id, sec FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, sec FROM e WHERE event_type = 'click'),
o AS (SELECT p.user_id, p.sec,
        CASE WHEN EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
          AND c.sec < p.sec AND c.sec >= p.sec - 86400)
        THEN 0 ELSE 1 END AS orphan
      FROM p)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(orphan) AS BIGINT) AS n_orphans
FROM o GROUP BY 1
"""
    d["arrival_dispersion_terms"] = """
WITH h AS (SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS slot,
             count(*) AS n FROM events GROUP BY 1, 2),
r AS (SELECT max(slot) - min(slot) + 1 AS n_hours FROM h)
SELECT event_type, CAST(r.n_hours AS BIGINT) AS n_hours,
       CAST(sum(n) AS BIGINT) AS sum_events,
       CAST(sum(n * n) AS BIGINT) AS sum_sq_events
FROM h, r GROUP BY 1, 2
"""
    d["max_burst_window"] = """
WITH e AS (SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
           FROM events),
c AS (SELECT event_type, sec,
        count(*) OVER (PARTITION BY event_type ORDER BY sec
          RANGE BETWEEN CURRENT ROW AND 3599 FOLLOWING) AS cnt FROM e),
m AS (SELECT event_type, max(cnt) AS max_burst FROM c GROUP BY 1)
SELECT c.event_type, CAST(m.max_burst AS BIGINT) AS max_burst,
       CAST(min(c.sec) AS BIGINT) AS first_start_sec
FROM c JOIN m ON c.event_type = m.event_type AND c.cnt = m.max_burst
GROUP BY 1, 2
"""
    d["duplicate_line_audit"] = """
WITH c AS (SELECT l_orderkey, l_partkey, l_suppkey, count(*) AS n
           FROM lineitem GROUP BY 1, 2, 3),
o AS (SELECT l_orderkey, sum(n - 1) AS dups FROM c GROUP BY 1)
SELECT CAST(dups AS BIGINT) AS n_dup_lines,
       CAST(count(*) AS BIGINT) AS n_orders
FROM o GROUP BY 1
"""
    d["leadlag_xcorr_terms"] = """
WITH e AS (SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
           FROM events WHERE event_type IN ('click', 'purchase')),
c AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
r AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
l AS (SELECT unnest(range(-3, 4)) AS lag),
ca AS (SELECT day, n FROM c WHERE event_type = 'click'),
cb AS (SELECT day, n FROM c WHERE event_type = 'purchase')
SELECT CAST(l.lag AS BIGINT) AS lag,
  CAST((SELECT hi - lo + 1 FROM r) - abs(l.lag) AS BIGINT) AS n_days,
  CAST(COALESCE((SELECT sum(ca.n * cb.n) FROM ca
    JOIN cb ON cb.day = ca.day + l.lag), 0) AS BIGINT) AS sum_ab,
  CAST(COALESCE((SELECT sum(n) FROM ca
    WHERE day BETWEEN (SELECT lo FROM r) + GREATEST(-l.lag, 0)
                  AND (SELECT hi FROM r) - GREATEST(l.lag, 0)), 0)
    AS BIGINT) AS sum_a,
  CAST(COALESCE((SELECT sum(n) FROM cb
    WHERE day BETWEEN (SELECT lo FROM r) + GREATEST(l.lag, 0)
                  AND (SELECT hi FROM r) + LEAST(l.lag, 0)), 0)
    AS BIGINT) AS sum_b
FROM l
"""
    d["incremental_rebuild_plan"] = """
WITH s AS (
  SELECT source, doc_id,
         COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // 4096 AS grp,
         CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END AS chg
  FROM documents),
g AS (SELECT source, grp, max(chg) AS dirty, sum(chg) AS n_chg
      FROM s GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS n_groups_total,
       CAST(sum(dirty) AS BIGINT) AS n_groups_dirty,
       CAST(sum(n_chg) AS BIGINT) AS n_docs_changed
FROM g GROUP BY 1
"""
    d["split_balance_audit"] = """
WITH h AS (SELECT source, (list_reduce(list_transform(split(CAST(doc_id AS VARCHAR), ''), x -> unicode(x)::BIGINT), (a, b) -> (a * 1000003 + b) % 2147483647) * 2147483648 + list_reduce(list_transform(split(CAST(doc_id AS VARCHAR), ''), x -> unicode(x)::BIGINT), (a, b) -> (a * 999983 + b) % 2147483647)) % 1000 AS slot FROM documents),
a AS (SELECT source, CASE WHEN slot < 800 THEN 'train'
        WHEN slot < 900 THEN 'val' ELSE 'test' END AS split,
        count(*) AS n FROM h GROUP BY 1, 2)
SELECT a.source, a.split, CAST(a.n AS BIGINT) AS n_obs,
  CAST(sum(a.n) OVER (PARTITION BY a.source) AS BIGINT) AS n_source,
  CAST(sum(a.n) OVER (PARTITION BY a.split) AS BIGINT) AS n_split,
  CAST(sum(a.n) OVER () AS BIGINT) AS n_total
FROM a
"""
    d["media_mp4_boxes"] = """
WITH m AS (
  SELECT d.doc_id, s.m
  FROM documents d JOIN generate_series(0, 2) s(m) ON s.m < 1 + d.doc_id % 3
  WHERE d.doc_id % 13 = 0)
SELECT doc_id,
  CAST(1000 + doc_id % 9000 AS BIGINT) AS timescale,
  CAST(doc_id * 37 % 100000 AS BIGINT) AS duration,
  CAST(count(*) AS BIGINT) AS n_traks,
  CAST(sum((doc_id * 13 + m * 7) % 50000) AS BIGINT) AS sum_track_duration,
  CAST(sum(64 + m) AS BIGINT) AS sum_width_px
FROM m GROUP BY 1
"""
    d["media_gif_headers"] = """
WITH g AS (SELECT doc_id, 10 + doc_id % 300 AS width,
    8 + doc_id % 200 AS height,
    (1::BIGINT << (2 + doc_id % 3)) AS n_palette,
    doc_id % 256 AS bg
  FROM documents WHERE doc_id % 17 = 0),
p AS (SELECT g.doc_id, sum((g.doc_id + 3 * s.i + c.ch) % 256) AS ps
      FROM g JOIN generate_series(0, 15) s(i) ON s.i < g.n_palette
             JOIN generate_series(0, 2) c(ch) ON TRUE
      GROUP BY 1)
SELECT g.doc_id, CAST(width AS BIGINT) AS width,
  CAST(height AS BIGINT) AS height,
  CAST(n_palette AS BIGINT) AS n_palette,
  CAST(p.ps AS BIGINT) AS palette_byte_sum,
  CAST(bg AS BIGINT) AS bg_index
FROM g JOIN p USING (doc_id)
"""
    d["media_ico_directory"] = """
WITH m AS (
  SELECT d.doc_id, s.m, 40 + (d.doc_id % 1000) + s.m AS size,
         (16 + 8 * s.m) % 256 AS w
  FROM documents d JOIN generate_series(0, 3) s(m) ON s.m < 1 + d.doc_id % 4
  WHERE d.doc_id % 19 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_images,
  CAST(sum(size) AS BIGINT) AS total_bytes,
  CAST(sum(size * ((doc_id + m) % 256)) AS BIGINT) AS payload_byte_sum,
  CAST(sum(w) AS BIGINT) AS width_sum
FROM m GROUP BY 1
"""
    return d
