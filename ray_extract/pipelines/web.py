"""Web-extraction operators (north-rule scope: HTML/DOM heuristics at the
crawl tier): outlink-graph extraction, URL-frontier canonicalization +
dedup, charset sniffing, heading-outline audits, and redirect-chain
resolution.

Like the other synthetic-modality pipelines (media.py WAV/PNG, html.py),
the corpus has no crawl columns, so each op first LACES a deterministic
web artifact per document (HTML with anchors, raw URL variants, encoded
byte payloads, heading sequences, a redirect map) and then runs the REAL
extraction kernel over it; the DuckDB oracle recomputes the expected
answer from the generative formula, so any extraction defect breaks
equality. Reference scope anchor: the reference's pipeline is
document-content extraction (azure_pdf_parser converts analyzed layout to
ordered blocks); these ops cover the upstream web-crawl stages the north
rule names (boilerplate strip lives in html.py; link/URL/charset/outline
here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tables import strip_schema_metadata


def _tails(parts: pa.ListArray) -> tuple[pa.StringArray, np.ndarray]:
    """Flatten a split_pattern result, dropping the pre-match head element
    of every list; returns (tail elements, parent row index per element).
    Pure offset arithmetic — no per-row Python."""
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy()
    offs = parts.offsets.to_numpy()
    mask = np.ones(len(flat), bool)
    mask[offs[:-1]] = False  # split always yields >=1 element per list
    return flat.filter(pa.array(mask)), parent[mask]


def link_graph_degrees(sf_dir: str):
    """Outlink-graph extraction — the crawl-tier stage that turns raw HTML
    into a host-level link graph. Each document is laced with a
    deterministic anchor set (1 + doc_id%5 https links to host
    (doc_id*7 + k*13) % 101, plus a mailto decoy on every 4th doc and a
    bare ``href=`` text decoy on all), then the REAL extractor runs:
    split on ``href="``, take up to the closing quote, keep only
    https links, and parse the host id — all vectorized Arrow list/string
    kernels, no per-row Python in the extract stage.

    Scale shape: synth + extract are pure maps; the per-batch partial
    pre-aggregates to (host, n_links, n_src_docs) — src-doc counts are
    exact because a document's anchors never split across batches — and
    the final exchange folds a 101-host bounded domain.

    Output: (host_id, n_links, n_src_docs).
    """
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        htmls = []
        for did in ids:  # variable-length anchor list per doc
            did = int(did)
            out = ["<html><body><p>plain href= text decoy</p>"]
            for k in range(did % 5 + 1):
                h = (did * 7 + k * 13) % 101
                p = (did + k) % 997
                out.append(
                    f'<p>see <a href="https://host{h}.example.com/p/{p}">'
                    "x</a></p>"
                )
            if did % 4 == 0:
                out.append(f'<a href="mailto:u{did}@x.example">mail</a>')
            out.append("</body></html>")
            htmls.append("".join(out))
        return pa.table(
            {"doc_id": pa.array(ids), "html": pa.array(htmls, pa.string())}
        )

    def extract_partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        parts = pc.split_pattern(
            batch.column("html").combine_chunks(), pattern='href="'
        )
        tails, par = _tails(parts)
        url = pc.list_element(pc.split_pattern(tails, '"', max_splits=1), 0)
        ex = pc.extract_regex(url, r"^https://host(?P<h>\d+)\.example\.com/")
        hcol = pc.struct_field(ex, "h")
        ok = pc.is_valid(hcol).to_numpy(zero_copy_only=False)
        h = pc.cast(hcol.filter(pa.array(ok)), pa.int64()).to_numpy()
        d = ids[par[ok]]
        # n_links per host: every anchor; n_src_docs: unique (host, doc)
        n_links = np.bincount(h, minlength=101).astype(np.int64)
        # collision-free pair packing: h * 2^40 + d (doc_id < 2^40 asserted
        # by the same bound every packed-key op in this repo documents)
        pair = np.unique(h * (np.int64(1) << np.int64(40)) + d)
        ph = pair >> np.int64(40)
        n_docs = np.bincount(ph, minlength=101).astype(np.int64)
        host = np.arange(101, dtype=np.int64)
        keep = n_links > 0
        return pa.table(
            {
                "host_id": pa.array(host[keep]),
                "n_links": pa.array(n_links[keep]),
                "n_src_docs": pa.array(n_docs[keep]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("host_id").aggregate(
            [("n_links", "sum"), ("n_src_docs", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("host_id", "ascending")]))
        return pa.table(
            {
                "host_id": pc.cast(g.column("host_id"), pa.int64()),
                "n_links": pc.cast(g.column("n_links_sum"), pa.int64()),
                "n_src_docs": pc.cast(g.column("n_src_docs_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        )
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(extract_partial, batch_format="pyarrow")
        .repartition(1)  # 101-host bounded domain — metadata scale
        .map_batches(finish, batch_format="pyarrow")
    )


def url_frontier_dedup(sf_dir: str):
    """URL-frontier canonicalization + dedup — the crawler's first
    operator. Each document emits messy raw variants of its logical URL
    (mixed-case host, http:// scheme, trailing slash, ``utm_source``
    tracking param, plus a shared /about page on even docs); the pipeline
    canonicalizes (lowercase, force https, strip tracking param, strip
    trailing slash) with vectorized Arrow string kernels and counts
    distinct canonical URLs per host.

    Scale shape: canonicalization is a pure map; the distinct count
    exchanges once, keyed BY HOST — exactly a production frontier's
    politeness sharding — with per-batch (host, canon) pre-dedup before
    the shuffle. Host cardinality is the shard domain; no driver-side
    state.

    Output: (host_id, n_raw, n_canonical).
    """
    import pandas as pd
    import ray.data as rd

    def synth_canon_partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        h = pa.array((ids % 53).astype(str))
        p = pa.array((ids % 499).astype(str))
        j = pc.binary_join_element_wise
        v0 = j("https://Host", h, ".Example.COM/item/", p, "")
        v1 = j("http://host", h, ".example.com/item/", p, "/", "")
        v2 = j("https://host", h, ".example.com/item/", p,
               "?utm_source=feed", "")
        even = ids % 2 == 0
        v3 = j("https://host", pa.array((ids[even] % 53).astype(str)),
               ".example.com/about", "")
        raw = pa.concat_arrays([v0, v1, v2, v3])
        host = np.concatenate([ids % 53, ids % 53, ids % 53, ids[even] % 53])
        # canonicalize — op order mirrored exactly by the oracle
        u = pc.utf8_lower(raw)
        u = pc.replace_substring(u, "http://", "https://")
        u = pc.replace_substring(u, "?utm_source=feed", "")
        u = pc.replace_substring_regex(u, "/$", "")
        # per-batch pre-dedup: (host, canon) uniques with raw counts
        df = pd.DataFrame({"host_id": host, "canon": u.to_numpy(
            zero_copy_only=False)})
        g = df.groupby(["host_id", "canon"], sort=False).size().reset_index()
        return pa.table(
            {
                "host_id": pa.array(g["host_id"].to_numpy(np.int64)),
                "canon": pa.array(g["canon"], pa.string()),
                "n_raw": pa.array(g[0].to_numpy(np.int64)),
            }
        )

    def per_host(g) -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame(
            {
                "host_id": [np.int64(g["host_id"].iloc[0])],
                "n_raw": [np.int64(g["n_raw"].sum())],
                "n_canonical": [np.int64(g["canon"].nunique())],
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        )
        .map_batches(synth_canon_partial, batch_format="pyarrow")
        .groupby("host_id")
        .map_groups(per_host, batch_format="pandas")
    )


class CharsetSniffer:
    """Actor-pool charset-detection stage: BOM sniff, then UTF-8
    validation with Latin-1 fallback — the decode front door of any web
    corpus ingest. Per-blob loop by necessity (each payload is its own
    byte stream, like the WAV/PNG codec stages); classification plus the
    actual decode both run for real, and the oracle pins both the detected
    class AND the decoded character count."""

    BOM8 = b"\xef\xbb\xbf"
    BOM16 = b"\xff\xfe"

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        payloads = batch.column("payload").combine_chunks()
        counts: dict[str, np.ndarray] = {}
        for i in range(len(src)):
            b = payloads[i].as_py()
            if b.startswith(self.BOM8):
                cls, s = 0, b[3:].decode("utf-8")
            elif b.startswith(self.BOM16):
                cls, s = 1, b[2:].decode("utf-16-le")
            else:
                try:
                    cls, s = 2, b.decode("utf-8")
                except UnicodeDecodeError:
                    cls, s = 3, b.decode("latin-1")
            row = counts.setdefault(src[i], np.zeros(6, np.int64))
            row[cls] += 1
            row[4] += 1
            row[5] += len(s)
        keys = sorted(counts)
        m = np.array([counts[k] for k in keys], np.int64).reshape(-1, 6)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_bom_utf8": pa.array(m[:, 0]),
                "n_bom_utf16": pa.array(m[:, 1]),
                "n_plain_utf8": pa.array(m[:, 2]),
                "n_latin1": pa.array(m[:, 3]),
                "n_docs": pa.array(m[:, 4]),
                "n_chars": pa.array(m[:, 5]),
            }
        )


def charset_audit(sf_dir: str):
    """Charset detection audit over deterministically-encoded payloads:
    doc_id % 4 selects the synth encoding (plain UTF-8 / UTF-8 BOM /
    UTF-16LE BOM / UTF-8 with a trailing invalid byte pair forcing the
    Latin-1 fallback), and a stateful sniffer stage must recover the class
    and decoded char count FROM THE BYTES ALONE. The oracle recomputes
    both from the formula — a mis-detect or mis-decode breaks equality.

    Scale shape: synth and sniff are pure maps (actor pool for the
    sniffer); the per-source fold is a 20-row bounded domain.

    Output: (source, n_docs, n_bom_utf8, n_bom_utf16, n_plain_utf8,
    n_latin1, n_chars).
    """
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        texts = batch.column("text").to_pylist()
        blobs = []
        for did, t in zip(ids, texts):  # encode is per-blob
            m = int(did) % 4
            if m == 0:
                blobs.append(t.encode("utf-8"))
            elif m == 1:
                blobs.append(b"\xef\xbb\xbf" + t.encode("utf-8"))
            elif m == 2:
                blobs.append(b"\xff\xfe" + t.encode("utf-16-le"))
            else:
                blobs.append(t.encode("utf-8") + b"\xe9 ")
        return pa.table(
            {
                "source": batch.column("source"),
                "payload": pa.array(blobs, pa.binary()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        cols = ["n_docs", "n_bom_utf8", "n_bom_utf16", "n_plain_utf8",
                "n_latin1", "n_chars"]
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
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(CharsetSniffer, batch_format="pyarrow",
                     batch_size=2048, concurrency=2)
        .repartition(1)  # 20-source bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


def heading_outline(sf_dir: str):
    """Heading-outline audit — the DOM-heuristic readout of document
    structure quality (a skipped level, e.g. h1 followed directly by h3,
    is the classic accessibility/structure violation). Each doc is laced
    with 3 + doc_id%7 headings at level 1 + (doc_id*3 + j*j) % 3; the
    extractor splits on ``<h``, parses the level digit, and computes
    per-doc heading count, max depth, and skipped-level violations with
    offset arithmetic only (no per-row Python in the extract stage).

    Scale shape: pure maps + a 20-source bounded fold.

    Output: (source, n_docs, n_headings, sum_max_level, n_violations).
    """
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        htmls = []
        for did in ids:
            did = int(did)
            out = ["<body>"]  # no <html> wrapper: '<h' must mean heading
            for j in range(3 + did % 7):
                lvl = 1 + (did * 3 + j * j) % 3
                out.append(f"<h{lvl}>S{j}</h{lvl}><p>filler text</p>")
            out.append("</body>")
            htmls.append("".join(out))
        return pa.table(
            {
                "source": batch.column("source"),
                "html": pa.array(htmls, pa.string()),
            }
        )

    def extract_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        srcs = np.asarray(batch.column("source").to_pylist())
        parts = pc.split_pattern(
            batch.column("html").combine_chunks(), pattern="<h"
        )
        tails, par = _tails(parts)
        lvl = pc.cast(
            pc.utf8_slice_codeunits(tails, 0, 1), pa.int64()
        ).to_numpy()
        # per-doc segments (par is non-decreasing by construction)
        starts = np.r_[0, np.flatnonzero(par[1:] != par[:-1]) + 1]
        doc_idx = par[starts]
        nh = np.diff(np.r_[starts, len(par)])
        ml = np.maximum.reduceat(lvl, starts)
        same = par[1:] == par[:-1]
        viol_mask = same & (lvl[1:] > lvl[:-1] + 1)
        viol = np.bincount(par[1:][viol_mask], minlength=len(srcs))[doc_idx]
        df = pd.DataFrame(
            {
                "source": srcs[doc_idx],
                "n_docs": np.ones(len(doc_idx), np.int64),
                "n_headings": nh.astype(np.int64),
                "sum_max_level": ml.astype(np.int64),
                "n_violations": viol.astype(np.int64),
            }
        )
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        cols = ["n_docs", "n_headings", "sum_max_level", "n_violations"]
        g = t.group_by("source").aggregate([(c, "sum") for c in cols])
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        out = {"source": g.column("source")}
        for c in cols:
            out[c] = pc.cast(g.column(f"{c}_sum"), pa.int64())
        return pa.table(out)

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
            )
        )
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(extract_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def redirect_resolve(sf_dir: str, max_hops: int = 8):
    """Redirect-chain resolution — the crawl canonicalization step that
    follows every URL's redirect chain to its terminal target. The
    redirect map is DATA-DEPENDENT: doc u redirects to (u*31+7) % N iff
    u's own text length % 3 == 0 (so resolving a chain requires looking up
    OTHER rows' state, not just applying a formula to the id), with a
    ``max_hops`` cap making cyclic maps safe.

    Scale shape: the (cond, alias) map ships ONCE via ray.put as two
    dense arrays over the contiguous id domain (broadcast backend; above a
    node-count threshold the iterated bucketed join of
    dedup.dup_graph_bfs_depths is the drop-in shape); resolution is then a
    pure vectorized map — each batch chases its own chains against the
    shared read-only map, and the hop-histogram fold is a <=max_hops+1 row
    domain.

    Output: (hops, n_chains, terminal_sum).
    """
    import ray
    import ray.data as rd

    ds = strip_schema_metadata(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
    )

    # build the broadcast map (driver pull is id+1bit per node; join
    # backend at scale — see docstring)
    rows = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "cond": pa.array(
                    (pc.cast(b.column("n_chars"), pa.int64()).to_numpy() % 3)
                    == 0
                ),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    ids = np.array([r["doc_id"] for r in rows], np.int64)
    conds = np.array([r["cond"] for r in rows], bool)
    n = len(ids)
    assert ids.min() == 0 and ids.max() == n - 1, "ids must be contiguous"
    cond = np.zeros(n, bool)
    cond[ids] = conds
    cond_ref = ray.put(cond)

    def chase(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cond_ref)  # zero-copy shared read per task
        cur = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy().copy()
        hops = np.zeros(len(cur), np.int64)
        active = np.ones(len(cur), bool)
        for _ in range(max_hops):
            cont = active & cmap[cur]
            if not cont.any():
                break
            cur[cont] = (cur[cont] * 31 + 7) % n
            hops[cont] += 1
            active = cont
        order = np.argsort(hops, kind="stable")
        h, c = hops[order], cur[order]
        starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
        return pa.table(
            {
                "hops": pa.array(h[starts]),
                "n_chains": pa.array(np.diff(np.r_[starts, len(h)])
                                     .astype(np.int64)),
                "terminal_sum": pa.array(np.add.reduceat(c, starts)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("hops").aggregate(
            [("n_chains", "sum"), ("terminal_sum", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("hops", "ascending")]))
        return pa.table(
            {
                "hops": pc.cast(g.column("hops"), pa.int64()),
                "n_chains": pc.cast(g.column("n_chains_sum"), pa.int64()),
                "terminal_sum": pc.cast(
                    g.column("terminal_sum_sum"), pa.int64()),
            }
        )

    return (
        ds.map_batches(chase, batch_format="pyarrow")
        .repartition(1)  # <= max_hops+1 rows
        .map_batches(finish, batch_format="pyarrow")
    )


def sitemap_parse(sf_dir: str):
    """Sitemap ingest — crawl discovery's structured feed. One
    sitemap.xml is built per host (its documents' <url> entries with
    <loc> and an ISO <lastmod> date at epoch day 19000 + doc_id % 365),
    then the parser runs for real: split on <url>, regex out loc/lastmod,
    and convert the ISO date BACK to an epoch day with vectorized
    numpy datetime64 arithmetic — a date-format defect breaks equality.

    Scale shape: one groupby(host) builds the containers (in production
    sitemaps ARE the input); parse is vectorized across all url entries
    of a batch; the fold is the 53-host bounded domain.

    Output: (host_id, n_urls, max_lastmod_day, sum_doc_ids).
    """
    import pandas as pd

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy(np.int64)
        days = (19000 + ids % 365).astype("datetime64[D]")
        dates = np.datetime_as_string(days, unit="D")
        h = int(g["host"].iloc[0])
        entries = "".join(
            f"<url><loc>https://host{h}.example.com/item/{i}</loc>"
            f"<lastmod>{d}</lastmod></url>"
            for i, d in zip(ids, dates)
        )
        return pd.DataFrame(
            {
                "host": [np.int64(h)],
                "xml": ['<?xml version="1.0"?><urlset>'
                        + entries + "</urlset>"],
            }
        )

    def parse_partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            batch.column("xml").combine_chunks(), pattern="<url>"
        )
        tails, _ = _tails(parts)
        ex = pc.extract_regex(
            tails,
            r"^<loc>https://host(?P<h>\d+)\.example\.com/item/(?P<i>\d+)"
            r"</loc><lastmod>(?P<d>[0-9-]+)</lastmod>",
        )
        if pc.any(pc.is_null(ex)).as_py():
            raise ValueError("malformed sitemap entry")
        h = pc.cast(pc.struct_field(ex, "h"), pa.int64()).to_numpy()
        i = pc.cast(pc.struct_field(ex, "i"), pa.int64()).to_numpy()
        d = np.array(
            pc.struct_field(ex, "d").to_pylist(), dtype="datetime64[D]"
        ).astype(np.int64)
        order = np.argsort(h, kind="stable")
        h, i, d = h[order], i[order], d[order]
        starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
        return pa.table(
            {
                "host_id": pa.array(h[starts]),
                "n_urls": pa.array(np.diff(np.r_[starts, len(h)])
                                   .astype(np.int64)),
                "max_lastmod_day": pa.array(np.maximum.reduceat(d, starts)),
                "sum_doc_ids": pa.array(np.add.reduceat(i, starts)),
            }
        )

    def add_host(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        return batch.append_column("host", pa.array(ids % 53))

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("host_id").aggregate(
            [("n_urls", "sum"), ("max_lastmod_day", "max"),
             ("sum_doc_ids", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("host_id", "ascending")]))
        return pa.table(
            {
                "host_id": pc.cast(g.column("host_id"), pa.int64()),
                "n_urls": pc.cast(g.column("n_urls_sum"), pa.int64()),
                "max_lastmod_day": pc.cast(
                    g.column("max_lastmod_day_max"), pa.int64()),
                "sum_doc_ids": pc.cast(g.column("sum_doc_ids_sum"),
                                       pa.int64()),
            }
        )

    import ray.data as rd

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        )
        .map_batches(add_host, batch_format="pyarrow")
        .groupby("host")
        .map_groups(build, batch_format="pandas")
        .map_batches(parse_partial, batch_format="pyarrow")
        .repartition(1)  # 53-host bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


def http_header_parse(sf_dir: str):
    """HTTP response-header parsing — the fetch-metadata stage of a crawl.
    Each document gets a deterministic raw header block (status 301 on
    doc_id%29==0, else 404 on doc_id%17==0, else 200; charset utf-8 on
    even ids; Cache-Control max-age (doc_id%7)*3600), and the parser
    regex-extracts status, charset, and max-age from the raw text —
    vectorized Arrow kernels only.

    Scale shape: pure maps + a <=3-status bounded fold.

    Output: (status, n, sum_max_age, n_utf8).
    """
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        status = np.where(ids % 29 == 0, 301,
                          np.where(ids % 17 == 0, 404, 200))
        cs = np.where(ids % 2 == 0, "utf-8", "iso-8859-1")
        ma = (ids % 7) * 3600
        j = pc.binary_join_element_wise
        raw = j(
            "HTTP/1.1 ", pa.array(status.astype(str)), " X\r\n",
            "Content-Type: text/html; charset=", pa.array(cs), "\r\n",
            "Cache-Control: max-age=", pa.array(ma.astype(str)), "\r\n\r\n",
            "",
        )
        return pa.table({"raw": raw})

    def parse_partial(batch: pa.Table) -> pa.Table:
        raw = batch.column("raw").combine_chunks()
        st = pc.cast(
            pc.struct_field(
                pc.extract_regex(raw, r"^HTTP/1\.1 (?P<s>\d+) "), "s"
            ),
            pa.int64(),
        ).to_numpy()
        ma = pc.cast(
            pc.struct_field(
                pc.extract_regex(raw, r"max-age=(?P<m>\d+)"), "m"
            ),
            pa.int64(),
        ).to_numpy()
        utf8 = pc.match_substring(raw, "charset=utf-8").to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(st, kind="stable")
        st, ma, utf8 = st[order], ma[order], utf8[order]
        starts = np.r_[0, np.flatnonzero(st[1:] != st[:-1]) + 1]
        return pa.table(
            {
                "status": pa.array(st[starts]),
                "n": pa.array(np.diff(np.r_[starts, len(st)])
                              .astype(np.int64)),
                "sum_max_age": pa.array(np.add.reduceat(ma, starts)),
                "n_utf8": pa.array(
                    np.add.reduceat(utf8.astype(np.int64), starts)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("status").aggregate(
            [("n", "sum"), ("sum_max_age", "sum"), ("n_utf8", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("status", "ascending")]))
        return pa.table(
            {
                "status": pc.cast(g.column("status"), pa.int64()),
                "n": pc.cast(g.column("n_sum"), pa.int64()),
                "sum_max_age": pc.cast(g.column("sum_max_age_sum"),
                                       pa.int64()),
                "n_utf8": pc.cast(g.column("n_utf8_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        )
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(parse_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def anchor_text_index(sf_dir: str):
    """Anchor-text inverted index — the link-text relevance signal search
    engines aggregate per target. Anchors reuse link_graph_degrees'
    deterministic outlink set, but each anchor's TEXT is a real token of
    the source document (token (doc_id+k) % n_tokens), and the extractor
    must recover both the anchor text (between '">' and '<') and the
    target host from raw HTML with vectorized list/string kernels, then
    fold (token, host) counts.

    Scale shape: extraction is a pure map; the (token, host) fold domain
    is vocabulary x 101 — bounded for this corpus; at open-vocabulary
    scale the same partial feeds a hash-keyed groupby instead of the
    bounded fold (one-line swap, noted here for the scale profile).

    Output: (token, host_id, n) sorted by (token, host_id).
    """
    import pandas as pd
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        texts = batch.column("text").to_pylist()
        htmls = []
        for did, text in zip(ids, texts):
            did = int(did)
            toks = text.split(" ")
            out = ["<html><body>"]
            for k in range(did % 5 + 1):
                h = (did * 7 + k * 13) % 101
                p = (did + k) % 997
                a = toks[(did + k) % len(toks)]
                out.append(
                    f'<a href="https://host{h}.example.com/p/{p}">{a}</a>'
                )
            if did % 4 == 0:
                out.append(f'<a href="mailto:u{did}@x.example">mail</a>')
            out.append("</body></html>")
            htmls.append("".join(out))
        return pa.table({"html": pa.array(htmls, pa.string())})

    def extract_partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            batch.column("html").combine_chunks(), pattern='href="'
        )
        tails, _ = _tails(parts)
        url = pc.list_element(pc.split_pattern(tails, '"', max_splits=1), 0)
        rest = pc.list_element(pc.split_pattern(tails, '">', max_splits=1), 1)
        anchor = pc.list_element(pc.split_pattern(rest, "<", max_splits=1), 0)
        ex = pc.extract_regex(url, r"^https://host(?P<h>\d+)\.example\.com/")
        hcol = pc.struct_field(ex, "h")
        ok = pc.is_valid(hcol).to_numpy(zero_copy_only=False)
        h = pc.cast(hcol.filter(pa.array(ok)), pa.int64()).to_numpy()
        a = anchor.filter(pa.array(ok))
        df = pd.DataFrame({"token": a.to_pylist(), "host_id": h})
        g = df.groupby(["token", "host_id"], sort=False).size().reset_index()
        return pa.table(
            {
                "token": pa.array(g["token"], pa.string()),
                "host_id": pa.array(g["host_id"].to_numpy(np.int64)),
                "n": pa.array(g[0].to_numpy(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["token", "host_id"]).aggregate([("n", "sum")])
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("token", "ascending"), ("host_id", "ascending")],
            )
        )
        return pa.table(
            {
                "token": g.column("token"),
                "host_id": pc.cast(g.column("host_id"), pa.int64()),
                "n": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
        )
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(extract_partial, batch_format="pyarrow")
        .repartition(1)  # vocab x 101 bounded domain (see docstring)
        .map_batches(finish, batch_format="pyarrow")
    )


def canonical_meta_dedup(sf_dir: str):
    """Canonical-URL dedup readout — the <link rel="canonical"> DOM
    heuristic that collapses page variants before content dedup. Each
    document declares canonical target doc_id % 201 in a synthesized
    head; the extractor pulls the target from raw HTML and reports the
    canonical-cluster SIZE HISTOGRAM (how many clusters of 1, 2, ...
    variants exist).

    Scale shape: extraction + per-batch bincount partial on the bounded
    201-target domain, one fold, then the histogram over 201 rows.

    Output: (cluster_size, n_clusters).
    """
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        j = pc.binary_join_element_wise
        html = j(
            '<html><head><link rel="canonical" '
            'href="https://canon.example.com/page/',
            pa.array((ids % 201).astype(str)),
            '"></head><body>x</body></html>',
            "",
        )
        return pa.table({"html": html})

    def extract_partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            batch.column("html").combine_chunks(),
            r'rel="canonical" href="https://canon\.example\.com/page/'
            r'(?P<t>\d+)"',
        )
        t = pc.cast(pc.struct_field(ex, "t"), pa.int64()).to_numpy()
        n = np.bincount(t, minlength=201).astype(np.int64)
        keep = n > 0
        targets = np.arange(201, dtype=np.int64)
        return pa.table(
            {"target": pa.array(targets[keep]), "n": pa.array(n[keep])}
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("target").aggregate([("n", "sum")])
        sz = pc.cast(g.column("n_sum"), pa.int64()).to_numpy()
        vals, cnts = np.unique(sz, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(vals.astype(np.int64)),
                "n_clusters": pa.array(cnts.astype(np.int64)),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        )
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(extract_partial, batch_format="pyarrow")
        .repartition(1)  # 201-target bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )
