"""Format-parsing operators — the text-format layer between raw bytes and
records: RFC-4180 CSV with quoted fields (vectorized quote-parity
delimiter detection), Common-Log-Format access lines, INI config files
(stateful section tracking via cumsum), markdown structure (fence-parity
code-block detection with planted heading decoys), and a parquet
footer-only statistics audit (the row-group pruning story: answer
min/max/count without scanning a single data page).

Same contract as the other synthetic-format pipelines: deterministic
synthesis per document/shard, a REAL parser in the Ray pipeline, and a
DuckDB oracle recomputing from the generative formula.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tables import strip_schema_metadata

SHARD = 64


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
    )


# ----------------------------------------------------------------- CSV


def _csv_build(g: pd.DataFrame) -> pd.DataFrame:
    """One RFC-4180 CSV per shard: header + a row per doc with a
    comma-embedding quoted name on doc_id%3==0 and a doubled-quote note
    on doc_id%5==0 — the two dialect features naive split(',') breaks
    on."""
    g = g.sort_values("doc_id")
    lines = ["id,name,val,note"]
    for did in g["doc_id"]:
        did = int(did)
        name = f'"doc, {did}"' if did % 3 == 0 else f"doc {did}"
        note = f'"he said ""hi"" {did}"' if did % 5 == 0 else "plain"
        lines.append(f"{did},{name},{did % 1000},{note}")
    return pd.DataFrame(
        {
            "shard": [np.int64(g["shard"].iloc[0])],
            "csv": ["\n".join(lines) + "\n"],
        }
    )


class CsvParser:
    """RFC-4180 parser with VECTORIZED dialect handling: delimiter
    positions are computed in one numpy pass as (comma-or-newline) AND
    even-quote-parity (prefix cumsum of quote chars), so embedded commas
    and doubled quotes never split a field. Per-field unescape lengths
    come from quote-count prefix sums — no per-character Python."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        shards, n_rows, sum_val, n_qc, s_note = [], [], [], [], []
        blobs = batch.column("csv").combine_chunks()
        sh = pc.cast(batch.column("shard"), pa.int64()).to_numpy()
        for i in range(len(blobs)):
            b = np.frombuffer(blobs[i].as_py().encode(), np.uint8)
            isq = b == ord('"')
            qcum = np.cumsum(isq)
            prev_par = (qcum - isq) % 2  # quote parity BEFORE this char
            delim = ((b == ord(",")) | (b == ord("\n"))) & (prev_par == 0)
            dpos = np.flatnonzero(delim)
            starts = np.r_[0, dpos[:-1] + 1]
            ends = dpos
            is_nl = b[dpos] == ord("\n")
            # column index within row: position since last newline-delim
            row_id = np.r_[0, np.cumsum(is_nl)[:-1]]
            first_of_row = np.r_[0, np.flatnonzero(row_id[1:]
                                                   != row_id[:-1]) + 1]
            col = np.arange(len(dpos)) - first_of_row[row_id]
            if (col.max() != 3) or not is_nl[col == 3].all():
                raise ValueError("ragged CSV row")
            data = row_id > 0  # row 0 is the header
            # val column (col 2): all-digit fields, small per-field parse
            vals = [
                int(bytes(b[s:e]))
                for s, e in zip(starts[data & (col == 2)],
                                ends[data & (col == 2)])
            ]
            # quoted-comma fields: any field with an interior comma
            ccum = np.r_[0, np.cumsum(b == ord(","))]
            inner_commas = ccum[ends] - ccum[starts]
            nqc = int((inner_commas[data] > 0).sum())
            # note column (col 3) unescaped length: raw len, minus outer
            # quotes, minus one char per doubled pair
            ns, ne = starts[data & (col == 3)], ends[data & (col == 3)]
            raw = ne - ns
            nq = (np.r_[0, qcum][ne] - np.r_[0, qcum][ns])
            quoted = b[ns] == ord('"')
            unesc = np.where(quoted, raw - 2 - (nq - 2) // 2, raw)
            shards.append(int(sh[i]))
            n_rows.append(int(data.sum() // 4))
            sum_val.append(int(sum(vals)))
            n_qc.append(nqc)
            s_note.append(int(unesc.sum()))
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "sum_val": pa.array(sum_val, pa.int64()),
                "n_quoted_commas": pa.array(n_qc, pa.int64()),
                "sum_note_len": pa.array(s_note, pa.int64()),
            }
        )


def csv_dialect_parse(sf_dir: str):
    """RFC-4180 CSV ingest with full dialect handling (quoted fields,
    embedded commas, doubled-quote escapes): documents are packed into
    one CSV per 64-doc shard, and the parser computes delimiters via a
    vectorized quote-parity pass — then checks row shape, sums the int
    column, counts comma-embedding fields, and reports UNESCAPED note
    lengths. Every dialect defect breaks a different output column.

    Output: (shard, n_rows, sum_val, n_quoted_commas, sum_note_len)
    sorted by shard.
    """

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        return batch.append_column(
            "shard", pc.cast(pc.divide(ids, SHARD), pa.int64())
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_csv_build, batch_format="pandas")
        .map_batches(CsvParser, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
        .sort("shard")
    )


# ------------------------------------------------------------ CLF logs


def log_line_parse(sf_dir: str):
    """Common-Log-Format access-line parsing — the fetch-telemetry feed.
    Each document yields one CLF line (ip from doc-id residues, a GET
    path, status 500/404/200 by precedence, byte count = n_chars); the
    parser regex-extracts ip/status/bytes from the raw line and folds
    per-status counts, byte sums, and DISTINCT client-ip counts.

    Scale shape: synth + extract are vectorized maps; the distinct-ip
    exchange is keyed by (status, ip) — bounded at 3 x 105 here, and the
    same partial feeds a hash groupby at open cardinality.

    Output: (status, n, sum_bytes, n_ips).
    """

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        nch = pc.cast(batch.column("n_chars"), pa.int64()).to_numpy()
        status = np.where(ids % 23 == 0, 500,
                          np.where(ids % 13 == 0, 404, 200))
        j = pc.binary_join_element_wise
        line = j(
            "10.", pa.array((ids % 3).astype(str)),
            ".", pa.array((ids % 5).astype(str)),
            ".", pa.array((ids % 7).astype(str)),
            ' - - [01/Jan/2023:00:00:00 +0000] "GET /item/',
            pa.array((ids % 499).astype(str)),
            ' HTTP/1.1" ', pa.array(status.astype(str)),
            " ", pa.array(nch.astype(str)),
            "",
        )
        return pa.table({"line": line})

    def parse_partial(batch: pa.Table) -> pa.Table:
        line = batch.column("line").combine_chunks()
        ex = pc.extract_regex(
            line,
            r'^(?P<ip>[0-9.]+) - - \[[^\]]+\] "[A-Z]+ [^ ]+ HTTP/1\.1" '
            r"(?P<s>\d+) (?P<b>\d+)$",
        )
        if pc.any(pc.is_null(ex)).as_py():
            raise ValueError("unparseable log line")
        df = pd.DataFrame(
            {
                "status": pc.cast(pc.struct_field(ex, "s"),
                                  pa.int64()).to_numpy(),
                "ip": pc.struct_field(ex, "ip").to_pylist(),
                "b": pc.cast(pc.struct_field(ex, "b"),
                             pa.int64()).to_numpy(),
            }
        )
        g = (
            df.groupby(["status", "ip"], sort=False)
            .agg(n=("b", "size"), sum_bytes=("b", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "status": pa.array(g["status"].to_numpy(np.int64)),
                "ip": pa.array(g["ip"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "sum_bytes": pa.array(g["sum_bytes"].to_numpy(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.groupby("status")
            .agg(
                n=("n", "sum"),
                sum_bytes=("sum_bytes", "sum"),
                n_ips=("ip", "nunique"),
            )
            .reset_index()
            .sort_values("status", ignore_index=True)
        )
        return pa.table(
            {
                "status": pa.array(g["status"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "sum_bytes": pa.array(g["sum_bytes"].to_numpy(np.int64)),
                "n_ips": pa.array(g["n_ips"].to_numpy(np.int64)),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(parse_partial, batch_format="pyarrow")
        .repartition(1)  # (status, ip) bounded domain — see docstring
        .map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------------------------------ INI


def ini_config_parse(sf_dir: str):
    """INI config parsing with STATEFUL section tracking done
    vectorized: each document carries sections [sec0..sec{doc_id%3}] with
    (doc_id+j)%4 keys each (possibly zero — empty sections must not
    leak keys), and a key line's owning section is resolved by a cumsum
    over header lines — no per-line Python state machine.

    Output: (section, n_keys, sum_val).
    """

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        texts = []
        for did in ids:
            did = int(did)
            lines = []
            for j in range(did % 3 + 1):
                lines.append(f"[sec{j}]")
                for i in range((did + j) % 4):
                    lines.append(f"k{i} = {(did * 7 + j * 13 + i * 31) % 100}")
            texts.append("\n".join(lines))
        return pa.table({"ini": pa.array(texts, pa.string())})

    def parse_partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            batch.column("ini").combine_chunks(), pattern="\n"
        )
        flat = pc.list_flatten(parts)
        hdr = pc.extract_regex(flat, r"^\[(?P<s>[a-z0-9]+)\]$")
        kv = pc.extract_regex(flat, r"^k\d+ = (?P<v>\d+)$")
        is_hdr = pc.is_valid(pc.struct_field(hdr, "s")).to_numpy(
            zero_copy_only=False
        )
        is_kv = pc.is_valid(pc.struct_field(kv, "v")).to_numpy(
            zero_copy_only=False
        )
        if not (is_hdr | is_kv).all():
            raise ValueError("unparseable ini line")
        # owning section of each line = index of last header at-or-before
        sec_idx = np.cumsum(is_hdr) - 1
        if (sec_idx[is_kv] < 0).any():
            raise ValueError("key before any section")
        names = np.asarray(
            pc.struct_field(hdr, "s").to_pylist(), dtype=object
        )[is_hdr]
        vals = pc.cast(
            pc.struct_field(kv, "v").filter(pa.array(is_kv)), pa.int64()
        ).to_numpy()
        df = pd.DataFrame({"section": names[sec_idx[is_kv]], "v": vals})
        g = (
            df.groupby("section", sort=False)
            .agg(n_keys=("v", "size"), sum_val=("v", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "section": pa.array(g["section"], pa.string()),
                "n_keys": pa.array(g["n_keys"].to_numpy(np.int64)),
                "sum_val": pa.array(g["sum_val"].to_numpy(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("section").aggregate(
            [("n_keys", "sum"), ("sum_val", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("section", "ascending")]))
        return pa.table(
            {
                "section": g.column("section"),
                "n_keys": pc.cast(g.column("n_keys_sum"), pa.int64()),
                "sum_val": pc.cast(g.column("sum_val_sum"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(parse_partial, batch_format="pyarrow")
        .repartition(1)  # 3-section bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------------------------- markdown


def markdown_structure(sf_dir: str):
    """Markdown structure audit with fence-aware heading counting: each
    document gets 1 + doc_id%4 headings and (on even ids) one fenced code
    block of doc_id%6 + 1 lines PLUS a planted '# fake' decoy line inside
    the fence — a parser that counts '#' lines without tracking fence
    parity overcounts. Parity is a per-document cumsum over fence lines,
    rebased per document with offset arithmetic (no per-line Python).

    Output: (source, n_headings, n_code_blocks, n_code_lines) —
    code lines include everything strictly inside fences (decoy
    included), fences excluded.
    """

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        texts = []
        for did in ids:
            did = int(did)
            lines = []
            for j in range(did % 4 + 1):
                lines.append(f"## H{j}")
                lines.append("para text")
            if did % 2 == 0:
                lines.append("```")
                for i in range(did % 6 + 1):
                    lines.append(f"code {i}")
                lines.append("# fake")  # decoy: heading-shaped, in-fence
                lines.append("```")
            texts.append("\n".join(lines))
        return pa.table(
            {
                "source": batch.column("source"),
                "md": pa.array(texts, pa.string()),
            }
        )

    def parse_partial(batch: pa.Table) -> pa.Table:
        srcs = np.asarray(batch.column("source").to_pylist(), dtype=object)
        parts = pc.split_pattern(
            batch.column("md").combine_chunks(), pattern="\n"
        )
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy()
        offs = parts.offsets.to_numpy()
        fence = pc.equal(flat, "```").to_numpy(zero_copy_only=False)
        hashline = pc.starts_with(flat, "#").to_numpy(zero_copy_only=False)
        fcum = np.cumsum(fence)
        base = np.r_[0, fcum][offs[:-1]]  # fences before each doc starts
        inside = ((fcum - fence - base[parent]) % 2 == 1) & ~fence
        heading = hashline & ~inside
        df = pd.DataFrame(
            {
                "source": srcs[parent],
                "h": heading.astype(np.int64),
                "cl": inside.astype(np.int64),
                "fence": fence.astype(np.int64),
            }
        )
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_headings": pa.array(g["h"].to_numpy(np.int64)),
                "n_code_blocks": pa.array(
                    (g["fence"].to_numpy(np.int64)) // 2),
                "n_code_lines": pa.array(g["cl"].to_numpy(np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        cols = ["n_headings", "n_code_blocks", "n_code_lines"]
        g = t.group_by("source").aggregate([(c, "sum") for c in cols])
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        out = {"source": g.column("source")}
        for c in cols:
            out[c] = pc.cast(g.column(f"{c}_sum"), pa.int64())
        return pa.table(out)

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(parse_partial, batch_format="pyarrow")
        .repartition(1)  # 20-source bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------------------ parquet footer


def parquet_footer_audit(sf_dir: str):
    """Parquet footer-only statistics audit — the row-group pruning
    primitive: answer min/max/count for lineitem price and quantity by
    folding ROW-GROUP STATISTICS from the file footer, without scanning a
    single data page. The oracle computes the same answer the expensive
    way (full scan), pinning that the footer stats a pruning planner
    would trust are exact for this data.

    Scale shape: one task per file reads O(KB) of footer regardless of
    file size; the fold is per-column bounded.

    Output: (col_name, min_cents, max_cents, n_rows).
    """
    import ray.data as rd

    COLS = ["l_extendedprice", "l_quantity"]

    def read_footer(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = {c: [None, None, 0] for c in COLS}
        for path in batch.column("path").to_pylist():
            md = pq.ParquetFile(path).metadata
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    name = col.path_in_schema
                    if name not in out:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(f"no stats for {name}")
                    mn, mx, n = out[name]
                    out[name] = [
                        st.min if mn is None else min(mn, st.min),
                        st.max if mx is None else max(mx, st.max),
                        n + rg.num_rows,
                    ]
        names = sorted(out)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "min_cents": pa.array(
                    [int(np.floor(out[c][0] * 100 + 0.5)) for c in names],
                    pa.int64(),
                ),
                "max_cents": pa.array(
                    [int(np.floor(out[c][1] * 100 + 0.5)) for c in names],
                    pa.int64(),
                ),
                "n_rows": pa.array([out[c][2] for c in names], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("col_name").aggregate(
            [("min_cents", "min"), ("max_cents", "max"), ("n_rows", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("col_name", "ascending")]))
        return pa.table(
            {
                "col_name": g.column("col_name"),
                "min_cents": pc.cast(g.column("min_cents_min"), pa.int64()),
                "max_cents": pc.cast(g.column("max_cents_max"), pa.int64()),
                "n_rows": pc.cast(g.column("n_rows_sum"), pa.int64()),
            }
        )

    return (
        rd.from_items([{"path": f"{sf_dir}/lineitem.parquet"}])
        .map_batches(read_footer, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


# -------------------------------------------------------------- RLE runs


def rle_run_audit(sf_dir: str):
    """Distributed run-length encoding audit over a GLOBALLY SORTED
    column: orders is range-sorted by its unique o_orderkey — a real
    all-to-all — then each batch counts its internal o_orderstatus runs
    and emits FRAGMENT summaries (first/last key, first/last flag,
    per-flag run and row counts); the fold orders fragments by key range,
    asserts they tile without overlap, and cancels one run wherever a
    fragment opens with the flag its predecessor closed on — the
    boundary-stitch every distributed RLE/segment encoder needs. (The
    sort key must be UNIQUE for the run structure to be well-defined;
    lineitem's (orderkey, linenumber) has synthetic duplicates, so the
    op runs on orders.)

    Output: (flag, n_runs, n_rows) — runs of o_orderstatus in global
    o_orderkey order; flags are F/O/P.
    """
    import ray.data as rd

    FLAGS = ["F", "O", "P"]

    def fragment(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column("o_orderkey"), pa.int64()).to_numpy()
        f = batch.column("o_orderstatus").combine_chunks()
        code = np.select(
            [pc.equal(f, x).to_numpy(zero_copy_only=False) for x in FLAGS],
            [0, 1, 2],
            default=-1,
        ).astype(np.int64)
        if (code < 0).any():
            raise ValueError("unexpected flag value")
        # post-sort blocks are internally sorted, but one batch can
        # concatenate NON-ADJACENT sorted blocks — split the batch into
        # sorted segments at descent points and emit a fragment per
        # segment (stitch's tiling assertion still covers the rest)
        seg = np.r_[0, np.flatnonzero(np.diff(k) <= 0) + 1]
        seg_end = np.r_[seg[1:], len(k)]
        out = {name: [] for name in (
            ["first_key", "last_key", "first_flag", "last_flag"]
            + [f"runs_{x}" for x in FLAGS] + [f"rows_{x}" for x in FLAGS]
        )}
        for s, e in zip(seg, seg_end):
            c = code[s:e]
            start = np.r_[True, c[1:] != c[:-1]]
            runs = np.bincount(c[start], minlength=3).astype(np.int64)
            rows = np.bincount(c, minlength=3).astype(np.int64)
            out["first_key"].append(int(k[s]))
            out["last_key"].append(int(k[e - 1]))
            out["first_flag"].append(int(c[0]))
            out["last_flag"].append(int(c[-1]))
            for i, x in enumerate(FLAGS):
                out[f"runs_{x}"].append(int(runs[i]))
                out[f"rows_{x}"].append(int(rows[i]))
        return pa.table(
            {name: pa.array(vals, pa.int64()) for name, vals in out.items()}
        )

    def stitch(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("first_key", ignore_index=True)
        if (df["first_key"].to_numpy()[1:]
                <= df["last_key"].to_numpy()[:-1]).any():
            raise ValueError("fragments overlap")
        runs = df[[f"runs_{x}" for x in FLAGS]].to_numpy(np.int64).sum(axis=0)
        rows = df[[f"rows_{x}" for x in FLAGS]].to_numpy(np.int64).sum(axis=0)
        ff = df["first_flag"].to_numpy(np.int64)
        lf = df["last_flag"].to_numpy(np.int64)
        merge = ff[1:] == lf[:-1]  # run continues across the boundary
        for flag in range(3):
            runs[flag] -= int((merge & (ff[1:] == flag)).sum())
        return pa.table(
            {
                "flag": pa.array(FLAGS, pa.string()),
                "n_runs": pa.array(runs),
                "n_rows": pa.array(rows),
            }
        )

    return (
        strip_schema_metadata(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_orderstatus"],
            )
        )
        .sort("o_orderkey")
        .map_batches(fragment, batch_format="pyarrow", batch_size=65536)
        .repartition(1)  # a few summary rows per batch — metadata scale
        .map_batches(stitch, batch_format="pyarrow")
    )
