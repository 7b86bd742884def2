"""Container-format ingest operators — the framing layer every web-scale
corpus arrives in: WARC response records (Common-Crawl style), ZIP
archives with central-directory walks + CRC verification, base64 transfer
decoding, robots.txt rule evaluation, and LEB128 varint posting lists.

Same contract as the other synthetic-modality pipelines: a deterministic
container is synthesized per document/shard, the REAL parser (chunk
framing, directory walk, integrity check) runs inside the Ray pipeline,
and the DuckDB oracle recomputes the expected answer from the generative
formula — a framing or decode defect breaks equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tables import strip_schema_metadata

SHARD = 64  # docs per container shard


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
    )


# ---------------------------------------------------------------- WARC


def _warc_build(g: pd.DataFrame) -> pd.DataFrame:
    """One WARC container per shard: records in doc_id order, each framed
    by Content-Length with a blank-line header terminator and CRLF*2
    record trailer (the real WARC/1.0 response framing)."""
    g = g.sort_values("doc_id")
    out = []
    for did, text in zip(g["doc_id"], g["text"]):
        body = text.encode("utf-8")
        uri = f"https://host{int(did) % 53}.example.com/item/{int(did)}"
        out.append(
            (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii")
            + body
            + b"\r\n\r\n"
        )
    return pd.DataFrame(
        {"shard": [np.int64(g["shard"].iloc[0])], "blob": [b"".join(out)]}
    )


class WarcParser:
    """Actor-pool WARC reader: walks records via header parse +
    Content-Length framing (never splitting on body content, which may
    contain anything) and emits per-host partials. A framing error
    desynchronizes every following record, so oracle equality pins the
    whole walk."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        uri_re = re.compile(rb"^https://host(\d+)\.example\.com/")
        n_rec = np.zeros(53, np.int64)
        n_bytes = np.zeros(53, np.int64)
        blobs = batch.column("blob").combine_chunks()
        for i in range(len(blobs)):
            blob = blobs[i].as_py()
            pos = 0
            while pos < len(blob):
                hdr_end = blob.index(b"\r\n\r\n", pos)
                headers = {}
                for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
                    k, _, v = line.partition(b": ")
                    headers[k] = v
                clen = int(headers[b"Content-Length"])
                body = blob[hdr_end + 4 : hdr_end + 4 + clen]
                if blob[hdr_end + 4 + clen : hdr_end + 4 + clen + 4] != b"\r\n\r\n":
                    raise ValueError("bad record trailer")
                m = uri_re.match(headers[b"WARC-Target-URI"])
                h = int(m.group(1))
                n_rec[h] += 1
                n_bytes[h] += len(body)  # measured, not trusted from header
                pos = hdr_end + 4 + clen + 4
        keep = n_rec > 0
        host = np.arange(53, dtype=np.int64)
        return pa.table(
            {
                "host_id": pa.array(host[keep]),
                "n_records": pa.array(n_rec[keep]),
                "body_bytes": pa.array(n_bytes[keep]),
            }
        )


def warc_extract(sf_dir: str):
    """WARC-container ingest: documents are packed 64-to-a-shard into
    real WARC/1.0 response containers (header block, Content-Length
    framing, record trailers), then an actor-pool parser walks every
    record, recovers the host from the target URI, and MEASURES the body
    bytes (framing errors shift every later record). Oracle recomputes
    per-host record counts and byte sums from the raw table.

    Scale shape: one groupby(shard) to build containers (in production
    the containers ARE the input — that exchange doesn't exist), then
    pure map parse + a 53-host bounded fold.

    Output: (host_id, n_records, body_bytes).
    """

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        return batch.append_column(
            "shard", pc.cast(pc.divide(ids, SHARD), pa.int64())
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("host_id").aggregate(
            [("n_records", "sum"), ("body_bytes", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("host_id", "ascending")]))
        return pa.table(
            {
                "host_id": pc.cast(g.column("host_id"), pa.int64()),
                "n_records": pc.cast(g.column("n_records_sum"), pa.int64()),
                "body_bytes": pc.cast(g.column("body_bytes_sum"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_warc_build, batch_format="pandas")
        .map_batches(WarcParser, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
        .repartition(1)  # 53-host bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


# ----------------------------------------------------------------- ZIP


def _zip_build(g: pd.DataFrame) -> pd.DataFrame:
    """One real ZIP (stored members, local headers + central directory +
    EOCD) per shard. Members whose doc_id % 64 == 7 get ONE payload byte
    flipped AFTER the directory CRC is computed — the integrity check the
    walker must catch."""
    g = g.sort_values("doc_id")
    local = bytearray()
    cd = bytearray()
    n = 0
    for did, text in zip(g["doc_id"], g["text"]):
        did = int(did)
        name = f"doc{did}.txt".encode("ascii")
        data = text.encode("utf-8")
        crc = zlib.crc32(data)
        if did % SHARD == 7 and len(data):
            data = bytes([data[0] ^ 0xFF]) + data[1:]  # corrupt payload
        off = len(local)
        local += struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, 0, 0, 0, 0, crc,
            len(data), len(data), len(name), 0,
        ) + name + data
        cd += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, 0, 0, 0, crc,
            len(data), len(data), len(name), 0, 0, 0, 0, 0, off,
        ) + name
        n += 1
    eocd = struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, n, n, len(cd), len(local), 0
    )
    return pd.DataFrame(
        {
            "shard": [np.int64(g["shard"].iloc[0])],
            "blob": [bytes(local) + bytes(cd) + eocd],
        }
    )


class ZipWalker:
    """Actor-pool ZIP reader: locate the EOCD from the tail, walk the
    central directory, seek each member's local header, extract the
    stored payload, and recompute its CRC32 against the directory's —
    the standard archive-integrity sweep."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        shards, members, tbytes, crc_ok = [], [], [], []
        blobs = batch.column("blob").combine_chunks()
        sh = pc.cast(batch.column("shard"), pa.int64()).to_numpy()
        for i in range(len(blobs)):
            blob = blobs[i].as_py()
            e = blob.rfind(b"PK\x05\x06")
            if e < 0:
                raise ValueError("no EOCD")
            _, _, _, _, n, cd_size, cd_off, _ = struct.unpack(
                "<IHHHHIIH", blob[e : e + 22]
            )
            pos, nm, tb, ok = cd_off, 0, 0, 0
            for _ in range(n):
                f = struct.unpack("<IHHHHHHIIIHHHHHII", blob[pos : pos + 46])
                if f[0] != 0x02014B50:
                    raise ValueError("bad CD signature")
                crc, usize, name_len, extra_len, cmt_len, loff = (
                    f[7], f[9], f[10], f[11], f[12], f[16],
                )
                lh = struct.unpack("<IHHHHHIIIHH", blob[loff : loff + 30])
                if lh[0] != 0x04034B50:
                    raise ValueError("bad local signature")
                dstart = loff + 30 + lh[9] + lh[10]
                data = blob[dstart : dstart + usize]
                nm += 1
                tb += len(data)
                ok += int(zlib.crc32(data) == crc)
                pos += 46 + name_len + extra_len + cmt_len
            shards.append(int(sh[i]))
            members.append(nm)
            tbytes.append(tb)
            crc_ok.append(ok)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_members": pa.array(members, pa.int64()),
                "total_bytes": pa.array(tbytes, pa.int64()),
                "n_crc_ok": pa.array(crc_ok, pa.int64()),
            }
        )


def zip_directory_walk(sf_dir: str):
    """ZIP-archive integrity sweep: documents are packed into real ZIP
    containers (stored members, local headers, central directory, EOCD);
    one member per shard pattern (doc_id % 64 == 7) is corrupted after
    its directory CRC is recorded. The walker locates the EOCD from the
    tail, walks the central directory, extracts every member via its
    local header, and recomputes CRC32 — the oracle pins member counts,
    byte totals, and exactly which members fail.

    Scale shape: build is one groupby(shard) (nonexistent in production
    where archives are the input); walk is a pure map over shards; final
    exchange sorts the shard-count-bounded result.

    Output: (shard, n_members, total_bytes, n_crc_ok) sorted by shard.
    """

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        return batch.append_column(
            "shard", pc.cast(pc.divide(ids, SHARD), pa.int64())
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_zip_build, batch_format="pandas")
        .map_batches(ZipWalker, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
        .sort("shard")
    )


# -------------------------------------------------------------- base64


def base64_audit(sf_dir: str):
    """Base64 transfer-decode audit: each document's text ships
    base64-encoded (the classic attachment/transfer encoding), and the
    VECTORIZED numpy decoder (functions/encodings.py — one pass over the
    batch's flat char buffer, no per-row Python) must recover the exact
    byte stream; the audit counts decoded bytes and occurrences of the
    byte 0x65 ('e') among the valid (non-padding) output.

    Scale shape: pure maps + a 20-source bounded fold.

    Output: (source, n_docs, decoded_bytes, n_e_bytes).
    """
    import base64

    from ..functions.encodings import b64_decode_flat

    def synth(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "source": batch.column("source"),
                "b64": pa.array(
                    [base64.b64encode(t.encode()).decode("ascii")
                     for t in texts],
                    pa.string(),
                ),
            }
        )

    def decode_partial(batch: pa.Table) -> pa.Table:
        from ..functions.encodings import flat_bytes

        flat, offs = flat_bytes(batch.column("b64").combine_chunks())
        decoded, oo, valid = b64_decode_flat(flat, offs)
        vcum = np.r_[0, np.cumsum(valid)]
        nbytes = vcum[oo[1:]] - vcum[oo[:-1]]
        ecum = np.r_[0, np.cumsum(valid & (decoded == 0x65))]
        ne = ecum[oo[1:]] - ecum[oo[:-1]]
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pylist(),
                "n_docs": np.ones(len(nbytes), np.int64),
                "decoded_bytes": nbytes.astype(np.int64),
                "n_e_bytes": ne.astype(np.int64),
            }
        )
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        cols = ["n_docs", "decoded_bytes", "n_e_bytes"]
        g = t.group_by("source").aggregate([(c, "sum") for c in cols])
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        out = {"source": g.column("source")}
        for c in cols:
            out[c] = pc.cast(g.column(f"{c}_sum"), pa.int64())
        return pa.table(out)

    return (
        _docs(sf_dir, ["text", "source"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(decode_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


# ----------------------------------------------------------- robots.txt


def synthesize_robots(host: int) -> str:
    """Deterministic robots.txt text per host (parsed, never shortcut)."""
    lines = ["User-agent: *", "Disallow: /private/"]
    if host % 3 == 0:
        lines.append("Allow: /private/f3")
    if host % 7 == 0:
        lines.append("Disallow: /item/")
    return "\n".join(lines) + "\n"


def parse_robots(text: str) -> list[tuple[str, bool]]:
    """Parse Allow/Disallow prefix rules (wildcard-free subset)."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if line.lower().startswith("disallow:"):
            rules.append((line.split(":", 1)[1].strip(), False))
        elif line.lower().startswith("allow:"):
            rules.append((line.split(":", 1)[1].strip(), True))
    return rules


def robots_rules(sf_dir: str):
    """robots.txt evaluation — the crawl-permission gate. A deterministic
    robots.txt is synthesized per host, PARSED generically into prefix
    rules, and every candidate URL (two per document: an /item/ page and
    a /private/ page on the doc's host) is evaluated with
    longest-match-wins, allow-on-tie semantics (the de-facto standard).
    The oracle replays the rule table's net effect per URL in SQL.

    Scale shape: the parsed rule table is host-bounded and ships once via
    ray.put; evaluation is a vectorized map (per-host prefix checks over
    Arrow string batches) + a host-bounded fold.

    Output: (host_id, n_allowed, n_blocked).
    """
    import ray
    import ray.data as rd

    rules_by_host = {
        h: parse_robots(synthesize_robots(h)) for h in range(53)
    }
    rules_ref = ray.put(rules_by_host)

    def eval_partial(batch: pa.Table) -> pa.Table:
        rbh = ray.get(rules_ref)
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        host = (ids % 53).astype(np.int64)
        j = pc.binary_join_element_wise
        p1 = j("/item/", pa.array((ids % 499).astype(str)), "")
        p2 = j("/private/f", pa.array((ids % 10).astype(str)), "")
        allowed = np.zeros(53, np.int64)
        blocked = np.zeros(53, np.int64)
        for h in np.unique(host):
            m = host == h
            for paths in (p1.filter(pa.array(m)), p2.filter(pa.array(m))):
                best_len = np.full(len(paths), -1, np.int64)
                best_allow = np.ones(len(paths), bool)  # no match => allow
                for prefix, allow in rbh[int(h)]:
                    hit = pc.starts_with(paths, prefix).to_numpy(
                        zero_copy_only=False
                    )
                    plen = len(prefix)
                    # longest match wins; allow wins ties
                    better = hit & (
                        (plen > best_len)
                        | ((plen == best_len) & allow & ~best_allow)
                    )
                    best_len[better] = plen
                    best_allow[better] = allow
                allowed[h] += int(best_allow.sum())
                blocked[h] += int((~best_allow).sum())
        keep = (allowed + blocked) > 0
        hh = np.arange(53, dtype=np.int64)
        return pa.table(
            {
                "host_id": pa.array(hh[keep]),
                "n_allowed": pa.array(allowed[keep]),
                "n_blocked": pa.array(blocked[keep]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("host_id").aggregate(
            [("n_allowed", "sum"), ("n_blocked", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("host_id", "ascending")]))
        return pa.table(
            {
                "host_id": pc.cast(g.column("host_id"), pa.int64()),
                "n_allowed": pc.cast(g.column("n_allowed_sum"), pa.int64()),
                "n_blocked": pc.cast(g.column("n_blocked_sum"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(eval_partial, batch_format="pyarrow")
        .repartition(1)  # 53-host bounded domain
        .map_batches(finish, batch_format="pyarrow")
    )


# -------------------------------------------------------------- varints


def varint_posting_decode(sf_dir: str):
    """Varint posting-list decode — the compression format of every
    inverted index. Each document carries a LEB128-encoded gap list
    (doc_id % 6 + 2 values of (doc_id*97 + k*31) % 5000 + 1, mixing 1-
    and 2-byte varints), and the VECTORIZED decoder
    (functions/encodings.py — continuation-bit grouping + reduceat, one
    numpy pass per batch) must recover every value; the audit folds value
    counts and sums per source.

    Scale shape: pure maps + a 20-source bounded fold.

    Output: (source, n_vals, sum_vals).
    """
    from ..functions.encodings import varint_decode_flat, varint_encode

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        blobs = []
        for did in ids:
            did = int(did)
            k = np.arange(did % 6 + 2, dtype=np.int64)
            blobs.append(varint_encode((did * 97 + k * 31) % 5000 + 1))
        return pa.table(
            {
                "source": batch.column("source"),
                "postings": pa.array(blobs, pa.binary()),
            }
        )

    def decode_partial(batch: pa.Table) -> pa.Table:
        from ..functions.encodings import flat_bytes

        flat, offs = flat_bytes(batch.column("postings").combine_chunks())
        values, counts = varint_decode_flat(flat, offs)
        vcum = np.r_[0, np.cumsum(values)]
        doc_ends = np.cumsum(counts)
        doc_starts = doc_ends - counts
        sums = vcum[doc_ends] - vcum[doc_starts]
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pylist(),
                "n_vals": counts,
                "sum_vals": sums.astype(np.int64),
            }
        )
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [("n_vals", "sum"), ("sum_vals", "sum")]
        )
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        return pa.table(
            {
                "source": g.column("source"),
                "n_vals": pc.cast(g.column("n_vals_sum"), pa.int64()),
                "sum_vals": pc.cast(g.column("sum_vals_sum"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(decode_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------- gzip


class GzipDecoder:
    """Actor-pool Content-Encoding:gzip decode stage with trailer-CRC
    integrity: good payloads must decompress to exactly the original
    byte count, corrupted ones (trailer CRC flipped) must be caught and
    dead-lettered — the reference's silently-drop error contract
    (reference run.py:38-39), never an exception out of the actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        payloads = batch.column("gz").combine_chunks()
        agg: dict[str, np.ndarray] = {}
        for i in range(len(src)):
            row = agg.setdefault(src[i], np.zeros(4, np.int64))
            row[0] += 1
            try:
                out = zlib.decompress(payloads[i].as_py(), 47)
                row[1] += 1
                row[3] += len(out)
            except zlib.error:
                row[2] += 1  # dead-letter, never raise (see docstring)
        keys = sorted(agg)
        m = np.array([agg[k] for k in keys], np.int64).reshape(-1, 4)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array(m[:, 0]),
                "n_ok": pa.array(m[:, 1]),
                "n_corrupt": pa.array(m[:, 2]),
                "decoded_bytes": pa.array(m[:, 3]),
            }
        )


def gzip_transfer_decode(sf_dir: str):
    """Content-Encoding:gzip decode audit — the transfer decoding every
    fetched page goes through. Each document's text is gzip-compressed
    (RFC 1952 wrapper with CRC32 trailer); payloads of docs with
    doc_id % 31 == 0 get a trailer-CRC byte flipped, which the decoder
    MUST catch (zlib verifies the trailer) and dead-letter rather than
    raise. Oracle pins ok/corrupt counts and the decoded byte totals.

    Scale shape: per-blob synth/decode (each payload is its own stream,
    like the WAV/charset stages) in actor pools; 20-source bounded fold.

    Output: (source, n_docs, n_ok, n_corrupt, decoded_bytes).
    """

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        texts = batch.column("text").to_pylist()
        blobs = []
        for did, t in zip(ids, texts):
            co = zlib.compressobj(9, zlib.DEFLATED, 31)  # gzip wrapper
            blob = co.compress(t.encode("utf-8")) + co.flush()
            if int(did) % 31 == 0:
                # flip a CRC byte in the 8-byte gzip trailer: guaranteed
                # integrity failure, unlike a body flip (which could in
                # principle still decode)
                blob = blob[:-8] + bytes([blob[-8] ^ 0xFF]) + blob[-7:]
            blobs.append(blob)
        return pa.table(
            {
                "source": batch.column("source"),
                "gz": pa.array(blobs, pa.binary()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        cols = ["n_docs", "n_ok", "n_corrupt", "decoded_bytes"]
        g = t.group_by("source").aggregate([(c, "sum") for c in cols])
        g = g.take(pc.sort_indices(g, sort_keys=[("source", "ascending")]))
        out = {"source": g.column("source")}
        for c in cols:
            out[c] = pc.cast(g.column(f"{c}_sum"), pa.int64())
        return pa.table(out)

    return (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(synth, batch_format="pyarrow")
        .map_batches(GzipDecoder, batch_format="pyarrow",
                     batch_size=2048, concurrency=2)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


# ----------------------------------------------------- integrity blocks


def _parity_build(g: pd.DataFrame) -> pd.DataFrame:
    """REAL RAID-style parity: bytewise XOR of the shard members'
    zero-padded payload buffers, computed in one numpy pass."""
    g = g.sort_values("doc_id")
    bufs = [t.encode("utf-8") for t in g["text"]]
    ln = max(len(b) for b in bufs)
    m = np.zeros((len(bufs), ln), np.uint8)
    for i, b in enumerate(bufs):
        m[i, : len(b)] = np.frombuffer(b, np.uint8)
    parity = np.bitwise_xor.reduce(m, axis=0)
    return pd.DataFrame(
        {
            "shard": [np.int64(g["shard"].iloc[0])],
            "n_members": [np.int64(len(bufs))],
            "parity_len": [np.int64(ln)],
            "parity_first_byte": [np.int64(parity[0])],
        }
    )


def xor_parity_blocks(sf_dir: str):
    """Erasure-coding parity blocks per shard: the bytewise XOR of all
    member payloads (zero-padded to the longest member) — the primitive
    that lets a lost member be reconstructed as the XOR of the parity
    with the survivors (pinned in tests). The SQL-checkable readouts are
    the member count, parity length (= max member length), and the
    parity's first byte (= bit_xor of the members' first bytes, since
    every member is non-empty).

    Scale shape: one groupby(shard) co-locates members (the natural unit
    of an erasure group); parity is a single vectorized XOR reduce.

    Output: (shard, n_members, parity_len, parity_first_byte).
    """

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        return batch.append_column(
            "shard", pc.cast(pc.divide(ids, SHARD), pa.int64())
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_parity_build, batch_format="pandas")
        .sort("shard")
    )


def content_manifest_digest(sf_dir: str):
    """Checkpoint-manifest digests: per shard, the md5 of the
    concatenated per-document md5s in doc_id order — the content-address
    a resumable pipeline stores per partition so a resumed run can prove
    byte-identical re-delivery (this repo's checkpoint manifests use the
    same idea; state/checkpoint.py). DuckDB recomputes the digest with
    its own md5/string_agg, so both the per-doc hashing and the ordering
    are pinned.

    Output: (shard, n_docs, digest).
    """
    from ..functions.hashing import md5_str

    def digest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        inner = "".join(md5_str(t) for t in g["text"])
        return pd.DataFrame(
            {
                "shard": [np.int64(g["shard"].iloc[0])],
                "n_docs": [np.int64(len(g))],
                "digest": [md5_str(inner)],
            }
        )

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        return batch.append_column(
            "shard", pc.cast(pc.divide(ids, SHARD), pa.int64())
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(digest, batch_format="pandas")
        .sort("shard")
    )


# ----------------------------------------------------------------- TAR


def _tar_build(batch: pa.Table) -> pa.Table:
    """Deterministic ustar archive per sampled doc: 1 + id%4 members,
    member m named ``m<m>.txt`` with size 10 + (id*7 + m*13) % 90, mtime
    id*100 + m, content byte (id + m) % 256 repeated — real 512-byte
    header blocks with octal fields and the ustar checksum."""
    ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
    ids = ids[ids % 7 == 0]
    blobs = []
    for did in ids:
        did = int(did)
        parts = []
        for m in range(1 + did % 4):
            size = 10 + (did * 7 + m * 13) % 90
            hdr = bytearray(512)
            name = f"m{m}.txt".encode()
            hdr[0:len(name)] = name
            hdr[100:108] = b"0000644\x00"          # mode
            hdr[108:116] = b"0000000\x00"          # uid
            hdr[116:124] = b"0000000\x00"          # gid
            hdr[124:136] = f"{size:011o}".encode() + b"\x00"
            hdr[136:148] = f"{did * 100 + m:011o}".encode() + b"\x00"
            hdr[148:156] = b" " * 8                # checksum placeholder
            hdr[156:157] = b"0"                    # typeflag: regular
            hdr[257:263] = b"ustar\x00"            # magic
            hdr[263:265] = b"00"                   # version
            chk = sum(hdr)
            hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
            content = bytes([(did + m) % 256]) * size
            pad = (-size) % 512
            parts.append(bytes(hdr) + content + b"\x00" * pad)
        parts.append(b"\x00" * 1024)  # end-of-archive
        blobs.append(b"".join(parts))
    return pa.table(
        {"doc_id": pa.array(ids), "tar": pa.array(blobs, pa.binary())}
    )


class TarWalker:
    """Actor-pool ustar walk: header checksum re-verified per member
    (sum of header bytes with the checksum field as spaces), sizes read
    from octal, payload bytes actually summed — a wrong block hop or
    checksum defect breaks equality with the formula oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_n, out_bytes, out_psum, out_mtime = [], [], [], [], []
        tars = batch.column("tar")
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        for i in range(batch.num_rows):
            buf = tars[i].as_py()
            pos = 0
            n = total = psum = msum = 0
            while pos + 512 <= len(buf):
                hdr = buf[pos:pos + 512]
                if hdr[257:262] != b"ustar":
                    break  # end-of-archive zero blocks
                stored = int(hdr[148:155].rstrip(b"\x00 "), 8)
                calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
                if stored != calc:
                    raise ValueError("tar header checksum mismatch")
                size = int(hdr[124:135].rstrip(b"\x00 "), 8)
                mtime = int(hdr[136:147].rstrip(b"\x00 "), 8)
                data = buf[pos + 512:pos + 512 + size]
                n += 1
                total += size
                psum += int(np.frombuffer(data, np.uint8).sum())
                msum += mtime
                pos += 512 + size + ((-size) % 512)
            out_id.append(int(ids[i]))
            out_n.append(n)
            out_bytes.append(total)
            out_psum.append(psum)
            out_mtime.append(msum)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_members": pa.array(out_n, pa.int64()),
                "total_payload": pa.array(out_bytes, pa.int64()),
                "payload_byte_sum": pa.array(out_psum, pa.int64()),
                "mtime_sum": pa.array(out_mtime, pa.int64()),
            }
        )


def tar_member_walk(sf_dir: str):
    """TAR-archive ingest: sampled documents ship as real ustar archives
    (octal headers, checksums, 512-block padding) and an actor-pool
    walker extracts member counts, payload byte totals/sums and mtimes —
    the oracle recomputes every value from the synthesis formula, so a
    single misparsed octal field or block hop fails the query.

    Scale shape: pure synth map + actor-pool walk (batch 64) + no
    shuffle at all; output is one row per sampled archive.

    Output: (doc_id, n_members, total_payload, payload_byte_sum,
    mtime_sum).
    """
    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_tar_build, batch_format="pyarrow")
        .map_batches(TarWalker, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
    )
