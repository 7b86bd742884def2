"""Semantic pins for the round-5 container batch beyond oracle parity:
the vectorized base64/varint codecs against stdlib round-trips and
malformed inputs, real WARC/ZIP container walks against stdlib zipfile,
and robots longest-match semantics on hand cases.
"""

import base64
import io
import zipfile

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _flat(strings, typ=pa.string()):
    from ray_extract.functions.encodings import flat_bytes

    return flat_bytes(pa.array(strings, typ))


def test_b64_roundtrip_all_pad_variants():
    from ray_extract.functions.encodings import b64_decode_flat

    texts = [b"", b"a", b"ab", b"abc", b"abcd", bytes(range(256))]
    enc = [base64.b64encode(t).decode() for t in texts]
    flat, offs = _flat(enc)
    d, oo, v = b64_decode_flat(flat, offs)
    vcum = np.r_[0, np.cumsum(v)]
    for i, t in enumerate(texts):
        got = bytes(d[oo[i]:oo[i + 1]][v[oo[i]:oo[i + 1]]])
        assert got == t
        assert vcum[oo[i + 1]] - vcum[oo[i]] == len(t)


def test_b64_rejects_malformed():
    from ray_extract.functions.encodings import b64_decode_flat

    for bad in ["abc", "ab!=", "a==="]:
        flat, offs = _flat([bad])
        with pytest.raises(ValueError):
            b64_decode_flat(flat, offs)


def test_varint_roundtrip_and_malformed():
    from ray_extract.functions.encodings import (
        varint_decode_flat,
        varint_encode,
    )

    vals = np.array([0, 1, 127, 128, 300, 16383, 16384, 2**31, 2**40],
                    np.int64)
    blobs = [varint_encode(vals), varint_encode(vals[:2]), b""]
    flat, offs = _flat(blobs, pa.binary())
    got, counts = varint_decode_flat(flat, offs)
    assert list(counts) == [len(vals), 2, 0]
    assert np.array_equal(got[:len(vals)], vals)
    # truncated stream: final byte has the continuation bit set
    flat2, offs2 = _flat([b"\x80"], pa.binary())
    with pytest.raises(ValueError):
        varint_decode_flat(flat2, offs2)
    # doc boundary splitting a varint
    two = varint_encode(np.array([300]))
    flat3 = np.frombuffer(two, np.uint8)
    offs3 = np.array([0, 1, 2], np.int64)
    with pytest.raises(ValueError):
        varint_decode_flat(flat3, offs3)


def test_warc_parser_framing():
    from ray_extract.pipelines.containers import WarcParser

    body1, body2 = b"first body\r\n\r\n tricky", b"x"
    blob = b"".join(
        (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: https://host{h}.example.com/item/{i}\r\n"
            f"Content-Length: {len(b)}\r\n\r\n"
        ).encode() + b + b"\r\n\r\n"
        for h, i, b in [(3, 0, body1), (3, 1, body2)]
    )
    out = WarcParser()(
        pa.table({"blob": pa.array([blob], pa.binary())})
    ).to_pandas()
    # the CRLFCRLF inside body1 must NOT split the record
    assert out.loc[0, "host_id"] == 3
    assert out.loc[0, "n_records"] == 2
    assert out.loc[0, "body_bytes"] == len(body1) + len(body2)


def test_zip_build_readable_by_stdlib_and_walker_catches_corruption():
    import pandas as pd

    from ray_extract.pipelines.containers import ZipWalker, _zip_build

    g = pd.DataFrame(
        {
            "shard": [0, 0, 0],
            "doc_id": [0, 7, 9],
            "text": ["alpha", "corrupt me", "gamma"],
        }
    )
    blob = _zip_build(g)["blob"].iloc[0]
    # stdlib must accept the container layout we emit
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert sorted(zf.namelist()) == ["doc0.txt", "doc7.txt", "doc9.txt"]
    assert zf.read("doc0.txt") == b"alpha"
    assert zf.read("doc9.txt") == b"gamma"
    out = ZipWalker()(
        pa.table({"shard": pa.array([0], pa.int64()),
                  "blob": pa.array([blob], pa.binary())})
    ).to_pandas()
    assert out.loc[0, "n_members"] == 3
    assert out.loc[0, "n_crc_ok"] == 2  # doc 7's payload was flipped
    assert out.loc[0, "total_bytes"] == len("alphacorrupt megamma")


def test_robots_longest_match_semantics():
    from ray_extract.pipelines.containers import parse_robots

    rules = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/f3\n"
    )
    assert ("/private/", False) in rules and ("/private/f3", True) in rules

    def decide(path):
        best_len, best_allow = -1, True
        for prefix, allow in rules:
            if path.startswith(prefix) and len(prefix) > best_len:
                best_len, best_allow = len(prefix), allow
        return best_allow

    assert decide("/private/f3") is True      # longer Allow wins
    assert decide("/private/f4") is False     # Disallow prefix
    assert decide("/public/x") is True        # no rule -> allowed


def test_container_queries_match_raw_table(ray_session):
    import duckdb

    from ray_extract.pipelines.containers import warc_extract

    got = (
        warc_extract(SF).to_pandas()
        .sort_values("host_id", ignore_index=True)
    )
    exp = duckdb.sql(
        f"""SELECT doc_id % 53 AS host_id, count(*) AS n_records,
                   sum(strlen(text)) AS body_bytes
            FROM '{SF}/documents.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert np.array_equal(got["n_records"].to_numpy(),
                          exp["n_records"].to_numpy().astype(np.int64))
    assert np.array_equal(got["body_bytes"].to_numpy(),
                          exp["body_bytes"].to_numpy().astype(np.int64))
