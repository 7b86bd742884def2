"""Semantic pins for the round-5 seventh-batch operators beyond oracle
parity: the WAV codec round-trip and malformed-input contract,
pii_scrub_stats against a hand-scrubbed corpus, association_rules
supports/invariants, seasonal_naive_error on a hand-built calendar, and
partition_boundaries against a full sort.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_wav_codec_roundtrip():
    from ray_extract.functions.wav import wav_decode, wav_encode_pcm16

    s = ((7 * 13 + 31 * np.arange(457)) % 4001 - 2000).astype(np.int16)
    d = wav_decode(wav_encode_pcm16(s, 9000))
    assert d["sample_rate"] == 9000 and d["n_channels"] == 1
    assert np.array_equal(d["samples"], s)
    st = np.stack([s[:101], s[1:102]], axis=1)  # stereo, odd frame count
    d2 = wav_decode(wav_encode_pcm16(st, 8000))
    assert d2["n_channels"] == 2 and np.array_equal(d2["samples"], st)


def test_wav_codec_rejects_malformed():
    import struct

    import pytest

    from ray_extract.functions.wav import wav_decode, wav_encode_pcm16

    good = wav_encode_pcm16(np.arange(64, dtype=np.int16), 8000)
    bad_cases = [
        b"",
        b"RIFF" + b"\x00" * 8,                      # wrong magic tail
        good[:20],                                   # truncated
        good.replace(b"data", b"datx", 1),           # missing data chunk
        good.replace(b"fmt ", b"fmtx", 1),           # missing fmt chunk
        good[:4] + struct.pack("<I", 2**31) + good[8:],  # size overrun
    ]
    for blob in bad_cases:
        with pytest.raises(ValueError):
            wav_decode(blob)
    # float/24-bit formats are rejected, not mis-decoded
    mangled = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    mangled[fmt_at:fmt_at + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError):
        wav_decode(bytes(mangled))


def test_media_decode_wav_matches_formula(ray_session):
    from ray_extract.pipelines.media import media_decode_wav

    got = (
        media_decode_wav(SF).to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert (got["doc_id"] % 13 == 0).all()
    for _, r in got.head(5).iterrows():
        did = int(r["doc_id"])
        n = 200 + did % 257
        s = (7 * did + 31 * np.arange(n)) % 4001 - 2000
        assert r["n_samples"] == n
        assert r["sample_rate"] == 8000 + (did % 5) * 1000
        assert r["peak_abs"] == np.abs(s).max()
        assert r["sum_abs"] == np.abs(s).sum()
        assert r["n_neg"] == int((s < 0).sum())


def test_pii_scrub_hand_check(ray_session):
    """Redo the lacing + scrub in plain Python re for a sample of docs and
    pin the per-source fold."""
    import re

    import pyarrow.parquet as pq

    from ray_extract.pipelines.text import (
        PII_EMAIL_PATTERN,
        PII_PHONE_PATTERN,
        pii_scrub_stats,
    )

    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    ).to_pandas()
    email, phone = re.compile(PII_EMAIL_PATTERN), re.compile(PII_PHONE_PATTERN)
    rows = []
    for _, r in t.iterrows():
        did = int(r["doc_id"])
        laced = (
            f"{r['text']} contact user{did}@mail{did % 7}.example.com"
            f" or call +1-555-{did % 10000:04d}"
        )
        if did % 3 == 0:
            laced += f" alt.x{did}@test.org"
        red = phone.sub("<PHONE>", email.sub("<EMAIL>", laced))
        rows.append(
            (r["source"], len(email.findall(laced)),
             len(phone.findall(laced)), len(laced) - len(red))
        )
    exp = (
        pd.DataFrame(rows, columns=["source", "ne", "np", "rm"])
        .groupby("source", as_index=False)
        .agg(n_docs=("ne", "size"), n_emails=("ne", "sum"),
             n_phones=("np", "sum"), chars_removed=("rm", "sum"))
        .sort_values("source", ignore_index=True)
    )
    got = pii_scrub_stats(SF).to_pandas().sort_values(
        "source", ignore_index=True)
    assert got["source"].tolist() == exp["source"].tolist()
    for c in ["n_docs", "n_emails", "n_phones", "chars_removed"]:
        assert got[c].astype("int64").tolist() == exp[c].astype("int64").tolist(), c


def test_association_rules_invariants(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import association_rules

    got = association_rules(SF).to_pandas()
    assert (got["part_a"] < got["part_b"]).all()
    assert (got["co_orders"] >= 3).all()
    # co-occurrence can never exceed either side's own support
    assert (got["co_orders"] <= got[["n_orders_a", "n_orders_b"]].min(axis=1)).all()
    # spot-check one pair's support against a direct count
    r = got.iloc[0]
    n = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM '{SF}/lineitem.parquet'"
        f" WHERE l_partkey = {int(r['part_a'])}"
    ).fetchone()[0]
    assert int(r["n_orders_a"]) == n


def test_seasonal_naive_error_hand_calendar(ray_session):
    """Pin the lag-7 alignment + weekday fold against pandas on the real
    table (independent implementation, same rule)."""
    import pyarrow.parquet as pq

    from ray_extract.pipelines.relational import seasonal_naive_error

    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    day = (t["o_orderdate"].astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    cents = np.floor(t["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    daily = pd.DataFrame({"day": day, "c": cents}).groupby("day")["c"].sum()
    prior = daily.reindex(daily.index - 7)
    mask = prior.notna().to_numpy()
    err = np.abs(daily.to_numpy()[mask] - prior.to_numpy()[mask]).astype("int64")
    wd = (daily.index.to_numpy()[mask]) % 7
    exp = (
        pd.DataFrame({"weekday": wd, "err": err})
        .groupby("weekday", as_index=False)
        .agg(n_days=("err", "size"), sum_abs_err_cents=("err", "sum"))
    )
    got = seasonal_naive_error(SF).to_pandas().sort_values(
        "weekday", ignore_index=True)
    assert got["weekday"].tolist() == exp["weekday"].tolist()
    assert got["n_days"].tolist() == exp["n_days"].tolist()
    assert got["sum_abs_err_cents"].tolist() == exp["sum_abs_err_cents"].tolist()


def test_partition_boundaries_vs_full_sort(ray_session):
    import pyarrow.parquet as pq

    from ray_extract.pipelines.relational import partition_boundaries

    v = np.sort(
        np.floor(
            pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_extendedprice"])
            .column("l_extendedprice").to_numpy() * 100 + 0.5
        ).astype("int64")
    )
    n = len(v)
    got = partition_boundaries(SF).to_pandas().sort_values(
        "q", ignore_index=True)
    assert got["q"].tolist() == list(range(1, 16))
    for q, b in zip(got["q"], got["boundary_cents"]):
        rank = (q * n + 15) // 16
        assert b == v[rank - 1]
    # boundaries are non-decreasing and would split into equi-depth parts
    assert (np.diff(got["boundary_cents"].to_numpy()) >= 0).all()
