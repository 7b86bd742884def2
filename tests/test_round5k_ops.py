"""Semantic pins for the round-5 fetch-layer batch beyond oracle parity:
sitemap date round-trip through real ISO strings, HTTP status precedence,
anchor extraction against a hand-parsed fixture, canonical-cluster mass
conservation, and the gzip decoder's dead-letter (never-raise) contract.
"""

import zlib

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_sitemap_dates_roundtrip(ray_session):
    from ray_extract.pipelines.web import sitemap_parse

    df = (
        sitemap_parse(SF).to_pandas()
        .sort_values("host_id", ignore_index=True)
    )
    # epoch day 19000 = 2022-01-08; parser must get back exactly the
    # synthesized day via real ISO-string date arithmetic
    assert np.datetime64("1970-01-01") + np.int64(19000) == np.datetime64(
        "2022-01-08"
    )
    exp_max = np.zeros(53, np.int64)
    exp_sum = np.zeros(53, np.int64)
    exp_n = np.zeros(53, np.int64)
    for d in range(500):
        h = d % 53
        exp_n[h] += 1
        exp_sum[h] += d
        exp_max[h] = max(exp_max[h], 19000 + d % 365)
    assert np.array_equal(df["n_urls"].to_numpy(), exp_n)
    assert np.array_equal(df["sum_doc_ids"].to_numpy(), exp_sum)
    assert np.array_equal(df["max_lastmod_day"].to_numpy(), exp_max)


def test_http_status_precedence(ray_session):
    from ray_extract.pipelines.web import http_header_parse

    df = (
        http_header_parse(SF).to_pandas()
        .set_index("status")
    )
    # doc 0 is %29==0 AND %17 irrelevant: 301 wins over 404 (e.g. id 493
    # = 17*29 is both); statuses partition the corpus
    n301 = sum(1 for d in range(500) if d % 29 == 0)
    n404 = sum(1 for d in range(500) if d % 17 == 0 and d % 29 != 0)
    assert df.loc[301, "n"] == n301
    assert df.loc[404, "n"] == n404
    assert df.loc[200, "n"] == 500 - n301 - n404


def test_anchor_extraction_hand_fixture():
    import pyarrow.compute as pc

    from ray_extract.pipelines.web import _tails

    html = (
        '<html><body><a href="https://host5.example.com/p/1">alpha</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="https://host9.example.com/p/2">beta</a></body></html>'
    )
    parts = pc.split_pattern(pa.array([html]), pattern='href="')
    tails, _ = _tails(parts)
    url = pc.list_element(pc.split_pattern(tails, '"', max_splits=1), 0)
    rest = pc.list_element(pc.split_pattern(tails, '">', max_splits=1), 1)
    anchor = pc.list_element(pc.split_pattern(rest, "<", max_splits=1), 0)
    ex = pc.extract_regex(url, r"^https://host(?P<h>\d+)\.example\.com/")
    ok = pc.is_valid(pc.struct_field(ex, "h"))
    got = list(
        zip(
            pc.struct_field(ex, "h").filter(ok).to_pylist(),
            anchor.filter(ok).to_pylist(),
        )
    )
    assert got == [("5", "alpha"), ("9", "beta")]


def test_canonical_cluster_mass(ray_session):
    from ray_extract.pipelines.web import canonical_meta_dedup

    df = canonical_meta_dedup(SF).to_pandas()
    # clusters cover all 500 docs across exactly min(500, 201) targets
    assert (df["cluster_size"] * df["n_clusters"]).sum() == 500
    assert df["n_clusters"].sum() == 201


def test_gzip_decoder_dead_letters_never_raises():
    from ray_extract.pipelines.containers import GzipDecoder

    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    good = co.compress(b"hello gzip world") + co.flush()
    bad = good[:-8] + bytes([good[-8] ^ 0xFF]) + good[-7:]
    trunc = good[: len(good) // 2]
    out = GzipDecoder()(
        pa.table(
            {
                "source": ["s", "s", "s"],
                "gz": pa.array([good, bad, trunc], pa.binary()),
            }
        )
    ).to_pandas()
    assert out.loc[0, "n_docs"] == 3
    assert out.loc[0, "n_ok"] == 1
    assert out.loc[0, "n_corrupt"] == 2
    assert out.loc[0, "decoded_bytes"] == len(b"hello gzip world")
