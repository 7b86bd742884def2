"""Semantic pins for the round-5 web-extraction batch beyond oracle
parity: link extraction against a hand-parsed HTML fixture (decoys must
not leak), URL canonicalization rules one by one, charset sniffing on
hand-encoded payloads, heading-outline violation detection, and
redirect-chain resolution against a NetworkX-free hand chase.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_link_graph_matches_hand_parse(ray_session):
    import re

    from ray_extract.pipelines.web import link_graph_degrees

    got = (
        link_graph_degrees(SF).to_pandas()
        .sort_values("host_id", ignore_index=True)
    )
    # hand model: doc d emits links k=0..d%5 to host (d*7+k*13)%101;
    # mailto + bare href= decoys excluded
    links: dict[int, int] = {}
    docs: dict[int, set] = {}
    for d in range(500):
        for k in range(d % 5 + 1):
            h = (d * 7 + k * 13) % 101
            links[h] = links.get(h, 0) + 1
            docs.setdefault(h, set()).add(d)
    assert len(got) == len(links)
    for _, row in got.iterrows():
        h = int(row["host_id"])
        assert int(row["n_links"]) == links[h]
        assert int(row["n_src_docs"]) == len(docs[h])
    # the regex itself must reject the decoys the synth plants
    pat = re.compile(r"^https://host(\d+)\.example\.com/")
    assert not pat.match("mailto:u0@x.example")
    assert not pat.match("https://hostile.example.com/")


def test_url_canonicalization_rules(ray_session):
    from ray_extract.pipelines.web import url_frontier_dedup

    got = (
        url_frontier_dedup(SF).to_pandas()
        .sort_values("host_id", ignore_index=True)
    )
    # every doc contributes 3 raw urls (+1 on even ids); all 3 item
    # variants of one doc collapse to ONE canonical url
    raws: dict[int, int] = {}
    canon: dict[int, set] = {}
    for d in range(500):
        h = d % 53
        raws[h] = raws.get(h, 0) + 3 + (1 if d % 2 == 0 else 0)
        canon.setdefault(h, set()).add(f"item/{d % 499}")
        if d % 2 == 0:
            canon[h].add("about")
    assert len(got) == len(raws)
    for _, row in got.iterrows():
        h = int(row["host_id"])
        assert int(row["n_raw"]) == raws[h]
        assert int(row["n_canonical"]) == len(canon[h])


def test_charset_sniffer_hand_payloads():
    from ray_extract.pipelines.web import CharsetSniffer

    batch = pa.table(
        {
            "source": ["s", "s", "s", "s"],
            "payload": pa.array(
                [
                    "plain".encode("utf-8"),
                    b"\xef\xbb\xbf" + "bom8".encode("utf-8"),
                    b"\xff\xfe" + "bom16!".encode("utf-16-le"),
                    "ok".encode("utf-8") + b"\xe9 ",
                ],
                pa.binary(),
            ),
        }
    )
    out = CharsetSniffer()(batch).to_pandas()
    assert out.loc[0, "n_plain_utf8"] == 1
    assert out.loc[0, "n_bom_utf8"] == 1
    assert out.loc[0, "n_bom_utf16"] == 1
    assert out.loc[0, "n_latin1"] == 1
    # decoded chars: 5 + 4 + 6 + (2 utf8 bytes + 2 latin1 bytes)
    assert out.loc[0, "n_chars"] == 5 + 4 + 6 + 4


def test_heading_outline_violation_detection(ray_session):
    from ray_extract.pipelines.web import heading_outline

    got = heading_outline(SF).to_pandas()
    # hand model per doc
    import duckdb

    exp = duckdb.sql(
        f"""
        WITH d AS (SELECT doc_id, source
                   FROM '{SF}/documents.parquet'),
        h AS (SELECT d.doc_id, d.source, j.j,
                     1 + (d.doc_id*3 + j.j*j) % 3 AS lvl
              FROM d JOIN generate_series(0, 8) j(j)
                ON j.j < 3 + d.doc_id % 7)
        SELECT source, count(DISTINCT doc_id) n_docs, count(*) n_headings
        FROM h GROUP BY 1 ORDER BY 1
        """
    ).df()
    g = got.sort_values("source", ignore_index=True)
    assert np.array_equal(g["n_docs"].to_numpy(),
                          exp["n_docs"].to_numpy().astype(np.int64))
    assert np.array_equal(g["n_headings"].to_numpy(),
                          exp["n_headings"].to_numpy().astype(np.int64))
    # direct kernel pin: h1,h3 is a violation; h1,h2 is not
    from ray_extract.pipelines.web import _tails
    import pyarrow.compute as pc

    parts = pc.split_pattern(
        pa.array(["<body><h1>a</h1><h3>b</h3></body>",
                  "<body><h1>a</h1><h2>b</h2></body>"]),
        pattern="<h",
    )
    tails, par = _tails(parts)
    lvl = pc.cast(pc.utf8_slice_codeunits(tails, 0, 1), pa.int64()).to_numpy()
    same = par[1:] == par[:-1]
    viol = same & (lvl[1:] > lvl[:-1] + 1)
    assert viol.sum() == 1 and par[1:][viol][0] == 0


def test_redirect_resolve_hand_chase(ray_session):
    import pyarrow.parquet as pq

    from ray_extract.pipelines.web import redirect_resolve

    got = (
        redirect_resolve(SF).to_pandas()
        .sort_values("hops", ignore_index=True)
    )
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    n = t.num_rows
    nc = np.zeros(n, np.int64)
    nc[t.column("doc_id").to_numpy()] = t.column("n_chars").to_numpy()
    cond = nc % 3 == 0
    hist: dict[int, list] = {}
    for u in range(n):
        cur, hops = u, 0
        while hops < 8 and cond[cur]:
            cur = (cur * 31 + 7) % n
            hops += 1
        hist.setdefault(hops, []).append(cur)
    assert len(got) == len(hist)
    for _, row in got.iterrows():
        h = int(row["hops"])
        assert int(row["n_chains"]) == len(hist[h])
        assert int(row["terminal_sum"]) == sum(hist[h])
    # chains with 0 hops exist (non-multiple-of-3 lengths) and so do
    # multi-hop chains — the op exercises both branches
    assert 0 in hist and max(hist) >= 2
