"""Semantic pins for the round-5 fifth-batch operators beyond oracle
parity: edge_support_histogram vs set-based common neighbors,
component_diameter_histogram's round cap on a synthetic chain,
interval_coverage vs a Python sweep (incl. the touching-intervals merge
convention), and heavy_hitter_drift's either-half top-k membership.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _patched_pairs(monkeypatch_target, pairs_tbl):
    import ray.data as rd

    from ray_extract.pipelines import dedup as dd

    orig = dd.simhash_pairs_cached
    dd.simhash_pairs_cached = lambda sf_dir, **kw: rd.from_arrow(pairs_tbl)
    dd._CLUSTERS_MEMO.clear()
    return orig


def test_edge_support_brute_force(ray_session):
    from ray_extract.pipelines.dedup import (
        edge_support_histogram,
        simhash_pairs,
    )

    pairs = simhash_pairs(SF).to_pandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    want: dict[int, int] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        s = len(adj[int(a)] & adj[int(b)])
        want[s] = want.get(s, 0) + 1

    got = edge_support_histogram(SF).to_pandas()
    assert dict(zip(got["support"], got["n_edges"])) == want


def test_component_diameter_round_cap(ray_session):
    """A 12-chain has true diameter 11 -> capped at 8; a 5-chain (diam 4)
    and a triangle (diam 1) report exactly."""
    from ray_extract.pipelines import dedup as dd

    pairs = pa.table(
        {
            # chain 0..11, chain 100..104, triangle 200,201,202
            "doc_a": pa.array(
                list(range(11)) + list(range(100, 104)) + [200, 200, 201],
                pa.int64(),
            ),
            "doc_b": pa.array(
                list(range(1, 12)) + list(range(101, 105)) + [201, 202, 202],
                pa.int64(),
            ),
        }
    )
    orig = _patched_pairs(None, pairs)
    try:
        got = dd.component_diameter_histogram("unused").to_pandas()
    finally:
        dd.simhash_pairs_cached = orig
        dd._CLUSTERS_MEMO.clear()
    assert dict(zip(got["diameter"], got["n_components"])) == {
        8: 1, 4: 1, 1: 1
    }


def test_component_diameter_brute_force(ray_session):
    from ray_extract.pipelines.dedup import (
        component_diameter_histogram,
        simhash_pairs,
    )

    pairs = simhash_pairs(SF).to_pandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    seen: set[int] = set()
    want: dict[int, int] = {}
    for start in adj:
        if start in seen:
            continue
        comp = {start}
        stack = [start]
        while stack:
            for m in adj[stack.pop()]:
                if m not in comp:
                    comp.add(m)
                    stack.append(m)
        seen |= comp
        dia = 0
        for src in comp:
            dist = {src: 0}
            frontier = [src]
            while frontier and max(dist.values()) < 8:
                nxt = []
                for v in frontier:
                    for m in adj[v]:
                        if m not in dist:
                            dist[m] = dist[v] + 1
                            nxt.append(m)
                frontier = nxt
            ecc = 8 if len(dist) < len(comp) else max(dist.values())
            dia = max(dia, ecc)
        want[dia] = want.get(dia, 0) + 1

    got = component_diameter_histogram(SF).to_pandas()
    assert dict(zip(got["diameter"], got["n_components"])) == want


def test_interval_coverage_brute_force(ray_session):
    from ray_extract.pipelines.events import interval_coverage

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    sec = ev["ts"].to_numpy().astype("datetime64[us]").astype(
        np.int64
    ) // 1_000_000
    want = {}
    for uid, g in pd.DataFrame(
        {"u": ev["user_id"].to_numpy(), "s": sec}
    ).groupby("u"):
        ivs = sorted((int(s), int(s) + 30) for s in g["s"])
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[int(uid)] = (
            len(ivs),
            len(islands),
            sum(e - s for s, e in islands),
        )

    got = interval_coverage(SF).to_pandas()
    have = {
        int(r.user_id): (int(r.n_intervals), int(r.n_islands),
                         int(r.covered_seconds))
        for r in got.itertuples()
    }
    assert have == want


def test_interval_coverage_touching_merge(ray_session, tmp_path):
    """Intervals [0,30) and [30,60) touch -> ONE island of 60 s; a gap of
    one second -> two islands."""
    from ray_extract.pipelines.events import interval_coverage

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [base, base + np.timedelta64(30, "s"),          # user 1: touching
          base, base + np.timedelta64(31, "s")]          # user 2: gap
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = interval_coverage(str(tmp_path)).to_pandas().set_index("user_id")
    assert int(got.loc[1, "n_islands"]) == 1
    assert int(got.loc[1, "covered_seconds"]) == 60
    assert int(got.loc[2, "n_islands"]) == 2
    assert int(got.loc[2, "covered_seconds"]) == 60


def test_heavy_hitter_drift_membership(ray_session):
    from ray_extract.pipelines.text import heavy_hitter_drift

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    counts = {0: {}, 1: {}}
    for did, text in zip(docs["doc_id"], docs["text"]):
        c = counts[int(did) % 2]
        for w in text.split(" "):
            c[w] = c.get(w, 0) + 1
    want_words = set()
    for h in (0, 1):
        top = sorted(counts[h].items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        want_words |= {w for w, _ in top}

    got = heavy_hitter_drift(SF).to_pandas()
    assert set(got["word"]) == want_words
    for r in got.itertuples():
        assert int(r.n_even) == counts[0].get(r.word, 0)
        assert int(r.n_odd) == counts[1].get(r.word, 0)
