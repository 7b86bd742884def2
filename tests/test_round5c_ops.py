"""Semantic pins for the round-5 third-batch operators beyond oracle parity:
strict-dominance and tie-keeping of skyline_parts, the count-compressed
Levenshtein mass of name_edit_histogram vs a brute-force DP, and the
bounded-round peeling schedule of kcore_peel_counts vs an independent
in-test peeler.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _cents(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(
        np.int64
    )


def test_skyline_parts_brute_force(ray_session):
    """Every emitted row is undominated, every omitted row is dominated."""
    from ray_extract.pipelines.relational import skyline_parts

    got = skyline_parts(SF).to_pandas().sort_values("p_partkey")
    p = duckdb.sql(
        f"SELECT p_partkey, p_retailprice, p_size FROM '{SF}/part.parquet'"
    ).df()
    price = _cents(p["p_retailprice"])
    size = p["p_size"].to_numpy().astype(np.int64)
    dominated = np.zeros(len(p), dtype=bool)
    for i in range(len(p)):
        dominated[i] = bool(
            (
                (price <= price[i])
                & (size >= size[i])
                & ((price < price[i]) | (size > size[i]))
            ).any()
        )
    want = set(p["p_partkey"].to_numpy()[~dominated])
    assert set(got["p_partkey"]) == want
    assert (got["price_cents"].to_numpy() >= 0).all()


def test_skyline_keeps_exact_ties(ray_session, tmp_path):
    """Two frontier rows with identical (price, size) both survive."""
    from ray_extract.pipelines.relational import skyline_parts

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                "p_retailprice": pa.array([1.0, 1.0, 2.0, 0.5]),
                "p_size": pa.array([10, 10, 10, 1], type=pa.int32()),
            }
        ),
        tmp_path / "part.parquet",
    )
    got = skyline_parts(str(tmp_path)).to_pandas()
    # parts 1,2 tie on the frontier; 3 is dominated (same size, pricier);
    # 4 is undominated (strictly cheaper, smaller)
    assert sorted(got["p_partkey"]) == [1, 2, 4]


def test_name_edit_histogram_brute_force(ray_session):
    """Distance mass equals a per-pair brute-force DP over raw rows."""
    from ray_extract.pipelines.dedup import name_edit_histogram

    got = name_edit_histogram(SF).to_pandas().set_index("dist")["n_pairs"]

    def lev(s, t):
        m, n = len(s), len(t)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (s[i - 1] != t[j - 1]),
                )
            prev = cur
        return prev[n]

    p = duckdb.sql(
        f"SELECT p_brand, p_name FROM '{SF}/part.parquet'"
    ).df()
    want: dict[int, int] = {}
    for _, grp in p.groupby("p_brand"):
        names = grp["p_name"].tolist()
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                d = lev(names[i], names[j])
                want[d] = want.get(d, 0) + 1
    assert dict(got) == want
    # mass invariant: every within-brand unordered pair counted once
    tot = sum(
        len(g) * (len(g) - 1) // 2 for _, g in p.groupby("p_brand")
    )
    assert int(got.sum()) == tot


def test_name_edit_histogram_cap_drops_rarest(ray_session):
    """max_group_names keeps the most frequent distinct names only."""
    from ray_extract.pipelines.dedup import name_edit_histogram

    full = name_edit_histogram(SF).to_pandas()
    capped = name_edit_histogram(SF, max_group_names=3).to_pandas()
    assert capped["n_pairs"].sum() < full["n_pairs"].sum()
    # capped histogram is a sub-mass of the full one at every distance
    f = full.set_index("dist")["n_pairs"]
    for _, row in capped.iterrows():
        assert row["n_pairs"] <= f.loc[row["dist"]]


def test_kcore_peel_matches_reference_peeler(ray_session):
    """Three synchronous peel rounds, k=2, vs an independent peeler."""
    from ray_extract.pipelines.dedup import kcore_peel_counts, simhash_pairs

    got = (
        kcore_peel_counts(SF)
        .to_pandas()
        .set_index("stage")["n_nodes"]
        .to_dict()
    )
    pairs = simhash_pairs(SF).to_pandas()
    edges = set(
        map(tuple, pairs[["doc_a", "doc_b"]].to_numpy().tolist())
    )
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    want = {}
    for r in (1, 2, 3):
        deg: dict[int, int] = {v: 0 for v in nodes}
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        rm = {v for v in nodes if deg[v] < 2}
        want[r] = len(rm)
        nodes -= rm
        edges = {(a, b) for a, b in edges if a in nodes and b in nodes}
    want[0] = len(nodes)
    assert got == want
    # mass conservation: peeled + survivors = initial node count
    assert sum(got.values()) == len(
        set(pairs["doc_a"]) | set(pairs["doc_b"])
    )


def test_curation_funnel_monotone_and_consistent(ray_session):
    """Funnel counts are monotone non-increasing; stages 1-4 replay against
    quality_filter's own survivors."""
    from ray_extract.pipelines.text import curation_funnel, quality_filter

    got = (
        curation_funnel(SF)
        .to_pandas()
        .set_index("stage")["n_docs"]
        .to_dict()
    )
    assert list(got) == [1, 2, 3, 4, 5, 6]
    vals = [got[s] for s in range(1, 7)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert got[1] == n_docs
    # quality_filter dedups WITHIN survivors; the funnel's stage 4 uses
    # corpus-global winners, so it can only be <= the quality_filter count
    qf = quality_filter(SF).to_pandas()
    assert got[3] >= got[4]
    assert got[4] <= len(qf)


def test_assortativity_terms_brute_force(ray_session):
    """Integer sums vs a networkx-free pandas recomputation."""
    from ray_extract.pipelines.dedup import assortativity_terms, simhash_pairs

    got = assortativity_terms(SF).to_pandas().iloc[0]
    pairs = simhash_pairs(SF).to_pandas()
    a = np.r_[pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()]
    b = np.r_[pairs["doc_b"].to_numpy(), pairs["doc_a"].to_numpy()]
    nodes, deg = np.unique(a, return_counts=True)
    x = deg[np.searchsorted(nodes, a)]
    y = deg[np.searchsorted(nodes, b)]
    assert got["m_edges"] == len(a)
    assert got["sum_deg"] == x.sum()
    assert got["sum_deg_sq"] == (x * x).sum()
    assert got["sum_deg_prod"] == (x * y).sum()
    # symmetry: the prod term is symmetric, so r is well-defined from
    # these three sums; sanity-check the assembled r is within [-1, 1]
    m, s, s2, sp = (
        int(got["m_edges"]), int(got["sum_deg"]),
        int(got["sum_deg_sq"]), int(got["sum_deg_prod"]),
    )
    denom = m * s2 - s * s
    if denom:
        r = (m * sp - s * s) / denom
        assert -1.0 - 1e-9 <= r <= 1.0 + 1e-9


def test_ks_drift_terms_brute_force(ray_session):
    """Exact integer KS vs a scipy-free brute force over raw lengths."""
    from ray_extract.pipelines.text import ks_drift_terms

    got = ks_drift_terms(SF).to_pandas().set_index("source")
    d = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).df()
    n = len(d)
    for src, grp in d.groupby("source"):
        v_s = np.sort(grp["n_chars"].to_numpy())
        v_r = np.sort(d.loc[d["source"] != src, "n_chars"].to_numpy())
        n_s, n_r = len(v_s), len(v_r)
        vals = np.unique(d["n_chars"].to_numpy())
        cs = np.searchsorted(v_s, vals, side="right")
        cr = np.searchsorted(v_r, vals, side="right")
        d_num = int(np.abs(cs * n_r - cr * n_s).max())
        row = got.loc[src]
        assert row["n_s"] == n_s
        assert row["d_num"] == d_num
        assert row["d_den"] == n_s * n_r


def test_cusum_changepoint_brute_force(ray_session):
    """Shard-rebased distributed scan equals a single-machine CUSUM."""
    from ray_extract.pipelines.events import cusum_changepoint_terms

    got = (
        cusum_changepoint_terms(SF).to_pandas().set_index("event_type")
    )
    e = duckdb.sql(
        f"SELECT event_type, ts, event_id, value FROM '{SF}/events.parquet'"
    ).df()
    e["cents"] = np.floor(e["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    for typ, grp in e.groupby("event_type"):
        order = np.lexsort(
            (grp["event_id"].to_numpy(), grp["ts"].to_numpy())
        )
        c = grp["cents"].to_numpy()[order]
        n, tot = len(c), int(c.sum())
        cum = np.cumsum(c)
        idx = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(n * cum - idx * tot)
        row = got.loc[typ]
        assert row["n_events"] == n and row["tot_cents"] == tot
        assert row["cusum_num"] == int(dev.max())
        assert row["t_at_max"] == int(idx[dev == dev.max()].min())


def test_cluster_density_histogram_invariants(ray_session):
    """Edge mass = total pair count; size mass = clustered node count;
    every cell respects the chain..clique edge bounds."""
    from ray_extract.pipelines.dedup import (
        cluster_density_histogram,
        duplicate_clusters,
        simhash_pairs,
    )

    got = cluster_density_histogram(SF).to_pandas()
    n_pairs = len(simhash_pairs(SF).to_pandas())
    labels = duplicate_clusters(SF)
    assert (got["n_edges"] * got["n_clusters"]).sum() == n_pairs
    assert (got["size"] * got["n_clusters"]).sum() == labels.num_rows
    # connectivity lower bound (CC: n-1 edges) and simple-graph upper bound
    assert (got["n_edges"] >= got["size"] - 1).all()
    assert (got["n_edges"] <= got["size"] * (got["size"] - 1) // 2).all()


def test_cross_lang_dup_pairs_brute_force(ray_session):
    """Native-join matrix equals a pandas merge; mass = pair count."""
    from ray_extract.pipelines.dedup import cross_lang_dup_pairs, simhash_pairs

    got = (
        cross_lang_dup_pairs(SF)
        .to_pandas()
        .sort_values(["lang_a", "lang_b"])
        .reset_index(drop=True)
    )
    pairs = simhash_pairs(SF).to_pandas()
    langs = duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF}/documents.parquet'"
    ).df()
    m = pairs.merge(
        langs.rename(columns={"doc_id": "doc_a", "lang": "la"}), on="doc_a"
    ).merge(
        langs.rename(columns={"doc_id": "doc_b", "lang": "lb"}), on="doc_b"
    )
    lo = np.minimum(m["la"], m["lb"])
    hi = np.maximum(m["la"], m["lb"])
    want = (
        pd.DataFrame({"lang_a": lo, "lang_b": hi})
        .value_counts()
        .sort_index()
    )
    got_s = got.set_index(["lang_a", "lang_b"])["n_pairs"]
    assert got_s.to_dict() == want.to_dict()
    assert int(got["n_pairs"].sum()) == len(pairs)


def test_incremental_dedup_never_compares_old_old(ray_session):
    """Matches equal the straddling subset of the full pair graph — and
    nothing else (no old-old or new-new leakage)."""
    from ray_extract.pipelines.dedup import (
        incremental_dedup_matches,
        simhash_pairs,
    )

    got = incremental_dedup_matches(SF).to_pandas()
    pairs = simhash_pairs(SF).to_pandas()
    max_id = int(
        duckdb.sql(
            f"SELECT max(doc_id) FROM '{SF}/documents.parquet'"
        ).fetchone()[0]
    )
    cut = (max_id + 1) * 90 // 100
    a = np.r_[pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()]
    b = np.r_[pairs["doc_b"].to_numpy(), pairs["doc_a"].to_numpy()]
    keep = (a >= cut) & (b < cut)
    want = (
        pd.DataFrame({"new_doc": a[keep], "old": b[keep]})
        .groupby("new_doc")["old"]
        .agg(["min", "count"])
    )
    assert set(got["new_doc"]) == set(want.index)
    g = got.set_index("new_doc")
    for nd, row in want.iterrows():
        assert g.loc[nd, "matched_old"] == row["min"]
        assert g.loc[nd, "n_old_matches"] == row["count"]
    # every reported id respects the cut from both sides
    assert (got["new_doc"].to_numpy() >= cut).all()
    assert (got["matched_old"].to_numpy() < cut).all()


def test_km_repeat_terms_brute_force(ray_session):
    """KM table vs a per-customer brute force; at-risk telescoping."""
    from ray_extract.pipelines.relational import km_repeat_terms

    got = km_repeat_terms(SF).to_pandas()
    o = duckdb.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt"
        f" FROM '{SF}/orders.parquet'"
    ).df()
    horizon = o["dt"].max()
    recs = []
    for _, grp in o.groupby("o_custkey"):
        days = np.sort(grp["dt"].unique())
        if len(days) > 1:
            recs.append((int((days[1] - days[0]) / np.timedelta64(1, "D")), 1))
        else:
            recs.append((int((horizon - days[0]) / np.timedelta64(1, "D")), 0))
    df = pd.DataFrame(recs, columns=["dur", "ev"])
    want = (
        df.groupby("dur")
        .agg(n_event=("ev", "sum"), n=("ev", "count"))
        .sort_index()
    )
    want["n_censored"] = want["n"] - want["n_event"]
    want["n_at_risk"] = want["n"][::-1].cumsum()[::-1]
    g = got.set_index("d_days").sort_index()
    assert list(g.index) == list(want.index)
    for col in ("n_event", "n_censored", "n_at_risk"):
        assert (g[col].to_numpy() == want[col].to_numpy()).all()
    # telescoping: at_risk[i] - at_risk[i+1] = events + censored at i
    ar = g["n_at_risk"].to_numpy()
    assert (
        ar[:-1] - ar[1:]
        == (g["n_event"] + g["n_censored"]).to_numpy()[:-1]
    ).all()
