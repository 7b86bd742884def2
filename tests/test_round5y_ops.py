"""Semantic pins for the CDC/trie/quantile-gate batch beyond oracle
parity: chunk boundaries match a per-doc Python replay (including
batch-boundary safety), boundary stability under prefix insertion (the
CDC property), trie fanout closure, and sketch rank errors bounded by
the largest bin.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def _py_boundaries(text: str, window: int = 4, modulus: int = 32):
    b = [ord(c) for c in text]
    out = []
    for i in range(window - 1, len(b) - 1):
        if sum(b[i - window + 1 : i + 1]) % modulus == 0:
            out.append(i)
    return out


def test_cdc_matches_python_replay(ray_session):
    import duckdb

    from ray_extract.pipelines.text import cdc_chunk_stats

    got = cdc_chunk_stats(SF).to_pandas().set_index("doc_id")
    raw = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' LIMIT 60"
    ).df()
    for _, r in raw.iterrows():
        bs = _py_boundaries(r["text"])
        assert int(got.loc[r["doc_id"], "n_chunks"]) == len(bs) + 1
        want_first = bs[0] if bs else -1
        assert int(got.loc[r["doc_id"], "first_boundary"]) == want_first


def test_cdc_boundary_stability_under_prefix_insert():
    # the defining CDC property: inserting a prefix shifts early
    # boundaries but leaves all boundaries beyond the window re-aligned
    # to the same content positions
    text = "the quick brown fox jumps over the lazy dog again and again"
    base = _py_boundaries(text)
    shifted = _py_boundaries("xyzq " + text)
    realigned = [b - 5 for b in shifted if b - 5 >= 4]
    tail_base = [b for b in base if b >= 4]
    # boundaries sufficiently past the insertion agree
    assert set(realigned) & set(tail_base) == set(tail_base)


def test_trie_fanout_closure(ray_session):
    import duckdb

    from ray_extract.pipelines.text import prefix_trie_fanout

    df = prefix_trie_fanout(SF).to_pandas().set_index("prefix_len")
    vocab = duckdb.sql(
        f"SELECT count(DISTINCT u.w) FROM (SELECT string_split(text,' ') "
        f"AS ws FROM '{SF}/documents.parquet'), unnest(ws) AS u(w)"
    ).fetchone()[0]
    for plen in (1, 2, 3):
        assert int(df.loc[plen, "n_words"]) == vocab
        assert int(df.loc[plen, "max_fanout"]) <= vocab
    # longer prefixes never reduce the number of prefixes
    assert (
        df["n_prefixes"].loc[1]
        <= df["n_prefixes"].loc[2]
        <= df["n_prefixes"].loc[3]
    )


def test_quantile_sketch_error_bounded(ray_session):
    import duckdb

    from ray_extract.pipelines.relational import quantile_sketch_error_audit

    df = quantile_sketch_error_audit(SF).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    # achieved rank always reaches the target (bin upper edge covers it)
    assert (df["achieved_rank"] >= df["target_rank"]).all()
    # the approx value's TRUE rank matches achieved_rank
    for _, r in df.iterrows():
        rank = duckdb.sql(
            f"SELECT count(*) FROM '{SF}/orders.parquet' WHERE "
            f"CAST(floor(o_totalprice*100+0.5) AS BIGINT) "
            f"<= {int(r['approx_value_cents'])}"
        ).fetchone()[0]
        assert rank == int(r["achieved_rank"])
        assert int(r["rank_error_ppm"]) == abs(
            rank - int(r["target_rank"])
        ) * 1_000_000 // total
