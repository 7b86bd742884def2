"""Parity: vectorized hash kernels == scalar specification.

The scalar functions in functions/hashing.py are the spec the DuckDB oracles
mirror; the *_batch forms must be value-identical on arbitrary input (same
pattern as tests/test_payload_batch.py for validate_batch/validate_deep).
"""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_extract.functions.hashing import (
    MULT_A,
    MULT_B,
    hash62,
    hash62_batch,
    lsh_bands,
    minhash_signature,
    rolling31,
    rolling31_batch,
    simhash32,
    simhash32_batch,
    word_shingles,
)

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
    ),
    max_size=12,
)


@given(texts_strategy)
@settings(max_examples=60, deadline=None)
def test_rolling31_batch_parity(strs):
    for mult in (MULT_A, MULT_B):
        assert list(rolling31_batch(strs, mult)) == [rolling31(s, mult) for s in strs]


@given(texts_strategy)
@settings(max_examples=60, deadline=None)
def test_hash62_batch_parity(strs):
    assert list(hash62_batch(strs)) == [hash62(s) for s in strs]


@given(texts_strategy)
@settings(max_examples=60, deadline=None)
def test_simhash32_batch_parity(strs):
    assert list(simhash32_batch(strs)) == [simhash32(s) for s in strs]


def test_rolling31_batch_long_doc_exact():
    # long documents exercise the mod-before-sum overflow guard
    s = "lorem ipsum dolor sit amet " * 8000  # ~216k chars
    assert rolling31_batch([s], MULT_A)[0] == rolling31(s, MULT_A)
    assert hash62_batch([s])[0] == hash62(s)


@given(
    st.lists(
        st.text(alphabet=" abcdefgh", min_size=0, max_size=80), min_size=1, max_size=6
    )
)
@settings(max_examples=25, deadline=None)
def test_minhash_duckdb_band_parity(texts):
    """The DuckDB band kernel used by minhash_lsh_pairs computes exactly the
    scalar minhash_signature -> lsh_bands band signatures."""
    k, num_perm, band_rows = 3, 16, 4
    con = duckdb.connect()
    for t in texts:
        s = word_shingles(t, k)
        expect = lsh_bands(minhash_signature(s, num_perm), band_rows)
        if not s:
            continue  # pipeline emits the constant empty-signature bands
        con.register("sh", pa.table({"shingle": pa.array(sorted(s))}))
        got = con.execute(
            f"""
            WITH mh AS (
              SELECT r.j, min(md5(CAST(r.j AS VARCHAR) || ':' || s.shingle)) h
              FROM sh s CROSS JOIN range({num_perm}) r(j) GROUP BY r.j)
            SELECT md5(string_agg(h, '|' ORDER BY j)) band_sig
            FROM mh GROUP BY j // {band_rows} ORDER BY j // {band_rows}
            """
        ).fetchall()
        assert [g[0] for g in got] == expect


@given(texts_strategy, st.sampled_from([1, 2, 3, 5]))
@settings(max_examples=60, deadline=None)
def test_word_shingles_batch_parity(strs, k):
    from ray_extract.functions.hashing import word_shingles_batch

    doc_u, sh, n_sh = word_shingles_batch(strs, k)
    got = [set() for _ in strs]
    for d, s in zip(doc_u, sh.to_pylist()):
        got[d].add(s)
    for i, t in enumerate(strs):
        want = word_shingles(t, k)
        assert got[i] == want
        assert n_sh[i] == len(want)
