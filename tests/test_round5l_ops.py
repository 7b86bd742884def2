"""Semantic pins for the round-5 format-parsing batch beyond oracle
parity: the CSV quote-parity kernel against Python's csv module, CLF
regex on a hand line, INI empty-section handling, markdown fence decoys,
and the footer audit against a full scan.
"""

import csv as pycsv
import io

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_csv_parser_agrees_with_stdlib():
    from ray_extract.pipelines.formats import CsvParser, _csv_build

    g = pd.DataFrame({"shard": [0] * 4, "doc_id": [0, 3, 5, 10]})
    blob = _csv_build(g)["csv"].iloc[0]
    rows = list(pycsv.reader(io.StringIO(blob)))
    assert rows[0] == ["id", "name", "val", "note"]
    # stdlib parse of the dialect features
    assert rows[1] == ["0", "doc, 0", "0", 'he said "hi" 0']
    assert rows[2] == ["3", "doc, 3", "3", "plain"]
    out = CsvParser()(
        pa.table({"shard": pa.array([0], pa.int64()),
                  "csv": pa.array([blob], pa.string())})
    ).to_pandas()
    assert out.loc[0, "n_rows"] == 4
    assert out.loc[0, "sum_val"] == 0 + 3 + 5 + 10
    assert out.loc[0, "n_quoted_commas"] == 2  # ids 0 and 3 lace commas
    exp_note = sum(
        len(r[3]) for r in rows[1:]
    )
    assert out.loc[0, "sum_note_len"] == exp_note


def test_log_line_regex_hand_case(ray_session):
    from ray_extract.pipelines.formats import log_line_parse

    df = log_line_parse(SF).to_pandas().set_index("status")
    n500 = sum(1 for d in range(500) if d % 23 == 0)
    n404 = sum(1 for d in range(500) if d % 13 == 0 and d % 23 != 0)
    assert df.loc[500, "n"] == n500
    assert df.loc[404, "n"] == n404
    assert df.loc[200, "n"] == 500 - n500 - n404
    # distinct ip bound: 3*5*7 residue combinations
    assert (df["n_ips"] <= 105).all()


def test_ini_empty_sections_leak_no_keys(ray_session):
    from ray_extract.pipelines.formats import ini_config_parse

    df = ini_config_parse(SF).to_pandas().set_index("section")
    # hand model
    exp = {}
    for d in range(500):
        for j in range(d % 3 + 1):
            for i in range((d + j) % 4):
                sec = f"sec{j}"
                n, s = exp.get(sec, (0, 0))
                exp[sec] = (n + 1, s + (d * 7 + j * 13 + i * 31) % 100)
    for sec, (n, s) in exp.items():
        assert df.loc[sec, "n_keys"] == n
        assert df.loc[sec, "sum_val"] == s


def test_markdown_fence_decoy_not_counted(ray_session):
    from ray_extract.pipelines.formats import markdown_structure

    df = markdown_structure(SF).to_pandas()
    # decoy '# fake' sits inside every fence; naive counting would add
    # n_code_blocks to n_headings
    assert df["n_headings"].sum() == sum(d % 4 + 1 for d in range(500))
    assert df["n_code_blocks"].sum() == 250
    assert df["n_code_lines"].sum() == sum(
        d % 6 + 2 for d in range(0, 500, 2)
    )


def test_footer_audit_matches_full_scan(ray_session):
    import duckdb

    from ray_extract.pipelines.formats import parquet_footer_audit

    got = (
        parquet_footer_audit(SF).to_pandas()
        .sort_values("col_name", ignore_index=True)
    )
    exp = duckdb.sql(
        f"""SELECT floor(min(l_extendedprice)*100+0.5) AS mn,
                   floor(max(l_extendedprice)*100+0.5) AS mx, count(*) AS n
            FROM '{SF}/lineitem.parquet'"""
    ).fetchone()
    row = got[got["col_name"] == "l_extendedprice"].iloc[0]
    assert (row["min_cents"], row["max_cents"], row["n_rows"]) == (
        int(exp[0]), int(exp[1]), int(exp[2])
    )
