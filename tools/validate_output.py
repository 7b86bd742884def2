"""Post-hoc output validation (reference parity:
scripts/unece_sprint/check_parsed_docs.py — outputs must load back as valid
ParserOutput records).

Checks every output parquet partition for schema + invariants:
- doc_id non-empty and unique across partitions
- status in {ok, error}; error rows have empty blocks
- text_block_ids strictly increasing integers (gaps allowed — dropped
  paragraphs consume ids, reference convert.py:88-96)
- page_number in [0, n_pages); type_confidence == 1.0
- spans surface aligned with text_blocks (same length, same kinds/texts)
- languages null or non-empty list

Usage: python tools/validate_output.py <out_dir>
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb


def validate(out_dir: str) -> int:
    files = sorted(glob.glob(os.path.join(out_dir, "*", "*.parquet")))
    if not files:
        print(f"no output files under {out_dir}")
        return 1
    con = duckdb.connect()
    rel = f"read_parquet({files!r})"
    problems = []

    def check(name, sql, expect=0):
        n = con.execute(sql).fetchone()[0]
        if n != expect:
            problems.append(f"{name}: {n} violations")
            print(f"FAIL {name}: {n}")
        else:
            print(f"ok   {name}")

    check("doc_id unique",
          f"SELECT count(*) - count(DISTINCT doc_id) FROM {rel}")
    check("doc_id non-empty",
          f"SELECT count(*) FROM {rel} WHERE doc_id IS NULL OR doc_id = ''")
    check("status domain",
          f"SELECT count(*) FROM {rel} WHERE status NOT IN ('ok', 'error')")
    check("error rows have no blocks",
          f"SELECT count(*) FROM {rel} WHERE status = 'error' AND len(text_blocks) > 0")
    check("confidence always 1.0",
          f"SELECT count(*) FROM (SELECT unnest(text_blocks) b FROM {rel}) "
          "WHERE b.type_confidence != 1.0")
    check("block pages within document",
          f"SELECT count(*) FROM (SELECT n_pages, unnest(text_blocks) b FROM {rel}) "
          "WHERE b.page_number < 0 OR b.page_number >= n_pages")
    check("spans aligned with blocks",
          f"SELECT count(*) FROM {rel} WHERE len(spans) != len(text_blocks)")
    check("block ids strictly increasing",
          f"""SELECT count(*) FROM (
                SELECT doc_id, list_transform(text_blocks, b -> CAST(b.text_block_id AS BIGINT)) ids
                FROM {rel} WHERE len(text_blocks) > 1
              ) WHERE EXISTS (
                SELECT 1 FROM unnest(range(2, len(ids) + 1)) u(i)
                WHERE ids[CAST(i AS BIGINT)] <= ids[CAST(i AS BIGINT) - 1]
              )""")
    check("languages null or non-empty",
          f"SELECT count(*) FROM {rel} WHERE languages IS NOT NULL AND len(languages) = 0")
    check("md5 well-formed",
          f"SELECT count(*) FROM {rel} WHERE NOT regexp_matches(md5sum, '^[a-f0-9]{{32}}$')")

    if problems:
        print(f"\n{len(problems)} problems")
        return 1
    rows = con.execute(f"SELECT count(*) FROM {rel}").fetchone()[0]
    print(f"\nall invariants hold over {rows} documents in {len(files)} files")
    return 0


if __name__ == "__main__":
    sys.exit(validate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/extract_out"))
