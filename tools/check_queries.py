"""Local mini-driver: run every queries() entry against its oracle_sql().

Mirrors the round driver's correctness gate (row count + sorted-value
equality) so mismatches are caught before the real gate runs.

Usage: python tools/check_queries.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import duckdb
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    qs, oracles = E.queries(), E.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        import time

        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append((name, f"query raised: {ex!r}"))
            print(f"FAIL {name}: query raised {ex!r}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = normalize(con.execute(oracles[name]).df())
        except Exception as ex:
            failures.append((name, f"oracle raised: {ex!r}"))
            print(f"FAIL {name}: oracle raised {ex!r}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rowcount {len(got)} != {len(want)}"))
            print(f"FAIL {name}: rowcount {len(got)} vs {len(want)}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        diffs = []
        for c in got.columns:
            if got[c].dtype != want[c].dtype:
                # the driver's value-hash is dtype-sensitive (DuckDB HUGEINT
                # -> float64/object breaks it even when values are equal)
                diffs.append(f"{c}: dtype {got[c].dtype} != {want[c].dtype}")
            eq = (got[c].values == want[c].values)
            import numpy as np

            if not np.all(eq):
                bad = int(np.sum(~eq))
                diffs.append(f"{c}: {bad} mismatched")
        if diffs:
            failures.append((name, "; ".join(diffs)))
            print(f"FAIL {name}: {'; '.join(diffs)}")
            idx = None
            import numpy as np
            for c in got.columns:
                ne = got[c].values != want[c].values
                if ne.any():
                    idx = np.nonzero(ne)[0][:3]
                    break
            if idx is not None:
                print("  got :", got.iloc[idx].to_dict("records"))
                print("  want:", want.iloc[idx].to_dict("records"))
        else:
            print(f"ok   {name}: {len(got)} rows match [{time.time()-t0:.1f}s]")

    ray.shutdown()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL QUERIES MATCH")


if __name__ == "__main__":
    main()
