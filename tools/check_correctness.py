"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf_dir and compare to oracle_sql() via DuckDB
(row count + schema + order-insensitive value comparison).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) != len(want):
        issues.append(f"rowcount {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return issues
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-12, equal_nan=True):
                    issues.append(f"col {c}: float values differ")
            else:
                ao, bo = a.astype(object), b.astype(object)
                same = (ao == bo) | (a.isna() & b.isna())
                if not same.all():
                    issues.append(f"col {c}: {int((~same).sum())} values differ")
            if str(a.dtype) != str(b.dtype):
                issues.append(f"col {c}: dtype {a.dtype} vs {b.dtype} (warn)")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} cols={sorted(got.columns)} "
                  f"[rows-only] {dt:.1f}s")
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        issues = compare(name, got, want)
        hard = [i for i in issues if "(warn)" not in i]
        if hard:
            print(f"FAIL {name}: {issues} {dt:.1f}s")
            failures += 1
        else:
            extra = f" {issues}" if issues else ""
            print(f"OK   {name}: rows={len(got)}{extra} {dt:.1f}s")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
