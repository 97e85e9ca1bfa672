#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: compare each
Verify parquet dump against its DuckDB oracle (dev tool only — the
library itself never uses Python)."""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, only: str | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    dumped = {d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*")}
    # a query that crashed in Verify leaves no dump — that's a failure,
    # not a skip
    names = sorted(dumped | set(oracle.keys()))
    if only:
        names = [n for n in names if n == only]
    for name in names:
        if name not in dumped:
            print(f"{name}: MISSING DUMP (query failed in Verify)")
            failures += 1
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
            ignore_index=True)
        if name not in oracle:
            print(f"{name}: NO-ORACLE rows={len(spark_df)}")
            if len(spark_df) == 0:
                print(f"  WARNING: zero rows")
            continue
        duck_df = con.execute(oracle[name]).fetchdf()
        s, o = norm(spark_df), norm(duck_df)
        # collect every problem independently — a value mismatch must not
        # mask a dtype mismatch (or vice versa); both are root causes
        problems = []
        if list(s.columns) != list(o.columns):
            problems.append(
                f"COLUMN MISMATCH spark={list(s.columns)} duck={list(o.columns)}")
        elif len(s) != len(o):
            problems.append(f"ROWCOUNT MISMATCH spark={len(s)} duck={len(o)}")
        else:
            for c in s.columns:
                sv, ov = s[c], o[c]
                if str(sv.dtype) != str(ov.dtype):
                    problems.append(f"DTYPE {c}: spark={sv.dtype} duck={ov.dtype}")
                if not sv.equals(ov):
                    neq = (sv != ov) & ~(sv.isna() & ov.isna())
                    n = int(neq.sum())
                    if n:
                        i = neq.idxmax()
                        problems.append(
                            f"VALUE MISMATCH col={c} ndiff={n} "
                            f"first@{i}: spark={sv[i]!r} duck={ov[i]!r}")
        status = "OK" if not problems else "; ".join(problems)
        print(f"{name}: {status} rows={len(s)}")
        if problems:
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
