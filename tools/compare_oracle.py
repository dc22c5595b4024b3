#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle_sql.json entry in DuckDB over the same fixture
tables, and diffs values (column-name-sorted, row-sorted, floats to 6
decimals).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import decimal
    for c in df.columns:
        if df[c].dtype == object:
            if df[c].map(lambda v: isinstance(v, decimal.Decimal) or v is None).all():
                df[c] = df[c].astype(float).round(6)
            else:
                df[c] = df[c].apply(lambda v: None if pd.isna(v) else str(v))
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str).replace("NaT", None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not got_files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(got_files)]))
            want = canon(con.execute(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            diff_cols = []
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    if "float" in str(a.dtype) or "float" in str(b.dtype):
                        eq = ((a.isna() & b.isna()) | (a == b)).all()
                    else:
                        eq = a.astype(str).fillna("\0").eq(b.astype(str).fillna("\0")).all()
                except Exception:
                    eq = False
                if not eq:
                    diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:3]:
                    neq = ~(((got[c].isna()) & (want[c].isna())) | (got[c] == want[c]))
                    idx = neq[neq].index[:3]
                    for i in idx:
                        print(f"   row {i} col {c}: spark={got[c][i]!r} duck={want[c][i]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
