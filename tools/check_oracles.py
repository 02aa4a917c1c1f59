#!/usr/bin/env python3
"""Dev-side oracle checker: mimics the driver's t2 gate.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (Spark output) and oracle_sql.json,
runs each SQL in DuckDB against the sfDir parquet tables, and compares
after sorting columns by name and rows by all columns.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # DTYPE GUARD (driver parity): the driver's hash is dtype-sensitive.
        # A DuckDB HUGEINT column (uncast SUM over integers / SUM(CASE..))
        # reaches pandas as float64 while Spark writes int64 — bit-equal
        # values, failed hash (all 7 CORRECTNESS_r02 fails were this).
        # Any mismatch here means the ORACLE SQL needs a CAST.
        dt_bad = [c for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt_bad:
            for c in dt_bad:
                print(f"FAIL {name}: dtype col {c}: spark {got[c].dtype} vs oracle {want[c].dtype}")
            n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                same = (x == y)
                if not same and isinstance(x, float) and isinstance(y, float):
                    same = (math.isnan(x) and math.isnan(y)) or x == y
                if not same:
                    # timestamps etc: compare str
                    same = str(x) == str(y)
                if not same:
                    print(f"FAIL {name}: col {c} row {i}: {x!r} vs {y!r}")
                    ok = False; break
            if not ok: break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
