#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
and diffs: columns sorted by name, rows sorted by all columns, exact values.
"""
import json, os, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        # single-file layout (driver testdata) or directory-of-parts
        # layout (ScaleProbe's /tmp/sf1 rehearsal fixture)
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        g, x = norm(got), norm(exp)
        if g == x:
            print(f"OK   {name} ({len(g)} rows)"); ok += 1
        else:
            fail += 1
            print(f"FAIL {name}: spark {len(g)} rows vs oracle {len(x)} rows")
            gs, xs = set(g), set(x)
            for r in list(gs - xs)[:3]: print(f"  spark-only:  {r}")
            for r in list(xs - gs)[:3]: print(f"  oracle-only: {r}")
            for a, b in list(zip(g, x))[:3]:
                if a != b:
                    print(f"  first-diff spark : {a}\n  first-diff oracle: {b}")
                    break
    print(f"\n{ok} OK, {fail} FAIL")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
