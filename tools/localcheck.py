#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev tooling only (NOT part of the engine): runs after `sbt "runMain
graft.Verify <sfDir> <outDir>"`, registers the sf parquet tables in
DuckDB, executes each oracle SQL, and diff's against Spark's parquet
output with columns sorted by name and rows sorted by all columns.

Usage: python3 tools/localcheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, math
import duckdb

def normalize(con, rel_sql, label):
    df = con.sql(rel_sql).df()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            got = normalize(con, f"SELECT * FROM '{spark_glob}'", "spark")
            want = normalize(con, sql, "oracle")
        except Exception as e:
            print(f"FAIL {name}: load error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if got.dtypes.tolist() != want.dtypes.tolist():
            print(f"WARN {name}: dtypes differ: {dict(got.dtypes.astype(str))} vs {dict(want.dtypes.astype(str))}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    ok = all((math.isnan(x) and math.isnan(y)) or x == y
                             for x, y in zip(a.astype(float), b.astype(float)))
                else:
                    ok = a.astype(str).tolist() == b.astype(str).tolist()
            except Exception as e:
                ok = False
            if not ok:
                mismatch = c
                diffs = [(i, a.iloc[i], b.iloc[i]) for i in range(len(a))
                         if str(a.iloc[i]) != str(b.iloc[i])][:5]
                print(f"FAIL {name}: column {c} differs, first diffs {diffs}")
                break
        if mismatch is None:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
