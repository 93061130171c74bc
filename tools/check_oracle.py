#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same sf dir and compare values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt -batch "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints/floats to common width, timestamps to ns
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(w)}"
        else:
            eq = g.equals(w)
            if not eq:
                # find first differing cell for debugging
                diff = (g != w) & ~(g.isna() & w.isna())
                ndiff = int(diff.values.sum())
                loc = diff.any(axis=1)
                idx = loc[loc].index[:3].tolist()
                sample = []
                for i in idx:
                    for c in g.columns:
                        if diff.at[i, c]:
                            sample.append(f"row{i}.{c}: spark={g.at[i,c]!r} duck={w.at[i,c]!r}")
                results[name] = f"VALUE_MISMATCH ({ndiff} cells) e.g. {'; '.join(sample[:4])}"
            else:
                results[name] = f"OK rows={len(g)}"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    nrows = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    nfail = len(results) - npass - nrows
    print(f"\n{npass} oracle-PASS, {nrows} rows-only, {nfail} FAIL of {len(results)}")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
