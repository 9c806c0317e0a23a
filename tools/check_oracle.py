#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL and report per-query match.
Dev-only tool (the shipped library is pure Scala/Spark)."""
import json, os, sys, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell(v):
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        return f"{v!r}"
    return str(v)

def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = 0
    for name in sorted(oracle):
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output"); continue
        try:
            got = pd.read_parquet(pq)
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"); continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); continue
        if frame_hash(g) != frame_hash(w):
            diff = (g.astype(str) != w.astype(str))
            bad = diff.any(axis=1)
            print(f"FAIL {name}: hash mismatch; first diffs:")
            print(pd.concat([g[bad].head(3).add_suffix("_spark"),
                             w[bad].head(3).add_suffix("_duck")], axis=1).to_string())
            continue
        n_ok += 1
        print(f"OK   {name} ({len(g)} rows)")
    print(f"== {n_ok}/{len(oracle)} matched")

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    main(sf, out)
