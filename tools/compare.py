#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
outputs, run each oracle SQL in DuckDB over the same sf dir, sort columns by
name + rows by all columns, and diff values. Dev tooling only (driver-side
python) — the shipped library never depends on this."""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pq.read_table(f"{out_dir}/{name}").to_pandas()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}")); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    g = got.reindex(sorted(got.columns), axis=1)
    x = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(x.columns):
        fails.append((name, f"columns differ: spark={list(g.columns)} oracle={list(x.columns)}")); continue
    if len(g) != len(x):
        fails.append((name, f"rowcount differ: spark={len(g)} oracle={len(x)}")); continue
    # normalize: decimals->str, floats kept exact, sort rows
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        key = [str(tuple(str(v) for v in row)) for row in df.itertuples(index=False)]
        return df.iloc[pd.Series(key).sort_values(kind="mergesort").index].reset_index(drop=True)
    g, x = norm(g), norm(x)
    bad = None
    for c in g.columns:
        gv, xv = g[c], x[c]
        for i in range(len(gv)):
            a, b = gv.iloc[i], xv.iloc[i]
            an = (a is None) or (isinstance(a, float) and math.isnan(a)) or pd.isna(a)
            bn = (b is None) or (isinstance(b, float) and math.isnan(b)) or pd.isna(b)
            if an and bn:
                continue
            if an != bn or (str(a) != str(b) and not (
                isinstance(a, float) and isinstance(b, float) and a == b)):
                bad = f"col {c} row {i}: spark={a!r} oracle={b!r}"
                break
        if bad: break
    if bad: fails.append((name, bad))
    else: print(f"PASS {name} ({len(g)} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
