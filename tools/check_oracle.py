#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle SQL over the same parquet tables and
compare row multisets (columns sorted by name, values canonicalized)."""
import json, sys, math
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
# oracle_sql.json now carries every oracle under both `<name>` and
# `<name>.parquet` keys (driver key-format belt-and-braces) — dedupe here.
oracles = {k.removesuffix(".parquet"): v for k, v in oracles.items()}
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception:
        pass

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

fails = []
for name, sql in sorted(oracles.items()):
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet/*.parquet')").fetchdf()
    except Exception as e:
        fails.append((name, f"spark result missing: {e}"))
        continue
    try:
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql failed: {e}"))
        continue
    sc = sorted(spark_df.columns)
    oc = sorted(oracle_df.columns)
    if sc != oc:
        fails.append((name, f"schema mismatch: spark={sc} oracle={oc}"))
        continue
    a = sorted(tuple(canon(v) for v in row) for row in spark_df[sc].itertuples(index=False))
    b = sorted(tuple(canon(v) for v in row) for row in oracle_df[oc].itertuples(index=False))
    if len(a) != len(b):
        fails.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
    elif a != b:
        bad = sum(1 for x, y in zip(a, b) if x != y)
        ex = next((x, y) for x, y in zip(a, b) if x != y)
        fails.append((name, f"{bad} differing rows of {len(a)}; first: spark={ex[0]} oracle={ex[1]}"))
    else:
        print(f"OK    {name} ({len(a)} rows)")

for name, msg in fails:
    print(f"FAIL  {name}: {msg}")
print(f"\n{len(oracles) - len(fails)}/{len(oracles)} oracle-checked queries match")
sys.exit(1 if fails else 0)
