#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB on each
oracle SQL from Verify's oracle_sql.json, compare against the Spark
parquet dump (sorted columns by name, sorted rows, EXACT comparison —
any float difference is a FAIL; max_abs_diff is printed only as a
diagnostic). Determinism must come from the queries themselves
(graft.functions.Exact, quantized integers, portable hashes)."""
import json, sys, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    files = glob.glob(f"{pq}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {pq}")
        n_fail += 1
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        n_fail += 1
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if [c.lower() for c in sc] != [c.lower() for c in dc]:
        print(f"FAIL {name}: columns spark={sc} duck={dc}")
        n_fail += 1
        continue
    a = spark_df[sc].copy()
    b = duck_df[dc].copy()
    b.columns = sc  # align case
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        n_fail += 1
        continue
    a = a.sort_values(sc, ignore_index=True)
    b = b.sort_values(sc, ignore_index=True)
    mismatch = []
    for c in sc:
        av, bv = a[c], b[c]
        try:
            # dtype parity FIRST: the driver's hash is type-sensitive
            # (a DuckDB HUGEINT renders float64 where Spark wrote
            # int64 and the driver fails on identical values — q279/
            # q283 in round 14 shipped green locally, red at the
            # driver, because this gate compared values only).
            sd = str(av.dtype).replace("datetime64[ns, UTC]", "datetime64[ns]")
            dd = str(bv.dtype).replace("datetime64[ns, UTC]", "datetime64[ns]")
            if sd != dd:
                mismatch.append(f"{c}: DTYPE spark={sd} duck={dd}")
                continue
            import pandas as pd
            # normalize timestamps to naive
            for v in (av, bv):
                if str(v.dtype).startswith("datetime64[ns,"):
                    pass
            if str(av.dtype).startswith("datetime64[ns,"):
                av = av.dt.tz_localize(None)
            if str(bv.dtype).startswith("datetime64[ns,"):
                bv = bv.dt.tz_localize(None)
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq)
                # float tolerance diagnostics
                if av.dtype.kind == 'f':
                    diff = (av - bv).abs()
                    mx = diff[bad].max()
                    mismatch.append(f"{c}: {bad.sum()} rows differ, max_abs_diff={mx}")
                else:
                    i = bad.idxmax()
                    mismatch.append(f"{c}: {bad.sum()} rows differ, e.g. {av[i]!r} vs {bv[i]!r}")
        except Exception as e:
            mismatch.append(f"{c}: compare error {e}")
    if mismatch:
        print(f"FAIL {name}: " + "; ".join(mismatch[:4]))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1

missing = set(oracle) ^ set(
    x.rsplit("/",1)[-1] for x in glob.glob(f"{out_dir}/*") if not x.endswith(".json"))
if missing:
    print("note: queries without oracle or vice versa:", sorted(missing))
print(f"== {n_pass} pass / {n_fail} fail ==")
sys.exit(1 if n_fail else 0)
