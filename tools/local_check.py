# Local dev harness approximating the driver's DuckDB-oracle compare.
# NOT part of the Scala library (driver-side python only).
import duckdb, sys, json, os, glob
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
fails = 0
for name in names:
    try:
        # Spark side via PYARROW, not duckdb: the driver reads the Spark
        # parquet this way, so decimal128 columns stay Decimal objects and
        # stringify "x.00" — a decimal-vs-float rendering divergence against
        # the (duckdb→pandas float64) oracle must FAIL here first, not in the
        # round's CORRECTNESS report (round-3 q_decimal_agg escaped because
        # both sides went through the same float64 path locally).
        parts = sorted(glob.glob(f'{out}/{name}/*.parquet'))
        s = pa.concat_tables([pq.read_table(p) for p in parts]).to_pandas()
    except Exception as e:
        print(f"{name}: SPARK OUTPUT MISSING: {e}")
        fails += 1
        continue
    if name not in oracle:
        print(f"{name}: no oracle — rows={len(s)}" + (" [EMPTY!]" if len(s) == 0 else ""))
        continue
    try:
        o = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    s2 = s[sorted(s.columns)].reset_index(drop=True)
    o2 = o[sorted(o.columns)].reset_index(drop=True)
    schema_ok = list(s2.columns) == list(o2.columns)
    rows_ok = len(s2) == len(o2)
    vals_ok = False
    if schema_ok and rows_ok:
        vals_ok = s2.astype(str).equals(o2.astype(str))
        if not vals_ok:
            for c in s2.columns:
                if not s2[c].astype(str).equals(o2[c].astype(str)):
                    diff = (s2[c].astype(str) != o2[c].astype(str))
                    i = diff.idxmax()
                    print(f"  {name}.{c}: first diff at row {i}: spark={s2[c][i]!r} oracle={o2[c][i]!r} ({int(diff.sum())} diffs)")
    status = "OK" if (schema_ok and rows_ok and vals_ok) else f"FAIL schema={schema_ok} rows={rows_ok}({len(s2)}/{len(o2)}) vals={vals_ok}"
    if not (schema_ok and rows_ok and vals_ok):
        fails += 1
        if not schema_ok:
            print(f"  {name}: spark cols {list(s2.columns)} vs oracle {list(o2.columns)}")
    print(f"{name}: {status}")
missing = sorted(set(oracle) - set(names))
if missing:
    print("oracle entries with no spark output:", missing)
    fails += len(missing)
print(f"\n{fails} failures / {len(names)} queries")
