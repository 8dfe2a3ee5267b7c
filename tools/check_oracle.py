import duckdb, json, glob, os, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf001"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # spark writes directory tables (ScaleUp output); testdata ships flat files
    pat = f"{sf}/{t}.parquet/*.parquet" if os.path.isdir(f"{sf}/{t}.parquet") else f"{sf}/{t}.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
only_existing = os.environ.get("CHECK_ONLY_EXISTING") == "1"
fails = []

# declared-terminal Tier-B faces (SparkEntry.tierB -> tier_b.json): no SQL
# oracle BY CONTRACT (approximate-by-design recall faces, each with an
# oracle-green exact-regime sibling). Mark them tier_b, require the dump
# to exist and be non-empty -- a declared face that stops executing is
# still a failure, just not an oracle mismatch.
tier_b_path = f"{outdir}/tier_b.json"
tier_b = json.load(open(tier_b_path)) if os.path.exists(tier_b_path) else {}
for name, sibling in sorted(tier_b.items()):
    if name in oracle:
        fails.append((name, "declared tier_b but HAS an oracle -- undeclare it"))
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        if not only_existing:
            fails.append((name, "tier_b face produced no output"))
        continue
    n = sum(len(pd.read_parquet(f)) for f in sorted(files))
    if n == 0:
        fails.append((name, "tier_b face produced 0 rows"))
    else:
        print(f"  TIER-B {name} rows={n} (declared; exact-regime sibling: {sibling})")
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        if not only_existing:
            fails.append((name, "no spark output"))
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    duck_df = con.execute(sql).fetchdf()
    # sort columns by name (driver protocol)
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        fails.append((name, f"cols spark={list(s.columns)} duck={list(d.columns)}")); continue
    if len(s) != len(d):
        fails.append((name, f"rows spark={len(s)} duck={len(d)}")); continue
    # normalize: timestamps to string, floats rounded compare
    ok = True
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype).startswith("datetime") or str(dv.dtype).startswith("datetime"):
            sv = pd.to_datetime(sv).dt.tz_localize(None) if getattr(sv.dtype, 'tz', None) else pd.to_datetime(sv)
            dv = pd.to_datetime(dv).dt.tz_localize(None) if getattr(dv.dtype, 'tz', None) else pd.to_datetime(dv)
            sv = sv.astype("datetime64[us]"); dv = dv.astype("datetime64[us]")
            if not sv.equals(dv):
                ok = False; fails.append((name, f"col {c} ts mismatch: {sv[sv!=dv].head(3).tolist()} vs {dv[sv!=dv].head(3).tolist()}")); break
        elif sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
            import numpy as np
            a, b = sv.astype(float).values, dv.astype(float).values
            nan_eq = pd.isna(a) == pd.isna(b)
            close = np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not (close | ~nan_eq).all() or not nan_eq.all():
                bad = ~close
                ok = False; fails.append((name, f"col {c} float mismatch n={bad.sum()} e.g. {a[bad][:3]} vs {b[bad][:3]}")); break
        else:
            if not (sv.astype(str).values == dv.astype(str).values).all():
                bad = sv.astype(str).values != dv.astype(str).values
                ok = False; fails.append((name, f"col {c} mismatch n={bad.sum()} e.g. {sv.values[bad][:3]} vs {dv.values[bad][:3]}")); break
    # dtype check (schema match)
    st = {c: str(s[c].dtype) for c in s.columns}
    dt = {c: str(d[c].dtype) for c in d.columns}
    if ok and st != dt:
        diffs = {c: (st[c], dt[c]) for c in st if st[c] != dt[c]}
        print(f"  [schema-warn] {name}: {diffs}")
    if ok:
        print(f"  OK {name} rows={len(s)}")
print()
if fails:
    print("FAILURES:")
    for n, m in fails: print(f"  {n}: {m}")
    sys.exit(1)
print("ALL MATCH")
