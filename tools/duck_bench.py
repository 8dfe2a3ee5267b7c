"""DuckDB-side bench: times every oracle SQL on a given SF dir (3 runs,
median) so the engine/oracle ratio can be computed per query locally.
Usage: python3 tools/duck_bench.py [sfDir] [oracle_sql.json] [threads]
"""
import duckdb, json, os, sys, time

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf001/oracle_sql.json"
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32

con = duckdb.connect()
con.execute(f"SET threads={threads}")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    pat = f"{sf}/{t}.parquet/*.parquet" if os.path.isdir(f"{sf}/{t}.parquet") else f"{sf}/{t}.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(oracle_path))
out = {}
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        out[name] = sorted(ts)[1]
    except Exception as e:
        out[name] = -1.0
        print(f"[duck_bench] {name} failed: {e}", file=sys.stderr)
print(json.dumps({"sf": sf, "total": sum(v for v in out.values() if v >= 0),
                  "queries": out}))
