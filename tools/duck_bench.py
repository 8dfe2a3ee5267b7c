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

def runnable(name, sql):
    """etl_slice is a WRITE on the engine side (aggregate -> snappy
    parquet); time the matching COPY here so the ratio compares like with
    like. The oracle SQL's ORDER BY exists only for the hash compare -
    neither engine's write sorts."""
    if name != "etl_slice":
        return lambda: con.execute(sql).fetchall()
    body = sql.split(" ORDER BY ")[0]
    import tempfile, shutil, itertools
    seq = itertools.count()
    def run():
        d = tempfile.mkdtemp(prefix="duck_etl_")
        try:
            con.execute(
                f"COPY ({body}) TO '{d}/out' (FORMAT PARQUET, "
                f"COMPRESSION SNAPPY, PER_THREAD_OUTPUT TRUE)")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return run

for name, sql in sorted(oracle.items()):
    try:
        run = runnable(name, sql)
        run()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        out[name] = sorted(ts)[1]
    except Exception as e:
        out[name] = -1.0
        print(f"[duck_bench] {name} failed: {e}", file=sys.stderr)
print(json.dumps({"sf": sf, "total": sum(v for v in out.values() if v >= 0),
                  "queries": out}))
