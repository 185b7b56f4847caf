#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev loop only; the
engine itself is pure Scala/Spark). Usage:

    python3 tools/verify_local.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB over the parquet tables in <sfDir>, loads the corresponding Spark
result parquet, sorts columns by name + rows by all columns, and compares
values exactly. Prints per-query PASS/FAIL."""
import sys, json, glob, math, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# Optional: --only q1,q2,...  and --mem 30GB --threads 10 (for parallel
# chunked runs over big SFs where one process would hog the host).
only = None
mem = thr = None
budget = None  # --budget SECONDS: per-query oracle cap (interrupt + record)
json_out = None  # --json PATH: emit driver-shaped per-query records
argv = sys.argv[3:]
while argv:
    a = argv.pop(0)
    if a == "--only": only = set(argv.pop(0).split(","))
    elif a == "--mem": mem = argv.pop(0)
    elif a == "--threads": thr = argv.pop(0)
    elif a == "--budget": budget = float(argv.pop(0))
    elif a == "--json": json_out = argv.pop(0)

# Driver-shaped records (same keys as CORRECTNESS_r{N}.json) so the sf1
# gate is a diffable artifact round over round (judge r9 task 8).
records = {}
def record(name, rows=False, schema=False, hsh=False, sr=None, orr=None, err=None):
    records[name] = {"rows_match": rows, "schema_match": schema,
                     "hash_match": hsh, "spark_rows": sr, "oracle_rows": orr,
                     "err": err}
con = duckdb.connect()
# Unique spill dir per process: concurrent chunked runs sharing the cwd
# default (.tmp/) race on temp-file cleanup and crash with an IOException.
con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
if mem: con.execute(f"SET memory_limit='{mem}'")
if thr: con.execute(f"SET threads={thr}")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    # Spark writes <table>.parquet as a DIRECTORY of part files; glob those.
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    timer = None
    if budget:
        import threading
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
    try:
        want = con.sql(sql).df()
    except KeyboardInterrupt:
        print(f"TIMEOUT {name}: oracle exceeded {budget}s budget")
        record(name, err=f"oracle timeout {budget}s")
        n_fail += 1
        continue
    except Exception as e:
        msg = str(e)
        if "INTERRUPT" in msg.upper():
            print(f"TIMEOUT {name}: oracle exceeded {budget}s budget")
            record(name, err=f"oracle timeout {budget}s")
        else:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, err=f"oracle SQL error: {e}")
        n_fail += 1
        continue
    finally:
        if timer: timer.cancel()
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        record(name, err=f"spark result missing: {e}")
        n_fail += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns differ: oracle={list(want.columns)} spark={list(got.columns)}")
        record(name, rows=len(want) == len(got), sr=len(got), orr=len(want),
               err="columns differ")
        n_fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: row count differs: oracle={len(want)} spark={len(got)}")
        record(name, schema=True, sr=len(got), orr=len(want))
        n_fail += 1
        continue
    ws = want.sort_values(list(want.columns), na_position="first").reset_index(drop=True)
    gs = got.sort_values(list(got.columns), na_position="first").reset_index(drop=True)
    diffs = []
    for c in ws.columns:
        a, b = ws[c], gs[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            bad = (~eq).idxmax()
            diffs.append(f"col {c}: {int((~eq).sum())} cells differ, first at row {bad}: oracle={a[bad]!r} spark={b[bad]!r}")
    # dtype note (driver may hash dtypes too)
    dt = [f"{c}: oracle={ws[c].dtype} spark={gs[c].dtype}" for c in ws.columns if str(ws[c].dtype) != str(gs[c].dtype)]
    if diffs:
        print(f"FAIL {name}: " + "; ".join(diffs[:3]))
        record(name, rows=True, schema=True, sr=len(got), orr=len(want),
               err="; ".join(diffs[:3]))
        n_fail += 1
    else:
        note = f"  [dtype diff: {'; '.join(dt)}]" if dt else ""
        print(f"PASS {name} ({len(want)} rows){note}")
        record(name, rows=True, schema=True, hsh=True, sr=len(got), orr=len(want))
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
if json_out:
    json.dump(records, open(json_out, "w"), indent=2)
    print(f"wrote {json_out} ({len(records)} records)")
sys.exit(1 if n_fail else 0)
