#!/usr/bin/env python3
"""Extend CORRECTNESS_SF10.json with more oracle-replayed queries at
the 100x tier. Runs the same compare as check_oracle.py (imported, not
re-implemented) for the named queries against a Verify dump, and merges
per-query results into the tracked JSON in its existing format.
Usage:
    python3 tools/sf10_extend.py <sfDir> <verifyOut> <query> [query ...]
Run after:  sbt "runMain graft.Verify <sfDir> <verifyOut> <query> ..."
"""
import sys, json, glob, os, time
sys.path.insert(0, os.path.dirname(__file__))
import duckdb
import pandas as pd
from check_oracle import TABLES, canon, cells_equal, col_equal_fast

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    # out-of-core settings for the heaviest replays (q239's k-means
    # training + double assignment at 200k vectors exhausted the
    # default in-memory budget): cap threads and let blocking
    # operators spill instead of dying
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql(f"SET threads={os.environ.get('GRAFT_DUCK_THREADS', '8')}")
    # spilling only kicks in as usage approaches memory_limit, so a
    # fixed default larger than physical RAM would get OOM-killed
    # before any spill: derive the default from the machine (60% of
    # physical RAM), env-overridable
    phys_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
    mem = os.environ.get("GRAFT_DUCK_MEM", f"{max(1, int(phys_gb * 0.6))}GB")
    con.sql(f"SET memory_limit='{mem}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # same merge logic serves the 10x tier: point GRAFT_SF_JSON at
    # CORRECTNESS_SF1.json when extending that artifact
    path = os.environ.get("GRAFT_SF_JSON", "CORRECTNESS_SF10.json")
    doc = json.load(open(path))
    results = doc["results"]
    for name in names:
        t0 = time.time()
        entry = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            assert files, "no spark output"
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            entry["spark_rows"] = len(got)
            want = canon(con.sql(oracle[name]).df())
            entry["oracle_rows"] = len(want)
            entry["rows_match"] = len(got) == len(want)
            entry["schema_match"] = sorted(got.columns) == sorted(want.columns)
            if not entry["rows_match"]:
                entry["err"] = f"row count: spark={len(got)} oracle={len(want)}"
            elif not entry["schema_match"]:
                entry["err"] = (f"schema: spark={sorted(got.columns)} "
                                f"oracle={sorted(want.columns)}")
            if entry["rows_match"] and entry["schema_match"]:
                bad = None
                for col in got.columns:
                    if col_equal_fast(got[col], want[col]) is True:
                        continue
                    for i, (x, y) in enumerate(zip(got[col].tolist(), want[col].tolist())):
                        if not cells_equal(x, y):
                            bad = f"col {col} row {i}: spark={x!r} oracle={y!r}"
                            break
                    if bad:
                        break
                entry["hash_match"] = bad is None
                if bad:
                    entry["err"] = bad
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = entry
        ok = entry["hash_match"]
        print(f"[sf10] {name}: {'PASS' if ok else 'FAIL ' + str(entry['err'])} "
              f"({entry['spark_rows']} rows, {time.time() - t0:.1f}s oracle side)", flush=True)
    json.dump(doc, open(path, "w"), indent=1)
    n_ok = sum(1 for v in results.values() if v.get("hash_match"))
    print(f"[sf10] total in file: {len(results)}, hash-green: {n_ok}")

if __name__ == "__main__":
    main()
