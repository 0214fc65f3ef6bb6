#!/usr/bin/env python3
"""Local driver-sim: compare Verify.scala's parquet dumps against the
DuckDB oracle SQL, the way the driver does (sort columns by name, sort
rows, compare values). Usage:
    python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
Run after:  sbt "runMain graft.Verify <sfDir> <outDir>"
"""
import sys, json, math, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting works
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else (tuple(v) if isinstance(v, (list, tuple)) else v))
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    # The driver hashes stringified values, so int 5 vs float 5.0 MISMATCH
    # there (classic cause: DuckDB sum(BIGINT)->HUGEINT->float64 in pandas).
    # Mirror that strictness: a float on exactly one side is a failure.
    if isinstance(a, float) != isinstance(b, float):
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
                and not isinstance(a, bool) and not isinstance(b, bool):
            return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    # timestamps: compare as pandas
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except Exception:
        pass
    if hasattr(a, "isoformat") and hasattr(b, "isoformat"):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b or str(a) == str(b)

def col_equal_fast(ga: pd.Series, wa: pd.Series):
    """Vectorized fast path with cells_equal's semantics. Returns True
    only when the whole column is PROVABLY equal; returns None
    (undecided) on any mismatch, dtype difference, or unsupported
    dtype — the caller then runs the authoritative per-cell loop, so
    verdicts and error messages are unchanged. Exists because the
    per-cell python loop is the bottleneck on multi-million-row dumps
    (60M rows at the 100x tier), not either engine."""
    import numpy as np
    if ga.dtype != wa.dtype:
        return None
    k = ga.dtype.kind
    a, b = ga.values, wa.values
    if k in "iub":
        return True if (a == b).all() else None
    if k == "f":
        both_nan = np.isnan(a) & np.isnan(b)
        tol = 1e-9 * np.maximum(1.0, np.maximum(np.abs(a), np.abs(b)))
        with np.errstate(invalid="ignore"):
            ok = both_nan | (a == b) | (np.abs(a - b) <= tol)
        return True if ok.all() else None
    if k == "M":
        ok = (a == b) | (pd.isna(a) & pd.isna(b))
        return True if ok.all() else None
    if k == "O":
        # object columns: strings only. Python == is LOOSER than
        # cells_equal for numbers (5 == 5.0, (1,2) == (1.0,2.0)) while
        # cells_equal deliberately FAILS int-vs-float (the driver's
        # stringified-hash strictness), so trusting == on numeric or
        # tuple objects would green a type drift the real driver flags.
        # Fast-path ONLY all-str columns, where == and cells_equal
        # agree; everything else is undecided -> per-cell loop.
        try:
            if not (ga.map(lambda v: isinstance(v, str)).all()
                    and wa.map(lambda v: isinstance(v, str)).all()):
                return None
            ok = ga == wa
            return True if bool(ok.all()) else None
        except Exception:
            return None
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (ScaleUp's sf1 replicas): a DIRECTORY
            # of part files — point DuckDB at the parts glob
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passes, skips = [], [], []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            failures.append((name, f"spark read fail: {e}"))
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            failures.append((name, f"oracle SQL fail: {e}"))
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append((name, f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"))
            continue
        if len(got) != len(want):
            failures.append((name, f"row count: spark={len(got)} oracle={len(want)}"))
            continue
        bad = None
        for col in got.columns:
            if col_equal_fast(got[col], want[col]) is True:
                continue
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not cells_equal(x, y):
                    bad = f"col {col} row {i}: spark={x!r} oracle={y!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            passes.append(name)
    # queries with no oracle (rows-only)
    for name in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{name}") and name not in oracle:
            skips.append(name)
    print(f"PASS ({len(passes)}): " + " ".join(passes))
    if skips:
        print(f"ROWS-ONLY ({len(skips)}): " + " ".join(skips))
    if failures:
        print(f"FAIL ({len(failures)}):")
        for n, why in failures:
            print(f"  {n}: {why}")
        sys.exit(1)
    print("ALL OK")

if __name__ == "__main__":
    main()
