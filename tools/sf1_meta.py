#!/usr/bin/env python3
"""Mechanically refresh CORRECTNESS_SF1.json's _meta from its results.

The _meta block is the provenance record for the 10x scale evidence;
it went stale in round 16 (narrated rounds 12-15 while carrying
round-16 results). This script derives it from the results block so
it can never drift again: run it after every sf1 backfill, passing
the current round number.

    python3 tools/sf1_meta.py <round> [path]
"""
import json
import sys
from datetime import date

path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_SF1.json"
rnd = int(sys.argv[1])

with open(path) as f:
    d = json.load(f)

res = d["results"]
n = len(res)
n_green = sum(1 for v in res.values() if v.get("hash_match"))
n_other = n - n_green

d["_meta"] = {
    "what": (
        f"sf1 oracle sweep: {n} catalog queries ({n_green} hash-green"
        + (f", {n_other} other" if n_other else "")
        + ") hash-matched against DuckDB at the 10x replica of the "
        "driver fixture; the set covers every query with sf1 scale "
        "evidence recorded in BENCH_SF1.md, maintained incrementally "
        "per round as new queries land"
    ),
    "sf_dir": "ScaleUp 10x replica of /root/testdata/sf0.1 (50k docs, 100k events)",
    "method": (
        "graft.Verify at the replica dir + tools/check_oracle.py "
        "(same compare as the driver); _meta regenerated mechanically "
        "by tools/sf1_meta.py after each backfill"
    ),
    "date": date.today().isoformat(),
    "round": rnd,
}

with open(path, "w") as f:
    json.dump(d, f, indent=1)
    f.write("\n")
print(f"_meta refreshed: {n} results, round {rnd}")
