#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Runs graft.Verify at a given SF dir (default sf0.01), then replays each
oracle SQL in DuckDB over the same parquet tables and compares the
results exactly (columns sorted by name, rows sorted by all columns,
bit-exact values). Development feedback loop only — not part of the
shipped engine.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [names...]
"""
import argparse, json, re, subprocess, sys, math

import duckdb

_p = argparse.ArgumentParser(description=__doc__)
_p.add_argument("args", nargs="*",
                help="[sfdir] [outdir] [query names...] in any order; "
                     "names are recognized by the qNN_ prefix")
_p.add_argument("--skip-verify", action="store_true")
# parse_known_args: argparse stops filling nargs="*" at an interspersed
# flag, so positionals after --skip-verify land in the remainder
_args, _extra = _p.parse_known_args()
_bad = [a for a in _extra if a.startswith("-")]
if _bad:
    _p.error(f"unrecognized flags: {_bad}")
# a query name is a name wherever it appears, never a directory
_pos = list(_args.args) + _extra
ONLY = [a for a in _pos if re.match(r"^q\d+_", a)]
_dirs = [a for a in _pos if not re.match(r"^q\d+_", a)]
SF = _dirs[0] if len(_dirs) > 0 else "/root/testdata/sf0.01"
OUT = _dirs[1] if len(_dirs) > 1 else "/tmp/graft_verify"
SKIP = _args.skip_verify

if not SKIP:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = ONLY or sorted(oracle)
fails = []
for name in names:
    try:
        spark_df = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: load error {str(e)[:200]}"); continue
    a, b = spark_df.reindex(sorted(spark_df.columns), axis=1), duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        fails.append(name); print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); continue
    if [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
        fails.append(name)
        print(f"FAIL {name}: dtypes {list(map(str, a.dtypes))} vs {list(map(str, b.dtypes))}")
        continue
    if len(a) != len(b):
        fails.append(name); print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); continue
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)

    def cell_eq(x, y):
        # strict equality: no str() fallback (VERDICT r3 #5) — dtypes
        # already matched above, so values must compare equal as-is;
        # NaN==NaN and elementwise array equality are the only carve-outs
        import numpy as np
        if isinstance(x, float) and isinstance(y, float):
            return x == y or (math.isnan(x) and math.isnan(y))
        if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
            ax, ay = np.asarray(x), np.asarray(y)
            # float arrays: NaN must equal NaN (same carve-out as the
            # scalar branch above); equal_nan raises TypeError on
            # non-numeric dtypes, so guard on the dtype kind
            if ax.dtype.kind == "f" or ay.dtype.kind == "f":
                return np.array_equal(ax, ay, equal_nan=True)
            return np.array_equal(ax, ay)
        return bool(x == y)

    bad = None
    for c in a.columns:
        neq = [(i, x, y) for i, (x, y) in enumerate(zip(a[c], b[c]))
               if not cell_eq(x, y)]
        if neq:
            bad = (c, neq[:3]); break
    if bad:
        fails.append(name)
        print(f"FAIL {name}: col {bad[0]} first diffs {bad[1]}")
    else:
        print(f"OK   {name} ({len(a)} rows)")

print(f"\n{len(names) - len(fails)}/{len(names)} queries match")
sys.exit(1 if fails else 0)
