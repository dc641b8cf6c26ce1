#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the library).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata parquet
tables, and compares: row count, column names, and values (exact, plus a
report of max abs diff for floats). Exits non-zero on any mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        v = v.tolist()  # numpy arrays / scalars from nested parquet
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            failures.append((name, f"columns differ: spark={gcols} oracle={ecols}"))
            continue
        if len(got) != len(exp):
            failures.append((name, f"row count differs: spark={len(got)} oracle={len(exp)}"))
            continue
        g = got[gcols]
        e = exp[ecols]
        bad = None
        for c in gcols:
            gv = [norm(x) for x in g[c].tolist()]
            ev = [norm(x) for x in e[c].tolist()]
            if gv != ev:
                # find first diff for the report
                for i, (a, b) in enumerate(zip(gv, ev)):
                    if a != b and not (a is None and b is None):
                        bad = f"col {c} row {i}: spark={a!r} oracle={b!r}"
                        break
                if bad:
                    break
        if bad:
            failures.append((name, bad))
        else:
            print(f"  OK   {name} ({len(got)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracles) - len(failures)}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
