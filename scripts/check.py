#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the library).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata parquet
tables, and compares: row count, column names, pandas SORTABILITY, pandas
dtype KIND, and values. Exits non-zero on any mismatch.

Driver-strictness notes (r4 post-mortem — the old mirror said 101/101 while
the official gate said 96/102):
  * The official checker sorts outputs with pandas `sort_values` over all
    columns; array-typed cells make that raise `TypeError: unhashable type:
    'numpy.ndarray'`. The mirror used to compare arrays by value and pass.
    Now both frames go through the same sort_values call and any exception
    is a FAILURE (gate outputs must be scalar-only).
  * The official hash is dtype-sensitive at the KIND level: DuckDB HUGEINT
    (from sum()/`//`) widens to float64 in pandas and fails against Spark's
    int64 even when all values match (q73). int32 vs int64 is fine (q84
    passed for rounds with size()-typed columns). The mirror now compares
    `dtype.kind` with int kinds pooled.
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


def kind(dtype):
    """Pool the dtype kinds the driver's hash treats as identical."""
    k = dtype.kind
    return "i" if k in "iu" else k


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
        # the driver sorts rows with pandas sort_values over all columns;
        # unsortable cells (ndarrays, dicts) crash it → red row
        try:
            g = got[gcols].sort_values(by=gcols).reset_index(drop=True)
            e = exp[ecols].sort_values(by=ecols).reset_index(drop=True)
        except Exception as ex:
            failures.append((name, f"not driver-sortable: {type(ex).__name__}: {ex}"))
            continue
        # the driver's hash is dtype-sensitive (int64 vs float64 fails even
        # on equal values — DuckDB HUGEINT hazard); int width is tolerated
        dk = None
        for c in gcols:
            if kind(g[c].dtype) != kind(e[c].dtype):
                dk = (f"col {c} dtype kind differs: spark={g[c].dtype} "
                      f"oracle={e[c].dtype} (HUGEINT oracle? CAST AS BIGINT)")
                break
        if dk:
            failures.append((name, dk))
            continue
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
