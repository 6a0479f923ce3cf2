#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads Verify output (<out>/<name>/ parquet dirs + oracle_sql.json), runs
each oracle SQL in DuckDB against the same sf parquet tables, and compares:
row count, column names (sorted), and values (exact for non-floats,
tolerance for floats).  Usage: compare.py <sfDir> <verifyOut>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return v
    return v

def rows_match(a, b, rtol=1e-9, atol=1e-9):
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, f"row {i}: col count"
        for j, (x, y) in enumerate(zip(ra, rb)):
            if isinstance(x, float) or isinstance(y, float):
                if x is None or y is None:
                    if x is not y:
                        return False, f"row {i} col {j}: {x!r} vs {y!r}"
                    continue
                if math.isnan(x) and math.isnan(y):
                    continue
                if not math.isclose(float(x), float(y), rel_tol=rtol, abs_tol=atol):
                    return False, f"row {i} col {j}: {x!r} vs {y!r}"
            elif isinstance(x, list) and isinstance(y, list):
                if [round(float(e), 6) for e in x] != [round(float(e), 6) for e in y]:
                    return False, f"row {i} col {j}: list mismatch"
            else:
                if x != y:
                    return False, f"row {i} col {j}: {x!r} vs {y!r}"
    return True, ""

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passed, skipped = [], 0, 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"spark output missing: {e}"))
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            failures.append((name, f"columns {gcols} vs oracle {ecols}"))
            continue
        # driver sorts columns by name before hashing; emulate + row-sort
        erows = [tuple(r[c] for c in ecols) for r in exp.to_pylist()]
        grows = [tuple(r[c] for c in gcols) for r in got.to_pylist()]
        ok, why = rows_match(erows, grows)
        if ok:
            passed += 1
        else:
            failures.append((name, why))
    # queries with no oracle (rows-only check): report row counts
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"  [rows-only] {name}: {n} rows {'OK' if n > 0 else '!! EMPTY'}")
                skipped += 1
            except Exception as e:
                failures.append((name, f"rows-only read error: {e}"))
    print(f"PASS {passed}  ROWS-ONLY {skipped}  FAIL {len(failures)}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
