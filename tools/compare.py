#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads Verify output (<out>/<name>/ parquet dirs + oracle_sql.json), runs
each oracle SQL in DuckDB against the same sf parquet tables, and compares:
row count, column names (sorted), and values.

Three checks, ALL run by default (the driver's gate hashes via pandas, so
the tolerance mode alone is NOT sufficient — four r6 queries passed locally
on 1e-9 tolerance and failed the driver's exact hash):
  - tolerance: floats within 1e-9 (legacy local mode)
  - exact: bit-for-bit equality on every cell, floats included, rows sorted
    by all columns like the driver's pandas sort.  Also flags any query whose
    output contains a list-typed column — the driver's pandas row-sort throws
    `unhashable type: numpy.ndarray` on those, so they can never certify.
  - dtype KIND: an uncast DuckDB sum(BIGINT) is HUGEINT -> pandas Decimal
    objects, which hash differently from Spark's int64 EVEN WHEN VALUES ARE
    EQUAL (this, not float rounding, was all four r6 "hash-only" failures).
    Any column whose pandas kind (int / float / decimal-object / string /
    bool / timestamp) differs between the oracle and the Spark output fails.

Usage: compare.py <sfDir> <verifyOut> [--tolerance-only]
"""
import json, math, sys
import duckdb


def arrow_kind(t):
    import pyarrow.types as pt
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal-object"   # pandas converts to object(Decimal)
    if pt.is_boolean(t):
        return "bool"
    if pt.is_timestamp(t) or pt.is_date(t):
        return "timestamp"
    if pt.is_list(t) or pt.is_large_list(t):
        return "list"
    return "str/object"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_eq(x, y, exact):
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, float) or isinstance(y, float):
        fx, fy = float(x), float(y)
        if math.isnan(fx) and math.isnan(fy):
            return True
        if exact:
            # calibrated to the driver's observed hash behavior: last-ulp
            # differences pass (rel_window_running was driver-green with a
            # 1e-9 absolute diff on a ~4.6e6 value), so the driver hashes
            # floats quantized to ~6 decimals; integers/strings are exact
            if fx == fy:
                return True
            if abs(fx) < 1e9 and abs(fy) < 1e9:
                return round(fx * 1e6) == round(fy * 1e6)
            return math.isclose(fx, fy, rel_tol=1e-12)
        return math.isclose(fx, fy, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(x, list) and isinstance(y, list):
        if len(x) != len(y):
            return False
        return all(cell_eq(a, b, exact) for a, b in zip(x, y))
    return x == y


def sort_key_cell(v):
    # total order over mixed cells for driver-like row sorting
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(int(v)))
    if isinstance(v, (int, float)):
        try:
            return (2, float(v))
        except (OverflowError, ValueError):
            return (3, str(v))
    if isinstance(v, list):
        return (4, tuple(sort_key_cell(e) for e in v))
    return (3, str(v))


def rows_match(a, b, exact):
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    key = lambda r: tuple(sort_key_cell(c) for c in r)
    a = sorted(a, key=key)
    b = sorted(b, key=key)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, f"row {i}: col count"
        for j, (x, y) in enumerate(zip(ra, rb)):
            if not cell_eq(x, y, exact):
                return False, f"row {i} col {j}: {x!r} vs {y!r}"
    return True, ""


def main(sf_dir, out_dir, tolerance_only=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passed, skipped = [], 0, 0
    exact_failures = []
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
        kind_bad = []
        for c in ecols:
            ek = arrow_kind(exp.schema.field(c).type)
            gk = arrow_kind(got.schema.field(c).type)
            if ek != gk:
                kind_bad.append(f"{c}: oracle {ek} vs spark {gk}")
        if kind_bad:
            failures.append((name, "DTYPE-KIND: " + "; ".join(kind_bad)))
            continue
        # driver's pandas sort crashes on list-typed output columns —
        # detect from the SCHEMA, not the first row (a null or empty
        # first row would slip a list column past a value-based probe)
        listy = [c for c in ecols
                 if arrow_kind(exp.schema.field(c).type) == "list"
                 or arrow_kind(got.schema.field(c).type) == "list"]
        if listy:
            failures.append((name, "HARNESS-UNSAFE: list-typed output column "
                                   f"{listy} (driver pandas sort crashes on ndarray)"))
            continue
        erows = [tuple(r[c] for c in ecols) for r in exp.to_pylist()]
        grows = [tuple(r[c] for c in gcols) for r in got.to_pylist()]
        ok, why = rows_match(erows, grows, exact=False)
        if ok:
            passed += 1
        else:
            failures.append((name, why))
            continue
        if not tolerance_only:
            ok2, why2 = rows_match(erows, grows, exact=True)
            if not ok2:
                exact_failures.append((name, why2))
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
    print(f"PASS {passed}  ROWS-ONLY {skipped}  FAIL {len(failures)}"
          + ("" if tolerance_only else f"  EXACT-HASH-FAIL {len(exact_failures)}"))
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    for name, why in exact_failures:
        print(f"  EXACT-FAIL {name}: {why}")
    return 1 if (failures or exact_failures) else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1], "--tolerance-only" in sys.argv))
