#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: read the Spark parquet result, run the
matching oracle SQL (verifyOutDir/oracle_sql.json) in DuckDB with the sfDir
parquet tables registered as views, sort columns by name + rows, and
compare values (floats to 1e-9). Prints PASS/FAIL per query.
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows):
    def k(v):
        return tuple("\0" if x is None else str(x) for x in v)
    return sorted(rows, key=k)

STRICT = False  # --strict: exact float equality, like the driver's hash gate

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if STRICT:
                return float(a) == float(b) or (
                    math.isnan(float(a)) and math.isnan(float(b)))
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        # The DRIVER's harness pandas-sorts result columns and dies on
        # nested types (r15 embedding_sign_codes: "unhashable type:
        # numpy.ndarray"). Reproduce that verdict here instead of
        # str()-sorting arrays happily — a hash-gated query must ship
        # atomic columns only.
        nested = [f"{c}:{t}" for c, t in zip(got_rel.columns, got_rel.types)
                  if "[]" in str(t) or str(t).startswith(("STRUCT", "MAP"))]
        if nested and name in oracle:
            print(f"FAIL {name}: non-atomic output column(s) {nested} — "
                  "the driver's pandas sort cannot handle nested types")
            n_fail += 1
            continue
        got = norm(con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
            " FROM got_rel").fetchall())
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp_rel.columns)
        exp = norm(con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
            " FROM exp_rel").fetchall())
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, x) in enumerate(zip(got, exp)):
            if not all(eq(a, b) for a, b in zip(g, x)):
                bad = (i, g, x)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} exp {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv
    sys.exit(main(args[0], args[1]))
