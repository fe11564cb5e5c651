#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the corresponding
oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares (rows, schema-by-name, value hash).

Usage: tools/check_correctness.py <sfDir> <outDir>
"""
import decimal
import glob
import hashlib
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        # scale-insensitive AND notation-insensitive: '1.50' -> '1.5',
        # and integral values avoid normalize()'s '1E+2' rendering so
        # Decimal(100.00) hashes like int/float 100
        n = v.normalize()
        return format(n, "f") if n == n.to_integral_value() else str(n)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        t = pq.read_table(qdir)
        spark_cols = list(t.column_names)
        cols_data = [t.column(c).to_pylist() for c in spark_cols]
        spark_rows = list(zip(*cols_data)) if spark_cols else []
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: rows={t.num_rows}")
            continue
        try:
            atbl = con.execute(oracle[name]).arrow()
            duck_cols = list(atbl.column_names)
            duck_rows = list(zip(*[atbl.column(c).to_pylist() for c in duck_cols])) if duck_cols else []
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle error: {e}")
            continue
        # Type-family audit: the driver's gate materializes DuckDB
        # HUGEINT/DECIMAL as non-int (r1: 6 queries failed only on
        # this), so an int64-vs-decimal column is a hard failure even
        # when the values stringify identically here.
        def fam(t):
            t = str(t)
            if "decimal" in t:
                return "decimal"
            if t.startswith(("int", "uint")):
                return "int"
            if t in ("float", "double", "halffloat", "float32", "float64"):
                return "float"
            return t
        spark_fams = {f.name: fam(f.type) for f in t.schema}
        fam_bad = [
            f"{f.name}(spark={spark_fams.get(f.name)},duck={fam(f.type)})"
            for f in atbl.schema
            if f.name in spark_fams and spark_fams[f.name] != fam(f.type)
        ]
        if fam_bad:
            n_fail += 1
            print(f"  [FAIL-type] {name}: {', '.join(fam_bad)}")
            continue
        ok_rows = len(duck_rows) == len(spark_rows)
        ok_cols = sorted(duck_cols) == sorted(spark_cols)
        ok_hash = (
            ok_rows
            and ok_cols
            and table_hash(spark_cols, spark_rows)
            == table_hash(duck_cols, duck_rows)
        )
        if ok_hash:
            n_pass += 1
            print(f"  [PASS     ] {name}: rows={t.num_rows}")
        else:
            n_fail += 1
            print(
                f"  [FAIL     ] {name}: rows {len(spark_rows)} vs "
                f"{len(duck_rows)}, cols ok={ok_cols}"
            )
            if ok_rows and ok_cols and spark_rows:
                so = sorted(spark_rows)[:3]
                do = sorted(duck_rows)[:3]
                print(f"    spark: {so}")
                print(f"    duck : {do}")
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
