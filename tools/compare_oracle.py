#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table of sfDir in DuckDB, runs every oracle SQL from
<outDir>/oracle_sql.json, loads the corresponding Spark result parquet, sorts
columns by name and rows by value, and reports match/mismatch per query.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING-RESULT {name}")
            n_bad += 1
            continue
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"ORACLE-ERROR {name}: {e}")
            n_bad += 1
            continue
        cur = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        s_cols = [d[0] for d in cur.description]
        s_rows = cur.fetchall()
        oc, orep = table_repr(o_cols, o_rows)
        sc, srep = table_repr(s_cols, s_rows)
        if oc != sc:
            print(f"SCHEMA-MISMATCH {name}: spark={sc} oracle={oc}")
            n_bad += 1
        elif orep != srep:
            print(f"VALUE-MISMATCH {name}: rows spark={len(srep)} oracle={len(orep)}")
            for i, (a, b) in enumerate(zip(srep, orep)):
                if a != b:
                    print(f"  first diff row {i}: spark={a} oracle={b}")
                    break
            if len(srep) != len(orep):
                only_s = set(srep) - set(orep)
                only_o = set(orep) - set(srep)
                for r in list(only_s)[:2]:
                    print(f"  only-spark: {r}")
                for r in list(only_o)[:2]:
                    print(f"  only-oracle: {r}")
            n_bad += 1
        else:
            print(f"OK {name} ({len(srep)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
