#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only; the
Scala library has no python dependency).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every
testdata table registered as a view, and compares: row count, column names,
and order-insensitive value equality (columns sorted by name, rows sorted).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if v is None:
        return "NULL"
    return repr(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # pipeline_report's oracle names the landing file literally, which is
        # only sound while each table is exactly one parquet FILE (a
        # Spark-written multi-part dir would make the Spark side correctly
        # emit one row per part file) — fail loudly if that assumption breaks
        import os
        assert os.path.isfile(f"{sf_dir}/{t}.parquet"), \
            f"landing zone not single-file for {t}: pipeline_report oracle invalid"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [c.lower() for c in spark_rel.columns]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            o_rel = con.sql(sql)
            o_cols = [c.lower() for c in o_rel.columns]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            failures += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns differ\n  spark : {sorted(s_cols)}\n  oracle: {sorted(o_cols)}")
            failures += 1
            continue
        # Dtype parity: a DuckDB integer sum() returns HUGEINT (int128) where
        # Spark emits BIGINT — values compare equal here but the driver's hash
        # includes the dtype, so any drift must fail locally too.
        # two columns differing only in case would silently collapse to one
        # dict entry and could mask a dtype mismatch
        if len(set(s_cols)) != len(s_cols) or len(set(o_cols)) != len(o_cols):
            print(f"FAIL {name}: case-duplicate column names: {s_cols} / {o_cols}")
            failures += 1
            continue
        s_types = {c.lower(): str(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
        o_types = {c.lower(): str(t) for c, t in zip(o_rel.columns, o_rel.types)}
        mism = {c: (s_types[c], o_types[c]) for c in sorted(s_types)
                if s_types[c] != o_types.get(c)}
        if mism:
            lines = "\n".join(f"  col={c}: spark={a} oracle={b}" for c, (a, b) in mism.items())
            print(f"FAIL {name}: dtypes differ\n{lines}")
            failures += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
            failures += 1
            continue
        sr, orr = rowset(s_rows, s_cols), rowset(o_rows, o_cols)
        if sr != orr:
            bad = sum(1 for a, b in zip(sr, orr) if a != b)
            print(f"FAIL {name}: values differ in {bad}/{len(sr)} rows")
            for a, b in zip(sr, orr):
                if a != b:
                    scols = sorted(s_cols)
                    for c, x, y in zip(scols, a, b):
                        if x != y:
                            print(f"  col={c}\n   spark : {x}\n   oracle: {y}")
                    break
            failures += 1
            continue
        print(f"PASS {name} ({len(s_rows)} rows, {len(s_cols)} cols)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
