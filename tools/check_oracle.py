#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
statement from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares: column names (sorted), row count, and values (rows sorted,
columns sorted by name). Prints a per-query PASS/FAIL table and diffs.
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT bits, like the driver's hash compare — looser rounding here
        # would hide mismatches the real gate catches
        return struct.pack("<d", v).hex()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def frame(rel):
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return (sorted(cols), [types[i] for i in order],
            sorted(rows, key=lambda r: tuple(
                (x is None, str(type(x)), x) for x in r)))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # driver fixtures are flat files; Spark-written fixtures
            # (e.g. the ScaleUp 10x rehearsal dirs) are directories
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            s_cols, s_types, s_rows = frame(spark_rel)
        except Exception as e:
            print(f"FAIL {name}: cannot read Spark result: {e}")
            n_fail += 1
            continue
        try:
            o_cols, o_types, o_rows = frame(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
        elif s_types != o_types:
            # The driver hashes TYPED values (numpy/Arrow width included), so
            # HUGEINT-vs-BIGINT etc. fails there even when values match.
            # Surface the same class of bug locally via declared DuckDB types.
            diffs = [(c, a, b) for c, a, b in zip(s_cols, s_types, o_types)
                     if a != b]
            print(f"FAIL {name}: column TYPE mismatch (spark, oracle): {diffs}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
        elif s_rows != o_rows:
            bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
