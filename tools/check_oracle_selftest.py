#!/usr/bin/env python3
"""Regression test for the type-aware gate in check_oracle.py.

The round-6/7 `media_ppm_decode` incident: DuckDB's `list_sum` widened the
oracle column to HUGEINT while Spark wrote int64; every VALUE matched, the
driver's typed hash failed, and the old local gate (which collapsed both
to Python int) passed — so the bug shipped red twice. This self-test
reconstructs that exact shape and requires the upgraded gate to FAIL it,
and to PASS once the oracle carries the CAST.

Run: python3 tools/check_oracle_selftest.py
"""
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb


def run_gate(sf_dir, out_dir):
    p = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "check_oracle.py"),
         str(sf_dir), str(out_dir)],
        capture_output=True, text=True)
    return p.returncode, p.stdout


def main():
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        sf = tmp / "sf"
        out = tmp / "out"
        (out / "t_widened").mkdir(parents=True)
        sf.mkdir()
        con = duckdb.connect()
        # the "corpus": one table the oracle reads
        con.execute(f"""
            COPY (SELECT * FROM (VALUES (1, [10, 20]), (2, [30, 40]))
                  AS t(doc_id, xs))
            TO '{sf}/documents.parquet' (FORMAT PARQUET)""")
        # the Spark-side result: BIGINT sums (what Spark's int64 writes)
        con.execute(f"""
            COPY (SELECT doc_id, CAST(list_sum(xs) AS BIGINT) AS s
                  FROM read_parquet('{sf}/documents.parquet')
                  ORDER BY doc_id)
            TO '{out}/t_widened/part-0.parquet' (FORMAT PARQUET)""")
        # oracle WITHOUT the cast: identical values, HUGEINT type
        (out / "oracle_sql.json").write_text(json.dumps({
            "t_widened": "SELECT doc_id, list_sum(xs) AS s "
                         "FROM documents ORDER BY doc_id"}))
        rc, stdout = run_gate(sf, out)
        assert rc != 0, f"gate must FAIL the uncast HUGEINT oracle\n{stdout}"
        assert "TYPE mismatch" in stdout, stdout
        # and with the cast (the media_ppm_decode fix shape) it passes
        (out / "oracle_sql.json").write_text(json.dumps({
            "t_widened": "SELECT doc_id, CAST(list_sum(xs) AS BIGINT) AS s "
                         "FROM documents ORDER BY doc_id"}))
        rc, stdout = run_gate(sf, out)
        assert rc == 0, f"gate must PASS the cast oracle\n{stdout}"
    print("check_oracle_selftest: OK (uncast HUGEINT fails, cast passes)")


if __name__ == "__main__":
    main()
