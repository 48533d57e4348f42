"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_CORRECTNESS_OUT=<path>`` to also write a driver-shaped
JSON file ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) covering EVERY query run — the committed
``CORRECTNESS_LOCAL.json`` artifact gives reviewers a machine-readable
replica for the names beyond the driver's per-round 50-entry window.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from slice_db_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        t = tuple(norm_val(r[i]) for i in order)
        out[t] = out.get(t, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_weak = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = row
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            row["err"] = f"spark: {type(e).__name__}"
            n_fail += 1
            continue
        dt = time.time() - t0
        row["spark_rows"] = len(rows)
        if name not in oracles:
            print(f"weak  {name}: rows={len(rows)} cols={cols} ({dt:.1f}s) [no oracle]")
            row["err"] = "no_oracle"
            n_weak += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            row["err"] = f"oracle: {type(e).__name__}"
            n_fail += 1
            continue
        row["oracle_rows"] = len(orows)
        scols = [c.lower() for c in cols]
        row["schema_match"] = sorted(scols) == sorted(ocols)
        row["rows_match"] = len(rows) == len(orows)
        problems = []
        if not row["schema_match"]:
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not row["rows_match"]:
            problems.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if not problems:
            ms, mo = rows_multiset(scols, rows), rows_multiset(ocols, orows)
            row["hash_match"] = ms == mo
            if not row["hash_match"]:
                extra_s = [k for k in ms if ms[k] != mo.get(k, 0)][:3]
                extra_o = [k for k in mo if mo[k] != ms.get(k, 0)][:3]
                problems.append(f"values differ; spark-only={extra_s} oracle-only={extra_o}")
        else:
            row["hash_match"] = False
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"pass  {name}: rows={len(rows)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (no oracle), {n_fail} fail")
    out_path = os.environ.get("SPARK_GRAFT_CORRECTNESS_OUT")
    if out_path and not only:
        import json

        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")
        print(f"wrote {out_path} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
