"""Dump `.explain("formatted")` for named queries to plans/r11/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve here)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slice_db_spark.plans import queries as Q  # noqa: E402
from slice_db_spark.session import get_spark  # noqa: E402


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("plans", cpus=cpus)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = Q.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
