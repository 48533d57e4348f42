"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": "total_sec", "value": N, "unit": "sec",
"queries": {name: sec}, "sf": X}.

Each query is fully materialized through the `noop` sink (all columns
computed, nothing collected to the driver) — the closest local analog of a
cluster job writing output.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from slice_db_spark.plans import queries as Q
from slice_db_spark.session import get_spark

HEADLINE = [
    "closure_customers",     # flagship: iterative semi-join slice capture
    "slice_export_lineitem", # slice row export (reuses the cached traversal)
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "window_top_orders",
    "events_bucket_agg",
    "dedup_exact",
    "dedup_jaccard",
    "minhash_lsh",
    "dedup_clusters",
    "simhash_sigs",
    "simhash_pairs",
    "doc_fingerprints",
    "token_stats",
    "bpe_tokens",
    "quality",
    "language_id",
    "ann_brute",
    "ann_lsh",
    "ann_ivf",
    "dedup_embedding",
    "media_decode",
    "media_frames",
    "media_resize",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    spark = get_spark("bench", cpus=cpus)

    # Steady-state warmup: cluster executors and their Python workers are
    # long-lived, so per-query numbers should measure operator cost, not
    # one-time process spawn.  One tiny shuffle warms JVM codegen; one tiny
    # pandas UDF spawns the Arrow Python worker pool (otherwise the first
    # UDF-bearing query is charged ~4 s of fork+import).
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v * 1.0

    warm = spark.range(0, cpus * 100, 1, cpus).selectExpr("id", "id % 7 AS k")
    warm.groupBy("k").count().write.format("noop").mode("overwrite").save()
    warm.select(_warm(warm.id.cast("double"))).write.format("noop").mode("overwrite").save()

    qs = Q.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
