"""Continuously-maintained sketches over streams.

The batch sketches (:mod:`..operators.sketches`) are mergeable by
construction — HLL registers merge by max, histogram buckets by sum.
That is exactly the property a streaming maintenance loop needs: each
micro-batch computes its OWN tiny sketch state, persists it, and the
serving read applies the merge operator across everything persisted.
No stateful streaming operator is involved at all, so there is no
watermark contract and nothing unbounded: state per epoch is
KB-sized regardless of stream volume.

Exactly-once without transactions: each epoch's partial sketch lands in
its own ``epoch_id=N`` directory, OVERWRITTEN when the checkpoint
replays that epoch (the quarantine-sink idiom from
:mod:`.corpus`) — a replay rewrites identical state instead of
double-counting it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import HIST_BUCKETS, hist_counts, hist_quantiles


def hist_stream_to_parquet(
    values: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    lo_q: int,
    hi_q: int,
    value_col: str = "value",
    n_buckets: int = HIST_BUCKETS,
    available_now: bool = True,
):
    """Maintain a histogram-quantile sketch incrementally over a stream:
    per micro-batch, bucket the rows into exact integer counts (the same
    :func:`..operators.sketches.hist_counts` arithmetic as the batch
    path) and write them under ``epoch_id=N``.  Returns the
    StreamingQuery.

    The range [lo_q, hi_q] is fixed up front (sketch contract — the
    bucket boundaries of already-persisted state cannot move); values
    outside clamp into the edge buckets, preserving counts and rank
    queries interior to the range."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        counts = hist_counts(batch, value_col, lo_q, hi_q, n_buckets)
        counts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch_id={int(epoch_id)}")
        )

    writer = values.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hist_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """Serving-side merge of every persisted epoch's partial histogram:
    bucket-wise SUM — the sketch's merge operator, a metadata-sized
    aggregation however many epochs have accumulated."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_hist_quantiles(
    spark: SparkSession,
    out_dir: str,
    lo_q: int,
    hi_q: int,
    probs_pct: tuple = (50, 90, 99),
    n_buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """Quantile estimates straight off the persisted stream state (the
    rank-on-read analog of the trending-report query): merge the epochs,
    then interpolate — no raw value is ever re-read."""
    counts = read_hist_state(spark, out_dir)
    (n_total,) = counts.agg(F.sum("cnt")).first()
    return hist_quantiles(
        spark, counts, lo_q, hi_q, int(n_total), probs_pct, n_buckets
    )


def cms_stream_to_parquet(
    values: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    salt: str = "cms",
    available_now: bool = True,
):
    """Maintain a Count-Min frequency sketch over a stream: per micro-
    batch the CMS cell table (cell-wise-sum mergeable, like the
    histogram's buckets) lands under its own overwritten epoch dir.
    The heavy-hitters question ("which values are hot RIGHT NOW, over
    all time, without storing per-value counters") is answered at read
    time from KB-per-epoch state."""
    from ..operators.sketches import cms_cells

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        cms_cells(batch, value_col, salt=salt).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch_id={int(epoch_id)}")
        )

    writer = values.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_estimates(
    spark: SparkSession, out_dir: str, keys: DataFrame, salt: str = "cms"
) -> DataFrame:
    """Frequency estimates for ``keys`` (one column ``key``) off the
    merged epoch state: cell-wise sum across epochs, then the standard
    min-over-depth-rows probe.  Exact-or-over, never under — the CMS
    contract survives the merge because sums are associative."""
    from ..operators.sketches import CMS_DEPTH, CMS_WIDTH
    from ..operators.hashing import hash64

    cells = (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    probes = None
    for j in range(CMS_DEPTH):
        h = hash64(F.concat_ws(":", F.lit(salt), F.lit(str(j)), F.col("key").cast("string")))
        p = keys.select(F.col("key"), F.lit(j).alias("row"), (h % CMS_WIDTH).alias("cell"))
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(cells, ["row", "cell"], "left_outer")
        .select("key", F.coalesce(F.col("cnt"), F.lit(0)).alias("__c"))
        .groupBy("key")
        .agg(F.min("__c").cast("bigint").alias("cms_estimate"))
    )
