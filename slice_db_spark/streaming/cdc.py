"""Streaming CDC: continuously apply a change stream to a parquet
dimension with MERGE semantics.

Complements `..streaming.corpus` (append-only ingestion) with the other
standing-dataset maintenance shape: updates/inserts/tombstones arriving as
JSONL change rows, folded into the dimension per micro-batch via
`..operators.cdc.merge_upsert`.

Idempotency model: an epoch REPLAYED from the checkpoint re-merges the
same change batch into a dimension that already absorbed it — update-wins
re-replaces identical rows, insert keys are already present and get
re-replaced, tombstoned keys are already gone — so the merge is a fixed
point and replays cannot corrupt the dimension.  (Replaying OLD epochs out
of order would regress values — that is the checkpoint's job to prevent,
the same contract as any CDC consumer.)

Scale notes: the per-batch merge is one anti-join of the dimension against
the batch's key set (see `merge_upsert`); the rewrite goes to a staging
directory first and swaps in whole, so a crash mid-write never leaves a
half-written dimension.  At warehouse scale the swap becomes a
partition-level replace (overwrite only the key-space partitions the batch
touches).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.cdc import merge_upsert
from ..sources.atomic import dir_lock, recover_dir, swap_dir


def _recover_dim(dim_path: str) -> None:
    """Restore the dimension if a previous swap crashed mid-promotion —
    the shared crash-safe swap contract (`..sources.atomic`): every crash
    point leaves the dimension itself, the pre-merge copy at ``.old``, or
    a ``_SUCCESS``-complete ``.staging``; replayed epochs re-merge as a
    fixed point, so restoring the PRE-merge copy is always safe."""
    recover_dir(dim_path)


def upsert_stream(
    spark: SparkSession,
    in_path: str,
    dim_path: str,
    checkpoint: str,
    keys: list[str],
    changes_schema: str,
    order_col: str | None = None,
    delete_col: str | None = None,
    available_now: bool = True,
):
    """Start (and with ``available_now`` drain) the change stream: JSONL
    files in ``in_path`` → per-batch last-writer-wins collapse (by
    ``order_col``, which callers keep unique per key within a batch) →
    `merge_upsert` into the parquet dimension at ``dim_path``.  Returns
    the StreamingQuery."""
    from pyspark.sql.window import Window

    _recover_dim(dim_path)

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        b = batch
        if order_col is not None:
            w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
            b = (
                b.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn", order_col)
            )
        spark_b = batch.sparkSession
        # the lock scopes the WHOLE read->merge->swap (a bare __enter__
        # before the reads would leak the lock on any read/merge error
        # and stall every later batch until the stale window)
        with dir_lock(dim_path) as lease:
            _recover_dim(dim_path)
            if os.path.isdir(dim_path):
                base = spark_b.read.parquet(dim_path)
                merged = merge_upsert(base, b, keys, delete_col=delete_col)
            elif delete_col is not None:
                merged = b.where(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
            else:
                merged = b
            merged.write.mode("overwrite").parquet(dim_path + ".staging")
            # Recoverable swap: the pre-merge copy survives at `.old` until
            # the new dimension is in place (see _recover_dim/sources.atomic).
            # Fenced: never swap on a lease a contender may have taken over.
            lease.check()
            swap_dir(dim_path)

    stream = spark.readStream.schema(changes_schema).json(in_path)
    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
