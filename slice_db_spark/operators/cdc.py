"""Change-data-capture maintenance: key-based upsert/delete merge.

The reference's restore path only ever *replaces* tables
(`/root/reference/slice_db/restore.py` truncate-or-create + COPY); a
standing 100 TB corpus instead absorbs batches of changes in place.  This
module supplies the MERGE semantics (updates win on key collision, new
keys append, tombstones delete) as a pure DataFrame transform, so it
composes with any sink — parquet rewrite, slice export, JDBC restore.

Scale shape: ONE anti-join of the base against the (small) update key set
— shuffle keyed by the merge keys, so a base laid out with
`plans/scale.py` bucketing merges with NO base shuffle; the update side is
broadcast when it fits.  Nothing else touches the base rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics as a transform: rows of ``base`` whose key
    appears in ``updates`` are replaced by the update row; unmatched
    update rows are inserted; with ``delete_col`` (boolean) set, flagged
    update rows act as tombstones — their keys vanish and nothing is
    inserted.

    ``updates`` must carry at most one row per key (enforce upstream —
    last-writer-wins needs an explicit ordering the caller owns); its
    schema must match ``base`` plus the optional flag column.
    """
    key_set = updates.select(*keys).distinct()
    kept = base.join(key_set, keys, "left_anti")
    live = updates
    if delete_col is not None:
        # A NULL/absent flag means UPSERT, not delete: the key was already
        # anti-joined out of the base, so dropping the row here would
        # silently tombstone it (JSONL change rows read with a schema
        # leave the flag NULL when the field is missing).
        live = updates.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return kept.unionByName(live)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current row of every
    changed key and append one interval row per change, chaining multiple
    changes to the same key within one batch.

    ``dim`` rows carry ``[keys…, attrs…, valid_from, valid_to]`` with
    ``valid_to IS NULL`` marking the current version; ``changes`` carry
    ``[keys…, attrs…, effective_col]``.  Per key the change stream is
    ordered by effective time (ties broken by the full attr tuple being
    irrelevant — callers give distinct effective times per key): each
    change's ``valid_to`` is the NEXT change's effective time (``lead``
    window, NULL for the newest = new current row), and the previously
    current dim row closes at the key's FIRST change.

    Shapes: one ``lead`` window over the (small) change batch partitioned
    by key, one aggregation for first-change times, one equi-join against
    the dim's current rows — history rows never shuffle at all.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(effective_col)
    new_rows = (
        changes.withColumn(valid_from, F.col(effective_col))
        .withColumn(valid_to, F.lead(effective_col).over(w))
        .drop(effective_col)
    )
    first_change = changes.groupBy(*keys).agg(
        F.min(effective_col).alias("__first_eff")
    )
    current = dim.where(F.col(valid_to).isNull())
    history = dim.where(F.col(valid_to).isNotNull())
    closed = (
        current.join(first_change, keys, "left")
        .withColumn(
            valid_to,
            F.when(F.col("__first_eff").isNotNull(), F.col("__first_eff")).otherwise(
                F.col(valid_to)
            ),
        )
        .drop("__first_eff")
    )
    return history.unionByName(closed).unionByName(new_rows)
