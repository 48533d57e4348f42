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
        live = updates.where(~F.col(delete_col)).drop(delete_col)
    return kept.unionByName(live)
