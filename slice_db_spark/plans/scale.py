"""Cluster-scale join toolkit: bucketing and skew salting.

Two techniques the 100 TB plans lean on that deserve first-class,
tested implementations rather than folklore:

* **Bucketing** — pre-shuffle a table ONCE into hash buckets on its join
  key (`bucketize`); every later equi-join between co-bucketed tables
  runs shuffle-free (SortMergeJoin with no Exchange).  This is the Spark
  analog of the reference's temp-table + ANALYZE trick
  (`slice_db/dump_temp_table.py:234-250`): pay a one-time layout cost so
  every subsequent join is cheap.  Worth it when a table joins on the
  same key many times (fact tables, the subsetter's repeated semi-joins).
* **Salting** — when one join key dominates (a hub parent, an empty-string
  content hash), hash-partitioning puts the whole key on one task.
  `salted_join` spreads the hot side over ``salt`` subkeys and replicates
  the small side per subkey: result-identical to the plain join, but the
  biggest task shrinks ~salt×.  AQE's skew-join splits oversized
  PARTITIONS; salting also splits a single oversized KEY, which AQE
  cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketize(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    buckets: int = 32,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table and
    return the re-read handle.  Joins between tables bucketed on the same
    keys × same bucket count skip the shuffle entirely (verify with
    ``.explain``: no Exchange under the SortMergeJoin)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name, format="parquet")
    return df.sparkSession.table(table_name)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: identical rows to ``big.join(small, on, how)``.

    The big side gets a deterministic subkey ``hash(row) % salt``; the
    small side is exploded ``salt``× so every (key, subkey) pair finds its
    match.  Hot keys spread over ``salt`` tasks instead of one.  Supported
    ``how``: inner / left / left_semi / left_anti (right/full would need
    small-side dedup after the explode)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salt_col = "__salt"
    while salt_col in big.columns or salt_col in small.columns:
        salt_col += "_"
    b = big.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    out = b.join(s, on + [salt_col], how)
    return out.drop(salt_col)


def key_skew(
    df: DataFrame, cols: list[str], k: int = 10
) -> DataFrame:
    """The skew diagnostic that DECIDES when `salted_join` is worth it:
    top-k heaviest join keys with their share of all rows in parts-per-
    million (integer ratio — exact cross-engine).

    One map-side-combinable aggregation + TakeOrdered; run it on a join's
    key columns before shipping the join — a top key holding >1/parallelism
    of the rows will straggle one task and wants salting (or AQE skew
    splitting, which only helps at partition granularity)."""
    total = df.count()
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            *cols,
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.floor(F.lit(1_000_000) * F.col("n_rows") / F.lit(total)).alias("ppm"),
        )
        .orderBy(F.desc("n_rows"), *cols)
        .limit(k)
    )


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative ints bucketed to
    ``bits`` bits each — the multi-dimensional clustering key: sorting by
    z makes file-level (min, max) ranges narrow on BOTH dimensions
    simultaneously, so predicates on EITHER column skip files (classic
    Delta/Iceberg OPTIMIZE ZORDER; plain sort clusters only its leading
    column).  Pure integer bit arithmetic — identical in any engine —
    and a per-row map: the layout job is one range-partitioned sort by
    z, no extra shuffle beyond the write's own."""
    xc = x if not isinstance(x, str) else F.col(x)
    yc = y if not isinstance(y, str) else F.col(y)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + (F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)).cast("bigint")
            + (F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)).cast("bigint")
        )
    return z


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Simulated Z-ordered file layout + its data-skipping report: rows
    order by the interleaved key, split into ``n_files`` equal z-ranges,
    and each file reports (count, min/max of BOTH source dimensions) —
    the numbers a scan planner compares against a predicate to skip
    files.  Narrow per-file ranges on both axes are the whole point;
    compare with a single-column sort, where the second axis's ranges
    stay full-width.  The z-range split uses exact integral ``div`` over
    the driver's (min, max) scalars — no sampling, no floats."""
    keyed = df.select(
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    ).select("__x", "__y", zorder_key("__x", "__y", bits).alias("__z"))
    keyed = keyed.localCheckpoint(eager=True)  # scalar probe + report reuse
    zmin, zmax = keyed.agg(F.min("__z"), F.max("__z")).first()
    span = int(zmax) - int(zmin) + 1
    fid = F.expr(f"least({n_files - 1}, ((__z - {int(zmin)}) * {n_files}) div {span})")
    return (
        keyed.select(fid.cast("bigint").alias("file_id"), "__x", "__y")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )


# ------------------------------------------------------- sink compaction
# Append-heavy sinks (streaming corpus ingestion, LSH-index signature
# appends) accrete one small file per micro-batch per partition; at 100 TB
# the file count, not the byte count, becomes the scan bottleneck (driver
# listing, footer reads, task scheduling).  Periodic compaction rewrites
# the sink to size-targeted files behind the crash-safe staging swap.


def _scan_parquet_files(path: str):
    """(parquet file paths, total bytes, inferred hive partition columns,
    leaf partition-dir count) for a sink dir: partition columns come from
    the ``key=value`` directory chain of any leaf file, in depth order."""
    import os

    files: list[str] = []
    part_cols: list[str] = []
    leaf_dirs: set[str] = set()
    for root, _, names in os.walk(path):
        for f in names:
            if not f.endswith(".parquet"):
                continue
            files.append(os.path.join(root, f))
            rel = os.path.relpath(root, path)
            if rel != ".":
                leaf_dirs.add(rel)
                if not part_cols:
                    part_cols = [
                        seg.split("=", 1)[0]
                        for seg in rel.split(os.sep)
                        if "=" in seg
                    ]
    return files, sum(os.path.getsize(f) for f in files), part_cols, len(leaf_dirs)


def _compact_dir(
    spark, path, target_file_bytes, partition_by, transform, preserve_files=()
) -> dict:
    """Shared compaction scaffolding: recover a crashed swap, size the
    output from CURRENT on-disk bytes (so compaction converges), rewrite
    through ``transform`` into size-targeted files, and atomically swap —
    all under the sink's writer lock, so a LIVE appender (streaming
    ingest takes the same lock per batch) can never land rows between the
    compaction read and the swap and lose them.

    Partitioned sinks: the rewrite repartitions by (partition columns,
    bounded salt).  Count-only round-robin would put every partition
    value in every task — dynamic partition writes then emit one file per
    (task, value) and miss the size target by the partition count; keying
    by the partition columns alone funnels each directory through ONE
    task.  The salt bounds files-per-directory at ≈ n_out / |leaf dirs|.
    Hive ``key=value`` layouts are auto-detected and PRESERVED when
    ``partition_by`` is not given (pass ``[]`` to force a flat rewrite),
    with partition-value type inference disabled for the read so
    directory names round-trip byte-for-byte (``grp=007`` must not come
    back as ``grp=7``)."""
    import math
    import os

    from ..sources.atomic import dir_lock, recover_dir, swap_dir

    path = os.path.normpath(path)
    with dir_lock(path) as lease:
        recover_dir(path)
        files, total, detected, n_leaf_dirs = _scan_parquet_files(path)
        if not files:
            return {"files_before": 0, "files_after": 0, "bytes": 0}
        part_cols = partition_by if partition_by is not None else detected
        n_out = max(1, math.ceil(total / target_file_bytes))
        # read through a CLONED session (shared SparkContext, own SQLConf)
        # with partition-value type inference off, so directory names
        # round-trip byte-for-byte WITHOUT flipping the shared session's
        # conf under concurrently running reads in other threads
        reader = spark.newSession()
        reader.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
        )
        df = transform(reader.read.parquet(path))
        if part_cols:
            per_dir = max(1, round(n_out / max(1, n_leaf_dirs)))
            # DETERMINISTIC salt (content hash, like salted_join): a
            # monotonically_increasing_id salt changes across shuffle-task
            # retries and silently duplicates/loses rows (SPARK-23207
            # class); collision-extend the name so a real __salt column
            # is never overwritten
            salt_col = "__salt"
            while salt_col in df.columns:
                salt_col += "_"
            df = df.withColumn(
                salt_col,
                F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(per_dir)),
            )
            df = df.repartition(n_out, *part_cols, F.col(salt_col)).drop(salt_col)
            w = df.write.mode("overwrite").partitionBy(*part_cols)
        else:
            w = df.repartition(n_out).write.mode("overwrite")
        w.parquet(path + ".staging")
        # sidecar metadata (e.g. the LSH index's _lsh_meta.json) is not
        # parquet data — copy it into staging BEFORE the swap so the
        # promoted dir is complete at every crash point
        import shutil

        for name in preserve_files:
            src = os.path.join(path, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(path + ".staging", name))
        # fenced swap: a compaction suspended past the stale window may
        # have lost the lock to a live appender — swapping then would
        # silently drop the rows appended since our read
        lease.check()
        swap_dir(path)
        after, _, _, _ = _scan_parquet_files(path)
        return {"files_before": len(files), "files_after": len(after), "bytes": total}


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet dir at ``path`` into ≈``target_file_bytes``
    files and atomically swap the result in (`..sources.atomic.swap_dir`
    — a crash at any point leaves the old sink or a complete staging
    copy, never a half-rewrite).  Hive-partitioned layouts are preserved
    (detected from the ``key=value`` directories when ``partition_by`` is
    omitted).  Returns {files_before, files_after, bytes}."""
    return _compact_dir(spark, path, target_file_bytes, partition_by, lambda df: df)


def compact_lsh_index(spark, path: str, target_file_bytes: int = 128 << 20) -> dict:
    """Maintenance for the streaming near-dedup index
    (`..operators.dedup.build_lsh_index` layout): drop the duplicate
    signature rows that checkpoint replays may have appended (harmless
    for correctness, pure waste for probe I/O), then compact to
    size-targeted files, keeping the ``band`` directory partitioning and
    the ``_lsh_meta.json`` parameter sidecar."""
    from ..operators.dedup import LSH_META_NAME

    return _compact_dir(
        spark, path, target_file_bytes, ["band"], lambda df: df.dropDuplicates(),
        preserve_files=(LSH_META_NAME,),
    )


def compact_span_index(spark, path: str, target_file_bytes: int = 128 << 20) -> dict:
    """Maintenance for the continuous exact-substring dedup index
    (`..operators.dedup.build_span_index` layout): drop the duplicate
    (gram hash, owner) rows that crash-replayed appends leave behind,
    compact to size-targeted files, and keep the ``_span_meta.json``
    parameter sidecar."""
    from ..operators.dedup import SPAN_META_NAME

    return _compact_dir(
        spark, path, target_file_bytes, [], lambda df: df.dropDuplicates(),
        preserve_files=(SPAN_META_NAME,),
    )


def compact_phash_index(spark, path: str, target_file_bytes: int = 128 << 20) -> dict:
    """Maintenance for the continuous media-dedup signature index
    (`..streaming.media.ingest_media_stream` layout: (corpus_id, phash)
    rows for image/audio modes, (corpus_id, frame_idx, phash, n_frames)
    for video — the all-column dedup handles both): drop the duplicate
    rows crash-replayed appends leave behind, compact to size-targeted
    files, and keep the ``_phash_meta.json`` mode/banding sidecar."""
    from ..streaming.media import PHASH_META_NAME

    return _compact_dir(
        spark, path, target_file_bytes, [], lambda df: df.dropDuplicates(),
        preserve_files=(PHASH_META_NAME,),
    )
