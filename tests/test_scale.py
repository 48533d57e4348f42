"""Scale-toolkit tests: bucketed joins really skip the shuffle, salted
joins really produce identical results while splitting hot keys.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from slice_db_spark.plans.scale import bucketize, salted_join


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, catalog):
    orders = catalog["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = catalog["lineitem"].select("l_orderkey", "l_quantity")
    bo = bucketize(orders, "t_orders_b", ["o_orderkey"], buckets=8)
    bl = bucketize(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", ["o_orderkey"], buckets=8,
    )
    # disable broadcast so the join would otherwise need a full shuffle
    orig_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        want = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_threshold)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_matches_plain(spark, catalog):
    li = catalog["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity")
    orders = catalog["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        want = {tuple(r) for r in li.join(orders, ["l_orderkey"], how).collect()}
        got = {tuple(r) for r in salted_join(li, orders, ["l_orderkey"], how=how, salt=7).collect()}
        assert got == want, how
    assert len(want) >= 0


def test_salted_join_rejects_right_joins(spark, catalog):
    import pytest

    with pytest.raises(ValueError):
        salted_join(catalog["lineitem"], catalog["orders"], ["l_orderkey"], how="right")


def test_zorder_narrows_both_dimensions(spark):
    """On a uniform 256x256 grid split into 16 z-range files, every file
    must cover at most half of EACH axis (z-curve locality) — whereas a
    single-column sort leaves the second axis full-width in every file.
    Also pins the Morton key on hand-computed values."""
    from pyspark.sql import functions as F

    from slice_db_spark.plans.scale import zorder_file_stats, zorder_key

    pts = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("bigint").alias("y")
    )
    stats = zorder_file_stats(pts, "x", "y", n_files=16).collect()
    assert sum(r["n_rows"] for r in stats) == 256 * 256
    for r in stats:
        assert r["x_max"] - r["x_min"] <= 128, r
        assert r["y_max"] - r["y_min"] <= 128, r
    # hand-computed Morton values: (1,0)->1, (0,1)->2, (3,5)->39
    vals = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 5)], "x bigint, y bigint"
    ).select(zorder_key("x", "y").alias("z")).collect()
    assert [r["z"] for r in vals] == [1, 2, 39]


def test_rendezvous_rebalance_minimal_movement(spark):
    """Rendezvous hashing's defining property on a 2000-doc pool: going
    8→9 shards moves ~1/9 of docs (band-checked) while hash-mod moves
    ~8/9 — an order of magnitude apart."""
    import slice_db_spark.plans.queries as Q

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    Q._CATALOGS["__rdv__"] = {"documents": df}
    try:
        (r,) = Q.shard_rebalance(spark, "__rdv__").collect()
    finally:
        del Q._CATALOGS["__rdv__"]
    assert r["n_docs"] == 2000
    assert 70_000 <= r["rdv_moved_ppm"] <= 160_000      # ~111k expected
    assert 850_000 <= r["mod_moved_ppm"] <= 925_000     # ~889k expected
    assert r["moved_rendezvous"] * 4 < r["moved_mod"]


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Many small appends -> one size-targeted rewrite behind the atomic
    swap: row multiset identical, file count collapses, and a crashed
    swap recovers."""
    import os

    from slice_db_spark.plans.scale import compact_parquet
    from slice_db_spark.sources.atomic import recover_dir

    sink = str(tmp_path / "sink")
    for i in range(8):  # 8 appends x 4 partitions = small-file sprawl
        spark.range(i * 10, (i + 1) * 10).repartition(4).write.mode(
            "append"
        ).parquet(sink)
    before_files = sum(
        1 for f in os.listdir(sink) if f.endswith(".parquet")
    )
    assert before_files >= 16
    before_rows = sorted(r.id for r in spark.read.parquet(sink).collect())

    report = compact_parquet(spark, sink, target_file_bytes=1 << 30)
    assert report["files_before"] == before_files
    assert report["files_after"] < before_files
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == before_rows

    # crash between the two renames: live dir missing, .old present
    os.replace(sink, sink + ".old")
    recover_dir(sink)
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == before_rows


def test_compact_lsh_index_dedups_replayed_signatures(spark, tmp_path):
    """Replay-duplicated signature rows vanish, probe results are
    unchanged, and the band partitioning survives compaction."""
    import os

    from slice_db_spark.operators.dedup import build_lsh_index, probe_lsh_index
    from slice_db_spark.plans.scale import compact_lsh_index

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % i) for i in range(15)],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog 3")],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "idx")
    build_lsh_index(corpus, idx)
    want = {(r.new_id, r.corpus_id) for r in probe_lsh_index(spark, idx, new).collect()}
    n_rows = spark.read.parquet(idx).count()

    # simulate a replayed epoch double-appending the same signatures
    spark.read.parquet(idx).write.mode("append").partitionBy("band").parquet(idx)
    assert spark.read.parquet(idx).count() == 2 * n_rows

    compact_lsh_index(spark, idx)
    assert spark.read.parquet(idx).count() == n_rows
    assert any(d.startswith("band=") for d in os.listdir(idx))
    got = {(r.new_id, r.corpus_id) for r in probe_lsh_index(spark, idx, new).collect()}
    assert got == want


def test_compact_preserves_hive_partitions_and_trailing_slash(spark, tmp_path):
    """Review-finding pins: compaction auto-detects key=value layouts and
    preserves them (flattening would destroy directory pruning for every
    reader); a trailing-slash path must not rename the sink into its own
    subtree; size targeting is honored WITHIN partition dirs (never one
    file per partition value)."""
    import os

    from slice_db_spark.plans.scale import compact_parquet

    sink = str(tmp_path / "part_sink")
    for i in range(4):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS grp"
        ).write.mode("append").partitionBy("grp").parquet(sink)
    before = sorted(r.id for r in spark.read.parquet(sink).collect())

    report = compact_parquet(spark, sink + "/", target_file_bytes=2048)  # slash on purpose
    assert report["files_after"] >= 1
    # layout preserved: grp= dirs still present, values intact
    assert sorted(d for d in os.listdir(sink) if d.startswith("grp=")) == [
        "grp=0", "grp=1", "grp=2"
    ]
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == before
    # tiny target -> multiple files per partition dir (not one per value)
    n_grp0 = sum(1 for f in os.listdir(os.path.join(sink, "grp=0")) if f.endswith(".parquet"))
    assert n_grp0 > 1


def test_ingest_recovers_corpus_after_crashed_compact(spark, tmp_path):
    """Review-finding pin: a compact crash between the swap's two renames
    leaves the corpus at .old; the NEXT ingest batch must restore it
    before deciding dedup applicability — otherwise the append silently
    restarts the corpus from one batch while history sits stranded."""
    import json as _json
    import os as _os

    from slice_db_spark.streaming import corpus as SC2

    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def batch(name, rows, mtime):
        p = land / name
        p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
        _os.utime(p, (mtime, mtime))

    batch("b0.jsonl", [
        {"doc_id": 1, "text": "first document body", "lang": "en", "source": "a", "n_chars": 1},
    ], 1_000_000_000)
    SC2.ingest_corpus_stream(spark, str(land), out, ckpt)
    # simulate the crashed compact: live renamed aside, staging never promoted
    _os.replace(out, out + ".old")

    batch("b1.jsonl", [
        {"doc_id": 2, "text": "first document body", "lang": "en", "source": "a", "n_chars": 1},
        {"doc_id": 3, "text": "a different second doc", "lang": "en", "source": "a", "n_chars": 1},
    ], 1_000_000_100)
    SC2.ingest_corpus_stream(spark, str(land), out, ckpt)
    kept = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    # doc 2 is an exact dup of the RECOVERED doc 1 and must not re-enter
    assert kept == {1, 3}
    assert not _os.path.isdir(out + ".old")


def test_compact_converges(spark, tmp_path):
    """Compacting an already-compact sink is a stable no-op: file count
    does not oscillate and rows are untouched."""
    from slice_db_spark.plans.scale import compact_parquet

    sink = str(tmp_path / "conv")
    for i in range(6):
        spark.range(i * 20, (i + 1) * 20).repartition(2).write.mode("append").parquet(sink)
    r1 = compact_parquet(spark, sink, target_file_bytes=1 << 30)
    r2 = compact_parquet(spark, sink, target_file_bytes=1 << 30)
    assert r2["files_before"] == r1["files_after"]
    assert r2["files_after"] == r1["files_after"]
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == list(range(120))


def test_compact_partition_values_roundtrip_and_empty_sink(spark, tmp_path):
    """Partition VALUES survive byte-for-byte (type inference would turn
    grp=007 into grp=7 and break path-based readers); compacting an empty
    or nonexistent sink is a graceful zero report."""
    import os

    from slice_db_spark.plans.scale import compact_parquet

    sink = str(tmp_path / "vals")
    spark.createDataFrame(
        [(1, "007"), (2, "007"), (3, "0"), (4, "00")], "id bigint, grp string"
    ).write.partitionBy("grp").parquet(sink)
    dirs_before = sorted(d for d in os.listdir(sink) if d.startswith("grp="))
    assert dirs_before == ["grp=0", "grp=00", "grp=007"]
    compact_parquet(spark, sink, target_file_bytes=1 << 30)
    assert sorted(d for d in os.listdir(sink) if d.startswith("grp=")) == dirs_before
    # read with inference off to see the on-disk values verbatim (the
    # default reader re-infers types at read time — that is reader
    # behavior, not a compaction rewrite)
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old_conf = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        got = {(r.id, r.grp) for r in spark.read.parquet(sink).collect()}
    finally:
        spark.conf.set(key, old_conf)
    assert got == {(1, "007"), (2, "007"), (3, "0"), (4, "00")}

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    assert compact_parquet(spark, empty) == {
        "files_before": 0, "files_after": 0, "bytes": 0
    }


def test_compact_size_target_bounds_partitioned_file_count(spark, tmp_path):
    """The salted repartition bounds files-per-directory at about
    n_out / |dirs| — NOT one file per (task, value), which would miss the
    size target by the partition count."""
    import math
    import os

    from slice_db_spark.plans.scale import _scan_parquet_files, compact_parquet

    sink = str(tmp_path / "bounded")
    for i in range(4):
        spark.range(i * 300, (i + 1) * 300).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS grp"
        ).write.mode("append").partitionBy("grp").parquet(sink)
    _, total, _, n_dirs = _scan_parquet_files(sink)
    target = max(1, total // 8)
    report = compact_parquet(spark, sink, target_file_bytes=target)
    n_out = math.ceil(total / target)
    per_dir = max(1, round(n_out / n_dirs))
    for d in os.listdir(sink):
        if d.startswith("grp="):
            n = sum(1 for f in os.listdir(os.path.join(sink, d)) if f.endswith(".parquet"))
            assert 1 <= n <= per_dir, (d, n, per_dir)
    assert report["files_after"] <= n_out + n_dirs


def test_compact_waits_for_writer_lock_and_takes_over_stale(spark, tmp_path):
    """The compaction read->swap runs under the sink's writer lock: a held
    lock blocks it (so a live ingest batch can never lose rows to a
    concurrent swap), and a stale lock from a dead holder is taken over."""
    import os
    import threading
    import time

    import pytest

    from slice_db_spark.plans.scale import compact_parquet
    from slice_db_spark.sources.atomic import dir_lock

    sink = str(tmp_path / "locked")
    spark.range(100).write.parquet(sink)

    order = []

    def holder():
        with dir_lock(sink):
            order.append("held")
            time.sleep(1.0)
            order.append("released")

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.2)
    report = compact_parquet(spark, sink, target_file_bytes=1 << 30)
    t.join()
    assert order == ["held", "released"]  # compact waited for the writer
    assert report["files_after"] >= 1

    # stale lock (dead holder): pre-aged .lock dir is taken over
    lock = sink + ".lock"
    os.mkdir(lock)
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    report = compact_parquet(spark, sink, target_file_bytes=1 << 30)
    assert report["files_after"] >= 1
    assert not os.path.isdir(lock)


def test_compact_preserves_user_salt_column_and_session_conf(spark, tmp_path):
    """A data column literally named __salt must survive compaction (the
    internal routing salt collision-extends its name), and the shared
    session's partition-inference conf is untouched (the inference-off
    read runs in a cloned session)."""
    from slice_db_spark.plans.scale import compact_parquet

    sink = str(tmp_path / "salted_data")
    spark.createDataFrame(
        [(i, i * 7, str(i % 2)) for i in range(40)],
        "id bigint, __salt bigint, grp string",
    ).write.partitionBy("grp").parquet(sink)
    before = {(r["id"], r["__salt"]) for r in spark.read.parquet(sink).collect()}
    compact_parquet(spark, sink, target_file_bytes=1 << 30)
    after = {(r["id"], r["__salt"]) for r in spark.read.parquet(sink).collect()}
    assert after == before
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    assert spark.conf.get(key, "true") == "true"


def test_dir_lock_heartbeat_prevents_live_steal():
    """A long-running holder's lock is heartbeat-refreshed, so a waiter
    never mistakes it for stale; a genuinely dead lock is taken over by
    exactly ONE of several contenders (rename-based takeover)."""
    import os
    import tempfile
    import threading
    import time

    import pytest

    from slice_db_spark.sources.atomic import dir_lock

    d = tempfile.mkdtemp()
    live = os.path.join(d, "sink")
    os.mkdir(live)

    # live holder outlasting the stale window: waiter must TIME OUT, not steal
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with dir_lock(live, stale=2.0):
            entered.set()
            release.wait(8.0)

    t = threading.Thread(target=holder)
    t.start()
    assert entered.wait(5.0)
    time.sleep(2.5)  # past the stale window; heartbeat keeps it fresh
    with pytest.raises(TimeoutError):
        with dir_lock(live, timeout=0.5, stale=2.0):
            pass
    release.set()
    t.join()

    # dead holder: pre-aged lock, two concurrent contenders, exactly one
    # inside the critical section at a time
    lock = live + ".lock"
    os.mkdir(lock)
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    inside, max_inside = [0], [0]
    guard = threading.Lock()

    def contender():
        with dir_lock(live, timeout=10.0):
            with guard:
                inside[0] += 1
                max_inside[0] = max(max_inside[0], inside[0])
            time.sleep(0.3)
            with guard:
                inside[0] -= 1

    ts = [threading.Thread(target=contender) for _ in range(3)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert max_inside[0] == 1
    assert not os.path.isdir(lock)


def test_dir_lock_fenced_release_and_check(tmp_path):
    """Lease fencing: after a takeover (lock dir renamed away and
    re-acquired by a contender), the ex-holder's check() raises and its
    release must NOT remove the new holder's lock dir — a blind rmdir
    there would admit a third writer mid-swap."""
    import os
    import shutil

    import pytest

    from slice_db_spark.sources.atomic import dir_lock

    live = str(tmp_path / "sink")
    os.mkdir(live)
    lock = live + ".lock"

    with dir_lock(live) as lease:
        lease.check()  # owned: no-op
        # simulate a contender's stale takeover + re-acquire
        os.rename(lock, lock + ".stolen")
        shutil.rmtree(lock + ".stolen")
        os.mkdir(lock)
        open(os.path.join(lock, "owner-contender"), "w").close()
        with pytest.raises(TimeoutError):
            lease.check()
    # fenced release: the contender's lock survives our exit
    assert os.path.isdir(lock)
    assert os.path.exists(os.path.join(lock, "owner-contender"))
    shutil.rmtree(lock)


def test_dir_lock_heartbeat_fences_on_token_loss(tmp_path):
    """The heartbeat thread detects a takeover (owner token gone) and
    flags the lease lost instead of re-touching a lock it no longer
    owns."""
    import os

    from slice_db_spark.sources.atomic import dir_lock

    live = str(tmp_path / "sink")
    os.mkdir(live)

    with dir_lock(live, stale=4.0) as lease:  # heartbeat every ~1s
        os.remove(lease.token_path)
        assert lease.lost.wait(5.0), "heartbeat never noticed the takeover"


def test_compact_lsh_index_preserves_meta_and_probe_validates(spark, tmp_path):
    """The index parameter sidecar survives compaction, and a probe with
    mismatched (k, bands, n) is a hard error instead of silently matching
    nothing."""
    import os

    import pytest

    from slice_db_spark.operators import dedup as D
    from slice_db_spark.plans.scale import compact_lsh_index

    corpus = spark.createDataFrame(
        [(i, f"document number {i} about spark parquet shuffles {i}") for i in range(6)],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "idx")
    D.build_lsh_index(corpus, idx, k=8, bands=2)
    assert D.read_lsh_meta(idx) == {"k": 8, "bands": 2, "n": 3}

    new = spark.createDataFrame(
        [(100, "document number 3 about spark parquet shuffles 3")],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="built with"):
        D.probe_lsh_index(spark, idx, new)  # defaults (16, 4, 3) mismatch
    assert D.probe_lsh_index(spark, idx, new, k=8, bands=2).count() >= 1

    compact_lsh_index(spark, idx)
    assert D.read_lsh_meta(idx) == {"k": 8, "bands": 2, "n": 3}
    assert os.path.isfile(os.path.join(idx, "_lsh_meta.json"))
    assert D.probe_lsh_index(spark, idx, new, k=8, bands=2).count() >= 1


def test_dir_lock_cross_process(tmp_path):
    """The advisory lease holds across real OS processes, not just
    threads: a child process holds the lock while the parent times out,
    then acquires cleanly after release — and a fenced child (token
    removed under it) must NOT remove the parent's fresh lock on exit."""
    import os
    import subprocess
    import sys
    import textwrap
    import time

    import pytest

    from slice_db_spark.sources.atomic import dir_lock

    live = str(tmp_path / "sink")
    os.mkdir(live)
    script = textwrap.dedent("""
        import sys, time
        sys.path.insert(0, "/root/repo")
        from slice_db_spark.sources.atomic import dir_lock
        with dir_lock(sys.argv[1]) as lease:
            print("HELD", flush=True)
            time.sleep(float(sys.argv[2]))
    """)
    child = subprocess.Popen(
        [sys.executable, "-c", script, live, "3.0"],
        stdout=subprocess.PIPE, text=True,
    )
    assert child.stdout.readline().strip() == "HELD"
    with pytest.raises(TimeoutError):
        with dir_lock(live, timeout=0.5):
            pass
    child.wait(timeout=10)
    # child released: parent acquires immediately
    t0 = time.monotonic()
    with dir_lock(live, timeout=5.0):
        assert time.monotonic() - t0 < 2.0
    assert not os.path.isdir(live + ".lock")

    # fenced exit across processes: steal the lock from a live child
    # (rename + re-acquire, the takeover sequence) — the child's release
    # must leave the NEW holder's lock untouched
    import shutil

    lock = live + ".lock"
    child = subprocess.Popen(
        [sys.executable, "-c", script, live, "2.0"],
        stdout=subprocess.PIPE, text=True,
    )
    assert child.stdout.readline().strip() == "HELD"
    os.rename(lock, lock + ".stolen")
    shutil.rmtree(lock + ".stolen")
    os.mkdir(lock)
    open(os.path.join(lock, "owner-parent"), "w").close()
    child.wait(timeout=10)  # child exits; its fenced release must no-op
    assert os.path.isdir(lock)
    assert os.path.exists(os.path.join(lock, "owner-parent"))
    shutil.rmtree(lock)


def test_compact_span_index_dedups_and_preserves_meta(spark, tmp_path):
    """Span-index compaction drops crash-replayed duplicate (gh, owner)
    rows, keeps the sidecar, and leaves probe behavior unchanged."""
    from slice_db_spark.operators import dedup as D
    from slice_db_spark.plans.scale import compact_span_index

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta tail")],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "span_idx")
    D.build_span_index(docs, idx)
    D.append_span_index(spark, idx, docs)  # replayed duplicate rows
    before = spark.read.parquet(idx).count()
    report = compact_span_index(spark, idx)
    after = spark.read.parquet(idx)
    assert after.count() < before and after.count() == after.distinct().count()
    assert D.read_span_meta(idx) == {"span_tokens": 8, "wide_hash": False}
    probe = spark.createDataFrame(
        [(9, "intro alpha beta gamma delta epsilon zeta eta theta after")],
        "doc_id bigint, text string",
    )
    rw = {r.doc_id: r.text
          for r in D.incremental_span_rewrite(spark, idx, probe).collect()}
    assert rw[9] == "intro after"
