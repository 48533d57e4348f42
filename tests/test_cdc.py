"""CDC merge semantics (`operators/cdc.py`): update-wins, insert,
tombstone, and untouched-base invariants on crafted rows."""

from __future__ import annotations

from slice_db_spark.operators.cdc import merge_upsert


def test_merge_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k bigint, s string, v double",
    )
    updates = spark.createDataFrame(
        [
            (2, "B", 22.0, False),   # update wins
            (3, "c", 30.0, True),    # tombstone: key vanishes
            (9, "new", 99.0, False), # insert
        ],
        "k bigint, s string, v double, del boolean",
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(base, updates, ["k"], delete_col="del").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 22.0), 4: ("d", 40.0), 9: ("new", 99.0)}


def test_merge_upsert_no_delete_col_and_multi_key(spark):
    base = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (2, "x", 3.0)], "a bigint, b string, v double"
    )
    updates = spark.createDataFrame(
        [(1, "y", 20.0), (3, "z", 30.0)], "a bigint, b string, v double"
    )
    got = {(r.a, r.b): r.v for r in merge_upsert(base, updates, ["a", "b"]).collect()}
    assert got == {(1, "x"): 1.0, (1, "y"): 20.0, (2, "x"): 3.0, (3, "z"): 30.0}


def test_merge_upsert_idempotent(spark):
    """Re-applying the same update batch is a no-op — the replay guarantee
    a restartable ingestion pipeline leans on."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double")
    upd = spark.createDataFrame([(2, 22.0), (5, 50.0)], "k bigint, v double")
    once = merge_upsert(base, upd, ["k"])
    twice = merge_upsert(once, upd, ["k"])
    assert sorted((r.k, r.v) for r in twice.collect()) == sorted(
        (r.k, r.v) for r in once.collect()
    )


def test_scd2_close_chain_and_untouched(spark):
    """SCD2: first change closes the current row, in-batch changes chain
    (each valid_to = next effective), last change is the open current row,
    untouched keys and existing history pass through unmodified."""
    from slice_db_spark.operators.cdc import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "old", 0, 50),      # history row (already closed)
            (1, "cur", 50, None),   # current, will be changed twice
            (2, "keep", 0, None),   # untouched
        ],
        "k bigint, attr string, valid_from bigint, valid_to bigint",
    )
    changes = spark.createDataFrame(
        [(1, "v1", 100), (1, "v2", 200)], "k bigint, attr string, eff bigint"
    )
    got = {(r.k, r.attr): (r.valid_from, r.valid_to)
           for r in scd2_apply(dim, changes, ["k"], effective_col="eff").collect()}
    assert got == {
        (1, "old"): (0, 50),        # history untouched
        (1, "cur"): (50, 100),      # closed at FIRST change
        (1, "v1"): (100, 200),      # chained
        (1, "v2"): (200, None),     # new current
        (2, "keep"): (0, None),     # untouched key stays current
    }


def test_upsert_stream_multi_batch_and_checkpoint_noop(spark, tmp_path):
    """Streaming CDC: batches apply in file-mtime order (update chain,
    tombstone, insert); a re-run over the same checkpoint is a no-op."""
    import json
    import os

    from slice_db_spark.streaming.cdc import upsert_stream

    land = tmp_path / "changes"
    land.mkdir()
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, v string, seq bigint, del boolean"

    def write_batch(name, rows, mtime):
        p = land / name
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (mtime, mtime))

    # batch 1: two inserts + an in-batch chain on k=1 (seq decides)
    write_batch("b1.jsonl", [
        {"k": 1, "v": "a0", "seq": 1, "del": False},
        {"k": 1, "v": "a1", "seq": 2, "del": False},
        {"k": 2, "v": "b", "seq": 1, "del": False},
    ], 1_000_000_000)

    def run():
        upsert_stream(spark, str(land), dim, ckpt, ["k"], schema,
                      order_col="seq", delete_col="del")

    run()
    got = {r.k: r.v for r in spark.read.parquet(dim).collect()}
    assert got == {1: "a1", 2: "b"}

    # batch 2 (newer mtime): update k=1, tombstone k=2, insert k=3
    write_batch("b2.jsonl", [
        {"k": 1, "v": "a2", "seq": 3, "del": False},
        {"k": 2, "v": "x", "seq": 2, "del": True},
        {"k": 3, "v": "c", "seq": 1, "del": False},
    ], 1_000_000_100)
    run()
    got = {r.k: r.v for r in spark.read.parquet(dim).collect()}
    assert got == {1: "a2", 3: "c"}

    # no new files: drained checkpoint -> dimension untouched
    before = sorted(os.listdir(dim))
    run()
    assert sorted(os.listdir(dim)) == before
    assert {r.k: r.v for r in spark.read.parquet(dim).collect()} == {1: "a2", 3: "c"}


def test_merge_upsert_null_delete_flag_upserts(spark):
    """A NULL delete flag means upsert, not delete: the key was already
    anti-joined out of the base, so filtering the NULL row out would
    silently tombstone it (regression: JSONL change rows read with a
    schema leave the flag NULL when the field is absent)."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string")
    updates = spark.createDataFrame(
        [(1, "A", None), (3, "c", None), (2, "x", True)],
        "k bigint, s string, del boolean",
    )
    got = {r.k: r.s for r in merge_upsert(base, updates, ["k"], delete_col="del").collect()}
    assert got == {1: "A", 3: "c"}


def test_upsert_stream_missing_delete_field_upserts(spark, tmp_path):
    """End-to-end: a JSONL change row that OMITS the delete field (schema
    fills NULL) must upsert the key, never delete it."""
    import json
    import os

    from slice_db_spark.streaming.cdc import upsert_stream

    land = tmp_path / "changes"
    land.mkdir()
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, v string, seq bigint, del boolean"
    p = land / "b1.jsonl"
    p.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 1, "v": "a", "seq": 1},          # no del field -> NULL
                {"k": 2, "v": "b", "seq": 1, "del": False},
                {"k": 3, "v": "x", "seq": 1, "del": True},
            ]
        )
        + "\n"
    )
    os.utime(p, (1_000_000_000, 1_000_000_000))
    upsert_stream(spark, str(land), dim, ckpt, ["k"], schema,
                  order_col="seq", delete_col="del")
    got = {r.k: r.v for r in spark.read.parquet(dim).collect()}
    assert got == {1: "a", 2: "b"}


def test_upsert_stream_crash_recovery(spark, tmp_path):
    """A crash between the two swap renames must not lose the dimension:
    _recover_dim restores from `.old` (or a complete `.staging`), and the
    next stream run merges on top of the recovered history."""
    import json
    import os
    import shutil

    from slice_db_spark.streaming.cdc import _recover_dim, upsert_stream

    land = tmp_path / "changes"
    land.mkdir()
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, v string, seq bigint, del boolean"

    def write_batch(name, rows, mtime):
        p = land / name
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(p, (mtime, mtime))

    write_batch("b1.jsonl", [
        {"k": 1, "v": "a", "seq": 1, "del": False},
        {"k": 2, "v": "b", "seq": 1, "del": False},
    ], 1_000_000_000)
    upsert_stream(spark, str(land), dim, ckpt, ["k"], schema,
                  order_col="seq", delete_col="del")

    # simulate a crash after `dim -> dim.old` but before staging promotion
    os.replace(dim, dim + ".old")
    assert not os.path.isdir(dim)
    _recover_dim(dim)
    assert {r.k: r.v for r in spark.read.parquet(dim).collect()} == {1: "a", 2: "b"}
    assert not os.path.isdir(dim + ".old")

    # simulate a crash after promotion was possible only from staging:
    # dim gone, no .old, but a complete (_SUCCESS) staging copy
    os.replace(dim, dim + ".staging")
    _recover_dim(dim)
    assert {r.k: r.v for r in spark.read.parquet(dim).collect()} == {1: "a", 2: "b"}

    # an INCOMPLETE staging (no _SUCCESS) is never promoted
    shutil.rmtree(dim + ".staging", ignore_errors=True)
    os.makedirs(dim + ".staging")
    saved = dim + ".saved"
    os.replace(dim, saved)
    _recover_dim(dim)
    assert not os.path.isdir(dim)
    os.replace(saved, dim)

    # the next stream run picks up on top of the recovered dimension
    write_batch("b2.jsonl", [
        {"k": 1, "v": "a2", "seq": 2, "del": False},
        {"k": 3, "v": "c", "seq": 1, "del": False},
    ], 1_000_000_100)
    upsert_stream(spark, str(land), dim, ckpt, ["k"], schema,
                  order_col="seq", delete_col="del")
    got = {r.k: r.v for r in spark.read.parquet(dim).collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}
