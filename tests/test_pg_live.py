"""Live-PostgreSQL integration (the reference's dominant test tier:
ephemeral DB + CLI round-trip, `test/pg.py:11-47`, `test/test_dump.py:47-104`).

Requires a reachable database AND the PostgreSQL JDBC driver on the Spark
classpath; gated on ``SLICE_PG_URL`` (e.g.
``jdbc:postgresql://localhost:5432/test?user=postgres&password=pg``) so CI
without PostgreSQL skips cleanly.  DDL/DML runs over the same JDBC driver
via py4j DriverManager — no extra Python client needed.
"""

from __future__ import annotations

import os

import pytest

PG_URL = os.environ.get("SLICE_PG_URL")

pytestmark = pytest.mark.skipif(
    not PG_URL, reason="SLICE_PG_URL not set (live-PostgreSQL integration tests)"
)


@pytest.fixture()
def pg_exec(spark):
    """Statement executor over the JVM's DriverManager (same driver the
    Spark JDBC source uses)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(PG_URL)
    st = conn.createStatement()

    def run(sql: str):
        return st.execute(sql)

    yield run
    st.close()
    conn.close()


@pytest.fixture()
def pg_fixture(pg_exec):
    pg_exec("DROP TABLE IF EXISTS child; DROP TABLE IF EXISTS parent")
    pg_exec("CREATE TABLE parent (id bigint PRIMARY KEY)")
    pg_exec(
        "CREATE TABLE child (id bigint PRIMARY KEY,"
        " parent_id bigint REFERENCES parent (id))"
    )
    pg_exec("INSERT INTO parent (id) VALUES (1), (2)")
    pg_exec("INSERT INTO child (id, parent_id) VALUES (1, 1), (2, 1), (3, 2)")
    yield
    pg_exec("DROP TABLE IF EXISTS child; DROP TABLE IF EXISTS parent")


def test_introspect_live(spark, pg_fixture):
    from slice_db_spark.sources.pg_schema import introspect

    cfg = introspect(spark, PG_URL)
    assert cfg.tables["public.parent"].columns == ["id"]
    assert cfg.tables["public.child"].columns == ["id", "parent_id"]
    (ref,) = [r for r in cfg.references.values() if r.table == "public.child"]
    assert ref.reference_table == "public.parent"
    assert ref.columns == ["parent_id"] and ref.reference_columns == ["id"]


def test_slice_and_restore_live(spark, pg_fixture, pg_exec, tmp_path):
    """`test/test_dump.py:47-104`: slice parent id=1, wipe the tables,
    restore over JDBC, assert the closure (children 1,2 — not 3)."""
    from slice_db_spark.config.model import Root
    from slice_db_spark.plans.restore import restore_to_jdbc
    from slice_db_spark.plans.subset import Subsetter
    from slice_db_spark.sources.pg_schema import introspect, jdbc_snapshot_catalog

    cfg = introspect(spark, PG_URL)
    for r in cfg.references.values():
        r.directions = ["forward", "reverse"]
    cfg = type(cfg)(
        tables={k: v for k, v in cfg.tables.items() if k in ("public.parent", "public.child")},
        references=cfg.references,
        sequences={},
    )
    for t in cfg.tables.values():
        t.id_columns = ["id"]

    catalog = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    eng = Subsetter(spark, catalog, cfg)
    tables = eng.export(eng.run([Root("public.parent", "id = 1")]))
    # stage through parquet so restore does not read-while-writing
    staged = {}
    for tid, df in tables.items():
        p = str(tmp_path / tid.replace(".", "__"))
        df.write.parquet(p)
        staged[tid] = spark.read.parquet(p)

    pg_exec("DELETE FROM child; DELETE FROM parent")
    order = restore_to_jdbc(staged, cfg, PG_URL)
    assert order.index("public.parent") < order.index("public.child")

    back = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    assert {r["id"] for r in back["public.parent"].collect()} == {1}
    assert {(r["id"], r["parent_id"]) for r in back["public.child"].collect()} == {(1, 1), (2, 1)}


def test_deferred_cyclic_restore_live(spark, pg_exec, tmp_path):
    """FK cycle restore via SET CONSTRAINTS ALL DEFERRED in one
    transaction (`test/test_defer.py:90-140`: cycle 1→2→3→1)."""
    from slice_db_spark.config.model import Reference, SchemaConfig, Table
    from slice_db_spark.plans.restore import restore_to_jdbc_deferred

    import datetime
    import decimal

    pg_exec("DROP TABLE IF EXISTS ring")
    pg_exec(
        "CREATE TABLE ring (id bigint PRIMARY KEY, next_id bigint,"
        " born date, balance numeric(12,2), note text,"
        " CONSTRAINT ring_next FOREIGN KEY (next_id) REFERENCES ring (id)"
        " DEFERRABLE INITIALLY IMMEDIATE)"
    )
    try:
        cfg = SchemaConfig(
            tables={"public.ring": Table(
                id="public.ring", name="ring", schema="public",
                columns=["id", "next_id", "born", "balance", "note"],
                id_columns=["id"])},
            references={"ring_next": Reference(
                id="ring_next", table="public.ring", columns=["next_id"],
                reference_table="public.ring", reference_columns=["id"])},
        )
        # date/decimal/escape-bearing text columns: the types py4j cannot
        # setObject and the characters COPY text must escape
        rows = spark.createDataFrame(
            [
                (1, 2, datetime.date(2020, 1, 2), decimal.Decimal("10.50"), "tab\there"),
                (2, 3, datetime.date(2021, 3, 4), decimal.Decimal("-0.25"), None),
                (3, 1, None, None, "nl\nthere"),
            ],
            "id bigint, next_id bigint, born date, balance decimal(12,2), note string",
        )
        restore_to_jdbc_deferred({"public.ring": rows}, cfg, PG_URL)
        back = spark.read.format("jdbc").option("url", PG_URL).option(
            "dbtable", "ring").load()
        got = {(r["id"], r["next_id"], r["born"], r["balance"], r["note"]) for r in back.collect()}
        assert got == {
            (1, 2, datetime.date(2020, 1, 2), decimal.Decimal("10.50"), "tab\there"),
            (2, 3, datetime.date(2021, 3, 4), decimal.Decimal("-0.25"), None),
            (3, 1, None, None, "nl\nthere"),
        }
    finally:
        pg_exec("DROP TABLE IF EXISTS ring")


def test_pg_dump_ddl_roundtrip_live(spark, pg_fixture, pg_exec, tmp_path):
    """The reference's `test/test_dump.py:107-166` flow: capture rows +
    REAL pg_dump DDL sections, drop the tables, replay pre-data, restore
    rows, replay post-data — constraints and all."""
    from slice_db_spark.config.model import Root
    from slice_db_spark.plans.restore import restore_to_jdbc
    from slice_db_spark.plans.subset import Subsetter
    from slice_db_spark.sources.ddl import pg_dump_sections, split_statements
    from slice_db_spark.sources.pg_schema import introspect, jdbc_snapshot_catalog
    from slice_db_spark.sources.slice import read_slice, read_slice_schema, write_slice

    pre, post = pg_dump_sections(PG_URL)
    assert any("CREATE TABLE" in s and '"parent"' in s for s in pre)
    assert any("FOREIGN KEY" in s for s in post)

    cfg = introspect(spark, PG_URL)
    for r in cfg.references.values():
        r.directions = ["forward", "reverse"]
    cfg = type(cfg)(
        tables={k: v for k, v in cfg.tables.items() if k in ("public.parent", "public.child")},
        references=cfg.references,
        sequences={},
    )
    for t in cfg.tables.values():
        t.id_columns = ["id"]
    catalog = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    eng = Subsetter(spark, catalog, cfg)
    tables = eng.export(eng.run([Root("public.parent", "id = 1")]))
    out = str(tmp_path / "slice")
    write_slice(tables, cfg, out, pre_data=pre, post_data=post)

    pg_exec("DROP TABLE child; DROP TABLE parent")

    back, manifest = read_slice(spark, out)
    pre2, post2 = read_slice_schema(out, manifest)
    for stmt in pre2:
        pg_exec(stmt)
    restore_to_jdbc(back, cfg, PG_URL)
    for stmt in post2:
        pg_exec(stmt)

    got = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    assert {r["id"] for r in got["public.parent"].collect()} == {1}
    assert {(r["id"], r["parent_id"]) for r in got["public.child"].collect()} == {(1, 1), (2, 1)}


def test_schema_cli_live(spark, pg_fixture, capsys):
    """`slicedb schema` equivalent: the first command a migrating user
    runs (`slice_db/cli/schema.py:9-14`)."""
    import json as _json

    from slice_db_spark import cli

    rc = cli.main(["schema", "--url", PG_URL])
    assert rc == 0
    cfg = _json.loads(capsys.readouterr().out)
    assert cfg["tables"]["public.parent"]["columns"] == ["id"]
    assert any(r["table"] == "public.child" for r in cfg["references"].values())


def test_export_snapshot_live(spark, pg_fixture, pg_exec):
    """pg_export_snapshot acquisition: reads pinned to the exported
    snapshot must not see rows committed after the export."""
    from slice_db_spark.sources.pg_schema import export_snapshot, introspect, jdbc_snapshot_catalog

    cfg = introspect(spark, PG_URL)
    cfg = type(cfg)(
        tables={k: v for k, v in cfg.tables.items() if k == "public.parent"},
        references={}, sequences={},
    )
    with export_snapshot(spark, PG_URL) as snap:
        assert ":" in snap.snapshot_id or "-" in snap.snapshot_id
        pg_exec("INSERT INTO parent (id) VALUES (99)")
        cat = jdbc_snapshot_catalog(spark, PG_URL, cfg, snapshot_id=snap.snapshot_id)
        ids = {r["id"] for r in cat["public.parent"].collect()}
        assert 99 not in ids and ids == {1, 2}
    # without the snapshot the new row is visible
    cat2 = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    assert 99 in {r["id"] for r in cat2["public.parent"].collect()}


def test_cli_restore_url_live(spark, pg_fixture, pg_exec, tmp_path):
    """Full CLI loop against a live database: dump a .zip slice with real
    pg_dump DDL, drop the tables, `restore --url --include-schema` —
    the reference's own end-to-end (`test/test_dump.py:107-166`), driven
    entirely through this repo's CLI."""
    import json as _json

    from slice_db_spark import cli
    from slice_db_spark.sources.pg_schema import introspect

    cfg = introspect(spark, PG_URL)
    for r in cfg.references.values():
        r.directions = ["forward", "reverse"]
    cfg = type(cfg)(
        tables={k: v for k, v in cfg.tables.items() if k in ("public.parent", "public.child")},
        references=cfg.references, sequences={},
    )
    for t in cfg.tables.values():
        t.id_columns = ["id"]
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(cfg.dumps())

    # CLI dump reads parquet catalogs; stage the live tables to parquet
    from slice_db_spark.sources.pg_schema import jdbc_snapshot_catalog

    cat_dir = tmp_path / "cat"
    cat_dir.mkdir()
    for tid, df in jdbc_snapshot_catalog(spark, PG_URL, cfg).items():
        df.write.parquet(str(cat_dir / f"{cfg.tables[tid].name}.parquet"))

    zp = str(tmp_path / "s.zip")
    rc = cli.main([
        "dump", "--schema", str(schema_file), "--root", "public.parent", "id = 1",
        "--include-schema", "--ddl-url", PG_URL, "--format", "zip",
        str(cat_dir), zp,
    ])
    assert rc == 0

    pg_exec("DROP TABLE child; DROP TABLE parent")
    rc = cli.main([
        "restore", "--schema", str(schema_file), "--format", "zip",
        "--url", PG_URL, "--include-schema", zp,
    ])
    assert rc == 0
    back = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    assert {r["id"] for r in back["public.parent"].collect()} == {1}
    assert {(r["id"], r["parent_id"]) for r in back["public.child"].collect()} == {(1, 1), (2, 1)}


def test_cli_dump_url_live(spark, pg_fixture, pg_exec, tmp_path):
    """dump --url: slice a LIVE database directly (snapshot-pinned
    readers, pg_dump DDL from the same URL), no parquet staging."""
    import json as _json

    from slice_db_spark import cli
    from slice_db_spark.sources.pg_schema import introspect, jdbc_snapshot_catalog

    cfg = introspect(spark, PG_URL)
    for r in cfg.references.values():
        r.directions = ["forward", "reverse"]
    cfg = type(cfg)(
        tables={k: v for k, v in cfg.tables.items() if k in ("public.parent", "public.child")},
        references=cfg.references, sequences={},
    )
    for t in cfg.tables.values():
        t.id_columns = ["id"]
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(cfg.dumps())

    zp = str(tmp_path / "live.zip")
    rc = cli.main([
        "dump", "--schema", str(schema_file), "--root", "public.parent", "id = 1",
        "--url", PG_URL, "--include-schema", "--format", "zip", zp,
    ])
    assert rc == 0

    pg_exec("DROP TABLE child; DROP TABLE parent")
    rc = cli.main([
        "restore", "--schema", str(schema_file), "--format", "zip",
        "--url", PG_URL, "--include-schema", zp,
    ])
    assert rc == 0
    back = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    assert {r["id"] for r in back["public.parent"].collect()} == {1}
    assert {(r["id"], r["parent_id"]) for r in back["public.child"].collect()} == {(1, 1), (2, 1)}


def test_transaction_restore_live(spark, pg_fixture, pg_exec, tmp_path):
    """reference `restore --transaction`: all rows load on ONE connection
    in one transaction (acyclic schema, immediate constraints hold via
    topo order); --disable-triggers layers the replica role on top."""
    from slice_db_spark.sources.pg_schema import introspect, jdbc_snapshot_catalog
    from slice_db_spark.plans.restore import restore_to_jdbc_deferred

    cfg = introspect(spark, PG_URL)
    cfg = type(cfg)(
        tables={k: v for k, v in cfg.tables.items() if k in ("public.parent", "public.child")},
        references=cfg.references,
        sequences={},
    )
    catalog = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    staged = {}
    for tid, df in catalog.items():
        p = str(tmp_path / tid.replace(".", "__"))
        df.write.parquet(p)
        staged[tid] = spark.read.parquet(p)

    pg_exec("DELETE FROM child; DELETE FROM parent")
    # defer=False: plain one-transaction restore (immediate FK checks)
    order = restore_to_jdbc_deferred(staged, cfg, PG_URL, defer=False)
    assert order.index("public.parent") < order.index("public.child")
    back = jdbc_snapshot_catalog(spark, PG_URL, cfg)
    assert back["public.child"].count() == 3

    # disable_triggers: same restore succeeds with the replica role set
    pg_exec("DELETE FROM child; DELETE FROM parent")
    restore_to_jdbc_deferred(staged, cfg, PG_URL, defer=False, disable_triggers=True)
    assert jdbc_snapshot_catalog(spark, PG_URL, cfg)["public.parent"].count() == 2
