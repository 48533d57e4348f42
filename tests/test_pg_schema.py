"""Unit tests for the catalog-introspection assembly (S1) — pure function
over catalog scan rows; the JDBC round-trip needs a live PostgreSQL and is
exercised by `introspect` in deployment."""

from slice_db_spark.sources.pg_schema import assemble_schema


def rows(*dicts):
    return list(dicts)


def test_assemble_schema_orders_columns_and_ref_pairs():
    t = rows(
        {"schema": "public", "name": "child", "ordinal": 2, "column": "b"},
        {"schema": "public", "name": "child", "ordinal": 1, "column": "a"},
        {"schema": "public", "name": "parent", "ordinal": 1, "column": "x"},
        {"schema": "public", "name": "parent", "ordinal": 2, "column": "y"},
    )
    r = rows(
        {"id": "fk", "child_schema": "public", "child_name": "child",
         "parent_schema": "public", "parent_name": "parent",
         "child_column": "b", "parent_column": "y", "ordinal": 2},
        {"id": "fk", "child_schema": "public", "child_name": "child",
         "parent_schema": "public", "parent_name": "parent",
         "child_column": "a", "parent_column": "x", "ordinal": 1},
    )
    s = rows(
        {"seq_schema": "public", "seq_name": "child_a_seq",
         "table_schema": "public", "table_name": "child"},
    )
    cfg = assemble_schema(t, r, s)
    assert cfg.tables["public.child"].columns == ["a", "b"]  # attnum order
    ref = cfg.references["fk"]
    assert ref.columns == ["a", "b"] and ref.reference_columns == ["x", "y"]  # ordinal-aligned
    assert cfg.tables["public.child"].sequences == ["public.child_a_seq"]
    cfg.validate()
    # round-trips through the reference JSON shape
    from slice_db_spark.config.model import SchemaConfig

    assert SchemaConfig.loads(cfg.dumps()).to_dict() == cfg.to_dict()


def test_jdbc_scan_options_snapshot():
    """Snapshot-consistent read recipe (`slice_db/dump.py:126-144`): every
    partition reader pins the exported snapshot via sessionInitStatement."""
    from slice_db_spark.sources.pg_schema import jdbc_scan_options, snapshot_session_init

    opts = jdbc_scan_options(
        '"public"."orders"',
        partition_column="o_orderkey",
        num_partitions=8,
        bounds=(1, 60_000),
        snapshot_id="00000003-0000001B-1",
    )
    assert opts["dbtable"] == '"public"."orders"'
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == ("1", "60000", "8")
    init = opts["sessionInitStatement"]
    assert init.startswith("BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ")
    assert "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'" in init
    # quoting is safe, unpartitioned scans carry no range options
    assert "''" in snapshot_session_init("it's")
    plain = jdbc_scan_options("t")
    assert plain == {"dbtable": "t"}


def test_assemble_schema_empty_database():
    """Reference `test/test_schema_empty.py`: an empty database yields an
    empty but VALID schema config that round-trips through JSON."""
    from slice_db_spark.config.model import SchemaConfig
    from slice_db_spark.sources.pg_schema import assemble_schema

    cfg = assemble_schema([], [], [])
    cfg.validate()
    assert cfg.tables == {} and cfg.references == {} and cfg.sequences == {}
    back = SchemaConfig.loads(cfg.dumps())
    back.validate()
    assert back.tables == {}
