"""Slice sink/source round-trips: parquet-native and reference-compatible
TSV (COPY text escapes), manifest shape parity."""

from __future__ import annotations

import json
import os

import pytest

from slice_db_spark.config.model import Root
from slice_db_spark.plans.subset import Subsetter
from slice_db_spark.plans.tpch import tpch_schema
from slice_db_spark.sources import read_slice, write_slice
from slice_db_spark.sources.slice import copy_escape, copy_unescape


@pytest.fixture(scope="module")
def small_slice(spark, catalog):
    schema = tpch_schema()
    eng = Subsetter(spark, {t: catalog[t] for t in schema.tables}, schema)
    res = eng.run([Root("customer", "c_custkey = 1")])
    return schema, eng.export(res), res


def test_parquet_slice_roundtrip(spark, small_slice, tmp_path):
    schema, tables, res = small_slice
    out = str(tmp_path / "slice")
    manifest = write_slice(tables, schema, out, sequences={"orders_o_orderkey_seq": 31})
    # manifest shape: camelCase, per-table columns/name/schema/segments
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert set(m) == {"preData", "postData", "sequences", "tables"}
    t = m["tables"]["orders"]
    assert t["columns"][0] == "o_orderkey" and t["name"] == "orders"
    assert sum(s["rowCount"] for s in t["segments"]) == tables["orders"].count()
    assert m["sequences"]["orders_o_orderkey_seq"]["value"] == 31

    back, manifest2 = read_slice(spark, out)
    for tid, df in tables.items():
        assert back[tid].count() == df.count()
        assert back[tid].columns == manifest.tables[tid]["columns"]


def test_tsv_slice_roundtrip(spark, small_slice, tmp_path):
    schema, tables, _ = small_slice
    out = str(tmp_path / "slice_tsv")
    write_slice(tables, schema, out, fmt="tsv")
    back, _ = read_slice(spark, out, fmt="tsv")
    want = {tuple(str(v) if v is not None else None for v in r) for r in tables["customer"].collect()}
    got = {tuple(r) for r in back["customer"].collect()}
    # timestamps stringify differently (tsv is typeless); compare key col sets
    assert {r[0] for r in got} == {str(r[0]) if r[0] is not None else None for r in want} or got == want
    assert back["customer"].count() == tables["customer"].count()


def test_copy_escape_roundtrip(spark):
    vals = ["plain", "tab\there", "nl\nthere", "back\\slash", "\v\f\b\r", None, "", "\\N literal"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    out = df.select(copy_unescape(copy_escape("v")).alias("v")).collect()
    assert [r.v for r in out] == vals
    # escaped form never contains raw tab/newline (safe for TSV lines)
    esc = df.select(copy_escape("v").alias("e")).collect()
    for r in esc:
        assert "\t" not in r.e and "\n" not in r.e


def test_zip_slice_roundtrip(spark, small_slice, tmp_path):
    """ZIP container interop: write a zip64 archive with the reference's
    entry layout (`slice_db/slice.py:9-28`), reopen it, compare rows."""
    import zipfile

    from slice_db_spark.sources import read_slice_zip, write_slice_zip

    schema, tables, _ = small_slice
    zp = str(tmp_path / "slice.zip")
    manifest = write_slice_zip(
        tables,
        schema,
        zp,
        sequences={"orders_o_orderkey_seq": 31},
        pre_data=["CREATE TABLE t (a int);"],
        post_data=["ALTER TABLE t ADD PRIMARY KEY (a);"],
    )
    with zipfile.ZipFile(zp) as zf:
        names = set(zf.namelist())
    # reference entry layout: manifest, 1-based tsv segments, seq txt, sql
    assert "manifest.json" in names
    assert "pre-data/1.sql" in names and "post-data/1.sql" in names
    assert "orders_o_orderkey_seq.txt" in names
    for tid, meta in manifest.tables.items():
        for i in range(len(meta["segments"])):
            assert f"{tid}/{i + 1}.tsv" in names

    back, manifest2 = read_slice_zip(spark, zp, workdir=str(tmp_path / "unzip"))
    assert manifest2.pre_data == 1 and manifest2.post_data == 1
    assert manifest2.sequences["orders_o_orderkey_seq"]["value"] == 31
    for tid, df in tables.items():
        assert back[tid].count() == df.count()
        assert back[tid].columns == manifest.tables[tid]["columns"]
    want = {str(r[0]) for r in tables["customer"].collect()}
    assert {r[0] for r in back["customer"].collect()} == want


def test_reference_shaped_zip_reads(spark, tmp_path):
    """A zip authored the way the reference writes slices (hand-built with
    its exact entry names and COPY escapes) opens and unescapes."""
    import zipfile

    from slice_db_spark.sources import read_slice_zip

    zp = str(tmp_path / "ref.zip")
    manifest = {
        "preData": {"count": 0},
        "postData": {"count": 0},
        "sequences": {"public.widget_id_seq": {"name": "widget_id_seq", "schema": "public", "value": 7}},
        "tables": {
            "public.widget": {
                "columns": ["id", "label"],
                "name": "widget",
                "schema": "public",
                "segments": [{"rowCount": 2}, {"rowCount": 1}],
            }
        },
    }
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("manifest.json", json.dumps(manifest))
        zf.writestr("public.widget/1.tsv", "1\tplain\n2\ttab\\there\n")
        zf.writestr("public.widget/2.tsv", "3\t\\N\n")
        zf.writestr("public.widget_id_seq.txt", "7")

    tables, m = read_slice_zip(spark, zp, workdir=str(tmp_path / "x"))
    rows = sorted(tables["public.widget"].collect())
    assert [tuple(r) for r in rows] == [("1", "plain"), ("2", "tab\there"), ("3", None)]
    assert sum(s["rowCount"] for s in m.tables["public.widget"]["segments"]) == 3


def test_write_slice_single_job_per_table(spark, small_slice, tmp_path):
    """Segment accounting comes from parquet footers — the write is the
    ONLY Spark job per table (no re-read of the written output)."""
    schema, tables, _ = small_slice
    # a shuffle-free input makes the write the only possible job; any
    # post-write re-read for segment accounting would show as a second one
    # (AQE legitimately splits shuffle-bearing plans into several jobs, so
    # the subset-export df can't pin this)
    cols = schema.tables["region"].columns
    sub = {
        "region": spark.range(7).selectExpr(
            f"id AS {cols[0]}", *[f"CAST(id AS string) AS {c}" for c in cols[1:]]
        )
    }
    sc = spark.sparkContext
    sc.setJobGroup("write_slice_job_count", "segment accounting audit")
    try:
        manifest = write_slice(sub, schema, str(tmp_path / "one"))
        jobs = sc.statusTracker().getJobIdsForGroup("write_slice_job_count")
    finally:
        sc.setJobGroup(None, None)
    assert len(jobs) == 1, f"write_slice ran {len(jobs)} jobs for one table"
    assert sum(s["rowCount"] for s in manifest.tables["region"]["segments"]) == 7


def test_copy_line_rendering(spark):
    """The deferred-restore COPY writer's row rendering: NULL -> \\N,
    escapes applied, binary -> \\x hex bytea input, typed values via the
    Catalyst string cast."""
    import datetime
    import decimal

    from slice_db_spark.plans.restore import _copy_line

    df = spark.createDataFrame(
        [(1, "tab\there", datetime.date(2020, 1, 2), decimal.Decimal("10.50"), bytearray(b"\x01A")),
         (2, None, None, None, None)],
        "id bigint, s string, d date, n decimal(12,2), b binary",
    )
    lines = [r.value for r in _copy_line(df).orderBy("value").collect()]
    assert lines == [
        "1\ttab\\there\t2020-01-02\t10.50\t\\\\x0141",
        "2\t\\N\t\\N\t\\N\t\\N",
    ]


def test_copy_chunks_gloms_lines(spark):
    """The deferred-restore relay must cross the driver boundary per
    ~flush_bytes CHUNK, not per row: chunks carry many newline-joined COPY
    lines each, sizes hover around the flush target, and the line multiset
    is exactly _copy_line's output."""
    from slice_db_spark.plans.restore import _copy_chunks, _copy_line

    df = spark.range(1000).selectExpr(
        "id", "repeat('x', 50) AS pad"
    )  # ~55-byte lines
    flush = 2000  # → ~35 lines per chunk
    chunks = [r.value for r in _copy_chunks(df, flush).collect()]
    assert 10 <= len(chunks) <= 60, len(chunks)  # NOT 1000 singletons
    sizes = [len(c.encode()) for c in chunks]
    assert max(sizes) <= 2 * flush
    lines = [ln for c in chunks for ln in c.split("\n")]
    assert sorted(lines) == sorted(
        r.value for r in _copy_line(df).collect()
    )


def test_jdbc_value_conversion(spark):
    """The prepared-statement fallback maps date/datetime to explicit
    java.sql types for setObject; Decimal relies on py4j's native
    BigDecimal conversion (verified by round-tripping one through a Java
    collection)."""
    import datetime
    import decimal

    from slice_db_spark.plans.restore import _jdbc_value

    jvm = spark._jvm
    ts = _jdbc_value(jvm, datetime.datetime(2020, 1, 2, 3, 4, 5, 123456))
    assert ts.getClass().getName() == "java.sql.Timestamp"
    assert str(ts) == "2020-01-02 03:04:05.123456"
    d = _jdbc_value(jvm, datetime.date(2021, 6, 7))
    assert d.getClass().getName() == "java.sql.Date" and str(d) == "2021-06-07"
    assert _jdbc_value(jvm, 42) == 42 and _jdbc_value(jvm, None) is None
    # Decimal: passes through _jdbc_value, converted by py4j at the call
    lst = jvm.java.util.ArrayList()
    lst.add(_jdbc_value(jvm, decimal.Decimal("-12.345")))
    assert lst.get(0) == decimal.Decimal("-12.345")


def test_write_slice_parallel_jobs_identical_manifest(spark, tmp_path):
    """jobs=4 must produce the identical manifest (same table order, same
    segment counts) as the serial write."""
    from slice_db_spark.config.model import SchemaConfig, Table
    from slice_db_spark.sources.slice import write_slice

    schema = SchemaConfig(
        tables={
            f"t{i}": Table(id=f"t{i}", name=f"t{i}", columns=["a", "b"])
            for i in range(4)
        },
        references={},
        sequences={},
    )
    tables = {
        f"t{i}": spark.createDataFrame(
            [(j, f"v{i}_{j}") for j in range(10 * (i + 1))], "a bigint, b string"
        )
        for i in range(4)
    }
    m1 = write_slice(tables, schema, str(tmp_path / "serial"))
    m2 = write_slice(tables, schema, str(tmp_path / "par"), jobs=4)
    assert list(m1.tables) == list(m2.tables)
    for t in m1.tables:
        c1 = sum(s["rowCount"] for s in m1.tables[t]["segments"])
        c2 = sum(s["rowCount"] for s in m2.tables[t]["segments"])
        assert c1 == c2 == 10 * (int(t[1]) + 1)


def test_write_slice_zip_parallel_jobs_roundtrip(spark, tmp_path):
    """zip staging with jobs>1 must produce a readable archive with the
    same per-table counts as serial."""
    from slice_db_spark.config.model import SchemaConfig, Table
    from slice_db_spark.sources.slice import read_slice_zip, write_slice_zip

    schema = SchemaConfig(
        tables={
            f"t{i}": Table(id=f"t{i}", name=f"t{i}", columns=["a", "b"])
            for i in range(3)
        },
        references={},
        sequences={},
    )
    tables = {
        f"t{i}": spark.createDataFrame(
            [(j, f"v{j}") for j in range(5 * (i + 1))], "a bigint, b string"
        )
        for i in range(3)
    }
    zp = str(tmp_path / "s.zip")
    m = write_slice_zip(tables, schema, zp, jobs=3)
    assert list(m.tables) == ["t0", "t1", "t2"]
    back, manifest = read_slice_zip(spark, zp, workdir=str(tmp_path / "w"))
    for i in range(3):
        assert back[f"t{i}"].count() == 5 * (i + 1)


def test_orc_slice_roundtrip(spark, small_slice, tmp_path):
    """ORC sink/source parity with parquet: typed round-trip, footer-based
    segment accounting (no re-read), value equality on a keyed table."""
    schema, tables, _ = small_slice
    out = str(tmp_path / "slice_orc")
    manifest = write_slice(tables, schema, out, fmt="orc")
    t = manifest.tables["orders"]
    assert sum(s["rowCount"] for s in t["segments"]) == tables["orders"].count()
    back, _ = read_slice(spark, out, fmt="orc")
    for tid, df in tables.items():
        assert back[tid].columns == manifest.tables[tid]["columns"]
    want = {tuple(r) for r in tables["customer"].collect()}
    got = {tuple(r) for r in back["customer"].collect()}
    assert got == want


def test_partitioned_slice_write_prunes_on_read(spark, catalog, tmp_path):
    """Hive-layout partitioned table export: the manifest records the
    layout, segment counts survive the nested directory walk, reads
    restore the manifest column order, and a partition-column predicate
    prunes at the DIRECTORY level (PartitionFilters in the plan) — the
    100 TB data-skipping contract."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    schema = tpch_schema()
    orders = catalog["orders"].withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    out = str(tmp_path / "pslice")
    manifest = write_slice(
        {"orders": orders},
        schema,
        out,
        partition_by={"orders": ["o_month"]},
    )
    meta = manifest.tables["orders"]
    assert meta["partitionedBy"] == ["o_month"]
    assert sum(s["rowCount"] for s in meta["segments"]) == orders.count()

    tables, m2 = read_slice(spark, out)
    back = tables["orders"]
    assert back.columns[: len(orders.columns) - 1] == [
        c for c in orders.columns if c != "o_month"
    ][: len(orders.columns) - 1]
    assert back.count() == orders.count()

    one_month = orders.select("o_month").first()["o_month"]
    pruned = back.where(F.col("o_month") == one_month)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_month" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.count() == orders.where(F.col("o_month") == one_month).count()
