"""SQL-script sink: COPY blocks in FK order, escapes, setval statements."""

from __future__ import annotations

import pytest

from slice_db_spark.config.graph import CycleError
from slice_db_spark.config.model import SchemaConfig
from slice_db_spark.plans.tpch import tpch_schema
from slice_db_spark.sources import write_sql_script


def test_sql_script_shape(spark, catalog, tmp_path):
    schema = tpch_schema()
    tables = {
        "region": catalog["region"],
        "nation": catalog["nation"].where("n_nationkey < 3"),
    }
    path = str(tmp_path / "slice.sql")
    order = write_sql_script(tables, schema, path, sequences={"orders_o_orderkey_seq": 99})
    assert order == ["region", "nation"]
    text = open(path).read()
    r = text.index('COPY "public"."region"')
    n = text.index('COPY "public"."nation"')
    assert r < n  # parents first
    assert text.count("\\.") == 2
    assert "setval" in text and "99" in text
    # nation rows present as TSV lines
    block = text[n:].split("\\.")[0]
    assert len(block.strip().splitlines()) == 1 + 3  # header + 3 rows


def test_sql_script_cycle_requires_defer(spark, catalog, tmp_path):
    d = {
        "tables": {"a": {"columns": ["id", "b_id"], "idColumns": ["id"]},
                   "b": {"columns": ["id", "a_id"], "idColumns": ["id"]}},
        "references": {
            "ab": {"table": "a", "columns": ["b_id"], "referenceTable": "b", "referenceColumns": ["id"]},
            "ba": {"table": "b", "columns": ["a_id"], "referenceTable": "a", "referenceColumns": ["id"]},
        },
    }
    schema = SchemaConfig.from_dict(d)
    df = spark.createDataFrame([(1, 1)], "id bigint, b_id bigint")
    df2 = spark.createDataFrame([(1, 1)], "id bigint, a_id bigint")
    with pytest.raises(CycleError):
        write_sql_script({"a": df, "b": df2}, schema, str(tmp_path / "c.sql"))
    write_sql_script({"a": df, "b": df2}, schema, str(tmp_path / "c.sql"), defer_constraints=True)
    text = open(str(tmp_path / "c.sql")).read()
    assert text.startswith("BEGIN;\nSET CONSTRAINTS ALL DEFERRED;")
    assert text.rstrip().endswith("COMMIT;")
