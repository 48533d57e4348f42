"""Driver-contract invariants for `__spark_entry__`:

* every oracle key has a query (and the reverse set is the documented
  rows-only list);
* every query's output schema is scalar-only — the driver's canonicalizer
  sorts and hashes rows, and array/map/binary columns crash it (the
  round-1 media_decode failure class);
* every oracle is valid DuckDB SQL against the fixture views (EXPLAIN —
  parse + bind without execution).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

from conftest import SF_DIR

#: queries intentionally without an oracle (RNG-backed scrub: Python
#: Mersenne streams are not expressible in SQL)
ROWS_ONLY = {"scrub_pseudonym"}

_SCALAR = (
    T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.BooleanType, T.DecimalType, T.DateType,
    T.TimestampType, T.TimestampNTZType,
)


def test_oracle_keys_match_queries():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == ROWS_ONLY


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_schema_is_scalar_only(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    for f in df.schema.fields:
        assert isinstance(f.dataType, _SCALAR), (name, f.name, f.dataType)


def test_oracles_bind_in_duckdb(ddb):
    for name, sql in entry.oracle_sql().items():
        ddb.sql("EXPLAIN " + sql)
