"""Oracle result-type lint: every DuckDB oracle must bind to types that
survive the driver's pandas/Arrow hash gate.

The round-4 driver red row (``q12_shipmode``) was not a wrong answer but a
*typing* artifact: an uncast ``sum(CASE ...)`` returns HUGEINT in DuckDB,
which pandas renders as float64 while Spark returns int64, so the driver's
typed value-hash diverges on value-identical rows.  This test catches that
bug class at pytest time instead of burning a driver round: it binds every
``oracle_sql()`` entry against the test parquet views and asserts no result
column has a type outside the cross-engine-safe set.

HUGEINT / DECIMAL outputs are exactly the "uncast aggregate" smell —
``sum(int)``, ``int * int`` overflow-promotion, bare decimal literals —
and every oracle convention in this repo casts them to BIGINT/DOUBLE.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

# Types the driver's pandas-side hash treats identically to Spark's output:
#   BIGINT/INTEGER -> int64, DOUBLE -> float64, VARCHAR -> object,
#   TIMESTAMP/DATE -> datetime64, BOOLEAN -> bool.
# HUGEINT/UHUGEINT/DECIMAL become float64/object and hash-mismatch a
# value-identical Spark int64/double column; FLOAT (float32) loses ulps.
_SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
               "VARCHAR", "TIMESTAMP", "DATE", "BOOLEAN"}


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_binds_to_safe_types(ddb: duckdb.DuckDBPyConnection, name, sql):
    rel = ddb.sql(sql)  # binding/planning only; no execution needed for types
    offenders = [
        f"{col}: {typ}"
        for col, typ in zip(rel.columns, (str(t) for t in rel.types))
        if str(typ) not in _SAFE_TYPES
    ]
    assert not offenders, (
        f"oracle '{name}' binds to cross-engine-unsafe column types "
        f"{offenders}; wrap the expression in CAST(... AS BIGINT) / "
        f"CAST(... AS DOUBLE) like the rest of the oracle corpus "
        f"(q12_shipmode bug class)"
    )
