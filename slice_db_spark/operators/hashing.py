"""Cross-engine deterministic hashing primitives.

Every fuzzy-dedup / LSH operator here derives its hash bits from md5 so the
DuckDB correctness oracles can compute bit-identical values: Spark's
``xxhash64``/``hash`` are engine-specific, but ``md5`` is standard.

``hash64(expr)`` = first 15 hex digits of md5 as a BIGINT (60 bits, always
positive, fits the signed range):

* Spark  : ``CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)``
* DuckDB : ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``

md5 runs JVM-side in whole-stage codegen — no Python in the path.  At
100 TB the md5 cost is real but scan-dominated; swapping to xxhash64 is a
one-line change once cross-engine verification is no longer needed.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: bits in hash64 output (15 hex digits)
HASH_BITS = 60


def hash64(col: Column | str) -> Column:
    """60-bit positive BIGINT hash of a string column (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`hash64` over ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash64_spark_sql(expr: str) -> str:
    """Spark SQL rendering of :func:`hash64` over ``expr`` (for F.expr
    contexts such as lambda bodies inside ``transform``)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
