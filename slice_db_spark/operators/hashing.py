"""Cross-engine deterministic hashing primitives.

Every fuzzy-dedup / LSH operator here derives its hash bits from md5 so the
DuckDB correctness oracles can compute bit-identical values: Spark's
``xxhash64``/``hash`` are engine-specific, but ``md5`` is standard.

``hash64(expr)`` = first 15 hex digits of md5 as a BIGINT (60 bits, always
positive, fits the signed range):

* Spark  : ``CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)``
* DuckDB : ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``

md5 runs JVM-side in whole-stage codegen — no Python in the path.  At
100 TB the md5 cost is real but scan-dominated (measured at sf0.1:
minhash-LSH end-to-end is within noise of xxhash64); set
``SLICE_FAST_HASH=1`` to switch every operator to xxhash64 once
cross-engine verification is no longer needed — the operators are
hash-agnostic (tested), only the DuckDB oracles pin md5.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, functions as F

#: bits in hash64 output (15 hex digits)
HASH_BITS = 60


def fast_hash_enabled() -> bool:
    """``SLICE_FAST_HASH=1`` swaps every operator hash to ``xxhash64``
    (JVM-native, no hex round-trip) — the production setting once
    cross-engine verification is no longer needed.  Default off: the
    DuckDB oracles can only reproduce the md5 form, so the correctness
    gate and the oracle-gated tests require the default."""
    return os.environ.get("SLICE_FAST_HASH", "") == "1"


def hash64(col: Column | str) -> Column:
    """60-bit positive BIGINT hash of a string column (md5-derived by
    default; ``SLICE_FAST_HASH=1`` switches to 63-bit xxhash64 — every
    operator built on this is hash-algorithm-agnostic, only the
    cross-engine oracles pin md5)."""
    c = F.col(col) if isinstance(col, str) else col
    if fast_hash_enabled():
        # sign-bit clear keeps the positive-BIGINT contract
        return F.xxhash64(c).bitwiseAND(F.lit((1 << 63) - 1))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_hi(col: Column | str) -> Column:
    """The SECOND 60-bit half of the md5 (hex digits 16-30) — paired
    with :func:`hash64` it forms a 120-bit key whose birthday horizon
    (~2⁶⁰ keys) covers any real corpus, for callers that opted into the
    wide-hash mode (the span index's ``wide_hash=True``).  Under
    ``SLICE_FAST_HASH=1`` the second half is an independent xxhash64 of
    the salted input (the oracles only pin the md5 form).

    * Spark  : ``CAST(conv(substr(md5(s), 16, 15), 16, 10) AS BIGINT)``
    * DuckDB : ``CAST(('0x' || substr(md5(s), 16, 15)) AS BIGINT)``"""
    c = F.col(col) if isinstance(col, str) else col
    if fast_hash_enabled():
        return F.xxhash64(F.concat(c, F.lit("\x01hi"))).bitwiseAND(
            F.lit((1 << 63) - 1)
        )
    return F.conv(F.substring(F.md5(c), 16, 15), 16, 10).cast("bigint")


def hash64_hi_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`hash64_hi` over ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 16, 15)) AS BIGINT)"


def hash64_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`hash64` over ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash64_spark_sql(expr: str) -> str:
    """Spark SQL rendering of :func:`hash64` over ``expr`` (for F.expr
    contexts such as lambda bodies inside ``transform``)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
