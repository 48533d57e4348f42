"""Dependency-ordered materialization ("restore") of a slice.

Reference semantics: restore tables so that FK targets are written before
their referents; cycles are only legal when a deferrable constraint lets a
single transaction defer checks (`slice_db/restore.py:128-161`,
`README.md:145-158`).

Spark mapping: topological order is metadata work on the driver
(``config.graph.topo_order``); each table write is a Spark job.  Sinks:

* parquet (default here — cluster-native restore target),
* JDBC (``df.write.jdbc(mode="append")``) when a live database URL is given;
  cyclic schemas with deferrable constraints need a single-connection
  transactional writer, which is outside Spark's parallel JDBC writer model
  — we surface that case as an explicit error instead of corrupting state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from ..config.graph import CycleError, topo_order
from ..config.model import SchemaConfig

SEQUENCES_FILE = "_sequences.json"


def restore_order(schema: SchemaConfig, tables: list[str]) -> list[str]:
    """Write order for the given tables (parents first)."""
    return topo_order(schema, tables)


def capture_sequences(
    tables: dict[str, DataFrame], schema: SchemaConfig
) -> dict[str, int]:
    """last_value per configured sequence with a table/column binding
    (S4: the parquet analog of ``SELECT last_value FROM seq``,
    `slice_db/dump.py:227-257`) — computed over the SLICED rows, one
    combined aggregate job per owning table."""
    by_table: dict[str, list] = {}
    for sid, s in schema.sequences.items():
        if s.table and s.column and s.table in tables:
            by_table.setdefault(s.table, []).append(sid)
    out: dict[str, int] = {}
    for t, sids in by_table.items():
        row = tables[t].agg(
            *[F.max(schema.sequences[sid].column).alias(sid) for sid in sids]
        ).first()
        for sid in sids:
            if row[sid] is not None:
                out[sid] = int(row[sid])
    return out


def restore_sequences(out_dir: str, sequences: dict[str, int]) -> dict[str, int]:
    """Apply sequence values to a parquet target dir with the reference's
    monotonic-max semantics — setval only when greater
    (`slice_db/restore.py:100-115`, `slice_db/sql.py:44`).  Values live in
    ``_sequences.json``; returns the merged state."""
    path = os.path.join(out_dir, SEQUENCES_FILE)
    state: dict[str, int] = {}
    if os.path.exists(path):
        with open(path) as f:
            state = {k: int(v) for k, v in json.load(f).items()}
    for sid, value in sequences.items():
        if state.get(sid, -(1 << 63)) < int(value):
            state[sid] = int(value)
    if state:
        os.makedirs(out_dir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
    return state


def restore_to_parquet(
    tables: dict[str, DataFrame],
    schema: SchemaConfig,
    out_dir: str,
    mode: str = "append",
    sequences: dict[str, int] | None = None,
) -> list[str]:
    """Materialize slice tables under ``out_dir/<table>`` in dependency
    order; returns the order used.  ``sequences`` (id → last_value) are
    merged into the target's ``_sequences.json`` with monotonic-max
    semantics."""
    try:
        order = restore_order(schema, list(tables))
    except CycleError:
        # Parquet has no FK constraints — order is irrelevant for a file
        # sink, so a cyclic schema degrades to sorted order (the JDBC sink
        # would instead require the deferrable single-txn path).
        order = sorted(tables)
    for t in order:
        tables[t].write.mode(mode).parquet(os.path.join(out_dir, t.replace(".", "__")))
    if sequences:
        restore_sequences(out_dir, sequences)
    return order


def restore_to_jdbc(
    tables: dict[str, DataFrame],
    schema: SchemaConfig,
    url: str,
    properties: dict | None = None,
) -> list[str]:
    """Append slice tables to a live database in FK order (parallel Spark
    JDBC writers — the fast path for acyclic schemas).  Raises CycleError
    for cyclic schemas: no write order satisfies the constraints, use
    :func:`restore_to_jdbc_deferred`."""
    order = restore_order(schema, list(tables))  # CycleError propagates
    for t in order:
        name = schema.tables[t].name if t in schema.tables else t
        tables[t].write.jdbc(url=url, table=name, mode="append", properties=properties or {})
    return order


def restore_to_jdbc_deferred(
    tables: dict[str, DataFrame],
    schema: SchemaConfig,
    url: str,
    batch_size: int = 1000,
) -> list[str]:
    """Single-transaction restore with ``SET CONSTRAINTS ALL DEFERRED`` —
    the reference's cyclic-FK path (`slice_db/restore.py:131-161`,
    README.md:147-155): a cycle is only restorable when constraint checks
    defer to COMMIT, which requires ONE connection and one transaction.

    Inherently serial, so this is a driver-side writer by design (same
    argument as the SQL-script sink): rows stream via ``toLocalIterator``
    (one partition in flight) into JDBC prepared-statement batches on a
    single JVM connection.  Use :func:`restore_to_jdbc` for acyclic
    schemas — it parallelizes per table."""
    try:
        order = restore_order(schema, list(tables))
    except CycleError:
        order = sorted(tables)  # deferral makes any order legal

    spark = next(iter(tables.values())).sparkSession
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        st.execute("SET CONSTRAINTS ALL DEFERRED")
        st.close()
        for t in order:
            meta = schema.tables.get(t)
            name = meta.name if meta else t
            qual = f'"{meta.schema}"."{name}"' if meta and meta.schema else f'"{name}"'
            df = tables[t]
            cols = df.columns
            sql = (
                f"INSERT INTO {qual} ({', '.join(chr(34) + c + chr(34) for c in cols)}) "
                f"VALUES ({', '.join(['?'] * len(cols))})"
            )
            ps = conn.prepareStatement(sql)
            pending = 0
            for row in df.toLocalIterator():
                for i, c in enumerate(cols):
                    ps.setObject(i + 1, row[c])
                ps.addBatch()
                pending += 1
                if pending >= batch_size:
                    ps.executeBatch()
                    pending = 0
            if pending:
                ps.executeBatch()
            ps.close()
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
    return order
