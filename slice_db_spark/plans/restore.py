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

import os

from pyspark.sql import DataFrame

from ..config.graph import CycleError, topo_order
from ..config.model import SchemaConfig


def restore_order(schema: SchemaConfig, tables: list[str]) -> list[str]:
    """Write order for the given tables (parents first)."""
    return topo_order(schema, tables)


def restore_to_parquet(
    tables: dict[str, DataFrame],
    schema: SchemaConfig,
    out_dir: str,
    mode: str = "append",
) -> list[str]:
    """Materialize slice tables under ``out_dir/<table>`` in dependency
    order; returns the order used."""
    try:
        order = restore_order(schema, list(tables))
    except CycleError:
        # Parquet has no FK constraints — order is irrelevant for a file
        # sink, so a cyclic schema degrades to sorted order (the JDBC sink
        # would instead require the deferrable single-txn path).
        order = sorted(tables)
    for t in order:
        tables[t].write.mode(mode).parquet(os.path.join(out_dir, t.replace(".", "__")))
    return order


def restore_to_jdbc(
    tables: dict[str, DataFrame],
    schema: SchemaConfig,
    url: str,
    properties: dict | None = None,
) -> list[str]:
    """Append slice tables to a live database in FK order.  Raises
    CycleError for cyclic schemas (deferrable single-transaction restore
    needs a non-Spark writer; see module docstring)."""
    order = restore_order(schema, list(tables))  # CycleError propagates
    for t in order:
        name = schema.tables[t].name if t in schema.tables else t
        tables[t].write.jdbc(url=url, table=name, mode="append", properties=properties or {})
    return order
