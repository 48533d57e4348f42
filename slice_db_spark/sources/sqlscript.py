"""SQL-script sink: one executable ``.sql`` of COPY blocks + setval calls.

Reference: ``slicedb dump --sql`` emits ``COPY t (cols) FROM stdin;`` blocks
terminated by ``\\.`` plus ``SELECT pg_catalog.setval(...)`` statements
(`slice_db/sql.py:10-47`, `slice_db/dump.py:302-327`).  Restore is then a
plain ``psql < slice.sql``.

Spark shape: rows are COPY-escaped and TSV-joined JVM-side (same codec as
the TSV slice sink), streamed to the driver with ``toLocalIterator`` —
bounded driver memory, one partition in flight — and appended under each
table's COPY header in FK-topological order.  A SQL script is an
inherently serial artifact, so a driver-side writer is the honest plan;
at cluster scale you'd emit per-table TSV segments in parallel (the slice
sink) and only assemble the script shell here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config.graph import CycleError, topo_order
from ..config.model import SchemaConfig
from .slice import copy_escape


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _qualified(schema: str, name: str) -> str:
    return f"{_ident(schema)}.{_ident(name)}" if schema else _ident(name)


def write_sql_script(
    tables: dict[str, DataFrame],
    schema: SchemaConfig,
    path: str,
    sequences: dict[str, int] | None = None,
    defer_constraints: bool = False,
    pre_data: list[str] | None = None,
    post_data: list[str] | None = None,
) -> list[str]:
    """Write an executable SQL script restoring the slice; returns the
    table order used.  ``defer_constraints`` wraps the script in a
    transaction with ``SET CONSTRAINTS ALL DEFERRED`` — the reference's
    cyclic-FK escape hatch (`slice_db/restore.py:131-142`), and the only
    legal order for cyclic schemas.  ``pre_data``/``post_data`` DDL
    statements (S5) replay around the rows exactly as the reference's
    include-schema restore does (`slice_db/restore.py:69-75,91-97`) —
    with both provided the script restores into an EMPTY database."""
    try:
        order = topo_order(schema, list(tables))
    except CycleError:
        if not defer_constraints:
            raise
        order = sorted(tables)

    with open(path, "w") as out:
        for stmt in pre_data or ():
            out.write(stmt.rstrip().rstrip(";") + ";\n")
        if defer_constraints:
            out.write("BEGIN;\nSET CONSTRAINTS ALL DEFERRED;\n")
        for tid in order:
            df = tables[tid]
            t = schema.tables.get(tid)
            cols = t.columns if t and t.columns else df.columns
            target = _qualified(t.schema if t else "", t.name if t else tid)
            out.write(f"COPY {target} ({', '.join(_ident(c) for c in cols)}) FROM stdin;\n")
            line = F.concat_ws("\t", *[copy_escape(F.col(c).cast("string")) for c in cols])
            for row in df.select(line.alias("v")).toLocalIterator():
                out.write(row["v"])
                out.write("\n")
            out.write("\\.\n")
        for sid, value in (sequences or {}).items():
            s = schema.sequences.get(sid)
            target = _qualified(s.schema if s else "", s.name if s else sid)
            # monotonic-max semantics (reference `slice_db/sql.py:44`,
            # `slice_db/restore.py:107-115`)
            out.write(
                f"SELECT pg_catalog.setval('{target}', {int(value)}) "
                f"WHERE (SELECT last_value FROM {target}) < {int(value)};\n"
            )
        if defer_constraints:
            out.write("COMMIT;\n")
        for stmt in post_data or ():
            out.write(stmt.rstrip().rstrip(";") + ";\n")
    return order
