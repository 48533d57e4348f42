"""Schema / transform configuration model.

The reference drives everything off an external JSON config describing the
table graph: tables (ordered column lists), FK references (multi-column,
directional), and sequences — see the reference's JSONSchema at
``schema/dump.yml`` and the loader at ``slice_db/formats/dump.py:20-74``.
We keep the same JSON shape (camelCase keys, ``schema.name`` table ids) so
reference configs port verbatim, with one engine-specific extension:

* ``idColumns`` per table — the reference identifies rows by PostgreSQL's
  physical ``ctid`` (``slice_db/pg/__init__.py:39-54``); Spark has no row
  identity, so each table must declare key columns (its PK).  When absent we
  fall back to the first column.

Directions (``slice_db/formats/dump.py:10-17``):
* ``forward``  — child row pulls its referenced parent row (FK → PK).
* ``reverse``  — parent row pulls all referencing child rows (PK → FK).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


FORWARD = "forward"
REVERSE = "reverse"


@dataclass
class Sequence:
    """A sequence.  The reference reads ``last_value`` from the live
    sequence (`slice_db/dump.py:227-257`); a parquet catalog has no
    sequence object, so the engine-specific ``table``/``column`` binding
    (optional, like ``idColumns``) lets dump compute it as ``max(column)``
    of the owning table (SURVEY §1.1)."""

    id: str
    schema: str = ""
    name: str = ""
    table: str = ""
    column: str = ""


@dataclass
class Table:
    id: str
    name: str
    schema: str = ""
    columns: list[str] = field(default_factory=list)
    id_columns: list[str] = field(default_factory=list)
    sequences: list[str] = field(default_factory=list)

    def keys(self) -> list[str]:
        """Row-identity columns (PK).  Parity caveat: the reference keys on
        physical ctid; we require declared keys and document that duplicate
        PKs break exact parity (SURVEY §7 hard parts)."""
        return self.id_columns or self.columns[:1]


@dataclass
class Reference:
    """A foreign-key edge: ``table.columns`` → ``reference_table.reference_columns``."""

    id: str
    table: str
    columns: list[str]
    reference_table: str
    reference_columns: list[str]
    directions: list[str] = field(default_factory=lambda: [FORWARD])


@dataclass
class Root:
    """A traversal seed: all rows of ``table`` matching the SQL ``condition``
    (full Spark SQL predicate grammar — supersets the reference's
    PostgreSQL-fragment roots, ``slice_db/cli/main.py:128-137``)."""

    table: str
    condition: str = "true"


@dataclass
class SchemaConfig:
    tables: dict[str, Table] = field(default_factory=dict)
    references: dict[str, Reference] = field(default_factory=dict)
    sequences: dict[str, Sequence] = field(default_factory=dict)

    # ------------------------------------------------------------------ json
    @classmethod
    def from_dict(cls, d: dict) -> "SchemaConfig":
        tables = {
            tid: Table(
                id=tid,
                name=t.get("name", tid.split(".")[-1]),
                schema=t.get("schema", tid.split(".")[0] if "." in tid else ""),
                columns=list(t.get("columns", [])),
                id_columns=list(t.get("idColumns", [])),
                sequences=list(t.get("sequences", [])),
            )
            for tid, t in d.get("tables", {}).items()
        }
        references = {
            rid: Reference(
                id=rid,
                table=r["table"],
                columns=list(r["columns"]),
                reference_table=r["referenceTable"],
                reference_columns=list(r["referenceColumns"]),
                directions=list(r.get("directions", [FORWARD])),
            )
            for rid, r in d.get("references", {}).items()
        }
        sequences = {
            sid: Sequence(
                id=sid,
                schema=s.get("schema", ""),
                name=s.get("name", ""),
                table=s.get("table", ""),
                column=s.get("column", ""),
            )
            for sid, s in d.get("sequences", {}).items()
        }
        return cls(tables=tables, references=references, sequences=sequences)

    def to_dict(self) -> dict:
        return {
            "tables": {
                t.id: {
                    "name": t.name,
                    "schema": t.schema,
                    "columns": t.columns,
                    **({"idColumns": t.id_columns} if t.id_columns else {}),
                    **({"sequences": t.sequences} if t.sequences else {}),
                }
                for t in self.tables.values()
            },
            "references": {
                r.id: {
                    "table": r.table,
                    "columns": r.columns,
                    "referenceTable": r.reference_table,
                    "referenceColumns": r.reference_columns,
                    "directions": r.directions,
                }
                for r in self.references.values()
            },
            "sequences": {
                s.id: {
                    "schema": s.schema,
                    "name": s.name,
                    **({"table": s.table} if s.table else {}),
                    **({"column": s.column} if s.column else {}),
                }
                for s in self.sequences.values()
            },
        }

    @classmethod
    def loads(cls, text: str) -> "SchemaConfig":
        return cls.from_dict(json.loads(text))

    def dumps(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    # ------------------------------------------------------------- validation
    def validate(self) -> None:
        for r in self.references.values():
            if r.table not in self.tables:
                raise ValueError(f"reference {r.id}: unknown table {r.table}")
            if r.reference_table not in self.tables:
                raise ValueError(f"reference {r.id}: unknown table {r.reference_table}")
            if len(r.columns) != len(r.reference_columns):
                raise ValueError(f"reference {r.id}: column arity mismatch")
            for d in r.directions:
                if d not in (FORWARD, REVERSE):
                    raise ValueError(f"reference {r.id}: bad direction {d}")


@dataclass
class TransformConfig:
    """Column → named-transform binding plus the named transform registry.

    Same JSON shape as the reference (``slice_db/formats/transform.py:11-35``):
    ``{"tables": {tid: {"columns": {col: name}}}, "transforms": {name:
    {"class": ..., "module": ..., "config": ...}}}``.
    """

    tables: dict[str, dict[str, str]] = field(default_factory=dict)  # tid -> col -> name
    transforms: dict[str, dict] = field(default_factory=dict)  # name -> spec

    @classmethod
    def from_dict(cls, d: dict) -> "TransformConfig":
        tables = {
            tid: dict(spec.get("columns", {})) for tid, spec in d.get("tables", {}).items()
        }
        return cls(tables=tables, transforms=dict(d.get("transforms", {})))

    @classmethod
    def loads(cls, text: str) -> "TransformConfig":
        return cls.from_dict(json.loads(text))
