"""DDL passthrough (S5): schema sections stored in and replayed from a slice.

The reference shells out to ``pg_dump --section pre-data/post-data``
(`slice_db/dump.py:330-348`), splits the output into statements
(`slice_db/pg/token.py:15-81`) and stores ``pre-data/{i}.sql`` /
``post-data/{i}.sql`` entries (`slice_db/slice.py:20-22,69-105`); restore
replays pre-data before rows and post-data after
(`slice_db/restore.py:69-75,91-97`).

Spark re-basing, two DDL sources:

* :func:`parse_statements` — the same statement-splitter contract for text
  produced by ``pg_dump`` (reachable live databases; the reference passes
  ``--disable-dollar-quoting`` so ``$$`` bodies never appear, and neither
  splitter handles them).
* :func:`synthesize_ddl` — this environment has no live PostgreSQL, so a
  slice can also carry sections synthesized from the schema config + the
  DataFrames' Catalyst types: pre-data = ``CREATE SCHEMA`` / ``CREATE
  SEQUENCE`` / ``CREATE TABLE`` (primary key inline), post-data =
  ``ALTER TABLE … ADD FOREIGN KEY`` in reference-config edge order.  The
  section *shape* (counts, file layout, replay order) matches the
  reference exactly; the statement text is engine-derived.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, types as T

from ..config.model import SchemaConfig


# ------------------------------------------------------------ splitter


def parse_statements(text: str) -> Iterator[str]:
    """Split SQL text into ``;``-terminated statements.

    Same contract as the reference splitter (`slice_db/pg/token.py:15-81`):
    ``--`` comments run to end of line, single-quoted strings treat ``''``
    as an escaped quote, double-quoted identifiers hide any ``;`` inside,
    and the trailing fragment after the final ``;`` is yielded too (the
    reference drops it — use :func:`split_statements` for that).  Raises
    ``ValueError`` on unterminated strings/identifiers.
    """
    n = len(text)
    start = 0
    i = 0
    while i < n:
        c = text[i]
        if c == "-" and i + 1 < n and text[i + 1] == "-":
            nl = text.find("\n", i + 2)
            i = n if nl == -1 else nl + 1
        elif c == "'":
            j = i + 1
            while True:
                j = text.find("'", j)
                if j == -1:
                    raise ValueError("unterminated string literal")
                if j + 1 < n and text[j + 1] == "'":
                    j += 2  # '' escape: still inside the literal
                else:
                    break
            i = j + 1
        elif c == '"':
            j = text.find('"', i + 1)
            if j == -1:
                raise ValueError("unterminated quoted identifier")
            i = j + 1
        elif c == ";":
            yield text[start:i]
            i += 1
            start = i
        else:
            i += 1
    if start < n:
        yield text[start:]


def _has_sql(segment: str) -> bool:
    return any(
        line.strip() and not line.strip().startswith("--") for line in segment.splitlines()
    )


def split_statements(text: str) -> list[str]:
    """Executable statements of ``text``: split, stripped, whitespace- and
    comment-only segments dropped (the reference equivalently discards the
    post-final-``;`` fragment, `slice_db/dump.py:453`)."""
    return [seg.strip() for seg in parse_statements(text) if _has_sql(seg)]


# ------------------------------------------------------------ live pg_dump


def jdbc_to_libpq(url: str) -> str:
    """JDBC URL → libpq connection URI: strip the ``jdbc:`` prefix
    (``jdbc:postgresql://h:p/db?user=u&password=w`` becomes
    ``postgresql://h:p/db?user=u&password=w`` — libpq URIs accept
    user/password as query parameters).  Non-JDBC strings pass through so
    callers may hand a libpq URI or DSN directly."""
    return url[len("jdbc:"):] if url.startswith("jdbc:") else url


def pg_dump_sections(
    url: str, pg_dump_bin: str | None = None
) -> tuple[list[str], list[str]]:
    """(pre_data, post_data) statements from a LIVE database via
    ``pg_dump`` — the reference's DDL source (`slice_db/dump.py:330-348`),
    with its exact flags: ``-BO --disable-dollar-quoting --no-acl
    --quote-all-identifiers --section <section>``
    (``--disable-dollar-quoting`` is what makes the output splittable by
    :func:`parse_statements` — neither splitter handles ``$$`` bodies).
    Unlike :func:`synthesize_ddl`, the sections carry everything pg_dump
    knows: indexes, defaults, NOT NULL, and non-FK constraints.

    Raises ``RuntimeError`` when ``pg_dump`` is not on PATH or exits
    non-zero."""
    import shutil
    import subprocess

    exe = pg_dump_bin or shutil.which("pg_dump")
    if exe is None:
        raise RuntimeError(
            "pg_dump not found on PATH; use synthesize_ddl or install postgresql-client"
        )
    sections: list[list[str]] = []
    for section in ("pre-data", "post-data"):
        try:
            proc = _run_pg_dump(subprocess, exe, section, url)
        except FileNotFoundError as e:
            raise RuntimeError(f"pg_dump not found: {exe}") from e
        if proc.returncode:
            raise RuntimeError(
                f"pg_dump --section {section} exited {proc.returncode}: "
                f"{proc.stderr.strip()[:500]}"
            )
        sections.append(split_statements(proc.stdout))
    return sections[0], sections[1]


def _run_pg_dump(subprocess, exe: str, section: str, url: str):
    return subprocess.run(
            [
                exe,
                "-BO",
                "--disable-dollar-quoting",
                "--no-acl",
                "--quote-all-identifiers",
                "--section",
                section,
                "--dbname",
                jdbc_to_libpq(url),
            ],
            capture_output=True,
            text=True,
        )


# ------------------------------------------------------------ synthesis


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _qualified(schema: str, name: str) -> str:
    return f"{_ident(schema)}.{_ident(name)}" if schema else _ident(name)


def sql_type(dt: T.DataType) -> str:
    """Catalyst type → ANSI/PostgreSQL column type."""
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "INTEGER"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE PRECISION"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision}, {dt.scale})"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    if isinstance(dt, T.ArrayType):
        return sql_type(dt.elementType) + "[]"
    return "TEXT"


def synthesize_ddl(
    schema: SchemaConfig, frames: dict[str, DataFrame]
) -> tuple[list[str], list[str]]:
    """(pre_data, post_data) statement lists for the configured tables
    present in ``frames``.

    pre-data: ``CREATE SCHEMA IF NOT EXISTS`` (distinct, sorted), every
    ``CREATE SEQUENCE``, then ``CREATE TABLE`` per table in config order
    with column types from the DataFrame schema and the declared id
    columns as an inline PRIMARY KEY.  post-data: one ``ALTER TABLE … ADD
    FOREIGN KEY`` per reference edge.  (pg_dump puts PK constraints in
    post-data; inline PKs keep the pre-data section self-sufficient for
    engines without ``ALTER … ADD PRIMARY KEY`` — the section replay
    order, which is what restore parity needs, is unchanged.)
    """
    pre: list[str] = []
    post: list[str] = []
    schemas = sorted(
        {t.schema for t in schema.tables.values() if t.schema}
        | {s.schema for s in schema.sequences.values() if s.schema}
    )
    for s in schemas:
        pre.append(f"CREATE SCHEMA IF NOT EXISTS {_ident(s)}")
    for sid in sorted(schema.sequences):
        s = schema.sequences[sid]
        pre.append(f"CREATE SEQUENCE {_qualified(s.schema, s.name or sid)}")
    for tid, t in schema.tables.items():
        if tid not in frames:
            continue
        df = frames[tid]
        spark_types = {f.name: f.dataType for f in df.schema.fields}
        cols = t.columns or df.columns
        defs = [f"{_ident(c)} {sql_type(spark_types.get(c, T.StringType()))}" for c in cols]
        if t.id_columns:
            defs.append(f"PRIMARY KEY ({', '.join(_ident(c) for c in t.id_columns)})")
        pre.append(
            f"CREATE TABLE {_qualified(t.schema, t.name)} (\n  " + ",\n  ".join(defs) + "\n)"
        )
    for rid, r in schema.references.items():
        if r.table not in frames or r.reference_table not in frames:
            continue
        src = schema.tables[r.table]
        dst = schema.tables[r.reference_table]
        post.append(
            f"ALTER TABLE {_qualified(src.schema, src.name)} "
            f"ADD CONSTRAINT {_ident(rid)} "
            f"FOREIGN KEY ({', '.join(_ident(c) for c in r.columns)}) "
            f"REFERENCES {_qualified(dst.schema, dst.name)} "
            f"({', '.join(_ident(c) for c in r.reference_columns)})"
        )
    return pre, post
