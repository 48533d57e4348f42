"""Driver-side graph utilities over the schema config.

The table graph is metadata (hundreds of nodes at most), so these run as
plain Python on the driver — matching the reference's design where graph
logic (`slice_db/graph/__init__.py:10-48`, `slice_db/cli/schema_filter.py`)
is separate from the data plane.
"""

from __future__ import annotations

from .model import FORWARD, REVERSE, Reference, SchemaConfig


class CycleError(ValueError):
    def __init__(self, path: list[str]):
        super().__init__(f"cycle: {' -> '.join(path)}")
        self.path = path


def check_cycles(schema: SchemaConfig, raise_on_cycle: bool = True) -> list[str] | None:
    """Detect a cycle in the FK dependency graph (edges child → parent).

    Parity: reference DFS cycle check ``slice_db/graph/__init__.py:10-48``.
    Returns the cycle path, or None.  Self-loops count.
    """
    adj: dict[str, list[str]] = {t: [] for t in schema.tables}
    for r in schema.references.values():
        adj.setdefault(r.table, []).append(r.reference_table)

    WHITE, GRAY, BLACK = 0, 1, 2
    color = {t: WHITE for t in adj}
    stack: list[str] = []

    def dfs(u: str) -> list[str] | None:
        color[u] = GRAY
        stack.append(u)
        for v in adj.get(u, ()):
            if color.get(v) == GRAY:
                return stack[stack.index(v) :] + [v]
            if color.get(v, BLACK) == WHITE:
                found = dfs(v)
                if found:
                    return found
        stack.pop()
        color[u] = BLACK
        return None

    for t in list(adj):
        if color[t] == WHITE:
            cyc = dfs(t)
            if cyc:
                if raise_on_cycle:
                    raise CycleError(cyc)
                return cyc
    return None


def descendants(schema: SchemaConfig, roots: list[str]) -> set[str]:
    """Closure of tables reachable from ``roots`` via reverse edges
    (parent → children)."""
    children: dict[str, set[str]] = {}
    for r in schema.references.values():
        children.setdefault(r.reference_table, set()).add(r.table)
    seen = set(roots)
    frontier = list(roots)
    while frontier:
        t = frontier.pop()
        for c in children.get(t, ()):
            if c not in seen:
                seen.add(c)
                frontier.append(c)
    return seen


def filter_children(schema: SchemaConfig, roots: list[str]) -> SchemaConfig:
    """``schema-filter children`` semantics: keep REVERSE direction only on
    edges whose child table lies inside the descendant closure of ``roots``
    — prevents the traversal from fanning out of the subtree.

    Parity: ``slice_db/cli/schema_filter.py:19-44``.
    """
    keep = descendants(schema, roots)
    new_refs: dict[str, Reference] = {}
    for rid, r in schema.references.items():
        dirs = list(r.directions)
        if REVERSE in dirs and r.table not in keep:
            dirs = [d for d in dirs if d != REVERSE]
        new_refs[rid] = Reference(
            id=r.id,
            table=r.table,
            columns=list(r.columns),
            reference_table=r.reference_table,
            reference_columns=list(r.reference_columns),
            directions=dirs or [FORWARD],
        )
    return SchemaConfig(tables=schema.tables, references=new_refs, sequences=schema.sequences)


def topo_levels(schema: SchemaConfig, tables: list[str] | None = None) -> list[list[str]]:
    """Dependency levels for parallel restore: every table in level k
    depends only on tables in levels < k, so tables WITHIN a level can be
    written concurrently (the reference's ``restore --jobs`` semantics:
    its task graph releases a table when its referenced tables finish,
    `slice_db/restore.py:144-161`; level-synchronous release is the
    round-based reading of the same dependency order).  Kahn's algorithm
    by frontier; deterministic (sorted) within each level; cycles raise.
    """
    nodes = set(tables if tables is not None else schema.tables)
    deps: dict[str, set[str]] = {t: set() for t in nodes}
    for r in schema.references.values():
        if r.table in nodes and r.reference_table in nodes and r.table != r.reference_table:
            deps[r.table].add(r.reference_table)
    levels: list[list[str]] = []
    while deps:
        ready = sorted(t for t, d in deps.items() if not d)
        if not ready:
            raise CycleError(sorted(deps))
        levels.append(ready)
        for t in ready:
            del deps[t]
        for d in deps.values():
            d.difference_update(ready)
    return levels


def topo_order(schema: SchemaConfig, tables: list[str] | None = None) -> list[str]:
    """Restore order: referenced (parent) tables before referencing (child)
    tables, so FK constraints hold during append.  Kahn's algorithm;
    deterministic (sorted) tie-breaking.  Cycles raise — the caller decides
    whether a deferrable-constraint path applies (reference:
    ``slice_db/restore.py:131-161``).
    """
    nodes = set(tables if tables is not None else schema.tables)
    deps: dict[str, set[str]] = {t: set() for t in nodes}
    for r in schema.references.values():
        if r.table in nodes and r.reference_table in nodes and r.table != r.reference_table:
            deps[r.table].add(r.reference_table)
    out: list[str] = []
    ready = sorted(t for t, d in deps.items() if not d)
    deps = {t: d for t, d in deps.items() if d}
    while ready:
        t = ready.pop(0)
        out.append(t)
        newly = []
        for u, d in list(deps.items()):
            d.discard(t)
            if not d:
                newly.append(u)
                del deps[u]
        ready = sorted(ready + newly)
    if deps:
        raise CycleError(sorted(deps))
    return out
