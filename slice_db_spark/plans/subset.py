"""Referentially-closed subsetting ("slice capture") as iterative semi-joins.

Reference semantics (rivethealth/slice-db): starting from root rows matching
a SQL predicate, walk the FK graph — forward (child pulls its referenced
parent) and reverse (parent pulls all referencing children) — collecting row
identities until a fixed point, then export exactly those rows
(`slice_db/dump.py:75-174`, `slice_db/dump_temp_table.py:44-124`).  A row
discovered through an edge does **not** traverse the inverse direction of
that same edge (`slice_db/dump_temp_table.py:75-86`): a parent pulled in
only to satisfy a child's FK does not fan out to all its other children.
The reference runs this as recursive per-segment tasks issuing SQL to
PostgreSQL, with a driver-side sorted-array visited set
(`slice_db/collection/set.py:7-25`).

Spark-first re-design (NOT a translation):

* One BFS **round = one batch of Spark jobs**.  Each FK edge with a
  non-empty frontier becomes a ``left_semi`` join (discovery) followed by a
  ``left_anti`` join against the visited-key DataFrame (the reference's
  IntSet dedup, distributed).
* The no-backtrack rule is tracked per *arrival group*: each table's
  frontier is a set of (keys, blocked-edge) groups, where blocked-edge is
  the inverse of the edge the keys arrived through.  An edge traverses the
  union of the groups it is not blocked for.  Round-synchronous BFS makes
  this deterministic (the reference's task ordering is scheduler-dependent
  in multi-path graphs; ours is not — keys discovered by several edges in
  the same round expand under the union of their allowances).
* Frontiers and visited sets hold **key columns only** (narrow rows); full
  rows are re-attached by one semi-join at export (the reference similarly
  re-fetches rows by ctid, `slice_db/dump_temp_table.py:170-186`).
* Small frontiers are **broadcast** — the analog of the reference loading
  frontier ids into an ANALYZEd temp table so the PG planner joins well
  (`slice_db/dump_temp_table.py:234-250`); large ones go through AQE.
* ``localCheckpoint`` every few rounds truncates iterative lineage.

Scale notes (100 TB, 1000 executors): per-round cost is bounded by frontier
size, not table size, whenever frontiers broadcast; visited sets are pure
key columns and can persist ``DISK_ONLY``.  Termination needs one count per
new frontier group per round — the same action that decides broadcast
eligibility.  Edge processing is ordered by destination-table size
ascending, the reference's heuristic (`slice_db/dump_temp_table.py:110-117`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ..config.model import FORWARD, REVERSE, Root, SchemaConfig

# Below this many frontier rows the discovery semi-join broadcasts the
# frontier side (no shuffle of the big table).
BROADCAST_ROWS = 2_000_000
CHECKPOINT_EVERY = 5


@dataclass
class SubsetResult:
    """Outcome of a traversal: per-table distinct key DataFrames + stats."""

    keys: dict[str, DataFrame]
    rounds: int = 0
    row_counts: dict[str, int] = field(default_factory=dict)
    history: list[dict] = field(default_factory=list)


@dataclass
class _Group:
    """A frontier slice of one table: keys that arrived the same way.

    ``blocked`` is the (reference-id, direction) traversal these keys must
    not take — the inverse of their arrival edge (None for roots).
    """

    keys: DataFrame
    blocked: tuple[str, str] | None
    count: int


def _inverse(direction: str) -> str:
    return REVERSE if direction == FORWARD else FORWARD


class Subsetter:
    def __init__(
        self,
        spark: SparkSession,
        catalog: dict[str, DataFrame],
        schema: SchemaConfig,
        broadcast_rows: int = BROADCAST_ROWS,
        checkpoint_every: int = CHECKPOINT_EVERY,
        max_rounds: int = 200,
    ):
        schema.validate()
        self.spark = spark
        self.catalog = catalog
        self.schema = schema
        self.broadcast_rows = broadcast_rows
        self.checkpoint_every = checkpoint_every
        self.max_rounds = max_rounds

    # ------------------------------------------------------------------ util
    def _keys(self, table: str) -> list[str]:
        return self.schema.tables[table].keys()

    def _dst(self, rid: str, direction: str) -> str:
        r = self.schema.references[rid]
        return r.reference_table if direction == FORWARD else r.table

    def _maybe_broadcast(self, df: DataFrame, n: int) -> DataFrame:
        return F.broadcast(df) if n <= self.broadcast_rows else df

    # ------------------------------------------------------------------ run
    def run(self, roots: list[Root]) -> SubsetResult:
        visited: dict[str, DataFrame] = {}
        frontier: dict[str, list[_Group]] = {}
        history: list[dict] = []

        # Seed: union of root predicate scans per table (reference: multiple
        # --root args share one visited set, slice_db/dump.py:84-91).
        seeds: dict[str, DataFrame] = {}
        for root in roots:
            df = self.catalog[root.table]
            keys = df.where(F.expr(root.condition)).select(*self._keys(root.table)).distinct()
            seeds[root.table] = (
                seeds[root.table].union(keys).distinct() if root.table in seeds else keys
            )
        for t, keys in seeds.items():
            keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
            n = keys.count()
            if n == 0:
                keys.unpersist()
                continue
            frontier[t] = [_Group(keys, None, n)]
            visited[t] = keys

        rounds = 0
        while frontier and rounds < self.max_rounds:
            rounds += 1
            # (rid, direction, src) for every traversable edge this round,
            # ordered by destination-table size ascending (reference
            # heuristic: cheap edges first).
            plan: list[tuple[str, str, str]] = []
            for r in self.schema.references.values():
                for d in r.directions:
                    src = r.table if d == FORWARD else r.reference_table
                    if src in frontier and self._dst(r.id, d) in self.catalog:
                        plan.append((r.id, d, src))
            # Deterministic edge order; the reference sorts by destination
            # row-count stats (cheapest first) to shrink later frontiers —
            # in a synchronous round the order only affects job submission,
            # so we use a stable sort by destination name instead of paying
            # a count() per table.
            plan.sort(key=lambda e: (self._dst(e[0], e[1]), e[0], e[1]))

            # full-row re-attachment cache keyed by the participating groups
            rows_cache: dict[tuple, DataFrame] = {}
            # dst -> blocked-edge -> list of discovered-key DataFrames
            discovered: dict[str, dict[tuple[str, str], list[DataFrame]]] = {}

            for rid, d, src in plan:
                groups = [g for g in frontier[src] if g.blocked != (rid, d)]
                if not groups:
                    continue  # no-backtrack: every arrival blocks this edge
                r = self.schema.references[rid]
                dst = self._dst(rid, d)
                cache_key = (src, tuple(id(g) for g in groups))
                if cache_key not in rows_cache:
                    keys = groups[0].keys
                    for g in groups[1:]:
                        keys = keys.union(g.keys)
                    if len(groups) > 1:
                        keys = keys.distinct()
                    n = sum(g.count for g in groups)
                    rows_cache[cache_key] = self.catalog[src].join(
                        self._maybe_broadcast(keys, n), on=self._keys(src), how="left_semi"
                    )
                src_rows = rows_cache[cache_key]
                n_src = sum(g.count for g in groups)

                if d == FORWARD:
                    # child frontier pulls parents: dst.ref_cols == src.cols
                    out_cols, dst_cols = r.columns, r.reference_columns
                else:
                    # parent frontier pulls children: dst.cols == src.ref_cols
                    out_cols, dst_cols = r.reference_columns, r.columns
                src_side = src_rows.select(
                    *[F.col(c).alias(f"__k{i}") for i, c in enumerate(out_cols)]
                ).distinct()
                cond = [F.col(c) == F.col(f"__k{i}") for i, c in enumerate(dst_cols)]
                found = (
                    self.catalog[dst]
                    .join(self._maybe_broadcast(src_side, n_src), on=cond, how="left_semi")
                    .select(*self._keys(dst))
                )
                if dst in visited:
                    found = found.join(visited[dst], on=self._keys(dst), how="left_anti")
                discovered.setdefault(dst, {}).setdefault((rid, _inverse(d)), []).append(found)

            # Merge discoveries → next frontier groups; update visited sets.
            next_frontier: dict[str, list[_Group]] = {}
            round_new: dict[str, int] = {}
            for dst, by_block in discovered.items():
                new_groups: list[_Group] = []
                for blocked, parts in by_block.items():
                    new = parts[0]
                    for p in parts[1:]:
                        new = new.union(p)
                    new = new.distinct().persist(StorageLevel.MEMORY_AND_DISK)
                    if rounds % self.checkpoint_every == 0:
                        new = new.localCheckpoint(eager=True)
                    n = new.count()
                    if n == 0:
                        new.unpersist()
                        continue
                    new_groups.append(_Group(new, blocked, n))
                if not new_groups:
                    continue
                next_frontier[dst] = new_groups
                all_new = new_groups[0].keys
                for g in new_groups[1:]:
                    all_new = all_new.union(g.keys)
                if len(new_groups) > 1:
                    all_new = all_new.distinct()
                round_new[dst] = sum(g.count for g in new_groups)
                prev = visited.get(dst)
                merged = (prev.union(all_new).distinct() if prev is not None else all_new).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                if rounds % self.checkpoint_every == 0:
                    merged = merged.localCheckpoint(eager=True)
                visited[dst] = merged

            history.append({"round": rounds, "new": round_new})
            for t, groups in frontier.items():
                for g in groups:
                    if g.keys is not visited.get(t):
                        g.keys.unpersist()
            frontier = next_frontier

        row_counts = {t: v.count() for t, v in visited.items()}
        return SubsetResult(keys=visited, rounds=rounds, row_counts=row_counts, history=history)

    # ---------------------------------------------------------------- export
    def export(self, result: SubsetResult) -> dict[str, DataFrame]:
        """Full rows for every table in the slice — one semi-join per table
        (the reference's row re-fetch by id, `slice_db/dump_temp_table.py:170-186`)."""
        out = {}
        for t, keys in result.keys.items():
            k = self._maybe_broadcast(keys, result.row_counts.get(t, 0))
            out[t] = self.catalog[t].join(k, on=self._keys(t), how="left_semi")
        return out

    def closure_keys(self, result: SubsetResult, key_exprs: dict[str, str]) -> DataFrame:
        """Flatten the closure to a (tbl, key) DataFrame for auditing/oracle
        comparison.  ``key_exprs[t]`` is a SQL expression over t's columns
        producing a single BIGINT surrogate (e.g. composite-key packing)."""
        if not result.keys:
            return self.spark.createDataFrame([], "tbl string, key bigint")
        parts = []
        for t, keys in sorted(result.keys.items()):
            parts.append(
                keys.select(
                    F.lit(t).alias("tbl"),
                    F.expr(key_exprs.get(t, self._keys(t)[0])).cast("bigint").alias("key"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.union(p)
        return df
