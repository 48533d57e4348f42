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
  non-empty frontier is a ``left_semi`` discovery join followed by a
  ``left_anti`` join against the visited-key DataFrame (the reference's
  IntSet dedup, distributed).
* Per table the frontier is ONE DataFrame of key columns plus a
  ``__blocked`` tag — the inverse of the edge each key arrived through
  (NULL for roots).  An edge expands every frontier row not blocked for it;
  keys discovered by several edges in one round carry several tags and
  expand under the union of their allowances (round-synchronous reading of
  the reference's scheduler-dependent ordering).
* Action budget: ONE persist+count per destination table per round (the
  count doubles as the termination check and the broadcast-size estimate).
  Catalyst sees everything else lazily — source-row re-attachment is one
  join per source table per round, shared by all its outgoing edges
  through the persisted-plan cache.
* Frontiers and visited sets hold **key columns only** (narrow rows); full
  rows re-attach by one semi-join at export (the reference similarly
  re-fetches rows by ctid, `slice_db/dump_temp_table.py:170-186`).
* Small frontiers are **broadcast** — the analog of the reference loading
  frontier ids into an ANALYZEd temp table so the PG planner joins well
  (`slice_db/dump_temp_table.py:234-250`); large ones go through AQE.
* ``localCheckpoint`` every few rounds truncates iterative lineage.

Scale notes (100 TB, 1000 executors): per-round cost is bounded by frontier
size whenever frontiers broadcast — the big-table side never shuffles, the
scan is pruned to key+FK columns by Catalyst.  Visited sets are pure key
columns (persist ``MEMORY_AND_DISK``); termination costs exactly one count
per active table per round.
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

_BLOCKED = "__blocked"


@dataclass
class SubsetResult:
    """Outcome of a traversal: per-table distinct key DataFrames + stats."""

    keys: dict[str, DataFrame]
    rounds: int = 0
    row_counts: dict[str, int] = field(default_factory=dict)
    history: list[dict] = field(default_factory=list)


def _inverse(direction: str) -> str:
    return REVERSE if direction == FORWARD else FORWARD


def _sig(rid: str, direction: str) -> str:
    return f"{rid}|{direction}"


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

    def _edge_plan(self) -> list[tuple[str, str, str, str]]:
        """(rid, direction, src, dst) for every configured traversal,
        deterministically ordered.  The reference orders edges by
        destination-table stats ascending (cheap edges first,
        `slice_db/dump_temp_table.py:110-117`); in a synchronous round
        order only affects job submission, so a stable name sort avoids
        paying a count per table."""
        plan = []
        for r in self.schema.references.values():
            for d in r.directions:
                src = r.table if d == FORWARD else r.reference_table
                dst = self._dst(r.id, d)
                if src in self.catalog and dst in self.catalog:
                    plan.append((r.id, d, src, dst))
        plan.sort(key=lambda e: (e[3], e[0], e[1]))
        return plan

    # ------------------------------------------------------------------ run
    def run(self, roots: list[Root]) -> SubsetResult:
        persisted: list[DataFrame] = []  # every intermediate cache, released at the end
        visited: dict[str, DataFrame] = {}
        # frontier[t]: DataFrame(keys..., __blocked) — distinct rows
        frontier: dict[str, DataFrame] = {}
        fsize: dict[str, int] = {}
        history: list[dict] = []
        plan = self._edge_plan()

        # Seed: union of root predicate scans per table (reference: multiple
        # --root args share one visited set, slice_db/dump.py:84-91).
        seeds: dict[str, DataFrame] = {}
        for root in roots:
            if root.table not in self.catalog:
                raise ValueError(
                    f"unknown root table {root.table!r}; catalog tables: {sorted(self.catalog)}"
                )
            df = self.catalog[root.table]
            keys = df.where(F.expr(root.condition)).select(*self._keys(root.table)).distinct()
            seeds[root.table] = (
                seeds[root.table].union(keys).distinct() if root.table in seeds else keys
            )
        for t, keys in seeds.items():
            keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(keys)
            n = keys.count()
            if n == 0:
                keys.unpersist()
                continue
            frontier[t] = keys.withColumn(_BLOCKED, F.lit(None).cast("string"))
            fsize[t] = n
            visited[t] = keys

        rounds = 0
        while frontier and rounds < self.max_rounds:
            rounds += 1

            # One source-row re-attachment join per active table, shared by
            # all its outgoing edges (lazy; materialized by the per-dst
            # actions below, reused through the persisted plan).
            src_rows: dict[str, DataFrame] = {}
            for t, keys_df in frontier.items():
                need = set(self._keys(t))
                for rid, d, src, _ in plan:
                    if src == t:
                        r = self.schema.references[rid]
                        need.update(r.columns if d == FORWARD else r.reference_columns)
                src_rows[t] = (
                    self.catalog[t]
                    .select(*sorted(need))
                    .join(self._maybe_broadcast(keys_df, fsize[t]), on=self._keys(t))
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                persisted.append(src_rows[t])

            # dst -> list of (tagged new-key DataFrames)
            discovered: dict[str, list[DataFrame]] = {}
            for rid, d, src, dst in plan:
                if src not in frontier:
                    continue
                r = self.schema.references[rid]
                out_cols = r.columns if d == FORWARD else r.reference_columns
                dst_cols = r.reference_columns if d == FORWARD else r.columns
                sig = _sig(rid, d)
                elig = src_rows[src].where(
                    F.col(_BLOCKED).isNull() | (F.col(_BLOCKED) != sig)
                )
                join_keys = elig.select(
                    *[F.col(c).alias(f"__k{i}") for i, c in enumerate(out_cols)]
                ).distinct()
                cond = [F.col(c) == F.col(f"__k{i}") for i, c in enumerate(dst_cols)]
                found = (
                    self.catalog[dst]
                    .join(self._maybe_broadcast(join_keys, fsize[src]), on=cond, how="left_semi")
                    .select(*self._keys(dst))
                )
                if dst in visited:
                    found = found.join(visited[dst], on=self._keys(dst), how="left_anti")
                discovered.setdefault(dst, []).append(
                    found.withColumn(_BLOCKED, F.lit(_sig(rid, _inverse(d))))
                )

            # Merge discoveries → candidate frontiers (persisted lazily),
            # then ONE union-count job materializes every candidate and
            # returns all sizes — termination + broadcast estimates for the
            # whole round in a single Spark action.
            candidates: dict[str, DataFrame] = {}
            for dst, parts in discovered.items():
                new = parts[0]
                for p in parts[1:]:
                    new = new.union(p)
                new = new.distinct()
                if rounds % self.checkpoint_every == 0:
                    # localCheckpoint truncates the iterative lineage AND
                    # caches — no extra persist on those rounds
                    new = new.localCheckpoint(eager=False)
                else:
                    new = new.persist(StorageLevel.MEMORY_AND_DISK)
                persisted.append(new)
                candidates[dst] = new

            next_frontier: dict[str, DataFrame] = {}
            next_size: dict[str, int] = {}
            if candidates:
                tagged = None
                for dst, new in candidates.items():
                    part = new.select(F.lit(dst).alias("__t"))
                    tagged = part if tagged is None else tagged.union(part)
                sizes = {r["__t"]: r["count"] for r in tagged.groupBy("__t").count().collect()}
                for dst, new in candidates.items():
                    n = sizes.get(dst, 0)
                    if n == 0:
                        new.unpersist()
                        continue
                    next_frontier[dst] = new
                    next_size[dst] = n
                    new_keys = new.select(*self._keys(dst)).distinct()
                    prev = visited.get(dst)
                    # no distinct on the union: new_keys is anti-joined
                    # against prev and internally distinct, so the union is
                    # already a set — a distinct here would re-shuffle the
                    # whole visited table every round
                    merged = prev.union(new_keys) if prev is not None else new_keys
                    if rounds % self.checkpoint_every == 0:
                        merged = merged.localCheckpoint(eager=False)
                    else:
                        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
                        persisted.append(merged)
                    visited[dst] = merged

            history.append({"round": rounds, "new": dict(next_size)})
            for df in src_rows.values():
                df.unpersist()
            for t, df in frontier.items():
                df.unpersist()
            frontier, fsize = next_frontier, next_size

        # Truncate lineage on the results and release every intermediate
        # cache: a traversal leaves dozens of persisted plans with deep
        # iterative lineage behind, and every LATER query compilation pays
        # plan canonicalization against the cache registry — checkpointed
        # leaf plans make that cost constant.
        final = {t: v.localCheckpoint(eager=True) for t, v in visited.items()}
        for df in persisted:
            df.unpersist()
        row_counts = {t: v.count() for t, v in final.items()}
        return SubsetResult(keys=final, rounds=rounds, row_counts=row_counts, history=history)

    # ---------------------------------------------------------------- export
    def export(self, result: SubsetResult) -> dict[str, DataFrame]:
        """Full rows for every table in the slice — one semi-join per table
        (the reference's row re-fetch by id, `slice_db/dump_temp_table.py:170-186`).
        Row identity is the declared key tuple: all rows sharing a visited
        key tuple are exported (the reference keys on physical ctid —
        SURVEY §7 hard parts)."""
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
