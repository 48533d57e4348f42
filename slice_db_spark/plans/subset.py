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
* Every table touched by the traversal is scanned ONCE: its key+FK-column
  projection is persisted up front and every round's discovery joins hit
  the cache instead of re-reading the source R×edges times (the reference
  equivalently keeps all ids server-side and never re-reads table data).
  The projection is a few percent of table width, so even at 100 TB the
  cached working set is cluster-RAM/disk sized.

Scale notes (100 TB, 1000 executors): per-round cost is bounded by frontier
size whenever frontiers broadcast — the big-table side never shuffles, the
scan is pruned to key+FK columns by Catalyst.  Visited sets are pure key
columns (persist ``MEMORY_AND_DISK``); termination costs exactly one count
per active table per round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.storagelevel import StorageLevel

from ..config.model import FORWARD, REVERSE, Root, SchemaConfig

# Below this many frontier rows the discovery semi-join broadcasts the
# frontier side (no shuffle of the big table).
BROADCAST_ROWS = 2_000_000
CHECKPOINT_EVERY = 5
# Traversal-state budget for the driver regime (rows held on the driver —
# the reference holds ALL ids driver-side in a numpy IntSet at ~4 B/row;
# our rows carry a few key/FK values, so 200k ≈ tens of MB).
DRIVER_ROWS = 200_000

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


def _tagged_counts(dfs: dict[str, DataFrame]) -> dict[str, int]:
    """Materialize every DataFrame and return its row count in ONE Spark
    job: union single-column tagged projections, groupBy-count, collect.
    (N separate .count() actions would serialize N job submissions — the
    dominant cost of small iterative rounds.)"""
    if not dfs:
        return {}
    tagged = None
    for name, df in dfs.items():
        part = df.select(F.lit(name).alias("__t"))
        tagged = part if tagged is None else tagged.union(part)
    return {r["__t"]: r["count"] for r in tagged.groupBy("__t").count().collect()}


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
        cache_scans: bool = True,
        driver_rows: int = DRIVER_ROWS,
        table_rows: dict[str, int] | None = None,
        prefetch_scans: bool = True,
    ):
        schema.validate()
        self.spark = spark
        self.catalog = catalog
        self.schema = schema
        self.broadcast_rows = broadcast_rows
        self.checkpoint_every = checkpoint_every
        self.max_rounds = max_rounds
        self.cache_scans = cache_scans
        self.driver_rows = driver_rows
        self.table_rows = table_rows
        self.prefetch_scans = prefetch_scans
        self._key_mult: dict[str, float] = {}

    # ------------------------------------------------------------------ util
    def _keys(self, table: str) -> list[str]:
        return self.schema.tables[table].keys()

    def _dst(self, rid: str, direction: str) -> str:
        r = self.schema.references[rid]
        return r.reference_table if direction == FORWARD else r.table

    def _maybe_broadcast(self, df: DataFrame, n: int) -> DataFrame:
        return F.broadcast(df) if n <= self.broadcast_rows else df

    def _mult(self, t: str, scans: dict[str, DataFrame]) -> float:
        """Rows-per-key multiplicity estimate for ``t`` (≥ 1).

        Frontier sizes count (key, tag) rows; the discovery join's build
        side is the frontier re-joined to the table's physical rows, so
        for tables whose declared keys are NOT unique the build input is
        frontier × multiplicity and gating the broadcast on the frontier
        count alone could OOM executors.  One approx_count_distinct per
        table (cached for the whole traversal, over the persisted scan)
        buys a safe estimate."""
        if t not in self._key_mult:
            base = scans.get(t, self.catalog[t])
            row = base.agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct(F.struct(*self._keys(t))).alias("d"),
            ).first()
            self._key_mult[t] = max(1.0, row["n"] / max(row["d"], 1))
        return self._key_mult[t]

    def _edge_plan(self) -> list[tuple[str, str, str, str]]:
        """(rid, direction, src, dst) for every configured traversal,
        deterministically ordered.  With ``table_rows`` stats (free from
        parquet footers — ``session.parquet_row_counts`` — or the live
        catalog's reltuples) edges sort destination-size-ascending, the
        reference's cheap-edges-first heuristic
        (`slice_db/dump_temp_table.py:110-117`); without stats a stable
        name sort (in a synchronous round, order only affects job
        submission order)."""
        plan = []
        for r in self.schema.references.values():
            for d in r.directions:
                src = r.table if d == FORWARD else r.reference_table
                dst = self._dst(r.id, d)
                if src in self.catalog and dst in self.catalog:
                    plan.append((r.id, d, src, dst))
        stats = self.table_rows or {}
        big = 1 << 62
        plan.sort(key=lambda e: (stats.get(e[3], big), e[3], e[0], e[1]))
        return plan

    # ------------------------------------------------------------------ run
    def run(self, roots: list[Root]) -> SubsetResult:
        """Capture the referential closure of ``roots``.

        Two regimes, both producing identical closures:

        * **driver regime** (traversal state ≤ ``driver_rows``): visited and
          frontier sets live in driver dicts — the distributed reading of the
          reference's driver-side ``IntSet`` (`slice_db/collection/set.py`).
          Each round runs ONE broadcast semi-join per active edge against the
          cached scans, collected in parallel threads; dedup/no-backtrack
          bookkeeping is plain Python.  No persists, no anti-joins, no
          checkpoint lineage — a round costs one tiny Spark job per edge.
        * **distributed regime**: frontiers/visited as DataFrames with
          anti-join dedup (the 100 TB path).  Entered from the start when the
          roots already exceed the budget, or mid-traversal when a round's
          discoveries overflow it (the completed driver state is lifted into
          DataFrames and the loop continues distributed).
        """
        for root in roots:
            if root.table not in self.catalog:
                raise ValueError(
                    f"unknown root table {root.table!r}; catalog tables: {sorted(self.catalog)}"
                )
        plan = self._edge_plan()
        persisted: list[DataFrame] = []
        scan_cols, scans = self._build_scans(plan, persisted)
        history: list[dict] = []

        state = None
        if self.driver_rows > 0:
            out = self._run_driver(roots, plan, scan_cols, scans, history)
            if isinstance(out, SubsetResult):
                for df in persisted:
                    df.unpersist()
                return out
            state = out  # mid-flight spill (or None: roots exceed budget)

        if state is None:
            state = self._seed_distributed(roots, persisted)
        return self._run_distributed(state, plan, scans, persisted, history)

    def _build_scans(self, plan, persisted):
        """ONE pruned scan per participating table, shared by every round:
        keys + every FK column any edge needs.  Without this each round
        re-reads the source once per edge touching the table."""
        scan_cols: dict[str, set] = {}
        for rid, d, src, dst in plan:
            r = self.schema.references[rid]
            out_cols = r.columns if d == FORWARD else r.reference_columns
            dst_cols = r.reference_columns if d == FORWARD else r.columns
            scan_cols.setdefault(src, set(self._keys(src))).update(out_cols)
            scan_cols.setdefault(dst, set(self._keys(dst))).update(dst_cols)
        scans: dict[str, DataFrame] = {}
        for t, cols in scan_cols.items():
            df = self.catalog[t].select(*sorted(cols))
            if self.cache_scans:
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
                persisted.append(df)
            scans[t] = df
        if self.cache_scans and self.prefetch_scans and len(scans) > 1:
            # Warm every persisted scan CONCURRENTLY instead of paying each
            # table's first parquet read inside the round that first touches
            # it (which serializes reads across rounds: round 1 reads
            # orders, round 2 stalls on lineitem, ...).  Fire-and-forget
            # counts from daemon threads — rounds that reach a still-warming
            # scan just block on the in-flight cache build; traversals that
            # end early waste at most one count per table over columns the
            # traversal was going to read anyway.
            import threading

            for t, df in scans.items():

                def warm(d=df):
                    try:
                        d.count()
                    except Exception:
                        pass  # traversal surfaces any real scan error itself

                threading.Thread(target=warm, daemon=True).start()
        return scan_cols, scans

    def _local_df(self, rows, schema: StructType) -> DataFrame:
        """Driver rows → DataFrame via Arrow (pandas): the plain-list path
        builds a Python-RDD plan that re-pickles every row through Python
        workers on EVERY action — ~3× slower per action at driver-regime
        sizes and re-paid by each consumer join.  Arrow ships columnar
        bytes instead.  Falls back to the row path for Arrow-hostile
        types."""
        try:
            import pandas as pd

            pdf = pd.DataFrame(list(rows), columns=[f.name for f in schema.fields])
            return self.spark.createDataFrame(pdf, schema)
        except Exception:
            return self.spark.createDataFrame(list(rows), schema)

    def _key_schema(self, t: str, extra_blocked: bool = False) -> StructType:
        fields = [
            StructField(c, self.catalog[t].schema[c].dataType, True) for c in self._keys(t)
        ]
        if extra_blocked:
            fields.append(StructField(_BLOCKED, StringType(), True))
        return StructType(fields)

    # ------------------------------------------------------------ driver mode
    def _run_driver(self, roots, plan, scan_cols, scans, history):
        """Driver-regime traversal; returns a SubsetResult, a lifted
        distributed state (mid-flight spill), or None (roots exceed the
        budget — caller reseeds distributed from scratch)."""
        from concurrent.futures import ThreadPoolExecutor

        budget = self.driver_rows
        tcols: dict[str, list] = {}

        def cols_of(t: str) -> list:
            if t not in tcols:
                tcols[t] = sorted(scan_cols[t]) if t in scan_cols else list(self._keys(t))
            return tcols[t]

        # ---- seed: predicate → key set → ALL physical rows sharing those
        # keys (test data may contain duplicate key tuples; the closure is
        # defined over key identity, so every row of a visited key both
        # exports and expands — same as the distributed src_rows re-join).
        def by_key_rows(t: str, key_df):
            base = scans[t] if t in scans else self.catalog[t].select(*self._keys(t))
            return (
                base.join(F.broadcast(key_df), on=self._keys(t), how="left_semi")
                .select(*cols_of(t))
                .limit(budget + 1)
            )

        seed_jobs = []
        for root in roots:
            seed_keys = (
                self.catalog[root.table]
                .where(F.expr(root.condition))
                .select(*self._keys(root.table))
                .distinct()
            )
            seed_jobs.append((root.table, by_key_rows(root.table, seed_keys)))
        with ThreadPoolExecutor(max_workers=min(16, len(seed_jobs))) as ex:
            seed_rows = list(ex.map(lambda j: (j[0], j[1].collect()), seed_jobs))

        # store[t]: key tuple -> list of collected Rows (every physical row
        # of the key; carries the FK values outgoing edges need, so rounds
        # never re-fetch source rows).
        store: dict[str, dict] = {}
        # frontier[t]: key tuple -> set of blocked edge signatures (empty =
        # unblocked root; multiple tags = discovered via several edges, blocked
        # only for an edge ALL its arrivals block — same as the distributed
        # row-per-tag encoding).
        frontier: dict[str, dict] = {}
        total_rows = 0
        for t, rows in seed_rows:
            ks = self._keys(t)
            st = store.setdefault(t, {})
            fr = frontier.setdefault(t, {})
            seen_roots = set()
            for row in rows:
                k = tuple(row[c] for c in ks)
                if k in st and k not in seen_roots:
                    continue  # seeded by an earlier root (row set complete)
                if k not in st:
                    st[k] = []
                    fr[k] = set()
                    seen_roots.add(k)
                st[k].append(row)
                total_rows += 1
        # budget check AFTER dedup so rows shared by overlapping roots
        # count once (None → caller reseeds the distributed regime)
        if total_rows > budget:
            return None
        frontier = {t: fr for t, fr in frontier.items() if fr}

        rounds = 0
        while frontier and rounds < self.max_rounds:
            rounds += 1
            t0 = time.time()
            jobs = []
            for rid, d, src, dst in plan:
                if src not in frontier:
                    continue
                r = self.schema.references[rid]
                out_cols = r.columns if d == FORWARD else r.reference_columns
                dst_cols = r.reference_columns if d == FORWARD else r.columns
                sig = _sig(rid, d)
                st = store[src]
                vals = set()
                for k, tags in frontier[src].items():
                    if tags == {sig}:
                        continue  # no-backtrack: every arrival blocks this edge
                    for row in st[k]:
                        v = tuple(row[c] for c in out_cols)
                        if None not in v:  # NULL FKs never equi-join
                            vals.add(v)
                if not vals:
                    continue
                dkeys = self._keys(dst)
                if d == FORWARD and sorted(dst_cols) == sorted(dkeys):
                    # Forward edge onto the destination's OWN keys: the FK
                    # values ARE the destination keys, so the visited check
                    # is a driver-side set subtraction (the reference's
                    # IntSet membership, `slice_db/collection/set.py`) —
                    # hub parents reached by every child (nation/region)
                    # cost ZERO Spark jobs once visited, and a round whose
                    # discoveries are all visited skips entirely.
                    perm = [dst_cols.index(c) for c in dkeys]
                    novel = {tuple(v[i] for i in perm) for v in vals} - set(store.get(dst, {}))
                    if not novel:
                        continue
                    key_df = self._local_df(sorted(novel), self._key_schema(dst))
                    jobs.append((rid, d, dst, by_key_rows(dst, key_df)))
                    continue
                fields = StructType(
                    [
                        StructField(f"__k{i}", self.catalog[src].schema[c].dataType, True)
                        for i, c in enumerate(out_cols)
                    ]
                )
                local = self._local_df(list(vals), fields)
                cond = [F.col(c) == F.col(f"__k{i}") for i, c in enumerate(dst_cols)]
                # no .distinct(): the downstream left_semi ignores build-side
                # duplicates and the driver store dedups collected rows — a
                # distinct here costs one extra shuffle stage per edge job
                found_keys = (
                    scans[dst]
                    .join(F.broadcast(local), on=cond, how="left_semi")
                    .select(*self._keys(dst))
                )
                jobs.append((rid, d, dst, by_key_rows(dst, found_keys)))

            results = []
            if jobs:
                with ThreadPoolExecutor(max_workers=min(16, len(jobs))) as ex:
                    results = list(ex.map(lambda j: (j[0], j[1], j[2], j[3].collect()), jobs))

            # Overflow check BEFORE mutating state: if this round's fresh
            # discoveries blow the budget, redo the round distributed from
            # the intact round-start state.  Count only never-visited keys'
            # rows — hub keys (nation/region reached by every customer) are
            # re-collected each round and must not trigger a spurious
            # spill.  Rows discovered by two edges in the same round count
            # twice: a conservative (early-spill) over-estimate.
            fresh_rows = 0
            for _, _, dst, rows in results:
                st = store.get(dst, {})
                ks = self._keys(dst)
                fresh_rows += sum(1 for row in rows if tuple(row[c] for c in ks) not in st)
            if total_rows + fresh_rows > budget:
                return self._lift_state(store, frontier, rounds - 1)

            new_frontier: dict[str, dict] = {}
            owners: dict[tuple, int] = {}  # (dst, key) -> discovering edge index
            for ei, (rid, d, dst, rows) in enumerate(results):
                inv = _sig(rid, _inverse(d))
                ks = self._keys(dst)
                st = store.setdefault(dst, {})
                fr = new_frontier.setdefault(dst, {})
                for row in rows:
                    k = tuple(row[c] for c in ks)
                    ok = (dst, k)
                    if k in st and ok not in owners:
                        continue  # visited in an earlier round
                    if ok not in owners:
                        owners[ok] = ei
                        st[k] = []
                    if owners[ok] == ei:
                        # two edges discovering the same key both return its
                        # complete physical row set — only the first appends
                        st[k].append(row)
                        total_rows += 1
                    fr.setdefault(k, set()).add(inv)
            new_frontier = {t: fr for t, fr in new_frontier.items() if fr}
            history.append(
                {
                    "round": rounds,
                    "new": {t: len(fr) for t, fr in new_frontier.items()},
                    "sec": round(time.time() - t0, 3),
                    "mode": "driver",
                }
            )
            frontier = new_frontier

        keys = {}
        row_counts = {}
        for t, rows in store.items():
            if not rows:
                continue
            # Arrow construction (see _local_df) + lazy local checkpoint:
            # the first action materializes JVM-side blocks and every later
            # consumer (export joins, audits, manifest counts) reads those
            # instead of re-shipping driver rows.
            keys[t] = self._local_df(
                list(rows.keys()), self._key_schema(t)
            ).localCheckpoint(eager=False)
            row_counts[t] = len(rows)
        return SubsetResult(keys=keys, rounds=rounds, row_counts=row_counts, history=history)

    def _lift_state(self, store, frontier, rounds_done):
        """Lift driver dicts into the distributed-state tuple."""
        visited, vsize, fdfs, fsize = {}, {}, {}, {}
        for t, rows in store.items():
            if not rows:
                continue
            visited[t] = self._local_df(list(rows.keys()), self._key_schema(t))
            vsize[t] = len(rows)
        for t, fr in frontier.items():
            data = []
            for k, tags in fr.items():
                if tags:
                    data.extend((*k, tag) for tag in tags)
                else:
                    data.append((*k, None))
            fdfs[t] = self._local_df(data, self._key_schema(t, extra_blocked=True))
            fsize[t] = len(data)
        return fdfs, fsize, visited, vsize, rounds_done

    # ------------------------------------------------------- distributed mode
    def _seed_distributed(self, roots, persisted):
        """Union of root predicate scans per table (reference: multiple
        --root args share one visited set, slice_db/dump.py:84-91)."""
        seeds: dict[str, DataFrame] = {}
        for root in roots:
            df = self.catalog[root.table]
            keys = df.where(F.expr(root.condition)).select(*self._keys(root.table)).distinct()
            seeds[root.table] = (
                seeds[root.table].union(keys).distinct() if root.table in seeds else keys
            )
        seed_sizes = _tagged_counts(
            {t: keys.persist(StorageLevel.MEMORY_AND_DISK) for t, keys in seeds.items()}
        )
        frontier: dict[str, DataFrame] = {}
        fsize: dict[str, int] = {}
        visited: dict[str, DataFrame] = {}
        vsize: dict[str, int] = {}
        for t, keys in seeds.items():
            persisted.append(keys)
            n = seed_sizes.get(t, 0)
            if n == 0:
                continue
            frontier[t] = keys.withColumn(_BLOCKED, F.lit(None).cast("string"))
            fsize[t] = n
            visited[t] = keys
            vsize[t] = n
        return frontier, fsize, visited, vsize, 0

    def _run_distributed(self, state, plan, scans, persisted, history) -> SubsetResult:
        frontier, fsize, visited, vsize, rounds = state
        while frontier and rounds < self.max_rounds:
            rounds += 1
            _t0 = time.time()

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
                base = scans[t] if t in scans else self.catalog[t]
                src_rows[t] = (
                    base.select(*sorted(need))
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
                )
                # the build side is frontier (key, tag) rows × the source
                # table's rows-per-key multiplicity — gate the broadcast on
                # that estimate, not the frontier count alone
                build_rows = int(fsize[src] * self._mult(src, scans))
                if build_rows > self.broadcast_rows:
                    # shuffle path: shrink the join input; the broadcast
                    # path skips this — left_semi ignores build-side dupes
                    # and the extra shuffle costs more than it saves
                    join_keys = join_keys.distinct()
                cond = [F.col(c) == F.col(f"__k{i}") for i, c in enumerate(dst_cols)]
                found = (
                    scans[dst]
                    .join(self._maybe_broadcast(join_keys, build_rows), on=cond, how="left_semi")
                    .select(*self._keys(dst))
                )
                if dst in visited:
                    found = found.join(
                        self._maybe_broadcast(visited[dst], vsize[dst]),
                        on=self._keys(dst),
                        how="left_anti",
                    )
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
                sizes = _tagged_counts(candidates)
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
                    vsize[dst] = vsize.get(dst, 0) + n
                    if rounds % self.checkpoint_every == 0:
                        merged = merged.localCheckpoint(eager=False)
                    else:
                        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
                        persisted.append(merged)
                    visited[dst] = merged

            # telemetry: distributed 'new' counts (key, blocked-tag) rows
            # (what the round actually shuffles); driver rounds count
            # distinct keys — the 'mode' field disambiguates the units
            history.append(
                {
                    "round": rounds,
                    "new": dict(next_size),
                    "sec": round(time.time() - _t0, 3),
                    "mode": "dist",
                }
            )
            for df in src_rows.values():
                df.unpersist()
            for df in frontier.values():
                df.unpersist()
            frontier, fsize = next_frontier, next_size

        # Truncate lineage on the results and release every intermediate
        # cache: a traversal leaves dozens of persisted plans with deep
        # iterative lineage behind, and every LATER query compilation pays
        # plan canonicalization against the cache registry — checkpointed
        # leaf plans make that cost constant.
        final = {t: v.localCheckpoint(eager=False) for t, v in visited.items()}
        # ONE job materializes every checkpoint and returns all counts;
        # intermediates are released only after the finals are solid.
        row_counts = _tagged_counts(final)
        for df in persisted:
            df.unpersist()
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
        # the union stacks every table's traversal partitioning (|tables| ×
        # shuffle.partitions tasks for an audit-sized frame); coalesce —
        # no shuffle — back to ONE session-width task wave.  The knob that
        # sizes every other stage sizes this one too, so it stays
        # proportional at cluster scale.
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "200"))
        return df.coalesce(n)
