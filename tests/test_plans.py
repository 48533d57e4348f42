"""Physical-plan audits: pin the plans we want at 100× scale.

Every assertion here encodes a scale property the operators rely on —
parquet filter/column pushdown, broadcast joins for small sides, and the
absence of unbounded cartesian products — so a refactor that silently
regresses the plan fails CI, not the cluster.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from slice_db_spark.plans import queries as Q

from conftest import SF_DIR


@pytest.fixture(scope="module")
def plans(spark):
    qs = Q.queries()
    cache: dict[str, str] = {}

    def plan_of(name: str) -> str:
        if name not in cache:
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            cache[name] = buf.getvalue()
        return cache[name]

    return plan_of


def test_root_scan_pushdown(plans):
    """The root predicate must reach the parquet scan, not evaluate
    post-scan (a full-table read at 100 TB)."""
    p = plans("root_scan")
    assert "PushedFilters" in p
    assert "GreaterThan(o_totalprice" in p


def test_projection_prunes_columns(plans):
    """A 3-column projection must read 3 columns (ReadSchema), not the
    whole customer row."""
    p = plans("projection")
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read and all(
        "c_address" not in ln and "c_comment" not in ln for ln in read
    ), read


def test_q5_broadcasts_dimensions(plans):
    """Region/nation (tiny dims) must broadcast; shuffling lineitem against
    a 5-row table would be the classic scale mistake."""
    p = plans("q5_region_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_semi_join_shape(plans):
    p = plans("semi_join")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_lsh_paths_have_no_cross_join(plans):
    """The LSH scale paths must stay equi-joins; only the documented
    brute-force baseline may nest-loop (and only as a BROADCAST loop)."""
    for name in ("minhash_lsh", "simhash_pairs", "dedup_embedding", "ann_lsh",
                 "ann_ivf", "ann_ivfpq", "media_phash_pairs",
                 "media_audio_pairs", "media_video_pairs"):
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    brute = plans("ann_brute")
    assert "CartesianProduct" not in brute
    assert "BroadcastNestedLoopJoin" in brute  # documented small-|Q| baseline


def test_text_ops_are_codegen_only(plans):
    """Text analysis is pure column expressions — no Python workers
    (BatchEvalPython/ArrowEvalPython) in the plan."""
    for name in ("token_stats", "bpe_tokens", "quality", "language_id", "doc_fingerprints"):
        p = plans(name)
        assert "EvalPython" not in p, name


def test_jaccard_single_index_shuffle(plans):
    """The posting-list Jaccard shape: ONE shuffle of the inverted index
    (the shingle window) directly feeding collect_list with no re-shuffle
    between them, then only the pair-count and two per-doc size
    aggregates — 4 hash exchanges total.  Guards against the round-2
    regression shape (groupBy + left_semi + self-join = extra full-index
    shuffles)."""
    plan = plans("dedup_jaccard")
    assert plan.count("Exchange hashpartitioning") <= 4
    # the df-cap filter runs inside the window stage, not as a join
    assert "left_semi" not in plan.lower()


def test_curation_ops_plan_shapes(plans):
    """Curation operators keep their scale shapes: decontamination
    broadcasts the (small) benchmark shingle set — the corpus index must
    never shuffle into a sort-merge join against it; PII scrub, split
    assignment, and source mixing are pure per-row codegen (no joins, no
    Python workers); packing windows per shard rather than globally."""
    p = plans("decontam")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    for name in ("pii_scrub", "split_assign", "source_mix"):
        p = plans(name)
        assert "Join" not in p, name
        assert "EvalPython" not in p, name
    pack = plans("pack_sequences")
    assert "Window" in pack
    # shard-partitioned window: the sort key list must include shard
    assert "shard" in pack
    assert "EvalPython" not in pack


def test_q6_full_pushdown(plans):
    """Q6 is the pushdown showcase: every predicate (shipdate range,
    discount range, quantity bound) must reach the parquet scan as a
    PushedFilter — at 100 TB these filters are the difference between a
    row-group-pruned scan and reading the whole fact table."""
    p = plans("q6_forecast_revenue")
    assert "PushedFilters" in p
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
        assert any(frag in ln for ln in pushed), frag


def test_funnel_scans_bounded_by_stages(plans):
    """The funnel must not re-derive the fact table per stage-join (the
    naive per-stage filter+join shape scans events 3k+ times); the
    aggregate-first shape scans at most once per stage, each with the
    stage's type filter pushed to the scan."""
    import re

    p = plans("events_funnel")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 4


def test_asof_single_exchange_no_join(plans):
    """The as-of core is ONE hash exchange on user_id feeding a window —
    no inequality join, no cartesian product.  (The single extra
    broadcast join re-attaches click attributes.)"""
    p = plans("events_asof")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Window") >= 1
    # exactly one shuffle keyed by user_id for the window itself
    assert p.count("hashpartitioning(user_id") == 1, p


def test_range_join_is_equi_join(plans):
    """The interval-bucket range join must plan as a plain equi-join on
    (user_id, bin) — never a nested-loop/cartesian comparison."""
    p = plans("events_range_join")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "PushedFilters" in p


def test_chunk_dedup_partial_agg(plans):
    """Winner-per-chunk-hash must partially aggregate map-side (skew
    armor for hot duplicated chunks): HashAggregate appears below the
    exchange (partial) and above it (final)."""
    p = plans("dedup_chunks")
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2


def test_pq_adc_broadcasts_distance_table(plans):
    """The ADC scan must join the (tiny) per-query distance table to the
    codes by BROADCAST — shuffling the codes table on (m, code) would
    funnel the whole corpus through n_codes*m partitions."""
    p = plans("ann_pq")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the adist aggregation partially aggregates before the (q, id) shuffle
    assert p.count("HashAggregate") >= 2


def test_q4_semi_join_no_multiplication(plans):
    """The EXISTS must plan as a semi join (one output row per order), and
    the quarter filter must push to the orders scan."""
    p = plans("q4_order_priority")
    assert "LeftSemi" in p
    assert "PushedFilters" in p and "o_orderdate" in p


def test_q10_broadcasts_nation(plans):
    p = plans("q10_returned_items")
    assert "BroadcastHashJoin" in p
    assert "IsNotNull(l_returnflag)" in p or "EqualTo(l_returnflag,R)" in p


# --------------------------------------------------------------------------
# Whole-registry lint: every queries() entry, automatically.  Catches future
# scale-killers (cartesian products, per-row Python UDFs, single-partition
# windows, lost parquet pushdown) without a hand-written test per query.

#: documented small-|Q| brute-force baseline — the ONE sanctioned nested loop
_ALLOWED_NESTED_LOOP = {"ann_brute", "knn_classify"}

#: scalar-fold cross joins (r11): a global scalar (total, max date, exact
#: distinct count, vocabulary size…) that used to be a blocking
#: .first()/.count() during plan construction is now a broadcast 1-ROW
#: aggregate cross-joined into the plan — one job instead of two serial
#: ones.  The resulting BroadcastNestedLoopJoin's build side is exactly
#: one row by construction (a global aggregate), bounded at any input
#: volume, so it is not the all-pairs scale killer the lint hunts.
_ALLOWED_SCALAR_BROADCAST = {
    "basket_affinity",
    "bm25_rank",
    "collocations",
    "customer_rfm",
    "events_heatmap",
    "join_size_est",
    "lm_score",
    "markov_stationary",
    "nation_hhi",
    "q11_important_stock",
    "q22_idle_customers",
    "quality_blend",
    "sessions_promo_overlap",
    "sketch_hll",
    "source_drift",
    "source_temperature",
    "tfidf_terms",
}

#: global (unpartitioned) windows allowed only where the window input is
#: bounded by something other than data volume:
#:  - q3_top_orders: rank assignment ABOVE TakeOrderedAndProject (≤10 rows)
#:  - scrub_deterministic: per-partition-offset window of the scalable
#:    running counter — one row per shuffle partition (bounded by config)
#:  - revenue_mom: lag window over the month-aggregated frame — one row
#:    per calendar month, bounded by time span not data volume
_ALLOWED_GLOBAL_WINDOW = {
    "q3_top_orders",
    # scrub_deterministic: the data-grain counter window is bucket-
    # partitioned (transforms._global_running_count); the remaining
    # unpartitioned window is the per-bucket offset cumulation over a
    # <= |shuffle partitions|-row frame
    "scrub_deterministic",
    "revenue_mom",
    # sketch_quantile: the cumulative window runs over the 128-row
    # histogram STATE frame (post-aggregation, metadata-sized at any
    # input volume), not over input rows
    "sketch_quantile",
    # jaccard_threshold_sweep: cumulative window over the <=5-row band
    # frame (post-aggregation), not over pairs
    "jaccard_threshold_sweep",
    # customer_abc graduated OUT of this list: its cumulative order now
    # decomposes into revenue-range buckets with a metadata-sized offset
    # collect (the two-pass shape) — the template for any future
    # cumulative over a data-volume-sized frame
}

#: queries whose plan must keep a NON-EMPTY PushedFilters on a parquet scan
#: (each filters a source column; losing pushdown = full-table scan at 100 TB)
_EXPECTED_PUSHDOWN = {
    "root_scan", "semi_join", "anti_join", "multicol_semi_join",
    "slice_export_lineitem", "q1_pricing_summary", "q3_top_orders",
    "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
    "q10_returned_items", "salted_join_revenue", "window_top_orders",
    "q7_nation_volume", "q13_order_distribution", "q22_idle_customers",
    # q17_small_qty_revenue: localCheckpoint (two-consumer reuse) cuts the
    # visible lineage above the filtered part⋈lineitem scan, same as q15
    "stream_enrich", "stream_tumbling", "stream_sliding", "stream_session",
    "events_funnel", "events_asof", "events_range_join", "events_retention",
    "decontam", "ann_brute", "ann_lsh", "ann_ivf", "ann_pq",
    "knn_classify",
    # dedup_embedding / dedup_embedding_hi / simhash_pairs graduated OUT
    # of this list in r11: the banded self-join now eagerly checkpoints
    # its signature frame (one fingerprint pass instead of two — the
    # 08c7de6 materialization), which cuts the visible lineage above the
    # scan exactly like q15/q17's two-consumer checkpoints.  The only
    # pushed filter those scans ever had was IsNotNull(id) — every row is
    # fingerprinted by design — and it still applies inside the
    # checkpoint-materialization job.
    "corpus_pipeline",
}

_GLOBAL_WINDOW_RE = __import__("re").compile(
    r"windowspecdefinition\(\s*[\w#]+\s+(ASC|DESC)", __import__("re").IGNORECASE
)


#: queries whose final ORDER BY (TPC-H presentation order, no LIMIT) sorts
#: the POST-AGGREGATION result — a frame bounded by group cardinality
#: (2-25 rows at any input volume), so the range exchange moves metadata,
#: not data.  Everything else must avoid range exchanges entirely.
_ALLOWED_RANGE_EXCHANGE = {
    "q12_shipmode",      # |linestatus| rows
    "q13_order_distribution",  # |distinct order counts| rows
    "q15_top_supplier",  # ties at the max: ~1 row
    "q20_excess_suppliers",    # qualifying suppliers
    "q22_idle_customers",      # |phone prefixes| rows
}


def test_registry_lint_no_scale_killers(plans):
    """Every registered query: no CartesianProduct, no row-at-a-time Python
    (BatchEvalPython), nested-loop joins only where documented, no
    unpartitioned window outside the justified set, and no range exchange
    anywhere — a global sort (or a repartitionByRange whose sampling pass
    re-executes the child) has no place in any registered plan; every
    ordering need is served by TakeOrdered, partitioned windows, or the
    value-derived bucket decomposition."""
    for name in Q.queries():
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name
        if name not in _ALLOWED_RANGE_EXCHANGE:
            assert "rangepartitioning" not in p, (
                f"{name}: range exchange (global sort / repartitionByRange) "
                "in the plan — use TakeOrdered, a partitioned window, or "
                "bucket decomposition instead"
            )
        if name in _ALLOWED_SCALAR_BROADCAST:
            # the sanctioned nested loop is the 1-row scalar broadcast —
            # it must be a Cross with a broadcast build side, and never
            # more than a couple per plan (a data-volume nested loop
            # would still fail here via the Inner/LeftOuter join type)
            import re as _re

            nl = _re.findall(r"BroadcastNestedLoopJoin (\w+)", p)
            assert all(j == "Cross" for j in nl), (name, nl)
        elif name not in _ALLOWED_NESTED_LOOP:
            assert "BroadcastNestedLoopJoin" not in p, name
        if name not in _ALLOWED_GLOBAL_WINDOW:
            assert not _GLOBAL_WINDOW_RE.search(p), (
                f"{name}: unpartitioned window funnels all rows through one "
                "partition — partition it or justify in _ALLOWED_GLOBAL_WINDOW"
            )


def test_registry_lint_pushdown(plans):
    """Queries that filter source columns must keep a non-empty parquet
    PushedFilters — regression here silently becomes a full-table read."""
    import re

    for name in sorted(_EXPECTED_PUSHDOWN):
        p = plans(name)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
        assert any(s.strip() for s in pushed), f"{name}: lost parquet pushdown"


def test_scrub_counter_single_udf_pass_no_range_exchange(plans):
    """The stateful-counter fix must hold: the scrub plan evaluates the
    Arrow UDFs exactly once (a repartitionByRange above them would
    re-evaluate the whole UDF pass inside the range-sampling job) and
    contains no range exchange at all — the window buckets on a pure
    function of the key instead."""
    import re

    p = plans("scrub_deterministic")
    # formatted explain prints each node in the tree AND as a numbered
    # detail block — count distinct node ids
    nodes = set(re.findall(r"\((\d+)\) ArrowEvalPython", p))
    assert len(nodes) == 1, p
    assert "rangepartitioning" not in p
    # r7: the bucket-offset fold replaced the offsets broadcast join and
    # its single-partition window — every Window left in the plan must be
    # partitioned (no WindowExec all-to-one-partition funnel)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert "_pid" in spec, p
