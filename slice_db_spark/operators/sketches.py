"""Deterministic probabilistic sketches with exact cross-engine oracles.

Production engines expose approximate aggregates (HyperLogLog distinct
counts, Count-Min frequency estimates) whose built-in implementations are
engine-specific — Spark's `approx_count_distinct` bits can never be
verified against another engine.  These from-scratch sketches use only
md5-derived hashing (:mod:`.hashing`) and integer arithmetic, so DuckDB
reproduces every register and every estimate bit-for-bit: approximation
with a correctness gate.

Design notes shared by both sketches:

* Register/bucket assignment hashes through :func:`..hashing.hash64`
  (60-bit positive md5 prefix) — engine-portable, and salted per use so
  sketches of different columns never correlate.
* The HLL rank ρ (trailing-zero count + 1) is computed WITHOUT ``log2``
  — IEEE ``log`` of an exact power of two is correctly rounded in some
  libm builds and one ulp off in others, which would flip ``floor``.
  Instead the lowest set bit ``v & -v`` maps to its exponent through a
  generated 33-branch CASE chain, rendered identically into Spark SQL
  and DuckDB SQL (:func:`_rho_case_sql`).
* The HLL harmonic sum runs over ``2^(50−ρ)`` INTEGERS (Σ bounded by
  m·2⁵⁰ < 2⁶³), never a float accumulation — the one double division
  happens once, on exact int64 inputs, at the very end.
* No small-range/large-range bias corrections: they need ``ln``.  The
  raw estimate is documented ±~1.04/√m relative error for cardinalities
  comfortably above 2.5·m — the regime the tests pin.

Scale: both sketches are one map-side-combinable groupBy over (register)
or (row, col) keys — the sketch state is KB-sized regardless of input
volume, the classic streaming/distributed-merge shape (register-wise max
/ cell-wise sum are the merge operators, which is exactly what the
partial aggregation performs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import hash64

HLL_P = 8                 # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_SCALE_POW = 50        # harmonic terms as 2^(50 - rho) integers
#: alpha_256 = 0.7213 / (1 + 1.079/256) — the standard HLL constant,
#: inlined as one literal so both engines multiply the identical double
HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)

CMS_DEPTH = 4
CMS_WIDTH = 512


def _rho_case_sql(v: str, w_bits: int = 32) -> str:
    """SQL CASE mapping ``v``'s lowest set bit to the HLL rank ρ =
    trailing zeros + 1 (ρ = w_bits+1 when v = 0).  Pure integer ops —
    valid verbatim in Spark SQL and DuckDB."""
    branches = " ".join(
        f"WHEN {1 << i} THEN {i + 1}" for i in range(w_bits)
    )
    return (
        f"CASE WHEN {v} = 0 THEN {w_bits + 1} "
        f"ELSE (CASE ({v}) & (-({v})) {branches} END) END"
    )


def hll_registers(df: DataFrame, col: str, salt: str = "hll") -> DataFrame:
    """(bucket, rho) register table: per bucket the max rank observed.
    Distinct-ness is inherent — duplicates of a value land in the same
    (bucket, rho) and max() absorbs them."""
    h = hash64(F.concat_ws(":", F.lit(salt), F.col(col).cast("string")))
    df2 = df.where(F.col(col).isNotNull()).select(h.alias("__h"))
    df2 = df2.select(
        (F.col("__h") % HLL_M).alias("bucket"),
        F.expr(f"(__h div {HLL_M}) % {1 << 32}").alias("__sfx"),
    )
    rho = F.expr(_rho_case_sql("__sfx"))
    return df2.select("bucket", rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate_from_registers(spark, regs: DataFrame) -> DataFrame:
    """Estimate from an existing (bucket, rho) register table — the merge
    entry point: register tables from any number of shards/snapshots
    combine by ``union → groupBy(bucket).max(rho)`` and estimate here,
    which is what makes the sketch distributed-friendly (and enables
    union cardinalities: merged registers ARE the union's sketch)."""
    full = (
        spark.range(0, HLL_M)
        .select(F.col("id").alias("bucket"))
        .join(F.broadcast(regs), "bucket", "left_outer")
        .select(F.coalesce(F.col("rho"), F.lit(0)).alias("rho"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE_POW} - rho)")
    agg = full.agg(F.sum(term).alias("__s"))
    est = (
        F.lit(HLL_ALPHA) * F.lit(float(HLL_M)) * F.lit(float(HLL_M))
        * F.lit(float(1 << HLL_SCALE_POW)) / F.col("__s")
    )
    return agg.select(
        F.lit(HLL_M).cast("bigint").alias("n_registers"),
        F.col("__s").cast("bigint").alias("harmonic_scaled"),
        F.floor(est).cast("bigint").alias("estimate"),
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (register-wise max) — associative and
    commutative, so shard sketches combine in any order."""
    merged = register_tables[0]
    for r in register_tables[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(df: DataFrame, col: str, salt: str = "hll") -> DataFrame:
    """One-row (n_registers, harmonic_scaled, estimate) frame.  Empty
    buckets contribute ρ=0 (term 2^50) via a generated bucket dimension
    left join — never a driver loop."""
    return hll_estimate_from_registers(df.sparkSession, hll_registers(df, col, salt))


def cms_cells(
    df: DataFrame, col: str, salt: str = "cms", weight_col: str | None = None
) -> DataFrame:
    """Count-Min cell table: (row, cell, cnt) over CMS_DEPTH independent
    hash rows — the mergeable sketch state (cell-wise sum merges shards).

    With ``weight_col`` the input is a pre-aggregated (value, weight)
    frame and cells sum the weights — build the per-value counts ONCE
    (map-side combinable) and sketch the small distinct-value frame,
    instead of re-scanning raw rows per depth row."""
    rows = None
    base = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("__v"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("bigint").alias("__w"),
    )
    for j in range(CMS_DEPTH):
        h = hash64(F.concat_ws(":", F.lit(salt), F.lit(str(j)), F.col("__v")))
        r = base.select(F.lit(j).alias("row"), (h % CMS_WIDTH).alias("cell"), "__w")
        rows = r if rows is None else rows.unionByName(r)
    return rows.groupBy("row", "cell").agg(F.sum("__w").alias("cnt"))


def cms_estimates(
    df: DataFrame,
    col: str,
    keys: DataFrame,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Per key the CMS frequency estimate: min over depth rows of the
    key's cell count (0 when a cell is empty).  ``keys``: one column named
    ``key``.  Estimates are exact-or-over by construction — never under."""
    cells = cms_cells(df, col, salt, weight_col)
    probes = None
    for j in range(CMS_DEPTH):
        h = hash64(F.concat_ws(":", F.lit(salt), F.lit(str(j)), F.col("key").cast("string")))
        p = keys.select(F.col("key"), F.lit(j).alias("row"), (h % CMS_WIDTH).alias("cell"))
        probes = p if probes is None else probes.unionByName(p)
    joined = probes.join(cells, ["row", "cell"], "left_outer").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("__c")
    )
    return joined.groupBy("key").agg(F.min("__c").cast("bigint").alias("cms_estimate"))


BLOOM_K = 3
BLOOM_M_POW = 16
BLOOM_M = 1 << BLOOM_M_POW   # 65536 bits


def bloom_bits(df: DataFrame, col: str, salt: str = "bloom") -> DataFrame:
    """Bloom filter as a distinct (bit,) position table — ``BLOOM_K``
    salted md5 positions per value, reproducible in any engine.  For a
    set of n values the false-positive rate is the textbook
    ``(1 − e^{−kn/m})^k``; the table form (instead of a packed bitmap)
    keeps it joinable, verifiable, and mergeable by plain DISTINCT
    union."""
    rows = None
    base = df.where(F.col(col).isNotNull()).select(F.col(col).cast("string").alias("__v"))
    for j in range(BLOOM_K):
        h = hash64(F.concat_ws(":", F.lit(salt), F.lit(str(j)), F.col("__v")))
        r = base.select((h % BLOOM_M).alias("bit"))
        rows = r if rows is None else rows.unionByName(r)
    return rows.distinct()


def bloom_candidates(
    df: DataFrame, col: str, bits: DataFrame, salt: str = "bloom"
) -> DataFrame:
    """Rows of ``df`` whose ``col`` value has ALL k bloom bits set — the
    candidate superset of true members (no false negatives ever; false
    positives at the textbook rate).

    The membership test is k broadcast semi-join probes counted back per
    input row: a value passes iff all k probes hit.  With the bit table
    broadcast (KB-sized), the big side never shuffles — the point of the
    pre-filter: it prunes the expensive exact join's input to candidates
    only."""
    keyed = df.withColumn("__bv", F.col(col).cast("string"))
    # probe DISTINCT values, not rows — a value occurring in d rows would
    # otherwise contribute d·k probes and break the all-k-bits count in
    # both directions (missed members at d>1, spurious passes when d
    # partial hits happen to sum to k)
    vals = keyed.select("__bv").distinct()
    probes = None
    for j in range(BLOOM_K):
        h = hash64(F.concat_ws(":", F.lit(salt), F.lit(str(j)), F.col("__bv")))
        p = vals.select(F.col("__bv"), (h % BLOOM_M).alias("bit"))
        probes = p if probes is None else probes.unionByName(p)
    hits = (
        probes.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("__bv")
        .agg(F.count(F.lit(1)).alias("__k"))
        .where(F.col("__k") == BLOOM_K)
        .select(F.col("__bv"))
    )
    return keyed.join(F.broadcast(hits), "__bv", "left_semi").drop("__bv")


# ------------------------------------------------- histogram quantile sketch

HIST_BUCKETS = 128


def hist_counts(
    df: DataFrame, col: str, lo_q: int, hi_q: int, n_buckets: int = HIST_BUCKETS
) -> DataFrame:
    """Equi-width histogram of ``round(col·100)`` cents over the closed
    range [lo_q, hi_q]: exact integer bucket counts — the mergeable
    quantile-sketch state (bucket-wise SUM is the merge operator, same
    distributed shape as the HLL register max).  Bucket assignment is
    pure integral arithmetic (``div``), so any engine reproduces it."""
    span = hi_q - lo_q + 1
    # NULLs must not reach the bucket expression: greatest/least SKIP null
    # arguments, so greatest(0, NULL) = 0 would clamp every NULL row into
    # bucket 0 and bias the quantile estimates downward (same guard
    # hll_registers / cms_cells apply).
    d = df.where(F.col(col).isNotNull()).select(
        F.round(F.col(col) * 100).cast("bigint").alias("__q")
    )
    b = F.expr(f"((__q - {lo_q}) * {n_buckets}) div {span}")
    return (
        d.select(F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    spark,
    counts: DataFrame,
    lo_q: int,
    hi_q: int,
    n_total: int,
    probs_pct: tuple = (50, 90, 99),
    n_buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """Quantile estimates from histogram state, entirely in integer
    arithmetic: for each p, the answer lies in the first bucket whose
    cumulative count reaches ``needed = ceil(p·N/100)``; the estimate
    interpolates linearly inside that bucket with floor division.  The
    counts frame is ``n_buckets``-sized, so the cumulative window and
    the per-p argmin are metadata-scale work regardless of input volume
    — the whole point of sketching the quantile instead of sorting 100
    TB.  Output: (p_pct, est_cents)."""
    from pyspark.sql import Window

    span = hi_q - lo_q + 1
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    probed = cum.withColumn(
        "p_pct", F.explode(F.array(*[F.lit(int(p)) for p in probs_pct]))
    ).withColumn("needed", F.expr(f"(p_pct * {n_total} + 99) div 100"))
    hit = probed.where(F.col("cum_before") + F.col("cnt") >= F.col("needed"))
    pick = Window.partitionBy("p_pct").orderBy("bucket")
    first = hit.withColumn("__rn", F.row_number().over(pick)).where(F.col("__rn") == 1)
    start = F.expr(f"{lo_q} + (bucket * {span}) div {n_buckets}")
    width = F.expr(
        f"((bucket + 1) * {span}) div {n_buckets} - (bucket * {span}) div {n_buckets}"
    )
    interp = F.expr("((needed - cum_before) * __w) div cnt")
    return (
        first.withColumn("__w", width)
        .select(
            F.col("p_pct").cast("bigint").alias("p_pct"),
            (start + interp).cast("bigint").alias("est_cents"),
        )
    )


def hll_registers_by(
    df: DataFrame, col: str, by: list[str], salt: str = "hll"
) -> DataFrame:
    """Per-group HLL registers: (by..., bucket, rho) — one sketch per
    group in a single map-side-combinable aggregation.  The grouped form
    of :func:`hll_registers`; registers of the same group merge across
    any re-grouping by ``max(rho)`` (the associative merge that makes
    sliding windows from tumbling ones)."""
    h = hash64(F.concat_ws(":", F.lit(salt), F.col(col).cast("string")))
    base = df.where(F.col(col).isNotNull()).select(*by, h.alias("__h")).select(
        *by,
        (F.col("__h") % HLL_M).alias("bucket"),
        F.expr(f"(__h div {HLL_M}) % {1 << 32}").alias("__sfx"),
    )
    rho = F.expr(_rho_case_sql("__sfx"))
    return (
        base.select(*by, "bucket", rho.alias("rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimates_by(regs: DataFrame, by: list[str]) -> DataFrame:
    """Per-group estimates from grouped registers, WITHOUT a dense
    bucket dimension: absent buckets contribute the ρ=0 term 2^50
    arithmetically — ``harmonic = Σ_present 2^(50−ρ) + (m −
    n_present)·2^50`` — so the whole estimation is one partial-agg
    groupBy however many groups exist (the dense left-join of the
    single-sketch path would shuffle |groups|·m rows for nothing).
    Output: (by..., harmonic_scaled, estimate)."""
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE_POW} - rho)")
    g = regs.groupBy(*by).agg(
        F.sum(term).alias("__sp"), F.count(F.lit(1)).alias("__np")
    )
    harmonic = F.col("__sp") + (F.lit(HLL_M) - F.col("__np")) * F.lit(
        1 << HLL_SCALE_POW
    ).cast("bigint")
    est = (
        F.lit(HLL_ALPHA) * F.lit(float(HLL_M)) * F.lit(float(HLL_M))
        * F.lit(float(1 << HLL_SCALE_POW)) / harmonic
    )
    return g.select(
        *by,
        harmonic.cast("bigint").alias("harmonic_scaled"),
        F.floor(est).cast("bigint").alias("estimate"),
    )


# ------------------------------------------------------------ KMV / Theta
# Bottom-k (KMV) distinct sketch with theta-sketch set algebra: where HLL
# gives distinct counts and union/intersection by inclusion-exclusion, the
# KMV sample supports DIFFERENCE estimates (A-not-B) directly — the
# "how many documents does source A contribute that B doesn't" question a
# corpus-mixing pass asks — because the sketch keeps actual hash SAMPLES,
# not registers.  k smallest distinct salted hashes; merge = union,
# re-take k smallest (associative/commutative, the shard-merge property
# shared with sample_bottomk).  Estimates in the same 2^40 fixed point as
# the weighted sampler: n-hat = (k-1)*2^60/theta rendered as
# ((k-1) << 40) div ((theta >> 20) + 1) — identical integer arithmetic in
# both engines; a sketch that holds its WHOLE set (n < k) reports the
# exact count instead.

KMV_K = 256
#: md5-mode hash64 upper bound (exclusive): 2^60.  The ORACLES pin this
#: value (they replay the md5 form); the operator itself derives the
#: active range from the hashing module so ``SLICE_FAST_HASH=1`` (63-bit
#: xxhash64) keeps every estimate correct — the hash-agnostic contract
#: every other operator honors.
KMV_RANGE = 1 << 60


def _kmv_active_range() -> int:
    """Exclusive upper bound of the ACTIVE hash64 output."""
    from .hashing import HASH_BITS, fast_hash_enabled

    return 1 << (63 if fast_hash_enabled() else HASH_BITS)


def kmv_sketch(df: DataFrame, col: str, k: int = KMV_K, salt: str = "kmv") -> DataFrame:
    """The k smallest distinct salted hashes of ``col`` — a KB-sized
    frame whatever the input volume.  distinct + TakeOrdered, never a
    global sort materialization."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = hash64(F.concat(F.lit(salt + ":"), F.col(col).cast("string")))
    # NULL keys hash to NULL, and ascending orderBy sorts NULLs first —
    # an unfiltered NULL would silently occupy one of the k smallest
    # slots (inflating n while max('h') ignores it).  KMV counts the
    # distinct NON-NULL domain.
    return (
        df.where(F.col(col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union sketch: pool the samples, dedup, re-take the k smallest —
    the same merge shape shards would apply."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def _kmv_estimate(c: int, theta: int) -> int:
    """Scale a below-theta sample count to a cardinality estimate in
    exact integer arithmetic: ``n-hat = c · range / theta`` in the 2^40
    fixed point (``(c << 40) div ((theta >> (range_bits − 40)) + 1)``,
    so the shift tracks the ACTIVE hash width).  theta = full range ->
    the count IS the cardinality."""
    rng = _kmv_active_range()
    if theta >= rng:
        return c
    return (c * (1 << 40)) // ((theta >> (rng.bit_length() - 1 - 40)) + 1)


def kmv_set_stats(
    a: DataFrame, b: DataFrame, k: int = KMV_K
) -> tuple[int, int, int, int, int]:
    """Theta-sketch set algebra over two KMV sketches: (a_est, b_est,
    union_est, inter_est, diff_est) where diff is A-not-B.  theta =
    min of the two sketch thresholds; every sample below theta is a
    uniform sample of the union at rate theta/range, so scaled counts of
    'in A', 'in both', 'in A not B' estimate the respective
    cardinalities.

    A sketch is ≤k rows BY CONSTRUCTION whatever the input volume, so
    each one is collected ONCE and the whole set algebra (thresholds,
    filtered counts, intersection, pool-and-retake union merge) runs as
    driver integer arithmetic on two KB-sized hash lists — two
    metadata-scale collects instead of the former five distributed
    actions (counts, a semi-join, a re-merge), whose per-job scheduling
    latency dominated at any scale (the operands never grow)."""
    ha_all = sorted(int(r.h) for r in a.select("h").collect())
    hb_all = sorted(int(r.h) for r in b.select("h").collect())
    rng = _kmv_active_range()
    na, ta = len(ha_all), (ha_all[-1] if len(ha_all) >= k else rng)
    nb, tb = len(hb_all), (hb_all[-1] if len(hb_all) >= k else rng)
    theta = min(ta, tb)
    # theta == range means both sketches hold their whole sets — every
    # sample qualifies
    ha = ha_all if theta >= rng else [h for h in ha_all if h < theta]
    hb = set(hb_all) if theta >= rng else {h for h in hb_all if h < theta}
    c_a = len(ha)
    c_int = sum(1 for h in ha if h in hb)
    # single-set estimates use each sketch's OWN theta (tighter)
    a_est = _kmv_estimate(na if ta >= rng else k - 1, ta)
    b_est = _kmv_estimate(nb if tb >= rng else k - 1, tb)
    # union sketch: pool the samples, dedup, re-take the k smallest —
    # the same merge shape kmv_merge applies distributedly
    u = sorted(set(ha_all) | set(hb_all))[:k]
    nu, tu = len(u), (u[-1] if len(u) >= k else rng)
    union_est = _kmv_estimate(nu if tu >= rng else k - 1, tu)
    inter_est = _kmv_estimate(c_int, theta)
    diff_est = _kmv_estimate(c_a - c_int, theta)
    return a_est, b_est, union_est, inter_est, diff_est
