"""Deterministic-sketch contracts: HLL estimate accuracy + duplicate
insensitivity, CMS never-underestimates + weighted-build equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from slice_db_spark.operators import sketches


def test_hll_estimate_within_error_bound(spark):
    """1.04/sqrt(256) ~ 6.5% relative error at one sigma; assert 3 sigma."""
    df = spark.range(0, 2000).select(F.col("id").alias("v"))
    est = sketches.hll_estimate(df, "v").collect()[0]
    assert est.n_registers == 256
    assert abs(est.estimate - 2000) / 2000 < 0.20


def test_hll_duplicates_do_not_move_registers(spark):
    """The sketch is a function of the distinct value set only."""
    base = spark.range(0, 500).select(F.col("id").alias("v"))
    doubled = base.unionByName(base).unionByName(base)
    a = sketches.hll_estimate(base, "v").collect()[0]
    b = sketches.hll_estimate(doubled, "v").collect()[0]
    assert (a.harmonic_scaled, a.estimate) == (b.harmonic_scaled, b.estimate)


def test_hll_registers_deterministic(spark):
    df = spark.range(0, 100).select(F.col("id").alias("v"))
    r1 = {(r.bucket, r.rho) for r in sketches.hll_registers(df, "v").collect()}
    r2 = {(r.bucket, r.rho) for r in sketches.hll_registers(df, "v").collect()}
    assert r1 == r2 and len(r1) > 50  # most of 256 buckets hit by 100 values? no — ~32%
    assert all(1 <= rho <= 33 for _, rho in r1)


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    """Estimates are exact-or-over; with few distinct values vs 4x512
    cells, collisions are unlikely and the estimate is exact."""
    rows = [(i % 10,) for i in range(1000)]  # 10 keys x 100
    df = spark.createDataFrame(rows, "v bigint")
    keys = spark.range(0, 10).select(F.col("id").alias("key"))
    est = {r.key: r.cms_estimate for r in sketches.cms_estimates(df, "v", keys).collect()}
    assert all(est[k] >= 100 for k in range(10))
    assert sorted(est.values()) == [100] * 10  # sparse -> exact


def test_cms_weighted_build_matches_raw(spark):
    """Sketching the pre-aggregated (value, weight) frame must equal
    sketching the raw rows."""
    rows = [(i % 7,) for i in range(700)]
    raw = spark.createDataFrame(rows, "v bigint")
    agg = raw.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    keys = spark.range(0, 7).select(F.col("id").alias("key"))
    a = {r.key: r.cms_estimate for r in sketches.cms_estimates(raw, "v", keys).collect()}
    b = {r.key: r.cms_estimate
         for r in sketches.cms_estimates(agg, "v", keys, weight_col="n").collect()}
    assert a == b


def test_cms_absent_key_estimates_low(spark):
    """A key never inserted estimates 0 unless all its cells collide."""
    df = spark.createDataFrame([(1,), (2,)], "v bigint")
    keys = spark.createDataFrame([(999999,)], "key bigint")
    est = sketches.cms_estimates(df, "v", keys).collect()[0]
    assert est.cms_estimate == 0


def test_bloom_no_false_negatives(spark):
    """Every inserted value must pass the membership test."""
    members = spark.range(0, 300).select(F.col("id").alias("v"))
    bits = sketches.bloom_bits(members, "v")
    out = sketches.bloom_candidates(members, "v", bits)
    assert out.count() == 300


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members pass at roughly (1-e^{-kn/m})^k — for n=300, k=3,
    m=65536 that is ~2e-6; assert a generous upper bound."""
    members = spark.range(0, 300).select(F.col("id").alias("v"))
    bits = sketches.bloom_bits(members, "v")
    probes = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("v"))
    fp = sketches.bloom_candidates(probes, "v", bits).count()
    assert fp <= 5  # expected ~0.02 for 10k probes


def test_bloom_duplicate_rows_all_pass(spark):
    """Row multiplicity must not affect membership (the per-row probe
    bug this test pins): d copies of a member all pass."""
    member = spark.createDataFrame([(7,)], "v bigint")
    bits = sketches.bloom_bits(member, "v")
    dup = spark.createDataFrame([(7,), (7,), (7,)], "v bigint")
    assert sketches.bloom_candidates(dup, "v", bits).count() == 3


def test_hll_merge_equals_sketch_of_union(spark):
    """Mergeability: max-merged registers of two shards equal the sketch
    of the concatenated data — bit-for-bit, any order."""
    a = spark.range(0, 400).select(F.col("id").alias("v"))
    b = spark.range(300, 700).select(F.col("id").alias("v"))
    ra = sketches.hll_registers(a, "v")
    rb = sketches.hll_registers(b, "v")
    direct = {(r.bucket, r.rho)
              for r in sketches.hll_registers(a.unionByName(b), "v").collect()}
    merged = {(r.bucket, r.rho) for r in sketches.hll_merge(ra, rb).collect()}
    merged_rev = {(r.bucket, r.rho) for r in sketches.hll_merge(rb, ra).collect()}
    assert merged == direct == merged_rev


def test_hist_quantile_merge_and_accuracy(spark):
    """Histogram state must merge by bucket-wise sum (the distributed
    contract), and the interpolated estimates must land within one
    bucket width of the exact quantile on uniform data."""
    from pyspark.sql import functions as F

    from slice_db_spark.operators import sketches as S

    vals = [(float(i),) for i in range(1, 2001)]  # 1..2000 dollars
    df = spark.createDataFrame(vals, "o_totalprice double")
    lo, hi, n = 100, 200000, 2000  # cents
    whole = {r["bucket"]: r["cnt"] for r in
             S.hist_counts(df, "o_totalprice", lo, hi).collect()}
    h1 = S.hist_counts(df.where("o_totalprice <= 1000"), "o_totalprice", lo, hi)
    h2 = S.hist_counts(df.where("o_totalprice > 1000"), "o_totalprice", lo, hi)
    merged = {
        r["bucket"]: r["cnt"]
        for r in h1.unionByName(h2).groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == whole
    counts = S.hist_counts(df, "o_totalprice", lo, hi)
    est = {r["p_pct"]: r["est_cents"] for r in
           S.hist_quantiles(spark, counts, lo, hi, n, (50, 90)).collect()}
    bucket_w = (hi - lo + 1) // S.HIST_BUCKETS + 1
    assert abs(est[50] - 100050) <= bucket_w   # exact p50 ≈ $1000.50
    assert abs(est[90] - 180050) <= bucket_w


def test_grouped_hll_matches_single_sketch(spark):
    """The grouped register/estimate path must agree exactly with the
    single-sketch dense-dimension path on each group, and merged groups
    must equal the sketch of the union (the sliding-window contract)."""
    from pyspark.sql import functions as F

    from slice_db_spark.operators import sketches as S

    df = spark.createDataFrame(
        [(g, f"u{g}_{i % (40 * (g + 1))}") for g in range(2) for i in range(400)],
        "g int, uid string",
    )
    by_group = {r["g"]: r["estimate"] for r in
                S.hll_estimates_by(S.hll_registers_by(df, "uid", ["g"]), ["g"]).collect()}
    for g in range(2):
        single = S.hll_estimate(df.where(F.col("g") == g), "uid").first()["estimate"]
        assert by_group[g] == single, g
    # merge across groups == sketch of the union
    regs = S.hll_registers_by(df, "uid", ["g"]).drop("g") \
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
    merged_est = S.hll_estimates_by(regs.withColumn("k", F.lit(1)), ["k"]).first()["estimate"]
    union_est = S.hll_estimate(df, "uid").first()["estimate"]
    assert merged_est == union_est


def test_join_size_est_tracks_hot_key(spark):
    """A join dominated by one hot key (1000 x 500 rows): the corrected
    CMS inner-product estimate must land within 20% of the exact
    500k-row join size — heavy components are exactly what the sketch
    preserves."""
    import slice_db_spark.plans.queries as Q

    a_rows = [(7,)] * 1000 + [(i,) for i in range(100, 600)]
    b_rows = [(7,)] * 500 + [(i,) for i in range(100, 350)]
    orders = spark.createDataFrame(a_rows, "o_orderkey bigint")
    lineitem = spark.createDataFrame(b_rows, "l_orderkey bigint")
    Q._CATALOGS["__jsz__"] = {"orders": orders, "lineitem": lineitem}
    try:
        (r,) = Q.join_size_est(spark, "__jsz__").collect()
    finally:
        del Q._CATALOGS["__jsz__"]
    assert r["exact_join_rows"] == 1000 * 500 + 250
    assert abs(r["est_join_rows"] - r["exact_join_rows"]) / r["exact_join_rows"] < 0.2


def test_hist_counts_excludes_nulls(spark):
    """NULL values must not be clamped into bucket 0: greatest(0, NULL)
    evaluates to 0 in Spark (greatest/least SKIP null args), which would
    inflate low-end counts and bias quantile estimates downward."""
    from slice_db_spark.operators.sketches import hist_counts

    with_nulls = spark.createDataFrame(
        [(1.0,), (None,), (50.0,), (None,), (99.0,)], "v double"
    )
    clean = spark.createDataFrame([(1.0,), (50.0,), (99.0,)], "v double")
    got = {r.bucket: r.cnt for r in hist_counts(with_nulls, "v", 0, 10000).collect()}
    want = {r.bucket: r.cnt for r in hist_counts(clean, "v", 0, 10000).collect()}
    assert got == want
    assert sum(got.values()) == 3


def test_kmv_sketch_exact_full_merge_and_setops(spark):
    """r8 KMV/theta pins: (1) an unfull sketch reports the EXACT count;
    (2) a full sketch estimates within the ~1/sqrt(k-2) RSE envelope;
    (3) pooling two sketches equals sketching the union (the shard-merge
    property); (4) identical sets estimate difference 0, disjoint sets
    estimate difference ~|A|."""
    from pyspark.sql import functions as F

    from slice_db_spark.operators import sketches as S

    def ids(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("v"))

    # unfull: n < k -> exact
    small = S.kmv_sketch(ids(0, 100), "v")
    a, b, u, i, d = S.kmv_set_stats(small, S.kmv_sketch(ids(0, 100), "v"))
    assert (a, b, u, i, d) == (100, 100, 100, 100, 0)

    # full: 4000 distinct, k=256 -> within 4 RSE (~25%)
    big = S.kmv_sketch(ids(0, 4000), "v")
    est, _, _, _, _ = S.kmv_set_stats(big, small)
    assert abs(est - 4000) < 1000, est

    # merge property: pool+retake == sketch of the union
    m = sorted(r.h for r in S.kmv_merge(
        S.kmv_sketch(ids(0, 2000), "v"), S.kmv_sketch(ids(1000, 3000), "v")
    ).collect())
    whole = sorted(r.h for r in S.kmv_sketch(ids(0, 3000), "v").collect())
    assert m == whole

    # disjoint halves: intersection ~0, difference ~|A|
    a_est, b_est, u_est, i_est, d_est = S.kmv_set_stats(
        S.kmv_sketch(ids(0, 2000), "v"), S.kmv_sketch(ids(2000, 4000), "v"))
    assert i_est < 350, i_est
    assert abs(d_est - 2000) < 700, d_est
    assert abs(u_est - 4000) < 1000, u_est

    # hash-agnostic contract: under SLICE_FAST_HASH=1 (63-bit xxhash64)
    # the range/shift derive from the active hash — estimates stay in
    # the envelope and unfull sketches stay exact
    import os

    os.environ["SLICE_FAST_HASH"] = "1"
    try:
        f_small = S.kmv_sketch(ids(0, 100), "v")
        fa, fb, fu, fi, fd = S.kmv_set_stats(f_small, S.kmv_sketch(ids(0, 100), "v"))
        assert (fa, fb, fu, fi, fd) == (100, 100, 100, 100, 0)
        fa, _, fu, fi, fd = S.kmv_set_stats(
            S.kmv_sketch(ids(0, 2000), "v"), S.kmv_sketch(ids(2000, 4000), "v"))
        assert abs(fa - 2000) < 700, fa
        assert abs(fu - 4000) < 1000, fu
        assert fi < 350 and abs(fd - 2000) < 700, (fi, fd)
    finally:
        del os.environ["SLICE_FAST_HASH"]


def test_kmv_null_keys_and_empty_merge(spark):
    """r9 ADVICE pins: (1) NULL keys are excluded from the sketch — a
    NULL hash would sort FIRST and silently occupy a smallest-k slot,
    inflating n while max('h') ignores it; (2) kmv_merge() with zero
    sketches raises a descriptive ValueError, not IndexError."""
    import pytest
    from pyspark.sql import functions as F

    from slice_db_spark.operators import sketches as S

    base = spark.range(0, 50).select(F.col("id").alias("v"))
    with_nulls = base.unionByName(
        spark.range(0, 7).select(F.lit(None).cast("long").alias("v"))
    )
    sk_clean = S.kmv_sketch(base, "v")
    sk_nulls = S.kmv_sketch(with_nulls, "v")
    assert sorted(r.h for r in sk_nulls.collect()) == sorted(
        r.h for r in sk_clean.collect()
    )
    a, b, u, i, d = S.kmv_set_stats(sk_nulls, sk_clean)
    assert (a, b, u, i, d) == (50, 50, 50, 50, 0)

    with pytest.raises(ValueError, match="at least one sketch"):
        S.kmv_merge()
