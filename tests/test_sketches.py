"""Portable-HLL accuracy and grouping behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_etl_framework_spark.sketches import hll_distinct


def test_hll_estimate_within_tolerance(spark):
    """Raw HLL with m=256 has ~1.04/sqrt(m) ≈ 6.5% std error; assert 3 sigma."""
    df = spark.range(20_000).select((F.col("id") % 5_000).alias("v"))
    est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
    assert abs(est - 5_000) / 5_000 < 0.20


def test_hll_grouped(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 1_000).alias("v")
    )
    rows = {r["g"]: r["hll_estimate"] for r in
            hll_distinct(df, "v", group_by=["g"]).collect()}
    assert set(rows) == {0, 1}
    for est in rows.values():
        assert abs(est - 500) / 500 < 0.25


def test_countmin_never_undercounts(spark):
    from pandas_etl_framework_spark.sketches import (
        countmin_counters,
        countmin_estimate,
    )

    df = spark.range(10_000).select((F.col("id") % 300).alias("v"))
    counters = countmin_counters(df, "v")
    exact = df.groupBy("v").agg(F.count("*").alias("exact"))
    est = countmin_estimate(counters, exact.select("v"), "v")
    rows = exact.join(est, "v").collect()
    assert len(rows) == 300
    assert all(r["cms_estimate"] >= r["exact"] for r in rows)
    # 300 items in 4x1024 buckets: the min over rows is exact for most keys
    exact_hits = sum(r["cms_estimate"] == r["exact"] for r in rows)
    assert exact_hits > 250


def test_hll_deterministic(spark):
    df = spark.range(5_000).select((F.col("id") % 700).alias("v"))
    a = hll_distinct(df.repartition(16), "v").collect()[0]["hll_estimate"]
    b = hll_distinct(df.coalesce(1), "v").collect()[0]["hll_estimate"]
    assert a == b  # partitioning-independent, bit-exact


def test_kmv_estimate_and_exhaustive_exactness(spark):
    from pandas_etl_framework_spark.sketches import (
        KMV_K,
        _kmv_est,
        _kmv_hash,
        kmv_sketch,
    )

    # large set: estimate within ~3 sigma of 1/sqrt(k-1)
    big = spark.range(30_000).select(_kmv_hash((F.col("id") % 8_000)).alias("h")).distinct()
    sk = kmv_sketch(big)
    est = sk.select(_kmv_est(F.col("theta"), F.col("kk")).alias("e")).first()["e"]
    assert abs(est - 8_000) / 8_000 < 0.20

    # small set fits in the sketch: estimate is exact
    small = spark.range(100).select(_kmv_hash(F.col("id")).alias("h")).distinct()
    sk2 = kmv_sketch(small)
    est2 = sk2.select(_kmv_est(F.col("theta"), F.col("kk")).alias("e")).first()["e"]
    assert est2 == 100.0

    # partitioning-independent
    a = kmv_sketch(big.repartition(16)).first()
    b = kmv_sketch(big.coalesce(1)).first()
    assert (a["theta"], a["kk"]) == (b["theta"], b["kk"])


def test_bloom_no_false_negatives(spark):
    from pandas_etl_framework_spark.sketches import bloom_build, bloom_probe

    members = spark.range(0, 400, 3).select(F.col("id").alias("k"))
    words = bloom_build(members, "k")
    probes = spark.range(1_000).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom_probe(words, probes, "k").collect()}
    member_set = set(range(0, 400, 3))
    assert member_set <= passed  # every member survives
    # filter is small and loaded, but still prunes most non-members
    fp = len(passed - member_set) / (1_000 - len(member_set))
    assert fp < 0.5


def test_incremental_hll_matches_rebuild(spark):
    from pandas_etl_framework_spark.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_registers,
        incremental_hll_update,
    )

    base = spark.range(3_000).select((F.col("id") % 900).alias("v"))
    feed = (
        spark.range(3_000, 5_000)
        .select((F.col("id") % 1_400).alias("v"))
        .withColumn("_change_type", F.lit("insert"))
    )
    regs = hll_registers(base, "v")
    updated = incremental_hll_update(regs, feed, "v")
    inc = hll_estimate_from_registers(updated).first()["hll_estimate"]
    full = hll_distinct(
        base.unionByName(feed.select("v")), "v"
    ).first()["hll_estimate"]
    assert inc == full  # folding the feed == rebuilding from scratch

    # delete rows in the feed are ignored (max-monotone registers)
    feed_del = feed.withColumn("_change_type", F.lit("delete"))
    same = hll_estimate_from_registers(
        incremental_hll_update(regs, feed_del, "v")
    ).first()["hll_estimate"]
    assert same == hll_estimate_from_registers(regs).first()["hll_estimate"]


def test_grouped_merge_chop_invariance(spark):
    """The r12 sketch_hll_merge contract, register-exact and grouped:
    folding ANY disjoint chopping of the data into registers equals the
    single-pass build — per group, for a 3-way chop with a group absent
    from one chop."""
    from pandas_etl_framework_spark.sketches import (
        hll_registers,
        incremental_hll_update,
    )

    rows = spark.range(6_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 1_100).alias("v")
    )
    # chop 0 lacks group 6 entirely (id % 3 == 0 and id % 7 == 6 overlap,
    # so drop it explicitly from the first chop)
    chops = [
        rows.filter((F.col("id") % 3 == 0) & (F.col("g") != 6)),
        rows.filter((F.col("id") % 3 == 1) | ((F.col("id") % 3 == 0) & (F.col("g") == 6))),
        rows.filter(F.col("id") % 3 == 2),
    ]
    regs = hll_registers(chops[0], "v", ["g"])
    for c in chops[1:]:
        regs = incremental_hll_update(regs, c, "v", ["g"])
    full = hll_registers(rows, "v", ["g"])
    merged = {(r["g"], r["reg"]): r["m_j"] for r in regs.collect()}
    direct = {(r["g"], r["reg"]): r["m_j"] for r in full.collect()}
    assert merged == direct
