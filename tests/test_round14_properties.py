"""Round-14 pins: the star-edge diameter hazard ADVICE r13 named (hub
hops can double min-label propagation distance, so star-edge feeders
need 2x the clique-era max_iterations), the shared prefix build
producing byte-identical results to independent per-stage builds, and
the events_stream_source probe cache."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _chain_bands(spark, k: int):
    """k chained LSH buckets {hub_i, s_i, s_(i+1)} whose hubs are the
    bucket minima: under CLIQUE edges consecutive shared members are
    adjacent (propagation distance ~k), under STAR edges every s_i ->
    s_(i+1) hop routes through hub_i (distance ~2k) — the exact
    diameter-doubling scenario ADVICE r13 called out."""
    rows = []
    for i in range(1, k + 1):
        hub = i * 10_000  # bucket minimum = the star hub
        rows += [
            (hub, 0, f"b{i}"),
            (100_000 + i, 0, f"b{i}"),        # s_i
            (100_000 + i + 1, 0, f"b{i}"),    # s_(i+1)
        ]
    return spark.createDataFrame(rows, ["doc_id", "band", "band_key"])


def test_star_edges_converge_with_log_rounds(spark):
    """r14 pinned the star-edge diameter hazard (hub hops double the
    propagation distance, so star feeders needed 2x the clique-era
    max_iterations). The r15 pointer-jumping rewrite converges in
    O(log diameter) rounds, so BOTH edge shapes now fit the clique-era
    bound — pinned here — while the non-convergence guard still raises
    loudly when the cap is genuinely too small (a 2-round cap cannot
    close a ~15-hop chain even with distance doubling)."""
    from pandas_etl_framework_spark.llmops.dedup import (
        connected_components,
        minhash_band_pairs,
        minhash_band_star_edges,
    )

    bands = _chain_bands(spark, k=8)  # clique distance ~8, star ~15
    cliques = minhash_band_pairs(bands)
    stars = minhash_band_star_edges(bands)
    via_clique = {
        (r["node"], r["component"])
        for r in connected_components(cliques, max_iterations=10).collect()
    }
    # the guard still fires when the cap is genuinely too small
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(stars, max_iterations=2).collect()
    # the r15 property: star edges converge INSIDE the clique-era bound
    # now (log-distance rounds), to the identical components
    via_star = {
        (r["node"], r["component"])
        for r in connected_components(stars, max_iterations=10).collect()
    }
    assert via_star == via_clique
    assert len({c for _n, c in via_star}) == 1  # one chained family


def test_dedup_clusters_forwards_max_iterations(spark):
    from pandas_etl_framework_spark.llmops.dedup import (
        dedup_clusters,
        minhash_band_star_edges,
    )

    bands = _chain_bands(spark, k=8)
    docs = bands.select("doc_id").distinct()
    with pytest.raises(ValueError, match="did not converge"):
        dedup_clusters(
            docs, minhash_band_star_edges(bands), max_iterations=2
        ).collect()
    out = dedup_clusters(
        docs, minhash_band_star_edges(bands), max_iterations=20
    )
    keepers = out.filter("is_keeper").count()
    assert keepers == 1  # one chained family, one keeper


def test_shared_prefix_build_matches_independent_builds(spark):
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_hot_family_docs,
        jaccard_prefix_build,
        jaccard_prefix_pairs,
        token_sets_df,
    )

    body = " ".join(f"w{i}" for i in range(14))
    rows = [(i, f"{body} suffix{i}") for i in range(20)]
    rows += [(100 + j, " ".join(f"q{j}x{i}" for i in range(14)))
             for j in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ts = token_sets_df(docs)
    cap = 5
    shared = jaccard_prefix_build(ts)

    solo_pairs = {
        (r["doc_a"], r["doc_b"], r["intersection"])
        for r in jaccard_prefix_pairs(ts, prefix_cap=cap).collect()
    }
    shared_pairs = {
        (r["doc_a"], r["doc_b"], r["intersection"])
        for r in jaccard_prefix_pairs(
            ts, prefix_cap=cap, shared=shared
        ).collect()
    }
    assert shared_pairs == solo_pairs

    solo_routed = {
        r["doc_id"]
        for r in jaccard_hot_family_docs(ts, prefix_cap=cap).collect()
    }
    shared_routed = {
        r["doc_id"]
        for r in jaccard_hot_family_docs(
            ts, prefix_cap=cap, shared=shared
        ).collect()
    }
    assert shared_routed == solo_routed


def _skewed_pair(spark):
    """A probe with one dominant key (0) plus a tail, and a small side
    that misses some probe keys (and holds keys the probe lacks) — the
    shape every `how` branch needs to disagree on if the hot/cold split
    were wrong."""
    rows = [(0, i) for i in range(400)] + [(k, k) for k in range(1, 60)]
    big = spark.createDataFrame(rows, ["k", "v"])
    small = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 40, 2)] + [(999, "d999")],
        ["k", "d"],
    )
    return big, small


def test_hot_key_salted_join_matches_plain_for_every_how(spark):
    from pandas_etl_framework_spark.scale import salted_join

    big, small = _skewed_pair(spark)
    hot = spark.createDataFrame([(0,)], "k long")
    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = big.join(small, ["k"], how)
        salted = salted_join(big, small, ["k"], how=how, hot_keys=hot)
        pc = sorted(map(tuple, plain.collect()))
        sc = sorted(map(tuple, salted.collect()))
        assert sc == pc, how
    # empty hot relation degenerates to the plain join
    none_hot = spark.createDataFrame([], "k long")
    out = salted_join(big, small, ["k"], how="inner", hot_keys=none_hot)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, big.join(small, ["k"], "inner").collect())
    )


def test_auto_join_salted_branch_uses_bounded_replication(spark):
    """The r14 fix the sf10full rehearsal forced: auto_join's salted
    branch must bound small-side replication to the hot keys — the
    whole-side x16 build OOM'd at the decade. Values must still equal
    the plain join."""
    from pandas_etl_framework_spark.scale import auto_join

    big, small = _skewed_pair(spark)
    out = auto_join(
        big, small, ["k"], how="left",
        skew_share_threshold=0.2, min_hot_rows=50,
    )
    plain = big.join(small, ["k"], "left")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the replicated relation in the plan is hot-key-sized: the explain
    # must carry the semi/anti split rather than a bare x16 small build
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_stream_source_probe_cached_and_layout_agnostic(spark, tmp_path):
    from pandas_etl_framework_spark.streaming.windows import (
        _STREAM_SOURCE_PROBE,
        _path_is_directory,
        events_stream_source,
    )

    # directory-layout fixture written by Spark
    fx = str(tmp_path / "fx")
    spark.range(10).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.lit("a").alias("event_type"),
        F.col("id").cast("double").alias("value"),
        F.col("id").alias("user_id"),
    ).write.parquet(f"{fx}/events.parquet")

    assert _path_is_directory(spark, f"{fx}/events.parquet")
    before = dict(_STREAM_SOURCE_PROBE)
    s1 = events_stream_source(spark, fx)
    # r15: cache keys are (path, mtime) so a rewritten fixture under the
    # same path re-probes (ADVICE r14; tests/test_round15_properties.py
    # pins the invalidation side)
    keys = [k for k in _STREAM_SOURCE_PROBE if k[0] == f"{fx}/events.parquet"]
    assert len(keys) == 1
    probe1 = _STREAM_SOURCE_PROBE[keys[0]]
    s2 = events_stream_source(spark, fx)
    # second call reuses the identical probe tuple — no re-listing
    assert _STREAM_SOURCE_PROBE[keys[0]] is probe1
    assert s1.schema == s2.schema
    # the cache never mutates other paths' entries
    for k, v in before.items():
        assert _STREAM_SOURCE_PROBE.get(k) == v

    # the stream is non-vacuous on the directory layout (the r13 bug)
    out = (
        s1.writeStream.format("memory")
        .queryName("probe_cache_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    assert spark.table("probe_cache_t").count() == 10
    spark.catalog.dropTempView("probe_cache_t")
