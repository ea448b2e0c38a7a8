"""Generate SCALING.md: wall time of representative queries across
sf0.001 / sf0.01 / sf0.1 (100x data growth on fixed cores), steady-state
(second run per sf after a warm-up run). Near-flat small-sf times show
fixed overhead; the 0.01→0.1 ratio shows the data-bound scaling slope.

Usage: python tools/scaling_report.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "cdc_historize_two_runs",
    "scd2_merge",
    "tpch_q5",
    "tpch_q18",
    "dedup_minhash_pairs",
    "text_gopher_rules",
    "events_sessionize",
    "graph_pagerank",
    "emb_kmeans",
    "emb_semantic_dedup",
    "text_boilerplate",
    "text_tfidf_topk",
    "dedup_jaccard_prefix",
    "rel_salted_join",
    "text_classifier",
    "text_bigram_logprob",
    "graph_triangles",
    "emb_covariance",
    "graph_khop",
    "scd2_pit_join",
    "emb_random_projection",
    "multimodal_phash_dedup",
    "text_shuffle_shard",
    "events_ewma",
    "dedup_containment",
    "dedup_keeper_priority",
    "events_mad_outliers",
    "text_domain_cap",
    "text_oov_rate",
    "dedup_minhash_recall",
    "rel_key_skew_profile",
    # r07 additions
    "rel_auto_skew_join",
    "emb_ivfpq_topk",
    "multimodal_dhash_neardup",
]


def main() -> None:
    from pandas_etl_framework_spark.harness import REGISTRY
    from pandas_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows: dict[str, list[float]] = {name: [] for name in QUERIES}
    for sf_dir in SFS:
        for name in QUERIES:
            fn, _sql = REGISTRY[name]
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            rows[name].append(round(time.time() - t0, 3))

    lines = [
        "# SCALING — steady-state wall seconds across 100x data growth",
        "",
        "Fixed local[32]; per-cell: warm-up run discarded, second run reported.",
        "`slope` = t(sf0.1) / t(sf0.01) on 10x more data (1.0 = fully",
        "overhead-bound, 10 = linear in data; below 10 = scan/shuffle costs",
        "amortizing, the regime that holds on a real cluster).",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | slope(0.01→0.1) |",
        "|---|---|---|---|---|",
    ]
    for name, ts in rows.items():
        slope = round(ts[2] / ts[1], 1) if ts[1] > 0 else float("nan")
        lines.append(
            f"| {name} | {ts[0]:.2f}s | {ts[1]:.2f}s | {ts[2]:.2f}s | {slope}x |"
        )
    lines.append("")
    # Preserve every narrative section of the EXISTING file (everything
    # from its first "## " heading onward) — the hard-coded NARRATIVE
    # constant below is only the bootstrap for a missing file. Without
    # this, regenerating the table silently clobbered the per-round
    # evidence sections added after the tool last ran.
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    narrative = NARRATIVE
    if os.path.exists(path):
        with open(path) as fh:
            existing = fh.read()
        idx = existing.find("\n## ")
        if idx != -1:
            narrative = existing[idx + 1:]
    lines.append(narrative)
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    print("wrote SCALING.md")
    spark.stop()


NARRATIVE = """\
## Benchmark evidence across rounds (bench.py, sf0.1, local[32])

- r01: 27.35 s headline-suite total (BENCH_r01.json) — the anchor.
- r02: no number — `events.parquet` drifted to TIMESTAMP_NTZ under
  PySpark 4.1.2 and the bench crashed before timing anything.
- r03 (local re-runs, post-fix): **19.2-23.3 s** depending on machine
  noise (19.2 s on an idle box), with no per-query regression vs r01
  beyond run-to-run variance.
  Movers: dedup_jaccard_prefix 6.95→2.5 s (materialized
  tokenized shingles + PPJoin positional filter + array_intersect
  verification), graph_pagerank 6.92→3.5 s (loop-invariant
  checkpointing), emb_semantic_dedup 4.7→1.3 s (per-cluster BLAS GEMM
  scoring), rel_salted_join 2.6→1.1 s (shuffle_hash instead of
  broadcasting the replicated side), dedup_minhash_pairs 1.9→1.2 s
  (band table checkpointed, not advisorily cached).

## Why these shapes survive a 1000-executor / 100 TB scale-up

Per family, the resource that grows with data and the mechanism that keeps
it partition-local:

- **CDC / SCD2 (cdc_historize, scd2_merge).** Work per run is one anti- or
  full-outer join on uniform md5 keys. The store side is read column-pruned
  to the two hash columns (plan-asserted), so join input bytes scale with
  row count, not row width; keys are uniform by construction so no skew
  path is needed. With the store bucketed on KEY_HASH
  (scale.write_bucketed_store, plan-asserted shuffle-free), steady-state
  runs shuffle only the incoming batch.
- **TPC-H joins/aggregates.** Dimensions broadcast; fact-fact joins shuffle
  once on their keys with AQE handling runtime skew; every aggregate is a
  built-in hash aggregate with map-side partials, so reduce-side bytes are
  bounded by group cardinality, not input rows.
- **Dedup (minhash, jaccard-prefix).** The shingle explosion is a pure map
  stage; signatures reduce each doc to a constant-width row; LSH banding /
  prefix filtering bound the candidate space by bucket collisions rather
  than n². The verify join touches candidate pairs only — at 100 TB the
  quadratic term never materializes.
- **Embeddings (kmeans, semdedup, topk, ivf/pq).** Assignment ships the
  driver-sized (k × dim) centroid table inside an Arrow map closure and
  runs one BLAS GEMM per batch — integer-exact in float64, no k× row
  blowup; centroid updates shuffle (k × dim) partial sums — independent
  of corpus size. Within-cluster semantic-dedup scoring is one GEMM per
  cluster group. ANN paths (LSH/IVF/PQ) bound per-query work by
  bucket/probe size.
- **Text analytics (tfidf, surprisal, boilerplate).** Token explosions are
  map-local; every downstream aggregate is (term)- or (doc)-keyed with
  map-side combine; vocabulary-keyed joins broadcast (vocab ≪ corpus).
  Posting lists and top-k outputs are bounded before aggregation (window
  rank ≤ cap), so no per-key state grows with df.
- **Windows (sessionize, version history, snapshot).** All windows
  partition by high-cardinality keys (user, KEY_HASH) — no global windows
  on growing relations anywhere in the hot path; the two global-order
  windows (RFM quartiles, weighted reservoir rank) run on already-reduced
  per-user/top-k relations and are documented with their approx-threshold
  swap for the regime where even those grow.
- **Streaming.** Watermarks bound state; sessions use
  applyInPandasWithState with per-key timeouts; the stream-stream join is
  interval-bounded both sides. State size is O(active keys), not O(events
  seen).

The 10x-replication smoke in PLANS.md shows the same plans at ~sf1 with
sub-linear wall growth on fixed cores; nothing in the plan shapes changes
with more executors — shuffle partition counts and AQE coalescing are the
only knobs that move.
"""


if __name__ == "__main__":
    main()
