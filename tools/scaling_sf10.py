"""sf1 -> sf10 scaling rehearsal for the r10 document-pipeline families
(VERDICT r10 item 4): run the substring-dedup / decontaminate /
batch-BM25 rows on the 100-replica pair-budget documents fixture
(tools/make_sf1.py --sf10) against the 10-replica one (--pair-budget)
and report the slope t(sf10)/t(sf1) — 10x data on fixed cores; slope 10
= fully data-bound linear, below = amortizing, well above ~12 = a
super-linear scale hazard to investigate. Both legs use the SAME
pair-budget construction (documents-only, 1e9 doc_id offsets), so the
slope isolates data growth from workload-shape changes.

Usage:
    python tools/make_sf1.py --pair-budget
    python tools/make_sf1.py --sf10
    python tools/scaling_sf10.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scratch"
)
SF1 = os.environ.get("SPARK_GRAFT_SF1PB_DIR") or os.path.join(_SCRATCH, "sf1pb")
SF10 = os.environ.get("SPARK_GRAFT_SF10PB_DIR") or os.path.join(
    _SCRATCH, "sf10pb"
)

# the r10 families whose 100-TB design claims rested on one decade
QUERIES = [
    "dedup_substrings",
    "dedup_substrings_incremental",
    "text_decontaminate",
    "text_bm25_batch",
]


def main() -> None:
    from pandas_etl_framework_spark.harness import REGISTRY
    from pandas_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="scaling-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = sys.argv[1:] or QUERIES
    out: dict[str, dict[str, float]] = {}
    for name in queries:
        fn, _sql = REGISTRY[name]
        row: dict[str, float] = {}
        for label, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            row[label] = round(time.time() - t0, 2)
            # opt-in output-size report (one extra execution per leg):
            # needed when the FIXTURE's true-pair count grows faster than
            # its data (suffix replicas are mutually Jaccard-similar), so
            # a slope must be normalized per output row to separate
            # workload growth from implementation behavior.
            if os.environ.get("SPARK_GRAFT_COUNT"):
                row[f"{label}_rows"] = fn(spark, sf_dir).count()
        row["slope"] = round(row["sf10"] / max(row["sf1"], 0.01), 1)
        out[name] = row
        print(
            f"{name}: {row['sf1']}s -> {row['sf10']}s  slope {row['slope']}x",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
