"""sf0.1 -> sf1 scaling rehearsal (VERDICT r05 item 6): run the top
headline queries on the 10x key-offset replica dataset built by
tools/make_sf1.py and report the slope t(sf1)/t(sf0.1) — 10x data on
fixed cores; slope 10 = fully data-bound linear, below = amortizing,
well above ~12 = a super-linear scale hazard to investigate.

Usage: python tools/make_sf1.py && python tools/scaling_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
# SPARK_GRAFT_SF1_DIR points the 10x leg at an alternative replica set,
# e.g. scratch/sf1pb (make_sf1.py --pair-budget) for the linear-pair
# dhash row
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scratch", "sf1",
)

# top-10 headline queries by r05 bench cost, plus two cheap breadth rows
QUERIES = [
    "graph_label_propagation",
    "dedup_keeper_priority",
    "dedup_jaccard_prefix",
    "dedup_containment",
    "emb_kmeans",
    "dedup_minhash_pairs",
    "scd2_merge",
    "cdc_historize_two_runs",
    "emb_topk",
    "tpch_q18",
    "tpch_q5",
    "events_sessionize",
    "dedup_minhash_recall",
    "text_domain_cap",
]


def main() -> None:
    from pandas_etl_framework_spark.harness import REGISTRY
    from pandas_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="scaling-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = sys.argv[1:] or QUERIES
    out: dict[str, dict[str, float]] = {}
    for name in queries:
        fn, _sql = REGISTRY[name]
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            row[label] = round(time.time() - t0, 2)
        # a warm cheap query can round to 0.00s; clamp the denominator so
        # one fast cell can't ZeroDivisionError the whole rehearsal
        row["slope"] = round(row["sf1"] / max(row["sf0.1"], 0.01), 1)
        out[name] = row
        print(f"{name}: {row['sf0.1']}s -> {row['sf1']}s  slope {row['slope']}x",
              flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
