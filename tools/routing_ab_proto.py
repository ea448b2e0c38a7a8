"""A/B measurement for the capped-PPJoin -> MinHash-cluster routing
recipe (VERDICT r12 item 6) on the sf10pb suffix fixture — the shape
whose EXACT pair join exhausted the disk in the r12 rehearsal.

A: the shipped capped join alone (prefix_cap=64): exact pairs sharing a
   quiet prefix token; giant families dropped with hot-token accounting.
B: jaccard_prefix_with_cluster_routing: the same capped pairs PLUS
   keeper assignments over the routed hot-family docs via MinHash
   banding + bucket-star edges + connected components — the
   families-as-clusters deliverable at banding cost, instead of the
   families x mult^2 pair enumeration that crashed.

Prints one JSON line with wall seconds and output sizes for both arms.

Usage: python tools/routing_ab_proto.py [sf_dir] [prefix_cap]
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


def main() -> None:
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_hot_family_docs,
        jaccard_prefix_pairs,
        jaccard_prefix_with_cluster_routing,
        token_sets_df,
    )
    from pandas_etl_framework_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _SCRATCH, "sf10pb"
    )
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="routing-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    out: dict[str, object] = {"sf_dir": sf_dir, "prefix_cap": cap}

    # A: capped join alone (the shipped r12 arm)
    t0 = time.time()
    pairs_a = jaccard_prefix_pairs(token_sets_df(docs), prefix_cap=cap)
    pairs_a.write.mode("overwrite").format("noop").save()
    out["A_capped_sec"] = round(time.time() - t0, 2)
    out["A_pairs"] = pairs_a.count()
    spark.catalog.clearCache()

    # routing signal size on its own (the audit relation)
    t0 = time.time()
    routed = jaccard_hot_family_docs(token_sets_df(docs), prefix_cap=cap)
    out["routed_docs"] = routed.count()
    out["routed_signal_sec"] = round(time.time() - t0, 2)
    spark.catalog.clearCache()

    # B: capped pairs + clusters over the routed docs
    t0 = time.time()
    pairs_b, clusters = jaccard_prefix_with_cluster_routing(docs, cap)
    pairs_b.write.mode("overwrite").format("noop").save()
    clusters.write.mode("overwrite").format("noop").save()
    out["B_capped_plus_clusters_sec"] = round(time.time() - t0, 2)
    out["B_pairs"] = pairs_b.count()
    out["B_cluster_rows"] = clusters.count()
    out["B_keepers"] = clusters.filter("is_keeper").count()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
