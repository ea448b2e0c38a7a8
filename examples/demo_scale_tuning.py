"""Usage demo: the measure-don't-guess tuning loop before launching a
100 TB job — profile join-key skew to choose a join strategy, measure
the LSH candidate generator's recall/precision (on a sample) before
trusting it for corpus dedup, and apply the per-source doc cap with the
straggler-proof two-phase top-k.

Run: python examples/demo_scale_tuning.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_etl_framework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pandas_etl_framework_spark.llmops.curation import source_doc_cap
    from pandas_etl_framework_spark.llmops.dedup import minhash_recall_report
    from pandas_etl_framework_spark.scale import key_skew_profile

    spark = get_spark(app_name="demo-scale-tuning")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Skew profile BEFORE the join: if the top key owns a few percent
    #    of the rows, a plain shuffle join gets a straggler — reach for
    #    scale.salted_join / AQE skew handling; if the hottest keys are
    #    uniform (as md5-derived keys are), join plainly.
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    print("== l_suppkey skew profile (top 5) ==")
    for r in key_skew_profile(li, "l_suppkey", top_k=5).collect():
        print(
            f"  rank {r['rank']}: key {r['l_suppkey']} "
            f"n={r['n']} share={r['share']:.4f} cum={r['cum_share']:.4f}"
        )

    # 2. LSH quality BEFORE trusting it: recall vs exact ground truth,
    #    measured on a deterministic half-sample (exact truth is the
    #    quadratic baseline — never run it on the full corpus at scale).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = minhash_recall_report(spark, docs, sample_mod=2).collect()[0]
    print("== MinHash-LSH candidate quality (sample_mod=2) ==")
    print(
        f"  true pairs {rep['n_true']}, candidates {rep['n_candidates']}, "
        f"hits {rep['n_hits']} -> recall {rep['recall']:.3f}, "
        f"precision {rep['precision']:.3f}"
    )

    # 3. Domain cap with the two-phase top-k (never one window task per
    #    hot domain): keep the 5 longest docs per source.
    capped = source_doc_cap(docs, cap=5)
    print("== per-source doc cap (cap=5) ==")
    print(f"  kept {capped.count()} docs over "
          f"{capped.select('source').distinct().count()} sources")

    spark.stop()


if __name__ == "__main__":
    main()
