"""A/B for text_ccnet_cutoffs' at-scale path (VERDICT r13 item 5): the
row ships exact=True (distributed order-statistic selection — the
oracle-pinnable form) and documents "swap exact=True for approxQuantile
at corpus scale" (CCNet itself computes cutoffs from a sample, Wenzek
et al. 2020). This measures that trade on the sf10 family fixture:

- wall seconds of the CUTOFF COMPUTATION alone, exact vs approx, over
  the same eagerly-checkpointed kn relation (so the shared KN-LM cost
  is excluded from both arms and the A/B isolates exactly the part the
  swap changes);
- end-to-end wall of the full assignment scan per arm (kn + cutoffs +
  CASE projection), the number a pipeline owner sees;
- bucket-assignment DRIFT: how many docs land in a different tercile
  under the approx cutoffs (relative_error=1e-3, the library default).

Usage: python tools/ccnet_cutoff_ab.py [sf_dir]
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
    from pandas_etl_framework_spark.llmops.indexing import (
        ccnet_assign_buckets,
        ccnet_bucket_cutoffs,
        kn_surprisal,
    )
    from pandas_etl_framework_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _SCRATCH, "sf10pb"
    )
    spark = get_spark(app_name="ccnet-cutoff-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    out: dict[str, object] = {"sf_dir": sf_dir}

    # shared scored relation, materialized once (untimed count): the swap
    # changes only the cutoff computation + the literals in the CASE.
    # SERIALIZED blocks per the r13 pagerank recipe — an eager
    # deserialized checkpoint of the whole KN pipeline OOM'd this box.
    from pyspark import StorageLevel

    kn = kn_surprisal(docs).localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    out["n_docs"] = kn.count()

    t0 = time.time()
    _n, cuts_exact = ccnet_bucket_cutoffs(kn, buckets=3, exact=True)
    out["cutoff_exact_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    _n, cuts_approx = ccnet_bucket_cutoffs(kn, buckets=3, exact=False)
    out["cutoff_approx_sec"] = round(time.time() - t0, 2)

    exact_assign = ccnet_assign_buckets(kn, cuts_exact)
    approx_assign = ccnet_assign_buckets(kn, cuts_approx)
    drift = (
        exact_assign.select("doc_id", "ppl_bucket")
        .join(
            approx_assign.select(
                "doc_id", approx_assign.ppl_bucket.alias("b2")
            ),
            "doc_id",
        )
        .filter("ppl_bucket != b2")
        .count()
    )
    out["drift_docs"] = drift

    # end-to-end walls from the raw scan (what a pipeline owner pays).
    # Each leg's lazy localCheckpoint blocks survive clearCache and are
    # only freed when the Python ref dies and ContextCleaner runs —
    # without the gc+sleep below, later legs run with earlier legs'
    # blocks pinning the heap and measure GC pressure, not the swap
    # (first tool version: the approx leg, running last, read 30% SLOWER
    # end-to-end than exact while its isolated stage was 3x faster).
    # Min of two alternating passes, exact first and approx first.
    import gc

    def e2e(exact: bool) -> float:
        t0 = time.time()
        kn_run = kn_surprisal(docs).localCheckpoint(eager=False)
        _n, cuts = ccnet_bucket_cutoffs(kn_run, buckets=3, exact=exact)
        ccnet_assign_buckets(kn_run, cuts).write.mode("overwrite").format(
            "noop"
        ).save()
        dt = round(time.time() - t0, 2)
        del kn_run
        gc.collect()
        time.sleep(2)  # let ContextCleaner drop the checkpoint blocks
        return dt

    walls: dict[str, list[float]] = {"exact": [], "approx": []}
    for exact in (True, False, False, True):
        walls["exact" if exact else "approx"].append(e2e(exact))
    out["e2e_exact_sec"] = min(walls["exact"])
    out["e2e_approx_sec"] = min(walls["approx"])
    out["e2e_passes"] = walls

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
