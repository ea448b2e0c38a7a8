"""Distinct-token-set collapse prototype for the PPJoin Jaccard self-join
(VERDICT r11 items 4/5) — the measurement record behind the r12 SHIP of
the collapse into jaccard_prefix_pairs / containment_pairs themselves.

MEASURED (SCALING.md round-12 section; id-level = the pre-r12
implementation, checkout before the "Collapse the PPJoin family" commit
to reproduce): byte-identical-replica corpora at multiplicity 10/30/100
(scratch/sf1ex, sf3ex, sf10ex) ran id-level 9.95 s / 50.5 s / disk-full
crash (>45 GB candidate spill), set-level 6.09 s / 13.25 s / 46.2 s —
output-tracking — and the duplicate-light control (scratch/sf1pb) ran
9.18 s set-level vs 10.02 s id-level: the collapse is FREE there, unlike
MinHash's (tools/minhash_sig_proto.py, negative), because the dfreq/
prefix/window stages shrink by what the collapse adds. Hence shipped
default-on. This script now exercises the shipped implementation when
invoked ("id-level" requires the pre-ship checkout).

Original question: does the dhash-style build-side collapse —
run candidate generation + verification over DISTINCT token sets, then
expand verified set pairs back to doc pairs — pay on a high-multiplicity
corpus, and what does it cost on a duplicate-light one?

The disposition test mirrors tools/minhash_sig_proto.py (negative there)
and the r11 dhash rewrite (17x win there): the collapse pays if and only
if exact-duplicate multiplicity is high relative to distinct sets,
because a k-way duplicate group pays k^2 in the id-level candidate join
(k * plen prefix rows self-joining within the same buckets) and k^2
verification array-intersections, versus ONE set-level row + an
output-sized expansion.

Fixtures (tools/make_sf1.py): scratch/sf1ex / sf10ex (exact-duplicate
replicas, multiplicity 10/100 — adversarial), scratch/sf1pb / sf10pb
(per-replica suffix, multiplicity ~1 — duplicate-light control).

Losslessness: Jaccard is a function of the two token sets alone, so
collapsing identical sets cannot change the pair set. Equal-set groups
(J = 1.0 exactly, intersection = set_size) are emitted from a per-group
self-join WITHOUT verification; empty sets are excluded from that branch
because the id-level join never pairs them (an empty prefix generates no
candidates), keeping the output row-identical.

Usage: python tools/ppjoin_set_proto.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pandas_etl_framework_spark.llmops.dedup import (
    JACCARD_T_DEN,
    JACCARD_T_NUM,
    jaccard_prefix_pairs,
    token_sets_df,
    _docs,
)


def jaccard_prefix_pairs_setlevel(
    token_sets: DataFrame,
    t_num: int = JACCARD_T_NUM,
    t_den: int = JACCARD_T_DEN,
) -> DataFrame:
    """Set-level PPJoin: collapse identical token sets, run the standard
    prefix-filtered join over one representative per distinct set, expand
    back to (doc_a < doc_b) pairs. Output-identical to
    ``jaccard_prefix_pairs`` (see module docstring for the empty-set
    guard)."""
    ts = token_sets.localCheckpoint(eager=True)
    keyed = ts.withColumn("skey", F.xxhash64("toks"))
    groups = (
        keyed.groupBy("skey")
        .agg(
            F.first("toks").alias("toks"),
            F.first("set_size").alias("set_size"),
            F.count(F.lit(1)).alias("mult"),
        )
        .localCheckpoint(eager=True)
    )
    # candidate + verification over DISTINCT sets; skey stands in for the
    # doc id (jaccard_prefix_pairs only uses it as a join/identity key)
    spairs = jaccard_prefix_pairs(
        groups.select(F.col("skey").alias("doc_id"), "toks", "set_size"),
        t_num=t_num,
        t_den=t_den,
    ).select(
        F.col("doc_a").alias("skey_a"),
        F.col("doc_b").alias("skey_b"),
        "intersection",
        "jaccard",
    )
    ids = keyed.select("skey", "doc_id")
    cross = (
        spairs.join(ids.select(F.col("skey").alias("skey_a"), "doc_id"), "skey_a")
        .withColumnRenamed("doc_id", "id_x")
        .join(
            ids.select(F.col("skey").alias("skey_b"), F.col("doc_id").alias("id_y")),
            "skey_b",
        )
        .select(
            F.least("id_x", "id_y").alias("doc_a"),
            F.greatest("id_x", "id_y").alias("doc_b"),
            "intersection",
            "jaccard",
        )
    )
    x = keyed.filter(F.col("set_size") > 0).alias("x")
    y = keyed.filter(F.col("set_size") > 0).alias("y")
    equal = (
        x.join(y, "skey")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.set_size").cast("long").alias("intersection"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(equal)


def main() -> None:
    from pandas_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="ppjoin-set-proto")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    dirs = sys.argv[1:] or ["scratch/sf1ex", "scratch/sf1pb"]
    for sf_dir in dirs:
        docs = _docs(spark, sf_dir)
        for label, build in (
            ("id-level ", lambda: jaccard_prefix_pairs(token_sets_df(docs))),
            (
                "set-level",
                lambda: jaccard_prefix_pairs_setlevel(token_sets_df(docs)),
            ),
        ):
            spark.catalog.clearCache()
            n = build().count()  # warm
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            print(f"{label} {sf_dir}: rows={n} steady={dt:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
