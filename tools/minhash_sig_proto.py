"""r12 prototype: signature-level MinHash LSH banding (the dhash r11
win shape applied to MinHash) — band over DISTINCT full signatures so a
k-way exact-duplicate group is ONE banding row, then expand verified
fingerprint pairs back to doc pairs (output-sized).

Measures set-equality vs the shipped id-level minhash_band_pairs at
sf0.01, then times both at sf1pb/sf10pb. NOT package code: zero window
impact this round; r12 flips the implementation if the numbers hold.

Usage: python tools/minhash_sig_proto.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandas_etl_framework_spark.llmops.dedup import (  # noqa: E402
    LSH_BANDS,
    NUM_MINHASHES,
    ROWS_PER_BAND,
    _docs,
    minhash_band_pairs,
    minhash_bands,
    minhash_signatures_perm,
    shingles_df,
)
from pandas_etl_framework_spark.session import get_spark  # noqa: E402


def minhash_band_pairs_sig(docs):
    """Signature-level variant: fingerprint = the full 16-minhash tuple;
    identical docs collapse to one banding row."""
    sig = minhash_signatures_perm(shingles_df(docs))
    fp = F.md5(
        F.concat_ws(
            "|", *[F.col(f"mh{i}").cast("string") for i in range(NUM_MINHASHES)]
        )
    )
    sig = sig.withColumn("fp", fp)
    ids = sig.select("doc_id", "fp").localCheckpoint(eager=True)
    dsig = sig.drop("doc_id").dropDuplicates(["fp"]).localCheckpoint(eager=True)
    band_structs = [
        F.struct(
            F.lit(b).cast("long").alias("band"),
            F.concat_ws(
                "|",
                *[
                    F.col(f"mh{b * ROWS_PER_BAND + i}").cast("string")
                    for i in range(ROWS_PER_BAND)
                ],
            ).alias("band_key"),
        )
        for b in range(LSH_BANDS)
    ]
    hb = dsig.select("fp", F.explode(F.array(*band_structs)).alias("bk")).select(
        "fp", "bk.band", "bk.band_key"
    )
    a, b = hb.alias("a"), hb.alias("b")
    fpairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.fp") < F.col("b.fp"))
        .select(F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .distinct()
    )
    cross = (
        fpairs.join(ids.select(F.col("fp").alias("fp_a"), "doc_id"), "fp_a")
        .withColumnRenamed("doc_id", "id_x")
        .join(ids.select(F.col("fp").alias("fp_b"), "doc_id"), "fp_b")
        .withColumnRenamed("doc_id", "id_y")
        .select(
            F.least("id_x", "id_y").alias("doc_a"),
            F.greatest("id_x", "id_y").alias("doc_b"),
        )
    )
    x, y = ids.alias("x"), ids.alias("y")
    equal = (
        x.join(y, "fp")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
    )
    return cross.unionByName(equal)


def main():
    spark = get_spark(
        app_name="minhash-sig-proto",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. equality at sf0.01
    docs = _docs(spark, "/root/testdata/sf0.01")
    old = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_band_pairs(minhash_bands(docs)).collect()
    }
    new = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_band_pairs_sig(docs).collect()
    }
    print(f"sf0.01 equality: old={len(old)} new={len(new)} equal={old == new}")
    assert old == new

    # 2. timing at the replica scales
    scratch = os.path.dirname(os.path.abspath(__file__))
    for label, sf in (("sf1pb", f"{scratch}/sf1pb"), ("sf10pb", f"{scratch}/sf10pb")):
        for name, fn in (
            ("id-level", lambda d: minhash_band_pairs(minhash_bands(d))),
            ("sig-level", minhash_band_pairs_sig),
        ):
            d = _docs(spark, sf)
            fn(d).write.mode("overwrite").format("noop").save()  # warm
            t0 = time.time()
            fn(d).write.mode("overwrite").format("noop").save()
            print(f"{label} {name}: {time.time() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
