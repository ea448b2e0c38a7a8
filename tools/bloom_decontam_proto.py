"""Bloom decontamination A/B on the shape the library row's fixture
cannot exhibit (SCALING.md r13 honest-negative follow-up): a train/
benchmark n-gram set far above the broadcast threshold, a large probe
corpus, and a LOW hit rate — the Dolma/BFF-style benchmark-
decontamination shape where bloom prefilters earn their keep.

Arms (identical output, verified by count equality):
  A  exact:      corpus left-semi shuffle join against the 10M-key
                 train relation (the no-sketch baseline; broadcast is
                 disabled for the train side by size).
  B  bloom+conf: right-sized bitset (bits = 16 x keys, k=4 — the
                 proto re-implements the sketches.py construction with
                 parametric width; library default BLOOM_BITS is
                 fixture-sized by design), probed MAP-SIDE: the word
                 table broadcast-joins once per hash position (4 tiny
                 equi-joins, zero shuffles on the corpus side), then
                 only the surviving probes reach the exact confirm
                 join.

Prints one JSON line with wall seconds, survivor counts and the
verified contaminated-row counts for both arms.

Usage: python tools/bloom_decontam_proto.py [n_train] [corpus_sf_dir]
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

# same modulus/coefficients as sketches.py so the proto measures the
# shipped arithmetic, just with a parametric width
_P = 2_147_483_647
_AB = [(387420489, 11), (268435399, 97), (536870909, 101), (805306457, 31)]
WORD_BITS = 32


def main() -> None:
    from pyspark.sql import functions as F

    from pandas_etl_framework_spark.llmops.dedup import shingles_df
    from pandas_etl_framework_spark.session import get_spark

    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _SCRATCH, "sf10pb"
    )
    spark = get_spark(app_name="bloom-decontam-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = shingles_df(docs).localCheckpoint(eager=True)

    # train = n_train synthetic benchmark 3-grams disjoint from the
    # corpus, PLUS a 0.5% sample of true corpus shingles so the hit
    # rate is low but non-zero (the realistic contamination tail)
    synth = spark.range(n_train).select(
        F.concat(F.lit("bench_"), F.col("id").cast("string")).alias(
            "shingle"
        )
    )
    hits = corpus.select("shingle").distinct().sample(0.005, seed=13)
    train = synth.unionByName(hits).localCheckpoint(eager=True)
    n_train_actual = train.count()

    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "n_train": n_train_actual,
        "corpus_rows": corpus.count(),
    }

    def hp(col):
        return F.conv(
            F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
        ).cast("long")

    bits = 1
    while bits < 16 * n_train_actual:
        bits <<= 1
    out["bloom_bits"] = bits

    # A: exact shuffle semi-join (broadcast disabled: train >> threshold)
    t0 = time.time()
    a_rows = corpus.join(
        train.hint("shuffle_hash"), "shingle", "semi"
    ).count()
    out["A_exact_sec"] = round(time.time() - t0, 2)
    out["A_contaminated_rows"] = a_rows

    # B: build right-sized bitset, probe map-side, confirm survivors
    t0 = time.time()
    h = hp("shingle")
    entries = train.select(
        F.explode(
            F.array(
                *[
                    ((F.lit(a) * h + F.lit(b)) % _P % bits).alias("p")
                    for a, b in _AB
                ]
            )
        ).alias("pos")
    )
    words = (
        entries.groupBy(
            F.expr(f"div(pos, {WORD_BITS})").alias("word")
        )
        .agg(
            F.expr(
                f"bit_or(shiftleft(cast(1 as bigint),"
                f" cast(pos % {WORD_BITS} as int)))"
            ).alias("w")
        )
        .localCheckpoint(eager=True)
    )
    out["bloom_words"] = words.count()
    # build done — separate timer for the probe+confirm legs, the cost a
    # reusing pipeline pays per ingest batch (BFF-style: the benchmark
    # bitset is built once and amortized over every batch)
    out["B_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    cur = corpus.select("shingle").distinct()
    for i, (a, b) in enumerate(_AB):
        cur = cur.withColumn(
            "_pos", (F.lit(a) * hp("shingle") + F.lit(b)) % _P % bits
        )
        wtab = words.select(
            F.col("word").alias("_word"), F.col("w").alias("_w")
        )
        cur = (
            cur.join(
                F.broadcast(wtab),
                F.floor(F.col("_pos") / WORD_BITS) == F.col("_word"),
                "left",
            )
            .filter(
                F.coalesce(
                    F.expr(
                        f"(_w & shiftleft(cast(1 as bigint),"
                        f" cast(_pos % {WORD_BITS} as int))) <> 0"
                    ),
                    F.lit(False),
                )
            )
            .select("shingle")
        )
    survivors = cur.localCheckpoint(eager=True)
    out["bloom_survivors"] = survivors.count()
    confirmed = survivors.join(
        train.hint("shuffle_hash"), "shingle", "semi"
    )
    b_rows = corpus.join(F.broadcast(confirmed), "shingle", "semi").count()
    out["B_probe_confirm_sec"] = round(time.time() - t0, 2)
    out["B_bloom_sec"] = round(
        out["B_build_sec"] + out["B_probe_confirm_sec"], 2
    )
    out["B_contaminated_rows"] = b_rows
    out["arms_agree"] = bool(a_rows == b_rows)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
