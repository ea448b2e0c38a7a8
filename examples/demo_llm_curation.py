"""Usage demo: an LLM training-data curation pass over the documents
table — quality gates, exact + fuzzy dedup, tokenizer training, sequence
packing, and shuffled shard layout, all composed from the library.

Run: python examples/demo_llm_curation.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_etl_framework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import functions as F

    from pandas_etl_framework_spark.llmops.curation import (
        shuffle_shard,
        write_training_shards,
    )
    from pandas_etl_framework_spark.llmops.dedup import (
        deduplicate,
        jaccard_prefix_pairs,
        token_sets_df,
    )
    from pandas_etl_framework_spark.llmops.text import (
        bpe_encode,
        bpe_train,
        quality_ratio_cols,
    )

    spark = get_spark(app_name="demo_llm_curation", master="local[8]",
                      shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"corpus: {docs.count()} docs")

    # 1. quality gate
    _, _, _, score = quality_ratio_cols()
    kept = docs.withColumn("q", score).filter(F.col("q") > 0.5).drop("q")
    print(f"quality gate: {kept.count()} kept")

    # 2. exact dedup (deterministic keeper), then fuzzy near-dup pairs
    exact = deduplicate(kept, ["text"], "doc_id")
    pairs = jaccard_prefix_pairs(token_sets_df(exact))
    drop = {r["doc_b"] for r in pairs.select("doc_b").distinct().collect()}
    deduped = exact.filter(~F.col("doc_id").isin(*drop) if drop else F.lit(True))
    print(f"dedup: {exact.count()} after exact, {deduped.count()} after fuzzy")

    # 3. tokenizer training + encoding
    merges, _ = bpe_train(deduped, n_merges=8)
    print(f"bpe merges: {[(l, r) for l, r, _ in merges[:5]]} ...")
    encoded = bpe_encode(deduped, merges)
    total_tokens = encoded.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"encoded: {total_tokens} BPE tokens")

    # 4. shuffled shard layout
    with tempfile.TemporaryDirectory() as tmp:
        write_training_shards(deduped, f"{tmp}/shards", n_shards=4)
        back = spark.read.parquet(f"{tmp}/shards")
        per_shard = back.groupBy("shard").count().orderBy("shard").collect()
        print("shards:", {r["shard"]: r["count"] for r in per_shard})
    order = shuffle_shard(deduped, n_shards=4)
    print("first 3 in training order:",
          [r["doc_id"] for r in order.orderBy("shard", "pos").limit(3).collect()])
    spark.stop()


if __name__ == "__main__":
    main()
