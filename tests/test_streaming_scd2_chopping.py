"""Micro-batch-chopping invariance of the pinned-context streaming SCD2
merge (round 6).

The oracle row streaming_scd2_merge relies on the claim that merging
same-context SUB-batches sequentially equals one merge of the whole
load (keys within a load are unique, so sub-batch merges only ever take
the new_only branch against disjoint keys). This test forces the
chopping with maxFilesPerTrigger=1 — each load split across multiple
files, each file its own micro-batch — and asserts the store is
IDENTICAL to the batch merge_scd2 result, audit columns included.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.constants import (
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
)
from pandas_etl_framework_spark.meta_columns import (
    add_meta_columns,
    create_currents,
)
from pandas_etl_framework_spark.scd2 import historize_dataset, merge_scd2
from pandas_etl_framework_spark.scd2_store import Scd2Store
from pandas_etl_framework_spark.streaming.historize import (
    streaming_scd2_merge,
)

RUN1_TS = "2024-03-01 08:00:00"
RUN2_TS = "2024-03-02 08:00:00"


def _batches(spark):
    b1 = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(40)],
        "k long, payload string, amount double",
    )
    # run 2: keys 20..49, with 20..29 changed
    b2 = spark.createDataFrame(
        [
            (i, f"v{i}x" if i < 30 else f"v{i}", float(i))
            for i in range(20, 50)
        ],
        "k long, payload string, amount double",
    )
    return b1, b2


def test_chopped_stream_equals_batch_merge(spark, tmp_path):
    b1, b2 = _batches(spark)
    src = tmp_path / "src"
    src.mkdir()
    # each load lands as 3 separate files -> with maxFilesPerTrigger=1
    # each availableNow run executes 3 sequential same-context merges
    b1.repartition(3).write.parquet(str(src / "load1"))
    store_path, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    runs = [
        (create_currents(RUN1_TS), VALID_FROM_MODE_LOWER_BOUND),
        (create_currents(RUN2_TS), VALID_FROM_MODE_LOAD_DATE),
    ]
    for i, (ctx, mode) in enumerate(runs):
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        q = streaming_scd2_merge(
            spark,
            stream,
            store_path,
            ckpt,
            ["k"],
            valid_from_mode=mode,
            trigger_once=True,
            currents=ctx,
        )
        q.awaitTermination()
        if i == 0:
            b2.repartition(3).write.parquet(str(src / "load2"))

    # batch twin with the identical pinned contexts
    c1, c2 = runs[0][0], runs[1][0]
    merged = historize_dataset(
        add_meta_columns(b1, c1, ["k"]), None, c1, VALID_FROM_MODE_LOWER_BOUND
    )
    merged = merge_scd2(
        merged,
        add_meta_columns(b2, c2, ["k"]),
        c2,
        VALID_FROM_MODE_LOAD_DATE,
    )

    streamed = Scd2Store(spark, store_path).read()
    cols = sorted(merged.columns)
    a = sorted(map(tuple, streamed.select(*cols).collect()))
    b = sorted(map(tuple, merged.select(*cols).collect()))
    assert a == b, "chopped micro-batch merge diverged from batch merge"
    # sanity on the shape: 40 base + 10 new keys + 10 closed-out versions
    assert len(a) == 60
    open_rows = streamed.filter(F.col("VALID_TO") == F.lit("9999-12-31").cast("date"))
    assert open_rows.groupBy("KEY_HASH").count().filter("count > 1").count() == 0
