"""Round-5 behavior tests: the ADVICE-driven guards (as-of output-name
collisions, random_projection dim overrun / vec_col honoring, shared
store-read dtype restore) and the BPE VALUES-oracle generator."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# as-of join: generated output names must be fresh
# --------------------------------------------------------------------------

def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "x")], "k long, t long, v_asof string"
    ).select("k", F.timestamp_seconds("t").alias("t"), "v_asof")
    right = spark.createDataFrame(
        [(1, 5, 7.0)], "k long, t long, v double"
    ).select("k", F.timestamp_seconds("t").alias("t"), "v")
    return left, right


def test_asof_join_rejects_generated_name_collision(spark):
    """A left column literally named '<col><suffix>' (v_asof) would
    silently duplicate in the output schema; both variants must refuse."""
    from pandas_etl_framework_spark.asof import asof_join, asof_join_nearest

    left, right = _asof_frames(spark)
    with pytest.raises(ValueError, match="generated as-of output"):
        asof_join(left, right, ["k"], "t", "t", right_value_cols=["v"])
    with pytest.raises(ValueError, match="generated as-of output"):
        asof_join_nearest(
            left, right, ["k"], "t", "t", right_value_cols=["v"]
        )
    # a different suffix dodges the collision and works
    out = asof_join(
        left, right, ["k"], "t", "t", right_value_cols=["v"], suffix="_bwd"
    )
    assert out.columns.count("v_bwd") == 1
    assert out.collect()[0]["v_bwd"] == 7.0


# --------------------------------------------------------------------------
# random_projection: vec_col honored, dim overrun is loud
# --------------------------------------------------------------------------

def test_random_projection_honors_vec_col(spark):
    from pandas_etl_framework_spark.llmops.projection import random_projection

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    renamed = emb.select("vec_id", F.col("embedding").alias("vec"))
    a = random_projection(emb, k=2).orderBy("vec_id").limit(5).collect()
    b = (
        random_projection(renamed, k=2, vec_col="vec")
        .orderBy("vec_id")
        .limit(5)
        .collect()
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_random_projection_dim_mismatch_raises(spark):
    """dim > actual array length used to null-pad via zip_with and emit
    silent NULL sums (and dim < length silently truncated); any mismatch
    must now raise with a message naming the actual problem."""
    from pandas_etl_framework_spark.llmops.projection import random_projection

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10)
    with pytest.raises(Exception, match="length <> dim"):
        random_projection(emb, k=1, dim=65).collect()
    with pytest.raises(Exception, match="length <> dim"):
        random_projection(emb, k=1, dim=63).collect()


# --------------------------------------------------------------------------
# read_store: run-id dtype restore for every consumer
# --------------------------------------------------------------------------

def test_read_store_restores_run_id_dtype(spark):
    """A store partitioned on INSERT_RUN_ID comes back BIGINT from hive
    type inference via the raw reader; read_store restores the declared
    string dtype (and the values round-trip identically)."""
    from pandas_etl_framework_spark.constants import INSERT_RUN_ID
    from pandas_etl_framework_spark.io import read_parquet_df, read_store

    df = spark.createDataFrame(
        [(1, "a", "20240110080000"), (2, "b", "20240111080000")],
        f"id long, v string, {INSERT_RUN_ID} string",
    )
    path = tempfile.mkdtemp() + "/store"
    df.write.partitionBy(INSERT_RUN_ID).parquet(path)

    raw = read_parquet_df(spark, path)
    assert dict(raw.dtypes)[INSERT_RUN_ID] == "bigint"  # the hazard
    restored = read_store(spark, path)
    assert dict(restored.dtypes)[INSERT_RUN_ID] == "string"
    got = {
        (r["id"], r[INSERT_RUN_ID]) for r in restored.collect()
    }
    assert got == {(1, "20240110080000"), (2, "20240111080000")}
    assert read_store(spark, "/nonexistent/nowhere") is None


# --------------------------------------------------------------------------
# BPE VALUES oracle generator
# --------------------------------------------------------------------------

def test_bpe_values_oracle_matches_python_trainer():
    """The generated VALUES SQL must evaluate (in DuckDB) to exactly the
    pure-Python trainer's merge rows, including SQL-quote escaping."""
    import duckdb

    from pandas_etl_framework_spark.llmops.text import (
        _sql_text_bpe_train,
        bpe_train_python,
    )

    sql = _sql_text_bpe_train(n_merges=10)
    rows = duckdb.sql(sql).fetchall()
    import os

    import pyarrow.parquet as pq

    sf_dir = os.environ.get(
        "SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01"
    )
    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    merges, _ = bpe_train_python(texts, 10)
    assert rows == [
        (i + 1, left, right, c) for i, (left, right, c) in enumerate(merges)
    ]


def test_bpe_python_trainer_merge_semantics():
    """Greedy left-to-right non-overlap + (count DESC, left, right) ties
    on a hand-checkable corpus: 'aaab aaab ab' → first merge ('a','a')
    count 4 (two per 'aaab' word-occurrence... non-overlapping → 1 each
    of 'aa' per pass? verify exactly), then the learned segmentations."""
    from pandas_etl_framework_spark.llmops.text import bpe_train_python

    merges, segs = bpe_train_python(["aaab aaab ab"], 3)
    # word freqs: aaab ×2, ab ×1. Round 1 pair counts:
    #   (a,a): 2 per 'aaab' × 2 = 4;  (a,b): 1×2 + 1 = 3  → merge (a,a,4)
    assert merges[0] == ("a", "a", 4)
    # 'aaab' → [aa, a, b] (non-overlapping left-to-right), 'ab' → [a, b]
    assert segs["aaab"] != ["a", "a", "a", "b"]
    # Round 2 counts: (aa,a): 2, (a,b): 3 → merge (a,b,3)
    assert merges[1] == ("a", "b", 3)
    assert segs["ab"] == ["ab"]


# --------------------------------------------------------------------------
# containment join: asymmetric subset-duplicate detection
# --------------------------------------------------------------------------

def test_containment_catches_subset_duplicates_jaccard_misses(spark):
    """A short doc embedded verbatim in a much longer one: containment
    (inner in outer) = 1.0 while Jaccard is far below its threshold —
    the exact case the asymmetric operator exists for. Direction matters:
    the long doc is NOT contained in the short one."""
    from pandas_etl_framework_spark.llmops.dedup import (
        containment_pairs,
        jaccard_prefix_pairs,
        token_sets_df,
    )

    short = " ".join(f"w{i}" for i in range(12))
    long = short + " " + " ".join(f"z{i}" for i in range(60))
    other = " ".join(f"q{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], "doc_id long, text string"
    )
    ts = token_sets_df(docs)
    got = {
        (r["doc_inner"], r["doc_outer"]): r["containment"]
        for r in containment_pairs(ts).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (2, 1) not in got
    assert all(3 not in pair for pair in got)
    # symmetric Jaccard at t=0.6 misses the same pair entirely
    jac = jaccard_prefix_pairs(token_sets_df(docs)).collect()
    assert not any({r["doc_a"], r["doc_b"]} == {1, 2} for r in jac)


def test_keeper_priority_overrides_min_id(spark):
    """Policy keeper: in a cluster {1,2,3} where doc 3 has the best
    source priority, the keeper is 3 — NOT the min id 1 that
    dedup_clusters would pick; singletons keep themselves."""
    from pandas_etl_framework_spark.llmops.dedup import (
        dedup_clusters,
        dedup_keeper_by_priority,
    )

    docs = spark.createDataFrame(
        [(1, 5), (2, 7), (3, 2), (9, 9)], "doc_id long, prio int"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["keeper_doc_id"], r["is_keeper"])
        for r in dedup_keeper_by_priority(
            docs, pairs, F.col("prio")
        ).collect()
    }
    assert got == {1: (3, False), 2: (3, False), 3: (3, True), 9: (9, True)}
    # the min-id policy on the same graph picks 1 — different keeper
    min_id = {
        r["doc_id"]: r["keeper_doc_id"]
        for r in dedup_clusters(
            docs.select("doc_id"), pairs
        ).collect()
    }
    assert min_id[3] == 1


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_containment_prefix_filter_lossless_random(spark, seed):
    """Prefix-filter losslessness beyond the fixture: on random corpora
    from a small alphabet (dense near-dup structure), the Spark operator
    must emit exactly the pairs a pure-Python brute force finds."""
    import random

    from pandas_etl_framework_spark.llmops.dedup import (
        CONT_C_DEN,
        CONT_C_NUM,
        CONT_MIN_SIZE,
        containment_pairs,
        token_sets_df,
    )

    rng = random.Random(seed)
    alphabet = [f"t{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(5, 40))))
        for i in range(40)
    ]
    got = {
        (r["doc_inner"], r["doc_outer"], r["intersection"])
        for r in containment_pairs(
            token_sets_df(
                spark.createDataFrame(docs, "doc_id long, text string")
            )
        ).collect()
    }

    def shingle_set(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingle_set(tx) for i, tx in docs}
    want = set()
    for a, sa in sets.items():
        if len(sa) < CONT_MIN_SIZE:
            continue
        for b, sb in sets.items():
            if a == b or len(sb) < CONT_MIN_SIZE:
                continue
            inter = len(sa & sb)
            if CONT_C_DEN * inter >= CONT_C_NUM * len(sa):
                want.add((a, b, inter))
    assert got == want


def test_mad_outliers_hand_computed(spark):
    """Hand-checkable MAD summary, including the MAD=0 edge (constant
    series + one spike: every nonzero deviation is an outlier)."""
    from pandas_etl_framework_spark.relational_ts import mad_outliers

    rows = (
        [(1, 1.0)] * 4 + [(1, 100.0)]
        + [(2, 0.0), (2, 2.0), (2, 4.0), (2, 6.0), (2, 1000.0)]
    )
    ev = spark.createDataFrame(rows, "user_id long, value double")
    got = {
        r["user_id"]: (
            r["n"], r["median_value"], r["mad_value"], r["n_outliers"]
        )
        for r in mad_outliers(ev).collect()
    }
    # user 1: median 1.0, deviations [0,0,0,0,99] -> MAD 0; rule
    # 1e4*dev > 0 flags exactly the spike
    assert got[1] == (5, 1.0, 0.0, 1)
    # user 2: median 4.0, deviations [4,2,0,2,996] -> MAD 2.0;
    # threshold 3*1.4826*2 = 8.8956 -> only 996 exceeds
    assert got[2] == (5, 4.0, 2.0, 1)
