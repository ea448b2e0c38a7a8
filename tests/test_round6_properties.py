"""Property tests for the round-6 additions.

Spark-dependent properties draw randomized datasets per example but use
a conservative max_examples (Spark jobs per example); pure-Python
properties (threshold parsing) run at full hypothesis depth.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.curation import (
    oov_rate,
    source_doc_cap,
)


# --------------------------------------------------------------------------
# broadcast threshold parsing: pure function, full hypothesis depth
# --------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=1 << 40),
    suffix=st.sampled_from(["", "b", "k", "kb", "m", "mb", "g", "gb", "t", "tb"]),
    caps=st.booleans(),
)
def test_threshold_parse_property(spark, n, suffix, caps):
    from pandas_etl_framework_spark.scale import broadcast_threshold_bytes

    mult = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
            "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30,
            "t": 1 << 40, "tb": 1 << 40}[suffix]
    # Spark itself rejects byte configs >= 2^63; stay in its domain
    n = min(n, ((1 << 62) - 1) // mult)
    raw = f"{n}{suffix.upper() if caps else suffix}"
    key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, raw)
        assert broadcast_threshold_bytes(spark) == n * mult
    finally:
        spark.conf.set(key, saved)


# --------------------------------------------------------------------------
# two-phase doc cap == single global window, under randomized skew
# --------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_docs=st.integers(min_value=1, max_value=120),
    n_sources=st.integers(min_value=1, max_value=6),
    cap=st.integers(min_value=1, max_value=8),
    buckets=st.sampled_from([1, 3, 4, 7]),
)
def test_two_phase_cap_property(spark, seed, n_docs, n_sources, cap, buckets):
    import random

    rng = random.Random(seed)
    rows = [
        (
            i,
            "w",
            f"s{rng.randrange(n_sources)}",
            rng.randrange(0, 50),  # heavy n_chars ties exercise the
        )                           # deterministic (n_chars, doc_id) order
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    got = sorted(
        map(tuple, source_doc_cap(docs, cap=cap, salt_buckets=buckets).collect())
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    want = sorted(
        map(
            tuple,
            docs.select("doc_id", "source", "n_chars")
            .withColumn("rank_in_source", F.row_number().over(w))
            .filter(F.col("rank_in_source") <= cap)
            .collect(),
        )
    )
    assert got == want


# --------------------------------------------------------------------------
# OOV accounting identities under randomized corpora
# --------------------------------------------------------------------------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_docs=st.integers(min_value=1, max_value=40),
    vocab_k=st.integers(min_value=1, max_value=12),
)
def test_oov_rate_property(spark, seed, n_docs, vocab_k):
    import random

    rng = random.Random(seed)
    words = [f"w{j}" for j in range(15)]
    rows = [
        (
            i,
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 20))),
            "s",
            0,
        )
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    out = oov_rate(docs, vocab_k=vocab_k).collect()
    assert len(out) == n_docs
    total_tokens = sum(len(r[1].split()) for r in rows)
    assert sum(r["n_tokens"] for r in out) == total_tokens
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_ratio"] - r["n_oov"] / r["n_tokens"]) < 1e-12
    # vocab_k >= distinct words in corpus -> nothing is OOV
    distinct = len({w for r in rows for w in r[1].split()})
    if vocab_k >= distinct:
        assert all(r["n_oov"] == 0 for r in out)
