"""Round-6 curation additions: the two-phase per-source doc cap and the
corpus top-K OOV rate (oracle rows text_domain_cap / text_oov_rate; the
properties here pin the distributed-shape claims the oracles can't see).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.curation import (
    oov_rate,
    source_doc_cap,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_two_phase_cap_equals_single_window(spark):
    # skewed: src_hot has 40 docs, others few — phase-1 partials must
    # still reproduce the exact single-window global top-k
    rows = [(i, "w", "src_hot", 1000 - i) for i in range(40)]
    rows += [(100 + i, "w", "src_cold", 10 + i) for i in range(3)]
    rows += [(200, "w", "src_one", 5)]
    docs = _docs_df(spark, rows)
    got = source_doc_cap(docs, cap=5, salt_buckets=4)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    want = (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= 5)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # hot source capped at exactly 5, small sources keep everything
    by_src = {r["source"]: 0 for r in got.collect()}
    for r in got.collect():
        by_src[r["source"]] += 1
    assert by_src == {"src_hot": 5, "src_cold": 3, "src_one": 1}


def test_cap_invariant_under_salt_buckets(spark):
    rows = [(i, "w", f"s{i % 3}", (i * 37) % 100) for i in range(60)]
    docs = _docs_df(spark, rows)
    outs = [
        sorted(map(tuple, source_doc_cap(docs, cap=4, salt_buckets=b).collect()))
        for b in (1, 2, 8)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_oov_rate_known_corpus(spark):
    # vocabulary of size 2 -> 'aa' and 'bb' (most frequent); 'zz' is OOV
    rows = [
        (1, "aa aa bb zz", "s", 11),
        (2, "aa bb bb", "s", 8),
        (3, "zz qq", "s", 5),
    ]
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ratio"])
        for r in oov_rate(_docs_df(spark, rows), vocab_k=2).collect()
    }
    assert out[1] == (4, 1, 0.25)
    assert out[2] == (3, 0, 0.0)
    assert out[3] == (2, 2, 1.0)


def test_oov_vocab_tie_break_deterministic(spark):
    # 'aa' and 'bb' tie on frequency; vocab_k=1 must pick 'aa' (word asc)
    rows = [(1, "aa bb", "s", 5), (2, "bb aa", "s", 5)]
    out = oov_rate(_docs_df(spark, rows), vocab_k=1).collect()
    assert all(r["n_oov"] == 1 for r in out)


def test_temperature_mixture_sqrt_scaling(spark):
    # skewed corpus: src_big 400 docs x 10 tokens, src_mid 100, src_small 25
    rows = [(i, "a b c d e f g h i j", "src_big", 0) for i in range(400)]
    rows += [(1000 + i, "a b c d e f g h i j", "src_mid", 0) for i in range(100)]
    rows += [(2000 + i, "a b c d e f g h i j", "src_small", 0) for i in range(25)]
    from pandas_etl_framework_spark.llmops.curation import (
        _TEMP_MOD,
        temperature_mixture,
    )

    got = temperature_mixture(_docs_df(spark, rows)).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
        # exact integer rule replicated per row
        assert r["kept"] == (
            r["bucket"] ** 2 * r["src_tokens"]
            < _TEMP_MOD ** 2 * r["min_tokens"]
        )
    # the smallest source is kept whole (rate 1)
    assert all(r["kept"] for r in by_src["src_small"])
    # kept counts scale ~sqrt(S): rates 1, 1/2, 1/4 here (S = 4000/1000/250
    # tokens -> sqrt(250/S) = .25/.5/1); md5 buckets are near-uniform, so
    # allow a loose band around the expectation
    kept_big = sum(r["kept"] for r in by_src["src_big"])
    kept_mid = sum(r["kept"] for r in by_src["src_mid"])
    assert 70 <= kept_big <= 130        # E = 100
    assert 35 <= kept_mid <= 65         # E = 50
