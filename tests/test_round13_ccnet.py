"""Round-13 CCNet scale-path tests (VERDICT r12 item 2): the broadcast
tercile-cutoff bucket assignment must equal the exact global NTILE
edge-for-edge, its returned plan must contain no Window at all, and the
underlying distributed order-statistic selection must be exact on
randomized inputs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _ntile_ref(n: int, b: int) -> list[int]:
    """Reference NTILE bucket assignment for ranks 1..n (SQL semantics:
    first n % b buckets take one extra row)."""
    q, r = divmod(n, b)
    out = []
    for i in range(1, b + 1):
        out.extend([i] * (q + (1 if i <= r else 0)))
    return out


def test_ntile_boundary_ranks_match_reference():
    from pandas_etl_framework_spark.llmops.indexing import (
        _ntile_boundary_ranks,
    )

    for n in range(0, 25):
        for b in range(1, 6):
            ref = _ntile_ref(n, b)
            ranks = _ntile_boundary_ranks(n, b)
            if n == 0:
                assert ranks == []
                continue
            assert len(ranks) == b - 1
            # boundaries reproduce the bucket function exactly
            for rank in range(1, n + 1):
                bucket = next(
                    (i + 1 for i, k in enumerate(ranks) if rank <= k), b
                )
                assert bucket == ref[rank - 1], (n, b, rank)


def test_exact_rank_select_matches_python_sort(spark):
    from pandas_etl_framework_spark.llmops.indexing import (
        exact_rank_select,
    )

    rng = random.Random(13)
    rows = [
        (float(rng.randint(0, 9)), f"d{idx:03d}") for idx in range(97)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["m", "doc_id"]).repartition(7)
    ranks = [1, 2, 33, 64, 96, 97]
    n, by_rank = exact_rank_select(df, ["m", "doc_id"], lambda n: ranks)
    assert n == 97
    ordered = sorted(rows)
    for k in ranks:
        assert by_rank[k] == ordered[k - 1]
    # out-of-range ranks are silently dropped, empty input yields none
    n0, got0 = exact_rank_select(
        df.filter(F.lit(False)), ["m", "doc_id"], lambda n: [1]
    )
    assert (n0, got0) == (0, {})


def test_ccnet_cutoffs_equals_exact_ntile(spark):
    from pandas_etl_framework_spark.llmops.indexing import (
        q_text_ccnet_buckets,
        q_text_ccnet_cutoffs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        r["doc_id"]: (r["n_bigrams"], r["mean_kn_surprisal_micro"],
                      r["ppl_bucket"])
        for r in q_text_ccnet_buckets(spark, sf).collect()
    }
    scan = {
        r["doc_id"]: (r["n_bigrams"], r["mean_kn_surprisal_micro"],
                      r["ppl_bucket"])
        for r in q_text_ccnet_cutoffs(spark, sf).collect()
    }
    assert scan == exact


def test_ccnet_cutoffs_plan_has_no_window(spark):
    """The production-shape contract: the returned plan is a pure CASE
    projection over the (checkpointed) score relation — zero Window
    operators of any kind, so in particular no single-partition one."""
    from pandas_etl_framework_spark.llmops.indexing import (
        q_text_ccnet_cutoffs,
    )

    df = q_text_ccnet_cutoffs(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_ccnet_buckets_full_sentinels_zero_bigram_docs(spark):
    """The whole-corpus variant: zero-bigram docs (< 2 tokens) surface
    with the sentinel bucket 0 and NULL score; scoreable docs carry the
    same terciles the scoreable-only rows compute."""
    from pandas_etl_framework_spark.llmops.indexing import (
        ccnet_buckets_full,
    )

    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(9)]
    rows += [(100, "solo"), (101, ""), (102, "   ")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ccnet_buckets_full(docs).collect()}
    assert set(got) == {i for i in range(9)} | {100, 101, 102}
    for d in (100, 101, 102):
        assert got[d]["ppl_bucket"] == 0
        assert got[d]["n_bigrams"] == 0
        assert got[d]["mean_kn_surprisal_micro"] is None
    scoreable = sorted(
        (got[i]["mean_kn_surprisal_micro"], i, got[i]["ppl_bucket"])
        for i in range(9)
    )
    buckets = [b for _m, _i, b in scoreable]
    assert buckets == sorted(buckets) and set(buckets) == {1, 2, 3}
    assert buckets.count(1) == buckets.count(2) == buckets.count(3) == 3


def test_ccnet_approx_cutoffs_give_contiguous_buckets(spark):
    """The at-scale variant (approxQuantile cutoffs, CCNet's own sampled
    form): buckets must be CONTIGUOUS in the (mean, doc_id) order (a
    threshold assignment can't interleave) and each within epsilon-rank
    of the exact tercile edge."""
    from pandas_etl_framework_spark.llmops.indexing import (
        _docs,
        ccnet_assign_buckets,
        ccnet_bucket_cutoffs,
        kn_surprisal,
    )

    kn = kn_surprisal(
        _docs(spark, "/root/testdata/sf0.001")
    ).localCheckpoint()
    eps = 0.02
    n, cuts = ccnet_bucket_cutoffs(
        kn, buckets=3, exact=False, relative_error=eps
    )
    assert n == -1  # one-pass contract: no extra corpus-sized count
    got = ccnet_assign_buckets(kn, cuts).collect()
    got.sort(key=lambda r: (r["mean_kn_surprisal_micro"], r["doc_id"]))
    buckets = [r["ppl_bucket"] for r in got]
    n = len(buckets)
    assert buckets == sorted(buckets)  # contiguous / monotone
    # each cutoff rank within eps*n of the exact tercile edge
    for i in (1, 2):
        edge = sum(1 for b in buckets if b <= i)
        assert abs(edge - i * n / 3) <= eps * n + 1, (i, edge, n)
