"""Pins for the bounded per-label kNN (VERDICT r14 item 3): banded
sign-LSH within label. The harness recall row measures the RANDOM-DATA
floor on the driver fixture (no angular structure); these tests pin the
regime the operator exists for — near-duplicate pairs at cosine >= 0.9,
where per-bit collision p = 1 - theta/pi >= 0.85 makes band collision
likely — plus the bucket-cap accounting and the bounded-candidate shape."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.similarity import (
    KNN_LSH_BUCKET_CAP,
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


def test_bounded_candidates_never_exceed_cap_budget(spark):
    emb, _ = _planted_emb(spark, n_labels=2, base_per_label=40)
    # cap 5: every bucket over 5 members must be skipped and accounted
    hot = knn_lsh_hot_buckets(emb, bucket_cap=5)
    hot_rows = hot.collect()
    assert hot_rows, "fixture must trip the tiny cap"
    capped = knn_per_label_lsh(emb, bucket_cap=5)
    # result still well-formed: <= 3 rows per label, rn in 1..3
    rows = capped.collect()
    per_label = {}
    for r in rows:
        per_label.setdefault(r["label"], []).append(r["rn"])
    for lb, rns in per_label.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert len(rns) <= 3


def test_uncapped_equals_default_cap_at_small_scale(spark):
    emb, _ = _planted_emb(spark, n_labels=2, base_per_label=20)
    a = {tuple(r) for r in knn_per_label_lsh(emb, bucket_cap=None).collect()}
    b = {
        tuple(r)
        for r in knn_per_label_lsh(emb, bucket_cap=KNN_LSH_BUCKET_CAP).collect()
    }
    assert a == b  # the default cap must be invisible below its size
