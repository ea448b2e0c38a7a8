"""DSIR importance resampling (llmops/curation.py): exact differential
against a pure-Python replication of the estimator (md5 bucketing,
add-one smoothing, floor-quantized ln), plus the behavioral property the
method exists for — target-like raw docs outscore off-domain ones."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.curation import (
    DSIR_BUCKETS,
    dsir_scores,
)
from pandas_etl_framework_spark.llmops.indexing import LN_SCALE

TARGET = [
    (0, "alpha beta gamma alpha beta", True),
    (1, "beta gamma alpha gamma", True),
]
RAW = [
    (2, "alpha beta gamma beta alpha", False),   # target-like
    (3, "xylophone zebra quartz xylophone zebra", False),  # off-domain
    (4, "alpha zebra gamma quartz", False),       # mixed
]
DOCS = TARGET + RAW


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


def _feats(text: str):
    t = text.split()
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def py_dsir():
    ct, cr = {}, {}
    for _id, text, is_t in DOCS:
        for f in _feats(text):
            b = _bucket(f)
            (ct if is_t else cr)[b] = (ct if is_t else cr).get(b, 0) + 1
    buckets = set(ct) | set(cr)
    nt, nr = sum(ct.values()), sum(cr.values())
    wq = {
        b: math.floor(
            math.log(
                ((ct.get(b, 0) + 1) * float(nr + DSIR_BUCKETS))
                / ((cr.get(b, 0) + 1) * float(nt + DSIR_BUCKETS))
            )
            * LN_SCALE
        )
        for b in buckets
    }
    out = {}
    for _id, text, is_t in DOCS:
        if is_t:
            continue
        fs = [_bucket(f) for f in _feats(text)]
        s = sum(wq[b] for b in fs)
        out[_id] = (len(fs), s, s >= 0)
    return out


def test_dsir_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "is_t"])
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score_q"], r["selected"])
        for r in dsir_scores(df, F.col("is_t")).collect()
    }
    assert got == py_dsir()


def test_dsir_prefers_target_like_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "is_t"])
    rows = {
        r["doc_id"]: r for r in dsir_scores(df, F.col("is_t")).collect()
    }
    assert set(rows) == {2, 3, 4}  # raw docs only — target never scored
    like, off, mixed = rows[2], rows[3], rows[4]
    assert like["mean_logratio_micro"] > mixed["mean_logratio_micro"]
    assert mixed["mean_logratio_micro"] > off["mean_logratio_micro"]
    assert like["selected"] and not off["selected"]
