"""The GEMM-based paths (k-means assignment, semantic-dedup pair scoring)
claim BIT-IDENTICAL results to the JVM integer-expression forms they
replaced: every product/partial sum of the quantized vectors is an integer
below 2^53, so float64 BLAS arithmetic is exact, and ties break to the
lowest cid in both forms. These tests check the claim against independent
pure-Python integer references on adversarial inputs (max-scale
components, exact duplicate-of-seed ties).
"""

from __future__ import annotations

import math

import pytest

from pandas_etl_framework_spark.llmops import clustering

pytestmark = pytest.mark.usefixtures("spark")


def _py_argmin_assign(vectors, centroids):
    """Reference Lloyd assignment: exact integer distances, ties -> lowest
    cid (the struct-min semantics of the replaced expression)."""
    out = {}
    for vid, v in vectors.items():
        best = None
        for cid in sorted(centroids):
            c = centroids[cid]
            d = sum((a - b) * (a - b) for a, b in zip(v, c))
            if best is None or d < best[0]:
                best = (d, cid)
        out[vid] = best[1]
    return out


def test_kmeans_assignment_matches_integer_reference(spark):
    # non-negative components at the quantization extreme (~1e6) so the
    # centroid floor-div has one unambiguous meaning, plus exact
    # duplicates of the seed vectors to force distance-0 ties
    dim = 8
    rows = []
    for vid in range(20):
        src = vid - 16 if vid >= 16 else vid  # 16..19 duplicate seeds 0..3
        base = [(src * 37 + j * 101) * 9973 % 1_000_001 for j in range(dim)]
        rows.append((vid, [x / 1_000_000.0 for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, _cent = clustering.kmeans_quantized(emb, k=4, iterations=2)
    got = {r["vec_id"]: r["cid"] for r in assign.collect()}

    # replay the same two Lloyd rounds in exact integer python
    vectors = {
        vid: [int(round(x * 1_000_000.0)) for x in v] for vid, v in rows
    }
    centroids = {vid: list(vectors[vid]) for vid in range(4)}
    for _ in range(2):
        a = _py_argmin_assign(vectors, centroids)
        centroids = {
            cid: [
                sum(col) // len(members)
                for col in zip(*(vectors[v] for v in members))
            ]
            for cid in set(a.values())
            for members in [[v for v, c in a.items() if c == cid]]
        }
    want = _py_argmin_assign(vectors, centroids)
    assert got == want
    # the tie cases really landed where the tie rule says: same cluster as
    # the seed they duplicate
    for vid in range(16, 20):
        assert got[vid] == got[vid - 16]


def test_semantic_dedup_scores_match_integer_reference(spark, tmp_path):
    # small corpus written as real parquet so the query runs its read path
    dim = 8
    rows = []
    for vid in range(12):
        v = [((vid * 13 + j * 7) % 41) - 20 for j in range(dim)]
        rows.append((vid, [x / 10.0 for x in v], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = clustering.q_emb_semantic_dedup(spark, str(tmp_path)).collect()

    # independent reference: integer dots over the same quantization
    # (similarity.QUANT_SCALE, not the k-means 1e6 scale), the cluster
    # partition taken from the (already reference-tested) assign, the
    # threshold applied with the exact same IEEE double ops
    from pandas_etl_framework_spark.llmops.similarity import QUANT_SCALE

    q = {
        vid: [int(round(x * float(QUANT_SCALE))) for x in v]
        for vid, v, _ in rows
    }
    assign, _ = clustering.kmeans_quantized(
        spark.read.parquet(str(tmp_path / "embeddings.parquet")),
        iterations=clustering.SEMDEDUP_ITERATIONS,
    )
    cid = {r["vec_id"]: r["cid"] for r in assign.collect()}
    want = {}
    for a in q:
        for b in q:
            if a < b and cid[a] == cid[b]:
                dot = sum(x * y for x, y in zip(q[a], q[b]))
                na = sum(x * x for x in q[a])
                nb = sum(x * x for x in q[b])
                cos = dot / (math.sqrt(float(na)) * math.sqrt(float(nb)))
                if cos * clustering.COS_DEN > clustering.COS_NUM:
                    want[(a, b)] = cos
    got = {(r["vec_a"], r["vec_b"]): r["qcos"] for r in out}
    assert got == want  # pair set identical AND every qcos bit-identical
