"""Registry-wide physical-plan contracts.

Every harness query's executed plan is checked for the two silent
scale-killers the 100 TB posture forbids:

- ``CartesianProduct`` — an unbounded all-pairs join anywhere in the
  registry is a bug, full stop (broadcast-singleton crossJoins compile to
  BroadcastNestedLoopJoin, not CartesianProduct, so this never fires on
  the legitimate pattern).
- ``BatchEvalPython`` — a pickle-serialized row-at-a-time Python eval.
  Every Python boundary in the repo is Arrow-batched (ArrowEvalPython /
  ArrowEvalPythonUDTF / MapInPandas / FlatMapGroupsInPandas), and this
  test keeps it that way.

``BroadcastNestedLoopJoin`` is legitimate ONLY for broadcast singletons
(one-row aggregates crossJoined as scalar context). The allowlist below
acknowledges each such query; a NEW query that introduces a BNLJ fails
until it is reviewed and either re-planned or added here.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

# every entry audited: the broadcast side is a single-row (or k-row,
# driver-sized) relation, never a table-sized input
BNLJ_SINGLETON_OK = {
    "rel_cross_join",          # tiny-dims demo crossJoin (region x nation)
    "tpch_q11", "tpch_q22",    # scalar-subquery thresholds
    "events_rfm",              # global NTILE cut points
    "sketch_hll_distinct", "sketch_theta_kmv", "sketch_bloom_prune",
    "sketch_histogram_quantiles",
    "rel_dq_constraints",      # one-row rule-summary context
    "dedup_simhash_pairs",     # distinct-signature cross (collapse-bounded:
    #   one row per DISTINCT 32-bit signature, not per doc; a distinct-
    #   heavy corpus should move to a wider signature + banded join —
    #   see simhash_neardup_pairs' docstring)
    "emb_topk", "emb_topk_batch", "emb_neardup_pairs",  # query-side broadcast
    "emb_ann_lsh", "emb_ivf_topk", "emb_pq_topk",       # probe/centroid rows
    "text_source_mixture",     # corpus token-total singleton
    "text_temperature_mixture",  # 1-row min-source-tokens singleton
    "text_dsir_select",        # 1-row target/raw hash-count totals singleton
    "text_tfidf_topk",         # corpus doc-count singleton
    "text_bm25_topk",          # corpus (N, T) totals singleton
    "text_rrf_fusion",         # inherits the BM25/LM totals singletons
    "text_unigram_logprob", "text_bigram_logprob",      # LM totals
    "text_kn_logprob",         # 1-row bigram-type-total N1+(..) singleton
    "text_ccnet_buckets",      # inherits the KN type-total singleton
    "text_contamination",      # split-context singleton
    "curation_pipeline",
    "graph_triangles",         # n_edges x tri x wedges one-row census rows
    "emb_covariance",          # row-count singleton joined onto d^2 moments
    "dedup_minhash_recall",    # n_true x n_candidates x n_hits one-row report
    "rel_key_skew_profile",    # total-row-count singleton onto K-row top list
    "rel_fuzzy_pairs_qgram",   # r15: the hot-gram anti-join's SENTINEL
    #   branch — the union pushes the anti-join into both branches and
    #   the sentinel side's join key constant-folds to the literal
    #   token, leaving a LocalLimit-1 IdentityBroadcast existence probe
    #   ("is the sentinel bucket hot?"): broadcast side <= 1 row by
    #   construction. The gram branch keeps its BroadcastHashJoin.
    "rel_auto_skew_join",      # r14: _hot_key_relation's total-row-count
    #   singleton (same shape as rel_key_skew_profile's) — the bounded
    #   salting form that replaced the whole-side x16 replication the
    #   sf10full rehearsal OOM'd; the broadcast side is always one row
    #   (rel_salted_join's explicit hot_keys relation joins ON the keys,
    #   so it compiles to BroadcastHashJoin and needs no entry)
}

SKIP = {
    # execute a real micro-batch stream on call, not a lazy plan
    "streaming_windowed_counts",
    "streaming_dedup_counts",
    "streaming_sessionize",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_enrich",
}


def test_registry_plans_have_no_cartesian_or_row_python(spark):
    from pandas_etl_framework_spark.harness import REGISTRY

    offenders: dict[str, list[str]] = {}
    for name, (fn, _sql) in REGISTRY.items():
        if name in SKIP:
            continue
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            problems.append("BatchEvalPython (row-pickle Python eval)")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_SINGLETON_OK:
            problems.append("unacknowledged BroadcastNestedLoopJoin")
        if problems:
            offenders[name] = problems
    assert not offenders, offenders
