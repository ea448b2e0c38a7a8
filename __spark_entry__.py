"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are assembled from the engine's harness
registry (pandas_etl_framework_spark/harness.py): one entry per operator
from SURVEY.md §2 plus the relational-parity and LLM-ops surfaces, each
with a DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare_session(spark: SparkSession) -> None:
    """Driver sessions aren't built by session.get_spark, so apply the two
    settings correctness depends on: ship the package to Python workers
    (Pandas UDFs unpickle by module reference) and pin the session timezone
    (timestamp→string hash preimages and collected datetimes are
    TZ-sensitive; the DuckDB oracle is UTC-naive)."""
    from pandas_etl_framework_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the LIVE pipeline's append-only CDC historization result
    after two order loads on /root/testdata/sf0.001 (SURVEY.md §2.7 C5/C6)."""
    from pandas_etl_framework_spark.harness import q_cdc_historize_two_runs

    _prepare_session(spark)
    return q_cdc_historize_two_runs(spark, "/root/testdata/sf0.001")


# Subset contract: the driver records correctness rows for the FIRST 50
# queries() entries only, while the registry holds 211 (210 oracle-gated
# + rows-only emb_pca_project, which stays OUT of the window permanently
# per the r04 ruling — its gate is the numpy parity test in
# tests/test_projection.py; io_read_current_hashes, text_domain_cap,
# text_oov_rate, streaming_scd2_merge, dedup_minhash_recall,
# rel_key_skew_profile, io_jdbc_roundtrip and emb_ivf_recall_at_k
# joined in r06).
# Cumulative after r05: 180 of the r05-era 203 ever driver-checked,
# 180 ever-green.
#
# ROUND-6 ROTATION (VERDICT r05 item 1): slots 1-24 are every previously
# dark query — the 23 enumerated in the r05 verdict (20 simple shapes /
# pair-level siblings + the three r05 additions dedup_containment,
# dedup_keeper_priority, events_mad_outliers) plus io_read_current_hashes
# (S3's own oracle row per r05 item 8). All eight r06 registry additions
# are IN this window, so a green window makes the registry 211/211
# ever-checked — zero dark queries. (dedup_incremental and
# streaming_enrich yield their re-check slots to io_jdbc_roundtrip and
# emb_ivf_recall_at_k: both driver-green r05, untouched since.) The remaining slots re-check the code
# this round touched (the graph fixpoints, triangle census and PPJoin
# after the size-gated-broadcast change, the BPE trainer after the
# oracle-dir pinning, connected-components consumers) and the r05
# verdict's named riskiest shapes (streaming_sessionize,
# streaming_interval_join, versioned_store_lifecycle).
# ROUND-7 ROTATION PLAN: a green r06 window leaves ZERO dark queries, so
# r07's 50 slots are free for re-verification. Suggested composition:
# (a) any query whose code r07 touches (same rule as this round);
# (b) the oldest-evidence rows — queries last driver-checked in r01-r02
#     (the cdc_*/scd2_* core, rel_* basics, tpch_q1-q22 sample) whose
#     green rows predate four rounds of refactors;
# (c) keep every NEW registry query windowed in its landing round —
#     the standing rule that kept r06 at zero dark.
DRIVER_PRIORITY = [
    # -- dark until now: relational shapes --------------------------------
    "rel_scalar_date_funcs", "rel_string_funcs", "rel_case_when",
    "rel_cross_join", "rel_having", "rel_window_ntile",
    "rel_window_first_last", "rel_limit_offset",
    # -- dark until now: text analysis ------------------------------------
    "text_tokens", "text_token_entropy", "text_length_histogram",
    "text_fingerprint", "text_winnow_fingerprint",
    # -- dark until now: dedup pair-level rows + r05 additions ------------
    "dedup_jaccard_pairs", "dedup_minhash_bands", "dedup_simhash_pairs",
    "dedup_containment", "dedup_keeper_priority",
    # -- dark until now: embeddings ---------------------------------------
    "emb_topk_batch", "emb_norms", "emb_knn_per_label", "emb_lsh_buckets",
    # -- dark until now: time series --------------------------------------
    "events_mad_outliers",
    # -- new this round: S3 column-pruned hash read (r05 item 8) ----------
    "io_read_current_hashes",
    # -- re-checks: graph fixpoints after the size-gated-broadcast change
    #    (r05 item 2) — the loop joins replan when the gate withholds the
    #    hint, so the outputs must be re-proven under driver compare ------
    "graph_pagerank", "graph_triangles", "graph_khop",
    "graph_label_propagation",
    # -- re-checks: PPJoin after the dfreq broadcast gate (r05 item 3) +
    #    connected-components consumers after the max_iterations guard ----
    "dedup_jaccard_prefix", "dedup_clusters", "dedup_minhash_pairs",
    # -- new this round: JDBC round-trip through embedded Derby (closes
    #    the one IO path that had zero executed coverage) ----------------
    "io_jdbc_roundtrip",
    # -- new this round: LSH candidate-quality metrics (recall/precision
    #    vs exact-Jaccard ground truth) and the pre-join heavy-hitter key
    #    skew diagnostic ---------------------------------------------------
    "dedup_minhash_recall", "rel_key_skew_profile",
    # -- re-check: BPE trainer after the oracle-corpus-dir guard ----------
    "text_bpe_train",
    # -- re-checks: r05 verdict's named riskiest shapes -------------------
    "streaming_sessionize", "streaming_interval_join",
    "streaming_dedup_counts", "versioned_store_lifecycle",
    # -- new this round: ANN quality metric (IVF recall@k vs brute force,
    #    the similarity twin of dedup_minhash_recall) ---------------------
    "emb_ivf_recall_at_k",
    # -- new this round: curation additions (two-phase salted per-source
    #    doc cap vs a single-global-window oracle; corpus top-K OOV rate)
    #    and the streaming SCD2 merge (foreachBatch Scd2Store merge under
    #    pinned run contexts vs the batch scd2_merge oracle verbatim) ----
    "text_domain_cap", "text_oov_rate", "streaming_scd2_merge",
    # -- re-checks: flagship + headline operators -------------------------
    "cdc_historize_two_runs", "scd2_merge", "emb_topk", "emb_kmeans",
    "emb_kmeans_inertia", "events_asof_tolerance",
    "sql_shared_recursive",
]


def _ordered_registry():
    from pandas_etl_framework_spark.harness import REGISTRY

    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    if missing:
        # not an assert: under `python -O` an assert is stripped and a typo
        # here would silently reorder the driver window instead of failing
        raise ValueError(f"DRIVER_PRIORITY names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY}
    ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def prepared(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare_session(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: prepared(fn) for name, (fn, _sql) in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    # a registry oracle may be a zero-arg callable (generated SQL whose
    # construction needs I/O, e.g. the BPE VALUES oracle) — resolve here,
    # at the single point every consumer (driver, checker, lint) goes
    # through, so importing the harness never reads the fixture dir
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_fn, sql) in _ordered_registry().items()
        if sql is not None
    }
