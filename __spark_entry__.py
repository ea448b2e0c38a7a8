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
# ROUND-7 ROTATION (VERDICT r06 item 1): zero dark queries after r06, so
# this window is re-verification debt + the six r07 additions. Slots:
# (a) the 6 NEW r07 rows (standing rule: every new query windowed in its
#     landing round);
# (b) ALL 34 queries whose latest driver row is r02 — the oldest
#     evidence on the books, predating five rounds of refactors;
# (c) 10 r03-era rows, touched-code first: add_meta_columns gained the
#     source_file param (cdc/scd2 consumers), _gate_dfreq's vocabulary
#     bound changed (PPJoin/containment), clustering.py split
#     kmeans_quantized/kmeans_on_vq (emb consumers), multimodal.py's
#     Pillow adapter changed (decode_image), scale.py gained auto_join
#     (salted-join sibling).
# Remaining r03-era greens (cdc_inserts/updates/deletes_by_column/
# deleted_by_full_load, schema_prepare, sketches, text_langid/quality/
# contamination/tfidf, tpch r03 cohort, events r03 rows,
# streaming_windowed_counts, sql_shared_delta/lateral, dedup_exact/
# simhash/cross_source, emb_ann_lsh, multimodal_decode_video,
# curation_pipeline, rel_filter_project, rel_window_lag) are the r08
# rotation's backlog — staleness-order them next round.
DRIVER_PRIORITY = [
    # -- new this round: SOURCE_FILE_NAME provenance stamping -------------
    "cdc_source_file_meta",
    # -- new this round: skew-profile-driven join strategy ----------------
    "rel_auto_skew_join",
    # -- new this round: composed IVF-PQ index + its recall metric --------
    "emb_ivfpq_topk", "emb_ivfpq_recall_at_k",
    # -- new this round: banded Hamming image near-dup --------------------
    "multimodal_dhash_neardup",
    # -- new this round: streaming re-delivery idempotency proof ----------
    "streaming_cdc_redelivery",
    # -- r02-era greens: cdc/scd2 store reads ------------------------------
    "cdc_latest_snapshot", "cdc_store_diff", "cdc_version_history",
    "scd2_snapshot",
    # -- r02-era greens: events ---------------------------------------------
    "events_hourly", "events_sessionize_native",
    # -- r02-era greens: relational core -----------------------------------
    "rel_agg_distinct", "rel_agg_groupby", "rel_agg_stats",
    "rel_anti_join", "rel_cube", "rel_distinct", "rel_except",
    "rel_grouping_sets", "rel_groupwise_min", "rel_intersect",
    "rel_join_broadcast_dims", "rel_join_inner", "rel_outer_join",
    "rel_pivot", "rel_rollup", "rel_semi_join", "rel_sort_limit",
    "rel_theta_join", "rel_union", "rel_window_rank",
    "rel_window_running",
    # -- r02-era greens: TPC-H sample ---------------------------------------
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q14",
    "tpch_q18",
    # -- r03-era, code touched this round -----------------------------------
    "cdc_add_meta",            # add_meta_columns gained source_file
    "cdc_delta", "cdc_merge_cdc",            # stamped-input consumers
    "scd2_split_active", "scd2_split_hist",  # scd2 family stamp consumers
    "dedup_jaccard_prefix",    # _gate_dfreq vocabulary-bound change
    "emb_semantic_dedup",      # kmeans_quantized/kmeans_on_vq split
    "multimodal_decode_image", # Pillow 16-bit adapter change
    "rel_salted_join",         # scale.py auto_join sibling
    # -- r03-era (dedup_containment also sits on _gate_dfreq, but its r06
    #    green is current; this last slot goes to the oldest remaining) --
    "rel_window_lag",
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
