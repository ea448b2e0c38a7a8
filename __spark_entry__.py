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
# queries() entries only (CORRECTNESS_r01/r02 both truncate there), while the
# registry holds 159. This priority list front-loads one window covering every
# family — reference CDC/SCD2 core, relational/events (incl. the round-2 NTZ
# regressions), previously-unseen TPC-H, sketches, graph, skew/SQL/DQ, and the
# LLM-ops flagship surface — so the driver gate exercises the breadth of the
# engine, not 50 variations of the already-proven core. The remaining queries
# follow in registry order; ALL 159 are verified against their DuckDB oracles
# by `python tools/check_correctness.py` (same compare as the driver).
DRIVER_PRIORITY = [
    # reference-parity core (SURVEY.md §2)
    "cdc_add_meta", "cdc_delta", "cdc_inserts", "cdc_updates",
    "cdc_merge_cdc", "cdc_deleted_by_full_load", "cdc_deletes_by_column",
    "cdc_historize_two_runs", "scd2_merge", "scd2_split_active",
    "scd2_split_hist", "schema_prepare",
    # relational / events (window-lag + sessionize + range-join were the
    # round-2 TIMESTAMP_NTZ regressions; asof join had no driver row).
    # rel_union sits past the window: U1 stays proven via cdc_merge_cdc.
    "rel_filter_project", "rel_window_lag",
    "events_sessionize", "events_range_join", "events_asof_join",
    "multimodal_metadata", "multimodal_decode_image",
    "multimodal_decode_video",
    # TPC-H: q1 anchor + the hard shapes with no prior driver row
    "tpch_q1", "tpch_q2", "tpch_q7", "tpch_q9", "tpch_q13", "tpch_q17",
    "tpch_q20", "tpch_q21",
    # sketches / graph / skew / shared-SQL / DQ / streaming-engine output
    "sketch_hll_distinct", "sketch_bloom_prune",
    "graph_pagerank", "rel_salted_join", "sql_shared_delta",
    "sql_shared_lateral", "rel_dq_constraints",
    "streaming_windowed_counts",
    # LLM-ops flagships (BASELINE.json north star)
    "dedup_exact", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_jaccard_prefix", "dedup_cross_source",
    "text_quality", "text_langid", "text_tfidf_topk", "text_contamination",
    "curation_pipeline",
    "emb_topk", "emb_ann_lsh", "emb_kmeans", "emb_semantic_dedup",
]


def _ordered_registry():
    from pandas_etl_framework_spark.harness import REGISTRY

    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not in REGISTRY: {missing}"
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
    return {
        name: sql
        for name, (_fn, sql) in _ordered_registry().items()
        if sql is not None
    }
