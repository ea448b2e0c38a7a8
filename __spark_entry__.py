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
# queries() entries only, while the registry holds 203 (202 oracle-gated
# + rows-only emb_pca_project; dedup_containment, dedup_keeper_priority
# and events_mad_outliers joined in r05).
# Cumulative after r04: 130 of the r04-era 200 ever driver-checked,
# 129 ever-green (the one red was
# emb_pca_project's structural `no_oracle` — it is OUT of this window; its
# correctness gate is the numpy parity test in tests/test_projection.py).
# Round-5 rotation (VERDICT r04 item 1): all 50 slots go to never-checked
# queries, front-loading the highest-risk shapes — the 4 dark streaming
# rows (sessionize = the applyInPandasWithState operator), emb_covariance
# (underwrites the PCA path), the graph fixpoint loops, the versioned
# store, ORC/JSON/corrupt-CSV round-trips, the time-series detectors, the
# as-of variants, the SQL-entry surface, audio decode/VAD, and the BPE
# trainer (newly oracle-gated this round via a precomputed pure-Python
# VALUES oracle). All 50 are green under tools/check_correctness.py's
# driver-faithful compare at sf0.01 (CORRECTNESS_LOCAL.md).
#
# ROUND-6 ROTATION PLAN (VERDICT r04 item 4) — the exactly 20 registry
# queries still dark after this window; all are simple shapes or pair-level
# siblings of driver-green family members, all local-green:
#   rel_scalar_date_funcs rel_string_funcs rel_case_when rel_cross_join
#   rel_having rel_window_ntile rel_window_first_last rel_limit_offset
#   text_tokens text_token_entropy text_length_histogram text_fingerprint
#   text_winnow_fingerprint dedup_jaccard_pairs dedup_minhash_bands
#   dedup_simhash_pairs emb_topk_batch emb_norms emb_knn_per_label
#   emb_lsh_buckets
# plus the round-5 registry additions (dedup_containment — asymmetric
# subset-duplicate containment join; dedup_keeper_priority — policy
# keepers per near-dup cluster; events_mad_outliers — exact-integer
# MAD robust outlier summary). r06 target: full registry ever-checked.
DRIVER_PRIORITY = [
    # dark streaming rows — sessionize's event-time timeout state machine
    # (streaming/windows.py) is the most intricate unchecked code in the repo
    "streaming_sessionize", "streaming_interval_join", "streaming_enrich",
    "streaming_dedup_counts",
    # the mergeable d²-moment covariance pass that underwrites PCA
    "emb_covariance",
    # graph fixpoint loops (iterate-to-convergence, checkpoint-truncated)
    "graph_triangles", "graph_khop", "graph_label_propagation",
    # store lifecycle + remaining IO formats + corrupt-record quarantine
    "versioned_store_lifecycle", "io_orc_roundtrip", "io_json_roundtrip",
    "io_csv_corrupt_routing",
    # time-series detectors/downsamplers + funnel
    "events_ewma", "events_lttb", "events_cusum", "events_funnel",
    # as-of join variants (tolerance window, nearest-direction)
    "events_asof_tolerance", "events_asof_nearest",
    # reference-shaped SQL entry points (shared temp-view surface)
    "sql_shared_recursive", "sql_shared_agg", "sql_shared_join",
    # audio decode + voice-activity detection (Arrow binary decoders)
    "multimodal_decode_audio", "multimodal_audio_vad",
    # BPE: trainer (first oracle-gated round — precomputed VALUES oracle),
    # pair stats, and the encode path
    "text_bpe_train", "text_bpe_pairs", "text_tokens_bpe",
    # CDC sibling with no driver row: per-column change attribution
    "cdc_changed_columns",
    # incremental dedup against an accumulated store
    "dedup_incremental",
    # k-means quality gate (within-cluster inertia)
    "emb_kmeans_inertia",
    # window-heavy text analytics
    "text_dup_spans", "text_bigram_logprob",
    # sampling/splitting/sharding family
    "rel_stratified_sample", "data_split", "text_shuffle_shard",
    "text_weighted_reservoir", "text_quality_sample",
    # model-ish text ops
    "text_classifier", "text_boilerplate",
    # harder relational shapes: skew salting, fuzzy join, quantized corr,
    # unpivot
    "rel_salted_agg", "rel_fuzzy_join", "rel_corr_quantized", "rel_unpivot",
    # window-frame / distribution / percentile / multiset / null-order /
    # outer-join semantics (engine-divergence risk)
    "rel_window_range_frame", "rel_window_distribution", "rel_percentiles",
    "rel_except_all", "rel_intersect_all", "rel_sort_nulls",
    "rel_full_outer_join",
    # embedding near-dup pair extraction
    "emb_neardup_pairs",
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
