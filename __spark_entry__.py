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
# queries() entries only (CORRECTNESS_r01..r03 all truncate there), while the
# registry holds 200. Round-4 rotation: the §2 core + r01-r03 greens are
# proven (84 queries ever-checked, 80 ever-green), so this window carries
# (a) the 4 r03 reds, re-listed to put their fixes on record — the HUGEINT
# oracle sweep (events_range_join, rel_dq_constraints, emb_kmeans) and the
# array serialization (multimodal_metadata) — and (b) 46 queries that have
# never had a driver row: the UDAF/UDTF/grouped-map surface, the repaired
# latent-HUGEINT/array queries, remaining TPC-H, the time-series family,
# sketches, IVF/PQ ANN, the connected-components driver row, the §2
# IO-lifecycle round-trips, this round's new operators (JL sketch, int8
# quantization, PCA path, image phash), and the LLM text ops. The ~50
# still-dark queries (simple relational/scalar shapes, pair-level dedup
# siblings of green family members, the streaming rows, and the third-wave additions
# (unpivot, VAD, LPA, EWMA, ORC/JSON round-trips, versioned-store
# lifecycle, BPE train, duplicated spans, nearest as-of, CSV quarantine
# routing, CUSUM, LTTB, k-means inertia) — all green under
# tools/check_correctness.py's driver-faithful compare at sf0.01) rotate
# in next round. Remaining queries follow in registry order.
DRIVER_PRIORITY = [
    # r03 reds, fixed this round: BIGINT-cast oracles + array serialization
    "events_range_join", "rel_dq_constraints", "emb_kmeans",
    "multimodal_metadata",
    # Arrow-boundary surface: pandas UDF / UDAF / grouped-map / UDTF
    "text_tokens_pandas_udf", "events_udaf_pandas",
    "events_grouped_map_zscore", "text_chunks_udtf",
    # repaired latent-HUGEINT / array-output queries (VERDICT r03 items 1-2)
    "events_json_extract", "rel_null_semantics", "rel_pivot_native",
    "rel_profile_orders", "tpch_q12", "events_multires_rollup",
    "text_hashed_bow", "text_chunk_dedup", "text_inverted_index",
    "text_unigram_logprob", "rel_higher_order", "rel_array_agg",
    # TPC-H shapes with no prior driver row
    "tpch_q8", "tpch_q11", "tpch_q15", "tpch_q16", "tpch_q19", "tpch_q22",
    # time-series analytics family
    "events_transition_matrix", "events_rfm", "events_cohort_retention",
    "events_gapfill_locf",
    # sketches with no prior driver row
    "sketch_theta_kmv", "sketch_countmin", "sketch_histogram_quantiles",
    # ANN scale paths: probe-limited IVF, PQ ADC + rerank
    "emb_ivf_topk", "emb_pq_topk",
    # the connected-components fixpoint loop (new row); the pair-level
    # siblings (dedup_jaccard_pairs / dedup_minhash_bands /
    # dedup_simhash_pairs / emb_lsh_buckets) ceded their slots to this
    # round's four new operators below — each sibling's family is already
    # driver-green via another member, so the new ops carry more signal
    "dedup_clusters",
    # §2 IO/lifecycle ops that had no driver-row shape through r03 — now
    # driven through a real scratch-dir write→read round-trip (S1 CSV
    # source, S4 partitioned sink, S5 store reset + S6 empty-relation
    # bootstrap, C6 simulate_runs through the disk store); these took the
    # slots of emb_knn_per_label / emb_neardup_pairs / text_token_entropy /
    # text_winnow_fingerprint, whose families are already driver-green
    "io_csv_roundtrip", "io_partitioned_sink", "io_store_reset",
    "cdc_simulate_runs",
    # new this round: JL sketch, int8 quantization, PCA path, image phash
    "emb_random_projection", "emb_quantize_int8", "emb_pca_project",
    "multimodal_phash_dedup",
    # LLM text ops with no prior driver row (fingerprint/tokens_bpe ceded
    # their slots to the two most reference-relevant new rows: the
    # point-in-time SCD2 join and streaming-equals-batch CDC)
    "text_gopher_rules", "text_pii_redact",
    "scd2_pit_join", "streaming_cdc_historize",
    # new this round: sequence packing + domain-mixture sampling
    "text_pack_sequences", "text_source_mixture",
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
    return {
        name: sql
        for name, (_fn, sql) in _ordered_registry().items()
        if sql is not None
    }
