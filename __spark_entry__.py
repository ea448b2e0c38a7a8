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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pandas_etl_framework_spark.harness import REGISTRY

    def prepared(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare_session(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: prepared(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from pandas_etl_framework_spark.harness import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
