"""Hashing + meta-column stamping (the identity core of the engine).

Re-expresses `/root/reference/src/PandasETLHelpers/MetaColumnHelpers.py`
(create_currents:63-78, add_hash_column:91-97, add_key_hash:108-110,
add_record_hash:122-128, add_meta_columns:141-152) Spark-first:

- the reference computes md5 with a row-wise Python lambda
  (MetaColumnHelpers.py:96); here the whole preimage + digest is a single
  JVM-side expression (`F.md5(F.concat_ws(...))`) that stays inside
  whole-stage codegen — no Python boundary, vectorized, ~100x cheaper
  at scale.
- NULL handling is normalized to pandas semantics: pandas ``astype(str)``
  renders missing values as literal ``'nan'`` strings, while Spark's
  ``concat_ws`` silently *drops* null operands (changing preimage arity).
  Every operand is coalesced to ``HASH_NULL_TOKEN`` so hashes match the
  reference byte-for-byte on non-null data and are arity-stable on nulls
  (SURVEY.md §7.1).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import (
    CURRENT_RUN_DAY,
    CURRENT_RUN_ID,
    CURRENT_RUN_TS,
    DELETED,
    HASH_NULL_TOKEN,
    HASH_SEPARATOR,
    INSERT_RUN_ID,
    INSERT_TS,
    KEY_HASH,
    META_COLUMN_NAMES,
    PYTHON_DAY_FORMAT,
    PYTHON_TS_FORMAT,
    RECORD_HASH,
    RUN_ID_FORMAT,
    SOURCE_FILE_NAME,
    UPDATE_RUN_ID,
    UPDATE_TS,
)


def create_currents(load_ts: str | None = None) -> dict:
    """Batch context: run id (``yyyyMMddHHmmss``), run day, run timestamp.

    Driver-side plain Python, injected into plans as literals — mirrors
    MetaColumnHelpers.py:63-78. Pass ``load_ts`` explicitly in tests for
    determinism (the reference's wall-clock default forces its
    ``time.sleep(2)`` hack, main.py:31).
    """
    if load_ts is not None:
        ts = datetime.datetime.strptime(load_ts, PYTHON_TS_FORMAT)
    else:
        ts = datetime.datetime.now()
    return {
        CURRENT_RUN_ID: ts.strftime(RUN_ID_FORMAT),
        CURRENT_RUN_DAY: ts.date().strftime(PYTHON_DAY_FORMAT),
        CURRENT_RUN_TS: ts.strftime(PYTHON_TS_FORMAT),
    }


def stringify_for_hash(df: DataFrame, column: str) -> Column:
    """Deterministic cross-engine string form of a column for hashing.

    Timestamps/dates are pinned to explicit formats (Spark's plain
    ``cast('string')`` drops/keeps fractional seconds depending on value,
    which would make hashes value-dependent in format); everything else is
    ``cast('string')``, matching pandas ``astype(str)`` for the types the
    reference uses (string, double). NULL → HASH_NULL_TOKEN.
    """
    dtype = df.schema[column].dataType
    col = F.col(column)
    if isinstance(dtype, T.TimestampType):
        s = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    elif isinstance(dtype, T.DateType):
        s = F.date_format(col, "yyyy-MM-dd")
    else:
        s = col.cast("string")
    return F.coalesce(s, F.lit(HASH_NULL_TOKEN))


def hash_expr(df: DataFrame, columns: list[str]) -> Column:
    """md5 hex over the ``'#?'``-joined stringified columns (one JVM expr)."""
    return F.md5(
        F.concat_ws(HASH_SEPARATOR, *[stringify_for_hash(df, c) for c in columns])
    )


def add_hash_column(
    df: DataFrame, columns: list[str], hash_column_name: str
) -> DataFrame:
    """Append ``hash_column_name`` = md5 of the given columns.

    ref: MetaColumnHelpers.py:91-97 (row-wise Python md5 → built-in F.md5).
    """
    return df.withColumn(hash_column_name, hash_expr(df, columns))


def add_key_hash(df: DataFrame, key_columns: list[str]) -> DataFrame:
    """KEY_HASH = md5 over the business-key columns. ref: MetaColumnHelpers.py:108-110."""
    return add_hash_column(df, key_columns, KEY_HASH)


def record_hash_columns(
    df: DataFrame, exclude_columns: list[str] | None = None
) -> list[str]:
    """All columns except meta columns and explicit excludes.

    ref: MetaColumnHelpers.py:122-126 (driver-side list filter).
    """
    excluded = set(META_COLUMN_NAMES)
    if exclude_columns:
        excluded.update(exclude_columns)
    return [c for c in df.columns if c not in excluded]


def add_record_hash(
    df: DataFrame, exclude_columns: list[str] | None = None
) -> DataFrame:
    """RECORD_HASH = md5 over all non-meta, non-excluded columns.

    ref: MetaColumnHelpers.py:122-128.
    """
    return add_hash_column(df, record_hash_columns(df, exclude_columns), RECORD_HASH)


def add_meta_columns(
    df: DataFrame,
    currents: dict,
    key_columns: list[str],
    record_hash_exclude_columns: list[str] | None = None,
    source_file: bool | str = False,
) -> DataFrame:
    """Stamp KEY_HASH, RECORD_HASH, INSERT/UPDATE_TS, INSERT/UPDATE_RUN_ID, DELETED.

    ref: MetaColumnHelpers.py:141-152. ``DELETED`` is a nullable timestamp
    (the reference types it as NaT, not boolean — MetaColumnHelpers.py:150);
    preserved for store compatibility.

    ``source_file`` populates the reserved SOURCE_FILE_NAME meta column
    (constants.py:45, mirroring reference MetaColumnHelpers.py:28 — which
    declares it but never stamps it): ``True`` records the scan-time file
    provenance via ``F.input_file_name()`` (empty string when the row
    does not originate from a file scan, e.g. createDataFrame inputs); a
    string stamps that literal instead, for deterministic tests and for
    sources whose provenance the caller already knows (JDBC, streaming).
    SOURCE_FILE_NAME is a meta column, so it never enters RECORD_HASH —
    re-loading identical data from a differently named file stays a
    no-op delta.
    """
    missing = [c for c in key_columns if c not in df.columns]
    if missing:
        raise ValueError(
            f"key columns {missing} not in DataFrame columns {df.columns}"
        )
    for key in (CURRENT_RUN_TS, CURRENT_RUN_ID):
        if key not in currents:
            raise ValueError(
                f"currents is missing '{key}' — build it with create_currents()"
            )
    run_ts = F.to_timestamp(F.lit(currents[CURRENT_RUN_TS]), "yyyy-MM-dd HH:mm:ss")
    df = add_key_hash(df, key_columns)
    df = add_record_hash(df, record_hash_exclude_columns)
    stamped: dict[str, Column] = {
        INSERT_TS: run_ts,
        UPDATE_TS: run_ts,
        INSERT_RUN_ID: F.lit(currents[CURRENT_RUN_ID]),
        UPDATE_RUN_ID: F.lit(currents[CURRENT_RUN_ID]),
        DELETED: F.lit(None).cast("timestamp"),
    }
    # identity check, not truthiness: source_file="" must stamp the empty
    # provenance literal, and source_file=False is the only "don't stamp"
    # value (ADVICE r07)
    if source_file is not False:
        if not isinstance(source_file, (bool, str)):
            raise TypeError(
                "source_file must be False (skip), True (input_file_name) "
                f"or a literal string, got {type(source_file).__name__}"
            )
        stamped[SOURCE_FILE_NAME] = (
            F.lit(source_file).cast("string")
            if isinstance(source_file, str)
            else F.input_file_name()
        )
    return df.withColumns(stamped)
