"""Schema-evolution helpers.

Re-expresses the COMMENTED schema ops in the reference
(prepare_schema: SCDHelpers.py:44-61, create_empty_hist_dataframe:
SCDHelpers.py:10-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import VALID_FROM, VALID_TO


def prepare_schema(
    df: DataFrame,
    new_schema: T.StructType,
    default_values: dict | None = None,
    remove_columns: bool = False,
) -> DataFrame:
    """Apply a target schema: add missing columns as typed default literals,
    optionally drop extras. ref: SCDHelpers.py:44-61.

    Matching is by (name, dataType) — a column present under the same name
    but a different type is re-added (cast literal), mirroring the
    reference's set-difference behavior.
    """
    default_values = default_values or {}
    old_fields = {(f.name, f.dataType) for f in df.schema.fields}
    new_fields = [(f.name, f.dataType) for f in new_schema.fields]

    missing = [fld for fld in new_fields if fld not in old_fields]
    if missing:
        df = df.withColumns(
            {
                name: F.lit(default_values.get(name)).cast(dtype)
                for name, dtype in missing
            }
        )
    if remove_columns:
        keep = {name for name, _ in new_fields}
        extras = [c for c in df.columns if c not in keep]
        if extras:
            df = df.drop(*extras)
    return df


def with_hist_columns(schema: T.StructType) -> T.StructType:
    """Schema extended by the SCD2 validity interval columns (DateType)."""
    fields = list(schema.fields)
    names = {f.name for f in fields}
    if VALID_FROM not in names:
        fields.append(T.StructField(VALID_FROM, T.DateType(), True))
    if VALID_TO not in names:
        fields.append(T.StructField(VALID_TO, T.DateType(), True))
    return T.StructType(fields)


def create_empty_hist_dataframe(df: DataFrame) -> DataFrame:
    """Empty current store matching ``df``'s schema + VALID_FROM/VALID_TO.

    ref: SCDHelpers.py:10-18 (bootstrap when no current data exists yet).
    """
    spark = df.sparkSession
    return spark.createDataFrame([], with_hist_columns(df.schema))
