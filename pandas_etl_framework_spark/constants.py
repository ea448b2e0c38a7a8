"""Meta-column registry and batch-context constants.

Re-expresses the reference's constant block
(`/root/reference/src/PandasETLHelpers/MetaColumnHelpers.py:5-52`) for a
PySpark-native engine. Names and sentinel values are preserved exactly so
that stores written by the reference and by this engine are join-compatible.
"""

from __future__ import annotations

# --- reserved audit (meta) columns, keyed by int constants -----------------
# ref: MetaColumnHelpers.py:8-30
COL_KEY_HASH = 1
COL_RECORD_HASH = 2
COL_VALID_FROM = 3
COL_VALID_TO = 4
COL_INSERT_RUN_TS = 5
COL_UPDATE_RUN_TS = 6
COL_INSERT_RUN_ID = 7
COL_UPDATE_RUN_ID = 8
COL_SOURCE_FILE_NAME = 9
COL_DELETED = 10

META_COLUMNS = {
    COL_KEY_HASH: "KEY_HASH",
    COL_RECORD_HASH: "RECORD_HASH",
    COL_VALID_FROM: "VALID_FROM",
    COL_VALID_TO: "VALID_TO",
    COL_INSERT_RUN_TS: "INSERT_TS",
    COL_UPDATE_RUN_TS: "UPDATE_TS",
    COL_INSERT_RUN_ID: "INSERT_RUN_ID",
    COL_UPDATE_RUN_ID: "UPDATE_RUN_ID",
    COL_SOURCE_FILE_NAME: "SOURCE_FILE_NAME",
    COL_DELETED: "DELETED",
}

KEY_HASH = META_COLUMNS[COL_KEY_HASH]
RECORD_HASH = META_COLUMNS[COL_RECORD_HASH]
VALID_FROM = META_COLUMNS[COL_VALID_FROM]
VALID_TO = META_COLUMNS[COL_VALID_TO]
INSERT_TS = META_COLUMNS[COL_INSERT_RUN_TS]
UPDATE_TS = META_COLUMNS[COL_UPDATE_RUN_TS]
INSERT_RUN_ID = META_COLUMNS[COL_INSERT_RUN_ID]
UPDATE_RUN_ID = META_COLUMNS[COL_UPDATE_RUN_ID]
SOURCE_FILE_NAME = META_COLUMNS[COL_SOURCE_FILE_NAME]
DELETED = META_COLUMNS[COL_DELETED]

META_COLUMN_NAMES = list(META_COLUMNS.values())

# --- batch-context ("currents") keys, ref: MetaColumnHelpers.py:32-34 -----
CURRENT_RUN_ID = "CURRENT_RUN_ID"
CURRENT_RUN_TS = "CURRENT_RUN_TS"
CURRENT_RUN_DAY = "CURRENT_RUN_DAY"

# --- SCD2 VALID_FROM / VALID_TO modes, ref: MetaColumnHelpers.py:36-41 ----
VALID_FROM_MODE_LOWER_BOUND = 1
VALID_FROM_MODE_LOAD_DATE = 2
VALID_FROM_MODE_CUSTOM = 3

VALID_TO_MODE_LOAD_DATE = 1
VALID_TO_MODE_CUSTOM = 2

# --- formats, ref: MetaColumnHelpers.py:43-49 -----------------------------
RUN_ID_FORMAT = "%Y%m%d%H%M%S"
PYTHON_TS_FORMAT = "%Y-%m-%d %H:%M:%S"
SPARK_TS_FORMAT = "yyyy-MM-dd HH:mm:ss"
PYTHON_DAY_FORMAT = "%Y-%m-%d"
SPARK_DAY_FORMAT = "yyyy-MM-dd"

# --- SCD2 sentinel bounds, ref: MetaColumnHelpers.py:51-52 ----------------
SCD2_LOWER_BOUND = "1900-01-01"
SCD2_UPPER_BOUND = "9999-12-31"

# Hash preimage separator, ref: MetaColumnHelpers.py:95
HASH_SEPARATOR = "#?"

# Token substituted for NULLs inside hash preimages. pandas `astype(str)`
# renders missing floats as the literal string 'nan'
# (ref: MetaColumnHelpers.py:93-95); Spark's concat_ws would instead *skip*
# the null, silently changing the preimage arity, so we coalesce every
# operand to this token (SURVEY.md §7.1).
HASH_NULL_TOKEN = "nan"
