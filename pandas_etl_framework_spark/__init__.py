"""PySpark-native rebuild of Julian96/pandas-etl-framework.

Hash-based CDC / SCD Type 2 historization on the Spark DataFrame API, plus
a relational query surface and large-scale LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Reference semantics: see SURVEY.md; citations in each module point into
/root/reference (file:line).
"""

from .constants import (  # noqa: F401
    DELETED,
    HASH_NULL_TOKEN,
    HASH_SEPARATOR,
    INSERT_RUN_ID,
    INSERT_TS,
    KEY_HASH,
    META_COLUMN_NAMES,
    META_COLUMNS,
    RECORD_HASH,
    SCD2_LOWER_BOUND,
    SCD2_UPPER_BOUND,
    SOURCE_FILE_NAME,
    UPDATE_RUN_ID,
    UPDATE_TS,
    VALID_FROM,
    VALID_FROM_MODE_CUSTOM,
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
    VALID_TO,
)
from .meta_columns import (  # noqa: F401
    add_hash_column,
    add_key_hash,
    add_meta_columns,
    add_record_hash,
    create_currents,
    hash_expr,
    record_hash_columns,
)
from .cdc import (  # noqa: F401
    get_delta,
    get_deleted_by_full_load,
    get_deletes_by_column,
    get_inserts,
    get_updates,
    historize_append,
    merge_cdc,
    simulate_runs,
)
from .scd2 import (  # noqa: F401
    get_valid_from_date,
    historize_dataset,
    merge_scd2,
    merge_scd2_open,
    split_merged_dataset,
)
from .scd2_store import Scd2Store  # noqa: F401
from .asof import asof_join  # noqa: F401
from .range_join import range_join  # noqa: F401
from .versioned_store import VersionedStore  # noqa: F401
from .schema import (  # noqa: F401
    create_empty_hist_dataframe,
    prepare_schema,
    with_hist_columns,
)
from .io import (  # noqa: F401
    create_dataframe_with_schema,
    delete_store,
    read_csv,
    read_current_hashes,
    read_parquet_df,
    read_store,
    write_store,
)
from .session import get_spark  # noqa: F401
