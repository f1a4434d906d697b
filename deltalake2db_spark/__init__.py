"""PySpark-native analytics engine with the query and data-processing
capabilities of ``bmsuisse/deltalake2db``: a driver-side Delta-protocol
planner (log replay, protocol gate, partition/stats pruning, column
mapping) executing on Spark DataFrames, plus scale-out extensions for
LLM-data pipelines (dedup, similarity search, text analysis, multimodal
columns)."""

from .plans.filters import FilterType, decode_partition_value, serialize_partition_value
from .plans.meta import MetaState, get_meta
from .plans.protocol import DeltaProtocolError, check_is_supported, is_protocol_supported
from .session import get_spark
from .sources.delta import (
    create_view_for_delta,
    get_spark_schema,
    get_sql_for_delta,
    scan_delta,
    scan_delta_native,
)
from .sources.delta_sink import (
    DeltaAppendOnlyError,
    DeltaConstraintError,
    DeltaInvariantError,
    delete_where,
    vacuum,
    write_checkpoint,
    write_delta,
)
from .sources.changes import table_changes
from .sources.maintenance import (
    add_check_constraint,
    cleanup_expired_logs,
    add_column,
    describe_history,
    drop_check_constraint,
    drop_column,
    enable_column_mapping,
    merge_into,
    optimize,
    rename_column,
    restore_table,
    set_table_properties,
    shallow_clone,
    update_where,
)
from .sources.sinks import dataframe_to_duckdb, delta_to_duckdb, delta_to_jdbc

__all__ = [
    "write_delta",
    "delete_where",
    "optimize",
    "update_where",
    "merge_into",
    "restore_table",
    "describe_history",
    "shallow_clone",
    "set_table_properties",
    "cleanup_expired_logs",
    "add_check_constraint",
    "drop_check_constraint",
    "DeltaConstraintError",
    "DeltaAppendOnlyError",
    "DeltaInvariantError",
    "enable_column_mapping",
    "add_column",
    "rename_column",
    "drop_column",
    "table_changes",
    "vacuum",
    "write_checkpoint",
    "FilterType",
    "MetaState",
    "DeltaProtocolError",
    "get_meta",
    "get_spark",
    "scan_delta",
    "scan_delta_native",
    "get_spark_schema",
    "get_sql_for_delta",
    "create_view_for_delta",
    "check_is_supported",
    "is_protocol_supported",
    "decode_partition_value",
    "serialize_partition_value",
    "delta_to_duckdb",
    "delta_to_jdbc",
    "dataframe_to_duckdb",
    # reference-style aliases (migration surface)
    "spark_scan_delta",
    "spark_create_view_for_delta",
    "get_deltalake_meta",
    "DeltaTableMeta",
    "FilterTypeOld",
    "Operator",
]

# Reference-style aliases so a deltalake2db user maps their call sites
# 1:1 (reference __init__.py: polars_scan_delta / get_polars_schema /
# duckdb_create_view_for_delta / get_deltalake_meta / DeltaTableMeta):
from .plans.filters import FilterTypeOld, Operator  # noqa: E402

spark_scan_delta = scan_delta
spark_create_view_for_delta = create_view_for_delta
get_deltalake_meta = get_meta
DeltaTableMeta = MetaState
