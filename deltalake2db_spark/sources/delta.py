"""``scan_delta`` — Delta Lake table -> PySpark DataFrame.

The Spark-first replacement for the reference's two execution backends
(``deltalake2db/duckdb.py:374-623`` / ``deltalake2db/polars.py:361-559``).
Same public surface: ``conditions`` / ``select`` / ``exclude`` /
``distinct`` / ``limit`` / ``version`` / ``action_filter`` /
``storage_options``.

Scale design (vs the reference's one-SELECT-per-file UNION ALL,
``deltalake2db/sql_utils.py:33-43``):

 * files are grouped by **partition tuple**, one ``spark.read.parquet``
   per group — missing columns (schema evolution) come back as typed
   NULLs from the explicit read schema, so per-file select lists are
   unnecessary and the plan is O(distinct partition tuples), not O(files);
 * above ``JOIN_STRATEGY_THRESHOLD`` distinct tuples the scan switches to
   a single multi-path read + ``input_file_name()`` broadcast-joined
   against a driver-built file->partition-values map — plan size O(1) in
   file count, which is what survives 1e5 files / 100 TB;
 * row-level predicates are applied with ``df.filter`` so Catalyst pushes
   them into the parquet scan (min/max row-group skipping stacks on top
   of the driver-side add-action pruning).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from functools import reduce
from typing import Any, Callable, Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.exprs import (
    compile_conditions,
    partition_tuple,
    quote_name,
    select_exprs_for_group,
)
from ..plans.filters import (
    FilterType,
    FilterTypeOld,
    decode_partition_value,
    normalize_conditions,
    normalize_partition_values,
)
from ..plans.meta import MetaState, get_meta
from ..plans.protocol import check_is_supported
from ..plans.types import delta_type_name, to_physical_schema

JOIN_STRATEGY_THRESHOLD = 64

PathOrState = Union[str, MetaState]

# (applicationId, abspath, version, log-fingerprint) -> scan plan; LRU 64
_SCAN_MEMO: OrderedDict[tuple, DataFrame] = OrderedDict()


def _log_fingerprint(path: str):
    """(name, size, mtime_ns) of every ``_delta_log`` entry, sorted —
    None when the log isn't a listable local directory (no caching for
    remote/filesystem-abstracted tables)."""
    try:
        with os.scandir(os.path.join(path, "_delta_log")) as it:
            return tuple(
                sorted(
                    (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                    for e in it
                )
            )
    except OSError:
        return None


def _resolve_state(
    table: PathOrState,
    storage_options: Optional[Mapping[str, Any]],
    version: Optional[int],
    spark: Optional[SparkSession] = None,
) -> MetaState:
    if isinstance(table, MetaState):
        return table
    path = str(table)
    if storage_options and spark is not None:
        from .storage import apply_storage_options

        path = apply_storage_options(spark, path, storage_options)
    return get_meta(path, storage_options=storage_options, version=version)


def get_spark_schema(
    table: PathOrState,
    physical: bool = False,
    storage_options: Optional[Mapping[str, Any]] = None,
    version: Optional[int] = None,
) -> T.StructType:
    """Logical (or physical) schema of a Delta table.

    Parity: ``get_polars_schema`` (``deltalake2db/polars.py:226-263``).
    """
    state = _resolve_state(table, storage_options, version)
    check_is_supported(state)
    schema = state.schema
    if schema is None:
        raise ValueError(f"no metaData action found in {state.delta_path}")
    return to_physical_schema(schema) if physical else schema


# scan_delta resolves with the session so cloud confs land on it


def scan_delta(
    spark: SparkSession,
    table: PathOrState,
    conditions: Union[FilterType, FilterTypeOld, None] = None,
    select: Optional[Sequence[str]] = None,
    exclude: Optional[Sequence[str]] = None,
    distinct: bool = False,
    limit: Optional[int] = None,
    version: Optional[int] = None,
    timestamp=None,
    storage_options: Optional[Mapping[str, Any]] = None,
    action_filter: Optional[Callable[[dict], bool]] = None,
    _with_pos: bool = False,
) -> DataFrame:
    """Scan a Delta table into a DataFrame honoring the Delta protocol:
    column mapping, schema evolution, partition-value typing, stats
    skipping, time travel, protocol gating.

    ``_with_pos`` (internal, used by ``delete_where``) appends the
    (file basename, parquet row index) helper columns to the output.

    Parity: ``scan_delta_union`` (``deltalake2db/polars.py:361-559``) and
    ``get_sql_for_delta_expr`` (``deltalake2db/duckdb.py:374-557``).
    ``timestamp`` is ``timestampAsOf`` time travel (latest version whose
    commit time is <= the given datetime/ISO string/epoch seconds) —
    an extension beyond the reference's version-only travel.
    """
    if timestamp is not None:
        if version is not None:
            raise ValueError("version and timestamp are mutually exclusive")
        if isinstance(table, MetaState):
            raise ValueError(
                "timestamp travel needs a table path, not a MetaState"
            )
        from ..plans.meta import version_at_timestamp

        version = version_at_timestamp(
            str(table), timestamp, storage_options=storage_options
        )
    # Snapshot-plan memo (plain scans of local tables): the returned
    # DataFrame is an immutable logical plan, and the cache key carries
    # a (name, size, mtime_ns) fingerprint of every _delta_log entry, so
    # ANY commit — ours or an external writer's — changes the key and
    # forces a fresh replay.  Same contract as delta-spark's snapshot
    # cache; saves the ~100-150 ms of py4j plan construction a repeated
    # read of an unchanged table otherwise pays.
    memo_key = None
    if (
        isinstance(table, str)
        and storage_options is None
        and conditions is None and select is None and exclude is None
        and not distinct and limit is None and action_filter is None
        and not _with_pos and "://" not in table
    ):
        fp = _log_fingerprint(table)
        if fp is not None:
            memo_key = (spark.sparkContext.applicationId,
                        os.path.abspath(table), version, fp)
            hit = _SCAN_MEMO.get(memo_key)
            if hit is not None:
                _SCAN_MEMO.move_to_end(memo_key)
                return hit
    state = _resolve_state(table, storage_options, version, spark)
    check_is_supported(state)
    logical_schema = state.schema
    if logical_schema is None:
        raise ValueError(f"no metaData action found in {state.delta_path}")

    conds = normalize_conditions(conditions)
    _, l2p = state.type_maps()
    partition_cols = list(state.partition_columns)
    partition_phys = [l2p.get(c, c) for c in partition_cols]

    actions = list(state.get_add_actions_filtered(conds, limit))
    if action_filter is not None:
        actions = [a for a in actions if action_filter(a)]

    # deletion vectors: decode each DV-carrying add action's roaring
    # bitmap and anti-join the scan on (file, parquet row index) —
    # full read support for a feature the reference rejects outright
    dv_actions = [a for a in actions if a.get("deletionVector")]

    # physical read schema: table columns as stored in parquet, minus
    # partition columns (those live only in partitionValues metadata)
    phys_schema = to_physical_schema(logical_schema)
    phys_partition = set(partition_phys)
    read_schema = T.StructType(
        [f for f in phys_schema.fields if f.name not in phys_partition]
    )

    if not actions:
        # C7: zero live files => typed empty relation
        df = spark.createDataFrame([], schema=logical_schema)
    else:
        groups: dict[tuple, list[dict]] = {}
        for a in actions:
            groups.setdefault(partition_tuple(a, partition_phys), []).append(a)
        with_pos = bool(dv_actions) or _with_pos
        if not partition_cols or len(groups) <= JOIN_STRATEGY_THRESHOLD:
            df = _scan_grouped(spark, state, groups, read_schema, logical_schema,
                               partition_cols, l2p, with_pos=with_pos)
        else:
            df = _scan_filejoin(spark, state, actions, read_schema, logical_schema,
                                partition_cols, partition_phys, l2p,
                                with_pos=with_pos)
        if dv_actions:
            df = _apply_deletion_vectors(
                spark, state, df, dv_actions, keep_pos=_with_pos
            )

    pred = compile_conditions(conds)
    if pred is not None:
        df = df.filter(pred)
    if select:
        # names are quoted; Column objects pass through (parity with the
        # reference accepting raw sqlglot expressions in select=)
        df = df.select(
            *[quote_name(c) if isinstance(c, str) else c for c in select]
        )
    if exclude:
        df = df.drop(*list(exclude))
    if distinct:
        df = df.distinct()
    if limit is not None:
        df = df.limit(limit)
    if memo_key is not None:
        _SCAN_MEMO[memo_key] = df
        while len(_SCAN_MEMO) > 64:
            _SCAN_MEMO.popitem(last=False)
    return df


_DV_KEY = "__dl2db_dv_file"
_DV_RI = "__dl2db_dv_row_index"


def _pos_cols() -> list[Column]:
    """(file basename, parquet row index) from the reader's _metadata —
    the join key deletion vectors address rows by."""
    return [
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias(_DV_KEY),
        F.col("_metadata.row_index").alias(_DV_RI),
    ]


def _scan_grouped(
    spark: SparkSession,
    state: MetaState,
    groups: Mapping[tuple, list[dict]],
    read_schema: T.StructType,
    logical_schema: T.StructType,
    partition_cols: Sequence[str],
    l2p: Mapping[str, str],
    with_pos: bool = False,
) -> DataFrame:
    """One multi-path read per distinct partition tuple; unionByName.

    ``unionByName`` of scans introduces no shuffle — the plan stays
    embarrassingly parallel exactly like the reference's UNION ALL.
    """
    parts: list[DataFrame] = []
    for ptuple, acts in groups.items():
        paths = [state.file_uri(a) for a in acts]
        pv = normalize_partition_values(acts[0].get("partitionValues", {}))
        raw = spark.read.schema(read_schema).parquet(*paths)
        exprs = select_exprs_for_group(logical_schema, partition_cols, pv, l2p)
        if with_pos:
            exprs = list(exprs) + _pos_cols()
        parts.append(raw.select(*exprs))
    return reduce(DataFrame.unionByName, parts)


def _scan_filejoin(
    spark: SparkSession,
    state: MetaState,
    actions: Sequence[dict],
    read_schema: T.StructType,
    logical_schema: T.StructType,
    partition_cols: Sequence[str],
    partition_phys: Sequence[str],
    l2p: Mapping[str, str],
    with_pos: bool = False,
) -> DataFrame:
    """Single read of all files + broadcast join on basename to attach
    typed partition values — O(1) plan size in file count."""
    FILE_KEY = "__dl2db_file_key"
    map_fields = [T.StructField(FILE_KEY, T.StringType(), False)]
    logical_by_name = {f.name: f for f in logical_schema.fields}
    for c in partition_cols:
        map_fields.append(
            T.StructField(c, logical_by_name[c].dataType, True)
        )
    rows = []
    for a in actions:
        pv = normalize_partition_values(a.get("partitionValues", {}))
        basename = state.file_uri(a).rsplit("/", 1)[-1]
        decoded = [
            decode_partition_value(
                pv.get(p), delta_type_name(logical_by_name[c].dataType)
            )
            for c, p in zip(partition_cols, partition_phys)
        ]
        rows.append((basename, *decoded))
    part_map = spark.createDataFrame(rows, schema=T.StructType(map_fields))

    paths = [state.file_uri(a) for a in actions]
    raw = spark.read.schema(read_schema).parquet(*paths).withColumn(
        FILE_KEY, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    joined = raw.join(F.broadcast(part_map), FILE_KEY, "left")
    exprs: list[Column] = []
    for field in logical_schema.fields:
        if field.name in partition_cols:
            exprs.append(F.col(quote_name(field.name)))
        else:
            phys = l2p.get(field.name, field.name)
            from ..plans.exprs import rewrite_expr

            exprs.append(
                rewrite_expr(F.col(quote_name(phys)), field.dataType).alias(field.name)
            )
    if with_pos:
        exprs.extend(_pos_cols())
    return joined.select(*exprs)


def _apply_deletion_vectors(
    spark: SparkSession,
    state: MetaState,
    df: DataFrame,
    dv_actions: Sequence[dict],
    keep_pos: bool = False,
) -> DataFrame:
    """Drop DV-deleted rows: anti-join on (file basename, row index).

    The descriptor table is tiny (one row per DV-carrying file); the
    expansion to row indexes happens in ``mapInPandas`` on executors, so
    the driver never materializes a bitmap.  Descriptors carry their
    ``cardinality``, so the total deleted-row count is known up front —
    under ``_DV_BROADCAST_ROWS`` the expanded side is broadcast and the
    scan stays shuffle-free; above it Spark falls back to a shuffled
    anti-join keyed on (file, row index), which scales with deleted
    rows, not table rows.
    """
    import json as _json

    table_root = state.delta_path
    storage_options = state.storage_options
    rows = [
        (a["path"].rsplit("/", 1)[-1], _json.dumps(a["deletionVector"]))
        for a in dv_actions
    ]
    total = sum(
        int(a["deletionVector"].get("cardinality") or 0) for a in dv_actions
    )
    if total <= _DV_DRIVER_ROWS:
        # small DVs: decode the bitmaps driver-side (they are already
        # driver-sized metadata at this cardinality) and broadcast the
        # literal (file, row index) table — skips a Python-worker
        # round trip per query; the executor path below remains the
        # scale route for crawl-sized deletes
        from ..plans.deletion_vectors import read_descriptor as _read
        from ..plans.meta import MetadataIO

        opener = MetadataIO(storage_options)._open
        import pandas as _pd

        fks: list = []
        ris: list = []
        for fk, dv_json in rows:
            idx = _read(_json.loads(dv_json), table_root, opener=opener)
            fks.extend([fk] * len(idx))
            ris.extend(idx)
        # pandas frame -> Arrow conversion: ~10x cheaper than pickling
        # 100k Python tuples through createDataFrame(list)
        dv_rows = F.broadcast(
            spark.createDataFrame(
                _pd.DataFrame({_DV_KEY: _pd.array(fks, dtype="string"),
                               _DV_RI: _pd.array(ris, dtype="int64")}),
            )
        )
        out = df.join(dv_rows, on=[_DV_KEY, _DV_RI], how="left_anti")
        return out if keep_pos else out.drop(_DV_KEY, _DV_RI)
    desc_df = spark.createDataFrame(
        rows, schema=f"{_DV_KEY} string, __dv_json string"
    )
    if len(rows) > 64:
        desc_df = desc_df.repartition(min(len(rows), 256))

    def expand(batches):
        import json

        import pandas as pd

        from deltalake2db_spark.plans.deletion_vectors import (
            read_descriptor as _read,
        )
        from deltalake2db_spark.plans.meta import MetadataIO

        opener = MetadataIO(storage_options)._open
        for pdf in batches:
            for fk, dv_json in zip(pdf[_DV_KEY], pdf["__dv_json"]):
                idx = _read(json.loads(dv_json), table_root, opener=opener)
                yield pd.DataFrame({_DV_KEY: fk, _DV_RI: idx})

    dv_rows = desc_df.mapInPandas(
        expand, schema=f"{_DV_KEY} string, {_DV_RI} long"
    )
    if total <= _DV_BROADCAST_ROWS:
        dv_rows = F.broadcast(dv_rows)
    out = df.join(dv_rows, on=[_DV_KEY, _DV_RI], how="left_anti")
    return out if keep_pos else out.drop(_DV_KEY, _DV_RI)


_DV_BROADCAST_ROWS = 4_000_000
# below this many deleted rows the bitmaps decode driver-side (no
# Python worker round trip); createDataFrame of ~100k tuples is ~100ms
_DV_DRIVER_ROWS = 100_000


def scan_delta_native(
    spark: SparkSession,
    path: str,
    storage_options: Optional[Mapping[str, Any]] = None,
) -> DataFrame:
    """Escape hatch: delegate to the delta-spark connector when it is on
    the classpath (parity: ``use_delta_ext`` delegating to DuckDB's
    ``delta_scan``, duckdb.py:417-418,558-577).  Raises a clear error
    when delta-spark isn't installed (it is not in this environment)."""
    if storage_options:
        from .storage import apply_storage_options

        path = apply_storage_options(spark, path, storage_options)
    try:
        return spark.read.format("delta").load(path)
    except Exception as exc:
        raise RuntimeError(
            "native delta reader unavailable (install delta-spark / add "
            "io.delta:delta-spark to the classpath); use scan_delta() "
            "for the built-in protocol reader"
        ) from exc


def get_sql_for_delta(
    spark: Optional[SparkSession],
    table: PathOrState,
    cte_wrap_name: Optional[str] = None,
    storage_options: Optional[Mapping[str, Any]] = None,
    version: Optional[int] = None,
    **scan_kwargs: Any,
) -> str:
    """Self-contained Spark SQL for a Delta table (parity:
    ``get_sql_for_delta`` / ``cte_wrap_name``, duckdb.py:584-623).

    Like the reference, the returned string runs on ANY session with no
    prior registration — one SELECT per surviving file over
    ``parquet.`file``` refs with column-mapping renames, partition
    literals, and NULL backfill (see ``sources.sql_emit``).  ``spark``
    is accepted for backward compatibility but unused.
    """
    from .sql_emit import get_sql_for_delta as _emit

    return _emit(
        table,
        cte_wrap_name=cte_wrap_name,
        storage_options=storage_options,
        version=version,
        **scan_kwargs,
    )


def create_view_for_delta(
    spark: SparkSession,
    table: PathOrState,
    view_name: str,
    storage_options: Optional[Mapping[str, Any]] = None,
    version: Optional[int] = None,
    **scan_kwargs: Any,
) -> None:
    """Register the scan as a temp view (parity:
    ``duckdb_create_view_for_delta``, ``deltalake2db/duckdb.py:340-371``,
    including the quote-injection rejection at line 367)."""
    if '"' in view_name or "`" in view_name:
        raise ValueError("view name must not contain quote characters")
    df = scan_delta(
        spark, table, storage_options=storage_options, version=version, **scan_kwargs
    )
    df.createOrReplaceTempView(view_name)
