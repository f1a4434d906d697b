"""Change Data Feed files (``_change_data/``) — write + read helpers.

Delta PROTOCOL.md "Add CDC File" action: when a table has
``delta.enableChangeDataFeed=true``, DML commits record their row-level
changes as parquet files under ``_change_data/`` via ``cdc`` actions
(``dataChange=false``); change readers MUST use a commit's cdc actions
INSTEAD of deriving changes from its add/remove actions when any are
present.  CDC files hold the table's data columns plus
``_change_type`` (``insert`` / ``delete`` / ``update_preimage`` /
``update_postimage``); like data files they exclude partition columns
(these live in the action's ``partitionValues``) and use PHYSICAL
column names on column-mapped tables.

Scale notes: CDC rows are written by the same distributed Spark write
as the rewrite they describe — the driver only moves/renames files and
assembles actions.  Readers scan cdc parquet distributed with partition
values re-attached as literals (same machinery as the data scan).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_DIR = "_change_data"
CHANGE_TYPE = "_change_type"


def cdf_enabled(state) -> bool:
    cfg = (state.last_metadata or {}).get("configuration", {})
    return str(cfg.get("delta.enableChangeDataFeed", "false")).lower() == "true"


def write_cdc_group(
    cdc_df: DataFrame,
    table_path: str,
    rel_dir: str,
    partition_values: Mapping[str, Optional[str]],
) -> list[dict]:
    """Write one partition-group's CDC rows; return its ``cdc`` actions.

    ``cdc_df`` must already be in FILE layout (physical names if mapped,
    partition columns dropped) plus the ``_change_type`` column.
    """
    staging = tempfile.mkdtemp(prefix="dl2db_cdc_")
    actions: list[dict] = []
    try:
        out = os.path.join(staging, "out")
        cdc_df.write.mode("overwrite").parquet(out)
        for fn in sorted(os.listdir(out)):
            if not fn.endswith(".parquet"):
                continue
            name = f"cdc-{uuid.uuid4().hex}.snappy.parquet"
            rel = os.path.join(CDC_DIR, rel_dir, name) if rel_dir else \
                os.path.join(CDC_DIR, name)
            dst = os.path.join(table_path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(os.path.join(out, fn), dst)
            actions.append(
                {
                    "cdc": {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": dict(partition_values or {}),
                        "size": os.path.getsize(dst),
                        "dataChange": False,
                    }
                }
            )
        return actions
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def write_cdc_partitioned(
    df: DataFrame,
    state,
    table_path: str,
) -> list[dict]:
    """Write a multi-partition change set (logical table columns +
    ``_change_type``) as CDC files; return the ``cdc`` actions.

    Used where the change rows span partitions (DELETE's masked rows,
    MERGE's inserts): one distributed hive-partitioned write, then each
    leaf file moves under ``_change_data/`` with its partitionValues
    parsed from the relative path — the same machinery the insert data
    path uses.  Partition columns are excluded from the file (the write
    hive-encodes them), physical names apply on mapped tables.
    """
    from .delta_sink import _partition_values_from_relpath

    part_cols = list(state.partition_columns)
    _tmap, l2p = state.type_maps()
    mapped = (
        (state.last_metadata or {}).get("configuration", {}).get(
            "delta.columnMapping.mode", "none"
        )
        != "none"
    )
    if mapped:
        from ..plans.types import to_physical_schema

        phys = to_physical_schema(state.schema)
        exprs = [
            F.col(lf.name).cast(pf.dataType).alias(pf.name)
            for lf, pf in zip(state.schema.fields, phys.fields)
        ]
        exprs.append(F.col(CHANGE_TYPE))
        df = df.select(*exprs)
    part_by = [l2p.get(c, c) for c in part_cols]

    staging = tempfile.mkdtemp(prefix="dl2db_cdc_")
    actions: list[dict] = []
    try:
        out = os.path.join(staging, "out")
        wr = df.write.mode("overwrite")
        if part_by:
            wr = wr.partitionBy(*part_by)
        wr.parquet(out)
        for root, _dirs, files in os.walk(out):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(root, out)
                rel_dir = "" if rel_dir == "." else rel_dir
                name = f"cdc-{uuid.uuid4().hex}.snappy.parquet"
                rel = (
                    os.path.join(CDC_DIR, rel_dir, name)
                    if rel_dir
                    else os.path.join(CDC_DIR, name)
                )
                dst = os.path.join(table_path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(os.path.join(root, fn), dst)
                actions.append(
                    {
                        "cdc": {
                            "path": rel.replace(os.sep, "/"),
                            "partitionValues": _partition_values_from_relpath(
                                os.path.join(rel_dir, fn) if rel_dir else fn
                            ),
                            "size": os.path.getsize(dst),
                            "dataChange": False,
                        }
                    }
                )
        return actions
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def read_cdc_actions(
    spark: SparkSession,
    state,
    table_path: str,
    cdc_actions: Sequence[dict],
) -> DataFrame:
    """One logical DataFrame (table columns + ``_change_type``) for a
    commit's cdc actions — physical->logical renames and
    partition-value literals applied, mirroring the data scan.

    Files are GROUPED by identical partitionValues and each group is
    read with one multi-path ``spark.read.parquet`` call, so the plan
    carries O(partition groups) nodes, not O(files) — the same blowup
    guard as the main data scan."""
    import json
    from urllib.parse import unquote

    from ..plans.exprs import partition_literal

    _tmap, l2p = state.type_maps()
    p2l = {v: k for k, v in l2p.items()}
    part_cols = list(state.partition_columns)
    schema_fields = {f.name: f for f in state.schema.fields}

    groups: dict[str, tuple[dict, list[str]]] = {}
    for act in cdc_actions:
        pv = act.get("partitionValues") or {}
        key = json.dumps(pv, sort_keys=True)
        groups.setdefault(key, (pv, []))[1].append(
            os.path.join(table_path, unquote(act["path"]))
        )

    if len(groups) > 64:
        # same plan-size guard as the main scan (delta.py C1): above 64
        # partition groups, one multi-path read + broadcast
        # file->partition-values join keeps the plan O(1) in group count
        return _read_cdc_filejoin(spark, state, table_path, cdc_actions)

    out: Optional[DataFrame] = None
    for pv, paths in groups.values():
        df = spark.read.parquet(*paths)
        have = set(df.columns)
        sel = []
        # resolve against the STATE's schema, not the file's: cdc files
        # written before a schema evolution lack the newer columns and
        # backfill them as typed NULLs (same P6 rule as the data scan)
        for f in schema_fields.values():
            if f.name in part_cols:
                sel.append(
                    partition_literal(
                        f, pv.get(l2p.get(f.name, f.name))
                    ).alias(f.name)
                )
                continue
            phys = l2p.get(f.name, f.name)
            if phys in have:
                sel.append(F.col(f"`{phys}`").alias(f.name))
            else:
                sel.append(F.lit(None).cast(f.dataType).alias(f.name))
        sel.append(F.col(CHANGE_TYPE))
        piece = df.select(*sel)
        out = piece if out is None else out.unionByName(piece)
    return out


def _read_cdc_filejoin(
    spark: SparkSession,
    state,
    table_path: str,
    cdc_actions: Sequence[dict],
) -> DataFrame:
    """Many-partition cdc read: single multi-path scan of every cdc
    file with an explicit read schema (missing evolved columns backfill
    as NULLs) + broadcast join on file basename to attach typed
    partition values — the cdc mirror of ``delta._scan_filejoin``."""
    from urllib.parse import unquote

    from pyspark.sql import types as T

    from ..plans.filters import (
        decode_partition_value,
        normalize_partition_values,
    )
    from ..plans.types import delta_type_name, to_physical_schema

    _tmap, l2p = state.type_maps()
    part_cols = list(state.partition_columns)
    logical_by_name = {f.name: f for f in state.schema.fields}
    phys_schema = to_physical_schema(state.schema)
    phys_by_logical = dict(zip(
        [f.name for f in state.schema.fields], phys_schema.fields
    ))

    read_fields = [
        phys_by_logical[f.name]
        for f in state.schema.fields
        if f.name not in part_cols
    ]
    read_schema = T.StructType(
        list(read_fields) + [T.StructField(CHANGE_TYPE, T.StringType(), True)]
    )

    FILE_KEY = "__dl2db_cdc_file"
    map_fields = [T.StructField(FILE_KEY, T.StringType(), False)]
    for c in part_cols:
        map_fields.append(
            T.StructField(c, logical_by_name[c].dataType, True)
        )
    rows, paths = [], []
    for act in cdc_actions:
        rel = unquote(act["path"])
        abs_p = os.path.join(table_path, rel)
        paths.append(abs_p)
        pv = normalize_partition_values(act.get("partitionValues") or {})
        decoded = [
            decode_partition_value(
                pv.get(l2p.get(c, c)),
                delta_type_name(logical_by_name[c].dataType),
            )
            for c in part_cols
        ]
        rows.append((abs_p.rsplit("/", 1)[-1], *decoded))
    part_map = spark.createDataFrame(rows, schema=T.StructType(map_fields))

    raw = spark.read.schema(read_schema).parquet(*paths).withColumn(
        FILE_KEY, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    joined = raw.join(F.broadcast(part_map), FILE_KEY, "left")

    from ..plans.exprs import quote_name, rewrite_expr

    exprs = []
    for f in state.schema.fields:
        if f.name in part_cols:
            exprs.append(F.col(quote_name(f.name)))
        else:
            phys = l2p.get(f.name, f.name)
            exprs.append(
                rewrite_expr(
                    F.col(quote_name(phys)), f.dataType
                ).alias(f.name)
            )
    exprs.append(F.col(CHANGE_TYPE))
    return joined.select(*exprs)
