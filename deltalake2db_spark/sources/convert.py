"""CONVERT TO DELTA: in-place conversion of a parquet directory.

Mirrors the semantics of Delta Lake's ``CONVERT TO DELTA parquet.`path```
(public protocol + delta-rs ``convert_to_deltalake``): write a
``_delta_log`` describing the parquet files that are ALREADY there —
zero data movement/rewrite.  Hive-style ``key=value`` directories
become partition columns.

Scale design: the only per-file work is a parquet FOOTER read for
row-count/min/max/null stats (threaded, same as the sink's
``build_add``); 100k files is 100k footer reads — metadata-bound, no
data pass.  The one full-schema decision (merged data schema +
partition column types) comes from Spark's own parquet reader, which
probes footers distributed-ly and applies its documented
partition-type inference.

Reference scope note: the reference engine only READS delta tables;
conversion is a writer-side extension in the spirit of its fixture
builder (tests/conftest.py builds tables via delta-rs `write_deltalake`
— conversion gives the same "make this directory a delta table"
capability without rewriting data).
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

from pyspark.sql import SparkSession

from .delta_sink import _file_stats, _partition_values_from_relpath
from .delta_writer import DeltaWriter, spark_schema_to_delta_json


def convert_to_delta(
    spark: SparkSession,
    path: str,
    partition_schema: Optional[Mapping[str, str]] = None,
) -> int:
    """Create ``_delta_log`` for the parquet directory at ``path``.

    ``partition_schema`` optionally pins partition-column Spark types
    (``{"year": "int"}``); by default Spark's partition inference
    decides.  Returns the committed version (always 0).  Raises if the
    directory is already a Delta table.
    """
    path = str(path).rstrip("/")
    log_dir = os.path.join(path, "_delta_log")
    if os.path.exists(log_dir):
        raise ValueError(f"{path} is already a Delta table (_delta_log exists)")
    if not os.path.isdir(path):
        raise FileNotFoundError(path)

    rels: list[str] = []
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                rels.append(os.path.relpath(os.path.join(root, fn), path))
    if not rels:
        raise ValueError(f"no parquet files under {path}")

    # every file must agree on its partition-directory columns
    part_cols_per_file = [
        tuple(_partition_values_from_relpath(r).keys()) for r in rels
    ]
    part_cols = part_cols_per_file[0]
    if any(pc != part_cols for pc in part_cols_per_file):
        raise ValueError(
            "inconsistent hive partition directories across files: "
            f"{sorted(set(part_cols_per_file))}"
        )

    # Spark's reader merges data schemas across footers and types the
    # partition columns by its standard inference
    reader = spark.read.option("basePath", path)
    full_schema = reader.parquet(path).schema
    if partition_schema:
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        fields = []
        for f in full_schema.fields:
            if f.name in partition_schema:
                fields.append(
                    StructField(
                        f.name,
                        _parse_datatype_string(partition_schema[f.name]),
                        f.nullable,
                    )
                )
            else:
                fields.append(f)
        full_schema = StructType(fields)

    writer = DeltaWriter(path)
    actions = [
        writer.protocol_action(1, 2),
        writer.metadata_action(
            spark_schema_to_delta_json(full_schema),
            partition_columns=list(part_cols),
        ),
    ]
    from concurrent.futures import ThreadPoolExecutor

    def build_add(rel: str) -> dict:
        abs_p = os.path.join(path, rel)
        import json

        return {
            "add": {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": _partition_values_from_relpath(rel),
                "size": os.path.getsize(abs_p),
                "modificationTime": int(os.path.getmtime(abs_p) * 1000),
                "dataChange": True,
                "stats": json.dumps(_file_stats(abs_p)),
            }
        }

    with ThreadPoolExecutor(max_workers=min(16, max(1, len(rels)))) as ex:
        actions.extend(ex.map(build_add, sorted(rels)))
    return writer.commit(actions, operation="CONVERT")
