"""Spark 4 Python Data Source: ``spark.read.format("deltalake2db")``.

The Catalyst-integrated face of the reader (SURVEY §4's optional deeper
integration): the driver-side planner (log replay, protocol gate,
partition/stats pruning) runs in ``reader().partitions()``, one
``InputPartition`` per live data file, and executors stream Arrow
RecordBatches — column-mapping renames are ZERO-COPY
(``Array.view`` reinterprets the layout with logical field names),
partition values arrive pre-decoded in the partition payload, and
missing columns materialize as null arrays.

Usage::

    from deltalake2db_spark.sources.pyds import register
    register(spark)
    df = (spark.read.format("deltalake2db")
          .option("path", "/path/to/table")
          .option("version", 3)          # optional time travel
          .load())

The primary entry point ``scan_delta`` keeps the JVM parquet reader
(vectorized, codegen); this source trades that for a pure-Python
pluggable surface with identical semantics — useful where the scan
must compose with other Python data sources or run without JVM-side
file-format support.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..plans.filters import decode_partition_value, normalize_partition_values
from ..plans.meta import get_meta
from ..plans.protocol import check_is_supported
from ..plans.types import delta_type_name, physical_name, to_physical_schema


def _arrow_type(dt: T.DataType):
    import pyarrow as pa

    if isinstance(dt, T.StructType):
        return pa.struct([pa.field(f.name, _arrow_type(f.dataType)) for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(_arrow_type(dt.keyType), _arrow_type(dt.valueType))
    prim = {
        T.StringType: pa.string(), T.LongType: pa.int64(), T.IntegerType: pa.int32(),
        T.ShortType: pa.int16(), T.ByteType: pa.int8(), T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(), T.BooleanType: pa.bool_(), T.DateType: pa.date32(),
        T.BinaryType: pa.binary(),
        T.TimestampType: pa.timestamp("us", tz="UTC"),
        T.TimestampNTZType: pa.timestamp("us"),
    }
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    return prim[type(dt)]


class DeltaFilePartition(InputPartition):
    """Self-contained per-file work unit: file URI + pre-decoded
    partition values + field plan + optional deletion-vector
    descriptor (decoded executor-side against ``table_root``)."""

    def __init__(
        self,
        file_uri: str,
        field_plan: Sequence[tuple],
        dv: dict | None = None,
        table_root: str | None = None,
    ):
        self.file_uri = file_uri
        # field_plan: (logical_name, physical_name_or_None, decoded_partition_value)
        self.field_plan = list(field_plan)
        self.dv = dv
        self.table_root = table_root


class DeltaDataSourceReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options):
        self.logical_schema = schema
        self.options = options

    def partitions(self):  # driver side
        path = self.options["path"]
        version = self.options.get("version")
        state = get_meta(path, version=int(version) if version is not None else None)
        check_is_supported(state)
        logical = state.schema
        assert logical is not None
        type_map, l2p = state.type_maps()
        partition_cols = set(state.partition_columns)
        conditions = None
        if self.options.get("conditions"):
            conditions = [tuple(c) for c in json.loads(self.options["conditions"])]

        parts = []
        for action in state.get_add_actions_filtered(conditions):
            pv = normalize_partition_values(action.get("partitionValues", {}))
            plan = []
            for f in logical.fields:
                phys = l2p.get(f.name, f.name)
                if f.name in partition_cols:
                    raw = pv.get(phys)
                    decoded = (
                        decode_partition_value(raw, delta_type_name(f.dataType))
                        if raw is not None
                        else None
                    )
                    plan.append((f.name, None, decoded))
                else:
                    plan.append((f.name, phys, None))
            parts.append(
                DeltaFilePartition(
                    state.file_uri(action),
                    plan,
                    dv=action.get("deletionVector"),
                    table_root=state.delta_path,
                )
            )
        if not parts:
            # zero live files: Spark still needs >=1 partition; emit an
            # empty-plan marker the executor turns into zero batches
            parts.append(DeltaFilePartition("", []))
        return parts

    def read(self, partition: DeltaFilePartition) -> Iterator:  # executor side
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.file_uri:
            return
        target_fields = [
            (f.name, _arrow_type(f.dataType)) for f in self.logical_schema.fields
        ]
        table = pq.read_table(partition.file_uri)
        if partition.dv:
            # drop DV-deleted rows by file position before any column
            # work — pyarrow reads preserve row order, so positions are
            # exactly the parquet row indexes the descriptor addresses
            import numpy as np

            from ..plans.deletion_vectors import read_descriptor

            deleted = read_descriptor(partition.dv, partition.table_root)
            mask = np.ones(table.num_rows, dtype=bool)
            mask[np.asarray(deleted, dtype=np.int64)] = False
            table = table.filter(pa.array(mask))
        n = table.num_rows
        by_phys = {name: i for i, name in enumerate(table.schema.names)}
        arrays, names = [], []
        for (lname, phys, decoded), (_, ttype) in zip(partition.field_plan, target_fields):
            if phys is None:  # partition column literal
                arrays.append(pa.array([decoded] * n, type=ttype))
            elif phys in by_phys:
                col = table.column(by_phys[phys]).combine_chunks()
                if col.type != ttype:
                    try:
                        col = col.view(ttype)  # zero-copy nested rename
                    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                        col = col.cast(ttype)  # type widening path
                arrays.append(col)
            else:  # schema evolution: missing column -> typed nulls
                arrays.append(pa.nulls(n, type=ttype))
            names.append(lname)
        out = pa.table(dict(zip(names, arrays)))
        yield from out.to_batches(max_chunksize=65536)


class DeltaLake2DBDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deltalake2db"

    def schema(self) -> T.StructType:
        state = get_meta(
            self.options["path"],
            version=int(self.options["version"]) if self.options.get("version") else None,
        )
        check_is_supported(state)
        schema = state.schema
        if schema is None:
            raise ValueError("table has no schema")
        if str(self.options.get("changefeed", "false")).lower() == "true":
            from ..streaming.delta_stream_source import stream_schema

            return stream_schema(state, change_feed=True)
        return schema

    def reader(self, schema: T.StructType) -> DataSourceReader:
        if str(self.options.get("changefeed", "false")).lower() == "true":
            raise ValueError(
                "changeFeed=true is a streaming option — use "
                "spark.readStream (batch change feeds: "
                "sources.changes.table_changes)"
            )
        return DeltaDataSourceReader(schema, self.options)

    def streamReader(self, schema: T.StructType):
        from ..streaming.delta_stream_source import DeltaStreamReader

        return DeltaStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(DeltaLake2DBDataSource)
