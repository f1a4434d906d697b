"""Delta schema JSON <-> Spark StructType, plus column-mapping name resolution.

Reference parity: type mapping tables in ``deltalake2db/duckdb.py:315-331``
and ``deltalake2db/polars.py:154-223``; physical-name resolution in
``deltalake2db/delta_meta_retrieval.py:121-132``.

Delta's ``schemaString`` is the JSON serialization of a Spark
``StructType`` (Delta was born inside Spark), so the *logical* schema is
simply ``StructType.fromJson``.  The *physical* schema replaces every
field name with ``metadata["delta.columnMapping.physicalName"]`` when the
table uses ``delta.columnMapping.mode=name``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"


def parse_schema_string(schema_string: str) -> T.StructType:
    """Parse a Delta ``metaData.schemaString`` into a logical StructType."""
    return T.StructType.fromJson(json.loads(schema_string))


def physical_name(field: T.StructField) -> str:
    """Physical (parquet) name of a field; logical name when unmapped."""
    md = field.metadata or {}
    return md.get(PHYSICAL_NAME_KEY, field.name)


def _physical_type(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    physical_name(f), _physical_type(f.dataType), f.nullable
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_physical_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_type(dt.keyType),
            _physical_type(dt.valueType),
            dt.valueContainsNull,
        )
    return dt


def to_physical_schema(logical: T.StructType) -> T.StructType:
    """Rewrite a logical schema into the physical (parquet) schema.

    Nested struct fields carry their own physicalName metadata
    (reference: ``deltalake2db/duckdb.py:88-126``).
    """
    return T.StructType(
        [
            T.StructField(physical_name(f), _physical_type(f.dataType), f.nullable)
            for f in logical.fields
        ]
    )


def delta_type_name(dt: T.DataType) -> str:
    """Primitive Delta type name for a Spark type (partition-value codec)."""
    mapping: dict[type, str] = {
        T.StringType: "string",
        T.IntegerType: "integer",
        T.LongType: "long",
        T.ShortType: "short",
        T.ByteType: "byte",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.BooleanType: "boolean",
        T.DateType: "date",
        T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp_ntz",
        T.BinaryType: "binary",
    }
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    name = mapping.get(type(dt))
    if name is None:
        raise TypeError(f"unsupported Delta primitive type: {dt}")
    return name


def field_by_name(schema: T.StructType, name: str) -> T.StructField | None:
    for f in schema.fields:
        if f.name == name:
            return f
    return None


def logical_to_physical_map(schema: T.StructType) -> dict[str, str]:
    """Top-level logical -> physical name map."""
    return {f.name: physical_name(f) for f in schema.fields}


def schema_pairs(schema: T.StructType) -> list[tuple[T.StructField, str]]:
    """(logical field, physical name) pairs in schema order."""
    return [(f, physical_name(f)) for f in schema.fields]


def json_type_of(value: Any) -> str:
    return type(value).__name__
