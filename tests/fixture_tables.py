"""Synthesized Delta fixture tables, replicated from FIXTURES.md (which
documents the reference's checked-in tables at /root/reference/tests/data).

Each builder writes a protocol-correct Delta table into a directory and
returns its path.  Parquet payloads are written with *physical* column
names when the table uses column mapping, exactly like a mode=name
writer would.
"""

from __future__ import annotations

import decimal
import json
from datetime import date, datetime

import pyarrow as pa

from deltalake2db_spark.sources.delta_writer import (
    DeltaWriter,
    make_column_mapped_schema,
)

TS_NTZ = datetime(2024, 3, 13, 13, 11, 25, 423333)


def _arrow_type(t) -> pa.DataType:
    if isinstance(t, dict):
        if t["type"] == "struct":
            return pa.struct(
                [
                    pa.field(_phys(f), _arrow_type(f["type"]))
                    for f in t["fields"]
                ]
            )
        if t["type"] == "array":
            return pa.list_(_arrow_type(t["elementType"]))
        if t["type"] == "map":
            return pa.map_(_arrow_type(t["keyType"]), _arrow_type(t["valueType"]))
        raise ValueError(t)
    prim = {
        "string": pa.string(),
        "long": pa.int64(),
        "integer": pa.int32(),
        "short": pa.int16(),
        "byte": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if t.startswith("decimal("):
        p, s = t[8:-1].split(",")
        return pa.decimal128(int(p), int(s))
    return prim[t]


def _phys(f: dict) -> str:
    return (f.get("metadata") or {}).get("delta.columnMapping.physicalName", f["name"])


def arrow_table_physical(schema_json: dict, rows: list[dict], drop: set[str] = frozenset()) -> pa.Table:
    """Arrow table keyed by physical names from logical-name row dicts.

    Values for nested struct/array columns are plain python dicts/lists
    keyed by *logical* child names; they are re-keyed physically here.
    """

    def convert(value, t):
        if value is None:
            return None
        if isinstance(t, dict) and t["type"] == "struct":
            return {
                _phys(f): convert(value.get(f["name"]), f["type"]) for f in t["fields"]
            }
        if isinstance(t, dict) and t["type"] == "array":
            return [convert(v, t["elementType"]) for v in value]
        return value

    fields = [f for f in schema_json["fields"] if f["name"] not in drop]
    arrays, names = [], []
    for f in fields:
        at = _arrow_type(f["type"])
        vals = [convert(r.get(f["name"]), f["type"]) for r in rows]
        arrays.append(pa.array(vals, type=at))
        names.append(_phys(f))
    return pa.table(dict(zip(names, arrays)))


USER_SCHEMA_JSON = {
    "type": "struct",
    "fields": [
        {"name": "User - iD", "type": "long", "nullable": True, "metadata": {}},
        {"name": "FirstName", "type": "string", "nullable": True, "metadata": {}},
        {"name": "LastName", "type": "string", "nullable": True, "metadata": {}},
        {"name": "Age", "type": "decimal(15,3)", "nullable": True, "metadata": {}},
        {"name": "companyid", "type": "string", "nullable": True, "metadata": {}},
        {"name": "time stämp", "type": "long", "nullable": True, "metadata": {}},
        {"name": "__timestamp", "type": "timestamp_ntz", "nullable": True, "metadata": {}},
        {"name": "__is_deleted", "type": "boolean", "nullable": True, "metadata": {}},
        {"name": "__is_full_load", "type": "boolean", "nullable": True, "metadata": {}},
    ],
}

USER_ROWS = [
    {"User - iD": 1, "FirstName": "John", "LastName": "Anders",
     "Age": decimal.Decimal("14.000"), "companyid": "c1", "time stämp": 2001,
     "__timestamp": TS_NTZ, "__is_deleted": False, "__is_full_load": True},
    {"User - iD": 2, "FirstName": "Peter", "LastName": "Johniingham",
     "Age": decimal.Decimal("23.000"), "companyid": "c1", "time stämp": 2002,
     "__timestamp": TS_NTZ, "__is_deleted": False, "__is_full_load": True},
    {"User - iD": 3, "FirstName": "Petra", "LastName": "wayne",
     "Age": decimal.Decimal("24.000"), "companyid": "c1", "time stämp": 2003,
     "__timestamp": TS_NTZ, "__is_deleted": False, "__is_full_load": True},
]


def build_user(path: str, empty: bool = False) -> str:
    w = DeltaWriter(path)
    actions = [
        w.protocol_action(3, 7, reader_features=["timestampNtz"],
                          writer_features=["timestampNtz"]),
        w.metadata_action(USER_SCHEMA_JSON),
    ]
    if not empty:
        actions.append(w.add_data_file(arrow_table_physical(USER_SCHEMA_JSON, USER_ROWS)))
    w.commit(actions)
    return path


FAKER2_BASE_JSON = {
    "type": "struct",
    "fields": [
        {"name": "Super Name", "type": "string", "nullable": True, "metadata": {}},
        {"name": "Company Very Short", "type": "string", "nullable": True, "metadata": {}},
        {"name": "main_coord", "nullable": True, "metadata": {}, "type": {
            "type": "struct", "fields": [
                {"name": "lat", "type": "double", "nullable": True, "metadata": {}},
                {"name": "lon", "type": "double", "nullable": True, "metadata": {}},
            ]}},
        {"name": "coords", "nullable": True, "metadata": {}, "type": {
            "type": "array", "containsNull": True, "elementType": {
                "type": "struct", "fields": [
                    {"name": "lat", "type": "double", "nullable": True, "metadata": {}},
                    {"name": "lon", "type": "double", "nullable": True, "metadata": {}},
                ]}}},
        {"name": "age", "nullable": True, "metadata": {}, "type": {
            "type": "array", "containsNull": True, "elementType": "long"}},
    ],
}


def _faker2_schemas() -> tuple[dict, dict]:
    v0 = make_column_mapped_schema(FAKER2_BASE_JSON)
    evolved = json.loads(json.dumps(FAKER2_BASE_JSON))
    evolved["fields"].append(
        {"name": "new_name", "type": "string", "nullable": True, "metadata": {}}
    )
    v2 = make_column_mapped_schema(evolved)
    return v0, v2


def build_faker2(path: str) -> str:
    """Column mapping + nested types + partition + schema evolution +
    NULL partition value (FIXTURES.md F3)."""
    schema_v0, schema_v2 = _faker2_schemas()
    part_phys = _phys(schema_v0["fields"][1])
    config = {"delta.columnMapping.mode": "name", "delta.columnMapping.maxColumnId": "9"}
    w = DeltaWriter(path)

    def rows_bms(n0: int):
        return [
            {"Super Name": f"Name {i}",
             "main_coord": {"lat": 1.5 + i, "lon": 2.25 + i},
             "coords": [{"lat": 10.0 + i, "lon": 20.0 + i}, {"lat": 30.0 + i, "lon": None}],
             "age": [i, i + 1]}
            for i in range(n0, n0 + 2)
        ]

    drop = {"Company Very Short"}
    t_bms0 = arrow_table_physical(schema_v0, rows_bms(0), drop=drop)
    t_other = arrow_table_physical(
        schema_v0,
        [{"Super Name": "Solo", "main_coord": {"lat": -1.0, "lon": -2.0},
          "coords": [], "age": [99]}],
        drop=drop,
    )
    w.commit([
        w.protocol_action(2, 5),
        w.metadata_action(schema_v0, partition_columns=["Company Very Short"],
                          configuration=config, table_id="faker2-id"),
        w.add_data_file(t_bms0, partition_values={part_phys: "BMS"}),
        w.add_data_file(t_other, partition_values={part_phys: "Other Inc"}),
    ])
    # v1: metaData repeat (same schema)
    w.commit([
        w.metadata_action(schema_v0, partition_columns=["Company Very Short"],
                          configuration=config, table_id="faker2-id"),
    ])
    # v2: schema evolution adds new_name
    config2 = dict(config, **{"delta.columnMapping.maxColumnId": "10"})
    w.commit([
        w.metadata_action(schema_v2, partition_columns=["Company Very Short"],
                          configuration=config2, table_id="faker2-id"),
    ])
    # v3: new BMS file (with new_name) + NULL-partition file
    rows_new = [
        {**r, "new_name": f"nn {i}"} for i, r in enumerate(rows_bms(2))
    ]
    t_bms1 = arrow_table_physical(schema_v2, rows_new, drop=drop)
    t_null = arrow_table_physical(
        schema_v2,
        [{"Super Name": "hans", "main_coord": None, "coords": None,
          "age": None, "new_name": "Hans Heiri"}],
        drop=drop,
    )
    w.commit([
        w.add_data_file(t_bms1, partition_values={part_phys: "BMS"}),
        w.add_data_file(t_null, partition_values={part_phys: None}),
    ])
    return path


PARTITION_VALUES_ADDS = [
    {"as_big_decimal": "0", "as_int": "0", "as_byte": "0", "as_long": "0",
     "as_date": "2021-09-08", "as_string": "0",
     "as_timestamp": "2021-09-08 11:11:11", "as_float": "0.0", "as_short": "0",
     "as_boolean": "true", "as_string_lit_null": "null", "as_double": "0.0"},
    {k: None for k in ["as_big_decimal", "as_int", "as_byte", "as_long", "as_date",
                        "as_string", "as_timestamp", "as_float", "as_short",
                        "as_boolean", "as_string_lit_null", "as_double"]},
    {"as_big_decimal": "1", "as_int": "1", "as_byte": "1", "as_long": "1",
     "as_date": "2021-09-08", "as_string": "1",
     "as_timestamp": "2021-09-08 11:11:11", "as_float": "1.0", "as_short": "1",
     "as_boolean": "false", "as_string_lit_null": "null", "as_double": "1.0"},
]

PV_SCHEMA_JSON = {
    "type": "struct",
    "fields": [
        {"name": n, "type": t, "nullable": True, "metadata": {}}
        for n, t in [
            ("as_int", "integer"), ("as_long", "long"), ("as_byte", "byte"),
            ("as_short", "short"), ("as_boolean", "boolean"), ("as_float", "float"),
            ("as_double", "double"), ("as_string", "string"),
            ("as_string_lit_null", "string"), ("as_date", "date"),
            ("as_timestamp", "timestamp"), ("as_big_decimal", "decimal(1,0)"),
        ]
    ]
    + [
        {"name": "as_list_of_records", "nullable": True, "metadata": {}, "type": {
            "type": "array", "containsNull": True, "elementType": {
                "type": "struct", "fields": [
                    {"name": "val", "type": "integer", "nullable": True, "metadata": {}}
                ]}}},
        {"name": "as_nested_struct", "nullable": True, "metadata": {}, "type": {
            "type": "struct", "fields": [
                {"name": "aa", "type": "string", "nullable": True, "metadata": {}},
                {"name": "ab", "type": "string", "nullable": True, "metadata": {}},
                {"name": "ac", "nullable": True, "metadata": {}, "type": {
                    "type": "struct", "fields": [
                        {"name": "aca", "type": "integer", "nullable": True, "metadata": {}},
                        {"name": "acb", "type": "long", "nullable": True, "metadata": {}},
                    ]}},
            ]}},
        {"name": "value", "type": "string", "nullable": True, "metadata": {}},
    ],
}

PV_PARTITION_COLS = [
    "as_int", "as_long", "as_byte", "as_short", "as_boolean", "as_float",
    "as_double", "as_string", "as_string_lit_null", "as_date", "as_timestamp",
    "as_big_decimal",
]


def build_partition_values(path: str, with_data: bool = True) -> str:
    """FIXTURES.md F4 — every primitive as a partition value; data files
    optional (the reference keeps this fixture metadata-only)."""
    w = DeltaWriter(path)
    actions = [
        w.protocol_action(1, 2),
        w.metadata_action(PV_SCHEMA_JSON, partition_columns=PV_PARTITION_COLS),
    ]
    for i, pv in enumerate(PARTITION_VALUES_ADDS):
        if with_data:
            data = arrow_table_physical(
                PV_SCHEMA_JSON,
                [{"as_list_of_records": [{"val": i}],
                  "as_nested_struct": {"aa": f"a{i}", "ab": f"b{i}",
                                        "ac": {"aca": i, "acb": 10 * i}},
                  "value": str(i)}],
                drop=set(PV_PARTITION_COLS),
            )
            actions.append(w.add_data_file(data, partition_values=pv))
        else:
            actions.append(
                {"add": {"path": f"part-{i:05d}.snappy.parquet",
                          "partitionValues": pv, "size": 1944,
                          "modificationTime": 1636147668000, "dataChange": True}}
            )
    w.commit(actions)
    return path


STATS_SCHEMA_BASE = {
    "type": "struct",
    "fields": [
        {"name": n, "type": t, "nullable": True, "metadata": {}}
        for n, t in [
            ("as_int", "integer"), ("as_long", "long"), ("as_byte", "byte"),
            ("as_short", "short"), ("as_float", "float"), ("as_double", "double"),
            ("as_string", "string"), ("as_date", "date"),
            ("as_timestamp", "timestamp"), ("as_big_decimal", "decimal(1,0)"),
        ]
    ],
}


def build_stats_skipping(path: str) -> str:
    """FIXTURES.md F5 — stats under column mapping + an orphan parquet
    file that log replay must ignore."""
    schema = make_column_mapped_schema(STATS_SCHEMA_BASE)
    row = {
        "as_int": 0, "as_long": 0, "as_byte": 0, "as_short": 0,
        "as_float": 0.0, "as_double": 0.0, "as_string": "0",
        "as_date": date(2000, 1, 1),
        "as_timestamp": datetime(2000, 1, 1, tzinfo=None).replace(tzinfo=__import__("datetime").timezone.utc),
        "as_big_decimal": decimal.Decimal("0"),
    }
    live = arrow_table_physical(schema, [row])
    orphan = arrow_table_physical(schema, [dict(row, as_int=5, as_string="orphan")])
    w = DeltaWriter(path)
    w.commit([
        w.protocol_action(2, 5),
        w.metadata_action(
            schema,
            configuration={"delta.columnMapping.mode": "name",
                           "delta.columnMapping.maxColumnId": "10"},
        ),
        w.add_data_file(live),
    ])
    # orphan: a parquet file in the directory but NOT in the log
    import pyarrow.parquet as pq
    import os
    pq.write_table(orphan, os.path.join(path, "part-orphan.snappy.parquet"))
    return path


CLUSTER_SCHEMA_BASE = {
    "type": "struct",
    "fields": [
        {"name": "cluster_sk", "type": "long", "nullable": True, "metadata": {}},
        {"name": "Cluster Nr", "type": "string", "nullable": True, "metadata": {}},
        {"name": "Cluster Name", "type": "string", "nullable": True, "metadata": {}},
        {"name": "__metadata", "nullable": True, "metadata": {}, "type": {
            "type": "struct", "fields": [
                {"name": "inserted", "type": "timestamp", "nullable": True, "metadata": {}},
            ]}},
    ],
}


def build_cluster(path: str) -> str:
    """FIXTURES.md F6 — checkpointed log with add/remove churn, column
    mapping, partitioned so checkpoint partitionValues entry-lists are
    exercised.  Checkpoint at v10, commits through v14."""
    from datetime import timezone

    schema = make_column_mapped_schema(CLUSTER_SCHEMA_BASE)
    part_phys = _phys(schema["fields"][1])
    w = DeltaWriter(path)
    config = {"delta.columnMapping.mode": "name",
              "delta.columnMapping.maxColumnId": "5",
              "delta.targetFileSize": "134217728"}

    def tbl(sk: int):
        return arrow_table_physical(
            schema,
            [{"cluster_sk": sk, "Cluster Name": f"cluster {sk}",
              "__metadata": {"inserted": datetime(2024, 1, 1, tzinfo=timezone.utc)}}],
            drop={"Cluster Nr"},
        )

    first = w.add_data_file(tbl(0), partition_values={part_phys: "N0"})
    w.commit([
        w.protocol_action(2, 5),
        w.metadata_action(schema, partition_columns=["Cluster Nr"],
                          configuration=config, table_id="cluster-id"),
        first,
    ])
    for v in range(1, 10):
        acts = [w.add_data_file(tbl(v), partition_values={part_phys: f"N{v}"})]
        if v == 5:
            acts.append(w.remove_action(first["add"]["path"]))
        w.commit(acts)
    w.commit([w.add_data_file(tbl(10), partition_values={part_phys: "N10"})])
    w.write_checkpoint()  # v10
    for v in range(11, 15):
        w.commit([w.add_data_file(tbl(v), partition_values={part_phys: f"N{v}"})])
    return path
