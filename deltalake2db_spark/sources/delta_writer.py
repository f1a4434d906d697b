"""Minimal driver-side Delta table writer (fixtures / roundtrip tests).

The reference never writes Delta — its tests use the ``deltalake``
(delta-rs) package as the writer oracle (``tests/test_polars_read.py``).
That package is not available here, so this module produces
protocol-correct tables the same way: parquet files via pyarrow plus a
hand-written ``_delta_log``.  It is metadata-grade (fixture/test scale),
not a distributed sink; large writes should go through
``df.write.parquet`` + a log commit per partition directory.

Supports: partitioned writes (PROTOCOL.md partition-value
serialization), column mapping mode=name (physical ``col-<n>`` names +
field ids), per-file stats (numRecords/minValues/maxValues/nullCount),
append & overwrite modes, schema-evolving appends, remove actions, and
checkpoint parquet emission for time-travel tests.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import date, datetime, timezone
from decimal import Decimal
from typing import Any, Mapping, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from ..plans.filters import serialize_partition_value
from ..plans.types import PHYSICAL_NAME_KEY


class ConcurrentWriteError(Exception):
    """Another writer committed this version first (atomic put-if-absent
    lost the race).  Callers may re-resolve the snapshot and retry at the
    next version."""


def _json_stat(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (datetime,)):
        return v.isoformat(sep="T")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="ignore")
    return v


def _compute_stats(table: pa.Table) -> dict:
    import pyarrow.compute as pc

    min_values: dict[str, Any] = {}
    max_values: dict[str, Any] = {}
    null_count: dict[str, Any] = {}
    for i, field in enumerate(table.schema):
        col = table.column(i)
        null_count[field.name] = col.null_count
        if pa.types.is_nested(field.type) or col.null_count == len(col):
            continue
        try:
            mm = pc.min_max(col)
            min_values[field.name] = _json_stat(mm["min"].as_py())
            max_values[field.name] = _json_stat(mm["max"].as_py())
        except pa.ArrowNotImplementedError:
            pass
    return {
        "numRecords": table.num_rows,
        "minValues": min_values,
        "maxValues": max_values,
        "nullCount": null_count,
    }


class DeltaWriter:
    """Accumulates commits for one table directory."""

    def __init__(self, path: str):
        self.path = str(path).rstrip("/")
        self.log_dir = os.path.join(self.path, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)
        self.version = -1
        # running state mirrored for checkpoint emission
        self._meta: Optional[dict] = None
        self._protocol: Optional[dict] = None
        self._adds: dict[str, dict] = {}

    # -- actions -----------------------------------------------------
    def metadata_action(
        self,
        schema_json: dict,
        partition_columns: Sequence[str] = (),
        configuration: Optional[Mapping[str, str]] = None,
        table_id: Optional[str] = None,
    ) -> dict:
        return {
            "metaData": {
                "id": table_id or str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema_json),
                "partitionColumns": list(partition_columns),
                "configuration": dict(configuration or {}),
                "createdTime": 1700000000000,
            }
        }

    def protocol_action(
        self,
        min_reader: int = 1,
        min_writer: int = 2,
        reader_features: Optional[Sequence[str]] = None,
        writer_features: Optional[Sequence[str]] = None,
    ) -> dict:
        p: dict[str, Any] = {
            "minReaderVersion": min_reader,
            "minWriterVersion": min_writer,
        }
        if reader_features is not None:
            p["readerFeatures"] = list(reader_features)
        if writer_features is not None:
            p["writerFeatures"] = list(writer_features)
        return {"protocol": p}

    def add_data_file(
        self,
        table: pa.Table,
        partition_values: Optional[Mapping[str, Optional[str]]] = None,
        stats: bool = True,
        subdir: str = "",
    ) -> dict:
        """Write a parquet file and return its add action (not committed)."""
        name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        rel = f"{subdir}/{name}".lstrip("/") if subdir else name
        abs_path = os.path.join(self.path, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        pq.write_table(table, abs_path)
        action = {
            "path": rel,
            "partitionValues": dict(partition_values or {}),
            "size": os.path.getsize(abs_path),
            "modificationTime": int(os.path.getmtime(abs_path) * 1000),
            "dataChange": True,
        }
        if stats:
            action["stats"] = json.dumps(_compute_stats(table))
        return {"add": action}

    def remove_action(self, rel_path: str) -> dict:
        return {
            "remove": {
                "path": rel_path,
                "deletionTimestamp": 1700000000000,
                "dataChange": True,
            }
        }

    def _prev_in_commit_ts(self) -> Optional[int]:
        """The previous commit's inCommitTimestamp (or its commitInfo
        timestamp as the enablement base) — one small JSON read; None
        when the previous commit is absent (v0, or log cleanup)."""
        fn = os.path.join(self.log_dir, f"{self.version - 1:020d}.json")
        try:
            with open(fn) as fh:
                first = fh.readline()
        except OSError:
            return None
        try:
            info = json.loads(first).get("commitInfo") or {}
        except json.JSONDecodeError:
            return None
        ict = info.get("inCommitTimestamp", info.get("timestamp"))
        return int(ict) if ict is not None else None

    def commit(
        self,
        actions: Sequence[dict],
        timestamp_ms: int = 1700000000000,
        operation: str = "WRITE",
        operation_params: Optional[Mapping[str, Any]] = None,
    ) -> int:
        # in-commit timestamps (writer feature `inCommitTimestamp`):
        # when the table property is on — via a metaData action in
        # THIS commit, prior writer state, or (for a writer freshly
        # attached to an existing table) the replayed log metadata —
        # stamp a STRICTLY MONOTONIC inCommitTimestamp into commitInfo
        # (which the protocol requires to be the first action; it
        # already is)
        meta_now = next(
            (a["metaData"] for a in actions if "metaData" in a),
            self._meta,
        )
        if meta_now is None and os.path.isdir(self.log_dir):
            try:
                from ..plans.meta import get_meta

                self._meta = get_meta(self.path).last_metadata
                meta_now = self._meta
            except Exception:
                meta_now = None
        ict_on = str(
            ((meta_now or {}).get("configuration") or {}).get(
                "delta.enableInCommitTimestamps", "false"
            )
        ).lower() == "true"
        self.version += 1
        info: dict[str, Any] = {
            "timestamp": timestamp_ms + self.version,
            "operation": operation,
        }
        if ict_on:
            prev = self._prev_in_commit_ts()
            info["inCommitTimestamp"] = max(
                (prev or 0) + 1, timestamp_ms + self.version
            )
        if operation_params:
            info["operationParameters"] = {
                k: str(v) for k, v in operation_params.items()
            }
        lines = [json.dumps({"commitInfo": info})]
        for a in actions:
            lines.append(json.dumps(a))
            if "metaData" in a:
                self._meta = a["metaData"]
            if "protocol" in a:
                self._protocol = a["protocol"]
            if "add" in a:
                self._adds[a["add"]["path"]] = a["add"]
            if "remove" in a:
                self._adds.pop(a["remove"]["path"], None)
        fn = os.path.join(self.log_dir, f"{self.version:020d}.json")
        # Delta's core commit rule is atomic put-if-absent: O_EXCL makes
        # the loser of a concurrent commit fail instead of silently
        # truncating the winner's transaction.
        try:
            fd = os.open(fn, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            self.version -= 1
            raise ConcurrentWriteError(
                f"version {self.version + 1} already committed at {fn}"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        return self.version

    def write_checkpoint(self, map_partition_values: bool = False) -> None:
        """Emit ``<v>.checkpoint.parquet`` + ``_last_checkpoint``.

        ``map_partition_values=False`` stores partitionValues as
        key/value entry-struct lists (what older writers produce);
        ``True`` stores a real parquet MAP column like delta-spark /
        delta-rs checkpoints — pyarrow decodes those cells as ``(k, v)``
        tuples, which the reader must normalize
        (the ``_to_dict`` path, delta_meta_retrieval.py:90-93).
        """
        if map_partition_values:
            rows = self._checkpoint_rows_raw()
            table = pa.Table.from_pylist(rows, schema=_MAP_CHECKPOINT_SCHEMA)
        else:
            def entries(d: Mapping) -> list[dict]:
                return [{"key": k, "value": v} for k, v in (d or {}).items()]

            rows = []
            if self._protocol:
                rows.append({"protocol": self._protocol, "metaData": None, "add": None})
            if self._meta:
                meta_cp = dict(self._meta)
                meta_cp["configuration"] = entries(meta_cp.get("configuration") or {})
                fmt = dict(meta_cp.get("format") or {})
                fmt["options"] = entries(fmt.get("options") or {})
                meta_cp["format"] = fmt
                rows.append({"protocol": None, "metaData": meta_cp, "add": None})
            for add in self._adds.values():
                add_cp = dict(add)
                add_cp["partitionValues"] = [
                    {"key": k, "value": v}
                    for k, v in (add.get("partitionValues") or {}).items()
                ]
                rows.append({"protocol": None, "metaData": None, "add": add_cp})
            table = pa.Table.from_pylist(rows)
        cp = os.path.join(self.log_dir, f"{self.version:020d}.checkpoint.parquet")
        pq.write_table(table, cp)
        with open(os.path.join(self.log_dir, "_last_checkpoint"), "w") as fh:
            fh.write(json.dumps({"version": self.version, "size": len(rows)}) + "\n")

    def write_v2_checkpoint(
        self, use_sidecars: bool = True, fmt: str = "parquet"
    ) -> None:
        """Emit a V2 (UUID-named) checkpoint:
        ``<v>.checkpoint.<uuid>.{parquet,json}`` whose manifest holds
        checkpointMetadata + protocol + metaData and either inline add
        actions or ``sidecar`` references to
        ``_delta_log/_sidecars/<uuid>.parquet`` files carrying the adds
        (PROTOCOL.md "V2 Spec Checkpoints")."""

        def entries(d: Mapping) -> list[dict]:
            return [{"key": k, "value": v} for k, v in (d or {}).items()]

        def add_row(add: Mapping) -> dict:
            add_cp = dict(add)
            add_cp["partitionValues"] = entries(add.get("partitionValues"))
            return add_cp

        manifest: list[dict] = [
            {"checkpointMetadata": {"version": self.version}}
        ]
        if self._protocol:
            manifest.append({"protocol": self._protocol})
        if self._meta:
            meta_cp = dict(self._meta)
            meta_cp["configuration"] = entries(meta_cp.get("configuration"))
            fmt_d = dict(meta_cp.get("format") or {})
            fmt_d["options"] = entries(fmt_d.get("options"))
            meta_cp["format"] = fmt_d
            manifest.append({"metaData": meta_cp})

        if use_sidecars and self._adds:
            sidecar_dir = os.path.join(self.log_dir, "_sidecars")
            os.makedirs(sidecar_dir, exist_ok=True)
            # two sidecars so the multi-file path is exercised
            adds = list(self._adds.values())
            halves = [adds[: len(adds) // 2 + 1], adds[len(adds) // 2 + 1 :]]
            for half in halves:
                if not half:
                    continue
                name = f"{uuid.uuid4()}.parquet"
                pq.write_table(
                    pa.Table.from_pylist([{"add": add_row(a)} for a in half]),
                    os.path.join(sidecar_dir, name),
                )
                manifest.append(
                    {
                        "sidecar": {
                            "path": name,
                            "sizeInBytes": os.path.getsize(
                                os.path.join(sidecar_dir, name)
                            ),
                            "modificationTime": 0,
                        }
                    }
                )
        else:
            manifest.extend({"add": add_row(a)} for a in self._adds.values())

        cp_name = f"{self.version:020d}.checkpoint.{uuid.uuid4()}.{fmt}"
        cp_path = os.path.join(self.log_dir, cp_name)
        if fmt == "json":
            with open(cp_path, "w") as fh:
                fh.write("\n".join(json.dumps(r) for r in manifest) + "\n")
        else:
            # pyarrow infers the schema from leading rows; single-key
            # rows must be padded to the full action-column set
            keys = [
                k
                for k in (
                    "checkpointMetadata", "protocol", "metaData",
                    "sidecar", "add",
                )
                if any(k in r for r in manifest)
            ]
            pq.write_table(
                pa.Table.from_pylist(
                    [{k: r.get(k) for k in keys} for r in manifest]
                ),
                cp_path,
            )
        with open(os.path.join(self.log_dir, "_last_checkpoint"), "w") as fh:
            fh.write(
                json.dumps({"version": self.version, "size": len(manifest)})
                + "\n"
            )

    def _checkpoint_rows_raw(self) -> list[dict]:
        """Checkpoint rows with maps kept as plain dicts (for the MAP-typed
        checkpoint schema, which pyarrow populates from dicts)."""
        rows: list[dict] = []
        if self._protocol:
            p = {
                "minReaderVersion": self._protocol.get("minReaderVersion"),
                "minWriterVersion": self._protocol.get("minWriterVersion"),
            }
            rows.append({"protocol": p, "metaData": None, "add": None})
        if self._meta:
            meta_cp = {
                "id": self._meta.get("id"),
                "format": dict(self._meta.get("format") or {"provider": "parquet", "options": {}}),
                "schemaString": self._meta.get("schemaString"),
                "partitionColumns": list(self._meta.get("partitionColumns") or []),
                "configuration": dict(self._meta.get("configuration") or {}),
                "createdTime": self._meta.get("createdTime"),
            }
            rows.append({"protocol": None, "metaData": meta_cp, "add": None})
        for add in self._adds.values():
            rows.append({
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": add["path"],
                    "partitionValues": dict(add.get("partitionValues") or {}),
                    "size": add.get("size"),
                    "modificationTime": add.get("modificationTime"),
                    "dataChange": bool(add.get("dataChange", True)),
                    "stats": add.get("stats"),
                },
            })
        return rows


_STR_MAP = pa.map_(pa.string(), pa.string())
_MAP_CHECKPOINT_SCHEMA = pa.schema(
    [
        (
            "protocol",
            pa.struct(
                [("minReaderVersion", pa.int64()), ("minWriterVersion", pa.int64())]
            ),
        ),
        (
            "metaData",
            pa.struct(
                [
                    ("id", pa.string()),
                    (
                        "format",
                        pa.struct([("provider", pa.string()), ("options", _STR_MAP)]),
                    ),
                    ("schemaString", pa.string()),
                    ("partitionColumns", pa.list_(pa.string())),
                    ("configuration", _STR_MAP),
                    ("createdTime", pa.int64()),
                ]
            ),
        ),
        (
            "add",
            pa.struct(
                [
                    ("path", pa.string()),
                    ("partitionValues", _STR_MAP),
                    ("size", pa.int64()),
                    ("modificationTime", pa.int64()),
                    ("dataChange", pa.bool_()),
                    ("stats", pa.string()),
                ]
            ),
        ),
    ]
)


def spark_schema_to_delta_json(schema) -> dict:
    """Spark StructType -> Delta schemaString JSON (identical format)."""
    return schema.jsonValue()


def make_column_mapped_schema(schema_json: dict, start_id: int = 1) -> dict:
    """Assign ``delta.columnMapping.physicalName``/``columnMapping.id`` to
    every (nested) field, like a writer with mode=name would."""
    counter = [start_id - 1]

    def walk_type(t: Any) -> Any:
        if isinstance(t, dict):
            if t.get("type") == "struct":
                return {"type": "struct", "fields": [walk_field(f) for f in t["fields"]]}
            if t.get("type") == "array":
                return {**t, "elementType": walk_type(t["elementType"])}
            if t.get("type") == "map":
                return {
                    **t,
                    "keyType": walk_type(t["keyType"]),
                    "valueType": walk_type(t["valueType"]),
                }
        return t

    def walk_field(f: dict) -> dict:
        counter[0] += 1
        cid = counter[0]
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.id"] = cid
        md[PHYSICAL_NAME_KEY] = f"col-{cid:02d}"
        return {**f, "metadata": md, "type": walk_type(f["type"])}

    return {"type": "struct", "fields": [walk_field(f) for f in schema_json["fields"]]}


def physical_arrow_names(schema_json: dict) -> dict[str, str]:
    return {
        f["name"]: (f.get("metadata") or {}).get(PHYSICAL_NAME_KEY, f["name"])
        for f in schema_json["fields"]
    }


def write_simple_delta(
    path: str,
    table: pa.Table,
    partition_by: Sequence[str] = (),
    schema_json: Optional[dict] = None,
    delta_types: Optional[Mapping[str, str]] = None,
) -> DeltaWriter:
    """One-commit unpartitioned-or-partitioned table from an Arrow table.

    ``delta_types`` maps column -> delta primitive type name for
    partition-value serialization (defaults to string-ish str()).
    """
    w = DeltaWriter(path)
    if schema_json is None:
        from pyspark.sql.pandas.types import from_arrow_schema

        schema_json = from_arrow_schema(table.schema).jsonValue()
    actions = [
        w.protocol_action(1, 2),
        w.metadata_action(schema_json, partition_columns=partition_by),
    ]
    if not partition_by:
        actions.append(w.add_data_file(table))
    else:
        import pyarrow.compute as pc

        keys = [table.column(c) for c in partition_by]
        combos = {tuple(row) for row in zip(*[k.to_pylist() for k in keys])}
        for combo in sorted(combos, key=lambda t: tuple(str(x) for x in t)):
            mask = None
            for col_name, val in zip(partition_by, combo):
                m = (
                    pc.is_null(table.column(col_name))
                    if val is None
                    else pc.equal(table.column(col_name), pa.scalar(val))
                )
                mask = m if mask is None else pc.and_(mask, m)
            part = table.filter(mask)
            data_only = part.drop_columns(list(partition_by))
            pv = {
                c: serialize_partition_value(
                    v, (delta_types or {}).get(c, "string")
                )
                for c, v in zip(partition_by, combo)
            }
            actions.append(w.add_data_file(data_only, partition_values=pv))
    w.commit(actions)
    return w
