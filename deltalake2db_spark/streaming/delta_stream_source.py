"""Structured Streaming source for Delta tables:
``spark.readStream.format("deltalake2db")``.

Built on Spark 4's Python Data Source streaming API
(``DataSourceStreamReader``): offsets are commit versions, each
micro-batch is exactly the commits in ``(start, end]``, and replay is
deterministic because the Delta log is append-only — a checkpointed
offset range always re-reads the same actions
(``readBetweenOffsets`` comes for free).

Two modes:

* **data stream** (default): new ``add`` actions stream as rows — the
  append-only tail of the table.  A commit that removes or rewrites
  files raises (streaming a mutation as plain rows would be silently
  wrong); pass ``.option("skipChangeCommits", "true")`` to skip such
  commits entirely (delta-spark's semantics).
* **change feed** (``.option("changeFeed", "true")``): rows carry
  ``_change_type`` + ``_commit_version``; commits with ``cdc`` actions
  stream their ``_change_data/`` files (true update pre/postimages,
  PROTOCOL.md), other commits derive insert/delete rows from
  add/remove actions and exact DV-growth diffs — the same semantics as
  ``sources/changes.table_changes``, delivered incrementally.

Scale: the driver only replays log JSON between offsets (O(changed
files) per batch); executors read one parquet file per partition with
the same zero-copy Arrow rename path as the batch source.  DV-diff
row indexes ride in the partition payload (compact bitmaps by
construction); rows never pass through the driver.

Options: ``path`` (required), ``startingVersion`` (int; default =
latest at stream start, i.e. only NEW commits stream; 0 replays the
full history), ``changeFeed``, ``skipChangeCommits``.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from ..plans.meta import _LOG_DIR, _commit_name, get_meta

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


class DeltaStreamPartition(InputPartition):
    """One file of one commit: file URI + pre-decoded field plan +
    change metadata.  ``change_type=None`` means 'read the file's own
    _change_type column' (cdc files); ``keep_rows`` restricts to the
    given parquet row indexes (DV-growth deletes)."""

    def __init__(
        self,
        file_uri: str,
        field_plan: list[tuple],
        version: int,
        change_type: str | None,
        dv: dict | None = None,
        keep_rows: list[int] | None = None,
        table_root: str | None = None,
    ):
        self.file_uri = file_uri
        self.field_plan = field_plan
        self.version = version
        self.change_type = change_type
        self.dv = dv
        self.keep_rows = keep_rows
        self.table_root = table_root


def _field_plan(state, action) -> list[tuple]:
    """(logical name, physical name | None, decoded partition value)
    per schema field — same plan shape as the batch source."""
    from ..plans.filters import (
        decode_partition_value,
        normalize_partition_values,
    )
    from ..plans.types import delta_type_name

    logical = state.schema
    _tmap, l2p = state.type_maps()
    partition_cols = set(state.partition_columns)
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
    return plan


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options):
        self.full_schema = schema
        self.options = options
        self.path = str(options["path"]).rstrip("/")
        self.change_feed = (
            str(options.get("changefeed", "false")).lower() == "true"
        )
        self.skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        self._state = get_meta(self.path)

    # ---------------------------------------------------------- offsets

    def initialOffset(self) -> dict:
        sv = self.options.get("startingversion")
        if sv is None:
            return {"version": self._state.version}
        return {"version": int(sv) - 1}

    def latestOffset(self) -> dict:
        self._state.update_incremental()
        return {"version": self._state.version}

    def commit(self, end: dict) -> None:
        pass

    # ------------------------------------------------------- partitions

    def _commit_changes(self, prev_adds: dict, v: int):
        """Yield (change_type, action, keep_rows) for commit ``v``,
        mutating ``prev_adds`` — the driver-side enumeration mirror of
        ``sources/changes.table_changes``."""
        from ..sources.changes import _dv_indexes

        commit = f"{self.path}/{_LOG_DIR}/{_commit_name(v)}.json"
        actions = self._state._io.read_jsonl(commit)
        adds = {a["add"]["path"]: a["add"] for a in actions if a.get("add")}
        removes = {
            a["remove"]["path"]: a["remove"] for a in actions if a.get("remove")
        }
        cdcs = [a["cdc"] for a in actions if a.get("cdc")]

        changed = []
        if cdcs and self.change_feed:
            # PROTOCOL.md: cdc actions ARE the commit's change set
            for c in cdcs:
                changed.append((None, c, None))
        else:
            data_change = False
            for p, add in adds.items():
                if not add.get("dataChange", True):
                    continue
                old = prev_adds.get(p)
                if old is None:
                    changed.append(("insert", add, None))
                    continue
                data_change = True
                if self.change_feed:
                    diff = sorted(
                        _dv_indexes(add, self.path, self._state._io._open)
                        - _dv_indexes(old, self.path, self._state._io._open)
                    )
                    if diff:
                        changed.append(("delete", old, diff))
            for p, rm in removes.items():
                if not rm.get("dataChange", True) or p in adds:
                    continue
                old = prev_adds.get(p)
                if old is None:
                    continue
                data_change = True
                if self.change_feed:
                    changed.append(("delete", old, None))
            if data_change and not self.change_feed:
                if self.skip_change_commits:
                    changed = []
                else:
                    raise ValueError(
                        f"commit {v} of {self.path} removes or rewrites "
                        "data files; a plain data stream cannot represent "
                        "it. Use .option('changeFeed','true') for row-level "
                        "changes or .option('skipChangeCommits','true') to "
                        "skip such commits."
                    )
        for p in removes:
            prev_adds.pop(p, None)
        prev_adds.update(adds)
        return changed

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["version"]), int(end["version"])
        if ev <= sv:
            return []
        if sv < 0:
            # replay from table creation: no prior snapshot
            prev_adds: dict = {}
        else:
            prev_adds = dict(get_meta(self.path, version=sv).add_actions)
        parts: list[DeltaStreamPartition] = []
        for v in range(sv + 1, ev + 1):
            for change, action, keep_rows in self._commit_changes(
                prev_adds, v
            ):
                # file_uri handles quoted-relative AND absolute (shallow
                # clone) action paths alike
                uri = self._state.file_uri(action)
                parts.append(
                    DeltaStreamPartition(
                        uri,
                        _field_plan(self._state, action),
                        v,
                        change,
                        dv=None if keep_rows else action.get("deletionVector"),
                        keep_rows=keep_rows,
                        table_root=self.path,
                    )
                )
        return parts

    # ------------------------------------------------------------- read

    def read(self, partition: DeltaStreamPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..sources.pyds import _arrow_type

        if not partition.file_uri:
            return
        data_fields = [
            f for f in self.full_schema.fields
            if f.name not in (CHANGE_TYPE, COMMIT_VERSION)
        ]
        table = pq.read_table(partition.file_uri)
        if partition.keep_rows is not None:
            table = table.take(pa.array(partition.keep_rows, type=pa.int64()))
        elif partition.dv:
            import numpy as np

            from ..plans.deletion_vectors import read_descriptor

            deleted = read_descriptor(partition.dv, partition.table_root)
            mask = np.ones(table.num_rows, dtype=bool)
            mask[np.asarray(list(deleted), dtype=np.int64)] = False
            table = table.filter(pa.array(mask))
        n = table.num_rows
        by_phys = {name: i for i, name in enumerate(table.schema.names)}
        arrays, names = [], []
        for (lname, phys, decoded), f in zip(partition.field_plan, data_fields):
            ttype = _arrow_type(f.dataType)
            if phys is None:
                arrays.append(pa.array([decoded] * n, type=ttype))
            elif phys in by_phys:
                col = table.column(by_phys[phys]).combine_chunks()
                if col.type != ttype:
                    try:
                        col = col.view(ttype)
                    except (pa.ArrowInvalid, pa.ArrowTypeError,
                            pa.ArrowNotImplementedError):
                        col = col.cast(ttype)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(n, type=ttype))
            names.append(lname)
        if self.change_feed:
            if partition.change_type is None:
                ct = table.column(by_phys[CHANGE_TYPE]).combine_chunks()
            else:
                ct = pa.array([partition.change_type] * n, type=pa.string())
            arrays.append(ct)
            names.append(CHANGE_TYPE)
            arrays.append(pa.array([partition.version] * n, type=pa.int64()))
            names.append(COMMIT_VERSION)
        out = pa.table(dict(zip(names, arrays)))
        yield from out.to_batches(max_chunksize=65536)


def stream_schema(state, change_feed: bool) -> T.StructType:
    fields = list(state.schema.fields)
    if change_feed:
        fields += [
            T.StructField(CHANGE_TYPE, T.StringType(), False),
            T.StructField(COMMIT_VERSION, T.LongType(), False),
        ]
    return T.StructType(fields)
