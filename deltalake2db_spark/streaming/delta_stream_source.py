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

Options: ``path`` (required), ``startingVersion`` (int, or the string
``"latest"``; default = latest at stream start, i.e. only NEW commits
stream; 0 replays the full history), ``changeFeed``,
``skipChangeCommits``, ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
(admission control: ``latestOffset`` advances only as many commits as
fit the cap, so a large backlog drains in bounded micro-batches like
delta-spark's source; at least one commit is always admitted so the
stream makes progress even when a single commit exceeds the cap).
Pair the caps with a processing-time trigger: ``Trigger.AvailableNow``
captures ONE target offset at query start (the Python data-source
bridge exposes no admission-control interface to the wrapper), so an
availableNow run with a cap drains only the first capped batch.

Documented deviation from delta-spark: the default starting point is
the table's LATEST version (new commits only) — delta-spark instead
emits the existing snapshot as the first batch.  Replaying history is
explicit here (``startingVersion=0``); README.md's parity table calls
this out.  Change-feed rows carry ``_commit_timestamp`` (from the
commit's ``commitInfo.timestamp``, falling back to log-file mtime).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from ..plans.meta import _LOG_DIR, _commit_name, get_meta

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"
COMMIT_TIMESTAMP = "_commit_timestamp"
_META_COLS = (CHANGE_TYPE, COMMIT_VERSION, COMMIT_TIMESTAMP)


class _FileSpec:
    """One file of one commit: file URI + pre-decoded field plan +
    change metadata.  ``change_type=None`` means 'read the file's own
    _change_type column' (cdc files); ``keep_rows`` restricts to the
    given parquet row indexes (DV-growth deletes)."""

    __slots__ = (
        "file_uri", "field_plan", "version", "change_type", "dv",
        "keep_rows", "commit_ts_us", "size",
    )

    def __init__(
        self,
        file_uri: str,
        field_plan: list[tuple],
        version: int,
        change_type: str | None,
        dv: dict | None = None,
        keep_rows: list[int] | None = None,
        commit_ts_us: int | None = None,
        size: int = 0,
    ):
        self.file_uri = file_uri
        self.field_plan = field_plan
        self.version = version
        self.change_type = change_type
        self.dv = dv
        self.keep_rows = keep_rows
        self.commit_ts_us = commit_ts_us
        self.size = size

    def __getstate__(self):
        return {s: getattr(self, s) for s in self.__slots__}

    def __setstate__(self, st):
        for k, v in st.items():
            setattr(self, k, v)


class DeltaStreamPartition(InputPartition):
    """One TASK of a microbatch: a size-bundled run of file specs, in
    commit order.  Small-file change feeds (many tiny commits, the
    common streaming shape) would otherwise schedule one task per file
    — at a ~20 ms/task floor, a 100-file batch pays 2 s of pure
    scheduling for milliseconds of I/O.  Bundling to
    ``streamMaxPartitionBytes`` (default 128 MB — the same heuristic
    as ``spark.sql.files.maxPartitionBytes`` on the batch path) keeps
    one task per ~128 MB of change data instead; a large file still
    gets its own task, so parallelism at scale is unchanged."""

    def __init__(self, files: list, table_root: str | None):
        self.files = files
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
        mf = options.get("maxfilespertrigger")
        mb = options.get("maxbytespertrigger")
        self.max_files = int(mf) if mf is not None else None
        self.max_bytes = int(mb) if mb is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")
        mpb = options.get("streammaxpartitionbytes")
        self.max_partition_bytes = (
            int(mpb) if mpb is not None else 128 << 20
        )
        if self.max_partition_bytes < 1:
            raise ValueError("streamMaxPartitionBytes must be >= 1")
        self._state = get_meta(self.path)
        # admission-control position: the newest version this reader has
        # ADMITTED into an offset (advisory — batch CONTENT always comes
        # from the engine's checkpointed (start, end] range, so a stale
        # position after restart only affects batch sizing, never data)
        self._pos: int | None = None
        self._adm_cache: dict[int, tuple[int, int]] = {}

    # ---------------------------------------------------------- offsets

    def initialOffset(self) -> dict:
        sv = self.options.get("startingversion")
        st = self.options.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "startingVersion and startingTimestamp are mutually "
                "exclusive"
            )
        if st is not None:
            from ..plans.meta import version_at_timestamp

            off = (
                version_at_timestamp(self.path, st, mode="at_or_after") - 1
            )
        elif sv is None or str(sv).lower() == "latest":
            off = self._state.version
        else:
            off = int(sv) - 1
        self._pos = off if self._pos is None else max(self._pos, off)
        return {"version": off}

    def _admission_stats(self, v: int) -> tuple[int, int]:
        """(n_files, n_bytes) commit ``v`` would contribute to a batch —
        add + cdc actions with their sizes, from one log-JSON read
        (cached; the later ``partitions`` call re-reads the same JSON)."""
        hit = self._adm_cache.get(v)
        if hit is not None:
            return hit
        commit = f"{self.path}/{_LOG_DIR}/{_commit_name(v)}.json"
        files = n_bytes = 0
        for a in self._state._io.read_jsonl(commit):
            act = a.get("add") or a.get("cdc")
            if act is not None:
                files += 1
                n_bytes += int(act.get("size", 0) or 0)
        self._adm_cache[v] = (files, n_bytes)
        return files, n_bytes

    def latestOffset(self) -> dict:
        self._state.update_incremental()
        latest = self._state.version
        if self.max_files is None and self.max_bytes is None:
            return {"version": latest}
        if self._pos is None:  # engine restarted without initialOffset
            self.initialOffset()
        end = self._pos
        total_f = total_b = 0
        while end < latest:
            f, b = self._admission_stats(end + 1)
            if end > self._pos and (
                (self.max_files is not None and total_f + f > self.max_files)
                or (self.max_bytes is not None and total_b + b > self.max_bytes)
            ):
                break
            end += 1
            total_f += f
            total_b += b
            if (self.max_files is not None and total_f >= self.max_files) or (
                self.max_bytes is not None and total_b >= self.max_bytes
            ):
                break
        self._pos = end
        return {"version": end}

    def commit(self, end: dict) -> None:
        try:
            v = int(end["version"])
        except (TypeError, KeyError, ValueError):
            return
        self._pos = v if self._pos is None else max(self._pos, v)
        for k in [k for k in self._adm_cache if k <= v]:
            del self._adm_cache[k]

    # ------------------------------------------------------- partitions

    def _commit_changes(self, prev_adds: dict, v: int):
        """Return ``(changes, commit_ts_us)`` for commit ``v`` where
        changes is a list of (change_type, action, keep_rows), mutating
        ``prev_adds`` — the driver-side enumeration mirror of
        ``sources/changes.table_changes``.  The timestamp comes from the
        commit's ``commitInfo.timestamp`` (ms), falling back to the log
        file's mtime (delta-spark's rule for tables without
        inCommitTimestamp)."""
        from ..sources.changes import _dv_indexes

        commit = f"{self.path}/{_LOG_DIR}/{_commit_name(v)}.json"
        actions = self._state._io.read_jsonl(commit)
        ts_ms = next(
            (
                a["commitInfo"].get("timestamp")
                for a in actions
                if a.get("commitInfo")
            ),
            None,
        )
        if ts_ms is None:
            try:
                ts_ms = int(os.path.getmtime(commit) * 1000)
            except OSError:
                ts_ms = None
        ts_us = int(ts_ms) * 1000 if ts_ms is not None else None
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
        return changed, ts_us

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["version"]), int(end["version"])
        # keep the admission position in step with the engine's actual
        # range (it is authoritative after a checkpoint restart)
        self._pos = ev if self._pos is None else max(self._pos, ev)
        if ev <= sv:
            return []
        if sv < 0:
            # replay from table creation: no prior snapshot
            prev_adds: dict = {}
        else:
            prev_adds = dict(get_meta(self.path, version=sv).add_actions)
        specs: list[_FileSpec] = []
        for v in range(sv + 1, ev + 1):
            changed, ts_us = self._commit_changes(prev_adds, v)
            for change, action, keep_rows in changed:
                # file_uri handles quoted-relative AND absolute (shallow
                # clone) action paths alike
                uri = self._state.file_uri(action)
                specs.append(
                    _FileSpec(
                        uri,
                        _field_plan(self._state, action),
                        v,
                        change,
                        dv=None if keep_rows else action.get("deletionVector"),
                        keep_rows=keep_rows,
                        commit_ts_us=ts_us,
                        size=int(action.get("size") or 0),
                    )
                )
        # size-bundle in commit order (see DeltaStreamPartition)
        parts: list[DeltaStreamPartition] = []
        cur: list[_FileSpec] = []
        cur_bytes = 0
        for spec in specs:
            sz = max(spec.size, 1)
            if cur and cur_bytes + sz > self.max_partition_bytes:
                parts.append(DeltaStreamPartition(cur, self.path))
                cur, cur_bytes = [], 0
            cur.append(spec)
            cur_bytes += sz
        if cur:
            parts.append(DeltaStreamPartition(cur, self.path))
        return parts

    # ------------------------------------------------------------- read

    def read(self, partition: DeltaStreamPartition) -> Iterator:
        for spec in partition.files:
            yield from self._read_file(spec, partition.table_root)

    def _read_file(self, spec: _FileSpec, table_root: str | None) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..sources.pyds import _arrow_type

        if not spec.file_uri:
            return
        data_fields = [
            f for f in self.full_schema.fields if f.name not in _META_COLS
        ]
        table = pq.read_table(spec.file_uri)
        if spec.keep_rows is not None:
            table = table.take(pa.array(spec.keep_rows, type=pa.int64()))
        elif spec.dv:
            import numpy as np

            from ..plans.deletion_vectors import read_descriptor

            deleted = read_descriptor(spec.dv, table_root)
            mask = np.ones(table.num_rows, dtype=bool)
            mask[np.asarray(list(deleted), dtype=np.int64)] = False
            table = table.filter(pa.array(mask))
        n = table.num_rows
        by_phys = {name: i for i, name in enumerate(table.schema.names)}
        arrays, names = [], []
        for (lname, phys, decoded), f in zip(spec.field_plan, data_fields):
            ttype = _arrow_type(f.dataType)
            if phys is None:
                arrays.append(pa.array([decoded] * n, type=ttype))
            elif phys in by_phys:
                col = table.column(by_phys[phys]).combine_chunks()
                if col.type != ttype:
                    # view() reinterprets storage — only safe when the
                    # physical unit already matches (tz relabel).  An
                    # INT96-written timestamp surfaces as timestamp[ns];
                    # viewing that as [us] silently multiplies every
                    # instant by 1000, so unit changes must CAST.
                    same_unit_ts = (
                        pa.types.is_timestamp(col.type)
                        and pa.types.is_timestamp(ttype)
                        and col.type.unit == ttype.unit
                    )
                    try:
                        col = col.view(ttype) if same_unit_ts else col.cast(ttype)
                    except (pa.ArrowInvalid, pa.ArrowTypeError,
                            pa.ArrowNotImplementedError):
                        col = col.cast(ttype)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(n, type=ttype))
            names.append(lname)
        if self.change_feed:
            if spec.change_type is None:
                ct = table.column(by_phys[CHANGE_TYPE]).combine_chunks()
            else:
                ct = pa.array([spec.change_type] * n, type=pa.string())
            arrays.append(ct)
            names.append(CHANGE_TYPE)
            arrays.append(pa.array([spec.version] * n, type=pa.int64()))
            names.append(COMMIT_VERSION)
            arrays.append(
                pa.array(
                    [spec.commit_ts_us] * n,
                    type=pa.timestamp("us", tz="UTC"),
                )
            )
            names.append(COMMIT_TIMESTAMP)
        out = pa.table(dict(zip(names, arrays)))
        yield from out.to_batches(max_chunksize=65536)


def stream_schema(state, change_feed: bool) -> T.StructType:
    fields = list(state.schema.fields)
    if change_feed:
        fields += [
            T.StructField(CHANGE_TYPE, T.StringType(), False),
            T.StructField(COMMIT_VERSION, T.LongType(), False),
            T.StructField(COMMIT_TIMESTAMP, T.TimestampType(), True),
        ]
    return T.StructType(fields)
