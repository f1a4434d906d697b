"""Delta transaction-log replay -> table snapshot (``MetaState``).

Reference parity (semantics, not code):
 - action folding (metaData / protocol / add / remove / commitInfo,
   last-writer-wins keyed by file path) —
   ``deltalake2db/delta_meta_retrieval.py:203-216``
 - checkpoint bootstrap via ``_last_checkpoint`` with ``v - v % 10``
   rounding for time travel — ``deltalake2db/delta_meta_retrieval.py:406-455``
 - ``update_incremental`` snapshot advancement —
   ``deltalake2db/delta_meta_retrieval.py:183-201``
 - table metadata getters — ``deltalake2db/delta_meta_retrieval.py:153-181``

Design note: metadata is tiny relative to data (a 100 TB table has ~1e5
add-actions ≈ tens of MB of JSON), so the log is replayed on the driver
with plain ``json.loads`` / pyarrow — never ``spark.read.json`` per
commit, which would pay a JVM round trip per log file.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Mapping, Sequence
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone
from typing import Any, Optional

from pyspark.sql import types as T

from .filters import (
    FilterType,
    iter_add_actions_filtered,
    normalize_partition_values,
)
from .types import parse_schema_string, physical_name

_LOG_DIR = "_delta_log"
# Driver-side replay holds one dict per live file; ~1e5 actions ≈ tens of
# MB (SCALE.md).  Past 5e5 we warn — the table should be compacted or read
# through the native connector, whose log replay is distributed.
_DRIVER_METADATA_WARN_FILES = 500_000


def _commit_name(version: int) -> str:
    return f"{version:020d}"


class MetadataIO:
    """Driver-side metadata reader. Local filesystem by default; paths
    with a URI scheme go through ``pyarrow.fs`` (S3/ABFS/GCS/HDFS).

    ``storage_options={"filesystem": <pyarrow.fs.FileSystem>}`` injects
    an explicit filesystem for schemed paths — the escape hatch for
    custom/obscure schemes (and what the test suite uses to exercise the
    non-local branch without cloud credentials)."""

    def __init__(self, storage_options: Optional[Mapping[str, Any]] = None):
        self.storage_options = storage_options or {}

    def _resolve_fs(self, path: str):
        """(pyarrow filesystem, in-filesystem path) for a schemed path."""
        import pyarrow.fs as pafs

        fs = self.storage_options.get("filesystem")
        if fs is not None:
            return fs, path.split("://", 1)[1]
        scheme = path.split("://", 1)[0]
        if scheme in ("az", "abfs", "abfss", "wasb", "wasbs"):
            # reference-dialect Azure options -> pyarrow AzureFileSystem
            # (account root), incl. the Azurite-emulator surface; see
            # sources/storage.py
            from ..sources.storage import (
                account_name_from_path,
                azure_container_path,
                pyarrow_azure_fs,
            )

            return (
                pyarrow_azure_fs(
                    self.storage_options, account_name_from_path(path)
                ),
                azure_container_path(path),
            )
        return pafs.FileSystem.from_uri(path)

    def _open(self, path: str):
        if "://" in path and not path.startswith("file://"):
            fs, rel = self._resolve_fs(path)
            return fs.open_input_file(rel)
        return open(path.removeprefix("file://"), "rb")

    def read_jsonl(self, path: str) -> list[dict]:
        try:
            with self._open(path) as fh:
                raw = fh.read()
        except (FileNotFoundError, OSError) as exc:
            raise FileNotFoundError(path) from exc
        return [json.loads(line) for line in raw.splitlines() if line.strip()]

    def read_parquet_actions(self, path: str) -> list[dict]:
        import pyarrow.parquet as pq

        try:
            with self._open(path) as fh:
                table = pq.read_table(fh)
        except (FileNotFoundError, OSError) as exc:
            raise FileNotFoundError(path) from exc
        try:
            # parquet MAP cells (real-engine checkpoints) -> dicts, matching
            # the JSON-commit shape; pyarrow >= 13
            return table.to_pylist(maps_as_pydicts="strict")
        except TypeError:
            return table.to_pylist()

    def list_files(self, path: str) -> list[str]:
        """List a directory (reference S4 — reserved for time-travel
        improvements; ``MetadataEngine.list_files`` parity)."""
        if "://" in path and not path.startswith("file://"):
            import pyarrow.fs as pafs

            fs, rel = self._resolve_fs(path)
            sel = pafs.FileSelector(rel, allow_not_found=True)
            return [info.path for info in fs.get_file_info(sel)]
        import os

        p = path.removeprefix("file://")
        return [os.path.join(p, n) for n in os.listdir(p)]

    def parquet_schema_names(self, path: str) -> list[str]:
        """Top-level physical column names present in a parquet footer."""
        import pyarrow.parquet as pq

        with self._open(path) as fh:
            return list(pq.read_schema(fh).names)


class MetaState:
    """Resolved snapshot of a Delta table at a version."""

    def __init__(
        self,
        delta_path: str,
        storage_options: Optional[Mapping[str, Any]] = None,
    ) -> None:
        self.delta_path = str(delta_path).rstrip("/")
        self.storage_options = storage_options
        self.last_metadata: Optional[dict] = None
        self.protocol: Optional[dict] = None
        self.add_actions: dict[str, dict] = {}
        self.last_commit_info: Optional[dict] = None
        self.version: int = 0
        self._io = MetadataIO(storage_options)

    # -- folding -----------------------------------------------------
    def apply_action(self, action: Mapping, version: int) -> None:
        if action.get("metaData"):
            md = dict(action["metaData"])
            cfg = md.get("configuration")
            if isinstance(cfg, list):
                # checkpoint parquet stores the MAP as key/value entry
                # structs; every configuration consumer (cdf_enabled,
                # table_constraints, columnMapping.mode) expects a dict
                md["configuration"] = {
                    e["key"]: e["value"] for e in cfg if e
                }
            self.last_metadata = md
        if action.get("protocol"):
            self.protocol = dict(action["protocol"])
        if action.get("add"):
            add = action["add"]
            self.add_actions[add["path"]] = dict(add)
        if action.get("remove"):
            self.add_actions.pop(action["remove"]["path"], None)
        if action.get("commitInfo"):
            self.last_commit_info = dict(action["commitInfo"])
        self.version = version

    # -- metadata getters (delta_meta_retrieval.py:153-181) -----------
    @property
    def configuration(self) -> dict:
        if self.last_metadata:
            return normalize_partition_values(self.last_metadata.get("configuration", {}))
        return {}

    @property
    def partition_columns(self) -> Sequence[str]:
        if self.last_metadata:
            return self.last_metadata.get("partitionColumns", [])
        return []

    @property
    def last_write_time(self) -> datetime:
        assert self.last_commit_info is not None, "no commitInfo replayed"
        ts = self.last_commit_info["timestamp"]
        return datetime.fromtimestamp(ts / 1000.0, timezone.utc)

    @property
    def schema_json(self) -> Optional[dict]:
        if self.last_metadata and self.last_metadata.get("schemaString"):
            return json.loads(self.last_metadata["schemaString"])
        return None

    @property
    def schema(self) -> Optional[T.StructType]:
        if self.last_metadata and self.last_metadata.get("schemaString"):
            return parse_schema_string(self.last_metadata["schemaString"])
        return None

    def type_maps(self) -> tuple[dict[str, str], dict[str, str]]:
        """(logical name -> delta type string, logical -> physical name)."""
        sj = self.schema_json or {"fields": []}
        type_map: dict[str, str] = {}
        l2p: dict[str, str] = {}
        for f in sj["fields"]:
            t = f["type"]
            type_map[f["name"]] = t if isinstance(t, str) else t.get("type", "string")
            l2p[f["name"]] = f.get("metadata", {}).get(
                "delta.columnMapping.physicalName", f["name"]
            )
        return type_map, l2p

    def get_add_actions_filtered(
        self, conditions: Optional[FilterType] = None, limit: Optional[int] = None
    ):
        from .filters import normalize_conditions

        type_map, l2p = self.type_maps()
        yield from iter_add_actions_filtered(
            self.add_actions.values(), normalize_conditions(conditions),
            type_map, l2p, limit
        )

    def file_uri(self, add_action: Mapping) -> str:
        path = add_action["path"]
        if "://" in path:
            return path  # absolute path add-action
        from urllib.parse import unquote

        return self.delta_path + "/" + unquote(path)

    # -- incremental advancement (delta_meta_retrieval.py:183-201) ----
    def update_incremental(self, up_to_version: Optional[int] = None) -> None:
        current = self.version + 1
        while up_to_version is None or current <= up_to_version:
            commit = f"{self.delta_path}/{_LOG_DIR}/{_commit_name(current)}.json"
            try:
                actions = self._io.read_jsonl(commit)
            except FileNotFoundError:
                break
            for action in actions:
                self.apply_action(action, current)
            current += 1

    # -- parallel footer probe (replaces the reference's serial
    #    per-file `parquet_schema` roundtrips, duckdb.py:457-459) ------
    def probe_file_columns(self, paths: Sequence[str], max_workers: int = 16) -> dict[str, tuple[str, ...]]:
        result: dict[str, tuple[str, ...]] = {}
        lock = threading.Lock()

        def probe(p: str) -> None:
            names = tuple(self._io.parquet_schema_names(p))
            with lock:
                result[p] = names

        if len(paths) <= 1:
            for p in paths:
                probe(p)
        else:
            with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
                list(ex.map(probe, paths))
        return result


def _apply_checkpoint(
    state: MetaState, io: MetadataIO, base: str, cp_version: int
) -> bool:
    """Fold the checkpoint at ``cp_version`` into ``state``.

    Tries the classic single-file ``<v>.checkpoint.parquet`` first, then
    V2 (UUID-named) checkpoints ``<v>.checkpoint.<uuid>.{parquet,json}``
    whose manifest may reference ``sidecar`` actions — files under
    ``_delta_log/_sidecars/`` holding the add/remove actions
    (PROTOCOL.md "V2 Spec Checkpoints"; the reference has no checkpoint
    support beyond the classic layout).  Returns False when no readable
    checkpoint exists (caller falls back to full JSON replay).
    """
    log = f"{base}/{_LOG_DIR}"
    actions: Optional[list[dict]] = None
    try:
        actions = io.read_parquet_actions(
            f"{log}/{_commit_name(cp_version)}.checkpoint.parquet"
        )
    except FileNotFoundError:
        prefix = f"{_commit_name(cp_version)}.checkpoint."
        try:
            names = sorted(
                full.rsplit("/", 1)[-1] for full in io.list_files(log)
            )
        except (FileNotFoundError, OSError):
            return False
        multipart: list[str] = []
        v2_name: Optional[str] = None
        for name in names:
            if not name.startswith(prefix):
                continue
            segs = name[len(prefix):].split(".")
            # classic multi-part: <v>.checkpoint.<part>.<parts>.parquet
            if (
                len(segs) == 3
                and segs[2] == "parquet"
                and segs[0].isdigit()
                and segs[1].isdigit()
            ):
                multipart.append(name)
            # v2 UUID-named: <v>.checkpoint.<uuid>.{parquet,json}
            elif len(segs) == 2 and segs[1] in ("parquet", "json"):
                v2_name = v2_name or name
        try:
            if multipart:
                actions = []
                for name in sorted(multipart):
                    actions.extend(io.read_parquet_actions(f"{log}/{name}"))
            elif v2_name is not None:
                if v2_name.endswith(".parquet"):
                    actions = io.read_parquet_actions(f"{log}/{v2_name}")
                else:
                    actions = io.read_jsonl(f"{log}/{v2_name}")
        except FileNotFoundError:
            return False
        if actions is None:
            return False
    for action in actions:
        sidecar = action.get("sidecar")
        if sidecar and sidecar.get("path"):
            for sub in io.read_parquet_actions(
                f"{log}/_sidecars/{sidecar['path']}"
            ):
                state.apply_action(sub, cp_version)
        else:
            state.apply_action(action, cp_version)
    return True


def get_meta(
    delta_path: str,
    storage_options: Optional[Mapping[str, Any]] = None,
    version: Optional[int] = None,
) -> MetaState:
    """Replay the log into a MetaState, optionally time-traveling.

    Bootstrap order: ``_last_checkpoint`` JSON -> ``N.checkpoint.parquet``
    -> remaining JSON commits.  Time travel to a version older than the
    last checkpoint restarts at ``v - v % 10`` (most engines write
    checkpoints every 10 versions); a missing checkpoint parquet falls
    back to full replay from version 0.
    """
    state = MetaState(delta_path, storage_options)
    io = state._io
    base = state.delta_path
    try:
        last_cp = io.read_jsonl(f"{base}/{_LOG_DIR}/_last_checkpoint")[0]
    except (FileNotFoundError, IndexError):
        last_cp = None

    start_version = 0
    if last_cp:
        cp_version = last_cp.get("version", 0)
        if version is not None and version < cp_version:
            cp_version = version - version % 10
        if _apply_checkpoint(state, io, base, cp_version):
            start_version = cp_version + 1

    current = start_version
    while version is None or current <= version:
        commit = f"{base}/{_LOG_DIR}/{_commit_name(current)}.json"
        try:
            actions = io.read_jsonl(commit)
        except FileNotFoundError:
            break
        for action in actions:
            state.apply_action(action, current)
        current += 1
    if state.protocol is None and state.last_metadata is None:
        raise FileNotFoundError(
            f"no Delta log found at {base}/{_LOG_DIR} (not a Delta table?)"
        )
    if len(state.add_actions) > _DRIVER_METADATA_WARN_FILES:
        import warnings

        warnings.warn(
            f"Delta snapshot at {base} holds {len(state.add_actions):,} live "
            f"files; driver-side log replay is sized for ~1e5 add actions "
            f"(tens of MB of dicts) and grows linearly past that.  The scan "
            f"still works, but above ~5e5 files consider compacting "
            f"(optimize_table) or the native delta-spark reader "
            f"(scan_delta_native), which replays the log on executors.",
            ResourceWarning,
            stacklevel=2,
        )
    return state


def version_at_timestamp(
    delta_path: str,
    ts,
    storage_options: Optional[Mapping[str, Any]] = None,
    mode: str = "at_or_before",
    clamp_latest: bool = False,
) -> int:
    """Resolve a timestamp to a commit version.

    ``mode='at_or_before'`` is ``timestampAsOf`` semantics: the LATEST
    version whose commit timestamp is <= ``ts`` (delta-spark's rule) —
    raises if ``ts`` predates the first retained commit, and raises if
    ``ts`` is after the last commit (also delta-spark's rule) unless
    ``clamp_latest`` resolves it to the last version instead (CDF
    ``endingTimestamp`` semantics).  ``mode='at_or_after'`` is
    ``startingTimestamp`` semantics: the EARLIEST version whose commit
    timestamp is >= ``ts`` — raises if ``ts`` is after the last commit
    (delta-spark's rule for streams).  ``ts`` may be an aware/naive
    ``datetime`` (naive = UTC), an ISO string, or epoch seconds.

    Commit times come from ``commitInfo.timestamp`` (ms).  The walk
    starts at the EARLIEST commit JSON still present (log cleanup may
    have deleted commits below the newest checkpoint) and ascends with
    early stop — version resolution happens once per query, and a
    checkpointed 10M-commit log would warrant a bisect on file mtime
    first; at any log length the I/O is one small JSON per inspected
    commit, driver-side only.  Timestamps older than the earliest
    retained commit raise a "history … expired" error rather than
    silently resolving against a truncated log.
    """
    from datetime import datetime as _dt
    from datetime import timezone as _tz

    if isinstance(ts, str):
        try:  # stream options arrive stringly; epoch seconds first
            ts = float(ts)
        except ValueError:
            ts = _dt.fromisoformat(ts)
    if isinstance(ts, _dt):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_tz.utc)
        target = ts.timestamp()
    else:
        target = float(ts)

    if mode not in ("at_or_before", "at_or_after"):
        raise ValueError(f"unknown mode {mode!r}")
    io = MetadataIO(storage_options)
    base = str(delta_path).rstrip("/")
    earliest = 0
    try:
        present = [
            int(name[:20])
            for p in io.list_files(f"{base}/{_LOG_DIR}")
            if (name := p.rsplit("/", 1)[-1]).endswith(".json")
            and len(name) == 25
            and name[:20].isdigit()
        ]
        if present:
            earliest = min(present)
    except (FileNotFoundError, OSError):
        pass  # fall back to the version-0 walk; read_jsonl reports
    best: Optional[int] = None
    prev_t = None
    last_t = None
    overshot = False
    current = earliest
    while True:
        commit = f"{base}/{_LOG_DIR}/{_commit_name(current)}.json"
        try:
            actions = io.read_jsonl(commit)
        except FileNotFoundError:
            break
        t_ms = next(
            (
                # inCommitTimestamp (writer feature) is authoritative
                # when present — file-clock timestamps can be equal or
                # regress across commits; ICT is strictly monotonic
                a["commitInfo"].get(
                    "inCommitTimestamp",
                    a["commitInfo"].get("timestamp"),
                )
                for a in actions
                if a.get("commitInfo")
            ),
            None,
        )
        t = (t_ms / 1000.0) if t_ms is not None else prev_t
        prev_t = t
        if t is not None:
            last_t = t
        if t is not None and t > target:
            if mode == "at_or_after":
                return current
            overshot = True
            break
        if t is not None and t == target and mode == "at_or_after":
            return current
        best = current
        current += 1
    if mode == "at_or_after":
        raise ValueError(
            f"timestamp {ts!r} is after the last commit of {base}"
        )
    if best is None:
        if earliest > 0:
            raise ValueError(
                f"timestamp {ts!r} predates the earliest retained commit "
                f"(version {earliest}) of {base}: history before it has "
                f"expired (log cleanup)"
            )
        raise ValueError(
            f"timestamp {ts!r} is before the first commit of {base}"
        )
    if (
        not overshot
        and not clamp_latest
        and last_t is not None
        and target > last_t
    ):
        raise ValueError(
            f"timestamp {ts!r} is after the last commit of {base}; pass a "
            f"version, an earlier timestamp, or clamp_latest=True"
        )
    return best


__all__ = [
    "MetaState", "MetadataIO", "get_meta", "physical_name",
    "version_at_timestamp",
]
