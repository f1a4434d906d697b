"""Distributed Delta sink: ``DataFrame`` -> Delta table without
delta-spark.

The data path is fully distributed (``df.write.partitionBy().parquet``
into a staging directory); only the transaction commit is driver-side,
exactly like every Delta writer: executors move bytes, the driver moves
metadata.  Per-file statistics come from parquet FOOTERS
(``pyarrow.parquet`` metadata, threaded) — no second data pass — so the
tables this sink writes immediately benefit from the reader's
min/max/nullCount file skipping.

Supports: append / overwrite, hive-partitioned layouts (partition
values serialized per PROTOCOL.md, ``__HIVE_DEFAULT_PARTITION__`` ->
null), schema registration on first commit, stats on primitive columns.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from concurrent.futures import ThreadPoolExecutor
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Mapping, Optional, Sequence
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame

from ..plans.meta import get_meta
from .delta_writer import ConcurrentWriteError, DeltaWriter, _json_stat

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_CONSTRAINT_PREFIX = "delta.constraints."


class DeltaConstraintError(ValueError):
    """A write would violate a table CHECK constraint."""


class DeltaAppendOnlyError(ValueError):
    """A delete/overwrite/update was attempted on a
    ``delta.appendOnly=true`` table (writer protocol v2 obligation)."""


class DeltaInvariantError(ValueError):
    """A write would violate a NOT NULL or column invariant
    (writer protocol v2 obligation)."""


def _writer7_features(prev_writer_version: int) -> list:
    """The legacy writer features a table at ``prev_writer_version``
    implicitly uses, spelled out for a writer-version-7 protocol
    (PROTOCOL.md's legacy-to-feature mapping)."""
    feats = []
    if prev_writer_version >= 2:
        feats += ["appendOnly", "invariants"]
    if prev_writer_version >= 3:
        feats += ["checkConstraints"]
    if prev_writer_version >= 4:
        feats += ["changeDataFeed", "generatedColumns"]
    if prev_writer_version >= 5:
        feats += ["columnMapping"]
    if prev_writer_version >= 6:
        feats += ["identityColumns"]
    return feats


def check_append_only(state, operation: str) -> None:
    """Writer protocol v2: a table with ``delta.appendOnly=true`` only
    accepts commits that ADD data — DELETE/UPDATE/MERGE/overwrite/
    restore must be rejected, matching delta-spark's behavior."""
    cfg = (state.last_metadata or {}).get("configuration", {})
    if str(cfg.get("delta.appendOnly", "false")).lower() == "true":
        raise DeltaAppendOnlyError(
            f"operation {operation} is not allowed: this table is "
            "configured to only allow appends (delta.appendOnly=true)"
        )


def enforce_invariants(df: DataFrame, state) -> None:
    """Writer protocol v2 column invariants, both forms PROTOCOL.md
    defines: a non-nullable schema field rejects NULLs, and a field
    whose metadata carries ``delta.invariants`` (the JSON-wrapped
    expression delta-spark stores) rejects rows where the expression
    evaluates to FALSE (NULL passes, matching delta-spark's
    CheckDeltaInvariant which only throws on an explicit false).
    One short-circuit probe for all invariants together."""
    import json as _json

    from pyspark.sql import functions as F

    cols = set(df.columns)
    viols = []  # (label, violation predicate)
    for f in state.schema.fields:
        if f.name not in cols:
            continue
        if not f.nullable:
            viols.append(
                (f"{f.name} NOT NULL", F.col(f.name).isNull())
            )
        inv = (f.metadata or {}).get("delta.invariants")
        if inv:
            try:
                expr = _json.loads(inv)["expression"]["expression"]
            except (ValueError, KeyError, TypeError):
                continue
            viols.append(
                (
                    f"{f.name} invariant ({expr})",
                    F.expr(expr).cast("boolean") == F.lit(False),
                )
            )
    if not viols:
        return
    import functools
    import operator as _op

    any_viol = functools.reduce(_op.or_, (p for _, p in viols))
    if df.filter(any_viol).limit(1).count():
        # violation is the exceptional path: identify the culprit(s)
        # with one probe each for a precise error
        bad = [
            label
            for label, p in viols
            if df.filter(p).limit(1).count()
        ]
        raise DeltaInvariantError(
            "write violates column invariant(s): " + "; ".join(bad)
        )


def table_constraints(state) -> dict[str, str]:
    """CHECK constraints from table configuration
    (``delta.constraints.<name> = <sql expr>``, Delta's storage scheme)."""
    cfg = (state.last_metadata or {}).get("configuration", {})
    return {
        k[len(_CONSTRAINT_PREFIX):]: v
        for k, v in cfg.items()
        if k.startswith(_CONSTRAINT_PREFIX)
    }


def enforce_constraints(df: DataFrame, state) -> None:
    """Raise unless every row of ``df`` satisfies every table CHECK
    constraint.  Delta semantics: the expression must evaluate TRUE —
    NULL counts as a violation.  One distributed short-circuit probe
    (``limit(1)``) per constraint; all probes are cheap filters that
    stack on the write's own scan."""
    from pyspark.sql import functions as F

    for name, expr in table_constraints(state).items():
        ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
        if df.filter(~ok).limit(1).count():
            raise DeltaConstraintError(
                f"CHECK constraint {name!r} ({expr}) violated by at "
                "least one row of the write"
            )


def _replace_where_matches(state, conds) -> list[str]:
    """File paths whose partition tuple EXACTLY satisfies every
    condition.  Deliberately not the scan's fail-open pruning: pruning
    may keep a non-matching file (safe to read, catastrophic to
    remove), so this evaluates partition values directly and raises on
    anything it can't evaluate exactly."""
    from ..plans.filters import (
        decode_partition_value,
        normalize_partition_values,
    )
    from ..plans.types import delta_type_name

    types = {f.name: delta_type_name(f.dataType) for f in state.schema.fields}
    _, l2p = state.type_maps()
    pcols = set(state.partition_columns)
    bad = [c for c, _op, _v in conds if c not in pcols]
    if bad:
        raise ValueError(
            f"replace_where must reference partition columns only; "
            f"{bad} are not in {sorted(pcols)}"
        )

    def decode(col, val):
        if val is None:
            return None
        return decode_partition_value(str(val), types[col])

    def cmp(cur, op, col, val):
        if op in ("=", "=="):
            return cur is None if val is None else cur == decode(col, val)
        if op in ("!=", "<>"):
            if val is None:
                return cur is not None
            return cur is not None and cur != decode(col, val)
        if op == "in":
            return cur is not None and cur in {decode(col, v) for v in val}
        if op == "not in":
            return cur is not None and cur not in {
                decode(col, v) for v in val
            }
        if cur is None:
            return False
        if op == "<":
            return cur < decode(col, val)
        if op == "<=":
            return cur <= decode(col, val)
        if op == ">":
            return cur > decode(col, val)
        if op == ">=":
            return cur >= decode(col, val)
        raise ValueError(f"replace_where does not support operator {op!r}")

    matched = []
    for p, a in state.add_actions.items():
        pv = normalize_partition_values(a.get("partitionValues", {}))
        hit = True
        for col, op, val in conds:
            raw = pv.get(l2p.get(col, col))
            cur = (
                decode_partition_value(raw, types[col])
                if raw is not None
                else None
            )
            if not cmp(cur, op, col, val):
                hit = False
                break
        if hit:
            matched.append(p)
    return matched


def apply_generated_columns(df: DataFrame, schema) -> DataFrame:
    """Delta generated columns (``delta.generationExpression`` field
    metadata): a column ABSENT from the write is computed from its
    expression (delta-spark's fill path); a column PRESENT must match
    the expression on every row — a mismatch is rejected, because
    readers are entitled to treat the stored values and the expression
    as interchangeable (partition pruning on generated partition
    columns depends on it).  Null-safe comparison, one short-circuit
    probe per generated column present."""
    from pyspark.sql import functions as F

    gens = []
    for f in schema.fields:
        expr = (f.metadata or {}).get("delta.generationExpression")
        if expr:
            gens.append((f.name, expr, f.dataType))
    for name, expr, dt in gens:
        computed = F.expr(expr).cast(dt)
        if name not in df.columns:
            df = df.withColumn(name, computed)
        elif df.filter(~F.col(name).eqNullSafe(computed)).limit(1).count():
            raise DeltaInvariantError(
                f"generated column {name!r} does not match its "
                f"generation expression ({expr}) on at least one row"
            )
    return df


def _has_generated_columns(schema) -> bool:
    return any(
        (f.metadata or {}).get("delta.generationExpression")
        for f in schema.fields
    )


def _file_stats(path: str) -> dict:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    num_rows = md.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip (stats are top-level)
                continue
            st = col.statistics
            if st is None:
                continue
            nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
            if st.has_min_max:
                mn, mx = st.min, st.max
                if name not in mins or mn < mins[name]:
                    mins[name] = mn
                if name not in maxs or mx > maxs[name]:
                    maxs[name] = mx
    return {
        "numRecords": num_rows,
        "minValues": {k: _json_stat(v) for k, v in mins.items()},
        "maxValues": {k: _json_stat(v) for k, v in maxs.items()},
        "nullCount": nulls,
    }


def _partition_values_from_relpath(relpath: str) -> dict[str, Optional[str]]:
    pv: dict[str, Optional[str]] = {}
    for part in relpath.split("/")[:-1]:
        if "=" not in part:
            continue
        k, _, v = part.partition("=")
        pv[k] = None if v == HIVE_NULL else unquote(v)
    return pv


def write_delta(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
    extra_actions: Sequence[dict] = (),
    configuration: Optional[Mapping[str, str]] = None,
    replace_where=None,
) -> int:
    """Write ``df`` as a new commit of the Delta table at ``path``.

    Returns the committed version.  ``mode='overwrite'`` removes all
    previously-live files in the same commit (snapshot-consistent
    replace); ``'append'`` only adds.  ``extra_actions`` ride in the
    SAME commit (atomic with the data) — the streaming sink passes its
    ``txn`` idempotence marker here.  ``configuration`` seeds the table
    configuration on CREATE (ignored on an existing table) — e.g.
    ``{"delta.enableChangeDataFeed": "true"}`` turns on CDC writes for
    every later DML commit.

    ``replace_where`` (requires ``mode='overwrite'``) is delta-spark's
    partition-predicate ``replaceWhere``: only the files matching the
    condition (scan_delta's conditions grammar, e.g. ``[("day", "=",
    "2024-01-01")]``) are replaced, atomically with the new data.  The
    condition must touch PARTITION columns only — that is what makes
    file matching exact (every row of a file shares its partition
    tuple), so the remove set never clips a file with surviving rows —
    and the incoming frame must itself satisfy the condition (probed,
    delta-spark rule).
    """
    path = str(path).rstrip("/")
    if replace_where is not None:
        from ..plans.filters import normalize_conditions

        if mode != "overwrite":
            raise ValueError("replace_where requires mode='overwrite'")
        replace_where = normalize_conditions(replace_where)
    try:
        pre_state = get_meta(path)
    except FileNotFoundError:
        pre_state = None
    if replace_where is not None:
        from pyspark.sql import functions as F

        from ..plans.exprs import compile_conditions

        if pre_state is not None:
            pcols = set(pre_state.partition_columns)
            bad = [c for c, _op, _v in replace_where if c not in pcols]
            if bad:
                raise ValueError(
                    f"replace_where must reference partition columns "
                    f"only; {bad} are not in {sorted(pcols)}"
                )
        pred = compile_conditions(replace_where)
        if pred is not None and df.filter(
            ~F.coalesce(pred, F.lit(False))
        ).limit(1).count():
            raise ValueError(
                "replace_where: the incoming data contains rows that do "
                "not satisfy the replacement condition"
            )
    if pre_state is not None:
        if mode == "overwrite":
            check_append_only(pre_state, "OVERWRITE")
        df = apply_generated_columns(df, pre_state.schema)
        enforce_constraints(df, pre_state)
        enforce_invariants(df, pre_state)
        cfg = (pre_state.last_metadata or {}).get("configuration", {})
        if cfg.get("delta.columnMapping.mode", "none") != "none":
            # mapped tables store PHYSICAL column names in parquet;
            # project the logical input (and partition_by) before writing
            from .maintenance import _to_physical

            df = _to_physical(df, pre_state, set(df.columns))
            _, l2p = pre_state.type_maps()
            partition_by = [l2p.get(c, c) for c in partition_by]
    elif _has_generated_columns(df.schema):
        # table creation: the incoming frame necessarily carries the
        # generated columns (its schema declares them) — validate the
        # provided values against their expressions up front
        df = apply_generated_columns(df, df.schema)
    staging = tempfile.mkdtemp(prefix="dl2db_delta_sink_")
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        out = os.path.join(staging, "out")
        writer.parquet(out)

        # move data files into the table root, preserving partition dirs
        moved: list[str] = []  # rel paths
        for root, _dirs, files in os.walk(out):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                rel_dir = os.path.relpath(root, out)
                rel_dir = "" if rel_dir == "." else rel_dir
                new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
                rel = os.path.join(rel_dir, new_name) if rel_dir else new_name
                dst = os.path.join(path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
                moved.append(rel)

        # footer-only stats, threaded
        def build_add(rel: str) -> dict:
            abs_p = os.path.join(path, rel)
            action = {
                "path": quote(rel),
                "partitionValues": _partition_values_from_relpath(rel),
                "size": os.path.getsize(abs_p),
                "modificationTime": int(os.path.getmtime(abs_p) * 1000),
                "dataChange": True,
            }
            import json

            action["stats"] = json.dumps(_file_stats(abs_p))
            return {"add": action}

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(moved)))) as ex:
            adds = list(ex.map(build_add, moved))

        # Commit loop: the version file is created with put-if-absent
        # semantics (O_EXCL in DeltaWriter.commit); losing a race means
        # another writer committed that version first, so re-resolve the
        # snapshot (fresh removes for overwrite) and retry at the next
        # version instead of clobbering the winner's transaction.
        for _attempt in range(20):
            w = DeltaWriter(path)
            actions: list[dict] = []
            existing_version = -1
            try:
                state = get_meta(path)
                existing_version = state.version
            except FileNotFoundError:
                state = None
            if state is None:
                # CDF writes need writer version 4 per PROTOCOL.md
                cdf_on = (
                    str((configuration or {}).get(
                        "delta.enableChangeDataFeed", "false"
                    )).lower() == "true"
                )
                # CDF and generated columns are both legacy writer v4
                # features per PROTOCOL.md
                wv = 4 if cdf_on or _has_generated_columns(df.schema) else 2
                ict_on = (
                    str((configuration or {}).get(
                        "delta.enableInCommitTimestamps", "false"
                    )).lower() == "true"
                )
                if ict_on:
                    # inCommitTimestamp is a table FEATURE: writer v7
                    # with the legacy features spelled out per spec
                    actions.append(w.protocol_action(
                        1, 7,
                        writer_features=_writer7_features(wv)
                        + ["inCommitTimestamp"],
                    ))
                else:
                    actions.append(w.protocol_action(1, wv))
                actions.append(
                    w.metadata_action(
                        df.schema.jsonValue(),
                        partition_columns=partition_by,
                        configuration=configuration,
                    )
                )
            elif mode == "overwrite":
                targets = (
                    _replace_where_matches(state, replace_where)
                    if replace_where is not None
                    else list(state.add_actions)
                )
                for p in targets:
                    actions.append(w.remove_action(p))
            w.version = existing_version
            actions.extend(adds)
            actions.extend(extra_actions)
            try:
                version = w.commit(actions, operation="WRITE" if mode != "overwrite" or state is None else "OVERWRITE")
                break
            except ConcurrentWriteError:
                continue
        else:
            raise ConcurrentWriteError(
                f"gave up committing to {path} after 20 contended attempts"
            )
        # engines checkpoint periodically so readers bootstrap from
        # parquet instead of replaying the whole JSON history; honor
        # delta.checkpointInterval (default 10 — the reader's `v - v%10`
        # time-travel rounding assumes the default, and its full-replay
        # fallback covers custom intervals)
        cfg_now = (
            (state.last_metadata if state is not None else None)
            or {"configuration": dict(configuration or {})}
        ).get("configuration", {})
        interval = int(cfg_now.get("delta.checkpointInterval", 10) or 10)
        if version > 0 and interval > 0 and version % interval == 0:
            write_checkpoint(path)
        return version
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def delete_where(spark, path: str, condition) -> dict:
    """Row-level DELETE via deletion vectors — no file rewrite.

    Rows of the table at ``path`` matching ``condition`` (a Column or
    SQL string) are marked deleted by attaching roaring-bitmap deletion
    vectors to their files: each affected file is re-added with a
    ``deletionVector`` descriptor (merged with any existing DV) and the
    protocol is upgraded to ``minReaderVersion 3 /
    readerFeatures [deletionVectors]`` on first use — the same shape
    delta-spark's DELETE produces.  This is a capability the reference
    engine has no counterpart for (its protocol gate rejects DV tables
    outright, ``protocol_check.py``).

    The predicate is evaluated DISTRIBUTED (the scan runs with file/
    row-index metadata columns); only the matched positions come back to
    the driver to be bit-packed, mirroring how Delta engines collect
    per-file bitmaps at commit time.  Deletion vectors are by
    construction small relative to data (a billion-row delete is a
    ~128MB bitmap); for larger deletes rewrite the files instead.

    Returns ``{"version", "files", "deleted_rows"}``.
    """
    import json

    from ..plans.deletion_vectors import read_descriptor, write_dv_file
    from .delta import _DV_KEY, _DV_RI, scan_delta

    path = str(path).rstrip("/")
    state = get_meta(path)
    check_append_only(state, "DELETE")
    if isinstance(condition, str):
        from pyspark.sql import functions as F

        condition = F.expr(condition)

    hits = (
        scan_delta(spark, state, _with_pos=True)
        .filter(condition)
        .groupBy(_DV_KEY)
        .agg({_DV_RI: "collect_list"})
        .withColumnRenamed(f"collect_list({_DV_RI})", "rows")
        .collect()
    )
    if not hits:
        return {"version": state.version, "files": 0, "deleted_rows": 0}

    by_basename = {p.rsplit("/", 1)[-1]: a for p, a in state.add_actions.items()}
    targets: list[tuple[dict, list[int]]] = []  # (add action, merged indexes)
    n_deleted = 0
    for row in hits:
        action = by_basename[row[_DV_KEY]]
        new_idx = sorted(int(i) for i in row["rows"])
        n_deleted += len(new_idx)
        old = action.get("deletionVector")
        if old:
            merged = sorted(
                set(new_idx)
                | set(read_descriptor(old, path, opener=state._io._open))
            )
        else:
            merged = new_idx
        targets.append((action, merged))

    descriptors = write_dv_file(path, [idx for _, idx in targets])

    w = DeltaWriter(path)
    w.version = state.version
    actions: list[dict] = []
    proto = state.protocol or {}
    reader_feats = set(proto.get("readerFeatures") or [])
    if (
        proto.get("minReaderVersion", 1) < 3
        or "deletionVectors" not in reader_feats
    ):
        reader_feats.add("deletionVectors")
        # moving to feature-list protocol versions requires naming every
        # ACTIVE legacy feature explicitly (PROTOCOL.md table features)
        cfg = (state.last_metadata or {}).get("configuration", {})
        if cfg.get("delta.columnMapping.mode", "none") != "none":
            reader_feats.add("columnMapping")
        writer_feats = set(proto.get("writerFeatures") or []) | {
            "deletionVectors"
        }
        actions.append(
            w.protocol_action(3, 7, sorted(reader_feats), sorted(writer_feats))
        )
    for (action, _idx), desc in zip(targets, descriptors):
        updated = dict(action)
        updated["deletionVector"] = desc
        updated["dataChange"] = True
        actions.append(w.remove_action(action["path"]))
        actions.append({"add": updated})
    from .cdc import CHANGE_TYPE, cdf_enabled, write_cdc_partitioned

    if cdf_enabled(state):
        from pyspark.sql import functions as F

        # the scan applies existing DVs, so the filtered rows are
        # exactly the NEWLY-masked ones — the commit's delete changes
        deleted = (
            scan_delta(spark, state, _with_pos=True)
            .filter(condition)
            .drop(_DV_KEY, _DV_RI)
            .withColumn(CHANGE_TYPE, F.lit("delete"))
        )
        actions.extend(write_cdc_partitioned(deleted, state, path))
    version = w.commit(
        actions, operation="DELETE",
        operation_params={"predicate": str(condition)},
    )
    return {
        "version": version,
        "files": len(targets),
        "deleted_rows": n_deleted,
    }


def write_checkpoint(path: str) -> None:
    """Materialize the current snapshot as ``<v>.checkpoint.parquet`` +
    ``_last_checkpoint`` (resolved via full log replay, so it works on
    tables written by any writer)."""
    state = get_meta(path)
    w = DeltaWriter(path)
    w.version = state.version
    w._protocol = state.protocol
    w._meta = state.last_metadata
    w._adds = dict(state.add_actions)
    w.write_checkpoint()


def vacuum(
    path: str,
    dry_run: bool = True,
    retention_hours: float = 168.0,
    mode: str = "orphans",
) -> list[str]:
    """List (and with ``dry_run=False`` delete) reclaimable parquet
    files under the table directory, older than ``retention_hours``
    (default 7 days, like Delta — ``write_delta`` stages data files
    into the table root *before* the commit exists, so the grace
    window is what keeps vacuum from racing an in-flight write).

    ``mode='orphans'`` (conservative default): only files NO log
    version ever referenced — failed/uncommitted writes.  Time travel
    and change feeds stay fully intact.

    ``mode='full'``: Delta VACUUM semantics — everything not in the
    CURRENT snapshot qualifies, including expired tombstones (files
    rewritten by OPTIMIZE/UPDATE/MERGE, which ``'orphans'`` keeps
    forever) and aged ``_change_data/`` files.  Tombstone age is the
    file's REMOVAL time, per the Delta spec (delta-spark keys expiry
    off ``remove.deletionTimestamp``): a file written long ago but
    tombstoned minutes ago stays protected for the whole retention
    window, so time travel, CDF reads and concurrent readers inside
    the window keep working.  Because log timestamps can be
    unreliable (this repo's own writer pins them for determinism),
    the removal time is the MAX of the remove action's
    ``deletionTimestamp``, the removing commit's
    ``commitInfo.timestamp``, and the commit file's mtime —
    conservative in the protective direction.  File mtime is used
    only for never-referenced files (failed/uncommitted writes) and
    untracked ``_change_data/`` parquet.  Time travel and CDF reads
    further back than the retention window break afterwards, exactly
    as on delta-spark.
    """
    import time

    path = str(path).rstrip("/")
    cutoff = time.time() - retention_hours * 3600.0
    referenced: set[str] = set()
    removal_time: dict[str, float] = {}
    import json as _json

    log_dir = os.path.join(path, "_delta_log")
    if mode == "full":
        state = get_meta(path)
        referenced = {unquote(p) for p in state.add_actions}
        # removal time per tombstoned file, from every retained log
        # fragment that recorded the remove
        for fn in sorted(os.listdir(log_dir)):
            full = os.path.join(log_dir, fn)
            if len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit():
                mtime_ms = os.path.getmtime(full) * 1000.0
                commit_ts = 0.0
                removes = []
                with open(full) as fh:
                    for line in fh:
                        if not line.strip():
                            continue
                        action = _json.loads(line)
                        if action.get("commitInfo"):
                            commit_ts = float(
                                action["commitInfo"].get("timestamp") or 0
                            )
                        elif action.get("remove"):
                            removes.append(action["remove"])
                for rm in removes:
                    rel = unquote(rm["path"])
                    ts = max(
                        float(rm.get("deletionTimestamp") or 0),
                        commit_ts,
                        mtime_ms,
                    )
                    removal_time[rel] = max(removal_time.get(rel, 0.0), ts)
            elif fn.endswith(".checkpoint.parquet"):
                import pyarrow.parquet as pq

                mtime_ms = os.path.getmtime(full) * 1000.0
                for row in pq.read_table(full).to_pylist():
                    rm = row.get("remove")
                    if rm:
                        rel = unquote(rm["path"])
                        ts = max(
                            float(rm.get("deletionTimestamp") or 0), mtime_ms
                        )
                        removal_time[rel] = max(
                            removal_time.get(rel, 0.0), ts
                        )
    elif mode == "orphans":
        for fn in sorted(os.listdir(log_dir)):
            if len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit():
                with open(os.path.join(log_dir, fn)) as fh:
                    for line in fh:
                        if not line.strip():
                            continue
                        action = _json.loads(line)
                        # cdc files are referenced ONLY by cdc actions —
                        # without this they'd age into "orphans" and a
                        # vacuum would silently break change-feed reads
                        for key in ("add", "remove", "cdc"):
                            if action.get(key):
                                referenced.add(unquote(action[key]["path"]))
            elif fn.endswith(".checkpoint.parquet"):
                import pyarrow.parquet as pq

                for row in pq.read_table(
                    os.path.join(log_dir, fn)
                ).to_pylist():
                    if row.get("add"):
                        referenced.add(unquote(row["add"]["path"]))
    else:
        raise ValueError(f"unknown vacuum mode {mode!r}")

    orphans: list[str] = []
    for root, _dirs, files in os.walk(path):
        if "_delta_log" in root:
            continue
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            abs_p = os.path.join(root, fn)
            rel = os.path.relpath(abs_p, path)
            if rel in referenced:
                continue
            # tombstoned files age from their removal, orphans from
            # their creation
            age_ref = (
                removal_time[rel] / 1000.0
                if rel in removal_time
                else os.path.getmtime(abs_p)
            )
            if age_ref < cutoff:
                orphans.append(rel)
    if not dry_run:
        for rel in orphans:
            os.remove(os.path.join(path, rel))
    return sorted(orphans)
