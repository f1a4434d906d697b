"""Table maintenance: OPTIMIZE (small-file compaction), Z-ORDER data
layout, and deletion-vector purge — the operations that keep a Delta
table scannable after years of streaming appends and row-level deletes.

No counterpart exists in the reference engine (it is read-only); the
semantics follow delta-spark's OPTIMIZE / ZORDER BY / REORG PURGE.

Scale design: the data path is fully distributed — each partition
group's files are read through ``scan_delta`` (so deletion vectors are
applied and purged for free) and rewritten by executors; the driver
only moves metadata.  Groups rewrite independently, so a 100 TB table
compacts one partition at a time with bounded memory.  Z-ordering uses
driver-side add-action stats for the normalization bounds (no extra
data pass) and ``repartitionByRange`` + ``sortWithinPartitions`` on the
interleaved key — one shuffle per group, the minimum any re-layout can
do.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Mapping, Optional, Sequence
from urllib.parse import quote, unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.exprs import partition_tuple
from ..plans.meta import get_meta
from .cdc import cdf_enabled
from .delta_sink import _file_stats, check_append_only
from .delta_writer import DeltaWriter

_ZBITS = 16  # bits per column in the interleaved key


def _zorder_column(
    df: DataFrame, cols: Sequence[str], bounds: dict[str, tuple]
) -> Column:
    """Interleave ``_ZBITS`` bits per column into one long.

    Numeric / date / timestamp columns are range-normalized against the
    add-action stats bounds (locality-preserving); other types hash into
    the same bit budget (clusters equal values, no range locality).
    """
    by_name = {f.name: f for f in df.schema.fields}
    max_code = (1 << _ZBITS) - 1
    parts: list[Column] = []
    for i, c in enumerate(cols):
        dt = by_name[c].dataType
        if isinstance(
            dt,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
             T.TimestampType, T.TimestampNTZType),
        ):
            lo, hi = bounds.get(c, (None, None))
            col = F.col(c).cast("double")
            if lo is None or hi is None or not (hi > lo):
                code = F.lit(0)
            else:
                code = F.least(
                    F.lit(max_code),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (col - F.lit(float(lo)))
                            / F.lit(float(hi) - float(lo))
                            * max_code
                        ).cast("long"),
                    ),
                )
            code = F.coalesce(code, F.lit(0))
        else:
            code = F.pmod(F.xxhash64(F.col(c)), F.lit(max_code + 1))
        # spread column i's bits to positions b*k + i
        k = len(cols)
        spread = F.lit(0).cast("long")
        for b in range(_ZBITS):
            spread = spread.bitwiseOR(
                F.shiftleft(
                    F.shiftright(code, b).bitwiseAND(F.lit(1)), b * k + i
                ).cast("long")
            )
        parts.append(spread)
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return z


def _stat_bounds(actions: Sequence[dict], cols: Sequence[str]) -> dict:
    """(min, max) per column from add-action stats — free, no data pass."""
    import json

    lo: dict[str, Any] = {}
    hi: dict[str, Any] = {}
    for a in actions:
        st = a.get("stats")
        if not st:
            continue
        st = json.loads(st) if isinstance(st, str) else st
        for c in cols:
            mn = (st.get("minValues") or {}).get(c)
            mx = (st.get("maxValues") or {}).get(c)
            if mn is not None and (c not in lo or mn < lo[c]):
                lo[c] = mn
            if mx is not None and (c not in hi or mx > hi[c]):
                hi[c] = mx
    out = {}
    for c in cols:
        try:
            out[c] = (float(lo[c]), float(hi[c]))
        except (KeyError, TypeError, ValueError):
            out[c] = (None, None)
    return out


def optimize(
    spark: SparkSession,
    path: str,
    target_file_size: int = 128 << 20,
    zorder_by: Optional[Sequence[str]] = None,
    min_files: int = 2,
) -> dict:
    """Compact small files (and/or re-cluster by ``zorder_by``) into
    ``target_file_size`` files, one commit, ``dataChange=false``.

    Files with deletion vectors are physically purged (the rewrite reads
    through ``scan_delta``, which drops deleted rows) — REORG PURGE
    semantics come for free.  Returns
    ``{"version", "files_removed", "files_added", "groups"}`` (version
    is None when nothing qualified).
    """
    from .delta import scan_delta

    path = str(path).rstrip("/")
    state = get_meta(path)
    partition_cols = list(state.partition_columns)
    # partitionValues are keyed by PHYSICAL names on mapped tables
    _, l2p = state.type_maps()
    partition_phys = [l2p.get(c, c) for c in partition_cols]

    groups: dict[tuple, list[dict]] = {}
    for a in state.add_actions.values():
        groups.setdefault(partition_tuple(a, partition_phys), []).append(a)

    def qualifies(acts: list[dict]) -> bool:
        if zorder_by:
            return True
        small = [a for a in acts if int(a.get("size") or 0) < target_file_size]
        has_dv = any(a.get("deletionVector") for a in acts)
        return len(small) >= min_files or has_dv

    selected = {pt: acts for pt, acts in groups.items() if qualifies(acts)}
    if not selected:
        return {
            "version": None, "files_removed": 0, "files_added": 0,
            "groups": 0,
        }

    bounds = (
        _stat_bounds(
            [a for acts in selected.values() for a in acts], zorder_by
        )
        if zorder_by
        else {}
    )

    def transform(df: DataFrame, acts: list[dict]) -> DataFrame:
        total_bytes = sum(int(a.get("size") or 0) for a in acts)
        n_out = max(1, math.ceil(total_bytes / target_file_size))
        if zorder_by:
            zc = "__dl2db_zorder"
            return (
                df.withColumn(zc, _zorder_column(df, zorder_by, bounds))
                .repartitionByRange(n_out, zc)
                .sortWithinPartitions(zc)
                .drop(zc)
            )
        return df.coalesce(n_out)

    rep = _rewrite_groups(
        spark, path, state, selected, transform, data_change=False,
        operation="OPTIMIZE",
        operation_params={"zorder_by": list(zorder_by or [])},
    )
    rep["groups"] = len(selected)
    return rep


def _mapping_active(state) -> bool:
    cfg = (state.last_metadata or {}).get("configuration", {})
    return cfg.get("delta.columnMapping.mode", "none") != "none"


def _to_physical(df: DataFrame, state, keep_cols: set[str]) -> DataFrame:
    """Project logical columns back to their PHYSICAL names for writing
    (column-mapped tables store mapped names in parquet).  Nested struct
    field renames ride on ``cast`` — casting to a struct type with
    different field names renames positionally."""
    from ..plans.types import to_physical_schema

    phys = to_physical_schema(state.schema)
    exprs = []
    for lf, pf in zip(state.schema.fields, phys.fields):
        if lf.name not in keep_cols:
            continue
        exprs.append(F.col(lf.name).cast(pf.dataType).alias(pf.name))
    return df.select(*exprs)


def _rewrite_groups(
    spark: SparkSession,
    path: str,
    state,
    selected: dict[tuple, list[dict]],
    transform,
    data_change: bool,
    insert_df: Optional[DataFrame] = None,
    operation: str = "WRITE",
    operation_params: Optional[Mapping[str, Any]] = None,
    cdc_builder=None,
) -> dict:
    """Shared copy-on-write machinery: per partition group, read the
    group's files through ``scan_delta`` (DVs applied), run
    ``transform(df, acts)``, write, swap files in one commit.

    ``insert_df`` (MERGE's not-matched branch) is written as additional
    new files in the same commit, hive-partitioned by the table's
    partition columns.

    ``cdc_builder(df_group, acts) -> DataFrame | None`` (set when the
    table has ``delta.enableChangeDataFeed=true``) returns the group's
    change rows tagged with ``_change_type``; they are written under
    ``_change_data/`` and their ``cdc`` actions ride in the SAME commit
    (PROTOCOL.md "Add CDC File").  When ``insert_df`` is present its
    rows are additionally recorded as ``insert`` changes."""
    from .delta import scan_delta
    from .delta_sink import (
        _partition_values_from_relpath,
        enforce_constraints,
        table_constraints,
    )

    has_constraints = bool(table_constraints(state))
    partition_cols = list(state.partition_columns)
    _, _l2p_rw = state.type_maps()
    partition_phys_rw = [_l2p_rw.get(c, c) for c in partition_cols]

    def _group_rel_dir(acts: list[dict]) -> str:
        """Directory for a group's rewritten files, RELATIVE to the
        table root.  Normally the source file's own (already
        hive-encoded) directory — but a shallow clone's add actions
        carry ABSOLUTE URIs into the SOURCE table, and reusing those
        would drop rewrites outside the clone; rebuild the hive layout
        from partitionValues instead so the copy-on-write lands under
        the clone's root."""
        first = unquote(acts[0]["path"])
        if "://" not in first and not first.startswith("/"):
            return first.rsplit("/", 1)[0] if "/" in first else ""
        pv = acts[0].get("partitionValues") or {}
        segs = []
        for p in partition_phys_rw:
            v = pv.get(p)
            segs.append(
                f"{p}={quote(str(v), safe='')}"
                if v is not None
                else f"{p}=__HIVE_DEFAULT_PARTITION__"
            )
        return "/".join(segs)

    staging = tempfile.mkdtemp(prefix="dl2db_rewrite_")
    removed: list[str] = []
    added: list[tuple[str, dict]] = []  # (rel path, partitionValues)
    cdc_actions: list[dict] = []

    def _to_file_layout(df: DataFrame) -> DataFrame:
        """CDC rows to file layout: physical names / no partition cols,
        with ``_change_type`` carried through."""
        data_cols = set(df.columns) - set(partition_cols) - {"_change_type"}
        if _mapping_active(state):
            from ..plans.types import to_physical_schema

            phys = to_physical_schema(state.schema)
            exprs = [
                F.col(lf.name).cast(pf.dataType).alias(pf.name)
                for lf, pf in zip(state.schema.fields, phys.fields)
                if lf.name in data_cols
            ]
            exprs.append(F.col("_change_type"))
            return df.select(*exprs)
        drop = [c for c in partition_cols if c in df.columns]
        return df.drop(*drop) if drop else df

    try:
        for gi, (pt, acts) in enumerate(selected.items()):
            keep = {a["path"] for a in acts}
            df = scan_delta(
                spark, state, action_filter=lambda a, k=keep: a["path"] in k
            )
            # transform sees the full logical schema (UPDATE conditions
            # may reference partition columns); those columns are
            # stripped before the write since they live in
            # partitionValues, not in the data files, and mapped tables
            # are projected back to physical names
            if cdc_builder is not None:
                cdc_df = cdc_builder(df, acts)
                if cdc_df is not None:
                    from .cdc import write_cdc_group

                    cdc_rel_dir = _group_rel_dir(acts)
                    cdc_actions.extend(
                        write_cdc_group(
                            _to_file_layout(cdc_df),
                            path,
                            cdc_rel_dir,
                            dict(acts[0].get("partitionValues") or {}),
                        )
                    )
            df = transform(df, acts)
            if has_constraints and data_change:
                # CHECK constraints hold for UPDATE/MERGE outputs too
                enforce_constraints(df, state)
            data_cols = set(df.columns) - set(partition_cols)
            if _mapping_active(state):
                df = _to_physical(df, state, data_cols)
            elif partition_cols:
                df = df.drop(*partition_cols)
            out = os.path.join(staging, f"g{gi}")
            df.write.mode("overwrite").parquet(out)

            # reuse the group's existing directory layout (already
            # hive-encoded by whichever writer produced it); log paths
            # are URL-quoted, disk paths are not.  Absolute (shallow
            # clone) sources rebuild the layout under THIS table root.
            rel_dir = _group_rel_dir(acts)
            pv = dict(acts[0].get("partitionValues") or {})
            for fn in sorted(os.listdir(out)):
                if not fn.endswith(".parquet"):
                    continue
                new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
                rel = f"{rel_dir}/{new_name}" if rel_dir else new_name
                dst = os.path.join(path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(os.path.join(out, fn), dst)
                added.append((rel, pv))
            removed.extend(a["path"] for a in acts)

        if insert_df is not None:
            if has_constraints:
                enforce_constraints(insert_df, state)
            if cdc_builder is not None:
                # PROTOCOL.md: once a commit carries ANY cdc action,
                # readers use cdc INSTEAD of add/remove — so the insert
                # branch must be recorded as 'insert' changes too
                from .cdc import CHANGE_TYPE, write_cdc_partitioned

                cdc_actions.extend(
                    write_cdc_partitioned(
                        insert_df.withColumn(CHANGE_TYPE, F.lit("insert")),
                        state,
                        path,
                    )
                )
            part_by = list(partition_cols)
            if _mapping_active(state):
                _, l2p = state.type_maps()
                insert_df = _to_physical(
                    insert_df, state, set(insert_df.columns)
                )
                part_by = [l2p.get(c, c) for c in partition_cols]
            out = os.path.join(staging, "inserts")
            wr = insert_df.write.mode("overwrite")
            if part_by:
                wr = wr.partitionBy(*part_by)
            wr.parquet(out)
            for root, _dirs, files in os.walk(out):
                for fn in files:
                    if not fn.endswith(".parquet"):
                        continue
                    rel_dir = os.path.relpath(root, out)
                    rel_dir = "" if rel_dir == "." else rel_dir
                    new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
                    rel = (
                        os.path.join(rel_dir, new_name) if rel_dir else new_name
                    )
                    dst = os.path.join(path, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(os.path.join(root, fn), dst)
                    added.append((rel, _partition_values_from_relpath(rel)))

        def build_add(item: tuple[str, dict]) -> dict:
            rel, pv = item
            abs_p = os.path.join(path, rel)
            import json

            return {
                "add": {
                    "path": quote(rel),
                    "partitionValues": pv,
                    "size": os.path.getsize(abs_p),
                    "modificationTime": int(os.path.getmtime(abs_p) * 1000),
                    "dataChange": data_change,
                    "stats": json.dumps(_file_stats(abs_p)),
                }
            }

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(added)))) as ex:
            add_actions = list(ex.map(build_add, added))

        w = DeltaWriter(path)
        w.version = state.version
        actions: list[dict] = []
        for rel in removed:
            r = w.remove_action(rel)
            r["remove"]["dataChange"] = data_change
            actions.append(r)
        actions.extend(add_actions)
        actions.extend(cdc_actions)
        version = w.commit(
            actions, operation=operation, operation_params=operation_params
        )
        return {
            "version": version,
            "files_removed": len(removed),
            "files_added": len(added),
        }
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def update_where(
    spark: SparkSession,
    path: str,
    condition,
    set: dict[str, Any],
) -> dict:
    """Copy-on-write UPDATE: rows matching ``condition`` get the ``set``
    expressions applied; only the files that contain matching rows are
    rewritten (DVs on those files are purged in passing), in one
    ``dataChange=true`` commit.  Completes the DML triangle with
    ``write_delta`` (INSERT) and ``delete_where`` (DELETE) — the
    reference engine is read-only.

    ``set`` maps column name -> Column or SQL string, evaluated against
    the pre-update row (standard UPDATE semantics: all assignments see
    the old values).
    """
    from .delta import _DV_KEY, scan_delta

    path = str(path).rstrip("/")
    state = get_meta(path)
    check_append_only(state, "UPDATE")
    if isinstance(condition, str):
        condition = F.expr(condition)
    set_cols = {
        c: (F.expr(v) if isinstance(v, str) else v) for c, v in set.items()
    }
    unknown = [c for c in set_cols if c not in state.schema.fieldNames()]
    if unknown:
        raise ValueError(f"unknown columns in set: {unknown}")
    bad_parts = [c for c in set_cols if c in state.partition_columns]
    if bad_parts:
        raise ValueError(
            f"cannot update partition columns {bad_parts} in place — "
            "rows would have to move between partition directories"
        )

    # which files contain matching rows (distributed predicate pass)
    hit_files = {
        r[_DV_KEY]
        for r in scan_delta(spark, state, _with_pos=True)
        .filter(condition)
        .select(_DV_KEY)
        .distinct()
        .collect()
    }
    if not hit_files:
        return {
            "version": state.version, "files_removed": 0,
            "files_added": 0, "updated_files": 0,
        }

    partition_cols = list(state.partition_columns)
    _, l2p = state.type_maps()
    partition_phys = [l2p.get(c, c) for c in partition_cols]
    selected: dict[tuple, list[dict]] = {}
    for a in state.add_actions.values():
        if a["path"].rsplit("/", 1)[-1] in hit_files:
            selected.setdefault(
                partition_tuple(a, partition_phys), []
            ).append(a)

    def transform(df: DataFrame, acts: list[dict]) -> DataFrame:
        # simultaneous assignment: every expression sees the ORIGINAL
        # row (one select, no chained withColumn dependencies)
        updated = [
            F.when(condition, set_cols[c]).otherwise(F.col(c)).alias(c)
            if c in set_cols
            else F.col(c)
            for c in df.columns
        ]
        return df.select(*updated)

    cdc_builder = None
    if cdf_enabled(state):
        from .cdc import CHANGE_TYPE

        def cdc_builder(df: DataFrame, acts: list[dict]):
            matched = df.filter(condition)
            pre = matched.withColumn(CHANGE_TYPE, F.lit("update_preimage"))
            post = transform(matched, acts).withColumn(
                CHANGE_TYPE, F.lit("update_postimage")
            )
            return pre.unionByName(post)

    rep = _rewrite_groups(
        spark, path, state, selected, transform, data_change=True,
        operation="UPDATE", cdc_builder=cdc_builder,
    )
    rep["updated_files"] = rep["files_removed"]
    return rep


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: Sequence[str],
    when_matched_update: Any = "all",
    when_matched_delete: bool = False,
    when_not_matched_insert: bool = True,
) -> dict:
    """Equi-key MERGE (upsert): target rows whose ``on`` key appears in
    ``source`` are updated (or deleted), source rows with no match are
    inserted — one atomic commit, only the files containing matches are
    rewritten.  The reference engine is read-only; semantics follow
    delta-spark's MERGE INTO.

    ``when_matched_update``: ``"all"`` replaces every non-key column
    with the source's same-named column (classic upsert); a dict maps
    target column -> SQL string evaluated on the joined row, where the
    target is aliased ``t`` and the source ``s`` (e.g.
    ``{"qty": "t.qty + s.qty"}``); ``None`` leaves matched rows alone.
    ``when_matched_delete=True`` drops matched rows instead (mutually
    exclusive with an update spec).

    Scale: matched-file discovery and the join run distributed; like
    every Delta engine the source is read twice (once to find files,
    once to rewrite).  Duplicate source keys are rejected up front —
    Delta's multiple-source-rows-matched error — with one cheap
    aggregation over the source keys.
    """
    from .delta import _DV_KEY, scan_delta

    path = str(path).rstrip("/")
    state = get_meta(path)
    check_append_only(state, "MERGE")
    if when_matched_delete and when_matched_update not in (None, "all"):
        raise ValueError("choose either matched-update or matched-delete")
    on = list(on)
    target_cols = state.schema.fieldNames()
    missing_keys = [k for k in on if k not in source.columns]
    if missing_keys:
        raise ValueError(f"source lacks merge keys: {missing_keys}")

    dup = (
        source.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "multiple source rows match the same target key — aggregate "
            "the source first (Delta MERGE cardinality rule)"
        )

    src_keys = source.select(*on)
    target = scan_delta(spark, state, _with_pos=True)
    hit_files = {
        r[_DV_KEY]
        for r in target.join(src_keys, on=on, how="left_semi")
        .select(_DV_KEY)
        .distinct()
        .collect()
    }

    partition_cols = list(state.partition_columns)
    _, l2p = state.type_maps()
    partition_phys = [l2p.get(c, c) for c in partition_cols]
    selected: dict[tuple, list[dict]] = {}
    for a in state.add_actions.values():
        if a["path"].rsplit("/", 1)[-1] in hit_files:
            selected.setdefault(
                partition_tuple(a, partition_phys), []
            ).append(a)

    def transform(df: DataFrame, acts: list[dict]) -> DataFrame:
        t = df.alias("t")
        s = source.alias("s")
        # explicit equi-condition (NOT the USING-style string list,
        # which coalesces the key columns and breaks t./s. references)
        cond = F.lit(True)
        for k in on:
            cond = cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
        joined = t.join(s, on=cond, how="left")
        matched = F.col(f"s.{on[0]}").isNotNull()
        if when_matched_delete:
            return joined.filter(~matched).select(
                *[F.col(f"t.{c}").alias(c) for c in target_cols]
            )
        outcols = []
        for c in target_cols:
            tc = F.col(f"t.{c}")
            if when_matched_update is None or c in on:
                outcols.append(tc.alias(c))
            elif when_matched_update == "all":
                sc = F.col(f"s.{c}") if c in source.columns else tc
                outcols.append(F.when(matched, sc).otherwise(tc).alias(c))
            elif c in when_matched_update:
                expr = when_matched_update[c]
                expr = F.expr(expr) if isinstance(expr, str) else expr
                outcols.append(F.when(matched, expr).otherwise(tc).alias(c))
            else:
                outcols.append(tc.alias(c))
        return joined.select(*outcols)

    insert_df = None
    if when_not_matched_insert:
        tgt_keys = scan_delta(spark, state).select(*on)
        new_rows = source.join(tgt_keys, on=on, how="left_anti")
        by_name = {f.name: f for f in state.schema.fields}
        insert_df = new_rows.select(
            *[
                F.col(c).cast(by_name[c].dataType).alias(c)
                if c in new_rows.columns
                else F.lit(None).cast(by_name[c].dataType).alias(c)
                for c in target_cols
            ]
        )

    if not selected and insert_df is None:
        return {
            "version": state.version, "files_removed": 0,
            "files_added": 0, "matched_files": 0,
        }

    cdc_builder = None
    if cdf_enabled(state):
        from .cdc import CHANGE_TYPE

        def cdc_builder(df: DataFrame, acts: list[dict]):
            matched = df.join(F.broadcast(src_keys), on=on, how="left_semi")
            if when_matched_delete:
                return matched.withColumn(CHANGE_TYPE, F.lit("delete"))
            if when_matched_update is None:
                return None
            pre = matched.withColumn(CHANGE_TYPE, F.lit("update_preimage"))
            post = transform(matched, acts).withColumn(
                CHANGE_TYPE, F.lit("update_postimage")
            )
            return pre.unionByName(post)

    rep = _rewrite_groups(
        spark, path, state, selected, transform, data_change=True,
        insert_df=insert_df, operation="MERGE",
        operation_params={"on": ",".join(on)}, cdc_builder=cdc_builder,
    )
    rep["matched_files"] = len(
        [a for acts in selected.values() for a in acts]
    )
    return rep


# --------------------------------------------------------------------------
# RESTORE / HISTORY / SHALLOW CLONE / CHECK constraints
# --------------------------------------------------------------------------

def restore_table(spark: SparkSession, path: str, version: int) -> dict:
    """RESTORE the table to a previous ``version`` as a NEW commit
    (delta-spark ``RESTORE TABLE ... TO VERSION AS OF`` semantics).

    Driver-only metadata diff: files live at the target version but not
    now are re-added (with their original stats / deletion vectors);
    files live now but not then are removed; a changed schema or table
    configuration is restored by re-committing the target metaData.
    History is preserved — the restore is itself a commit, so it can be
    time-traveled across or restored again.  No data moves at any
    scale: cost is O(|files|) driver CPU.

    Raises if a file to re-add was vacuumed away (the restore window
    must be inside the vacuum retention, same rule as delta-spark).
    """
    path = str(path).rstrip("/")
    cur = get_meta(path)
    check_append_only(cur, "RESTORE")
    tgt = get_meta(path, version=version)

    def dv_key(a: Optional[dict]) -> Any:
        dv = (a or {}).get("deletionVector")
        return (dv or {}).get("pathOrInlineDv"), (dv or {}).get("offset")

    removes = [p for p in cur.add_actions if p not in tgt.add_actions]
    adds = [
        a for p, a in tgt.add_actions.items()
        if p not in cur.add_actions
        or dv_key(a) != dv_key(cur.add_actions.get(p))
    ]
    missing = [
        a["path"] for a in adds
        if "://" not in a["path"]
        and not os.path.exists(os.path.join(path, unquote(a["path"])))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot RESTORE {path} to v{version}: {len(missing)} data "
            f"file(s) were vacuumed, e.g. {missing[0]!r}"
        )

    w = DeltaWriter(path)
    w.version = cur.version
    actions: list[dict] = []
    if (tgt.last_metadata or {}) != (cur.last_metadata or {}):
        actions.append({"metaData": dict(tgt.last_metadata)})
    actions.extend(w.remove_action(p) for p in removes)
    for a in adds:
        re_add = dict(a)
        re_add["dataChange"] = True
        actions.append({"add": re_add})
    new_version = w.commit(
        actions, operation="RESTORE", operation_params={"version": version}
    )
    return {
        "version": new_version,
        "restored_version": version,
        "files_added": len(adds),
        "files_removed": len(removes),
    }


def describe_history(
    spark: SparkSession,
    path: str,
    storage_options: Optional[Mapping[str, Any]] = None,
) -> "DataFrame":
    """Table history from commitInfo actions, newest first — the
    ``DESCRIBE HISTORY`` surface (version, timestamp, operation,
    operationParameters, action counts per commit).

    Reads the JSON commits driver-side (metadata is driver-sized by
    construction); commits compacted away below a checkpoint horizon
    simply don't appear, matching other engines.
    """
    from ..plans.meta import _LOG_DIR, _commit_name, MetadataIO

    path = str(path).rstrip("/")
    io = MetadataIO(storage_options)
    state = get_meta(path, storage_options)
    rows = []
    for v in range(state.version, -1, -1):
        fn = f"{path}/{_LOG_DIR}/{_commit_name(v)}.json"
        try:
            acts = io.read_jsonl(fn)
        except FileNotFoundError:
            break  # older commits compacted into a checkpoint
        info = next(
            (a["commitInfo"] for a in acts if "commitInfo" in a), {}
        )
        rows.append((
            v,
            int(info.get("timestamp") or 0),
            str(info.get("operation") or ""),
            {k: str(vv) for k, vv in
             (info.get("operationParameters") or {}).items()},
            sum(1 for a in acts if "add" in a),
            sum(1 for a in acts if "remove" in a),
        ))
    schema = T.StructType([
        T.StructField("version", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField(
            "operationParameters",
            T.MapType(T.StringType(), T.StringType()), False,
        ),
        T.StructField("n_adds", T.LongType(), False),
        T.StructField("n_removes", T.LongType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def shallow_clone(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    storage_options: Optional[Mapping[str, Any]] = None,
) -> dict:
    """Zero-copy SHALLOW CLONE: a new table whose add actions reference
    the source's data files by ABSOLUTE path (the Delta spec allows
    absolute add paths; ``MetaState.file_uri`` resolves them).

    Deletion-vector descriptors are rewritten from table-root-relative
    (``u``) to absolute (``p``) so the clone reads the source's DV
    sidecars in place.  The clone then evolves independently — new
    commits write files under the clone root; the source is never
    touched.  Cost is O(|files|) metadata, zero data bytes — at 100 TB
    this is how you fork a table for an experiment in seconds.
    """
    from .delta import scan_delta  # noqa: F401 (parity import)
    from ..plans.deletion_vectors import dv_file_path

    src = str(src_path).rstrip("/")
    dst = str(dst_path).rstrip("/")
    state = get_meta(src, storage_options)
    os.makedirs(os.path.join(dst, "_delta_log"), exist_ok=True)

    w = DeltaWriter(dst)
    actions: list[dict] = [
        {"protocol": dict(state.protocol or {"minReaderVersion": 1,
                                             "minWriterVersion": 2})},
        w.metadata_action(
            json.loads(state.last_metadata["schemaString"]),
            partition_columns=state.last_metadata.get(
                "partitionColumns", []
            ),
            configuration=state.last_metadata.get("configuration", {}),
        ),
    ]
    for a in state.add_actions.values():
        c = dict(a)
        if "://" not in c["path"]:
            c["path"] = "file://" + os.path.join(src, unquote(c["path"]))
        dv = c.get("deletionVector")
        if dv and dv.get("storageType") == "u":
            c["deletionVector"] = {
                **dv,
                "storageType": "p",
                "pathOrInlineDv": dv_file_path(dv, src),
            }
        c["dataChange"] = True
        actions.append({"add": c})
    v = w.commit(
        actions, operation="CLONE",
        operation_params={"source": src, "isShallow": True},
    )
    return {
        "version": v,
        "files_referenced": len(state.add_actions),
        "source": src,
    }


def add_check_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> dict:
    """ALTER TABLE ADD CONSTRAINT (CHECK): existing rows are validated
    distributed (one short-circuit probe), then the constraint is
    stored in table configuration (``delta.constraints.<name>``) and
    ``minWriterVersion`` raised to 3 per the protocol — after which
    every ``write_delta`` append/overwrite enforces it."""
    from .delta import scan_delta
    from .delta_sink import DeltaConstraintError, _CONSTRAINT_PREFIX

    path = str(path).rstrip("/")
    state = get_meta(path)
    key = _CONSTRAINT_PREFIX + name
    cfg = dict((state.last_metadata or {}).get("configuration", {}))
    if key in cfg:
        raise ValueError(f"constraint {name!r} already exists on {path}")
    ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
    if scan_delta(spark, state).filter(~ok).limit(1).count():
        raise DeltaConstraintError(
            f"cannot add CHECK constraint {name!r} ({expr}): existing "
            "rows violate it"
        )
    cfg[key] = expr
    md = dict(state.last_metadata)
    md["configuration"] = cfg

    w = DeltaWriter(path)
    w.version = state.version
    actions: list[dict] = []
    proto = dict(state.protocol or {"minReaderVersion": 1,
                                    "minWriterVersion": 2})
    if int(proto.get("minWriterVersion", 2)) < 3:
        proto["minWriterVersion"] = 3
        actions.append({"protocol": proto})
    actions.append({"metaData": md})
    v = w.commit(
        actions, operation="ADD CONSTRAINT",
        operation_params={"name": name, "expr": expr},
    )
    return {"version": v, "name": name, "expr": expr}


def drop_check_constraint(
    spark: SparkSession, path: str, name: str
) -> dict:
    """ALTER TABLE DROP CONSTRAINT — removes the configuration entry."""
    from .delta_sink import _CONSTRAINT_PREFIX

    path = str(path).rstrip("/")
    state = get_meta(path)
    key = _CONSTRAINT_PREFIX + name
    cfg = dict((state.last_metadata or {}).get("configuration", {}))
    if key not in cfg:
        raise ValueError(f"no constraint {name!r} on {path}")
    del cfg[key]
    md = dict(state.last_metadata)
    md["configuration"] = cfg
    w = DeltaWriter(path)
    w.version = state.version
    v = w.commit(
        [{"metaData": md}], operation="DROP CONSTRAINT",
        operation_params={"name": name},
    )
    return {"version": v, "name": name}


def set_table_properties(
    spark: SparkSession, path: str, properties: Mapping[str, str]
) -> dict:
    """ALTER TABLE SET TBLPROPERTIES: merge ``properties`` into the
    table configuration as a metadata-only commit (a None value unsets
    a key).  This is how CDF / appendOnly / checkpointInterval get
    turned on AFTER creation; protocol requirements ride along —
    enabling change data feed raises ``minWriterVersion`` to 4 exactly
    like creating with it would."""
    path = str(path).rstrip("/")
    state = get_meta(path)
    cfg = dict((state.last_metadata or {}).get("configuration", {}))
    for k, v in properties.items():
        if v is None:
            cfg.pop(k, None)
        else:
            cfg[k] = str(v)
    md = dict(state.last_metadata)
    md["configuration"] = cfg
    actions: list[dict] = []
    proto = dict(
        state.protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    if (
        str(cfg.get("delta.enableChangeDataFeed", "false")).lower() == "true"
        and int(proto.get("minWriterVersion", 2)) < 4
    ):
        proto["minWriterVersion"] = 4
        actions.append({"protocol": proto})
    ict_newly_on = (
        str(cfg.get("delta.enableInCommitTimestamps", "false")).lower()
        == "true"
        and str(
            (state.last_metadata or {}).get("configuration", {}).get(
                "delta.enableInCommitTimestamps", "false"
            )
        ).lower() != "true"
    )
    if ict_newly_on:
        # post-hoc enablement: upgrade to writer v7 listing the legacy
        # features + inCommitTimestamp, and stamp the enablement
        # version/timestamp properties the spec asks for (readers use
        # them to know where ICT-based time travel becomes valid)
        from .delta_sink import _writer7_features

        wv = int(proto.get("minWriterVersion", 2))
        # Spell out the REAL prior writer version's legacy features —
        # clamping would drop columnMapping (v5) / identityColumns
        # (v6) from a table that declared them, which external Delta
        # clients treat as a protocol violation. A malformed v7
        # protocol with no feature list gets the full legacy superset.
        feats = list(proto.get("writerFeatures") or _writer7_features(
            min(wv, 6)
        ))
        if "inCommitTimestamp" not in feats:
            feats.append("inCommitTimestamp")
        proto["minWriterVersion"] = 7
        proto["writerFeatures"] = feats
        if not any("protocol" in a for a in actions):
            actions.append({"protocol": proto})
        enable_version = state.version + 1
        cfg["delta.inCommitTimestampEnablementVersion"] = str(
            enable_version
        )
        # The spec requires this property to EQUAL the enablement
        # commit's stamped inCommitTimestamp. Compute it with the same
        # monotonic rule DeltaWriter.commit applies (max(prev ICT + 1,
        # base + version)) instead of fabricating base + version,
        # which desynchronizes when a prior commit carried a higher
        # timestamp.
        _probe = DeltaWriter(path)
        _probe.version = enable_version
        _prev_ict = _probe._prev_in_commit_ts()
        cfg["delta.inCommitTimestampEnablementTimestamp"] = str(
            max((_prev_ict or 0) + 1, 1700000000000 + enable_version)
        )
        md["configuration"] = cfg
    actions.append({"metaData": md})
    w = DeltaWriter(path)
    w.version = state.version
    v = w.commit(
        actions,
        operation="SET TBLPROPERTIES",
        operation_params={"properties": dict(properties)},
    )
    return {"version": v, "configuration": cfg}


def _parse_interval_hours(text: str) -> float:
    """Parse Delta's ``interval N days|hours|minutes`` duration form."""
    parts = str(text).strip().lower().split()
    if len(parts) == 3 and parts[0] == "interval":
        n = float(parts[1])
        unit = parts[2].rstrip("s")
        factor = {"day": 24.0, "hour": 1.0, "minute": 1.0 / 60.0}.get(unit)
        if factor is not None:
            return n * factor
    raise ValueError(f"cannot parse interval {text!r}")


def cleanup_expired_logs(
    path: str,
    retention_hours: Optional[float] = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete log entries (commit JSONs + old checkpoints) that are both
    older than the retention window AND below the newest checkpoint —
    Delta's metadata-cleanup rule, which delta-spark runs after each
    checkpoint.  The newest checkpoint plus every commit at or above it
    always survive, so the current snapshot (and any time travel inside
    the retained window) replays exactly as before; travel to an
    expired version raises like on any engine.

    ``retention_hours`` defaults to the table's
    ``delta.logRetentionDuration`` (itself defaulting to Delta's
    ``interval 30 days``).  A streaming table committing every few
    seconds writes ~20k log files a day — without this, snapshot
    construction degrades linearly forever.  Returns the deleted (or,
    with ``dry_run``, deletable) file names.
    """
    import time

    path = str(path).rstrip("/")
    state = get_meta(path)
    if retention_hours is None:
        cfg = (state.last_metadata or {}).get("configuration", {})
        retention_hours = _parse_interval_hours(
            cfg.get("delta.logRetentionDuration", "interval 30 days")
        )
    cutoff = time.time() - retention_hours * 3600.0
    log_dir = os.path.join(path, "_delta_log")
    checkpoints = []
    entries: list[tuple[int, str]] = []  # (version, filename)
    for fn in os.listdir(log_dir):
        if fn[:20].isdigit():
            v = int(fn[:20])
            entries.append((v, fn))
            if ".checkpoint." in fn and fn.endswith(".parquet"):
                checkpoints.append(v)
    if not checkpoints:
        return []  # nothing below a checkpoint -> nothing reclaimable
    newest_cp = max(checkpoints)
    victims = [
        fn
        for v, fn in sorted(entries)
        if v < newest_cp
        and os.path.getmtime(os.path.join(log_dir, fn)) <= cutoff
    ]
    if not dry_run:
        for fn in victims:
            os.remove(os.path.join(log_dir, fn))
    return victims


# --------------------------------------------------------------------------
# Schema evolution DDL (ALTER TABLE ADD/RENAME/DROP COLUMN)
# --------------------------------------------------------------------------

def _max_column_id(schema_json: dict) -> int:
    best = 0

    def walk(fields):
        nonlocal best
        for f in fields:
            cid = (f.get("metadata") or {}).get("delta.columnMapping.id")
            if cid:
                best = max(best, int(cid))
            t = f.get("type")
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t["fields"])
    walk(schema_json.get("fields", []))
    return best


def _commit_metadata(path: str, state, md: dict, operation: str,
                     params: Mapping[str, Any],
                     protocol: Optional[dict] = None) -> int:
    w = DeltaWriter(path)
    w.version = state.version
    actions: list[dict] = []
    if protocol is not None:
        actions.append({"protocol": protocol})
    actions.append({"metaData": md})
    return w.commit(actions, operation=operation, operation_params=params)


def enable_column_mapping(spark: SparkSession, path: str) -> dict:
    """Upgrade an unmapped table to ``columnMapping.mode=name``.

    Existing fields keep their current names as physicalName (no data
    rewrite — exactly delta-spark's upgrade path); new columns added
    afterwards get fresh ``col-N`` physical names, so renames and drops
    become metadata-only from here on.  Protocol: reader 2 / writer 5.
    """
    path = str(path).rstrip("/")
    state = get_meta(path)
    cfg = dict((state.last_metadata or {}).get("configuration", {}))
    if cfg.get("delta.columnMapping.mode", "none") != "none":
        raise ValueError(f"{path} already column-mapped")

    sj = json.loads(state.last_metadata["schemaString"])
    counter = [0]

    def walk_field(f: dict) -> dict:
        counter[0] += 1
        md = dict(f.get("metadata") or {})
        md.setdefault("delta.columnMapping.id", counter[0])
        md.setdefault("delta.columnMapping.physicalName", f["name"])
        return {**f, "metadata": md}

    sj = {"type": "struct",
          "fields": [walk_field(f) for f in sj["fields"]]}
    cfg["delta.columnMapping.mode"] = "name"
    cfg["delta.columnMapping.maxColumnId"] = str(counter[0])
    md = dict(state.last_metadata)
    md["schemaString"] = json.dumps(sj)
    md["configuration"] = cfg
    proto = dict(state.protocol or {})
    proto["minReaderVersion"] = max(int(proto.get("minReaderVersion", 1)), 2)
    proto["minWriterVersion"] = max(int(proto.get("minWriterVersion", 2)), 5)
    v = _commit_metadata(path, state, md, "UPGRADE COLUMN MAPPING",
                         {"mode": "name"}, protocol=proto)
    return {"version": v, "columns": counter[0]}


def add_column(
    spark: SparkSession, path: str, name: str, delta_type: str,
) -> dict:
    """ALTER TABLE ADD COLUMN (nullable): metadata-only — existing
    files simply lack the column and the reader NULL-backfills (P6).
    On mapped tables the new field gets a fresh id + physical name."""
    path = str(path).rstrip("/")
    state = get_meta(path)
    sj = json.loads(state.last_metadata["schemaString"])
    if any(f["name"] == name for f in sj["fields"]):
        raise ValueError(f"column {name!r} already exists")
    cfg = dict((state.last_metadata or {}).get("configuration", {}))
    field: dict = {"name": name, "type": delta_type, "nullable": True,
                   "metadata": {}}
    if cfg.get("delta.columnMapping.mode", "none") != "none":
        cid = max(_max_column_id(sj),
                  int(cfg.get("delta.columnMapping.maxColumnId", 0))) + 1
        field["metadata"] = {
            "delta.columnMapping.id": cid,
            "delta.columnMapping.physicalName": f"col-{cid:02d}",
        }
        cfg["delta.columnMapping.maxColumnId"] = str(cid)
    sj["fields"] = sj["fields"] + [field]
    md = dict(state.last_metadata)
    md["schemaString"] = json.dumps(sj)
    md["configuration"] = cfg
    v = _commit_metadata(path, state, md, "ADD COLUMNS",
                         {"column": name, "type": delta_type})
    return {"version": v, "column": name}


def rename_column(
    spark: SparkSession, path: str, old: str, new: str
) -> dict:
    """ALTER TABLE RENAME COLUMN — metadata-only, REQUIRES column
    mapping (the parquet files keep the physical name; only the logical
    label changes).  Unmapped tables must call
    ``enable_column_mapping`` first, same rule as delta-spark."""
    path = str(path).rstrip("/")
    state = get_meta(path)
    cfg = (state.last_metadata or {}).get("configuration", {})
    if cfg.get("delta.columnMapping.mode", "none") == "none":
        raise ValueError(
            "RENAME COLUMN requires columnMapping (run "
            "enable_column_mapping first) — without it the parquet "
            "column names would have to be rewritten"
        )
    sj = json.loads(state.last_metadata["schemaString"])
    names = [f["name"] for f in sj["fields"]]
    if old not in names:
        raise ValueError(f"no column {old!r}")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    if old in state.partition_columns:
        pc = [new if c == old else c
              for c in state.last_metadata.get("partitionColumns", [])]
    else:
        pc = state.last_metadata.get("partitionColumns", [])
    sj["fields"] = [
        {**f, "name": new} if f["name"] == old else f for f in sj["fields"]
    ]
    md = dict(state.last_metadata)
    md["schemaString"] = json.dumps(sj)
    md["partitionColumns"] = pc
    v = _commit_metadata(path, state, md, "RENAME COLUMN",
                         {"old": old, "new": new})
    return {"version": v, "old": old, "new": new}


def drop_column(spark: SparkSession, path: str, name: str) -> dict:
    """ALTER TABLE DROP COLUMN — metadata-only under column mapping
    (the physical data stays in the files, unread)."""
    path = str(path).rstrip("/")
    state = get_meta(path)
    cfg = (state.last_metadata or {}).get("configuration", {})
    if cfg.get("delta.columnMapping.mode", "none") == "none":
        raise ValueError(
            "DROP COLUMN requires columnMapping (run "
            "enable_column_mapping first)"
        )
    if name in state.partition_columns:
        raise ValueError(f"cannot drop partition column {name!r}")
    sj = json.loads(state.last_metadata["schemaString"])
    if not any(f["name"] == name for f in sj["fields"]):
        raise ValueError(f"no column {name!r}")
    if len(sj["fields"]) == 1:
        raise ValueError("cannot drop the last column")
    sj["fields"] = [f for f in sj["fields"] if f["name"] != name]
    md = dict(state.last_metadata)
    md["schemaString"] = json.dumps(sj)
    v = _commit_metadata(path, state, md, "DROP COLUMNS", {"column": name})
    return {"version": v, "column": name}
