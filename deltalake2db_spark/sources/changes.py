"""``table_changes`` — row-level change feed between two table versions.

Commits that carry ``cdc`` actions (DML on a
``delta.enableChangeDataFeed=true`` table — see ``cdc.py``) are read
from their ``_change_data/`` files directly, as PROTOCOL.md requires;
all other commits are derived from the log's add/remove actions.

Incremental consumers (the training-data refresh case: "give me what
changed since my last run") get a DataFrame of the table's columns plus
``_change_type`` ('insert' | 'delete') and ``_commit_version``:

* a file added with ``dataChange`` -> inserts of its live rows;
* a file removed (not re-added) -> deletes of the rows that were live;
* a file re-added with a GROWN deletion vector (``delete_where``) ->
  deletes of exactly the newly-masked rows (bitmap set-difference);
* a rewrite (``update_where`` / ``merge_into``: remove + different add
  in one commit) -> delete-of-old + insert-of-new.  Without CDC files
  an update cannot be paired row-to-row, so it surfaces as a
  delete+insert changeset — semantically equivalent for consumers that
  apply changes by key.  With CDF enabled the same DML writes true
  ``update_preimage``/``update_postimage`` CDC rows and this derivation
  is skipped for that commit.
* ``dataChange=false`` commits (OPTIMIZE / Z-ORDER) produce nothing.
* a ``mode='overwrite'`` ``write_delta`` (which emits no cdc actions
  even on a CDF-enabled table, matching delta-spark) derives
  delete-of-every-previously-live-row + insert-of-every-new-row in the
  overwrite's version — old deletion vectors are honored, so rows
  already dead before the overwrite do not re-surface as deletes
  (pinned by ``tests/test_changes.py::
  test_overwrite_boundary_derives_delete_plus_insert``).

Scale: each changed file is scanned distributed through ``scan_delta``
(schema evolution / column mapping / DV masking all apply); only the
deletion-vector bitmaps themselves are decoded driver-side for the
set-difference (they are compact by construction — a billion deletes is
~128 MB of roaring bitmap; the ROWS never pass through the driver).
"""

from __future__ import annotations

import copy
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from collections import OrderedDict

from ..plans.meta import _LOG_DIR, MetaState, _commit_name, get_meta

_CHANGES_MEMO: OrderedDict[tuple, DataFrame] = OrderedDict()

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


def _state_with(state: MetaState, adds: dict[str, dict]) -> MetaState:
    """Shallow snapshot clone scoped to the given add actions — lets
    ``scan_delta`` read files that are no longer (or not yet) live."""
    clone = copy.copy(state)
    clone.add_actions = adds
    return clone


def _dv_indexes(action: dict, table_root: str, opener) -> set[int]:
    dv = action.get("deletionVector")
    if not dv:
        return set()
    from ..plans.deletion_vectors import read_descriptor

    return set(read_descriptor(dv, table_root, opener=opener))


def table_changes(
    spark: SparkSession,
    path: str,
    starting_version: Optional[int] = None,
    ending_version: Optional[int] = None,
    starting_timestamp=None,
    ending_timestamp=None,
) -> DataFrame:
    """Changes AFTER ``starting_version`` up to and including
    ``ending_version`` (default: latest).  Timestamp bounds mirror
    delta-spark's CDF options: ``starting_timestamp`` selects the
    earliest commit at-or-after it (so its changes are included),
    ``ending_timestamp`` the latest commit at-or-before it; each is
    mutually exclusive with its version twin."""
    from ..plans.meta import version_at_timestamp
    from .delta import _DV_KEY, _DV_RI, _log_fingerprint, scan_delta

    path = str(path).rstrip("/")
    # change-feed plan memo, same contract as scan_delta's: keyed on the
    # full bound arguments plus a per-entry fingerprint of the log dir,
    # so any commit invalidates (timestamp bounds are resolved against
    # the log, so they key soundly too)
    memo_key = None
    if "://" not in path:
        fp = _log_fingerprint(path)
        if fp is not None:
            import os as _os

            memo_key = (
                spark.sparkContext.applicationId, _os.path.abspath(path),
                starting_version, ending_version,
                str(starting_timestamp), str(ending_timestamp), fp,
            )
            hit = _CHANGES_MEMO.get(memo_key)
            if hit is not None:
                _CHANGES_MEMO.move_to_end(memo_key)
                return hit
    if starting_timestamp is not None:
        if starting_version is not None:
            raise ValueError(
                "starting_version and starting_timestamp are mutually "
                "exclusive"
            )
        starting_version = (
            version_at_timestamp(path, starting_timestamp, mode="at_or_after")
            - 1
        )
    if starting_version is None:
        raise ValueError("a starting version or timestamp is required")
    if ending_timestamp is not None:
        if ending_version is not None:
            raise ValueError(
                "ending_version and ending_timestamp are mutually exclusive"
            )
        # CDF endingTimestamp past the last commit clamps to the latest
        # version (delta-spark CDC semantics; timestampAsOf would raise)
        ending_version = version_at_timestamp(
            path, ending_timestamp, clamp_latest=True
        )
    if starting_version < 0:
        # starting_timestamp at-or-before the FIRST commit resolves to
        # version 0, i.e. "include everything" — delta-spark starts the
        # feed at the earliest version.  There is no version -1 snapshot
        # to replay; the pre-commit-0 state is simply an empty table.
        state = get_meta(path)
        prev_adds: dict[str, dict] = {}
    else:
        state = get_meta(path, version=starting_version)
        prev_adds = dict(state.add_actions)
    io = state._io
    # every part of the feed is resolved against the END version's
    # schema (delta-spark CDF semantics): files and cdc rows written
    # before a column was added backfill it as typed NULLs — otherwise
    # the union across a schema-evolution boundary cannot line up
    schema_state = (
        get_meta(path, version=ending_version)
        if ending_version is not None
        else get_meta(path)
    )

    parts: list[DataFrame] = []

    def tagged(df: DataFrame, change: str, v: int) -> DataFrame:
        return df.withColumn(CHANGE_TYPE, F.lit(change)).withColumn(
            COMMIT_VERSION, F.lit(v).cast("long")
        )

    def rows_of(actions: dict[str, dict], v: int, change: str) -> DataFrame:
        """ONE grouped scan for all of a commit's same-change files —
        O(1) plan nodes per (commit, change type), not O(files)."""
        df = scan_delta(spark, _state_with(schema_state, actions))
        return tagged(df, change, v)

    def dv_diff_rows(old: dict, new: dict, v: int) -> Optional[DataFrame]:
        new_idx = _dv_indexes(new, path, io._open)
        old_idx = _dv_indexes(old, path, io._open)
        diff = sorted(new_idx - old_idx)
        if not diff:
            return None
        # read the file as of BEFORE the commit (old DV), keep only the
        # newly-masked row indexes
        df = scan_delta(
            spark, _state_with(schema_state, {old["path"]: old}),
            _with_pos=True,
        )
        idx_df = spark.createDataFrame(
            [(i,) for i in diff], schema=f"{_DV_RI} long"
        )
        hit = df.join(F.broadcast(idx_df), on=_DV_RI, how="left_semi").drop(
            _DV_KEY, _DV_RI
        )
        return tagged(hit, "delete", v)

    v = starting_version + 1
    while ending_version is None or v <= ending_version:
        commit = f"{path}/{_LOG_DIR}/{_commit_name(v)}.json"
        try:
            actions = io.read_jsonl(commit)
        except FileNotFoundError:
            if ending_version is not None:
                raise ValueError(
                    f"version {v} does not exist at {path}"
                ) from None
            break
        adds = {a["add"]["path"]: a["add"] for a in actions if a.get("add")}
        removes = {
            a["remove"]["path"]: a["remove"]
            for a in actions
            if a.get("remove")
        }
        cdcs = [a["cdc"] for a in actions if a.get("cdc")]
        if cdcs:
            # PROTOCOL.md: when a commit carries cdc actions they ARE
            # the change set — use them INSTEAD of add/remove derivation
            # (updates surface as true pre/postimage rows, not
            # delete+insert)
            from .cdc import read_cdc_actions

            df = read_cdc_actions(spark, schema_state, path, cdcs)
            parts.append(
                df.withColumn(COMMIT_VERSION, F.lit(v).cast("long"))
            )
            for p in removes:
                prev_adds.pop(p, None)
            prev_adds.update(adds)
            v += 1
            continue
        new_files: dict[str, dict] = {}
        for p, add in adds.items():
            if not add.get("dataChange", True):
                continue
            old = prev_adds.get(p)
            if old is None:
                new_files[p] = add
            else:
                diff = dv_diff_rows(old, add, v)
                if diff is not None:
                    parts.append(diff)
        if new_files:
            parts.append(rows_of(new_files, v, "insert"))
        gone_files: dict[str, dict] = {}
        for p, rm in removes.items():
            if not rm.get("dataChange", True) or p in adds:
                continue
            old = prev_adds.get(p)
            if old is not None:
                gone_files[p] = old
        if gone_files:
            parts.append(rows_of(gone_files, v, "delete"))
        for p in removes:
            prev_adds.pop(p, None)
        prev_adds.update(adds)
        v += 1

    if not parts:
        schema = T.StructType(
            list(schema_state.schema.fields)
            + [
                T.StructField(CHANGE_TYPE, T.StringType(), False),
                T.StructField(COMMIT_VERSION, T.LongType(), False),
            ]
        )
        out = spark.createDataFrame([], schema=schema)
    else:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    if memo_key is not None:
        _CHANGES_MEMO[memo_key] = out
        while len(_CHANGES_MEMO) > 32:
            _CHANGES_MEMO.popitem(last=False)
    return out
