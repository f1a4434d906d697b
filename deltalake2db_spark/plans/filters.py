"""Filter grammar, Delta partition-value codec, and metadata file skipping.

Reference parity (semantics, not code):
 - condition surface ``FilterType`` — ``deltalake2db/filter_by_meta.py:78,97-104``
 - partition-value decode/serialize — ``deltalake2db/filter_by_meta.py:13-69``
   (Delta PROTOCOL.md "Partition Value Serialization")
 - partition pruning + min/max/nullCount stats skipping —
   ``deltalake2db/filter_by_meta.py:81-94,107-198`` (fail-open: an
   exception during evaluation must keep the file, never drop it)
 - limit pushdown over ``numRecords`` —
   ``deltalake2db/delta_meta_retrieval.py:115-151``

All of this is driver-side pure Python operating on add-action dicts; at
100 TB the add-action count (~1e5 files) is still driver-sized metadata.
Spark's own parquet row-group skipping stacks on top once the surviving
files are scanned with a pushed-down ``df.filter``.
"""

from __future__ import annotations

import json
import logging
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Iterable, Iterator, Literal, Mapping, Sequence, Union

logger = logging.getLogger(__name__)

Operator = Literal["<", "=", ">", ">=", "<=", "<>", "in", "not in"]
FilterTuple = tuple[str, Operator, Any]
FilterType = Sequence[FilterTuple]
FilterTypeOld = Mapping[str, Any]

RANGE_OPS = (">", ">=", "<", "<=")


def normalize_conditions(
    conditions: Union[FilterType, FilterTypeOld, None],
) -> FilterType | None:
    """Accept the legacy ``{col: value}`` dict form as a list of ``=``."""
    if conditions is None:
        return None
    if isinstance(conditions, Mapping):
        return [(k, "=", v) for k, v in conditions.items()]
    return conditions


def normalize_partition_values(pv: Any) -> dict:
    """Checkpoint parquet decodes partitionValues maps as entry lists.

    Engines differ: delta-rs/delta-spark checkpoints store a parquet MAP
    (pyarrow ``to_pylist`` yields ``(key, value)`` TUPLES), older/struct
    writers yield ``{"key": .., "value": ..}`` dicts, and JSON commits
    yield plain dicts.  Accept all three.
    """
    if isinstance(pv, list):
        out: dict = {}
        for e in pv:
            if isinstance(e, Mapping):
                out[e["key"]] = e["value"]
            else:
                k, v = e
                out[k] = v
        return out
    if isinstance(pv, Mapping):
        return dict(pv)
    return pv or {}


def decode_partition_value(value: str | None, delta_type: str) -> Any:
    """Delta partition-value string -> typed Python value (PROTOCOL.md)."""
    if value is None:
        return None
    if delta_type == "string":
        return value
    if delta_type in ("integer", "int", "long", "short", "byte"):
        return int(value)
    if delta_type in ("float", "double"):
        return float(value)
    if delta_type == "boolean":
        return value.lower() in ("true", "1", "t", "y", "yes")
    if delta_type == "date":
        return date.fromisoformat(value)
    if delta_type in ("timestamp", "timestamp_ntz", "timestampNtz"):
        return datetime.fromisoformat(value)
    if delta_type == "binary":
        # PROTOCOL.md encodes binary partition values as UTF-8 codepoints
        return value.encode("utf-8")
    if delta_type == "decimal" or delta_type.startswith("decimal("):
        return Decimal(value)
    raise ValueError(f"unknown partition value type: {delta_type}")


def serialize_partition_value(value: Any, delta_type: str) -> Any:
    """Typed Python value -> Delta partition-value string (PROTOCOL.md)."""
    if isinstance(value, (list, tuple, set)):
        return [serialize_partition_value(v, delta_type) for v in value]
    if value is None:
        return None
    if delta_type == "string":
        return value
    if delta_type in ("integer", "int", "long", "short", "byte"):
        return str(value)
    if delta_type == "date":
        return value.isoformat() if isinstance(value, date) else str(value)
    if delta_type in ("timestamp", "timestamp_ntz", "timestampNtz"):
        if isinstance(value, datetime):
            s = value.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip(".")
            return s
        return str(value)
    if delta_type == "boolean":
        return "true" if value else "false"
    if delta_type == "binary":
        return value.decode("utf-8", errors="ignore") if isinstance(value, bytes) else str(value)
    return value


def _stats_of(action: Mapping) -> dict:
    stats = action.get("stats")
    if stats is None and action.get("stats_parsed") is not None:
        stats = action["stats_parsed"]
    if stats is None:
        return {}
    if isinstance(stats, str):
        stats = json.loads(stats)
    return stats or {}


def _value_outside_stats(
    value: Any, num_records: Any, null_count: Any, min_v: Any, max_v: Any
) -> bool:
    """True when an ``=``-style comparison to ``value`` can never match.

    Mirrors ``_can_value_filter`` semantics (filter_by_meta.py:81-94):
    all-null file vs non-null value; zero-null file vs NULL value; value
    outside [min, max] with string prefix truncation (Delta truncates
    string stats to a prefix).
    """
    if value is not None and num_records is not None and num_records == null_count:
        return True
    if null_count == 0 and value is None:
        return True
    if isinstance(min_v, str) and isinstance(value, str):
        value = value[: len(min_v)]
    if min_v is not None and max_v is not None and (value < min_v or value > max_v):
        return True
    return False


def can_skip_file(
    action: Mapping,
    conditions: FilterType,
    type_map: Mapping[str, str],
    logical2physical: Mapping[str, str],
) -> bool:
    """True when metadata proves the file cannot contain a matching row.

    Conjunctive semantics: any single condition that excludes the file
    skips it.  Partition values compare on the *serialized* string form
    for =, <>, in, not in; numerically for range ops on int/float
    condition values; a NULL partition value under a range op skips.
    Fail-open: any exception keeps the file (correctness over pruning).
    """
    try:
        for logical_name, op, value in conditions:
            phys = logical2physical.get(logical_name, logical_name)
            delta_type = type_map.get(logical_name, "string")
            part_values = normalize_partition_values(action.get("partitionValues", {}))
            if phys in part_values:
                pv = part_values.get(phys)
                # float/double partitions compare NUMERICALLY: the
                # serialized string form is writer-dependent ("1e-07" vs
                # "1.0E-7"), and a string mismatch would wrongly prune a
                # matching file (deliberate fix over the reference, which
                # passes floats through serialization unchanged)
                numeric = delta_type in ("float", "double")
                if numeric and pv is not None and op in ("=", "<>", "in", "not in"):
                    decoded_pv = float(pv)
                    if op == "=":
                        if value is None or decoded_pv != float(value):
                            return True
                    elif op == "<>":
                        if value is not None and decoded_pv == float(value):
                            return True
                    elif op == "in":
                        if not any(
                            v is not None and decoded_pv == float(v) for v in value
                        ):
                            return True
                    elif op == "not in":
                        if any(
                            v is not None and decoded_pv == float(v) for v in value
                        ):
                            return True
                elif op == "=":
                    if pv != serialize_partition_value(value, delta_type):
                        return True
                elif op == "<>":
                    if pv == serialize_partition_value(value, delta_type):
                        return True
                elif op == "in":
                    if pv not in serialize_partition_value(list(value), delta_type):
                        return True
                elif op == "not in":
                    if pv in serialize_partition_value(list(value), delta_type):
                        return True
                elif op in RANGE_OPS:
                    if pv is None:
                        return True
                    if isinstance(value, (int, float)) and not isinstance(value, bool):
                        typed_pv = float(pv) if isinstance(value, float) else int(pv)
                        if op == ">" and typed_pv <= value:
                            return True
                        if op == ">=" and typed_pv < value:
                            return True
                        if op == "<" and typed_pv >= value:
                            return True
                        if op == "<=" and typed_pv > value:
                            return True

            stats = _stats_of(action)
            num_records = stats.get("numRecords")
            if stats and stats.get("numRecords", 0) == 0:
                return True
            min_v = stats.get("minValues", {}).get(phys)
            max_v = stats.get("maxValues", {}).get(phys)
            null_count = stats.get("nullCount", {}).get(phys)
            if op == "=":
                if _value_outside_stats(value, num_records, null_count, min_v, max_v):
                    return True
            elif op == "in":
                if value and all(
                    _value_outside_stats(v, num_records, null_count, min_v, max_v)
                    for v in value
                ):
                    return True
            elif op == "not in":
                # ``x not in (vs)`` is TRUE only for non-null x differing
                # from every v (Spark/SQL 3VL: null x, or any NULL in vs,
                # never satisfies).  Stats can prove *no* row satisfies it
                # when: (a) every row is NULL; (b) the list contains NULL;
                # (c) the file is provably constant (min==max, no nulls)
                # and that constant is listed.  A listed value being
                # OUTSIDE [min,max] proves the opposite — the file
                # matches — so it must never skip.  (Deliberate fix over
                # the reference, whose inverted test at
                # filter_by_meta.py:187-193 silently drops rows.)
                # min==max on strings is truncation-safe: Delta's stat
                # truncation rounds max *up* past min, so truncated stats
                # can never be equal.
                vals = list(value)
                if vals:
                    all_null = (
                        num_records is not None
                        and num_records > 0
                        and null_count == num_records
                    )
                    constant_excluded = (
                        null_count == 0
                        and min_v is not None
                        and min_v == max_v
                        and any(v == min_v for v in vals)
                    )
                    if all_null or any(v is None for v in vals) or constant_excluded:
                        return True
            elif op == "<" and min_v is not None and value <= min_v:
                return True
            elif op == "<=" and min_v is not None and value < min_v:
                return True
            elif op == ">" and max_v is not None and value >= max_v:
                return True
            elif op == ">=" and max_v is not None and value > max_v:
                return True
        return False
    except Exception as exc:  # fail-open: pruning must never change results
        logger.warning("file-skip evaluation failed open: %s", exc)
        return False


def iter_add_actions_filtered(
    add_actions: Iterable[Mapping],
    conditions: FilterType | None,
    type_map: Mapping[str, str],
    logical2physical: Mapping[str, str],
    limit: int | None = None,
) -> Iterator[Mapping]:
    """Yield surviving add-actions; with no conditions, stop once the
    cumulative ``numRecords`` reaches ``limit`` (checked *after* the
    yield, so at least one file always survives —
    delta_meta_retrieval.py:139-151)."""
    total = 0
    for action in add_actions:
        if conditions is not None and can_skip_file(
            action, conditions, type_map, logical2physical
        ):
            continue
        yield action
        if not conditions and limit is not None:
            stats = _stats_of(action)
            n = stats.get("numRecords")
            if n is not None:
                # numRecords counts physical rows; DV-deleted rows never
                # reach the result, so only the live remainder counts
                # toward the limit
                dv = action.get("deletionVector") or {}
                n = max(n - int(dv.get("cardinality") or 0), 0)
                total += n
                if total >= limit:
                    break
