"""Self-contained Spark-SQL emission for a Delta table.

Reference parity: ``deltalake2db/duckdb.py:584-623`` (``get_sql_for_delta``
/ ``get_sql_for_delta_expr``) — the reference returns a SQL string that
runs on ANY connection with no prior registration; its shape is one
SELECT per surviving data file UNION ALL'd, with column-mapping renames,
partition-value literals, and NULL backfill for files that predate a
column (``deltalake2db/sql_utils.py:33-43``).

Here the emitted dialect is Spark SQL over ``parquet.`file``` table
references — runnable on any SparkSession, embeddable in a larger query
or CTE, no temp views.  The plan is O(files), exactly like the
reference; ``scan_delta`` remains the scale path (O(partition groups)
via multi-path reads).  Use this API for SQL-string composition parity,
not for 1e5-file tables.
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal
from typing import Any, Mapping, Optional, Sequence

from pyspark.sql import types as T

from ..plans.filters import normalize_conditions, normalize_partition_values
from ..plans.meta import MetaState, get_meta
from ..plans.protocol import check_is_supported
from ..plans.types import delta_type_name, physical_name


_DV_SQL_MAX_ROWS = 100_000


def _q(name: str) -> str:
    """Backtick-quote an identifier."""
    return "`" + name.replace("`", "``") + "`"


def _s(value: str) -> str:
    """Single-quote a SQL string literal."""
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


def type_ddl(dt: T.DataType) -> str:
    """Spark DDL string for a (possibly nested) LOGICAL type, with field
    names backtick-quoted so mapped names survive the round trip."""
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{_q(f.name)}:{type_ddl(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.ArrayType):
        return f"array<{type_ddl(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{type_ddl(dt.keyType)},{type_ddl(dt.valueType)}>"
    return dt.simpleString()


def _needs_rewrite(dt: T.DataType) -> bool:
    if isinstance(dt, T.StructType):
        return True
    if isinstance(dt, T.ArrayType):
        return _needs_rewrite(dt.elementType)
    if isinstance(dt, T.MapType):
        return _needs_rewrite(dt.valueType)
    return False


def rewrite_sql(base: str, dt: T.DataType) -> str:
    """SQL mirror of ``plans.exprs.rewrite_expr``: rebuild ``base``
    (physical field names) as the logical type, preserving NULL structs."""
    if isinstance(dt, T.StructType):
        pairs = ", ".join(
            f"{_s(f.name)}, {rewrite_sql(f'{base}.{_q(physical_name(f))}', f.dataType)}"
            for f in dt.fields
        )
        return (
            f"CASE WHEN {base} IS NULL THEN CAST(NULL AS {type_ddl(dt)}) "
            f"ELSE named_struct({pairs}) END"
        )
    if isinstance(dt, T.ArrayType):
        if not _needs_rewrite(dt.elementType):
            return base
        return f"transform({base}, x -> {rewrite_sql('x', dt.elementType)})"
    if isinstance(dt, T.MapType):
        if not _needs_rewrite(dt.valueType):
            return base
        return f"transform_values({base}, (k, v) -> {rewrite_sql('v', dt.valueType)})"
    return base


def _partition_literal_sql(field: T.StructField, raw: Optional[str]) -> str:
    ddl = type_ddl(field.dataType)
    if raw is None:
        return f"CAST(NULL AS {ddl}) AS {_q(field.name)}"
    return f"CAST({_s(str(raw))} AS {ddl}) AS {_q(field.name)}"


def _value_sql(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float, Decimal)):
        return str(v)
    if isinstance(v, datetime):
        return f"TIMESTAMP {_s(v.strftime('%Y-%m-%d %H:%M:%S.%f'))}"
    if isinstance(v, date):
        return f"DATE {_s(v.isoformat())}"
    return _s(str(v))


def conditions_sql(conditions) -> Optional[str]:
    """WHERE-clause SQL for the FilterType grammar (mirror of
    ``plans.exprs.compile_conditions``: ``= None`` -> IS NULL)."""
    conds = normalize_conditions(conditions)
    if not conds:
        return None
    clauses = []
    for name, op, value in conds:
        col = _q(name)
        if op == "=":
            clauses.append(
                f"{col} IS NULL" if value is None else f"{col} = {_value_sql(value)}"
            )
        elif op == "<>":
            clauses.append(
                f"{col} IS NOT NULL" if value is None else f"{col} <> {_value_sql(value)}"
            )
        elif op in ("in", "not in"):
            vals = ", ".join(_value_sql(v) for v in value)
            clauses.append(f"{col} {'IN' if op == 'in' else 'NOT IN'} ({vals})")
        elif op in ("<", "<=", ">", ">="):
            clauses.append(f"{col} {op} {_value_sql(value)}")
        else:
            raise ValueError(f"unsupported operator: {op}")
    return " AND ".join(clauses)


def get_sql_for_delta(
    table,
    conditions=None,
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
    limit: Optional[int] = None,
    cte_wrap_name: Optional[str] = None,
    storage_options: Optional[Mapping[str, Any]] = None,
    version: Optional[int] = None,
) -> str:
    """Self-contained Spark SQL for a Delta table — runnable on any
    SparkSession via ``spark.sql(...)``, no temp views (parity:
    ``get_sql_for_delta``, duckdb.py:584-623).

    One SELECT per surviving file, like the reference; driver-side
    pruning (partition values + stats) is applied to ``conditions``
    before emission and the residual predicate becomes the WHERE clause.
    """
    state = table if isinstance(table, MetaState) else get_meta(
        str(table), storage_options=storage_options, version=version
    )
    check_is_supported(state)
    logical_schema = state.schema
    if logical_schema is None:
        raise ValueError(f"no metaData action found in {state.delta_path}")

    conds = normalize_conditions(conditions)
    _, l2p = state.type_maps()
    partition_cols = list(state.partition_columns)
    partition_phys = [l2p.get(c, c) for c in partition_cols]

    actions = list(state.get_add_actions_filtered(conds, limit))
    if not actions:
        # typed empty relation: SELECT literal NULLs WHERE FALSE
        exprs = ", ".join(
            f"CAST(NULL AS {type_ddl(f.dataType)}) AS {_q(f.name)}"
            for f in logical_schema.fields
        )
        body = f"SELECT {exprs} WHERE FALSE"
    else:
        paths = [state.file_uri(a) for a in actions]
        file_cols = state.probe_file_columns(paths)
        selects = []
        for action, path in zip(actions, paths):
            pv = normalize_partition_values(action.get("partitionValues", {}))
            present = set(file_cols.get(path, ()))
            exprs = []
            for field in logical_schema.fields:
                phys = l2p.get(field.name, field.name)
                if field.name in partition_cols:
                    raw = pv.get(phys)
                    if raw is None and phys not in pv:
                        for key in (f"partition.{phys}", field.name,
                                    f"partition.{field.name}"):
                            if key in pv:
                                raw = pv[key]
                                break
                    exprs.append(_partition_literal_sql(field, raw))
                elif phys in present:
                    exprs.append(
                        f"{rewrite_sql(_q(phys), field.dataType)} AS {_q(field.name)}"
                    )
                else:
                    # schema evolution: file predates the column
                    exprs.append(
                        f"CAST(NULL AS {type_ddl(field.dataType)}) AS {_q(field.name)}"
                    )
            stmt = "SELECT " + ", ".join(exprs) + f" FROM parquet.{_q(path)}"
            dv = action.get("deletionVector")
            if dv:
                # deletion vectors inline as a row-index NOT IN list —
                # emission is O(deleted rows), so cap it and point big
                # tables at scan_delta's anti-join instead
                from ..plans.deletion_vectors import read_descriptor

                card = int(dv.get("cardinality") or 0)
                if card > _DV_SQL_MAX_ROWS:
                    raise ValueError(
                        f"deletion vector on {action.get('path')} has "
                        f"{card} deleted rows; SQL emission caps at "
                        f"{_DV_SQL_MAX_ROWS} — use scan_delta() for this "
                        "table"
                    )
                deleted = read_descriptor(
                    dv, state.delta_path, opener=state._io._open
                )
                if deleted:
                    idx = ", ".join(str(i) for i in deleted)
                    stmt += f" WHERE _metadata.row_index NOT IN ({idx})"
            selects.append(stmt)
        body = "\nUNION ALL\n".join(selects)

    outer = "*" if not select else ", ".join(_q(c) for c in select)
    sql = f"SELECT {'DISTINCT ' if distinct else ''}{outer} FROM (\n{body}\n)"
    where = conditions_sql(conds)
    if where:
        sql += f" WHERE {where}"
    if limit is not None:
        sql += f" LIMIT {limit}"
    if cte_wrap_name:
        return f"WITH {_q(cte_wrap_name)} AS ({sql})"
    return sql


__all__ = ["get_sql_for_delta", "conditions_sql", "rewrite_sql", "type_ddl"]
