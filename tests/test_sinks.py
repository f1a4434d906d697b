"""Delta -> database sinks."""

from __future__ import annotations

import duckdb
import pytest

from deltalake2db_spark.sources.sinks import delta_to_duckdb, delta_to_jdbc


def test_delta_to_duckdb_roundtrip(spark, user_table, tmp_path):
    db = str(tmp_path / "target.duckdb")
    n = delta_to_duckdb(spark, user_table, db, "users")
    assert n == 3
    con = duckdb.connect(db)
    rows = con.execute(
        'SELECT "FirstName", "Age" FROM users ORDER BY "User - iD"'
    ).fetchall()
    assert [r[0] for r in rows] == ["John", "Peter", "Petra"]
    assert float(rows[1][1]) == 23.0
    con.close()

    # append mode doubles the rows
    n = delta_to_duckdb(spark, user_table, db, "users", mode="append")
    assert n == 6

    # filtered + projected load
    n = delta_to_duckdb(
        spark, user_table, db, "adults", conditions=[("Age", ">", 20)],
        select=["FirstName", "Age"],
    )
    assert n == 2
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM adults").fetchone()[0] == 2
    cols = [d[0] for d in con.execute("SELECT * FROM adults LIMIT 0").description]
    assert cols == ["FirstName", "Age"]
    con.close()


def test_delta_to_jdbc_requires_driver(spark, user_table):
    with pytest.raises(Exception, match="(?i)driver|ClassNotFound"):
        delta_to_jdbc(
            spark, user_table, "jdbc:postgresql://nowhere/db", "users",
            jdbc_options={"user": "u", "password": "p"},
        )
