"""Differential harness: built-in protocol reader vs the native
delta-spark connector.

Mirrors the reference's ``use_delta_ext`` matrix
(``/root/reference/tests/test_duckdb.py:7,64`` runs every scan test
twice — once through its own log-replay reader, once delegated to
DuckDB's delta extension) by running each fixture table through BOTH
``scan_delta`` (our reader) and ``scan_delta_native`` (delta-spark) and
comparing sorted rows.

delta-spark is not installed in this environment, so the whole module
skips cleanly at collection (VERDICT r6 item 8: write the parametrized
test now so a future environment with the connector runs the full
differential automatically).
"""

from __future__ import annotations

import pytest

pytest.importorskip(
    "delta",
    reason="delta-spark not installed; differential matrix is env-bound",
)

from fixture_tables import (  # noqa: E402
    build_faker2,
    build_partition_values,
    build_stats_skipping,
    build_user,
)

from deltalake2db_spark import scan_delta  # noqa: E402
from deltalake2db_spark.sources.delta import scan_delta_native  # noqa: E402

FIXTURES = {
    "user": build_user,
    "faker2": build_faker2,
    "partition_values": build_partition_values,
    "stats_skipping": build_stats_skipping,
}


def _canon(df):
    """Sorted list-of-tuples over name-sorted columns (the same compare
    the correctness harness applies)."""
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in row) for row in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_native_reader_matches_builtin(spark, tmp_path, name):
    path = FIXTURES[name](str(tmp_path / name))
    ours = scan_delta(spark, path)
    native = scan_delta_native(spark, path)
    assert sorted(ours.columns) == sorted(native.columns)
    assert _canon(ours) == _canon(native)


@pytest.mark.parametrize("name", ["user"])
def test_native_reader_time_travel_matches(spark, tmp_path, name):
    path = FIXTURES[name](str(tmp_path / name))
    ours = scan_delta(spark, path, version=0)
    native = (
        spark.read.format("delta").option("versionAsOf", 0).load(path)
    )
    assert _canon(ours) == _canon(native)
