from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
# python workers (Python Data Source / pandas UDFs) must import the
# package too; PYTHONPATH propagates to them via the worker env
_repo = os.path.dirname(os.path.dirname(__file__))
if _repo not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = _repo + os.pathsep + os.environ.get("PYTHONPATH", "")

from deltalake2db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deltalake2db_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory):
    return tmp_path_factory.mktemp("delta_fixtures")


def _build_once(root, name: str, builder):
    path = str(root / name)
    if not os.path.exists(path):
        builder(path)
    return path


@pytest.fixture(scope="session")
def user_table(fixture_root):
    from fixture_tables import build_user

    return _build_once(fixture_root, "user", build_user)


@pytest.fixture(scope="session")
def user_empty_table(fixture_root):
    from fixture_tables import build_user

    return _build_once(fixture_root, "user_empty", lambda p: build_user(p, empty=True))


@pytest.fixture(scope="session")
def faker2_table(fixture_root):
    from fixture_tables import build_faker2

    return _build_once(fixture_root, "faker2", build_faker2)


@pytest.fixture(scope="session")
def partition_values_table(fixture_root):
    from fixture_tables import build_partition_values

    return _build_once(fixture_root, "partition_values",
                       lambda p: build_partition_values(p, with_data=False))


@pytest.fixture(scope="session")
def partition_values_data_table(fixture_root):
    from fixture_tables import build_partition_values

    return _build_once(fixture_root, "partition_values_data",
                       lambda p: build_partition_values(p, with_data=True))


@pytest.fixture(scope="session")
def stats_table(fixture_root):
    from fixture_tables import build_stats_skipping

    return _build_once(fixture_root, "stats_skipping", build_stats_skipping)


@pytest.fixture(scope="session")
def cluster_table(fixture_root):
    from fixture_tables import build_cluster

    return _build_once(fixture_root, "cluster", build_cluster)
