from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MED = os.environ.get("SPARK_GRAFT_SF_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from filmdb_data_warehouse___power_bi_dashboard_spark.session import get_spark

    spark = get_spark(app_name="pytest", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(autouse=True)
def _release_persists():
    """Drop operator-tracked persists after every test — the session
    is shared, and accumulated MEMORY_AND_DISK blocks slow the suite."""
    yield
    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import release_persisted

    release_persisted()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med() -> str:
    return SF_MED
