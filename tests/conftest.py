from __future__ import annotations

import tempfile

import pytest

from gmall_flink_210726_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "gmall-tests",
        cpus=4,
        shuffle_partitions=8,
        extra_conf={
            # managed tables (bucketing tests) land in a scratch dir
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="gmall_wh_"),
        },
    )
    yield s
