from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gluestick_spark import get_spark

    s = get_spark("gluestick-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_dir(tmp_path):
    return str(tmp_path)


SF_DIR = "/root/testdata/sf0.001"
