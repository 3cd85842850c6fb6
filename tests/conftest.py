import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from zikeiretsu_rs_spark.session import get_spark

    s = get_spark(app_name="zikeiretsu-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_ctx(tmp_path):
    from zikeiretsu_rs_spark.catalog.context import DBContext

    return DBContext(data_dir=str(tmp_path / "zdb"))
