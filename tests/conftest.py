import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streetview_naturevisibility_spark.session import get_spark
from streetview_naturevisibility_spark.fixtures.generate import write_fixtures


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="svnv-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    write_fixtures(str(d), n_pages=500, n_roads=60)
    return str(d)


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"
