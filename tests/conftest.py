import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from tokenlake.session import get_spark

    s = get_spark(master="local[4]", app_name="tokenlake-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_out(tmp_path):
    out = str(tmp_path / "out")
    yield out
    shutil.rmtree(out, ignore_errors=True)
