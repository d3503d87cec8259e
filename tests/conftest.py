import shutil
import tempfile

import pytest

from polipus_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="polipus_spark_tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def work_dir():
    d = tempfile.mkdtemp(prefix="polipus_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
