import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from geeflow_spark.session import get_spark
    s = get_spark("geeflow-spark-tests")
    yield s
    s.stop()
