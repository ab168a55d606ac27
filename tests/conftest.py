import numpy as np
import pytest

import random

random.seed(1337)
np.random.seed(1337)  # reference test seed (tests/conftest.py:37-41)


@pytest.fixture(scope="session")
def spark():
    from pyramids_spark.session import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
