from __future__ import annotations

import pytest

from dataqualitykit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dqx-tests", master="local[4]")
    yield s
    s.stop()
