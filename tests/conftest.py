from __future__ import annotations

import pytest

from syslog_ng_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("syslog-ng-spark-tests", cpus="8")
    s.sparkContext.setLogLevel("ERROR")
    yield s
