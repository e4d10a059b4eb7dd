from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from transcription_lakehouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
