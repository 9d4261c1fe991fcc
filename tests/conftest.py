from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from generative_ner_spark.plans.session import build_session

    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        arrow_batch_size=256,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
