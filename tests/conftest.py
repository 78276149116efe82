from __future__ import annotations

import pytest

from project_discord_knowledge_graph_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kg-spark-tests", master="local[4]",
                  shuffle_partitions=4,
                  extra={"spark.driver.memory": "4g"})
    yield s
    s.stop()
