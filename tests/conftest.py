import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "tbl")


def sorted_rows(df, cols=("conv_id", "turn_idx")):
    """Stable (conv_id, turn_idx)-ordered materialization for equality checks
    (the BASELINE.json invariant's 'stable ordering')."""
    return [tuple(r) for r in df.orderBy(*cols).collect()]
