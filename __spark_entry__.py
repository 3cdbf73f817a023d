"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on /root/testdata/sf0.001 — the engine's
  impute-MERGE semantics expressed over the events table (mask cells by a
  deterministic rule, recover them from surviving statistics), i.e. the
  CESID pipeline recast (SURVEY.md §3 EP2/EP3) at smoke scale.
- ``queries()`` / ``oracle_sql()``: one entry per implemented SURVEY.md §2
  operator plus the training-data ops; pairs live in engine/queries.py and
  engine/queries_ops.py (registered on import).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engine import queries as _q          # noqa: E402
from engine import queries_ops as _qo     # noqa: E402  (registers ops entries)
from engine.session import _ship_engine   # noqa: E402


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """The driver supplies its own SparkSession (no --py-files): ship the
    engine package to its executors before any query that deserializes our
    pandas UDFs (idempotent; addPyFile of the same zip is a no-op)."""
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            _ship_engine(spark)
        except Exception:
            pass  # already shipped / local import path suffices
        return fn(spark, sf_dir)
    return wrapper


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _shipped(_q.queries()["impute_mean_merge"])(
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
