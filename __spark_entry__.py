"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship end-to-end slice; ``queries``/``oracle_sql``
expose every declared operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: infer the events.props JSON schema with the lattice,
    load it via from_json, aggregate — scan → induction → merge → render →
    load → query in one pass (SURVEY §7.0) on /root/testdata/sf0.001."""
    from hive_json_spark.registry import QUERIES

    return QUERIES["q_from_json_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hive_json_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hive_json_spark.registry import ORACLES

    return dict(ORACLES)
