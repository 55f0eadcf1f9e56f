"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``flink_kmeans_spark`` package; this module
is a thin adapter over its query registry (``plans/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# defensive: if the driver loaded this module by file path, the package
# next to it may not be importable yet
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole pipeline — Lloyd's K-Means
    (k=10, 10 fixed iterations, deterministic init) over the sf0.001
    embeddings, returning the final (vec_id, cid, label) assignment."""
    from flink_kmeans_spark.plans.registry import QUERIES

    return QUERIES()["kmeans_predict"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flink_kmeans_spark.plans.registry import QUERIES

    return QUERIES()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query key."""
    from flink_kmeans_spark.plans.registry import ORACLES

    return ORACLES()
