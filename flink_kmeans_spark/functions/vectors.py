"""Vector column expressions built from Spark higher-order functions.

These replace the reference's ``Point.euclideanDistance`` /
``Point.add`` / ``Point.div`` POJO methods (``KMeans.java`` [EXPECTED],
SURVEY.md §1.3) with JVM-side Catalyst expressions over
``array<double>`` columns — whole-stage-codegen'd, no Python in the hot
path, no UDF serialization. At 100 TB the distance math runs entirely
inside the scan→project pipeline.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def sqdist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def centroids_literal(centroids: Iterable[tuple[int, Sequence[float]]]) -> Column:
    """Materialize (cid, vector) pairs as a literal
    ``array<struct<cid:int, cvec:array<double>>>`` column.

    This is the Spark analogue of Flink's ``withBroadcastSet`` for the
    centroid set (SURVEY.md §2A A4): k×d doubles embedded in the plan
    means the assign step is a pure map — zero shuffle, zero join, and
    the literal ships to every executor with the task closure. For
    k=10, d=64 that is 640 doubles; trivially broadcastable at any
    cluster size.
    """
    structs = [
        F.struct(
            F.lit(int(cid)).alias("cid"),
            F.array(*[F.lit(float(v)) for v in vec]).alias("cvec"),
        )
        for cid, vec in centroids
    ]
    return F.array(*structs)
