"""Implicit-feedback recommendations via MLlib ALS (the matrix-
factorization workhorse — public Spark API, same MLlib boundary
discipline as operators/kmeans_mllib.py).

Demand signal: customers × parts with quantity as implicit strength,
derived from orders⋈lineitem. ALS is seeded but its distributed
least-squares solves are not bit-reproducible across engines, so the
registry key is rows-only; the pytest oracle pins (a) top-k shape and
determinism-independent invariants and (b) that factorization beats
the global-popularity baseline at reconstructing held-in demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_matrix(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(custkey, partkey, strength) implicit-feedback triples: summed
    quantity per customer-part. One join + one collapsing aggregate —
    at 100 TB this is the standard fact-to-interaction rollup (the
    output is |users|·|avg basket| rows, far smaller than the fact)."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.sum("l_quantity").alias("strength"))
    )


def als_recommend(
    interactions: DataFrame,
    k: int = 5,
    rank: int = 8,
    max_iter: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Top-k item recommendations per user from implicit-feedback ALS
    (implicitPrefs=True, the Hu-Koren-Volinsky confidence weighting).

    Scale shape: ALS itself is MLlib's block-partitioned alternating
    solver (user/item factor blocks shuffle once per half-iteration);
    recommendForAllUsers is a blocked factor×factor top-k, never a
    full user×item materialization. Output: (user, item, score, rk) —
    scores rounded to 4 dp so downstream hashing isn't bit-sensitive."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        implicitPrefs=True,
        rank=rank,
        maxIter=max_iter,
        regParam=0.1,
        alpha=1.0,
        seed=seed,
        coldStartStrategy="drop",
    )
    model = als.fit(interactions)
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user",
        F.col("rec.item").alias("item"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
        (F.col("pos") + 1).cast("int").alias("rk"),
    )
