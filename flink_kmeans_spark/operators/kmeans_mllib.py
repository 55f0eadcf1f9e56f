"""MLlib K-Means path (SURVEY.md §2A A12).

BASELINE.json's north star: "Flink K-means implementation maps directly
to Spark MLlib's K-means algorithm." This wraps
``pyspark.ml.clustering.KMeans`` over the ``embeddings`` table —
``array<float>`` crosses into ``VectorUDT`` only at this boundary
(SURVEY.md §7 "non-problems").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mllib_kmeans_predict(
    points: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit MLlib KMeans and return (vec_id, cid) assignments."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = points.select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, maxIter=max_iter, seed=seed, initMode="random").fit(feats)
    return model.transform(feats).select(
        id_col, F.col("prediction").cast("int").alias("cid")
    )
