"""Reference-parity CLI (SURVEY.md §1.2 [EXPECTED] surface):

    python -m flink_kmeans_spark \
        [--points points.csv] [--centroids centroids.csv] \
        [--output out_dir] [--iterations 10]

Mirrors the canonical Flink example's ParameterTool contract: CSV
sources are whitespace-delimited (x, y) / (id, x, y); with no --points/
--centroids the embedded default collection is used (KMeansData
fallback); with no --output the result prints to stdout. Output rows
are ``clusterId x y`` CSV, the reference's writeAsCsv shape.

Engine front door beyond the reference:

    python -m flink_kmeans_spark --query agg_hash \
        [--sf-dir /root/testdata/sf0.01] [--output out_dir] [--limit 20]

runs ANY of the registry's query keys against the test tables and
prints (or sinks) the result — `--query list` enumerates all keys.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

# Embedded default dataset (the reference falls back to KMeansData.POINTS
# / CENTROIDS when args are absent [EXPECTED]). Values are our own — two
# obvious 2-D blobs around (0,0) and (10,10), deterministic.
DEFAULT_POINTS = [
    (float(i % 5) * 0.5 - 1.0 + (10.0 if i >= 20 else 0.0),
     float((3 * i) % 7) * 0.3 - 1.0 + (10.0 if i >= 20 else 0.0))
    for i in range(40)
]
DEFAULT_CENTROIDS = [(0, -0.5, -0.5), (1, 9.5, 9.5)]


def main() -> None:
    ap = argparse.ArgumentParser(prog="flink_kmeans_spark")
    ap.add_argument("--points", default=None, help="whitespace CSV of x y")
    ap.add_argument("--centroids", default=None, help="whitespace CSV of id x y")
    ap.add_argument("--output", default=None, help="output dir (CSV); prints if absent")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--query", default=None,
                    help="run a registry query key instead of the k-means "
                         "pipeline ('list' enumerates keys)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="test-table directory for --query")
    ap.add_argument("--limit", type=int, default=20,
                    help="max rows printed for --query without --output")
    args = ap.parse_args()

    if args.query:
        from .plans.registry import QUERIES
        from .session import get_spark

        queries = QUERIES()
        if args.query == "list":
            for name in sorted(queries):
                print(name)
            return
        if args.query not in queries:
            raise SystemExit(
                f"unknown query {args.query!r} — run --query list to enumerate"
            )
        spark = get_spark("query-cli")
        spark.sparkContext.setLogLevel("ERROR")
        df = queries[args.query](spark, args.sf_dir)
        if args.output:
            df.write.mode("overwrite").option("header", True).csv(args.output)
            print(f"wrote {args.output}")
        else:
            df.show(args.limit, truncate=False)
        return

    from .operators import kmeans as km
    from .session import get_spark
    from .sources.tables import read_centroids_csv, read_points_csv

    spark = get_spark("kmeans-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.points:
        pts_xy = read_points_csv(spark, args.points)
    else:
        pts_xy = spark.createDataFrame(DEFAULT_POINTS, "x double, y double")
    points = pts_xy.select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.array("x", "y").alias("embedding"),
    )

    if args.centroids:
        cent_rows = read_centroids_csv(spark, args.centroids).collect()
    else:
        cent_rows = spark.createDataFrame(
            DEFAULT_CENTROIDS, "cid int, x double, y double"
        ).collect()
    init = [(int(r["cid"]), [float(r["x"]), float(r["y"])]) for r in cent_rows]

    model = km.fit(
        points, k=len(init), n_iter=args.iterations, init=init
    )
    labeled = model.predict(points).select(
        "cid", F.col("embedding")[0].alias("x"), F.col("embedding")[1].alias("y")
    )

    if args.output:
        labeled.write.mode("overwrite").option("sep", " ").csv(args.output)
        print(f"wrote {labeled.count()} rows to {args.output}")
    else:
        for r in labeled.collect():
            print(f"{r['cid']} {r['x']} {r['y']}")


if __name__ == "__main__":
    main()
