"""Scale probes for the round-2b keys: run each operator's shape on
datagen inputs ~100-1000x the sf0.1 bench rows (local[32]) and print
per-probe seconds. Evidence for the BASELINE.md scale-probe table.

Usage: python tools/scale_probe_r2b.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window


def get_spark():
    from flink_kmeans_spark.session import get_spark as gs

    return gs("scale_probe_r2b", shuffle_partitions=32)


def probe_cdc(spark):
    """CDC merge: 20M-row snapshot + ~5.3M changes, one key shuffle."""
    base = spark.range(20_000_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        (F.rand(42) * 1000).alias("price"),
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
    )
    dels = base.filter(F.col("k") % 17 == 0).select(
        "k", "grp", "price", F.lit(1).alias("seq"), F.lit("D").alias("op")
    )
    upds = base.filter((F.col("k") % 10 == 0) & (F.col("k") % 17 != 0)).select(
        "k", "grp", (F.col("price") + 1000.0).alias("price"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
    )
    log = base.unionByName(dels).unionByName(upds)
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    merged = (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("t"))
    )
    merged.collect()


def probe_wcd(spark):
    """Running distinct count: 10M events, 100k users, 20 types."""
    e = spark.range(10_000_000).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.hash("id"), F.lit(100_000))).alias("user_id"),
        (F.pmod(F.hash(F.col("id") + 1), F.lit(20))).alias("etype"),
        F.col("id").alias("ts"),
    )
    w1 = Window.partitionBy("user_id", "etype").orderBy("ts", "event_id")
    m = e.select(
        "event_id", "user_id", "ts",
        F.when(F.row_number().over(w1) == 1, 1).otherwise(0).alias("f"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = m.select(F.sum("f").over(w2).alias("nd"))
    out.agg(F.sum("nd")).collect()


def probe_bitmap(spark):
    """Exact distinct via bitmaps: 50M rows, ~5M distinct keys, 8 groups."""
    d = spark.range(50_000_000).select(
        (F.col("id") % 8).alias("g"),
        F.pmod(F.hash("id"), F.lit(5_000_000)).alias("k"),
    )
    part = (
        d.select(
            "g",
            F.expr("bitmap_bucket_number(k)").alias("bkt"),
            F.expr("bitmap_bit_position(k)").alias("pos"),
        )
        .groupBy("g", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    part.groupBy("g").agg(F.sum(F.expr("bitmap_count(bm)")).alias("nd")).collect()


def probe_cms(spark):
    """CMS build+probe: 50M rows over a 100k key domain."""
    A = [1103515245, 1229782938, 1666666669, 1431655765]
    B = [12345, 67890, 424242, 13579]
    P, W, D = 2147483647, 512, 4
    o = spark.range(50_000_000).select(
        F.pmod(F.hash("id"), F.lit(100_000)).cast("bigint").alias("k")
    )
    arr_a = F.array(*[F.lit(a) for a in A])
    arr_b = F.array(*[F.lit(b) for b in B])

    def bucket(kc):
        return (
            (kc * F.element_at(arr_a, F.col("j") + 1)
             + F.element_at(arr_b, F.col("j") + 1)) % P
        ) % W

    ex = o.select("k", F.explode(F.sequence(F.lit(0), F.lit(D - 1))).alias("j"))
    sketch = ex.groupBy("j", bucket(F.col("k")).alias("bkt")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    exact = o.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    probe = exact.select(
        "k", "n", F.explode(F.sequence(F.lit(0), F.lit(D - 1))).alias("j")
    ).withColumn("bkt", bucket(F.col("k")))
    est = (
        probe.join(F.broadcast(sketch), ["j", "bkt"])
        .groupBy("k", "n")
        .agg(F.min("cnt").alias("est"))
    )
    est.agg(F.sum("est"), F.sum("n")).collect()


def probe_paths(spark):
    """User paths: 10M events, 500k users, first-5 path histogram."""
    e = spark.range(10_000_000).select(
        F.col("id").alias("event_id"),
        F.pmod(F.hash("id"), F.lit(500_000)).alias("user_id"),
        F.concat(F.lit("t"), F.pmod(F.hash(F.col("id") + 7), F.lit(6))).alias(
            "etype"
        ),
        F.col("id").alias("ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    paths = seq.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "etype"))),
                lambda s: s.etype,
            ),
            ">",
        ).alias("path")
    )
    paths.groupBy("path").agg(F.count(F.lit(1)).alias("n")).orderBy(
        F.desc("n")
    ).limit(20).collect()


PROBES = {
    "cdc": probe_cdc,
    "wcd": probe_wcd,
    "bitmap": probe_bitmap,
    "cms": probe_cms,
    "paths": probe_paths,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    spark = get_spark()
    # warm the JVM/codegen path once
    spark.range(1_000_000).agg(F.sum("id")).collect()
    for name in names:
        t0 = time.time()
        PROBES[name](spark)
        print(f"[probe] {name}: {time.time() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
