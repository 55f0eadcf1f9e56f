"""Round-3 scale probes: run the NEW operators' shapes at 10-100x the
sf0.1 data volume on synthetic in-memory data (no testdata writes) and
print one timing line each — evidence that the declared 100 TB shapes
hold under scale-up, not just at toy size.

    python tools/scale_probe_r3.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def timed(name, fn):
    t = time.time()
    out = fn()
    print(f"[probe] {name}: {out} rows in {time.time()-t:.1f}s", flush=True)


def main():
    from pyspark.sql import functions as F

    from flink_kmeans_spark.session import get_spark

    spark = get_spark("scale-probe-r3")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. table_fingerprint shape at 20M rows (133x sf0.1 orders)
    def fingerprint():
        t = spark.range(20_000_000).select(
            F.concat_ws("|", F.col("id"), (F.col("id") * 7919 % 1000).cast("string")).alias("canon")
        )
        row48 = F.conv(F.substring(F.md5("canon"), 1, 12), 16, 10).cast("long")
        return t.agg(F.sum(row48 % 1000000007)).count()

    timed("table_fingerprint 20M rows", fingerprint)

    # 2. ordered-window family (ewma/rolling-median shape) at 10M events,
    #    100k users — ONE user exchange + sort, bounded per-row state
    def rolling():
        e = spark.range(10_000_000).select(
            (F.col("id") % 100_000).alias("user_id"),
            F.col("id").alias("event_id"),
            (F.col("id") * 1000).alias("ts"),
            (F.hash("id") % 1000 / 10.0).alias("value"),
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
        vals = F.array_sort(F.collect_list("value").over(w))
        n = F.size(vals)
        med = (F.element_at(vals, ((n + 1) / 2).cast("int"))
               + F.element_at(vals, (n / 2 + 1).cast("int"))) / 2
        return e.select(F.round(med, 6)).write.format("noop").mode("overwrite").save() or 10_000_000

    timed("window_rolling_median 10M rows / 100k users", rolling)

    # 3. BM25 shape at 200k synthetic docs (~40x sf0.1 documents)
    def bm25():
        words = ["scan", "vector", "dup", "table", "merge", "sort", "key",
                 "row", "batch", "data", "join", "hash", "small", "agg"]
        arr = F.array(*[F.lit(w) for w in words])
        d = spark.range(200_000).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(F.sequence(F.lit(1), F.lit(50)),
                            lambda i: F.element_at(arr, ((F.xxhash64(F.col("id"), i) % 14 + 14) % 14 + 1).cast("int"))),
                " ",
            ).alias("text"),
        )
        terms = ["scan", "vector", "dup"]
        toks = d.select("doc_id", F.split("text", " ").alias("toks"))
        stats = toks.agg(F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl"))
        tf = (toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
              .where(F.col("term").isin(terms))
              .groupBy("doc_id", "term", "dl").agg(F.count(F.lit(1)).alias("tf")))
        df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        contrib = idf * F.col("tf") * 2.2 / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
        scored = (tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(stats))
                  .groupBy("doc_id").agg(F.round(F.sum(contrib), 6).alias("score")))
        return scored.orderBy(F.col("score").desc(), "doc_id").limit(20).count()

    timed("text_bm25_topk 200k docs", bm25)

    # 4. degree distribution at 60M edge rows (100x sf0.1 lineitem)
    def degree():
        e = spark.range(60_000_000).select(
            (F.hash("id") % 2_000_000).alias("a"),
            (F.xxhash64("id") % 10_000).alias("b"),
        )
        deg = e.distinct().groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
        return deg.groupBy("degree").agg(F.count(F.lit(1))).count()

    timed("graph_degree_dist 60M edges", degree)

    # 5. GDPR erase shape at 10M events / broadcast 27k-key deletion list
    def gdpr():
        e = spark.range(10_000_000).select((F.col("id") % 1_000_000).alias("user_id"))
        dl = e.where(F.col("user_id") % 37 == 0).distinct()
        return e.join(F.broadcast(dl), "user_id", "left_anti").count()

    timed("gdpr_user_erasure 10M rows", gdpr)


if __name__ == "__main__":
    main()
