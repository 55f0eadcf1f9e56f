"""Mixed-duplication replica for dedup_substring_cut (VERDICT r8 item 2).

The standard 100x replica (tools/scale_probe_100x.py) copies document
TEXT unchanged, so every 8-gram is cross-doc duplicated and the cut
rewrites the whole corpus — a legitimate worst case, but it cannot show
the clean-doc passthrough the operator now has. This tool builds a
mixed replica at the same 100x row count where ~80% of docs are
token-salted per copy (every token gets a copy-unique suffix, so all
their 8-grams are globally unique and the docs pass through
unrewritten) and ~20% keep their original text (100 identical copies →
fully duplicated → rewritten). Token counts are identical to the
all-dup replica, so wall-clock deltas are attributable to the
passthrough, not to data volume.

Records, per corpus: wall (best of 3), #docs with cut_tokens = 0
(passthrough visible), and the all-dup/mixed wall ratio.

Run:  python tools/scale_probe_mixdup.py   (writes .replica/mixdup)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
ALLDUP = "/root/repo/.replica/sf10x"   # built by scale_probe_100x.py
OUT = "/root/repo/.replica/mixdup"
COPIES = 100
SALT_PCT = 80  # % of base docs whose copies are made globally unique


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    src = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for c in range(COPIES):
        d = src.withColumn("doc_id", F.col("doc_id") + F.lit(c * 1_000_000))
        # deterministic 80/20 split on the BASE id so the same docs are
        # salted in every copy; salting suffixes EVERY token with a
        # copy-unique marker, keeping token counts identical while
        # making every 8-gram of the salted docs globally unique
        salted_text = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"§c{c}")),
            ),
            " ",
        )
        d = d.withColumn(
            "text",
            F.when(
                (F.col("doc_id") % 1_000_000) % 100 < SALT_PCT,
                salted_text,
            ).otherwise(F.col("text")),
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")


def main() -> None:
    from pyspark.sql import functions as F

    from flink_kmeans_spark.plans.registry import QUERIES
    from flink_kmeans_spark.session import get_spark

    spark = get_spark("scale-probe-mixdup")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{OUT}/documents.parquet"):
        t0 = time.time()
        build(spark)
        print(f"[build] mixdup replica written in {time.time()-t0:.1f}s",
              file=sys.stderr)

    fn = QUERIES()["dedup_substring_cut"]
    results = {}
    for label, sf_dir in [("alldup_100x", ALLDUP), ("mixdup_100x", OUT)]:
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            print(f"[skip] {label}: {sf_dir} missing", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        agg = fn(spark, sf_dir).agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("cut_tokens") == 0).cast("bigint")).alias(
                "passthrough_docs"
            ),
        ).collect()[0]
        results[label] = {
            "wall_s": round(best, 3),
            "docs": int(agg["docs"]),
            "passthrough_docs": int(agg["passthrough_docs"]),
        }
        print(f"[probe] {label}: {results[label]}", file=sys.stderr,
              flush=True)
    if len(results) == 2:
        results["alldup_over_mixdup_wall"] = round(
            results["alldup_100x"]["wall_s"]
            / results["mixdup_100x"]["wall_s"], 2
        )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
