"""Round-12 hot-shingle probe for text_containment (VERDICT r11 item 1
done-criterion): one shingle present in ~10% of documents at ~100x the
sf0.1 document volume must flow through the posting pipeline WITHOUT an
unbounded per-group collect_list buffering it.

Why this probe exists: the r11 shape collected EVERY posting list into
an ObjectHashAggregate group and applied the df <= 50 cap afterwards —
a hot shingle that is not in a stop list buffers an unbounded array in
ONE aggregate group before being discarded (guide §5 executor-OOM
class). The r12 shape counts df as a window count over the same
g-keyed exchange (WindowExec streams groups through a spillable row
buffer) and filters BEFORE any list exists, so the hot group's rows
never materialize as array state.

Corpus: 500k docs (sf0.1 ships 5k — x100), ~12 unique-ish tokens each
(token = md5 slice of (doc_id, position), so the shingle space grows
with the corpus), with every 10th doc carrying the SAME leading
3-token phrase ("hot alpha beta") => one shingle with df = 50k, far
past the cap, plus two partially-hot shingles at the phrase borders.

Run:  python tools/scale_probe_r12_hotshingle.py
Emits one JSON line: {"rows": ..., "wall_s": ..., "n_docs": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/.replica/hotshingle"
N_DOCS = 500_000


def main() -> int:
    from pyspark.sql import functions as F

    from flink_kmeans_spark.session import get_spark

    spark = get_spark("hotshingle-probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{OUT}/documents.parquet"
    if not os.path.exists(path):
        os.makedirs(OUT, exist_ok=True)
        base = spark.range(0, N_DOCS, 1, 32)
        # every 1000th doc clones its predecessor's body => planted
        # containment-1.0 pairs prove the pipeline still EMITS pairs
        # (the probe isn't vacuously filtering everything)
        src = F.when(
            F.col("id") % 1000 == 999, F.col("id") - 1
        ).otherwise(F.col("id"))
        tok = lambda i: F.substring(  # noqa: E731
            F.md5(F.concat(src.cast("string"), F.lit(f"#{i}"))), 1, 8
        )
        body = F.concat_ws(" ", *[tok(i) for i in range(12)])
        text = F.when(
            F.col("id") % 10 == 0, F.concat(F.lit("hot alpha beta "), body)
        ).otherwise(body)
        (
            base.select(
                F.col("id").alias("doc_id"),
                text.alias("text"),
                F.lit("en").alias("lang"),
                F.lit("probe").alias("source"),
                F.length(text).cast("long").alias("n_chars"),
            ).write.mode("overwrite").parquet(path)
        )

    from flink_kmeans_spark.plans.registry import QUERIES

    fn = QUERIES()["text_containment"]
    t0 = time.time()
    df = fn(spark, OUT)
    df.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    n = df.count()
    print(
        json.dumps(
            {"rows": n, "wall_s": round(wall, 2), "n_docs": N_DOCS}
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
