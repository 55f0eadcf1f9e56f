"""Optimization measurement harness (guide §1; rounds 11/12).

Times individual registry keys in isolation with the noop sink and
dumps ``explain("formatted")`` to <plan-dir>/<key>_<tag>.txt so plan
claims in OPTIMIZATION_r<N>.md are judge-checkable.

    python tools/opt_measure.py --tag before --runs 3 key1 key2 ...

Writes one JSON line per key to stdout and appends to
/tmp/opt_measure_<tag>.jsonl. Uses the same session/methodology as
bench.py (warm session, best-of-N, noop sink, sf0.1 by default).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plan", action="store_true",
                    help="skip the explain dump (timing only)")
    ap.add_argument("--plan-dir", default="/root/repo/plans/r12")
    args = ap.parse_args()

    from flink_kmeans_spark.plans.registry import QUERIES
    from flink_kmeans_spark.session import get_spark

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = QUERIES()
    plandir = args.plan_dir
    os.makedirs(plandir, exist_ok=True)
    out_path = f"/tmp/opt_measure_{args.tag}.jsonl"

    for key in args.keys:
        fn = queries[key]
        spark.sparkContext.setJobDescription(f"opt:{key}")
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        if not args.no_plan:
            # a fresh plan (outside the timed loop) for the artifact
            pdf = fn(spark, args.sf_dir)
            plan = pdf._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"{plandir}/{key}_{args.tag}.txt", "w") as f:
                f.write(plan)
        rec = {
            "key": key,
            "tag": args.tag,
            "best": min(walls),
            "cold": walls[0],
            "walls": walls,
            "load": round(os.getloadavg()[0], 2),
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
