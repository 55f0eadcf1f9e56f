"""Distributed global ranking primitives (operators/ranking.py) vs the
single-partition Window ground truth — the rewrite must be EXACT, not
approximately ordered (VERDICT r3 plan item: no unbounded-grain
global-sort windows)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_kmeans_spark.operators.ranking import (
    with_global_ntile,
    with_global_rank_and_running_sum,
    with_global_row_number,
    with_global_running_sum,
)


def _frame(spark, n, seed=7):
    # non-uniform values force uneven range partitions; unique id tiebreak
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id") + seed, F.lit(97))).cast("double").alias("v"),
    )


@pytest.mark.parametrize("n", [0, 1, 3, 97, 1000])
def test_row_number_matches_global_window(spark, n):
    df = _frame(spark, n)
    order = [F.col("v").desc(), F.col("id")]
    got, total = with_global_row_number(df, order, "rn", num_partitions=8)
    assert total == n
    expect = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )
    assert sorted(got.collect()) == sorted(expect.collect())


@pytest.mark.parametrize("n,tiles", [(1, 4), (3, 4), (8, 4), (97, 4), (1000, 7)])
def test_ntile_matches_global_window(spark, n, tiles):
    # covers N < tiles, N % tiles == 0, and N % tiles != 0
    df = _frame(spark, n)
    order = [F.col("v").asc(), F.col("id")]
    got = with_global_ntile(df, order, tiles, "t", num_partitions=8)
    expect = df.withColumn("t", F.ntile(tiles).over(Window.orderBy(*order)))
    assert sorted(got.collect()) == sorted(expect.collect())


def test_running_sum_matches_global_window(spark):
    df = _frame(spark, 500)
    order = [F.col("v").desc(), F.col("id")]
    got = with_global_running_sum(df, order, "v", "cum", num_partitions=8)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    expect = df.withColumn("cum", F.sum("v").over(w))
    g = {r["id"]: round(r["cum"], 6) for r in got.collect()}
    e = {r["id"]: round(r["cum"], 6) for r in expect.collect()}
    assert g == e


def test_fused_rank_and_running_sum(spark):
    df = _frame(spark, 500)
    order = [F.col("v").desc(), F.col("id")]
    got = with_global_rank_and_running_sum(df, order, "v", "rn", "cum", 8)
    w = Window.orderBy(*order)
    ws = w.rowsBetween(Window.unboundedPreceding, 0)
    expect = df.select(
        "id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("v").over(ws).alias("cum"),
    )
    g = {r["id"]: (r["rn"], round(r["cum"], 6)) for r in got.collect()}
    e = {r["id"]: (r["rn"], round(r["cum"], 6)) for r in expect.collect()}
    assert g == e


def test_no_single_partition_window_in_rewritten_keys(spark):
    """The four VERDICT-flagged unbounded-grain keys must compile with
    every Window node partitioned (3 argument groups in the physical
    Window operator: funcs, partitionBy, orderBy) — no global-sort
    WindowExec anywhere in their plans."""
    import re

    from flink_kmeans_spark.plans.registry import specs

    sf = "/root/testdata/sf0.001"
    for key in ("events_rfm", "events_pareto_share", "text_zipf_fit", "text_encode_ids"):
        df = specs()[key].fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            m = re.match(r"\s*[:+\- |*]*Window ", line)
            if m:
                body = line[m.end() - len("Window ") + len("Window") :]
                groups = re.findall(r"\[(?:[^\[\]]|\[[^\[\]]*\])*\]", body)
                assert len(groups) >= 3, f"{key}: global window -> {line.strip()}"


def test_ntile_property_random_sizes(spark):
    """Hypothesis-style sweep across awkward (n, tiles, partitions)
    combinations — NTILE boundaries are exactly the single-partition
    window's for every shape (the q=0, r=0, and r>0 regimes)."""
    from pyspark.sql import Window

    for n, tiles, parts in [
        (2, 5, 3),      # n < tiles, tiles > partitions
        (7, 7, 2),      # n == tiles
        (13, 4, 16),    # more partitions than fill
        (96, 5, 8),     # r = 1
        (100, 4, 8),    # r = 0 exact
        (101, 4, 1),    # single partition degenerate
    ]:
        df = _frame(spark, n, seed=n * 31 + tiles)
        order = [F.col("v").desc(), F.col("id")]
        got = with_global_ntile(df, order, tiles, "t", num_partitions=parts)
        expect = df.withColumn("t", F.ntile(tiles).over(Window.orderBy(*order)))
        assert sorted(got.collect()) == sorted(expect.collect()), (n, tiles, parts)


def test_multi_running_sums_match_global_window(spark):
    """with_global_running_sums carries N simultaneous cumulative sums
    over one staged pass — pin both columns against the
    single-partition window."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from flink_kmeans_spark.operators.ranking import with_global_running_sums

    df = spark.range(2000).select(
        (F.col("id") * 37 % 1000).alias("k"),
        (F.col("id") % 7).cast("double").alias("a"),
        (F.col("id") % 3).cast("double").alias("b"),
    )
    got = (
        with_global_running_sums(df, [F.col("k"), F.col("a"), F.col("b")], ["a", "b"], ["ca", "cb"], 16)
        .orderBy("k", "a", "b")
        .collect()
    )
    w = Window.orderBy("k", "a", "b").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.withColumn("ca", F.sum("a").over(w))
        .withColumn("cb", F.sum("b").over(w))
        .orderBy("k", "a", "b")
        .collect()
    )
    assert [(r["ca"], r["cb"]) for r in got] == [(r["ca"], r["cb"]) for r in want]
