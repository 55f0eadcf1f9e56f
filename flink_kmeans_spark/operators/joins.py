"""Join operators Spark lacks natively — composed from shuffle-minimal
DataFrame primitives (SURVEY.md §2B "Joins").
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """As-of (backward) join: for every left row, the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys —
    DuckDB/pandas ``merge_asof`` semantics, which Spark SQL lacks.

    Implementation is the union+ordered-window trick, NOT an
    equi-join + aggregate: a join would materialize every (left row ×
    earlier right row) pair before reducing — quadratic blowup on hot
    keys at 100 TB — whereas the union form is ONE shuffle of
    |left|+|right| rows, partitioned by key and sorted by time, with
    ``last(value, ignorenulls)`` carrying the latest right value
    forward. Right rows sort BEFORE left rows at equal timestamps, so
    ``ts_right == ts_left`` matches (the ≤ contract). When MULTIPLE
    right rows share the same (key, ts), the carried value must still
    be deterministic — ``tiebreak`` columns only exist on the left side
    (right rows hold NULL there), so the value columns themselves are
    the final sort key: the row with the greatest value tuple wins,
    every run.

    Returns all left columns plus ``value_cols`` (null when no earlier
    right row exists).
    """
    on = list(on)
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_cols = on + [F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")] + [
        F.col(c).alias(f"__v_{c}") for c in value_cols
    ]
    rhs = right.select(*rhs_cols)
    for c in left.columns:
        if c not in [f.name for f in rhs.schema.fields]:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in value_cols:
        lhs = lhs.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    unioned = lhs.unionByName(rhs, allowMissingColumns=False)

    order = (
        [F.col("__ts").asc(), F.col("__side").asc()]
        + [F.col(t).asc() for t in tiebreak]
        # deterministic winner among equal-(key, ts) right rows: order by
        # the carried values (left rows are all-NULL here and sort first,
        # which is irrelevant — each left row emits itself exactly once)
        + [F.col(f"__v_{c}").asc_nulls_first() for c in value_cols]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"__asof_{c}", F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("__side") == 1)
    keep = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_{c}").alias(c) for c in value_cols
    ]
    return out.select(*keep)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """As-of (forward) join: for every left row, the right row with the
    SMALLEST ``right_ts`` ≥ ``left_ts`` within the same keys (pandas
    ``merge_asof(direction='forward')``). Same union+window shape as
    :func:`asof_join_backward` mirrored: descending time order, right
    rows sorting before left at equal timestamps so ``==`` matches, the
    running ``last(ignorenulls)`` carrying the NEAREST LATER value
    backward through event time. One shuffle of |left|+|right| rows —
    the same no-pair-blowup scale argument as backward."""
    on = list(on)
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_cols = on + [F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")] + [
        F.col(c).alias(f"__v_{c}") for c in value_cols
    ]
    rhs = right.select(*rhs_cols)
    for c in left.columns:
        if c not in [f.name for f in rhs.schema.fields]:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in value_cols:
        lhs = lhs.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    unioned = lhs.unionByName(rhs, allowMissingColumns=False)

    order = (
        [F.col("__ts").desc(), F.col("__side").asc()]
        + [F.col(t).asc() for t in tiebreak]
        # same greatest-value-wins determinism rule as backward
        + [F.col(f"__v_{c}").asc_nulls_first() for c in value_cols]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"__asof_{c}", F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("__side") == 1)
    keep = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_{c}").alias(c) for c in value_cols
    ]
    return out.select(*keep)
