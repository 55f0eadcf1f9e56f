"""Structured Streaming variants of the event-time operators
(SURVEY.md §2B Phase 5 stretch; the reference is batch-only).

The batch queries in ``plans/eventtime.py`` already use the
streaming-identical primitives (``F.window`` / ``F.session_window``),
so these jobs are a SOURCE swap: ``readStream`` over the same parquet
(file-source), watermarks for state cleanup, ``availableNow`` trigger
to drain the backlog and stop — the cluster pattern for incremental
ingestion of a landing directory.

Tests assert the streaming results EQUAL the batch results on the same
input — the strongest available oracle for streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_conf


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, with the same
    ns-timestamp normalization as the batch reader (sources/tables.py).
    File streams require an explicit schema — taken from a static read."""
    ensure_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-source basePath must be a DIRECTORY; select the one table's
    # file(s) out of the landing dir with a glob filter
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``window_tumbling``: watermarked 10-min
    event-time counts. The 1h watermark bounds state: windows older
    than (max event time − 1h) are finalized and evicted."""
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("w_start"), "event_type", "n")
    )


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``window_sliding``: 10-min windows every 5 min."""
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("w_start"), "n")
    )


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``window_session``: 15-min-gap session windows
    per user with watermark-bounded session state."""
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on event_id:
    ``dropDuplicatesWithinWatermark`` keeps dedup state only inside the
    watermark horizon — bounded memory on an unbounded stream (the
    at-least-once-ingestion cleanup pattern)."""
    ev = stream_events(spark, sf_dir)
    return ev.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    ).select("event_id", "user_id", "event_type")


def streaming_user_counter_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL operator via ``applyInPandasWithState`` — the
    arbitrary-state extension point (Flink's KeyedProcessFunction
    analogue; SURVEY §2B udf/streaming surface): per-user GroupState
    accumulating (event_count, total_value) across micro-batches,
    emitting one row per user per batch with the running totals.

    State is a plain tuple in the state store (HDFS-backed RocksDB/
    memory at scale); the watermark bounds how long idle users' state
    survives via the state timeout."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    df: DataFrame, name: str, output_mode: str = "complete", timeout_sec: int = 120
) -> DataFrame:
    """Drain the stream with the availableNow trigger into an in-memory
    sink and return the result table (test/driver harness helper).
    Checkpoints live under the repo's .scratch (the build environment
    forbids writes outside /root/repo)."""
    import os
    import tempfile

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
    )
    os.makedirs(base, exist_ok=True)
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_", dir=base)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    q.stop()
    return df.sparkSession.table(name)
