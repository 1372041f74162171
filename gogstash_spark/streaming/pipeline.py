"""Structured Streaming variant of the pipeline.

The reference is a daemon: inputs push events through channels forever
(reference config/input.go:70-85). The streaming runner is the same
compiled filter chain + routes column applied to a readStream source;
per-sink fan-out happens inside foreachBatch, writing each (sink,
epoch) to its own epoch=N partition dir with overwrite semantics so an
epoch replay is idempotent (exactly-once at the sink level). The
report-style aggregate becomes a watermarked windowed count
(reference output/report/outputreport.go:56-92).

File-source streaming stands in for kafka here (the kafka connector
needs its jar; `readStream.format("kafka")` is the one-line swap).
sincedb offset checkpointing (reference input/file/sincedb.go:21-91)
maps to the streaming checkpointLocation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gogstash_spark.operators import Context
from gogstash_spark.plans.compile import ROUTES, compile_pipeline
from gogstash_spark.plans.spec import PipelineSpec


def stream_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 4)  # rate_limit analog in streaming
        .load(path)
    )


def make_batch_writer(sinks: list[str], out_dir: str):
    """foreachBatch fan-out writer, exactly-once per (sink, epoch): each
    microbatch lands in its own epoch=N subdir with OVERWRITE semantics,
    so when Structured Streaming replays an epoch after a mid-fanout
    failure (sink A written, sink B not), the rewrite is idempotent —
    sink A's epoch dir is replaced, never appended twice. Readers see
    each sink as one partitioned dataset (epoch is a partition column).
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            for sink in sinks:
                (
                    batch_df.filter(F.array_contains(F.col(ROUTES), sink))
                    .drop(ROUTES)
                    .write.mode("overwrite")
                    .parquet(os.path.join(out_dir, sink, "epoch=%d" % epoch_id))
                )
        finally:
            batch_df.unpersist()

    return write_batch


def run_pipeline_streaming(
    spark: SparkSession,
    spec: PipelineSpec | dict,
    input_path: str,
    out_dir: str,
    base_dir: str = ".",
    await_termination: bool = True,
):
    """Run the compiled pipeline as a streaming query with foreachBatch
    fan-out. Returns the streaming query handle (stopped when
    await_termination via processAllAvailable)."""
    if isinstance(spec, dict):
        spec = PipelineSpec.from_dict(spec)
    ctx = Context(spark=spark, base_dir=base_dir)
    plan = compile_pipeline(spec, ctx)
    src = stream_source(spark, input_path)
    routed = plan.with_routes(plan.transform(src))
    write_batch = make_batch_writer([r.sink for r in plan.routes], out_dir)

    q = (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_counts(
    spark: SparkSession,
    input_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    queryName: str = "windowed_counts",
):
    """Watermarked windowed aggregate (late data handled by watermark):
    counts by (tool, window). Memory sink for tests."""
    src = stream_source(spark, input_path)
    # parquet NTZ timestamps can't carry a watermark; session tz is UTC
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("tool"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT window.start AS ws, tool, n FROM %s" % queryName)
