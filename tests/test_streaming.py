"""Structured Streaming variant: same spec, foreachBatch fan-out,
windowed watermark aggregate. availableNow trigger drives the whole
file-backed stream to completion synchronously."""

import os

import pytest
from pyspark.sql import functions as F

from gogstash_spark.plans.spec import PipelineSpec
from gogstash_spark.streaming.pipeline import run_pipeline_streaming, windowed_counts


@pytest.fixture(scope="module")
def mini_spec(sf_data_dir):
    return PipelineSpec.from_dict(
        {
            "input": {"path": os.path.join(sf_data_dir, "transcripts")},
            "filter": [
                {"type": "add_field", "key": "src", "value": "%{role}/%{tool}"},
            ],
            "output": [
                {"type": "table", "name": "s_user", "condition": "role == 'user'"},
                {"type": "table", "name": "s_tool", "condition": "role == 'tool'"},
            ],
        }
    )


class TestStreaming:
    def test_foreachbatch_fanout_matches_batch(self, spark, sf_data_dir, mini_spec, tmp_path):
        out = str(tmp_path / "stream_out")
        run_pipeline_streaming(
            spark, mini_spec, os.path.join(sf_data_dir, "transcripts"), out,
            base_dir=sf_data_dir,
        )
        src = spark.read.parquet(os.path.join(sf_data_dir, "transcripts"))
        want_user = src.filter("role = 'user'").count()
        want_tool = src.filter("role = 'tool'").count()
        assert spark.read.parquet(os.path.join(out, "s_user")).count() == want_user
        assert spark.read.parquet(os.path.join(out, "s_tool")).count() == want_tool
        # enriched field made it through the streaming chain
        row = spark.read.parquet(os.path.join(out, "s_user")).select("src").first()
        assert row["src"].startswith("user/")

    def test_epoch_replay_is_idempotent(self, spark, tmp_path):
        """Re-running an epoch (Structured Streaming's failure recovery)
        must not duplicate rows in already-written sinks."""
        from gogstash_spark.plans.compile import ROUTES
        from gogstash_spark.streaming.pipeline import make_batch_writer

        out = str(tmp_path / "replay_out")
        df = spark.createDataFrame(
            [(i, "user" if i % 2 else "tool") for i in range(10)], "id int, role string"
        ).withColumn(
            ROUTES,
            F.array_compact(F.array(
                F.when(F.col("role") == "user", F.lit("s_user")),
                F.when(F.col("role") == "tool", F.lit("s_tool")),
            )),
        )
        wb = make_batch_writer(["s_user", "s_tool"], out)
        wb(df, 0)
        wb(df, 0)  # replay of the same epoch
        assert spark.read.parquet(os.path.join(out, "s_user")).count() == 5
        assert spark.read.parquet(os.path.join(out, "s_tool")).count() == 5
        wb(df, 1)  # a genuinely new epoch appends
        assert spark.read.parquet(os.path.join(out, "s_user")).count() == 10

    def test_stateful_dedup_across_microbatches(self, spark, tmp_path):
        """applyInPandasWithState: first event per key wins, duplicates
        in LATER microbatches are dropped by keyed state."""
        from gogstash_spark.streaming.stateful import dedup_stream

        src_dir = str(tmp_path / "src")
        # two files -> two microbatches (maxFilesPerTrigger=1)
        spark.createDataFrame(
            [("k1", "first"), ("k2", "first")], "k string, v string"
        ).coalesce(1).write.mode("overwrite").parquet(src_dir)
        spark.createDataFrame(
            [("k1", "dup"), ("k3", "first")], "k string, v string"
        ).coalesce(1).write.mode("append").parquet(src_dir)

        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(src_dir)
        )
        q = (
            dedup_stream(stream, ["k"])
            .writeStream.outputMode("append").format("memory")
            .queryName("dedup_state_test").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = {
            r["k"]: r["v"]
            for r in spark.sql("SELECT * FROM dedup_state_test").collect()
        }
        assert set(got) == {"k1", "k2", "k3"}
        assert got["k2"] == "first" and got["k3"] == "first"

    def test_windowed_counts_with_watermark(self, spark, sf_data_dir):
        got = windowed_counts(
            spark, os.path.join(sf_data_dir, "transcripts"),
            window="1 hour", watermark="2 hours", queryName="wc_test",
        )
        src = spark.read.parquet(os.path.join(sf_data_dir, "transcripts"))
        want = (
            src.groupBy(F.date_trunc("hour", "ts").alias("ws"), "tool")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got_set = {(r["ws"], r["tool"], r["n"]) for r in got.collect()}
        want_set = {(r["ws"], r["tool"], r["n"]) for r in want.collect()}
        # append-mode watermark may hold back the trailing window(s) only
        assert got_set <= want_set
        assert len(got_set) >= 0.8 * len(want_set)
