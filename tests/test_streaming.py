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


class TestStreamingSessionize:
    def test_sessions_carry_across_microbatches(self, spark, tmp_path):
        """per-key (last_ts, session_idx) state: a conversation that
        resumes within the gap keeps its session; a long pause (or a
        fresh key) starts the next — matching the batch sessionize on
        the same in-order data."""
        from gogstash_spark.functions.sessions import sessionize
        from gogstash_spark.streaming.stateful import sessionize_stream

        src_dir = str(tmp_path / "sess_src")
        b1 = [
            ("c1", 0, "2024-03-01 10:00:00"),
            ("c1", 1, "2024-03-01 10:10:00"),
            ("c2", 0, "2024-03-01 10:00:00"),
        ]
        b2 = [
            ("c1", 2, "2024-03-01 10:20:00"),   # within gap: session 0
            ("c1", 3, "2024-03-01 13:00:00"),   # >30min later: session 1
            ("c2", 1, "2024-03-01 12:00:00"),   # c2 long pause: session 1
            ("c3", 0, "2024-03-01 12:00:00"),   # fresh key: session 0
        ]
        schema_in = "conv_id string, turn_idx int, ts_s string"
        for i, rows in enumerate([b1, b2]):
            (
                spark.createDataFrame(rows, schema_in)
                .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
                .coalesce(1).write.mode("append" if i else "overwrite")
                .parquet(src_dir)
            )
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(src_dir)
        )
        q = (
            sessionize_stream(stream, "conv_id", "ts", "turn_idx", gap_seconds=1800)
            .writeStream.outputMode("append").format("memory")
            .queryName("sess_stream_t").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = {
            (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["session_id"])
            for r in spark.sql("SELECT * FROM sess_stream_t").collect()
        }
        assert got[("c1", 0)] == (0, "c1#0")
        assert got[("c1", 2)] == (0, "c1#0")   # continued across batches
        assert got[("c1", 3)] == (1, "c1#1")
        assert got[("c2", 1)] == (1, "c2#1")
        assert got[("c3", 0)] == (0, "c3#0")
        # in-order data: streaming assignment == batch window assignment
        batch = sessionize(
            spark.read.parquet(src_dir), "conv_id", "ts", "turn_idx",
            gap_seconds=1800,
        )
        want = {
            (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["session_id"])
            for r in batch.collect()
        }
        assert got == want

    def test_late_cross_batch_event_joins_current_session(self, spark, tmp_path):
        """PINNED late-data semantics (cursor sessionizer): an event
        arriving in a LATER microbatch with ts before the key's cursor
        joins the current session — it is neither dropped nor allowed to
        renumber earlier output — and the cursor does not rewind, so a
        straggler can't split the session for later in-order events."""
        from gogstash_spark.streaming.stateful import sessionize_stream

        src_dir = str(tmp_path / "late_src")
        b1 = [
            ("c1", 0, "2024-03-01 10:00:00"),
            ("c1", 1, "2024-03-01 10:10:00"),
        ]
        b2 = [
            ("c1", 2, "2024-03-01 09:55:00"),   # LATE: before the cursor
            ("c1", 3, "2024-03-01 10:25:00"),   # in-order, within gap of 10:10
            ("c1", 4, "2024-03-01 13:00:00"),   # >30min: next session
        ]
        schema_in = "conv_id string, turn_idx int, ts_s string"
        for i, rows in enumerate([b1, b2]):
            (
                spark.createDataFrame(rows, schema_in)
                .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
                .coalesce(1).write.mode("append" if i else "overwrite")
                .parquet(src_dir)
            )
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(src_dir)
        )
        q = (
            sessionize_stream(stream, "conv_id", "ts", "turn_idx", gap_seconds=1800)
            .writeStream.outputMode("append").format("memory")
            .queryName("sess_late_t").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = {
            (r["conv_id"], r["turn_idx"]): r["session_idx"]
            for r in spark.sql("SELECT * FROM sess_late_t").collect()
        }
        assert got[("c1", 2)] == 0   # late event folded into current session
        assert got[("c1", 3)] == 0   # cursor not rewound: no spurious split
        assert got[("c1", 4)] == 1   # real gap still opens the next session

    def test_windowed_session_counts_rate_limited(self, spark, tmp_path):
        """the verdict's shape: session assignment in a rate-limited
        stream (maxFilesPerTrigger as the batch token bucket), rolled up
        to per-window session counts."""
        from gogstash_spark.streaming.stateful import sessionize_stream

        src_dir = str(tmp_path / "sess_rate_src")
        # one file per burst hour = time-ordered arrival (a log stream);
        # maxFilesPerTrigger throttles to one burst per microbatch
        for i, hh in enumerate((9, 12)):
            rows = [
                ("c%d" % c, 3 * i + t, "2024-03-01 %02d:%02d:00" % (hh, 5 * t))
                for c in range(4) for t in range(3)
            ]
            (
                spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_s string")
                .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
                .coalesce(1).write.mode("append" if i else "overwrite")
                .parquet(src_dir)
            )
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(src_dir)  # rate limit
        )
        q = (
            sessionize_stream(stream, "conv_id", "ts", "turn_idx", gap_seconds=1800)
            .writeStream.outputMode("append").format("memory")
            .queryName("sess_rate_t").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        out = spark.sql("SELECT * FROM sess_rate_t")
        agg = (
            out.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.countDistinct("session_id").alias("sessions"))
            .collect()
        )
        by_hour = {r["w"]["start"].hour: r["sessions"] for r in agg}
        assert by_hour == {9: 4, 12: 4}  # 4 convs x 1 session per burst
