"""Gated connectors (fallback paths) + accumulator lineage metrics."""

import os

import pytest
from pyspark.sql import functions as F

from gogstash_spark.pipelines import standard_spec
from gogstash_spark.runner import run_pipeline
from gogstash_spark.sources import connectors


class TestConnectors:
    def test_iceberg_gating_falls_back_to_parquet(self, spark, sf_data_dir, tmp_path):
        assert connectors.iceberg_available(spark) is False  # no jar in image
        df = connectors.read_table(spark, os.path.join(sf_data_dir, "transcripts"))
        assert df.count() == 5000
        out = str(tmp_path / "append")
        connectors.append_table(df.limit(10), out)
        connectors.append_table(df.limit(10), out)
        assert spark.read.parquet(out).count() == 20

    def test_kafka_raises_actionable_error(self, spark):
        with pytest.raises(RuntimeError, match="--packages"):
            connectors.kafka_stream(spark, "localhost:9092", "t")


class TestFileInputs:
    """spec.input type/codec dispatch (reference file input + codec,
    input/file/inputfile.go:47-210, config/codec.go:23-36)."""

    def test_text_default_codec(self, spark, tmp_path):
        from gogstash_spark.sources.files import read_input

        p = str(tmp_path / "lines.log")
        with open(p, "w") as f:
            f.write("line one\nline two\n")
        df = read_input(spark, {"type": "text", "path": p})
        assert sorted(r["text"] for r in df.collect()) == ["line one", "line two"]

    def test_text_json_codec_lifts_reserved(self, spark, tmp_path):
        from gogstash_spark.sources.files import read_input

        p = str(tmp_path / "ev.log")
        with open(p, "w") as f:
            f.write('{"message":"hello","@timestamp":"2024-03-01T12:00:00Z","k":"v"}\n')
        df = read_input(spark, {"type": "text", "path": p, "codec": "json"})
        r = df.collect()[0]
        assert r["text"] == "hello" and r["ts"].year == 2024
        assert dict(r["extra"]) == {"k": "v"}

    def test_csv_and_jsonlines(self, spark, tmp_path):
        from gogstash_spark.sources.files import read_input

        c = str(tmp_path / "t.csv")
        with open(c, "w") as f:
            f.write("a,b\n1,x\n2,y\n")
        got = read_input(spark, {"type": "csv", "path": c}).collect()
        assert {(r["a"], r["b"]) for r in got} == {(1, "x"), (2, "y")}
        j = str(tmp_path / "t.jsonl")
        with open(j, "w") as f:
            f.write('{"a": 1}\n{"a": 2}\n')
        got = read_input(spark, {"type": "json", "path": j, "schema": "a bigint"}).collect()
        assert sorted(r["a"] for r in got) == [1, 2]

    def test_pipeline_over_text_input(self, spark, tmp_path):
        """e2e: raw log lines -> grok -> route -> sinks, the reference's
        bread-and-butter file pipeline shape."""
        p = str(tmp_path / "app.log")
        with open(p, "w") as f:
            f.write("level=error latency_ms=12 path=/a status=500\n")
            f.write("level=info latency_ms=3 path=/b status=200\n")
        res = run_pipeline(
            spark,
            {
                "input": {"type": "text", "path": p},
                "filter": [{"type": "kv", "source": "text",
                            "fields": {"level": "string", "status": {"key": "status", "type": "long"}}}],
                "output": [
                    {"type": "table", "name": "errs", "condition": "status >= 500"},
                    {"type": "table", "name": "rest", "condition": "status < 500"},
                ],
                "aggregate": [{"name": "counts", "group_by": ["level"]}],
            },
            out_dir=str(tmp_path / "out"),
            resume=False,
        )
        assert res.sink_rows == {"errs": 1, "rest": 1}


class TestLineageMetrics:
    def test_accumulators_and_per_file_lineage(self, spark, sf_data_dir, tmp_path):
        res = run_pipeline(
            spark,
            standard_spec(sf_data_dir),
            out_dir=str(tmp_path / "out"),
            base_dir=sf_data_dir,
            write_mode="partitioned",
        )
        acc = res.metrics.get("acc_grok")
        assert acc is not None
        # at-least-once semantics: every row passed the UDF >= once
        assert acc["rows"] >= 5000
        assert 0 < acc["misses"] < acc["rows"]
        lineage = res.metrics["lineage"]
        assert lineage["files"] > 0
        # per-file lineage lives in a parquet sidecar (never on the
        # driver); sink totals roll up from it
        per_file = spark.read.parquet(lineage["path"])
        by_route = {
            r["route"]: r["total"]
            for r in per_file.groupBy("route").agg(F.sum("rows").alias("total")).collect()
        }
        assert by_route == res.sink_rows
        assert per_file.count() == lineage["files"]


class TestTableFormatProbe:
    """ACID-table capability probe (kafka-probe pattern): the partitioned
    write uses a real iceberg/delta commit when the runtime is on the
    classpath, else the atomic-rename parquet path with the reason
    recorded — this image ships neither jar, so the fallback is the
    exercised path and the probe's miss must name the fix."""

    def test_probe_names_missing_runtime(self, spark):
        from gogstash_spark.sources.connectors import table_format_available

        ok, why = table_format_available(spark, "iceberg")
        assert not ok and "iceberg-spark-runtime" in why
        ok, why = table_format_available(spark, "delta")
        assert not ok and "delta-spark" in why
        ok, why = table_format_available(spark, "hudi")
        assert not ok and "unknown table format" in why

    def test_resolve_falls_back_and_promotes(self, spark, monkeypatch):
        from gogstash_spark import runner
        from gogstash_spark.sources import connectors

        fmt, why = runner.resolve_table_format(spark, "iceberg")
        assert fmt == "parquet" and "iceberg" in why
        assert runner.resolve_table_format(spark, "parquet") == ("parquet", None)
        assert runner.resolve_table_format(spark, None) == ("parquet", None)
        monkeypatch.setattr(
            connectors, "table_format_available", lambda s, f: (True, None)
        )
        assert runner.resolve_table_format(spark, "iceberg") == ("iceberg", None)

    def test_pipeline_runs_under_fallback_unchanged(self, spark, tmp_path):
        from gogstash_spark.runner import run_pipeline

        events = spark.createDataFrame(
            [("C1", 1, "user", "hi"), ("C2", 2, "tool", "x"), ("C3", 3, "user", "y")],
            "conv_id string, turn_idx int, role string, text string",
        )
        spec = {
            "input": {}, "filter": [],
            "output": [{"type": "table", "name": "users",
                        "condition": "role == 'user'"},
                       {"type": "table", "name": "rest",
                        "condition": "role != 'user'"}],
            "aggregate": [{"name": "counts", "group_by": ["role"]}],
        }
        base = run_pipeline(spark, spec, input_df=events,
                            out_dir=str(tmp_path / "pq"), resume=False)
        fb = run_pipeline(spark, spec, input_df=events,
                          out_dir=str(tmp_path / "ice"), resume=False,
                          table_format="iceberg")
        assert fb.sink_rows == base.sink_rows == {"users": 2, "rest": 1}
        tf = fb.metrics["table_format"]
        assert tf["requested"] == "iceberg" and tf["used"] == "parquet"
        assert "iceberg" in tf["fallback_reason"]

    def test_iceberg_without_ident_raises(self, spark, tmp_path, monkeypatch):
        """When the probe says iceberg IS available, the write goes
        through DataFrameWriterV2 (writeTo), which needs a catalog table
        identifier — a path alone must fail at plan time, not at the
        first save() against a non-existent table."""
        import pytest

        from gogstash_spark import runner
        from gogstash_spark.sources import connectors

        monkeypatch.setattr(
            connectors, "table_format_available", lambda s, f: (True, None)
        )
        events = spark.createDataFrame(
            [("C1", 1, "user", "hi")],
            "conv_id string, turn_idx int, role string, text string",
        )
        spec = {
            "input": {}, "filter": [],
            "output": [{"type": "table", "name": "users"}],
        }
        with pytest.raises(ValueError, match="table_ident"):
            runner.run_pipeline(
                spark, spec, input_df=events, out_dir=str(tmp_path / "o"),
                resume=False, table_format="iceberg",
            )

    def test_resume_reads_with_committed_format(self, spark, tmp_path, monkeypatch):
        """A run COMMITTED as parquet then RESUMED with
        table_format=iceberg must read by_route with the committed
        format from the ledger, not this run's request (otherwise the
        resume tries to read a parquet directory through the iceberg
        source and dies)."""
        import json

        from gogstash_spark import runner
        from gogstash_spark.sources import connectors

        events = spark.createDataFrame(
            [("C1", 1, "user", "hi"), ("C2", 2, "tool", "x")],
            "conv_id string, turn_idx int, role string, text string",
        )
        spec = {
            "input": {}, "filter": [],
            "output": [{"type": "table", "name": "users",
                        "condition": "role == 'user'"},
                       {"type": "table", "name": "rest",
                        "condition": "role != 'user'"}],
            "aggregate": [{"name": "counts", "group_by": ["role"]}],
        }
        out = str(tmp_path / "o")
        base = runner.run_pipeline(spark, spec, input_df=events, out_dir=out,
                                   resume=False)
        assert base.sink_rows == {"users": 1, "rest": 1}
        # drop the aggregate commit so the resume has real work that
        # goes through _read_routed()
        ledger_path = tmp_path / "o" / "_ledger.json"
        state = json.loads(ledger_path.read_text())
        assert state["sinks"]["__partitioned__"]["table_format"] == "parquet"
        del state["sinks"]["agg_counts"]
        ledger_path.write_text(json.dumps(state))
        # pretend iceberg is available now; the resume must STILL read
        # parquet because that is what the ledger says was committed
        monkeypatch.setattr(
            connectors, "table_format_available", lambda s, f: (True, None)
        )
        # no table_ident on purpose: a resume that serves from the
        # parquet commit never writes iceberg, so the ident requirement
        # must not block it
        res = runner.run_pipeline(
            spark, spec, input_df=events, out_dir=out, resume=True,
            table_format="iceberg",
        )
        assert res.agg_rows == {"counts": 2}


class TestKafkaContract:
    """The kafka connector contract: the exact readStream options
    generated from a verbatim gogstash kafka input block
    (reference input/kafka/inputkafka.go:20-33), pinned WITHOUT a
    broker or connector jar so semantics can't drift."""

    def test_options_full_block(self):
        from gogstash_spark.sources.connectors import kafka_options_from_gogstash

        cfg = {
            "type": "kafka",
            "version": "0.10.2.0",
            "brokers": ["k1:9092", "k2:9092"],
            "topics": ["logs", "audit"],
            "group": "gogstash",
            "offset_oldest": True,
            "assignor": "roundrobin",
            "security_protocol": "SASL_SSL",
            "sasl_mechanism": "PLAIN",
            "sasl_username": "u",
            "sasl_password": "p",
        }
        assert kafka_options_from_gogstash(cfg) == {
            "kafka.bootstrap.servers": "k1:9092,k2:9092",
            "subscribe": "logs,audit",
            "startingOffsets": "earliest",
            "kafka.group.id": "gogstash",
            "kafka.partition.assignment.strategy":
                "org.apache.kafka.clients.consumer.RoundRobinAssignor",
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "PLAIN",
            "kafka.sasl.jaas.config":
                'org.apache.kafka.common.security.plain.PlainLoginModule '
                'required username="u" password="p";',
        }

    def test_options_defaults_and_errors(self):
        import pytest as _pytest

        from gogstash_spark.sources.connectors import kafka_options_from_gogstash

        minimal = kafka_options_from_gogstash(
            {"brokers": ["b:9092"], "topics": ["t"]}
        )
        # sarama without OffsetOldest starts at newest
        assert minimal["startingOffsets"] == "latest"
        assert "kafka.group.id" not in minimal
        with _pytest.raises(ValueError, match="assignor"):
            kafka_options_from_gogstash(
                {"brokers": [], "topics": [], "assignor": "magic"}
            )
        with _pytest.raises(ValueError, match="sasl_mechanism"):
            kafka_options_from_gogstash(
                {"brokers": [], "topics": [], "sasl_mechanism": "GSSAPI"}
            )

    def test_stream_probe_names_missing_jar(self, spark):
        import pytest as _pytest

        from gogstash_spark.sources.connectors import kafka_stream

        with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_stream(spark, gogstash_cfg={"brokers": ["b:9092"], "topics": ["t"]})

    def test_sink_options_full_block(self):
        """Write-side contract, symmetric to the input: gogstash kafka
        output block -> exact writeStream options, one per topic (the
        reference produces every event to EVERY topic,
        output/kafka/outputkafka.go:95-107; SASL means SASL_PLAINTEXT +
        PLAIN in sarama terms, outputkafka.go:79-83)."""
        from gogstash_spark.sources.connectors import kafka_sink_options_from_gogstash

        cfg = {
            "type": "kafka",
            "version": "0.10.2.0",
            "brokers": ["k1:9092", "k2:9092"],
            "topics": ["logs", "audit"],
            "security_protocol": "SASL",
            "sasl_username": "u",
            "sasl_password": "p",
        }
        got = kafka_sink_options_from_gogstash(cfg)
        base = {
            "kafka.bootstrap.servers": "k1:9092,k2:9092",
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.mechanism": "PLAIN",
            "kafka.sasl.jaas.config":
                'org.apache.kafka.common.security.plain.PlainLoginModule '
                'required username="u" password="p";',
        }
        assert got == [{**base, "topic": "logs"}, {**base, "topic": "audit"}]

    def test_sink_options_validation(self):
        import pytest as _pytest

        from gogstash_spark.sources.connectors import kafka_sink_options_from_gogstash

        plain = kafka_sink_options_from_gogstash(
            {"brokers": ["b:9092"], "topics": ["t"]}
        )
        assert plain == [
            {"kafka.bootstrap.servers": "b:9092", "topic": "t"}
        ]
        with _pytest.raises(ValueError, match="brokers"):
            kafka_sink_options_from_gogstash({"topics": ["t"]})
        with _pytest.raises(ValueError, match="topics"):
            kafka_sink_options_from_gogstash({"brokers": ["b:9092"]})

    def test_write_stream_probe_names_missing_jar(self, spark, tmp_path):
        import pytest as _pytest

        from gogstash_spark.sources.connectors import kafka_write_stream

        df = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .selectExpr("CAST(value AS STRING) AS text")
        )
        with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_write_stream(
                df, str(tmp_path / "ck"),
                {"brokers": ["b:9092"], "topics": ["t"]},
            )

    def test_jaas_credentials_are_escaped(self):
        from gogstash_spark.sources.connectors import kafka_options_from_gogstash

        opts = kafka_options_from_gogstash({
            "brokers": ["b:9092"], "topics": ["t"],
            "sasl_mechanism": "PLAIN",
            "sasl_username": 'u"x', "sasl_password": 'p\\"y',
        })
        assert opts["kafka.sasl.jaas.config"] == (
            'org.apache.kafka.common.security.plain.PlainLoginModule '
            'required username="u\\"x" password="p\\\\\\"y";'
        )
