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
