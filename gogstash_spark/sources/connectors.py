"""Gated connectors: Iceberg table I/O and Kafka streaming.

The north-rule deployment target is Iceberg tables read/written by a
multi-executor cluster and Kafka-style streams; this container ships
neither the Iceberg runtime jar nor a Kafka broker, so both are gated
behind capability probes with a parquet/file fallback — the call sites
are real, only the format string changes on a provisioned cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
    except Exception:
        return False
    for k in spark.sparkContext.getConf().getAll():
        if k[0].startswith("spark.sql.catalog.") and "iceberg" in k[1].lower():
            return True
    return False


def read_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read an Iceberg table name (catalog.db.table) when available,
    else a parquet path — same DataFrame out."""
    if "/" not in path_or_table and iceberg_available(spark):
        return spark.read.table(path_or_table)
    return spark.read.parquet(path_or_table)


def append_table(df: DataFrame, path_or_table: str, partition_by: list[str] | None = None) -> None:
    """Append to an Iceberg table (atomic snapshot commit) when
    available, else a parquet directory append. On Iceberg the runner's
    JSON ledger is replaced by snapshot ids (`table.history()`)."""
    spark = df.sparkSession
    if "/" not in path_or_table and iceberg_available(spark):
        df.writeTo(path_or_table).append()
        return
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_table)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from Kafka (reference input/kafka/inputkafka.go:24-33)
    — value bytes -> `text` via the default codec. Raises a clear error
    when the kafka connector jar is absent (this image)."""
    try:
        src = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # jar missing -> actionable message
        raise RuntimeError(
            "kafka connector not on classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from e
    from gogstash_spark.codecs import decode_default

    return decode_default(src, "value")
