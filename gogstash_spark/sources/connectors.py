"""Gated connectors: Iceberg table I/O and Kafka streaming.

The north-rule deployment target is Iceberg tables read/written by a
multi-executor cluster and Kafka-style streams; this container ships
neither the Iceberg runtime jar nor a Kafka broker, so both are gated
behind capability probes with a parquet/file fallback — the call sites
are real, only the format string changes on a provisioned cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def table_format_available(spark: SparkSession, fmt: str) -> tuple[bool, str | None]:
    """Capability probe for an ACID table format on THIS session's
    classpath: (available, reason-when-not). Same pattern as the kafka
    jar probe — call sites are real, only the format string changes on
    a provisioned cluster.
    """
    fmt = (fmt or "").lower()
    if fmt == "iceberg":
        try:
            spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
            return True, None
        except Exception:
            return False, (
                "iceberg runtime not on classpath; submit with --packages "
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version> "
                "and a spark.sql.catalog.* config"
            )
    if fmt == "delta":
        try:
            spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
            return True, None
        except Exception:
            return False, (
                "delta runtime not on classpath; submit with --packages "
                "io.delta:delta-spark_2.13:<version> and the "
                "DeltaSparkSessionExtension"
            )
    return False, "unknown table format %r (known: iceberg, delta)" % fmt


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


_KAFKA_ASSIGNORS = {
    "range": "org.apache.kafka.clients.consumer.RangeAssignor",
    "roundrobin": "org.apache.kafka.clients.consumer.RoundRobinAssignor",
    "sticky": "org.apache.kafka.clients.consumer.StickyAssignor",
}

_SASL_LOGIN_MODULES = {
    "PLAIN": "org.apache.kafka.common.security.plain.PlainLoginModule",
    "SCRAM-SHA-256": "org.apache.kafka.common.security.scram.ScramLoginModule",
    "SCRAM-SHA-512": "org.apache.kafka.common.security.scram.ScramLoginModule",
}


def kafka_options_from_gogstash(cfg: dict) -> dict[str, str]:
    """gogstash kafka input block -> the exact Spark kafka-source
    options (reference input/kafka/inputkafka.go:20-33 — brokers,
    topics, group, offset_oldest, assignor, SASL fields). This is the
    connector CONTRACT: pinned by test without a broker/jar so the
    semantics can't drift.

    Notes vs the sarama consumer: Spark tracks offsets in its own
    checkpoint (group.id is still forwarded so broker-side quotas/ACLs
    apply); offset_oldest maps to startingOffsets earliest/latest —
    the same initial-offset choice sarama's OffsetOldest makes.
    """
    opts = {
        "kafka.bootstrap.servers": ",".join(cfg.get("brokers") or []),
        "subscribe": ",".join(cfg.get("topics") or []),
        "startingOffsets": "earliest" if cfg.get("offset_oldest") else "latest",
    }
    if cfg.get("group"):
        opts["kafka.group.id"] = str(cfg["group"])
    if cfg.get("assignor"):
        a = str(cfg["assignor"]).lower()
        if a not in _KAFKA_ASSIGNORS:
            raise ValueError("kafka assignor must be one of %s" % sorted(_KAFKA_ASSIGNORS))
        opts["kafka.partition.assignment.strategy"] = _KAFKA_ASSIGNORS[a]
    if cfg.get("security_protocol"):
        opts["kafka.security.protocol"] = str(cfg["security_protocol"])
    mech = cfg.get("sasl_mechanism")
    if mech:
        mech = str(mech).upper()
        opts["kafka.sasl.mechanism"] = mech
        module = _SASL_LOGIN_MODULES.get(mech)
        if module is None:
            raise ValueError(
                "unsupported sasl_mechanism %r (known: %s)"
                % (mech, sorted(_SASL_LOGIN_MODULES))
            )
        def jaas_quote(s: str) -> str:
            return str(s).replace("\\", "\\\\").replace('"', '\\"')

        user = jaas_quote(cfg.get("sasl_username", ""))
        pwd = jaas_quote(cfg.get("sasl_password", ""))
        opts["kafka.sasl.jaas.config"] = (
            '%s required username="%s" password="%s";' % (module, user, pwd)
        )
    return opts


def kafka_sink_options_from_gogstash(cfg: dict) -> list[dict[str, str]]:
    """gogstash kafka OUTPUT block -> the exact Spark kafka-sink
    writeStream options, one option-dict per topic (reference
    output/kafka/outputkafka.go:17-27 config; Output() produces every
    event to EVERY listed topic, outputkafka.go:95-107 — hence the
    list). The write-side contract, pinned broker-less like the input.

    Mapping notes vs the sarama producer:
    - security_protocol == "SASL" enables SASL with username/password
      (outputkafka.go:79-83); sarama's default SASL mechanism is PLAIN
      over plaintext -> SASL_PLAINTEXT + PlainLoginModule.
    - empty brokers/topics is an init error in the reference
      (outputkafka.go:69-77) -> ValueError here.
    """
    brokers = cfg.get("brokers") or []
    topics = cfg.get("topics") or []
    if not brokers:
        raise ValueError("kafka output: brokers should not be empty")
    if not topics:
        raise ValueError("kafka output: topics should not be empty")
    base: dict[str, str] = {"kafka.bootstrap.servers": ",".join(brokers)}
    if cfg.get("security_protocol") == "SASL":
        def jaas_quote(s: str) -> str:
            return str(s).replace("\\", "\\\\").replace('"', '\\"')

        base["kafka.security.protocol"] = "SASL_PLAINTEXT"
        base["kafka.sasl.mechanism"] = "PLAIN"
        base["kafka.sasl.jaas.config"] = (
            'org.apache.kafka.common.security.plain.PlainLoginModule '
            'required username="%s" password="%s";'
            % (jaas_quote(cfg.get("sasl_username", "")),
               jaas_quote(cfg.get("sasl_password", "")))
        )
    elif cfg.get("security_protocol"):
        base["kafka.security.protocol"] = str(cfg["security_protocol"])
    return [{**base, "topic": str(t)} for t in topics]


def kafka_write_stream(
    df: DataFrame,
    checkpoint_dir: str,
    gogstash_cfg: dict,
    json_opts: dict | None = None,
):
    """writeStream to Kafka from a gogstash kafka output block: the
    event is Go-marshal-parity JSON (event.MarshalJSON,
    output/kafka/outputkafka.go:96) in the record value, one streaming
    query per topic. Raises a clear error naming the missing connector
    jar on this image."""
    import re as _re

    from gogstash_spark.codecs import encode_json

    encoded = encode_json(df, **(json_opts or {})).select(
        F.col("encoded").cast("binary").alias("value")
    )
    # config errors (empty brokers/topics) surface as-is, OUTSIDE the
    # jar-probe try — masking them as "jar missing" misdirects the fix
    per_topic = kafka_sink_options_from_gogstash(gogstash_cfg)
    queries = []
    seen: dict[str, int] = {}
    try:
        for opts in per_topic:
            # checkpoint keyed by TOPIC NAME, never list position: a
            # reordered/shrunk topic list must not re-bind another
            # topic's committed offsets (silent skip/duplication). A
            # topic listed TWICE (the reference would publish each
            # event twice to it) gets a _dupN suffix so the two
            # concurrent queries never share one streaming checkpoint.
            ck = _re.sub(r"[^A-Za-z0-9._-]", "_", opts["topic"])
            n = seen.get(ck, 0)
            seen[ck] = n + 1
            if n:
                ck = "%s_dup%d" % (ck, n)
            w = encoded.writeStream.format("kafka").option(
                "checkpointLocation", "%s/topic_%s" % (checkpoint_dir, ck)
            )
            for k, v in opts.items():
                w = w.option(k, v)
            queries.append(w.start())
    except Exception as e:
        for q in queries:
            q.stop()
        msg = str(e)
        if "Failed to find" in msg or "ClassNotFound" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            raise RuntimeError(
                "kafka connector not on classpath; submit with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
            ) from e
        raise
    return queries


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str | None = None,
    topics: str | None = None,
    starting_offsets: str = "earliest",
    gogstash_cfg: dict | None = None,
) -> DataFrame:
    """readStream from Kafka (reference input/kafka/inputkafka.go:24-33)
    — value bytes -> `text` via the default codec. Pass either the
    explicit args or a verbatim gogstash kafka input block. Raises a
    clear error when the kafka connector jar is absent (this image)."""
    if gogstash_cfg is not None:
        opts = kafka_options_from_gogstash(gogstash_cfg)
    else:
        opts = {
            "kafka.bootstrap.servers": bootstrap_servers or "",
            "subscribe": topics or "",
            "startingOffsets": starting_offsets,
        }
    try:
        r = spark.readStream.format("kafka")
        for k, v in opts.items():
            r = r.option(k, v)
        src = r.load()
    except Exception as e:  # jar missing -> actionable message
        msg = str(e)
        if (
            "Failed to find" in msg or "ClassNotFound" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            raise RuntimeError(
                "kafka connector not on classpath; submit with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
            ) from e
        raise
    from gogstash_spark.codecs import decode_default

    return decode_default(src, "value")
