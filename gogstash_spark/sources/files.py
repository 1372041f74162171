"""Batch file input: spec.input -> DataFrame.

The reference's file input tails raw lines and feeds them through the
configured codec (reference input/file/inputfile.go:47-210 + codec
dispatch config/codec.go:23-36); the batch analog reads the whole
fileset in one scan. Columnar formats (parquet/orc) skip the codec —
they are already typed; line formats (text/json/csv) decode at read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gogstash_spark import codecs


def read_input(spark: SparkSession, inp: dict) -> DataFrame:
    """Read spec.input: {type: parquet|orc|text|json|csv, path, ...}.

    text honors `codec` (default|json) exactly like the reference's
    file input; json reads JSON-lines natively (schema inferred or
    given as DDL via `schema`); csv honors `header`/`sep`.

    Every returned frame carries a `ts` event-time column: the
    reference stamps LogEvent.Timestamp at event creation
    (config/logevent/logevent.go NewLogEvent/@timestamp), so inputs
    whose payload has no time of its own (exec, redis drains, docker
    stats, ...) get read-time as the event time — downstream
    time-bucketed aggregates and %{+@...} templates always resolve.
    """
    df = _read_input_typed(spark, inp)
    from gogstash_spark import logevent

    if logevent.TS not in df.columns:
        from pyspark.sql import functions as F

        df = df.withColumn(logevent.TS, F.current_timestamp())
    return df


def _read_input_typed(spark: SparkSession, inp: dict) -> DataFrame:
    typ = inp.get("type", "parquet")
    if typ == "multi":
        # several inputs union into one frame (a gogstash config may
        # declare many inputs feeding the same filter chain)
        parts = [read_input(spark, sub) for sub in inp.get("inputs") or []]
        if not parts:
            raise ValueError("multi input with no inputs")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
    if typ == "exec":
        from gogstash_spark.sources.ingest import exec_input

        return exec_input(
            spark, inp["command"], inp.get("args"),
            message_trim=inp.get("message_trim", " \t\r\n"),
            message_prefix=inp.get("message_prefix", ""),
            message_type=inp.get("message_type", "text"),
        )
    if typ == "http":
        from gogstash_spark.sources.ingest import http_input

        return http_input(spark, inp["url"], method=inp.get("method", "GET"))
    if typ == "redis":
        from gogstash_spark.sources.ingest import redis_input

        host = inp.get("host", "localhost:6379")
        if isinstance(host, list):
            host = host[0]
        return redis_input(
            spark, host, key=inp.get("key", "gogstash"),
            timeout=float(inp.get("timeout", 5.0)),
            max_events=inp.get("max_events"),
        )
    if typ in ("dockerlog", "dockerstats"):
        # reference key names verbatim (input/dockerlog/
        # inputdockerlog.go:24-29, input/dockerstats/
        # inputdockerstats.go:24-29); interval keys are the daemon's
        # poll cadence — the batch analog is one drain per run,
        # scheduled externally like exec/http
        from gogstash_spark.sources.dockerapi import (
            dockerlog_input,
            dockerstats_input,
        )

        url = inp.get("dockerurl", "unix:///var/run/docker.sock")
        include = inp.get("include_patterns")
        exclude = inp.get("exclude_patterns", ("gogstash",))
        if typ == "dockerlog":
            return dockerlog_input(
                spark, url, include_patterns=include, exclude_patterns=exclude,
                sincepath=inp.get("sincepath"),
                start_position=inp.get("start_position", "beginning"),
            )
        return dockerstats_input(
            spark, url, include_patterns=include, exclude_patterns=exclude,
            log_mode=inp.get("log_mode", "full"),
        )
    if typ == "nats":
        # at-least-once pull-consume: jetstream:true selects it, an
        # EXPLICIT jetstream:false forces the core drain, and with the
        # key absent a stream/durable key implies it
        if inp.get("jetstream", bool(inp.get("stream") or inp.get("durable"))):
            from gogstash_spark.sources.ingest import nats_jetstream_input

            return nats_jetstream_input(
                spark, inp.get("host", "localhost:4222"),
                stream=inp.get("stream", "gogstash"),
                durable=inp.get("durable", "gogstash_spark"),
                batch=int(inp.get("batch", 512)),
                timeout=float(inp.get("timeout", 5.0)),
                idle_timeout=float(inp.get("idle_timeout", 1.0)),
                max_events=inp.get("max_events"),
            )
        from gogstash_spark.sources.ingest import nats_input

        return nats_input(
            spark, inp.get("host", "localhost:4222"),
            topic=inp.get("topic", "gogstash"),
            timeout=float(inp.get("timeout", 5.0)),
            idle_timeout=float(inp.get("idle_timeout", 1.0)),
            max_events=inp.get("max_events"),
        )
    if typ == "nsq":
        from gogstash_spark.sources.ingest import nsq_input

        return nsq_input(
            spark, inp["nsq"], inp["topic"],
            channel=inp.get("channel", "gogstash"),
            max_inflight=int(inp.get("max_inflight", 150)),
            timeout=float(inp.get("timeout", 5.0)),
            idle_timeout=float(inp.get("idle_timeout", 1.0)),
            max_events=inp.get("max_events"),
        )
    if typ == "lorem":
        from gogstash_spark.sources.ingest import lorem_input

        return lorem_input(
            spark, count=int(inp.get("count", 1000)), format=inp.get("format"),
            fields=inp.get("fields"), empty=bool(inp.get("empty", False)),
            seed=int(inp.get("seed", 42)),
        )
    path = inp.get("path")
    if not path:
        raise ValueError("spec.input.path required")
    if typ == "parquet":
        return spark.read.parquet(path)
    if typ == "orc":
        return spark.read.orc(path)
    if typ == "json":
        r = spark.read
        if inp.get("schema"):
            r = r.schema(inp["schema"])
        return r.json(path)
    if typ == "csv":
        return (
            spark.read.option("header", "true" if inp.get("header", True) else "false")
            .option("sep", inp.get("sep", ","))
            .option("inferSchema", "true" if inp.get("infer_schema", True) else "false")
            .csv(path)
        )
    if typ == "text":
        df = spark.read.text(path)
        codec = inp.get("codec", "default")
        if codec == "json":
            return codecs.decode_json(df, "value", inp.get("schema")).drop("value")
        if codec == "default":
            return codecs.decode_default(df, "value").drop("value")
        raise ValueError("unknown codec %r for text input" % codec)
    raise ValueError("unknown input type %r" % typ)
