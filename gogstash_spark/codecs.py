"""Codecs: de/serializers attached to sources and sinks
(reference config/codec.go:23-36).

- default: bytes/line -> text column (identity)           codec.go:123-192
- json:    event <-> JSON string                          codec/json/codecjson.go:37-138
- azureeventhubjson: envelope with a `records` array that explodes
  into N events                                           codec/azureeventhubjson/codecazureeventhubjson.go:37-91
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gogstash_spark import logevent


def decode_default(df: DataFrame, source: str = "value") -> DataFrame:
    """Raw line -> text (the `default` codec)."""
    return df.withColumn(logevent.TEXT, F.col(source).cast("string"))


def _parse_rfc3339(col: Column) -> Column:
    """RFC3339(Nano) -> timestamp: ISO cast handles fractional seconds
    (nanos truncate to micros, matching Go time round-tripped at micro
    precision in parquet)."""
    return F.coalesce(F.try_to_timestamp(col), col.try_cast("timestamp"))


def decode_json(df: DataFrame, source: str = "value", schema: str | None = None) -> DataFrame:
    """JSON line -> typed columns; the reserved fields lift into the
    event struct (reference codec/json/codecjson.go:111-138):
    `message` -> text, `@timestamp` (RFC3339Nano) -> ts, `tags` merges
    into the event tags. Everything else becomes its own column (typed
    mode) or stays in the `extra` map (schemaless mode)."""
    sch = schema or "map<string,string>"
    parsed = F.from_json(F.col(source).cast("string"), sch)
    df = df.withColumn("__c", parsed)
    if schema:
        inner = df.select(F.col("__c.*")).columns
        cols: dict[str, Column] = {}
        for c in inner:
            v = F.col("__c")[c]
            if c == "@timestamp":
                cols[logevent.TS] = _parse_rfc3339(v.cast("string"))
            elif c == "message":
                cols[logevent.TEXT] = v.cast("string")
            elif c == logevent.TAGS and logevent.TAGS in df.columns:
                cols[logevent.TAGS] = F.array_union(
                    logevent.tags_col(df), F.coalesce(v, F.array().cast("array<string>"))
                )
            else:
                cols[c] = v
        df = df.withColumns(cols)
    else:
        m = F.col("__c")
        df = df.withColumn(
            "extra", F.map_filter(m, lambda k, v: ~k.isin("message", "@timestamp"))
        )
        df = df.withColumn(
            logevent.TEXT,
            F.coalesce(
                m["message"],
                F.col(logevent.TEXT) if logevent.TEXT in df.columns
                else F.lit(None).cast("string"),
            ),
        )
        df = df.withColumn(
            logevent.TS,
            F.coalesce(
                _parse_rfc3339(m["@timestamp"]),
                F.col(logevent.TS) if logevent.TS in df.columns
                else F.lit(None).cast("timestamp"),
            ),
        )
    return df.drop("__c")


def encode_json(df: DataFrame, exclude: list[str] | None = None) -> DataFrame:
    """Event -> JSON string column `encoded`; @timestamp rendered UTC
    (reference config/logevent/logevent.go:120-137 forces UTC)."""
    cols = [c for c in df.columns if c not in (exclude or [])]
    struct_cols: list[Column] = []
    for c in cols:
        if c == logevent.TS:
            struct_cols.append(
                F.date_format(F.col(c), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("@timestamp")
            )
        elif c == logevent.TEXT:
            struct_cols.append(F.col(c).alias("message"))
        else:
            struct_cols.append(F.col(c))
    return df.withColumn("encoded", F.to_json(F.struct(*struct_cols)))


def decode_azureeventhubjson(
    df: DataFrame, source: str = "value", record_schema: str = "map<string,string>"
) -> DataFrame:
    """Event Hub envelope: {"records": [e1, e2, ...]} -> one row per
    record (reference codec/azureeventhubjson explodes the array)."""
    env = F.from_json(
        F.col(source).cast("string"), "struct<records:array<%s>>" % record_schema
    )
    return (
        df.withColumn("__rec", F.explode(env["records"]))
        .withColumn("record", F.col("__rec"))
        .drop("__rec")
    )
