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


def decode_json(df: DataFrame, source: str = "value", schema: str | None = None) -> DataFrame:
    """JSON line -> typed columns; lifts message/@timestamp/tags when
    present (reference codec/json/codecjson.go:111-138)."""
    sch = schema or "map<string,string>"
    parsed = F.from_json(F.col(source).cast("string"), sch)
    df = df.withColumn("__c", parsed)
    if schema:
        inner = df.select(F.col("__c.*")).columns
        df = df.withColumns({c: F.col("__c")[c] for c in inner})
    else:
        df = df.withColumn("extra", F.col("__c"))
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
