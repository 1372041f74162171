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
    """
    typ = inp.get("type", "parquet")
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
