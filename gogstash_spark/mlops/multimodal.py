"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract run as Arrow-batched pandas iterators
(mapInPandas) so each Python batch touches a whole Arrow record batch,
never a row at a time. The actual image/audio codecs are NOT in this
container — the decode step is stubbed behind NotImplementedError with
a deterministic fake (documented), while the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, head_hex string, "
    "modality string, fake_dim double"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the
    opaque payload + a typed metadata struct (what an image/audio
    ingest would carry)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.lit("synthetic").alias("source"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_image(payload: bytes) -> object:
    """Real decode requires an image codec (PIL/libjpeg) not present in
    this container."""
    raise NotImplementedError(
        "image decode stub: install PIL/opencv on the cluster image; "
        "extract_features uses a deterministic fake instead"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic fake 'feature': byte length, first-8-bytes hex, and
    a fake scalar derived from the byte length — stands in for a real
    decoder+model while keeping the distributed plumbing honest.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payload.map(len).astype("int64"),
                    "head_hex": payload.map(lambda b: bytes(b[:8]).hex()),
                    "modality": pdf["meta"].map(lambda m: m["mime"]),
                    "fake_dim": payload.map(len).astype("float64") % 7.0,
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(op, FEATURE_SCHEMA)
