"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-process state (ratelimit token bucket, sincedb
offsets); the streaming analog is keyed state managed by Structured
Streaming — exactly-once, checkpointed, partitioned by key. The
flagship op here is cross-microbatch dedup: emit the FIRST event per
key ever seen, drop replays — the streaming form of the elastic
document_id idempotency (outputs.py / outputelastic.go:199-202).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    timeout: str = "NoTimeout",
) -> DataFrame:
    """First-event-per-key across ALL microbatches.

    State is one flag per key, hash-partitioned by Spark's state store —
    at 1000 executors the state shards with the keys, nothing
    centralizes. `timeout='ProcessingTimeTimeout'` + state.setTimeoutDuration
    would bound state size for unbounded key spaces (doc-id dedup over a
    day's window); NoTimeout keeps keys forever (exact dedup).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = df.schema

    def first_per_key(key, pdfs, state):
        if state.exists:
            for _ in pdfs:  # drain: key already emitted in a prior batch
                pass
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((1,))
        if first is not None:
            yield first

    mode = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout == "ProcessingTimeTimeout"
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        first_per_key, out_schema, "seen int", "append", mode
    )
