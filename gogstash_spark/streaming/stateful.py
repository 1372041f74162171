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
    timeout_duration: str | None = None,
) -> DataFrame:
    """First-event-per-key across microbatches.

    State is one flag per key, hash-partitioned by Spark's state store —
    at 1000 executors the state shards with the keys, nothing
    centralizes. `timeout_duration` (e.g. '1 day') bounds state size for
    unbounded key spaces: an expired key's state is removed, so a later
    replay of that key emits again (windowed dedup — the tradeoff every
    bounded-state dedup makes). None keeps keys forever (exact dedup).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = df.schema

    def first_per_key(key, pdfs, state):
        if timeout_duration is not None and state.hasTimedOut:
            state.remove()  # expired: the key may emit again later
            return
        if state.exists:
            for _ in pdfs:  # drain: key already emitted in a prior batch
                pass
            if timeout_duration is not None:
                state.setTimeoutDuration(timeout_duration)  # refresh window
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((1,))
        if timeout_duration is not None:
            state.setTimeoutDuration(timeout_duration)
        if first is not None:
            yield first

    mode = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_duration is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        first_per_key, out_schema, "seen int", "append", mode
    )
