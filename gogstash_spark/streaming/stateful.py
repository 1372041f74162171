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


def sessionize_stream(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    gap_seconds: int = 1800,
    timeout_duration: str | None = None,
) -> DataFrame:
    """Streaming twin of functions.sessions.sessionize: inactivity-gap
    session assignment with per-key state carried ACROSS microbatches —
    (last event time, current session index) per conv_id, so a
    conversation that pauses between batches and resumes within the gap
    keeps its session_idx, and one that pauses longer starts the next.

    Rows inside a batch are ordered (ts, order_col) like the batch
    window. ACROSS batches the state is an assignment cursor, not an
    aggregation, so the late-data semantics are pinned as: an event
    arriving in a later microbatch with ts at or before the key's
    cursor JOINS the key's current session (it can never renumber
    already-emitted rows), and the cursor never rewinds — max(cursor,
    ts) — so a late straggler cannot re-open the gap window and split
    the session for subsequent in-order events
    (tests/test_streaming.py::test_late_cross_batch_event_joins_current_session).
    On in-order data this equals the batch window sessionize
    row-for-row (the oracle-checked property). timeout_duration
    bounds state for dead conversations; an evicted key restarts at
    session_idx 0 (documented windowed-state tradeoff, exactly like
    dedup_stream)."""
    from pyspark.sql.functions import lit
    from pyspark.sql.streaming.state import GroupStateTimeout

    import pandas as pd

    out_schema = (
        df.withColumn("session_idx", lit(0).cast("long"))
        .withColumn("session_id", lit("").cast("string"))
        .schema
    )
    gap_us = int(gap_seconds) * 1_000_000

    def assign(key, pdfs, state):
        if timeout_duration is not None and state.hasTimedOut:
            state.remove()
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values([ts_col, order_col], kind="mergesort")
        last_us, idx = state.get if state.exists else (None, -1)
        ts_us = (batch[ts_col].astype("int64") // 1000).tolist()  # ns -> us
        out_idx = []
        for t in ts_us:
            if last_us is None or (t - last_us) > gap_us:
                idx += 1
            # never rewind: a late cross-batch event joins the current
            # session but must not re-open the inactivity window
            last_us = t if last_us is None else max(last_us, t)
            out_idx.append(idx)
        batch["session_idx"] = pd.array(out_idx, dtype="int64")
        batch["session_id"] = [
            "%s#%d" % (key[0], i) for i in out_idx
        ]
        state.update((int(last_us), int(idx)))
        if timeout_duration is not None:
            state.setTimeoutDuration(timeout_duration)
        yield batch

    mode = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_duration is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        assign, out_schema, "last_us long, idx long", "append", mode
    )
