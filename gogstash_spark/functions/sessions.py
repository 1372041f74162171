"""Sessionization: segment a keyed event stream by inactivity gap.

The classic log-pipeline derived dimension (logstash 'aggregate'
plugins / web sessionization): a new session starts when the gap since
the key's previous event exceeds `gap_seconds`. One shuffle on the key;
the lag/cumsum windows run within partitions — at 10^12 turns the cost
is the same single shuffle the per-sink aggregates already pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds `session_idx` (0-based per key) and `session_id`
    ('<key>#<idx>'). Ordering is (ts, order_col) so ties are stable —
    the per-turn-equality invariant the north rule pins."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # parquet event times are TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    new_sess = (
        prev_ts.isNull()
        | ((us(F.col(ts_col)) - us(prev_ts)) > F.lit(gap_seconds) * F.lit(1_000_000))
    ).cast("long")
    sess_idx = (
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.lit(1)
    )
    return df.withColumn("session_idx", sess_idx).withColumn(
        "session_id", F.concat_ws("#", F.col(key_col), F.col("session_idx"))
    )
