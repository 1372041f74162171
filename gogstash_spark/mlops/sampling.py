"""Deterministic sampling for training-data mixes.

A data-mix recipe ("keep 100% of lang=en code, 30% of web text, 5% of
boilerplate") must be reproducible across engines, retries, and
cluster sizes — Spark's df.sample() is none of those (partition-seeded
RNG). Here a row's fate is a pure function of its key: keep iff the
first 4 hex digits of md5(key ":" seed) sort below the stratum's hex
threshold. String comparison on lowercase hex is engine-portable (the
same idiom the simhash oracle uses for hex digits), granularity is
1/65536, and the plan is a pure FILTER — no shuffle, no RNG state,
pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """4-hex-digit threshold t such that P(md5_prefix < t) == rate
    (granularity 1/65536). rate>=1 keeps everything: 'g' sorts after
    every hex digit, so u < 'g' is always true."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0000"
    return format(int(rate * 65536), "04x")


def sample_key(key_col: str, seed: int = 42) -> Column:
    """The per-row uniform draw: first 4 hex chars of md5(key ':' seed)."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed)))),
        1,
        4,
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    rates maps stratum value -> keep rate in [0,1]; strata absent from
    the dict get default_rate. The decision depends only on
    (key, seed, stratum rate) — rerunning, repartitioning, or moving
    engines yields the SAME sample, and two samples with different
    seeds are independent. Strata dicts are plan-time literals
    (CASE WHEN chain), so keep rates never need a join; at 100 TB this
    whole op is a codegen filter evaluated at the parquet scan.
    """
    u = sample_key(key_col, seed)
    thr: Column = F.lit(_hex_threshold(default_rate))
    for stratum, rate in rates.items():
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(u < thr)
