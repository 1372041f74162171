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


def select_top_fraction(
    df: DataFrame,
    frac: float,
    score_col: str = "quality",
    approx: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Quality gate: keep rows whose score reaches the corpus's
    (1-frac) quantile — "train on the best 30% by LM score" (the
    CCNet/FineWeb-style percentile cut). Rows TIED at the threshold all
    survive, so the kept fraction is >= frac under ties.

    approx=True (default, the 100 TB path) computes the threshold with
    percentile_approx — bounded-memory sketch, codegen, mergeable
    across partitions. approx=False uses the exact interpolated
    percentile, which buffers every value in the aggregation buffer —
    fine for validation/parity runs, NOT for 10^12 rows.

    The threshold rides a broadcast of the 1-row aggregate into the
    filter — one plan, no driver collect, the corpus is scanned twice
    (once to aggregate the score, once to filter) unless the caller
    persists upstream.

    The threshold is quantized to 1e-9 before the cut: interpolating
    quantiles disagree across engines by 1 ulp even between two EQUAL
    neighbors (DuckDB's (1-g)*a + g*b vs Spark's a + g*(b-a) — measured
    on the quality score, 0.88 vs 0.8800000000000001, flipping every
    tied row), and scores are 1e-6-rounded upstream, so nanoscale
    threshold noise can only ever misclassify exact ties.
    """
    if frac >= 1.0:
        return df
    s = F.col(score_col).cast("double")
    if frac <= 0.0:
        return df.where(F.lit(False))
    q = 1.0 - frac
    thr_expr = (
        F.percentile_approx(s, F.lit(q), F.lit(int(accuracy)))
        if approx
        else F.percentile(s, F.lit(q))
    )
    thr = df.agg(F.round(thr_expr, 9).alias("__thr"))
    return df.join(F.broadcast(thr)).where(s >= F.col("__thr")).drop("__thr")


def upsample_mix(
    df: DataFrame,
    epochs: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
    default_epochs: float = 1.0,
) -> DataFrame:
    """Epoch-weighted mix replication: repeat each row its stratum's
    epoch count, fractional part resolved per row deterministically.
    Real pretraining mixes run curated sources for MORE than one epoch
    (Wikipedia/books at 2-3x in the LLaMA and Gopher mixes) while
    web text runs under one — a mix stage must express both, and
    stratified_sample only goes down.

    A row in a stratum with e epochs appears floor(e) times, plus once
    more iff its md5 draw sorts below frac(e) — so e=2.4 means every
    row twice and a deterministic 40% of rows a third time, and e<1
    degenerates to stratified_sample's keep-or-drop. Copies are
    distinguished by an `epoch` column (0-based) and a ready-made
    unique `copy_id` (key ":" epoch) for downstream stages that key on
    id — packing a mix MUST use copy_id, or the second epoch of a doc
    silently collides with the first.

    Scale shape: epoch dicts are plan-time CASE WHEN literals and the
    replication is explode(sequence(...)) — a narrow codegen
    projection evaluated at the scan, no join, no shuffle, no RNG
    state; output size is exactly sum over strata of n_s * e_s.
    """
    import math

    u = sample_key(key_col, seed)
    full: Column = F.lit(int(math.floor(default_epochs)))
    thr: Column = F.lit(_hex_threshold(default_epochs - math.floor(default_epochs)))
    for stratum, e in epochs.items():
        if e < 0:
            raise ValueError("epochs must be >= 0, got %r for %r" % (e, stratum))
        match = F.col(strata_col) == F.lit(stratum)
        full = F.when(match, F.lit(int(math.floor(e)))).otherwise(full)
        thr = F.when(
            match, F.lit(_hex_threshold(e - math.floor(e)))
        ).otherwise(thr)
    n = full + (u < thr).cast("int")
    return (
        df.withColumn("__n", n)
        # the filter must precede the sequence: sequence(0, -1) steps
        # DOWN by default and would fabricate two phantom copies
        .where(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
        .withColumn(
            "copy_id",
            F.concat_ws(":", F.col(key_col).cast("string"), F.col("epoch")),
        )
    )


def mixture_weights(
    df: DataFrame,
    target: dict[str, float],
    budget_tokens: float,
    strata_col: str = "source",
    text_col: str = "text",
    max_epochs: float = 5.0,
) -> DataFrame:
    """Solve a data-mix recipe: given a target mixture (relative
    weights by source) and a total token budget, compute per-source
    epoch counts — the planning stage whose output feeds upsample_mix
    / stratified_sample. Per source:

    - avail_tokens: what the corpus holds (whitespace tokens)
    - target_frac: normalized share of the budget
    - desired_tokens = budget * target_frac
    - epochs = desired/avail, CAPPED at max_epochs (data-constrained
      scaling: repeating a small curated source 40x is memorization,
      not mixture — the cap is the recipe's honesty knob)
    - achieved_tokens = min(desired, avail * max_epochs), and
      deficit_tokens = desired - achieved: a nonzero deficit is the
      loud signal that the target mixture is infeasible at this budget
      (never silently renormalized — the caller decides whether to
      shift budget or relax the cap)

    Sources in the corpus but not the target get frac 0 (explicitly
    excluded); sources in the target but ABSENT from the corpus still
    get a row (n_docs 0, full deficit) — a typo'd source name must
    surface as an infeasible row, not vanish.

    Scale shape: ONE map-side-combinable groupBy(source) token count
    over the corpus; the solve itself is column arithmetic on the
    n_sources-row aggregate, full-outer-joined with the plan-time
    target literals. Nothing here scales with corpus size except the
    one count pass.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0, got %r" % budget_tokens)
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0, got %r" % max_epochs)
    if any(w < 0 for w in target.values()):
        raise ValueError("target weights must be >= 0: %r" % target)
    wsum = float(sum(target.values()))
    if wsum <= 0:
        raise ValueError("target weights sum to 0: %r" % target)
    from .textops import ws_token_len

    avail = df.groupBy(F.col(strata_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_len(F.col(text_col))).alias("avail_tokens"),
    )
    tgt = df.sparkSession.createDataFrame(
        [(s, float(w) / wsum) for s, w in sorted(target.items())],
        "source string, target_frac double",
    )
    j = avail.join(tgt, "source", "full_outer").select(
        "source",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("avail_tokens", F.lit(0)).cast("long").alias("avail_tokens"),
        F.round(F.coalesce("target_frac", F.lit(0.0)), 6).alias("target_frac"),
        (F.lit(float(budget_tokens)) * F.coalesce("target_frac", F.lit(0.0))).alias(
            "__desired"
        ),
    )
    av = F.col("avail_tokens").cast("double")
    achieved = F.when(
        av > 0, F.least(F.col("__desired"), av * F.lit(float(max_epochs)))
    ).otherwise(F.lit(0.0))
    return j.select(
        "source",
        "n_docs",
        "avail_tokens",
        "target_frac",
        F.round("__desired", 6).alias("desired_tokens"),
        F.round(
            F.when(av > 0, F.least(F.col("__desired") / av, F.lit(float(max_epochs))))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("epochs"),
        F.round(achieved, 6).alias("achieved_tokens"),
        F.round(F.col("__desired") - achieved, 6).alias("deficit_tokens"),
        (F.round(F.col("__desired") - achieved, 6) <= 0).alias("feasible"),
    )


def score_buckets(
    df: DataFrame,
    fractions: list[float],
    labels: list[str],
    score_col: str = "ppl",
    approx: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Label every row with its corpus quantile band of `score_col` —
    the CCNet head/middle/tail split (perplexity terciles: fractions
    [1/3, 2/3], labels ['head','middle','tail']) that downstream mix
    recipes sample at different rates. Band k holds rows with
    cut[k-1] < score <= cut[k] (first band: score <= cut[0]; last band:
    everything above the final cut), so with ppl ascending the FIRST
    label is the best-likelihood band, matching CCNet's naming.

    Scale shape: ONE aggregate computes every cut (percentile_approx
    takes an array of fractions — one mergeable sketch pass, the 100 TB
    path; approx=False = exact interpolated percentiles for
    validation/parity), the 1-row cut vector broadcasts into a codegen
    CASE chain — no sort, no window, no shuffle of the corpus. Cuts are
    quantized to 1e-9 (the select_top_fraction cross-engine-interpolation
    argument; scores are 1e-6-rounded upstream).
    """
    if len(fractions) + 1 != len(labels):
        raise ValueError(
            "need len(labels) == len(fractions)+1, got %d fractions / %d labels"
            % (len(fractions), len(labels))
        )
    if sorted(fractions) != list(fractions) or not all(
        0.0 < f < 1.0 for f in fractions
    ):
        raise ValueError("fractions must be ascending in (0,1): %r" % (fractions,))
    s = F.col(score_col).cast("double")
    fr = F.array(*[F.lit(float(f)) for f in fractions])
    pct = (
        F.percentile_approx(s, fr, F.lit(int(accuracy)))
        if approx
        else F.percentile(s, fr)
    )
    cuts = df.agg(
        F.transform(pct, lambda c: F.round(c, 9)).alias("__cuts")
    )
    bucket: Column = F.lit(labels[-1])
    for i in range(len(fractions) - 1, -1, -1):
        bucket = F.when(
            s <= F.element_at(F.col("__cuts"), i + 1), F.lit(labels[i])
        ).otherwise(bucket)
    # a NULL score is UNSCORED, not worst: every `when` above is NULL
    # (falsy) for it, so without this guard it would silently fall
    # through to the last band and inherit that band's sampling fate
    bucket = F.when(s.isNotNull(), bucket)
    return (
        df.join(F.broadcast(cuts))
        .withColumn("score_bucket", bucket)
        .drop("__cuts")
    )


def weighted_sample(
    df: DataFrame,
    rate_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-row keep probability from a COLUMN (continuous importance
    sampling — e.g. a quality score mapped to a keep rate, or
    mixture_weights' epochs joined back as fractional rates), where
    stratified_sample's plan-time CASE literals only cover discrete
    strata. Keep iff the row's md5 draw (first 4 hex as an integer /
    65536 — granularity 1/65536, same as _hex_threshold) falls below
    the clamped rate. Deterministic in (key, seed): rerun/repartition/
    engine-stable; NULL rates drop the row (an unscored row has no
    sampling mandate — surface it upstream, don't silently keep).

    Pure codegen filter at the scan — conv() turns the hex prefix into
    the integer draw, no join, no shuffle, no RNG state.
    """
    u = F.conv(F.substring(sample_key(key_col, seed), 1, 4), 16, 10).cast(
        "double"
    ) / F.lit(65536.0)
    r = F.least(F.greatest(F.col(rate_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.where(u < r)
