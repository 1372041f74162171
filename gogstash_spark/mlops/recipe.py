"""End-to-end training-data curation recipe: the composition a real
pretraining run executes over the raw corpus —

    repetition filter  ->  exact-dedup keep-one  ->
    benchmark decontamination  ->  stratified mix sampling  ->
    sequence packing

Each stage is one of this package's hash-verified primitives
(textops.repetition_signals, dedup.collapse_exact_texts,
textops.contamination, sampling.stratified_sample,
packing.pack_sequences); this module only composes them, so the chain
inherits their scale shapes: the repetition gate and decontamination
are codegen filters + broadcast joins, and the corpus crosses a hash
exchange exactly twice — once for the exact-dedup groupBy(md5(text))
keep-one, once for packing's 256-way shard-partitioned prefix-sum
window.

The full chain is restated as one chained-CTE DuckDB oracle in
tests/test_recipe.py (rows+schema+value-hash, same rigor as the
driver's correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gogstash_spark.mlops.dedup import collapse_exact_texts
from gogstash_spark.mlops.packing import pack_sequences
from gogstash_spark.mlops.sampling import stratified_sample
from gogstash_spark.mlops.textops import contamination, repetition_signals


def curate_mix(
    df: DataFrame,
    bench_df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 2048,
    seed: int = 42,
    pack_seed: int | None = None,
    max_dup_2gram_frac: float = 0.2,
    max_dup_line_frac: float = 0.3,
    contamination_ngram: int = 8,
    default_rate: float = 0.0,
) -> DataFrame:
    """Run the curation chain and return one row per SURVIVING document
    with its packed-stream position: (id, stratum, n_tokens,
    tok_offset, seq_id, seq_last, n_seqs).

    Order of operations matters and mirrors practice: quality and
    decontamination filters run BEFORE mix sampling (so keep rates
    apply to the clean pool, not the raw one), and packing runs last
    (offsets are over the final surviving set, so the training stream
    has no holes where dropped documents used to be).
    """
    # Gopher-style boilerplate gate: duplicate LINES and duplicate word
    # 2-GRAMS discriminate spam; raw duplicate-word fraction does not
    # (natural English sits at ~0.5 from stopword repetition — measured
    # median 0.54 / p99 0.71 on the synthetic documents table)
    rep = repetition_signals(df, text_col=text_col)
    kept = rep.where(
        (F.col("dup_2gram_frac") < max_dup_2gram_frac)
        & (F.col("dup_line_frac") < max_dup_line_frac)
    )
    # exact-dedup keep-one (min id per md5(text), representative's
    # stratum carried): one hash groupBy; a million-way boilerplate
    # cluster contributes ONE doc to the mix instead of skewing it
    kept = collapse_exact_texts(
        kept, text_col=text_col, id_col=id_col, keep_cols=[strata_col]
    )
    clean = contamination(
        kept, bench_df, text_col=text_col, id_col=id_col, n=contamination_ngram
    ).where(~F.col("contaminated"))
    mixed = stratified_sample(
        clean, rates, strata_col, key_col=id_col, seed=seed, default_rate=default_rate
    )
    # the pack order MUST ride a different draw than the sample filter:
    # stratified_sample keeps exactly the ids whose md5(id:seed) prefix
    # sorts below the stratum threshold, so packing by the same key
    # would put every low-rate stratum's survivors at the FRONT of the
    # training stream (a rate-0.25 stratum would appear only in the
    # first quarter) instead of mixing uniformly along it
    return pack_sequences(
        mixed,
        capacity=capacity,
        text_col=text_col,
        id_col=id_col,
        seed=seed + 1 if pack_seed is None else pack_seed,
        carry_cols=[strata_col],
    )
