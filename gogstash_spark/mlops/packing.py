"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic shuffled order and cut the token stream every `capacity`
tokens ("concat-and-chunk" packing — the standard way training
pipelines turn variable-length documents into fixed-length sequences
with zero padding waste; documents crossing a boundary are split
across consecutive sequences).

The whole op reduces to a global token prefix-sum over a deterministic
total order. A naive window over the corpus would funnel 100 TB
through ONE task (Exchange SinglePartition), so the prefix-sum is
two-level:

  1. order key = md5(doc_id ":" seed) — the deterministic shuffle a
     training run wants anyway; its first 2 hex chars define 256
     shards whose lexicographic ranges tile the global order, so
     (shard, key) ascending IS the global order.
  2. per-shard token subtotals -> a 256-row frame; the only
     single-partition window in the plan runs over those 256 rows.
  3. shard start offsets broadcast-join back; a window PARTITIONED BY
     shard (256-way parallel) adds the within-shard prefix.

Every expression is codegen (md5/substring/split/size + two window
sums); no UDFs, no RNG, rerun/repartition/engine-stable — the same
arithmetic runs in the DuckDB oracle as one ORDER BY window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gogstash_spark.mlops.textops import ws_token_len  # noqa: F401  (re-export; packing callers import it from here)


def shuffle_key(id_col: str, seed: int) -> Column:
    """The md5 hex draw used as the reproducible global training order
    (ORDER BY key, id). Same md5(id ':' seed) idiom as
    sampling.sample_key — but pack callers must use a seed INDEPENDENT
    of any sampling seed applied upstream: a stratified sample keeps
    exactly the keys below its rate threshold, so ordering by the SAME
    draw would concentrate every low-rate stratum at the front of the
    stream instead of mixing uniformly."""
    return F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))


def pack_sequences(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    carry_cols: list[str] | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign each document its slice of the packed token stream.
    Pass n_tokens_col to pack rows whose token counts are already
    computed (e.g. per-conversation totals) instead of tokenizing
    text_col.

    Adds: n_tokens (whitespace tokens), tok_offset (global start
    position in the concatenated stream under the seeded shuffle
    order), seq_id (first training sequence the doc lands in =
    tok_offset // capacity), seq_last (last sequence it spans),
    n_seqs (how many sequences the doc is split across; empty docs
    occupy a point -> 1).

    Scale shape (100 TB): one narrow projection computes key + length;
    the 256-row shard-totals frame is the ONLY thing that ever sits in
    a single partition; the corpus itself sees one hash exchange on
    `_shard` (256-way) for the partitioned window and a broadcast join
    of the offsets. No global sort, no SinglePartition window over
    data, no UDFs.
    """
    key = shuffle_key(id_col, seed)
    # t feeds TWO plan branches (the shard-totals aggregate and the
    # window side of the join); persist so the upstream lineage — in a
    # curation chain, the whole filter/sample pipeline — runs once per
    # action, not twice. The frame is narrow (id + carry + key + len).
    t = df.select(
        id_col,
        *(carry_cols or []),
        key.alias("_key"),
        F.substring(key, 1, 2).alias("_shard"),
        (
            F.col(n_tokens_col).cast("long")
            if n_tokens_col
            else ws_token_len(F.col(text_col))
        ).alias("n_tokens"),
    ).persist()

    shard_offsets = (
        t.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("_shard_total"))
        .withColumn(
            "_shard_offset",
            F.coalesce(
                F.sum("_shard_total").over(
                    Window.orderBy("_shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_shard_total")
    )

    within = Window.partitionBy("_shard").orderBy("_key", id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        t.join(F.broadcast(shard_offsets), "_shard")
        .withColumn(
            "tok_offset",
            F.col("_shard_offset") + F.coalesce(F.sum("n_tokens").over(within), F.lit(0)),
        )
        .withColumn("seq_id", F.floor(F.col("tok_offset") / capacity))
        .withColumn(
            "seq_last",
            F.floor(
                (F.col("tok_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / capacity
            ),
        )
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_id") + 1)
        .drop("_key", "_shard", "_shard_offset")
    )
    return out


def token_budget_subset(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Draw documents in the seeded shuffle order until `budget` tokens
    — how a training run cuts "the first 10B tokens of the mix" out of
    a larger corpus, reproducibly. Keeps every doc whose slice of the
    concatenated stream STARTS inside the budget; the one doc
    straddling the boundary is clipped (`n_tokens_used` < `n_tokens`),
    so sum(n_tokens_used) == min(budget, corpus tokens) exactly.
    Zero-token docs whose offset lands inside the budget pass through
    contributing nothing (same point-occupancy rule as pack_sequences).

    Scale shape: identical to pack_sequences — the budget is applied as
    a codegen filter on the global prefix-sum offset (two-level, 256
    shards); no global sort, no SinglePartition window over data.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1, got %r" % budget)
    packed = pack_sequences(
        df, capacity=int(budget), text_col=text_col, id_col=id_col,
        seed=seed, carry_cols=carry_cols,
    )
    return (
        packed.where(F.col("tok_offset") < budget)
        .withColumn(
            "n_tokens_used",
            F.least(F.col("n_tokens"), F.lit(int(budget)) - F.col("tok_offset"))
            .cast("long"),
        )
        .drop("seq_id", "seq_last", "n_seqs")
    )


def pack_manifest(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """The per-sequence composition a training job consumes: one row
    per (sequence, document-slice) with

      seq_id     — the training sequence,
      doc_id     — the document contributing tokens,
      doc_start / doc_end — the contributed token range WITHIN the doc
                   (0-based, inclusive),
      seq_start  — where that slice begins WITHIN the sequence.

    A sequence's rows, ordered by seq_start, reconstruct it exactly;
    a split doc appears once per spanned sequence. Empty/blank docs
    contribute no tokens and are EXCLUDED — an empty doc whose offset
    lands on a capacity boundary would otherwise mint a phantom
    sequence id one past the real stream. Built by exploding each
    doc's [seq_id..seq_last] span from pack_sequences — spans are
    ceil(L/capacity)+1 at most, so the explode multiplies rows by ~1,
    not by sequence length. No extra shuffle beyond pack_sequences.
    """
    return manifest_from_packed(
        pack_sequences(df, capacity, text_col=text_col, id_col=id_col, seed=seed),
        capacity,
        id_col=id_col,
    )


def manifest_from_packed(
    packed: DataFrame, capacity: int, id_col: str = "doc_id"
) -> DataFrame:
    """pack_manifest over an ALREADY-packed frame (the pack_sequences
    output, possibly materialized) — callers needing both the packed
    frame and the manifest must not pay the prefix-sum twice."""
    s = F.col("s")
    o = F.col("tok_offset")
    L = F.col("n_tokens")
    return (
        packed.where(F.col("n_tokens") > 0)
        .select(
            id_col,
            "tok_offset",
            "n_tokens",
            F.explode(F.sequence(F.col("seq_id"), F.col("seq_last"))).alias("s"),
        )
        .select(
            s.alias("seq_id"),
            F.col(id_col),
            F.greatest(s * capacity - o, F.lit(0)).cast("long").alias("doc_start"),
            F.least(L - 1, (s + 1) * capacity - 1 - o).cast("long").alias("doc_end"),
            F.greatest(o - s * capacity, F.lit(0)).cast("long").alias("seq_start"),
        )
    )


def sft_mask_manifest(
    turns: DataFrame,
    capacity: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    train_role: str = "assistant",
    seed: int = 42,
) -> DataFrame:
    """The loss-mask manifest an SFT trainer consumes: pack whole
    conversations into fixed-capacity training sequences, then emit one
    row per (sequence, turn-slice) with

      seq_id, conv_id, turn_idx, role,
      tok_start / tok_end — the slice WITHIN the sequence (0-based,
                   inclusive; a turn split across sequences appears
                   once per sequence),
      loss_mask  — true iff role == train_role (train on assistant
                   tokens, mask user/tool context — the standard
                   assistant-only SFT objective).

    A sequence's rows, ordered by tok_start, tile it exactly (the
    pack_manifest invariant, inherited); conversations never interleave
    turns within a sequence because the conversation is the packing
    unit — its turns occupy one contiguous slice per sequence.

    Scale shape: ONE window partitioned by conv_id (turn prefix sums —
    partitions bounded by conversation length), ONE groupBy(conv_id)
    for totals, pack_sequences' two-level prefix sum over the
    conversation frame (corpus/mean-turns rows), then ONE equi-join of
    the manifest back to turns on conv_id. Zero-token turns carry no
    trainable slice and are excluded.
    """
    n = ws_token_len(F.col(text_col))
    tt = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        n.alias("n_turn_tokens"),
    ).withColumn(
        "turn_off",
        F.coalesce(
            F.sum("n_turn_tokens").over(
                Window.partitionBy("conv_id")
                .orderBy("turn_idx")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    conv = tt.groupBy("conv_id").agg(F.sum("n_turn_tokens").alias("n_tokens"))
    packed = pack_sequences(
        conv, capacity, id_col="conv_id", seed=seed, n_tokens_col="n_tokens"
    )
    man = manifest_from_packed(packed, capacity, id_col="conv_id")
    j = man.join(tt.where(F.col("n_turn_tokens") > 0), "conv_id")
    turn_end = F.col("turn_off") + F.col("n_turn_tokens") - 1
    ov_start = F.greatest(F.col("turn_off"), F.col("doc_start"))
    ov_end = F.least(turn_end, F.col("doc_end"))
    return j.where(ov_start <= ov_end).select(
        "seq_id",
        "conv_id",
        "turn_idx",
        "role",
        (F.col("seq_start") + ov_start - F.col("doc_start")).cast("long").alias(
            "tok_start"
        ),
        (F.col("seq_start") + ov_end - F.col("doc_start")).cast("long").alias(
            "tok_end"
        ),
        (F.col("role") == F.lit(train_role)).alias("loss_mask"),
    )
