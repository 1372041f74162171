"""Runnable tour of the training-data ops over the documents table:

    python examples/curate_documents.py [sf_dir]

Chains the verified primitives the way a pretraining data job would —
quality/repetition gate -> exact dedup -> decontamination -> stratified
mix -> sequence packing -> trainer manifest — then shows the
standalone analytics (LM perplexity, repeated-substring spans,
embedding PCA). Each op's correctness story lives in tests/ (DuckDB
hash-parity or numpy exactness); this file is the API walkthrough.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from gogstash_spark.mlops.ann import semantic_dedup  # noqa: E402
from gogstash_spark.mlops.dedup import repeated_substring_spans  # noqa: E402
from gogstash_spark.mlops.packing import (  # noqa: E402
    manifest_from_packed,
    pack_sequences,
    token_budget_subset,
)
from gogstash_spark.mlops.pca import pca_apply, pca_train  # noqa: E402
from gogstash_spark.mlops.recipe import curate_mix  # noqa: E402
from gogstash_spark.mlops.sampling import select_top_fraction, upsample_mix  # noqa: E402
from gogstash_spark.mlops.textops import lm_perplexity, quality_score, unigram_lm  # noqa: E402
from gogstash_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curate_documents")
    docs = spark.read.parquet(sf_dir + "/documents.parquet")

    # the benchmark set to decontaminate against (stand-in: every 37th doc)
    bench = docs.where(F.col("doc_id") % 37 == 0)

    packed = curate_mix(
        docs,
        bench,
        rates={"src0": 0.5, "src1": 0.25, "src2": 1.0},
        strata_col="source",
        capacity=2048,
        default_rate=0.05,
    )
    kept = packed.count()
    print("curated docs kept: %d of %d" % (kept, docs.count()))
    manifest = manifest_from_packed(packed, capacity=2048)
    print("trainer manifest rows:", manifest.count())
    manifest.orderBy("seq_id", "seq_start").show(5)

    lm, stats = unigram_lm(docs)
    lm_perplexity(docs, lm, stats).orderBy(F.desc("ppl")).show(3)

    print("repeated >=8-token spans (cross-doc boilerplate):")
    repeated_substring_spans(docs, k=8).show(3)

    model = pca_train(spark.read.parquet(sf_dir + "/embeddings.parquet"), k=16)
    print(
        "PCA(16) explained variance: %.3f"
        % sum(model["explained_variance_ratio"])
    )
    pca_apply(
        spark.read.parquet(sf_dir + "/embeddings.parquet"), model
    ).select("vec_id", "embedding_pca").show(2, truncate=60)

    # SemDeDup over the embedding table (threshold 0.3 because the
    # synthetic vectors are near-orthogonal; production text embeddings
    # use ~0.95+)
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    kept_vecs = semantic_dedup(emb, n_centroids=8, iters=2, threshold=0.3)
    print("semantic dedup kept %d of %d vectors" % (kept_vecs.count(), emb.count()))

    # epoch-weighted mix: run src0 for 2.5 epochs, src1 for a quarter
    # epoch; pack by copy_id so the second epoch of a doc gets its own
    # slice of the training stream
    up = upsample_mix(docs, {"src0": 2.5, "src1": 0.25}, "source")
    upacked = pack_sequences(up, capacity=2048, id_col="copy_id")
    print(
        "upsampled mix: %d copies of %d docs -> %d packed slices"
        % (up.count(), docs.count(), upacked.count())
    )

    # percentile quality gate, then cut an exact token budget out of
    # the gated corpus in the seeded shuffle order
    gated = select_top_fraction(quality_score(docs), 0.6)
    subset = token_budget_subset(gated, budget=10_000)
    used = subset.agg(F.sum("n_tokens_used")).collect()[0][0]
    print(
        "quality gate kept %d docs; token budget kept %d docs / %d tokens"
        % (gated.count(), subset.count(), used)
    )

    # --- round-5 additions -------------------------------------------
    from gogstash_spark.mlops.ann import cluster_balanced_sample, embedding_report
    from gogstash_spark.mlops.bpe import bpe_apply, bpe_train
    from gogstash_spark.mlops.dedup import (
        conv_dedup,
        dedup_incremental,
        neardup_incremental,
    )
    from gogstash_spark.mlops.sampling import mixture_weights, score_buckets
    from gogstash_spark.mlops.textops import (
        corpus_report,
        nb_score,
        nb_train,
        normalize_text,
        oov_rate,
        vocab_top_k,
    )

    # normalize FIRST so byte-variant duplicates fold in every later stage
    norm = normalize_text(docs)
    print("dirty docs normalized:", norm.agg(F.sum("n_norm_changes")).collect()[0][0])

    # tokenizer workflow: learn BPE merges, tokenize, check OOV coverage
    merges = bpe_train(norm, n_merges=8)
    print("BPE merges learned:")
    merges.orderBy("merge_idx").show(8)
    toks = bpe_apply(norm, merges)
    print("mean BPE tokens/doc:", toks.agg(F.avg("n_bpe_tokens")).collect()[0][0])
    vocab = vocab_top_k(norm, k=20)
    oov = oov_rate(norm, vocab)
    print("corpus OOV rate vs top-20 vocab:",
          oov.agg(F.sum("n_oov") / F.sum("n_tokens")).collect()[0][0])

    # quality classifier seeded by source membership; then perplexity bands
    seed = norm.withColumn("label", F.col("source").isin("src0", "src1").cast("int"))
    w, st = nb_train(seed)
    scored_nb = nb_score(norm, w, st)
    print("NB-positive docs:", scored_nb.where("nb_positive").count())
    banded = score_buckets(
        lm_perplexity(norm, lm, stats), [1 / 3, 2 / 3], ["head", "middle", "tail"]
    )
    banded.groupBy("score_bucket").count().show()

    # mixture planning: does the corpus support a 50/25/25 mix at 100k tokens?
    mixture_weights(
        norm, {"src0": 2.0, "src1": 1.0, "src2": 1.0}, budget_tokens=100_000
    ).orderBy("source").show(5)

    # incremental snapshots: exact + near-dup ledgers
    snap1 = norm.where("doc_id % 2 = 0")
    snap2 = norm.where("doc_id % 2 = 1")
    led = dedup_incremental(snap1, None).select("text_md5")
    print("snapshot-2 exact-ledger survivors:", dedup_incremental(snap2, led).count())
    sled = neardup_incremental(snap1, None).select("doc_id", "m0", "m1", "m2", "m3")
    print("snapshot-2 near-dup survivors:", neardup_incremental(snap2, sled).count())

    # corpus + embedding health reports; diversity-balanced subset
    corpus_report(norm).orderBy("source").show(5)
    embedding_report(emb).orderBy("dim").show(3)
    bal = cluster_balanced_sample(emb, per_cell=20, iters=2)
    print("cluster-balanced subset:", bal.count())

    # chat-data dedup over the transcripts table
    from gogstash_spark.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts("/root/testdata/sf0.001")
    turns = spark.read.parquet(tdir + "/transcripts")
    cd = conv_dedup(turns)
    print("distinct conversations:", cd.count(),
          "| dup clusters:", cd.where("n_convs > 1").count())

    # retrieval chunking + tuning evals: LSH banding recall vs exact
    # truth, ANN recall@5 vs brute force
    from gogstash_spark.mlops.ann import ann_recall_eval, brute_topk, ivf_topk
    from gogstash_spark.mlops.dedup import dedup_lsh_eval
    from gogstash_spark.mlops.textops import chunk_documents

    ch = chunk_documents(norm, chunk_tokens=64, overlap=8)
    print("retrieval chunks:", ch.count(), "from", norm.count(), "docs")
    # the exact-truth side is the documented quadratic VALIDATION path:
    # always evaluate on a bounded sample, whatever sf_dir this runs at
    eval_slice = norm.where(F.col("doc_id") % 100 < 20)
    dedup_lsh_eval(eval_slice, threshold=0.35).show()
    ann_recall_eval(
        brute_topk(emb, k=5, max_query_id=50), ivf_topk(emb, k=5, max_query_id=50)
    ).show()

    # SFT packing: conversations -> fixed-capacity sequences with
    # assistant-only loss masks
    from gogstash_spark.mlops.packing import sft_mask_manifest

    mask = sft_mask_manifest(turns, capacity=512)
    frac = mask.agg(
        F.sum(F.when(F.col("loss_mask"), F.col("tok_end") - F.col("tok_start") + 1))
        / F.sum(F.col("tok_end") - F.col("tok_start") + 1)
    ).collect()[0][0]
    print("SFT sequences: %d | trainable-token fraction: %.3f"
          % (mask.select("seq_id").distinct().count(), frac))


if __name__ == "__main__":
    main()
