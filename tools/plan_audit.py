"""Physical-plan audit table for every training-data op: one line per
op with the operator counts that matter at 100 TB (broadcast vs
sort-merge joins, hash exchanges, windows, nested-loop/cartesian).

    python tools/plan_audit.py [sf_dir]

Complements tests/test_plan_invariants.py (which PINS the critical
shapes): this prints the whole inventory so a round review can eyeball
regressions before they earn a pin. SMJ is not automatically bad — the
full-outer snapshot diff and the corpus-scale band joins are SMJ by
design (no side fits a broadcast); the table exists so every SMJ is a
KNOWN one.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def audit(name: str, df) -> None:
    p = df._jdf.queryExecution().executedPlan().toString()
    print(
        "%-24s BHJ:%d SMJ:%d hashExch:%d Window:%d BNLJ/Cart:%d"
        % (
            name,
            p.count("BroadcastHashJoin"),
            p.count("SortMergeJoin"),
            p.count("Exchange hashpartitioning"),
            p.count("Window"),
            p.count("NestedLoop") + p.count("Cartesian"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from gogstash_spark.mlops import ann, bpe, dedup, packing, pq, sampling, textops
    from gogstash_spark.session import get_spark
    from gogstash_spark.sources.transcripts import ensure_transcripts

    spark = get_spark(app_name="plan_audit", master="local[8]")
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    turns = spark.read.parquet(ensure_transcripts("/root/testdata/sf0.001") + "/transcripts")

    audit("lang_id", textops.lang_id(docs))
    audit("quality_score", textops.quality_score(docs))
    audit("normalize_text", textops.normalize_text(docs))
    audit("redact_pii", textops.redact_pii(docs))
    audit("token_counts", textops.token_counts(docs))
    audit("fingerprint", textops.fingerprint(docs))
    audit("repetition_signals", textops.repetition_signals(docs))
    audit("vocab_top_k", textops.vocab_top_k(docs, 20))
    audit("oov_rate", textops.oov_rate(docs, textops.vocab_top_k(docs, 20)))
    lm, stats = textops.unigram_lm(docs)
    audit("lm_perplexity", textops.lm_perplexity(docs, lm, stats))
    bi, miss, bst = textops.bigram_lm(docs)
    audit("bigram_perplexity", textops.bigram_perplexity(docs, bi, miss, bst))
    seed = docs.withColumn("label", F.col("source").isin("src0").cast("int"))
    w, st = textops.nb_train(seed)
    audit("nb_score", textops.nb_score(docs, w, st))
    audit("corpus_report", textops.corpus_report(docs))
    audit("contamination", textops.contamination(docs, docs.limit(20)))

    audit("dedup_exact", dedup.exact_dup_groups(docs))
    audit("minhash_lsh_pairs", dedup.minhash_lsh_pairs(docs))
    audit("conv_dedup", dedup.conv_dedup(turns))
    s1 = docs.where("doc_id % 2 = 0")
    audit("dedup_incremental", dedup.dedup_incremental(
        docs.where("doc_id % 2 = 1"),
        dedup.dedup_incremental(s1, None).select("text_md5")))
    nl = dedup.neardup_incremental(s1, None).select("doc_id", "m0", "m1", "m2", "m3")
    audit("neardup_incremental",
          dedup.neardup_incremental(docs.where("doc_id % 2 = 1"), nl))
    audit("snapshot_diff", dedup.snapshot_diff(s1, docs.where("doc_id % 2 = 1")))
    audit("repeated_spans", dedup.repeated_substring_spans(docs, k=8))

    audit("ivf_assign", ann.ivf_assign(emb))
    audit("ivf_topk", ann.ivf_topk(emb, max_query_id=50))
    audit("lsh_topk", ann.lsh_topk(emb, max_query_id=50))
    audit("embedding_report", ann.embedding_report(emb))
    audit("cluster_balanced(exact)", ann.cluster_balanced_sample(emb, 20, iters=1))
    audit("cluster_balanced(rate)",
          ann.cluster_balanced_sample(emb, 20, iters=1, exact=False))
    cb = pq.pq_train(emb, iters=1)
    audit("pq_encode", pq.pq_encode(emb, cb))
    audit("pq_topk", pq.pq_topk(emb, max_query_id=50, codebook=cb))

    m = bpe.bpe_train(docs, n_merges=2)
    audit("bpe_apply", bpe.bpe_apply(docs, m))

    audit("stratified_sample", sampling.stratified_sample(docs, {"src0": 0.5}, "source"))
    audit("weighted_sample", sampling.weighted_sample(
        docs.withColumn("rate", F.lit(0.5)), "rate"))
    audit("score_buckets", sampling.score_buckets(
        textops.quality_score(docs), [0.5], ["lo", "hi"], score_col="quality"))
    audit("mixture_weights", sampling.mixture_weights(docs, {"src0": 1.0}, 1000))
    audit("upsample_mix", sampling.upsample_mix(docs, {"src0": 2.0}, "source"))

    audit("pack_sequences", packing.pack_sequences(docs, 1024))
    audit("sft_mask_manifest", packing.sft_mask_manifest(turns, 512))


if __name__ == "__main__":
    main()
