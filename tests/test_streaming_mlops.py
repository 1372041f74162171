"""Training-data ops under Structured Streaming: the curation filters
are plain column expressions + stream-static BROADCAST joins, so the
same code runs on a readStream of documents (continuous ingestion at
100 TB: score/decontaminate documents as they arrive; only packing —
a global offset assignment — stays batch-side by design)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from gogstash_spark.mlops.textops import (
    contamination,
    lang_id,
    quality_score,
    repetition_signals,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_stream_dir(tmp_path_factory):
    """The file stream source wants a DIRECTORY to watch; stage the
    documents file into one (continuous ingestion = files landing
    here)."""
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(SF_DIR + "/documents.parquet", d / "part-0.parquet")
    return str(d)


def _stream_docs(spark, docs_dir):
    schema = spark.read.parquet(SF_DIR + "/documents.parquet").schema
    return spark.readStream.schema(schema).parquet(docs_dir)


def _drain(stream_df, spark, tmp_path, name):
    out = os.path.join(str(tmp_path), name)
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    return spark.read.parquet(out)


class TestStreamingCuration:
    def test_quality_and_repetition_stream_equals_batch(self, spark, tmp_path, docs_stream_dir):
        batch = spark.read.parquet(SF_DIR + "/documents.parquet")
        expr = lambda df: repetition_signals(quality_score(lang_id(df))).select(  # noqa: E731
            "doc_id", "lang_pred", "quality", "dup_2gram_frac"
        )
        got = _drain(expr(_stream_docs(spark, docs_stream_dir)), spark, tmp_path, "q")
        want = {r["doc_id"]: r for r in expr(batch).collect()}
        rows = got.collect()
        assert len(rows) == len(want)
        for r in rows:
            w = want[r["doc_id"]]
            assert (r["lang_pred"], r["quality"], r["dup_2gram_frac"]) == (
                w["lang_pred"], w["quality"], w["dup_2gram_frac"]
            )

    def test_contamination_per_microbatch_foreachbatch(self, spark, tmp_path, docs_stream_dir):
        """contamination's matched-count aggregate + rejoin is not an
        append-mode streaming plan — the streaming shape is
        foreachBatch (the same bridge run_pipeline_streaming uses for
        fan-out). Per-doc results are doc-LOCAL against a static bench
        set, so per-microbatch application is semantically identical to
        one batch run regardless of how the stream is chopped."""
        batch = spark.read.parquet(SF_DIR + "/documents.parquet")
        bench = batch.where(F.col("doc_id") % 37 == 0)
        out_cols = ["doc_id", "n_ngrams", "n_matched_ngrams", "contaminated"]
        out = os.path.join(str(tmp_path), "c")

        def score_batch(bdf, epoch_id):
            contamination(bdf, bench).select(*out_cols).write.mode("append").parquet(out)

        q = (
            _stream_docs(spark, docs_stream_dir)
            .writeStream.foreachBatch(score_batch)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        want = {
            r["doc_id"]: r
            for r in contamination(batch, bench).select(*out_cols).collect()
        }
        rows = spark.read.parquet(out).collect()
        assert len(rows) == len(want)
        n_contaminated = 0
        for r in rows:
            w = want[r["doc_id"]]
            assert (r["n_ngrams"], r["n_matched_ngrams"], r["contaminated"]) == (
                w["n_ngrams"], w["n_matched_ngrams"], w["contaminated"]
            )
            n_contaminated += bool(r["contaminated"])
        assert n_contaminated > 0


class TestStreamingTokenizeAndScore:
    def test_bpe_apply_streams_natively(self, spark, tmp_path, docs_stream_dir):
        """A learned BPE model is a fixed replace-expression chain —
        stateless, so tokenization runs directly on the stream (the
        production shape: learn merges offline on a snapshot, tokenize
        the firehose)."""
        from gogstash_spark.mlops.bpe import bpe_apply, bpe_train

        batch = spark.read.parquet(SF_DIR + "/documents.parquet")
        merges = bpe_train(batch, n_merges=3)
        got = _drain(
            bpe_apply(_stream_docs(spark, docs_stream_dir), merges),
            spark,
            tmp_path,
            "bpe",
        )
        want = {r["doc_id"]: r["bpe_tokens"] for r in bpe_apply(batch, merges).collect()}
        rows = got.collect()
        assert len(rows) == len(want)
        assert all(r["bpe_tokens"] == want[r["doc_id"]] for r in rows)

    def test_nb_score_per_microbatch_foreachbatch(
        self, spark, tmp_path, docs_stream_dir
    ):
        """nb_score aggregates per doc_id — an unbounded-state streaming
        aggregation Spark rejects without a watermark (pinned below).
        The production shape is foreachBatch: docs arrive complete, so
        scoring each microbatch AS a batch is exact (same rule as the
        contamination test above)."""
        from gogstash_spark.mlops.textops import nb_score, nb_train

        batch = spark.read.parquet(SF_DIR + "/documents.parquet")
        seed = batch.withColumn(
            "label", F.col("source").isin("src0", "src1", "src2", "src3").cast("int")
        )
        w, st = nb_train(seed)
        w, st = w.localCheckpoint(eager=True), st.localCheckpoint(eager=True)

        # the naive form IS rejected (watermarkless agg, append mode) —
        # pin the failure so a silent semantics change can't sneak by
        out_bad = os.path.join(str(tmp_path), "nb_bad")
        with pytest.raises(Exception, match="STREAMING_OUTPUT_MODE|watermark"):
            (
                nb_score(_stream_docs(spark, docs_stream_dir), w, st)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out_bad)
                .option("checkpointLocation", out_bad + "_ck")
                .trigger(availableNow=True)
                .start()
            )

        out = os.path.join(str(tmp_path), "nb")

        def score_batch(mb, _bid):
            nb_score(mb, w, st).write.mode("append").parquet(out)

        q = (
            _stream_docs(spark, docs_stream_dir)
            .writeStream.foreachBatch(score_batch)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish within 120s"
        got = {r["doc_id"]: r["nb_score"] for r in spark.read.parquet(out).collect()}
        want = {r["doc_id"]: r["nb_score"] for r in nb_score(batch, w, st).collect()}
        assert got == want
