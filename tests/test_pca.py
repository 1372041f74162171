"""Embedding PCA: exactness vs an independent numpy PCA, determinism,
and scale-shape assertions. Eigendecomposition is not SQL — this is
the pytest-verified class (like ivf_train), not a DuckDB-oracle row."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gogstash_spark.mlops import pca

SF_DIR = "/root/testdata/sf0.001"


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    c = x - mean
    cov = c.T @ c / (x.shape[0] - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for j in range(k):
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    return comps, mean


class TestPcaTrain:
    def test_matches_numpy_exactly(self, spark):
        emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
        x = np.asarray(
            [r["embedding"] for r in emb.select("embedding").collect()],
            dtype="float64",
        )
        model = pca.pca_train(emb, k=8)
        comps, mean = _numpy_pca(x, 8)
        assert model["n"] == x.shape[0]
        assert np.allclose(model["mean"], mean, atol=1e-9)
        assert np.allclose(model["components"], comps, atol=1e-6)
        evr = model["explained_variance_ratio"]
        assert all(evr[i] >= evr[i + 1] for i in range(len(evr) - 1))
        assert 0 < sum(evr) <= 1 + 1e-9

    def test_deterministic_across_repartition(self, spark):
        emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
        a = pca.pca_train(emb, k=4)
        b = pca.pca_train(emb.repartition(7), k=4)
        assert np.allclose(a["components"], b["components"], atol=1e-9)
        assert np.allclose(a["mean"], b["mean"], atol=1e-12)

    def test_too_few_vectors_raises(self, spark):
        one = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="at least 2"):
            pca.pca_train(one, k=1)


class TestPcaApply:
    def test_projection_matches_numpy(self, spark):
        emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
        model = pca.pca_train(emb, k=8)
        got = {
            r["vec_id"]: r["embedding_pca"]
            for r in pca.pca_apply(emb, model).select("vec_id", "embedding_pca").collect()
        }
        rows = emb.select("vec_id", "embedding").collect()
        comps = np.asarray(model["components"])
        mean = np.asarray(model["mean"])
        for r in rows[:50]:
            want = comps @ (np.asarray(r["embedding"], dtype="float64") - mean)
            assert np.allclose(got[r["vec_id"]], np.round(want, 6), atol=2e-6)

    def test_scale_shape(self, spark):
        """Apply is a broadcast 1-row attach + per-row HOFs: no
        sort-merge join, no exchange of the data side at all."""
        emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
        model = pca.pca_train(emb, k=4)
        plan = (
            pca.pca_apply(emb, model)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        assert "hashpartitioning" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row attach


class TestPcaValidation:
    def test_k_out_of_range_raises(self, spark):
        emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
        with pytest.raises(ValueError, match=r"k must be in \[1, 64\]"):
            pca.pca_train(emb, k=65)
        with pytest.raises(ValueError, match="k must be"):
            pca.pca_train(emb, k=0)

    def test_null_vectors_skipped_in_train_null_in_apply(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [3.0, 1.0]), (4, None)],
            "vec_id long, embedding array<double>",
        )
        model = pca.pca_train(emb, k=2)
        assert model["n"] == 3
        got = {r["vec_id"]: r["embedding_pca"] for r in pca.pca_apply(emb, model).collect()}
        assert got[4] is None and got[1] is not None
