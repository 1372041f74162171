"""PCA for embedding columns: dimensionality reduction before ANN /
clustering / storage (the classic recipe: L2-normalize -> PCA to
64-256 dims -> quantize; see ann.py and quantize_int8 for the
neighbors).

Train = one distributed Gramian pass, the same decomposition Spark
MLlib's RowMatrix.computeGramian uses:

  1. per-partition partials via Arrow-batched mapInPandas — each task
     emits ONE row (n, sum(x), flattened X^T X), so the shuffle is
     O(partitions × d²) regardless of corpus size;
  2. elementwise reduction of the partials with posexplode + ONE
     groupBy(pos) — d² rows survive;
  3. eigendecomposition of the d×d covariance on the DRIVER with
     numpy (d is 64-1024; the O(d³) eigh is microseconds — this is
     the one place driver-side math is the right call, exactly like
     collecting k centroids in ivf_train).

Apply = broadcast the k×d component matrix as ONE row (the
centroid/hyperplane pattern from ann.py — literals would blow the plan
at d=1024) and project per row with zip_with/aggregate HOFs, the
centered vector staged once (functions/hof.py).

Eigendecomposition is not SQL — correctness is pinned by pytest
against an independent numpy PCA on the same rows (exact to 1e-6,
deterministic sign convention), the same verification class as
ivf_train's convergence test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gogstash_spark.functions.hof import staged


def _gram_partials(emb: DataFrame, vec_col: str) -> DataFrame:
    """(n long, s array<double>, g array<double>) — one row per
    non-empty partition: count, column sums, full flattened d×d X^T X
    (row-major; pca_train reshapes it back — the shuffle is
    O(partitions × d²)). NULL vectors are excluded up front: a numpy
    stack over ragged/None rows dies with an opaque executor error."""

    def partials(batches):
        import numpy as np

        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf["v"]), dtype="float64")
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            import pandas as pd

            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return (
        emb.select(F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
    )


def _sum_elementwise(partials: DataFrame, col: str) -> list[float]:
    """Elementwise sum of an array column via posexplode + groupBy(pos)
    — the only shuffle is O(rows × len), rows = partitions."""
    rows = (
        partials.select(F.posexplode(col).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("x"))
        .collect()
    )
    out = [0.0] * len(rows)
    for r in rows:
        out[r["i"]] = r["x"]
    return out


def pca_train(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    center: bool = True,
) -> dict:
    """Fit PCA; returns {components: k×d, mean: d, explained_variance_
    ratio: k, n: int}. Components follow the deterministic sign
    convention (largest-|coeff| entry positive) so retrains and other
    engines agree. NULL embedding rows are skipped in training (and
    project to NULL in pca_apply)."""
    import numpy as np

    # persist: the partials feed three actions (count + two elementwise
    # sums); all actions finish inside this function, so unpersist on
    # the way out (dedup.py's rule: never leave blocks pinned)
    p = _gram_partials(emb, vec_col).persist()
    try:
        n = p.agg(F.sum("n")).collect()[0][0]
        if not n or n < 2:
            raise ValueError("pca_train needs at least 2 vectors (got %s)" % n)
        s = np.array(_sum_elementwise(p, "s"))
        g = np.array(_sum_elementwise(p, "g"))
    finally:
        p.unpersist()
    d = s.shape[0]
    if not 1 <= k <= d:
        raise ValueError("k must be in [1, %d] (got %d)" % (d, k))
    gram = g.reshape(d, d)
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1) if center else gram / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    for j in range(comps.shape[0]):  # sign convention
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    total = float(evals.sum())
    evr = [float(evals[i] / total) if total > 0 else 0.0 for i in order]
    return {
        "components": comps.tolist(),
        "mean": mean.tolist() if center else [0.0] * d,
        "explained_variance_ratio": evr,
        "n": int(n),
    }


def pca_apply(
    emb: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    target: str = "embedding_pca",
) -> DataFrame:
    """Project vectors onto the fitted components (round 6 for
    engine-stable output). The k×d matrix rides in as ONE broadcast row
    — plan size stays O(1) in d and k."""
    spark = emb.sparkSession
    mdl = spark.createDataFrame(
        [(model["components"], model["mean"])],
        "__comps array<array<double>>, __mu array<double>",
    )
    centered = staged(
        F.zip_with(F.col(vec_col), F.col("__mu"), lambda x, m: x.cast("double") - m),
        lambda c: F.transform(
            F.col("__comps"),
            lambda comp: F.round(
                F.aggregate(
                    F.zip_with(c, comp, lambda x, w: x * w),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ),
        ),
    )
    # NULL in -> NULL out (not an array of k NULLs, which downstream
    # size()/HOF consumers would treat as a real k-dim vector)
    return (
        emb.crossJoin(F.broadcast(mdl))
        .withColumn(target, F.when(F.col(vec_col).isNotNull(), centered))
        .drop("__comps", "__mu")
    )
