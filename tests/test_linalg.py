"""Distributed second moments / PCA (operators/linalg.py)."""

import numpy as np
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.operators.linalg import (
    covariance_matrix,
    embedding_moments,
    pca_project,
)


def _numpy_quantized(spark, sf_dir, scale=100_000):
    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf["vec_id"].to_numpy(), v, np.floor(v * scale + 0.5)


def test_moments_match_numpy_exactly(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, _, q = _numpy_quantized(spark, sf_dir)
    m = embedding_moments(emb).toPandas()
    assert len(m) == 64 * 65 // 2
    assert (m["n"] == len(q)).all()
    outer = q.T @ q
    sums = q.sum(axis=0)
    for _, r in m.sample(n=50, random_state=7).iterrows():
        i, j = int(r["i"]), int(r["j"])
        assert r["sxy"] == outer[i, j]
        assert r["sx"] == sums[i] and r["sy"] == sums[j]


def test_moments_partition_invariant(spark, sf_dir):
    """Exact int sums: identical for any partitioning / batch split."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = embedding_moments(emb.repartition(1)).orderBy("i", "j").collect()
    b = embedding_moments(emb.repartition(7)).orderBy("i", "j").collect()
    assert a == b


def test_covariance_matrix_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, _, q = _numpy_quantized(spark, sf_dir)
    got = covariance_matrix(emb)
    want = np.cov(q.T, bias=True) / 1e10
    assert np.abs(got - want).max() < 1e-12


def test_pca_projection_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids, v, q = _numpy_quantized(spark, sf_dir)
    cov = np.cov(q.T, bias=True) / 1e10
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    p = pca_project(emb, n_components=2).toPandas().set_index("vec_id")
    mean = q.mean(axis=0) / 1e5
    for ci, k in enumerate(order[:2], start=1):
        vk = vecs[:, k]
        if abs(vk.min()) > abs(vk.max()):
            vk = -vk
        want = (v - mean) @ vk
        got = p.loc[ids, f"pc{ci}"].to_numpy()
        assert np.abs(want - got).max() < 1e-9
    # top component explains more variance than the second
    assert p["pc1"].var() > p["pc2"].var()


def test_moments_single_python_stage(spark, sf_dir):
    """The only Python in the plan is the one mapInPandas partials
    stage; everything downstream is JVM-side aggregation."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = embedding_moments(emb)._jdf.queryExecution().executedPlan().toString()
    # the partials subtree is persisted and feeds three consumers, so
    # the plan TEXT repeats it; what matters is that no other Python
    # stage exists and no per-row Python ever appears
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_gram_matrix_int_matches_numpy(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.operators.linalg import (
        gram_matrix_int,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, _, q = _numpy_quantized(spark, sf_dir, scale=1_000)
    g = gram_matrix_int(emb, scale=1_000).toPandas()
    assert len(g) == 64 * 64
    gram = q.astype(np.int64).T @ q.astype(np.int64)
    for _, r in g.sample(n=50, random_state=7).iterrows():
        assert r["g"] == gram[int(r["i"]), int(r["j"])]


def test_power_iteration_finds_dominant_axis(spark):
    # planted dominant direction: 40 vectors hugging axis 3, a few
    # orthogonal stragglers — the iterate must concentrate on pos 3
    rows = [(i, [0.0] * 3 + [0.9] + [0.01 * ((i + j) % 5) for j in range(4)]) for i in range(40)]
    rows += [(100 + i, [0.5] + [0.0] * 7) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from udacity_data_engineering_capstone_project_spark.operators.linalg import (
        power_iteration_dominant,
    )

    v = power_iteration_dominant(df, dim=8, iters=8)
    assert max(range(8), key=lambda i: abs(v[i])) == 3


def test_power_iteration_reaches_top_eigenspace(spark, sf_dir):
    # the fixture's top eigenvalues sit within ~2% of each other, so
    # angular convergence to THE top eigenvector is ill-conditioned;
    # the honest (and fast-converging) claim is ENERGY: the iterate's
    # Rayleigh quotient must reach >= 95% of lambda_max
    from udacity_data_engineering_capstone_project_spark.operators.linalg import (
        power_iteration_dominant,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, _, q = _numpy_quantized(spark, sf_dir, scale=1_000)
    gram = (q.astype(np.int64).T @ q.astype(np.int64)).astype(np.float64)
    lam_max = np.linalg.eigh(gram)[0].max()
    v = np.array(power_iteration_dominant(emb, dim=64, scale=1_000), dtype=np.float64)
    rayleigh = (v @ gram @ v) / (v @ v)
    assert rayleigh >= 0.95 * lam_max


def test_power_iteration_partition_invariant(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.operators.linalg import (
        power_iteration_dominant,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = power_iteration_dominant(emb, dim=64, iters=4)
    b = power_iteration_dominant(emb.repartition(13), dim=64, iters=4)
    assert a == b  # exact integers: layout cannot change the answer
